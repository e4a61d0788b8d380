"""README count pins (VERDICT r11 ask #5): the registry / oracle /
test-case counts in README.md must match reality, or the round's doc
sync rots (the test count was stale in both r10 and r11). Regenerate
with `python tools/driver_ledger.py --readme`."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme():
    with open(os.path.join(REPO, "README.md")) as fh:
        return fh.read()


def test_registry_counts_match_readme():
    from dpe_energy_performance_analysis_etl_spark.plans import (
        ORACLE_SQL,
        QUERIES,
    )

    m = re.search(r"(\d+)-query registry, (\d+) with DuckDB oracle SQL", _readme())
    assert m, "README registry-count anchor phrase missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} registry queries, registry has "
        f"{len(QUERIES)} — run tools/driver_ledger.py --readme"
    )
    assert int(m.group(2)) == len(ORACLE_SQL), (
        f"README says {m.group(2)} oracle-backed, registry has "
        f"{len(ORACLE_SQL)} — run tools/driver_ledger.py --readme"
    )


def test_pytest_case_count_matches_readme(request):
    """Compares against THIS session's collected item count — only
    meaningful when the whole suite is collected, so partial runs
    skip instead of false-failing."""
    items = request.session.items
    if len(items) < 1000:
        pytest.skip("partial collection — full-suite runs judge the count")
    # -k / -m filters deselect items while still collecting >1000 —
    # those runs must not judge the full-suite count either
    if request.config.option.keyword or request.config.option.markexpr:
        pytest.skip("filtered run (-k/-m) — full-suite runs judge the count")
    m = re.search(r"(\d+) pytest cases", _readme())
    assert m, "README test-count anchor phrase missing"
    assert int(m.group(1)) == len(items), (
        f"README says {m.group(1)} pytest cases, this full-suite "
        f"collection has {len(items)} — run tools/driver_ledger.py --readme"
    )
