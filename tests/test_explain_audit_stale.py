"""EXPECTED_MULTISTAGE stale-entry gate (VERDICT r11 ask #4): the
exchange-budget exemption map in tools/explain_audit.py must stay an
inventory, not a graveyard — an entry naming a query that no longer
exists, or whose static plan dropped back under the budget, fails."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import explain_audit  # noqa: E402


def test_no_entries_for_missing_queries():
    from dpe_energy_performance_analysis_etl_spark.plans import QUERIES

    stale = explain_audit.stale_missing_entries(registry=QUERIES)
    assert not stale, (
        f"EXPECTED_MULTISTAGE names queries not in the registry: {stale}"
    )


def test_synthetic_missing_entry_is_flagged():
    stale = explain_audit.stale_missing_entries(
        expected={"ghost_query_that_never_existed": "why"},
        registry={"real_query": None},
    )
    assert stale == ["ghost_query_that_never_existed"]


def test_synthetic_under_budget_entry_is_flagged():
    expected = {"q_heavy": "justified", "q_now_cheap": "rotted"}
    counts = {"q_heavy": 14, "q_now_cheap": 6, "q_unlisted": 3}
    stale = explain_audit.stale_under_budget(counts, expected=expected)
    assert stale == ["q_now_cheap"]


def test_budget_boundary_is_inclusive():
    # exactly at the budget the exemption is unnecessary (the audit
    # only flags counts STRICTLY above EXCHANGE_BUDGET)
    stale = explain_audit.stale_under_budget(
        {"q": explain_audit.EXCHANGE_BUDGET}, expected={"q": "x"}
    )
    assert stale == ["q"]
