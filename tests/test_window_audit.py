"""The unpartitioned-window-class gate (VERDICT r10 ask #1): every
global-window site must carry a bounded-by-construction justification
in tools/window_audit.py, and the specific data-scaling sites
rewritten in round 11 must stay rewritten."""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import window_audit  # noqa: E402


def test_no_unclassified_window_sites():
    bad = window_audit.violations()
    assert not bad, "\n".join(bad)


def test_no_stale_allowlist_entries():
    stale = window_audit.stale_entries()
    assert not stale, f"ALLOWED entries with no remaining site: {stale}"


def _src(rel):
    pkg = os.path.join(REPO, "dpe_energy_performance_analysis_etl_spark")
    if rel == "plans/queries.py":
        import glob

        parts = []
        for p in sorted(glob.glob(os.path.join(pkg, "plans", "families", "*.py"))):
            with open(p) as fh:
                parts.append(fh.read())
        return "\n".join(parts)
    with open(os.path.join(pkg, rel)) as fh:
        return fh.read()


def _fn_body(rel, name):
    src = _src(rel)
    m = re.search(rf"\ndef {name}\(.*?(?=\ndef |\Z)", src, re.S)
    assert m, f"{name} not found in {rel}"
    return m.group(0)


def test_data_scaling_sites_stay_rewritten():
    """The r10 verdict's six named sites plus the r11 sweep's finds:
    each must use a scale-safe recipe, never an unpartitioned window
    over a data-growing input."""
    for rel, fn, recipe in [
        # r10 verdict's six
        ("text/retrieval.py", "bm25_topk", "take_ordered_ranked"),
        ("text/retrieval.py", "vocab_with_ids", "global_rank_column"),
        ("text/retrieval.py", "vocab_coverage_curve", "global_rank_column"),
        ("text/tokenizer.py", "bpe_pair_counts", "take_ordered_ranked"),
        ("plans/queries.py", "rrf_hybrid_retrieval_q", "take_ordered_ranked"),
        ("plans/queries.py", "jm_query_likelihood_docs_q", "take_ordered_ranked"),
        # r11 sweep additions
        ("operators/sketch.py", "kmv_build", "take_ordered_ranked"),
        ("operators/sketch.py", "kmv_merge", "take_ordered_ranked"),
        ("operators/relational.py", "encode_dictionary", "global_rank_column"),
        ("operators/relational.py", "abc_classification", "global_rank_and_prefix"),
        ("operators/stats.py", "gini_concentration", "global_rank_column"),
        ("operators/layout.py", "zorder_key", "global_rank_column"),
        ("text/mixing.py", "weighted_sample_topk", "take_ordered_ranked"),
    ]:
        body = _fn_body(rel, fn)
        assert recipe in body, f"{rel}:{fn} lost its scale-safe recipe {recipe}"
        assert "Window.orderBy(" not in body or fn in (
            "weighted_sample_topk",  # grouped path keeps a PARTITIONED window
        ), f"{rel}:{fn} reintroduced a global window"


def test_scanner_sees_known_patterns():
    """The scanner must catch every unpartitioned spelling — a miss
    here would let the class reappear under a different constructor."""
    pat = window_audit._SITE
    for line in [
        "w = Window.orderBy('x')",
        "w = Window.rowsBetween(Window.unboundedPreceding, 0)",
        "w = Window.rangeBetween(-1, 1)",
        "n = F.count(F.lit(1)).over(Window.partitionBy())",
    ]:
        assert pat.search(line), line
    for line in [
        "w = Window.partitionBy('g').orderBy('x')",
        "w = Window.partitionBy(*cols)",
    ]:
        assert not pat.search(line), line
