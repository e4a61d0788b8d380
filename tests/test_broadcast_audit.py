"""The broadcast-class gate (VERDICT r9 ask #1): every F.broadcast
site must be classified as bounded in tools/broadcast_audit.py, and
the specific corpus-growing sites fixed this round must stay fixed."""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import broadcast_audit  # noqa: E402


def test_no_unclassified_broadcast_sites():
    bad = broadcast_audit.violations()
    assert not bad, "\n".join(bad)


def test_no_stale_allowlist_entries():
    live = {(rel, fn) for rel, fn, _, _ in broadcast_audit.scan()}
    stale = [k for k in broadcast_audit.ALLOWED if k not in live]
    assert not stale, f"ALLOWED entries with no remaining site: {stale}"


def _src(rel):
    pkg = os.path.join(REPO, "dpe_energy_performance_analysis_etl_spark")
    if rel == "plans/queries.py":
        # the registry is chunked into plans/families/*.py; the pin
        # covers the whole logical file
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


def test_vocab_tables_not_broadcast():
    """The r9 verdict's named class: unigram/vocab tables stream
    through shuffle joins; only one-row scalars broadcast."""
    for rel, fn, growing in [
        ("text/retrieval.py", "unigram_lm_scores", "vocab"),
        ("text/retrieval.py", "stupid_backoff_scores", "c1"),
        ("text/retrieval.py", "kneser_ney_bigram_probs", "c1"),
        ("text/retrieval.py", "bm25_per_term", "dfreq"),
        ("text/analysis.py", "rake_keywords", "stats"),
        ("text/importance.py", "importance_score", "tvoc"),
        ("text/importance.py", "importance_score", "rvoc"),
        ("text/importance.py", "dsir_log_ratio", "vocab"),
        ("dedup/shingles.py", "shingle_pairs_jaccard", "sa"),
        ("dedup/shingles.py", "shingle_pairs_jaccard", "sb"),
    ]:
        body = _fn_body(rel, fn)
        assert f"F.broadcast({growing})" not in body, (
            f"{rel}:{fn} force-broadcasts data-growing table {growing}"
        )


def test_tpch_sf_scaling_dims_not_force_broadcast():
    """Full part/supplier/customer projections scale with SF — the
    forced hint must stay off (AQE promotes at small SF)."""
    src = _src("plans/queries.py")
    assert 'F.broadcast(pt.select("p_partkey", "p_brand"))' not in src
    assert "F.broadcast(part)" not in src
    assert 'F.broadcast(t["supplier"]' not in src
    assert 'F.broadcast(c.select("c_custkey"' not in src
