"""Winnowing fingerprints (text/winnow.py) — the SIGMOD'03 guarantee
and selection-rule properties."""

from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.winnow import (
    winnow_match_pairs,
    winnowing_fingerprints,
)

K, W = 4, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detection_guarantee_shared_run(spark):
    """Any shared run of >= window + k - 1 = 7 tokens must contribute
    at least one identical fingerprint to both documents."""
    shared = " ".join(f"s{i}" for i in range(7))
    df = _docs(
        spark,
        [
            (0, f"aa bb cc dd {shared} ee ff"),
            (1, f"{shared} zz yy xx ww vv uu tt"),
        ],
    )
    fps = winnowing_fingerprints(df, k=K, window=W)
    by_doc = {
        d: {r.fingerprint for r in rows}
        for d, rows in (
            (0, fps.where("doc_id = 0").collect()),
            (1, fps.where("doc_id = 1").collect()),
        )
    }
    assert by_doc[0] & by_doc[1], "guarantee violated: no shared fingerprint"


def test_identical_docs_identical_fingerprint_sets(spark):
    text = " ".join(f"w{i * 13 % 29}" for i in range(40))
    df = _docs(spark, [(0, text), (1, text)])
    fps = winnowing_fingerprints(df, k=K, window=W)
    a = sorted((r.pos, r.fingerprint) for r in fps.where("doc_id = 0").collect())
    b = sorted((r.pos, r.fingerprint) for r in fps.where("doc_id = 1").collect())
    assert a == b and len(a) > 0


def test_every_window_covered(spark):
    """Winnowing picks at least one position in every window of W
    consecutive positions (the density guarantee's other half)."""
    text = " ".join(f"t{i * 7 % 101}" for i in range(60))
    df = _docs(spark, [(0, text)])
    pos = sorted(r.pos for r in winnowing_fingerprints(df, k=K, window=W).collect())
    n_positions = 60 - K + 1
    assert pos[0] < W
    assert pos[-1] >= n_positions - W
    gaps = [b - a for a, b in zip(pos, pos[1:])]
    assert max(gaps) <= W, f"a window went unfingerprinted: max gap {max(gaps)}"


def test_partitioning_invariance_and_hash_paths(spark):
    rows = [(i, " ".join(f"v{(i * 11 + j) % 37}" for j in range(30))) for i in range(12)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, winnowing_fingerprints(df, k=K, window=W).collect()))
    b = sorted(
        map(tuple, winnowing_fingerprints(df.repartition(5), k=K, window=W).collect())
    )
    assert a == b
    # fast-path (xxhash64) selects by the same rule: positions may
    # differ (different hash order) but density/coverage still holds
    fast = winnowing_fingerprints(df, k=K, window=W, portable=False)
    assert fast.count() > 0


def test_match_pairs_threshold(spark):
    shared = " ".join(f"s{i}" for i in range(14))
    df = _docs(
        spark,
        [
            (0, f"aa bb cc {shared}"),
            (1, f"{shared} qq rr ss"),
            (2, "totally different content with many words here now ok"),
        ],
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in winnow_match_pairs(df, k=K, window=W).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(2 not in p for p in pairs)
