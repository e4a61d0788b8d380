"""r13 optimization focused tests.

1. ks_two_sample now folds the running MAX of the cross-multiplied
   CDF difference LOCAL+CROSS (per-partition max/min of the local
   linear term + bounded offset algebra) instead of building per-row
   global prefixes through the pinned two-pass recipe. Pinned against
   a pure-python brute force on a shape FORCED to span multiple range
   partitions — a single-partition run would zero every offset and
   hide a broken fold (the r12 rank-fold test rule).

2. dbscan_grid now generates each unordered candidate pair ONCE
   through a half-plane 5-offset grid join (+ id tie-break in the
   shared cell) and mirrors survivors row-locally. Pinned against a
   brute-force python DBSCAN on a randomized shape that exercises
   all 8 cross-cell directions, plus the min_pts=1 isolated-core
   edge case the rewrite special-cases.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark(spark):
    # AQE would coalesce the tiny range exchange to ONE partition,
    # zeroing every cross-partition offset (see r12 fold tests).
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)


def _brute_ks(rows):
    """Exact integer KS numerator per group from (g, side, v) rows."""
    from collections import Counter, defaultdict

    by_g = defaultdict(list)
    for g, s, v in rows:
        by_g[g].append((s, v))
    out = {}
    for g, sv in by_g.items():
        n = len(sv)
        n1 = sum(1 for s, _ in sv if s)
        cnt = Counter(v for _, v in sv)
        cnt1 = Counter(v for s, v in sv if s)
        cum = cum1 = 0
        best = 0
        for v in sorted(cnt):
            cum += cnt[v]
            cum1 += cnt1.get(v, 0)
            best = max(best, abs(cum1 * n - cum * n1))
        d = (
            best * 1_000_000 // (n1 * (n - n1))
            if 0 < n1 < n
            else None
        )
        out[g] = (n1, n - n1, d)
    return out


class TestKsLocalCrossFold:
    def test_multi_partition_brute_force_parity(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_local_prefix,
        )
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            ks_two_sample,
        )

        # ~1500 distinct values x 2 groups, interleaved sides and
        # ties, plus a single-side group (NULL contract)
        rows = [
            (f"g{i % 2}", (i * 7) % 3 == 0, (i * 13) % 1499)
            for i in range(3000)
        ]
        rows += [("gone", True, 5), ("gone", True, 7)]
        df = spark.createDataFrame(rows, "g string, s boolean, v bigint")

        # the fold is only exercised if the ranged tier table really
        # spans multiple partitions per group
        vals = df.groupBy(F.col("g"), F.col("v").alias("vv")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        npart = (
            grouped_local_prefix(vals, "g", "vv", ["cnt"])
            .where(F.col("g") == "g0")
            .select("_pid")
            .distinct()
            .count()
        )
        assert npart >= 2, "shape too small to exercise the cross fold"

        got = {
            r["g"]: (r["n1"], r["n2"], r["d_scaled"])
            for r in ks_two_sample(df, "g", "s", "v").collect()
        }
        assert got == _brute_ks(rows)

    def test_single_value_and_all_one_side(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            ks_two_sample,
        )

        rows = [("a", True, 1), ("a", False, 1), ("b", False, 3)]
        got = {
            r["g"]: (r["n1"], r["n2"], r["d_scaled"])
            for r in ks_two_sample(
                spark.createDataFrame(rows, "g string, s boolean, v bigint"),
                "g",
                "s",
                "v",
            ).collect()
        }
        # one shared tier: cum1*n - cum*n1 = 1*2 - 2*1 = 0
        assert got["a"] == (1, 1, 0)
        assert got["b"] == (0, 1, None)


def _brute_dbscan(rows, eps, min_pts):
    """Reference DBSCAN with the operator's deterministic contracts
    (min-core-id cluster labels, min-label border attach)."""
    ids = [r[0] for r in rows]
    pos = {r[0]: (r[1], r[2]) for r in rows}
    neigh = {
        i: [
            j
            for j in ids
            if (pos[i][0] - pos[j][0]) ** 2 + (pos[i][1] - pos[j][1]) ** 2
            <= eps * eps
        ]
        for i in ids
    }
    core = {i for i in ids if len(neigh[i]) >= min_pts}
    # components over core-core edges via repeated min propagation
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in neigh[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            cands = [label[j] for j in neigh[i] if j in core and j != i]
            out[i] = ("border", min(cands)) if cands else ("noise", -1)
    return out


class TestDbscanHalfPlane:
    def _run(self, spark, rows, eps, min_pts):
        from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
            dbscan_grid,
        )

        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
        out = dbscan_grid(df, eps=eps, min_pts=min_pts)
        return {r["id"]: (r["role"], r["cluster"]) for r in out.collect()}

    def test_randomized_all_directions_parity(self, spark):
        # deterministic pseudo-random scatter dense enough that
        # qualifying pairs cross cells in all 8 directions
        rows = [
            (i, (i * 2654435761) % 97, (i * 40503) % 89)
            for i in range(1, 181)
        ]
        eps, min_pts = 12, 4
        assert self._run(spark, rows, eps, min_pts) == _brute_dbscan(
            rows, eps, min_pts
        )

    def test_min_pts_one_isolated_points_are_core(self, spark):
        # min_pts=1: every point (incl. isolated ones absent from the
        # mirrored pair table) is a core of its own cluster
        rows = [(1, 0, 0), (2, 1, 0), (3, 500, 500)]
        got = self._run(spark, rows, eps=2, min_pts=1)
        assert got[1] == ("core", 1)
        assert got[2] == ("core", 1)
        assert got[3] == ("core", 3)

    def test_same_cell_tiebreak_keeps_all_pairs(self, spark):
        # several points inside ONE grid cell: the a<b tie-break must
        # still yield every unordered pair after the mirror (counts
        # would break core detection if a pair were dropped/doubled)
        rows = [(i, i, 0) for i in range(1, 6)]  # all within eps=10 cell
        got = self._run(spark, rows, eps=10, min_pts=5)
        assert {got[i] for i in range(1, 6)} == {("core", 1)}
