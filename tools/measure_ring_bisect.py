"""Round-7 measurement: ring_assign linear-scan vs binary-search at
growing ring sizes (verdict ask #2 — prove log-not-linear growth at a
realistic 256 nodes x 64 vnodes = 16 384 points).

The linear variant below is a faithful reconstruction of the r6
implementation (F.filter scan over the sorted literal position array
+ literal-map owner lookup) so both run in the same session at the
same calib. Times are min-of-2 per cell over the same 1M-key input.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.operators.scaling import ring_assign  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32  # noqa: E402


def _points(n_nodes: int, vnodes: int, salt: int = 0):
    def mix_py(node, vn, k):
        s = (node % 2**32 + (vn % 2**32) * 40503 + k * 73244475) % 2**32
        s = ((s ^ (s >> 16)) * 73244475) % 2**32
        return s ^ (s >> 16)

    pts = sorted(
        (mix_py(node, vn, salt), node, vn)
        for node in range(n_nodes)
        for vn in range(vnodes)
    )
    seen: set[int] = set()
    return [p for p in pts if p[0] not in seen and not seen.add(p[0])]


def ring_assign_linear_r6(df, key_col, n_nodes, vnodes=64, salt=0):
    """The round-6 implementation, reconstructed for the comparison."""
    points = _points(n_nodes, vnodes, salt)
    pos_arr = F.array(*[F.lit(p).cast("bigint") for p, _, _ in points])
    pos_to_node = F.create_map(
        *[
            x
            for p, node, _ in points
            for x in (F.lit(p).cast("bigint"), F.lit(node).cast("bigint"))
        ]
    )
    h = _portable_mix32(F.col(key_col), F.lit(97), F.lit(salt))
    owner_pos = F.coalesce(
        F.try_element_at(F.filter(pos_arr, lambda p: p >= h), F.lit(1)),
        F.lit(points[0][0]).cast("bigint"),
    )
    return df.withColumn("shard", pos_to_node[owner_pos])


def main():
    spark = get_spark()
    keys = spark.range(1_000_000).withColumnRenamed("id", "k").cache()
    keys.count()
    sink = lambda df: df.groupBy("shard").count().collect()

    # r8 extension (verdict ask #6): the bisection FOLD pays
    # higher-order-function lambda interpretation per step; the
    # unrolled WHEN-tree compiles the same lower-bound search as
    # nested literal CASE comparisons. Compare all three.
    print(
        f"{'ring':>12} {'points':>7} {'linear_r6':>10} {'fold_r7':>10}"
        f" {'tree_r8':>10}"
    )
    for n_nodes, vnodes in [(4, 64), (16, 64), (64, 64), (256, 64)]:
        pts = len(_points(n_nodes, vnodes))
        if pts > 8192:
            # measured r8: a 16 384-leaf nested CaseWhen is
            # COMPILE-pathological (Catalyst/py4j construction alone
            # ran >13 min before being killed) — the tree path is
            # size-capped in ring_assign; skip it here
            tree = float("nan")
        else:
            tree = min(
                _time(
                    sink,
                    ring_assign(keys, "k", n_nodes, vnodes=vnodes, method="tree"),
                )
                for _ in range(2)
            )
        bis = min(
            _time(sink, ring_assign(keys, "k", n_nodes, vnodes=vnodes, method="fold"))
            for _ in range(2)
        )
        lin = min(
            _time(sink, ring_assign_linear_r6(keys, "k", n_nodes, vnodes))
            for _ in range(2)
        )
        print(
            f"{n_nodes}x{vnodes:>8} {pts:>7} {lin:>10.2f} {bis:>10.2f}"
            f" {tree:>10.2f}",
            flush=True,
        )
    # sanity: identical assignments — fold vs linear at the largest
    # ring; tree vs fold at the largest tree-eligible ring (64x64)
    a = ring_assign_linear_r6(keys, "k", 256, 64).groupBy("shard").count()
    b = ring_assign(keys, "k", 256, vnodes=64, method="fold").groupBy("shard").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = ring_assign(keys, "k", 64, vnodes=64, method="fold").groupBy("shard").count()
    d = ring_assign(keys, "k", 64, vnodes=64, method="tree").groupBy("shard").count()
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))
    print("assignment parity (fold==linear @256x64, tree==fold @64x64): OK")


def _time(sink, df):
    t0 = time.time()
    sink(df)
    return time.time() - t0


if __name__ == "__main__":
    main()
