"""Measure the exact-vs-histprune crossover for grouped_trimmed_mean
(VERDICT r8 ask #4): time both EXACT strategies on the
trimmed_mean_price_brand shape (lineitem ⋈ part, cents-scaled price by
brand) at each available scale point, same session (so the JVM warm-up
and host speed cancel within a row), min-of-2 per cell.

Usage: python tools/measure_trimmed_crossover.py [sf_dir ...]
  default: /root/testdata/sf0.01 /root/testdata/sf0.1
           /tmp/sparkgraft_sf5 (if present)

The winning threshold goes to operators/quantiles.py
``_TRIMMED_EXACT_MAX_ROWS`` and the table to NOTES.md round 9.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (  # noqa: E402
    grouped_trimmed_mean,
)


def base_df(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    # broadcast dim probe — the query's (and the 100 TB) feed shape;
    # histprune re-scans its feed per pass by design
    pt = F.broadcast(pt.select("p_partkey", "p_brand"))
    return li.join(pt, li["l_partkey"] == F.col("p_partkey")).select(
        F.col("p_brand").alias("b"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("price"),
    )


def main() -> None:
    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/tmp/sparkgraft_sf5",
        )
        if os.path.isdir(d)
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'sf_dir':<28}{'rows':>12}{'exact_s':>10}{'histprune_s':>13}")
    for d in dirs:
        base = base_df(spark, d)
        n = base.count()
        cells = {}
        for method in ("exact", "histprune"):
            best = float("inf")
            res = None
            for _ in range(2):
                t0 = time.monotonic()
                got = sorted(
                    map(
                        tuple,
                        grouped_trimmed_mean(
                            base, "b", "price", method=method
                        ).collect(),
                    )
                )
                best = min(best, time.monotonic() - t0)
                if res is None:
                    res = got
                assert got == res
            cells[method] = (best, res)
        assert cells["exact"][1] == cells["histprune"][1], f"MISMATCH at {d}"
        print(
            f"{d:<28}{n:>12}{cells['exact'][0]:>10.2f}"
            f"{cells['histprune'][0]:>13.2f}"
        )
    print("(results bit-identical across methods at every scale point)")


if __name__ == "__main__":
    main()
