"""Scaling measurement for the round-5 operator wave at sf0.1 / sf1
(cold-cache via clearCache, min-of-3, calib-stamped — the same
methodology as tools/measure_r4_additions.py).

Usage: python tools/measure_r5_additions.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402

TARGETS = [
    "roc_auc_by_priority",
    "seasonal_naive_mase",
    "walk_skipgram_pairs",
    "t_closeness_customers",
    "link_prediction_parts",
    "rake_keywords_docs",
    "cdc_chunk_spans",
    "cdc_chunk_dedup",
    "record_linkage_fs",
    "landmark_bfs_parts",
    "pass_at_k_customers",
    "hll_distinct_orders",
    "bellman_ford_parts",
    "coverage_select_docs",
]


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sparkgraft_sf1"]
    spark = get_spark("measure_r5")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib = round(time.perf_counter() - t0, 3)
    print(f"calib_sec {calib}", file=sys.stderr)

    out: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        m = re.search(r"sf([\d.]+)", sf_dir)
        label = f"sf{m.group(1)}" if m else sf_dir
        res: dict[str, float] = {}
        for name in TARGETS:
            fn = QUERIES[name]
            try:
                spark.catalog.clearCache()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs = []
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                    runs.append(time.perf_counter() - t0)
                res[name] = round(min(runs), 3)
            except Exception as exc:  # noqa: BLE001
                res[name] = -1.0
                print(f"{label} {name} FAILED: {exc}", file=sys.stderr)
            print(f"RES {label} {name}: {res[name]}", file=sys.stderr)
        out[label] = res
    print(json.dumps({"calib_sec": calib, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
