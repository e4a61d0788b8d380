"""Round-8 drift adjudication (VERDICT r7 asks #2 and #3): solo
matched-idle cold-cache min-of-3 re-measures of the four queries the
r7 record left open — ktruss (raw 4.02 s vs r6 1.44 s, unresolved),
cramers_v (raw doubled under the sub-second floor), pagerank (+26%)
and hits (+25%). Bench-identical methodology: noop sink, clearCache
before every run, calib sampled min-of-3 before AND after so host
movement during the session is visible. Run with NOTHING else on the
box (the round-5 bench-contention rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402

TARGETS = [
    "ktruss_parts_graph",
    "cramers_v_priority_status",
    "pagerank_supplier_graph",
    "hits_supplier_graph",
]

# prior-round raw seconds for context, from BENCH_r06/r07 records
PRIOR = {
    "ktruss_parts_graph": {"r6": 1.44, "r7": 4.02},
    "cramers_v_priority_status": {"r6": 0.503, "r7": 0.958},
    "pagerank_supplier_graph": {"r6": None, "r7": None},  # filled below
    "hits_supplier_graph": {"r6": None, "r7": None},
}


def calib(spark) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()
        s = time.perf_counter() - t0
        best = s if best is None else min(best, s)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for rnd in ("06", "07"):
        try:
            rec = json.load(open(f"/root/repo/BENCH_r{rnd}.json"))
            rec = rec.get("parsed", rec)
            for name in TARGETS:
                if name in rec.get("queries", {}):
                    PRIOR[name][f"r{int(rnd)}"] = rec["queries"][name]
        except Exception:  # noqa: BLE001
            pass

    spark = get_spark("measure_r8_drift")
    spark.range(1000).selectExpr("sum(id)").collect()
    c0 = calib(spark)
    out: dict[str, dict] = {"calib_before": c0}
    for name in TARGETS:
        fn = QUERIES[name]
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": runs, "min": min(runs), "prior": PRIOR[name]}
        print(json.dumps({name: out[name]}), flush=True)
    out["calib_after"] = calib(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
