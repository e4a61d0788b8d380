"""Solo min-of-3 noop-sink measurement for named queries — the
round-12 A/B methodology (guide §1.4): warm-JVM preamble
(range-sum + one full untimed build+run of the first query), then
for each query min-of-3 timed runs against the noop sink.

Usage:
    python tools/profile_solo.py <query> [<query> ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1 python tools/profile_solo.py kcore_membership

Raw seconds are comparable only within ONE invocation (CLAUDE.md:
host drifts ±60% same-day); run before/after variants back-to-back
in a single session (import-toggle or two invocations minutes apart
on an idle host, reporting both).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402


def run_once(spark, name: str, sf_dir: str) -> float:
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"profile_solo: {name}")
    t0 = time.monotonic()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        print(f"unknown or missing queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_solo")
    # Warm preamble: JVM codegen/scheduler paths (the r8 solo rule)
    spark.sparkContext.setJobDescription("profile_solo: warm preamble")
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    run_once(spark, names[0], sf_dir)  # untimed warm build
    for name in names:
        times = [run_once(spark, name, sf_dir) for _ in range(3)]
        print(
            f"{name}: min {min(times):.2f} s  (runs: "
            + ", ".join(f"{t:.2f}" for t in times)
            + ")",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
