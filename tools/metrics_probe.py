"""Load-independent structural metrics for named queries — the
round-12 adjudication instrument, committed (it lived in /tmp then).

For each named query: warm build+run once (untimed), then ONE
measured noop-sink run bracketed by Spark UI REST API snapshots, and
report the deltas: jobs, stages, tasks, shuffle read/write bytes,
input bytes. These are deterministic modulo AQE — unlike raw seconds
on this host (CLAUDE.md: ±60% same-day drift) — so before/after
comparisons of PLAN STRUCTURE survive host noise.

Usage:
    python tools/metrics_probe.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def _snapshot(spark) -> dict:
    stages = _rest(spark, "stages?status=complete")
    jobs = _rest(spark, "jobs?status=succeeded")
    return {
        "jobs": len(jobs),
        "stages": len(stages),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input": sum(s.get("inputBytes", 0) for s in stages),
    }


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        print(f"unknown or missing queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("metrics_probe")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"metrics_probe warm: {name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        before = _snapshot(spark)
        spark.sparkContext.setJobDescription(f"metrics_probe: {name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = _snapshot(spark)
        delta = {k: after[k] - before[k] for k in before}
        print(
            f"{name}: jobs {delta['jobs']}, stages {delta['stages']}, "
            f"tasks {delta['tasks']}, shuffle_write {delta['shuffle_write']/1e6:.2f} MB, "
            f"shuffle_read {delta['shuffle_read']/1e6:.2f} MB, "
            f"input {delta['input']/1e6:.2f} MB",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
