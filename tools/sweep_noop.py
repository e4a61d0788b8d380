"""Noop-sink smoke sweep of EVERY registered query at an arbitrary SF
dir — the r13 registry-wide scale gate (the oracle gate runs at
sf0.01; this catches latent larger-SF failures like the
brown_forsythe int64-sum overflow that only fired at sf0.1).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/sweep_noop.py
    python tools/sweep_noop.py <query> [...]     # subset

Prints OK/FAIL per query with wall seconds (cold-ish: one session,
cache cleared between queries) and exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("sweep_noop")
    fails: list[str] = []
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(
                f"OK   {name} [{time.monotonic() - t0:.1f}s]"
                f" ({i + 1}/{len(names)})",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(
                f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}",
                flush=True,
            )
        spark.catalog.clearCache()
    print(f"done: {len(fails)} failures: {fails}", flush=True)
    spark.stop()
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
