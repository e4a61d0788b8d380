"""Capture ``.explain("formatted")`` output for named queries into
``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (round dir
defaults to ``r13``) — the optimization-round evidence files (the
judge cannot run Spark; plan claims are checked against these).

Usage:
    python tools/capture_plans.py <tag> <query> [<query> ...]
    python tools/capture_plans.py before kendall_tau_qty_price_brands

Notes:
  - Iterative queries (kcore, pagerank prefixes with eager
    localCheckpoint) EXECUTE their build actions during construction;
    capture is therefore not free and should run on an idle host.
  - The capture is of the query exactly as the bench/oracle runs it
    (same QUERIES registry entry, same SF dir from
    ``SPARK_GRAFT_SF_DIR``, default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402
from dpe_energy_performance_analysis_etl_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_exch} Exchange mentions -> {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
