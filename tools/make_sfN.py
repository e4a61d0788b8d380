"""Materialize a larger benchmark dataset by FK-consistent replication
of /root/testdata/sf0.1 (VERDICT r1 next#7: a second measured scale
point to pin the overhead-vs-throughput story).

Usage:
    python tools/make_sfN.py [--factor 10] [--src /root/testdata/sf0.1]
                             [--out /tmp/sparkgraft_sf1]
    SPARK_GRAFT_SF_DIR=/tmp/sparkgraft_sf1 python bench.py

Replication semantics (copy i of FACTOR):
  - fact/dim keys shift by i x (max_key + 1) consistently across
    tables (lineitem FKs follow orders/part/supplier), so join
    cardinalities scale exactly like a genuinely larger dataset —
    no accidental cross-copy fan-out;
  - region/nation stay fixed (TPC-H scaling keeps them constant);
  - documents get copy-tagged TOKENS for i > 0, making copies
    disjoint in shingle space: the corpus is 10x bigger with the
    same internal near-dup rate, so dedup work scales linearly
    instead of exploding on 10 identical copies of every doc;
  - embeddings roll vector dimensions by a copy-specific offset:
    norms and within-copy geometry are preserved exactly while
    cross-copy cosine decorrelates;
  - events shift event_id and user_id (same per-user session
    structure, 10x the users).

Everything is expression-only (explode over a copy array + column
arithmetic) — no driver-side loops, so the generator itself runs at
any scale.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dpe_energy_performance_analysis_etl_spark import get_spark  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross the table with copy ids 0..factor-1 (copy column: __i)."""
    copies = F.array(*[F.lit(i) for i in range(factor)])
    return df.withColumn("__i", F.explode(copies))


def _shift(col: str, span: int):
    return (F.col(col) + F.col("__i") * F.lit(span)).alias(col)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sparkgraft_sf1")
    args = ap.parse_args()

    spark = get_spark("make_sfN")
    src = {t: spark.read.parquet(f"{args.src}/{t}.parquet") for t in TABLES}

    # key spans = max + 1, one tiny agg per keyed table
    spans = {}
    for table, key in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        spans[table] = src[table].agg(F.max(key)).collect()[0][0] + 1
    user_span = src["events"].agg(F.max("user_id")).collect()[0][0] + 1

    out: dict[str, DataFrame] = {
        "region": src["region"],
        "nation": src["nation"],
    }

    c = _replicate(src["customer"], args.factor)
    out["customer"] = c.select(
        _shift("c_custkey", spans["customer"]), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    s = _replicate(src["supplier"], args.factor)
    out["supplier"] = s.select(
        _shift("s_suppkey", spans["supplier"]), "s_name", "s_nationkey", "s_acctbal"
    )
    p = _replicate(src["part"], args.factor)
    out["part"] = p.select(
        _shift("p_partkey", spans["part"]), "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    o = _replicate(src["orders"], args.factor)
    out["orders"] = o.select(
        _shift("o_orderkey", spans["orders"]),
        _shift("o_custkey", spans["customer"]),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    li = _replicate(src["lineitem"], args.factor)
    out["lineitem"] = li.select(
        _shift("l_orderkey", spans["orders"]),
        _shift("l_partkey", spans["part"]),
        _shift("l_suppkey", spans["supplier"]),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    ev = _replicate(src["events"], args.factor)
    out["events"] = ev.select(
        _shift("event_id", spans["events"]),
        "ts",
        _shift("user_id", user_span),
        "event_type",
        "value",
        "props",
    )
    # documents: tag every token with the copy id (i > 0) so copies are
    # shingle-disjoint — same dup structure per copy, 0 cross-copy pairs
    d = _replicate(src["documents"], args.factor)
    tagged = F.when(F.col("__i") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(F.lit("c"), F.col("__i").cast("string"), F.lit("x"), t),
            ),
            " ",
        )
    )
    out["documents"] = d.select(
        _shift("doc_id", spans["documents"]),
        tagged.alias("text"),
        "lang",
        "source",
        F.length(tagged).cast("long").alias("n_chars"),
    )
    # embeddings: roll dimensions by a copy-specific offset — exact
    # within-copy geometry, decorrelated across copies
    e = _replicate(src["embeddings"], args.factor)
    dim = len(src["embeddings"].select("embedding").first()[0])
    rolled = F.when(F.col("__i") == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), (F.col("__i") * 7) % dim + 1, dim),
            F.slice(F.col("embedding"), F.lit(1), (F.col("__i") * 7) % dim),
        )
    )
    out["embeddings"] = e.select(
        _shift("vec_id", spans["embeddings"]), rolled.alias("embedding"), "label"
    )

    os.makedirs(args.out, exist_ok=True)
    # Realistic file layout: any production table at this size is
    # many files, and single-file parquet serializes scans (byte-range
    # splits beyond a row group do no work). Dims stay single-file;
    # fact/corpus tables get cluster-parallelism files so benchmark
    # scan behavior matches a real deployment, not a generator quirk.
    parallel_files = spark.sparkContext.defaultParallelism
    single_file = {"region", "nation"}
    for table, df in out.items():
        writer = df if table in single_file else df.repartition(parallel_files)
        writer.write.mode("overwrite").parquet(f"{args.out}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{args.out}/{table}.parquet').count()} rows")


if __name__ == "__main__":
    main()
