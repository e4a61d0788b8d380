"""Query registry: every operator family from SURVEY.md §2 exercised
as a (PySpark builder, DuckDB oracle SQL) pair over the driver's
TPC-H-ish tables.

Conventions that make the oracle hash-match bit-exact:
  - every computed column is aliased IDENTICALLY in Spark and SQL;
  - double aggregations go through decimal partial values at the
    SMALLEST exact scale (exact + associative => immune to float
    summation order across partitions; small scale keeps the final
    decimal->double rounding unambiguous across engines) — helper
    ``dsum``;
  - averages are ``CAST(decimal_sum AS DOUBLE) / count`` so both
    engines do one identical IEEE-754 division;
  - top-k queries always carry a unique tiebreaker in the ORDER BY.

Each builder takes ``(spark, sf_dir)`` and returns a lazy DataFrame.
The physical plans these produce are the ones you'd want at 100 TB:
filters/projections sit against the parquet scan (pushdown + pruning),
small dimensions broadcast, aggregations partial-agg map-side, and no
driver-side row loops exist anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
    epoch_double,
    epoch_micros,
    epoch_seconds,
)
from dpe_energy_performance_analysis_etl_spark.operators.exact import (
    exact_cents_sum,
    exact_sum_agg,
    from_cents,
    scaled_long,
)

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


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in (names or TABLES)}


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table with ``ts`` normalized to TIMESTAMP (LTZ)
    regardless of the parquet physical encoding the testdata generator
    chose this time: TIMESTAMP(NANOS) read as BIGINT nanoseconds
    (``nanosAsLong``), timestamp[us] UTC-adjusted (already LTZ), or
    timestamp[us] naive (TIMESTAMP_NTZ — Spark refuses numeric casts on
    it, which killed five queries in round 2). Runtime confs are set
    HERE, not only in the session factory, so the queries also work
    under a caller-provided plain SparkSession — e.g. the driver's
    harness. The session tz is pinned to UTC so the NTZ→LTZ cast is
    value-preserving against DuckDB's naive-timestamp oracle."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_time(ev, "ts", bigint_unit="ns")



def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan with the scan-parallelism guard: the testdata
    ships this table as ONE small file (one row group), which would
    serialize every expression-heavy text operator onto a single task
    (measured 10x on fingerprinting at sf1). ``scan_fanout`` is a
    no-op on many-file inputs at real scale."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

    return scan_fanout(spark.read.parquet(f"{sf_dir}/documents.parquet"))



def read_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings scan with the same parallelism guard as
    ``read_documents`` — the table ships as one small file whose
    byte-splits don't parallelize a single row group, and every
    consumer chains expensive per-row vector arithmetic."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

    return scan_fanout(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def dsum(col, scale: int = 2) -> F.Column:
    """Exact, order-independent sum of a double expression: accumulate
    as decimal(30,scale), return double.

    ``scale`` must cover the values' exact decimal places (money = 2,
    price*discount = 4, *(1+tax) = 6) and should be NO LARGER: the
    decimal sum is exact, but engines disagree on the final
    decimal->double rounding once the scaled integer exceeds 2^53
    (DuckDB converts int128 then divides; Spark rounds the BigDecimal
    directly) — measured 1-ulp mismatches at scale 8, exact at the
    minimal scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def davg(col, count_col=None, scale: int = 2) -> F.Column:
    """Exact-sum average: decimal sum cast to double, one double
    division by the count."""
    c = F.col(col) if isinstance(col, str) else col
    cnt = F.count(c) if count_col is None else F.count(count_col)
    return (F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / cnt)


def dsum_fast(col, scale: int = 2) -> F.Column:
    """Drop-in for ``dsum`` when per-group cents totals are
    structurally bounded within long capacity (high-cardinality group
    keys, or magnitudexrows ≤ ~9e18 even at 100 TB): single-level sum
    of scaled integers — codegen long adds, ~15x dsum — rescaled to
    the identical exact decimal and cast double, so the oracle SQL is
    unchanged. ANSI aborts loudly if the bound is ever wrong. For
    LOW-cardinality unbounded groups use operators.exact.exact_sum_agg
    (two-level) instead."""
    return from_cents(exact_cents_sum(col, scale), scale).cast("double")


def davg_fast(col, count_col=None, scale: int = 2) -> F.Column:
    """Exact-sum average on the long fast path (see ``dsum_fast``)."""
    c = F.col(col) if isinstance(col, str) else col
    cnt = F.count(c) if count_col is None else F.count(count_col)
    return dsum_fast(c, scale) / cnt


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# =====================================================================
# Aggregations / filters (SURVEY §2.4, §2.2)
# =====================================================================

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→groupBy→agg (TPC-H Q1 shape; reference
    analogue: silver→gold aggregate step, ``transform.py:313-376``).
    Filter pushes to parquet; partial aggregation is map-side.

    Sums use the two-level exact-cents pattern (operators/exact.py):
    long partials inside codegen + decimal(38) merge — measured ~12x
    over decimal(30) accumulation on 6M rows, bit-identical totals
    (values carry <= 6 true decimal places)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    totals = exact_sum_agg(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")),
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": ("l_quantity", 2),
            "sum_base_price": ("l_extendedprice", 2),
            "sum_disc_price": (disc_price, 4),
            "sum_charge": (charge, 6),
            "sum_disc": ("l_discount", 2),
        },
    )
    n = F.col("__n")
    return totals.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        (F.col("sum_qty").cast("double") / n).alias("avg_qty"),
        (F.col("sum_base_price").cast("double") / n).alias("avg_price"),
        (F.col("sum_disc").cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P5 — predicate + column-subset projection
    (``extract.py:410-412``, ``transform.py:264-268``); both reach the
    parquet scan (PushedFilters + ReadSchema)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "percentile_iqr",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q1,
           quantile_cont(l_quantity, 0.50) AS med,
           quantile_cont(l_quantity, 0.75) AS q3,
           quantile_cont(l_quantity, 0.25) - 1.5 * (quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)) AS lower_fence,
           quantile_cont(l_quantity, 0.75) + 1.5 * (quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)) AS upper_fence
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — exact quartiles + Tukey fences (``transform.py:120-126``),
    grouped. Exact ``percentile`` (one shuffle), not approx, for
    oracle equality."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q1 = F.expr("percentile(l_quantity, 0.25)")
    q3 = F.expr("percentile(l_quantity, 0.75)")
    return li.groupBy("l_returnflag").agg(
        q1.alias("q1"),
        F.expr("percentile(l_quantity, 0.50)").alias("med"),
        q3.alias("q3"),
        (q1 - 1.5 * (q3 - q1)).alias("lower_fence"),
        (q3 + 1.5 * (q3 - q1)).alias("upper_fence"),
    )


@register(
    "count_distinct_agg",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 — distinct-count + row-count per group
    (``extract.py:435``, ``load.py:143,148``)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum_fast("c_acctbal").alias("total_balance"),
    )


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native generalization of A-class aggs (SURVEY §2.4 notes):
    hierarchical totals in one pass."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum_fast("l_quantity").alias("sum_qty")
    )


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum_fast("o_totalprice").alias("revenue")
    )


@register(
    "pivot_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (Spark-native generalization; conditional aggregation)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum_fast("l_quantity"))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


# =====================================================================
# Joins (SURVEY §2.3)
# =====================================================================

@register(
    "join_inner_broadcast",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — inner equi-join against small dimensions
    (Enedis×BAN, ``extract.py:517-546``); dims explicitly broadcast so
    the fact side never shuffles."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@register(
    "join_left_cast_keys",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT JOIN customer c ON CAST(o.o_custkey AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    """,
)
def join_left_cast_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — left outer join with keys pre-cast to string
    (ADEME×merged, ``extract.py:570-576``), via the generic
    ``equi_join`` operator."""
    from dpe_energy_performance_analysis_etl_spark.operators import equi_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = equi_join(
        orders,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        how="left",
        cast_keys_to_string=True,
        broadcast_right=True,
    )
    return joined.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "join_anti_new_rows",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def join_anti_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4 — left anti-join (idempotent-append key filter,
    ``load.py:133-160``): customers with no completed ('F') orders —
    the complement set the idempotent loader would append."""
    from dpe_energy_performance_analysis_etl_spark.operators import anti_join_new_rows

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    existing = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join_new_rows(cust, existing, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "join_semi_exists",
    """
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) — Spark-native superset of the reference's
    join surface (SURVEY §2.3 note)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_acctbal")


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg + deterministic top-k (TPC-H Q3 shape; W1
    limit ``extract.py:412`` + W2 source-side order). Customer filter
    prunes before the join; unique tiebreaker makes LIMIT stable."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("__rev")
        )
        .select(
            "l_orderkey",
            from_cents("__rev", 4).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def _q5_plan(t: dict[str, DataFrame]) -> DataFrame:
    """The q5 logical plan over already-loaded tables — shared by the
    parquet-scan registry entry and the bucketed-layout variant (the
    two differ only in WHERE the facts come from, so there is exactly
    one definition of the join/agg semantics)."""
    joined = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .withColumnRenamed("n_name", "nation_name")
    )
    # LOW-cardinality groups with unbounded per-group totals: two-level
    # exact cents (long partials bounded per partition, decimal merge).
    return exact_sum_agg(
        joined,
        keys=["nation_name"],
        sums={"revenue": (F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)},
    ).select("nation_name", F.col("revenue").cast("double").alias("revenue"))


@register(
    "q5_regional_revenue",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join + agg (TPC-H Q5 shape): Catalyst/AQE reorders and
    broadcasts the dimension chain; only customer⋈orders⋈lineitem
    shuffles."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "supplier", "nation", "region"])
    return _q5_plan(t)


Q5_BUCKET_TABLES = ("orders", "lineitem")


def q5_bucketed_layout(spark: SparkSession, sf_dir: str, num_buckets: int = 32) -> None:
    """Materialize the q5 hot join's layout once: orders and lineitem
    bucketed on the orderkey (the super-linear shuffle the sf5
    measurement flagged — 30 M lineitem rows re-hashed every run).
    Pay the exchange at write time; every subsequent q5 (and any
    orderkey equi-join) plans a zero-Exchange sort-merge on those two
    tables. The 100 TB version of this is the table-format default:
    facts land bucketed/cluster-keyed at ingest."""
    from dpe_energy_performance_analysis_etl_spark.sources.io import write_bucketed_table

    tabs = load_tables(spark, sf_dir, list(Q5_BUCKET_TABLES))
    write_bucketed_table(tabs["orders"], "q5_orders_b", ["o_orderkey"], num_buckets, ["o_orderkey"])
    write_bucketed_table(tabs["lineitem"], "q5_lineitem_b", ["l_orderkey"], num_buckets, ["l_orderkey"])


def q5_regional_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 over the bucketed layout written by ``q5_bucketed_layout``,
    falling back to plain parquet for any table without a bucketed
    copy in the catalog. Identical results to ``q5_regional_revenue``
    — same ``_q5_plan`` — with the orders⋈lineitem exchange
    eliminated when the layout exists."""
    t = load_tables(spark, sf_dir, ["customer", "supplier", "nation", "region"])
    plain = load_tables(spark, sf_dir, list(Q5_BUCKET_TABLES))
    for tab, btab in (("orders", "q5_orders_b"), ("lineitem", "q5_lineitem_b")):
        t[tab] = (
            spark.table(btab) if spark.catalog.tableExists(btab) else plain[tab]
        )
    return _q5_plan(t)


# =====================================================================
# Dedup / distinct / set ops (SURVEY §2.4 A4-A6, §2.6)
# =====================================================================

@register(
    "dedup_full_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def dedup_full_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — full-row distinct (``extract.py:576``) on a projection."""
    from dpe_energy_performance_analysis_etl_spark.operators import dedup_full

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return dedup_full(li.select("l_returnflag", "l_linestatus", "l_shipdate"))


@register(
    "dedup_keep_first",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — deterministic keep-first dedup (``load.py:188-210``):
    each customer's earliest order, via the window variant of
    ``dedup_keys_keep_first`` (stable ordering replaces pandas'
    implicit row order)."""
    from dpe_energy_performance_analysis_etl_spark.operators import dedup_keys_keep_first

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return dedup_keys_keep_first(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        key_cols=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
    )


@register(
    "distinct_values",
    "SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL",
)
def distinct_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — distinct key harvest (dedup-before-fanout,
    ``extract.py:435``)."""
    from dpe_energy_performance_analysis_etl_spark.operators import distinct_values

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return distinct_values(cust, "c_mktsegment")


@register(
    "union_pages",
    """
    SELECT DISTINCT o_orderkey, o_custkey, o_totalprice FROM (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000
    )
    """,
)
def union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 — union of page/batch results then distinct
    (``extract.py:360-365``)."""
    from dpe_energy_performance_analysis_etl_spark.operators import union_all

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    a = orders.filter(F.col("o_orderstatus") == "F").select(*cols)
    b = orders.filter(F.col("o_totalprice") > 200000).select(*cols)
    return union_all(a, b).distinct()


@register(
    "except_set",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level EXCEPT (Spark-native set-op generalization,
    SURVEY §2.6)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.exceptAll(open_cust.distinct()).distinct()


@register(
    "intersect_set",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def intersect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.intersect(big)


# =====================================================================
# Window functions (SURVEY §2.5 generalization)
# =====================================================================

@register(
    "window_rank_lag",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           lag(o_totalprice) OVER w AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lag analytics (generalized W-class; deterministic A5
    building block)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an explicit frame."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        from_cents(F.sum(scaled_long("o_totalprice", 2)).over(w), 2).cast("double").alias("running_spend"),
    )


@register(
    "topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — W1 head-N generalized to grouped data."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


# =====================================================================
# Scalar functions (SURVEY §2.7)
# =====================================================================

@register(
    "scalar_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           TRY_CAST(regexp_replace(p_brand, '\\D', '', 'g') AS BIGINT) AS brand_num,
           concat_ws(' ', p_name, p_type) AS label,
           substr(p_type, 1, 5) AS type_prefix,
           p_retailprice / nullif(p_size, 0) AS price_per_size,
           abs(p_retailprice - 1000.0) AS abs_from_1k,
           TRY_CAST(replace('1234,56', ',', '.') AS DOUBLE) AS parsed_decimal_comma
    FROM part
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8 gallery (``extract.py:348-351``, ``transform.py:96,146-
    213``) — all codegen'd JVM expressions, zero Python in the row
    path."""
    from dpe_energy_performance_analysis_etl_spark.functions import (
        abs_diff,
        concat_with_sep,
        decimal_comma_to_double,
        extract_digits,
        safe_divide,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        extract_digits("p_brand").try_cast("bigint").alias("brand_num"),
        concat_with_sep(" ", "p_name", "p_type").alias("label"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        safe_divide("p_retailprice", F.col("p_size").cast("double")).alias("price_per_size"),
        abs_diff("p_retailprice", F.lit(1000.0)).alias("abs_from_1k"),
        decimal_comma_to_double(F.lit("1234,56")).alias("parsed_decimal_comma"),
    )


@register(
    "date_functions",
    """
    SELECT event_id,
           date_trunc('hour', ts) AS ts_hour,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(dayofweek(ts) AS BIGINT) + 1 AS dow,
           strftime(ts, '%Y_%m_%d') AS date_slug
    FROM events
    WHERE event_id < 100
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F13 — timestamp parts + file-naming date slug
    (``utils/fonctions.py:75-79``). DuckDB dayofweek is 0-based
    Sunday; Spark dayofweek is 1-based Sunday — oracle adds 1."""
    ev = read_events(spark, sf_dir)
    return ev.filter(F.col("event_id") < 100).select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.date_format("ts", "yyyy_MM_dd").alias("date_slug"),
    )


@register(
    "json_extract_props",
    """
    SELECT event_id, event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE event_id < 200
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (generalizes the reference's file-level
    JSON handling S8/S10 to column level)."""
    ev = read_events(spark, sf_dir)
    return ev.filter(F.col("event_id") < 200).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("prop_k"),
    )


# =====================================================================
# Events: time-window aggregation + sessionization (SURVEY §2.8
# generalization — same logic the streaming surface runs incrementally)
# =====================================================================

@register(
    "events_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate — the batch shape of the
    Structured-Streaming rollup (§2.8)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum_fast("value").alias("total_value"))
    )


@register(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands —
    the batch analogue of a session window with state (§2.8/U-class).
    Two window passes + one agg; all JVM-side."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# =====================================================================
# Training-data operators: text analysis, dedup families, similarity
# search, multimodal plumbing (build mandate beyond the reference)
# =====================================================================

@register(
    "text_quality",
    """
    WITH tok AS (
      SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    )
    SELECT doc_id,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_obs,
      CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_count,
      CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','is','in','that','it','for'))) AS BIGINT) AS stopword_count,
      CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
      CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','is','in','that','it','for'))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS stopword_ratio,
      CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS avg_token_len,
      least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5
        + (1.0 - least(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.25
        + least(CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','is','in','that','it','for'))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) * 5.0, 1.0) * 0.25
        AS quality_score
    FROM tok
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (length/punctuation/stopword signals)
    — all codegen'd expressions, no Python in the row path."""
    from dpe_energy_performance_analysis_etl_spark.text import quality_metrics

    docs = read_documents(spark, sf_dir)
    m = quality_metrics("text")
    return docs.select("doc_id", *[expr.alias(name) for name, expr in m.items()])


@register(
    "lang_id",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
    ), scores AS (
      SELECT doc_id,
        CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','is'))) AS BIGINT) AS en_score,
        CAST(len(list_filter(toks, t -> t IN ('le','la','les','et','des'))) AS BIGINT) AS fr_score,
        CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS BIGINT) AS de_score,
        CAST(len(list_filter(toks, t -> t IN ('el','los','las','y','es'))) AS BIGINT) AS es_score
      FROM tok
    )
    SELECT doc_id, en_score, fr_score, de_score, es_score,
      CASE WHEN en_score >= fr_score AND en_score >= de_score AND en_score >= es_score THEN 'en'
           WHEN fr_score >= de_score AND fr_score >= es_score THEN 'fr'
           WHEN de_score >= es_score THEN 'de'
           ELSE 'es' END AS predicted_lang
    FROM scores
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker function-word hit counts with a
    deterministic argmax."""
    from dpe_energy_performance_analysis_etl_spark.text import language_scores, predicted_language

    docs = read_documents(spark, sf_dir)
    s = language_scores("text")
    return docs.select(
        "doc_id",
        *[expr.alias(name) for name, expr in s.items()],
        predicted_language("text").alias("predicted_lang"),
    )


@register(
    "token_counts",
    r"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_ish_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace-word tokens + BPE-ish subword class
    count (letters / digits / punctuation split)."""
    from dpe_energy_performance_analysis_etl_spark.text import bpe_ish_token_count, token_count

    docs = read_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").alias("n_word_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_ish_tokens"),
    )


@register(
    "doc_fingerprint",
    """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text
      FROM documents
    )
    SELECT doc_id,
           md5(norm_text) AS md5_fp,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(norm_text, '.'), c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000000000000
           ) AS rolling_fp
    FROM norm
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text + polynomial
    rolling hash (base 131, mod 1e15) over its characters."""
    from dpe_energy_performance_analysis_etl_spark.text import md5_fingerprint, rolling_hash_fingerprint

    docs = read_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        md5_fingerprint("text").alias("md5_fp"),
        rolling_hash_fingerprint("text").alias("rolling_fp"),
    )


@register(
    "dedup_exact_groups",
    """
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_fp,
           min(doc_id) AS representative_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint; one
    uniform-key shuffle regardless of corpus size."""
    from dpe_energy_performance_analysis_etl_spark.dedup import exact_dup_groups

    docs = read_documents(spark, sf_dir)
    return exact_dup_groups(docs)


@register(
    "ngram_jaccard_pairs",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM tok WHERE len(t) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.05
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (the correctness
    baseline the MinHash-LSH path is validated against)."""
    from dpe_energy_performance_analysis_etl_spark.dedup import shingle_pairs_jaccard

    docs = read_documents(spark, sf_dir)
    return shingle_pairs_jaccard(docs, threshold=0.05)


@register(
    "ngram_jaccard_capped",
    ORACLE_SQL["ngram_jaccard_pairs"],
)
def ngram_jaccard_capped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The max_df skew-guard path of shingle_pairs_jaccard under the
    oracle gate (VERDICT r4 ask #5): identical semantics to
    ngram_jaccard_pairs because the cap (64) exceeds the corpus's max
    shingle df (7 at sf0.01, 25 at sf0.1 — measured), so the oracle is
    shared verbatim, but the df-count + hot-shingle filter machinery
    (the 39.9 s → 1.5 s adversarial fix) actually executes. At 100 TB
    the cap is what bounds reducer fan-in at max_df² per shingle."""
    from dpe_energy_performance_analysis_etl_spark.dedup import shingle_pairs_jaccard

    docs = read_documents(spark, sf_dir)
    return shingle_pairs_jaccard(docs, threshold=0.05, max_df=64)


@register(
    "embedding_cosine_topk",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM n q JOIN n c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors (vec_id <
    10): broadcast queries, scan corpus once, window top-k. Exact —
    the ANN baseline."""
    from dpe_energy_performance_analysis_etl_spark.similarity import brute_force_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    out = brute_force_topk(emb, queries_df, k=5)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "embedding_near_dup",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    )
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.5
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs
    baseline)."""
    from dpe_energy_performance_analysis_etl_spark.dedup import embedding_near_dup_pairs

    emb = read_embeddings(spark, sf_dir)
    return embedding_near_dup_pairs(emb, threshold=0.5)


@register(
    "binary_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           lower(hex(encode(substring(text, 1, 8)))) AS header_hex
    FROM documents
    """,
)
def binary_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque-binary metadata (size, content
    hash, magic-header hex) — the modality-agnostic dedup/integrity
    layer, computed here over text-as-bytes."""
    docs = read_documents(spark, sf_dir)
    bin_col = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(bin_col).cast("bigint").alias("n_bytes"),
        F.md5(bin_col).alias("content_md5"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "utf-8"))).alias("header_hex"),
    )


# ---- rows-only queries (hash-based algorithms not expressible in
# portable SQL; the driver records row-count checks, and tests/
# validate them against the exact baselines) ----

@register("minhash_lsh_pairs")
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified by exact Jaccard —
    the shuffle-bounded scale path (64 perms × 16 bands)."""
    from dpe_energy_performance_analysis_etl_spark.dedup import minhash_lsh_pairs

    docs = read_documents(spark, sf_dir)
    return minhash_lsh_pairs(docs, threshold=0.05)


@register("simhash_near_dups")
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 over 64-bit signatures,
    pigeonhole candidate generation)."""
    from dpe_energy_performance_analysis_etl_spark.dedup import simhash_near_dup_pairs

    docs = read_documents(spark, sf_dir)
    return simhash_near_dup_pairs(docs)


@register("ann_lsh_topk")
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets (recall
    measured against brute force in tests)."""
    from dpe_energy_performance_analysis_etl_spark.similarity import lsh_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries_df, dim=64, k=5, num_planes=4, num_tables=12)


# =====================================================================
# Temporal joins (custom operators Spark lacks natively) + extended
# function/window/SQL-API coverage
# =====================================================================

@register(
    "asof_join_events",
    """
    SELECT l.user_id, l.ts, l.event_id, l.click_value, r.view_value
    FROM (SELECT user_id, ts, event_id, value AS click_value
          FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts AS rts, value AS view_value
                    FROM events WHERE event_type = 'view') r
    ON l.user_id = r.user_id AND l.ts >= r.rts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent prior view.
    Union-and-window implementation — one shuffle+sort, no nested
    loop (operators/temporal.py); oracle is DuckDB's native ASOF."""
    from dpe_energy_performance_analysis_etl_spark.operators import asof_join

    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    return asof_join(clicks, views, on="user_id", right_payload=["view_value"], suffix="")


@register(
    "range_join_events",
    """
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           epoch(b.ts) - epoch(a.ts) AS delta_sec
    FROM events a
    JOIN events b ON a.user_id = b.user_id
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
      AND a.event_id != b.event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: same-user event pairs within 10 minutes,
    via time-bucketed candidates (operators/temporal.py) instead of a
    per-key cross product."""
    from dpe_energy_performance_analysis_etl_spark.operators import range_join_bucketed

    ev = read_events(spark, sf_dir)
    left = ev.select("user_id", "ts", F.col("event_id").alias("event_a"))
    right = ev.select(
        "user_id", F.col("ts").alias("ts_b"), F.col("event_id").alias("event_b")
    )
    joined = range_join_bucketed(left, right, on="user_id", window_seconds=600, right_ts="ts_b")
    return joined.filter(F.col("event_a") != F.col("event_b")).select(
        "user_id",
        "event_a",
        "event_b",
        (epoch_double("ts_b") - epoch_double("ts")).alias("delta_sec"),
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_padded,
           split_part(p_type, ' ', 1) AS type_head,
           replace(p_brand, '#', '-') AS brand_dashed,
           reverse(p_name) AS name_rev,
           strpos(p_name, 'a') AS first_a,
           p_name LIKE '%green%' AS has_green,
           trim(concat('  ', p_brand, '  ')) AS trimmed,
           repeat(p_brand, 2) AS brand_twice
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface (F-class generalization)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.col("p_name").like("%green%").alias("has_green"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
    )


@register(
    "null_conditional_functions",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 5000.0) AS bal_cap5k,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_band,
           c_acctbal IS NULL AS bal_is_null,
           ifnull(c_name, 'anon') AS name_or_anon
    FROM customer
    """,
)
def null_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling + conditional surface (coalesce/nullif/case —
    the machinery behind the reference's default-fill SO2)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.ifnull(F.col("c_name"), F.lit("anon")).alias("name_or_anon"),
    )


@register(
    "math_functions",
    """
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_round1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_retailprice - 1500.0) AS price_dist,
           CAST(sign(p_retailprice - 1500.0) AS DOUBLE) AS price_sign,
           p_partkey % 7 AS key_mod7,
           CAST(power(p_size, 2) AS DOUBLE) AS size_sq,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
    FROM part
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-result math surface (round/floor/ceil/abs/sign/mod/
    integer powers/sqrt — all IEEE-deterministic; transcendentals are
    deliberately excluded from oracle checks: libm last-ulp variance).

    The oracle casts align DuckDB's output types with Spark's, not the
    values: DuckDB floor/ceil return DOUBLE where Spark returns BIGINT,
    and DuckDB sign returns TINYINT where Spark signum returns DOUBLE —
    a type-sensitive value hash differs even when every value matches."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_round1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_retailprice") - 1500.0).alias("price_dist"),
        F.signum(F.col("p_retailprice") - 1500.0).alias("price_sign"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
        F.pow(F.col("p_size"), 2).alias("size_sq"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
    )


@register(
    "grouping_sets_sql",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan as the
    DataFrame rollup/cube path; shows the engine's SQL surface)."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "sql_in_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      AND o_orderstatus = 'F'
    """,
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery through the SQL API (planned as a left-semi join)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders_sq")
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_sq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq WHERE c_acctbal > 9000)
          AND o_orderstatus = 'F'
        """
    )


@register(
    "window_analytics_extended",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           lead(o_totalprice, 1, -1.0) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS smallest_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / lead-with-default /
    first_value — the full analytic window surface."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("smallest_price"),
    )


@register(
    "pandas_udf_parity",
    """
    SELECT doc_id, CAST(length(text) * 2 + 1 AS BIGINT) AS udf_feature
    FROM documents
    """,
)
def pandas_udf_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — Arrow-vectorized scalar pandas UDF with an oracle check:
    proves the Python batch path computes exactly what the SQL says
    (the reference's row-wise ``apply`` lambdas, done right)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # real (non-stringified) annotations: this module uses
    # `from __future__ import annotations`, which would turn the hints
    # into strings pandas_udf can't resolve
    def _feature(s):
        return s.str.len() * 2 + 1

    _feature.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf_feature = pandas_udf(_feature, "bigint")

    docs = read_documents(spark, sf_dir)
    return docs.select("doc_id", udf_feature(F.col("text")).alias("udf_feature"))


@register("grouped_stats_udaf")
def grouped_stats_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — grouped-map applyInPandas UDAF (paired t-test + Wilcoxon
    per event_type, reference ``make_statistical_metrics``
    semantics). Rows-only: scipy-style p-values aren't SQL."""
    from dpe_energy_performance_analysis_etl_spark.operators import group_stats_dpe

    ev = read_events(spark, sf_dir).withColumn(
        "value_estimate", F.col("value") * 0.9 + 1.0
    )
    return group_stats_dpe(
        ev,
        group_col="event_type",
        measured_col="value",
        estimated_col="value_estimate",
    )


@register("approx_distinct")
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (rows-only: sketch estimates
    are engine-specific; tests bound the error vs exact count)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


# =====================================================================
# Statistical moments from exact sums, binning, reshaping (unpivot /
# posexplode) — final §2-generalization batch
# =====================================================================

@register(
    "stats_moments",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           sx / n AS mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price
    FROM s
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / covariance computed FROM EXACT sums (sum,
    sum-of-squares, cross-sum) — deterministic across partition orders
    and engines, unlike the streaming variance built-ins. Sums run as
    two-level exact cents (operators/exact.py): long partials +
    decimal(38) merge, ~12x over decimal(30) accumulation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = exact_sum_agg(
        li,
        keys=["l_returnflag"],
        sums={
            "sx": ("l_quantity", 2),
            "sxx": (F.col("l_quantity") * F.col("l_quantity"), 4),
            "sy": ("l_extendedprice", 2),
            "sxy": (F.col("l_quantity") * F.col("l_extendedprice"), 4),
        },
    ).withColumnRenamed("__n", "n")
    s = s.select(
        "l_returnflag",
        "n",
        F.col("sx").cast("double").alias("sx"),
        F.col("sxx").cast("double").alias("sxx"),
        F.col("sy").cast("double").alias("sy"),
        F.col("sxy").cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "sxy"))
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_price"),
    )


@register(
    "histogram_bins",
    """
    SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS bin_sum
    FROM events
    GROUP BY 1
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value binning (histogram) — groupBy on a computed
    bucket key; the at-scale shape for distribution profiling."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.floor(F.col("value") / 5.0).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"), dsum_fast("value").alias("bin_sum"))
    )


@register(
    "unpivot_melt",
    """
    SELECT l_orderkey, l_linenumber, name, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax FROM lineitem)
    UNPIVOT (value FOR name IN (l_quantity, l_discount, l_tax))
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (melt): native ``unpivot`` — the inverse of
    the pivot surface."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax").unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="name",
        valueColumnName="value",
    )


@register(
    "posexplode_embeddings",
    """
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS BIGINT) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def posexplode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array→rows with ordinality (posexplode) — the long-format view
    of an embedding column (DuckDB oracle zips parallel unnests)."""
    emb = read_embeddings(spark, sf_dir)
    return (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("bigint").alias("pos"), F.col("val").cast("double").alias("val"))
    )


@register("ann_ivf_topk")
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF (k-means coarse quantizer, exact-
    decimal centroid training, nprobe cluster probing) — the second
    scale path next to hyperplane LSH. Rows-only: k-means assignments
    aren't portable SQL."""
    from dpe_energy_performance_analysis_etl_spark.similarity import ivf_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries_df, k=5, n_clusters=16, nprobe=6)


# =====================================================================
# TPC-H-shaped query-pattern breadth: correlated EXISTS, conditional
# ratios, HAVING, OR-of-ANDs, scalar subqueries
# =====================================================================

@register(
    "q4_priority_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an inequality on both relations (TPC-H
    Q4 shape) — planned as a left-semi join, no subquery re-execution."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("q4_orders")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("q4_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM q4_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM q4_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "q12_priority_case_sum",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_case_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counting via CASE inside SUM (TPC-H Q12 shape)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_ratio",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
                     ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional revenue ratio (TPC-H Q14 shape) — both the guarded
    and total sums go through exact decimals before ONE double
    division."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(part, li.l_partkey == part.p_partkey).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    totals = exact_sum_agg(joined, keys=[], sums={"p": (promo, 4), "v": (rev, 4)})
    return totals.select(
        (100.0 * F.col("p").cast("double") / F.col("v").cast("double")).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q18_large_orders_having",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, t.total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 150
    ) t ON o.o_orderkey = t.l_orderkey
    """,
)
def q18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING + join back (TPC-H Q18 shape)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(from_cents(F.sum(scaled_long("l_quantity", 2)), 2).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "total_qty"
    )


@register(
    "q19_or_of_ands",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive ranges (TPC-H Q19 shape) — Catalyst
    pushes the common parts and plans one join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 50))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    totals = exact_sum_agg(j.filter(b), keys=[], sums={"revenue": (rev, 4)})
    return totals.select(
        F.col("revenue").cast("double").alias("revenue"), F.col("__n").alias("n_lines")
    )


@register(
    "q22_balance_subquery",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(c_acctbal) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substring(c.c_name, 1, 9) AS name_prefix,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
    GROUP BY 1
    """,
)
def q22_balance_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold + anti-join + grouped aggregate
    (TPC-H Q22 shape); the average is computed from exact sums so the
    threshold comparison is engine-identical."""
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("q22_customer")
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("q22_orders")
    return spark.sql(
        """
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(c_acctbal) AS v
          FROM q22_customer WHERE c_acctbal > 0
        )
        SELECT substring(c.c_name, 1, 9) AS name_prefix,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
        FROM q22_customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.v
          AND NOT EXISTS (SELECT 1 FROM q22_orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
        GROUP BY 1
        """
    )


@register(
    "q7_nation_pair_revenue",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name != sn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade flows (TPC-H Q7 shape): two aliases of the
    same dimension joined under different roles + year extraction."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"])
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(dsum_fast(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "q10_returned_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue top-20 (TPC-H Q10 shape)."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(dsum_fast(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "json_struct_parse",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.missing') AS absent_field
    FROM events
    WHERE event_id < 300
    """,
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: ``from_json`` with a declared schema (the
    production path for semi-structured columns — parse once into a
    struct, then columnar access; missing fields are NULL)."""
    ev = read_events(spark, sf_dir)
    parsed = F.from_json("props", "k BIGINT, missing STRING")
    return ev.filter(F.col("event_id") < 300).select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("missing").alias("absent_field"),
    )


@register(
    "deterministic_sample",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE ((l_orderkey * 2654435761 + l_linenumber) % 100 + 100) % 100 < 10
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample via multiplicative key hashing —
    unlike ``df.sample``, independent of partitioning and engine, so
    train/eval splits are stable across runs and reruns (a
    training-data-pipeline requirement)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bucket = F.pmod(F.col("l_orderkey") * 2654435761 + F.col("l_linenumber"), F.lit(100))
    return li.filter(bucket < 10).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_min(embedding) AS DOUBLE) AS min_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface: size / element access / min-max /
    filtered counts — the building blocks under the embedding
    operators, exposed directly."""
    emb = read_embeddings(spark, sf_dir)
    e = F.col("embedding")
    return emb.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.size(e).cast("bigint").alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_val"),
        F.element_at(e, -1).cast("double").alias("last_val"),
        F.array_max(e).cast("double").alias("max_val"),
        F.array_min(e).cast("double").alias("min_val"),
        F.size(F.filter(e, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_value
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user rolling 1-hour sum — the
    value-based frame (vs the row-based frames elsewhere). Frame
    boundaries computed on microsecond epochs so both engines bound
    identically."""
    ev = read_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        from_cents(F.sum(scaled_long("value", 2)).over(w), 2).cast("double").alias("rolling_1h_value"),
    )


# =====================================================================
# TPC-H remainder — adapted to the reduced test schemas (no partsupp /
# receiptdate / container columns), preserving each query's PLAN SHAPE:
# the join graphs, subquery decorrelations, and aggregate structures
# Catalyst must optimize are the ones the official queries exercise.
# =====================================================================


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan→filter→scalar agg. Every predicate
    reaches the parquet scan (PushedFilters); the agg is one partial +
    one final with no shuffle key — the cheapest possible 100 TB plan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return exact_sum_agg(
        filtered,
        keys=[],
        sums={"revenue": (F.col("l_extendedprice") * F.col("l_discount"), 4)},
    ).select(F.col("revenue").cast("double").alias("revenue"))


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving unmatched customers,
    double aggregation (per-customer count, then histogram of counts).
    The second agg's input is only |customer| rows — cheap at scale."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN → broadcast anti join (keys are
    non-null so the semantics coincide), dimension filter broadcast,
    COUNT(DISTINCT) per group."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    pt = t["part"].filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey AS ap_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.ap_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size < 5
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + self-join — written identically
    in the oracle so both engines run the same decorrelated plan."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    avg_qty = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(davg_fast("l_quantity").alias("avg_qty"))
    )
    pt = t["part"].filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5)).select("p_partkey")
    return (
        t["lineitem"]
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum_fast("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (l_returnflag='R' stands in for the missing
    receipt>commit predicate): EXISTS → left-semi and NOT EXISTS →
    left-anti self-joins, each with an equi key plus a non-equi
    residual (planner shuffles on the key, filters the residual)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    li = t["lineitem"]
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nat = t["nation"].filter(F.col("n_name") == "NATION_7").select("n_nationkey")
    sup = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(fo, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey")) & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey")) & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q20_part_suppliers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS DOUBLE) > 150.0
      )
    """,
)
def q20_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (lineitem stands in for partsupp availability):
    IN-subquery with its own join+agg+HAVING → left-semi join against
    the aggregated key set."""
    t = load_tables(spark, sf_dir, ["supplier", "nation", "lineitem", "part"])
    pt = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum_fast("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 150.0)
        .select("l_suppkey")
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT c.l_partkey, c.unit_cost, s.s_acctbal, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, e.unit_cost
    FROM eu e
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
      AND e.unit_cost = (SELECT MIN(e2.unit_cost) FROM eu e2 WHERE e2.l_partkey = e.l_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (observed min unit price stands in for
    ps_supplycost): correlated MIN subquery decorrelated into a
    per-part aggregate joined back on (key, min-value) equality.
    unit_cost is a single IEEE division in both engines, so the
    double equality is exact."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation", "region", "part"])
    # Filter pushdown BEFORE the expensive agg: the correlated MIN is
    # probed only at filtered partkeys, and restricting eu's rows to
    # those parts leaves every probed per-part min unchanged, so the
    # (broadcast) part filter can jump in front of the aggregation.
    pt = t["part"].filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")).select("p_partkey")
    eu_dim = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cost = (
        t["lineitem"]
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # argmin per part via a window (one shuffle, no self-join — the
    # grouped rows are already partitioned compatibly)
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(eu_dim, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END AS DECIMAL(30,4))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(30,4))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND p.p_type = 'ECONOMY'
    ) v
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-table join with the nation dimension in two
    roles, conditional share = ratio of two exact decimal sums."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"])
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("nation") == "NATION_5", volume).otherwise(F.lit(0.0))
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
              F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
        )
        .select(F.year("o_orderdate").cast("int").alias("o_year"), volume.alias("__vol"), national.alias("__nat"))
    )
    totals = exact_sum_agg(
        joined, keys=["o_year"], sums={"n": ("__nat", 4), "v": ("__vol", 4)}
    )
    return totals.select(
        "o_year",
        (F.col("n").cast("double") / F.col("v").cast("double")).alias("mkt_share"),
    )


@register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(30,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (0.5*retailprice*quantity stands in for
    ps_supplycost*quantity): LIKE-filtered part dimension drives the
    join, profit expression evaluated with identical operator
    association in both engines."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "part", "orders", "nation"])
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").like("%gear%")).select("p_partkey", "p_retailprice"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("nation", F.year("o_orderdate").cast("int").alias("o_year"), amount.alias("__amt"))
    )
    return exact_sum_agg(joined, keys=["nation", "o_year"], sums={"sum_profit": ("__amt", 4)}).select(
        "nation", "o_year", F.col("sum_profit").cast("double").alias("sum_profit")
    )


@register(
    "q11_important_parts",
    """
    SELECT l.l_partkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_9'
    GROUP BY l.l_partkey
    HAVING CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) >
      (SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) * 0.001
       FROM lineitem l2
       JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
       JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       WHERE n2.n_name = 'NATION_9')
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value stands in for partsupp stock):
    group agg filtered by a global-scalar subquery — the scalar is a
    1-row broadcast cross join, the threshold an exact decimal sum so
    both engines compare identical doubles."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    nat = t["nation"].filter(F.col("n_name") == "NATION_9").select("n_nationkey")
    sup = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    base = t["lineitem"].join(sup, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey", "l_extendedprice"
    )
    value = base.groupBy("l_partkey").agg(dsum_fast("l_extendedprice").alias("value"))
    threshold = exact_sum_agg(base, keys=[], sums={"t": ("l_extendedprice", 2)}).select(
        (F.col("t").cast("double") * 0.001).alias("threshold")
    )
    return (
        value.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view consumed twice (argmax
    via self-join on the MAX scalar). Exact decimal sums make the
    double equality deterministic across engines."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_fast(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(t["supplier"].select("s_suppkey", "s_name"),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# =====================================================================
# Oracle-checked twins of the sketch/ANN operators: the SAME pipeline
# (minhash permutations + banding; IVF assign/probe) expressed with
# engine-neutral hashes / deterministic seeds so DuckDB can replay it
# bit-exactly — upgrading these families from rows-only to value-
# hash-checked in the driver gate.
# =====================================================================

from dpe_energy_performance_analysis_etl_spark.dedup.minhash import _hash_params as _mh_params  # noqa: E402

_PMH_PERMS = 16
_PMH_BANDS = 4
_PMH_ROWS = _PMH_PERMS // _PMH_BANDS


def _portable_minhash_oracle() -> str:
    params = _mh_params(_PMH_PERMS, seed=42)
    mins = ",\n             ".join(
        f"MIN(({a} * x + {b}) % 2147483647) AS h{i}" for i, (a, b) in enumerate(params)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {band} AS band, {key} AS key FROM sig".format(
            band=i,
            key=" || ',' || ".join(
                f"CAST(h{i * _PMH_ROWS + j} AS VARCHAR)" for j in range(_PMH_ROWS)
            ),
        )
        for i in range(_PMH_BANDS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM tok WHERE len(t) >= 3
    ), hx AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(shingle, '.'), c -> CAST(ascii(c) AS BIGINT))),
               (acc, ch) -> (acc * 131 + ch) % 2147483647
             ) AS x
      FROM sh
    ), sig AS (
      SELECT doc_id,
             {mins}
      FROM hx GROUP BY doc_id
    ), bands AS (
      {band_rows}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.05
    """


@register("minhash_lsh_portable_pairs", _portable_minhash_oracle())
def minhash_lsh_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable MinHash-LSH near-dup pairs: the identical permutation/
    banding pipeline as ``minhash_lsh_pairs`` with engine-neutral
    hashes (rolling shingle hash, plain-string band keys), so the
    DuckDB oracle replays every candidate and verification decision
    bit-exactly. 16 perms × 4 bands keeps the oracle SQL finite."""
    from dpe_energy_performance_analysis_etl_spark.dedup import minhash_lsh_pairs

    docs = read_documents(spark, sf_dir)
    return minhash_lsh_pairs(
        docs, num_perm=_PMH_PERMS, bands=_PMH_BANDS, threshold=0.05, portable=True
    )


@register(
    "ann_ivf_seeded_topk",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), cents AS (
      SELECT vec_id AS cluster, v AS centroid, nrm AS centnorm FROM n WHERE vec_id < 8
    ), assigned AS (
      SELECT vec_id AS neighbor_id, v AS cvec, nrm AS cnorm, cluster FROM (
        SELECT c.vec_id, c.v, c.nrm, ct.cluster,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_dot_product(c.v, ct.centroid) / (c.nrm * ct.centnorm) DESC, ct.cluster) AS ar
        FROM n c CROSS JOIN cents ct
      ) WHERE ar = 1
    ), probed AS (
      SELECT query_id, qvec, qnorm, cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qvec, q.nrm AS qnorm, ct.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, ct.centroid) / (q.nrm * ct.centnorm) DESC, ct.cluster) AS qr
        FROM n q CROSS JOIN cents ct WHERE q.vec_id < 10
      ) WHERE qr <= 2
    ), scored AS (
      SELECT p.query_id, a.neighbor_id,
             list_dot_product(p.qvec, a.cvec) / (p.qnorm * a.cnorm) AS cosine
      FROM probed p JOIN assigned a ON p.cluster = a.cluster
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_ivf_seeded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-seed IVF ANN (centroids = vectors with id < 8,
    nprobe=2): same plan shape as the k-means ``ann_ivf_topk`` but
    fully replayable in SQL — the oracle checks assignment, probing,
    and top-k bit-exactly."""
    from dpe_energy_performance_analysis_etl_spark.similarity import seeded_ivf_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    out = seeded_ivf_topk(emb, queries_df, k=5, n_clusters=8, nprobe=2)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_PSH_BITS = 28
_PSH_CHUNKS = 4
_PSH_MAXHAM = 3


def _portable_simhash_oracle() -> str:
    bpc = _PSH_BITS // _PSH_CHUNKS
    vsums = ",\n             ".join(
        f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_PSH_BITS)
    )
    bitsum = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_PSH_BITS)
    )
    chunked = "\n      UNION ALL ".join(
        f"SELECT doc, simhash, {i} AS chunk, (simhash >> {i * bpc}) & {(1 << bpc) - 1} AS chunk_val FROM sig"
        for i in range(_PSH_CHUNKS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
    ), hx AS (
      SELECT doc,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(t, '.'), c -> CAST(ascii(c) AS BIGINT))),
               (acc, ch) -> (acc * 131 + ch) % 2147483647
             ) AS h
      FROM tok
    ), votes AS (
      SELECT doc, {vsums}
      FROM hx GROUP BY doc
    ), sig AS (
      SELECT doc, CAST({bitsum} AS BIGINT) AS simhash FROM votes
    ), chunked AS (
      {chunked}
    ), cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM chunked a
      JOIN chunked b ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc < b.doc
    )
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN sig sa ON sa.doc = c.doc_a
    JOIN sig sb ON sb.doc = c.doc_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {_PSH_MAXHAM}
    """


@register("simhash_portable_near_dups", _portable_simhash_oracle())
def simhash_portable_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable SimHash near-dup pairs: identical vote/pigeonhole
    pipeline as ``simhash_near_dups`` with the rolling token hash over
    a 28-bit signature (4 chunks × 7 bits), so the DuckDB oracle
    replays every signature bit and candidate decision bit-exactly."""
    from dpe_energy_performance_analysis_etl_spark.dedup import simhash_near_dup_pairs

    docs = read_documents(spark, sf_dir)
    out = simhash_near_dup_pairs(
        docs, max_hamming=_PSH_MAXHAM, chunks=_PSH_CHUNKS, bits=_PSH_BITS, portable=True
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


def _lsh_topk_oracle(num_planes: int = 4, num_tables: int = 12, seed: int = 7, k: int = 5) -> str:
    from dpe_energy_performance_analysis_etl_spark.similarity.ann import _plane_signs

    table_selects = []
    for t in range(num_tables):
        planes = _plane_signs(num_planes, 64, seed + 1000 * t)
        bucket = " + ".join(
            "(CASE WHEN list_dot_product(v, [{c}]) > 0 THEN {w} ELSE 0 END)".format(
                c=", ".join(f"{float(s)}" for s in plane), w=1 << p
            )
            for p, plane in enumerate(planes)
        )
        table_selects.append(
            f"SELECT vec_id, {t} AS tbl, CAST({bucket} AS BIGINT) AS bucket FROM n"
        )
    buckets = "\n      UNION ALL ".join(table_selects)
    return f"""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), nn AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n
    ), bk AS (
      {buckets}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bk c JOIN bk q ON c.tbl = q.tbl AND c.bucket = q.bucket
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qq.v, cc.v) / (qq.nrm * cc.nrm) AS cosine
      FROM cand
      JOIN nn qq ON qq.vec_id = query_id
      JOIN nn cc ON cc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


ORACLE_SQL["ann_lsh_topk"] = _lsh_topk_oracle()
QUERIES["ann_lsh_topk"] = lambda spark, sf_dir: ann_lsh_topk_q(spark, sf_dir).withColumn(
    "rank", F.col("rank").cast("bigint")
)


# =====================================================================
# Training-data pipeline breadth, batch 2: dedup clustering, TF-IDF,
# corpus cleaning, time-series resampling, cohort/funnel analytics
# =====================================================================

_JACCARD_EDGES_SQL = """
    tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM tok WHERE len(t) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.05
    )
"""


@register(
    "dedup_clusters_cc",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    und AS (
      SELECT doc_a AS s, doc_b AS d FROM edges
      UNION ALL
      SELECT doc_b, doc_a FROM edges
    ), reach(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.d, r.comp FROM reach r JOIN und u ON u.s = r.node WHERE r.comp < u.d
    ), labels AS (
      SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY node
    )
    SELECT l.doc_id, l.component,
           COUNT(*) OVER (PARTITION BY l.component) AS cluster_size,
           l.doc_id = l.component AS is_canonical
    FROM labels l
    """,
)
def dedup_clusters_cc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: word-3-gram Jaccard pairs as
    edges, connected components via iterative min-label propagation
    (dedup/cluster.py), canonical survivor = min doc_id per component.
    Oracle is a recursive CTE computing the same closure. This is the
    missing step between pair generation and actual corpus dedup
    (reference stops at full-row drop_duplicates, load.py:188-210)."""
    from dpe_energy_performance_analysis_etl_spark.dedup import (
        dedup_clusters,
        shingle_pairs_jaccard,
    )

    docs = read_documents(spark, sf_dir)
    edges = shingle_pairs_jaccard(docs, threshold=0.05).select("doc_a", "doc_b")
    return dedup_clusters(docs, edges)


@register(
    "tfidf_top_terms",
    """
    WITH tokens AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT doc_id, t.term, tf, df,
             CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
      FROM tf t JOIN dfreq d ON t.term = d.term
    )
    SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by tf/df weighting (rational
    idf — exact in IEEE double on both engines, unlike log-based idf
    which can differ by 1 ulp across libm implementations). Plan:
    explode → (doc,term) partial-agg → tiny vocab agg broadcast back
    → window top-k. The vocab table is orders of magnitude smaller
    than the corpus, so the join is a broadcast at any scale."""
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    tokens = docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, on="term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rn")
    )


@register(
    "text_clean_corpus",
    """
    WITH cleaned AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), kept AS (
      SELECT doc_id, toks,
             list_filter(toks, x -> x NOT IN ('the','a','and','of','to','is','in','that','it','for')) AS keep
      FROM cleaned
    )
    SELECT doc_id,
           array_to_string(keep, ' ') AS clean_text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(keep) AS BIGINT) AS n_stop_removed
    FROM kept
    """,
)
def text_clean_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning: normalize case/punctuation, drop stopwords,
    emit cleaned text + removal counts. Pure codegen'd column
    expressions (no Python in the row path) — runs at scan speed on
    a 100 TB corpus."""
    from dpe_energy_performance_analysis_etl_spark.text import STOPWORDS, tokens_expr

    docs = read_documents(spark, sf_dir)
    toks = tokens_expr("text")
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    kept = F.filter(toks, lambda x: ~F.array_contains(stop_lit, x))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("bigint").alias("n_stop_removed"),
    )


@register(
    "events_resample_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), counts AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type, COALESCE(c.n, 0) AS n_events
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
    """,
)
def events_resample_gapfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: dense (hour × type)
    spine via sequence+explode, left-joined against the hourly
    counts, zeros where no events. The spine is generated, never
    scanned — at 100 TB only the one groupBy over the raw events
    shuffles; the spine and type dim both broadcast."""
    ev = read_events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, on=["hour", "event_type"], how="left")
        .select("hour", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n_events"))
    )


@register(
    "cohort_retention",
    """
    WITH first_order AS (
      SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort_month
      FROM orders GROUP BY 1
    ), activity AS (
      SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS active_month
      FROM orders
    )
    SELECT f.cohort_month,
           CAST(datediff('month', f.cohort_month, a.active_month) AS BIGINT) AS month_offset,
           COUNT(*) AS n_customers
    FROM activity a JOIN first_order f ON a.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers bucketed by first-order
    month, counted per month-offset of later activity. Both inputs
    derive from one scan partitioned by o_custkey; the cohort side is
    per-customer (small) and broadcasts."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    first_order = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    activity = orders.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("active_month")
    ).distinct()
    return (
        activity.join(first_order, on="o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("active_month"), F.col("cohort_month"))
            .cast("bigint")
            .alias("month_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "funnel_stages",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'signup') AS t1
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT s1.user_id, MAX(s1.t1) AS t1,
             MIN(CASE WHEN e.event_type = 'view' AND e.ts > s1.t1 THEN e.ts END) AS t2
      FROM s1 JOIN events e ON e.user_id = s1.user_id
      GROUP BY s1.user_id
    ), s3 AS (
      SELECT s2.user_id, MAX(s2.t2) AS t2,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2 THEN e.ts END) AS t3
      FROM s2 JOIN events e ON e.user_id = s2.user_id
      GROUP BY s2.user_id
    )
    SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_ord, COUNT(t1) AS n_users FROM s1
    UNION ALL
    SELECT 'view', CAST(2 AS BIGINT), COUNT(t2) FROM s2
    UNION ALL
    SELECT 'purchase', CAST(3 AS BIGINT), COUNT(t3) FROM s3
    """,
)
def funnel_stages_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: stage k
    time = earliest stage-k event strictly after the user's stage-k-1
    time (true sequential funnel, not independent mins).

    Plan: ONE hash exchange on user_id, then three unbounded-frame
    window mins over that same partitioning (stage k's predicate
    references stage k-1's window result — legal because each window
    pass sees the previous pass's column) and a per-user collapse
    that also reuses the partitioning. The naive join-per-stage
    formulation (the oracle SQL's shape) costs 18 exchanges; this one
    costs 1 + the three single-row final aggregates. Per-user state
    never leaves the executors."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view"),
        F.count("t3").alias("n_purchase"),
    )
    # one aggregate, unpivoted to (stage, ord, count) rows — referencing
    # the per-user subtree three times would re-plan it three times
    return counts.select(
        F.expr(
            "stack(3, 'signup', 1L, n_signup, 'view', 2L, n_view, "
            "'purchase', 3L, n_purchase) AS (stage, stage_ord, n_users)"
        )
    )


# =====================================================================
# Incremental warehouse maintenance (operators/incremental.py)
# =====================================================================

@register(
    "scd2_customer_segments",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer WHERE c_custkey % 3 != 0
    ), upd AS (
      SELECT o_custkey AS c_custkey,
             o_orderpriority AS segment,
             o_orderdate AS change_ts
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT d.c_custkey, d.segment, d.valid_from,
           CASE WHEN u.c_custkey IS NOT NULL AND u.segment IS DISTINCT FROM d.segment
                THEN u.change_ts ELSE d.valid_to END AS valid_to,
           CASE WHEN u.c_custkey IS NOT NULL AND u.segment IS DISTINCT FROM d.segment
                THEN FALSE ELSE d.is_current END AS is_current
    FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey
    UNION ALL
    SELECT u.c_custkey, u.segment, u.change_ts, CAST(NULL AS TIMESTAMP), TRUE
    FROM upd u JOIN dim d ON d.c_custkey = u.c_custkey
    WHERE u.segment IS DISTINCT FROM d.segment
    UNION ALL
    SELECT u.c_custkey, u.segment, u.change_ts, CAST(NULL AS TIMESTAMP), TRUE
    FROM upd u WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.c_custkey = u.c_custkey)
    """,
)
def scd2_customer_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge exercise: a segment dimension (seeded from 2/3 of
    customers so the new-key insert path is non-empty) updated with
    each customer's latest order priority. All three paths fire:
    close+reopen on change, pass-through on no-op, insert on new key.
    One shuffle on the key; history rows never re-shuffle."""
    from dpe_energy_performance_analysis_etl_spark.operators import scd2_merge

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = cust.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    updates = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("segment"),
            F.col("o_orderdate").alias("change_ts"),
        )
    )
    return scd2_merge(dim, updates, key="c_custkey", tracked=["segment"])


@register(
    "incremental_agg_merge",
    """
    SELECT o_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_spend,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_agg_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: per-customer order stats
    kept as mergeable state (count/decimal-sum/min/max are
    commutative monoids). Spark computes state for pre-1997 orders,
    state for the 1997+ delta, and MERGES them; the oracle recomputes
    from scratch — bit-equality proves merge == recompute, the
    property that lets a 100 TB aggregate absorb a daily batch at
    delta cost."""
    from dpe_energy_performance_analysis_etl_spark.operators import (
        agg_state,
        merge_agg_state,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    specs = {
        "n_orders": ("count", "o_orderkey"),
        "sum_spend": ("sum_dec2", "o_totalprice"),
        "first_order": ("min", "o_orderdate"),
        "last_order": ("max", "o_orderdate"),
    }
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    state = agg_state(orders.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], specs)
    delta = agg_state(orders.filter(F.col("o_orderdate") >= cutoff), ["o_custkey"], specs)
    merged = merge_agg_state(state, delta, ["o_custkey"], specs)
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("sum_spend").cast("double").alias("sum_spend"),
        "first_order",
        "last_order",
    )


@register(
    "unpivot_measures",
    """
    WITH base AS (
      SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE) AS nation_d
      FROM customer
    )
    SELECT c_custkey, measure, val
    FROM base UNPIVOT (val FOR measure IN (c_acctbal, nation_d))
    """,
)
def unpivot_measures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via native unpivot (the inverse of
    pivot_agg) — a projection-only operator, no shuffle."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double").alias("nation_d")
    )
    return base.unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "nation_d"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "conditional_agg_functions",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_final,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def conditional_agg_functions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate surface (count_if, bool_and,
    bool_or, distinct count) — generalizes the reference's count
    reporting (A7)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "value_histogram",
    """
    WITH bucketed AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket,
             o_totalprice
      FROM orders
    )
    SELECT bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM bucketed GROUP BY bucket
    """,
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (distribution profiling — the
    at-scale replacement for the reference's df.shape debugging
    probes). Bucket arithmetic is one identical IEEE floor-division
    in both engines; one partial-agg shuffle total."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"), F.lit(9)
    ).alias("bucket")
    return orders.select(bucket, "o_totalprice").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        dsum_fast("o_totalprice").alias("total"),
    )


@register(
    "cdc_apply_changelog",
    """
    WITH base AS (
      SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg FROM customer
    ), changelog AS (
      SELECT o_custkey AS c_custkey,
             CASE WHEN o_orderstatus = 'O' THEN 'U'
                  WHEN o_orderstatus = 'P' THEN 'D'
                  ELSE 'I' END AS op,
             o_totalprice AS bal,
             o_orderpriority AS seg,
             o_orderdate AS ts,
             o_orderkey AS ord
      FROM orders
    ), latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY c_custkey ORDER BY ts DESC, ord DESC) AS rn
        FROM changelog
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.bal ELSE b.bal END AS bal,
           CASE WHEN c.op IS NOT NULL THEN c.seg ELSE b.seg END AS seg
    FROM base b FULL OUTER JOIN latest c ON b.c_custkey = c.c_custkey
    WHERE c.op IS NULL OR c.op != 'D'
    """,
)
def cdc_apply_changelog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: a synthetic I/U/D changelog (derived from orders)
    merged into the customer snapshot — last-write-wins per key with
    a deterministic tiebreaker, deletes drop the row, inserts add
    new keys (operators/incremental.py::apply_changelog)."""
    from dpe_energy_performance_analysis_etl_spark.operators import apply_changelog

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = cust.select(
        "c_custkey", F.col("c_acctbal").alias("bal"), F.col("c_mktsegment").alias("seg")
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_orderstatus") == "O", "U")
        .when(F.col("o_orderstatus") == "P", "D")
        .otherwise("I")
        .alias("op"),
        F.col("o_totalprice").alias("bal"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ord"),
    )
    out = apply_changelog(base, changes, key="c_custkey", ord_col="ord")
    return out.select("c_custkey", "bal", "seg")


@register(
    "time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ), seg AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             (epoch_us(next_ts) - epoch_us(ts)) // 1000 AS dur_ms
      FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(cents * dur_ms) AS BIGINT) AS weighted_cents_ms,
           CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
           (CAST(SUM(cents * dur_ms) AS DOUBLE) / CAST(SUM(dur_ms) AS DOUBLE)) / 100.0
             AS time_weighted_value
    FROM seg GROUP BY user_id
    """,
)
def time_weighted_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a sensor-style value per user (each
    reading holds until the next one — the TimescaleDB
    ``time_weight('LOCF')`` semantics). All weighting arithmetic is
    INTEGER (exact cents × exact MILLISECOND durations, summed as
    bigint — order-independent; ms not µs so the summed products keep
    ~10 bits of headroom under 2^53 and survive any float round trip
    in a downstream harness), with one final double division; the
    lead() pass and the aggregate share the user_id partitioning.
    The µs→ms floor uses the exact-multiple division pattern (both
    engines' integer division agrees on the non-negative diffs)."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    dur_us = epoch_micros("next_ts") - epoch_micros("ts")
    seg = seq.select(
        "user_id",
        (F.col("value").cast("decimal(30,2)") * 100).cast("bigint").alias("cents"),
        ((dur_us - F.pmod(dur_us, F.lit(1000))) / F.lit(1000))
        .cast("bigint")
        .alias("dur_ms"),
    )
    return seg.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur_ms")).alias("weighted_cents_ms"),
        F.sum("dur_ms").alias("total_ms"),
        (
            (
                F.sum(F.col("cents") * F.col("dur_ms")).cast("double")
                / F.sum("dur_ms").cast("double")
            )
            / 100.0
        ).alias("time_weighted_value"),
    )


@register(
    "percent_of_total_window",
    """
    WITH base AS (
      SELECT o_orderpriority, o_custkey % 10 AS cohort,
             CAST(o_totalprice AS DECIMAL(30,2)) AS price
      FROM orders
    ), agg AS (
      SELECT o_orderpriority, cohort,
             SUM(price) AS grp_dec
      FROM base GROUP BY 1, 2
    )
    SELECT o_orderpriority, cohort,
           CAST(grp_dec AS DOUBLE) AS grp_total,
           CAST(grp_dec AS DOUBLE) / CAST(SUM(grp_dec) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             AS share_of_priority,
           CAST(grp_dec AS DOUBLE) / CAST(SUM(grp_dec) OVER () AS DOUBLE)
             AS share_of_total
    FROM agg
    """,
)
def percent_of_total_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (priority, cohort) revenue as a share of
    its priority and of the grand total — windowed sums over the
    pre-aggregated (small) frame, so the wide scan aggregates once
    and the unpartitioned window only ever sees group rows."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = (
        orders.select(
            "o_orderpriority",
            (F.col("o_custkey") % 10).alias("cohort"),
            scaled_long("o_totalprice", 2).alias("price_c"),
        )
        .groupBy("o_orderpriority", "cohort")
        .agg(from_cents(F.sum("price_c"), 2).alias("grp_dec"))
    )
    w_pri = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    return agg.select(
        "o_orderpriority",
        "cohort",
        F.col("grp_dec").cast("double").alias("grp_total"),
        (F.col("grp_dec").cast("double") / F.sum("grp_dec").over(w_pri).cast("double")).alias(
            "share_of_priority"
        ),
        (F.col("grp_dec").cast("double") / F.sum("grp_dec").over(w_all).cast("double")).alias(
            "share_of_total"
        ),
    )


@register(
    "column_profile",
    """
    SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
           CAST(count_if(doc_id IS NULL) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT doc_id) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'text', COUNT(*), CAST(count_if(text IS NULL) AS BIGINT), COUNT(DISTINCT text) FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*), CAST(count_if(lang IS NULL) AS BIGINT), COUNT(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), CAST(count_if(source IS NULL) AS BIGINT), COUNT(DISTINCT source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), CAST(count_if(n_chars IS NULL) AS BIGINT), COUNT(DISTINCT n_chars) FROM documents
    """,
)
def column_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus profile (operators/quality.py::profile_columns):
    per-column null and exact-distinct counts in a single aggregation
    (Spark's expand handles the multi-distinct in one shuffle; the
    oracle's five table scans are the shape it replaces)."""
    from dpe_energy_performance_analysis_etl_spark.operators import profile_columns

    docs = read_documents(spark, sf_dir)
    return profile_columns(docs)


def register_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """SQL front door: register every zone table as a temp view so
    ``spark.sql`` works directly over the lakehouse — the query-
    language surface the reference never had. Events get the
    TIMESTAMP(NANOS) handling of ``read_events``."""
    for t in names or TABLES:
        df = read_events(spark, sf_dir) if t == "events" else spark.read.parquet(
            f"{sf_dir}/{t}.parquet"
        )
        df.createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the tables and run one ANSI-SQL query over them."""
    register_tables(spark, sf_dir)
    return spark.sql(query)


@register(
    "cms_token_frequency",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), h AS (
      SELECT term,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(term, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM tok
    ), cells AS (
      SELECT term, 0 AS row, ((31 * hp + 7) % 999999937) % 512 AS cell FROM h
      UNION ALL
      SELECT term, 1, ((37 * hp + 11) % 999999937) % 512 FROM h
      UNION ALL
      SELECT term, 2, ((41 * hp + 13) % 999999937) % 512 FROM h
    ), sketch AS (
      SELECT row, cell, COUNT(*) AS cnt FROM cells GROUP BY 1, 2
    ), q AS (
      SELECT DISTINCT term FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents WHERE doc_id = 0
      )
    ), qh AS (
      SELECT term,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(term, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM q
    ), qcells AS (
      SELECT term, 0 AS row, ((31 * hp + 7) % 999999937) % 512 AS cell FROM qh
      UNION ALL
      SELECT term, 1, ((37 * hp + 11) % 999999937) % 512 FROM qh
      UNION ALL
      SELECT term, 2, ((41 * hp + 13) % 999999937) % 512 FROM qh
    ), est AS (
      SELECT qc.term, MIN(COALESCE(s.cnt, 0)) AS est
      FROM qcells qc LEFT JOIN sketch s ON s.row = qc.row AND s.cell = qc.cell
      GROUP BY qc.term
    ), exact AS (
      SELECT term, COUNT(*) AS exact_n FROM tok GROUP BY term
    )
    SELECT e.term, e.est, x.exact_n
    FROM est e JOIN exact x ON e.term = x.term
    """,
)
def cms_token_frequency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (operators/sketch.py): corpus-wide token
    frequencies compressed into 3×512 counters, probed for doc 0's
    vocabulary, alongside exact counts (est >= exact always; equality
    whenever no cell collides). The sketch is bit-reproduced by the
    oracle — portable polynomial hashing, unlike engine HLL."""
    from dpe_energy_performance_analysis_etl_spark.operators import cms_build, cms_lookup
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    tok = docs.select(F.explode(tokens_expr("text")).alias("term"))
    sketch = cms_build(tok, "term", width=512)
    queries_df = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
    )
    est = cms_lookup(sketch, queries_df, "term", width=512)
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, on="term").select("term", "est", "exact_n")


@register(
    "kmv_distinct_tokens",
    """
    WITH tok AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), h AS (
      SELECT DISTINCT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) AS h
      FROM tok
    ), sk AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos FROM h
    ), kept AS (
      SELECT pos, h FROM sk WHERE pos <= 16
    ), agg AS (
      SELECT COUNT(*) AS n_held, MAX(h) AS h_k FROM kept
    ), est AS (
      SELECT CASE WHEN n_held < 16 THEN CAST(n_held AS DOUBLE)
                  ELSE CAST(1.5e16 AS DOUBLE) / CAST(h_k AS DOUBLE) END
             AS est_distinct
      FROM agg
    )
    SELECT e.est_distinct, x.exact_distinct
    FROM est e CROSS JOIN (
      SELECT COUNT(*) AS exact_distinct FROM tok
    ) x
    """,
)
def kmv_distinct_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch (operators/sketch.py): vocabulary-size
    estimate from the 16 smallest token hashes, next to the exact
    count (k=16 < the fixture vocabulary so the gate checks the
    ESTIMATOR branch, not the trivially-exact under-k path; accuracy
    at k=64/3000 distinct is unit-tested). The portable,
    oracle-BIT-EXACT counterpart of the rows-only HLL
    `approx_distinct` — one deterministic double division."""
    from dpe_energy_performance_analysis_etl_spark.operators import (
        kmv_build,
        kmv_estimate,
    )
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    tok = docs.select(F.explode(tokens_expr("text")).alias("term")).distinct()
    est = kmv_estimate(kmv_build(tok, "term", k=16), k=16)
    exact = tok.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return est.crossJoin(exact)


@register(
    "moving_zscore_anomalies",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT event_type, day, cnt,
             COUNT(*) OVER w AS n_win,
             SUM(cnt) OVER w AS s1,
             SUM(cnt * cnt) OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, cnt,
           CAST(s1 AS DOUBLE) / n_win AS mean7,
           (CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / n_win)
             / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_win) / (n_win - 1))
             AS zscore,
           abs(CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / n_win)
             > 2 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_win) / (n_win - 1))
             AS is_anomaly
    FROM win
    WHERE n_win >= 3
      AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_win) > 0
    """,
)
def moving_zscore_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-monitoring shape as a batch query: per event type,
    each day's count scored against its own trailing 7-day window
    (RANGE frame over event-time). Sums are INTEGER (exact, order-
    free); mean/var/sqrt are the same double ops in both engines.
    One shuffle on event_type; the frame never leaves the sort."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    win = daily.select(
        "event_type",
        "day",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_win")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_win")
    ) / (F.col("n_win") - 1)
    dev = F.col("cnt").cast("double") - mean
    return (
        win.filter(
            (F.col("n_win") >= 3)
            & (
                (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_win"))
                > 0
            )
        )
        .select(
            "event_type",
            "day",
            "cnt",
            mean.alias("mean7"),
            (dev / F.sqrt(var)).alias("zscore"),
            (F.abs(dev) > 2 * F.sqrt(var)).alias("is_anomaly"),
        )
    )


@register(
    "interarrival_percentiles",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           quantile_cont(gap_us, 0.5) AS p50_us,
           quantile_cont(gap_us, 0.9) AS p90_us,
           quantile_cont(gap_us, 0.99) AS p99_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def interarrival_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: lag() gaps in
    exact integer microseconds, EXACT interpolated percentiles (the
    approx-percentile sketch is the scale path; this is its
    correctness baseline — same pairing as percentile_iqr). Window
    and aggregate share the event_type partitioning."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (epoch_micros("ts") - epoch_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    pct = F.percentile(F.col("gap_us"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        pct.getItem(0).alias("p50_us"),
        pct.getItem(1).alias("p90_us"),
        pct.getItem(2).alias("p99_us"),
    )


# =====================================================================
# Corpus curation (text/curation.py — Gopher/C4-style filtering,
# decontamination, sampling, survivorship)
# =====================================================================

@register(
    "gopher_repetition",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), tagged AS (
      SELECT doc_id, 1 AS n, unnest(t) AS gram FROM tok
      UNION ALL
      SELECT doc_id, 2, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      FROM tok WHERE len(t) >= 2
      UNION ALL
      SELECT doc_id, 3, unnest(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      FROM tok WHERE len(t) >= 3
    ), gc AS (
      SELECT doc_id, n, gram, count(*) AS c FROM tagged GROUP BY 1, 2, 3
    ), pern AS (
      SELECT doc_id, n, count(*) AS n_distinct, sum(c) AS total, max(c) AS mx,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
      FROM gc GROUP BY 1, 2
    ), stats AS (
      SELECT doc_id,
             max(CASE WHEN n = 1 THEN total END) AS n_tokens,
             CAST(1 AS DOUBLE) - CAST(max(CASE WHEN n = 1 THEN n_distinct END) AS DOUBLE)
               / CAST(max(CASE WHEN n = 1 THEN total END) AS DOUBLE) AS dup_unigram_frac,
             CAST(max(CASE WHEN n = 2 THEN mx END) AS DOUBLE)
               / CAST(max(CASE WHEN n = 2 THEN total END) AS DOUBLE) AS top_bigram_frac,
             CAST(max(CASE WHEN n = 3 THEN dup_occ END) AS DOUBLE)
               / CAST(max(CASE WHEN n = 3 THEN total END) AS DOUBLE) AS dup_trigram_frac
      FROM pern GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           s.dup_unigram_frac, s.top_bigram_frac, s.dup_trigram_frac,
           coalesce(s.dup_unigram_frac <= 0.6, TRUE)
             AND coalesce(s.top_bigram_frac <= 0.05, TRUE)
             AND coalesce(s.dup_trigram_frac <= 0.05, TRUE) AS keep
    FROM documents d LEFT JOIN stats s USING (doc_id)
    """,
)
def gopher_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021 §A1.1):
    duplicate-unigram fraction, top-bigram occupancy, duplicate-trigram
    occupancy, and the keep verdict. One tagged n-gram explode feeding
    two map-side-combinable aggregations — shuffle is O(tokens), never
    O(pairs). (Reference has no text domain; build-mandate extension.)"""
    from dpe_energy_performance_analysis_etl_spark.text import gopher_repetition_filter

    docs = read_documents(spark, sf_dir)
    return gopher_repetition_filter(docs)


@register(
    "quality_filter_heuristic",
    """
    WITH tok AS (
      SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS DOUBLE)
             / CAST(greatest(len(t), 1) AS DOUBLE) AS mean_word_len,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
             / CAST(greatest(len(text), 1) AS DOUBLE) AS symbol_ratio,
           (contains(lower(text), 'lorem ipsum') OR contains(lower(text), 'javascript')
             OR contains(lower(text), '{')) AS has_boilerplate,
           (len(t) >= 20 AND len(t) <= 80
             AND CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS DOUBLE)
               / CAST(greatest(len(t), 1) AS DOUBLE) >= 4.0
             AND CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS DOUBLE)
               / CAST(greatest(len(t), 1) AS DOUBLE) <= 5.0
             AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
               / CAST(greatest(len(text), 1) AS DOUBLE) <= 0.1
             AND NOT (contains(lower(text), 'lorem ipsum')
               OR contains(lower(text), 'javascript') OR contains(lower(text), '{')))
             AS keep
    FROM tok
    """,
)
def quality_filter_heuristic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style structural quality gate (Raffel et al. 2020 §2.2):
    word-count window, mean-word-length window, symbol ratio,
    boilerplate markers. Pure row-local expressions — runs inside
    whole-stage codegen at scan speed, zero shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text import heuristic_quality_filter

    docs = read_documents(spark, sf_dir)
    return heuristic_quality_filter(docs)


@register(
    "decontaminate_overlap",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS gram
      FROM tok WHERE len(t) >= 4
    ), bench AS (
      SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0
    )
    SELECT doc_id,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_shared_ngrams,
           CAST(count(DISTINCT bench_id) AS BIGINT) AS n_benchmark_docs
    FROM corpus JOIN bench USING (gram)
    GROUP BY doc_id
    """,
)
def decontaminate_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by word-4-gram overlap (the public
    GPT-3/PaLM recipe, gram size scaled to these short docs): which
    corpus docs share any 4-gram with the held-out set (deterministic
    stand-in: doc_id % 97 == 0). Fixed-width md5 join keys; the
    benchmark side broadcasts — corpus never shuffles its text."""
    from dpe_energy_performance_analysis_etl_spark.text import ngram_decontaminate

    docs = read_documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_decontaminate(corpus, bench, n=4)


@register(
    "stratified_sample_mix",
    """
    SELECT doc_id, source,
           CAST(((doc_id * 2654435761) % 4294967296) % 10000 AS BIGINT) AS bucket
    FROM documents
    WHERE ((doc_id * 2654435761) % 4294967296) % 10000 <
          CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 7500 ELSE 2500 END
    """,
)
def stratified_sample_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    even-numbered sources kept at 75%, odd at 25%, decided by a
    portable multiplicative hash of doc_id (not rand()) — reproducible
    across runs, engines, and partitionings. Row-local expression,
    zero shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text import sampling_hash, stratified_sample

    docs = read_documents(spark, sf_dir)
    rates = {f"src{i}": (0.75 if i % 2 == 0 else 0.25) for i in range(20)}
    sampled = stratified_sample(docs, rates, strata_col="source", key_col="doc_id")
    return sampled.select(
        "doc_id", "source", sampling_hash(F.col("doc_id")).cast("bigint").alias("bucket")
    )


@register(
    "cluster_canonical_survivors",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    und AS (
      SELECT doc_a AS s, doc_b AS d FROM edges
      UNION ALL
      SELECT doc_b, doc_a FROM edges
    ), reach(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.d, r.comp FROM reach r JOIN und u ON u.s = r.node WHERE r.comp < u.d
    ), labels AS (
      SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY node
    ), dq AS (
      SELECT l.doc_id, l.component, CAST(d.n_chars AS BIGINT) AS n_chars
      FROM labels l JOIN documents d USING (doc_id)
    )
    SELECT doc_id, component, n_chars, canonical_id,
           doc_id = canonical_id AS is_kept
    FROM (
      SELECT doc_id, component, n_chars,
             first_value(doc_id) OVER (
               PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical_id
      FROM dq
    )
    """,
)
def cluster_canonical_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after near-dup clustering: connected components
    over word-3-gram Jaccard edges (same edge set as
    ``dedup_clusters_cc``), then per cluster keep the highest-quality
    doc (n_chars, ties → min doc_id). This is the step that turns
    pair/cluster output into an actually deduplicated corpus; one
    window over the cluster assignment."""
    from dpe_energy_performance_analysis_etl_spark.dedup import dedup_clusters, shingle_pairs_jaccard
    from dpe_energy_performance_analysis_etl_spark.text import canonical_per_cluster

    docs = read_documents(spark, sf_dir)
    edges = shingle_pairs_jaccard(docs, threshold=0.05).select("doc_a", "doc_b")
    clusters = dedup_clusters(docs, edges)
    return canonical_per_cluster(docs, clusters)


@register(
    "spatial_radius_join",
    """
    WITH c AS (
      SELECT c_custkey,
             CAST(c_custkey % 100 AS DOUBLE) / 10 AS lat,
             CAST((c_custkey // 100) % 100 AS DOUBLE) / 10 AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             CAST(s_suppkey % 100 AS DOUBLE) / 10 AS lat,
             CAST((s_suppkey * 7) % 100 AS DOUBLE) / 10 AS lon
      FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           sqrt((c.lat - s.lat) * (c.lat - s.lat)
              + (c.lon - s.lon) * (c.lon - s.lon)) AS dist_deg
    FROM c JOIN s
      ON sqrt((c.lat - s.lat) * (c.lat - s.lat)
            + (c.lon - s.lon) * (c.lon - s.lon)) <= 0.15
    """,
)
def spatial_radius_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join (customers to suppliers within 0.15° on
    deterministic key-derived coordinates — the tables carry no geo
    columns, so the coordinates are synthesized identically in both
    engines). The Spark plan is the grid-bucketed band join
    (operators/spatial.py): cell equi-join + 9x neighbor fan-out +
    exact refine — no cartesian product; the oracle states the naive
    O(n·m) semantics. Euclidean-degree metric: mul/add/sqrt are
    IEEE-correctly-rounded, so both engines agree bit-exactly."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import grid_radius_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.col("c_custkey") % 100).cast("double") / 10).alias("lat"),
        ((F.expr("c_custkey div 100") % 100).cast("double") / 10).alias("lon"),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey",
        ((F.col("s_suppkey") % 100).cast("double") / 10).alias("lat"),
        (((F.col("s_suppkey") * 7) % 100).cast("double") / 10).alias("lon"),
    )
    pairs = grid_radius_join(
        cust, supp, radius=0.15, metric="euclidean_deg", distance_col="dist_deg"
    )
    return pairs.select("c_custkey", "s_suppkey", "dist_deg")


@register(
    "chunk_documents",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), st AS (
      SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s FROM tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(s // 24 AS BIGINT) AS chunk_id,
           array_to_string(t[s+1 : s+32], ' ') AS chunk_text,
           CAST(len(t[s+1 : s+32]) AS BIGINT) AS n_chunk_tokens
    FROM st
    """,
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks, 8-token
    overlap → stride 24): the RAG/max-length chunker. Per-row
    sequence→explode→slice — zero shuffle, runs at scan speed."""
    from dpe_energy_performance_analysis_etl_spark.text.packing import chunk_documents

    docs = read_documents(spark, sf_dir)
    return chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


@register(
    "sequence_pack_bins",
    """
    WITH tok AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_token
      FROM tok
    )
    SELECT doc_id, n_tokens, start_token,
           CAST(start_token // 256 AS BIGINT) AS bin_id,
           CAST(start_token % 256 AS BIGINT) AS offset_in_bin,
           (start_token % 256) + n_tokens > 256 AS spans_boundary
    FROM cum
    """,
)
def sequence_pack_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk token packing (T5-style) at budget 256:
    which bin each document starts in and at what offset. The global
    running sum is a TWO-LEVEL scan (within-bucket window + tiny
    bucket-prefix broadcast) — no single-partition global window, the
    at-scale replacement for the oracle's ORDER BY window."""
    from dpe_energy_performance_analysis_etl_spark.text import token_count
    from dpe_energy_performance_analysis_etl_spark.text.packing import sequence_pack

    docs = read_documents(spark, sf_dir)
    counted = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return sequence_pack(counted, budget=256, token_count_col="n_tokens", order_col="doc_id")


@register(
    "temperature_mixture_sample",
    """
    WITH counts AS (
      SELECT lang, count(*) AS n_rows FROM documents GROUP BY 1
    ), m AS (
      SELECT min(n_rows) AS mn FROM counts
    ), rates AS (
      SELECT lang, sqrt(CAST(mn AS DOUBLE) / CAST(n_rows AS DOUBLE)) AS keep_rate
      FROM counts, m
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r USING (lang)
    WHERE CAST(((d.doc_id * 2654435761) % 4294967296) % 10000 AS DOUBLE)
          < r.keep_rate * 10000
    """,
)
def temperature_mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source rebalancing (T5 §3.4.3 family) at
    T=2 over the lang strata: the smallest language is kept whole,
    larger ones downsampled at sqrt(min/n) — deterministic via the
    portable key hash, so the sampled set is bit-reproducible. The
    rate table is #strata rows, broadcast; the decision is row-local
    (zero extra shuffle). T=2 is the oracle-exact temperature: sqrt
    is IEEE-correctly-rounded, general pow is not."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import temperature_mixture_sample

    docs = read_documents(spark, sf_dir)
    return temperature_mixture_sample(docs, strata_col="lang", key_col="doc_id").select(
        "doc_id", "lang"
    )


@register(
    "pseudonymize_pii",
    """
    SELECT c_custkey, sha256('k1:' || c_name) AS c_name_pseud
    FROM customer
    """,
)
def pseudonymize_pii_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted-sha256 pseudonymization of a direct
    identifier: equality joins/dedup still work on the pseudonym
    (same salt => same digest) while the raw value is dropped.
    Row-local JVM sha2 — codegen'd, zero shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import pseudonymize

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    return pseudonymize(cust, ["c_name"], salt="k1")


# =====================================================================
# Round-3 additions: native session windows, free-text PII redaction,
# deterministic epoch sharding
# =====================================================================

@register(
    "events_session_window_native",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (§2.8) — the same
    gaps-and-islands result as ``events_sessionize`` but via the
    built-in merging session assigner, which also runs unchanged under
    Structured Streaming with watermark-based state eviction (the
    scale path for infinite streams; the window() variant of
    ``streaming/stateful.py``'s applyInPandasWithState sessionizer).

    Boundary semantics: session_window treats [start, last+gap) as
    half-open, so a gap of EXACTLY the timeout starts a new session —
    the oracle's CASE uses >= to match."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@register(
    "pii_redact",
    """
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or 10.0.' ||
             (doc_id % 256) || '.7 tel +33 6 ' || (10000000 + doc_id) AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+')) AS email_n,
           len(regexp_extract_all(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '[email]', 'g'),
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS ipv4_n,
           len(regexp_extract_all(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '[email]', 'g'),
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '[ipv4]', 'g'),
             '\\+?[0-9][0-9 ()-]{7,}[0-9]')) AS phone_n,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '[email]', 'g'),
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '[ipv4]', 'g'),
             '\\+?[0-9][0-9 ()-]{7,}[0-9]', '[phone]', 'g') AS text
    FROM seeded
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII redaction (text/mixing.py redact_pii): class
    tokens replace emails / IPv4s / phone numbers, with per-class
    match counts. The fixture seeds synthetic identifiers from doc_id
    (both engines build the identical string) so redaction does real
    work on every row; patterns are engine-portable regex. Counts are
    taken class-AFTER-class on the progressively scrubbed text
    (emails first), so digits inside an address are never double-
    counted as a phone — mirrored exactly in the oracle's nesting.
    Row-local, zero shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import redact_pii

    docs = read_documents(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +33 6 "), (F.col("doc_id") + 10_000_000).cast("string"),
        ).alias("text"),
    )
    return redact_pii(seeded).select("doc_id", "email_n", "ipv4_n", "phone_n", "text")


@register(
    "epoch_shard_assign",
    """
    SELECT doc_id,
           CAST(((((doc_id + 1 * 1000003) % 2147483647) * 2654435761 % 4294967296) % 10000) % 8 AS INTEGER) AS shard,
           ((((doc_id + 1 * 1000003) % 2147483647) * 2654435761 % 4294967296) % 10000) * 10007 % 100000 AS shuffle_key
    FROM documents
    """,
)
def epoch_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-N shuffle/shard assignment for training
    data loaders (text/mixing.py epoch_shard): reproducible
    pseudo-random shard in [0,8) and per-epoch shuffle key, portable
    integer hashing, no global sort — the writer repartitions by
    shard and sorts WITHIN partitions only."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import epoch_shard

    docs = read_documents(spark, sf_dir)
    return epoch_shard(docs, n_shards=8, epoch=1).select("doc_id", "shard", "shuffle_key")


@register(
    "c4_line_filter",
    """
    WITH seeded AS (
      SELECT doc_id,
             'Header fragment without ending' || chr(10) ||
             'This line has enough words and ends well, doc ' || doc_id || '.' || chr(10) ||
             'short.' || chr(10) ||
             substr(text, 1, 40) || ' closes the document here!' AS text
      FROM documents
    )
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines,
           len(list_filter(string_split(text, chr(10)),
               ln -> regexp_matches(ln, '[.!?]$') AND len(string_split(ln, ' ')) >= 5)) AS n_kept_lines,
           len(list_filter(string_split(text, chr(10)),
               ln -> regexp_matches(ln, '[.!?]$') AND len(string_split(ln, ' ')) >= 5)) >= 1 AS keep_doc,
           list_aggregate(list_filter(string_split(text, chr(10)),
               ln -> regexp_matches(ln, '[.!?]$') AND len(string_split(ln, ' ')) >= 5),
             'string_agg', chr(10)) AS clean_text
    FROM seeded
    """,
)
def c4_line_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level C4 cleaning (text/curation.py c4_line_filter): the
    fixture seeds each doc with four deterministic lines — an
    unterminated header (dropped), a long terminated line (kept), a
    short terminated line (dropped: under the word floor), and a
    terminated closing line built from the doc text (kept) — so the
    filter exercises every branch on every row."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import c4_line_filter

    docs = read_documents(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit("Header fragment without ending\n"),
            F.lit("This line has enough words and ends well, doc "),
            F.col("doc_id").cast("string"), F.lit(".\n"),
            F.lit("short.\n"),
            F.substring("text", 1, 40), F.lit(" closes the document here!"),
        ).alias("text"),
    )
    return c4_line_filter(seeded)


@register(
    "html_strip_corpus",
    """
    WITH seeded AS (
      SELECT doc_id,
             '<html><body class="x"><h1>Doc ' || doc_id || '</h1><p>' ||
             substr(text, 1, 50) || ' &amp; more &lt;escaped&gt; '
             || '</p><br/><script>var x = 1;</script></body></html>' AS text
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(text, '<[^>]*>', ' ', 'g'),
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', chr(39)), '&amp;', '&'),
             '\\s+', ' ', 'g')) AS clean_text
    FROM seeded
    """,
)
def html_strip_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate removal (text/curation.py html_strip) over a
    seeded wrapper: tags (incl. attributes and a script body's angle-
    bracket-free content) drop, entities unescape in the standard
    order (&amp; last), whitespace collapses. Note tag-stripping
    leaves script TEXT behind by design — script/style CONTENT removal
    is a parser concern; the regex layer only guarantees markup
    removal, which is what the oracle checks."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import html_strip

    docs = read_documents(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body class="x"><h1>Doc '), F.col("doc_id").cast("string"),
            F.lit("</h1><p>"), F.substring("text", 1, 50),
            F.lit(" &amp; more &lt;escaped&gt; "),
            F.lit("</p><br/><script>var x = 1;</script></body></html>"),
        ).alias("text"),
    )
    return html_strip(seeded).select("doc_id", "clean_text")


@register(
    "bloom_prune_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    """,
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter-style bloom join pruning
    (operators/bloomjoin.py): the selective orders subset builds a
    bitset filter that drops non-matching lineitem rows BEFORE the
    join's exchange — the explicit form of Spark's
    runtime.bloomFilter / Trino dynamic filtering, and the 100 TB
    play for fact-vs-filtered-dim joins (reference analogue: the
    enriched-frame lookups in transform.py:154-210). Exact because
    blooms have no false negatives; the oracle is the PLAIN join."""
    from dpe_energy_performance_analysis_etl_spark.operators.bloomjoin import (
        bloom_pruned_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
    )
    joined = bloom_pruned_join(li, orders, "l_orderkey", "o_orderkey")
    return joined.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice"
    )


@register(
    "semantic_dedup_survivors",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), cents AS (
      SELECT vec_id AS cluster, v AS centroid, nrm AS centnorm
      FROM n WHERE vec_id < 8
    ), assigned AS (
      SELECT vec_id, v, nrm, cluster FROM (
        SELECT n.vec_id, n.v, n.nrm, c.cluster,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.centroid) / (n.nrm * c.centnorm) DESC,
                          c.cluster) AS rn
        FROM n CROSS JOIN cents c
      ) WHERE rn = 1
    ), dominated AS (
      SELECT a.vec_id AS id,
             max(list_dot_product(b.v, a.v) / (b.nrm * a.nrm)) AS dup_cosine
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND b.vec_id < a.vec_id
      WHERE list_dot_product(b.v, a.v) / (b.nrm * a.nrm) >= 0.35
      GROUP BY a.vec_id
    )
    SELECT a.vec_id AS id, a.cluster, d.id IS NULL AS kept, d.dup_cosine
    FROM assigned a LEFT JOIN dominated d ON a.vec_id = d.id
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (dedup/semantic.py; Abbas et al.
    2023): seeded coarse quantizer -> within-cluster cosine pairs ->
    keep-lowest-id survivors. All-pairs O(n^2) becomes O(n^2/k) via
    the cluster equi-join — the embedding-space sibling of the
    MinHash band-bucket bound. One row per vector (kept flag + the
    dominating cosine), bit-replayed by the oracle."""
    from dpe_energy_performance_analysis_etl_spark.dedup.semantic import semantic_dedup

    emb = read_embeddings(spark, sf_dir)
    return semantic_dedup(emb, n_clusters=8, threshold=0.35)


@register(
    "dsir_importance_scores",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), ttoks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents WHERE lang = 'en'
    ), tvoc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tc FROM ttoks GROUP BY tok
    ), rvoc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS rc FROM toks GROUP BY tok
    ), joined AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(tv.tc, 0)) AS BIGINT) AS target_mass,
             CAST(sum(coalesce(rv.rc, 0)) AS BIGINT) AS ref_mass
      FROM toks t
      LEFT JOIN tvoc tv USING (tok)
      LEFT JOIN rvoc rv USING (tok)
      GROUP BY t.doc_id
    ), totals AS (
      SELECT CAST((SELECT sum(tc) FROM tvoc) AS BIGINT) AS t_total,
             CAST((SELECT sum(rc) FROM rvoc) AS BIGINT) AS r_total
    )
    SELECT doc_id, n_tokens, target_mass, ref_mass,
           (CAST(target_mass AS DOUBLE) * CAST(r_total AS DOUBLE))
           / (CAST(ref_mass AS DOUBLE) * CAST(t_total AS DOUBLE)) AS affinity
    FROM joined CROSS JOIN totals
    """,
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-family importance scoring (text/importance.py; Xie et al.
    2023): candidates scored by target-corpus (lang='en') unigram
    affinity vs the full-pool reference. Exact-integer aggregates +
    one IEEE-determined double expression — the oracle-hashable twin
    of the log-likelihood-ratio scorer (``dsir_log_ratio``, verified
    vs numpy in tests). Vocab tables broadcast; the corpus explodes
    once and never re-shuffles."""
    from dpe_energy_performance_analysis_etl_spark.text.importance import (
        importance_score,
    )

    docs = read_documents(spark, sf_dir)
    return importance_score(docs, target=docs.filter(F.col("lang") == "en"))


@register(
    "paragraph_dedup_corpus",
    """
    WITH seeded AS (
      SELECT doc_id,
             'Shared boilerplate: all rights reserved.' || chr(10) ||
             'Doc ' || doc_id || ' body: ' || substr(text, 1, 60) || chr(10) ||
             'Group banner ' || (doc_id % 7) || chr(10) ||
             'Doc ' || doc_id || ' closing line.' AS text
      FROM documents
    ), paras AS (
      SELECT doc_id,
             unnest(generate_series(1, len(ps))) - 1 AS pos,
             unnest(ps) AS para
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM seeded)
    ), tagged AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, pos) = 1 AS kept
      FROM paras
    )
    SELECT doc_id,
           coalesce(string_agg(para, chr(10) ORDER BY pos) FILTER (kept), '')
             AS clean_text,
           CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (NOT kept) AS BIGINT) AS n_dropped
    FROM tagged GROUP BY doc_id
    """,
)
def paragraph_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup (text/curation.py
    ``paragraph_dedup``; the Dolma/CCNet boilerplate-stripping stage)
    over a seeded 4-paragraph wrapper: one paragraph shared by ALL
    docs (survives only in doc 0), one shared per doc_id%7 group
    (survives in each group's min doc), two unique per doc (always
    survive). First-occurrence resolution is one md5-keyed groupBy +
    co-partitioned join — O(paragraphs), never O(pairs)."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import paragraph_dedup

    docs = read_documents(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Shared boilerplate: all rights reserved."),
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"), F.lit(" body: "),
                F.substring("text", 1, 60),
            ),
            F.concat(F.lit("Group banner "), (F.col("doc_id") % 7).cast("string")),
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"),
                F.lit(" closing line."),
            ),
        ).alias("text"),
    )
    return paragraph_dedup(seeded)


@register(
    "basket_cooccurrence_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), supp AS (
      SELECT item, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT item_a, item_b, support,
           sa.s AS supp_a, sb.s AS supp_b,
           CAST(support AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS lift
    FROM pairs
    JOIN supp sa ON pairs.item_a = sa.item
    JOIN supp sb ON pairs.item_b = sb.item
    CROSS JOIN n
    """,
)
def basket_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair support + lift (operators/basket.py) over
    orders-as-baskets of parts: basket-keyed self-join (per-basket m²,
    m bounded by order width), hash-agg supports, independence-
    normalized lift. The association-analytics staple the reference
    lacks; mega-basket capping documented in the operator."""
    from dpe_energy_performance_analysis_etl_spark.operators.basket import (
        cooccurrence_lift,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return cooccurrence_lift(li, "l_orderkey", "l_partkey", min_support=2)


@register(
    "heavy_hitters_tokens",
    """
    SELECT tok AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (operators/heavyhitters.py) over the
    corpus token stream, run in the exact regime (k=256 >= distinct
    tokens — no decrement fires, so the bounded-state pipeline equals
    the exact count table deterministically; same exact-under-k
    contract as the KMV sketch). The sub-k regime's undercount /
    presence guarantees are property-tested in
    tests/test_heavyhitters.py."""
    from dpe_energy_performance_analysis_etl_spark.operators.heavyhitters import (
        heavy_hitters,
    )

    docs = read_documents(spark, sf_dir)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("tok")
    )
    return heavy_hitters(toks, "tok", k=256)


@register(
    "correlation_matrix_lineitem",
    """
    WITH hat AS (
      SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        AND l_tax IS NOT NULL
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s_d,
             CAST(sum(q) AS BIGINT) AS s_q,
             CAST(sum(t) AS BIGINT) AS s_t,
             CAST(sum(d*d) AS BIGINT) AS s_dd,
             CAST(sum(d*q) AS BIGINT) AS s_dq,
             CAST(sum(d*t) AS BIGINT) AS s_dt,
             CAST(sum(q*q) AS BIGINT) AS s_qq,
             CAST(sum(q*t) AS BIGINT) AS s_qt,
             CAST(sum(t*t) AS BIGINT) AS s_tt
      FROM hat
    )
    SELECT 'l_discount' AS col_a, 'l_quantity' AS col_b, n,
           (CAST(n AS DOUBLE)*CAST(s_dq AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_q AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE)*CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE)*CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))) AS corr
    FROM m
    UNION ALL
    SELECT 'l_discount', 'l_tax', n,
           (CAST(n AS DOUBLE)*CAST(s_dt AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_t AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE)*CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE)*CAST(s_tt AS DOUBLE) - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE))) AS corr
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_tax', n,
           (CAST(n AS DOUBLE)*CAST(s_qt AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_t AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE)*CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE)*CAST(s_tt AS DOUBLE) - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE))) AS corr
    FROM m
    """,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass pairwise Pearson matrix (operators/correlate.py) over
    lineitem's small-magnitude money columns: all moment sums in a
    single map-side-combinable aggregate (one scan, one single-row
    exchange), correlations assembled in-plan. Exact bigint moments +
    fixed-order IEEE double assembly = engine-portable values
    (reference analogue: pandas .corr() on the gold frame)."""
    from dpe_energy_performance_analysis_etl_spark.operators.correlate import (
        correlation_matrix,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return correlation_matrix(
        li, {"l_quantity": 2, "l_discount": 2, "l_tax": 2}
    )


@register(
    "pagerank_supplier_graph",
    """
    WITH pairs AS (
      -- long node ids (cust*2 / supp*2+1): the per-round rank shuffle
      -- is keyed on node — 8-byte keys, not 'c123' strings (the LPA
      -- measurement: 1.5x at sf5 from key width alone)
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), nodes AS (
      SELECT DISTINCT src AS node FROM e
      UNION
      SELECT DISTINCT dst AS node FROM e
    ), deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
    ), i1 AS (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r0.r // deg.deg) AS BIGINT) AS inc
        FROM r0 JOIN deg ON r0.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    ), i2 AS (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(i1.r // deg.deg) AS BIGINT) AS inc
        FROM i1 JOIN deg ON i1.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    ), i3 AS (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(i2.r // deg.deg) AS BIGINT) AS inc
        FROM i2 JOIN deg ON i2.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    )
    SELECT node, r AS rank_scaled FROM i3
    """,
)
def pagerank_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (operators/graph.py), 3 rounds over the
    customer<->supplier trade graph (distinct orders x lineitem
    pairs, symmetric edges). Scaled-integer ranks + true int64 `div`
    make every round a pure function of the input — bit-identical
    across partitionings AND engines, which is how an ITERATIVE
    numeric algorithm can sit behind the value-hash gate at all (the
    float formulation never could). Per round: one src-keyed join +
    one dst-keyed agg, both O(|E|)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        pagerank_fixed,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank_fixed(edges, iterations=3)


@register(
    "histogram_quantiles_price",
    """
    WITH vals AS (
      SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), b AS (
      SELECT CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi FROM vals
    ), hist AS (
      SELECT least(greatest(CAST(floor((v - lo) / ((hi - lo) / 1024)) AS BIGINT), 0), 1023) AS bucket,
             lo, (hi - lo) / 1024 AS width, CAST(count(*) AS BIGINT) AS cnt
      FROM vals CROSS JOIN b
      GROUP BY 1, 2, 3
    ), cum AS (
      SELECT bucket, lo, width, cnt,
             CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
             CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS n
      FROM hist
    ), t AS (
      SELECT cum.*, p.prob,
             greatest(CAST(ceil(prob * n) AS BIGINT), 1) AS target
      FROM cum CROSS JOIN (VALUES (2.5e-1), (5.0e-1), (9.0e-1), (9.9e-1)) p(prob)
    ), hit AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY prob ORDER BY bucket) AS rn
        FROM t WHERE cum >= target
      ) WHERE rn = 1
    )
    SELECT prob,
           lo + width * (CAST(bucket AS DOUBLE)
             + (CAST(target AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
             AS q_est
    FROM hit
    """,
)
def histogram_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantiles (operators/quantiles.py) over
    l_extendedprice: the deterministic scale path for global
    percentiles — bucket counts are addition-mergeable and every step
    is fixed-order IEEE arithmetic, unlike GK approx_percentile whose
    merge order makes its exact output engine-specific (the reason it
    can only ever be rows-only in this gate)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        histogram_quantiles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return histogram_quantiles(
        li, "l_extendedprice", probs=[0.25, 0.5, 0.9, 0.99], n_buckets=1024
    )


@register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 300
    ), j AS (
      SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
             o.o_orderstatus AS os, n.o_orderstatus AS ns,
             o.o_totalprice AS op, n.o_totalprice AS np
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT coalesce(ok, nk) AS o_orderkey,
           CASE WHEN ok IS NULL THEN 'added'
                WHEN nk IS NULL THEN 'removed'
                WHEN (os IS DISTINCT FROM ns) OR (op IS DISTINCT FROM np)
                  THEN 'changed' END AS change,
           CASE WHEN ok IS NULL OR nk IS NULL THEN ''
                ELSE array_to_string(list_sort(list_filter(
                  [CASE WHEN os IS DISTINCT FROM ns THEN 'o_orderstatus' END,
                   CASE WHEN op IS DISTINCT FROM np THEN 'o_totalprice' END],
                  x -> x IS NOT NULL)), ',') END AS changed_cols
    FROM j
    WHERE (ok IS NULL) OR (nk IS NULL)
       OR (os IS DISTINCT FROM ns) OR (op IS DISTINCT FROM np)
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/diff.py) between orders and a seeded
    mutation of it (every 97th key removed, every 11th price bumped,
    every 13th status flipped, keys < 300 re-added under shifted ids):
    one co-partitioned full-outer join, null-safe per-column change
    attribution, unchanged majority filtered in-plan. ``changed_cols``
    is emitted as a comma-joined sorted STRING (not ARRAY) because the
    driver's pandas canonicalizer cannot sort list values — the r4
    lesson; the harness now rejects non-scalar outputs outright."""
    from dpe_energy_performance_analysis_etl_spark.operators.diff import snapshot_diff

    old = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        old.where(k % 97 != 0)
        .select(
            "o_orderkey",
            F.when(k % 13 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(k % 11 == 0, F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionAll(
            old.where(k < 300).select(
                (k + 100000000).alias("o_orderkey"), "o_orderstatus", "o_totalprice"
            )
        )
    )
    return snapshot_diff(old, new, ["o_orderkey"]).withColumn(
        "changed_cols", F.array_join(F.array_sort("changed_cols"), ",")
    )


# =====================================================================
# Retrieval & model-based scoring (text/retrieval.py)
# =====================================================================

@register(
    "bm25_topk_docs",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), tf AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
      FROM toks
    ), tfc AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2, 3
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens
      FROM (SELECT DISTINCT doc_id, dl FROM tfc)
    ), scored AS (
      SELECT doc_id, term,
             ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2) /
                (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                 (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
             AS term_score
      FROM tfc JOIN dfreq USING (term) CROSS JOIN corpus
      WHERE term IN ('spark', 'join', 'window')
    ), per_doc AS (
      SELECT doc_id,
             SUM(CASE WHEN term = 'spark'  THEN term_score END) AS s_0,
             SUM(CASE WHEN term = 'join'   THEN term_score END) AS s_1,
             SUM(CASE WHEN term = 'window' THEN term_score END) AS s_2
      FROM scored GROUP BY 1
    ), totaled AS (
      SELECT doc_id,
             0.0 + COALESCE(s_0, 0.0) + COALESCE(s_1, 0.0) + COALESCE(s_2, 0.0) AS score
      FROM per_doc
    )
    SELECT doc_id, score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM totaled
    ) WHERE rn <= 10
    """,
)
def bm25_topk_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed 3-term query (text/retrieval.py).
    Rational idf (no ln — libm 1-ulp skew breaks cross-engine hashes)
    and a fixed-order per-document sum via one conditional aggregate
    per query term. Plan: explode -> (doc,term) agg -> broadcast df/
    corpus stats -> conditional agg -> global top-k window over the
    ALREADY-FILTERED query-term rows (tiny), never the corpus."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import bm25_topk

    return bm25_topk(read_documents(spark, sf_dir), ["spark", "join", "window"], k=10)


@register(
    "unigram_lm_quality",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), tf AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
      FROM toks
    ), tfc AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2, 3
    ), vocab AS (
      SELECT term, SUM(tf) AS c_term FROM tfc GROUP BY 1
    ), total AS (
      SELECT CAST(SUM(c_term) AS BIGINT) AS c_total FROM vocab
    ), weighted AS (
      SELECT doc_id, dl, tf,
             (c_total * 1000000) // CAST(c_term AS BIGINT) AS w
      FROM tfc JOIN vocab USING (term) CROSS JOIN total
    )
    SELECT doc_id, dl AS n_tokens,
           CAST(CAST(SUM(tf * w) AS BIGINT) AS DOUBLE)
             / (CAST(dl AS DOUBLE) * 1000000.0) AS mean_inv_prob
    FROM weighted GROUP BY doc_id, dl
    """,
)
def unigram_lm_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal proxy (text/retrieval.py): per-token
    weight = integer-scaled inverse relative corpus frequency, so the
    per-doc accumulation is an exact order-independent BIGINT sum and
    only the final mean divides as double. Vocab + corpus total are
    broadcast; the corpus shuffles once for the tf agg."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import unigram_lm_scores

    return unigram_lm_scores(read_documents(spark, sf_dir))


@register(
    "hashed_classifier_gate",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), tf AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
      FROM toks
    ), tfc AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2, 3
    ), weighted AS (
      SELECT doc_id, dl, tf,
             CAST(((list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(regexp_extract_all(term, '.'),
                                       c -> CAST(ascii(c) AS BIGINT))),
                      (acc, x) -> (acc * 131 + x) % 1000000000000000)
                    % 1024) * 2654435761) % 2001 AS BIGINT) - 1000 AS w
      FROM tfc
    ), per_doc AS (
      SELECT doc_id, dl, CAST(SUM(tf * w) AS BIGINT) AS margin_scaled
      FROM weighted GROUP BY doc_id, dl
    )
    SELECT doc_id, dl AS n_tokens,
           CAST(margin_scaled AS DOUBLE) / (CAST(dl AS DOUBLE) * 1000.0) AS margin,
           0.5 + 0.5 * (CAST(margin_scaled AS DOUBLE) / (CAST(dl AS DOUBLE) * 1000.0))
               / (1.0 + abs(CAST(margin_scaled AS DOUBLE) / (CAST(dl AS DOUBLE) * 1000.0))) AS prob,
           CAST(margin_scaled AS DOUBLE) / (CAST(dl AS DOUBLE) * 1000.0) >= 0 AS keep
    FROM per_doc
    """,
)
def hashed_classifier_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear classifier (text/retrieval.py):
    portable rolling-hash token buckets, Knuth-multiplicative integer
    weights, exact BIGINT margins, rational sigmoid (no exp). The
    weight is computed inline per row — zero joins beyond the tf agg,
    which is the shape a real exported hashed linear model runs at
    on a 100 TB corpus."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import hashed_classifier_scores

    return hashed_classifier_scores(read_documents(spark, sf_dir))


# =====================================================================
# Entity resolution & graph analytics (operators/entity.py, graph.py)
# =====================================================================

@register(
    "entity_match_ed1",
    """
    WITH dirty AS (
      SELECT c_custkey AS r_id, c_nationkey,
             substr(c_name, 1, 9 + (c_custkey % 9))
               || substr(c_name, 11 + (c_custkey % 9)) AS r_name
      FROM customer WHERE c_custkey % 3 = 1
    ), lv AS (
      SELECT c_custkey, c_name, c_nationkey,
             unnest(list_transform(range(0, len(c_name) + 1),
               i -> CASE WHEN i = 0 THEN c_name
                         ELSE substr(c_name, 1, CAST(i - 1 AS INT))
                              || substr(c_name, CAST(i + 1 AS INT)) END)) AS variant
      FROM customer
    ), rv AS (
      SELECT r_id, r_name, c_nationkey,
             unnest(list_transform(range(0, len(r_name) + 1),
               i -> CASE WHEN i = 0 THEN r_name
                         ELSE substr(r_name, 1, CAST(i - 1 AS INT))
                              || substr(r_name, CAST(i + 1 AS INT)) END)) AS variant
      FROM dirty
    ), cand AS (
      SELECT DISTINCT c_custkey, c_name, lv.c_nationkey, r_id, r_name
      FROM lv JOIN rv ON lv.c_nationkey = rv.c_nationkey AND lv.variant = rv.variant
    )
    SELECT c_custkey, c_name, c_nationkey, r_id, r_name,
           CAST(levenshtein(c_name, r_name) AS INT) AS edit_dist
    FROM cand
    WHERE levenshtein(c_name, r_name) <= 1
    """,
)
def entity_match_ed1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution (operators/entity.py): match clean
    customer names against a deterministically corrupted registry
    (digit deleted at position custkey%9) using deletion-neighborhood
    candidates (FastSS) + levenshtein verification, blocked on
    nationkey. Candidates are O(n*L) explode + one equi-join — never
    the O(n^2) cartesian a naive fuzzy join needs, and immune to the
    prefix-skew trap (every name here shares 'Customer#0000…')."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import fuzzy_join_ed1

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    p = F.col("c_custkey") % 9
    dirty = cust.filter(F.col("c_custkey") % 3 == 1).select(
        F.col("c_custkey").alias("r_id"),
        "c_nationkey",
        F.concat(
            F.substring(F.col("c_name"), F.lit(1), F.lit(9) + p),
            F.substr(F.col("c_name"), F.lit(11) + p),
        ).alias("r_name"),
    )
    matched = fuzzy_join_ed1(cust, dirty, "c_name", "r_name", block=["c_nationkey"])
    return matched.select(
        "c_custkey", "c_name", "c_nationkey", "r_id", "r_name",
        F.col("edit_dist").cast("int").alias("edit_dist"),
    )


@register(
    "triangle_count_parts",
    """
    WITH e AS (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY 1
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY 1
    )
    SELECT deg.v, deg.deg, COALESCE(n_triangles, 0) AS n_triangles
    FROM deg LEFT JOIN corners ON deg.v = corners.v
    """,
)
def triangle_count_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the RECURRING co-purchase graph
    (operators/graph.py triangle_counts): edges are part pairs seen in
    >= 2 distinct orders — the support threshold is what makes the
    workload scale-stable (single-co-occurrence noise edges grow
    linearly with the data and densified the graph to 1.2M edges at
    sf0.1; recurring pairs stay ~4k). Degree-oriented wedge
    enumeration (Suri & Vassilvitskii WWW'11) — each triangle found
    once from its lowest-degree corner, join fan-out bounded by
    arboricity, so hub parts cannot create a quadratic reducer. The
    oracle enumerates triangles the canonical a<b<c way; results are
    identical, orientation is purely the scale strategy."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import triangle_counts

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(edges)


# =====================================================================
# Splits, per-group sampling, n-gram counts (text/mixing.py, analysis.py)
# =====================================================================

@register(
    "split_assign_docs",
    """
    WITH b AS (
      SELECT doc_id, source,
             ((doc_id * 2654435761) % 4294967296) % 10000 AS bucket
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def split_assign_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (text/mixing.py
    split_assign): hash-bucketed by doc_id, zero shuffle, stable
    under corpus growth — a document can never silently migrate
    between splits on rerun (the re-randomization leakage bug)."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import split_assign

    docs = read_documents(spark, sf_dir).select("doc_id", "source")
    return split_assign(docs, "doc_id")


@register(
    "group_sample_reservoir",
    """
    WITH h AS (
      SELECT doc_id, lang, source,
             ((doc_id * 2654435761) % 4294967296) % 10000 AS hb
      FROM documents
    )
    SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS sample_rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rn
      FROM h
    ) WHERE rn <= 5
    """,
)
def group_sample_reservoir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language 5-doc sample (text/mixing.py
    group_sample_topk): reservoir semantics with a portable hash in
    place of the RNG — reproducible across engines/partitionings,
    one hash-partitioned window, hot-group cap documented."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import group_sample_topk

    docs = read_documents(spark, sf_dir).select("doc_id", "lang", "source")
    return group_sample_topk(docs, ["lang"], "doc_id", k=5)


@register(
    "ngram_counts_pruned",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                    i -> t[i] || ' ' || t[i + 1])) AS gram
      FROM toks
    )
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM grams
    GROUP BY 1
    HAVING COUNT(*) >= 5
    """,
)
def ngram_counts_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned bigram count table (text/analysis.py ngrams_expr) — the
    LM-count-table build step: explode bigrams, count occurrences +
    document frequency, min-count prune (count >= 5, the standard
    KenLM-style threshold that drops the singleton long tail, which
    at 100 TB is ~80% of distinct grams and pure noise). One explode
    + one partial-aggregated shuffle on the gram key."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr

    docs = read_documents(spark, sf_dir)
    grams = docs.select("doc_id", F.explode(ngrams_expr("text", 2)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 5)
    )


# =====================================================================
# Embedding compression (similarity/projection.py)
# =====================================================================

def _proj_oracle_sql(d_in: int = 64, d_out: int = 8) -> str:
    """Build the projection oracle: one list-fold per output coord,
    mirroring the Spark fold's summation order term for term."""
    def coord(j: int) -> str:
        return (
            "list_reduce(list_prepend(0.0, list_transform(range(0, %d), "
            "i -> CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) * "
            "(CASE WHEN (i * 2654435761 + %d) %% 2 = 0 THEN 1.0 ELSE -1.0 END))), "
            "(acc, x) -> acc + x) / sqrt(%s)" % (d_in, j * 40503, float(d_out))
        )
    p_cols = ",\n             ".join(f"{coord(j)} AS p_{j}" for j in range(d_out))
    sq = " + ".join(f"p_{j} * p_{j}" for j in range(d_out))
    return f"""
    WITH proj AS (
      SELECT vec_id, label,
             {p_cols},
             list_reduce(list_prepend(0.0, list_transform(range(0, {d_in}),
               i -> CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                    * CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE))),
               (acc, x) -> acc + x) AS orig_sq
      FROM embeddings
    )
    SELECT vec_id, label, {", ".join(f"p_{j}" for j in range(d_out))},
           CASE WHEN orig_sq > 0 THEN (0.0 + {sq}) / orig_sq ELSE 0.0 END AS norm_ratio
    FROM proj
    """


@register("random_projection_compress", _proj_oracle_sql())
def random_projection_compress_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-dim -> 8-dim Rademacher JL projection
    (similarity/projection.py): seedless integer sign formula, ordered
    double folds, zero shuffle — compresses a 100 TB embedding table
    at scan speed as the front-end to ANN/dedup. norm_ratio is the JL
    distortion diagnostic."""
    from dpe_energy_performance_analysis_etl_spark.similarity.projection import project_embeddings

    return project_embeddings(read_embeddings(spark, sf_dir), "embedding", 64, 8)


# =====================================================================
# Sequence analytics: transitions & attribution (operators/temporal.py)
# =====================================================================

@register(
    "event_transition_matrix",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
    FROM pairs
    """,
)
def event_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/temporal.py event_transitions): one
    user-keyed window pass + one aggregation; row-count output is
    |types|^2. prob divides two exact BIGINTs — engine-exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import event_transitions

    return event_transitions(read_events(spark, sf_dir))


@register(
    "attribution_first_last",
    """
    WITH conv AS (
      SELECT user_id, ts AS conv_ts, event_id AS conv_tb FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ), prior AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type
      FROM events e JOIN conv c ON e.user_id = c.user_id
      WHERE e.ts < c.conv_ts OR (e.ts = c.conv_ts AND e.event_id < c.conv_tb)
    ), touches AS (
      SELECT user_id,
             (list(event_type ORDER BY ts, event_id))[1] AS first_touch,
             (list(event_type ORDER BY ts DESC, event_id DESC))[1] AS last_touch,
             CAST(COUNT(*) AS BIGINT) AS n_prior_events
      FROM prior GROUP BY 1
    )
    SELECT c.user_id, c.conv_ts, first_touch, last_touch,
           COALESCE(n_prior_events, 0) AS n_prior_events
    FROM conv c LEFT JOIN touches t ON c.user_id = t.user_id
    """,
)
def attribution_first_last_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution
    (operators/temporal.py conversion_attribution): min-struct
    aggregates on the user key, no full-table window; the
    one-row-per-converting-user table joins back broadcast/AQE."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import conversion_attribution

    return conversion_attribution(read_events(spark, sf_dir), "purchase")


@register(
    "low_value_runs",
    """
    WITH rn AS (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
             value < 30.0 AS m
      FROM events
    ), matched AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, m ORDER BY ts, event_id) AS rn_m
      FROM rn
    ), islands AS (
      SELECT user_id, ts, event_id, value, rn_all - rn_m AS island
      FROM matched WHERE m
    )
    SELECT user_id,
           (list(ts ORDER BY ts, event_id))[1] AS start_ts,
           (list(event_id ORDER BY ts, event_id))[1] AS start_event_id,
           (list(ts ORDER BY ts DESC, event_id DESC))[1] AS end_ts,
           (list(event_id ORDER BY ts DESC, event_id DESC))[1] AS end_event_id,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM islands
    GROUP BY user_id, island
    HAVING COUNT(*) >= 3
    """,
)
def low_value_runs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run segmentation (operators/temporal.py
    threshold_run_segments): maximal runs of >= 3 consecutive
    below-threshold events per user — the same operator that does
    audio silence detection over RMS frame tables (see
    tests/test_media_segments.py for the WAV end-to-end). Both
    row_numbers share one (user) shuffle + one sort."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import threshold_run_segments

    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    return threshold_run_segments(
        ev, "user_id", ["ts", "event_id"], "value", threshold=30.0, min_len=3
    )


# =====================================================================
# Analytics widening: recommender, binning, chi2, paths, winsorize,
# inverted index
# =====================================================================

@register(
    "item_item_cosine_sim",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), supp AS (
      SELECT item, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT item_a, item_b, support,
           sa.s AS supp_a, sb.s AS supp_b,
           CAST(support AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS lift,
           CAST(support AS DOUBLE)
             / sqrt(CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)) AS cosine
    FROM pairs
    JOIN supp sa ON pairs.item_a = sa.item
    JOIN supp sb ON pairs.item_b = sb.item
    CROSS JOIN n
    """,
)
def item_item_cosine_sim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine recommender weights (operators/basket.py
    item_item_cosine) over orders-as-baskets: bounded per-basket pair
    generation + IEEE-exact sqrt normalization (Sarwar et al. WWW'01
    neighborhood CF)."""
    from dpe_energy_performance_analysis_etl_spark.operators.basket import item_item_cosine

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return item_item_cosine(li, "l_orderkey", "l_partkey", min_support=3)


@register(
    "equi_depth_bins_price",
    """
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM t GROUP BY 1
    """,
)
def equi_depth_bins_price_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order prices
    (operators/quantiles.py equi_depth_bins): rank-based ntile with a
    unique tiebreak, skew-proof histogram boundaries. The global sort
    is the exact-path cost; histogram_quantiles is the sortless
    approximate twin."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import equi_depth_bins

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_totalprice", "o_orderkey")
    return equi_depth_bins(orders, "o_totalprice", n_bins=10, order_tiebreak="o_orderkey")


@register(
    "contingency_chi2_cells",
    """
    WITH cells AS (
      SELECT o_orderpriority AS row_val, o_orderstatus AS col_val,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT row_val, CAST(SUM(obs) AS BIGINT) AS row_total FROM cells GROUP BY 1
    ), ct AS (
      SELECT col_val, CAST(SUM(obs) AS BIGINT) AS col_total FROM cells GROUP BY 1
    ), nn AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells
    )
    SELECT row_val, col_val, obs, row_total, col_total, n,
           CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           (CAST(obs AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(obs AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_contrib
    FROM cells JOIN rt USING (row_val) JOIN ct USING (col_val) CROSS JOIN nn
    """,
)
def contingency_chi2_cells_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for order priority x status
    (operators/stats.py contingency_cells): per-cell expected counts
    and chi2 contributions in exact rational arithmetic; the global
    statistic is the caller's fixed-order sum over the tiny cell
    table (a parallel double SUM is last-ulp nondeterministic)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import contingency_cells

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return contingency_cells(orders, "o_orderpriority", "o_orderstatus")


@register(
    "user_event_paths",
    """
    WITH per_user AS (
      SELECT user_id,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:3], '>') AS path
      FROM events GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY 1
    """,
)
def user_event_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-path mining (operators/temporal.py common_event_paths):
    each user's first 3 event types as an ordered path string, counted
    across users. Struct-sort makes collect_list deterministic; one
    user-key aggregation + a count over the tiny path table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import common_event_paths

    return common_event_paths(read_events(spark, sf_dir), k=3)


@register(
    "winsorize_acctbal",
    """
    WITH bounds AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY 1
    )
    SELECT c_custkey, c.c_mktsegment, c_acctbal,
           greatest(least(c_acctbal, hi), lo) AS c_acctbal_winsorized
    FROM customer c JOIN bounds b ON c.c_mktsegment = b.c_mktsegment
    """,
)
def winsorize_acctbal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment winsorization of account balances
    (operators/aggregate.py winsorize): exact 5%/95% quantiles in a
    tiny per-group table broadcast back, row-local clip. approx=True
    is the documented single-pass 100 TB path."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import winsorize

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return winsorize(cust, "c_acctbal", ["c_mktsegment"], lo=0.05, hi=0.95).select(
        "c_custkey", "c_mktsegment", "c_acctbal", "c_acctbal_winsorized"
    )


@register(
    "inverted_index_postings",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), flat AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
                    i -> struct_pack(term := t[i], pos := CAST(i - 1 AS BIGINT)))) AS o
      FROM toks
    )
    SELECT o.term AS term, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           array_to_string(list(o.pos ORDER BY o.pos), ',') AS positions
    FROM flat GROUP BY 1, 2
    """,
)
def inverted_index_postings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index over the corpus
    (text/retrieval.py inverted_postings): posexplode inside codegen,
    one (term, doc) aggregation, row-local sort_array for
    deterministic posting lists. The posting list is emitted as a
    comma-joined string — the driver's canonicalizer rejects ARRAY
    output columns (r4 snapshot_diff lesson)."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import inverted_postings

    return inverted_postings(read_documents(spark, sf_dir)).withColumn(
        "positions",
        F.array_join(F.transform("positions", lambda x: x.cast("string")), ","),
    )


@register(
    "phrase_search_docs",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), flat AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
                    i -> struct_pack(term := t[i], pos := CAST(i - 1 AS BIGINT)))) AS o
      FROM toks
    ), post AS (
      SELECT o.term AS term, doc_id, list(o.pos ORDER BY o.pos) AS positions
      FROM flat GROUP BY 1, 2
    ), p0 AS (
      SELECT doc_id, positions AS a FROM post WHERE term = 'spark'
    ), p1 AS (
      SELECT doc_id, positions AS b FROM post WHERE term = 'join'
    )
    SELECT p0.doc_id,
           CAST(len(list_intersect(a, list_transform(b, x -> x - 1))) AS BIGINT) AS n_matches
    FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id
    WHERE len(list_intersect(a, list_transform(b, x -> x - 1))) > 0
    """,
)
def phrase_search_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search for the adjacent pair 'spark join'
    (text/retrieval.py phrase_search): term-filtered posting lists,
    one doc-keyed equi-join, adjacency via shifted position-set
    intersection — entirely row-local after the join."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import phrase_search

    return phrase_search(read_documents(spark, sf_dir), ["spark", "join"])


@register(
    "ewma_user_values",
    """
    WITH clean AS (
      SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL
    ), arrs AS (
      SELECT user_id, ts, event_id, value,
             list_reverse(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) AS arr
      FROM clean
    )
    SELECT user_id, ts, event_id, value,
           list_reduce(list_prepend(0.0,
             list_transform(range(1, len(arr) + 1),
                            i -> arr[i] / CAST((1::BIGINT << i) AS DOUBLE))),
             (acc, x) -> acc + x)
           / (1.0 - 1.0 / CAST((1::BIGINT << len(arr)) AS DOUBLE)) AS ewma
    FROM arrs
    """,
)
def ewma_user_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic EWMA smoothing of per-user event values
    (operators/temporal.py ewma_dyadic): alpha = 1/2 trailing-8
    window; every weight an exact power of two so the smoothed series
    is bit-identical across engines. One user-key shuffle."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import ewma_dyadic

    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    return ewma_dyadic(ev, "user_id", ["ts", "event_id"], "value", window=8)


# =====================================================================
# Periodic analytics, experimentation, governance (operators/quality.py,
# stats.py)
# =====================================================================

@register(
    "month_over_month_revenue",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (ORDER BY month) IS NULL THEN NULL
                ELSE (revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month) END AS mom_change
    FROM monthly
    """,
)
def month_over_month_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue with percent change: exact decimal
    monthly sums (dsum), one lag window over the tiny month table —
    the period-over-period reporting staple. The window runs over
    ~|months| rows, never the fact table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise((F.col("revenue") - prev) / prev)
        .alias("mom_change"),
    )


@register(
    "expectations_orders",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(o_custkey IS NULL) AS BIGINT) AS v0,
             CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v1,
             CAST(count_if(o_totalprice IS NOT NULL
                           AND (o_totalprice < 0 OR o_totalprice > 300000)) AS BIGINT) AS v2,
             CAST(count_if(o_orderstatus IS NOT NULL
                           AND o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT) AS v3
      FROM orders
    )
    SELECT 'not_null' AS rule, 'o_custkey' AS col, n AS n_rows, v0 AS n_violations,
           CAST(v0 AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE) AS violation_rate,
           v0 = 0 AS passed FROM m
    UNION ALL
    SELECT 'unique', 'o_orderkey', n, v1,
           CAST(v1 AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), v1 = 0 FROM m
    UNION ALL
    SELECT 'range', 'o_totalprice', n, v2,
           CAST(v2 AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), v2 = 0 FROM m
    UNION ALL
    SELECT 'in_set', 'o_orderstatus', n, v3,
           CAST(v3 AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), v3 = 0 FROM m
    """,
)
def expectations_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation report (operators/quality.py
    expectation_report): four rules — not-null key, unique PK, price
    range (deliberately tight so the report shows real violations),
    status domain — all evaluated in ONE aggregation pass over the
    table regardless of rule count."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import expectation_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rules = [
        {"rule": "not_null", "col": "o_custkey"},
        {"rule": "unique", "col": "o_orderkey"},
        {"rule": "range", "col": "o_totalprice", "min": 0, "max": 300000},
        {"rule": "in_set", "col": "o_orderstatus", "values": ["F", "O", "P"]},
    ]
    return expectation_report(orders, rules)


@register(
    "k_anonymity_customers",
    """
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(*) < 5
    """,
)
def k_anonymity_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/quality.py
    k_anonymity_violations): quasi-identifier groups (nation,
    segment) smaller than k=5 — the re-identifiable cohorts to
    suppress before sharing. One groupBy on the quasi key."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import k_anonymity_violations

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return k_anonymity_violations(cust, ["c_nationkey", "c_mktsegment"], k=5)


@register(
    "ab_test_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN ((user_id * 2654435761) % 4294967296) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             count_if(event_type = 'purchase') >= 15 AS converted
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(converted) AS BIGINT) AS succ
      FROM per_user GROUP BY 1
    ), a AS (
      SELECT arm AS arm_a, n AS n_a, succ AS succ_a FROM arms ORDER BY arm LIMIT 1
    ), b AS (
      SELECT arm AS arm_b, n AS n_b, succ AS succ_b FROM arms ORDER BY arm DESC LIMIT 1
    )
    SELECT arm_a, arm_b, n_a, n_b, succ_a, succ_b,
           CAST(succ_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
           CAST(succ_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
           CASE WHEN sqrt((CAST(succ_a + succ_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(succ_a + succ_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) > 0
           THEN (CAST(succ_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(succ_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt((CAST(succ_a + succ_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(succ_a + succ_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END AS z
    FROM a CROSS JOIN b
    """,
)
def ab_test_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (operators/stats.py
    two_proportion_ztest): users hash-split into two arms (the same
    portable Knuth hash as split_assign — assignment is reproducible
    and growth-stable), conversion = any purchase event, pooled
    two-proportion z statistic in fixed-order IEEE arithmetic."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import two_proportion_ztest

    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (F.count_if(F.col("event_type") == "purchase") >= 15).alias("converted")
    ).withColumn(
        "arm",
        F.when(((F.col("user_id") * 2654435761) % 4294967296) % 2 == 0, F.lit("A")).otherwise(
            F.lit("B")
        ),
    )
    return two_proportion_ztest(per_user, "arm", "converted")


@register(
    "weighted_sample_docs",
    """
    WITH p AS (
      SELECT doc_id, source, n_chars,
             (((((doc_id * 2654435761) % 4294967296) % 10000) + 1) * 1000000) // n_chars
               AS priority
      FROM documents
    )
    SELECT doc_id, source, n_chars, priority, CAST(rn AS BIGINT) AS sample_rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rn FROM p
    ) WHERE rn <= 20
    """,
)
def weighted_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-biased document sample (text/mixing.py
    weighted_sample_topk): integer priority hash DIV weight — longer
    documents preferentially selected, bit-reproducible, no RNG/pow.
    The global window ranks |corpus| rows; the documented hash
    pre-filter caps it at extreme scale."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import weighted_sample_topk

    docs = read_documents(spark, sf_dir).select("doc_id", "source", "n_chars")
    return weighted_sample_topk(docs, k=20, weight_col="n_chars")


@register("wordpiece_tokens")  # rows-only: greedy longest-match is not SQL
def wordpiece_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece subword tokenization (text/tokenizer.py): greedy
    longest-match pandas UDF (Arrow-batched — the legitimate Python
    path; per-word iteration isn't expressible in Catalyst), vocab
    indexed once per executor. Rows-only in the driver gate, same
    class as the UDAF stats; exactness pinned by the pure-Python
    reference tests."""
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import wordpiece_tokenize

    docs = read_documents(spark, sf_dir)
    return wordpiece_tokenize(docs, "text").select(
        "doc_id", "n_pieces", "n_unk", F.slice("pieces", 1, 8).alias("head_pieces")
    )


@register(
    "target_encode_loo_acctbal",
    """
    WITH cents AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), g AS (
      SELECT c_mktsegment, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(COUNT(c_acctbal) AS BIGINT) AS n
      FROM cents GROUP BY 1
    )
    SELECT c_custkey, c.c_mktsegment, c_acctbal,
           CASE WHEN n > 1
                THEN CAST(s - cents AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
           END AS c_mktsegment_target_enc
    FROM cents c JOIN g USING (c_mktsegment)
    """,
)
def target_encode_loo_acctbal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment by account
    balance (operators/aggregate.py target_encode_loo): integer-cents
    group sums so the LOO subtraction is exact; one tiny broadcast
    join, no window, no label leakage."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import target_encode_loo

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return target_encode_loo(cust, "c_mktsegment", "c_acctbal").select(
        "c_custkey", "c_mktsegment", "c_acctbal", "c_mktsegment_target_enc"
    )


@register(
    "feature_hash_customers",
    """
    WITH h AS (
      SELECT c_custkey, c_mktsegment, c_nationkey,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all('c_mktsegment:' || c_mktsegment, '.'),
                              x -> CAST(ascii(x) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000) % 256 AS h1,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all('c_nationkey:' || CAST(c_nationkey AS VARCHAR), '.'),
                              x -> CAST(ascii(x) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000) % 256 AS h2
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, c_nationkey,
           array_to_string(list_sort(list_distinct([h1, h2])), ',') AS feature_idx
    FROM h
    """,
)
def feature_hash_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing of categoricals into a 256-slot index space
    (operators/relational.py feature_hash_indices): vocabulary-free,
    state-free, portable rolling hash — zero shuffle, the sparse-ML
    input prep at scan speed. Indices emitted comma-joined (driver
    shape contract: no ARRAY output columns)."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import feature_hash_indices

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    return feature_hash_indices(cust, ["c_mktsegment", "c_nationkey"], 256).withColumn(
        "feature_idx",
        F.array_join(F.transform("feature_idx", lambda x: x.cast("string")), ","),
    )


@register(
    "vocab_id_assignment",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), tf AS (
      SELECT doc_id, unnest(t) AS term FROM toks
    ), tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2
    ), vocab AS (
      SELECT term, CAST(SUM(tf) AS BIGINT) AS n_occurrences,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM tfc GROUP BY 1
    )
    SELECT term, n_occurrences, n_docs,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term) - 1 AS BIGINT)
             AS token_id
    FROM vocab
    """,
)
def vocab_id_assignment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ordered vocabulary with contiguous 0-based token ids
    (text/retrieval.py vocab_with_ids) — the tokenizer/embedding
    lookup artifact. Corpus aggregates once; the ranking window runs
    over the tiny vocab table only."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import vocab_with_ids

    return vocab_with_ids(read_documents(spark, sf_dir)).select(
        "term", "n_occurrences", "n_docs", "token_id"
    )


@register(
    "point_in_polygon_tags",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey // 100) % 100 AS DOUBLE) / 10 AS lon,
             CAST(c_custkey % 100 AS DOUBLE) / 10 AS lat
      FROM customer
    ), polys AS (
      SELECT 'square' AS poly_id,
             [struct_pack(x := 2.0, y := 2.0), struct_pack(x := 2.0, y := 6.0),
              struct_pack(x := 6.0, y := 6.0), struct_pack(x := 6.0, y := 2.0)] AS v
      UNION ALL
      SELECT 'triangle',
             [struct_pack(x := 5.0, y := 1.0), struct_pack(x := 9.0, y := 1.0),
              struct_pack(x := 7.0, y := 8.0)]
      UNION ALL
      SELECT 'lshape',
             [struct_pack(x := 0.0, y := 0.0), struct_pack(x := 4.0, y := 0.0),
              struct_pack(x := 4.0, y := 2.0), struct_pack(x := 2.0, y := 2.0),
              struct_pack(x := 2.0, y := 4.0), struct_pack(x := 0.0, y := 4.0)]
    ), tagged AS (
      SELECT c_custkey, lon, lat, poly_id,
             list_reduce(list_prepend(0,
               list_transform(range(1, len(v) + 1), i ->
                 CASE WHEN ((v[i].y > lat) <> (v[(i % len(v)) + 1].y > lat))
                       AND (lon < (v[(i % len(v)) + 1].x - v[i].x) * (lat - v[i].y)
                                  / (v[(i % len(v)) + 1].y - v[i].y) + v[i].x)
                      THEN 1 ELSE 0 END)),
               (acc, c) -> acc + c) AS crossings,
             lon >= list_min(list_transform(v, s -> s.x))
               AND lon <= list_max(list_transform(v, s -> s.x))
               AND lat >= list_min(list_transform(v, s -> s.y))
               AND lat <= list_max(list_transform(v, s -> s.y)) AS bbox_hit
      FROM pts CROSS JOIN polys
    )
    SELECT c_custkey, lon, lat, poly_id
    FROM tagged WHERE bbox_hit AND crossings % 2 = 1
    """,
)
def point_in_polygon_tags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon geofencing (operators/spatial.py
    point_in_polygon_tag): even-odd ray casting as a codegen'd fold
    over broadcast polygon rings (square, triangle, concave L) on the
    synthesized customer coordinates — bbox prefilter, |polys|
    bounded fan-out, the point table never shuffles."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import point_in_polygon_tag

    pts = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.expr("c_custkey div 100") % 100).cast("double") / 10).alias("lon"),
        ((F.col("c_custkey") % 100).cast("double") / 10).alias("lat"),
    )
    polys = spark.createDataFrame(
        [
            ("square", [(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0)]),
            ("triangle", [(5.0, 1.0), (9.0, 1.0), (7.0, 8.0)]),
            ("lshape", [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]),
        ],
        "poly_id string, vertices array<struct<x: double, y: double>>",
    )
    return point_in_polygon_tag(pts, polys)


# =====================================================================
# Wave 4 — grouped OLS, robust outliers, hopping windows, hard negatives
# =====================================================================

@register(
    "group_linregress_qty_disc",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS sxi,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS syi
      FROM lineitem
    ), g AS (
      SELECT l_returnflag, COUNT(*) AS n_obs,
             SUM(CAST(sxi AS HUGEINT)) AS sx, SUM(CAST(syi AS HUGEINT)) AS sy,
             SUM(CAST(sxi AS HUGEINT) * sxi) AS sxx,
             SUM(CAST(sxi AS HUGEINT) * syi) AS sxy,
             SUM(CAST(syi AS HUGEINT) * syi) AS syy
      FROM s GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_obs,
           CASE WHEN CAST(n_obs * sxx - sx * sx AS DOUBLE) > 0
                THEN CAST(n_obs * sxy - sx * sy AS DOUBLE)
                     / CAST(n_obs * sxx - sx * sx AS DOUBLE) * 1.0
           END AS slope,
           CASE WHEN CAST(n_obs * sxx - sx * sx AS DOUBLE) > 0
                THEN CAST(sy AS DOUBLE) / 100 / CAST(n_obs AS DOUBLE)
                     - CAST(n_obs * sxy - sx * sy AS DOUBLE)
                       / CAST(n_obs * sxx - sx * sx AS DOUBLE) * 1.0
                       * (CAST(sx AS DOUBLE) / 100 / CAST(n_obs AS DOUBLE))
           END AS intercept,
           CASE WHEN CAST(n_obs * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n_obs * syy - sy * sy AS DOUBLE) > 0
                THEN (CAST(n_obs * sxy - sx * sy AS DOUBLE) * CAST(n_obs * sxy - sx * sy AS DOUBLE))
                     / (CAST(n_obs * sxx - sx * sx AS DOUBLE) * CAST(n_obs * syy - sy * sy AS DOUBLE))
           END AS r2
    FROM g
    """,
)
def group_linregress_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (operators/stats.py group_linregress):
    quantity → discount per returnflag. Exact integer moment sums in
    decimal(38) (order-free), one double cast per closed-form piece,
    fixed-shape IEEE finals — engine-reproducible without any libm.
    One map-side-partial groupBy shuffle of 5 long partials/group.
    Generalizes the reference's per-group statistics step
    (``transform.py:313-376``) to a regression."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import group_linregress

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return group_linregress(li, "l_returnflag", "l_quantity", "l_discount", 2, 2)


@register(
    "robust_outliers_mad",
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS DOUBLE) AS cents
      FROM lineitem
    ), med AS (
      SELECT l_returnflag, quantile_cont(cents, 0.5) AS median_cents
      FROM base GROUP BY 1
    ), dev AS (
      SELECT b.l_returnflag, abs(b.cents - m.median_cents) AS dev
      FROM base b JOIN med m USING (l_returnflag)
    ), mad AS (
      SELECT l_returnflag, quantile_cont(dev, 0.5) AS mad_cents
      FROM dev GROUP BY 1
    ), f AS (
      SELECT d.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CASE WHEN d.dev > 1.5 * a.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev d JOIN mad a USING (l_returnflag) GROUP BY 1
    )
    SELECT m.l_returnflag, f.n_obs, m.median_cents, a.mad_cents, f.n_outliers
    FROM med m JOIN mad a USING (l_returnflag) JOIN f USING (l_returnflag)
    """,
)
def robust_outliers_mad_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-Absolute-Deviation outlier report
    (operators/stats.py mad_outlier_report) on extendedprice per
    returnflag. Integer-cents domain keeps every quantile
    interpolation exactly representable (dyadic), so the report is
    bit-identical across engines; k = 3/2 is dyadic by design. The
    robust counterpart of the IQR fences (``transform.py:120-126``)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import mad_outlier_report

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return mad_outlier_report(li, "l_returnflag", "l_extendedprice", 2)


@register(
    "events_hopping_window",
    """
    WITH w AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS window_start,
             event_type, value
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def events_hopping_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 2-hour windows advancing
    every hour, so each event lands in exactly two overlapping
    windows. ``F.window(slide=...)`` explodes to the |window/slide|
    assignments BEFORE the shuffle, keeping aggregation map-side
    partial — the streaming-native sibling of events_tumbling_window
    (identical groupBy works under readStream with a watermark)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "hard_negative_mining",
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neg_label,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM n q JOIN n c ON q.vec_id != c.vec_id AND q.label <> c.label
      WHERE q.vec_id < 10
    )
    SELECT query_id, query_label, neighbor_id, neg_label, cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def hard_negative_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (similarity/ann.py hard_negative_topk): per query vector, the 5
    most-cosine-similar corpus vectors with a DIFFERENT label. Query
    set broadcasts with labels; the corpus streams past once and never
    shuffles; label inequality prunes pairs inside the join condition
    before any scoring."""
    from dpe_energy_performance_analysis_etl_spark.similarity.ann import hard_negative_topk

    emb = read_embeddings(spark, sf_dir)
    return hard_negative_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "bpe_pair_stats",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents
    ), vocab AS (
      SELECT word, COUNT(*) AS wcount FROM tok GROUP BY word
    ), inner_pairs AS (
      SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair, wcount
      FROM (SELECT word, wcount, unnest(generate_series(1, length(word) - 1)) AS i FROM vocab)
    ), eow_pairs AS (
      SELECT substr(word, length(word), 1) || ' </w>' AS pair, wcount FROM vocab
    ), counts AS (
      SELECT pair, SUM(wcount) AS pair_count FROM (
        SELECT * FROM inner_pairs UNION ALL SELECT * FROM eow_pairs
      ) GROUP BY pair
    )
    SELECT pair, CAST(pair_count AS BIGINT) AS pair_count, rank FROM (
      SELECT pair, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
      FROM counts
    ) WHERE rank <= 20
    """,
)
def bpe_pair_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE iteration-0 pair statistics (text/tokenizer.py
    bpe_pair_counts): corpus-weighted adjacent character-pair counts
    incl. the terminal (char, </w>) pair; the top-1 row IS the first
    BPE merge. One corpus-scale explode+groupBy (the word-count
    table); all pair math runs over |vocab| rows, and the global
    ranking window covers only the |alphabet|^2-bounded pair table."""
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_pair_counts

    return bpe_pair_counts(read_documents(spark, sf_dir), "text", top_k=20)


@register("bpe_learn_merges")
def bpe_learn_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 learned BPE merges (text/tokenizer.py
    bpe_learn_merges): greedy argmax of exact integer pair counts per
    round, lexicographic tiebreak — deterministic across
    partitionings. Rows-only by design: the merge chosen each round
    depends on the previous round's output (iterative control flow,
    not a SQL shape); correctness is pinned by the pure-Python
    reference tests in tests/test_tokenizer.py."""
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_learn_merges

    return bpe_learn_merges(read_documents(spark, sf_dir), "text", n_merges=6)


@register(
    "setsim_prefix_pairs",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shset
      FROM tok WHERE len(t) >= 3
    ), post AS (
      SELECT doc_id, unnest(shset) AS shingle FROM sh
    ), dfreq AS (
      SELECT shingle, COUNT(*) AS dfreq FROM post GROUP BY shingle
    ), ranked AS (
      SELECT p.doc_id, p.shingle,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY d.dfreq, p.shingle) AS pos,
             COUNT(*) OVER (PARTITION BY p.doc_id) AS n
      FROM post p JOIN dfreq d USING (shingle)
    ), prefix AS (
      -- integer ceil(t*n) with t = 1/2 rational: (1*n + 2 - 1) // 2
      SELECT doc_id, shingle FROM ranked
      WHERE pos <= n - ((1 * n + 1) // 2) + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(sa.shset, sb.shset)) AS n_common,
             len(sa.shset) AS len_a, len(sb.shset) AS len_b,
             CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE)
               / CAST(len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset)) AS DOUBLE) AS jaccard
      FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common, jaccard
    FROM verified
    WHERE n_common * 2 >= 1 * (len_a + len_b - n_common)
    """,
)
def setsim_prefix_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered EXACT Jaccard >= 0.5 self-join
    (dedup/setsim.py): identical output to the full posting-list join
    at this threshold, but only the rarest |x|-ceil(t|x|)+1 tokens of
    each record generate candidates — the frequency-ascending prefix
    order keeps hot tokens (the quadratic killers) out of the join.
    Third dedup candidate strategy next to posting-list-exact and
    MinHash-LSH-approximate."""
    from dpe_energy_performance_analysis_etl_spark.dedup.setsim import prefix_filter_jaccard_join

    return prefix_filter_jaccard_join(
        read_documents(spark, sf_dir), "text", "doc_id", n=3, threshold=0.5
    ).withColumn("n_common", F.col("n_common").cast("bigint"))


@register(
    "pq_adc_seeded_topk",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), ss AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ), subs AS (
      SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM base CROSS JOIN ss
    ), cents AS (
      SELECT vec_id AS cid, s, sv AS cv FROM subs WHERE vec_id < 16
    ), dists AS (
      SELECT sub.vec_id, sub.s, c.cid,
             list_dot_product(
               list_transform(range(1, 9), i -> sub.sv[i] - c.cv[i]),
               list_transform(range(1, 9), i -> sub.sv[i] - c.cv[i])) AS d2
      FROM subs sub JOIN cents c USING (s)
    ), codes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS r
        FROM dists
      ) WHERE r = 1
    ), luts AS (
      SELECT vec_id AS query_id, s, cid, d2 FROM dists WHERE vec_id < 10
    ), terms AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, c.s, l.d2 AS term
      FROM codes c JOIN luts l ON l.s = c.s AND l.cid = c.code
      WHERE l.query_id <> c.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             list_dot_product(list(term ORDER BY s),
                              list_transform(list(term ORDER BY s), t -> 1.0)) AS adist
      FROM terms GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, adist, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def pq_adc_seeded_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scoring
    (similarity/pq.py): 64-dim vectors -> 8 subspace codes against a
    16-centroid seeded codebook (32x memory compression); per-query
    full-precision LUTs broadcast; corpus CODES stream past the
    scorer — raw vectors are never touched after encoding. Seeded
    twin of the Lloyd-trained pq_topk (same split as IVF), replayed
    bit-exactly by the SQL oracle; the ADC fold is dot-with-ones so
    both engines sum subspace terms in identical order."""
    from dpe_energy_performance_analysis_etl_spark.similarity.pq import seeded_pq_topk

    emb = read_embeddings(spark, sf_dir)
    return seeded_pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _kcore_oracle(k: int, iterations: int) -> str:
    """Chained-CTE replay of ``iterations`` bulk peel rounds — each
    round is a pure function of the previous edge set, so a fixed
    unrolling is bit-identical to the Spark loop's prefix.

    Every CTE is AS MATERIALIZED: each e_i is referenced three times
    by round i+1, so DuckDB's default inlining re-evaluates the whole
    peel prefix per reference — measured 150 s vs 0.6 s materialized
    at sf0.01 (the SQL mirror of the Spark loop's per-round cache)."""
    blocks = [
        """
    WITH e0 AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""
    ]
    for i in range(iterations):
        blocks.append(
            f""", k{i} AS MATERIALIZED (
      SELECT v FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b FROM e{i})
      GROUP BY v HAVING COUNT(*) >= {k}
    ), e{i + 1} AS MATERIALIZED (
      SELECT e{i}.a, e{i}.b FROM e{i}
      JOIN k{i} x ON e{i}.a = x.v JOIN k{i} y ON e{i}.b = y.v
    )"""
        )
    last = iterations
    blocks.append(
        f"""
    SELECT v, CAST(deg AS BIGINT) AS core_degree FROM (
      SELECT v, COUNT(*) AS deg
      FROM (SELECT a AS v FROM e{last} UNION ALL SELECT b AS v FROM e{last})
      GROUP BY v
    ) WHERE deg >= {k}"""
    )
    return "".join(blocks)


@register("kcore_membership", _kcore_oracle(k=3, iterations=4))
def kcore_membership_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership after 4 bulk peel rounds
    (operators/graph.py kcore_peel) on the recurring-pair part graph
    (same scale-stable support>=2 graph as triangle_count_parts).
    Fixed-round prefix registered for oracle parity — peeling is
    confluent, so the unrolled CTE replay matches the loop exactly;
    the operator's iterations=None mode runs the same rounds to
    fixpoint with one count-action per round."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import kcore_peel

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return kcore_peel(pairs, k=3, iterations=4)


@register(
    "source_overlap_matrix",
    """
    WITH tok AS (
      SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), sg AS MATERIALIZED (
      SELECT DISTINCT source,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM tok WHERE len(t) >= 3
    ), sizes AS (
      SELECT source, COUNT(*) AS n_grams FROM sg GROUP BY source
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(least(sa.n_grams, sb.n_grams) AS DOUBLE) AS overlap_coef
    FROM pairs
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def source_overlap_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (text/curation.py
    source_overlap_matrix): distinct 3-gram overlap counts + overlap
    coefficient per source pair. Per-gram join fan-out bounded by
    |sources| after the distinct; per-source sizes broadcast."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import source_overlap_matrix

    return source_overlap_matrix(read_documents(spark, sf_dir))


@register(
    "length_bucket_batches",
    """
    WITH seqs AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
      FROM documents
    ), assigned AS (
      SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
             (row_number() OVER (PARTITION BY (n_tokens // 64) ORDER BY doc_id) - 1) // 8 AS batch_id
      FROM seqs
    )
    SELECT bucket, batch_id, CAST(COUNT(*) AS BIGINT) AS n_seqs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_waste
    FROM assigned GROUP BY 1, 2
    """,
)
def length_bucket_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning (text/packing.py
    length_bucket_batches): token-length buckets of width 64,
    deterministic batches of 8 within each bucket, per-batch padding
    bill. One bucket-keyed exchange; batches stable across
    partitionings (window ordered by the unique doc id)."""
    from dpe_energy_performance_analysis_etl_spark.text.packing import length_bucket_batches

    return length_bucket_batches(read_documents(spark, sf_dir))


@register(
    "negative_sampling_words",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents
    ), vocab AS (
      SELECT word, COUNT(*) AS wcount FROM tok GROUP BY word
    ), scored AS (
      SELECT word, wcount,
             sqrt(sqrt(CAST(wcount AS DOUBLE) * CAST(wcount AS DOUBLE) * CAST(wcount AS DOUBLE))) AS weight,
             CAST(((list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(regexp_extract_all(word, '.'),
                                    c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 131 + x) % 1000000000000000) % 10000) + 1) AS DOUBLE)
               / sqrt(sqrt(CAST(wcount AS DOUBLE) * CAST(wcount AS DOUBLE) * CAST(wcount AS DOUBLE))) AS priority
      FROM vocab
    )
    SELECT word, wcount, weight, CAST(rank AS BIGINT) AS sample_rank FROM (
      SELECT word, wcount, weight,
             row_number() OVER (ORDER BY priority, word) AS rank
      FROM scored
    ) WHERE rank <= 25
    """,
)
def negative_sampling_words_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SGNS negative-sampling table (text/mixing.py
    negative_sampling_table): unigram^(3/4) weights computed as
    sqrt(sqrt(cnt^3)) — the libm-free exact form — and a deterministic
    25-word weight-biased draw via portable-hash/weight priorities.
    One corpus explode+groupBy; the ranking window covers only the
    bounded vocab table."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import negative_sampling_table

    return negative_sampling_table(read_documents(spark, sf_dir), k=25)


@register(
    "bootstrap_mean_ci",
    """
    WITH base AS (
      SELECT l_returnflag AS k, l_orderkey * 10 + l_linenumber AS rid,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), weighted AS (
      SELECT k, b, cents,
             CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1 WHEN h < 9197 THEN 2
                  WHEN h < 9810 THEN 3 WHEN h < 9963 THEN 4 WHEN h < 9994 THEN 5
                  WHEN h < 9999 THEN 6 ELSE 7 END AS w
      FROM (
        SELECT k, cents, b, xor(s2, s2 >> 16) % 10000 AS h
        FROM (
          SELECT k, cents, b, (xor(s1, s1 >> 16) * 73244475) % 4294967296 AS s2
          FROM (
            SELECT k, cents, b, (xor(s0, s0 >> 16) * 73244475) % 4294967296 AS s1
            FROM (
              SELECT k, cents, b,
                     ((rid % 4294967296) * 73244475 + b * 2246822519) % 4294967296 AS s0
              FROM base, (SELECT unnest(generate_series(0, 31)) AS b)
            )
          )
        )
      )
    ), rep AS (
      SELECT k, b, SUM(CAST(w AS HUGEINT) * cents) AS wsum, SUM(w) AS wn
      FROM weighted GROUP BY k, b HAVING SUM(w) > 0
    ), means AS (
      SELECT k, b, CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE) AS rep_mean FROM rep
    ), ranked AS (
      SELECT k, b, rep_mean,
             row_number() OVER (PARTITION BY k ORDER BY rep_mean ASC, b) AS r_lo,
             row_number() OVER (PARTITION BY k ORDER BY rep_mean DESC, b) AS r_hi
      FROM means
    ), ci AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_replicas,
             MAX(CASE WHEN r_lo = 2 THEN rep_mean END) AS ci_lo,
             MAX(CASE WHEN r_hi = 2 THEN rep_mean END) AS ci_hi
      FROM ranked GROUP BY k
    ), pt AS (
      SELECT k, CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cents
      FROM base GROUP BY k
    )
    SELECT pt.k AS l_returnflag, mean_cents, n_replicas, ci_lo, ci_hi
    FROM pt JOIN ci USING (k)
    """,
)
def bootstrap_mean_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap CI for the per-returnflag mean
    price (operators/stats.py bootstrap_mean_ci): portable-hash
    pseudo-Poisson(1) multiplicities, exact-integer replica sums,
    rank-based interval (2nd/2nd-last of 32 replica means — order
    statistics are engine-exact where percentile interpolation is
    not). Replicas collapse map-side before the (group x B) shuffle."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import bootstrap_mean_ci

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "rid", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return bootstrap_mean_ci(li, "l_returnflag", "l_extendedprice", "rid", 2, 32).withColumnRenamed(
        "k", "l_returnflag"
    )


@register(
    "fim_transform_docs",
    """
    SELECT doc_id,
           CASE WHEN pick AND n >= 3 THEN 'psm' ELSE 'plain' END AS mode,
           CASE WHEN pick AND n >= 3
                THEN '<PRE>' || substr(text, 1, lo) || '<SUF>' || substr(text, hi + 1, n)
                     || '<MID>' || substr(text, lo + 1, hi - lo)
                ELSE text END AS fim_text
    FROM (
      SELECT doc_id, text, n,
             (((doc_id % 4294967296) * 73244475) % 4294967296) % 100 < 50 AS pick,
             1 + least(h1, h2) AS lo, 1 + greatest(h1, h2) AS hi
      FROM (
        SELECT doc_id, text, length(text) AS n,
               ((doc_id * 2654435761) % 4294967296) % greatest(length(text) - 1, 1) AS h1,
               ((doc_id * 2246822519) % 4294967296) % greatest(length(text) - 1, 1) AS h2
        FROM documents
      )
    )
    """,
)
def fim_transform_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle PSM rewrite (text/mixing.py fim_transform):
    hash-deterministic 50% selection and split points — the published
    RNG recipe made reproducible. Entirely row-local codegen: zero
    shuffles, zero joins."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import fim_transform

    return fim_transform(read_documents(spark, sf_dir))


@register(
    "preference_pairs_quality",
    """
    WITH scored AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS score
      FROM documents
    ), ranked AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id DESC) AS rb,
             row_number() OVER (PARTITION BY source ORDER BY score ASC, doc_id ASC) AS rw
      FROM scored
    )
    SELECT b.source, b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           b.score AS chosen_score, w.score AS rejected_score
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (source)
    WHERE b.doc_id <> w.doc_id
    """,
)
def preference_pairs_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction (text/mixing.py
    preference_pairs_by_quality): per source, extreme-quality docs
    paired as chosen/rejected via min/max-struct aggregates — two
    partial-aggregatable extremes instead of a per-group sort, ids
    break ties deterministically. Score here = token count (any
    row-local quality signal slots in)."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import token_count
    from dpe_energy_performance_analysis_etl_spark.text.mixing import preference_pairs_by_quality

    docs = read_documents(spark, sf_dir)
    return preference_pairs_by_quality(docs, token_count(F.col("text")).cast("double"))


@register("bpe_encode_pieces")
def bpe_encode_pieces_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE train -> apply, end to end: learn 6 merges from the corpus
    (bpe_learn_merges) and tokenize the same corpus with them
    (bpe_encode). Rows-only like the trainer (the merge list is
    data-dependent iterative state); the encoder itself is pinned by
    the trainer-roundtrip reference tests."""
    from dpe_energy_performance_analysis_etl_spark.text.tokenizer import (
        bpe_encode,
        bpe_learn_merges,
    )

    docs = read_documents(spark, sf_dir)
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn_merges(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    return bpe_encode(docs, merges).select("doc_id", "pieces", "n_pieces")


@register(
    "distinctive_terms_source",
    """
    WITH tf AS MATERIALIZED (
      SELECT source AS grp, term, COUNT(*) AS tf FROM (
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
      ) GROUP BY 1, 2
    ), gt AS (
      SELECT grp, SUM(tf) AS grp_total FROM tf GROUP BY grp
    ), tt AS (
      SELECT term, SUM(tf) AS term_total FROM tf GROUP BY term
    ), sc AS (
      SELECT COUNT(DISTINCT term) AS vocab, SUM(tf) AS grand_total FROM tf
    ), scored AS (
      SELECT tf.grp, tf.term, tf.tf,
             (CAST(tf.tf + 1 AS DOUBLE) / CAST(gt.grp_total + sc.vocab AS DOUBLE))
             / (CAST(tt.term_total - tf.tf + 1 AS DOUBLE)
                / CAST(sc.grand_total - gt.grp_total + sc.vocab AS DOUBLE)) AS score
      FROM tf JOIN gt USING (grp) JOIN tt USING (term) CROSS JOIN sc
    )
    SELECT grp AS source, term, CAST(tf AS BIGINT) AS tf, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY grp ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def distinctive_terms_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary (text/analysis.py
    distinctive_terms_by_source): add-one-smoothed frequency-ratio
    ranking — the log-odds family with the monotone log dropped, so
    the score stays an exact-integer rational in three fixed IEEE
    divisions. One token explode; totals are broadcast aggregates of
    the cached tf table."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import distinctive_terms_by_source

    return distinctive_terms_by_source(read_documents(spark, sf_dir), k=5)


@register(
    "benford_digit_audit",
    """
    WITH base AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), obs AS (
      SELECT grp, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM base WHERE cents > 0 GROUP BY 1, 2
    ), tot AS (
      SELECT grp, CAST(SUM(obs) AS BIGINT) AS n FROM obs GROUP BY grp
    ), cells AS (
      -- every (group, digit 1..9) cell: a digit with ZERO occurrences
      -- is the strongest Benford violation and must contribute its
      -- (0-exp)^2/exp term
      SELECT grp, n, CAST(d AS INTEGER) AS digit
      FROM tot, (SELECT unnest(generate_series(1, 9)) AS d)
    ), expd AS (
      SELECT c.grp, c.digit, CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs, c.n,
             -- e-notation literals parse as DOUBLE; plain decimals
             -- parse as DECIMAL(17,16) whose double conversion is
             -- double-rounded (measured 1-ulp skew on 19926 * P(3))
             CAST(c.n AS DOUBLE) * ([3.010299956639812e-1, 1.7609125905568124e-1,
               1.2493873660829993e-1, 9.691001300805642e-2, 7.918124604762482e-2,
               6.694678963061322e-2, 5.799194697768673e-2, 5.115252244738129e-2,
               4.575749056067514e-2][c.digit]) AS expected
      FROM cells c LEFT JOIN obs o ON o.grp = c.grp AND o.digit = c.digit
    )
    SELECT grp AS l_returnflag, digit, obs, n, expected,
           (CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected) / expected AS chi2_contrib
    FROM expd
    """,
)
def benford_digit_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (operators/quality.py
    benford_digit_report) on extendedprice per returnflag: leading
    digit of the exact integer cents vs literal Benford
    probabilities (literals are bit-identical across engines — no
    libm evaluated anywhere). Per-cell chi-square contributions; the
    global statistic is the caller's fixed-order sum."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import benford_digit_report

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return benford_digit_report(li, "l_returnflag", "l_extendedprice", 2)


@register(
    "ivfpq_topk_embeddings",
    """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), coarse AS MATERIALIZED (
      SELECT vec_id AS cluster, v AS centroid FROM base WHERE vec_id < 8
    ), cdist AS MATERIALIZED (
      SELECT b.vec_id, c.cluster,
             list_dot_product(
               list_transform(range(1, 65), i -> b.v[i] - c.centroid[i]),
               list_transform(range(1, 65), i -> b.v[i] - c.centroid[i])) AS d
      FROM base b CROSS JOIN coarse c
    ), assigned AS MATERIALIZED (
      SELECT a.vec_id, a.cluster,
             list_transform(range(1, 65), i -> b.v[i] - c.centroid[i]) AS resid
      FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS r
        FROM cdist
      ) a JOIN base b ON b.vec_id = a.vec_id JOIN coarse c ON c.cluster = a.cluster
      WHERE a.r = 1
    ), ss AS (SELECT unnest(generate_series(0, 7)) AS s
    ), subs AS MATERIALIZED (
      SELECT vec_id, cluster, s, resid[s*8+1 : s*8+8] AS sv
      FROM assigned CROSS JOIN ss
    ), cents AS MATERIALIZED (
      SELECT vec_id AS cid, s, sv AS cv FROM subs WHERE vec_id < 16
    ), dists AS MATERIALIZED (
      SELECT sub.vec_id, sub.cluster, sub.s, c.cid,
             list_dot_product(
               list_transform(range(1, 9), i -> sub.sv[i] - c.cv[i]),
               list_transform(range(1, 9), i -> sub.sv[i] - c.cv[i])) AS d2
      FROM subs sub JOIN cents c USING (s)
    ), codes AS MATERIALIZED (
      SELECT vec_id, cluster, s, cid AS code FROM (
        SELECT vec_id, cluster, s, cid,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS r
        FROM dists
      ) WHERE r = 1
    ), probed AS MATERIALIZED (
      SELECT q.vec_id AS query_id, q.cluster,
             list_transform(range(1, 65), i -> b.v[i] - c.centroid[i]) AS qresid
      FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS r
        FROM cdist WHERE vec_id < 10
      ) q JOIN base b ON b.vec_id = q.vec_id JOIN coarse c ON c.cluster = q.cluster
      WHERE q.r <= 4
    ), luts AS MATERIALIZED (
      SELECT p.query_id, p.cluster, ss.s, c.cid,
             list_dot_product(
               list_transform(range(1, 9), i -> p.qresid[ss.s*8+i] - c.cv[i]),
               list_transform(range(1, 9), i -> p.qresid[ss.s*8+i] - c.cv[i])) AS d2
      FROM probed p CROSS JOIN ss JOIN cents c ON c.s = ss.s
    ), terms AS (
      SELECT l.query_id, co.vec_id AS neighbor_id, l.s, l.d2 AS term
      FROM codes co
      JOIN luts l ON l.cluster = co.cluster AND l.s = co.s AND l.cid = co.code
      WHERE l.query_id <> co.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             list_dot_product(list(term ORDER BY s),
                              list_transform(list(term ORDER BY s), t -> 1.0)) AS adist
      FROM terms GROUP BY query_id, neighbor_id
    ), shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS r
        FROM scored
      ) WHERE r <= 40
    ), refined AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(
               list_transform(range(1, 65), i -> qb.v[i] - nb.v[i]),
               list_transform(range(1, 65), i -> qb.v[i] - nb.v[i])) AS dist
      FROM shortlist s
      JOIN base qb ON qb.vec_id = s.query_id
      JOIN base nb ON nb.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, dist, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
      FROM refined
    ) WHERE rank <= 5
    """,
)
def ivfpq_topk_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ ANN (similarity/ivfpq.py): coarse inverted-file probe +
    product quantization on RESIDUALS + exact refine — the FAISS
    billion-vector layout. The SQL oracle replays the full seeded
    composition end-to-end (coarse argmin -> residual -> seeded
    residual codebook -> per-subspace encode -> probe top-4 clusters
    -> ADC ordered fold -> 40-candidate shortlist -> exact-L2 refine)
    — every argmin/rank carries the same id tie-break and every
    double fold is the list_dot_product shape both engines share
    (closed the last rows-only ANN gap, VERDICT r3 ask #8)."""
    from dpe_energy_performance_analysis_etl_spark.similarity.ivfpq import ivfpq_topk

    emb = read_embeddings(spark, sf_dir)
    return ivfpq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, ncoarse=8, nprobe=4)


# =====================================================================
# Round 4: exact substring-span dedup (Lee et al. ACL'22 ExactSubstr)
# =====================================================================

_SUBSTRING_SPANS_SQL = """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), g AS MATERIALIZED (
      SELECT doc_id,
             unnest(range(0, greatest(len(t) - 8 + 1, 0))) AS pos,
             unnest(list_transform(range(0, greatest(len(t) - 8 + 1, 0)),
                    i -> array_to_string(t[i+1:i+8], ' '))) AS gram
      FROM tok
    ), hot AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), cov AS (
      SELECT doc_id, pos FROM g JOIN hot USING (gram)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM cov
    ), grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
      FROM isl
    ), spans AS (
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
             CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens
      FROM grp GROUP BY doc_id, gid
    )"""


@register(
    "substring_dup_spans",
    _SUBSTRING_SPANS_SQL
    + """
    SELECT doc_id, span_start, span_end, span_tokens FROM spans
    """,
)
def substring_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (text/substring.py, the Lee et al.
    ACL'22 ExactSubstr operator, Spark-first): maximal cross-document
    duplicated token runs of length >= 8, found WITHOUT a suffix
    array and WITHOUT enumerating document pairs — position-tagged
    k-grams, one linear document-frequency groupBy, one equi-join
    back, per-doc gaps-and-islands interval merge. Corpus-wide
    boilerplate costs posting rows, never pair blowup."""
    from dpe_energy_performance_analysis_etl_spark.text.substring import duplicated_spans

    out = duplicated_spans(read_documents(spark, sf_dir), k=8)
    return out.select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
    )


@register(
    "substring_dup_stats",
    _SUBSTRING_SPANS_SQL
    + """
    , per_doc AS (
      SELECT doc_id, CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens, p.dup_tokens,
           CAST(p.dup_tokens AS DOUBLE) / CAST(len(t.t) AS DOUBLE) AS dup_fraction
    FROM per_doc p JOIN tok t ON t.doc_id = p.doc_id
    """,
)
def substring_dup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication profile over the substring spans —
    the remove-or-filter decision input (integer token counts, one
    final double division)."""
    from dpe_energy_performance_analysis_etl_spark.text.substring import substring_dup_stats

    out = substring_dup_stats(read_documents(spark, sf_dir), k=8)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("dup_tokens").cast("bigint").alias("dup_tokens"),
        "dup_fraction",
    )


@register(
    "substring_dedup_clean",
    _SUBSTRING_SPANS_SQL
    + """
    , toks2 AS (
      SELECT doc_id, unnest(range(0, len(t))) AS p, unnest(t) AS tok FROM tok
    ), cut AS (
      SELECT DISTINCT t2.doc_id, t2.p
      FROM toks2 t2 JOIN spans s
        ON s.doc_id = t2.doc_id AND t2.p BETWEEN s.span_start AND s.span_end
    ), agg AS (
      SELECT t2.doc_id,
             COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t2.tok END, ' ' ORDER BY t2.p), '') AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) FILTER (WHERE c.p IS NULL) AS BIGINT) AS kept_tokens
      FROM toks2 t2
      LEFT JOIN cut c ON c.doc_id = t2.doc_id AND c.p = t2.p
      GROUP BY t2.doc_id
    )
    -- left-join back to tok so a document whose text tokenizes to
    -- ZERO tokens still emits (n_tokens=0, kept_tokens=0, '') — the
    -- Spark side does (ADVICE r4 latent row-count mismatch)
    SELECT tok.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM tok LEFT JOIN agg a ON a.doc_id = tok.doc_id
    """,
)
def substring_dedup_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper's action applied: duplicated spans cut out of every
    document, surrounding tokens kept (row-local reconstruction — the
    span list per doc is bounded by n_tokens / k)."""
    from dpe_energy_performance_analysis_etl_spark.text.substring import remove_duplicated_spans

    out = remove_duplicated_spans(read_documents(spark, sf_dir), k=8)
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("kept_tokens").cast("bigint").alias("kept_tokens"),
    )


@register(
    "salted_join_supplier_revenue",
    """
    SELECT s.s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def salted_join_supplier_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): the fact side spread
    across 8 salt buckets per key, the dim side replicated 8x, join
    on (key, salt) — results identical to the plain equi-join (the
    oracle IS the plain join), with any hot supplier's reducer work
    spread 8 ways. The explicit plan-time fix for hot keys AQE's
    runtime skew-split can't reach (it only splits sort-merge
    partitions after the fact)."""
    from dpe_energy_performance_analysis_etl_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    joined = salted_join(li, sup, on="s_suppkey", salt_buckets=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_fast("l_extendedprice", 2).alias("revenue"),
        )
        .select("s_nationkey", "n_items", "revenue")
    )


@register(
    "calibration_ece_orders",
    """
    WITH scored AS (
      SELECT least((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 50), 1000000) AS p,
             o_orderstatus = 'F' AS y
      FROM orders
    ), binned AS (
      SELECT least((p * 10) // 1000000, 9) AS bin, p, y FROM scored
    ), agg AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p) AS BIGINT) AS sum_p,
             CAST(count_if(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY bin
    )
    SELECT bin, n, n_pos,
           CAST(sum_p AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e6) AS mean_conf,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
           abs(CAST(sum_p AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e6)
               - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) AS abs_gap,
           CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER () AS BIGINT) AS DOUBLE) AS weight
    FROM agg
    """,
)
def calibration_ece_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability / ECE calibration audit (operators/quality.py
    calibration_report): a price-derived integer-scaled 'probability'
    that an order reaches final status, binned into 10 equal-width
    confidence bins — per-bin mean confidence vs observed frequency,
    gap, and weight (the scalar ECE is the caller's fixed-order
    sum(weight*abs_gap), the benford/contingency contract). Per-bin
    sums are BIGINT-exact in both engines; only the two final
    divisions are doubles."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import calibration_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    # floor(cents/50) == cents // 50 exactly: cents < 2^53 so the
    # double division floors to the true integer quotient
    scored = orders.select(
        F.least(F.floor(cents / 50).cast("bigint"), F.lit(1_000_000)).alias("p"),
        (F.col("o_orderstatus") == "F").alias("y"),
    )
    return calibration_report(scored, "p", "y", n_bins=10, scale=1_000_000)


def _lpa_oracle(iterations: int) -> str:
    """Chained-CTE replay of synchronous min-tie-break label
    propagation — each round is a pure function of the previous
    labeling (same unrolling contract as the PageRank/k-core
    oracles). Every CTE is MATERIALIZED: round i+1 references round i
    once per aggregation but DuckDB's default inlining would
    re-evaluate the whole prefix."""
    blocks = [
        """
    WITH pairs AS MATERIALIZED (
      -- long node ids (cust*2 / supp*2+1), not string prefixes: the
      -- per-round (node,label) shuffle is the whole cost of LPA and
      -- 8-byte keys measured 2x faster than 'c123'-style strings
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS s, s AS d FROM pairs
      UNION ALL
      SELECT s AS s, c AS d FROM pairs
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT s AS node, s AS label FROM e
    )"""
    ]
    for i in range(iterations):
        blocks.append(
            f""", l{i + 1} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT x.node, x.label,
               row_number() OVER (PARTITION BY x.node ORDER BY x.c DESC, x.label) AS rn
        FROM (
          SELECT e.d AS node, l{i}.label, COUNT(*) AS c
          FROM e JOIN l{i} ON e.s = l{i}.node GROUP BY e.d, l{i}.label
        ) x
      ) WHERE rn = 1
    )"""
        )
    blocks.append(f"\n    SELECT node, label FROM l{iterations}")
    return "".join(blocks)


@register("label_propagation_communities", _lpa_oracle(3))
def label_propagation_communities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA community detection (operators/graph.py label_propagation)
    on the customer-supplier bipartite graph: 3 synchronous rounds,
    most-frequent-neighbor label with min tie-break — the
    deterministic variant of Raghavan et al. that a fixed SQL
    unrolling replays bit-identically. Per round: one |E| equi-join +
    one map-side-combinable (node,label) count + one min_by argmax;
    static edge table cached, per-round labels cached with the parent
    unpersisted."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import label_propagation

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(pairs, iterations=3)


# =====================================================================
# Round 4: URL canonicalization + domain analytics (text/urls.py)
# =====================================================================

@register(
    "url_canonical_dedup",
    """
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.COM:443/p' || (doc_id % 7)
               || '?utm_source=feed&b=2&a=1&id=' || (doc_id % 5) || '#frag' AS url
      FROM documents
    ), nf AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw
    ), parts AS (
      SELECT doc_id,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[^:]+://([^/?#]*)', 1)) AS hostport,
             regexp_extract(u, '^[^:]+://[^/?#]*(.*)$', 1) AS rest
      FROM nf
    ), comps AS (
      SELECT doc_id, scheme,
             CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                  ELSE hostport END AS host,
             CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
                  ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path,
             list_sort(list_filter(string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
               p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$'))) AS params
      FROM parts
    ), canon AS (
      SELECT doc_id,
             scheme || '://' || host || path ||
             CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS canonical_url
      FROM comps
    )
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM canon GROUP BY canonical_url
    """,
)
def url_canonical_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (text/urls.py) — the cheapest pass in a web
    pipeline, run before any content hashing: lowercase scheme/host,
    default port stripped, fragment dropped, tracking params removed,
    remaining params sorted; keep-first per canonical URL. The messy
    input URL is derived deterministically from the documents table
    (mixed case, :443, utm_*, unsorted params, fragment) so both
    engines normalize the identical strings. Pure codegen expressions
    + one groupBy."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import canonical_url_dedup

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.col("source"),
            F.lit(".Example.COM:443/p"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("?utm_source=feed&b=2&a=1&id="),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    return canonical_url_dedup(docs)


@register(
    "domain_document_stats",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'news.' || source || '.co.uk'
                  ELSE 'www.' || source || '.example.com' END AS host
      FROM documents
    ), dom AS (
      SELECT doc_id, host, string_split(host, '.') AS labels FROM raw
    ), tagged AS (
      SELECT doc_id, host,
             CASE WHEN len(labels) >= 3
                       AND (labels[-2] || '.' || labels[-1]) IN
                           ('co.uk','ac.uk','gov.uk','com.au','co.jp','co.in','com.br','co.nz')
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                  ELSE host END AS domain
      FROM dom
    )
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
    FROM tagged GROUP BY domain
    """,
)
def domain_document_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain analytics (text/urls.py): public-suffix
    heuristic (last two labels, or three under co.uk-style
    registries), per-domain doc + distinct-host counts — the input to
    domain caps / blocklists / crawl-bias weighting. Hosts derived
    deterministically from the documents table with a co.uk branch so
    BOTH suffix rules are exercised."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import domain_document_stats

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("news."), F.col("source"), F.lit(".co.uk")),
            ).otherwise(F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))),
            F.lit("/x"),
        ).alias("url"),
    )
    return domain_document_stats(docs)


# =====================================================================
# Round 4: winnowing fingerprints (Schleimer et al. SIGMOD'03 / MOSS)
# =====================================================================

_WINNOW_FP_SQL = """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(t) - 4 + 1, 0))) AS pos,
             unnest(list_transform(range(0, greatest(len(t) - 4 + 1, 0)),
                    i -> array_to_string(t[i+1:i+4], ' '))) AS gram
      FROM tok
    ), hashed AS (
      SELECT doc_id, pos,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(gram, '.'), c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647
             ) AS h
      FROM g
    ), sel AS (
      -- rightmost-min of SOME full window: offset d = how many
      -- window positions precede j (ties break rightward: prev >= h,
      -- next > h); each offset is a (count, min) pair per side
      SELECT doc_id, pos, h,
             count(h) OVER w_p1 AS cp1, min(h) OVER w_p1 AS mp1,
             count(h) OVER w_p2 AS cp2, min(h) OVER w_p2 AS mp2,
             count(h) OVER w_p3 AS cp3, min(h) OVER w_p3 AS mp3,
             count(h) OVER w_n1 AS cn1, min(h) OVER w_n1 AS mn1,
             count(h) OVER w_n2 AS cn2, min(h) OVER w_n2 AS mn2,
             count(h) OVER w_n3 AS cn3, min(h) OVER w_n3 AS mn3
      FROM hashed
      WINDOW
        w_p1 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING),
        w_p2 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING),
        w_p3 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
        w_n1 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING),
        w_n2 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING),
        w_n3 AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
    ), fp AS (
      SELECT doc_id, pos, h AS fingerprint FROM sel
      WHERE (cn3 = 3 AND h < mn3)
         OR (cp1 = 1 AND mp1 >= h AND cn2 = 2 AND h < mn2)
         OR (cp2 = 2 AND mp2 >= h AND cn1 = 1 AND h < mn1)
         OR (cp3 = 3 AND mp3 >= h)
    )"""


@register(
    "winnow_fingerprints_docs",
    _WINNOW_FP_SQL
    + """
    SELECT doc_id, pos, fingerprint FROM fp
    """,
)
def winnow_fingerprints_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (text/winnow.py — the MOSS scheme):
    rightmost-minimum of every 4-hash window over 4-gram rolling
    hashes, computed as ONE window-frame comparison (h < min of next
    3) — no per-window explode. Guarantees a shared fingerprint for
    any common run of >= window+k-1 = 7 tokens at ~2/(window+1)
    sampling density. Portable polynomial hash = bit-exact SQL
    replay."""
    from dpe_energy_performance_analysis_etl_spark.text.winnow import winnowing_fingerprints

    return winnowing_fingerprints(read_documents(spark, sf_dir), k=4, window=4)


@register(
    "winnow_match_pairs",
    _WINNOW_FP_SQL
    + """
    , dfp AS (SELECT DISTINCT doc_id, fingerprint FROM fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM dfp a JOIN dfp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
)
def winnow_match_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS candidate pairs: documents sharing >= 2 winnowed
    fingerprints, joined on the ~40%-sampled fingerprint postings
    (support threshold applied inside the aggregation — no
    coincidental single-hit pairs leave the shuffle)."""
    from dpe_energy_performance_analysis_etl_spark.text.winnow import winnow_match_pairs

    return winnow_match_pairs(read_documents(spark, sf_dir), k=4, window=4, min_shared=2)


@register(
    "l_diversity_customers",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l_diversity,
           CAST(CASE WHEN COUNT(DISTINCT c_acctbal) < 3 THEN 1 ELSE 0 END
                AS BIGINT) AS violates_l
    FROM customer
    GROUP BY 1, 2
    ORDER BY l_diversity, c_nationkey, c_mktsegment
    LIMIT 10
    """,
)
def l_diversity_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (operators/quality.py l_diversity_audit,
    Machanavajjhala 2007): the ten LEAST-diverse quasi-groups
    (nation, segment) by distinct sensitive values (account balance),
    flagged against l=3 — the leak k-anonymity alone misses (a
    50-anonymous cohort sharing one balance still discloses it).
    Reported as a bottom-10 margin audit rather than a violations
    filter so the row is non-trivial at every SF (on well-mixed data
    the violations set is empty — a 0-row green driver record checks
    nothing). Deterministic: the quasi tuple is unique per group, so
    (l_diversity, nation, segment) is a total order."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        l_diversity_audit,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return l_diversity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", l=3, bottom=10
    )


@register(
    "time_embargo_split_events",
    """
    WITH tagged AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) < 1705708800000000 THEN 'train'
                  WHEN epoch_us(ts) < 1705881600000000 THEN 'embargo'
                  ELSE 'test' END AS split
      FROM events
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tagged GROUP BY split
    """,
)
def time_embargo_split_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal split with embargo (operators/temporal.py
    time_embargo_split, the purged-split discipline): train before
    2024-01-20, a 2-day embargo absorbing trailing-window lookahead,
    test after. Integer-microsecond comparisons on both engines;
    per-split event and user counts."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        time_embargo_split,
    )

    ev = read_events(spark, sf_dir)
    out = time_embargo_split(
        ev, "ts", cutoff_us=1705708800000000, embargo_us=172800000000
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "join_view_delta_orders",
    """
    WITH bl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ), dl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ), br AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 <> 0
    ), dr AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 = 0
    ), fullv AS (
      SELECT o.c_custkey, o.o_orderkey, o.o_totalprice, c.c_mktsegment
      FROM (SELECT * FROM bl UNION ALL SELECT * FROM dl) o
      JOIN (SELECT * FROM br UNION ALL SELECT * FROM dr) c USING (c_custkey)
    ), basev AS (
      SELECT bl.c_custkey, bl.o_orderkey, bl.o_totalprice, br.c_mktsegment
      FROM bl JOIN br USING (c_custkey)
    )
    SELECT * FROM fullv EXCEPT ALL SELECT * FROM basev
    """,
)
def join_view_delta_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inner-join view maintenance
    (operators/incremental.py join_view_delta): the rows a batch of
    order + customer inserts ADDS to the orders⋈customer view,
    computed as dL⋈R ∪ L⋈dR ∪ dL⋈dR — O(|delta|) probe work instead
    of re-joining the snapshots. The ORACLE is the spec: full
    recompute EXCEPT ALL old view — equality proves the delta algebra
    exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.incremental import (
        join_view_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    bl = orders.where(F.col("o_orderkey") % 10 != 0)
    dl = orders.where(F.col("o_orderkey") % 10 == 0)
    br = cust.where(F.col("c_custkey") % 20 != 0)
    dr = cust.where(F.col("c_custkey") % 20 == 0)
    return join_view_delta(bl, dl, br, dr, on="c_custkey").select(
        "c_custkey", "o_orderkey", "o_totalprice", "c_mktsegment"
    )


@register(
    "target_mixture_weights_docs",
    """
    WITH sizes AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS size
      FROM documents GROUP BY source
    ), shares AS (
      SELECT source, size,
             CAST(size AS DOUBLE)
               / CAST(CAST(SUM(size) OVER () AS BIGINT) AS DOUBLE) AS natural_share,
             CASE source WHEN 'src0' THEN 3.0e-1 WHEN 'src1' THEN 3.0e-1
                         WHEN 'src2' THEN 4.0e-1 ELSE 0.0e0 END AS target_share
      FROM sizes
    )
    SELECT source, size, natural_share, target_share,
           target_share / natural_share AS weight
    FROM shares
    """,
)
def target_mixture_weights_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture reweighting (text/mixing.py
    target_mixture_weights — the DoReMi/data-mixing deployment step):
    per-source token-budget sizes (n_chars), natural vs target share,
    and the sampling weight that reshapes the corpus to the target.
    Exact integer sums; two double divisions; sources outside the
    target spec get weight 0 (dropped)."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import target_mixture_weights

    docs = read_documents(spark, sf_dir)
    return target_mixture_weights(
        docs, {"src0": 0.3, "src1": 0.3, "src2": 0.4}, "source", size_col="n_chars"
    )


@register(
    "rrf_hybrid_retrieval",
    """
    WITH tok AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_toks,
             len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_uniq
      FROM documents
    ), r1 AS (
      SELECT 0 AS query_id, doc_id,
             row_number() OVER (ORDER BY n_toks DESC, doc_id) AS rank
      FROM tok QUALIFY rank <= 20
    ), r2 AS (
      SELECT 0 AS query_id, doc_id,
             row_number() OVER (ORDER BY n_uniq DESC, doc_id) AS rank
      FROM tok QUALIFY rank <= 20
    ), slots AS (
      SELECT query_id, doc_id,
             MAX(CASE WHEN ranker = 0 THEN rank END) AS s0,
             MAX(CASE WHEN ranker = 1 THEN rank END) AS s1
      FROM (
        SELECT query_id, doc_id, 0 AS ranker, rank FROM r1
        UNION ALL
        SELECT query_id, doc_id, 1 AS ranker, rank FROM r2
      ) GROUP BY query_id, doc_id
    ), scored AS (
      SELECT query_id, doc_id,
             (0.0e0 + (CASE WHEN s0 IS NOT NULL THEN 1.0e0 / (6.0e1 + s0) ELSE 0.0e0 END))
               + (CASE WHEN s1 IS NOT NULL THEN 1.0e0 / (6.0e1 + s1) ELSE 0.0e0 END) AS rrf_score
      FROM slots
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(fused_rank AS INTEGER) AS fused_rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS fused_rank
      FROM scored
    ) WHERE fused_rank <= 10
    """,
)
def rrf_hybrid_retrieval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (text/retrieval.py, Cormack SIGIR'09 —
    the hybrid sparse+dense merge that needs no score calibration) of
    two document rankers (token-count and distinct-token top-20),
    fused top-10. The RRF sum is an ORDERED row-local fold over
    per-ranker slots (one pivot aggregation) — never a shuffle-order
    SUM of doubles — so scores hash-match across engines."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        reciprocal_rank_fusion,
    )
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        F.size(tokens_expr("text")).alias("n_toks"),
        F.size(F.array_distinct(tokens_expr("text"))).alias("n_uniq"),
    )
    w1 = Window.orderBy(F.col("n_toks").desc(), F.col("doc_id"))
    w2 = Window.orderBy(F.col("n_uniq").desc(), F.col("doc_id"))
    r1 = (
        docs.withColumn("rank", F.row_number().over(w1))
        .where(F.col("rank") <= 20)
        .select(F.lit(0).alias("query_id"), "doc_id", "rank")
    )
    r2 = (
        docs.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 20)
        .select(F.lit(0).alias("query_id"), "doc_id", "rank")
    )
    return reciprocal_rank_fusion([r1, r2], k=60, top_k=10)


@register(
    "ranking_metrics_by_source",
    """
    WITH ranked AS (
      SELECT source AS query_id, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
    ), results AS (
      SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10
    ), qrels AS (
      SELECT source AS query_id, doc_id FROM documents WHERE doc_id % 3 = 0
    ), hits AS (
      SELECT r.query_id, r.doc_id, r.rank
      FROM results r JOIN qrels q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
    ), n_rel AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant FROM qrels GROUP BY query_id
    ), per_q AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(MIN(rank) AS BIGINT) AS first_rel_rank
      FROM hits GROUP BY query_id
    )
    SELECT n.query_id,
           COALESCE(p.n_hits, 0) AS n_hits,
           n.n_relevant,
           CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / CAST(n.n_relevant AS DOUBLE) AS recall_at_k,
           CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / 1.0e1 AS precision_at_k,
           COALESCE(CAST(2520 // p.first_rel_rank AS BIGINT), 0) AS mrr_scaled,
           COALESCE(1.0e0 / CAST(p.first_rel_rank AS DOUBLE), 0.0e0) AS reciprocal_rank
    FROM n_rel n LEFT JOIN per_q p USING (query_id)
    """,
)
def ranking_metrics_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact retrieval evaluation (text/retrieval.py ranking_metrics):
    recall@10 / precision@10 / MRR per query (source) against
    synthetic qrels. MRR's reciprocal is emitted integer-scaled by
    lcm(1..10)=2520 — exact — beside the double convenience column;
    counts are BIGINT-exact; the only doubles are final divisions."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import ranking_metrics

    docs = read_documents(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    results = (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(F.col("source").alias("query_id"), "doc_id", "rank")
    )
    qrels = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("source").alias("query_id"), "doc_id"
    )
    return ranking_metrics(results, qrels, k=10)


@register(
    "cusum_changepoint_revenue",
    """
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS period,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), t AS (
      SELECT period, cents,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(cents) OVER () AS BIGINT) AS total
      FROM per
    ), c AS (
      SELECT period, cents,
             CAST(SUM(n * cents - total) OVER (ORDER BY period) AS BIGINT) AS cusum_scaled
      FROM t
    )
    SELECT period, cents, cusum_scaled,
           abs(cusum_scaled) = CAST(MAX(abs(cusum_scaled)) OVER () AS BIGINT) AS is_peak
    FROM c
    """,
)
def cusum_changepoint_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen (operators/temporal.py, Page 1954)
    over monthly revenue: integer-scaled deviations (n*c_i - total —
    the mean never becomes a float) accumulate bit-exactly; the
    |cumulative| peak flags the most likely mean shift. The raw table
    collapses to one row per MONTH before any window, so the ordered
    scan runs over ~80 rows, never the fact table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import cusum_changepoint

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cusum_changepoint(
        orders,
        F.date_trunc("month", F.col("o_orderdate")),
        F.floor(F.col("o_totalprice") * 100 + 0.5),
    )


@register(
    "fd_violation_orders",
    """
    WITH groups AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS rows_in_group,
             CAST(COUNT(DISTINCT o_orderpriority)
                  + MAX(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rhs
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(count_if(n_rhs > 1) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN rows_in_group ELSE 0 END) AS BIGINT) AS n_violating_rows,
           count_if(n_rhs > 1) = 0 AS holds
    FROM groups
    """,
)
def fd_violation_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (operators/quality.py
    fd_violation_report): does o_custkey -> o_orderpriority hold?
    (It doesn't — the violating-group and violating-row counts size
    the repair.) One LHS groupBy + one bounded aggregation."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_violation_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return fd_violation_report(orders, ["o_custkey"], "o_orderpriority")


def _walk_mix_sql(node: str, walk: str, k: int) -> str:
    """SQL twin of operators.graph._portable_mix32 for (node, walk, k).
    Multipliers ≤ 0x45d9f3b keep every reduced-term product < 3.1e17
    (int64-safe on both engines — the ADVICE r4 overflow fix)."""
    s0 = (
        f"((({node}) % 4294967296) + (({walk}) % 4294967296) * 40503"
        f" + {k} * 73244475) % 4294967296"
    )
    s1 = f"(xor({s0}, ({s0}) >> 16) * 73244475) % 4294967296"
    return f"xor({s1}, ({s1}) >> 16)"


def _walks_oracle(walk_len: int, walks_per_node: int) -> str:
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS u, s AS v FROM pairs
      UNION ALL
      SELECT s AS u, c AS v FROM pairs
    ), nbrs AS MATERIALIZED (
      SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx FROM e
    ), degs AS MATERIALIZED (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM nbrs GROUP BY u
    ), x0 AS MATERIALIZED (
      SELECT d.u AS start, CAST(w.walk AS INTEGER) AS walk, 0 AS step, d.u AS node
      FROM degs d, (SELECT unnest(generate_series(0, {walks_per_node - 1})) AS walk) w
    )"""
    ]
    for k in range(1, walk_len):
        mix = _walk_mix_sql(f"x{k - 1}.node", f"x{k - 1}.walk", k)
        blocks.append(
            f""", x{k} AS MATERIALIZED (
      SELECT x{k - 1}.start, x{k - 1}.walk, {k} AS step, n.v AS node
      FROM x{k - 1}
      JOIN degs d ON d.u = x{k - 1}.node
      JOIN nbrs n ON n.u = x{k - 1}.node AND n.idx = ({mix}) % d.deg
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT start, walk, CAST(step AS INTEGER) AS step, node FROM x{k}"
        for k in range(walk_len)
    )
    blocks.append(f"\n    {union}")
    return "".join(blocks)


@register("deterministic_walks_supplier", _walks_oracle(4, 2))
def deterministic_walks_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk corpus (operators/graph.py
    deterministic_random_walks, Perozzi KDD'14) over the
    customer-supplier bipartite graph: 2 walks of length 4 per node,
    neighbor choice = portable-hash(node, walk, step) mod degree —
    identical corpus on every engine/rerun/partitioning (the training
    data feeding skip-gram/SGNS embedding ops). Every step is two
    equi-keyed joins (degree lookup, indexed-neighbor lookup) on
    O(#walkers) rows; the indexed neighbor/degree tables build once
    and serve all steps (cached)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return deterministic_random_walks(edges, walk_len=4, walks_per_node=2)


@register(
    "pareto_front_parts",
    """
    WITH base AS (
      SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
      FROM part
    ), tiers AS (
      SELECT p_retailprice AS x, MAX(p_size) AS ty FROM base GROUP BY 1
    ), ft AS (
      SELECT x, ty FROM (
        SELECT x, ty,
               MAX(ty) OVER (ORDER BY x DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bp
        FROM tiers
      ) WHERE bp IS NULL OR ty > bp
    )
    SELECT b.p_partkey, b.p_retailprice, b.p_size
    FROM base b JOIN ft ON b.p_retailprice = ft.x AND b.p_size = ft.ty
    """,
)
def pareto_front_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (operators/relational.py pareto_front_2d,
    Börzsönyi ICDE'01): parts not dominated on (retailprice, size)
    maximizing both. Tier aggregation (one row per distinct x) + a
    ROWS-frame running max over the tier table — exact for any x
    spacing, global sort over distinct values only."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import pareto_front_2d

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    return pareto_front_2d(part, "p_retailprice", "p_size", "p_partkey")


@register(
    "interval_coverage_users",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e FROM events
    ), tagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM iv
    ), grp AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS gid
      FROM tagged
    ), islands AS (
      SELECT user_id, gid, MIN(s) AS i_s, MAX(e) AS i_e
      FROM grp GROUP BY user_id, gid
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_e - i_s) AS BIGINT) AS covered_length
    FROM islands GROUP BY user_id
    """,
)
def interval_coverage_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage (operators/temporal.py
    interval_coverage): each event opens a 5-minute activity window;
    per user, overlap-deduplicated total active time + merged-island
    count (a plain SUM of window lengths double-counts every
    overlap). Gaps-and-islands with a running max end; integer
    microseconds throughout."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import epoch_micros
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import interval_coverage

    ev = read_events(spark, sf_dir)
    iv = ev.select(
        "user_id",
        epoch_micros("ts").alias("s"),
        (epoch_micros("ts") + 300_000_000).alias("e"),
    )
    return interval_coverage(iv, "s", "e", "user_id")


@register("image_dhash_near_dups")
def image_dhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs (multimodal/media.py
    image_dhash + dhash_near_dup_groups): documents render to small
    deterministic PPM images (text bytes fill the pixel grid; docs
    sharing a duplicated prefix produce near-identical images), then
    64-bit dHash → exact-hash clusters collapse first (a cluster of
    m identical images has m²/2 raw pairs — the sf5 measurement:
    8.1 M pairs, output-bound) → band candidates over DISTINCT
    hashes (pigeonhole over hamming <= 2) → popcount verify;
    output rows carry cluster sizes + the implied pair_count. Rows-only by design — PNG/PPM
    decode is not SQL — but the dHash integer pipeline and the banded
    join are pinned by ground-truth hamming tests and the codecs by
    pixel-exact roundtrips."""
    import numpy as np
    import pandas as pd

    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        dhash_near_dup_groups,
    )

    docs = read_documents(spark, sf_dir)

    def render(batches):
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode()[: 24 * 24]
                buf = np.zeros(24 * 24, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                img = np.stack([buf.reshape(24, 24)] * 3, axis=2)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame({"path": pdf["doc_id"].astype(str), "content": payloads})

    imgs = docs.select("doc_id", "text").mapInPandas(
        render, schema="path string, content binary"
    )
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import dhash_dup_summary

    return dhash_dup_summary(imgs, id_col="path", max_hamming=2)


@register(
    "join_view_delta_signed_orders",
    """
    WITH bl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    ), br AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 20 <> 0
    ), dl AS (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice, 1 AS w
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_custkey, o_orderkey, o_totalprice, -1
      FROM orders WHERE o_orderkey % 10 = 5
    ), dr AS (
      SELECT c_custkey, c_mktsegment, 1 AS w FROM customer WHERE c_custkey % 20 = 0
    ), newl AS (
      SELECT c_custkey, o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS w FROM bl
      UNION ALL SELECT c_custkey, o_orderkey, o_totalprice, CAST(w AS BIGINT) FROM dl
    ), newr AS (
      SELECT c_custkey, c_mktsegment, CAST(1 AS BIGINT) AS w FROM br
      UNION ALL SELECT c_custkey, c_mktsegment, CAST(w AS BIGINT) FROM dr
    ), newv AS (
      SELECT l.c_custkey, l.o_orderkey, l.o_totalprice, r.c_mktsegment,
             CAST(SUM(l.w * r.w) AS BIGINT) AS w
      FROM newl l JOIN newr r USING (c_custkey)
      GROUP BY 1, 2, 3, 4
    ), oldv AS (
      SELECT bl.c_custkey, bl.o_orderkey, bl.o_totalprice, br.c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM bl JOIN br USING (c_custkey)
      GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, o_orderkey, o_totalprice, c_mktsegment,
           CAST(SUM(w) AS BIGINT) AS w
    FROM (
      SELECT * FROM newv
      UNION ALL
      SELECT c_custkey, o_orderkey, o_totalprice, c_mktsegment, -w FROM oldv
    ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) <> 0
    """,
)
def join_view_delta_signed_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed (insert + delete) incremental join-view maintenance
    (operators/incremental.py join_view_delta_signed — the
    differential-dataflow / DBSP Z-set identity: join is bilinear, so
    d(L⋈R) = dL⋈R + L⋈dR + dL⋈dR with weight products). Deltas here
    insert the %10==0 orders, DELETE the %10==5 ones, and insert a
    customer batch; the oracle is the spec — new-view multiset minus
    old-view multiset, net-nonzero rows only."""
    from dpe_energy_performance_analysis_etl_spark.operators.incremental import (
        join_view_delta_signed,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    bl = orders.where(F.col("o_orderkey") % 10 != 0)
    br = cust.where(F.col("c_custkey") % 20 != 0)
    dl = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("w", F.lit(1).cast("bigint"))
        .unionByName(
            orders.where(F.col("o_orderkey") % 10 == 5).withColumn(
                "w", F.lit(-1).cast("bigint")
            )
        )
    )
    dr = cust.where(F.col("c_custkey") % 20 == 0).withColumn("w", F.lit(1).cast("bigint"))
    return join_view_delta_signed(bl, dl, br, dr, on="c_custkey")


@register(
    "flesch_readability_docs",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS vg
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences,
           greatest(vg, n_words) AS n_syllables,
           2.06835e2
             - 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 8.46e1 * (CAST(greatest(vg, n_words) AS DOUBLE)
                         / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch_score
    FROM m
    """,
)
def flesch_readability_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease quality gate (text/analysis.py
    flesch_reading_ease): integer regexp counts (words, sentence
    terminators, vowel-group syllables), one fixed-order double
    expression — engine-portable readability scores (e-notation
    constants in the oracle; plain decimals would parse as DECIMAL
    and double-round)."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import flesch_reading_ease

    docs = read_documents(spark, sf_dir)
    cols = flesch_reading_ease("text")
    return docs.select("doc_id", *[v.alias(k) for k, v in cols.items()])


@register("compression_ratio_docs")
def compression_ratio_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (text/analysis.py
    compression_ratio — the Gopher/RedPajama repetitiveness screen:
    both tails are filter candidates). Rows-only by design: zlib is
    engine-external (deterministic for a fixed level, pinned by unit
    tests on known-ratio fixtures); Arrow-batched mapInPandas, zero
    shuffle."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import compression_ratio

    return compression_ratio(read_documents(spark, sf_dir))


_PRICE_TIERS = [
    ("budget", 0, 4_999_999),
    ("mid", 5_000_000, 14_999_999),
    ("upper", 15_000_000, 29_999_999),
    ("premium", 30_000_000, 44_999_999),
    ("luxury", 45_000_000, 99_999_999),
]


@register(
    "range_lookup_order_tiers",
    """
    WITH tiers(tier, lo, hi) AS (
      VALUES ('budget', 0, 4999999), ('mid', 5000000, 14999999),
             ('upper', 15000000, 29999999), ('premium', 30000000, 44999999),
             ('luxury', 45000000, 99999999)
    ), facts AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
    )
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(f.cents) AS BIGINT) AS revenue_cents
    FROM facts f JOIN tiers t ON f.cents BETWEEN t.lo AND t.hi
    GROUP BY t.tier
    """,
)
def range_lookup_order_tiers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric range-lookup join (operators/relational.py
    numeric_range_lookup — IP→geo / tax-bracket / price-tier shape):
    non-uniform [lo, hi] tiers explode into integer buckets, facts
    equi-join on bucket, exact BETWEEN after — candidates bounded by
    bucket occupancy, never the BroadcastNestedLoop a naive BETWEEN
    theta-join plans. The oracle IS the BETWEEN spec."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        numeric_range_lookup,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents")
    )
    tiers = spark.createDataFrame(_PRICE_TIERS, "tier string, lo long, hi long")
    joined = numeric_range_lookup(
        orders, tiers, "cents", bucket_width=1 << 22
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )


@register(
    "abc_classification_brands",
    """
    WITH per AS (
      SELECT p.p_brand AS key,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), r AS (
      SELECT key, value_cents,
             CAST(SUM(value_cents) OVER (ORDER BY value_cents DESC, key) AS BIGINT) AS cum_cents,
             CAST(row_number() OVER (ORDER BY value_cents DESC, key) AS BIGINT) AS rank,
             CAST(SUM(value_cents) OVER () AS BIGINT) AS total
      FROM per
    )
    SELECT key AS p_brand, value_cents, cum_cents, rank,
           CASE WHEN cum_cents * 100 <= 80 * total THEN 'A'
                WHEN cum_cents * 100 <= 95 * total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r
    """,
)
def abc_classification_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto-share classification (operators/relational.py
    abc_classification) of part brands by revenue: class boundaries
    compared in INTEGER cents (cum*100 <= pct*total — no float share
    ever decides a boundary); the window runs over the 25-brand
    aggregate, never raw lineitem."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        abc_classification,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    return abc_classification(
        joined, "p_brand", F.floor(F.col("l_extendedprice") * 100 + 0.5)
    )


@register(
    "dictionary_encode_priority",
    """
    WITH mapping AS (
      SELECT value, CAST(row_number() OVER (ORDER BY value) - 1 AS BIGINT) AS id
      FROM (SELECT DISTINCT o_orderpriority AS value FROM orders
            WHERE o_orderpriority IS NOT NULL)
    )
    SELECT m.value AS o_orderpriority, m.id AS o_orderpriority_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders o JOIN mapping m ON o.o_orderpriority = m.value
    GROUP BY 1, 2
    """,
)
def dictionary_encode_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary encoding (operators/relational.py
    encode_dictionary): string keys to dense sort-ordered longs —
    the measured key-width lever (long ids 1.5x over strings per
    iterative round at sf5). Ids assigned by a window over the
    DISTINCT-value table only; the encode join broadcasts the
    dictionary. Output: per (value, id) row counts."""
    from dpe_energy_performance_analysis_etl_spark.operators.relational import (
        encode_dictionary,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    encoded, _mapping = encode_dictionary(orders, "o_orderpriority")
    return encoded.groupBy("o_orderpriority", "o_orderpriority_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "curation_funnel_docs",
    """
    WITH raw AS (
      SELECT doc_id, text,
             'HTTPS://WWW.' || source || '.Example.COM:443/p' || (doc_id % 7)
               || '?utm_source=feed&b=2&a=1&id=' || (doc_id % 5) || '#frag' AS url
      FROM documents
    ), nf AS (
      SELECT doc_id, text, regexp_replace(url, '#.*$', '') AS u FROM raw
    ), parts AS (
      SELECT doc_id, text,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[^:]+://([^/?#]*)', 1)) AS hostport,
             regexp_extract(u, '^[^:]+://[^/?#]*(.*)$', 1) AS rest
      FROM nf
    ), canon AS (
      SELECT doc_id, text,
             scheme || '://' ||
             (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                   WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                   ELSE hostport END) ||
             (CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
                   ELSE regexp_extract(rest, '^([^?]*)', 1) END) ||
             (CASE WHEN len(list_sort(list_filter(string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                     p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$')))) > 0
                   THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                     p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$'))), '&')
                   ELSE '' END) AS c
      FROM parts
    ), base AS (
      SELECT doc_id, c,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_toks,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                   t -> CAST(len(t) AS BIGINT))),
                  (a, b) -> a + b) AS DOUBLE)
               / CAST(greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS DOUBLE) AS mwl
      FROM canon
    ), f1 AS (
      SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY c) AS url_ok FROM base
    ), f2 AS (
      SELECT *, url_ok AND doc_id = MIN(CASE WHEN url_ok THEN doc_id END)
                            OVER (PARTITION BY k) AS exact_ok
      FROM f1
    ), f3 AS (
      SELECT *, exact_ok AND n_toks >= 20 AND mwl < 12 AS quality_ok FROM f2
    ), f4 AS (
      SELECT *, quality_ok AND ((doc_id * 2654435761) % 4294967296) % 10000 < 8000 AS sample_ok
      FROM f3
    ), flags AS (
      SELECT *, CASE WHEN sample_ok AND n_toks > 0
                     THEN (n_toks - 1) // 24 + 1 ELSE 0 END AS n_chunks
      FROM f4
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS s_input,
             CAST(count_if(url_ok) AS BIGINT) AS s_url,
             CAST(count_if(exact_ok) AS BIGINT) AS s_exact,
             CAST(count_if(quality_ok) AS BIGINT) AS s_quality,
             CAST(count_if(sample_ok) AS BIGINT) AS s_sample,
             CAST(SUM(n_chunks) AS BIGINT) AS s_chunks
      FROM flags
    )
    SELECT 0 AS stage, 'input' AS stage_name, s_input AS n_rows FROM agg
    UNION ALL SELECT 1, 'url_dedup', s_url FROM agg
    UNION ALL SELECT 2, 'exact_dedup', s_exact FROM agg
    UNION ALL SELECT 3, 'quality_gate', s_quality FROM agg
    UNION ALL SELECT 4, 'subsample', s_sample FROM agg
    UNION ALL SELECT 5, 'chunks', s_chunks FROM agg
    """,
)
def curation_funnel_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation composition as one query
    (pipelines/curation.py curation_funnel): URL keep-first dedup →
    exact content dedup → quality gate → deterministic 80% subsample
    → chunk accounting — the per-stage funnel every curation run is
    judged by, computed as ONE aggregation over per-document survival
    flags (keep-first winners via per-key window minima; no unionAll
    of per-stage counts re-running the chain)."""
    from dpe_energy_performance_analysis_etl_spark.pipelines.curation import curation_funnel

    docs = read_documents(spark, sf_dir).select(
        "doc_id",
        "text",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.col("source"),
            F.lit(".Example.COM:443/p"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("?utm_source=feed&b=2&a=1&id="),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    _chunks, summary = curation_funnel(docs, url_col="url")
    return summary


@register(
    "link_graph_domains",
    """
    WITH html AS (
      SELECT doc_id,
             '<a href="https://' || source || '.example.com/p' || (doc_id % 5) || '">x</a>'
               || CASE WHEN doc_id % 3 = 0
                       THEN '<a href=''https://news.' || source || '.co.uk/q''>y</a>'
                       ELSE '' END
               || '<a href="/relative/path">z</a>' AS h
      FROM documents
    ), links AS (
      SELECT doc_id, unnest(regexp_extract_all(h, 'href\\s*=\\s*["'']([^"''<>]+)["'']', 1)) AS href
      FROM html
    ), absolute AS (
      SELECT doc_id,
             lower(regexp_extract(href, '^[^:]+://([^/?#]*)', 1)) AS host
      FROM links WHERE href LIKE 'http%'
    ), dom AS (
      SELECT doc_id, host, string_split(host, '.') AS labels FROM absolute
    ), tagged AS (
      SELECT doc_id,
             CASE WHEN len(labels) >= 3
                       AND (labels[-2] || '.' || labels[-1]) IN
                           ('co.uk','ac.uk','gov.uk','com.au','co.jp','co.in','com.br','co.nz')
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                  ELSE host END AS domain
      FROM dom
    )
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_inlinks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_linking_docs
    FROM tagged GROUP BY domain
    """,
)
def link_graph_domains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph extraction (text/urls.py extract_links): hrefs
    regexp-exploded from deterministic HTML, absolute links resolved
    to registered domains (both suffix rules exercised), per-domain
    inlink counts — the crawl-frontier / domain-authority input that
    composes with pagerank_fixed for domain ranking. Relative links
    pass through extraction and are excluded from the host graph."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import (
        extract_links,
        registered_domain,
        url_host,
    )

    docs = read_documents(spark, sf_dir)
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit('<a href="https://'),
            F.col("source"),
            F.lit(".example.com/p"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">x</a>'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("<a href='https://news."),
                    F.col("source"),
                    F.lit(".co.uk/q'>y</a>"),
                ),
            ).otherwise(F.lit("")),
            F.lit('<a href="/relative/path">z</a>'),
        ).alias("html"),
    )
    links = extract_links(html)
    absolute = links.where(F.col("href").startswith("http"))
    tagged = absolute.select(
        "doc_id", registered_domain(url_host(F.col("href"))).alias("domain")
    )
    return tagged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("doc_id").alias("n_linking_docs"),
    )


@register(
    "asof_join_forward_events",
    """
    SELECT l.user_id, l.ts, l.event_id, l.click_value, r.view_value
    FROM (SELECT user_id, ts, event_id, value AS click_value,
                 -epoch_us(ts) AS nts
          FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, -epoch_us(ts) AS nts, value AS view_value
                    FROM events WHERE event_type = 'view') r
    ON l.user_id = r.user_id AND l.nts >= r.nts
    """,
)
def asof_join_forward_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click gets the user's EARLIEST view
    AT-OR-AFTER it (the look-ahead direction — next-quote matching,
    next-checkpoint attribution). Same union-and-window single-shuffle
    implementation, descending order. DuckDB's native ASOF is
    backward-only, so the oracle replays forward semantics by
    negating epoch micros (l.nts >= r.nts ⟺ r.ts >= l.ts, and the
    asof max over nts is the min over ts)."""
    from dpe_energy_performance_analysis_etl_spark.operators import asof_join

    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    return asof_join(
        clicks, views, on="user_id", right_payload=["view_value"],
        suffix="", direction="forward",
    )


# =====================================================================
# Round-5 wave: evaluation, forecasting, graph-embedding prep
# =====================================================================

@register(
    "roc_auc_by_priority",
    """
    WITH r AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             2 * rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
               + count(*) OVER (PARTITION BY o_orderpriority, o_totalprice) - 1 AS mr2
      FROM orders
    ), a AS (
      SELECT o_orderpriority,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg,
             CAST(SUM(mr2 * y) AS BIGINT) AS r2
      FROM r GROUP BY 1
    )
    SELECT o_orderpriority, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                     / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
    FROM a
    """,
)
def roc_auc_by_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (operators/stats.py roc_auc_exact) of
    o_totalprice as a separator of finished vs open orders, per
    priority class: Mann-Whitney midrank sums in BIGINT (one rank
    window + one aggregation per group — never the O(n²) pairwise
    definition), one final exact-integer division."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import roc_auc_exact

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return roc_auc_exact(
        orders.select(
            "o_orderpriority",
            (F.col("o_orderstatus") == "F").alias("is_final"),
            "o_totalprice",
        ),
        "is_final",
        "o_totalprice",
        by="o_orderpriority",
    )


@register(
    "seasonal_naive_mase",
    """
    WITH m AS (
      SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mth,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY 1, 2
    ), lagd AS (
      SELECT o_orderpriority,
             abs(v - lag(v, 12) OVER (PARTITION BY o_orderpriority ORDER BY mth)) AS es,
             abs(v - lag(v, 1) OVER (PARTITION BY o_orderpriority ORDER BY mth)) AS en
      FROM m
    ), a AS (
      SELECT o_orderpriority,
             CAST(COUNT(es) AS BIGINT) AS n_eval,
             CAST(SUM(es) AS BIGINT) AS sae_seasonal,
             CAST(COUNT(en) AS BIGINT) AS nn,
             CAST(SUM(en) AS BIGINT) AS sae_naive
      FROM lagd GROUP BY 1
    )
    SELECT o_orderpriority, n_eval, sae_seasonal, sae_naive,
           CASE WHEN n_eval > 0 AND sae_naive > 0
                THEN CAST(sae_seasonal * nn AS DOUBLE)
                     / CAST(sae_naive * n_eval AS DOUBLE) END AS mase
    FROM a
    """,
)
def seasonal_naive_mase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast + MASE (operators/temporal.py
    seasonal_naive_eval) over monthly revenue CENTS per priority:
    the no-model forecasting baseline, error sums exact BIGINT, MASE
    one division of integer products. Series are pre-aggregated to
    one row per (key, month) before the lag windows, so window state
    is bounded by series length, not raw row count."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_naive_eval,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("mth"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    return seasonal_naive_eval(
        monthly, "mth", "v", season=12, by="o_orderpriority"
    )


@register(
    "walk_skipgram_pairs",
    f"""
    WITH corpus AS MATERIALIZED (
      SELECT * FROM ({_walks_oracle(4, 2)}
      ) w
    )
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM corpus a JOIN corpus b
      ON a.start = b.start AND a.walk = b.walk
     AND a.step != b.step AND abs(a.step - b.step) <= 2
    GROUP BY 1, 2
    """,
)
def walk_skipgram_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context, count) pairs from the
    deterministic walk corpus (operators/graph.py walk_skipgram_pairs
    — the DeepWalk step feeding SGNS embedding training): self-join
    on the walk id with |Δstep| ≤ 2, fan-out bounded at walk_len² per
    walk, walk table cached across both join sides."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        deterministic_random_walks,
        walk_skipgram_pairs,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    walks = deterministic_random_walks(edges, walk_len=4, walks_per_node=2)
    return walk_skipgram_pairs(walks, window=2)


@register(
    "t_closeness_customers",
    """
    WITH g AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g FROM customer GROUP BY 1
    ), v AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c_v FROM customer GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
    ), gv AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c_gv
      FROM customer GROUP BY 1, 2
    ), grid AS (
      SELECT g.c_nationkey, g.n_g, v.c_mktsegment, v.c_v,
             COALESCE(gv.c_gv, 0) AS c_gv, tot.n
      FROM g CROSS JOIN v CROSS JOIN tot
      LEFT JOIN gv ON gv.c_nationkey = g.c_nationkey
                  AND gv.c_mktsegment = v.c_mktsegment
    ), o AS (
      SELECT c_nationkey, n_g, n,
             CAST(SUM(abs(c_gv * n - c_v * n_g)) AS BIGINT) AS emd_num
      FROM grid GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, n_g AS group_size, emd_num,
           CAST(emd_num AS DOUBLE) / CAST(2 * n AS DOUBLE)
             / CAST(n_g AS DOUBLE) AS t_closeness,
           emd_num * 20 > 2 * n_g * n AS violates
    FROM o
    """,
)
def t_closeness_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/quality.py t_closeness_audit, Li
    ICDE'07): per-nation market-segment distribution vs the global
    one, EMD-as-total-variation decided ENTIRELY in integer
    arithmetic (|c_gv·n − c_v·n_g| sums; threshold 1/20 compared
    cross-multiplied) — the privacy leak k-anonymity and l-diversity
    both miss. The group×value completion grid is a join of tiny
    aggregate tables, never a fact-table cross."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        t_closeness_audit,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return t_closeness_audit(
        cust, ["c_nationkey"], "c_mktsegment", t_num=1, t_den=20
    )


@register(
    "link_prediction_parts",
    """
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z, b AS nbr FROM e UNION ALL SELECT b AS z, a AS nbr FROM e
    ), deg AS MATERIALIZED (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1
    ), wedges AS (
      SELECT l.nbr AS u, r.nbr AS v, d.deg
      FROM adj l JOIN adj r ON l.z = r.z AND l.nbr < r.nbr
      JOIN deg d ON d.z = l.z
    ), scored AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_scaled
      FROM wedges GROUP BY 1, 2
    ), non_edges AS (
      SELECT s.* FROM scored s ANTI JOIN e ON s.u = e.a AND s.v = e.b
    )
    SELECT ne.u, ne.v, ne.common_neighbors,
           CAST(du.deg * dv.deg AS BIGINT) AS preferential_attachment,
           ne.ra_scaled
    FROM non_edges ne
    JOIN deg du ON du.z = ne.u
    JOIN deg dv ON dv.z = ne.v
    WHERE ne.common_neighbors >= 2
    """,
)
def link_prediction_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (operators/graph.py link_prediction_scores,
    Liben-Nowell CIKM'03) on the recurring-pair part graph: common
    neighbors / preferential attachment / integer-scaled resource
    allocation for every non-adjacent distance-2 pair with >= 2
    shared neighbors. Wedge join equi-keyed on the middle; RA sums
    are BIGINT floor divisions (no float accumulation)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        link_prediction_scores,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return link_prediction_scores(pairs, min_common=2)


_RAKE_STOPS = "'the','a','an','and','or','of','to','in','is','on','for','with','at','by','from','as','it','this','that'"


@register(
    "rake_keywords_docs",
    f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, unnest(t) AS tok FROM tok
    ), tagged AS (
      SELECT doc_id, p, tok,
             tok IN ({_RAKE_STOPS}) AS stop,
             SUM(CASE WHEN tok IN ({_RAKE_STOPS}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p) AS gid
      FROM pos
    ), ph AS MATERIALIZED (
      SELECT doc_id, gid, string_agg(tok, ' ' ORDER BY p) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM tagged WHERE NOT stop GROUP BY doc_id, gid
      HAVING COUNT(*) <= 4
    ), words AS (
      SELECT unnest(string_split(phrase, ' ')) AS word, n_words FROM ph
    ), stats AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(n_words) AS BIGINT) AS deg
      FROM words GROUP BY 1
    ), occ AS (
      SELECT phrase, n_words, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM ph GROUP BY 1, 2
    ), sw AS (
      SELECT phrase, n_words, n_occurrences,
             unnest(string_split(phrase, ' ')) AS word
      FROM occ
    )
    SELECT sw.phrase, sw.n_words, sw.n_occurrences,
           CAST(SUM((s.deg * 1000000) // s.freq) AS BIGINT) AS score_scaled
    FROM sw JOIN stats s ON s.word = sw.word
    GROUP BY 1, 2, 3
    """,
)
def rake_keywords_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (text/analysis.py rake_keywords, Rose
    2010): stopword-split candidate phrases, word degree/frequency
    stats, phrase score = Σ integer-scaled deg·10^6 div freq — an
    order-free BIGINT sum, no float accumulation. Phrase building is
    one doc-bounded window; scoring re-joins a broadcast word-stat
    table."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import rake_keywords

    return rake_keywords(read_documents(spark, sf_dir))


_CDC_SPANS_SQL = """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), whs AS (
      SELECT doc_id, t, len(t) AS n,
             list_transform(t, w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(w, '.'), c -> CAST(ascii(c) AS BIGINT))),
                 (acc, c) -> (acc * 131 + c) % 2147483647)) AS wh
      FROM tok
    ), cuts AS (
      SELECT doc_id, t, n,
             list_filter(CASE WHEN n >= 4 THEN range(3, n) ELSE [] END,
               p -> (  (wh[p + 1] * 1 % 2147483647)
                     + (wh[p] * 131 % 2147483647)
                     + (wh[p - 1] * 17161 % 2147483647)
                     + (wh[p - 2] * 2248091 % 2147483647)
                    ) % 2147483647 % 16 = 0) AS cut
      FROM whs
    ), ends_t AS (
      SELECT doc_id, t, n,
             CASE WHEN n = 0 THEN []
                  WHEN len(cut) > 0 AND cut[-1] = n - 1 THEN cut
                  ELSE list_append(cut, n - 1) END AS ends
      FROM cuts
    ), se AS MATERIALIZED (
      SELECT doc_id, t,
             list_prepend(0, list_transform(ends[1:len(ends)-1], e -> e + 1)) AS starts,
             ends
      FROM ends_t WHERE n > 0
    ), chunks AS (
      SELECT doc_id, t, starts, ends, unnest(range(1, len(ends) + 1)) AS ci
      FROM se
    ), spans AS (
      SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx,
             CAST(starts[ci] AS BIGINT) AS start_tok,
             CAST(ends[ci] - starts[ci] + 1 AS BIGINT) AS n_tokens,
             md5(array_to_string(t[starts[ci]+1 : ends[ci]+1], ' ')) AS chunk_md5
      FROM chunks
    )"""


@register(
    "cdc_chunk_spans",
    _CDC_SPANS_SQL
    + """
    SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_md5 FROM spans
    """,
)
def cdc_chunk_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (text/chunking.py cdc_chunks, the
    LBFS/rsync primitive at word granularity): boundaries where the
    trailing-4-token rolling hash ≡ 0 mod 16, so chunk identity
    survives insertions/deletions outside the edit — all row-local
    array arithmetic (zero shuffle), Mersenne-2^31 modulus keeps
    every product int64-safe under ANSI."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunks

    return cdc_chunks(read_documents(spark, sf_dir))


@register(
    "cdc_chunk_dedup",
    _CDC_SPANS_SQL
    + """
    SELECT chunk_md5, n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM spans GROUP BY 1, 2
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def cdc_chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated CDC chunks (text/chunking.py
    cdc_chunk_dedup): shared boilerplate collapses to equal md5 keys,
    found by ONE hash groupBy over the chunk table — sub-document
    dedup at exact-dedup cost, no pair enumeration."""
    from dpe_energy_performance_analysis_etl_spark.text.chunking import cdc_chunk_dedup

    return cdc_chunk_dedup(read_documents(spark, sf_dir))


@register(
    "record_linkage_fs",
    """
    WITH r AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0
                  THEN replace(c_name, 'Customer', 'Custoner') ELSE c_name END AS name,
             c_nationkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.75e1 ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
      FROM customer
    ), l AS (
      SELECT c_custkey, c_name AS name, c_nationkey, c_acctbal AS bal,
             c_mktsegment AS seg
      FROM customer
    ), cand AS (
      SELECT l.c_custkey AS left_id, r.c_custkey AS right_id,
             (l.name = r.name) AS a1, (l.seg = r.seg) AS a2,
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000) AS a3
      FROM l JOIN r ON l.c_nationkey = r.c_nationkey
                   AND l.name[-3:] = r.name[-3:]
    ), scored AS (
      SELECT left_id, right_id,
             CAST(CASE WHEN a1 THEN 40 ELSE -10 END
                + CASE WHEN a2 THEN 10 ELSE -8 END
                + CASE WHEN a3 THEN 20 ELSE -6 END AS BIGINT) AS score,
             CAST(CAST(a1 AS INT) + CAST(a2 AS INT) + CAST(a3 AS INT) AS BIGINT) AS n_agree
      FROM cand
    )
    SELECT left_id, right_id, score, n_agree,
           CASE WHEN score >= 50 THEN 'match'
                WHEN score < 0 THEN 'non_match'
                ELSE 'possible' END AS link_class
    FROM scored
    """,
)
def record_linkage_fs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (operators/entity.py
    fellegi_sunter_link, FS JASA'69): customers linked to a
    deterministically perturbed copy (1/7 corrupted names, 1/5 masked
    segments, 1/3 shifted balances) — blocked on (nation, name digit
    tail) so candidates stay equi-keyed, scored by integer log-odds
    weights (name 40/-10, segment 10/-8, $1000-balance-bucket 20/-6),
    classified at the 50/0 thresholds."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        fellegi_sunter_link,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    right = cust.select(
        "c_custkey",
        F.when(k % 7 == 0, F.regexp_replace("c_name", "Customer", "Custoner"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        "c_nationkey",
        F.when(k % 3 == 0, F.col("c_acctbal") + 17.5)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(k % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    left = cust.select(
        "c_custkey",
        F.col("c_name").alias("name"),
        "c_nationkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    bucket = F.expr("floor(bal * 100 + 0.5) div 100000")
    return fellegi_sunter_link(
        left,
        right,
        block_cols=[
            (F.col("c_nationkey"), F.col("c_nationkey")),
            (F.substring("name", -3, 3), F.substring("name", -3, 3)),
        ],
        comparisons=[
            ("name", F.col("name"), F.col("name"), 40, -10),
            ("segment", F.col("seg"), F.col("seg"), 10, -8),
            ("balance_bucket", bucket, bucket, 20, -6),
        ],
        left_id="c_custkey",
        right_id="c_custkey",
        upper=50,
        lower=0,
    )


def _bfs_oracle(n_landmarks: int, max_depth: int) -> str:
    blocks = [
        f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z, b AS nbr FROM e UNION ALL SELECT b AS z, a AS nbr FROM e
    ), lm AS MATERIALIZED (
      SELECT z AS landmark FROM (SELECT DISTINCT z FROM adj ORDER BY z LIMIT {n_landmarks})
    ), d0 AS MATERIALIZED (
      SELECT landmark, landmark AS node, 0 AS dist FROM lm
    )"""
    ]
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", d{r} AS MATERIALIZED (
      SELECT * FROM d{r - 1}
      UNION ALL
      SELECT DISTINCT f.landmark, a.nbr AS node, {r} AS dist
      FROM d{r - 1} f JOIN adj a ON a.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM d{r - 1} v
                        WHERE v.landmark = f.landmark AND v.node = a.nbr)
    )"""
        )
    blocks.append(
        f"""
    SELECT landmark, node, CAST(dist AS BIGINT) AS dist FROM d{max_depth}
    """
    )
    return "".join(blocks)


@register("landmark_bfs_parts", _bfs_oracle(4, 4))
def landmark_bfs_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source landmark BFS (operators/graph.py
    landmark_bfs_distances, Potamias CIKM'09) on the recurring-pair
    part graph: exact hop distances from the 4 smallest node ids out
    to 4 hops — frontier⋈adjacency + visited anti-join per round, all
    landmarks advancing in one pass, per-round re-cache with bounded
    lineage. The shortest-path family the graph suite lacked."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        landmark_bfs_distances,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return landmark_bfs_distances(pairs, n_landmarks=4, max_depth=4)


@register(
    "pass_at_k_customers",
    """
    WITH a AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_success
      FROM orders GROUP BY 1
    )
    SELECT o_custkey, n_samples, n_success,
           CASE WHEN n_samples >= 3 THEN
             CASE WHEN n_samples - n_success >= 3 THEN
               CAST(n_samples * (n_samples - 1) * (n_samples - 2)
                    - (n_samples - n_success) * (n_samples - n_success - 1)
                      * (n_samples - n_success - 2) AS DOUBLE)
               / CAST(n_samples * (n_samples - 1) * (n_samples - 2) AS DOUBLE)
             ELSE 1.0e0 END
           END AS pass_at_k
    FROM a
    """,
)
def pass_at_k_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator (operators/stats.py pass_at_k, Chen
    2021 eq. 1) with k=3 over per-customer order outcomes: falling-
    factorial products in BIGINT, one exact-integer division — the
    LLM sampling-eval metric in its hash-stable form."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import pass_at_k

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", (F.col("o_orderstatus") == "F").alias("ok")
    )
    return pass_at_k(orders, "o_custkey", "ok", k=3)


@register(
    "hll_distinct_orders",
    """
    WITH items AS (
      SELECT l_returnflag, rpad(CAST(l_orderkey AS VARCHAR), 16, '#') AS s
      FROM lineitem
    ), h AS (
      SELECT l_returnflag,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(s, '.'),
                               c -> CAST(ascii(c) AS BIGINT))),
                (acc, c) -> (acc * 131 + c) % 2147483647) AS h0
      FROM items
    ), mx AS (
      SELECT l_returnflag, xor(s1, s1 >> 16) AS h32 FROM (
        SELECT l_returnflag,
               (xor(h0, h0 >> 16) * 73244475) % 4294967296 AS s1
        FROM h)
    ), br AS (
      SELECT l_returnflag, h32 % 64 AS b,
             CASE WHEN h32 // 64 = 0 THEN 27
                  ELSE 27 - length(bin(h32 // 64)) END AS rho
      FROM mx
    ), regs AS (
      SELECT l_returnflag, b, MAX(rho) AS mreg FROM br GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
           CAST(SUM(1 << (27 - mreg)) AS BIGINT) AS register_sum_x2p,
           (7.0937e-1 * 4096) /
             (SUM(1.0e0 / CAST(1 << mreg AS DOUBLE))
              + CAST(64 - COUNT(*) AS DOUBLE)) AS hll_estimate
    FROM regs GROUP BY 1
    """,
)
def hll_distinct_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog (operators/sketch.py hll_portable,
    Flajolet'07) distinct orders per returnflag — the oracle-checked
    twin of the rows-only ``approx_distinct`` (engine sketch bytes):
    char-fold hash → 32-bit finalizer, 64 registers, ranks via
    length(bin(w)) (no libm log), 2^-M as exact dyadic doubles so the
    register sum is order-free exact; one multiply + one divide."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import hll_portable

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return hll_portable(li, "l_orderkey", by="l_returnflag")


def _bellman_oracle(n_sources: int, rounds: int) -> str:
    blocks = [
        f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), ew AS MATERIALIZED (
      SELECT a AS u, b AS v, CAST(n AS BIGINT) AS w FROM co WHERE n >= 2
      UNION ALL
      SELECT b AS u, a AS v, CAST(n AS BIGINT) AS w FROM co WHERE n >= 2
    ), srcs AS MATERIALIZED (
      SELECT node AS source FROM (
        SELECT DISTINCT u AS node FROM ew ORDER BY node LIMIT {n_sources})
    ), d0 AS MATERIALIZED (
      SELECT source, source AS node, CAST(0 AS BIGINT) AS dist FROM srcs
    )"""
    ]
    for r in range(1, rounds + 1):
        blocks.append(
            f""", d{r} AS MATERIALIZED (
      SELECT source, node, MIN(dist) AS dist FROM (
        SELECT * FROM d{r - 1}
        UNION ALL
        SELECT d.source, e.v AS node, d.dist + e.w AS dist
        FROM d{r - 1} d JOIN ew e ON e.u = d.node
      ) GROUP BY 1, 2
    )"""
        )
    blocks.append(f"\n    SELECT source, node, dist FROM d{rounds}\n    ")
    return "".join(blocks)


@register("bellman_ford_parts", _bellman_oracle(4, 4))
def bellman_ford_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source Bellman-Ford (operators/graph.py
    bounded_bellman_ford) on the recurring-pair part graph with the
    co-occurrence support as the integer edge weight: cheapest
    ≤4-hop cost from the 4 smallest nodes — per round ONE
    frontier-keyed join + one (source, node) MIN aggregation,
    BIGINT-exact distances, unrolled-CTE oracle replay."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        bounded_bellman_ford,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    co = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
    )
    edges = co.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.col("n").alias("w")
    ).unionAll(
        co.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), F.col("n").alias("w")
        )
    )
    return bounded_bellman_ford(edges, n_sources=4, rounds=4)


def _coverage_oracle(k: int) -> str:
    blocks = [
        """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), p AS MATERIALIZED (
      SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS item
      FROM tok WHERE len(t) >= 3
    ), cov0 AS MATERIALIZED (
      SELECT item FROM p WHERE 1 = 0
    ), picked0 AS MATERIALIZED (
      SELECT id FROM p WHERE 1 = 0
    )"""
    ]
    for r in range(1, k + 1):
        blocks.append(
            f""", pick{r} AS MATERIALIZED (
      SELECT {r} AS round, id, CAST(COUNT(*) AS BIGINT) AS gain
      FROM p ANTI JOIN cov{r - 1} USING (item)
      WHERE id NOT IN (SELECT id FROM picked{r - 1})
      GROUP BY id
      ORDER BY gain DESC, id LIMIT 1
    ), cov{r} AS MATERIALIZED (
      SELECT item FROM cov{r - 1}
      UNION
      SELECT item FROM p JOIN pick{r} USING (id)
    ), picked{r} AS MATERIALIZED (
      SELECT id FROM picked{r - 1} UNION SELECT id FROM pick{r}
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT CAST(round AS BIGINT) AS round, id AS doc_id, gain FROM pick{r} WHERE gain > 0"
        for r in range(1, k + 1)
    )
    blocks.append(f"\n    {union}\n    ")
    return "".join(blocks)


@register("coverage_select_docs", _coverage_oracle(5))
def coverage_select_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage selection of 5 exemplar documents by
    distinct word-3-gram coverage (text/curation.py
    greedy_max_coverage — the (1-1/e) submodular greedy behind
    coverage-driven training-data subset selection): per round one
    anti-join + per-doc count + a 1-row argmax pull; covered set
    checkpointed per round; unrolled-CTE oracle replays every pick."""
    from dpe_energy_performance_analysis_etl_spark.text.curation import greedy_max_coverage
    from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr

    docs = read_documents(spark, sf_dir)
    pairs = docs.select(
        "doc_id", F.explode(ngrams_expr("text", 3)).alias("item")
    )
    return greedy_max_coverage(pairs, k=5)


@register(
    "vocab_growth_docs",
    """
    WITH mx AS (
      SELECT CAST(MAX(doc_id) AS BIGINT) // 20 + 1 AS width FROM documents
    ), tok AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents) WHERE len(t) >= 3
    ), first AS (
      SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY 1
    ), pb AS (
      SELECT CAST(first_doc // mx.width AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_new_terms,
             CAST(ANY_VALUE(mx.width) AS BIGINT) AS width
      FROM first, mx GROUP BY 1
    )
    SELECT bucket, CAST(bucket * width AS BIGINT) AS bucket_start_doc,
           n_new_terms,
           CAST(SUM(n_new_terms) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
    FROM pb
    """,
)
def vocab_growth_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (text/analysis.py vocab_growth):
    first occurrence per term = one term-keyed min aggregation over
    word 3-grams (the synthetic unigram vocabulary saturates in the
    first bucket); curve buckets into 20 doc-id ranges so the running
    total windows over ≤ 20 rows — never a global per-document
    window."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import vocab_growth

    return vocab_growth(read_documents(spark, sf_dir), n_buckets=20, ngram_n=3)


@register(
    "bigram_containment_pairs",
    """
    WITH paired AS (
      SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 AS side,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, pair_id, side,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS gram
      FROM paired WHERE len(t) >= 2
    ), cnts AS MATERIALIZED (
      SELECT pair_id, side, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1, 2, 3
    ), c AS (
      SELECT pair_id, gram, cnt FROM cnts WHERE side = 0
    ), r AS (
      SELECT pair_id, gram, cnt AS rcnt FROM cnts WHERE side = 1
    ), agg AS (
      SELECT c.pair_id,
             CAST(SUM(LEAST(c.cnt, COALESCE(r.rcnt, 0))) AS BIGINT) AS pn_num,
             CAST(SUM(c.cnt) AS BIGINT) AS pn_den
      FROM c LEFT JOIN r ON r.pair_id = c.pair_id AND r.gram = c.gram
      GROUP BY 1
    )
    SELECT pair_id AS doc_id, pn_num, pn_den,
           CASE WHEN pn_den > 0
                THEN CAST(pn_num AS DOUBLE) / CAST(pn_den AS DOUBLE) END AS precision
    FROM agg
    """,
)
def bigram_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped bigram precision (text/evaluation.py ngram_precision —
    the BLEU component, Papineni ACL'02; equivalently Broder's
    directional CONTAINMENT on bigram multisets) of each even doc
    against its odd pair: integer clipped-match sums, one guarded
    division. BLEU's geometric mean is libm and stays out of checked
    outputs by design — the components carry the information."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import ngram_precision

    docs = read_documents(spark, sf_dir)
    cand = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("bigint").alias("doc_id"), "text"
    )
    ref = docs.where(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") / 2).cast("bigint").alias("doc_id"), "text"
    )
    return ngram_precision(cand, ref, n=2)


@register(
    "distinct_n_docs",
    """
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS gram
      FROM tok WHERE len(t) >= 2
    ), cnts AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(cnt) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS distinct_ratio
    FROM cnts GROUP BY 1
    """,
)
def distinct_n_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-2 diversity per document (text/evaluation.py
    distinct_n, Li NAACL'16): distinct bigrams over total bigrams —
    the degenerate-repetition screen for generated or crawled text.
    One (doc, gram) count aggregation."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import distinct_n

    return distinct_n(read_documents(spark, sf_dir), n=2)


@register(
    "simpson_user_events",
    """
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n_items,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs
      FROM counts GROUP BY 1
    )
    SELECT user_id, n_items, n_values,
           CASE WHEN n_items > 1
                THEN CAST(pairs AS DOUBLE)
                     / CAST(n_items * (n_items - 1) AS DOUBLE) END AS simpson
    FROM agg
    """,
)
def simpson_user_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration of event types per user
    (text/evaluation.py simpson_concentration): Σ n_i(n_i−1)/(N(N−1))
    — the log-free diversity index (Shannon entropy's ln is libm and
    cross-engine-unsafe; Simpson is an exact rational). Behavioral
    concentration screen over the events table."""
    from dpe_energy_performance_analysis_etl_spark.text.evaluation import (
        simpson_concentration,
    )

    ev = read_events(spark, sf_dir).select("user_id", "event_type")
    return simpson_concentration(ev, "user_id", "event_type")


def _ppr_oracle(iterations: int, n_seeds: int) -> str:
    base_seed = 15 * 10**12 // (100 * n_seeds)
    init_seed = 10**12 // n_seeds
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
      UNION
      SELECT DISTINCT dst AS node FROM e
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), seeds AS MATERIALIZED (
      SELECT node FROM (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})
    ), r0 AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN s.node IS NOT NULL THEN {init_seed} ELSE 0 END AS BIGINT) AS r
      FROM nodes n LEFT JOIN seeds s ON n.node = s.node
    )"""
    ]
    for i in range(1, iterations + 1):
        blocks.append(
            f""", r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN s.node IS NOT NULL THEN {base_seed} ELSE 0 END
                  + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n
      LEFT JOIN seeds s ON n.node = s.node
      LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r{i - 1}.r // deg.deg) AS BIGINT) AS inc
        FROM r{i - 1} JOIN deg ON r{i - 1}.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    )"""
        )
    blocks.append(f"\n    SELECT node, r AS rank_scaled FROM r{iterations}\n    ")
    return "".join(blocks)


@register("ppr_supplier_graph", _ppr_oracle(3, 4))
def ppr_supplier_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py personalized_pagerank,
    Jeh & Widom WWW'03) on the customer-supplier trade graph, teleport
    confined to the 4 smallest node ids: proximity-to-seeds
    centrality in the same bit-portable scaled-integer arithmetic as
    the global variant — per round one src-keyed join + one dst-keyed
    agg, |E|-bounded."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        personalized_pagerank,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return personalized_pagerank(edges, n_seeds=4, iterations=3)


def _hits_oracle(iterations: int) -> str:
    S = 10**6  # HITS_SCALE: S^2 * max_degree must stay in int64
    blocks = [
        f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
      UNION
      SELECT DISTINCT dst AS node FROM e
    ), h0 AS MATERIALIZED (
      SELECT node, CAST({S} AS BIGINT) AS h FROM nodes
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", araw{r} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(h{r - 1}.h) AS BIGINT) AS a
      FROM e JOIN h{r - 1} ON h{r - 1}.node = e.src GROUP BY e.dst
    ), a{r} AS MATERIALIZED (
      SELECT node,
             CAST((a * {S}) // greatest((SELECT MAX(a) FROM araw{r}), 1) AS BIGINT) AS a
      FROM araw{r}
    ), hraw{r} AS MATERIALIZED (
      SELECT e.src AS node, CAST(SUM(a{r}.a) AS BIGINT) AS h
      FROM e JOIN a{r} ON a{r}.node = e.dst GROUP BY e.src
    ), h{r} AS MATERIALIZED (
      SELECT node,
             CAST((h * {S}) // greatest((SELECT MAX(h) FROM hraw{r}), 1) AS BIGINT) AS h
      FROM hraw{r}
    )"""
        )
    blocks.append(
        f"""
    SELECT n.node,
           CAST(COALESCE(h{iterations}.h, 0) AS BIGINT) AS hub_scaled,
           CAST(COALESCE(a{iterations}.a, 0) AS BIGINT) AS auth_scaled
    FROM nodes n
    LEFT JOIN h{iterations} ON h{iterations}.node = n.node
    LEFT JOIN a{iterations} ON a{iterations}.node = n.node
    """
    )
    return "".join(blocks)


@register("hits_supplier_graph", _hits_oracle(2))
def hits_supplier_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.py hits_fixed,
    Kleinberg JACM'99) on the DIRECTED customer→supplier trade graph:
    customers score as hubs, suppliers as authorities, re-normalized
    to max = 10^6 (HITS_SCALE; 10^12 overflowed int64 in the
    score×weight products) per half-round by integer floor division
    (L∞ norm
    — the exact-arithmetic choice; L2's sqrt-of-a-sum would be
    order-sensitive). Two |E|-keyed join+aggs per round plus scalar
    max attaches via broadcast crossJoin."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import hits_fixed

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return hits_fixed(edges, iterations=2)


@register("scene_cuts_rawvideo")
def scene_cuts_rawvideo_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL rawvideo bytes (multimodal/
    media.py frame_luma_features + scene_cut_detect): deterministic
    synthetic videos (hard level changes at known frames, drift
    elsewhere), decoded by the rawvideo slicer, cuts found by a pure
    SQL lag window over integer mean-luma. Rows-only by design —
    byte decode isn't SQL (the dHash precedent); the detector layer
    itself is relational and unit-tested against ground truth."""
    import numpy as np

    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        frame_luma_features,
        scene_cut_detect,
    )

    w = h = 16
    rows = []
    for vid in range(6):
        frames = []
        for i in range(20):
            seg = i // (4 + vid % 3)
            level = (37 * (vid + 1) + 83 * seg) % 200 + 20
            frames.append(np.full((h, w, 3), level, dtype=np.uint8))
        rows.append((vid, bytearray(b"".join(f.tobytes() for f in frames))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    feats = frame_luma_features(df, width=w, height=h)
    return scene_cut_detect(feats, threshold=20)


@register("audio_fp_match_clip")
def audio_fp_match_clip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shazam-style audio identity (multimodal/audiofp.py, Wang ISMIR
    2003) over REAL WAV bytes: deterministic tone-sequence tracks, a
    mid-track clip as the query, constellation hashes joined +
    offset-voted. Rows-only by design — FFT/decode aren't SQL; the
    join+vote matcher is relational and the tests pin the
    correct-track/correct-offset ground truth."""
    import numpy as np

    from dpe_energy_performance_analysis_etl_spark.multimodal.audiofp import (
        audio_fingerprints,
        audio_match,
    )
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_wav

    rate = 8000

    def track(seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        t = np.arange(rate // 2) / rate
        segs = []
        for i in range(6):
            freqs = rng.integers(200, 3600, 3)
            seg = sum(
                np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs
            )
            segs.append(seg / 3.0)
        return np.concatenate(segs)

    db_rows = [(i, bytearray(encode_wav(track(i), rate))) for i in range(1, 4)]
    clip = track(2)[rate : 2 * rate]
    q_rows = [(99, bytearray(encode_wav(clip, rate)))]
    db = spark.createDataFrame(db_rows, "media_id long, content binary")
    q = spark.createDataFrame(q_rows, "media_id long, content binary")
    return audio_match(audio_fingerprints(db), audio_fingerprints(q), min_votes=5)


# =====================================================================
# Round 5, wave 11: graph structure analytics — clustering coefficient,
# degree assortativity, community modularity (operators/graph.py)
# =====================================================================

@register(
    "clustering_coeff_parts",
    """
    WITH e AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY 1
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY 1
    )
    SELECT deg.v, deg.deg,
           COALESCE(n_triangles, 0) AS n_triangles,
           CASE WHEN deg.deg < 2 THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 * COALESCE(n_triangles, 0) AS DOUBLE)
                     / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) END
             AS clustering_coeff
    FROM deg LEFT JOIN corners ON deg.v = corners.v
    """,
)
def clustering_coeff_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients (operators/graph.py
    clustering_coefficients) over the recurring co-purchase part
    graph (same support>=2 edges as triangle_count_parts — the
    scale-stable graph). 2T/(deg·(deg−1)) with both sides int64 and
    ONE double division per node keeps an inherently fractional
    statistic bit-portable across engines — no float sums exist in
    the plan. Scale shape is triangle_counts' (arboricity-bounded
    wedge join) plus a free projection."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        clustering_coefficients,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= 2)
        .select("src", "dst")
    )
    return clustering_coefficients(edges)


@register(
    "degree_assortativity_trade",
    """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT DISTINCT least(c, s) AS a, greatest(c, s) AS b FROM pairs
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY 1
    ), bidir AS (
      SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
    ), j AS (
      SELECT da.deg AS dx, db.deg AS dy
      FROM bidir JOIN deg da ON da.v = bidir.a JOIN deg db ON db.v = bidir.b
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_directed,
             CAST(SUM(dx) AS BIGINT) AS sum_x,
             CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
             CAST(SUM(dx * dx) AS BIGINT) AS sum_x2
      FROM j
    )
    SELECT m_directed, sum_x, sum_xy, sum_x2,
           CASE WHEN m_directed * sum_x2 - sum_x * sum_x = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(m_directed * sum_xy - sum_x * sum_x AS DOUBLE)
                     / CAST(m_directed * sum_x2 - sum_x * sum_x AS DOUBLE) END
             AS assortativity
    FROM s
    """,
)
def degree_assortativity_trade_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (operators/graph.py degree_assortativity)
    of the customer<->supplier trade graph — bipartite trade networks
    are canonically DISASSORTATIVE (big buyers connect to small
    suppliers and vice versa); the single-row coefficient quantifies
    it. All four Pearson sums are int64 over integer degree products;
    the symmetric-edge identity removes the sqrt, so one double
    division is the only float op — hash-gate exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        degree_assortativity,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return degree_assortativity(pairs)


@register(
    "community_modularity_nations",
    """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
      SELECT DISTINCT least(c, s) AS a, greatest(c, s) AS b FROM pairs
    ), lab AS (
      SELECT c_custkey * 2 AS n, c_nationkey AS com FROM customer
      UNION ALL
      SELECT s_suppkey * 2 + 1 AS n, s_nationkey AS com FROM supplier
    ), labeled AS MATERIALIZED (
      SELECT e.a, e.b, la.com AS ca, lb.com AS cb
      FROM e JOIN lab la ON la.n = e.a JOIN lab lb ON lb.n = e.b
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m FROM labeled
    ), degc AS (
      SELECT community, CAST(COUNT(*) AS BIGINT) AS degree_sum FROM (
        SELECT ca AS community FROM labeled UNION ALL SELECT cb FROM labeled
      ) GROUP BY 1
    ), intra AS (
      SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS intra_edges
      FROM labeled WHERE ca = cb GROUP BY 1
    ), nn AS (
      SELECT com AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
        SELECT DISTINCT v FROM (
          SELECT a AS v FROM labeled UNION ALL SELECT b FROM labeled
        )
      ) JOIN lab ON lab.n = v GROUP BY 1
    )
    SELECT d.community,
           COALESCE(n_nodes, 0) AS n_nodes,
           d.degree_sum,
           COALESCE(intra_edges, 0) AS intra_edges,
           CAST(4 * m.m * COALESCE(intra_edges, 0)
                - d.degree_sum * d.degree_sum AS BIGINT) AS q_contrib_num,
           CAST(4 * m.m * m.m AS BIGINT) AS modularity_den,
           CASE WHEN m.m = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(4 * m.m * COALESCE(intra_edges, 0)
                          - d.degree_sum * d.degree_sum AS DOUBLE)
                     / CAST(4 * m.m * m.m AS DOUBLE) END AS q_contrib
    FROM degc d LEFT JOIN intra USING (community)
                LEFT JOIN nn USING (community)
                CROSS JOIN m
    """,
)
def community_modularity_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity decomposition (operators/graph.py
    community_modularity) of the NATION partition over the trade
    graph: does geography explain the wiring better than random? Per
    community: intra-edge count, degree sum, and the exact-integer
    contribution (4·m·m_c − d_c²); q_contrib is the one double
    division. Global Q = the caller's fixed-order sum over ≤25 rows
    (the chi2-cells contract). Labels join as a broadcast dimension;
    everything else is |E|-keyed."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        community_modularity,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    communities = (
        cust.select(
            (F.col("c_custkey") * 2).alias("node"),
            F.col("c_nationkey").alias("community"),
        )
        .unionAll(
            supp.select(
                (F.col("s_suppkey") * 2 + 1).alias("node"),
                F.col("s_nationkey").alias("community"),
            )
        )
    )
    return community_modularity(pairs, communities)


# =====================================================================
# Round 5, wave 12: exact-portable statistics — lag autocorrelation,
# Mann-Kendall trend, key-skew Gini, quantized Cramér's V
# (operators/stats.py)
# =====================================================================

@register(
    "lag_autocorr_revenue",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) * 100 AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), series AS (
      SELECT month, cents // 100000 AS x FROM monthly
    ), lagged AS (
      SELECT x,
             lag(x, 1) OVER (ORDER BY month) AS l1,
             lag(x, 2) OVER (ORDER BY month) AS l2,
             lag(x, 3) OVER (ORDER BY month) AS l3
      FROM series
    ), pairs AS (
      SELECT 1 AS lag_k, x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
      UNION ALL SELECT 2, x, l2 FROM lagged WHERE l2 IS NOT NULL
      UNION ALL SELECT 3, x, l3 FROM lagged WHERE l3 IS NOT NULL
    ), s AS (
      SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             CAST(SUM(x * x) AS BIGINT) AS sum_x2,
             CAST(SUM(y * y) AS BIGINT) AS sum_y2
      FROM pairs GROUP BY 1
    )
    SELECT lag_k, n_pairs, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           CASE WHEN n_pairs * sum_x2 - sum_x * sum_x <= 0
                  OR n_pairs * sum_y2 - sum_y * sum_y <= 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_pairs * sum_xy - sum_x * sum_y AS DOUBLE)
                     / (sqrt(CAST(n_pairs * sum_x2 - sum_x * sum_x AS DOUBLE))
                        * sqrt(CAST(n_pairs * sum_y2 - sum_y * sum_y AS DOUBLE)))
           END AS autocorr
    FROM s
    """,
)
def lag_autocorr_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of the monthly revenue series
    (operators/stats.py lag_autocorrelation) — the seasonality probe a
    forecasting pipeline runs before choosing a model. Revenue is
    exact integer cents (scaled_long sum) quantized to k$ by floor
    division, so every Pearson sum is int64 and the statistic is
    bit-portable: two sqrt + one division are the only float ops. The
    window runs over the 80-row MONTH table, not the fact scan."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import exact_cents_sum
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        lag_autocorrelation,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(exact_cents_sum("o_totalprice", 2).alias("cents"))
        .select("month", F.expr("cents div 100000").alias("x"))
    )
    return lag_autocorrelation(monthly, "x", "month", lags=[1, 2, 3])


@register(
    "mann_kendall_user_values",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id, ts, event_id, value FROM events
    ), pairs AS (
      SELECT a.user_id AS k, CAST(sign(b.value - a.value) AS BIGINT) AS sg
      FROM ev a JOIN ev b ON a.user_id = b.user_id
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    ), s AS (
      SELECT k, CAST(SUM(sg) AS BIGINT) AS s_stat FROM pairs GROUP BY 1
    ), nt AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1
    ), ties AS (
      SELECT k, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT user_id AS k, value, CAST(COUNT(*) AS BIGINT) AS t
        FROM ev GROUP BY 1, 2
      ) WHERE t > 1 GROUP BY 1
    ), out AS (
      SELECT nt.k AS user_id, nt.n,
             COALESCE(s_stat, 0) AS s_stat,
             CAST(nt.n * (nt.n - 1) * (2 * nt.n + 5)
                  - COALESCE(tie_term, 0) AS BIGINT) AS var_x18
      FROM nt LEFT JOIN s ON s.k = nt.k LEFT JOIN ties ON ties.k = nt.k
    )
    SELECT user_id, n, s_stat, var_x18,
           CASE WHEN var_x18 = 0 OR s_stat = 0 THEN CAST(0 AS DOUBLE)
                WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                     / sqrt(CAST(var_x18 AS DOUBLE) / 1.8e1)
                ELSE CAST(s_stat + 1 AS DOUBLE)
                     / sqrt(CAST(var_x18 AS DOUBLE) / 1.8e1)
           END AS z
    FROM out
    """,
)
def mann_kendall_user_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per user over the event-value
    series (operators/stats.py mann_kendall) — the nonparametric
    drift monitor. S and the tie-corrected Var·18 are pure int64
    (sign comparisons only touch the raw doubles — no float
    arithmetic); z is one division by one sqrt. The O(n²) pair
    enumeration is a self-join EQUI-KEYED on user_id — per-user series
    are bounded (~70 events), so the quadratic sits inside a key,
    never across the corpus."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import mann_kendall

    ev = read_events(spark, sf_dir)
    out = mann_kendall(ev, "user_id", "value", ["ts", "event_id"])
    return out.select(
        F.col("key").alias("user_id"), "n", "s_stat", "var_x18", "z"
    )


@register(
    "key_skew_gini_partkey",
    """
    WITH counts AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS r
      FROM counts
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS total_rows,
             CAST(SUM(r * c) AS BIGINT) AS rank_weighted_sum
      FROM ranked
    )
    SELECT n_keys, total_rows, rank_weighted_sum,
           CASE WHEN total_rows = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 * rank_weighted_sum - (n_keys + 1) * total_rows AS DOUBLE)
                     / CAST(n_keys * total_rows AS DOUBLE)
           END AS gini
    FROM s
    """,
)
def key_skew_gini_partkey_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of the l_partkey row distribution
    (operators/stats.py gini_concentration) — the one-number skew
    diagnostic a shuffle planner reads before picking salting/AQE
    strategies for a join on this key. One histogram aggregation over
    the fact table; the global rank-sort runs over the 2000-row
    HISTOGRAM. Exact int64 sums, one double division."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        gini_concentration,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return gini_concentration(li, "l_partkey")


@register(
    "cramers_v_priority_status",
    """
    WITH cells AS MATERIALIZED (
      SELECT o_orderpriority AS rv, o_orderstatus AS cv,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT rv, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT cv, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), nn AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT rv) AS BIGINT) AS n_rowcats,
             CAST(COUNT(DISTINCT cv) AS BIGINT) AS n_colcats
      FROM cells
    ), j AS (
      SELECT COALESCE(obs, 0) AS obs, n, n_rowcats, n_colcats,
             (rtot * ctot) // n AS eq,
             greatest((rtot * ctot) // n, 1) AS d
      FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.rv = rt.rv AND cells.cv = ct.cv
        CROSS JOIN nn
    ), kk AS (
      SELECT n, n_rowcats, n_colcats,
             CAST(SUM(((obs - eq) * (obs - eq) // d) * 1000
                      + ((obs - eq) * (obs - eq) % d) * 1000 // d)
                  AS BIGINT) AS chi2_xscale
      FROM j GROUP BY 1, 2, 3
    )
    SELECT n, n_rowcats, n_colcats, chi2_xscale,
           CASE WHEN least(n_rowcats - 1, n_colcats - 1) <= 0 THEN CAST(0 AS DOUBLE)
                ELSE sqrt(CAST(chi2_xscale AS DOUBLE)
                          / CAST(1000 * n * least(n_rowcats - 1, n_colcats - 1) AS DOUBLE))
           END AS cramers_v
    FROM kk
    """,
)
def cramers_v_priority_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for order priority × status
    (operators/stats.py cramers_v_quantized) — the global effect-size
    companion to contingency_chi2_cells, made hash-gate exact by
    integer-quantizing each cell's chi² contribution (floor divisions
    only, two-step long division for overflow headroom) so the SUM is
    an integer; √ and one division are the only float ops."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramers_v_quantized,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cramers_v_quantized(o, "o_orderpriority", "o_orderstatus", scale=1000)


# =====================================================================
# Round 5, wave 13: AMS F2 sketch, sorted-neighborhood blocking,
# integer geohash cells (operators/sketch.py, entity.py, spatial.py)
# =====================================================================

@register(
    "ams_f2_tokens",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), h0t AS (
      SELECT c,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'),
                               ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, ch) -> (acc * 131 + ch) % 2147483647) AS h0
      FROM counts
    ), h2 AS (
      SELECT c, xor(s1, s1 >> 16) AS h32 FROM (
        SELECT c, (xor(h0, h0 >> 16) * 73244475) % 4294967296 AS s1 FROM h0t
      )
    ), t0s AS (
      SELECT c, j, (h32 + j * 40503) % 4294967296 AS t0
      FROM h2 CROSS JOIN (SELECT unnest(range(16)) AS j)
    ), sg AS (
      SELECT c, j, 1 - 2 * (xor(t1, t1 >> 16) % 2) AS s FROM (
        SELECT c, j, (xor(t0, t0 >> 16) * 73244475) % 4294967296 AS t1 FROM t0s
      )
    ), sk AS (
      SELECT j, CAST(SUM(c * s) AS BIGINT) AS sv FROM sg GROUP BY 1
    ), gs AS (
      SELECT j // 4 AS g, CAST(SUM(sv * sv) AS BIGINT) AS gsum FROM sk GROUP BY 1
    ), med AS (
      SELECT gsum AS f2_est_x4 FROM (
        SELECT gsum, row_number() OVER (ORDER BY gsum, g) AS rn FROM gs
      ) WHERE rn = 2
    ), ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(c * c) AS BIGINT) AS exact_f2
      FROM counts
    )
    SELECT n_terms, exact_f2, f2_est_x4,
           CAST(f2_est_x4 AS DOUBLE) / (4.0e0 * CAST(exact_f2 AS DOUBLE))
             AS est_over_exact
    FROM ex CROSS JOIN med
    """,
)
def ams_f2_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch (operators/sketch.py ams_f2,
    Alon-Matias-Szegedy STOC'96) over the corpus token stream, next to
    the exact second moment — the constant-state answer to "how big
    is the self-join on this key". 16 deterministic sign-hash
    estimators, 4 median-of-means groups, lower-median rank pick ×4
    so nothing ever divides until the final calibration ratio; the
    whole sketch is int64 and bit-portable."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import ams_f2

    docs = read_documents(spark, sf_dir)
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    return ams_f2(tok, "term")


@register(
    "sorted_neighborhood_matches",
    """
    WITH clean AS (
      SELECT c_custkey AS r_id, c_nationkey AS block, c_name AS name
      FROM customer
    ), dirty AS (
      SELECT c_custkey + 1000000 AS r_id, c_nationkey AS block,
             substring(c_name, 1, 9 + c_custkey % 9)
               || substring(c_name, 11 + c_custkey % 9) AS name
      FROM customer
    ), rec AS (
      SELECT * FROM clean UNION ALL SELECT * FROM dirty
    ), ranked AS MATERIALIZED (
      SELECT block, r_id, name,
             row_number() OVER (PARTITION BY block ORDER BY name, r_id) AS rn
      FROM rec
    )
    SELECT a.block, a.r_id AS id_a, b.r_id AS id_b,
           CAST(b.rn - a.rn AS INT) AS rank_gap,
           CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist
    FROM ranked a JOIN ranked b
      ON a.block = b.block AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def sorted_neighborhood_matches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (operators/entity.py
    sorted_neighborhood_candidates, Hernández-Stolfo SIGMOD'95):
    clean + key-perturbed customer records, sorted by name WITHIN the
    nation block, width-3 window candidates via 3 explode-built
    equi-joins on (block, rank+k) — O(n·w) candidates, never a range
    self-join — verified with levenshtein ≤ 2 (JVM codegen on both
    engines). The complementary blocking strategy to the FastSS
    deletion variants (entity_match_ed1) and FS blocking
    (record_linkage_fs)."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        sorted_neighborhood_candidates,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    p = F.col("c_custkey") % 9
    clean = cust.select(
        F.col("c_custkey").alias("r_id"),
        F.col("c_nationkey").alias("block"),
        F.col("c_name").alias("name"),
    )
    dirty = cust.select(
        (F.col("c_custkey") + 1000000).alias("r_id"),
        F.col("c_nationkey").alias("block"),
        F.concat(
            F.substring(F.col("c_name"), F.lit(1), F.lit(9) + p),
            F.substr(F.col("c_name"), F.lit(11) + p),
        ).alias("name"),
    )
    rec = clean.unionAll(dirty)
    return sorted_neighborhood_candidates(
        rec, "r_id", ["name"], "block", window=3, verify_col="name", max_edit=2
    ).select("block", "id_a", "id_b", "rank_gap", "edit_dist")


def _geohash_oracle_sql(precision: int = 5) -> str:
    """DuckDB twin of operators/spatial.py geohash_encode_micro: the
    same integer cell math and MSB-first lon-lat bit interleave,
    unrolled to explicit shift/mask terms."""
    total_bits = 5 * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    terms = []
    for i in range(lon_bits):
        terms.append(f"((cx >> {lon_bits - 1 - i}) % 2) * {1 << (total_bits - 1 - 2 * i)}")
    for i in range(lat_bits):
        terms.append(f"((cy >> {lat_bits - 1 - i}) % 2) * {1 << (total_bits - 2 - 2 * i)}")
    interleave = "\n               + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz',"
        f" CAST((code >> {total_bits - 5 * (d + 1)}) % 32 AS INT) + 1, 1)"
        for d in range(precision)
    )
    mix_lat = _walk_mix_sql("c_custkey", "7", 0)
    mix_lon = _walk_mix_sql("c_custkey", "11", 0)
    return f"""
    WITH coords AS (
      SELECT c_custkey,
             CAST(({mix_lat}) % 180000000 - 90000000 AS BIGINT) AS lat_micro,
             CAST(({mix_lon}) % 360000000 - 180000000 AS BIGINT) AS lon_micro
      FROM customer
    ), cells AS (
      SELECT c_custkey, lat_micro, lon_micro,
             LEAST(((lon_micro + 180000000) * {1 << lon_bits}) // 360000000,
                   {(1 << lon_bits) - 1}) AS cx,
             LEAST(((lat_micro + 90000000) * {1 << lat_bits}) // 180000000,
                   {(1 << lat_bits) - 1}) AS cy
      FROM coords
    ), code AS (
      SELECT c_custkey,
             ({interleave}) AS code
      FROM cells
    ), gh AS (
      SELECT c_custkey, {chars} AS geohash5
      FROM code
    )
    SELECT substr(geohash5, 1, 2) AS geohash2,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT geohash5) AS BIGINT) AS n_cells5,
           min(geohash5) AS min_h5, max(geohash5) AS max_h5
    FROM gh GROUP BY 1
    """


@register("geohash_cells_customers", _geohash_oracle_sql(5))
def geohash_cells_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash spatial binning (operators/spatial.py
    geohash_encode_micro): key-derived integer-microdegree customer
    coordinates (the tables carry no geo columns — same synthesis
    convention as spatial_radius_join, dispersed by the portable
    mix32) encoded to geohash-5 cells in PURE integer arithmetic
    (floor-div cells + unrolled bit interleave + base-32 chars), then
    rolled up to geohash-2 regions with per-region cell stats. The
    encode is a row-local codegen expression — zero shuffle before
    the final cell aggregation — and the integer cell math cannot
    round across a cell boundary (the numeric_range_lookup lesson
    applied to geospatial bucketing)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        geohash_encode_micro,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    coords = cust.select(
        "c_custkey",
        (
            _portable_mix32(F.col("c_custkey"), F.lit(7), F.lit(0))
            % F.lit(180_000_000)
            - F.lit(90_000_000)
        ).alias("lat_micro"),
        (
            _portable_mix32(F.col("c_custkey"), F.lit(11), F.lit(0))
            % F.lit(360_000_000)
            - F.lit(180_000_000)
        ).alias("lon_micro"),
    )
    gh = coords.select(
        geohash_encode_micro(F.col("lat_micro"), F.col("lon_micro"), 5).alias(
            "geohash5"
        )
    )
    return gh.groupBy(F.substring("geohash5", 1, 2).alias("geohash2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.countDistinct("geohash5").cast("bigint").alias("n_cells5"),
        F.min("geohash5").alias("min_h5"),
        F.max("geohash5").alias("max_h5"),
    )


# =====================================================================
# Round 5, wave 14: classic-ML primitives in exact arithmetic —
# portable k-means Lloyd twin, histogram decision stump
# (operators/ml.py)
# =====================================================================

@register(
    "kmeans_lloyd_portable",
    """
    WITH vecs AS MATERIALIZED (
      SELECT vec_id AS vid,
             CAST(unnest(range(0, len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) + 1024
                  AS BIGINT) AS x
      FROM embeddings
    ), seeds AS (
      SELECT vid FROM (
        SELECT vid, row_number() OVER (ORDER BY vid) AS rn
        FROM (SELECT DISTINCT vid FROM vecs)
      ) WHERE rn <= 8
    ), c0 AS MATERIALIZED (
      SELECT v.vid AS cluster, v.d, v.x AS cd
      FROM vecs v JOIN seeds s ON s.vid = v.vid
    ), a1 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c0 c ON v.d = c.d
      GROUP BY 1, 2
    ), b1 AS MATERIALIZED (
      SELECT vid, cluster FROM (
        SELECT vid, cluster,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a1
      ) WHERE rn = 1
    ), c1 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b1 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), a2 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c1 c ON v.d = c.d
      GROUP BY 1, 2
    ), b2 AS MATERIALIZED (
      SELECT vid, cluster, dist FROM (
        SELECT vid, cluster, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a2
      ) WHERE rn = 1
    ), c2 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b2 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), stats AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(dist) AS BIGINT) AS inertia
      FROM b2 GROUP BY 1
    ), csum AS (
      SELECT cluster, CAST(SUM(cd) AS BIGINT) AS centroid_sum
      FROM c2 GROUP BY 1
    )
    SELECT cluster, n_members, inertia, centroid_sum
    FROM stats JOIN csum USING (cluster)
    """,
)
def kmeans_lloyd_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd k-means rounds (operators/ml.py
    kmeans_lloyd_portable, k=8) over integer-scaled embeddings — the
    oracle-checkable twin of the float IVF trainer
    (similarity/ivf.py train_ivf_centroids): floor(x·2^10)+offset
    coordinates, int64 distances, min-struct argmin with id
    tie-break, non-negative integer-division centroid means — every
    round a pure function of the last, so the unrolled SQL replays
    bit-identically (the PageRank portability recipe for
    clustering)."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        kmeans_lloyd_portable,
    )

    emb = read_embeddings(spark, sf_dir)
    return kmeans_lloyd_portable(emb, k=8, iterations=2)


@register(
    "decision_stump_totalprice",
    """
    WITH b AS (
      SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
             CAST(max(o_totalprice) AS DOUBLE) AS hi
      FROM orders
    ), lab AS (
      SELECT o_totalprice AS val,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(greatest(CAST(floor((CAST(val AS DOUBLE) - lo)
                                           / ((hi - lo) / 256)) AS BIGINT),
                             0), 255) END AS bucket,
             lo, hi,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM lab CROSS JOIN b GROUP BY 1, 2, 3
    ), cum AS (
      SELECT bucket, lo, hi,
             CAST(SUM(pos) OVER w AS BIGINT) AS pl,
             CAST(SUM(neg) OVER w AS BIGINT) AS nl
      FROM bins
      WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS tp, CAST(SUM(neg) AS BIGINT) AS tn
      FROM bins
    ), cand AS (
      SELECT bucket, lo, hi, pl, nl, tp - pl AS pr, tn - nl AS nr
      FROM cum CROSS JOIN tot
    ), scored AS (
      SELECT bucket, lo, hi, pl, nl, pr, nr,
             CAST(pl * nl AS DOUBLE) / CAST(pl + nl AS DOUBLE)
             + CAST(pr * nr AS DOUBLE) / CAST(pr + nr AS DOUBLE) AS gini_score
      FROM cand WHERE pl + nl > 0 AND pr + nr > 0
    )
    SELECT bucket AS split_bucket,
           lo + CAST(bucket + 1 AS DOUBLE) * ((hi - lo) / 256) AS split_value,
           pl AS pos_left, nl AS neg_left, pr AS pos_right, nr AS neg_right,
           gini_score
    FROM (
      SELECT *, row_number() OVER (ORDER BY gini_score, bucket) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def decision_stump_totalprice_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best Gini split of o_totalprice against the urgent-order
    label (operators/ml.py decision_stump_binned) — the histogram-
    split inner loop of boosted-tree training (the LightGBM binning
    trick is precisely what makes split search scale: cumulative
    class counts over a 256-bin table, never a sort of the raw
    rows). Counts are int64; each candidate's score is a fixed
    two-term sum of single divisions — deterministic, so even the
    argmin rank pick replays exactly."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        decision_stump_binned,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return decision_stump_binned(
        o,
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        n_bins=256,
    )


# =====================================================================
# Round 5, wave 15: robust trend, burstiness, trigram transitions,
# URL hierarchy rollup, categorical drift
# =====================================================================

@register(
    "theil_sen_spend_trend",
    """
    WITH base AS MATERIALIZED (
      SELECT o_custkey AS k,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
             CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS y
      FROM orders
    ), pairs AS (
      SELECT a.k, a.x AS xa, b.x AS xb,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM base a JOIN base b ON a.k = b.k
       AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      WHERE a.x <> b.x
    ), ranked AS (
      SELECT k, slope,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_pairs,
             row_number() OVER (PARTITION BY k ORDER BY slope, xa, xb) AS rn
      FROM pairs
    ), med AS (
      SELECT k, n_pairs, slope AS theil_slope
      FROM ranked WHERE rn = (n_pairs + 1) // 2
    ), npts AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_points FROM base GROUP BY 1
    )
    SELECT npts.k AS c_custkey, n_points, n_pairs, theil_slope
    FROM npts JOIN med ON med.k = npts.k
    WHERE n_points >= 3
    """,
)
def theil_sen_spend_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust spend trend per customer (operators/stats.py
    theil_sen_slope): median pairwise slope of order cents over order
    day — outlier-proof where the per-group OLS
    (group_linregress_qty_disc) is not. Slopes are single divisions
    of int64 deltas; the median is a lower-median RANK PICK (order
    statistics, never interpolation — the engine-parity rule); the
    O(n²) pair join is equi-keyed on the customer (bounded ~10-order
    series)."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        theil_sen_slope,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "x"
        ),
        scaled_long("o_totalprice", 2).alias("y"),
    )
    return theil_sen_slope(o, "o_custkey", "x", "y", min_points=3).select(
        F.col("key").alias("c_custkey"), "n_points", "n_pairs", "theil_slope"
    )


@register(
    "fano_event_bursts",
    """
    WITH counts AS (
      SELECT event_type AS key, date_trunc('day', ts) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS sum_sq
      FROM counts GROUP BY 1
    )
    SELECT key, n_buckets, total, sum_sq,
           CASE WHEN n_buckets < 2 OR total = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_buckets * sum_sq - total * total AS DOUBLE)
                     / CAST((n_buckets - 1) * total AS DOUBLE)
           END AS fano
    FROM sums
    """,
)
def fano_event_bursts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of daily counts) per event type
    (operators/stats.py fano_factor) — the burstiness index: ≈1
    Poisson-like, >1 bursty. The variance/mean collapses to
    (n·Σx²−S²)/((n−1)·S) — int64 numerator and denominator, ONE
    double division, no float sums."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import fano_factor

    ev = read_events(spark, sf_dir)
    return fano_factor(ev, "event_type", F.date_trunc("day", F.col("ts")))


@register(
    "event_trigram_probs",
    """
    WITH ordered AS (
      SELECT event_type,
             lag(event_type, 2) OVER w AS t0,
             lag(event_type, 1) OVER w AS t1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tri AS MATERIALIZED (
      SELECT t0, t1, event_type AS t2, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE t0 IS NOT NULL AND t1 IS NOT NULL
      GROUP BY 1, 2, 3
    ), ctx AS (
      SELECT t0, t1, CAST(SUM(n) AS BIGINT) AS context_n FROM tri GROUP BY 1, 2
    )
    SELECT tri.t0, tri.t1, tri.t2, n, context_n,
           CAST(n AS DOUBLE) / CAST(context_n AS DOUBLE) AS prob
    FROM tri JOIN ctx USING (t0, t1)
    """,
)
def event_trigram_probs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov model of user event sequences
    (operators/temporal.py event_trigrams): P(next | last two) — the
    trigram upgrade of event_transition_matrix. One window pass (two
    lags share the shuffle), one trigram aggregation; context totals
    broadcast from the tiny trigram table; prob divides two exact
    BIGINTs."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        event_trigrams,
    )

    return event_trigrams(read_events(spark, sf_dir))


@register(
    "url_path_rollup_docs",
    """
    WITH raw AS (
      SELECT doc_id, source || '.example.com' AS host,
             CASE WHEN doc_id % 4 = 0
                  THEN '/cat' || (doc_id % 5) || '/sub' || (doc_id % 3)
                  ELSE '/cat' || (doc_id % 5) || '/sub' || (doc_id % 3)
                       || '/p' || (doc_id % 7) END AS path
      FROM documents
    ), segs AS (
      SELECT host, list_filter(string_split(path, '/'), s -> s <> '') AS segs
      FROM raw
    ), pref AS (
      SELECT host, d AS depth,
             '/' || array_to_string(segs[1:d], '/') || '/' AS path_prefix,
             CASE WHEN d = len(segs) THEN 1 ELSE 0 END AS is_leaf
      FROM segs, (SELECT unnest(range(1, 20)) AS d) ds
      WHERE d <= len(segs)
    )
    SELECT host, path_prefix, CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(is_leaf) AS BIGINT) AS n_leaf_pages
    FROM pref GROUP BY 1, 2, 3
    """,
)
def url_path_rollup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical URL path rollup (text/urls.py url_path_rollup):
    every page aggregated into each ancestor directory — the crawl
    site-structure audit. Pure codegen prefix explode (fan-out =
    path depth, never a join), one (host, prefix) aggregation. URLs
    are key-derived with mixed 2- and 3-segment paths so leaf/dir
    accounting is exercised."""
    from dpe_energy_performance_analysis_etl_spark.text.urls import url_path_rollup

    docs = read_documents(spark, sf_dir)
    path = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit("/cat"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/sub"), (F.col("doc_id") % 3).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("/cat"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/sub"), (F.col("doc_id") % 3).cast("string"),
            F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
        )
    )
    urls = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"), path).alias(
            "url"
        )
    )
    return url_path_rollup(urls, "url")


@register(
    "category_drift_halves",
    """
    WITH cells AS MATERIALIZED (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-06-17 00:00:00'
                  THEN 'H1' ELSE 'H2' END AS rv,
             o_orderpriority AS cv,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT rv, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT cv, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), nn AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT rv) AS BIGINT) AS n_rowcats,
             CAST(COUNT(DISTINCT cv) AS BIGINT) AS n_colcats
      FROM cells
    ), j AS (
      SELECT COALESCE(obs, 0) AS obs, n, n_rowcats, n_colcats,
             (rtot * ctot) // n AS eq,
             greatest((rtot * ctot) // n, 1) AS d
      FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.rv = rt.rv AND cells.cv = ct.cv
        CROSS JOIN nn
    ), kk AS (
      SELECT n, n_rowcats, n_colcats,
             CAST(SUM(((obs - eq) * (obs - eq) // d) * 1000
                      + ((obs - eq) * (obs - eq) % d) * 1000 // d)
                  AS BIGINT) AS chi2_xscale
      FROM j GROUP BY 1, 2, 3
    )
    SELECT n, n_rowcats, n_colcats, chi2_xscale,
           CASE WHEN least(n_rowcats - 1, n_colcats - 1) <= 0 THEN CAST(0 AS DOUBLE)
                ELSE sqrt(CAST(chi2_xscale AS DOUBLE)
                          / CAST(1000 * n * least(n_rowcats - 1, n_colcats - 1) AS DOUBLE))
           END AS cramers_v
    FROM kk
    """,
)
def category_drift_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical distribution drift between the first and second
    half of the order history — the production data-drift check,
    computed as the quantized Cramér's V of (period × priority)
    (operators/stats.py cramers_v_quantized composed over a derived
    period label). V ≈ 0 means the priority mix is time-stable;
    exact-integer chi² keeps the drift score hash-portable."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramers_v_quantized,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.when(
            F.col("o_orderdate")
            < F.lit("1995-06-17 00:00:00").cast("timestamp"),
            F.lit("H1"),
        )
        .otherwise(F.lit("H2"))
        .alias("period"),
        "o_orderpriority",
    )
    return cramers_v_quantized(o, "period", "o_orderpriority", scale=1000)


# =====================================================================
# Round 5, wave 16: bigram LM scoring (Stupid Backoff) + vocabulary
# coverage curve (text/retrieval.py)
# =====================================================================

@register(
    "stupid_backoff_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), trbg AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.doc_id % 10 <> 0
      GROUP BY 1, 2
    ), c1t AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE doc_id % 10 <> 0 GROUP BY 1
    ), nt AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_train FROM c1t
    ), tebg AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.doc_id % 10 = 0
    ), j AS (
      SELECT t.doc_id,
             CASE WHEN c12 IS NOT NULL THEN (c12 * 1000000) // u1.c
                  WHEN u2.c IS NOT NULL THEN (2 * u2.c * 1000000) // (5 * n_train)
                  ELSE 0 END AS sq,
             CASE WHEN c12 IS NULL AND u2.c IS NOT NULL THEN 1 ELSE 0 END AS bo,
             CASE WHEN u2.c IS NULL THEN 1 ELSE 0 END AS oov
      FROM tebg t
      LEFT JOIN trbg ON trbg.w1 = t.w1 AND trbg.w2 = t.w2
      LEFT JOIN c1t u1 ON u1.w = t.w1
      LEFT JOIN c1t u2 ON u2.w = t.w2
      CROSS JOIN nt
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(bo) AS BIGINT) AS n_backoff,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(sq) AS BIGINT) AS score_q_sum,
           CAST(SUM(sq) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000)
             AS mean_score
    FROM j GROUP BY 1
    """,
)
def stupid_backoff_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out document fluency under a Stupid Backoff bigram LM
    (text/retrieval.py stupid_backoff_scores, Brants EMNLP'07) —
    train on 90% of the corpus, score every 10th document: the
    pretraining quality gate in its web-scale (unnormalized,
    log-free) form. Scores are integer-quantized ((c₁₂·10⁶) div c₁ /
    (2·c₂·10⁶) div (5N)) so per-doc sums are exact int64 — the
    unigram_lm_scores recipe extended to a backoff chain. Test
    bigrams join the train bigram table equi-keyed on (w1,w2); the
    unigram vocab broadcasts."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        stupid_backoff_scores,
    )

    docs = read_documents(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    return stupid_backoff_scores(train, test)


@register(
    "vocab_coverage_curve",
    """
    WITH trv AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents WHERE doc_id % 10 <> 0
      ) GROUP BY 1
    ), ranked AS (
      SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
      FROM trv
    ), tev AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS tc FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents WHERE doc_id % 10 = 0
      ) GROUP BY 1
    ), j AS MATERIALIZED (
      SELECT tc, r FROM tev LEFT JOIN ranked USING (w)
    ), per_k AS (
      SELECT k, tc, r
      FROM j CROSS JOIN (SELECT unnest([100, 1000, 10000]) AS k)
    )
    SELECT CAST(k AS INT) AS k,
           CAST(SUM(tc) AS BIGINT) AS n_test_tokens,
           CAST(SUM(CASE WHEN r IS NOT NULL AND r <= k THEN tc ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN r IS NOT NULL AND r <= k THEN tc ELSE 0 END)
                AS DOUBLE) / CAST(SUM(tc) AS DOUBLE) AS coverage
    FROM per_k GROUP BY 1
    """,
)
def vocab_coverage_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out token coverage of the top-k training vocabulary at
    k ∈ {100, 1000, 10000} (text/retrieval.py vocab_coverage_curve) —
    the curve that sizes a tokenizer vocab. Rank window runs over the
    train VOCAB (never the corpus); the test side joins vocab-sized
    tables; one exact division per k."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        vocab_coverage_curve,
    )

    docs = read_documents(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    return vocab_coverage_curve(train, test, ks=[100, 1000, 10000])


# =====================================================================
# Round 6, wave 1: inter-rater agreement, Kneser-Ney smoothing,
# UniMax language budgets (operators/stats.py, text/retrieval.py,
# text/mixing.py)
# =====================================================================

@register(
    "cohens_kappa_raters",
    """
    WITH lab AS (
      SELECT CASE WHEN length(text) >= 250 THEN 'keep' ELSE 'drop' END AS la,
             CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 45
                  THEN 'keep' ELSE 'drop' END AS lb
      FROM documents
    ), cells AS MATERIALIZED (
      SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS obs FROM lab GROUP BY 1, 2
    ), rt AS (
      SELECT la, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1
    ), ct AS (
      SELECT lb, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1
    ), s AS (
      SELECT CAST(COALESCE(SUM(rtot * ctot), 0) AS BIGINT) AS s
      FROM rt JOIN ct ON rt.la = ct.lb
    ), b AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CASE WHEN la = lb THEN obs END), 0) AS BIGINT)
               AS n_agree
      FROM cells
    )
    SELECT n, n_agree, s AS pe_num,
           CASE WHEN n * n = s THEN CAST(0 AS DOUBLE)
                ELSE CAST(n_agree * n - s AS DOUBLE) / CAST(n * n - s AS DOUBLE)
           END AS kappa
    FROM b CROSS JOIN s
    """,
)
def cohens_kappa_raters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic curation raters — a
    char-length gate vs a token-count gate — over the documents
    corpus (operators/stats.py cohens_kappa_exact): the
    beyond-chance-agreement check a pipeline runs before trusting
    two quality heuristics' intersection. κ = (A·n − S)/(n² − S) is
    one double division of exact int64s — no quantization needed."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cohens_kappa_exact,
    )

    docs = read_documents(spark, sf_dir)
    a = F.when(F.length("text") >= 250, "keep").otherwise("drop")
    b = F.when(
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")) >= 45,
        "keep",
    ).otherwise("drop")
    return cohens_kappa_exact(docs, a, b)


@register(
    "kneser_ney_bigrams",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), c12 AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ), c1 AS MATERIALIZED (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1p_fwd
      FROM c12 GROUP BY 1
    ), nb AS MATERIALIZED (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM c12 GROUP BY 1
    ), tt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM c12
    )
    SELECT c12.w1, c12.w2, c12.c12, c1.c1, c1.n1p_fwd, nb.n1p_bwd,
           CAST(((greatest(4 * c12.c12 - 3, 0) * t_types
                  + 3 * c1.n1p_fwd * nb.n1p_bwd) * 1000000)
                // (4 * c1.c1 * t_types) AS BIGINT) AS p_kn_scaled
    FROM c12
    JOIN c1 ON c1.w1 = c12.w1
    JOIN nb ON nb.w2 = c12.w2
    CROSS JOIN tt
    WHERE c12.c12 >= 3
    """,
)
def kneser_ney_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities, discount 3/4
    (text/retrieval.py kneser_ney_bigram_probs) — the
    Chen-Goodman/KenLM-default smoothing next to the registry's
    Stupid Backoff. The dyadic discount clears every fraction when
    multiplied through by 4·c1·T, so p·10⁶ is one exact integer
    floor division — bit-identical in SQL."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        kneser_ney_bigram_probs,
    )

    return kneser_ney_bigram_probs(read_documents(spark, sf_dir), min_count=3)


@register(
    "unimax_lang_budget",
    """
    WITH sizes AS MATERIALIZED (
      SELECT lang AS grp, CAST(SUM(n_chars) AS BIGINT) AS available
      FROM documents GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT grp, available, CAST(available * 4 AS BIGINT) AS cap,
             CAST(row_number() OVER (ORDER BY available * 4, grp) AS BIGINT) AS i,
             CAST(COALESCE(SUM(available * 4) OVER (
               ORDER BY available * 4, grp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev,
             CAST(COUNT(*) OVER () AS BIGINT) AS g_total
      FROM sizes
    ), marked AS MATERIALIZED (
      SELECT *,
             cap * (g_total - i + 1) <= 500000 - cum_prev AS is_capped
      FROM ranked
    ), scal AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN is_capped THEN cap END), 0) AS BIGINT)
               AS capped_sum,
             CAST(COUNT(*) FILTER (WHERE NOT is_capped) AS BIGINT) AS n_uncapped
      FROM marked
    )
    SELECT grp AS lang, available, cap,
           CAST(CASE WHEN is_capped THEN cap
                ELSE least(cap, (500000 - capped_sum)
                           // greatest(n_uncapped, 1)) END AS BIGINT) AS allocated,
           CAST(CASE WHEN is_capped THEN cap
                ELSE least(cap, (500000 - capped_sum)
                           // greatest(n_uncapped, 1)) END AS DOUBLE)
             / CAST(greatest(available, 1) AS DOUBLE) AS epochs
    FROM marked CROSS JOIN scal
    """,
)
def unimax_lang_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax character-budget allocation across the corpus languages
    (text/mixing.py unimax_budget_allocation; Chung ICLR'23): cap
    every language at 4 epochs of its available chars, waterfill the
    500k-char budget as uniformly as possible among the rest — the
    closed-form capped-prefix rule over the bounded language table,
    all int64 floor divisions."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import (
        unimax_budget_allocation,
    )

    docs = read_documents(spark, sf_dir)
    return unimax_budget_allocation(
        docs, "lang", "n_chars", budget=500_000, max_epochs=4
    )


def _power_iter_oracle(iterations: int) -> str:
    """DuckDB twin of operators/ml.py principal_direction_power:
    exact integer Gram (n·Σxx − S·S'), deterministic dynamic rescale
    (// 2^36 + 1), and unrolled matvec+renorm rounds. DuckDB BIGINT
    `//` truncates toward zero like Spark `div` (measured −3//2 = −1
    on the in-env build), so the negative Gram entries divide
    identically."""
    blocks = [
        """
    WITH vecs AS MATERIALIZED (
      SELECT vec_id AS vid,
             CAST(unnest(range(0, len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS x
      FROM embeddings
    ), sums AS MATERIALIZED (
      SELECT d, CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM vecs GROUP BY 1
    ), sxx AS MATERIALIZED (
      SELECT a.d AS i, b.d AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxx
      FROM vecs a JOIN vecs b ON a.vid = b.vid GROUP BY 1, 2
    ), gram AS MATERIALIZED (
      SELECT i, j, si.n * sxx.sxx - si.s * sj.s AS g
      FROM sxx JOIN sums si ON si.d = sxx.i JOIN sums sj ON sj.d = sxx.j
    ), gq AS MATERIALIZED (
      SELECT i, j,
             g // ((SELECT MAX(abs(g)) FROM gram) // 68719476736 + 1) AS g
      FROM gram
    ), v0 AS MATERIALIZED (
      SELECT d AS dim, CAST(1048576 AS BIGINT) AS v FROM sums
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", w{r} AS MATERIALIZED (
      SELECT gq.i AS dim, CAST(SUM(gq.g * v{r - 1}.v) AS BIGINT) AS w
      FROM gq JOIN v{r - 1} ON v{r - 1}.dim = gq.j GROUP BY 1
    ), v{r} AS MATERIALIZED (
      SELECT dim,
             CAST(w // ((SELECT MAX(abs(w)) FROM w{r}) // 1048576 + 1)
                  AS BIGINT) AS v
      FROM w{r}
    )"""
        )
    blocks.append(
        f"""
    SELECT dim, v AS component_scaled FROM v{iterations}
    """
    )
    return "".join(blocks)


@register("principal_direction_power", _power_iter_oracle(3))
def principal_direction_power_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 3 rounds of
    bit-portable power iteration (operators/ml.py
    principal_direction_power) — exact integer scatter covariance
    from a row-local d² explode, deterministic dynamic rescales, the
    HITS renorm recipe adapted to signed values (divide-FIRST renorm
    to dodge the w·S overflow). 64 scalar rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        principal_direction_power,
    )

    emb = read_embeddings(spark, sf_dir)
    return principal_direction_power(emb, iterations=3)


@register("gif_compression_stats")
def gif_compression_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF/LZW compressibility as a per-document redundancy feature
    (multimodal/gif.py — pure-numpy GIF87a codec, the fifth real
    container after PNG/BMP/PPM/JPEG): documents render to
    deterministic 24×24 16-color images (text bytes mod the palette),
    encode through the variable-width LZW pipeline, decode back, and
    report compressed size + bit-exact roundtrip per doc — LZW ratio
    is the classic cheap proxy for repeated-content detection
    (the compression_ratio zlib feature's sibling, exercising
    dictionary coding instead of deflate). Rows-only by design (LZW
    decode is not SQL); the codec itself is pinned by a hand-derived
    spec byte anchor and width-change/KwKwK/table-reset roundtrips
    (tests/test_gif.py)."""
    import numpy as np
    import pandas as pd

    docs = read_documents(spark, sf_dir)

    def work(batches):
        from dpe_energy_performance_analysis_etl_spark.multimodal.gif import (
            decode_gif,
            encode_gif,
        )

        pal = (np.arange(16, dtype=np.uint8)[:, None] * np.array([17, 13, 7])).astype(
            np.uint8
        )
        for pdf in batches:
            rows = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                raw = t.encode()[: 24 * 24]
                buf = np.zeros(24 * 24, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                px = pal[(buf % 16).reshape(24, 24)]
                payload = encode_gif(px)
                ok = bool((decode_gif(payload) == px).all())
                rows.append(
                    (
                        int(did),
                        len(payload),
                        24 * 24 * 3,
                        int(np.unique(buf % 16).size),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "gif_bytes", "raw_bytes", "n_colors", "roundtrip_ok"],
            )

    out = docs.select("doc_id", "text").mapInPandas(
        work,
        schema=(
            "doc_id long, gif_bytes long, raw_bytes long,"
            " n_colors long, roundtrip_ok boolean"
        ),
    )
    return out.select(
        "doc_id",
        "gif_bytes",
        "n_colors",
        "roundtrip_ok",
        (F.col("gif_bytes").cast("double") / F.col("raw_bytes").cast("double")).alias(
            "lzw_ratio"
        ),
    )


@register(
    "iblt_set_reconcile",
    """
    WITH l AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0
    ), r AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT o_orderkey, 'left_only' AS side
    FROM l WHERE o_orderkey NOT IN (SELECT o_orderkey FROM r)
    UNION ALL
    SELECT o_orderkey, 'right_only' AS side
    FROM r WHERE o_orderkey NOT IN (SELECT o_orderkey FROM l)
    """,
)
def iblt_set_reconcile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set reconciliation via Invertible Bloom Lookup Table
    (operators/diff.py iblt_set_diff; Eppstein SIGCOMM'11): two order
    snapshots (keys mod-7 / mod-11 filtered) compress to mergeable
    (sum, bit_xor, bit_xor) cells each; subtracting cancels the ~75%
    common keys and peeling recovers EXACTLY the differing keys —
    work bounded by the diff, not the tables. The cell count is
    SIZED FROM THE DATA (next pow2 ≥ count/2 ≈ 2.4× the ~0.21·n
    expected diff — a bounded count pull): the first fixed-8192
    version silently decoded 1 then 0 rows at sf1/sf5 because
    peeling collapses once cells < ~2·|diff| (the sweep caught it).
    In a real deployment the sketch size is negotiated from the
    expected churn, exactly like this. The oracle is the semantic
    ground truth (two anti-joins), so decode must be complete and
    bit-exact."""
    from dpe_energy_performance_analysis_etl_spark.operators.diff import iblt_set_diff

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()  # bounded scalar pull, sizes the sketch
    n_cells = 1 << max((n // 2).bit_length(), 10)
    left = o.filter(F.col("o_orderkey") % 7 != 0)
    right = o.filter(F.col("o_orderkey") % 11 != 0)
    return iblt_set_diff(left, right, "o_orderkey", n_cells=n_cells, k=3)


def _rendezvous_oracle() -> str:
    def mix(salt: int) -> str:
        inner = _walk_mix_sql("o_orderkey", str(salt), 0)
        return _walk_mix_sql(f"({inner})", str(salt), 0)

    w4 = ", ".join(f"({mix(i)}) AS w{i}" for i in range(5))
    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey FROM orders
    ), wts AS MATERIALIZED (
      SELECT o_orderkey, {w4} FROM keys
    ), shards AS MATERIALIZED (
      SELECT o_orderkey,
             (SELECT i FROM (SELECT unnest([0,1,2,3]) AS i,
                                    unnest([w0,w1,w2,w3]) AS w)
              ORDER BY w DESC, i LIMIT 1) AS shard4,
             (SELECT i FROM (SELECT unnest([0,1,2,3,4]) AS i,
                                    unnest([w0,w1,w2,w3,w4]) AS w)
              ORDER BY w DESC, i LIMIT 1) AS shard5
      FROM wts
    )
    SELECT CAST(shard4 AS BIGINT) AS shard4,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN shard4 <> shard5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST(SUM(CASE WHEN shard4 <> shard5 AND shard5 = 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_to_new,
           CAST(SUM(CASE WHEN shard4 <> shard5 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS moved_frac
    FROM shards GROUP BY 1
    """


@register("rendezvous_shard_moves", _rendezvous_oracle())
def rendezvous_shard_moves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard placement and the movement profile when
    the cluster grows 4 → 5 nodes (operators/scaling.py
    rendezvous_assign): per old shard, how many keys stay, how many
    move, and that EVERY move lands on the new node (the HRW
    minimal-movement property — expected 1/5 of keys move, all to
    node 4; `hash % n` would reshuffle ~4/5). Row-local argmax over
    the portable mix — zero shuffle before the bounded aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import (
        rendezvous_assign,
    )

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .distinct()
    )
    s4 = rendezvous_assign(keys, "o_orderkey", 4).withColumnRenamed("shard", "shard4")
    s5 = rendezvous_assign(s4, "o_orderkey", 5).withColumnRenamed("shard", "shard5")
    moved = F.col("shard4") != F.col("shard5")
    return s5.groupBy("shard4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
        F.sum((moved & (F.col("shard5") == 4)).cast("int"))
        .cast("bigint")
        .alias("n_moved_to_new"),
        (
            F.sum(moved.cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("moved_frac"),
    )


# =====================================================================
# Round 6, wave 3: k-truss decomposition, GSP sequential patterns
# =====================================================================

def _ktruss_oracle(iterations: int, k: int) -> str:
    blocks = [
        """
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e0 AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    )"""
    ]
    for r in range(1, iterations + 1):
        blocks.append(
            f""", tri{r} AS MATERIALIZED (
      SELECT e1.a AS u, e1.b AS x, e2.b AS y
      FROM e{r - 1} e1 JOIN e{r - 1} e2 ON e1.a = e2.a AND e1.b < e2.b
      WHERE EXISTS (SELECT 1 FROM e{r - 1} e3
                    WHERE e3.a = e1.b AND e3.b = e2.b)
    ), sup{r} AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT u AS a, x AS b FROM tri{r}
        UNION ALL SELECT u, y FROM tri{r}
        UNION ALL SELECT x, y FROM tri{r}
      ) GROUP BY 1, 2
    ), e{r} AS MATERIALIZED (
      SELECT e.a, e.b, COALESCE(s.support, 0) AS support
      FROM e{r - 1} e LEFT JOIN sup{r} s ON s.a = e.a AND s.b = e.b
      WHERE COALESCE(s.support, 0) >= {k - 2}
    )"""
        )
    blocks.append(
        f"""
    SELECT a, b, CAST(support AS BIGINT) AS support FROM e{iterations}
    """
    )
    return "".join(blocks)


@register("ktruss_parts_graph", _ktruss_oracle(3, 3))
def ktruss_parts_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the recurring part-copurchase graph
    (operators/graph.py ktruss_edges, 3 fixed peel rounds): edges
    surviving iff ≥1 triangle survives around them — the edge-level
    cohesion core next to kcore_membership's vertex-level one. Per
    round one ordered wedge join + explode-to-3-edges support agg +
    semi-join, eager localCheckpoint (the cascade rule)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import ktruss_edges

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return ktruss_edges(pairs, k=3, iterations=3)


@register(
    "gsp_event_sequences",
    """
    WITH ev0 AS MATERIALIZED (
      SELECT user_id AS k, event_type AS it,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
      FROM events
    ), ev AS MATERIALIZED (
      SELECT k, it, row_number() OVER (PARTITION BY k ORDER BY r) AS r
      FROM ev0 WHERE r <= 5
    ), f1 AS MATERIALIZED (
      SELECT it, CAST(COUNT(*) AS BIGINT) AS support
      FROM (SELECT DISTINCT k, it FROM ev) GROUP BY 1
      HAVING COUNT(*) >= 40
    ), occ AS MATERIALIZED (
      SELECT ev.* FROM ev SEMI JOIN f1 ON ev.it = f1.it
    ), p2 AS MATERIALIZED (
      SELECT DISTINCT x.k, x.it AS i1, y.it AS i2
      FROM occ x JOIN occ y ON x.k = y.k AND x.r < y.r
    ), f2 AS MATERIALIZED (
      SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS support
      FROM p2 GROUP BY 1, 2 HAVING COUNT(*) >= 40
    ), p3 AS MATERIALIZED (
      SELECT DISTINCT x.k, x.it AS i1, y.it AS i2, z.it AS i3
      FROM occ x
      JOIN occ y ON x.k = y.k AND x.r < y.r
      JOIN occ z ON x.k = z.k AND y.r < z.r
      WHERE EXISTS (SELECT 1 FROM f2 WHERE f2.i1 = x.it AND f2.i2 = y.it)
    ), f3 AS (
      SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS support
      FROM p3 GROUP BY 1, 2, 3 HAVING COUNT(*) >= 40
    )
    SELECT it AS pattern, CAST(1 AS BIGINT) AS length, support FROM f1
    UNION ALL
    SELECT i1 || '→' || i2, CAST(2 AS BIGINT), support FROM f2
    UNION ALL
    SELECT i1 || '→' || i2 || '→' || i3, CAST(3 AS BIGINT), support FROM f3
    """,
)
def gsp_event_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type sequences with gaps over each user's FIRST
    5 events (operators/temporal.py gsp_frequent_sequences — GSP,
    Srikant-Agrawal EDBT'96): the sequential-pattern family the
    contiguous trigram queries can't express (⟨signup→…→purchase⟩
    counts however many events intervene). Restricting to the first
    5 events makes supports discriminative on the uniform synthetic
    stream; level-wise Apriori pruning keeps every join equi-keyed
    and frequent-bounded."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        gsp_frequent_sequences,
    )

    ev = read_events(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    first5 = ev.withColumn("__r", rk).where(F.col("__r") <= 5)
    return gsp_frequent_sequences(
        first5, min_support=40, max_len=3
    )


@register(
    "kaplan_meier_orders",
    """
    WITH subj AS (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY t) AS INT) AS i
      FROM tiers
    ), encs AS (
      SELECT list(n * 1048576 + d ORDER BY t) AS encs FROM ranked
    )
    SELECT t, n AS n_at_risk, d AS d_events, c AS c_censored,
           CAST(list_reduce(
             list_prepend(CAST(1000000 AS BIGINT), encs[1:i]),
             (acc, e) -> (acc * ((e // 1048576) - (e % 1048576)))
                          // (e // 1048576)
           ) AS BIGINT) AS surv_scaled
    FROM ranked CROSS JOIN encs
    """,
)
def kaplan_meier_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over order lifetimes (operators/stats.py
    kaplan_meier): month tiers since 1992-01, status 'F' = event,
    else censored — S(t) per tier as an exact integer product-limit
    fold (per-step floor at scale 10⁶), the survival-analysis family
    (churn/retention/time-to-failure) in bit-portable form. Data-
    sized work is ONE tier aggregation; the fold runs over the
    ~80-row tier array via the SQL `aggregate` higher-order
    function."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return kaplan_meier(subj, "t", "ev")


@register("mst_parts_forest")
def mst_parts_forest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the recurring part-copurchase graph
    (operators/graph.py boruvka_mst — Borůvka rounds, ≤log₂|V|,
    min-struct tie-break, hash-min + pointer-doubling component
    merge): the backbone of single-linkage clustering at scale —
    cutting this forest at weight θ equals the threshold clustering
    the oracle-checked `dedup_clusters_cc` family computes directly.
    Rows-only by design (nested iterative control flow — per-round
    convergence loops inside rounds — is not unrollable SQL); the
    algorithm is value-verified against a reference Kruskal with
    distinct weights (unique-MST equality, tests/test_graph.py)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        # weight = inverse co-occurrence: the forest keeps the
        # STRONGEST links needed to span (ties broken by endpoints)
        .select("src", "dst", (F.lit(1000) - F.col("n")).alias("weight"))
    )
    return boruvka_mst(pairs)


def _dbscan_oracle(eps: int, min_pts: int, cc_rounds: int) -> str:
    def mx(expr: str, salt: int) -> str:
        return f"({_walk_mix_sql(expr, str(salt), 0)})"

    rounds = []
    for r in range(cc_rounds):
        rounds.append(
            f"""lab{r + 1} AS MATERIALIZED (
      SELECT l.node,
             LEAST(l.lab,
                   COALESCE(nb.m, l.lab),
                   COALESCE(j.lab, l.lab)) AS lab
      FROM lab{r} l
      LEFT JOIN (SELECT e.a AS node, MIN(x.lab) AS m
                 FROM core_edges e JOIN lab{r} x ON x.node = e.b
                 GROUP BY e.a) nb ON nb.node = l.node
      LEFT JOIN lab{r} j ON j.node = l.lab
    )"""
        )
    labs = ", ".join(rounds)
    last = f"lab{cc_rounds}"
    return f"""
    WITH nc AS MATERIALIZED (
      SELECT GREATEST(COUNT(*) // 44, 1) AS centers FROM customer
    ), pts AS MATERIALIZED (
      SELECT c_custkey AS id,
             ({mx('(c_custkey % centers)', 11)} % 1000) * 50000 + 10000
               + CASE WHEN c_custkey % 9 = 0
                      THEN {mx('c_custkey', 15)} % 6000
                      ELSE {mx('c_custkey', 13)} % 1200 END AS x,
             ({mx('(c_custkey % centers)', 12)} % 1000) * 50000 + 10000
               + CASE WHEN c_custkey % 9 = 0
                      THEN {mx('c_custkey', 16)} % 6000
                      ELSE {mx('c_custkey', 14)} % 1200 END AS y
      FROM customer CROSS JOIN nc
    ), cells AS MATERIALIZED (
      SELECT id, x, y, x // {eps} AS cx, y // {eps} AS cy FROM pts
    ), pairs AS MATERIALIZED (
      SELECT l.id AS a, r.id AS b
      FROM cells l JOIN cells r
        ON r.cx BETWEEN l.cx - 1 AND l.cx + 1
       AND r.cy BETWEEN l.cy - 1 AND l.cy + 1
       AND (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y)
           <= {eps * eps}
    ), core AS MATERIALIZED (
      SELECT a AS id FROM pairs GROUP BY a HAVING COUNT(*) >= {min_pts}
    ), core_edges AS MATERIALIZED (
      SELECT p.a, p.b FROM pairs p
      JOIN core ca ON ca.id = p.a
      JOIN core cb ON cb.id = p.b
      WHERE p.a <> p.b
    ), lab0 AS MATERIALIZED (
      SELECT id AS node, id AS lab FROM core
    ), {labs}, border AS MATERIALIZED (
      SELECT p.a AS id, MIN(l.lab) AS cluster
      FROM pairs p
      JOIN {last} l ON l.node = p.b
      LEFT JOIN core c ON c.id = p.a
      WHERE p.a <> p.b AND c.id IS NULL
      GROUP BY p.a
    ), assigned AS MATERIALIZED (
      SELECT node AS id, 'core' AS role, lab AS cluster FROM {last}
      UNION ALL
      SELECT id, 'border' AS role, cluster FROM border
    )
    SELECT CAST(id AS BIGINT) AS id, role,
           CAST(cluster AS BIGINT) AS cluster
    FROM assigned
    UNION ALL
    SELECT CAST(p.id AS BIGINT) AS id, 'noise' AS role,
           CAST(-1 AS BIGINT) AS cluster
    FROM pts p LEFT JOIN assigned s ON s.id = p.id
    WHERE s.id IS NULL
    """


@register("dbscan_customer_sites", _dbscan_oracle(2500, 10, 8))
def dbscan_customer_sites_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering (DBSCAN, Ester KDD'96) of synthesized
    customer site coordinates (operators/spatial.py dbscan_grid —
    3x3 grid-cell candidate equi-join, integer squared distances,
    core/border/noise roles, clusters = connected components of the
    core graph labeled by min core id). Coordinates are planted
    deterministically with the portable mix32, SCALE-AWARE: the
    center count grows with the table (n div 44) so blobs stay a
    CONSTANT ~40 points at every SF — candidate pairs stay linear in
    data instead of quadratic-in-blob-size (the first layout's 500-
    point sf0.1 cliques cost 9.2 s; constant blobs are the honest
    DBSCAN shape, its cost is inherently density²). 8/9 of customers
    sit in tight blobs (spread 1200 << eps 2500, min_pts 10 << blob size 40) on a 1000² grid of
    50000 spacing; 1/9 scatter in a [0,6000)² ring around their own
    blob center — near offsets join the cluster, mid offsets become
    borders, far corners become noise, so all three roles appear at
    every SF. The oracle mirrors the grid join in SQL and unrolls 8
    hash-min + pointer-jump rounds (MATERIALIZED; reach 2^8 >> the
    blob diameters of 1-2 hops) — Spark runs the real convergence
    loop, so equality also certifies the fixpoint. Border points
    take the MIN adjacent core's cluster (canonical DBSCAN is
    scan-order-dependent there; min is engine-exact)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import dbscan_grid

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    centers = max(c.count() // 44, 1)  # bounded scalar pull

    def mx(col, salt: int):
        return _portable_mix32(col, F.lit(salt), F.lit(0))

    k = F.col("c_custkey") % centers
    scatter = F.col("c_custkey") % 9 == 0
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            (mx(k, 11) % 1000) * 50000
            + 10000
            + F.when(scatter, mx(F.col("c_custkey"), 15) % 6000).otherwise(
                mx(F.col("c_custkey"), 13) % 1200
            )
        ).alias("x"),
        (
            (mx(k, 12) % 1000) * 50000
            + 10000
            + F.when(scatter, mx(F.col("c_custkey"), 16) % 6000).otherwise(
                mx(F.col("c_custkey"), 14) % 1200
            )
        ).alias("y"),
    )
    return dbscan_grid(pts, eps=2500, min_pts=10)


def _jaro_winkler_oracle() -> str:
    mixq = _walk_mix_sql("k", "21", 0)
    cands = (
        "list_filter(range(GREATEST(0, i - w), LEAST(lb - 1, i + w) + 1), "
        "j -> substr(b, CAST(j + 1 AS INT), 1) = substr(a, CAST(i + 1 AS INT), 1) "
        "AND ((acc >> CAST(32 + j AS INT)) & 1) = 0)[1]"
    )
    big_a = "(2*m*m*lb + 2*m*m*la + (2*m - t)*la*lb)"
    big_b = "(6*m*la*lb)"
    return f"""
    WITH base AS MATERIALIZED (
      SELECT p_partkey AS k, substr(p_name, 1, 30) AS nm FROM part
    ), qs AS MATERIALIZED (
      SELECT k, nm, ({mixq}) % (length(nm) - 1) AS q FROM base
    ), pertd AS MATERIALIZED (
      SELECT k, nm, CASE WHEN k % 4 = 0 THEN substr(pe, 1, CAST(length(pe) - 1 AS INT)) ELSE pe END AS pe
      FROM (SELECT k, nm,
              substr(nm, 1, CAST(q AS INT)) || substr(nm, CAST(q + 2 AS INT), 1)
              || substr(nm, CAST(q + 1 AS INT), 1) || substr(nm, CAST(q + 3 AS INT)) AS pe
            FROM qs)
    ), pairs AS MATERIALIZED (
      SELECT k, 'self' AS kind, nm AS a, pe AS b FROM pertd
      UNION ALL
      SELECT x.k, 'next' AS kind, x.nm AS a, y.pe AS b
      FROM pertd x JOIN pertd y ON y.k = x.k + 1 WHERE x.k % 2 = 1
    ), dims AS MATERIALIZED (
      SELECT k, kind, a, b, length(a) AS la, length(b) AS lb,
             GREATEST((GREATEST(length(a), length(b)) >> 1) - 1, 0) AS w
      FROM pairs
    ), folded AS MATERIALIZED (
      SELECT *, CASE WHEN la = 0 OR lb = 0 THEN CAST(0 AS BIGINT) ELSE
        list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, la)),
          (acc, i) -> CASE WHEN COALESCE({cands}, -1) >= 0
            THEN acc | (CAST(1 AS BIGINT) << CAST(i AS INT))
                     | (CAST(1 AS BIGINT) << CAST(32 + {cands} AS INT))
            ELSE acc END)
        END AS mk
      FROM dims
    ), masks AS MATERIALIZED (
      SELECT *, CAST(bit_count(mk & 4294967295) AS BIGINT) AS m FROM folded
    ), seqs AS MATERIALIZED (
      SELECT *,
        list_filter(range(0, la), i -> ((mk >> CAST(i AS INT)) & 1) = 1) AS mi,
        list_filter(range(0, lb), j -> ((mk >> CAST(32 + j AS INT)) & 1) = 1) AS mjs
      FROM masks
    ), tcnt AS MATERIALIZED (
      SELECT *, CASE WHEN m = 0 THEN 0 ELSE
        len(list_filter(range(1, m + 1),
          k2 -> substr(a, CAST(mi[CAST(k2 AS INT)] + 1 AS INT), 1)
               <> substr(b, CAST(mjs[CAST(k2 AS INT)] + 1 AS INT), 1))) END AS t
      FROM seqs
    ), pre AS MATERIALIZED (
      SELECT *,
        (CASE WHEN la >= 1 AND lb >= 1 AND substr(a,1,1) = substr(b,1,1) THEN 1 ELSE 0 END
       + CASE WHEN la >= 2 AND lb >= 2 AND substr(a,1,2) = substr(b,1,2) THEN 1 ELSE 0 END
       + CASE WHEN la >= 3 AND lb >= 3 AND substr(a,1,3) = substr(b,1,3) THEN 1 ELSE 0 END
       + CASE WHEN la >= 4 AND lb >= 4 AND substr(a,1,4) = substr(b,1,4) THEN 1 ELSE 0 END) AS l
      FROM tcnt
    )
    SELECT CAST(k AS BIGINT) AS p_partkey, kind,
      CAST(CASE WHEN m = 0 THEN 0 ELSE
        (CAST(10*{big_a} + l*({big_b} - {big_a}) AS BIGINT) * 1000000)
        // (10*{big_b}) END AS BIGINT) AS jw_micro
    FROM pre
    """


@register("jaro_winkler_part_names", _jaro_winkler_oracle())
def jaro_winkler_part_names_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similarity as an EXACT integer (micro-units) —
    operators/entity.py jaro_winkler_micro: the greedy window
    matching runs as a single int64 bitmask `aggregate` fold (bit i
    = a[i] matched, bit 32+j = b[j] consumed), transpositions are
    recovered from the masks, and the Winkler boost is folded into
    one exact fraction evaluated with truncating integer division —
    no floats anywhere, so Spark and DuckDB agree bit-for-bit where
    float jaro_winkler built-ins differ at the ulp level. Pairs:
    each part name vs a deterministically perturbed copy of itself
    (adjacent-char swap at a mix32-chosen position, plus a dropped
    last char for every 4th key — the record-linkage 'self' class)
    and vs the next key's perturbed name (the 'next' negatives).
    Row-local projection — zero shuffle; candidate generation is the
    blocking operators' job (fuzzy_join_ed1 / sorted-neighborhood)."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import jaro_winkler_micro
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32

    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("k"), F.substring("p_name", 1, 30).alias("nm")
    )
    q = _portable_mix32(F.col("k"), F.lit(21), F.lit(0)) % (F.length("nm") - 1)
    pe = F.concat(
        F.expr("substr(nm, 1, CAST(q AS INT))"),
        F.expr("substr(nm, CAST(q + 2 AS INT), 1)"),
        F.expr("substr(nm, CAST(q + 1 AS INT), 1)"),
        F.expr("substr(nm, CAST(q + 3 AS INT))"),
    )
    pertd = (
        p.withColumn("q", q)
        .withColumn("pe0", pe)
        .select(
            "k",
            "nm",
            F.when(
                F.col("k") % 4 == 0,
                F.expr("substr(pe0, 1, CAST(length(pe0) - 1 AS INT))"),
            )
            .otherwise(F.col("pe0"))
            .alias("pe"),
        )
    )
    self_pairs = pertd.select(
        "k", F.lit("self").alias("kind"), F.col("nm").alias("a"), F.col("pe").alias("b")
    )
    nxt = pertd.select(F.col("k").alias("k2"), F.col("pe").alias("pe2"))
    next_pairs = (
        pertd.where(F.col("k") % 2 == 1)
        .join(nxt, F.col("k2") == F.col("k") + 1)
        .select(
            "k",
            F.lit("next").alias("kind"),
            F.col("nm").alias("a"),
            F.col("pe2").alias("b"),
        )
    )
    pairs = self_pairs.unionByName(next_pairs)
    return jaro_winkler_micro(pairs, "a", "b").select(
        F.col("k").alias("p_partkey"), "kind", "jw_micro"
    )


def _als_oracle(rounds: int) -> str:
    half = (
        "(CAST(SUM(r.r * {prev}.f) AS BIGINT) << 20) // "
        "GREATEST(CAST(SUM({prev}.f * {prev}.f) AS BIGINT) >> 20, 1)"
    )
    steps = []
    prev_y, prev_x = "y0", None
    for t in range(1, rounds + 1):
        steps.append(
            f"""x{t} AS MATERIALIZED (
      SELECT r.u, {half.format(prev=prev_y)} AS f
      FROM r JOIN {prev_y} ON {prev_y}.i = r.i GROUP BY r.u
    )"""
        )
        prev_x = f"x{t}"
        steps.append(
            f"""y{t} AS MATERIALIZED (
      SELECT r.i, {half.format(prev=prev_x)} AS f
      FROM r JOIN {prev_x} ON {prev_x}.u = r.u GROUP BY r.i
    )"""
        )
        prev_y = f"y{t}"
    body = ", ".join(steps)
    return f"""
    WITH r AS MATERIALIZED (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS r
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), y0 AS MATERIALIZED (
      SELECT DISTINCT i, CAST(1048576 AS BIGINT) AS f FROM r
    ), {body}
    SELECT 'user' AS kind, CAST(u AS BIGINT) AS id,
           CAST(f AS BIGINT) AS factor_scaled FROM {prev_x}
    UNION ALL
    SELECT 'item' AS kind, CAST(i AS BIGINT) AS id,
           CAST(f AS BIGINT) AS factor_scaled FROM {prev_y}
    """


@register("als_rank1_factors", _als_oracle(2))
def als_rank1_factors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS over the customer×part implicit-rating matrix
    (operators/ml.py als_rank1_rounds — closed-form alternations as
    keyed aggregations, factors ×2^20, every half-step a
    shift/truncating-div over int64 so the trajectory is
    bit-reproducible; 2 rounds unrolled in the oracle). The portable
    twin of the float ALS a recommender would run (same join/agg
    plan shape, engine-exact arithmetic)."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import als_rank1_rounds

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ratings = o.join(li, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("i"),
        F.col("l_quantity").cast("bigint").alias("r"),
    )
    return als_rank1_rounds(ratings, rounds=2)


def _isotonic_oracle() -> str:
    return """
    WITH pts AS MATERIALIZED (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS MATERIALIZED (
      SELECT LEAST(cents // 3000000, 19) AS bin,
             CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM pts GROUP BY 1
    ), pref AS MATERIALIZED (
      SELECT bin, s, c,
             CAST(SUM(s) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
             CAST(SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
      FROM bins
    ), segs AS MATERIALIZED (
      SELECT l.bin AS i, h.bin AS j,
             (CAST(1000000000000 AS BIGINT) * (h.cs - (l.cs - l.s)))
             // GREATEST(h.cc - (l.cc - l.c), 1) AS mean_scaled
      FROM pref l JOIN pref h ON l.bin <= h.bin
    ), inner_min AS MATERIALIZED (
      SELECT s2.i, k.bin AS k, MIN(s2.mean_scaled) AS im
      FROM segs s2 JOIN pref k ON s2.i <= k.bin AND s2.j >= k.bin
      GROUP BY 1, 2
    ), fitted AS MATERIALIZED (
      SELECT k, MAX(im) AS fitted_scaled FROM inner_min GROUP BY k
    )
    SELECT CAST(p.bin AS BIGINT) AS bin, p.c AS n, p.s AS s,
           CAST(f.fitted_scaled AS BIGINT) AS fitted_scaled
    FROM pref p JOIN fitted f ON f.k = p.bin
    """


@register("isotonic_urgent_rate", _isotonic_oracle())
def isotonic_urgent_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of urgent-priority rate vs
    order-value bin (operators/ml.py isotonic_fit_minimax — the PAVA
    solution via the minimax identity over a BOUNDED 20-bin table:
    O(B²) contiguous segments, O(B³) association joins, all integer-
    scaled truncating divisions so max-of-min is engine-exact). The
    one data-sized pass is the binning aggregation (exact cents,
    integer bin ids); everything after runs on ≤20 rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long
    from dpe_energy_performance_analysis_etl_spark.operators.ml import isotonic_fit_minimax

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    binned = (
        o.select(
            F.least(
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) div 3000000"),
                F.lit(19).cast("bigint"),
            ).alias("bin"),
            F.substring("o_orderpriority", 1, 1)
            .isin("1", "2")
            .cast("int")
            .alias("y"),
        )
        .groupBy("bin")
        .agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    return isotonic_fit_minimax(binned)


def _naive_bayes_oracle() -> str:
    noise = _walk_mix_sql("k", "31", 0)
    counts = []
    liks = []
    for j in range(4):
        for c in (0, 1):
            for v in (0, 1):
                counts.append(
                    f"CAST(SUM(CASE WHEN y = {c} AND f{j} = {v} THEN 1 ELSE 0 END)"
                    f" AS BIGINT) AS c_{j}_{c}_{v}"
                )
                liks.append(
                    f"1000 * (c_{j}_{c}_{v} + 1) // (n{c} + 2) AS l_{j}_{c}_{v}"
                )
    odds = {}
    for c in (0, 1):
        terms = [f"p{c}"]
        for j in range(4):
            terms.append(
                f"(CASE WHEN f{j} = 1 THEN l_{j}_{c}_1 ELSE l_{j}_{c}_0 END)"
            )
        odds[c] = " * ".join(terms)
    return f"""
    WITH feat AS MATERIALIZED (
      SELECT k, CASE WHEN f0 + f1 + f2 + {noise} % 2 >= 2
                        THEN 1 ELSE 0 END AS y,
             f0, f1, f2, f3
      FROM (
        SELECT o_orderkey AS k,
               CASE WHEN CAST(o_totalprice AS DECIMAL(30,2)) > 150000
                    THEN 1 ELSE 0 END AS f0,
               CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                    THEN 1 ELSE 0 END AS f1,
               CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END AS f2,
               CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS f3
        FROM orders)
    ), m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0,
             {", ".join(counts)}
      FROM feat WHERE k % 3 <> 0
    ), lik AS MATERIALIZED (
      SELECT 1000 * n1 // n AS p1, 1000 * n0 // n AS p0,
             {", ".join(liks)}
      FROM m
    )
    SELECT pred, actual, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN {odds[1]} >= {odds[0]} THEN 1 ELSE 0 END AS pred,
             y AS actual
      FROM feat CROSS JOIN lik WHERE k % 3 = 0
    ) GROUP BY pred, actual
    """


@register("naive_bayes_status_gate", _naive_bayes_oracle())
def naive_bayes_status_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli naive Bayes train+score with the decision as an
    exact INTEGER odds product (operators/ml.py
    naive_bayes_odds_gate — Laplace likelihoods scaled to fixed
    precision div(1000·(n+1), n_c+2), so the model is independent of
    training-set size; the O(features) model is a bounded scalar
    pull and scoring compiles to literal CASE codegen, zero joins).
    Train = orderkeys % 3 != 0, score = the rest; label = status F,
    features: high value, urgent priority, early year, odd key. Output
    is the confusion matrix."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import naive_bayes_odds_gate

    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feat = o.select(
        F.col("o_orderkey").alias("k"),
        (F.expr("CAST(o_totalprice AS DECIMAL(30,2))") > 150000)
        .cast("int")
        .alias("f0"),
        F.substring("o_orderpriority", 1, 1).isin("1", "2").cast("int").alias("f1"),
        (F.year("o_orderdate") <= 1997).cast("int").alias("f2"),
        (F.col("o_orderkey") % 2 == 1).cast("int").alias("f3"),
    ).withColumn(
        # planted label: noisy majority vote of f0..f2 (f3 is a
        # decoy) — the synthetic o_orderstatus is uniform hash noise
        # with no learnable signal, so a real-data label would make
        # "always predict majority" the correct model
        "y",
        (
            F.col("f0")
            + F.col("f1")
            + F.col("f2")
            + _portable_mix32(F.col("k"), F.lit(31), F.lit(0)) % 2
            >= 2
        ).cast("int"),
    )
    return naive_bayes_odds_gate(
        feat.where(F.col("k") % 3 != 0),
        feat.where(F.col("k") % 3 == 0),
        ["f0", "f1", "f2", "f3"],
    )


@register(
    "rolling_median_revenue",
    """
    WITH daily AS MATERIALIZED (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)) * 100) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ), lists AS MATERIALIZED (
      SELECT day, rev_cents,
             list(rev_cents) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
      FROM daily
    )
    SELECT day, rev_cents,
           CAST(list_sort(l)[(len(l) + 1) // 2] AS BIGINT) AS roll_median_cents
    FROM lists
    """,
)
def rolling_median_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day LOWER-median of daily revenue — the robust
    moving-average variant (median absolute to spikes). Daily
    revenue is the one data-sized aggregation (exact integer cents);
    the rolling median then runs over the BOUNDED day table (~2.4k
    rows — the documented global-window-on-aggregate-table design
    rule) as collect_list over a ROWS frame + array_sort + the
    deterministic lower-median rank pick ((n+1) div 2 — order
    statistics, not interpolation: the round-3 float-parity rule)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn("__l", F.collect_list("rev_cents").over(w))
        .select(
            "day",
            "rev_cents",
            F.expr(
                "element_at(array_sort(__l), CAST((size(__l) + 1) div 2 AS INT))"
            ).alias("roll_median_cents"),
        )
    )


def _kmv_overlap_oracle(k: int) -> str:
    hash_expr = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        "(acc, x) -> (acc * 131 + x) % 1000000000000000)"
    )
    km1_m = float(k - 1) * 1e15
    return f"""
    WITH tokA AS MATERIALIZED (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE doc_id % 2 = 0
    ), tokB AS MATERIALIZED (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE doc_id % 3 = 0
    ), hA AS MATERIALIZED (SELECT DISTINCT {hash_expr} AS h FROM tokA),
    hB AS MATERIALIZED (SELECT DISTINCT {hash_expr} AS h FROM tokB),
    sA AS MATERIALIZED (
      SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos FROM hA)
      WHERE pos <= {k}
    ), sB AS MATERIALIZED (
      SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos FROM hB)
      WHERE pos <= {k}
    ), sU AS MATERIALIZED (
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos
        FROM (SELECT DISTINCT h FROM (SELECT h FROM sA UNION ALL SELECT h FROM sB))
      ) WHERE pos <= {k}
    ), sh AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS shared FROM sU
      WHERE h IN (SELECT h FROM sA) AND h IN (SELECT h FROM sB)
    ), ag AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_held, MAX(h) AS h_k FROM sU
    ), ex AS MATERIALIZED (
      SELECT CAST((SELECT COUNT(*) FROM (SELECT term FROM tokA UNION SELECT term FROM tokB)) AS BIGINT) AS exact_union,
             CAST((SELECT COUNT(*) FROM tokA WHERE term IN (SELECT term FROM tokB)) AS BIGINT) AS exact_inter
    )
    SELECT n_held, shared,
           CASE WHEN n_held < {k} THEN CAST(n_held AS DOUBLE)
                ELSE CAST({km1_m} AS DOUBLE) / CAST(h_k AS DOUBLE) END AS union_est,
           CASE WHEN n_held < {k}
                THEN CAST(1000000 * shared AS BIGINT) // GREATEST(n_held, 1)
                ELSE CAST(1000000 * shared AS BIGINT) // {k} END AS jaccard_ppm,
           CASE WHEN n_held < {k} THEN CAST(shared AS DOUBLE)
                ELSE CAST(shared * {k - 1} * 1000000000000000 AS DOUBLE)
                     / CAST({k} * h_k AS DOUBLE) END AS inter_est,
           exact_union, exact_inter
    FROM ag CROSS JOIN sh CROSS JOIN ex
    """


@register("kmv_overlap_docs", _kmv_overlap_oracle(16))
def kmv_overlap_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates between two token corpora
    (operators/sketch.py kmv_set_ops — Beyer SIGMOD'07: union /
    Jaccard / intersection from the k-min sketches ONLY, membership
    tested sketch-against-sketch, one IEEE division per estimator)
    next to the exact answers — the sketch-side counterpart of
    `source_overlap_matrix` for corpora too large to join exactly.
    k=16 < vocabulary so the gate exercises the estimator branch."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import kmv_set_ops
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    # each token set feeds THREE consumers (sketch build, exact
    # intersection, exact union) — vocabulary-bounded, so cache per
    # the repeated-subtree rule (else the scan+tokenize re-runs 3x)
    tok_a = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
        .cache()
    )
    tok_b = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
        .cache()
    )
    est = kmv_set_ops(tok_a, tok_b, "term", k=16)
    exact_inter = tok_a.join(tok_b, "term", "semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_inter")
    )
    exact_union = (
        tok_a.unionByName(tok_b)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
    )
    return est.crossJoin(exact_union).crossJoin(exact_inter)


@register(
    "decayed_heavy_users",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id, (epoch_us(ts) // 1000000) // 86400 AS day FROM events
    ), mx AS MATERIALIZED (
      SELECT MAX(day) AS t FROM ev
    ), wts AS MATERIALIZED (
      SELECT user_id,
             CAST(SUM(CASE WHEN mx.t - day <= 40
                           THEN CAST(1 AS BIGINT) << CAST(40 - (mx.t - day) AS INT)
                           ELSE 0 END) AS BIGINT) AS decayed,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ev CROSS JOIN mx GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, decayed, n_events
    FROM wts ORDER BY decayed DESC, user_id ASC LIMIT 20
    """,
)
def decayed_heavy_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed heavy hitters: per-user activity
    weight Σ 2^(40 − age_days), zeroed past 40 days — the dyadic
    half-life form (one-day half-life) that stays EXACT int64 where
    a float e^{-λt} would diverge across engines. One data-sized
    aggregation keyed on user, a broadcast 1-row max-day, and a
    global top-20 via orderBy+limit (TakeOrdered — only 20 rows per
    partition reach the driver-side merge; no global window, no full
    sort). The streaming analogue decays per trigger with the same
    shift arithmetic."""
    ev = read_events(spark, sf_dir).select(
        "user_id", (epoch_seconds("ts") / 86400).cast("bigint").alias("day")
    )
    mx = ev.agg(F.max("day").alias("t"))
    wts = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("t") - F.col("day") <= 40,
                    F.expr("shiftleft(1L, CAST(40 - (t - day) AS INT))"),
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("decayed"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return (
        wts.select(F.col("user_id").cast("bigint").alias("user_id"), "decayed", "n_events")
        .orderBy(F.col("decayed").desc(), F.col("user_id").asc())
        .limit(20)
    )


def _cc_doubling_rounds_sql(edges: str, lab0: str, rounds: int) -> str:
    """Unrolled hash-min + pointer-jump label rounds (MATERIALIZED):
    reach 2^rounds, so `rounds`=12 certifies any component structure
    up to 4096 nodes regardless of topology. `edges` must be a CTE
    name with (a, b) BOTH directions; `lab0` a CTE (node, lab)."""
    parts = []
    prev = lab0
    for r in range(1, rounds + 1):
        parts.append(
            f"""lab{r} AS MATERIALIZED (
      SELECT l.node,
             LEAST(l.lab, COALESCE(nb.m, l.lab), COALESCE(j.lab, l.lab)) AS lab
      FROM {prev} l
      LEFT JOIN (SELECT e.a AS node, MIN(x.lab) AS m
                 FROM {edges} e JOIN {prev} x ON x.node = e.b
                 GROUP BY e.a) nb ON nb.node = l.node
      LEFT JOIN {prev} j ON j.node = l.lab
    )"""
        )
        prev = f"lab{r}"
    return ", ".join(parts), prev


def _single_linkage_oracle(threshold: int, rounds: int = 12) -> str:
    labs, last = _cc_doubling_rounds_sql("kept", "lab0", rounds)
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT x.l_partkey AS src, y.l_partkey AS dst,
             1000 - CAST(COUNT(*) AS BIGINT) AS weight
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM pairs UNION ALL SELECT dst FROM pairs)
    ), kept AS MATERIALIZED (
      SELECT src AS a, dst AS b FROM pairs WHERE weight <= {threshold}
      UNION ALL
      SELECT dst AS a, src AS b FROM pairs WHERE weight <= {threshold}
    ), lab0 AS MATERIALIZED (
      SELECT v AS node, v AS lab FROM nodes
    ), {labs}
    SELECT CAST(node AS BIGINT) AS part, CAST(lab AS BIGINT) AS cluster
    FROM {last}
    """


@register("single_linkage_parts", _single_linkage_oracle(997))
def single_linkage_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-linkage clustering as MST + dendrogram cut
    (operators/graph.py boruvka_mst → drop forest edges above the
    distance threshold → connected components): the scalable
    hierarchical-clustering path — the MST is computed ONCE and any
    number of thresholds replay as cheap filters + CC, instead of
    re-running a threshold join per cut. The oracle computes the
    clusters DIRECTLY as components of the θ-thresholded graph
    (12 unrolled hash-min+jump rounds — reach 4096 ≥ |V|), so the
    green row certifies the single-linkage/MST-cut equivalence
    end-to-end on real data, not just the plumbing."""
    from dpe_energy_performance_analysis_etl_spark.dedup.cluster import connected_components
    from dpe_energy_performance_analysis_etl_spark.operators.graph import boruvka_mst

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst", (F.lit(1000) - F.col("n")).alias("weight"))
        .localCheckpoint()
    )
    forest = boruvka_mst(pairs)
    kept = forest.where(F.col("weight") <= 997)
    nodes = pairs.select(
        F.explode(F.array("src", "dst")).alias("part")
    ).distinct()
    labels = connected_components(kept, src="a", dst="b", nodes=nodes, node_col="part")
    return labels.select(
        F.col("node").cast("bigint").alias("part"),
        F.col("comp").cast("bigint").alias("cluster"),
    )


def _ransac_oracle(n_models: int) -> str:
    def mx(node: str, walk: str, k: str) -> str:
        return f"({_walk_mix_sql(node, walk, k)})"

    y_line = f"7 * c_custkey + 13 + {mx('c_custkey', '61', 0)} % 3 - 1"
    y_out = f"{mx('c_custkey', '62', 0)} % 8000000"
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT CAST(c_custkey AS BIGINT) AS x,
             CAST(CASE WHEN c_custkey % 5 = 0 THEN {y_out}
                  ELSE {y_line} END AS BIGINT) AS y
      FROM customer
    ), mids AS MATERIALIZED (
      SELECT unnest(generate_series(0, {n_models - 1})) AS mid
    ), seeds AS MATERIALIZED (
      SELECT mid,
             MIN({{'k': {mx('p.x', 'p.y', '(2 * m.mid)')}, 'x': p.x, 'y': p.y}}) AS p1,
             MIN({{'k': {mx('p.x', 'p.y', '(2 * m.mid + 1)')}, 'x': p.x, 'y': p.y}}) AS p2
      FROM pts p CROSS JOIN mids m GROUP BY mid
    ), models AS MATERIALIZED (
      SELECT mid, p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
      FROM seeds WHERE p1.x <> p2.x
    ), scored AS MATERIALIZED (
      SELECT m.mid, m.x1, m.y1, m.x2, m.y2, CAST(COUNT(*) AS BIGINT) AS n_inliers
      FROM pts p CROSS JOIN models m
      WHERE ABS((p.y - m.y1) * (m.x2 - m.x1) - (p.x - m.x1) * (m.y2 - m.y1))
            <= ABS(m.x2 - m.x1)
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(mid AS BIGINT) AS model_id, x1, y1, x2, y2, n_inliers
    FROM scored ORDER BY n_inliers DESC, mid ASC LIMIT 1
    """


@register("ransac_line_custkeys", _ransac_oracle(64))
def ransac_line_custkeys_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit (operators/stats.py ransac_line_fit —
    Fischler-Bolles 1981 with deterministic per-model hash-argmin
    seeding instead of an RNG, and the inlier test cross-multiplied
    to pure int64, no division). Planted data: y = 7x + 13 ± 1 for
    80% of customers, uniform outliers for the rest — the winning
    model must recover the line (n_inliers ≈ 0.8·n where Theil-Sen's
    O(n²) pair enumeration would not scale past small series).
    Model seeding is a map-side-combinable argmin pass — rank-free
    (no data-sized global window)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import _portable_mix32
    from dpe_energy_performance_analysis_etl_spark.operators.stats import ransac_line_fit

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey")
    pts = c.select(
        ck.cast("bigint").alias("x"),
        F.when(
            ck % 5 == 0, _portable_mix32(ck, F.lit(62), F.lit(0)) % 8000000
        )
        .otherwise(
            7 * ck + 13 + _portable_mix32(ck, F.lit(61), F.lit(0)) % 3 - 1
        )
        .cast("bigint")
        .alias("y"),
    )
    return ransac_line_fit(pts, n_models=64, tol_num=1, tol_den=1)


@register(
    "sq8_recall_embeddings",
    """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), qz AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> CAST(GREATEST(LEAST(FLOOR(x * 128), 127), -127)
                                         AS DOUBLE)) AS qv
      FROM base
    ), sq_scored AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS qscore
      FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ), sq_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qscore DESC, neighbor_id) AS rank
        FROM sq_scored) WHERE rank <= 5
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), ex_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                          c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(s.neighbor_id) AS BIGINT) AS sq8_hits,
           CAST(COUNT(s.neighbor_id) * 20 AS BIGINT) AS recall_pct
    FROM ex_top e LEFT JOIN sq_top s
      ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sq8_recall_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search with recall@5 against the exact
    float baseline (similarity/sq.py — floor(x·128) dyadic quantizer,
    engine-exact; integer dot products; same broadcast+window plan
    as brute force). The output is the quality gate a 4×-compressed
    index must pass before it replaces float vectors at scale —
    recall here is a DETERMINISTIC oracle-checkable quantity, not a
    sampled estimate."""
    from dpe_energy_performance_analysis_etl_spark.similarity import brute_force_topk
    from dpe_energy_performance_analysis_etl_spark.similarity.sq import sq8_topk

    emb = read_embeddings(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 10)
    sq = sq8_topk(emb, queries_df, k=5).select(
        "query_id", F.col("neighbor_id").alias("sq_n")
    )
    ex = brute_force_topk(emb, queries_df, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        ex.join(
            sq,
            (ex["query_id"] == sq["query_id"]) & (ex["neighbor_id"] == sq["sq_n"]),
            "left",
        )
        .groupBy(ex["query_id"].alias("query_id"))
        .agg(
            F.count("sq_n").cast("bigint").alias("sq8_hits"),
            (F.count("sq_n") * 20).cast("bigint").alias("recall_pct"),
        )
    )


def _markov_attr_oracle(rounds: int, channels: tuple[str, ...]) -> str:
    scen = {"full": None, **{c: c for c in channels}}
    parts = []
    for name, rm in scen.items():
        if rm is None:
            csel = "SELECT src, dst, n FROM counts"
        else:
            csel = (
                f"SELECT src, CASE WHEN dst = '{rm}' THEN 'null' ELSE dst END AS dst, "
                f"CAST(SUM(n) AS BIGINT) AS n FROM counts WHERE src <> '{rm}' "
                f"GROUP BY 1, 2"
            )
        parts.append(f"c_{name} AS MATERIALIZED ({csel})")
        parts.append(
            f"""q_{name} AS MATERIALIZED (
      SELECT c.src, c.dst, (1000000 * c.n) // t.tot AS q
      FROM c_{name} c JOIN (SELECT src, CAST(SUM(n) AS BIGINT) AS tot
                            FROM c_{name} GROUP BY src) t ON t.src = c.src
    )"""
        )
        parts.append(
            f"p_{name}_0 AS MATERIALIZED (SELECT DISTINCT src AS state, "
            f"CAST(0 AS BIGINT) AS p FROM q_{name})"
        )
        for r in range(1, rounds + 1):
            parts.append(
                f"""p_{name}_{r} AS MATERIALIZED (
      SELECT q.src AS state,
             CAST(SUM(q.q * COALESCE(pa.p,
               CASE WHEN q.dst = 'purchase' THEN 1000000000000 ELSE 0 END))
               // 1000000 AS BIGINT) AS p
      FROM q_{name} q LEFT JOIN p_{name}_{r - 1} pa ON pa.state = q.dst
      GROUP BY q.src
    )"""
            )
        parts.append(
            f"start_{name} AS MATERIALIZED (SELECT p FROM p_{name}_{rounds} "
            f"WHERE state = 'start')"
        )
    chan_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, (SELECT p FROM start_{c}) AS p_removed"
        for c in channels
    )
    return f"""
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS d,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), conv AS MATERIALIZED (
      SELECT u, MIN(rk) AS crk FROM ev WHERE d = 'purchase' GROUP BY u
    ), kept AS MATERIALIZED (
      SELECT e.u, e.d, e.rk, c.crk FROM ev e LEFT JOIN conv c ON c.u = e.u
      WHERE c.crk IS NULL OR e.rk <= c.crk
    ), trans AS MATERIALIZED (
      SELECT COALESCE(LAG(d) OVER (PARTITION BY u ORDER BY rk), 'start') AS src,
             d AS dst
      FROM kept
      UNION ALL
      SELECT arg_max(d, rk) AS src, 'null' AS dst
      FROM kept GROUP BY u HAVING MAX(crk) IS NULL
    ), counts AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM trans GROUP BY 1, 2
    ), {", ".join(parts)}, rems AS MATERIALIZED (
      SELECT channel, p_removed,
             GREATEST(1000000 - (p_removed * 1000000)
               // GREATEST((SELECT p FROM start_full), 1), 0) AS rem
      FROM ({chan_rows})
    ), remsum AS MATERIALIZED (
      SELECT GREATEST(CAST(SUM(rem) AS BIGINT), 1) AS s FROM rems
    )
    SELECT r.channel,
           CAST((SELECT p FROM start_full) AS BIGINT) AS p_full_scaled,
           CAST(r.p_removed AS BIGINT) AS p_removed_scaled,
           CAST(r.rem AS BIGINT) AS removal_ppm,
           CAST((r.rem * 1000000) // rs.s AS BIGINT) AS attribution_ppm
    FROM rems r CROSS JOIN remsum rs
    """


@register(
    "markov_attribution_events",
    _markov_attr_oracle(25, ("click", "error", "signup", "view")),
)
def markov_attribution_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution over user event paths
    (operators/temporal.py markov_removal_attribution — Anderl 2014
    semantics, START→…→{purchase, null} absorbing chain, 25
    fixed-round integer value iterations per scenario). The one
    data-sized pass extracts transitions (per-user window, cut at
    first purchase, null absorber for non-converters); the chain
    solves on the O(states²) BOUNDED matrix — a driver-side exact-
    int model like naive Bayes — and the oracle unrolls every
    scenario's 25 rounds as MATERIALIZED CTEs, so the gate checks
    the full trajectory, not just the plumbing."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        markov_removal_attribution,
    )

    ev = read_events(spark, sf_dir)
    return markov_removal_attribution(ev)


@register(
    "nelson_aalen_orders",
    """
    WITH subj AS (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, d,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM tiers
    )
    SELECT t, n AS n_at_risk, d AS d_events,
           CAST(SUM(d * (1000000000000 // GREATEST(n, 1))
                    + (d * (1000000000000 % GREATEST(n, 1)))
                      // GREATEST(n, 1)) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS hazard_scaled
    FROM ranked
    """,
)
def nelson_aalen_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the SAME order-lifetime
    tiers as `kaplan_meier_orders` (operators/stats.py nelson_aalen):
    H(t) = Σ d/n as a windowed sum of per-tier integer-scaled
    divisions — KM's additive sibling, and the exactness argument is
    even simpler (no sequential fold: each term is engine-exact and
    addition is order-free)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import nelson_aalen

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return nelson_aalen(subj, "t", "ev")


def _jenks_oracle(k: int, n_bins: int) -> str:
    # DP levels unrolled: d1..dk over the bounded costs table
    lvls = []
    for m in range(2, k + 1):
        lvls.append(
            f"""d{m} AS MATERIALIZED (
      SELECT c.j,
             MIN({{'total': p.total + c.cost, 'arg': c.i}}) AS best
      FROM costs c JOIN (SELECT j + 1 AS i, total FROM d{m - 1}f) p
        ON p.i = c.i
      GROUP BY c.j
    ), d{m}f AS MATERIALIZED (
      SELECT j, best.total AS total, best.arg AS arg FROM d{m}
    )"""
        )
    # backtrace: e_k = B; e_{m-1} = arg_m(e_m) - 1
    bt = ["eK AS MATERIALIZED (SELECT MAX(j) AS e FROM costs)"]
    prev = "eK"
    for m in range(k, 1, -1):
        bt.append(
            f"""e{m - 1} AS MATERIALIZED (
      SELECT CAST(d.arg - 1 AS BIGINT) AS e
      FROM d{m}f d JOIN {prev} p ON d.j = p.e
    )"""
        )
        prev = f"e{m - 1}"
    spans = []
    for m in range(1, k + 1):
        lo = "(SELECT 0 AS e)" if m == 1 else f"e{m - 1}"
        hi = "eK" if m == k else f"e{m}"
        spans.append(
            f"SELECT {m} AS class, l.e + 1 AS lo_r, h.e AS hi_r "
            f"FROM {lo} l CROSS JOIN {hi} h WHERE h.e >= l.e + 1"
        )
    return f"""
    WITH vals AS MATERIALIZED (
      SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                   // 1000000, {n_bins - 1}) AS y
      FROM orders
    ), bins AS MATERIALIZED (
      SELECT y AS bin, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM vals GROUP BY 1
    ), pref AS MATERIALIZED (
      SELECT bin, s, ss, c,
             CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS r,
             CAST(SUM(s) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
             CAST(SUM(ss) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS css,
             CAST(SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
      FROM bins
    ), costs AS MATERIALIZED (
      SELECT l.r AS i, h.r AS j, l.bin AS lo_bin, h.bin AS hi_bin,
             h.cs - (l.cs - l.s) AS seg_s, h.cc - (l.cc - l.c) AS seg_c,
             (h.css - (l.css - l.ss))
               - ((h.cs - (l.cs - l.s)) * (h.cs - (l.cs - l.s)))
                 // GREATEST(h.cc - (l.cc - l.c), 1) AS cost
      FROM pref l JOIN pref h ON l.r <= h.r
    ), d1f AS MATERIALIZED (
      SELECT j, cost AS total, CAST(1 AS BIGINT) AS arg
      FROM costs WHERE i = 1
    ), {", ".join(lvls)}, {", ".join(bt)}, spans AS MATERIALIZED (
      {" UNION ALL ".join(spans)}
    )
    SELECT CAST(sp.class AS BIGINT) AS class, c.lo_bin, c.hi_bin,
           c.seg_c AS n, c.seg_s AS s
    FROM spans sp JOIN costs c ON c.i = sp.lo_r AND c.j = sp.hi_r
    """


@register("jenks_breaks_totalprice", _jenks_oracle(4, 24))
def jenks_breaks_totalprice_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-Jenks natural breaks of order value into 4 classes
    (operators/quantiles.py jenks_breaks_binned — the OPTIMAL 1-D
    k-segmentation by within-class squared deviation, exact DP over
    a 24-bin table; segment cost SS − div(S², C) keeps the argmin
    engine-exact with one truncating division per segment). The
    histogram trick bounds everything after the one binning pass;
    values are in 10k$ units so S² stays int64 at any SF. The exact
    complement to the heuristic `kmeans_lloyd_portable` in 1-D."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        jenks_breaks_binned,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # exact cents first: a direct DECIMAL->BIGINT cast ROUNDS on
    # DuckDB but TRUNCATES on Spark (caught by the gate: one order on
    # a .5 boundary shifted a bin)
    y = F.least(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) div 1000000"
        ),
        F.lit(23).cast("bigint"),
    )
    binned = (
        o.select(y.alias("bin"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    return jenks_breaks_binned(binned, k=4)


def _textrank_oracle(rounds: int, topk: int) -> str:
    its = []
    prev = "r0"
    for i in range(1, rounds + 1):
        its.append(
            f"""i{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum({prev}.r // deg.deg) AS BIGINT) AS inc
        FROM {prev} JOIN deg ON {prev}.node = deg.src JOIN e ON e.src = deg.src
        GROUP BY e.dst
      ) x ON n.node = x.node
    )"""
        )
        prev = f"i{i}"
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(ts) AS w,
             unnest(range(1, len(ts) + 1)) AS pos
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
            FROM documents)
    ), pairs AS MATERIALIZED (
      SELECT DISTINCT a.w AS src, b.w AS dst
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id
       AND b.pos - a.pos BETWEEN 1 AND 2
       AND a.w <> b.w
    ), e AS MATERIALIZED (
      SELECT src, dst FROM pairs
      UNION
      SELECT dst AS src, src AS dst FROM pairs
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), r0 AS MATERIALIZED (
      SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
    ), {", ".join(its)}
    SELECT node AS keyword, r AS rank_scaled
    FROM {prev} ORDER BY r DESC, node ASC LIMIT {topk}
    """


@register("textrank_keywords_docs", _textrank_oracle(3, 20))
def textrank_keywords_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea-Tarau EMNLP'04):
    PageRank over the word co-occurrence graph (window 2, symmetric,
    distinct) — the graph-centrality counterpart to the frequency-
    based `rake_keywords_docs`, reusing operators/graph.py
    pagerank_fixed verbatim (exact integer ranks, 3 rounds, so the
    iterative trajectory sits behind the value-hash gate). Graph
    build is one posexplode + position self-join per doc (window ≤2
    keeps the join equi-keyed on doc with a 2-row band); top-20 via
    orderBy+limit (TakeOrdered)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import pagerank_fixed
    from dpe_energy_performance_analysis_etl_spark.text import tokens_expr

    docs = read_documents(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos", "w")
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("w").alias("src"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("w").alias("dst"))
    pairs = (
        a.join(b, "doc_id")
        .where(
            (F.col("pb") - F.col("pa")).between(1, 2)
            & (F.col("src") != F.col("dst"))
        )
        .select("src", "dst")
        .distinct()
    )
    # symmetrize via explode(array(...)) — a unionAll of two selects
    # over `pairs` would re-run the position join per branch (the
    # repeated-subtree rule; audit measured 136 static exchanges)
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    ranks = pagerank_fixed(sym, iterations=3)
    return (
        ranks.select(F.col("node").alias("keyword"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), F.col("keyword").asc())
        .limit(20)
    )


@register(
    "encoding_advisor_lineitem",
    """
    WITH long_form AS MATERIALIZED (
      SELECT l_orderkey AS pk, l_linenumber AS ok, kv.col, kv.v
      FROM lineitem, LATERAL (
        SELECT * FROM (VALUES
          ('l_linenumber', CAST(l_linenumber AS BIGINT)),
          ('l_suppkey', CAST(l_suppkey AS BIGINT)),
          ('l_quantity', CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)),
          ('l_discount', CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT))
        ) AS t(col, v)
      ) kv
    ), flagged AS MATERIALIZED (
      SELECT col, v,
             CASE WHEN LAG(v) OVER (PARTITION BY pk, col ORDER BY ok, v) IS NULL
                       OR LAG(v) OVER (PARTITION BY pk, col ORDER BY ok, v) <> v
                  THEN 1 ELSE 0 END AS chg
      FROM long_form
    ), stats AS MATERIALIZED (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
             CAST(length(bin(MAX(v) - MIN(v))) AS BIGINT) AS bit_width,
             CAST(SUM(chg) AS BIGINT) AS rle_runs
      FROM flagged GROUP BY col
    )
    SELECT col AS column, n, n_distinct, bit_width, rle_runs,
           CASE WHEN n_distinct <= 256 AND rle_runs <= n // 4 THEN 'rle-dict'
                WHEN n_distinct <= 256 THEN 'dict'
                WHEN rle_runs <= n // 8 THEN 'rle'
                WHEN bit_width <= 20 THEN 'bitpack'
                ELSE 'plain' END AS recommendation
    FROM stats
    """,
)
def encoding_advisor_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor over lineitem (operators/quality.py
    encoding_advisor_int): exact cardinality / range bit width (via
    length(bin(range)) — no libm) / RLE runs under the table's
    natural (orderkey, linenumber) sort, with a deterministic
    recommendation CASE — the profiling pass that picks parquet
    encodings before a 100 TB rewrite. Decimal columns enter as
    exact cents (the DECIMAL→BIGINT cast-rounding trap)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        encoding_advisor_int,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "l_quantity"
        ),
        F.expr("CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "l_discount"
        ),
    )
    return encoding_advisor_int(
        li,
        "l_orderkey",
        "l_linenumber",
        ["l_linenumber", "l_suppkey", "l_quantity", "l_discount"],
    )


@register(
    "dtw_user_value_series",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), series AS MATERIALIZED (
      SELECT u, list(v ORDER BY rk) AS s
      FROM ev WHERE rk <= 12 GROUP BY u
    ), pairs AS MATERIALIZED (
      SELECT x.u AS user_a, y.u AS user_b, x.s AS a, y.s AS b
      FROM series x JOIN series y ON y.u = x.u + 1
    )
    SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
           CAST(list_reduce(
             list_prepend(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, len(a) + 1),
                                i -> CAST(1099511627776 AS BIGINT))),
               list_transform(b, x -> [x])
             ),
             (acc, bj) -> list_reduce(
               list_prepend([CAST(1099511627776 AS BIGINT)],
                            list_transform(range(1, len(a) + 1), i -> [i])),
               (acc2, el) -> list_append(acc2,
                 abs(a[CAST(el[1] AS INT)] - bj[1])
                 + LEAST(acc[CAST(el[1] AS INT)],
                         acc[CAST(el[1] AS INT) + 1],
                         acc2[CAST(len(acc2) AS INT)]))
             )
           )[CAST(len(a) AS INT) + 1] AS BIGINT) AS dtw_cents
    FROM pairs
    """,
)
def dtw_user_value_series_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Time Warping distance between consecutive users' event
    value series (operators/temporal.py dtw_distance — the full
    O(n·m) DP evaluated as NESTED `aggregate` folds inside
    whole-stage codegen; DuckDB twin via nested list_reduce with
    single-item-list elements to satisfy its acc/element type rule).
    Series = each user's first 12 event values in exact cents; the
    candidate pairing (consecutive user ids) stands in for whatever
    blocking a real warped-similarity join would use — the point
    under the gate is the bit-exact DP itself."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import dtw_distance

    ev = read_events(spark, sf_dir).select(
        F.col("user_id").alias("u"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("v"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("u").orderBy("ts", "event_id")
    series = (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 12)
        .groupBy("u")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "v"))),
                lambda s: s["v"],
            ).alias("s")
        )
    )
    a = series.select(F.col("u").alias("user_a"), F.col("s").alias("a"))
    b = series.select(F.col("u").alias("user_b"), F.col("s").alias("b"))
    return (
        a.join(b, F.col("user_b") == F.col("user_a") + 1)
        .select(
            F.col("user_a").cast("bigint").alias("user_a"),
            F.col("user_b").cast("bigint").alias("user_b"),
            dtw_distance(F.col("a"), F.col("b")).alias("dtw_cents"),
        )
    )


@register(
    "emd_price_drift",
    """
    WITH pts AS MATERIALIZED (
      SELECT o_orderkey % 2 AS side,
             LEAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                   // 3000000, 19) AS bin
      FROM orders
    ), hist AS MATERIALIZED (
      SELECT bin,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM pts GROUP BY bin
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
      FROM hist
    ), freq AS MATERIALIZED (
      SELECT bin,
             (na * 1000000) // GREATEST(ta, 1) AS fa,
             (nb * 1000000) // GREATEST(tb, 1) AS fb
      FROM hist CROSS JOIN tot
    ), cum AS MATERIALIZED (
      SELECT bin,
             CAST(SUM(fa - fb) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd
      FROM freq
    )
    SELECT CAST(SUM(ABS(cd)) AS BIGINT) AS emd_ppm_bins,
           CAST(MAX(ABS(cd)) AS BIGINT) AS ks_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM cum
    """,
)
def emd_price_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1) between the order-
    value distributions of the two orderkey-parity halves — in one
    dimension EMD = Σ_bins |CDF_a − CDF_b|, so over ppm-scaled
    20-bin histograms the whole metric is exact integers (and the
    max of the same cumulative differences is the KS statistic for
    free — both emitted). The distribution-shift monitor for training
    mixtures, next to `category_drift_halves`' categorical form; the
    parity halves of a uniform synthetic column give a near-zero
    reading, i.e. the null baseline. One data-sized binning pass;
    everything after runs on the bounded bin table."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = o.select(
        (F.col("o_orderkey") % 2).alias("side"),
        F.least(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                " div 3000000"
            ),
            F.lit(19).cast("bigint"),
        ).alias("bin"),
    )
    hist = pts.groupBy("bin").agg(
        F.sum((F.col("side") == 0).cast("bigint")).alias("na"),
        F.sum((F.col("side") == 1).cast("bigint")).alias("nb"),
    )
    tot = hist.agg(
        F.sum("na").cast("bigint").alias("ta"), F.sum("nb").cast("bigint").alias("tb")
    )
    freq = hist.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.expr("(na * 1000000) div greatest(ta, 1L)").alias("fa"),
        F.expr("(nb * 1000000) div greatest(tb, 1L)").alias("fb"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.select(
        "bin", F.sum(F.col("fa") - F.col("fb")).over(wc).cast("bigint").alias("cd")
    )
    return cum.agg(
        F.sum(F.abs(F.col("cd"))).cast("bigint").alias("emd_ppm_bins"),
        F.max(F.abs(F.col("cd"))).cast("bigint").alias("ks_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )


@register(
    "holt_linear_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, y, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
      FROM tiers
    ), arrs AS MATERIALIZED (
      SELECT list(y ORDER BY t) AS ys, list(t ORDER BY t) AS ts FROM ranked
    ), folded AS MATERIALIZED (
      SELECT ys, ts,
        list_reduce(
          list_prepend(
            [ys[1], COALESCE(ys[2] - ys[1], CAST(0 AS BIGINT)), ys[1]],
            list_transform(ys[2:], v -> [v])
          ),
          (acc, el) -> list_concat(
            list_concat(
              [(el[1] + acc[1] + acc[2]) // 2,
               (((el[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2]) // 4],
              acc[3:]
            ),
            [acc[1] + acc[2]]
          )
        ) AS st
      FROM arrs
    )
    SELECT r.t, r.y, CAST(f.st[CAST(r.i + 2 AS INT)] AS BIGINT) AS fitted
    FROM ranked r CROSS JOIN folded f
    UNION ALL
    SELECT ts[CAST(len(ts) AS INT)] + h.h AS t, CAST(NULL AS BIGINT) AS y,
           CAST(st[1] + h.h * st[2] AS BIGINT) AS fitted
    FROM folded CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) h
    """,
)
def holt_linear_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of monthly revenue
    (operators/temporal.py holt_linear_fitted — dyadic α=1/2, β=1/4
    so every update is shift/div arithmetic, exact both engines;
    one-step-ahead fitted values for every month plus a 3-month
    forecast). The whole (level, trend, trajectory) state folds over
    the BOUNDED month-tier array via the SQL `aggregate` HOF — the
    Kaplan-Meier discipline applied to forecasting; the DuckDB twin
    folds the same array with list-typed accumulator state."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        holt_linear_fitted,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return holt_linear_fitted(monthly, "m", "cents", horizon=3)


def _ring_oracle(vnodes: int) -> str:
    hmix = _walk_mix_sql("x", "97", 0)
    pmix = _walk_mix_sql("node", "vn", 0)

    def assign(n: int, name: str) -> str:
        return f"""pts{name} AS MATERIALIZED (
      SELECT n.node, v.vn, CAST({pmix} AS BIGINT) AS pos
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS node) n
      CROSS JOIN (SELECT unnest(generate_series(0, {vnodes - 1})) AS vn) v
    ), a{name} AS MATERIALIZED (
      SELECT h.x,
             (MIN({{'d': ((p.pos - h.h) % 4294967296 + 4294967296) % 4294967296,
                    'node': p.node, 'vn': p.vn}})).node AS shard{name}
      FROM hk h CROSS JOIN pts{name} p
      GROUP BY h.x
    )"""

    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS x FROM orders
    ), hk AS MATERIALIZED (
      SELECT x, CAST({hmix} AS BIGINT) AS h FROM keys
    ), {assign(4, "4")}, {assign(5, "5")}
    SELECT CAST(a4.shard4 AS BIGINT) AS shard4,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN a4.shard4 <> a5.shard5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a4.shard4 <> a5.shard5 AND a5.shard5 = 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_to_new
    FROM a4 JOIN a5 ON a5.x = a4.x
    GROUP BY 1
    """


@register("ring_shard_moves", _ring_oracle(64))
def ring_shard_moves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash RING placement and the 4 → 5 node movement
    profile (operators/scaling.py ring_assign — Karger STOC'97 with
    64 vnodes/node, the memcached/Dynamo scheme), side by side with
    `rendezvous_shard_moves`: same minimal-movement property
    (measured 23.1% moved, EVERY move to the new node — growing the
    ring only claims arcs for the newcomer's points; 64 vnodes put
    shard balance at max/avg 1.06 where 16 left 1.50), different
    state trade-off (static precomputable point table vs per-node
    hashing). Assignment is a row-local fold over the LITERAL point
    array — zero shuffle before the bounded aggregate."""
    from dpe_energy_performance_analysis_etl_spark.operators.scaling import ring_assign

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .distinct()
    )
    s4 = ring_assign(keys, "o_orderkey", 4).withColumnRenamed("shard", "shard4")
    s5 = ring_assign(s4, "o_orderkey", 5).withColumnRenamed("shard", "shard5")
    moved = F.col("shard4") != F.col("shard5")
    return s5.groupBy("shard4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
        F.sum((moved & (F.col("shard5") == 4)).cast("int"))
        .cast("bigint")
        .alias("n_moved_to_new"),
    )


@register(
    "allen_relations_sessions",
    """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, epoch_us(ts) // 1000000 AS t,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
      FROM events
    ), flagged AS MATERIALIZED (
      SELECT u, t, rk,
             CASE WHEN t - LAG(t) OVER (PARTITION BY u ORDER BY rk) > 1800
                       OR LAG(t) OVER (PARTITION BY u ORDER BY rk) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
    ), sess AS MATERIALIZED (
      SELECT u, SUM(new_s) OVER (PARTITION BY u ORDER BY rk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid, t
      FROM flagged
    ), ivals AS MATERIALIZED (
      SELECT u, sid, MIN(t) AS s, MAX(t) AS e FROM sess GROUP BY u, sid
    ), tagged AS MATERIALIZED (
      SELECT u, sid, s, e, s // 900 AS hb FROM ivals
    ), pairs AS MATERIALIZED (
      SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
      FROM tagged a JOIN tagged b
        ON b.hb BETWEEN a.hb AND a.hb + 1
       AND a.u <> b.u
       AND b.s - a.s BETWEEN 0 AND 900
       AND (a.s < b.s OR (a.s = b.s AND (a.e < b.e
            OR (a.e = b.e AND a.u < b.u))))
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN e1 < s2 THEN 'before'
                  WHEN e1 = s2 THEN 'meets'
                  WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                  WHEN s1 = s2 THEN 'starts'
                  WHEN e1 = e2 THEN 'finished_by'
                  WHEN e1 > e2 THEN 'contains'
                  ELSE 'overlaps' END AS relation
      FROM pairs
    ) GROUP BY relation
    """,
)
def allen_relations_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (AI Journal 1983) over user sessions:
    classify EVERY cross-user session pair whose starts lie within
    900 s into the seven canonical relations (before / meets /
    overlaps / starts / finished_by / contains / equals — the
    inverses collapse because each unordered pair is oriented ONCE,
    by (s, e, u) lexicographic order) and count each. Two round-7
    corrections to the r6 version: (1) the old `u1 < u2` predicate
    composed with `s1 <= s2` silently dropped every pair whose
    earlier-starting session belonged to the higher user id (~half
    of all pairs; the oracle mirrored the bug so the gate could not
    see it) — the canonical orientation is now TIME-ONLY (`u1 <>
    u2`, lex (s, e, u) as the sole dedup rule); (2) the start-gap
    default shrank 3600 → 900 s so worst-case candidate volume in a
    dense corpus stays bounded — cross-user pairs per bucket grow
    with user density squared, and the gap is the knob that keeps
    the growth O(sessions · density · gap), the r6 sf5 scale-table
    lesson. Completes the temporal-join taxonomy next to
    asof/range/interval-coverage: sessionization is the per-user
    window pass; candidate pairs come from a gap-bucket equi-join
    with the bounded start gap — never an interval cross product.
    Exact integer second arithmetic throughout."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        F.col("user_id").alias("u"),
        epoch_seconds("ts").alias("t"),
        "ts",
        "event_id",
    )
    wr = Window.partitionBy("u").orderBy("ts", "event_id")
    flagged = ev.withColumn("rk", F.row_number().over(wr)).withColumn(
        "new_s",
        (
            F.lag("t").over(wr).isNull()
            | (F.col("t") - F.lag("t").over(wr) > 1800)
        ).cast("int"),
    )
    # cumsum MUST order by the unique rank: epoch seconds tie within
    # a user (microsecond ts truncates), and tie-ambiguous cumsums
    # diverge across engines (gate-caught: 11 sessions differed)
    wc = Window.partitionBy("u").orderBy("rk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(wc))
    ivals = sess.groupBy("u", "sid").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    tagged = ivals.withColumn("hb", F.expr("s div 900"))
    a = tagged.select(
        F.col("u").alias("u1"), F.col("s").alias("s1"), F.col("e").alias("e1"),
        F.col("hb").alias("hb1"),
    ).withColumn("hb", F.explode(F.array(F.col("hb1"), F.col("hb1") + 1)))
    b = tagged.select(
        F.col("u").alias("u2"), F.col("s").alias("s2"), F.col("e").alias("e2"),
        F.col("hb").alias("hb"),
    )
    pairs = (
        a.join(b, "hb")
        .where(
            (F.col("u1") != F.col("u2"))
            & (F.col("s2") - F.col("s1")).between(0, 900)
            & (
                (F.col("s1") < F.col("s2"))
                | (
                    (F.col("s1") == F.col("s2"))
                    & (
                        (F.col("e1") < F.col("e2"))
                        | ((F.col("e1") == F.col("e2")) & (F.col("u1") < F.col("u2")))
                    )
                )
            )
        )
        .select("s1", "e1", "s2", "e2")
    )
    rel = (
        F.when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when(F.col("s1") == F.col("s2"), "starts")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .when(F.col("e1") > F.col("e2"), "contains")
        .otherwise("overlaps")
    )
    return pairs.select(rel.alias("relation")).groupBy("relation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# =====================================================================
# Round 7, wave 1: densest subgraph (Bahmani parallel peeling)
# =====================================================================

def _densest_oracle(iterations: int, eps_num: int = 1, eps_den: int = 2) -> str:
    """Chained-CTE replay of the Bahmani peel (operators/graph.py
    densest_subgraph): per round a degree table, a 1-row stats table,
    the cross-multiplied keep rule, then the argmax round by the
    integer density key ne·2²⁰ div nv (ties → earliest round — the
    same key the Spark loop tracks driver-side). Every CTE is
    MATERIALIZED (the k-core lesson: default inlining re-evaluates
    the whole peel prefix per reference)."""
    thr = 2 * (eps_den + eps_num)
    blocks = [
        """
    WITH e0 AS MATERIALIZED (
      SELECT least(a.l_partkey, b.l_partkey) AS a,
             greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""
    ]
    for i in range(iterations + 1):
        blocks.append(
            f""", d{i} AS MATERIALIZED (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i})
      GROUP BY v
    ), s{i} AS MATERIALIZED (
      SELECT {i} AS r,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d{i}) AS nv,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e{i}) AS ne
    )"""
        )
        if i < iterations:
            blocks.append(
                f""", keep{i} AS MATERIALIZED (
      SELECT v FROM d{i}, s{i}
      WHERE deg * nv * {eps_den} > {thr} * ne
    ), e{i + 1} AS MATERIALIZED (
      SELECT e{i}.a, e{i}.b FROM e{i}
      JOIN keep{i} x ON e{i}.a = x.v JOIN keep{i} y ON e{i}.b = y.v
    )"""
            )
    stats_union = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(iterations + 1)
    )
    mem_union = " UNION ALL ".join(
        f"SELECT {i} AS r, v, deg FROM d{i}" for i in range(iterations + 1)
    )
    blocks.append(
        f""", stats AS MATERIALIZED ({stats_union})
    , best AS MATERIALIZED (
      SELECT r, nv, ne, CAST(ne * 1048576 // nv AS BIGINT) AS dens
      FROM stats WHERE nv > 0
      ORDER BY dens DESC, r ASC LIMIT 1
    ), mem AS ({mem_union})
    SELECT m.v, m.deg, CAST(b.r AS BIGINT) AS best_round,
           b.nv AS n_nodes, b.ne AS n_edges, b.dens AS density_scaled
    FROM mem m JOIN best b ON m.r = b.r"""
    )
    return "".join(blocks)


@register("densest_subgraph_parts", _densest_oracle(8, eps_num=0, eps_den=1))
def densest_subgraph_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest subgraph of the recurring part-copurchase graph
    (operators/graph.py densest_subgraph — Bahmani et al. VLDB'12
    parallel peeling, ε=0 → threshold = the current average degree,
    2-approximation): the community core that avg-degree and
    kcore_membership miss because their thresholds don't ratchet
    with the shrinking graph. ε=0 chosen by measurement: on this
    graph ε=1/2 peels 80% of nodes in round 1 and density only
    falls (best = the input — a vacuous green, the k-truss lesson),
    while ε=0's gentler avg-degree threshold finds a genuinely
    denser 915-node core at round 1 (2.08 vs 1.92 edges/node at
    sf0.01). Same support≥2 graph as kcore/ktruss; 8 fixed peel
    rounds registered
    for oracle parity (peeling is confluent, so the unrolled CTE
    replay matches the loop's prefix; the operator's iterations=None
    mode peels to the (nv, ne) fixpoint with two bounded scalar
    pulls per round)."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        densest_subgraph,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return densest_subgraph(pairs, eps_num=0, eps_den=1, iterations=8)


# =====================================================================
# Round 7, wave 2: split-conformal prediction intervals
# =====================================================================

@register(
    "conformal_interval_orders",
    """
    WITH base AS MATERIALIZED (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             xor((xor(o_orderkey % 4294967296,
                      (o_orderkey % 4294967296) >> 16) * 73244475)
                   % 4294967296,
                 ((xor(o_orderkey % 4294967296,
                       (o_orderkey % 4294967296) >> 16) * 73244475)
                   % 4294967296) >> 16) % 4 AS sp
      FROM orders
    ), model AS MATERIALIZED (
      SELECT grp, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS m
      FROM base WHERE sp = 0 GROUP BY grp
    ), cal AS MATERIALIZED (
      SELECT base.grp, ABS(cents - m) AS score
      FROM base JOIN model ON base.grp = model.grp WHERE sp = 1
    ), ks AS MATERIALIZED (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(((COUNT(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
      FROM cal GROUP BY grp
    ), ranked AS (
      SELECT grp, score,
             row_number() OVER (PARTITION BY grp ORDER BY score) AS rk
      FROM cal
    ), qh AS MATERIALIZED (
      SELECT r.grp, ks.n_cal, ks.k, r.score AS qhat_cents
      FROM ranked r JOIN ks ON r.grp = ks.grp AND r.rk = ks.k
    ), test AS MATERIALIZED (
      SELECT base.grp, ABS(cents - m) AS score
      FROM base JOIN model ON base.grp = model.grp WHERE sp >= 2
    ), cov AS (
      SELECT t.grp, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.score <= q.qhat_cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM test t JOIN qh q ON t.grp = q.grp GROUP BY t.grp
    )
    SELECT q.grp, q.n_cal, q.k, q.qhat_cents, c.n_test,
           CAST(c.covered * 1000000 // GREATEST(c.n_test, 1) AS BIGINT)
             AS covered_ppm
    FROM qh q JOIN cov c ON q.grp = c.grp
    """,
)
def conformal_interval_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (operators/stats.py
    conformal_qhat + operators/quantiles.py grouped_kth_smallest —
    Vovk et al. 2005 / Lei et al. JASA'18) for order totals by
    priority: a portable-hash 4-way split (train / calibration /
    2x test), a train-half integer-mean model, nonconformity =
    |cents − mean| in exact cents, q̂ = the ⌈(n+1)·0.9⌉-th smallest
    calibration score via range-partitioned parallel ranking (no
    per-group global sort window — 5 huge groups would otherwise pin
    5 executors), and the empirical test-half coverage in ppm. The
    conformal guarantee (coverage ≥ 90% in expectation) is itself
    oracle-checked — everything is rank-based or exact-integer, so
    both engines agree bit-for-bit."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        conformal_qhat,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (_portable_mix32(F.col("o_orderkey")) % 4).alias("sp"),
    ).cache()
    model = (
        base.where(F.col("sp") == 0)
        .groupBy("grp")
        .agg(F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("m"))
    )
    cal = (
        base.where(F.col("sp") == 1)
        .join(F.broadcast(model), "grp")
        .select("grp", F.abs(F.col("cents") - F.col("m")).alias("score"))
        # single consumer since r9: conformal_qhat reads n_cal off the
        # ranking recipe's bounded sizes table (one pass, no cache)
    )
    # 5-row result consumed by the coverage agg AND the final join
    qh = conformal_qhat(cal, "grp", "score", alpha_num=1, alpha_den=10).cache()
    test = (
        base.where(F.col("sp") >= 2)
        .join(F.broadcast(model), "grp")
        .select("grp", F.abs(F.col("cents") - F.col("m")).alias("score"))
    )
    cov = (
        test.join(F.broadcast(qh), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("score") <= F.col("qhat"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        qh.where(F.col("qhat").isNotNull())
        .join(cov, "grp")
        .select(
            "grp",
            "n_cal",
            "k",
            F.col("qhat").alias("qhat_cents"),
            "n_test",
            F.expr("CAST(covered * 1000000 div greatest(n_test, 1L) AS BIGINT)").alias(
                "covered_ppm"
            ),
        )
    )


# =====================================================================
# Round 7, wave 3: Smith-Waterman local alignment
# =====================================================================

@register(
    "smith_waterman_events",
    """
    WITH ids AS MATERIALIZED (
      SELECT et, CAST(dense_rank() OVER (ORDER BY et) AS BIGINT) AS tid
      FROM (SELECT DISTINCT event_type AS et FROM events)
    ), ev AS MATERIALIZED (
      SELECT user_id AS u, tid,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events JOIN ids ON events.event_type = ids.et
    ), series AS MATERIALIZED (
      SELECT u, list(tid ORDER BY rk) AS s
      FROM ev WHERE rk <= 10 GROUP BY u
    ), pairs AS MATERIALIZED (
      SELECT x.u AS user_a, y.u AS user_b, x.s AS a, y.s AS b
      FROM series x JOIN series y ON y.u = x.u + 1
    )
    SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
           CAST(list_max(
             list_reduce(
               list_prepend(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(a, x -> CAST(0 AS BIGINT))),
                 list_transform(b, x -> [x])
               ),
               (acc, bj) -> list_concat(acc, list_reduce(
                 list_prepend([CAST(0 AS BIGINT)],
                              list_transform(range(1, len(a) + 1), i -> [i])),
                 (acc2, el) -> list_append(acc2, GREATEST(
                   CAST(0 AS BIGINT),
                   acc[CAST(len(acc) AS INT) - CAST(len(a) AS INT) - 1
                       + CAST(el[1] AS INT)]
                     + CASE WHEN a[CAST(el[1] AS INT)] = bj[1]
                            THEN CAST(2 AS BIGINT)
                            ELSE CAST(-1 AS BIGINT) END,
                   acc[CAST(len(acc) AS INT) - CAST(len(a) AS INT)
                       + CAST(el[1] AS INT)] - 1,
                   acc2[CAST(len(acc2) AS INT)] - 1))
               ))
             )
           ) AS BIGINT) AS sw_score
    FROM pairs
    """,
)
def smith_waterman_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith-Waterman local alignment score between consecutive
    users' event-type sequences (operators/entity.py
    smith_waterman_score — full O(n·m) local-alignment DP as nested
    codegen `aggregate` folds, +2/−1/−1, max over ALL cells via the
    concatenate-rows trick). The local variant finds the shared
    clickstream MOTIF that DTW (global, distance) and the GSP
    support counts (order-only) both miss. Event types are
    dictionary-encoded to BIGINT through a bounded alphabetical
    dense_rank dim (broadcast) so the DuckDB list_reduce twin keeps
    one element type; series = first 10 events per user; candidate
    pairing (consecutive user ids) stands in for real blocking, as
    in dtw_user_value_series."""
    from pyspark.sql import Window

    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        smith_waterman_score,
    )

    ev0 = read_events(spark, sf_dir)
    ids = (
        ev0.select(F.col("event_type").alias("et"))
        .distinct()
        .withColumn(
            "tid", F.dense_rank().over(Window.orderBy("et")).cast("bigint")
        )
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        ev0.join(F.broadcast(ids), ev0["event_type"] == ids["et"])
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 10)
    )
    series = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rk", "tid"))),
            lambda s: s["tid"],
        ).alias("s")
    ).cache()  # both sides of the consecutive-user self-join
    x = series.select(F.col("u").alias("user_a"), F.col("s").alias("a"))
    y = series.select((F.col("u") - 1).alias("user_a"), F.col("u").alias("user_b"), F.col("s").alias("b"))
    pairs = x.join(y, "user_a")
    return pairs.select(
        F.col("user_a").cast("bigint").alias("user_a"),
        F.col("user_b").cast("bigint").alias("user_b"),
        smith_waterman_score(F.col("a"), F.col("b")).alias("sw_score"),
    )


# =====================================================================
# Round 7, wave 4: Bradley-Terry preference strengths
# =====================================================================

def _bt_oracle(rounds: int = 3) -> str:
    """Unrolled MM rounds over the bounded pairwise game matrix —
    the SQL twin of operators/ml.py bradley_terry_mm's driver-side
    exact-integer loop. Products that can exceed int64 at the 100 TB
    framing (n·10¹², w·10¹², the renormalization p·players·10⁶) run
    in HUGEINT and are cast back down; Python's ints are arbitrary-
    precision, so both engines are exact."""
    head = """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), wl AS MATERIALIZED (
      SELECT CASE WHEN x.c > y.c THEN x.et ELSE y.et END AS w,
             CASE WHEN x.c > y.c THEN y.et ELSE x.et END AS l
      FROM ev x JOIN ev y ON x.u = y.u AND y.rk = x.rk + 1
      WHERE x.et <> y.et AND x.c <> y.c
    ), pc AS MATERIALIZED (
      SELECT w, l, CAST(COUNT(*) AS BIGINT) AS n FROM wl GROUP BY 1, 2
    ), g AS MATERIALIZED (
      SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT w AS i, l AS j, n FROM pc
        UNION ALL SELECT l AS i, w AS j, n FROM pc
      ) GROUP BY 1, 2
    ), players AS MATERIALIZED (SELECT DISTINCT i FROM g
    ), wns AS MATERIALIZED (
      SELECT p.i, CAST(COALESCE(SUM(pc.n), 0) AS BIGINT) AS w
      FROM players p LEFT JOIN pc ON pc.w = p.i GROUP BY p.i
    ), np AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM players
    ), p0 AS MATERIALIZED (
      SELECT i, CAST(1000000 AS BIGINT) AS p FROM players
    )"""
    blocks = [head]
    for k in range(rounds):
        blocks.append(
            f""", d{k} AS MATERIALIZED (
      SELECT g.i,
             SUM((CAST(g.n AS HUGEINT) * 1000000000000)
                 // GREATEST(pi.p + pj.p, 1)) AS d
      FROM g JOIN p{k} pi ON g.i = pi.i JOIN p{k} pj ON g.j = pj.i
      GROUP BY g.i
    ), r{k} AS MATERIALIZED (
      SELECT w.i,
             (CAST(w.w AS HUGEINT) * 1000000000000)
               // GREATEST(COALESCE(d.d, 0), 1) AS p
      FROM wns w LEFT JOIN d{k} d ON w.i = d.i
    ), t{k} AS MATERIALIZED (
      SELECT SUM(p) AS t FROM r{k}
    ), p{k + 1} AS MATERIALIZED (
      SELECT r.i,
             CAST((r.p * np.c * 1000000) // GREATEST(t.t, 1) AS BIGINT) AS p
      FROM r{k} r, np, t{k} t
    )"""
        )
    blocks.append(
        f"""
    SELECT p.i AS player, p.p AS strength_ppm, gg.n AS games, w.w AS wins
    FROM p{rounds} p
    JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS n FROM g GROUP BY i) gg
      ON gg.i = p.i
    JOIN wns w ON w.i = p.i"""
    )
    return "".join(blocks)


@register("bradley_terry_events", _bt_oracle(3))
def bradley_terry_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths (operators/ml.py bradley_terry_mm —
    Hunter's MM, 3 rounds, exact ppm integers) over event types: a
    'match' is each adjacent event pair within a user's timeline
    whose types AND values differ, won by the higher exact-cents
    value — the arena-leaderboard model (P(i beats j) =
    pᵢ/(pᵢ+pⱼ)) applied to the synthetic clickstream. ONE data-sized
    aggregation builds the players²-bounded game matrix; the MM
    rounds run driver-side in exact Python ints (the Markov-
    attribution precedent), and the unrolled HUGEINT SQL twin
    certifies every round bit-for-bit."""
    from pyspark.sql import Window

    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        bradley_terry_mm,
    )

    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("et"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
        "ts",
        "event_id",
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rk", F.row_number().over(wr))
    x = r.select("user_id", F.col("et").alias("et_a"), F.col("c").alias("c_a"), F.col("rk"))
    y = r.select(
        "user_id",
        F.col("et").alias("et_b"),
        F.col("c").alias("c_b"),
        (F.col("rk") - 1).alias("rk"),
    )
    matches = (
        x.join(y, ["user_id", "rk"])
        .where((F.col("et_a") != F.col("et_b")) & (F.col("c_a") != F.col("c_b")))
        .select(
            F.when(F.col("c_a") > F.col("c_b"), F.col("et_a"))
            .otherwise(F.col("et_b"))
            .alias("winner"),
            F.when(F.col("c_a") > F.col("c_b"), F.col("et_b"))
            .otherwise(F.col("et_a"))
            .alias("loser"),
        )
    )
    return bradley_terry_mm(matches, rounds=3)


# =====================================================================
# Round 7, wave 5: Holt-Winters seasonal smoothing
# =====================================================================

@register(
    "holt_winters_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, y, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
      FROM tiers
    ), arrs AS MATERIALIZED (
      SELECT list(y ORDER BY t) AS ys, list(t ORDER BY t) AS ts FROM ranked
    ), folded AS MATERIALIZED (
      SELECT ys, ts,
        list_reduce(
          list_prepend(
            list_concat(
              [list_reduce(ys[1:12], (a, x) -> a + x) // 12,
               CAST(0 AS BIGINT)],
              list_transform(ys[1:12],
                y -> y - list_reduce(ys[1:12], (a, x) -> a + x) // 12)
            ),
            list_transform(ys[13:], v -> [v])
          ),
          (acc, el) -> list_concat(list_concat(list_concat(list_concat(
            [(el[1] - acc[3] + acc[1] + acc[2]) // 2,
             (((el[1] - acc[3] + acc[1] + acc[2]) // 2)
               - acc[1] + 3 * acc[2]) // 4],
            acc[4:14]),
            [(el[1] - ((el[1] - acc[3] + acc[1] + acc[2]) // 2)
              + acc[3]) // 2]),
            acc[15:]),
            [acc[1] + acc[2] + acc[3]])
        ) AS st
      FROM arrs
    )
    SELECT r.t, r.y, CAST(f.st[CAST(r.i + 2 AS INT)] AS BIGINT) AS fitted
    FROM ranked r CROSS JOIN folded f WHERE r.i > 12
    UNION ALL
    SELECT ts[CAST(len(ts) AS INT)] + h.h AS t, CAST(NULL AS BIGINT) AS y,
           CAST(st[1] + h.h * st[2]
                + st[CAST(3 + (h.h - 1) % 12 AS INT)] AS BIGINT) AS fitted
    FROM folded CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) h
    """,
)
def holt_winters_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters seasonal smoothing of monthly revenue
    (operators/temporal.py holt_winters_fitted — dyadic α=1/2, β=1/4,
    γ=1/2 over a 12-month season, init from the first season's mean
    and offsets; one-step-ahead fits for every month past the first
    season plus a 3-month forecast). Completes the smoothing ladder
    ewma (level) → holt_linear (trend) → this (trend + seasonality);
    the whole (level, trend, 12-slot rotating seasonal buffer,
    trajectory) state is ONE flat BIGINT array folded over the
    bounded month-tier array — the DuckDB twin replays it with
    list_reduce and inclusive 1-based slices."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        holt_winters_fitted,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return holt_winters_fitted(monthly, "t", "cents", period=12, horizon=3)


# =====================================================================
# Round 7, wave 6: Apriori frequent triples + rule confidence
# =====================================================================

@register(
    "apriori_triples_brands",
    """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS it
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), ms AS MATERIALIZED (
      SELECT GREATEST(5, COUNT(DISTINCT o) // 1000) AS floor_sup FROM b
    ), f1 AS MATERIALIZED (
      SELECT it FROM b GROUP BY it
      HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), occ AS MATERIALIZED (
      SELECT b.o, b.it FROM b SEMI JOIN f1 ON b.it = f1.it
    ), pr AS MATERIALIZED (
      SELECT x.o, x.it AS i, y.it AS j
      FROM occ x JOIN occ y ON x.o = y.o AND x.it < y.it
    ), f2 AS MATERIALIZED (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS sup2
      FROM pr GROUP BY i, j
      HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), pr2 AS MATERIALIZED (
      SELECT pr.o, pr.i, pr.j FROM pr
      SEMI JOIN f2 ON pr.i = f2.i AND pr.j = f2.j
    ), t3 AS MATERIALIZED (
      SELECT pr2.i AS i1, pr2.j AS i2, z.it AS i3,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM pr2
      JOIN occ z ON pr2.o = z.o AND pr2.j < z.it
      WHERE EXISTS (SELECT 1 FROM f2 WHERE f2.i = pr2.j AND f2.j = z.it)
        AND EXISTS (SELECT 1 FROM f2 WHERE f2.i = pr2.i AND f2.j = z.it)
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT floor_sup FROM ms)
    ), stats AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(support) AS BIGINT) AS ts
      FROM t3
    )
    SELECT t3.i1, t3.i2, t3.i3, t3.support,
           CAST(t3.support * 1000000 // f2.sup2 AS BIGINT) AS conf_ppm
    FROM t3 JOIN f2 ON t3.i1 = f2.i AND t3.i2 = f2.j, stats
    WHERE t3.support * stats.nt > stats.ts
    """,
)
def apriori_triples_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori frequent 3-itemsets over part-BRAND baskets (Agrawal &
    Srikant, VLDB\'94) with rule confidence: baskets = each order\'s
    distinct brands (25-value dimension, so the item space is
    SF-stable), the unordered market-basket sibling of
    gsp_event_sequences. Two-level thresholding, both data-relative
    and cross-engine exact: (1) the Apriori FLOOR — items and pairs
    below greatest(5, n_orders div 1000) leave BEFORE any join and
    candidate triples extend only frequent-pair occurrences with
    both closing sub-pairs checked frequent (on this uniform
    synthetic corpus the floor prunes nothing — documented; on a
    skewed real corpus it is the load-bearing step, exactly like the
    max_df cap on shingles); (2) the REPORTING filter — triples
    ABOVE THE MEAN surviving support (integer cross-multiplied
    sup·n_triples > total_sup), which stays ~half the 2300 possible
    triples at every SF where the round-7 first cut (absolute
    minsup 5 on SF-growing supplier baskets) collapsed to zero rows
    at sf0.1 — caught by the new scale-sweep row-count gate on its
    first run. conf_ppm = support(i1,i2,i3)*10^6 div support(i1,i2)."""
    # Basket-ARRAY plan (r8, VERDICT r7 ask #5 follow-through): the
    # r7 level-wise plan shuffled on the order key FOUR times (basket
    # distinct, frequent-item semi, pair self-join, triple extension
    # join) — measured 12.3 + 6.6 + 7.7 + 9.6 s of its 37 s at sf5.
    # With a BOUNDED item dimension (25 brands), collect_set builds
    # each basket in ONE o-keyed shuffle and every candidate pair /
    # triple explodes ROW-LOCALLY from the sorted array (i < j < k by
    # position); Apriori pruning becomes broadcast semi-joins against
    # the tiny frequent tables, and the only remaining shuffles are
    # map-side-combining aggregations onto <= |items|^2 / |items|^3
    # keys. Measured 37.1 -> 23.5 s at sf5 — and the 23.5 ran at
    # calib 0.648 vs the 37.1's 0.373 (a ~1.7x slower host), so the
    # matched-host ratio is larger; rows bit-identical, oracle green
    # (NOTES round 8). Worst-case explode fan-out is C(|arr|,3) with
    # |arr| <= |frequent items| — bounded by the dimension, which is
    # the documented applicability condition of the array plan (an
    # unbounded item space keeps the r7 join shape instead).
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    baskets = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("it"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("it")).alias("arr"))
        .cache()
    )
    floor_sup = max(5, baskets.count() // 1000)
    items = baskets.select(F.explode("arr").alias("it"))
    f1 = (
        items.groupBy("it")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= floor_sup)
    )
    freq_items = sorted(r["it"] for r in f1.collect())  # bounded dimension
    lit_f1 = F.array(*[F.lit(s) for s in freq_items])
    fb = baskets.select(
        "o", F.array_sort(F.array_intersect("arr", lit_f1)).alias("arr")
    ).where(F.size("arr") >= 2)
    pairs = fb.selectExpr(
        "explode(flatten(transform(arr, (x, i) ->"
        " transform(slice(arr, i + 2, size(arr) - i - 1),"
        " y -> struct(x AS i, y AS j))))) AS p"
    ).select("p.i", "p.j")
    f2 = (
        pairs.groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup2"))
        .where(F.col("sup2") >= floor_sup)
        .cache()
    )
    triples = (
        fb.where(F.size("arr") >= 3)
        .selectExpr(
            "explode(flatten(flatten(transform(arr, (x, i) ->"
            " transform(slice(arr, i + 2, size(arr) - i - 1), (y, j) ->"
            " transform(slice(arr, i + j + 3, size(arr) - i - j - 2),"
            " z -> struct(x AS i1, y AS i2, z AS i3))))))) AS tr"
        )
        .select("tr.i1", "tr.i2", "tr.i3")
        # Apriori closure: all three sub-pairs frequent, pruned on the
        # exploded stream via broadcast semi-joins BEFORE the count
        .join(
            F.broadcast(f2.select(F.col("i").alias("i1"), F.col("j").alias("i2"))),
            ["i1", "i2"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("i").alias("i1"), F.col("j").alias("i3"))),
            ["i1", "i3"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("i").alias("i2"), F.col("j").alias("i3"))),
            ["i2", "i3"],
            "left_semi",
        )
    )
    t3 = (
        triples.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= floor_sup)
        .cache()
    )
    stats = t3.agg(
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum("support").cast("bigint").alias("ts"),
    )
    return (
        t3.crossJoin(F.broadcast(stats))
        .where(F.col("support") * F.col("nt") > F.col("ts"))
        .join(
            f2.select(F.col("i").alias("i1"), F.col("j").alias("i2"), "sup2"),
            ["i1", "i2"],
        )
        .select(
            "i1",
            "i2",
            "i3",
            "support",
            F.expr("CAST(support * 1000000 div sup2 AS BIGINT)").alias("conf_ppm"),
        )
    )


# =====================================================================
# Round 7, wave 7: Fellegi-Sunter EM parameter estimation
# =====================================================================

def _fs_em_oracle(rounds: int = 3) -> str:
    """Unrolled EM rounds over the <=2^3 agreement-pattern table —
    the SQL twin of operators/entity.py fellegi_sunter_em's
    driver-side exact-integer loop (same candidate construction as
    record_linkage_fs). Pattern-likelihood products run in HUGEINT;
    every division site matches the Python loop exactly."""
    head = """
    WITH r AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0
                  THEN replace(c_name, 'Customer', 'Custoner') ELSE c_name END AS name,
             c_nationkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.75e1 ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
      FROM customer
    ), l AS (
      SELECT c_custkey, c_name AS name, c_nationkey, c_acctbal AS bal,
             c_mktsegment AS seg
      FROM customer
    ), nc AS (SELECT COUNT(*) AS n FROM customer
    ), rnd AS MATERIALIZED (
      -- u-estimation population: 6 deterministic hash partners per
      -- customer (scale-LINEAR, unlike any loosened blocking)
      SELECT l.c_custkey AS lk,
             xor((xor((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296,
                      ((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296)
                        >> 16) * 73244475) % 4294967296,
                 ((xor((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296,
                       ((l.c_custkey % 4294967296 + s.s * 40503) % 4294967296)
                         >> 16) * 73244475) % 4294967296) >> 16)
               % (SELECT n FROM nc) AS rk
      FROM l CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS s) s
    ), cand AS MATERIALIZED (
      SELECT (l.name = r.name) AS g1, (l.seg = r.seg) AS g2,
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000) AS g3
      FROM l JOIN r ON l.c_nationkey = r.c_nationkey
                   AND l.name[-3:] = r.name[-3:]
      UNION ALL
      SELECT (l.name = r.name), (l.seg = r.seg),
             (CAST(floor(l.bal * 100 + 0.5) AS BIGINT) // 100000
              = CAST(floor(r.bal * 100 + 0.5) AS BIGINT) // 100000)
      FROM rnd JOIN l ON rnd.lk = l.c_custkey
               JOIN r ON rnd.rk = r.c_custkey
      WHERE rnd.lk <> rnd.rk
    ), pat AS MATERIALIZED (
      SELECT g1, g2, g3, CAST(COUNT(*) AS BIGINT) AS n
      FROM cand GROUP BY 1, 2, 3
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(n) AS BIGINT) AS nt FROM pat
    ), prm0 AS MATERIALIZED (
      SELECT CAST(100000 AS BIGINT) AS p,
             CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
             CAST(900000 AS BIGINT) AS m3,
             CAST(100000 AS BIGINT) AS u1, CAST(100000 AS BIGINT) AS u2,
             CAST(100000 AS BIGINT) AS u3
    )"""
    blocks = [head]
    for k in range(rounds):
        blocks.append(
            f""", w{k} AS MATERIALIZED (
      SELECT g1, g2, g3, n,
        (CAST(p AS HUGEINT)
         * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
         * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
         * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END)) * 1000000
        // GREATEST(
          (CAST(p AS HUGEINT)
           * (CASE WHEN g1 THEN m1 ELSE 1000000 - m1 END)
           * (CASE WHEN g2 THEN m2 ELSE 1000000 - m2 END)
           * (CASE WHEN g3 THEN m3 ELSE 1000000 - m3 END))
          + (CAST(1000000 - p AS HUGEINT)
             * (CASE WHEN g1 THEN u1 ELSE 1000000 - u1 END)
             * (CASE WHEN g2 THEN u2 ELSE 1000000 - u2 END)
             * (CASE WHEN g3 THEN u3 ELSE 1000000 - u3 END)), 1) AS w
      FROM pat, prm{k}
    ), prm{k + 1} AS MATERIALIZED (
      SELECT
        CAST(SUM(n * w) // GREATEST((SELECT nt FROM tot), 1) AS BIGINT) AS p,
        CAST(SUM(CASE WHEN g1 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m1,
        CAST(SUM(CASE WHEN g2 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m2,
        CAST(SUM(CASE WHEN g3 THEN n * w ELSE 0 END) * 1000000
             // GREATEST(SUM(n * w), 1) AS BIGINT) AS m3,
        CAST(SUM(CASE WHEN g1 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u1,
        CAST(SUM(CASE WHEN g2 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u2,
        CAST(SUM(CASE WHEN g3 THEN n * (1000000 - w) ELSE 0 END) * 1000000
             // GREATEST(SUM(n * (1000000 - w)), 1) AS BIGINT) AS u3
      FROM w{k}
    )"""
        )
    blocks.append(
        f"""
    SELECT 'name' AS field, m1 AS m_ppm, u1 AS u_ppm, p AS p_ppm FROM prm{rounds}
    UNION ALL
    SELECT 'segment', m2, u2, p FROM prm{rounds}
    UNION ALL
    SELECT 'balance', m3, u3, p FROM prm{rounds}"""
    )
    return "".join(blocks)


@register("fs_em_customers", _fs_em_oracle(3))
def fs_em_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised Fellegi-Sunter m/u estimation by EM
    (operators/entity.py fellegi_sunter_em — Winkler 1988, the fit
    behind Splink-style linkage). Candidate population = the
    record_linkage_fs blocked perturbed-copy pairs PLUS six
    deterministic hash-partner pairs per customer — the u-estimation
    augmentation real FS deployments use, and it matters: on the
    blocked pairs alone (~94% true matches) EM converged to a
    DEGENERATE split (the "non-match" class absorbed corrupted
    matches, u_name 48%); with the scale-LINEAR random pairs the
    population is ~14% matches and EM recovers the planted truth —
    m_name 87.4% (true 6/7), u_name ~0.1%, m_seg 80.8% (true ~4/5),
    u_seg 16.4% (~1/5 segment collisions), m_bal 99.9% (the $1000
    bucket absorbs the $17.50 shift except at boundaries), u_bal
    11.2% (random bucket collisions). Agreement patterns aggregate
    to <= 8 counted rows in one pass; 3 EM rounds run driver-side in
    exact ppm integers, mirrored bit-for-bit by the unrolled HUGEINT
    SQL twin."""
    from dpe_energy_performance_analysis_etl_spark.operators.entity import (
        fellegi_sunter_em,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    right = cust.select(
        "c_custkey",
        F.when(k % 7 == 0, F.regexp_replace("c_name", "Customer", "Custoner"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        "c_nationkey",
        F.when(k % 3 == 0, F.col("c_acctbal") + 17.5)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(k % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    left = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        "c_nationkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    lb = left.withColumn("tail", F.substring(F.col("name"), -3, 3))
    rb = right.withColumn("tail", F.substring(F.col("name"), -3, 3))
    bucket = lambda c: F.expr(
        f"CAST(floor({c} * 100 + 0.5) AS BIGINT) div 100000"
    )
    comp = lambda l, r: [
        (F.col(f"{l}.name") == F.col(f"{r}.name")).alias("g1"),
        (F.col(f"{l}.seg") == F.col(f"{r}.seg")).alias("g2"),
        (bucket(f"{l}.bal") == bucket(f"{r}.bal")).alias("g3"),
    ]
    blocked = (
        lb.alias("l")
        .join(rb.alias("r"), ["c_nationkey", "tail"])
        .select(*comp("l", "r"))
    )
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        _portable_mix32,
    )

    n_cust = cust.count()
    rnd = (
        left.withColumn("lk", F.col("key"))
        .select("lk")
        .withColumn("s", F.explode(F.array(*[F.lit(i) for i in range(1, 7)])))
        .select(
            "lk",
            (_portable_mix32(F.col("lk"), F.col("s")) % F.lit(n_cust)).alias("rk"),
        )
        .where(F.col("lk") != F.col("rk"))
    )
    random_pairs = (
        rnd.join(left.alias("l"), rnd["lk"] == F.col("l.key"))
        .join(rb.alias("r"), rnd["rk"] == F.col("r.c_custkey"))
        .select(*comp("l", "r"))
    )
    cand = blocked.unionByName(random_pairs)
    out = fellegi_sunter_em(cand, ["g1", "g2", "g3"], rounds=3)
    return out.select(
        F.when(F.col("field") == "g1", "name")
        .when(F.col("field") == "g2", "segment")
        .otherwise("balance")
        .alias("field"),
        "m_ppm",
        "u_ppm",
        "p_ppm",
    )


# =====================================================================
# Round 7, wave 8: multi-word phrase blocklist matching
# =====================================================================

@register(
    "blocklist_phrase_match_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             CAST(unnest(range(1, len(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) + 1)) AS BIGINT) AS pos,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
    ), pat AS MATERIALIZED (
      SELECT pid, phrase,
             CAST(unnest(range(0, len(string_split(phrase, ' ')))) AS BIGINT)
               AS off,
             unnest(string_split(phrase, ' ')) AS ptok,
             CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
      FROM (VALUES (1, 'table hash'), (2, 'merge group'),
                   (3, 'customer join'), (4, 'slow key scan'),
                   (5, 'sort merge group')) v(pid, phrase)
    ), hits AS MATERIALIZED (
      SELECT tok.doc_id, pat.pid, pat.phrase, pat.plen,
             tok.pos - pat.off AS anchor,
             COUNT(*) AS n_off
      FROM tok JOIN pat ON tok.t = pat.ptok
      GROUP BY 1, 2, 3, 4, 5
    ), full_hits AS (
      SELECT doc_id, pid, phrase, anchor FROM hits WHERE n_off = plen
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM full_hits GROUP BY phrase
    """,
)
def blocklist_phrase_match_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-word phrase blocklist matching over the corpus — the
    filter-list primitive (bad-phrase removal, policy screening)
    beside decontaminate_overlap's n-gram benchmark overlap. The
    scale mechanism is the classic position-anchor inverted join
    (Rabin-Karp's verify step relationalized): tokens equi-join the
    broadcast (pattern, offset, token) table on TOKEN ONLY, each
    match votes for anchor = pos − offset, and a phrase occurrence
    is an anchor whose vote count equals the phrase length — no
    substring scan, no per-pattern pass over the corpus; candidate
    volume is Σ_token df(token)·patterns_containing(token), bounded
    by the blocklist's vocabulary selectivity. Handles repeated
    tokens inside a phrase correctly (each offset must vote for the
    SAME anchor). Returns per phrase (n_hits, n_docs)."""
    docs = read_documents(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("pos0", "t"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    phrases = [
        (1, "table hash"),
        (2, "merge group"),
        (3, "customer join"),
        (4, "slow key scan"),
        (5, "sort merge group"),
    ]
    pat = (
        spark.createDataFrame(phrases, "pid int, phrase string")
        .select(
            "pid",
            "phrase",
            F.posexplode(F.split("phrase", " ")).alias("off", "ptok"),
            F.size(F.split("phrase", " ")).cast("bigint").alias("plen"),
        )
        .select("pid", "phrase", F.col("off").cast("bigint").alias("off"), "ptok", "plen")
    )
    hits = (
        tok.join(F.broadcast(pat), tok["t"] == pat["ptok"])
        .groupBy(
            "doc_id", "pid", "phrase", "plen",
            (F.col("pos") - F.col("off")).alias("anchor"),
        )
        .agg(F.count(F.lit(1)).alias("n_off"))
        .where(F.col("n_off") == F.col("plen"))
    )
    return hits.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
    )


# =====================================================================
# Round 7, wave 9: rank-biased overlap between rankings
# =====================================================================

# RBO_p (Webber, Moffat & Zobel, TOIS 2010) at p = 1/2, depth 20:
# RBO = (1-p)·Σ p^(d-1)·A_d = Σ_d overlap_d / (d·2^d). Every term is
# made EXACT by scaling with D = 2^20 · lcm(1..20): the per-depth
# integer weights below are D/(d·2^d) (all divisions exact), so
# rbo_scaled = Σ overlap_d · w_d is a plain BIGINT sum ≤ D ≈ 2.44e14
# — no floats anywhere, identical in both engines. Identical top-20
# lists score D·(1 − 2⁻²⁰) (the truncated-series maximum).
_RBO_D = 244100691394560
_RBO_W = [
    122050345697280, 30512586424320, 10170862141440, 3814073303040,
    1525629321216, 635678883840, 272433807360, 119189790720,
    52973240320, 23837958144, 10835435520, 4966241280, 2292111360,
    1064194560, 496624128, 232792560, 109549440, 51731680, 24504480,
    11639628,
]


@register(
    "rbo_rankings_brands",
    """
    WITH agg AS MATERIALIZED (
      SELECT p.p_brand AS brand, l.l_partkey AS pk,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), ra AS MATERIALIZED (
      SELECT brand, pk,
             row_number() OVER (PARTITION BY brand
               ORDER BY rev DESC, pk ASC) AS r
      FROM agg
    ), rb AS MATERIALIZED (
      SELECT brand, pk,
             row_number() OVER (PARTITION BY brand
               ORDER BY qty DESC, pk ASC) AS r
      FROM agg
    ), lists AS MATERIALIZED (
      SELECT a.brand,
             (SELECT list(pk ORDER BY r) FROM ra
               WHERE ra.brand = a.brand AND ra.r <= 20) AS la,
             (SELECT list(pk ORDER BY r) FROM rb
               WHERE rb.brand = a.brand AND rb.r <= 20) AS lb
      FROM (SELECT DISTINCT brand FROM agg) a
    )
    SELECT brand,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 21), d ->
                 CAST(len(list_intersect(la[1:CAST(d AS INT)],
                                         lb[1:CAST(d AS INT)])) AS BIGINT)
                 * ([122050345697280, 30512586424320, 10170862141440,
                     3814073303040, 1525629321216, 635678883840,
                     272433807360, 119189790720, 52973240320,
                     23837958144, 10835435520, 4966241280, 2292111360,
                     1064194560, 496624128, 232792560, 109549440,
                     51731680, 24504480, 11639628])[CAST(d AS INT)])),
             (acc, x) -> acc + x) AS BIGINT) AS rbo_scaled,
           CAST(len(list_intersect(la[1:20], lb[1:20])) AS BIGINT)
             AS overlap_20
    FROM lists
    """,
)
def rbo_rankings_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber-Moffat-Zobel, TOIS 2010) between
    each brand's top-20 parts BY REVENUE and BY QUANTITY — the
    top-weighted ranking-agreement metric that Kendall/Spearman
    (all-pairs, depth-blind) and plain overlap@k (order-blind) both
    miss; the eval primitive for comparing retrieval/recommender
    rankings. p = 1/2 makes every geometric weight dyadic, and the
    whole score is integer-scaled by D = 2^20·lcm(1..20) so
    rbo_scaled = Σ_d |S_d ∩ T_d|·(D div (d·2^d)) is an exact BIGINT
    on both engines. Rankings are deterministic ((metric DESC, pk)
    order over exact integer aggregates); per-depth intersections
    run on ≤20-element arrays inside codegen — O(k²) work per brand,
    data shuffled once for the (brand, part) aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    from pyspark.sql import Window

    agg = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum((F.col("l_extendedprice").cast("decimal(30,2)") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
        .cache()
    )
    wa = Window.partitionBy("brand").orderBy(F.col("rev").desc(), F.col("pk").asc())
    wb = Window.partitionBy("brand").orderBy(F.col("qty").desc(), F.col("pk").asc())
    la = (
        agg.withColumn("r", F.row_number().over(wa))
        .where("r <= 20")
        .groupBy("brand")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "pk"))), lambda s: s["pk"]
            ).alias("la")
        )
    )
    lb = (
        agg.withColumn("r", F.row_number().over(wb))
        .where("r <= 20")
        .groupBy("brand")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "pk"))), lambda s: s["pk"]
            ).alias("lb")
        )
    )
    w_arr = F.array(*[F.lit(w).cast("bigint") for w in _RBO_W])
    lists = la.join(lb, "brand")
    rbo = F.aggregate(
        F.sequence(F.lit(1), F.lit(20)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc
        + F.size(
            F.array_intersect(
                F.slice(F.col("la"), 1, d), F.slice(F.col("lb"), 1, d)
            )
        ).cast("bigint")
        * F.element_at(w_arr, d.cast("int")),
    )
    return lists.select(
        "brand",
        rbo.alias("rbo_scaled"),
        F.size(F.array_intersect(F.col("la"), F.col("lb")))
        .cast("bigint")
        .alias("overlap_20"),
    )


# =====================================================================
# Round 7, wave 10: quantile normalization across sources
# =====================================================================

@register(
    "quantile_normalize_doclen",
    """
    WITH g AS MATERIALIZED (
      SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS grank,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS gr,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ng,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM documents
    )
    SELECT a.source, CAST(a.doc_id AS BIGINT) AS doc_id,
           CAST(a.n_chars AS BIGINT) AS n_chars,
           CAST(b.n_chars AS BIGINT) AS qn_value
    FROM (SELECT source, doc_id, n_chars,
                 ((2 * gr - 1) * n + 2 * ng - 1) // (2 * ng) AS idx
          FROM g) a
    JOIN (SELECT grank, n_chars FROM g) b ON a.idx = b.grank
    """,
)
def quantile_normalize_doclen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources
    (operators/quantiles.py quantile_normalize — Bolstad et al. 2003
    applied to corpus curation): every doc's n_chars is replaced by
    the GLOBAL length distribution's order statistic at the doc's
    within-source midpoint quantile ⌈(2r−1)N / 2n_g⌉, making one
    length threshold mean the same thing in every source regardless
    of how skewed each source's raw lengths are. All rank-based —
    no interpolation, engine-exact; the Spark global ranking is the
    repartitionByRange two-pass recipe (the oracle's flat window is
    the sf0.01 shortcut, the operator's plan is the 100 TB one)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        quantile_normalize,
    )

    docs = read_documents(spark, sf_dir).select("source", "doc_id", "n_chars")
    out = quantile_normalize(docs, "source", "n_chars", "doc_id")
    return out.select(
        "source",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("qn_value").cast("bigint").alias("qn_value"),
    )


# =====================================================================
# Round 7, wave 11: CMS join-size estimate, walk-forward CV splits,
# k-anonymity audit
# =====================================================================

@register(
    "cms_join_size_estimate",
    """
    WITH lk AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
    ), ok AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
    ), lh AS MATERIALIZED (
      SELECT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(k, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM lk
    ), oh AS MATERIALIZED (
      SELECT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(k, '.'),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000000000000
             ) % 999999937 AS hp
      FROM ok
    ), ls AS MATERIALIZED (
      SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT 0 AS row, ((31 * hp + 7) % 999999937) % 65536 AS cell FROM lh
        UNION ALL SELECT 1, ((37 * hp + 11) % 999999937) % 65536 FROM lh
        UNION ALL SELECT 2, ((41 * hp + 13) % 999999937) % 65536 FROM lh
      ) GROUP BY 1, 2
    ), os AS MATERIALIZED (
      SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT 0 AS row, ((31 * hp + 7) % 999999937) % 65536 AS cell FROM oh
        UNION ALL SELECT 1, ((37 * hp + 11) % 999999937) % 65536 FROM oh
        UNION ALL SELECT 2, ((41 * hp + 13) % 999999937) % 65536 FROM oh
      ) GROUP BY 1, 2
    ), est AS (
      SELECT CAST(MIN(dot) AS BIGINT) AS est FROM (
        SELECT ls.row, SUM(ls.cnt * os.cnt) AS dot
        FROM ls JOIN os ON ls.row = os.row AND ls.cell = os.cell
        GROUP BY ls.row
      )
    ), exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT est.est, exact.exact,
           CAST((est.est - exact.exact) * 1000000 // exact.exact AS BIGINT)
             AS over_ppm
    FROM est, exact
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two Count-Min sketches
    (operators/sketch.py cms_inner_product — Cormode-Muthukrishnan
    §4.2): |lineitem ⋈ orders| estimated as the min-over-rows sketch
    dot product, beside the exact join count and the overestimate in
    ppm — the planner-style "how big is this join" primitive that
    needs only two ≤ 3×512-cell sketches, mergeable across
    partitions/batches like every sketch in this repo. CM inner
    products only OVERestimate (collisions add mass) — the oracle
    certifies est, exact, and the gap bit-for-bit."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    # width sized for the inner-product bound e/w * F1(L) * F1(O): at
    # 512 the uniform 15k-key FK join is CM's worst case (measured 28x
    # overestimate); 65536 cells bring the certified bound to ~1.6x
    # while the sketch stays 3 x 64Ki rows - mergeable and tiny. Size
    # w ~ e * F1A * F1B / (eps * J) for a target relative error.
    est = cms_inner_product(
        cms_build(li, "k", width=65536), cms_build(o, "k", width=65536)
    )
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = (
        li2.join(o2, li2["l_orderkey"] == o2["o_orderkey"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est",
        "exact",
        F.expr("CAST((est - exact) * 1000000 div exact AS BIGINT)").alias(
            "over_ppm"
        ),
    )


@register(
    "walk_forward_splits_orders",
    """
    WITH m AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS mo
      FROM orders
    ), span AS MATERIALIZED (
      SELECT CAST(MIN(mo) AS BIGINT) AS mn, CAST(MAX(mo) AS BIGINT) AS mx
      FROM m
    ), folds AS MATERIALIZED (
      SELECT f, (SELECT mn FROM span)
                + ((SELECT mx FROM span) - (SELECT mn FROM span)) * f // 6
                AS train_end
      FROM (SELECT unnest([1, 2, 3, 4]) AS f)
    )
    SELECT CAST(f AS BIGINT) AS fold, train_end,
           train_end + 2 AS test_start,
           LEAST(train_end + 7, (SELECT mx FROM span)) AS test_end,
           CAST((SELECT COUNT(*) FROM m WHERE mo <= train_end) AS BIGINT)
             AS n_train,
           CAST((SELECT COUNT(*) FROM m
                 WHERE mo BETWEEN train_end + 2
                   AND LEAST(train_end + 7, (SELECT mx FROM span)))
                AS BIGINT) AS n_test
    FROM folds
    """,
)
def walk_forward_splits_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation splits with a
    purge embargo — the time-series CV discipline (de Prado 2018's
    purged K-fold, walk-forward flavor) that random K-fold violates
    by leaking future into train: 4 folds with train_end at
    min + span·f/6 (anchored to the DATA's month range — a 1992
    epoch anchor left fold 1 empty on this corpus, caught by
    inspection), ONE embargoed month (orders placed in it belong
    to neither side — label horizons overlap the boundary), then a
    6-month test window. All boundaries are exact integer month
    arithmetic from a single data-derived scalar; the per-fold
    train/test counts are conditional aggregates over ONE pass of
    the month column (no per-fold scans at scale — the fold table
    is 4 rows, broadcast)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("mo")
    ).cache()
    mn, mx = m.agg(F.min("mo"), F.max("mo")).collect()[0]
    folds = spark.createDataFrame(
        [
            (
                f,
                mn + (mx - mn) * f // 6,
                mn + (mx - mn) * f // 6 + 2,
                min(mn + (mx - mn) * f // 6 + 7, mx),
            )
            for f in range(1, 5)
        ],
        "fold bigint, train_end bigint, test_start bigint, test_end bigint",
    )
    counts = m.crossJoin(F.broadcast(folds)).groupBy(
        "fold", "train_end", "test_start", "test_end"
    ).agg(
        F.sum((F.col("mo") <= F.col("train_end")).cast("int"))
        .cast("bigint")
        .alias("n_train"),
        F.sum(
            (
                (F.col("mo") >= F.col("test_start"))
                & (F.col("mo") <= F.col("test_end"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_test"),
    )
    return counts


@register(
    "k_anonymity_audit_customers",
    """
    WITH qi AS MATERIALIZED (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS balb,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS sens
      FROM customer
    ), grp AS MATERIALIZED (
      SELECT nat, seg, balb, CAST(COUNT(*) AS BIGINT) AS sz,
             CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_div
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(SUM(CASE WHEN sz < k.k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN sz < k.k THEN sz ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
    FROM grp CROSS JOIN (SELECT unnest([2, 5, 10, 25]) AS k) k
    GROUP BY k.k
    """,
)
def k_anonymity_audit_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007) of the customer table under the quasi-identifier
    (nation, segment, $1000-balance-bucket) with exact balance cents
    as the sensitive attribute — the privacy-risk report that
    belongs beside pseudonymize_pii/pii_redact: for each re-id
    threshold k ∈ {2,5,10,25}, how many QI groups are smaller than k
    and how many ROWS those groups expose, plus the global minimum
    group size and minimum l-diversity. One (QI)-keyed aggregation
    pass; the per-k report is a 4-row broadcast cross over the
    bounded group table."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    qi = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div 100000").alias(
            "balb"
        ),
        cents.alias("sens"),
    )
    grp = qi.groupBy("nat", "seg", "balb").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.count_distinct("sens").cast("bigint").alias("l_div"),
    )
    ks = spark.createDataFrame([(2,), (5,), (10,), (25,)], "k bigint")
    return grp.crossJoin(F.broadcast(ks)).groupBy("k").agg(
        F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("sz").cast("bigint").alias("min_group_size"),
        F.min("l_div").cast("bigint").alias("min_l_diversity"),
    )


# =====================================================================
# Round 7, wave 12: Mann-Whitney U rank-sum test
# =====================================================================

@register(
    "mann_whitney_priority_nations",
    """
    WITH pool AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
    ), vals AS MATERIALIZED (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(s) AS BIGINT) AS cnt1
      FROM pool GROUP BY g, v
    ), pre AS MATERIALIZED (
      SELECT g, v, cnt, cnt1,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before
      FROM vals
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt1) AS BIGINT) AS n1,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt1 * (2 * cnt_before + cnt + 1)) AS BIGINT) AS r1x2
      FROM pre GROUP BY g
    )
    SELECT CAST(g AS BIGINT) AS c_nationkey, n1, n - n1 AS n2,
           r1x2 - n1 * (n1 + 1) AS u1_x2,
           2 * n1 * (n - n1) - (r1x2 - n1 * (n1 + 1)) AS u2_x2,
           CASE WHEN n1 = 0 OR n = n1 THEN NULL
                ELSE CAST(r1x2 - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE)
                     / sqrt(CAST(n1 * (n - n1) * (n + 1) AS DOUBLE) / 3.0e0)
           END AS z
    FROM per
    """,
)
def mann_whitney_priority_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U per customer nation (operators/stats.py
    mann_whitney_u): do URGENT orders run stochastically larger
    totals than LOW ones? The unpaired rank-sum counterpart of the
    grouped Wilcoxon UDAF — and unlike it, pure codegen with exact
    integer DOUBLED mid-ranks (2·cnt_before + cnt + 1 per tie
    block), so the statistic itself is oracle-hashable; only the
    final z is a fixed-order per-row double. The per-group prefix
    counts come from the grouped_running_totals range-partition
    recipe (the oracle's PARTITION BY window is the sf0.01
    shortcut); tie correction omitted, documented."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        mann_whitney_u,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pool = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
        )
    )
    out = mann_whitney_u(pool, "c_nationkey", "urgent", "cents")
    return out.select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "n1",
        "n2",
        "u1_x2",
        "u2_x2",
        "z",
    )


# =====================================================================
# Round 7, wave 13: market concentration (Gini + Herfindahl)
# =====================================================================

@register(
    "concentration_supplier_nations",
    """
    WITH rev AS MATERIALIZED (
      SELECT s.s_nationkey AS g, l.l_suppkey AS sk,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, r,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before,
             CAST(SUM(SUM(CAST(r AS HUGEINT) * r)) OVER (PARTITION BY g)
               AS HUGEINT) AS sum_r2,
             CAST(SUM(SUM(r)) OVER (PARTITION BY g) AS BIGINT) AS s_tot,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM rev GROUP BY g, r
    ), agg AS MATERIALIZED (
      SELECT g, MAX(n) AS n, MAX(s_tot) AS s_tot, MAX(sum_r2) AS sum_r2,
             CAST(SUM(CAST(r AS HUGEINT)
                      * (2 * cnt * cnt_before + cnt * cnt + cnt))
                  AS HUGEINT) AS two_sum_ix
      FROM pre GROUP BY g
    )
    SELECT CAST(g AS BIGINT) AS s_nationkey, CAST(n AS BIGINT) AS n_suppliers,
           s_tot AS total_cents,
           CAST((two_sum_ix - CAST(n + 1 AS HUGEINT) * s_tot) * 1000000
                // (CAST(n AS HUGEINT) * s_tot) AS BIGINT) AS gini_ppm,
           CAST(sum_r2 * 1000000
                // (CAST(s_tot AS HUGEINT) * s_tot) AS BIGINT) AS hhi_ppm
    FROM agg
    """,
)
def concentration_supplier_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report per supplier nation: the Gini
    coefficient (Lorenz-curve inequality of supplier revenues, exact
    rational via G = (2Σᵢ i·xᵢ − (n+1)Σx)/(n·Σx) with the tie-block
    identity 2Σ i·xᵢ = Σ_v v·(2·cnt·cnt_before + cnt² + cnt) — rank
    order among equal values provably cancels) and the Herfindahl-
    Hirschman index (Σ shareᵢ² = Σ rᵢ²/(Σr)²), both in exact ppm.
    Squares of cent totals exceed int64, so the wide intermediates
    run in DECIMAL(38,0) on Spark and HUGEINT on DuckDB — both exact
    to 10³⁸. Prefix counts use grouped_running_totals' range-
    partition recipe (the oracle's PARTITION BY window is the
    sf0.01 shortcut); one (nation, supplier) aggregation is the
    data-sized pass."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_running_totals,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("g"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(30,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("r")
        )
    )
    vals = rev.groupBy("g", "r").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pre = grouped_running_totals(vals, "g", "r", ["cnt"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    agg = pre.groupBy("g").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("r") * F.col("cnt")).cast("bigint").alias("s_tot"),
        F.sum(dec("r") * dec("r") * dec("cnt")).alias("sum_r2"),
        F.sum(
            dec("r")
            * (
                2 * dec("cnt") * dec("cnt_before")
                + dec("cnt") * dec("cnt")
                + dec("cnt")
            )
        ).alias("two_sum_ix"),
    )
    return agg.select(
        F.col("g").cast("bigint").alias("s_nationkey"),
        F.col("n").alias("n_suppliers"),
        F.col("s_tot").alias("total_cents"),
        F.expr(
            "CAST((two_sum_ix - CAST(n + 1 AS DECIMAL(38,0))"
            " * CAST(s_tot AS DECIMAL(38,0))) * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * CAST(s_tot AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("gini_ppm"),
        F.expr(
            "CAST(sum_r2 * 1000000 div (CAST(s_tot AS DECIMAL(38,0))"
            " * CAST(s_tot AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("hhi_ppm"),
    )


# =====================================================================
# Round 7, wave 14: exact Shapley attribution
# =====================================================================

@register(
    "shapley_attribution_events",
    """
    WITH r AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ), conv AS MATERIALIZED (
      SELECT u, MIN(rk) AS crk FROM r WHERE et = 'purchase' GROUP BY u
    ), ch AS MATERIALIZED (
      SELECT et, 1 << (CAST(dense_rank() OVER (ORDER BY et) AS INT) - 1)
               AS bit
      FROM (SELECT DISTINCT et FROM r WHERE et <> 'purchase')
    ), nch AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS INT) AS n FROM ch
    ), expo AS MATERIALIZED (
      SELECT conv.u, CAST(COALESCE(SUM(DISTINCT ch.bit), 0) AS BIGINT) AS mask
      FROM conv
      LEFT JOIN r ON r.u = conv.u AND r.rk < conv.crk AND r.et <> 'purchase'
      LEFT JOIN ch ON ch.et = r.et
      GROUP BY conv.u
    ), cnt AS MATERIALIZED (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM expo GROUP BY mask
    ), subsets AS MATERIALIZED (
      SELECT CAST(unnest(range(0, 1 << (SELECT n FROM nch))) AS BIGINT) AS s
    ), v AS MATERIALIZED (
      SELECT subsets.s, CAST(COALESCE(SUM(cnt.c), 0) AS BIGINT) AS v
      FROM subsets LEFT JOIN cnt ON (cnt.mask & subsets.s) = cnt.mask
      GROUP BY subsets.s
    ), fct AS MATERIALIZED (
      SELECT [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880] AS f
    )
    SELECT ch.et AS channel,
           CAST(SUM(
             (SELECT f FROM fct)[bit_count(s0.s) + 1]
             * (SELECT f FROM fct)[(SELECT n FROM nch) - bit_count(s0.s)]
             * (s1.v - s0.v)
           ) AS BIGINT) AS phi_x_fact,
           CAST((SELECT f FROM fct)[(SELECT n FROM nch) + 1] AS BIGINT)
             AS fact_scale,
           CAST((SELECT v FROM v
                 WHERE s = (1 << (SELECT n FROM nch)) - 1) AS BIGINT)
             AS conversions
    FROM ch
    JOIN v s0 ON (s0.s & ch.bit) = 0
    JOIN v s1 ON s1.s = s0.s + ch.bit
    GROUP BY ch.et
    """,
)
def shapley_attribution_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution across the four
    non-purchase channels (operators/temporal.py shapley_attribution
    — Shapley 1953, the coalition-game complement of
    markov_attribution_events' removal effects): v(S) = converters
    whose pre-purchase exposure set fits inside coalition S; φ
    returned ×n! so the whole computation is division-free exact
    integers. One data-sized pass to ≤2ⁿ exposure-mask counts; the
    2ⁿ-coalition Shapley sum runs driver-side (Python ints) and the
    oracle replays it relationally — subsets as a bitmask range,
    containment as (mask & S) = mask, factorial weights from a
    literal array."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        shapley_attribution,
    )

    return shapley_attribution(read_events(spark, sf_dir))


# =====================================================================
# Round 8, wave 1: collocations, FD discovery, log-rank, DiD,
# seasonal decomposition, next-event backtest
# =====================================================================

@register(
    "pmi_collocations_docs",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
             CAST(unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+'))))
                  AS BIGINT) AS pos
      FROM documents
    ), uni AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), nt AS MATERIALIZED (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
    ), c12 AS MATERIALIZED (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT w1, w2, c12, a.c AS c1, b.c AS c2,
           CAST((CAST(c12 - 5 AS HUGEINT) * nt.n * 1000000)
                // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS score_ppm
    FROM c12 JOIN uni a ON c12.w1 = a.w JOIN uni b ON c12.w2 = b.w, nt
    ORDER BY score_ppm DESC, w1, w2 LIMIT 50
    """,
)
def pmi_collocations_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec phrase-pass collocations (text/retrieval.py
    pmi_collocations — Mikolov et al. NeurIPS'13 section 4: discounted
    PMI score (c12 - 5)*N/(c1*c2), the preprocessing that promotes
    'new york'-class bigrams to vocabulary units before tokenizer /
    embedding training). Exact-integer score_ppm via DECIMAL(38,0) /
    HUGEINT cross-multiplication — no log anywhere; top-50 with
    deterministic (score, w1, w2) tie-break over the support-floored
    pair table."""
    from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
        pmi_collocations,
    )

    return pmi_collocations(
        read_documents(spark, sf_dir), min_count=5, discount=5, top_k=50
    )


_FD_COLS = ["c_name", "c_nationkey", "c_mktsegment"]
# injective null encoding ('n' / 'v' || value) mirroring
# operators/quality.py fd_discovery — a bare sentinel would conflate a
# genuine value equal to the sentinel with NULL (ADVICE r8)
_FD_ARMS = "\n      UNION ALL\n".join(
    f"""      SELECT '{a}' AS lhs, '{b}' AS rhs,
             CASE WHEN {a} IS NULL THEN 'n'
                  ELSE 'v' || CAST({a} AS VARCHAR) END AS lv,
             CASE WHEN {b} IS NULL THEN 'n'
                  ELSE 'v' || CAST({b} AS VARCHAR) END AS rv
      FROM customer"""
    for a in _FD_COLS
    for b in _FD_COLS
    if a != b
)


@register(
    "fd_discovery_customer",
    f"""
    WITH stacked AS MATERIALIZED (
{_FD_ARMS}
    ), dv AS MATERIALIZED (
      SELECT DISTINCT lhs, rhs, lv, rv FROM stacked
    ), per_lv AS MATERIALIZED (
      SELECT lhs, rhs, lv, CAST(COUNT(*) AS BIGINT) AS n_rv
      FROM dv GROUP BY 1, 2, 3
    )
    SELECT lhs, rhs,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
           CAST(SUM(n_rv) AS BIGINT) AS n_lhs_rhs_pairs,
           CAST(count_if(n_rv > 1) AS BIGINT) AS n_violating_lhs,
           CAST(CASE WHEN MAX(n_rv) > 1 THEN 0 ELSE 1 END AS BIGINT) AS holds
    FROM per_lv GROUP BY 1, 2
    """,
)
def fd_discovery_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-1 functional-dependency discovery over the customer
    category columns (operators/quality.py fd_discovery — the TANE
    single-column lattice, Huhtala et al. 1999): all 6 ordered pairs
    of (name, nationkey, mktsegment) profiled in ONE exploded pass
    (the oracle rescans per pair — fine at sf0.01, exactly what the
    Spark plan avoids at scale). c_name is a key in disguise, so
    name -> nation and name -> segment HOLD (key discovery) while
    every reverse direction violates — both branches of the gate
    exercised."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import fd_discovery

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return fd_discovery(c, _FD_COLS)


@register(
    "logrank_orders",
    """
    WITH subj AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(ev * g) AS BIGINT) AS d1,
             CAST(COUNT(*) AS BIGINT) AS tot,
             CAST(SUM(g) AS BIGINT) AS tot1
      FROM subj GROUP BY 1
    ), ar AS MATERIALIZED (
      SELECT t, d, d1,
             CAST(SUM(tot) OVER () - COALESCE(SUM(tot) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n,
             CAST(SUM(tot1) OVER () - COALESCE(SUM(tot1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1,
             CAST(SUM(tot) OVER () AS BIGINT) AS n_subjects,
             CAST(SUM(tot1) OVER () AS BIGINT) AS n_group1
      FROM tiers
    ), contrib AS MATERIALIZED (
      SELECT n_subjects, n_group1, d1,
             CAST((CAST(d AS HUGEINT) * n1 * 1000000) // n AS BIGINT) AS e1_t,
             CAST(CASE WHEN n > 1 THEN
               (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
               // (CAST(n AS HUGEINT) * n * (n - 1))
             ELSE 0 END AS BIGINT) AS v_t
      FROM ar WHERE d > 0
    ), agg AS (
      SELECT n_subjects, n_group1,
             CAST(SUM(d1) AS BIGINT) AS o1_events,
             CAST(SUM(e1_t) AS BIGINT) AS e1_ppm,
             CAST(SUM(v_t) AS BIGINT) AS v_ppm
      FROM contrib GROUP BY 1, 2
    )
    SELECT n_subjects, n_group1, o1_events, e1_ppm, v_ppm,
           CAST(CASE WHEN v_ppm > 0 THEN
             (CAST(o1_events * 1000000 - e1_ppm AS HUGEINT)
              * (o1_events * 1000000 - e1_ppm) * 1000)
             // (CAST(v_ppm AS HUGEINT) * 1000000)
           ELSE 0 END AS BIGINT) AS chi2_milli
    FROM agg
    """,
)
def logrank_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (operators/stats.py logrank_test —
    Mantel '66 / Peto & Peto '72): do URGENT/HIGH-priority orders
    finalize on a different survival curve than the rest? Month tiers
    since 1992-01 as in kaplan_meier_orders, status 'F' = event. The
    per-tier hypergeometric E1/V are floored at ppm and summed as
    exact integers (the KM fold discipline applied to inference);
    products run in DECIMAL(38,0) / HUGEINT."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import logrank_test

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
    )
    return logrank_test(subj, "t", "ev", "g")


@register(
    "did_priority_revenue",
    """
    WITH base AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
      FROM orders
    ), bounds AS MATERIALIZED (
      SELECT MIN(dd) AS d0, MAX(dd) AS d1 FROM base
    ), cells AS (
      SELECT
        CAST(count_if(g = 1 AND (dd - d0) * 2 >= (d1 - d0)) AS BIGINT) AS n_tt,
        CAST(SUM(CASE WHEN g = 1 AND (dd - d0) * 2 >= (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_tt,
        CAST(count_if(g = 1 AND (dd - d0) * 2 < (d1 - d0)) AS BIGINT) AS n_tp,
        CAST(SUM(CASE WHEN g = 1 AND (dd - d0) * 2 < (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_tp,
        CAST(count_if(g = 0 AND (dd - d0) * 2 >= (d1 - d0)) AS BIGINT) AS n_ct,
        CAST(SUM(CASE WHEN g = 0 AND (dd - d0) * 2 >= (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_ct,
        CAST(count_if(g = 0 AND (dd - d0) * 2 < (d1 - d0)) AS BIGINT) AS n_cp,
        CAST(SUM(CASE WHEN g = 0 AND (dd - d0) * 2 < (d1 - d0) THEN cents ELSE 0 END) AS BIGINT) AS sum_cp
      FROM base, bounds
    )
    SELECT n_tt, sum_tt, n_tp, sum_tp, n_ct, sum_ct, n_cp, sum_cp,
           CAST((sum_tt * 1000) // greatest(n_tt, 1) AS BIGINT) AS mean_tt_scaled,
           CAST((sum_tp * 1000) // greatest(n_tp, 1) AS BIGINT) AS mean_tp_scaled,
           CAST((sum_ct * 1000) // greatest(n_ct, 1) AS BIGINT) AS mean_ct_scaled,
           CAST((sum_cp * 1000) // greatest(n_cp, 1) AS BIGINT) AS mean_cp_scaled,
           CAST(((sum_tt * 1000) // greatest(n_tt, 1)
                 - (sum_tp * 1000) // greatest(n_tp, 1))
                - ((sum_ct * 1000) // greatest(n_ct, 1)
                   - (sum_cp * 1000) // greatest(n_cp, 1)) AS BIGINT) AS did_scaled
    FROM cells
    """,
)
def did_priority_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (operators/stats.py
    diff_in_differences — the Card-Krueger 2x2): treated = URGENT/HIGH
    orders, pre/post split at the MIDPOINT OF THE OBSERVED date range
    (data-anchored, the r7 walk-forward lesson — never a schema
    epoch), outcome = order value in exact cents. One
    conditional-aggregate pass for all four cells; means floored once
    at milli-cents; DiD is arithmetic on the floored integers."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        diff_in_differences,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("dd"),
    )
    bounds = base.agg(
        F.min("dd").alias("d0"), F.max("dd").alias("d1")
    )
    flagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "post",
        ((F.col("dd") - F.col("d0")) * 2 >= (F.col("d1") - F.col("d0"))).cast("int"),
    )
    return diff_in_differences(flagged, "g", "post", "cents", scale=1000)


@register(
    "seasonal_decompose_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ma AS MATERIALIZED (
      SELECT t, y,
             COUNT(*) OVER w AS wn,
             CAST(SUM(y) OVER w AS BIGINT) AS ws
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
    ), detr AS MATERIALIZED (
      SELECT t, y, CAST((ws * 1000) // 12 AS BIGINT) AS trend_scaled,
             CAST(y * 1000 - (ws * 1000) // 12 AS BIGINT) AS detrended_scaled
      FROM ma WHERE wn = 12
    ), ranked AS MATERIALIZED (
      SELECT t, detrended_scaled,
             row_number() OVER (PARTITION BY t % 12
               ORDER BY detrended_scaled, t) AS rk,
             COUNT(*) OVER (PARTITION BY t % 12) AS cnt
      FROM detr
    ), med AS MATERIALIZED (
      SELECT t % 12 AS phase, detrended_scaled AS seasonal_scaled
      FROM ranked WHERE rk = (cnt + 1) // 2
    )
    SELECT d.t, d.y, d.trend_scaled, d.detrended_scaled, m.seasonal_scaled,
           CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT)
             AS remainder_scaled
    FROM detr d JOIN med m ON d.t % 12 = m.phase
    """,
)
def seasonal_decompose_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue
    (operators/temporal.py seasonal_decompose — Cleveland et al. 1990
    in exact-integer dialect): centered 12-month ROWS-window
    moving-average trend (interior months only), per-calendar-month
    LOW-MEDIAN seasonal (order statistic — engine-exact per the NOTES
    rule), integer remainder. Every window runs over the bounded
    month-tier table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_decompose,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return seasonal_decompose(monthly, "m", "cents", period=12, scale=1000)


@register(
    "markov_next_event_hitrate",
    """
    WITH seq AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events
    ), tr AS MATERIALIZED (
      SELECT * FROM seq WHERE prev_type IS NOT NULL
    ), model AS MATERIALIZED (
      SELECT prev_type, next_type AS predicted FROM (
        SELECT prev_type, et AS next_type,
               row_number() OVER (PARTITION BY prev_type
                 ORDER BY COUNT(*) DESC, et) AS r
        FROM tr WHERE rk <= (n * 4) // 5
        GROUP BY prev_type, et
      ) WHERE r = 1
    )
    SELECT t.prev_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(count_if(m.predicted = t.et) AS BIGINT) AS hits,
           CAST((count_if(m.predicted = t.et) * 1000000) // COUNT(*)
                AS BIGINT) AS hit_ppm
    FROM tr t LEFT JOIN model m ON t.prev_type = m.prev_type
    WHERE t.rk > (t.n * 4) // 5
    GROUP BY 1
    """,
)
def markov_next_event_hitrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the first-order Markov next-event
    predictor (operators/temporal.py next_event_hitrate): train on
    each user's first 80% of events (exact integer cutoff), evaluate
    top-1 accuracy on the rest — the eval loop that turns
    event_transition_matrix into a measured baseline, honest to time
    (no future leakage; the boundary transition is evaluated, never
    trained on). Argmax tie-break lexicographic via min-struct; one
    user-keyed shuffle; bounded model table broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        next_event_hitrate,
    )

    return next_event_hitrate(read_events(spark, sf_dir))


# =====================================================================
# Round 8, wave 2: off-policy evaluation, OLAP ratio-to-parent, RFM,
# XYZ volatility, rolling correlation, seasonal anomaly audit
# =====================================================================

@register(
    "ips_policy_value_events",
    """
    WITH base AS MATERIALIZED (
      SELECT (epoch_us(ts) // 86400000000) % 7 AS x,
             event_type AS a,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS r,
             epoch_us(ts) AS eus
      FROM events
    ), bounds AS MATERIALIZED (
      SELECT MIN(eus) AS e0, MAX(eus) AS e1 FROM base
    ), flagged AS MATERIALIZED (
      SELECT x, a, r,
             CASE WHEN (eus - e0) * 5 >= (e1 - e0) * 4 THEN 1 ELSE 0 END AS sp
      FROM base, bounds
    ), ctx_act AS MATERIALIZED (
      SELECT x, a, CAST(COUNT(*) AS BIGINT) AS n_xa,
             CAST(SUM(r) AS BIGINT) AS s_xa
      FROM flagged WHERE sp = 0 GROUP BY 1, 2
    ), ctx AS MATERIALIZED (
      SELECT x, CAST(SUM(n_xa) AS BIGINT) AS n_x FROM ctx_act GROUP BY 1
    ), pol AS MATERIALIZED (
      SELECT x, a AS pi_a FROM (
        SELECT x, a, row_number() OVER (PARTITION BY x
          ORDER BY (s_xa * 1000000) // n_xa DESC, a) AS rk
        FROM ctx_act
      ) WHERE rk = 1
    ), ev AS (
      SELECT f.x, f.a, f.r, c.n_x, p.pi_a, ca.n_xa
      FROM flagged f
      LEFT JOIN ctx c ON f.x = c.x
      LEFT JOIN pol p ON f.x = p.x
      LEFT JOIN ctx_act ca ON f.x = ca.x AND f.a = ca.a
      WHERE f.sp = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(count_if(n_xa IS NOT NULL AND a = pi_a) AS BIGINT) AS n_matched,
           CAST(count_if(n_xa IS NULL) AS BIGINT) AS n_unsupported,
           CAST(SUM(CASE WHEN n_xa IS NOT NULL AND a = pi_a
                    THEN (r * n_x * 1000000) // n_xa ELSE 0 END) AS BIGINT)
             AS ips_value_scaled,
           CAST(SUM(CASE WHEN n_xa IS NOT NULL AND a = pi_a
                    THEN r ELSE 0 END) AS BIGINT) AS matched_reward
    FROM ev
    """,
)
def ips_policy_value_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy IPS evaluation (operators/ml.py ips_policy_value —
    Horvitz-Thompson '52 / Li et al. WSDM'11): what would the
    argmax-mean-value policy (context = day-of-week) have earned on
    the logged event stream? Propensities and the target policy train
    on the first 80% of the OBSERVED time range (data-anchored
    bounds — the walk-forward rule), evaluation on the rest; per-row
    IPS terms floored at ppm then exactly summed; day-of-week via
    pure integer epoch arithmetic (epoch_us div 86.4e9 mod 7, the
    CLAUDE.md epoch rule — identical both engines)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.ml import ips_policy_value

    ev = read_events(spark, sf_dir)
    base = ev.select(
        epoch_micros(F.col("ts")).alias("eus"),
        F.col("event_type").alias("a"),
        F.expr("CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT)").alias("r"),
    ).selectExpr("(eus div 86400000000) % 7 AS x", "a", "r", "eus")
    bounds = base.agg(F.min("eus").alias("e0"), F.max("eus").alias("e1"))
    flagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "sp",
        (
            (F.col("eus") - F.col("e0")) * 5 >= (F.col("e1") - F.col("e0")) * 4
        ).cast("int"),
    )
    return ips_policy_value(flagged, "x", "a", "r", "sp")


@register(
    "ratio_to_parent_revenue",
    """
    WITH leaf AS MATERIALIZED (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS total
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), p AS MATERIALIZED (
      SELECT region, nation, total,
             CAST(SUM(total) OVER (PARTITION BY region) AS BIGINT) AS p1,
             CAST(SUM(total) OVER () AS BIGINT) AS pt
      FROM leaf
    )
    SELECT region, nation, total,
           CAST((total * 1000000) // p1 AS BIGINT) AS share_of_region_ppm,
           CAST((total * 1000000) // pt AS BIGINT) AS share_of_total_ppm
    FROM p
    """,
)
def ratio_to_parent_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent OLAP measure (operators/aggregate.py
    ratio_to_parent — the MDX RatioToParent): nation revenue (exact
    cents) as an integer-ppm share of its region and of the world.
    Leaf aggregation once; parent sums are windows over the BOUNDED
    leaf table (25 nations); dimension joins broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        ratio_to_parent,
    )

    t = load_tables(spark, sf_dir, ["orders", "customer", "nation", "region"])
    base = (
        t["orders"]
        .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    return ratio_to_parent(base, ["region", "nation"], "cents")


@register(
    "rfm_segments_customers",
    """
    WITH per AS MATERIALIZED (
      SELECT o_custkey AS c_custkey,
             CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
                  AS BIGINT) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS total_amount
      FROM orders GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT *,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY last_day, c_custkey) AS BIGINT) AS rr,
             CAST(row_number() OVER (ORDER BY n_orders, c_custkey) AS BIGINT) AS rf,
             CAST(row_number() OVER (ORDER BY total_amount, c_custkey) AS BIGINT) AS rm
      FROM per
    ), scored AS (
      SELECT c_custkey, last_day, n_orders, total_amount,
             CAST(((rr - 1) * 5) // n + 1 AS BIGINT) AS r_score,
             CAST(((rf - 1) * 5) // n + 1 AS BIGINT) AS f_score,
             CAST(((rm - 1) * 5) // n + 1 AS BIGINT) AS m_score
      FROM ranked
    )
    SELECT r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(total_amount) AS BIGINT) AS segment_amount
    FROM scored GROUP BY 1, 2, 3, 4
    """,
)
def rfm_segments_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation (operators/aggregate.py rfm_segments
    — Hughes '94), aggregated to segment counts and value so the
    output is bounded (<=125 rows at any SF): recency = last order
    day (integer epoch days — the CLAUDE.md epoch rule), scores via
    exact rank buckets ((rank-1)*5 div n + 1 under a deterministic
    (metric, key) order — NTILE's tie placement is not pinned by the
    standard). Per-customer table is the one data-sized aggregation;
    rank windows run over it once."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        rfm_segments,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_custkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("oday"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    seg = rfm_segments(base, "o_custkey", "oday", "cents", n_bins=5)
    return (
        seg.groupBy("r_score", "f_score", "m_score", "rfm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("total_amount").cast("bigint").alias("segment_amount"),
        )
    )


@register(
    "xyz_volatility_brands",
    """
    WITH per AS MATERIALIZED (
      SELECT p.p_brand AS k,
             date_diff('month', DATE '1992-01-01', CAST(l.l_shipdate AS DATE)) AS p,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), stats AS MATERIALIZED (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS ss
      FROM per GROUP BY 1
    )
    SELECT k, n AS n_periods, s AS total_amount,
           CAST(CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END AS BIGINT) AS cv2_ppm2,
           CASE WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) < 0 THEN 'Z'
           WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) < 250000000000 THEN 'X'
           WHEN (CASE WHEN s > 0 THEN
             ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
              * 1000000000000) // (CAST(s AS HUGEINT) * s)
           ELSE -1 END) <= 1000000000000 THEN 'Y'
           ELSE 'Z' END AS xyz
    FROM stats
    """,
)
def xyz_volatility_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-volatility classification per brand
    (operators/aggregate.py xyz_volatility — the forecastability
    companion to abc_classification_brands): coefficient of variation
    of monthly shipped quantity, compared CROSS-MULTIPLIED AND
    SQUARED so no sqrt or float division ever runs (cv2_ppm2 =
    exact (cv*10^6)^2 via DECIMAL(38)/HUGEINT). X < 0.5, Y <= 1.0,
    else Z."""
    from dpe_energy_performance_analysis_etl_spark.operators.aggregate import (
        xyz_volatility,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("b"),
        F.months_between(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "q"
        ),
    )
    return xyz_volatility(base, "b", "m", "q").withColumnRenamed("k", "k")


@register(
    "rolling_corr_revenue_qty",
    """
    WITH tiers AS MATERIALIZED (
      SELECT date_diff('month', DATE '1992-01-01',
                       CAST(l_shipdate AS DATE)) AS t,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS HUGEINT) AS x,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS HUGEINT) AS y
      FROM lineitem GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT t,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
             SUM(x * y) OVER w AS sxy
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(12 AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           ELSE CAST(NULL AS DOUBLE) END AS corr
    FROM agg WHERE n = 12
    """,
)
def rolling_corr_revenue_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-month trailing Pearson correlation between monthly revenue
    and monthly shipped quantity (operators/temporal.py rolling_corr):
    co-moments as exact DECIMAL(38)/HUGEINT integers inside the ROWS
    window over the bounded month-tier table; corr is exactly three
    IEEE ops (divide, two correctly-rounded sqrts) from
    exactly-rounded casts of identical integers — the NOTES
    float-parity recipe."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import rolling_corr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.months_between(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "xc"
        ),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias("yc"),
    )
    return rolling_corr(base, "m", "xc", "yc", window=12)


@register(
    "seasonal_outliers_revenue",
    """
    WITH tiers AS MATERIALIZED (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), ma AS MATERIALIZED (
      SELECT t, y, COUNT(*) OVER w AS wn, CAST(SUM(y) OVER w AS BIGINT) AS ws
      FROM tiers
      WINDOW w AS (ORDER BY t ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
    ), detr AS MATERIALIZED (
      SELECT t, y, CAST(y * 1000 - (ws * 1000) // 12 AS BIGINT)
               AS detrended_scaled
      FROM ma WHERE wn = 12
    ), seas_r AS MATERIALIZED (
      SELECT t, detrended_scaled,
             row_number() OVER (PARTITION BY t % 12
               ORDER BY detrended_scaled, t) AS rk,
             COUNT(*) OVER (PARTITION BY t % 12) AS cnt
      FROM detr
    ), med AS MATERIALIZED (
      SELECT t % 12 AS phase, detrended_scaled AS seasonal_scaled
      FROM seas_r WHERE rk = (cnt + 1) // 2
    ), rem AS MATERIALIZED (
      SELECT d.t, d.y,
             CAST(d.detrended_scaled - m.seasonal_scaled AS BIGINT)
               AS remainder_scaled
      FROM detr d JOIN med m ON d.t % 12 = m.phase
    ), c_r AS MATERIALIZED (
      SELECT *, row_number() OVER (ORDER BY remainder_scaled, t) AS rk,
             COUNT(*) OVER () AS cnt
      FROM rem
    ), center AS MATERIALIZED (
      SELECT remainder_scaled AS center_scaled FROM c_r
      WHERE rk = (cnt + 1) // 2
    ), devs AS MATERIALIZED (
      SELECT r.t, r.y, r.remainder_scaled, c.center_scaled,
             CAST(abs(r.remainder_scaled - c.center_scaled) AS BIGINT)
               AS dev_scaled
      FROM rem r, center c
    ), d_r AS MATERIALIZED (
      SELECT *, row_number() OVER (ORDER BY dev_scaled, t) AS rk,
             COUNT(*) OVER () AS cnt
      FROM devs
    ), mad AS MATERIALIZED (
      SELECT dev_scaled AS mad_scaled FROM d_r WHERE rk = (cnt + 1) // 2
    )
    SELECT d.t, d.y, d.remainder_scaled, d.center_scaled, m.mad_scaled,
           d.dev_scaled,
           CAST(CASE WHEN d.dev_scaled > 5 * m.mad_scaled THEN 1 ELSE 0 END
                AS BIGINT) AS is_outlier
    FROM devs d, mad m
    ORDER BY d.dev_scaled DESC, d.t LIMIT 5
    """,
)
def seasonal_outliers_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly audit of monthly revenue
    (operators/temporal.py seasonal_outliers): remove the 12-month MA
    trend and the per-calendar-month median seasonal, then rank
    months by |remainder - median| against a 5-MAD fence — top-5
    margins with an is_outlier flag (a bare violations filter is
    0-row on well-behaved data and checks nothing). Median and MAD
    are exact order statistics over the bounded interior-month
    table."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        seasonal_outliers,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("m"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return seasonal_outliers(monthly, "m", "cents", period=12, k_mad=5, top_n=5)


# =====================================================================
# Round 8, wave 3: windowed funnel, SQL lateral top-k, weighted
# median, Croston intermittent demand, cumulative gains
# =====================================================================

@register(
    "window_funnel_events",
    """
    WITH base AS MATERIALIZED (
      SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                  WHEN 'purchase' THEN 3 END AS s
      FROM events
      WHERE event_type IN ('signup', 'view', 'purchase')
    ), arr AS MATERIALIZED (
      SELECT u, list([t, s] ORDER BY t, eid) AS seq FROM base GROUP BY u
    ), folded AS MATERIALIZED (
      SELECT u, list_reduce(
        list_prepend([CAST(-1 AS BIGINT), -1, -1],
                     list_transform(seq, e -> e)),
        (acc, el) -> list_transform(range(1, 4), k -> CASE
          WHEN k = 1 AND el[2] = 1 THEN greatest(acc[1], el[1])
          WHEN k > 1 AND el[2] = k AND acc[k - 1] >= 0
           AND el[1] - acc[k - 1] <= 2592000000000
          THEN greatest(acc[k], acc[k - 1])
          ELSE acc[k] END)
      ) AS anchors
      FROM arr
    ), depths AS MATERIALIZED (
      SELECT u, CAST(len(list_filter(anchors, a -> a >= 0)) AS BIGINT) AS depth
      FROM folded
    ), grid AS (SELECT unnest(range(0, 4)) AS depth)
    SELECT CAST(grid.depth AS BIGINT) AS depth,
           CAST(COALESCE(COUNT(depths.u), 0) AS BIGINT) AS n_users
    FROM grid LEFT JOIN depths ON grid.depth = depths.depth
    GROUP BY 1
    """,
)
def window_funnel_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowed funnel (operators/temporal.py
    window_funnel): deepest signup -> view -> purchase prefix
    completed in order with every step within 30 days of the chain's
    first step — the time-bounded semantics funnel_stages' unordered
    min-ts cascade cannot express. Exact anchor DP folded over each
    user's sorted step events (state = latest feasible chain start
    per level, which dominates); one user-keyed shuffle; output is
    the bounded depth histogram with zero-fill."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        window_funnel,
    )

    return window_funnel(
        read_events(spark, sf_dir),
        steps=["signup", "view", "purchase"],
        window_us=2_592_000_000_000,
    )


@register(
    "lateral_topk_orders",
    """
    SELECT c.c_custkey,
           t.o_orderkey,
           CAST(CAST(t.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
             AS price_cents
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 3
         ) t
    WHERE c.c_nationkey = 7
    """,
)
def lateral_topk_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery top-k — the SQL-surface twin of
    topk_per_group: for each nation-7 customer, their three largest
    orders, written as a lateral per-row subquery (the form BI tools
    emit) and executed through spark.sql. Catalyst decorrelates the
    limit-per-key subquery into the same window/rank plan the
    DataFrame topk uses — the point of the entry is that the SQL
    front door accepts and plans the idiom."""
    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey,
               t.o_orderkey,
               CAST(CAST(t.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                 AS price_cents
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        WHERE c.c_nationkey = 7
        """
    )


@register(
    "weighted_median_price_brand",
    """
    WITH vals AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, v, w,
             CAST(COALESCE(SUM(w) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS w_before,
             CAST(SUM(w) OVER (PARTITION BY g) AS BIGINT) AS w_total
      FROM vals
    )
    SELECT g AS p_brand, w_total,
           CAST(MIN(v) AS BIGINT) AS weighted_median
    FROM pre WHERE (w_before + w) * 2 >= w_total
    GROUP BY 1, 2
    """,
)
def weighted_median_price_brand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted low-median line price per brand
    (operators/quantiles.py grouped_weighted_median): smallest price
    whose inclusive cumulative quantity reaches half the brand's
    total — an exact order statistic, skew-safe via the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is fine at sf0.01; the Spark plan avoids the
    one-executor-per-group sort at scale)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_weighted_median,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("b"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "price"
        ),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "qty"
        ),
    )
    return grouped_weighted_median(base, "b", "price", "qty").withColumnRenamed(
        "b", "p_brand"
    )


@register(
    "croston_intermittent_parts",
    """
    WITH tiers AS MATERIALIZED (
      SELECT l.l_partkey AS k,
             CAST(date_diff('month', DATE '1992-01-01',
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS p,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
      WHERE pt.p_brand = 'Brand#13'
      GROUP BY 1, 2 HAVING SUM(CAST(CAST(l.l_quantity AS DECIMAL(30,2)) * 100
                                    AS BIGINT)) > 0
    ), arr AS MATERIALIZED (
      SELECT k, list([p, y] ORDER BY p) AS seq FROM tiers GROUP BY k
    ), folded AS MATERIALIZED (
      SELECT k, list_reduce(
        list_prepend([CAST(0 AS BIGINT), -1, 0, 0], seq),
        (acc, e) -> CASE
          WHEN acc[4] = 0 THEN [e[2], CAST(-1 AS BIGINT), e[1], CAST(1 AS BIGINT)]
          WHEN acc[4] = 1 THEN [(acc[1] + e[2]) // 2, e[1] - acc[3], e[1],
                                CAST(2 AS BIGINT)]
          ELSE [(acc[1] + e[2]) // 2, (acc[2] + (e[1] - acc[3])) // 2, e[1],
                acc[4] + 1] END
      ) AS st
      FROM arr
    )
    SELECT k AS l_partkey, CAST(st[4] AS BIGINT) AS n_demands,
           CAST(st[1] AS BIGINT) AS z_smoothed,
           CAST(st[2] AS BIGINT) AS p_smoothed,
           CAST((st[1] * 1000000) // greatest(st[2], 1) AS BIGINT) AS rate_ppm
    FROM folded WHERE st[4] >= 2
    """,
)
def croston_intermittent_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per Brand#13 part
    (operators/temporal.py croston_intermittent — Croston 1972, the
    standard for sparse/lumpy demand where zero-filled smoothing
    biases low): demand sizes and inter-demand intervals smoothed
    SEPARATELY with dyadic alpha = 1/2 (integer (a+x) div 2 folds —
    the holt discipline), rate = z/p as exact ppm. Fold over each
    part's bounded month-tier array; one (part, month) aggregation is
    the data-sized pass."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        croston_intermittent,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .where(F.col("p_brand") == "Brand#13")
        .select(
            F.col("l_partkey").alias("k"),
            F.months_between(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("m"),
            F.expr("CAST(CAST(l_quantity AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
                "q"
            ),
        )
    )
    return croston_intermittent(base, "k", "m", "q").withColumnRenamed(
        "k", "l_partkey"
    )


@register(
    "cumulative_gains_priority",
    """
    WITH ranked AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ), per AS MATERIALIZED (
      SELECT ((rn - 1) * 10) // n + 1 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(y) AS BIGINT) AS positives
      FROM ranked GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_rows, positives,
           CAST(SUM(positives) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_positives,
           CAST((SUM(positives) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
             // greatest(SUM(positives) OVER (), 1) AS BIGINT) AS gain_ppm
    FROM per
    """,
)
def cumulative_gains_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table (operators/quantiles.py
    cumulative_gains): rank orders by value descending, cut into ten
    exact rank buckets, report the cumulative share of URGENT/HIGH
    orders each prefix captures — the campaign-targeting eval chart.
    Global ranks via the two-pass repartitionByRange recipe (the
    oracle's unpartitioned window is fine at sf0.01; at scale it is
    the one-partition trap the recipe exists to avoid)."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        cumulative_gains,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "score"
        ),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("y"),
        F.col("o_orderkey").alias("tb"),
    )
    return cumulative_gains(base, "score", "y", "tb", n_buckets=10)


# =====================================================================
# Round 8, wave 4: exact sliding distinct (DAU/MAU), Z-order layout
# key, Zipf rank-ratio descriptor
# =====================================================================

@register(
    "dau_mau_stickiness_events",
    """
    WITH ud AS MATERIALIZED (
      SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
      FROM events
    ), dau AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ), marked AS MATERIALIZED (
      SELECT u, d,
             CASE WHEN lag(d) OVER (PARTITION BY u ORDER BY d) IS NULL
                    OR d - lag(d) OVER (PARTITION BY u ORDER BY d) > 30
                  THEN 1 ELSE 0 END AS is_start
      FROM ud
    ), grp AS MATERIALIZED (
      SELECT u, d, SUM(is_start) OVER (PARTITION BY u ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM marked
    ), intervals AS MATERIALIZED (
      SELECT u, g, MIN(d) AS s, MAX(d) + 30 AS e1 FROM grp GROUP BY 1, 2
    ), deltas AS MATERIALIZED (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM (
        SELECT s AS d, 1 AS delta FROM intervals
        UNION ALL SELECT e1 AS d, -1 AS delta FROM intervals
      ) GROUP BY 1
    ), bounds AS MATERIALIZED (
      SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud
    ), grid AS MATERIALIZED (
      SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds
    ), mau AS MATERIALIZED (
      SELECT grid.day,
             CAST(SUM(COALESCE(deltas.net, 0)) OVER (ORDER BY grid.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS mau
      FROM grid LEFT JOIN deltas ON grid.day = deltas.d
    )
    SELECT CAST(mau.day AS BIGINT) AS day,
           CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
           mau.mau,
           CAST((COALESCE(dau.dau, 0) * 1000000) // greatest(mau.mau, 1)
                AS BIGINT) AS stickiness_ppm
    FROM mau LEFT JOIN dau ON mau.day = dau.d
    """,
)
def dau_mau_stickiness_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / exact 30-day trailing MAU / stickiness per day
    (operators/temporal.py sliding_distinct_daily): the boundary-diff
    algorithm — merge each user's active days into coverage
    intervals, emit +1/-1 boundary deltas, prefix-sum over the day
    grid — so the exact sliding DISTINCT never re-counts users per
    day (a naive exact MAU is 365 full-data distincts a year; this is
    one (user, day) dedup + one per-user lag pass + bounded-table
    arithmetic)."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        sliding_distinct_daily,
    )

    return sliding_distinct_daily(read_events(spark, sf_dir), window_days=30)


@register(
    "zorder_locality_customers",
    """
    WITH bal AS MATERIALIZED (
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS a,
             CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT) AS bal_c
      FROM customer
    ), bounds AS MATERIALIZED (
      SELECT MIN(bal_c) AS lo, MAX(bal_c) AS hi FROM bal
    ), coded AS MATERIALIZED (
      SELECT a, ((bal_c - lo) * 64) // (hi - lo + 1) AS b
      FROM bal, bounds
    ), zed AS MATERIALIZED (
      SELECT a, b,
        ((a >> 0) & 1) * 1 + ((b >> 0) & 1) * 2
        + ((a >> 1) & 1) * 4 + ((b >> 1) & 1) * 8
        + ((a >> 2) & 1) * 16 + ((b >> 2) & 1) * 32
        + ((a >> 3) & 1) * 64 + ((b >> 3) & 1) * 128
        + ((a >> 4) & 1) * 256 + ((b >> 4) & 1) * 512
        + ((a >> 5) & 1) * 1024 + ((b >> 5) & 1) * 2048 AS z
      FROM coded
    )
    SELECT CAST(z // 64 AS BIGINT) AS z_prefix,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(a) AS BIGINT) AS min_nation,
           CAST(MAX(a) AS BIGINT) AS max_nation,
           CAST(MIN(b) AS BIGINT) AS min_balbucket,
           CAST(MAX(b) AS BIGINT) AS max_balbucket
    FROM zed GROUP BY 1
    """,
)
def zorder_locality_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (nation, balance-bucket)
    (operators/temporal.py zorder_key — the Delta/Iceberg Z-ORDER BY
    primitive): interleave the bits of two 6-bit codes so a sort by z
    keeps rows adjacent in BOTH dimensions; each 64-row z-prefix's
    bounding box stays a small quadrant (the per-file min/max stats a
    multi-predicate scan prunes on). Balance bucketed equi-width over
    the OBSERVED range in exact cents (data-anchored); pure codegen
    bit arithmetic, identical in SQL."""
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import zorder_key

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bal = c.select(
        F.col("c_nationkey").cast("bigint").alias("a"),
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "bal_c"
        ),
    )
    bounds = bal.agg(F.min("bal_c").alias("lo"), F.max("bal_c").alias("hi"))
    coded = bal.crossJoin(F.broadcast(bounds)).selectExpr(
        "a", "((bal_c - lo) * 64) div (hi - lo + 1) AS b"
    )
    zed = coded.withColumn("z", zorder_key(F.col("a"), F.col("b"), bits=6))
    return zed.selectExpr(
        "z div 64 AS z_prefix", "a", "b"
    ).groupBy("z_prefix").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("a").cast("bigint").alias("min_nation"),
        F.max("a").cast("bigint").alias("max_nation"),
        F.min("b").cast("bigint").alias("min_balbucket"),
        F.max("b").cast("bigint").alias("max_balbucket"),
    ).withColumn("z_prefix", F.col("z_prefix").cast("bigint"))


@register(
    "zipf_ratio_tokens",
    """
    WITH vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
      ) GROUP BY 1
    ), top AS MATERIALIZED (
      SELECT w, freq, row_number() OVER (ORDER BY freq DESC, w) AS rank
      FROM vocab ORDER BY freq DESC, w LIMIT 128
    ), f1 AS (SELECT MAX(freq) AS f1 FROM top)
    SELECT CAST(rank AS BIGINT) AS rank, w AS token, freq,
           CAST((f1.f1 * 1000000) // freq AS BIGINT) AS f1_ratio_ppm
    FROM top, f1
    """,
)
def zipf_ratio_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency descriptor of the corpus vocabulary: the
    top-128 tokens with the exact integer ratio f(1)/f(rank) in ppm —
    the log-free diagnostic for "is this corpus Zipfian" (ratio ~rank
    means alpha ~1; ratios collapsing toward 1 flag boilerplate
    repetition). One vocabulary aggregation, one bounded top-k sort,
    windows over the 128-row head only."""
    docs = read_documents(spark, sf_dir)
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    top = vocab.orderBy(F.col("freq").desc(), F.col("w").asc()).limit(128)
    w = Window.orderBy(F.col("freq").desc(), F.col("w").asc())
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("w").alias("token"),
        "freq",
        F.max("freq").over(w_all).alias("_f1"),
    ).selectExpr(
        "rank", "token", "freq",
        "CAST((_f1 * 1000000) div freq AS BIGINT) AS f1_ratio_ppm",
    )


# =====================================================================
# Round 8, wave 5: trimmed mean, top-k WITH TIES
# =====================================================================

@register(
    "trimmed_mean_price_brand",
    """
    WITH ranked AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY p.p_brand
               ORDER BY CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                             AS BIGINT)) AS rk,
             COUNT(*) OVER (PARTITION BY p.p_brand) AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT g AS p_brand, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX((n * 100000) // 1000000) AS BIGINT) AS n_trimmed_each_side,
           CAST((SUM(v) * 1000) // COUNT(*) AS BIGINT) AS trimmed_mean_scaled
    FROM ranked
    WHERE rk > (n * 100000) // 1000000
      AND rk <= n - (n * 100000) // 1000000
    GROUP BY 1
    """,
)
def trimmed_mean_price_brand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean line price per brand
    (operators/quantiles.py grouped_trimmed_mean): drop the exact
    floor(n/10) lowest- and highest-ranked rows per brand and average
    the rest in exact cents — the robust center that still uses the
    retained mass. Ranks ride the range-partition recipe (the
    oracle's PARTITION BY window is the sf0.01 shortcut; the Spark
    plan never sorts a data-sized group on one executor); the mean
    floors once at milli-cents."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_trimmed_mean,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    # EXPLICIT broadcast of the 2-column dim projection: the trimmed
    # mean's histprune path re-scans its feed (by design — cheaper
    # than pinning, measured r9), so the feed must be a broadcast
    # probe, not a shuffle join re-executed per pass
    base = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("b"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)").alias(
            "price"
        ),
    )
    return grouped_trimmed_mean(
        base, "b", "price", trim_ppm=100_000, scale=1000
    ).withColumnRenamed("b", "p_brand")


@register(
    "topk_with_ties_quantity",
    """
    WITH per AS MATERIALIZED (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), r AS (
      SELECT l_returnflag, qty, cnt,
             rank() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC) AS rnk
      FROM per
    )
    SELECT l_returnflag, CAST(qty AS BIGINT) AS qty, cnt,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 2
    """,
)
def topk_with_ties_quantity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (the `FETCH FIRST k ROWS WITH TIES` / RANK()
    idiom the row_number-based topk_per_group cannot express): the
    two most frequent quantity values per return flag, keeping EVERY
    value tied with the k-th — RANK over the bounded (flag, quantity)
    aggregate (quantities are a small integer domain, so ties are
    real). Window runs over the aggregated table, never raw rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy(
        "l_returnflag", F.expr("CAST(l_quantity AS BIGINT)").alias("qty")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc())
    return (
        per.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 2)
        .select("l_returnflag", F.col("qty").cast("bigint").alias("qty"), "cnt", "rnk")
    )


# =====================================================================
# Round 8, wave 6: referential-integrity audit
# =====================================================================

_RI_ARMS = []
for _child, _fk, _parent, _pk, _name in [
    ("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
    ("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem->supplier"),
    ("orders", "o_custkey", "customer", "c_custkey", "orders->customer"),
    ("customer", "c_nationkey", "nation", "n_nationkey", "customer->nation"),
    ("supplier", "s_nationkey", "nation", "n_nationkey", "supplier->nation"),
    ("nation", "n_regionkey", "region", "r_regionkey", "nation->region"),
]:
    _RI_ARMS.append(f"""      SELECT '{_name}' AS edge,
        CAST((SELECT COUNT(*) FROM {_child}) AS BIGINT) AS n_child,
        CAST((SELECT count_if({_fk} IS NULL) FROM {_child}) AS BIGINT)
          AS n_null_fk,
        CAST((SELECT COUNT(*) FROM {_child} ch
              WHERE ch.{_fk} IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM {_parent} pa
                                WHERE pa.{_pk} = ch.{_fk})) AS BIGINT)
          AS n_orphans,
        CAST((SELECT COUNT(DISTINCT {_fk}) FROM {_child}) AS BIGINT)
          AS n_distinct_fk,
        CAST((SELECT COUNT(*) FROM {_parent}) AS BIGINT) AS n_parent""")
_RI_SQL = (
    "\n    WITH arms AS (\n"
    + "\n      UNION ALL\n".join(_RI_ARMS)
    + """
    )
    SELECT edge, n_child, n_null_fk, n_orphans,
           CAST((n_orphans * 1000000) // greatest(n_child - n_null_fk, 1)
                AS BIGINT) AS orphan_ppm,
           n_distinct_fk, n_parent,
           CAST((n_distinct_fk * 1000000) // greatest(n_parent, 1) AS BIGINT)
             AS fk_coverage_ppm
    FROM arms
    """
)


@register("ri_audit_star_schema", _RI_SQL)
def ri_audit_star_schema_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over all seven FK edges of the
    star schema (operators/quality.py referential_integrity_audit):
    orphan counts/rates via LEFT ANTI joins (the exact complement of
    the joins every TPC-H query assumes are lossless), NULL-fk
    excusal, and distinct-fk-to-parent coverage — the data contract
    that catches a broken ingest before a silent inner join drops
    rows. One bounded row per edge."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        referential_integrity_audit,
    )

    t = load_tables(
        spark, sf_dir,
        ["lineitem", "orders", "part", "supplier", "customer", "nation", "region"],
    )
    return referential_integrity_audit([
        (t["lineitem"], "l_orderkey", t["orders"], "o_orderkey", "lineitem->orders"),
        (t["lineitem"], "l_partkey", t["part"], "p_partkey", "lineitem->part"),
        (t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey", "lineitem->supplier"),
        (t["orders"], "o_custkey", t["customer"], "c_custkey", "orders->customer"),
        (t["customer"], "c_nationkey", t["nation"], "n_nationkey", "customer->nation"),
        (t["supplier"], "s_nationkey", t["nation"], "n_nationkey", "supplier->nation"),
        (t["nation"], "n_regionkey", t["region"], "r_regionkey", "nation->region"),
    ])


# =====================================================================
# Round 9, wave 1: KS two-sample drift test, deterministic mode,
# OHLC candles, cumulative-unique curve, Good-Turing smoothing,
# candidate-key discovery, spend drawdown, view->purchase conversion
# window, soundex blocking
# =====================================================================

@register(
    "ks_test_status_priority",
    """
    WITH t AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(substr(o_orderpriority, 1, 1) IN ('1', '2'))
                  AS BIGINT) AS cnt1
      FROM orders GROUP BY 1, 2
    ), c AS MATERIALIZED (
      SELECT g,
             CAST(SUM(cnt) OVER w AS BIGINT) AS cum,
             CAST(SUM(cnt1) OVER w AS BIGINT) AS cum1
      FROM t
      WINDOW w AS (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS MATERIALIZED (
      SELECT g, CAST(MAX(cum) AS BIGINT) AS n, CAST(MAX(cum1) AS BIGINT) AS n1
      FROM c GROUP BY 1
    )
    SELECT c.g AS o_orderstatus, tot.n1 AS n1,
           CAST(tot.n - tot.n1 AS BIGINT) AS n2,
           CASE WHEN tot.n1 > 0 AND tot.n > tot.n1 THEN
             CAST(MAX(abs(c.cum1 * tot.n - c.cum * tot.n1)) * 1000000
                  // (tot.n1 * (tot.n - tot.n1)) AS BIGINT)
           END AS d_scaled
    FROM c JOIN tot ON c.g = tot.g
    GROUP BY c.g, tot.n, tot.n1
    """,
)
def ks_test_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D per order status
    (operators/stats.py ks_two_sample — Smirnov 1948): does the
    order-value DISTRIBUTION differ between urgent/high-priority
    orders and the rest? The drift gate that sees shape changes a
    mean test misses. D is one exact cross-multiplied integer max
    (|cum1*n − cum*n1| over value tiers) and one truncating division
    — bit-portable; prefix sums ride the grouped_running_totals
    range-partition recipe (the oracle's PARTITION BY window is the
    sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        ks_two_sample,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_orderstatus",
        F.substring("o_orderpriority", 1, 1).isin("1", "2").cast("int").alias(
            "urgent"
        ),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return ks_two_sample(base, "o_orderstatus", "urgent", "cents")


@register(
    "mode_priority_by_status",
    """
    WITH c AS MATERIALIZED (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ), r AS MATERIALIZED (
      SELECT *,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rhi,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt ASC, o_orderpriority) AS rlo
      FROM c
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rhi = 1 THEN o_orderpriority END) AS mode_priority,
           CAST(MAX(CASE WHEN rhi = 1 THEN cnt END) AS BIGINT) AS mode_count,
           MAX(CASE WHEN rlo = 1 THEN o_orderpriority END) AS least_priority,
           CAST(MAX(CASE WHEN rlo = 1 THEN cnt END) AS BIGINT) AS least_count
    FROM r GROUP BY 1
    """,
)
def mode_priority_by_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE (and anti-mode): most/least common
    order priority per order status with a total (count DESC, value
    ASC) tie-break — the categorical summary statistic SQL lacks
    natively. Spark plans it as one (group, value) count plus a
    bounded min-of-struct aggregation — no window over data-sized
    partitions; the oracle's row_number windows run over the BOUNDED
    count table only."""
    li = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cnts = li.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # min of (−cnt, value) struct = (max count, then smallest value);
    # min of (cnt, value) struct = (min count, then smallest value)
    return (
        cnts.groupBy("o_orderstatus")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("o_orderpriority").alias("m"),
                )
            ).alias("hi"),
            F.min(
                F.struct(
                    F.col("cnt").alias("c"),
                    F.col("o_orderpriority").alias("m"),
                )
            ).alias("lo"),
        )
        .select(
            "o_orderstatus",
            F.col("hi.m").alias("mode_priority"),
            (-F.col("hi.nc")).cast("bigint").alias("mode_count"),
            F.col("lo.m").alias("least_priority"),
            F.col("lo.c").cast("bigint").alias("least_count"),
        )
    )


@register(
    "ohlc_monthly_orders",
    """
    WITH base AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mn,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             o_orderdate, o_orderkey
      FROM orders
    ), r AS MATERIALIZED (
      SELECT mn, cents,
             row_number() OVER (PARTITION BY mn
               ORDER BY o_orderdate, o_orderkey) AS rf,
             row_number() OVER (PARTITION BY mn
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
      FROM base
    )
    SELECT mn AS month_num,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM r GROUP BY 1
    """,
)
def ohlc_monthly_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup of order values by month — the
    order-sensitive aggregation family (first/last by a total
    (date, key) order + min/max + volume) every time-series store
    exposes. Spark computes open/close with min_by/max_by over a
    STRUCT ordering key in the SAME single aggregation as the other
    measures (no window at all — the oracle's row_number windows are
    the sf0.01 shortcut); exact cents throughout. volume_cents as
    BIGINT is safe to ~9e18 cents/month (DECIMAL carry at larger
    scale documented in the operator note)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
        ).alias("mn"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
    )
    return base.groupBy(F.col("mn").alias("month_num")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min_by("cents", "ok").cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max_by("cents", "ok").cast("bigint").alias("close_cents"),
        F.sum("cents").cast("bigint").alias("volume_cents"),
    )


@register(
    "cumulative_adopters_by_type",
    """
    WITH fs AS MATERIALIZED (
      SELECT event_type, user_id, MIN(epoch_us(ts) // 86400000000) AS d
      FROM events GROUP BY 1, 2
    ), per AS MATERIALIZED (
      SELECT event_type, CAST(d AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS new_users
      FROM fs GROUP BY 1, 2
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per
    """,
)
def cumulative_adopters_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-adoption curve per event type: each user's FIRST
    day doing each action, new adopters per (type, day), and the
    running total — the feature-adoption chart, computed without a
    single sliding distinct (one per-(type, user) min, one bounded
    per-(type, day) count, one prefix sum over the BOUNDED
    (type, day) table). Per-type, not global first-seen: on this
    events shape every user appears within the first days of the
    range, so the global curve is a 2-row degenerate — per-type
    adoption spreads over weeks (measured)."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    fs = (
        ev.select("event_type", "user_id", epoch_micros("ts").alias("us"))
        .selectExpr("event_type", "user_id", "us div 86400000000 AS d")
        .groupBy("event_type", "user_id")
        .agg(F.min("d").alias("d"))
    )
    per = fs.groupBy("event_type", F.col("d").cast("bigint").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # bounded window: one row per (type, day)
    return per.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "good_turing_docs",
    """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), vocab AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        FROM toks
      ) GROUP BY 1
    ), cc AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n_c FROM vocab GROUP BY 1
    )
    SELECT a.c AS c, a.n_c AS n_c,
           CAST((a.c + 1) * b.n_c * 1000000 // a.n_c AS BIGINT)
             AS c_star_ppm
    FROM cc a LEFT JOIN cc b ON b.c = a.c + 1
    WHERE a.c <= 20
    """,
)
def good_turing_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus TRIGRAM types
    (Good, Biometrika 1953; the Katz-backoff building block): for
    each observed count c ≤ 20, the count-of-counts N_c and the
    smoothed c* = (c+1)·N_{c+1}/N_c as exact ppm — the estimate of
    how much probability mass the rare types REALLY carry (c* << c
    flags a heavy tail; the c=1 row's mass estimates unseen types).
    Trigrams, not unigrams, because GT lives where counts are small —
    this corpus's unigram vocabulary has min count 26 and the c ≤ 20
    head is empty (measured), while its 16k trigram types span counts
    1-8. One n-gram aggregation, one BOUNDED counts-of-counts table,
    one self-join on c+1 (NULL c_star where N_{c+1}=0 — the honest
    gap, not a fake zero)."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import ngrams_expr

    docs = read_documents(spark, sf_dir)
    vocab = (
        docs.select(F.explode(ngrams_expr("text", 3)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # bounded (one row per distinct count), consumed as BOTH join
    # sides — cache, or the trigram aggregation runs twice
    cc = vocab.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    ).cache()
    a = cc.where(F.col("c") <= 20).alias("a")
    b = cc.select(
        (F.col("c") - 1).alias("c_prev"), F.col("n_c").alias("n_next")
    ).alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.c") == F.col("c_prev"), "left")
        .select(
            F.col("a.c").alias("c"),
            F.col("a.n_c").alias("n_c"),
            F.expr(
                "CAST((c + 1) * n_next * 1000000 div n_c AS BIGINT)"
            ).alias("c_star_ppm"),
        )
    )


_KEY_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"]


def _kd_enc_sql(c: str) -> str:
    e = (
        f"CASE WHEN {c} IS NULL THEN 'n' "
        f"ELSE 'v' || CAST({c} AS VARCHAR) END"
    )
    return f"(CAST(length({e}) AS VARCHAR) || ':' || {e})"


_KD_ARMS = "\n      UNION ALL\n".join(
    [
        f"""      SELECT '{c}' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {_kd_enc_sql(c)}) AS BIGINT) AS n_distinct
      FROM customer"""
        for c in _KEY_COLS
    ]
    + [
        f"""      SELECT '{a}+{b}' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {_kd_enc_sql(a)} || '#' || {_kd_enc_sql(b)})
                  AS BIGINT) AS n_distinct
      FROM customer"""
        for i, a in enumerate(_KEY_COLS)
        for b in _KEY_COLS[i + 1 :]
    ]
)


@register(
    "key_discovery_customer",
    f"""
    WITH arms AS MATERIALIZED (
{_KD_ARMS}
    )
    SELECT candidate, n_rows, n_distinct,
           CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
             AS is_key
    FROM arms
    """,
)
def key_discovery_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over the customer profile columns
    (operators/quality.py key_discovery): all 5 singles + 10 pairs
    checked for uniqueness in ONE exploded pass (the oracle rescans
    per candidate — fine at sf0.01, exactly what a 100 TB profiler
    avoids). c_custkey and every pair containing it are keys; c_name
    is a key in disguise; the categorical columns and their pairs are
    not — both branches exercised. Injective length-prefixed value
    encoding so concatenation can't fake uniqueness."""
    from dpe_energy_performance_analysis_etl_spark.operators.quality import (
        key_discovery,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return key_discovery(c, _KEY_COLS)


@register(
    "max_spend_drawdown_customers",
    """
    WITH seq AS MATERIALIZED (
      SELECT o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents,
             CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak
      FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(peak - cents) AS BIGINT) AS max_drawdown_cents
    FROM seq GROUP BY 1
    HAVING COUNT(*) >= 12
    """,
)
def max_spend_drawdown_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each customer's order-value series (orders
    in (date, key) order): max over time of (running-peak − current) —
    the classic risk statistic, here "biggest collapse from a
    customer's historical max order size", for customers with ≥ 12
    orders. Exact cents; the PARTITION BY customer window is bounded
    by per-customer activity (the user_event_paths class), never
    data-sized."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seq = o.select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaked = seq.withColumn("peak", F.max("cents").over(w).cast("bigint"))
    return (
        peaked.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("peak").cast("bigint").alias("peak_cents"),
            F.max(F.col("peak") - F.col("cents"))
            .cast("bigint")
            .alias("max_drawdown_cents"),
        )
        .where(F.col("n_orders") >= 12)
    )


@register(
    "view_purchase_within_hour",
    """
    WITH v AS MATERIALIZED (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'view'
    ), p AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ), conv AS MATERIALIZED (
      SELECT v.d, CAST(COUNT(*) AS BIGINT) AS n_converted
      FROM v WHERE EXISTS (
        SELECT 1 FROM p WHERE p.user_id = v.user_id
          AND p.us > v.us AND p.us <= v.us + 3600000000
      )
      GROUP BY 1
    ), vd AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_views FROM v GROUP BY 1
    )
    SELECT CAST(vd.d AS BIGINT) AS day, vd.n_views,
           CAST(COALESCE(conv.n_converted, 0) AS BIGINT) AS n_converted,
           CAST(COALESCE(conv.n_converted, 0) * 1000000 // vd.n_views
                AS BIGINT) AS conversion_ppm
    FROM vd LEFT JOIN conv ON vd.d = conv.d
    """,
)
def view_purchase_within_hour_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion: per day, how many 'view' events were
    followed by a 'purchase' from the SAME user within one hour —
    the interval-join conversion metric (and the batch anchor for the
    stream-stream interval-join streaming surface). Candidate
    generation is equi-keyed on user_id (a LEFT SEMI join with the
    time-range predicate riding the hash join — never a cross
    product); per-user event counts bound the pair fan-out. n_views
    > 0 by construction, so the ppm division is safe."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id", "event_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = base.where(F.col("event_type") == "view").selectExpr(
        "user_id", "event_id", "us", "us div 86400000000 AS d"
    )
    p = base.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("us").alias("pus")
    )
    conv = (
        v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + 3_600_000_000),
            "left_semi",
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    )
    vd = v.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_views"))
    return (
        vd.join(conv, "d", "left")
        .select(
            F.col("d").cast("bigint").alias("day"),
            "n_views",
            F.coalesce(F.col("n_converted"), F.lit(0))
            .cast("bigint")
            .alias("n_converted"),
            F.expr(
                "CAST(coalesce(n_converted, 0) * 1000000 div n_views AS BIGINT)"
            ).alias("conversion_ppm"),
        )
    )


def _soundex_chain_sql(word: str) -> str:
    """Shared Spark/DuckDB SQL for the simplified-soundex digit chain
    of ``word`` (lowercase letters): translate to the classic code
    digits, collapse runs of 1-6 with a fixed replace cascade (4
    passes halve runs — enough for any <= 16-char word; RE2 has no
    backreferences so the oracle cannot regex-collapse), drop the
    0s (vowels/h/w/y separate duplicates, then vanish)."""
    s = (
        f"translate({word}, 'abcdefghijklmnopqrstuvwxyz',"
        f" '01230120022455012623010202')"
    )
    for _ in range(4):
        for d in "123456":
            s = f"replace({s}, '{d}{d}', '{d}')"
    return f"replace({s}, '0', '')"


def _soundex_code_sql(word: str) -> str:
    """4-char simplified soundex: first letter (upper) + first 3
    collapsed digits of the REST of the word, zero-padded. Simplified
    vs NARA: no h/w transparency and no first-letter-digit merge —
    both engines implement the identical variant, and blocking only
    needs a consistent code."""
    rest = _soundex_chain_sql(f"substr({word}, 2)")
    return (
        f"(upper(substr({word}, 1, 1)) || rpad(substr({rest}, 1, 3), 3, '0'))"
    )


_SOUNDEX_WORD_SPARK = "regexp_extract(lower(p_name), '^[a-z]+', 0)"
_SOUNDEX_WORD_DUCK = "coalesce(regexp_extract(lower(p_name), '^[a-z]+'), '')"


@register(
    "soundex_blocking_parts",
    f"""
    WITH w AS MATERIALIZED (
      SELECT p_partkey, {_SOUNDEX_WORD_DUCK} AS w FROM part
    ), coded AS MATERIALIZED (
      SELECT p_partkey, w, {_soundex_code_sql('w')} AS code
      FROM w WHERE w <> ''
    )
    SELECT code,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words,
           CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS pair_count
    FROM coded GROUP BY 1
    """,
)
def soundex_blocking_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: simplified soundex of
    each part name's first word, block sizes, distinct surface forms
    per block, and the candidate-pair budget n·(n−1)/2 — the blocking
    statistics that decide whether a phonetic key is usable before
    anyone runs the expensive match step (classic Fellegi-Sunter
    preprocessing). The code is pure string expressions (translate +
    a fixed replace cascade — identical semantics in both engines;
    RE2's missing backreferences rule out regex run-collapse in the
    oracle), zero shuffle until the bounded per-code count."""
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    coded = (
        pt.select(F.expr(_SOUNDEX_WORD_SPARK).alias("w"))
        .where(F.col("w") != "")
        .select("w", F.expr(_soundex_code_sql("w")).alias("code"))
    )
    return coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.countDistinct("w").cast("bigint").alias("n_distinct_words"),
        F.expr("CAST(count(1) * (count(1) - 1) div 2 AS BIGINT)").alias(
            "pair_count"
        ),
    )


# =====================================================================
# Round 9, wave 2: Kruskal-Wallis k-sample test, exact L-moments
# =====================================================================

_KW_SAMPLES = ["1", "2", "3", "4", "5"]
_KW_C = "\n             ".join(
    f"CAST(count_if(substr(o_orderpriority, 1, 1) = '{s}') AS BIGINT) AS c{i},"
    for i, s in enumerate(_KW_SAMPLES)
)
_KW_R = "\n             ".join(
    f"CAST(SUM(c{i}) AS BIGINT) AS n{i}, CAST(SUM(c{i} * mr2) AS BIGINT) AS r{i},"
    for i in range(5)
)
_KW_A = " + ".join(
    f"(CASE WHEN n{i} > 0 THEN (r{i}::HUGEINT * r{i} * 3000000) // n{i}"
    f" ELSE 0::HUGEINT END)"
    for i in range(5)
)
_KW_K = " + ".join(f"(CASE WHEN n{i} > 0 THEN 1 ELSE 0 END)" for i in range(5))


@register(
    "kruskal_wallis_status_priority",
    f"""
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             {_KW_C[:-1]}
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_before
      FROM tiers
    ), mr AS MATERIALIZED (
      SELECT g, cnt, c0, c1, c2, c3, c4,
             2 * cnt_before + cnt + 1 AS mr2
      FROM pre
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
             {_KW_R[:-1]}
      FROM mr GROUP BY 1
    )
    SELECT g AS o_orderstatus, n,
           CAST({_KW_K} AS BIGINT) AS k_nonempty,
           CAST(({_KW_A}) // (n * (n + 1)) - 3000000 * (n + 1)
                AS BIGINT) AS h_scaled
    FROM per
    """,
)
def kruskal_wallis_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five order-priority classes, per
    order status (operators/stats.py kruskal_wallis_h — Kruskal &
    Wallis 1952): does order value distribute identically across
    priorities? The k-sample rank test with EXACT doubled mid-ranks
    and per-sample truncating divisions applied in the same floor
    order by both engines; prefix counts ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        kruskal_wallis_h,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.substring("o_orderpriority", 1, 1).alias("pr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return kruskal_wallis_h(
        base, "st", "pr", "cents", _KW_SAMPLES
    ).withColumnRenamed("st", "o_orderstatus")


@register(
    "l_moments_price_flag",
    """
    WITH ranked AS MATERIALIZED (
      SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                             AS BIGINT)) AS i
      FROM lineitem
    ), agg AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v::HUGEINT) AS s0,
             SUM((i - 1)::HUGEINT * v) AS s1,
             SUM(((i - 1) * (i - 2))::HUGEINT * v) AS t2,
             SUM((i - 1)::HUGEINT * ((i - 2) * (i - 3)) * v) AS t3
      FROM ranked GROUP BY 1
    )
    SELECT g AS l_returnflag, n,
           CAST((s0 * 1000) // n AS BIGINT) AS mean_milli,
           CAST(((2 * s1 - (n - 1) * s0) * 1000) // (n * (n - 1)) AS BIGINT)
             AS l2_milli,
           CASE WHEN 2 * s1 - (n - 1) * s0 > 0 THEN CAST(
             (CASE WHEN 6 * t2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
                        >= 0 THEN 1 ELSE -1 END)
             * (abs(6 * t2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0)
                * 1000000)
               // ((n - 2) * (2 * s1 - (n - 1) * s0)) AS BIGINT)
           END AS t3_ppm,
           CASE WHEN 2 * s1 - (n - 1) * s0 > 0 THEN CAST(
             (CASE WHEN 20 * t3 - 30 * (n - 3) * t2
                        + 12 * (n - 2) * (n - 3) * s1
                        - (n - 1) * (n - 2) * (n - 3) * s0 >= 0
                   THEN 1 ELSE -1 END)
             * (abs(20 * t3 - 30 * (n - 3) * t2
                    + 12 * (n - 2) * (n - 3) * s1
                    - (n - 1) * (n - 2) * (n - 3) * s0) * 1000000)
               // ((n - 2) * (n - 3) * (2 * s1 - (n - 1) * s0))
             AS BIGINT)
           END AS t4_ppm
    FROM agg WHERE n >= 4
    """,
)
def l_moments_price_flag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample L-moments of line price per return flag
    (operators/stats.py grouped_l_moments — Hosking 1990): L-scale,
    L-skewness, L-kurtosis as exact integer rationals on ranks — the
    robust tail-shape fingerprint classical moments can't give on
    heavy tails. Sign factored out of every truncating division
    (negative integer division floors/truncates differently across
    engines); ranks ride the range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        grouped_l_moments,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.col("l_returnflag").alias("fl"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return grouped_l_moments(base, "fl", "cents").withColumnRenamed(
        "fl", "l_returnflag"
    )


# =====================================================================
# Round 9, wave 3: time-to-convert median (k_of_n reuse), longest
# increasing subsequence per customer
# =====================================================================

@register(
    "time_to_convert_median",
    """
    WITH v AS MATERIALIZED (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'view'
    ), p AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ), conv AS MATERIALIZED (
      SELECT v.d, v.event_id,
             MIN(p.us - v.us) AS delta_us
      FROM v JOIN p ON p.user_id = v.user_id
        AND p.us > v.us AND p.us <= v.us + 3600000000
      GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
      SELECT d, delta_us,
             row_number() OVER (PARTITION BY d ORDER BY delta_us) AS rk,
             COUNT(*) OVER (PARTITION BY d) AS n
      FROM conv
    )
    SELECT CAST(d AS BIGINT) AS day, CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN delta_us END) // 1000
                AS BIGINT) AS median_delta_ms
    FROM ranked GROUP BY 1
    """,
)
def time_to_convert_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time from a 'view' to that view's FIRST 'purchase'
    within one hour, per day — the latency half of the conversion
    funnel (view_purchase_within_hour counts; this times). The median
    is the exact lower-median order statistic via
    grouped_kth_smallest's k_of_n path (k = (n+1) div 2 read off the
    ranking recipe's own bounded sizes table — the r9 one-pass
    conformal machinery reused; the oracle's PARTITION BY window is
    the sf0.01 shortcut). Candidate pairs stay equi-keyed on
    user_id."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id", "event_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = base.where(F.col("event_type") == "view").selectExpr(
        "user_id", "event_id", "us", "us div 86400000000 AS d"
    )
    p = base.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("us").alias("pus")
    )
    conv = (
        v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + 3_600_000_000),
        )
        .groupBy("d", "event_id")
        .agg(F.min(F.col("pus") - F.col("us")).alias("delta_us"))
    )
    med = grouped_kth_smallest(
        conv, "d", "delta_us", k_of_n="(n + 1) div 2"
    )
    return med.select(
        F.col("d").cast("bigint").alias("day"),
        F.col("n").cast("bigint").alias("n_conversions"),
        F.expr("CAST(kth_value div 1000 AS BIGINT)").alias("median_delta_ms"),
    )


_LIS_FOLD = """
  size(aggregate(
    vals,
    CAST(array() AS ARRAY<BIGINT>),
    (acc, y) -> IF(
      size(filter(acc, t -> t < y)) = size(acc),
      concat(acc, array(y)),
      concat(
        slice(acc, 1, size(filter(acc, t -> t < y))),
        array(y),
        slice(acc, size(filter(acc, t -> t < y)) + 2,
              size(acc) - size(filter(acc, t -> t < y)) - 1)
      )
    )
  ))
"""


@register(
    "lis_order_values_customers",
    """
    WITH RECURSIVE seq AS MATERIALIZED (
      SELECT * FROM (
        SELECT o_custkey AS c,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS i,
               CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
      ) WHERE n >= 12
    ), chain AS (
      SELECT c, i, v, 1 AS k FROM seq
      UNION
      SELECT s.c, s.i, s.v, chain.k + 1
      FROM chain JOIN seq s
        ON s.c = chain.c AND s.i > chain.i AND s.v > chain.v
    )
    SELECT chain.c AS o_custkey,
           CAST(MAX(seq.n) AS BIGINT) AS n_orders,
           CAST(MAX(chain.k) AS BIGINT) AS lis_len
    FROM chain JOIN seq ON seq.c = chain.c AND seq.i = chain.i
    GROUP BY 1
    """,
)
def lis_order_values_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing subsequence of each customer's
    order values in time order (customers with >= 12 orders) — the
    trend-persistence statistic ("how long a run of ever-bigger
    orders does this account support"), and a showcase of the shared
    SQL-fold machinery: Spark runs the O(n log n)-style patience
    algorithm as ONE row-local `aggregate` fold whose state is the
    tails array (replace the first tail >= y via filter-count +
    slice concat — no indexed-lambda pitfalls), while the oracle —
    whose folds are scalar-state only — climbs chain lengths with a
    recursive CTE (level k = elements reachable by a strictly
    increasing chain of length k, deduped per level; polynomial, and
    bounded by the per-customer eligibility filter). Per-customer
    arrays are activity-bounded (the user_event_paths class)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seq = o.select(
        F.col("o_custkey").alias("c"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    arrs = (
        seq.groupBy("c")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ok, v))), x -> x.v)"
            ).alias("vals")
        )
        .where(F.size("vals") >= 12)
    )
    return arrs.select(
        F.col("c").alias("o_custkey"),
        F.size("vals").cast("bigint").alias("n_orders"),
        F.expr(f"CAST({_LIS_FOLD} AS BIGINT)").alias("lis_len"),
    )


# =====================================================================
# Round 9, wave 4: exact quadratic trend fit (Cramer determinants)
# =====================================================================

from dpe_energy_performance_analysis_etl_spark.operators.stats import (  # noqa: E402
    QUAD_DET,
    quad_coef_sql,
)

_QUAD_ORACLE = f"""
    WITH monthly AS MATERIALIZED (
      SELECT n.n_name,
             CAST(EXTRACT(year FROM o.o_orderdate) * 12
                  + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS mn,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), mn0 AS (SELECT MIN(mn) AS m0 FROM monthly),
    xs AS MATERIALIZED (
      SELECT n_name, CAST(mn - m0 AS BIGINT) AS x, y FROM monthly, mn0
    ), moments AS MATERIALIZED (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS HUGEINT) AS s0,
             SUM(x::HUGEINT) AS s1,
             SUM(x::HUGEINT * x) AS s2,
             SUM(x::HUGEINT * x * x) AS s3,
             SUM(x::HUGEINT * x * x * x) AS s4,
             SUM(y::HUGEINT) AS t0,
             SUM(y::HUGEINT * x) AS t1,
             SUM(y::HUGEINT * x * x) AS t2
      FROM xs GROUP BY 1
    )
    SELECT n_name, n AS n_points,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('a', 1000, '//')} AS BIGINT) END AS a_scaled,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('b', 1000, '//')} AS BIGINT) END AS b_scaled,
           CASE WHEN {QUAD_DET} > 0 THEN
             CAST({quad_coef_sql('c', 1000, '//')} AS BIGINT) END AS c_scaled
    FROM moments
"""


@register("quadratic_trend_nations", _QUAD_ORACLE)
def quadratic_trend_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quadratic trend of monthly revenue per nation
    (operators/stats.py group_quadratic_fit): y = a + b·x + c·x² fit
    by Cramer's rule on integer normal equations — c's sign says
    whether a nation's revenue is accelerating or rolling over, which
    a straight line (group_linregress) can't. The regression runs
    over the BOUNDED (nation, month) table; all moments/determinants
    are exact integers; each coefficient is one sign-factored
    truncating division replicated token-for-token in the oracle via
    the shared QUAD_* SQL generators (only the `div` vs `//` operator
    differs). Dimension joins broadcast."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        group_quadratic_fit,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    monthly = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("mn"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("y")
        )
    )
    # bounded (nations x months), consumed by the min scan AND the
    # moment aggregation — cache
    monthly = monthly.cache()
    m0 = monthly.agg(F.min("mn").alias("m0"))
    xs = monthly.crossJoin(F.broadcast(m0)).selectExpr(
        "n_name", "CAST(mn - m0 AS BIGINT) AS x", "y"
    )
    return group_quadratic_fit(xs, "n_name", "x", "y", scale=1000)


# =====================================================================
# Round 9, wave 5: Wilson score lower bound (rate ranking under
# uncertainty)
# =====================================================================

# z = 2 (dyadic, ~97.7% two-sided ~95.4%): every step is integer
# except ONE bigint->double division, one sqrt (IEEE correctly
# rounded), and a fixed-order combine; floor() BEFORE the int cast
# (fractional->int casts round on DuckDB but truncate on Spark).
_WILSON_LOWER = (
    "CAST(floor((x + 2 - 2 * sqrt(CAST(x * (n - x) AS DOUBLE) / n + 1))"
    " * 1000000e0 / (n + 4)) AS BIGINT)"
)


@register(
    "wilson_return_rate_brands",
    f"""
    WITH a AS MATERIALIZED (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_brand, n, x,
           CAST((x * 1000000) // n AS BIGINT) AS rate_ppm,
           {_WILSON_LOWER} AS wilson_lower_ppm
    FROM a
    """,
)
def wilson_return_rate_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower bound (z = 2) on each brand's return rate —
    the "rank by lower confidence bound, not raw rate" correction
    (Wilson 1927; the Reddit comment sort) that stops a 2-of-3 brand
    outranking a 400-of-1300 one. The bound reduces to
    (x + 2 − 2·√(x(n−x)/n + 1)) / (n + 4): exact integers up to ONE
    bigint→double division, one correctly-rounded sqrt, and a
    fixed-order combine with an explicit floor() before the cast
    (fractional→int casts round on DuckDB but truncate on Spark —
    CLAUDE.md rule). Dimension join broadcasts; one aggregation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = (
        li.join(
            pt.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("x"),
        )
    )
    return a.selectExpr(
        "p_brand",
        "n",
        "x",
        "CAST((x * 1000000) div n AS BIGINT) AS rate_ppm",
        f"{_WILSON_LOWER} AS wilson_lower_ppm",
    )


# =====================================================================
# Round 9, wave 6: two-sweep diameter lower bound
# =====================================================================

def _two_sweep_oracle(max_depth: int) -> str:
    head = """
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z, b AS nbr FROM e UNION ALL SELECT b AS z, a AS nbr FROM e
    ), deg AS MATERIALIZED (
      SELECT z, COUNT(*) AS d FROM adj GROUP BY 1
    ), st AS MATERIALIZED (
      SELECT z AS s FROM deg ORDER BY d DESC, z LIMIT 1
    ), a0 AS MATERIALIZED (
      SELECT s AS node, 0 AS dist FROM st
    )"""
    blocks = [head]
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", a{r} AS MATERIALIZED (
      SELECT * FROM a{r - 1}
      UNION ALL
      SELECT DISTINCT j.nbr AS node, {r} AS dist
      FROM a{r - 1} f JOIN adj j ON j.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM a{r - 1} v WHERE v.node = j.nbr)
    )"""
        )
    blocks.append(
        f""", far AS MATERIALIZED (
      SELECT node AS u FROM a{max_depth} ORDER BY dist DESC, node LIMIT 1
    ), b0 AS MATERIALIZED (
      SELECT u AS node, 0 AS dist FROM far
    )"""
    )
    for r in range(1, max_depth + 1):
        blocks.append(
            f""", b{r} AS MATERIALIZED (
      SELECT * FROM b{r - 1}
      UNION ALL
      SELECT DISTINCT j.nbr AS node, {r} AS dist
      FROM b{r - 1} f JOIN adj j ON j.z = f.node
      WHERE f.dist = {r - 1}
        AND NOT EXISTS (SELECT 1 FROM b{r - 1} v WHERE v.node = j.nbr)
    )"""
        )
    blocks.append(
        f"""
    SELECT CAST(st.s AS BIGINT) AS start_node,
           CAST((SELECT MAX(dist) FROM a{max_depth}) AS BIGINT) AS ecc_start,
           CAST(far.u AS BIGINT) AS far_node,
           CAST((SELECT MAX(dist) FROM b{max_depth}) AS BIGINT) AS diameter_lb,
           CAST((SELECT COUNT(*) FROM a{max_depth}) AS BIGINT)
             AS n_reached_start,
           CAST((SELECT COUNT(*) FROM b{max_depth}) AS BIGINT)
             AS n_reached_far
    FROM st, far
    """
    )
    return "".join(blocks)


@register("diameter_two_sweep_parts", _two_sweep_oracle(6))
def diameter_two_sweep_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sweep diameter lower bound of the recurring-pair part
    graph (operators/graph.py diameter_two_sweep — Magnien, Latapy &
    Habib 2009): BFS from the max-degree node, re-BFS from the
    farthest node found; the second eccentricity is the classic cheap
    diameter estimate (exact on trees). Both sweeps hop-capped at 6
    (a bound equal to the cap means "at least 6" — honest).
    Deterministic start/far picks via min-of-struct (tie: smallest
    id); each BFS round is frontier ⋈ adjacency + visited anti-join
    with eager localCheckpoint lineage cuts. The oracle unrolls both
    sweeps as MATERIALIZED CTE rounds."""
    from dpe_energy_performance_analysis_etl_spark.operators.graph import (
        diameter_two_sweep,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    return diameter_two_sweep(pairs, max_depth=6)


# =====================================================================
# Round 9, wave 7: CUPED variance-reduced experiment readout
# =====================================================================

@register(
    "cuped_adjusted_lift_events",
    """
    WITH d AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ), d0 AS (SELECT MIN(day) AS d0 FROM d),
    per_user AS MATERIALIZED (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(count_if(day <  d0.d0 + 15) AS BIGINT) AS x,
             CAST(count_if(day >= d0.d0 + 15) AS BIGINT) AS y
      FROM d, d0 GROUP BY 1, 2, d0.d0
    ), g AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(x::HUGEINT * y) AS sxy, SUM(x::HUGEINT * x) AS sxx
      FROM per_user
    ), st AS MATERIALIZED (
      SELECT n, sx, sy,
             (n * sxy - sx::HUGEINT * sy) AS cov_num,
             (n * sxx - sx::HUGEINT * sx) AS var_num
      FROM g
    ), pv AS MATERIALIZED (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_v,
             CAST(SUM(x) AS BIGINT) AS sx_v, CAST(SUM(y) AS BIGINT) AS sy_v
      FROM per_user GROUP BY 1
    )
    SELECT pv.variant, pv.n_v AS n_users,
           CAST((sy_v * 1000) // n_v AS BIGINT) AS mean_y_milli,
           CASE WHEN st.var_num > 0 THEN CAST(
             (CASE WHEN st.cov_num >= 0 THEN 1 ELSE -1 END)
             * (abs(st.cov_num) * 1000000) // st.var_num AS BIGINT)
           END AS theta_micro,
           CASE WHEN st.var_num > 0 THEN CAST(
             (CASE WHEN sy_v::HUGEINT * st.var_num * st.n
                        - st.cov_num * (sx_v::HUGEINT * st.n - st.sx * n_v)
                        >= 0 THEN 1 ELSE -1 END)
             * abs(sy_v::HUGEINT * st.var_num * st.n
                   - st.cov_num * (sx_v::HUGEINT * st.n - st.sx * n_v))
             * 1000 // (n_v::HUGEINT * st.var_num * st.n) AS BIGINT)
           END AS adjusted_mean_y_milli
    FROM pv, st
    """,
)
def cuped_adjusted_lift_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al.,
    WSDM'13 — the standard pre-period covariate adjustment every A/B
    platform runs): per synthetic variant (user_id parity), the raw
    and CUPED-adjusted mean post-period activity, with
    θ = cov(x,y)/var(x) from the pre-period covariate x. The entire
    adjustment is ONE exact rational per variant —
    [Σy_v·var·n − cov·(Σx_v·n − Σx·n_v)] / (n_v·var·n) — carried in
    DECIMAL(38,0)/HUGEINT with the sign factored out of the one
    truncating division. The pre/post split anchors to the DATA's
    observed min day + 15 (never a schema epoch — CLAUDE.md rule).
    One (user) aggregation, bounded scalar tables after."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    d = ev.select(
        "user_id", epoch_micros("ts").alias("us")
    ).selectExpr("user_id", "us div 86400000000 AS day")
    d0 = d.agg(F.min("day").alias("d0"))
    per_user = (
        d.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("day") < F.col("d0") + 15)
            .cast("bigint")
            .alias("x"),
            F.count_if(F.col("day") >= F.col("d0") + 15)
            .cast("bigint")
            .alias("y"),
        )
        .withColumn("variant", F.expr("CAST(user_id % 2 AS BIGINT)"))
        # consumed by the global-stats agg AND the per-variant agg —
        # bounded (one row per user is data-sized, but both consumers
        # are cheap aggregations of a narrow projection); cache the
        # small 4-column table
        .cache()
    )
    g = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    st = g.selectExpr(
        "n",
        "sx",
        "sy",
        "(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) AS cov_num",
        "(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS var_num",
    )
    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum("x").cast("bigint").alias("sx_v"),
        F.sum("y").cast("bigint").alias("sy_v"),
    )
    return pv.crossJoin(F.broadcast(st)).selectExpr(
        "variant",
        "n_v AS n_users",
        "CAST((sy_v * 1000) div n_v AS BIGINT) AS mean_y_milli",
        """CASE WHEN var_num > 0 THEN CAST(
             (CASE WHEN cov_num >= 0 THEN 1 ELSE -1 END)
             * (abs(cov_num) * 1000000) div var_num AS BIGINT)
           END AS theta_micro""",
        """CASE WHEN var_num > 0 THEN CAST(
             (CASE WHEN CAST(sy_v AS DECIMAL(38,0)) * var_num * n
                        - cov_num * (CAST(sx_v AS DECIMAL(38,0)) * n - sx * n_v)
                        >= 0 THEN 1 ELSE -1 END)
             * abs(CAST(sy_v AS DECIMAL(38,0)) * var_num * n
                   - cov_num * (CAST(sx_v AS DECIMAL(38,0)) * n - sx * n_v))
             * 1000 div (CAST(n_v AS DECIMAL(38,0)) * var_num * n) AS BIGINT)
           END AS adjusted_mean_y_milli""",
    )


# =====================================================================
# Round 9, wave 8: nearest as-of join (bidirectional)
# =====================================================================

@register(
    "asof_nearest_error_click",
    """
    WITH e AS MATERIALIZED (
      SELECT event_id AS eid, user_id, epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'error'
    ), c AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    ), pairs AS MATERIALIZED (
      SELECT e.eid, e.d, e.us, c.cus
      FROM e JOIN c ON c.user_id = e.user_id
    ), best AS MATERIALIZED (
      SELECT *, row_number() OVER (PARTITION BY eid
        ORDER BY abs(cus - us), (cus > us), cus) AS rn
      FROM pairs
    ), matched AS MATERIALIZED (
      SELECT eid, d, abs(cus - us) AS adel, (cus <= us) AS back
      FROM best WHERE rn = 1
    )
    SELECT CAST(e2.d AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(COUNT(m.eid) AS BIGINT) AS n_matched,
           CAST(count_if(m.back) AS BIGINT) AS n_backward,
           CASE WHEN COUNT(m.eid) > 0 THEN
             CAST((SUM(m.adel) // 1000) // COUNT(m.eid) AS BIGINT)
           END AS mean_abs_delta_ms
    FROM e e2 LEFT JOIN matched m ON m.eid = e2.eid
    GROUP BY 1
    """,
)
def asof_nearest_error_click_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join (operators/temporal.py
    asof_join_nearest — the bidirectional third as-of semantic): for
    each 'error' event, the temporally CLOSEST 'click' by the same
    user in either direction (tie prefers the earlier-or-equal
    match), rolled up per day. Spark runs two merge-sort-window as-of
    passes (no candidate pair blowup); the oracle's all-pairs
    user-keyed join + row_number is the sf0.01 shortcut. Mean |Δ| is exact: the µs delta SUM
    floors to ms, then one truncating division by the match count —
    the identical two-step floor order in both engines."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )
    from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
        asof_join_nearest,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", "event_type", epoch_micros("ts").alias("us")
    )
    e = base.where(F.col("event_type") == "error").selectExpr(
        "event_id AS eid", "user_id", "us", "us div 86400000000 AS d"
    )
    c = base.where(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("cus")
    )
    near = asof_join_nearest(
        e, c, on="user_id", left_ts="us", right_ts="cus", right_payload=[]
    )
    return (
        near.groupBy(F.col("d").cast("bigint").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_errors"),
            F.count("cus_near").cast("bigint").alias("n_matched"),
            F.count_if(F.col("__direction") == "b")
            .cast("bigint")
            .alias("n_backward"),
            F.when(
                F.count("cus_near") > 0,
                F.expr(
                    "CAST((sum(abs(cus_near - us)) div 1000)"
                    " div count(cus_near) AS BIGINT)"
                ),
            ).alias("mean_abs_delta_ms"),
        )
    )


# =====================================================================
# Round 9, wave 9: Jonckheere-Terpstra pairwise U, grouped Spearman,
# RSI momentum
# =====================================================================

_JT_SAMPLES = ["1", "2", "3", "4", "5"]
_JT_C = ",\n             ".join(
    f"CAST(count_if(substr(o_orderpriority, 1, 1) = '{s}') AS BIGINT) AS c{i}"
    for i, s in enumerate(_JT_SAMPLES)
)
_JT_WIN = (
    "OVER (PARTITION BY g ORDER BY v"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
)
_JT_PRE = ",\n             ".join(
    f"CAST(COALESCE(SUM(c{i}) {_JT_WIN}, 0) AS BIGINT) AS c{i}_before"
    for i in range(5)
)
_JT_PER = ",\n             ".join(
    [f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(5)]
    + [
        f"CAST(SUM(c{j} * (2 * c{i}_before + c{i})) AS BIGINT) AS u2_{i}_{j}"
        for i in range(5)
        for j in range(5)
        if i < j
    ]
)
_JT_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT g AS o_orderstatus, '{_JT_SAMPLES[i]}' AS pr_lo,
           '{_JT_SAMPLES[j]}' AS pr_hi, n{i} AS n_lo, n{j} AS n_hi,
           u2_{i}_{j} AS u2, CAST(n{i} * n{j} AS BIGINT) AS e2 FROM per"""
    for i in range(5)
    for j in range(5)
    if i < j
)


@register(
    "jonckheere_u_status_priority",
    f"""
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             {_JT_C}
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             {_JT_PRE}
      FROM tiers
    ), per AS MATERIALIZED (
      SELECT g,
             {_JT_PER}
      FROM pre GROUP BY 1
    )
{_JT_UNION}
    """,
)
def jonckheere_u_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra trend components per order status
    (operators/stats.py jonckheere_pairwise_u): for every ordered
    priority pair i < j, the doubled Mann-Whitney count 2·U_ij of
    order-value pairs shifting upward, against the doubled null
    expectation e2 = n_i·n_j — the ordered-alternative k-sample test
    Kruskal-Wallis can't see (JT weights the ORDER of the classes).
    Exact integers end to end: doubled strict-less counts plus tie
    mid-counts off per-sample prefixes, which ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut); the 10 pair rows
    come off ONE explode(array(struct…)) per group."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        jonckheere_pairwise_u,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.substring("o_orderpriority", 1, 1).alias("pr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return jonckheere_pairwise_u(
        base, "st", "pr", "v", _JT_SAMPLES
    ).withColumnRenamed("st", "o_orderstatus")


_SP_CN = "CAST(n AS HUGEINT) * (n + 1) * (n + 1)"


@register(
    "spearman_qty_price_brands",
    f"""
    WITH base AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tx AS MATERIALIZED (
      SELECT g, x,
             2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + cnt + 1 AS mr2x
      FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM base GROUP BY 1, 2)
    ), ty AS MATERIALIZED (
      SELECT g, y,
             2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + cnt + 1 AS mr2y
      FROM (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM base GROUP BY 1, 2)
    ), agg AS MATERIALIZED (
      SELECT b.g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(tx.mr2x::HUGEINT * ty.mr2y) AS sxy,
             SUM(tx.mr2x::HUGEINT * tx.mr2x) AS sxx,
             SUM(ty.mr2y::HUGEINT * ty.mr2y) AS syy
      FROM base b
      JOIN tx ON tx.g = b.g AND tx.x = b.x
      JOIN ty ON ty.g = b.g AND ty.y = b.y
      GROUP BY 1
    )
    SELECT g AS p_brand, n,
           CASE WHEN sxx > {_SP_CN} AND syy > {_SP_CN} THEN CAST(
             (CASE WHEN sxy >= {_SP_CN} THEN 1 ELSE -1 END)
             * floor(CAST(abs(sxy - ({_SP_CN})) AS DOUBLE) * 1000000e0
               / sqrt(CAST(sxx - ({_SP_CN}) AS DOUBLE)
                 * CAST(syy - ({_SP_CN}) AS DOUBLE)))
           AS BIGINT) END AS rho_ppm
    FROM agg
    """,
)
def spearman_qty_price_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and line price per
    brand (operators/stats.py grouped_spearman): the tie-aware
    mid-rank form, exact doubled-rank integers up to two scale-0
    decimal→double conversions, one sqrt, one division, sign factored
    out of the floor. Rank prefixes ride the grouped_running_totals
    range-partition recipe (the oracle's PARTITION BY windows are the
    sf0.01 shortcut); the bounded quantity tier broadcasts, the dense
    price tier shuffle-joins — both equi-keyed. The feed is a
    parquet scan ⋈ broadcast dim, cheap to consume three times (the
    NOTES histprune rule)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        grouped_spearman,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return grouped_spearman(base, "p_brand", "qty", "cents")


@register(
    "rsi_monthly_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ), d AS MATERIALIZED (
      SELECT month, rev_cents,
             rev_cents - lag(rev_cents) OVER (ORDER BY month) AS delta
      FROM monthly
    ), w AS MATERIALIZED (
      SELECT month, rev_cents,
             CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END)
               OVER (ORDER BY month
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS gain14,
             CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
               OVER (ORDER BY month
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS loss14,
             COUNT(delta) OVER (ORDER BY month
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS nd
      FROM d
    )
    SELECT month, rev_cents, gain14, loss14,
           CASE WHEN gain14 + loss14 > 0
                THEN CAST((gain14 * 1000000) // (gain14 + loss14) AS BIGINT)
           END AS rsi_ppm
    FROM w WHERE nd = 14
    """,
)
def rsi_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Relative Strength Index on monthly revenue (Wilder
    1978, the SMA variant): gains and losses from month-over-month
    deltas in EXACT integer cents, one 14-row sliding sum over the
    bounded month table, and rsi_ppm = gain·10⁶ div (gain+loss) — a
    single truncating integer division, zero float ops anywhere.
    The only windows run over ~|months| rows, never the fact table;
    rows before the 14th delta are excluded (nd = 14), months with
    no movement emit NULL."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    wm = Window.orderBy("month")
    d = monthly.withColumn(
        "delta", F.col("rev_cents") - F.lag("rev_cents").over(wm)
    )
    w14 = Window.orderBy("month").rowsBetween(-13, 0)
    w = d.select(
        "month",
        "rev_cents",
        F.sum(F.expr("CASE WHEN delta > 0 THEN delta ELSE 0 END"))
        .over(w14)
        .cast("bigint")
        .alias("gain14"),
        F.sum(F.expr("CASE WHEN delta < 0 THEN -delta ELSE 0 END"))
        .over(w14)
        .cast("bigint")
        .alias("loss14"),
        F.count("delta").over(w14).alias("nd"),
    )
    return w.where(F.col("nd") == 14).selectExpr(
        "month",
        "rev_cents",
        "gain14",
        "loss14",
        "CASE WHEN gain14 + loss14 > 0 THEN"
        " CAST((gain14 * 1000000) div (gain14 + loss14) AS BIGINT)"
        " END AS rsi_ppm",
    )


# =====================================================================
# Round 9, wave 10: Copeland pairwise duels, Gini decision stump,
# McNemar paired test
# =====================================================================

@register(
    "copeland_brand_duels",
    """
    WITH cb AS MATERIALIZED (
      SELECT o.o_custkey AS cust, p.p_brand AS b,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS s
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), na AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM cb GROUP BY 1
    ), cells AS MATERIALIZED (
      SELECT x.b AS b1, y.b AS b2,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(count_if(x.s > y.s) AS BIGINT) AS gt1,
             CAST(count_if(x.s < y.s) AS BIGINT) AS gt2
      FROM cb x JOIN cb y ON x.cust = y.cust AND x.b < y.b
      GROUP BY 1, 2
    ), duel AS MATERIALIZED (
      SELECT a.b AS b1, c.b AS b2,
             a.n - COALESCE(p.nb, 0) + COALESCE(p.gt1, 0) AS w1,
             c.n - COALESCE(p.nb, 0) + COALESCE(p.gt2, 0) AS w2
      FROM na a JOIN na c ON a.b < c.b
      LEFT JOIN cells p ON p.b1 = a.b AND p.b2 = c.b
    ), pts AS MATERIALIZED (
      SELECT b1 AS b,
             CASE WHEN w1 > w2 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END AS pt
      FROM duel
      UNION ALL
      SELECT b2,
             CASE WHEN w2 > w1 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END
      FROM duel
    )
    SELECT na.b AS p_brand, na.n AS n_buyers,
           CAST(COALESCE(SUM(pts.pt), 0) AS BIGINT) AS copeland2,
           CAST(COALESCE(SUM(pts.pt), 0) AS BIGINT)
             = 2 * ((SELECT COUNT(*) FROM na) - 1) AS is_condorcet
    FROM na LEFT JOIN pts ON pts.b = na.b
    GROUP BY 1, 2
    """,
)
def copeland_brand_duels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland pairwise-duel ranking of brands by customer spend
    (Copeland 1951): brand a beats brand b if MORE customers spent
    more on a than on b (never-bought = zero spend, so a customer
    buying only a prefers a; buying neither is a tie and cancels).
    copeland2 = Σ over the 24 duels of 2·win + 1·draw; a brand with
    copeland2 = 2·(k−1) is the Condorcet winner. Exact integer cents
    everywhere; duel wins come off per-pair comparison counts.

    Scale shape: the apriori basket-array replan pattern — one
    (customer, brand) spend aggregation, per-customer sorted basket,
    singles + pairwise comparisons exploded ROW-LOCALLY (≤ k(k−1)/2
    per customer, k bounded by the brand domain — never a data-sized
    self-join shuffle), one bounded (b1, b2) aggregation pinned
    eagerly (its filters feed na / cells / scores), bounded-table
    algebra after. The oracle's customer self-join is the sf0.01
    shortcut."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    cb = (
        li.join(o.select("o_orderkey", "o_custkey"), li["l_orderkey"] == F.col("o_orderkey"))
        .join(pt.select("p_partkey", "p_brand"), li["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("b"))
        .agg(
            F.sum(
                F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
            )
            .cast("bigint")
            .alias("s")
        )
    )
    baskets = cb.groupBy("cust").agg(
        F.expr("sort_array(collect_list(struct(b, s)))").alias("items")
    )
    exploded = baskets.select(
        F.explode(
            F.expr(
                """
                concat(
                  transform(items, x ->
                    struct(x.b AS b1, CAST(NULL AS STRING) AS b2, 2 AS cmp)),
                  flatten(transform(items, (x, i) ->
                    transform(
                      slice(items, i + 2, greatest(size(items) - i - 1, 0)),
                      y -> struct(x.b AS b1, y.b AS b2,
                                  CASE WHEN x.s > y.s THEN 1
                                       WHEN x.s < y.s THEN -1
                                       ELSE 0 END AS cmp)))))
                """
            )
        ).alias("e")
    ).select("e.b1", "e.b2", "e.cmp")
    # bounded (≤ k + k(k-1)/2 rows) multi-consumer aggregate — pinned
    # eagerly so na/cells/score branches never re-run the explode
    agg = (
        exploded.groupBy("b1", "b2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.count_if(F.col("cmp") == 1).cast("bigint").alias("gt1"),
            F.count_if(F.col("cmp") == -1).cast("bigint").alias("gt2"),
        )
        .localCheckpoint(eager=True)
    )
    na = agg.where(F.col("b2").isNull()).select(
        F.col("b1").alias("b"), F.col("nb").alias("n")
    )
    cells = agg.where(F.col("b2").isNotNull())
    grid = (
        na.alias("a")
        .join(F.broadcast(na.alias("c")), F.expr("a.b < c.b"))
        .selectExpr("a.b AS b1", "c.b AS b2", "a.n AS n1", "c.n AS n2")
    )
    duel = grid.join(cells, ["b1", "b2"], "left").selectExpr(
        "b1",
        "b2",
        "n1 - COALESCE(nb, 0) + COALESCE(gt1, 0) AS w1",
        "n2 - COALESCE(nb, 0) + COALESCE(gt2, 0) AS w2",
    )
    pts = duel.selectExpr(
        "explode(array("
        " struct(b1 AS b, CASE WHEN w1 > w2 THEN 2 WHEN w1 = w2 THEN 1"
        "                      ELSE 0 END AS pt),"
        " struct(b2 AS b, CASE WHEN w2 > w1 THEN 2 WHEN w1 = w2 THEN 1"
        "                      ELSE 0 END AS pt))) AS e"
    ).select("e.b", "e.pt")
    k = na.agg(F.count(F.lit(1)).alias("k"))
    cop = pts.groupBy("b").agg(F.sum("pt").cast("bigint").alias("cop2"))
    return (
        na.join(cop, "b", "left")
        .crossJoin(F.broadcast(k))
        .selectExpr(
            "b AS p_brand",
            "n AS n_buyers",
            "CAST(COALESCE(cop2, 0) AS BIGINT) AS copeland2",
            "COALESCE(cop2, 0) = 2 * (k - 1) AS is_condorcet",
        )
    )


@register(
    "gini_stump_qty_returns",
    """
    WITH t AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(count_if(l_returnflag = 'R') AS BIGINT) AS pos
      FROM lineitem GROUP BY 1
    ), c AS MATERIALIZED (
      SELECT qty,
             CAST(SUM(cnt) OVER (ORDER BY qty
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_le,
             CAST(SUM(pos) OVER (ORDER BY qty
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pos_le,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n_tot,
             CAST(SUM(pos) OVER () AS BIGINT) AS p_tot
      FROM t
    ), s AS MATERIALIZED (
      SELECT qty AS qty_threshold, n_le, pos_le,
             CAST((2 * (pos_le::HUGEINT * (n_le - pos_le) * (n_tot - n_le)
                   + (p_tot - pos_le)::HUGEINT
                     * ((n_tot - n_le) - (p_tot - pos_le)) * n_le)
                   * 1000000000)
                  // (n_le::HUGEINT * (n_tot - n_le) * n_tot)
                  AS BIGINT) AS impurity_ppb
      FROM c WHERE n_le < n_tot
    )
    SELECT qty_threshold, n_le, pos_le, impurity_ppb,
           impurity_ppb = MIN(impurity_ppb) OVER () AS is_best
    FROM s
    """,
)
def gini_stump_qty_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search (CART, Breiman 1984): for every
    quantity threshold t, the weighted Gini impurity of the split
    qty ≤ t predicting l_returnflag = 'R' — as ONE exact integer
    rational per candidate, impurity_ppb =
    ⌊2·(p_L·q_L·n_R + p_R·q_R·n_L)·10⁹ / (n_L·n_R·N)⌋ (the common
    2p(1−p) form cross-multiplied so zero float ops survive), and
    the argmin flagged. One fact-table aggregation to the BOUNDED
    (≤ |qty domain|) tier table; prefix sums and the min ride
    windows over ≤ 50 rows. Magnitude bound n³·10⁹/2 < 10³⁸ —
    n ≲ 5·10⁹ rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = li.groupBy(F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("pos"),
    )
    w_cum = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("qty").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = t.select(
        "qty",
        F.sum("cnt").over(w_cum).cast("bigint").alias("n_le"),
        F.sum("pos").over(w_cum).cast("bigint").alias("pos_le"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_tot"),
        F.sum("pos").over(w_all).cast("bigint").alias("p_tot"),
    )
    s = c.where(F.col("n_le") < F.col("n_tot")).selectExpr(
        "qty AS qty_threshold",
        "n_le",
        "pos_le",
        "CAST((2 * (CAST(pos_le AS DECIMAL(38,0)) * (n_le - pos_le)"
        "            * (n_tot - n_le)"
        "       + CAST(p_tot - pos_le AS DECIMAL(38,0))"
        "         * ((n_tot - n_le) - (p_tot - pos_le)) * n_le)"
        "       * 1000000000)"
        "      div (CAST(n_le AS DECIMAL(38,0)) * (n_tot - n_le) * n_tot)"
        "      AS BIGINT) AS impurity_ppb",
    )
    w_min = Window.orderBy("qty_threshold").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return s.select(
        "qty_threshold",
        "n_le",
        "pos_le",
        "impurity_ppb",
        (F.col("impurity_ppb") == F.min("impurity_ppb").over(w_min)).alias(
            "is_best"
        ),
    )


@register(
    "mcnemar_repeat_purchase",
    """
    WITH base AS MATERIALIZED (
      SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS d
      FROM events
    ), bounds AS MATERIALIZED (
      SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM base
    ), u AS MATERIALIZED (
      SELECT user_id,
             count_if(event_type = 'purchase'
                      AND d < (dmin + dmax + 1) // 2) > 0 AS p1,
             count_if(event_type = 'purchase'
                      AND d >= (dmin + dmax + 1) // 2) > 0 AS p2
      FROM base, bounds GROUP BY 1
    ), m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(count_if(p1 AND p2) AS BIGINT) AS n_both,
             CAST(count_if(NOT p1 AND NOT p2) AS BIGINT) AS n_neither,
             CAST(count_if(p1 AND NOT p2) AS BIGINT) AS b_lapsed,
             CAST(count_if(p2 AND NOT p1) AS BIGINT) AS c_adopted
      FROM u
    )
    SELECT n_users, n_both, n_neither, b_lapsed, c_adopted,
           CASE WHEN b_lapsed + c_adopted > 0 THEN
             CAST(((b_lapsed - c_adopted) * (b_lapsed - c_adopted)
                   * 1000000) // (b_lapsed + c_adopted) AS BIGINT)
           END AS mcnemar_ppm,
           CASE WHEN b_lapsed + c_adopted > 0 THEN
             CAST((greatest(abs(b_lapsed - c_adopted) - 1, 0)
                   * greatest(abs(b_lapsed - c_adopted) - 1, 0)
                   * 1000000) // (b_lapsed + c_adopted) AS BIGINT)
           END AS mcnemar_cc_ppm
    FROM m
    """,
)
def mcnemar_repeat_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (McNemar 1947) on purchase behavior
    across the two halves of the observed window: each user is their
    own pair (purchased in H1? in H2?), the statistic lives on the
    DISCORDANT counts only — χ² = (b−c)²/(b+c), emitted ppm-scaled
    with one truncating division, plus the continuity-corrected
    (|b−c|−1)² variant. The half boundary anchors to the DATA's
    observed day range (CLAUDE.md: never a schema epoch), attached
    as a broadcast scalar row; one user-keyed aggregation, one
    bounded fold — zero float ops."""
    from dpe_energy_performance_analysis_etl_spark.functions.temporal import (
        epoch_micros,
    )

    ev = read_events(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_type",
        (epoch_micros("ts") / F.lit(86400000000)).cast("bigint").alias("d"),
    )
    bounds = base.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    u = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & F.expr("d < (dmin + dmax + 1) div 2")
                )
                > 0
            ).alias("p1"),
            (
                F.count_if(
                    (F.col("event_type") == "purchase")
                    & F.expr("d >= (dmin + dmax + 1) div 2")
                )
                > 0
            ).alias("p2"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count_if(F.col("p1") & F.col("p2")).cast("bigint").alias("n_both"),
        F.count_if(~F.col("p1") & ~F.col("p2"))
        .cast("bigint")
        .alias("n_neither"),
        F.count_if(F.col("p1") & ~F.col("p2")).cast("bigint").alias("b_lapsed"),
        F.count_if(F.col("p2") & ~F.col("p1"))
        .cast("bigint")
        .alias("c_adopted"),
    )
    return m.selectExpr(
        "n_users",
        "n_both",
        "n_neither",
        "b_lapsed",
        "c_adopted",
        "CASE WHEN b_lapsed + c_adopted > 0 THEN"
        " CAST(((b_lapsed - c_adopted) * (b_lapsed - c_adopted) * 1000000)"
        " div (b_lapsed + c_adopted) AS BIGINT) END AS mcnemar_ppm",
        "CASE WHEN b_lapsed + c_adopted > 0 THEN"
        " CAST((greatest(abs(b_lapsed - c_adopted) - 1, 0)"
        "       * greatest(abs(b_lapsed - c_adopted) - 1, 0) * 1000000)"
        " div (b_lapsed + c_adopted) AS BIGINT) END AS mcnemar_cc_ppm",
    )


# =====================================================================
# Round 9, wave 11: Hodges-Lehmann pseudo-median, Cramér-von Mises
# two-sample, Moran's I grid autocorrelation
# =====================================================================

@register(
    "hl_pseudomedian_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), w AS MATERIALIZED (
      SELECT a.rev + b.rev AS walsh2
      FROM monthly a JOIN monthly b ON a.month <= b.month
    ), r AS MATERIALIZED (
      SELECT walsh2, row_number() OVER (ORDER BY walsh2) AS rk,
             COUNT(*) OVER () AS n
      FROM w
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_months,
           CAST(MAX(n) AS BIGINT) AS n_walsh_pairs,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN walsh2 END)
                AS BIGINT) AS pseudo_median_2x_cents,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN walsh2 END) // 2
                AS BIGINT) AS pseudo_median_cents
    FROM r
    """,
)
def hl_pseudomedian_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann one-sample pseudo-median of monthly revenue
    (Hodges & Lehmann 1963): the exact LOW median of all n(n+1)/2
    Walsh averages (x_i + x_j)/2 over i ≤ j — the location estimator
    with 0.955 Gaussian efficiency AND a 29% breakdown point, where
    the plain median wastes efficiency and the mean has no
    robustness. Walsh averages are carried DOUBLED (x_i + x_j stays
    exact integer cents); the pair table is bounded by |months|², so
    the self-join is a broadcast of an eagerly-pinned ≤|months|-row
    aggregate (the fact scan runs ONCE) and the rank window runs
    over ≤ |months|² rows — never the fact table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # three consumers of a tiny table
    )
    w = (
        monthly.alias("a")
        .join(F.broadcast(monthly.alias("b")), F.expr("a.month <= b.month"))
        .selectExpr("a.rev + b.rev AS walsh2")
    )
    wr = Window.orderBy("walsh2")
    wa = Window.orderBy("walsh2").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = w.select(
        "walsh2",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    nm = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return (
        r.agg(
            F.max("n").cast("bigint").alias("n_walsh_pairs"),
            F.max(F.expr("CASE WHEN rk = (n + 1) div 2 THEN walsh2 END"))
            .cast("bigint")
            .alias("pseudo_median_2x_cents"),
        )
        .crossJoin(F.broadcast(nm))
        .selectExpr(
            "n_months",
            "n_walsh_pairs",
            "pseudo_median_2x_cents",
            "CAST(pseudo_median_2x_cents div 2 AS BIGINT)"
            " AS pseudo_median_cents",
        )
    )


@register(
    "cvm_urgency_status",
    """
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c1,
             CAST(count_if(o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c2
      FROM orders GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT g, c1 + c2 AS c,
             CAST(COALESCE(SUM(c1) OVER win, 0) + c1 AS BIGINT) AS a,
             CAST(COALESCE(SUM(c2) OVER win, 0) + c2 AS BIGINT) AS b
      FROM tiers
      WINDOW win AS (PARTITION BY g ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), agg AS MATERIALIZED (
      SELECT g, CAST(MAX(a) AS BIGINT) AS n1, CAST(MAX(b) AS BIGINT) AS n2,
             SUM(c::HUGEINT * a * a) AS sa2,
             SUM(c::HUGEINT * a * b) AS sab,
             SUM(c::HUGEINT * b * b) AS sb2
      FROM pre GROUP BY 1
    )
    SELECT g AS o_orderstatus, n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(
             (((n2::HUGEINT * n2 * sa2 - 2 * n1::HUGEINT * n2 * sab
                + n1::HUGEINT * n1 * sb2)
               // ((n1 + n2)::HUGEINT * (n1 + n2))) * 1000000)
             // (n1::HUGEINT * n2) AS BIGINT) END AS cvm_ppm
    FROM agg
    """,
)
def cvm_urgency_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample test per order status
    (operators/stats.py cramer_von_mises_2samp): urgent (priority
    1-2) vs normal order values compared across the WHOLE ECDF —
    the integrated-squared-distance alternative where KS sees only
    the worst single gap. The expanded-square identity makes it one
    pass over the (status, price) tier table (sample sizes fall out
    of the same aggregation as max inclusive prefixes), exact
    DECIMAL(38,0) throughout, two fixed-order truncating divisions;
    prefixes ride the grouped_running_totals range-partition recipe
    (the oracle's PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramer_von_mises_2samp,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return cramer_von_mises_2samp(base, "st", "urgent", "v").withColumnRenamed(
        "st", "o_orderstatus"
    )


@register(
    "morans_i_balance_grid",
    """
    WITH cells AS MATERIALIZED (
      SELECT (c_custkey // 100) % 100 AS cx, c_custkey % 100 AS cy,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS val
      FROM customer GROUP BY 1, 2
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(val) AS BIGINT) AS s
      FROM cells
    ), ctr AS MATERIALIZED (
      SELECT cx, cy, (n::HUGEINT * val - s) AS d FROM cells, tot
    ), nbr AS MATERIALIZED (
      SELECT cx + 1 AS cx, cy, d AS d_nbr FROM ctr
      UNION ALL SELECT cx - 1, cy, d FROM ctr
      UNION ALL SELECT cx, cy + 1, d FROM ctr
      UNION ALL SELECT cx, cy - 1, d FROM ctr
    ), pairs AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS w, SUM(c.d * nbr.d_nbr) AS cross_sum
      FROM ctr c JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy
    ), var AS MATERIALIZED (
      SELECT SUM(d * d) AS var_sum FROM ctr
    )
    SELECT tot.n AS n_cells, pairs.w AS w_pairs,
           CASE WHEN pairs.w > 0 AND var.var_sum > 0 THEN CAST(
             (CASE WHEN pairs.cross_sum >= 0 THEN 1 ELSE -1 END)
             * ((abs(pairs.cross_sum) * tot.n * 1000000)
                // (var.var_sum * pairs.w))
           AS BIGINT) END AS morans_i_scaled
    FROM tot, pairs, var
    """,
)
def morans_i_balance_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I spatial autocorrelation (operators/spatial.py
    morans_i_grid) of aggregate account balance over the synthesized
    100×100 customer site grid (same coordinate derivation as
    point_in_polygon_tags / dbscan_customer_sites), rook adjacency:
    do neighboring cells hold similar wealth? The n-scaled centering
    (n·x − S) keeps every term an exact integer, neighbor candidates
    are equi-keyed (each cell explodes its 4 rook keys — never a
    distance cross join), and the single division is sign-factored.
    Near 0 here by construction — custkey-derived values are
    spatially unstructured, which is exactly the null a detector
    must not reject."""
    from dpe_energy_performance_analysis_etl_spark.operators.spatial import (
        morans_i_grid,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cells = c.groupBy(
        F.expr("(c_custkey div 100) % 100").alias("cx"),
        (F.col("c_custkey") % 100).alias("cy"),
    ).agg(
        F.sum(
            F.expr("CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("val")
    )
    return morans_i_grid(cells, "cx", "cy", "val")


# =====================================================================
# Round 9, wave 12: Friedman rank test, matrix-profile discord,
# Mantel-Haenszel common odds ratio
# =====================================================================

_FR_R2 = ",\n             ".join(
    f"CAST(SUM(CASE WHEN pr = '{s}' THEN mr2 ELSE 0 END) AS BIGINT) AS r2_p{s}"
    for s in ["1", "2", "3", "4", "5"]
)
_FR_SUMSQ = " + ".join(f"r2_p{s} * r2_p{s}" for s in ["1", "2", "3", "4", "5"])


@register(
    "friedman_nation_priority",
    f"""
    WITH cell AS MATERIALIZED (
      SELECT n.n_name AS blk, substr(o.o_orderpriority, 1, 1) AS pr,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), rk AS MATERIALIZED (
      SELECT blk, pr,
             2 * (rank() OVER (PARTITION BY blk ORDER BY rev) - 1)
               + COUNT(*) OVER (PARTITION BY blk, rev) + 1 AS mr2,
             COUNT(*) OVER (PARTITION BY blk) AS k_in_block
      FROM cell
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT blk) AS BIGINT) AS b,
             {_FR_R2}
      FROM rk WHERE k_in_block = 5
    )
    SELECT b AS b_blocks, r2_p1, r2_p2, r2_p3, r2_p4, r2_p5,
           CASE WHEN b > 0 THEN
             CAST((3 * ({_FR_SUMSQ}) * 1000000) // (b * 5 * 6)
                  - 3000000 * b * 6 AS BIGINT) END AS chi2_ppm
    FROM agg
    """,
)
def friedman_nation_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (Friedman 1937): blocks = nations,
    treatments = the 5 order priorities, value = total revenue cents
    per cell — does any priority class systematically out-earn the
    others once nation-level scale is blocked out? Ranks live WITHIN
    each 5-cell block (doubled mid-ranks for exact ties), only
    complete blocks count (the classic Friedman requirement), and
    χ²_F = 3·Σ_j R2_j²/(b·k(k+1)) − 3b(k+1) is emitted ppm-scaled
    with one truncating division — the doubled-rank absorption of
    the 12/(bk(k+1)) constant, tie-correction omitted (documented;
    cents totals tie with probability ~0). The rank windows run over
    5-row blocks, never the fact table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cell = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.substring("o_orderpriority", 1, 1).alias("pr"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    w_rank = Window.partitionBy("blk").orderBy("rev")
    w_tie = Window.partitionBy("blk", "rev")
    w_blk = Window.partitionBy("blk")
    rk = cell.select(
        "blk",
        "pr",
        (
            2 * (F.rank().over(w_rank) - 1)
            + F.count(F.lit(1)).over(w_tie)
            + 1
        ).alias("mr2"),
        F.count(F.lit(1)).over(w_blk).alias("k_in_block"),
    )
    agg = rk.where(F.col("k_in_block") == 5).agg(
        F.countDistinct("blk").cast("bigint").alias("b"),
        *[
            F.sum(F.expr(f"CASE WHEN pr = '{s}' THEN mr2 ELSE 0 END"))
            .cast("bigint")
            .alias(f"r2_p{s}")
            for s in ["1", "2", "3", "4", "5"]
        ],
    )
    return agg.selectExpr(
        "b AS b_blocks",
        "r2_p1",
        "r2_p2",
        "r2_p3",
        "r2_p4",
        "r2_p5",
        f"CASE WHEN b > 0 THEN CAST((3 * ({_FR_SUMSQ}) * 1000000)"
        " div (b * 5 * 6) - 3000000 * b * 6 AS BIGINT) END AS chi2_ppm",
    )


@register(
    "matrix_profile_discord_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT month, rev, row_number() OVER (ORDER BY month) AS i FROM monthly
    ), win AS MATERIALIZED (
      SELECT i, month,
             rev AS v0,
             lead(rev, 1) OVER (ORDER BY i) AS v1,
             lead(rev, 2) OVER (ORDER BY i) AS v2,
             lead(rev, 3) OVER (ORDER BY i) AS v3,
             lead(rev, 4) OVER (ORDER BY i) AS v4,
             lead(rev, 5) OVER (ORDER BY i) AS v5
      FROM idx
    ), w AS MATERIALIZED (
      SELECT * FROM win WHERE v5 IS NOT NULL
    ), dist AS MATERIALIZED (
      SELECT a.i AS ia, b.i AS ib,
             (a.v0 - b.v0)::HUGEINT * (a.v0 - b.v0)
             + (a.v1 - b.v1)::HUGEINT * (a.v1 - b.v1)
             + (a.v2 - b.v2)::HUGEINT * (a.v2 - b.v2)
             + (a.v3 - b.v3)::HUGEINT * (a.v3 - b.v3)
             + (a.v4 - b.v4)::HUGEINT * (a.v4 - b.v4)
             + (a.v5 - b.v5)::HUGEINT * (a.v5 - b.v5) AS d2
      FROM w a JOIN w b ON a.i + 6 <= b.i
    ), both_dir AS MATERIALIZED (
      SELECT ia AS i, d2 FROM dist UNION ALL SELECT ib AS i, d2 FROM dist
    ), prof AS MATERIALIZED (
      SELECT i, MIN(d2) AS p FROM both_dir GROUP BY 1
    )
    SELECT w.i AS win_start, w.month,
           CAST(prof.p AS DOUBLE) AS profile_dist2,
           prof.p = (SELECT MAX(p) FROM prof) AS is_discord
    FROM prof JOIN w ON w.i = prof.i
    """,
)
def matrix_profile_discord_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile discord discovery (Yeh et al., ICDM 2016 —
    un-normalized Euclidean variant) on the monthly revenue series:
    for every length-6 subsequence, the distance to its nearest
    NON-OVERLAPPING neighbor (exclusion zone |i−j| ≥ 6); the window
    whose nearest neighbor is farthest is the discord — the most
    anomalous stretch of months. Subsequences come off lead()
    windows over the bounded month table, pair distances are exact
    HUGEINT/DECIMAL(38,0) squares over the ≤|months|² bounded pair
    join, and the only double appears at output (scale-0 int→double,
    one identical rounding in both engines). The discord flag
    compares EXACT integers. At 100 TB the monthly table is still
    ≤ |calendar| rows — the fact scan is the only data-sized pass."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        "month", "rev", F.row_number().over(wi).alias("i")
    )
    wl = Window.orderBy("i")
    win = idx.select(
        "i",
        "month",
        F.col("rev").alias("v0"),
        *[F.lead("rev", t).over(wl).alias(f"v{t}") for t in range(1, 6)],
    )
    # bounded (≤|months| rows) multi-consumer table: both pair sides +
    # the output join — pinned eagerly so the fact scan runs once
    w = win.where(F.col("v5").isNotNull()).localCheckpoint(eager=True)
    d2_expr = " + ".join(
        f"CAST(a.v{t} - b.v{t} AS DECIMAL(38,0)) * (a.v{t} - b.v{t})"
        for t in range(6)
    )
    dist = (
        w.alias("a")
        .join(F.broadcast(w.alias("b")), F.expr("a.i + 6 <= b.i"))
        .selectExpr("a.i AS ia", "b.i AS ib", f"{d2_expr} AS d2")
    )
    both_dir = dist.selectExpr(
        "explode(array(struct(ia AS i, d2 AS d2),"
        " struct(ib AS i, d2 AS d2))) AS e"
    ).select("e.i", "e.d2")
    prof = both_dir.groupBy("i").agg(F.min("d2").alias("p"))
    w_max = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        prof.withColumn("pmax", F.max("p").over(w_max))
        .join(w.select("i", "month"), "i")
        .selectExpr(
            "i AS win_start",
            "month",
            "CAST(p AS DOUBLE) AS profile_dist2",
            "p = pmax AS is_discord",
        )
    )


@register(
    "mantel_haenszel_qty_returns",
    """
    WITH strata AS MATERIALIZED (
      SELECT substr(o.o_orderpriority, 1, 1) AS pr,
             CAST(count_if(l.l_quantity > 25 AND l.l_returnflag = 'R')
                  AS BIGINT) AS a,
             CAST(count_if(l.l_quantity > 25 AND l.l_returnflag <> 'R')
                  AS BIGINT) AS b,
             CAST(count_if(l.l_quantity <= 25 AND l.l_returnflag = 'R')
                  AS BIGINT) AS c,
             CAST(count_if(l.l_quantity <= 25 AND l.l_returnflag <> 'R')
                  AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), scaled AS MATERIALIZED (
      SELECT pr, a, b, c, d,
             (a::HUGEINT * d * 1000000) // (a + b + c + d) AS ad_n,
             (b::HUGEINT * c * 1000000) // (a + b + c + d) AS bc_n
      FROM strata
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(ad_n) AS BIGINT) AS sum_ad_scaled,
           CAST(SUM(bc_n) AS BIGINT) AS sum_bc_scaled,
           CASE WHEN SUM(bc_n) > 0 THEN
             CAST((SUM(ad_n) * 1000000) // SUM(bc_n) AS BIGINT)
           END AS mh_or_ppm,
           CASE WHEN SUM(b::HUGEINT * c) > 0 THEN
             CAST((SUM(a::HUGEINT * d) * 1000000) // SUM(b::HUGEINT * c)
                  AS BIGINT)
           END AS pooled_or_ppm
    FROM scaled
    """,
)
def mantel_haenszel_qty_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio (Mantel & Haenszel 1959)
    for "high quantity → return" stratified by order priority — the
    confounder-adjusted 2×2 pooling that Simpson's paradox breaks
    naive pooling on (the pooled OR is emitted alongside for the
    contrast). Per-stratum terms a·d/n and b·c/n are each ONE
    truncating division at ppm scale (a defined, documented variant:
    per-stratum floor error ≤ 10⁻⁶ relative, identical in both
    engines), summed exactly; the final ratio is one more truncating
    division. One fact-table pass to the 5-row strata table; all
    arithmetic DECIMAL(38,0)/HUGEINT."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    strata = (
        li.select("l_orderkey", "l_quantity", "l_returnflag")
        .join(
            o.select("o_orderkey", "o_orderpriority"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.substring("o_orderpriority", 1, 1).alias("pr"))
        .agg(
            F.count_if(
                (F.col("l_quantity") > 25) & (F.col("l_returnflag") == "R")
            ).cast("bigint").alias("a"),
            F.count_if(
                (F.col("l_quantity") > 25) & (F.col("l_returnflag") != "R")
            ).cast("bigint").alias("b"),
            F.count_if(
                (F.col("l_quantity") <= 25) & (F.col("l_returnflag") == "R")
            ).cast("bigint").alias("c"),
            F.count_if(
                (F.col("l_quantity") <= 25) & (F.col("l_returnflag") != "R")
            ).cast("bigint").alias("d"),
        )
    )
    scaled = strata.selectExpr(
        "pr",
        "a", "b", "c", "d",
        "(CAST(a AS DECIMAL(38,0)) * d * 1000000) div (a + b + c + d) AS ad_n",
        "(CAST(b AS DECIMAL(38,0)) * c * 1000000) div (a + b + c + d) AS bc_n",
    )
    return scaled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("ad_n").cast("bigint").alias("sum_ad_scaled"),
        F.sum("bc_n").cast("bigint").alias("sum_bc_scaled"),
        F.expr(
            "CASE WHEN SUM(bc_n) > 0 THEN"
            " CAST((SUM(ad_n) * 1000000) div SUM(bc_n) AS BIGINT) END"
        ).alias("mh_or_ppm"),
        F.expr(
            "CASE WHEN SUM(CAST(b AS DECIMAL(38,0)) * c) > 0 THEN"
            " CAST((SUM(CAST(a AS DECIMAL(38,0)) * d) * 1000000)"
            " div SUM(CAST(b AS DECIMAL(38,0)) * c) AS BIGINT) END"
        ).alias("pooled_or_ppm"),
    )


# =====================================================================
# Round 9, wave 13: Cochran's Q, peak detection with prominence
# =====================================================================

_CQ_TYPES = ["view", "click", "purchase", "signup", "error"]
_CQ_K = len(_CQ_TYPES)
_CQ_T = ",\n             ".join(
    f"CAST(SUM(x_{t}) AS BIGINT) AS t_{t}" for t in _CQ_TYPES
)
_CQ_SUMSQ = " + ".join(
    f"({_CQ_K} * t_{t} - n_total) * ({_CQ_K} * t_{t} - n_total)"
    for t in _CQ_TYPES
)


@register(
    "cochran_q_event_types",
    f"""
    WITH u AS MATERIALIZED (
      SELECT user_id,
             {",".join(f"CASE WHEN count_if(event_type = '{t}') > 0 THEN 1 ELSE 0 END AS x_{t}" for t in _CQ_TYPES)}
      FROM events GROUP BY 1
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             {_CQ_T},
             CAST(SUM({" + ".join(f"x_{t}" for t in _CQ_TYPES)}) AS BIGINT)
               AS su,
             CAST(SUM(({" + ".join(f"x_{t}" for t in _CQ_TYPES)})
                      * ({" + ".join(f"x_{t}" for t in _CQ_TYPES)}))
                  AS BIGINT) AS su2
      FROM u
    )
    SELECT n_users, {", ".join(f"t_{t}" for t in _CQ_TYPES)},
           CASE WHEN {_CQ_K} * su - su2 > 0 THEN CAST(
             (({_CQ_K} - 1) * (
               {_CQ_SUMSQ.replace("n_total", f"({' + '.join(f't_{t}' for t in _CQ_TYPES)})")}
             ) * 1000000)
             // ({_CQ_K} * ({_CQ_K} * su - su2)) AS BIGINT)
           END AS q_ppm
    FROM agg
    """,
)
def cochran_q_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — the k-treatment
    generalization of McNemar: do the five event types reach
    DIFFERENT fractions of users, treating each user as their own
    block of five binary outcomes?  With T_j = users reaching type j,
    N = ΣT_j and U_i = types user i reached,

        Q = (k−1)·Σ_j (k·T_j − N)² / (k·(k·ΣU_i − ΣU_i²))

    — the k²-scaled centering keeps everything exact integer, one
    ppm truncating division at the end. All-types and no-types users
    drop out of the denominator by algebra, exactly as the statistic
    requires. One user-keyed aggregation, one bounded fold; the type
    list is the bounded known domain (conditional aggregation, never
    a data-derived pivot)."""
    ev = read_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        *[
            F.when(F.count_if(F.col("event_type") == t) > 0, 1)
            .otherwise(0)
            .alias(f"x_{t}")
            for t in _CQ_TYPES
        ]
    )
    usum = " + ".join(f"x_{t}" for t in _CQ_TYPES)
    agg = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        *[F.sum(f"x_{t}").cast("bigint").alias(f"t_{t}") for t in _CQ_TYPES],
        F.sum(F.expr(usum)).cast("bigint").alias("su"),
        F.sum(F.expr(f"({usum}) * ({usum})")).cast("bigint").alias("su2"),
    )
    ntot = "(" + " + ".join(f"t_{t}" for t in _CQ_TYPES) + ")"
    sumsq = " + ".join(
        f"({_CQ_K} * t_{t} - {ntot}) * ({_CQ_K} * t_{t} - {ntot})"
        for t in _CQ_TYPES
    )
    return agg.selectExpr(
        "n_users",
        *[f"t_{t}" for t in _CQ_TYPES],
        f"CASE WHEN {_CQ_K} * su - su2 > 0 THEN CAST("
        f" (({_CQ_K} - 1) * ({sumsq}) * 1000000)"
        f" div ({_CQ_K} * ({_CQ_K} * su - su2)) AS BIGINT)"
        " END AS q_ppm",
    )


@register(
    "peaks_monthly_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), m AS MATERIALIZED (
      SELECT month, rev, row_number() OVER (ORDER BY month) AS i FROM monthly
    ), pk AS MATERIALIZED (
      SELECT i, month, rev FROM (
        SELECT *, lag(rev) OVER (ORDER BY i) AS pv,
               lead(rev) OVER (ORDER BY i) AS nx
        FROM m
      ) WHERE pv IS NOT NULL AND nx IS NOT NULL AND rev > pv AND rev > nx
    ), lh AS MATERIALIZED (
      SELECT pk.i, MAX(m.i) AS lj FROM pk
      JOIN m ON m.i < pk.i AND m.rev > pk.rev GROUP BY 1
    ), rh AS MATERIALIZED (
      SELECT pk.i, MIN(m.i) AS rj FROM pk
      JOIN m ON m.i > pk.i AND m.rev > pk.rev GROUP BY 1
    ), lb AS MATERIALIZED (
      SELECT pk.i, MIN(m.rev) AS left_base
      FROM pk LEFT JOIN lh ON lh.i = pk.i
      JOIN m ON m.i >= COALESCE(lh.lj + 1, 1) AND m.i < pk.i
      GROUP BY 1
    ), rb AS MATERIALIZED (
      SELECT pk.i, MIN(m.rev) AS right_base
      FROM pk LEFT JOIN rh ON rh.i = pk.i
      JOIN m ON m.i <= COALESCE(rh.rj - 1, 2147483647) AND m.i > pk.i
      GROUP BY 1
    )
    SELECT pk.month, pk.rev AS rev_cents,
           CAST(pk.rev - greatest(lb.left_base, rb.right_base) AS BIGINT)
             AS prominence_cents
    FROM pk JOIN lb ON lb.i = pk.i JOIN rb ON rb.i = pk.i
    """,
)
def peaks_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection with topographic prominence (the scipy
    find_peaks/peak_prominences semantics): strict local maxima of
    monthly revenue, each scored by how far it rises above the higher
    of its two key saddles — the min of the series between the peak
    and the nearest STRICTLY higher point on each side (whole side
    when no higher point exists). Prominence separates real seasonal
    peaks from ripples in a way raw height can't. Exact integer
    cents; every join and window runs over the bounded pinned month
    table (≤|calendar|² pairs), the fact scan once."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    # bounded month table with index: five consumers (peaks + two
    # higher-scans + two base-scans) — pinned eagerly
    m = monthly.select(
        "month", "rev", F.row_number().over(wi).alias("i")
    ).localCheckpoint(eager=True)
    wl = Window.orderBy("i")
    pk = (
        m.withColumn("pv", F.lag("rev").over(wl))
        .withColumn("nx", F.lead("rev").over(wl))
        .where(
            F.col("pv").isNotNull()
            & F.col("nx").isNotNull()
            & (F.col("rev") > F.col("pv"))
            & (F.col("rev") > F.col("nx"))
        )
        .select("i", "month", "rev")
        .localCheckpoint(eager=True)
    )
    lh = (
        pk.alias("p")
        .join(F.broadcast(m.alias("q")), F.expr("q.i < p.i AND q.rev > p.rev"))
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.max("q.i").alias("lj"))
    )
    rh = (
        pk.alias("p")
        .join(F.broadcast(m.alias("q")), F.expr("q.i > p.i AND q.rev > p.rev"))
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.i").alias("rj"))
    )
    lb = (
        pk.alias("p")
        .join(lh, "i", "left")
        .join(
            F.broadcast(m.alias("q")),
            F.expr("q.i >= COALESCE(lj + 1, 1) AND q.i < p.i"),
        )
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.rev").alias("left_base"))
    )
    rb = (
        pk.alias("p")
        .join(rh, "i", "left")
        .join(
            F.broadcast(m.alias("q")),
            F.expr("q.i <= COALESCE(rj - 1, 2147483647) AND q.i > p.i"),
        )
        .groupBy(F.col("p.i").alias("i"))
        .agg(F.min("q.rev").alias("right_base"))
    )
    return (
        pk.join(lb, "i")
        .join(rb, "i")
        .selectExpr(
            "month",
            "rev AS rev_cents",
            "CAST(rev - greatest(left_base, right_base) AS BIGINT)"
            " AS prominence_cents",
        )
    )


# =====================================================================
# Round 9, wave 14: KMV pairwise set-operation estimates
# =====================================================================

_KMV_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(regexp_extract_all(rpad(term, 16, '#'), '.'),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    " (acc, x) -> (acc * 131 + x) % 1000000000000000)"
)
_KMV_EST = (
    "CASE WHEN {held} < 64 THEN CAST({held} AS DOUBLE)"
    " ELSE CAST(6.3e+16 AS DOUBLE) / CAST({hk} AS DOUBLE) END"
)


@register(
    "kmv_source_overlap",
    f"""
    WITH tok AS MATERIALIZED (
      SELECT DISTINCT source AS g,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), h AS MATERIALIZED (
      SELECT DISTINCT g, {_KMV_HASH} AS h FROM tok
    ), sk AS MATERIALIZED (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS pos
        FROM h
      ) WHERE pos <= 64
    ), est AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS held, MAX(h) AS hk
      FROM sk GROUP BY 1
    ), srcs AS MATERIALIZED (
      SELECT DISTINCT g FROM sk
    ), pairs AS MATERIALIZED (
      SELECT a.g AS ga, b.g AS gb FROM srcs a JOIN srcs b ON a.g < b.g
    ), ph AS MATERIALIZED (
      SELECT p.ga, p.gb, s.h, COUNT(*) AS n_sides
      FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
      GROUP BY 1, 2, 3
    ), um AS MATERIALIZED (
      SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS u_held, MAX(h) AS hu_k,
             CAST(count_if(n_sides = 2) AS BIGINT) AS n_both
      FROM (
        SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS pos
        FROM ph
      ) WHERE pos <= 64 GROUP BY 1, 2
    )
    SELECT um.ga AS src_a, um.gb AS src_b,
           {_KMV_EST.format(held="ea.held", hk="ea.hk")} AS est_a,
           {_KMV_EST.format(held="eb.held", hk="eb.hk")} AS est_b,
           {_KMV_EST.format(held="um.u_held", hk="um.hu_k")} AS est_union,
           CAST((um.n_both * 1000000) // um.u_held AS BIGINT) AS jaccard_ppm,
           CAST(um.n_both AS DOUBLE) / um.u_held *
             ({_KMV_EST.format(held="um.u_held", hk="um.hu_k")})
             AS est_intersection
    FROM um JOIN est ea ON ea.g = um.ga JOIN est eb ON eb.g = um.gb
    """,
)
def kmv_source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-overlap estimates between document sources
    (operators/sketch.py kmv_pairwise_setops — Beyer et al., SIGMOD
    2007): per source a 64-min-hash KMV vocabulary sketch, per source
    pair the union / Jaccard / intersection estimates computed from
    the sketches ALONE — the planning query for "is corpus B worth
    adding or is it a rehash of A" at 100 TB, where the exact answer
    needs a full vocabulary join. Thresholds ride the
    grouped_kth_smallest range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut); sketches pin at
    ≤ 64·|sources| rows and every pair op is bounded-table algebra.
    Same rolling hash and estimator as kmv_distinct_tokens — exact
    below k, one double division above."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
        kmv_pairwise_setops,
    )
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    items = docs.select(
        F.col("source"), F.explode(tokens_expr("text")).alias("term")
    )
    return kmv_pairwise_setops(items, "source", "term", k=64)


# =====================================================================
# Round 9, wave 15: Mood dispersion, Ljung-Box, Bowker symmetry
# =====================================================================

@register(
    "mood_dispersion_urgency",
    """
    WITH tiers AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v,
             CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH'))
                  AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ), mr AS MATERIALIZED (
      SELECT g, c1, c,
             2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) + c + 1 AS mr2
      FROM tiers
    ), agg AS MATERIALIZED (
      SELECT g, CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c1::HUGEINT * mr2 * mr2) AS s1a,
             SUM(c1::HUGEINT * mr2) AS s1b,
             SUM(c::HUGEINT * mr2 * mr2) AS sta,
             SUM(c::HUGEINT * mr2) AS stb
      FROM mr GROUP BY 1
    )
    SELECT g AS o_orderstatus, n1, CAST(n - n1 AS BIGINT) AS n2,
           CASE WHEN (sta - 2 * (n + 1) * stb
                      + (n + 1)::HUGEINT * (n + 1) * n) > 0 THEN
             CAST(((s1a - 2 * (n + 1) * s1b
                    + (n + 1)::HUGEINT * (n + 1) * n1) * 1000000)
                  // (sta - 2 * (n + 1) * stb
                      + (n + 1)::HUGEINT * (n + 1) * n) AS BIGINT)
           END AS mood_ppm,
           CAST((n1 * 1000000) // n AS BIGINT) AS expect_ppm
    FROM agg
    """,
)
def mood_dispersion_urgency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's squared-rank dispersion test per order status
    (operators/stats.py mood_dispersion_2samp): do urgent orders'
    values SPREAD differently from normal ones, location aside? The
    scale-test sibling of cvm_urgency_status (which sees any
    difference) and mann_whitney (which sees location): squared
    centered doubled mid-ranks, expanded-square one-pass identity,
    the urgent sample's score share vs its n1/N null expectation —
    two ppm truncating divisions, zero floats. Prefixes ride the
    grouped_running_totals range-partition recipe (the oracle's
    PARTITION BY window is the sf0.01 shortcut)."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        mood_dispersion_2samp,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    return mood_dispersion_2samp(base, "st", "urgent", "v").withColumnRenamed(
        "st", "o_orderstatus"
    )


_LB_LAGS = list(range(1, 13))
_LB_LEADS = ",\n             ".join(
    f"lead(d, {k}) OVER (ORDER BY i) AS d{k}" for k in _LB_LAGS
)
_LB_CK = ",\n             ".join(
    f"CAST(SUM(d * d{k}) AS HUGEINT) AS c{k}" for k in _LB_LAGS
)
_LB_STRUCTS = ", ".join(
    f"struct({k} AS lag, c{k} AS ck)" for k in _LB_LAGS
)
_LB_LAG_UNION = "\n      UNION ALL ".join(
    f"SELECT {k} AS lag, c{k} AS ck FROM mom" for k in _LB_LAGS
)


@register(
    "ljung_box_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, rev FROM monthly
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS nm, CAST(SUM(rev) AS BIGINT) AS s
      FROM idx
    ), ctr AS MATERIALIZED (
      SELECT i, (nm::HUGEINT * rev - s) AS d FROM idx, tot
    ), led AS MATERIALIZED (
      SELECT i, d,
             {_LB_LEADS}
      FROM ctr
    ), mom AS MATERIALIZED (
      SELECT CAST(SUM(d * d) AS HUGEINT) AS c0,
             {_LB_CK}
      FROM led
    ), lagrows AS MATERIALIZED (
      {_LB_LAG_UNION}
    ), lags AS MATERIALIZED (
      SELECT lagrows.lag, lagrows.ck, mom.c0, tot.nm FROM lagrows, mom, tot
    ), rr AS MATERIALIZED (
      SELECT lag, nm,
             (CASE WHEN ck >= 0 THEN 1 ELSE -1 END)
             * floor(CAST(abs(ck) AS DOUBLE) * 1000000e0
                     / CAST(c0 AS DOUBLE)) AS r_ppm_raw,
             (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))
             * (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))
             / CAST(nm - lag AS DOUBLE) AS term
      FROM lags
    )
    SELECT lag, CAST(r_ppm_raw AS BIGINT) AS r_ppm,
           CAST(floor(CAST(nm AS DOUBLE) * (nm + 2) * 1000e0
                      * SUM(term) OVER (ORDER BY lag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                AS BIGINT) AS q_milli
    FROM rr
    """,
)
def ljung_box_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test on monthly revenue
    (Ljung & Box, Biometrika 1978): per lag k = 1..12 the sample
    autocorrelation r_k (ppm, exact-integer covariances via n-scaled
    centering, sign factored out of the floor) and the cumulative
    Q(k) = N(N+2)·Σ_{{j≤k}} r_j²/(N−j) — the "is this series white
    noise" gate that should FIRE on seasonal revenue. Covariances
    stay exact HUGEINT/DECIMAL(38,0); r and Q move to doubles only
    through scale-0 int→double conversions and an identical
    fixed-order windowed fold in both engines. Everything after the
    one fact scan runs over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "rev"
    ).localCheckpoint(eager=True)  # feeds totals + centered leads
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("nm"),
        F.sum("rev").cast("bigint").alias("s"),
    )
    ctr = idx.crossJoin(F.broadcast(tot)).selectExpr(
        "i", "nm", "CAST(nm * rev - s AS DECIMAL(38,0)) AS d"
    )
    wl = Window.orderBy("i")
    led = ctr.select(
        "nm",
        "d",
        *[F.lead("d", k).over(wl).alias(f"d{k}") for k in _LB_LAGS],
    )
    mom = led.agg(
        F.max("nm").alias("nm"),
        F.sum(F.expr("d * d")).alias("c0"),
        *[F.sum(F.expr(f"d * d{k}")).alias(f"c{k}") for k in _LB_LAGS],
    )
    lags = mom.selectExpr(
        "nm", "c0", f"explode(array({_LB_STRUCTS})) AS e"
    ).select("nm", "c0", "e.lag", "e.ck")
    rr = lags.selectExpr(
        "lag",
        "nm",
        "(CASE WHEN ck >= 0 THEN 1 ELSE -1 END)"
        " * floor(CAST(abs(ck) AS DOUBLE) * 1000000e0"
        "         / CAST(c0 AS DOUBLE)) AS r_ppm_raw",
        "(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))"
        " * (CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE))"
        " / CAST(nm - lag AS DOUBLE) AS term",
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return rr.select(
        "lag",
        F.expr("CAST(r_ppm_raw AS BIGINT)").alias("r_ppm"),
        F.floor(
            F.expr("CAST(nm AS DOUBLE) * (nm + 2) * 1000e0")
            * F.sum("term").over(wq)
        )
        .cast("bigint")
        .alias("q_milli"),
    )


_BW_TYPES = ["click", "error", "purchase", "signup", "view"]
_BW_CELLS = ",\n             ".join(
    f"CAST(count_if(prev_type = '{a}' AND next_type = '{b}') AS BIGINT)"
    f" AS n_{i}_{j}"
    for i, a in enumerate(_BW_TYPES)
    for j, b in enumerate(_BW_TYPES)
    if i != j
)
_BW_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT '{_BW_TYPES[i]}' AS t_lo, '{_BW_TYPES[j]}' AS t_hi,
           n_{i}_{j} AS n_lo_hi, n_{j}_{i} AS n_hi_lo,
           CASE WHEN n_{i}_{j} + n_{j}_{i} > 0 THEN
             CAST(((n_{i}_{j} - n_{j}_{i}) * (n_{i}_{j} - n_{j}_{i})
                   * 1000000) // (n_{i}_{j} + n_{j}_{i}) AS BIGINT)
           END AS chi2_ppm FROM cells"""
    for i in range(5)
    for j in range(5)
    if i < j
)


@register(
    "bowker_symmetry_events",
    f"""
    WITH ordered AS MATERIALIZED (
      SELECT user_id, event_type AS next_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events
    ), cells AS MATERIALIZED (
      SELECT {_BW_CELLS}
      FROM ordered WHERE prev_type IS NOT NULL
    )
{_BW_UNION}
    """,
)
def bowker_symmetry_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test (Bowker, JASA 1948) on the event
    transition matrix — the k×k generalization of McNemar: for every
    unordered type pair, is traffic i→j balanced against j→i? Each
    pair contributes (n_ij − n_ji)²/(n_ij + n_ji), emitted ppm-scaled
    per pair (sum the column for the full statistic, df = pairs with
    discordant traffic). The 20 off-diagonal cells come out of ONE
    conditional aggregation over the lag-window pair stream (the
    bounded known type domain — no data-derived pivot), and the 10
    pair rows off one explode."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    cells = ordered.agg(
        *[
            F.count_if(
                (F.col("prev_type") == a) & (F.col("next_type") == b)
            )
            .cast("bigint")
            .alias(f"n_{i}_{j}")
            for i, a in enumerate(_BW_TYPES)
            for j, b in enumerate(_BW_TYPES)
            if i != j
        ]
    )
    pair_structs = ", ".join(
        f"struct('{_BW_TYPES[i]}' AS t_lo, '{_BW_TYPES[j]}' AS t_hi,"
        f" n_{i}_{j} AS n_lo_hi, n_{j}_{i} AS n_hi_lo,"
        f" CASE WHEN n_{i}_{j} + n_{j}_{i} > 0 THEN"
        f" CAST(((n_{i}_{j} - n_{j}_{i}) * (n_{i}_{j} - n_{j}_{i})"
        f" * 1000000) div (n_{i}_{j} + n_{j}_{i}) AS BIGINT)"
        f" END AS chi2_ppm)"
        for i in range(5)
        for j in range(5)
        if i < j
    )
    return cells.selectExpr(f"explode(array({pair_structs})) AS e").select(
        "e.t_lo", "e.t_hi", "e.n_lo_hi", "e.n_hi_lo", "e.chi2_ppm"
    )


# =====================================================================
# Round 9, wave 16: rich-club coefficient, runs test, turning points
# =====================================================================

_RC_KS = [2, 4, 8, 16]
_RC_N = ",\n             ".join(
    f"CAST(count_if(d > {k}) AS BIGINT) AS n{k}" for k in _RC_KS
)
_RC_E = ",\n             ".join(
    f"CAST(count_if(da > {k} AND db > {k}) AS BIGINT) AS e{k}" for k in _RC_KS
)
_RC_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT {k} AS k_min_degree, n{k} AS n_nodes, e{k} AS n_edges,
           CASE WHEN n{k} >= 2 THEN
             CAST((2 * e{k} * 1000000) // (n{k} * (n{k} - 1)) AS BIGINT)
           END AS phi_ppm FROM nn, ee"""
    for k in _RC_KS
)


@register(
    "rich_club_parts",
    f"""
    WITH co AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT a, b FROM co WHERE n >= 2
    ), adj AS MATERIALIZED (
      SELECT a AS z FROM e UNION ALL SELECT b FROM e
    ), deg AS MATERIALIZED (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1
    ), ed AS MATERIALIZED (
      SELECT da.d AS da, db.d AS db
      FROM e JOIN deg da ON da.z = e.a JOIN deg db ON db.z = e.b
    ), nn AS MATERIALIZED (
      SELECT {_RC_N} FROM deg
    ), ee AS MATERIALIZED (
      SELECT {_RC_E} FROM ed
    )
{_RC_UNION}
    """,
)
def rich_club_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004) of the parts
    co-occurrence graph: for each degree threshold k, the edge
    density φ(k) = 2E_k / (N_k(N_k−1)) among nodes of degree > k —
    do the hubs preferentially trade with each other? Same
    support-≥2 canonical edge set as the other graph families; the
    edge table pins eagerly (it feeds the degree aggregation AND the
    density probe), degrees attach by two equi-joins, and ALL
    thresholds come out of one conditional aggregation each over
    edges and degrees — k is the bounded known list, one explode for
    the output rows, one ppm division per row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lk = li.select("l_orderkey", "l_partkey")
    e = (
        lk.alias("x")
        .join(
            lk.alias("y"),
            F.expr(
                "x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey"
            ),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=True)  # feeds degrees + the density probe
    )
    adj = e.selectExpr("explode(array(a, b)) AS z")
    deg = (
        adj.groupBy("z")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=True)  # feeds two edge joins + node counts
    )
    ed = (
        e.join(deg.selectExpr("z AS a", "d AS da"), "a")
        .join(deg.selectExpr("z AS b", "d AS db"), "b")
        .select("da", "db")
    )
    nn = deg.agg(
        *[
            F.count_if(F.col("d") > k).cast("bigint").alias(f"n{k}")
            for k in _RC_KS
        ]
    )
    ee = ed.agg(
        *[
            F.count_if((F.col("da") > k) & (F.col("db") > k))
            .cast("bigint")
            .alias(f"e{k}")
            for k in _RC_KS
        ]
    )
    structs = ", ".join(
        f"struct({k} AS k_min_degree, n{k} AS n_nodes, e{k} AS n_edges,"
        f" CASE WHEN n{k} >= 2 THEN"
        f" CAST((2 * e{k} * 1000000) div (n{k} * (n{k} - 1)) AS BIGINT)"
        f" END AS phi_ppm)"
        for k in _RC_KS
    )
    return (
        nn.crossJoin(F.broadcast(ee))
        .selectExpr(f"explode(array({structs})) AS e")
        .select("e.k_min_degree", "e.n_nodes", "e.n_edges", "e.phi_ppm")
    )


@register(
    "runs_test_revenue_deltas",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), d AS MATERIALIZED (
      SELECT month,
             CASE WHEN rev > lag(rev) OVER (ORDER BY month) THEN 1
                  WHEN rev < lag(rev) OVER (ORDER BY month) THEN -1 END AS sg
      FROM monthly
    ), s AS MATERIALIZED (
      SELECT sg, lag(sg) OVER (ORDER BY month) AS prev_sg
      FROM d WHERE sg IS NOT NULL
    ), agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(sg = 1) AS BIGINT) AS n_up,
             CAST(count_if(sg = -1) AS BIGINT) AS n_down,
             CAST(1 + count_if(prev_sg IS NOT NULL AND sg <> prev_sg)
                  AS BIGINT) AS n_runs
      FROM s
    )
    SELECT n AS n_deltas, n_up, n_down, n_runs,
           CASE WHEN n > 0 THEN
             CAST(1000 + (2000 * n_up * n_down) // n AS BIGINT)
           END AS e_runs_milli,
           CASE WHEN n > 1 AND 2 * n_up * n_down > n THEN CAST(
             (CASE WHEN CAST(n_runs AS DOUBLE)
                        >= 1e0 + 2e0 * n_up * n_down / n THEN 1 ELSE -1 END)
             * floor(abs(CAST(n_runs AS DOUBLE)
                         - (1e0 + 2e0 * n_up * n_down / n)) * 1000e0
                     / sqrt(2e0 * n_up * n_down
                            * (2e0 * n_up * n_down - n)
                            / (CAST(n AS DOUBLE) * n * (n - 1))))
           AS BIGINT) END AS z_milli
    FROM agg
    """,
)
def runs_test_revenue_deltas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (1940) on the SIGNS of month-over-
    month revenue deltas: too few runs means momentum/trend, too many
    means oscillation — the classic "is this sequence random"
    diagnostic (flat months drop out, documented). Counts are exact
    integers off two lag windows over the bounded month table;
    E[R] = 1 + 2·n₊·n₋/n is emitted milli-scaled with one truncating
    division, and z moves to doubles only through int→double
    conversions and the IDENTICAL expression text in both engines
    (sign factored out of the floor)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wm = Window.orderBy("month")
    d = monthly.select(
        "month",
        F.expr(
            "CASE WHEN rev > lag(rev) OVER (ORDER BY month) THEN 1"
            " WHEN rev < lag(rev) OVER (ORDER BY month) THEN -1 END"
        ).alias("sg"),
    )
    s = d.where(F.col("sg").isNotNull()).select(
        "sg", F.lag("sg").over(wm).alias("prev_sg")
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("sg") == 1).cast("bigint").alias("n_up"),
        F.count_if(F.col("sg") == -1).cast("bigint").alias("n_down"),
        (
            1
            + F.count_if(
                F.col("prev_sg").isNotNull()
                & (F.col("sg") != F.col("prev_sg"))
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    return agg.selectExpr(
        "n AS n_deltas",
        "n_up",
        "n_down",
        "n_runs",
        "CASE WHEN n > 0 THEN"
        " CAST(1000 + (2000 * n_up * n_down) div n AS BIGINT)"
        " END AS e_runs_milli",
        "CASE WHEN n > 1 AND 2 * n_up * n_down > n THEN CAST("
        " (CASE WHEN CAST(n_runs AS DOUBLE)"
        "            >= 1e0 + 2e0 * n_up * n_down / n THEN 1 ELSE -1 END)"
        " * floor(abs(CAST(n_runs AS DOUBLE)"
        "             - (1e0 + 2e0 * n_up * n_down / n)) * 1000e0"
        "         / sqrt(2e0 * n_up * n_down"
        "                * (2e0 * n_up * n_down - n)"
        "                / (CAST(n AS DOUBLE) * n * (n - 1))))"
        " AS BIGINT) END AS z_milli",
    )


@register(
    "turning_points_revenue",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), w AS MATERIALIZED (
      SELECT rev,
             lag(rev) OVER (ORDER BY month) AS pv,
             lead(rev) OVER (ORDER BY month) AS nx
      FROM monthly
    ), agg AS MATERIALIZED (
      SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n,
             CAST(count_if(pv IS NOT NULL AND nx IS NOT NULL
                           AND ((rev > pv AND rev > nx)
                                OR (rev < pv AND rev < nx)))
                  AS BIGINT) AS t
      FROM w
    )
    SELECT n AS n_months, t AS turning_points,
           CAST((2000 * (n - 2)) // 3 AS BIGINT) AS e_milli,
           CASE WHEN 16 * n > 29 THEN CAST(
             (CASE WHEN CAST(t AS DOUBLE) >= 2e0 * (n - 2) / 3e0
                   THEN 1 ELSE -1 END)
             * floor(abs(CAST(t AS DOUBLE) - 2e0 * (n - 2) / 3e0) * 1000e0
                     / sqrt((16e0 * n - 29) / 90e0))
           AS BIGINT) END AS z_milli
    FROM agg
    """,
)
def turning_points_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of series randomness (Kendall's classic
    diagnostic): count STRICT local extrema of monthly revenue and
    compare to the i.i.d. expectation 2(n−2)/3 with variance
    (16n−29)/90 — a trending or seasonal series turns too rarely or
    too often. The count and expectation are exact integers (one
    milli-scaled truncating division); z moves to doubles through
    identical expression text in both engines, sign factored out of
    the floor. Two windows over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    ).localCheckpoint(eager=True)  # feeds the window scan + the count
    wm = Window.orderBy("month")
    w = monthly.select(
        "rev",
        F.lag("rev").over(wm).alias("pv"),
        F.lead("rev").over(wm).alias("nx"),
    )
    nm = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    agg = (
        w.agg(
            F.count_if(
                F.col("pv").isNotNull()
                & F.col("nx").isNotNull()
                & (
                    ((F.col("rev") > F.col("pv")) & (F.col("rev") > F.col("nx")))
                    | ((F.col("rev") < F.col("pv")) & (F.col("rev") < F.col("nx")))
                )
            )
            .cast("bigint")
            .alias("t")
        )
        .crossJoin(F.broadcast(nm))
    )
    return agg.selectExpr(
        "n AS n_months",
        "t AS turning_points",
        "CAST((2000 * (n - 2)) div 3 AS BIGINT) AS e_milli",
        "CASE WHEN 16 * n > 29 THEN CAST("
        " (CASE WHEN CAST(t AS DOUBLE) >= 2e0 * (n - 2) / 3e0"
        "       THEN 1 ELSE -1 END)"
        " * floor(abs(CAST(t AS DOUBLE) - 2e0 * (n - 2) / 3e0) * 1000e0"
        "         / sqrt((16e0 * n - 29) / 90e0))"
        " AS BIGINT) END AS z_milli",
    )


# =====================================================================
# Round 9, wave 17: Grubbs outlier, Chao1 richness, rescaled range
# =====================================================================

@register(
    "grubbs_outlier_month",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s
      FROM monthly
    ), ctr AS MATERIALIZED (
      SELECT month, rev, (n::HUGEINT * rev - s) AS d, n
      FROM monthly, tot
    ), var AS MATERIALIZED (
      SELECT SUM(d * d) AS ss FROM ctr
    ), pick AS MATERIALIZED (
      SELECT month, rev, d, n FROM ctr
      ORDER BY abs(d) DESC, month LIMIT 1
    )
    SELECT pick.month, pick.rev AS rev_cents, pick.n AS n_months,
           CASE WHEN var.ss > 0 THEN CAST(
             floor(CAST(abs(pick.d) AS DOUBLE) * 1000e0
                   / sqrt(CAST(var.ss AS DOUBLE) / (pick.n - 1)))
           AS BIGINT) END AS g_milli
    FROM pick, var
    """,
)
def grubbs_outlier_month_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic (Grubbs 1950) on monthly revenue:
    G = max|x − x̄| / s for the single most deviant month — the "is
    my worst point an outlier" screen. n-scaled centering keeps the
    deviations and the sum of squares exact integers (the n factors
    cancel: G = |n·x − S| / √(Σ(n·x−S)²/(n−1)) ); doubles appear only
    through scale-0 conversions, one sqrt, one division, floor. The
    argmax rides a deterministic ORDER BY abs(d), month LIMIT 1 over
    the bounded pinned month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev").cast("bigint").alias("s"),
    )
    ctr = monthly.crossJoin(F.broadcast(tot)).selectExpr(
        "month", "rev", "CAST(n * rev - s AS DECIMAL(38,0)) AS d", "n"
    ).localCheckpoint(eager=True)  # feeds variance + argmax pick
    var = ctr.agg(F.sum(F.expr("d * d")).alias("ss"))
    pick = ctr.orderBy(F.abs(F.col("d")).desc(), F.col("month")).limit(1)
    return pick.crossJoin(F.broadcast(var)).selectExpr(
        "month",
        "rev AS rev_cents",
        "n AS n_months",
        "CASE WHEN ss > 0 THEN CAST("
        " floor(CAST(abs(d) AS DOUBLE) * 1000e0"
        "       / sqrt(CAST(ss AS DOUBLE) / (n - 1)))"
        " AS BIGINT) END AS g_milli",
    )


@register(
    "chao1_vocab_richness",
    """
    WITH tf AS MATERIALIZED (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS d_observed,
           CAST(count_if(c = 1) AS BIGINT) AS f1,
           CAST(count_if(c = 2) AS BIGINT) AS f2,
           CASE WHEN count_if(c = 2) > 0 THEN
             CAST(COUNT(*) + (count_if(c = 1) * count_if(c = 1))
                  // (2 * count_if(c = 2)) AS BIGINT)
           ELSE
             CAST(COUNT(*) + (count_if(c = 1) * (count_if(c = 1) - 1)) // 2
                  AS BIGINT)
           END AS chao1_estimate
    FROM counts GROUP BY 1
    """,
)
def chao1_vocab_richness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of each source's UNSEEN
    vocabulary (Chao 1984): D + f1²/(2·f2) from the singleton and
    doubleton counts — how many more distinct terms would this
    corpus surface if we kept sampling? The capture-recapture
    counterpart of good_turing_docs' mass estimates, with the
    bias-corrected f1(f1−1)/2 form when no doubletons exist. One
    token aggregation to (source, term) counts, one bounded fold —
    exact integers end to end, one truncating division."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_observed"),
        F.count_if(F.col("c") == 1).cast("bigint").alias("f1"),
        F.count_if(F.col("c") == 2).cast("bigint").alias("f2"),
        F.expr(
            "CASE WHEN count_if(c = 2) > 0 THEN"
            " CAST(count(1) + (count_if(c = 1) * count_if(c = 1))"
            "      div (2 * count_if(c = 2)) AS BIGINT)"
            " ELSE CAST(count(1) + (count_if(c = 1) * (count_if(c = 1) - 1))"
            "           div 2 AS BIGINT) END"
        ).alias("chao1_estimate"),
    )


_RS_SIZES = [8, 16, 32]
_RS_UNION_TMPL = (
    "    SELECT {w} AS window_size, n_blocks,\n"
    "           CASE WHEN n_blocks > 0\n"
    "                THEN CAST(sum_rs_milli // n_blocks AS BIGINT)\n"
    "           END AS mean_rs_milli FROM rs{w}"
)


def _rs_oracle_block(w: int) -> str:
    return f"""
    , blk{w} AS MATERIALIZED (
      SELECT (i - 1) // {w} AS b, i, rev,
             SUM(rev) OVER (PARTITION BY (i - 1) // {w}) AS bs,
             COUNT(*) OVER (PARTITION BY (i - 1) // {w}) AS bn
      FROM idx
    ), dev{w} AS MATERIALIZED (
      SELECT b,
             CAST(SUM({w}::HUGEINT * rev - bs)
                  OVER (PARTITION BY b ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) AS cum,
             ({w}::HUGEINT * rev - bs) AS d
      FROM blk{w} WHERE bn = {w}
    ), rs{w} AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(rs_milli) AS BIGINT) AS sum_rs_milli
      FROM (
        SELECT b,
               CAST(floor((CAST(MAX(cum) - MIN(LEAST(cum, 0)) AS DOUBLE))
                          * 1000e0
                          / sqrt(CAST(SUM(d * d) AS DOUBLE) / {w}))
                    AS BIGINT) AS rs_milli
        FROM dev{w} GROUP BY b HAVING SUM(d * d) > 0
      )
    )"""


_RS_BLOCKS = "".join(_rs_oracle_block(w) for w in _RS_SIZES)
_RS_UNION = "\n    UNION ALL\n".join(
    _RS_UNION_TMPL.format(w=w) for w in _RS_SIZES
)


@register(
    "rescaled_range_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, rev FROM monthly
    ){_RS_BLOCKS}
{_RS_UNION}
    """,
)
def rescaled_range_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis of monthly revenue (Hurst 1951;
    Mandelbrot's long-memory diagnostic): for block sizes 8/16/32,
    split the series into full non-overlapping blocks, compute each
    block's range of cumulative mean-deviations over its (biased)
    std — R/S — and average across blocks. Growing mean R/S steeper
    than √w signals long-range dependence (the Hurst slope, left to
    the analyst — no logs in checked outputs). Deviations are exact
    w-scaled integers (w·x − blocksum; the w factors cancel in R/S);
    R uses MAX(cum) − MIN(least(cum, 0)) — the running minimum
    clamped at the block start, Hurst's original convention; doubles
    appear only via scale-0 conversions, one sqrt, one floor per
    block, one truncating mean division per window size. All windows
    run over the bounded month table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "rev"
    ).localCheckpoint(eager=True)  # feeds the three block layouts
    outs = []
    for w in _RS_SIZES:
        wb = Window.partitionBy("b")
        blk = idx.selectExpr(f"CAST((i - 1) div {w} AS BIGINT) AS b", "i", "rev")
        blk = blk.select(
            "b",
            "i",
            "rev",
            F.sum("rev").over(wb).cast("bigint").alias("bs"),
            F.count(F.lit(1)).over(wb).alias("bn"),
        ).where(F.col("bn") == w)
        wcum = Window.partitionBy("b").orderBy("i").rowsBetween(
            Window.unboundedPreceding, 0
        )
        dev = blk.select(
            "b",
            F.sum(F.expr(f"CAST({w} AS DECIMAL(38,0)) * rev - bs"))
            .over(wcum)
            .alias("cum"),
            F.expr(f"CAST({w} AS DECIMAL(38,0)) * rev - bs").alias("d"),
        )
        per_block = (
            dev.groupBy("b")
            .agg(
                F.max("cum").alias("mx"),
                F.min(F.expr("least(cum, CAST(0 AS DECIMAL(38,0)))")).alias("mn"),
                F.sum(F.expr("d * d")).alias("ss"),
            )
            .where(F.col("ss") > 0)
            .selectExpr(
                "CAST(floor(CAST(mx - mn AS DOUBLE) * 1000e0"
                f" / sqrt(CAST(ss AS DOUBLE) / {w})) AS BIGINT) AS rs_milli"
            )
        )
        outs.append(
            per_block.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.sum("rs_milli").cast("bigint").alias("sum_rs_milli"),
            ).selectExpr(
                f"{w} AS window_size",
                "n_blocks",
                "CASE WHEN n_blocks > 0 THEN"
                " CAST(sum_rs_milli div n_blocks AS BIGINT)"
                " END AS mean_rs_milli",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# =====================================================================
# Round 9, wave 18: Neyman allocation, required sample size
# =====================================================================

_NEY_B = 10_000


@register(
    "neyman_allocation_nations",
    f"""
    WITH strata AS MATERIALIZED (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sm,
             SUM((CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                  AS BIGINT))::HUGEINT
                 * (CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100
                    AS BIGINT))) AS ssq
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), wts AS MATERIALIZED (
      SELECT n_name, nh,
             CASE WHEN nh > 1 THEN
               sqrt(CAST(nh AS DOUBLE)
                    * CAST(nh::HUGEINT * ssq - sm::HUGEINT * sm AS DOUBLE)
                    / (nh - 1)) / nh
             ELSE 0e0 END AS w
      FROM strata
    ), tot AS MATERIALIZED (
      SELECT list_reduce(list_prepend(0e0, list(w ORDER BY n_name)),
                         (acc, x) -> acc + x) AS wsum
      FROM wts
    ), alloc AS MATERIALIZED (
      SELECT n_name, nh,
             CAST(floor({_NEY_B}e0 * w / wsum) AS BIGINT) AS alloc_floor,
             {_NEY_B}e0 * w / wsum
               - floor({_NEY_B}e0 * w / wsum) AS rem
      FROM wts, tot
    ), ranked AS MATERIALIZED (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
             CAST({_NEY_B} - SUM(alloc_floor) OVER () AS BIGINT) AS extra
      FROM alloc
    )
    SELECT n_name, nh AS n_orders, alloc_floor,
           CAST(alloc_floor + CASE WHEN rk <= extra THEN 1 ELSE 0 END
                AS BIGINT) AS n_allocated
    FROM ranked
    """,
)
def neyman_allocation_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified-sampling allocation (Neyman 1934) of
    a 10,000-row sample budget across nation strata: n_h ∝ N_h·S_h —
    big AND volatile strata get more of the budget than proportional
    allocation would give, the variance-minimizing design for a fixed
    cost (the sampling-design step of any stratified corpus draw).
    Stratum moments are exact integers (HUGEINT/DECIMAL(38,0) sum of
    squares); N_h·S_h moves to doubles through scale-0 conversions
    and one sqrt; the weight TOTAL is an ordered fold by stratum name
    (a bare SUM over doubles has no defined order — CLAUDE.md rule);
    integer allocations use the largest-remainder (Hamilton) method,
    deterministic ties by name, so Σ n_allocated = budget EXACTLY.
    Windows run over the ≤|nations| stratum table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
    strata = (
        o.join(c.select("c_custkey", "c_nationkey"), o["o_custkey"] == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nh"),
            F.sum(F.expr(cents)).cast("bigint").alias("sm"),
            F.sum(F.expr(f"CAST({cents} AS DECIMAL(38,0)) * {cents}")).alias(
                "ssq"
            ),
        )
    )
    wts = strata.selectExpr(
        "n_name",
        "nh",
        "CASE WHEN nh > 1 THEN"
        " sqrt(CAST(nh AS DOUBLE)"
        "      * CAST(CAST(nh AS DECIMAL(38,0)) * ssq"
        "             - CAST(sm AS DECIMAL(38,0)) * sm AS DOUBLE)"
        "      / (nh - 1)) / nh"
        " ELSE 0e0 END AS w",
    ).localCheckpoint(eager=True)  # feeds the ordered fold + allocation
    tot = wts.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, w))),"
            " CAST(0 AS DOUBLE), (acc, s) -> acc + s.w) AS wsum"
        )
    )
    alloc = wts.crossJoin(F.broadcast(tot)).selectExpr(
        "n_name",
        "nh",
        f"CAST(floor({_NEY_B}e0 * w / wsum) AS BIGINT) AS alloc_floor",
        f"{_NEY_B}e0 * w / wsum - floor({_NEY_B}e0 * w / wsum) AS rem",
    )
    w_rk = Window.orderBy(F.col("rem").desc(), F.col("n_name"))
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        alloc.withColumn("rk", F.row_number().over(w_rk))
        .withColumn(
            "extra",
            (F.lit(_NEY_B) - F.sum("alloc_floor").over(w_all)).cast("bigint"),
        )
        .selectExpr(
            "n_name",
            "nh AS n_orders",
            "alloc_floor",
            "CAST(alloc_floor + CASE WHEN rk <= extra THEN 1 ELSE 0 END"
            " AS BIGINT) AS n_allocated",
        )
    )


@register(
    "required_sample_size_brands",
    """
    WITH a AS MATERIALIZED (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_brand, n, x,
           CAST((x * 1000000) // n AS BIGINT) AS rate_ppm,
           CASE WHEN x > 0 THEN
             CAST((800 * (n - x) + x - 1) // x AS BIGINT)
           END AS n_required_per_arm
    FROM a
    """,
)
def required_sample_size_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test sample-size requirement per brand: rows needed PER
    ARM to detect a 10% relative change in that brand's return rate
    at z = 2 (dyadic, the wilson_return_rate_brands convention) —
    n = 2·z²·p(1−p)/(0.1·p)² = 800·(1−p)/p, which with p = x/N
    collapses to the EXACT integer ceiling (800·(N−x) + x − 1) div x.
    Zero float ops: the planning table that says which brands can
    even be experimented on at current traffic. One broadcast-dim
    aggregation pass."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = (
        li.join(
            pt.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("x"),
        )
    )
    return a.selectExpr(
        "p_brand",
        "n",
        "x",
        "CAST((x * 1000000) div n AS BIGINT) AS rate_ppm",
        "CASE WHEN x > 0 THEN"
        " CAST((800 * (n - x) + x - 1) div x AS BIGINT)"
        " END AS n_required_per_arm",
    )


# =====================================================================
# Round 9, wave 19: Kendall tau-b / Somers' D / gamma via bounded-
# domain dominance counting
# =====================================================================

_KT_N = 50  # l_quantity domain 1..50
_KT_C = ",\n             ".join(
    f"CAST(count_if(qty = {i + 1}) AS BIGINT) AS c{i}" for i in range(_KT_N)
)
_KT_PRE = ",\n             ".join(
    f"CAST(COALESCE(SUM(c{i}) OVER win, 0) AS BIGINT) AS c{i}_before"
    for i in range(_KT_N)
)
_KT_CONC = " + ".join(
    f"c{i}::HUGEINT * ({' + '.join(f'c{j}_before' for j in range(i))})"
    for i in range(1, _KT_N)
)
_KT_DISC = " + ".join(
    f"c{i}::HUGEINT * ({' + '.join(f'c{j}_before' for j in range(i + 1, _KT_N))})"
    for i in range(_KT_N - 1)
)
_KT_T = ",\n             ".join(
    f"CAST(SUM(c{i}) AS BIGINT) AS t{i}" for i in range(_KT_N)
)
_KT_TX2 = " + ".join(f"t{i}::HUGEINT * (t{i} - 1)" for i in range(_KT_N))
_KT_SGN = "(CASE WHEN conc >= disc THEN 1 ELSE -1 END)"


@register(
    "kendall_tau_qty_price_brands",
    f"""
    WITH base AS MATERIALIZED (
      SELECT p.p_brand AS g,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tiers AS MATERIALIZED (
      SELECT g, y, CAST(COUNT(*) AS BIGINT) AS cnt,
             {_KT_C}
      FROM base GROUP BY 1, 2
    ), pre AS MATERIALIZED (
      SELECT *,
             {_KT_PRE}
      FROM tiers
      WINDOW win AS (PARTITION BY g ORDER BY y
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), per AS MATERIALIZED (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
             SUM({_KT_CONC}) AS conc,
             SUM({_KT_DISC}) AS disc,
             SUM(cnt::HUGEINT * (cnt - 1)) AS ty2,
             {_KT_T}
      FROM pre GROUP BY 1
    ), fin AS MATERIALIZED (
      SELECT g, n, conc, disc,
             n::HUGEINT * (n - 1) AS n02,
             ({_KT_TX2}) AS tx2,
             ty2
      FROM per
    )
    SELECT g AS p_brand, n,
           CAST(conc AS DOUBLE) AS concordant,
           CAST(disc AS DOUBLE) AS discordant,
           CASE WHEN n02 > tx2 AND n02 > ty2 THEN CAST(
             {_KT_SGN} * floor(CAST(abs(conc - disc) AS DOUBLE) * 2000000e0
               / sqrt(CAST(n02 - tx2 AS DOUBLE) * CAST(n02 - ty2 AS DOUBLE)))
           AS BIGINT) END AS tau_b_ppm,
           CASE WHEN n02 > tx2 THEN CAST(
             {_KT_SGN} * ((abs(conc - disc) * 2000000) // (n02 - tx2))
           AS BIGINT) END AS somers_d_ppm,
           CASE WHEN conc + disc > 0 THEN CAST(
             {_KT_SGN} * ((abs(conc - disc) * 1000000) // (conc + disc))
           AS BIGINT) END AS gamma_ppm
    FROM fin
    """,
)
def kendall_tau_qty_price_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b, Somers' D and Goodman-Kruskal gamma between
    quantity and line price per brand (operators/stats.py
    kendall_tau_b_bounded): the concordance triple computed WITHOUT
    the O(n²) pair walk — quantity's bounded 1..50 domain turns
    concordant/discordant counting into dominance sums over 50
    running class-counts (one tier aggregation, one prefix pass via
    the grouped_running_totals range-partition recipe, one bounded
    fold; the oracle's PARTITION BY windows are the sf0.01
    shortcut). Somers and gamma are exact ppm integer divisions;
    tau-b pays two scale-0 int→double conversions and one sqrt.
    The rank-concordance sibling of spearman_qty_price_brands —
    tau weighs PAIRS, rho weighs rank displacement."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        kendall_tau_b_bounded,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return kendall_tau_b_bounded(
        base, "p_brand", "qty", "cents", list(range(1, _KT_N + 1))
    )


# =====================================================================
# Round 9, wave 20: semantic decontamination, Yule's K, effective
# sample size
# =====================================================================

@register(
    "semantic_decontaminate_embeddings",
    """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
    ), ev AS MATERIALIZED (
      SELECT vec_id, v, nrm FROM n WHERE vec_id < 20
    ), scored AS MATERIALIZED (
      SELECT c.vec_id, e.vec_id AS eval_id,
             list_dot_product(c.v, e.v) / (c.nrm * e.nrm) AS cosine
      FROM n c JOIN ev e ON c.vec_id >= 20
    ), best AS MATERIALIZED (
      SELECT vec_id, eval_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY cosine DESC, eval_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT vec_id, eval_id AS nearest_eval_id, cosine AS max_cosine,
           cosine > 98e-2 AS contaminated
    FROM best
    """,
)
def semantic_decontaminate_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination against an evaluation set (the
    embedding-space counterpart of the n-gram
    `decontaminate_overlap`): for every corpus vector, the single
    nearest eval-set vector by cosine and a contamination flag at
    0.98 — near-duplicates of benchmark items that exact n-gram
    matching misses (paraphrases, reformattings). The eval side
    (vec_id < 20) broadcasts; the corpus scans ONCE with a 20-wide
    bounded fan-out and a 20-row-per-vector argmax window — at
    100 TB this is the shape you want: eval sets are small by
    definition, the corpus never self-joins. Cosines are the same
    deterministic left-to-right dot-product fold both engines run in
    the other embedding families."""
    from dpe_energy_performance_analysis_etl_spark.dedup.embedding import (
        dot_double,
        norm2_double,
    )

    emb = read_embeddings(spark, sf_dir)
    ev = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev_emb"),
        F.sqrt(norm2_double(F.col("embedding"))).alias("ev_nrm"),
    )
    corpus = emb.where(F.col("vec_id") >= 20).select(
        "vec_id",
        "embedding",
        F.sqrt(norm2_double(F.col("embedding"))).alias("c_nrm"),
    )
    scored = corpus.join(F.broadcast(ev)).select(
        "vec_id",
        "eval_id",
        (
            dot_double(F.col("embedding"), F.col("ev_emb"))
            / (F.col("c_nrm") * F.col("ev_nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("eval_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .selectExpr(
            "vec_id",
            "eval_id AS nearest_eval_id",
            "cosine AS max_cosine",
            "cosine > 98e-2 AS contaminated",
        )
    )


@register(
    "yules_k_sources",
    """
    WITH tf AS MATERIALIZED (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), counts AS MATERIALIZED (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS m1_tokens,
           CAST(COUNT(*) AS BIGINT) AS v_types,
           CAST(SUM(c::HUGEINT * c) AS BIGINT) AS m2,
           CASE WHEN SUM(c) > 0 THEN
             CAST((10000 * (SUM(c::HUGEINT * c) - SUM(c)) * 1000)
                  // (SUM(c)::HUGEINT * SUM(c)) AS BIGINT)
           END AS yules_k_milli
    FROM counts GROUP BY 1
    """,
)
def yules_k_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source (Yule 1944, the stylometry
    staple): K = 10⁴·(M₂ − M₁)/M₁² with M₁ = tokens and
    M₂ = Σ c² over term frequencies — vocabulary CONCENTRATION,
    robust to text length where raw type-token ratios aren't. High K
    = repetitive vocabulary (boilerplate, templated spam), low K =
    lexically rich text; the repetition screen that complements
    chao1_vocab_richness's unseen-mass estimate. One token
    aggregation, one bounded fold, exact HUGEINT/DECIMAL integers,
    one truncating milli division."""
    from dpe_energy_performance_analysis_etl_spark.text.analysis import tokens_expr

    docs = read_documents(spark, sf_dir)
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("m1_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).cast("bigint").alias("m2"),
        F.expr(
            "CASE WHEN SUM(c) > 0 THEN"
            " CAST((10000 * (SUM(CAST(c AS DECIMAL(38,0)) * c) - SUM(c))"
            "       * 1000)"
            " div (CAST(SUM(c) AS DECIMAL(38,0)) * SUM(c)) AS BIGINT) END"
        ).alias("yules_k_milli"),
    )


@register(
    "ess_length_weights_sources",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS w_sum,
           CASE WHEN SUM(n_chars::HUGEINT * n_chars) > 0 THEN
             CAST((SUM(n_chars)::HUGEINT * SUM(n_chars) * 1000000)
                  // (COUNT(*)::HUGEINT
                      * SUM(n_chars::HUGEINT * n_chars)) AS BIGINT)
           END AS ess_ratio_ppm
    FROM documents GROUP BY source
    """,
)
def ess_length_weights_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of length-proportional sampling per
    source (Kish 1965): ESS/n = (Σw)²/(n·Σw²) for w = n_chars — how
    much of a source survives as INDEPENDENT signal when documents
    are drawn proportional to length (the usual token-budget
    sampling). A ppm near 10⁶ means uniform lengths (every doc
    counts); a low ppm means a few giants dominate and the effective
    corpus is far smaller than its row count — the diagnostic to run
    BEFORE committing a mixture weight. One aggregation pass, exact
    integers, one truncating division."""
    docs = read_documents(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("w_sum"),
        F.expr(
            "CASE WHEN SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) > 0 THEN"
            " CAST((CAST(SUM(n_chars) AS DECIMAL(38,0)) * SUM(n_chars)"
            "       * 1000000)"
            " div (CAST(COUNT(1) AS DECIMAL(38,0))"
            "      * SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars))"
            " AS BIGINT) END"
        ).alias("ess_ratio_ppm"),
    )


# =====================================================================
# Round 9, wave 21: actuarial life table
# =====================================================================

@register(
    "life_table_orders",
    """
    WITH subj AS (
      SELECT CAST(date_diff('month', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders
    ), tiers AS MATERIALIZED (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ), ranked AS MATERIALIZED (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY t) AS INT) AS i
      FROM tiers
    ), packed AS MATERIALIZED (
      SELECT *,
             (2 * n - c - 2 * d) * 2147483648 + (2 * n - c) AS v
      FROM ranked
    ), encs AS MATERIALIZED (
      SELECT list(v ORDER BY t) AS xs FROM packed
    )
    SELECT t, n AS n_at_risk, d AS d_events, c AS c_censored,
           CASE WHEN 2 * n - c > 0 THEN
             CAST((2 * d * 1000000) // (2 * n - c) AS BIGINT)
           END AS q_ppm,
           CAST(list_reduce(
             list_prepend(CAST(1000000 AS BIGINT), encs.xs[1:i]),
             (acc, e) -> CASE WHEN e % 2147483648 > 0 THEN
               (acc * (e // 2147483648)) // (e % 2147483648)
               ELSE acc END
           ) AS BIGINT) AS surv_scaled
    FROM packed CROSS JOIN encs
    """,
)
def life_table_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actuarial life table over the SAME order-lifetime tiers as
    `kaplan_meier_orders` / `nelson_aalen_orders` (operators/stats.py
    life_table_actuarial — Cutler & Ederer 1958): censored subjects
    count as HALF an exposure in their interval, q = 2d/(2n−c), and
    survival folds as the exact integer (acc·(2n−c−2d)) div (2n−c)
    per tier — the third classical survival surface, grouped-interval
    semantics where KM is event-time exact. One data-sized tier
    aggregation; the fold runs over the packed bounded tier array
    (a·2³¹ + b, guarded) via the SQL `aggregate` function."""
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        life_table_actuarial,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    subj = o.select(
        F.months_between(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ev"),
    )
    return life_table_actuarial(subj, "t", "ev")


# =====================================================================
# Round 9, wave 22: partial correlation, lead-lag CCF, Mood's median
# test
# =====================================================================

_PC_R = (
    "(CAST({sab} AS DOUBLE)"
    " / sqrt(CAST({saa} AS DOUBLE) * CAST({sbb} AS DOUBLE)))"
)


@register(
    "partial_corr_rev_qty_disc",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS z
      FROM lineitem GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz
      FROM monthly
    ), ctr AS MATERIALIZED (
      SELECT (n::HUGEINT * x - sx) AS dx, (n::HUGEINT * y - sy) AS dy,
             (n::HUGEINT * z - sz) AS dz, n
      FROM monthly, tot
    ), mom AS MATERIALIZED (
      SELECT MAX(n) AS n,
             SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy, SUM(dz * dz) AS szz,
             SUM(dx * dy) AS sxy, SUM(dx * dz) AS sxz, SUM(dy * dz) AS syz
      FROM ctr
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(floor({_PC_R.format(sab="sxy", saa="sxx", sbb="syy")}
                      * 1000000e0) AS BIGINT) AS r_xy_ppm,
           CAST(floor({_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                      * 1000000e0) AS BIGINT) AS r_xz_ppm,
           CAST(floor({_PC_R.format(sab="syz", saa="syy", sbb="szz")}
                      * 1000000e0) AS BIGINT) AS r_yz_ppm,
           CAST(floor(
             ({_PC_R.format(sab="sxy", saa="sxx", sbb="syy")}
              - {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                * {_PC_R.format(sab="syz", saa="syy", sbb="szz")})
             / sqrt((1e0 - {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")}
                           * {_PC_R.format(sab="sxz", saa="sxx", sbb="szz")})
                    * (1e0 - {_PC_R.format(sab="syz", saa="syy", sbb="szz")}
                             * {_PC_R.format(sab="syz", saa="syy", sbb="szz")}))
             * 1000000e0) AS BIGINT) AS partial_xy_given_z_ppm
    FROM mom
    """,
)
def partial_corr_rev_qty_disc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of monthly revenue and
    quantity CONTROLLING for total discount —
    r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)) — does the
    revenue-volume link survive once discounting is held fixed? All
    covariances are exact n-scaled integers (HUGEINT/DECIMAL(38,0));
    the three pairwise r's and the partial move to doubles through
    scale-0 conversions and IDENTICAL expression text in both
    engines (each r is one division + one sqrt — the same subterm
    repeated verbatim, so both engines evaluate the same IEEE ops).
    One fact scan to the bounded month table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("x"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("y"),
        F.sum(
            F.expr("CAST(CAST(l_discount AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("z"),
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
    )
    ctr = monthly.crossJoin(F.broadcast(tot)).selectExpr(
        "CAST(n * x - sx AS DECIMAL(38,0)) AS dx",
        "CAST(n * y - sy AS DECIMAL(38,0)) AS dy",
        "CAST(n * z - sz AS DECIMAL(38,0)) AS dz",
        "n",
    )
    mom = ctr.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("dx * dx")).alias("sxx"),
        F.sum(F.expr("dy * dy")).alias("syy"),
        F.sum(F.expr("dz * dz")).alias("szz"),
        F.sum(F.expr("dx * dy")).alias("sxy"),
        F.sum(F.expr("dx * dz")).alias("sxz"),
        F.sum(F.expr("dy * dz")).alias("syz"),
    )
    rxy = _PC_R.format(sab="sxy", saa="sxx", sbb="syy")
    rxz = _PC_R.format(sab="sxz", saa="sxx", sbb="szz")
    ryz = _PC_R.format(sab="syz", saa="syy", sbb="szz")
    return mom.selectExpr(
        "CAST(n AS BIGINT) AS n_months",
        f"CAST(floor({rxy} * 1000000e0) AS BIGINT) AS r_xy_ppm",
        f"CAST(floor({rxz} * 1000000e0) AS BIGINT) AS r_xz_ppm",
        f"CAST(floor({ryz} * 1000000e0) AS BIGINT) AS r_yz_ppm",
        f"CAST(floor(({rxy} - {rxz} * {ryz})"
        f" / sqrt((1e0 - {rxz} * {rxz}) * (1e0 - {ryz} * {ryz}))"
        " * 1000000e0) AS BIGINT) AS partial_xy_given_z_ppm",
    )


_CCF_LAGS = list(range(-6, 7))


@register(
    "lead_lag_ccf_rev_qty",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY month) AS i, x, y FROM monthly
    ), tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM idx
    ), ctr AS MATERIALIZED (
      SELECT i, (n::HUGEINT * x - sx) AS dx, (n::HUGEINT * y - sy) AS dy
      FROM idx, tot
    ), led AS MATERIALIZED (
      SELECT i, dx, dy,
             {",".join(f"lead(dy, {k}) OVER (ORDER BY i) AS dyp{k}" for k in range(1, 7))},
             {",".join(f"lag(dy, {k}) OVER (ORDER BY i) AS dym{k}" for k in range(1, 7))}
      FROM ctr
    ), mom AS MATERIALIZED (
      SELECT SUM(dx * dx) AS cxx, SUM(dy * dy) AS cyy,
             SUM(dx * dy) AS c0,
             {",".join(f"SUM(dx * dyp{k}) AS cp{k}" for k in range(1, 7))},
             {",".join(f"SUM(dx * dym{k}) AS cm{k}" for k in range(1, 7))}
      FROM led
    ), lagrows AS MATERIALIZED (
      SELECT 0 AS lag, c0 AS cv FROM mom
      {" ".join(f"UNION ALL SELECT {k}, cp{k} FROM mom" for k in range(1, 7))}
      {" ".join(f"UNION ALL SELECT -{k}, cm{k} FROM mom" for k in range(1, 7))}
    ), scored AS MATERIALIZED (
      SELECT lagrows.lag,
             (CASE WHEN lagrows.cv >= 0 THEN 1 ELSE -1 END)
             * floor(CAST(abs(lagrows.cv) AS DOUBLE) * 1000000e0
                     / sqrt(CAST(mom.cxx AS DOUBLE)
                            * CAST(mom.cyy AS DOUBLE))) AS r_raw
      FROM lagrows, mom
    )
    SELECT lag, CAST(r_raw AS BIGINT) AS ccf_ppm,
           abs(r_raw) = MAX(abs(r_raw)) OVER () AS is_peak
    FROM scored
    """,
)
def lead_lag_ccf_rev_qty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between monthly revenue and monthly
    quantity at lags −6..+6 (positive lag = quantity LEADS revenue by
    k months), peak flagged — the "which series moves first"
    diagnostic behind demand forecasting; rolling_corr_revenue_qty
    sees only the contemporaneous link. Cross-covariances are exact
    n-scaled integers off lead/lag windows over the bounded month
    table (unnormalized by the per-lag overlap — the standard biased
    CCF, documented); the normalization √(cxx·cyy) and the floor are
    the only double ops, sign factored. One fact scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("x"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("y"),
    )
    wi = Window.orderBy("month")
    idx = monthly.select(
        F.row_number().over(wi).alias("i"), "x", "y"
    ).localCheckpoint(eager=True)  # feeds totals + centering
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    ctr = idx.crossJoin(F.broadcast(tot)).selectExpr(
        "i",
        "CAST(n * x - sx AS DECIMAL(38,0)) AS dx",
        "CAST(n * y - sy AS DECIMAL(38,0)) AS dy",
    )
    wl = Window.orderBy("i")
    led = ctr.select(
        "dx",
        "dy",
        *[F.lead("dy", k).over(wl).alias(f"dyp{k}") for k in range(1, 7)],
        *[F.lag("dy", k).over(wl).alias(f"dym{k}") for k in range(1, 7)],
    )
    mom = led.agg(
        F.sum(F.expr("dx * dx")).alias("cxx"),
        F.sum(F.expr("dy * dy")).alias("cyy"),
        F.sum(F.expr("dx * dy")).alias("c0"),
        *[F.sum(F.expr(f"dx * dyp{k}")).alias(f"cp{k}") for k in range(1, 7)],
        *[F.sum(F.expr(f"dx * dym{k}")).alias(f"cm{k}") for k in range(1, 7)],
    )
    structs = ", ".join(
        ["struct(0 AS lag, c0 AS cv)"]
        + [f"struct({k} AS lag, cp{k} AS cv)" for k in range(1, 7)]
        + [f"struct(-{k} AS lag, cm{k} AS cv)" for k in range(1, 7)]
    )
    scored = mom.selectExpr(
        "cxx", "cyy", f"explode(array({structs})) AS e"
    ).selectExpr(
        "e.lag AS lag",
        "(CASE WHEN e.cv >= 0 THEN 1 ELSE -1 END)"
        " * floor(CAST(abs(e.cv) AS DOUBLE) * 1000000e0"
        "         / sqrt(CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)))"
        " AS r_raw",
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "lag",
        F.expr("CAST(r_raw AS BIGINT)").alias("ccf_ppm"),
        (F.abs(F.col("r_raw")) == F.max(F.abs(F.col("r_raw"))).over(w_all)).alias(
            "is_peak"
        ),
    )


@register(
    "moods_median_status",
    """
    WITH v AS MATERIALIZED (
      SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS v
      FROM orders
    ), med AS MATERIALIZED (
      SELECT v AS gm FROM (
        SELECT v, row_number() OVER (ORDER BY v) AS rk, COUNT(*) OVER () AS n
        FROM v
      ) WHERE rk = (n + 1) // 2
    ), cells AS MATERIALIZED (
      SELECT g,
             CAST(count_if(v.v > med.gm) AS BIGINT) AS above,
             CAST(count_if(v.v <= med.gm) AS BIGINT) AS at_or_below
      FROM v, med GROUP BY 1
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(above) AS BIGINT) AS ta,
             CAST(SUM(at_or_below) AS BIGINT) AS tb,
             CAST(SUM(above + at_or_below) AS BIGINT) AS n
      FROM cells
    )
    SELECT g AS o_orderstatus, above, at_or_below,
           CAST(((above + at_or_below) * ta * 1000000) // tot.n AS BIGINT)
             AS e_above_scaled,
           CASE WHEN ta > 0 AND tb > 0 THEN CAST(
             ((above::HUGEINT * tot.n - (above + at_or_below)::HUGEINT * ta)
              * (above::HUGEINT * tot.n - (above + at_or_below)::HUGEINT * ta)
              * 1000000)
             // ((above + at_or_below)::HUGEINT * ta * tot.n)
             + ((at_or_below::HUGEINT * tot.n
                 - (above + at_or_below)::HUGEINT * tb)
                * (at_or_below::HUGEINT * tot.n
                   - (above + at_or_below)::HUGEINT * tb)
                * 1000000)
               // ((above + at_or_below)::HUGEINT * tb * tot.n)
           AS BIGINT) END AS chi2_contrib_ppm
    FROM cells, tot
    """,
)
def moods_median_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across order statuses (the k-sample
    location test on a single order statistic): split every order at
    the GRAND lower median, count above / at-or-below per status,
    and emit each status's chi-square contribution
    Σ_cells (O·N − n_g·col)²/(n_g·col·N) ppm-scaled — cross-
    multiplied so the expected counts never materialize as
    fractions (two truncating divisions per row, both engines floor
    identically). The grand median rides the same ranking recipe as
    the other order statistics (the oracle's global window is the
    sf0.01 shortcut); cells are ONE conditional aggregation."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = o.select(
        F.col("o_orderstatus").alias("g"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
        ).alias("v"),
    ).localCheckpoint(eager=True)  # feeds the median recipe + the cells
    med = grouped_kth_smallest(
        v.select(F.lit(1).alias("one"), "v"),
        "one",
        "v",
        k_of_n="(n + 1) div 2",
    ).select(F.col("kth_value").alias("gm"))
    cells = (
        v.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count_if(F.col("v") > F.col("gm")).cast("bigint").alias("above"),
            F.count_if(F.col("v") <= F.col("gm"))
            .cast("bigint")
            .alias("at_or_below"),
        )
        .localCheckpoint(eager=True)  # bounded; feeds totals + output
    )
    tot = cells.agg(
        F.sum("above").cast("bigint").alias("ta"),
        F.sum("at_or_below").cast("bigint").alias("tb"),
        F.sum(F.col("above") + F.col("at_or_below")).cast("bigint").alias("n"),
    )
    return cells.crossJoin(F.broadcast(tot)).selectExpr(
        "g AS o_orderstatus",
        "above",
        "at_or_below",
        "CAST(((above + at_or_below) * ta * 1000000) div n AS BIGINT)"
        " AS e_above_scaled",
        # ta=0 happens when the grand lower median equals the max
        # value (every row at-or-below); ANSI div would raise — emit
        # NULL instead (ADVICE r9; oracle mirrors the CASE).
        "CASE WHEN ta > 0 AND tb > 0 THEN CAST("
        " ((CAST(above AS DECIMAL(38,0)) * n"
        "   - CAST(above + at_or_below AS DECIMAL(38,0)) * ta)"
        "  * (CAST(above AS DECIMAL(38,0)) * n"
        "     - CAST(above + at_or_below AS DECIMAL(38,0)) * ta)"
        "  * 1000000)"
        " div (CAST(above + at_or_below AS DECIMAL(38,0)) * ta * n)"
        " + ((CAST(at_or_below AS DECIMAL(38,0)) * n"
        "     - CAST(above + at_or_below AS DECIMAL(38,0)) * tb)"
        "    * (CAST(at_or_below AS DECIMAL(38,0)) * n"
        "       - CAST(above + at_or_below AS DECIMAL(38,0)) * tb)"
        "    * 1000000)"
        "   div (CAST(above + at_or_below AS DECIMAL(38,0)) * tb * n)"
        " AS BIGINT) END AS chi2_contrib_ppm",
    )


# =====================================================================
# Round 9, wave 23: differential-privacy mechanisms (deterministic
# seeded randomness — oracle bit-exact)
# =====================================================================

def _mix32_sql(expr: str, salt: int, xor_fn: str) -> str:
    """Two rounds of the house xor-shift-multiply finalizer on
    ``expr + salt``, both engines (CLAUDE.md portable-hash recipe);
    ``xor_fn`` is 'xor' for DuckDB oracle SQL, '^'-style infix is not
    shared, so Spark passes a lambda-free two-arg form too."""
    s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
    s1 = f"({xor_fn}({s0}, ({s0}) >> 16) * 73244475) % 4294967296"
    return f"({xor_fn}({s1}, ({s1}) >> 16) * 73244475) % 4294967296"


# ctz via the mod-37 de Bruijn trick: the lowest set bit v = h & -h is
# a power of two, and 2^k mod 37 are DISTINCT for k = 0..31 (2 has
# order 36 mod 37) — one bounded CASE maps residue -> k.
_CTZ_POW37 = {pow(2, k, 37): k for k in range(32)}
_CTZ_CASE = (
    "CASE WHEN {h} = 0 THEN 32 ELSE "
    + "CASE (({h}) & -({h})) % 37 "
    + " ".join(f"WHEN {r} THEN {k}" for r, k in sorted(_CTZ_POW37.items()))
    + " END END"
)


@register(
    "dp_geometric_counts_nations",
    f"""
    WITH cnt AS MATERIALIZED (
      SELECT n.n_name, n.n_nationkey,
             CAST(COUNT(*) AS BIGINT) AS true_count
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), h AS MATERIALIZED (
      SELECT n_name, true_count,
             {_mix32_sql("n_nationkey * 2 + 1", 1091, "xor")} AS h1,
             {_mix32_sql("n_nationkey * 2 + 2", 4639, "xor")} AS h2
      FROM cnt
    ), noise AS MATERIALIZED (
      SELECT n_name, true_count,
             CAST({_CTZ_CASE.format(h="h1")} AS BIGINT)
             - CAST({_CTZ_CASE.format(h="h2")} AS BIGINT) AS z
      FROM h
    )
    SELECT n_name, true_count, z AS noise,
           CAST(true_count + z AS BIGINT) AS noisy_count
    FROM noise
    """,
)
def dp_geometric_counts_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε = ln 2 differentially-private customer counts per nation via
    the DISCRETE Laplace (two-sided geometric) mechanism (Ghosh,
    Roughgarden & Sundararajan, STOC'09 — the utility-optimal
    mechanism for count queries): Z = G₁ − G₂ with G ~ Geometric(½),
    and a Geometric(½) draw is EXACTLY the trailing-zero count of a
    uniform 32-bit integer — here the house portable xor-shift hash
    of the nation key, so the "randomness" is seeded, reproducible,
    and bit-identical in both engines (release pipelines want
    deterministic replays; swap the salt per release for fresh
    draws). ctz is branch-free algebra: lowest-set-bit isolation
    h & −h plus the mod-37 de Bruijn residue lookup (2 has order 36
    mod 37, so 2^k mod 37 is injective for k < 32). Sensitivity-1
    count + Laplace(p=½) noise ⇒ ε = ln 2. Zero floats, one bounded
    CASE per draw."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cnt = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "n_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    def spark_xor(a: str, b: str) -> str:
        return f"({a}) ^ ({b})"

    def mix(expr: str, salt: int) -> str:
        s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
        s1 = f"((({s0}) ^ (({s0}) >> 16)) * 73244475) % 4294967296"
        return f"((({s1}) ^ (({s1}) >> 16)) * 73244475) % 4294967296"

    h = cnt.selectExpr(
        "n_name",
        "true_count",
        f"{mix('n_nationkey * 2 + 1', 1091)} AS h1",
        f"{mix('n_nationkey * 2 + 2', 4639)} AS h2",
    )
    noise = h.selectExpr(
        "n_name",
        "true_count",
        f"CAST({_CTZ_CASE.format(h='h1')} AS BIGINT)"
        f" - CAST({_CTZ_CASE.format(h='h2')} AS BIGINT) AS z",
    )
    return noise.selectExpr(
        "n_name",
        "true_count",
        "z AS noise",
        "CAST(true_count + z AS BIGINT) AS noisy_count",
    )


@register(
    "randomized_response_returns",
    f"""
    WITH rr AS MATERIALIZED (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
             CASE WHEN ({_mix32_sql("l.l_orderkey * 8 + l.l_linenumber", 7211, "xor")}) % 4 = 0
                  THEN 1 ELSE 0 END AS flip
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), agg AS MATERIALIZED (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS true_returns,
             CAST(count_if((t + flip) % 2 = 1) AS BIGINT) AS reported_returns
      FROM rr GROUP BY 1
    )
    SELECT p_brand, n, true_returns, reported_returns,
           CAST((true_returns * 1000000) // n AS BIGINT) AS true_ppm,
           CAST((CASE WHEN 4 * reported_returns >= n THEN 1 ELSE -1 END)
                * ((abs(4 * reported_returns - n) * 1000000) // (2 * n))
                AS BIGINT) AS estimated_ppm
    FROM agg
    """,
)
def randomized_response_returns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response (JASA 1965) on the per-row return
    flag: each row reports the TRUTH with probability 3/4 and the
    flip with probability 1/4 (the dyadic design — two seeded hash
    bits decide, so the obfuscation is reproducible and bit-exact in
    both engines), giving each individual row plausible deniability
    (ε = ln 3 local DP) while the aggregate debiases EXACTLY:
    P(report) = 1/4 + p/2 ⇒ p̂ = (4·obs − n)/(2n), emitted as a
    sign-factored ppm integer next to the true rate the curator can
    compare against. One broadcast-dim pass, zero floats."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")

    def mix(expr: str, salt: int) -> str:
        s0 = f"(({expr}) % 4294967296 * 73244475 + {salt} * 2246822519) % 4294967296"
        s1 = f"((({s0}) ^ (({s0}) >> 16)) * 73244475) % 4294967296"
        return f"((({s1}) ^ (({s1}) >> 16)) * 73244475) % 4294967296"

    rr = li.join(
        pt.select("p_partkey", "p_brand"),
        li["l_partkey"] == F.col("p_partkey"),
    ).selectExpr(
        "p_brand",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t",
        f"CASE WHEN ({mix('l_orderkey * 8 + l_linenumber', 7211)}) % 4 = 0"
        " THEN 1 ELSE 0 END AS flip",
    )
    agg = rr.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("true_returns"),
        F.count_if(F.expr("(t + flip) % 2 = 1"))
        .cast("bigint")
        .alias("reported_returns"),
    )
    return agg.selectExpr(
        "p_brand",
        "n",
        "true_returns",
        "reported_returns",
        "CAST((true_returns * 1000000) div n AS BIGINT) AS true_ppm",
        "CAST((CASE WHEN 4 * reported_returns >= n THEN 1 ELSE -1 END)"
        " * ((abs(4 * reported_returns - n) * 1000000) div (2 * n))"
        " AS BIGINT) AS estimated_ppm",
    )


# =====================================================================
# Round 9, wave 24: clustering validity indices
# =====================================================================

@register(
    "kmeans_validity_embeddings",
    """
    WITH vecs AS MATERIALIZED (
      SELECT vec_id AS vid,
             CAST(unnest(range(0, len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) + 1024
                  AS BIGINT) AS x
      FROM embeddings
    ), seeds AS (
      SELECT vid FROM (
        SELECT vid, row_number() OVER (ORDER BY vid) AS rn
        FROM (SELECT DISTINCT vid FROM vecs)
      ) WHERE rn <= 8
    ), c0 AS MATERIALIZED (
      SELECT v.vid AS cluster, v.d, v.x AS cd
      FROM vecs v JOIN seeds s ON s.vid = v.vid
    ), a1 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c0 c ON v.d = c.d
      GROUP BY 1, 2
    ), b1 AS MATERIALIZED (
      SELECT vid, cluster FROM (
        SELECT vid, cluster,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a1
      ) WHERE rn = 1
    ), c1 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b1 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), a2 AS MATERIALIZED (
      SELECT v.vid, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM vecs v JOIN c1 c ON v.d = c.d
      GROUP BY 1, 2
    ), b2 AS MATERIALIZED (
      SELECT vid, cluster FROM (
        SELECT vid, cluster, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cluster) AS rn
        FROM a2
      ) WHERE rn = 1
    ), c2 AS MATERIALIZED (
      SELECT b.cluster, v.d, CAST(SUM(v.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS cd
      FROM b2 b JOIN vecs v ON v.vid = b.vid
      GROUP BY 1, 2
    ), fin AS MATERIALIZED (
      SELECT b.vid, b.cluster AS own, c.cluster,
             CAST(SUM((v.x - c.cd) * (v.x - c.cd)) AS BIGINT) AS dist
      FROM b2 b JOIN vecs v ON v.vid = b.vid JOIN c2 c ON c.d = v.d
      GROUP BY 1, 2, 3
    ), pts AS MATERIALIZED (
      SELECT vid, own,
             CAST(MIN(CASE WHEN cluster = own THEN dist END) AS BIGINT) AS a2d,
             CAST(MIN(CASE WHEN cluster <> own THEN dist END) AS BIGINT) AS b2d
      FROM fin GROUP BY 1, 2
    ), sil AS MATERIALIZED (
      SELECT own AS cluster, a2d, b2d,
             CASE WHEN greatest(a2d, b2d) > 0 THEN
               (CASE WHEN b2d >= a2d THEN 1 ELSE -1 END)
               * ((abs(b2d - a2d) * 1000000) // greatest(a2d, b2d))
             ELSE 0 END AS s_ppm
      FROM pts
    ), pc AS MATERIALIZED (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST((CASE WHEN SUM(s_ppm) >= 0 THEN 1 ELSE -1 END)
                  * (abs(SUM(s_ppm)) // COUNT(*)) AS BIGINT)
               AS mean_silhouette_ppm,
             CAST(count_if(b2d < a2d) AS BIGINT) AS n_negative,
             CAST(SUM(a2d) AS BIGINT) AS w_part
      FROM sil GROUP BY 1
    ), tt AS MATERIALIZED (
      SELECT CAST(SUM(w_part) AS BIGINT) AS w,
             CAST(SUM(n_members) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS kk
      FROM pc
    ), sc AS MATERIALIZED (
      SELECT SUM(nd::HUGEINT * sxx - sx::HUGEINT * sx) AS tn2 FROM (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(x) AS BIGINT) AS sx, SUM(x::HUGEINT * x) AS sxx
        FROM vecs GROUP BY d
      )
    )
    SELECT pc.cluster, pc.n_members, pc.mean_silhouette_ppm, pc.n_negative,
           CASE WHEN tt.kk > 1 AND tt.w > 0 AND tt.n > tt.kk THEN CAST(
             (CASE WHEN sc.tn2 >= tt.w::HUGEINT * tt.n THEN 1 ELSE -1 END)
             * ((abs(sc.tn2 - tt.w::HUGEINT * tt.n)
                 * (tt.n - tt.kk) * 1000000)
                // (tt.w::HUGEINT * tt.n * (tt.kk - 1))) AS BIGINT)
           END AS ch_ppm
    FROM pc, tt, sc
    """,
)
def kmeans_validity_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal clustering-validity readout for the portable k-means
    fit (operators/ml.py kmeans_validity_indices): per cluster the
    SIMPLIFIED silhouette on exact squared integer distances to the
    final centroids (per-point ppm floors, sign-factored mean), the
    count of points whose nearest final centroid is not their
    assigned one, and the Calinski-Harabasz variance ratio (global
    scalar, n-scaled scatter so n cancels exactly) — the "was k = 8
    a good idea" diagnostics, all integer divisions. Same unrolled
    two-round Lloyd prefix as kmeans_lloyd_portable; one extra
    k-wide broadcast scoring pass — no second corpus shuffle."""
    from dpe_energy_performance_analysis_etl_spark.operators.ml import (
        kmeans_validity_indices,
    )

    emb = read_embeddings(spark, sf_dir)
    return kmeans_validity_indices(emb, k=8, iterations=2)


# =====================================================================
# Round 9, wave 25: Haar wavelet energy decomposition
# =====================================================================

_HAAR_LEVELS = 4  # over the first 64 months: 32+16+8+4 detail coeffs


def _haar_oracle_level(lvl: int) -> str:
    src = "base0" if lvl == 1 else f"s{lvl - 1}"
    return f"""
    , d{lvl} AS MATERIALIZED (
      SELECT (k - 1) // 2 AS k,
             SUM(CASE WHEN k % 2 = 1 THEN v ELSE -v END) AS d,
             SUM(v) AS s
      FROM {src} GROUP BY 1 HAVING COUNT(*) = 2
    ), s{lvl} AS MATERIALIZED (
      SELECT k + 1 AS k, s AS v FROM d{lvl}
    ), e{lvl} AS MATERIALIZED (
      SELECT {lvl} AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
             CAST(SUM(d::HUGEINT * d) * {1 << (_HAAR_LEVELS - lvl)}
                  AS HUGEINT) AS e_scaled
      FROM d{lvl}
    )"""


@register(
    "haar_energy_revenue",
    f"""
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), base0 AS MATERIALIZED (
      SELECT k, rev AS v FROM (
        SELECT row_number() OVER (ORDER BY month) AS k, rev FROM monthly
      ) WHERE k <= 64
    ){"".join(_haar_oracle_level(l) for l in range(1, _HAAR_LEVELS + 1))}
    , alle AS MATERIALIZED (
      {" UNION ALL ".join(f"SELECT * FROM e{l}" for l in range(1, _HAAR_LEVELS + 1))}
    ), tot AS MATERIALIZED (
      SELECT SUM(e_scaled) AS te FROM alle
    )
    SELECT level, n_coeffs, CAST(e_scaled AS DOUBLE) AS energy_scaled,
           CASE WHEN tot.te > 0 THEN
             CAST((e_scaled * 1000000) // tot.te AS BIGINT)
           END AS share_ppm
    FROM alle, tot
    """,
)
def haar_energy_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the first 64 months of
    revenue (Haar 1910; the wavelet variance spectrum): level-l
    detail coefficients are UNNORMALIZED pairwise differences of the
    level-(l−1) smooth — exact integers — and each level's energy is
    rescaled by 2^(L−l) so the dyadic 1/2^l normalizations cancel
    into one exact integer share: which time-scale (2-month swings
    up to 16-month cycles) carries the variance? The scale-localized
    complement of Ljung-Box (correlation per lag) and R/S (global
    memory). Four levels of bounded stride-2 aggregations over the
    pinned month table; energies emitted as scale-0 doubles, shares
    as exact ppm integers."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("rev")
    )
    wi = Window.orderBy("month")
    cur = (
        monthly.select(F.row_number().over(wi).alias("k"), F.col("rev").alias("v"))
        .where(F.col("k") <= 64)
        .localCheckpoint(eager=True)
    )
    levels = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        dd = (
            cur.groupBy(F.expr("(k - 1) div 2").alias("k"))
            .agg(
                F.sum(F.expr("CASE WHEN k % 2 = 1 THEN v ELSE -v END")).alias("d"),
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("_c"),
            )
            # a trailing orphan is not a pair — it carries no Haar
            # difference and must not leak into the next level
            .where(F.col("_c") == 2)
            .drop("_c")
        )
        # bounded (≤64/2^l rows), consumed by the energy agg AND the
        # next level — pinned
        dd = dd.localCheckpoint(eager=True)
        levels.append(
            dd.agg(
                F.lit(lvl).alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
                F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d"))
                .alias("_raw_e"),
            ).selectExpr(
                "level",
                "n_coeffs",
                f"_raw_e * {1 << (_HAAR_LEVELS - lvl)} AS e_scaled",
            )
        )
        # re-base k to 1 so (k - 1) div 2 never sees a negative
        cur = dd.select((F.col("k") + 1).alias("k"), F.col("s").alias("v"))
    alle = levels[0]
    for o in levels[1:]:
        alle = alle.unionAll(o)
    alle = alle.localCheckpoint(eager=True)  # 4 rows; feeds total + output
    tot = alle.agg(F.sum("e_scaled").alias("te"))
    return alle.crossJoin(F.broadcast(tot)).selectExpr(
        "level",
        "n_coeffs",
        "CAST(e_scaled AS DOUBLE) AS energy_scaled",
        "CASE WHEN te > 0 THEN CAST((e_scaled * 1000000) div te AS BIGINT)"
        " END AS share_ppm",
    )
