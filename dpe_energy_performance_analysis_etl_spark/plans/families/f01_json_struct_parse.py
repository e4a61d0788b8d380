"""Query-registry family chunk 1 (auto-split from the
historical plans/queries.py lines 1960-3731; registration
order preserved — see plans/queries.py facade)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    Callable,
    DataFrame,
    SparkSession,
    Window,
    F,
    epoch_double,
    epoch_micros,
    epoch_seconds,
    exact_cents_sum,
    exact_sum_agg,
    from_cents,
    scaled_long,
    TABLES,
    load_tables,
    read_events,
    read_documents,
    read_embeddings,
    dsum,
    davg,
    dsum_fast,
    davg_fast,
    QUERIES,
    ORACLE_SQL,
    register,
)
from dpe_energy_performance_analysis_etl_spark.plans.families.f00_q1_pricing_summary import (  # noqa: F401
    ann_lsh_topk_q,
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
