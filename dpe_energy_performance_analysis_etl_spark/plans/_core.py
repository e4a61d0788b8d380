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

