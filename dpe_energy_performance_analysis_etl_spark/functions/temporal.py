"""Physical-type-tolerant event-time helpers.

The events table's ``ts`` column has shipped in three different
physical encodings across testdata generations:

  - parquet TIMESTAMP(NANOS)  -> Spark reads BIGINT (nanoseconds)
    under ``spark.sql.legacy.parquet.nanosAsLong``;
  - parquet timestamp[us] with isAdjustedToUTC=true  -> TIMESTAMP (LTZ);
  - parquet timestamp[us] with isAdjustedToUTC=false -> TIMESTAMP_NTZ.

TIMESTAMP_NTZ cannot be cast to a numeric type at all, so every
``ts.cast("long")`` call site is a latent AnalysisException waiting
for the next encoding change. These helpers are the ONE place that
knowledge lives: normalize at read time with ``normalize_event_time``
and convert with ``epoch_seconds`` / ``epoch_micros`` / ``epoch_double``
everywhere else. The next physical-format change is a one-line fix
here, not a six-site hunt.

The session time zone must be UTC (set in ``session.get_spark`` and
re-asserted by ``plans.queries.read_events``) so the NTZ->LTZ cast is
value-preserving against naive-timestamp oracles (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def normalize_event_time(
    df: DataFrame, col: str = "ts", bigint_unit: str = "ns"
) -> DataFrame:
    """Return ``df`` with ``col`` as a session-local TIMESTAMP whatever
    physical type it arrived in.

    - BIGINT: interpreted per ``bigint_unit`` (``ns``/``us``/``ms``/``s``;
      default ``ns`` — the TIMESTAMP(NANOS)-as-long parquet shape).
    - TIMESTAMP_NTZ: cast to TIMESTAMP; with the session tz pinned to
      UTC this keeps the wall-clock values bit-identical.
    - TIMESTAMP: already right; returned unchanged.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"column {col!r} not in {df.columns}")
    if dtype in _NUMERIC:
        if bigint_unit == "ns":
            micros = F.expr(f"{col} div 1000")
        elif bigint_unit == "us":
            micros = F.col(col)
        elif bigint_unit == "ms":
            micros = F.col(col).cast("bigint") * 1000
        elif bigint_unit == "s":
            micros = (F.col(col).cast("double") * 1_000_000).cast("bigint")
        else:
            raise ValueError(f"unknown bigint_unit {bigint_unit!r}")
        return df.withColumn(col, F.timestamp_micros(micros.cast("bigint")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _as_timestamp(c: Column | str) -> Column:
    """Column-level tolerance: NTZ and numeric-seconds both cast to
    TIMESTAMP; TIMESTAMP passes through. (A Column can't see its own
    dtype, but ``cast("timestamp")`` is the no-op/utc-preserving path
    for every shape we accept here.)"""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")


def epoch_seconds(c: Column | str) -> Column:
    """Whole epoch seconds (BIGINT) from TIMESTAMP / TIMESTAMP_NTZ /
    numeric-seconds input."""
    return _as_timestamp(c).cast("long")


def epoch_micros(c: Column | str) -> Column:
    """Epoch microseconds (BIGINT)."""
    return F.unix_micros(_as_timestamp(c))


def epoch_double(c: Column | str) -> Column:
    """Epoch seconds with fractional microseconds (DOUBLE) — for
    arithmetic like bucket floors and range deltas."""
    return _as_timestamp(c).cast("double")
