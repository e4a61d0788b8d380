"""Local correctness harness mirroring the driver's gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count, column names, column
TYPES, and exact values (sorted column order, order-insensitive rows).

Type-faithfulness matters: the driver's value-hash is typed, and three
rounds (r1, r2 ``math_functions``; r3 ``time_weighted_avg``) were lost
to oracle *type* skew that the old float-coercing compare could not
see — DuckDB types ``SUM(BIGINT)`` as HUGEINT, which ``fetchdf()``
degrades to float64, losing exactness past 2^53 while Spark's BIGINT
stays exact. This harness therefore fetches the oracle via
``fetch_arrow_table()`` (which preserves HUGEINT/DECIMAL as
decimal128) and:

  * FAILS when the oracle column is decimal128 (HUGEINT / un-cast big
    SUM) but the Spark column is integer/float — the oracle SQL must
    ``CAST(... AS BIGINT)`` / ``AS DOUBLE`` explicitly;
  * FAILS on int-vs-float kind skew (spark int + oracle float, or
    spark float-without-nulls + oracle int) — the class that burned
    ``math_functions`` twice;
  * compares integer columns as exact Python ints (no float round
    trip) and WARNS when any integer magnitude exceeds 2^53;
  * still allows spark float-with-NaN vs oracle int (pandas degrades
    nullable int64 to float64 on ``toPandas`` — both engines do).

Round-5 addition — the SHAPE gate: the driver's canonicalizer
(pandas ``sort_values`` → ``factorize``) dies on list/struct/map
values (``unhashable type: 'list'``), which is exactly how round 4's
only red row (``snapshot_diff_orders``, ARRAY<STRING> output) happened
despite a locally green 195/195. Any oracle-checked query whose Spark
OR oracle output schema contains an array/map/struct column now FAILS
here, before the driver ever sees it. Emit complex values as sorted
comma-joined strings instead.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TWO_53 = 2**53


def load_entry():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    return entry_mod


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def arrow_kind(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "seq"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    return "str"


def pandas_kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    # object column: inspect first non-null value
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        import datetime
        import decimal

        if isinstance(v, (list, tuple, np.ndarray)):
            return "seq"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (datetime.date, datetime.datetime)):
            return "ts"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return "str"
    return "empty"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    sort_key = df.astype(str)
    order = sort_key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def _exact_int_compare(sv: pd.Series, ov: pd.Series) -> tuple[list[int], bool]:
    """Compare two int-like columns exactly (Python int, no float round
    trip). Returns (mismatch positions, saw_beyond_2^53)."""
    bad, big = [], False
    for i, (a, b) in enumerate(zip(sv, ov)):
        a_null = a is None or (isinstance(a, float) and np.isnan(a)) or a is pd.NA
        b_null = b is None or (isinstance(b, float) and np.isnan(b)) or b is pd.NA
        if a_null or b_null:
            if a_null != b_null:
                bad.append(i)
            continue
        ia, ib = int(a), int(b)
        if abs(ia) > TWO_53 or abs(ib) > TWO_53:
            big = True
        if ia != ib:
            bad.append(i)
    return bad, big


def _arrow_nonscalar(t: pa.DataType) -> bool:
    return (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
        or pa.types.is_struct(t)
        or pa.types.is_map(t)
    )


def spark_nonscalar_cols(schema) -> list[str]:
    """Columns of a Spark schema the driver's canonicalizer cannot
    sort/factorize (array/map/struct) — forbidden in oracle-checked
    outputs (the snapshot_diff_orders r4 lesson)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(
    name: str,
    spark_pdf: pd.DataFrame,
    oracle_tbl: pa.Table,
) -> tuple[list[str], list[str]]:
    """Returns (problems, warnings)."""
    problems: list[str] = []
    warnings: list[str] = []
    oracle_types = {f.name: f.type for f in oracle_tbl.schema}
    bad_shape = [f.name for f in oracle_tbl.schema if _arrow_nonscalar(f.type)]
    if bad_shape:
        problems.append(
            f"NON-SCALAR ORACLE OUTPUT {bad_shape}: the driver's pandas "
            f"canonicalizer cannot factorize list/struct/map values "
            f"(unhashable type: 'list'). Emit a sorted comma-joined string."
        )
        return problems, warnings
    oracle_pdf = oracle_tbl.to_pandas()

    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems, warnings
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems, warnings

    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        sk = pandas_kind(sv)
        ok_arrow = arrow_kind(oracle_types[c])

        # --- the type gate (driver hash is typed; skew = red) -------
        if ok_arrow == "decimal" and sk != "decimal":
            problems.append(
                f"col {c}: ORACLE TYPE SKEW — DuckDB returned {oracle_types[c]} "
                f"(HUGEINT / un-cast SUM or bare decimal literal?) but Spark returned "
                f"{sk}. The driver degrades this to float64 and the typed hash "
                f"mismatches past 2^53. CAST the oracle column explicitly."
            )
            continue
        if sk == "int" and ok_arrow == "float":
            problems.append(
                f"col {c}: TYPE SKEW — spark int vs oracle DOUBLE "
                f"(the math_functions class). Align output types explicitly."
            )
            continue
        if sk == "float" and ok_arrow == "int" and not sv.isna().any():
            problems.append(
                f"col {c}: TYPE SKEW — spark float (no nulls, so not a pandas "
                f"nullable-int degradation) vs oracle {oracle_types[c]}. "
                f"Align output types explicitly."
            )
            continue

        # --- value comparison ---------------------------------------
        if sk == "int" and ok_arrow == "int":
            bad, big = _exact_int_compare(sv, ov)
            if big:
                warnings.append(
                    f"col {c}: integer magnitudes exceed 2^53 — exact here, but "
                    f"any float round trip (incl. DuckDB HUGEINT) would corrupt."
                )
            if bad:
                problems.append(
                    f"col {c}: {len(bad)} exact-int mismatches, "
                    f"examples={[(sv.iloc[i], ov.iloc[i]) for i in bad[:3]]}"
                )
        elif pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            oa = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(sa) & np.isnan(oa)
            equal = (sa == oa) | both_nan
            if not equal.all():
                bad = np.flatnonzero(~equal)[:3]
                diffs = np.abs(sa - oa)
                problems.append(
                    f"col {c}: {len(np.flatnonzero(~equal))} mismatches, "
                    f"max_abs_diff={np.nanmax(diffs):.3e}, "
                    f"examples={[(sa[i], oa[i]) for i in bad]}"
                )
        else:
            eq = (sv.astype(str) == ov.astype(str)) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:3]
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches, examples="
                    f"{[(sv.iloc[i], ov.iloc[i]) for i in bad]}"
                )
    return problems, warnings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    entry_mod = load_entry()

    from dpe_energy_performance_analysis_etl_spark import get_spark

    spark = get_spark("check_queries")
    con = duckdb_con(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_checked, n_warn = [], 0, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        bad_shape = spark_nonscalar_cols(sdf.schema)
        if bad_shape:
            failures.append(name)
            print(
                f"FAIL  {name}: NON-SCALAR SPARK OUTPUT {bad_shape} — the "
                f"driver's canonicalizer rejects array/map/struct columns "
                f"(r4 snapshot_diff lesson). Stringify before registering."
            )
            continue
        try:
            oracle_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        problems, warns = compare(name, spark_pdf, oracle_tbl)
        n_checked += 1
        n_warn += len(warns)
        if problems:
            failures.append(name)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
        for w in warns:
            print(f"      WARN {w}")

    print(f"\n{n_checked} oracle-checked, {len(failures)} failures ({n_warn} warnings): {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
