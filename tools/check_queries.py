"""Local correctness harness mirroring the driver's gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count, column names, and exact
values (sorted column order, order-insensitive rows).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


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


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
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
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    entry_mod = load_entry()

    from dpe_energy_performance_analysis_etl_spark import get_spark

    spark = get_spark("check_queries")
    con = duckdb_con(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_checked = [], 0
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
        try:
            oracle_pdf = con.execute(sql).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        n_checked += 1
        if problems:
            failures.append(name)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{n_checked} oracle-checked, {len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
