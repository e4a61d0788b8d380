"""r12 optimization: `grouped_running_totals(..., with_totals=True)`
returns a bounded per-group totals side table aggregated from the
recipe's internal sizes table — so two-pass callers (KS,
Anderson-Darling) no longer pin the prefix stream just to re-derive
totals from it. The totals must equal a direct groupBy sum of the
input, including groups that span multiple range partitions."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from dpe_energy_performance_analysis_etl_spark import get_spark

    s = get_spark("test_r12_with_totals")
    yield s


def test_totals_match_direct_aggregation(spark):
    # 3 groups x 400 distinct order keys — forces spread across the
    # range partitions so cross-partition summing is exercised
    rows = [
        (f"g{i % 3}", i, 1 + (i % 7), (i * 13) % 5)
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "g string, v long, cnt long, cnt1 long")
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_running_totals,
    )

    pre, tot = grouped_running_totals(
        df, "g", "v", ["cnt", "cnt1"], with_totals=True
    )
    got = {
        r["g"]: (r["_n_cnt"], r["_n_cnt1"]) for r in tot.collect()
    }
    want = {
        r["g"]: (r["a"], r["b"])
        for r in df.groupBy("g")
        .agg(
            F.sum("cnt").cast("bigint").alias("a"),
            F.sum("cnt1").cast("bigint").alias("b"),
        )
        .collect()
    }
    assert got == want

    # the prefix half of the pair is unchanged by with_totals
    plain = grouped_running_totals(df, "g", "v", ["cnt", "cnt1"])
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, pre.collect()))
    assert a == b


def test_ks_and_ad_against_brute_force(spark):
    # KS D and AD A2 on a small adversarial shape (ties, an
    # empty-side group), checked against a python brute force of the
    # same integer formulas
    data = [
        ("a", 1, 5), ("a", 0, 5), ("a", 1, 7), ("a", 0, 2), ("a", 0, 7),
        ("b", 1, 3), ("b", 1, 3),          # empty side-2 group
        ("c", 0, 1), ("c", 1, 1),          # single tied tier
    ]
    df = spark.createDataFrame(data, "g string, s int, v long")
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        anderson_darling_two_sample,
        ks_two_sample,
    )

    def brute(rows):
        out_ks, out_ad = {}, {}
        for g in {r[0] for r in rows}:
            vs = sorted(r[2] for r in rows if r[0] == g)
            n = len(vs)
            n1 = sum(1 for r in rows if r[0] == g and r[1])
            tiers = sorted(set(vs))
            cum = cum1 = 0
            mx = 0
            # a2 stays None until a tier passes the cum < n filter:
            # a group with no surviving tier emits NULL (the filtered
            # stream has no row for it), not 0
            a2 = None
            for v in tiers:
                cnt = sum(1 for r in rows if r[0] == g and r[2] == v)
                c1 = sum(1 for r in rows if r[0] == g and r[2] == v and r[1])
                cum += cnt
                cum1 += c1
                mx = max(mx, abs(cum1 * n - cum * n1))
                if cum < n and 0 < n1 < n:
                    d = cum1 * n - cum * n1
                    a2 = (a2 or 0) + (cnt * d * d * 1_000_000) // (
                        cum * (n - cum) * n1 * (n - n1)
                    )
            out_ks[g] = (
                n1,
                n - n1,
                (mx * 1_000_000) // (n1 * (n - n1))
                if 0 < n1 < n
                else None,
            )
            out_ad[g] = (n1, n - n1, a2 if 0 < n1 < n else None)
        return out_ks, out_ad

    want_ks, want_ad = brute(data)
    got_ks = {
        r["g"]: (r["n1"], r["n2"], r["d_scaled"])
        for r in ks_two_sample(df, "g", "s", "v").collect()
    }
    got_ad = {
        r["g"]: (r["n1"], r["n2"], r["a2_qscaled"])
        for r in anderson_darling_two_sample(df, "g", "s", "v").collect()
    }
    assert got_ks == want_ks
    assert got_ad == want_ad
