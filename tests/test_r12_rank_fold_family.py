"""r12 optimization: the rank-statistic family (Mann-Whitney,
Kruskal-Wallis, Jonckheere, Cramér-von Mises, Mood) now folds
prefix polynomials LOCAL+CROSS (grouped_local_prefix /
partition_offsets) instead of building per-row global prefixes via
the pinned two-pass recipe. These tests pin the fold against pure
python brute forces on shapes that force MULTIPLE range partitions,
so the cross-partition offset algebra (including per-class offsets
in Jonckheere and the two-prefix cross moments in CvM) is actually
exercised — a single-partition run would make every offset zero and
hide a broken fold.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark(spark):
    # AQE would coalesce this tiny range exchange to ONE partition,
    # zeroing every cross-partition offset and making the fold
    # algebra vacuous; at scale the exchange keeps many partitions,
    # so the test disables coalescing to reproduce that shape.
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)


@pytest.fixture(scope="module")
def data():
    # 2 groups x interleaved classes over ~1500 distinct values —
    # wide enough that repartitionByRange spreads each group over
    # several partitions (verified below), with ties and an
    # empty-side group
    rows = [
        (f"g{i % 2}", str(1 + (i * 7) % 5), (i * 13) % 1499)
        for i in range(3000)
    ]
    rows += [("gone", "1", 5), ("gone", "1", 7)]  # single-class group
    return rows


def _brute_mr2(vals):
    """doubled mid-rank per distinct value of a sorted multiset."""
    from collections import Counter

    cnt = Counter(vals)
    out = {}
    before = 0
    for v in sorted(cnt):
        out[v] = 2 * before + cnt[v] + 1
        before += cnt[v]
    return out, cnt


def test_fold_spreads_over_multiple_partitions(spark, data):
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_local_prefix,
    )

    df = spark.createDataFrame(data, "g string, s string, v long")
    tiers = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    loc = grouped_local_prefix(tiers, "g", "v", ["cnt"])
    pids = loc.select("g", "_pid").distinct().groupBy("g").count().collect()
    # the contract of this test file: >1 partition per group, else
    # the cross fold is vacuous
    assert all(r["count"] > 1 for r in pids if r["g"] != "gone")


def test_mann_whitney_brute(spark, data):
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(data, "g string, s string, v long").select(
        "g", (F.col("s") == "1").alias("side"), "v"
    )
    got = {
        r["g"]: (r["n1"], r["n2"], r["u1_x2"], r["u2_x2"])
        for r in mann_whitney_u(df, "g", "side", "v").collect()
    }
    by_g = {}
    for g, s, v in data:
        by_g.setdefault(g, []).append((s == "1", v))
    want = {}
    for g, rows in by_g.items():
        mr2, _ = _brute_mr2([v for _, v in rows])
        n1 = sum(1 for s, _ in rows if s)
        n = len(rows)
        r1x2 = sum(mr2[v] for s, v in rows if s)
        u1 = r1x2 - n1 * (n1 + 1)
        want[g] = (n1, n - n1, u1, 2 * n1 * (n - n1) - u1)
    assert got == want


def test_jonckheere_brute(spark, data):
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        jonckheere_pairwise_u,
    )

    samples = ["1", "2", "3", "4", "5"]
    df = spark.createDataFrame(data, "g string, s string, v long")
    got = {
        (r["g"], r["pr_lo"], r["pr_hi"]): (r["n_lo"], r["n_hi"], r["u2"], r["e2"])
        for r in jonckheere_pairwise_u(df, "g", "s", "v", samples).collect()
    }
    by_g = {}
    for g, s, v in data:
        by_g.setdefault(g, []).append((s, v))
    want = {}
    for g, rows in by_g.items():
        for i, lo in enumerate(samples):
            for hi in samples[i + 1 :]:
                a = [v for s, v in rows if s == lo]
                b = [v for s, v in rows if s == hi]
                u2 = sum(
                    2 * sum(1 for x in a if x < y) + sum(1 for x in a if x == y)
                    for y in b
                )
                want[(g, lo, hi)] = (len(a), len(b), u2, len(a) * len(b))
    assert got == want


def test_cvm_and_mood_brute(spark, data):
    from dpe_energy_performance_analysis_etl_spark.operators.stats import (
        cramer_von_mises_2samp,
        mood_dispersion_2samp,
    )

    df = spark.createDataFrame(data, "g string, s string, v long").select(
        "g", F.col("s").isin("1", "2").alias("flag"), "v"
    )
    got_cvm = {
        r["g"]: (r["n1"], r["n2"], r["cvm_ppm"])
        for r in cramer_von_mises_2samp(df, "g", "flag", "v").collect()
    }
    got_mood = {
        r["g"]: (r["n1"], r["n2"], r["mood_ppm"], r["expect_ppm"])
        for r in mood_dispersion_2samp(df, "g", "flag", "v").collect()
    }
    by_g = {}
    for g, s, v in data:
        by_g.setdefault(g, []).append((s in ("1", "2"), v))
    for g, rows in by_g.items():
        n1 = sum(1 for f, _ in rows if f)
        n2 = len(rows) - n1
        n = len(rows)
        tiers = sorted({v for _, v in rows})
        # cvm brute
        a = b = 0
        sa2 = sab = sb2 = 0
        for v in tiers:
            c1 = sum(1 for f, x in rows if f and x == v)
            c2 = sum(1 for f, x in rows if not f and x == v)
            a += c1
            b += c2
            c = c1 + c2
            sa2 += c * a * a
            sab += c * a * b
            sb2 += c * b * b
        if n1 > 0 and n2 > 0:
            t_num = n2 * n2 * sa2 - 2 * n1 * n2 * sab + n1 * n1 * sb2
            cvm = ((t_num // (n * n)) * 1_000_000) // (n1 * n2)
        else:
            cvm = None
        assert got_cvm[g] == (n1, n2, cvm), g
        # mood brute
        mr2, cnt = _brute_mr2([v for _, v in rows])
        s1a = sum(mr2[v] ** 2 for f, v in rows if f)
        m1 = sum((mr2[v] - (n + 1)) ** 2 for f, v in rows if f)
        mt = sum((mr2[v] - (n + 1)) ** 2 for _, v in rows)
        mood = (m1 * 1_000_000) // mt if mt > 0 else None
        expect = (n1 * 1_000_000) // n
        assert got_mood[g] == (n1, n2, mood, expect), g
