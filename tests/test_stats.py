"""Numpy statistical-test implementations vs published reference
values (scipy is not installed; expected numbers were computed from
the textbook definitions / standard tables)."""

import math

import numpy as np
import pytest

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    betainc_reg,
    t_sf_two_sided,
    ttest_rel,
    wilcoxon,
)


def test_t_distribution_critical_values():
    # Standard t-table: P(|T| > 2.776) = 0.05 at df=4
    assert t_sf_two_sided(2.776, 4) == pytest.approx(0.05, abs=2e-4)
    # P(|T| > 1.96) -> 0.05 as df -> inf (use df=1e6)
    assert t_sf_two_sided(1.96, 1_000_000) == pytest.approx(0.05, abs=1e-3)
    assert t_sf_two_sided(0.0, 10) == pytest.approx(1.0)


def test_betainc_against_symmetry():
    # I_x(a,b) + I_{1-x}(b,a) = 1
    for a, b, x in [(2.0, 3.0, 0.3), (0.5, 0.5, 0.7), (5.0, 1.5, 0.1)]:
        assert betainc_reg(a, b, x) + betainc_reg(b, a, 1 - x) == pytest.approx(1.0, abs=1e-12)


def test_ttest_rel_known_case():
    # d = [1,1,1,1,1] with sd=0 -> perfect separation
    t, p = ttest_rel(np.array([2.0, 3, 4, 5, 6]), np.array([1.0, 2, 3, 4, 5]))
    assert math.isinf(t) and p == 0.0
    # d = [1,2,3,4,5]: mean=3, sd=sqrt(2.5), t = 3/(sqrt(2.5)/sqrt(5)) = 4.2426
    t2, p2 = ttest_rel(np.array([1.0, 2, 3, 4, 5]) + np.array([1.0, 2, 3, 4, 5]) * 0 + np.array([1.0, 2, 3, 4, 5]), np.array([0.0, 0, 0, 0, 0]) + np.array([0.0, 0, 0, 0, 0]))
    # simpler: x - y = [1,2,3,4,5]
    t2, p2 = ttest_rel(np.array([1.0, 2, 3, 4, 5]), np.zeros(5))
    assert t2 == pytest.approx(4.2426, abs=1e-3)
    assert p2 == pytest.approx(0.0132, abs=2e-3)  # scipy.stats.ttest_rel value


def test_wilcoxon_exact_small_n():
    # 5 DISTINCT positive differences (ties would route to the normal
    # approximation, as in scipy's auto mode): W = min(T+,T-) = 0;
    # exact two-sided p = 2 * P(T <= 0) = 2/32 = 0.0625
    w, p = wilcoxon(np.array([1.1, 2.3, 3.6, 5.0, 6.5]), np.zeros(5))
    assert w == 0.0 and p == pytest.approx(0.0625)
    # one negative difference of rank 1 -> W = 1, p = 2*(2/32) = 0.125
    w2, p2 = wilcoxon(np.array([-0.5, 2.3, 3.6, 5.0, 6.5]), np.zeros(5))
    assert w2 == 1.0 and p2 == pytest.approx(0.125)


def test_wilcoxon_all_zero_raises():
    with pytest.raises(ValueError):
        wilcoxon(np.ones(5), np.ones(5))


def test_wilcoxon_normal_approx_with_ties():
    rng = np.random.RandomState(0)
    x = rng.normal(10, 2, 40).round(0)  # rounding forces ties
    y = x + rng.normal(0.5, 1, 40).round(0)
    w, p = wilcoxon(x, y)
    assert 0.0 <= p <= 1.0 and w >= 0.0


def test_bootstrap_hash_mix_is_poisson_and_decorrelated():
    """ADVICE r3 (medium): the old affine hash (rid*A + b*B) mod m
    made each row's 32 replica multiplicities a fixed stride walk —
    strongly correlated draws under the independent-resample
    assumption of the rank CI. Pure-python replica of the shipped
    xor-shift-multiply mix (the Spark/SQL twin is oracle-checked
    separately): weights must approximate Poisson(1) and consecutive
    replicas must be uncorrelated."""
    M = 73244475
    thresholds = [3679, 7358, 9197, 9810, 9963, 9994, 9999]

    def weight(rid, b):
        s = ((rid % 4294967296) * M + b * 2246822519) % 4294967296
        s = ((s ^ (s >> 16)) * M) % 4294967296
        s = ((s ^ (s >> 16)) * M) % 4294967296
        h = (s ^ (s >> 16)) % 10000
        for w, t in enumerate(thresholds):
            if h < t:
                return w
        return 7

    import math

    rids = [i * 10 + 3 for i in range(400)]
    grid = [[weight(r, b) for b in range(32)] for r in rids]
    flat = [w for row in grid for w in row]
    n = len(flat)
    # pmf check: P(0)=P(1)=e^-1≈.3679, P(2)≈.1839
    for k, p in [(0, 0.3679), (1, 0.3679), (2, 0.1839)]:
        frac = sum(1 for w in flat if w == k) / n
        assert abs(frac - p) < 0.02, (k, frac)
    # lag-1 autocorrelation across b within each rid ~ 0
    xs = [w for row in grid for w in row[:-1]]
    ys = [w for row in grid for w in row[1:]]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / len(xs)
    vx = sum((x - mx) ** 2 for x in xs) / len(xs)
    vy = sum((y - my) ** 2 for y in ys) / len(ys)
    r = cov / math.sqrt(vx * vy)
    assert abs(r) < 0.05, f"replica autocorrelation {r}"
    # the OLD affine hash fails the same check — keep it failing
    def old_weight(rid, b):
        h = ((rid * 2654435761 + b * 2246822519) % 4294967296) % 10000
        for w, t in enumerate(thresholds):
            if h < t:
                return w
        return 7

    og = [[old_weight(r, b) for b in range(32)] for r in rids]
    # stride walk: successive h differ by a constant mod 1e4 -> the
    # distribution conditional on the previous value is degenerate;
    # detect via a much larger |autocorrelation| or pmf skew
    oflat = [w for row in og for w in row]
    op0 = sum(1 for w in oflat if w == 0) / len(oflat)
    oxs = [w for row in og for w in row[:-1]]
    oys = [w for row in og for w in row[1:]]
    omx, omy = sum(oxs) / len(oxs), sum(oys) / len(oys)
    ocov = sum((x - omx) * (y - omy) for x, y in zip(oxs, oys)) / len(oxs)
    ovx = sum((x - omx) ** 2 for x in oxs) / len(oxs)
    ovy = sum((y - omy) ** 2 for y in oys) / len(oys)
    o_r = ocov / math.sqrt(ovx * ovy)
    assert abs(o_r) > abs(r) or abs(op0 - 0.3679) > 0.02, (
        "old affine hash unexpectedly passes the independence check"
    )


class TestKaplanMeier:
    def test_textbook_hand_case(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

        rows = [(1, 1), (2, 1), (2, 0), (3, 1)]
        df = spark.createDataFrame(rows, "t long, ev int")
        got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
        assert (got[1]["n_at_risk"], got[1]["d_events"]) == (4, 1)
        assert got[1]["surv_scaled"] == 750_000          # 3/4
        assert (got[2]["n_at_risk"], got[2]["c_censored"]) == (3, 1)
        assert got[2]["surv_scaled"] == 500_000          # 3/4 * 2/3
        assert got[3]["n_at_risk"] == 1
        assert got[3]["surv_scaled"] == 0                # 1/2 * 0

    def test_all_censored_flat_survival(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

        rows = [(t, 0) for t in range(1, 6)]
        df = spark.createDataFrame(rows, "t long, ev int")
        got = kaplan_meier(df, "t", "ev").collect()
        assert all(r["surv_scaled"] == 1_000_000 for r in got)

    def test_dense_tier_raises_not_corrupts(self, spark):
        """d >= 2^20 in one tier would silently collide the n*M+d
        encoding — the round-7 guard makes it an ANSI-loud error."""
        import pytest

        from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

        df = spark.range(1_048_577).selectExpr("1L AS t", "1 AS ev")
        with pytest.raises(Exception, match="d_events >= 2\\^20"):
            kaplan_meier(df, "t", "ev").collect()

    def test_monotone_nonincreasing(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import kaplan_meier

        rows = [(t % 7, t % 3 == 0) for t in range(200)]
        df = spark.createDataFrame(
            [(a, int(b)) for a, b in rows], "t long, ev int"
        )
        got = sorted(kaplan_meier(df, "t", "ev").collect(), key=lambda r: r["t"])
        vals = [r["surv_scaled"] for r in got]
        assert vals == sorted(vals, reverse=True)
        assert got[0]["n_at_risk"] == 200


class TestRansacLineFit:
    def test_recovers_planted_line(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            ransac_line_fit,
        )

        # y = 3x + 5 for 40 points, 10 wild outliers
        rows = [(x, 3 * x + 5) for x in range(1, 41)] + [
            (x, 100000 + 917 * x) for x in range(41, 51)
        ]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        r = ransac_line_fit(df, n_models=32, tol_num=0, tol_den=1).collect()[0]
        assert (r["y2"] - r["y1"]) == 3 * (r["x2"] - r["x1"])
        assert r["n_inliers"] == 40

    def test_tolerance_band_and_determinism(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            ransac_line_fit,
        )

        rows = [(x, 2 * x + (x % 3) - 1) for x in range(1, 61)]  # y = 2x +/- 1
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        tight = ransac_line_fit(df, n_models=16, tol_num=0, tol_den=1).collect()[0]
        loose = ransac_line_fit(df, n_models=16, tol_num=1, tol_den=1).collect()[0]
        assert loose["n_inliers"] >= tight["n_inliers"]
        again = ransac_line_fit(
            df.repartition(5), n_models=16, tol_num=1, tol_den=1
        ).collect()[0]
        assert again.asDict() == loose.asDict()

    def test_vertical_pairs_dropped(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import (
            ransac_line_fit,
        )

        # all x equal except two points: only non-degenerate pairs
        # may become models; the call must not error
        rows = [(5, y) for y in range(20)] + [(6, 1), (7, 2)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        out = ransac_line_fit(df, n_models=8).collect()
        assert len(out) <= 1


class TestNelsonAalen:
    def test_textbook_hazard(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import nelson_aalen

        # tiers: t=1 n=5 d=1; t=2 n=4 d=2 (1 censored leaves at t=2? no:
        # subjects: 5 total; t1: 1 event; t2: 2 events 1 censored; t3: 1 event
        rows = [(1, 1), (2, 1), (2, 1), (2, 0), (3, 1)]
        df = spark.createDataFrame(rows, "t bigint, ev int")
        got = {r["t"]: r.asDict() for r in nelson_aalen(df, "t", "ev").collect()}
        S = 10**12
        assert got[1]["n_at_risk"] == 5 and got[1]["hazard_scaled"] == S // 5
        assert got[2]["n_at_risk"] == 4
        assert got[2]["hazard_scaled"] == S // 5 + 2 * S // 4
        assert got[3]["n_at_risk"] == 1
        assert got[3]["hazard_scaled"] == S // 5 + 2 * S // 4 + S
        # monotone nondecreasing
        hs = [got[t]["hazard_scaled"] for t in sorted(got)]
        assert hs == sorted(hs)

    def test_dense_tier_no_int64_overflow(self, spark):
        """The naive d*scale product aborts (ANSI) past ~9.2e6 events
        in one tier; the round-7 Euclidean-split term must stay exact
        there: d = n = 10^7 -> hazard exactly = scale."""
        from dpe_energy_performance_analysis_etl_spark.operators.stats import nelson_aalen

        df = spark.range(10_000_000).selectExpr("1L AS t", "1 AS ev")
        got = nelson_aalen(df, "t", "ev").collect()
        assert len(got) == 1
        assert got[0]["n_at_risk"] == 10_000_000
        assert got[0]["hazard_scaled"] == 10**12


class TestConformalQhat:
    def test_hand_case_and_coverage_bound(self, spark):
        """20 calibration scores 1..20, alpha=0.1: k = ceil(21*0.9)
        = 19 -> qhat = 19; at least 90% of exchangeable points fall
        within by construction."""
        from dpe_energy_performance_analysis_etl_spark.operators.stats import conformal_qhat

        rows = [("g", float(i)) for i in range(1, 21)]
        df = spark.createDataFrame(rows, "g string, s double")
        got = conformal_qhat(df, "g", "s", alpha_num=1, alpha_den=10).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["n_cal"], r["k"], r["qhat"]) == (20, 19, 19.0)

    def test_too_small_group_returns_null(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import conformal_qhat

        df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "g string, s double")
        got = conformal_qhat(df, "g", "s", alpha_num=1, alpha_den=10).collect()
        # k = ceil(3 * 0.9) = 3 > n_cal = 2 -> no certifiable radius
        assert got[0]["k"] == 3 and got[0]["qhat"] is None


class TestMannWhitneyU:
    def test_hand_case_with_ties(self, spark):
        """x=[1,2,3] vs y=[2,3,4]: mid-ranks 1, 2.5, 2.5, 4.5, 4.5, 6
        -> R1=8, U1=2, U2=7 (doubled: 4 and 14)."""
        from dpe_energy_performance_analysis_etl_spark.operators.stats import mann_whitney_u

        rows = [("g", True, 1), ("g", True, 2), ("g", True, 3),
                ("g", False, 2), ("g", False, 3), ("g", False, 4)]
        df = spark.createDataFrame(rows, "g string, s boolean, v long")
        r = mann_whitney_u(df, "g", "s", "v").collect()[0]
        assert (r["n1"], r["n2"]) == (3, 3)
        assert (r["u1_x2"], r["u2_x2"]) == (4, 14)
        # z = (U1 - n1n2/2)/sqrt(n1n2(n+1)/12) = (2-4.5)/sqrt(5.25)
        import math
        assert abs(r["z"] - (2 - 4.5) / math.sqrt(9 * 7 / 12)) < 1e-12

    def test_identical_distributions_z_near_zero(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import mann_whitney_u

        rows = [("g", i % 2 == 0, i % 37) for i in range(2000)]
        df = spark.createDataFrame(rows, "g string, s boolean, v long")
        r = mann_whitney_u(df, "g", "s", "v").collect()[0]
        assert abs(r["z"]) < 1.0

    def test_empty_side_null_z(self, spark):
        from dpe_energy_performance_analysis_etl_spark.operators.stats import mann_whitney_u

        df = spark.createDataFrame([("g", True, 1), ("g", True, 2)], "g string, s boolean, v long")
        r = mann_whitney_u(df, "g", "s", "v").collect()[0]
        assert r["z"] is None and r["n2"] == 0


class TestConcentrationFormulas:
    def test_gini_hhi_against_python_reference(self, spark):
        """The tie-block identity 2*sum(i*x_i) = sum_v v*(2*cnt*before
        + cnt^2 + cnt) must reproduce the textbook sorted-rank Gini,
        and HHI the share-square sum — checked on a skewed fixture
        via the same query pipeline on a tiny DataFrame."""
        import itertools

        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
            grouped_running_totals,
        )

        xs = [10, 10, 20, 500, 40, 10, 900, 20]
        n, S = len(xs), sum(xs)
        sx = sorted(xs)
        gini = ((2 * sum(i * x for i, x in enumerate(sx, 1)) - (n + 1) * S)
                * 10**6) // (n * S)
        hhi = (sum(x * x for x in xs) * 10**6) // (S * S)

        df = spark.createDataFrame([("g", x) for x in xs], "g string, r long")
        vals = df.groupBy("g", "r").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        pre = grouped_running_totals(vals, "g", "r", ["cnt"])
        dec = lambda c: F.col(c).cast("decimal(38,0)")
        agg = pre.groupBy("g").agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum(F.col("r") * F.col("cnt")).cast("bigint").alias("s_tot"),
            F.sum(dec("r") * dec("r") * dec("cnt")).alias("sum_r2"),
            F.sum(dec("r") * (2 * dec("cnt") * dec("cnt_before")
                              + dec("cnt") * dec("cnt") + dec("cnt"))).alias("two_sum_ix"),
        )
        row = agg.selectExpr(
            "CAST((two_sum_ix - CAST(n + 1 AS DECIMAL(38,0)) * CAST(s_tot AS DECIMAL(38,0)))"
            " * 1000000 div (CAST(n AS DECIMAL(38,0)) * CAST(s_tot AS DECIMAL(38,0))) AS BIGINT) AS g",
            "CAST(sum_r2 * 1000000 div (CAST(s_tot AS DECIMAL(38,0)) * CAST(s_tot AS DECIMAL(38,0))) AS BIGINT) AS h",
        ).collect()[0]
        assert row["g"] == gini
        assert row["h"] == hhi

    def test_gini_extremes(self, spark):
        """All-equal -> 0; one-holder -> (n-1)/n."""
        from pyspark.sql import functions as F

        from dpe_energy_performance_analysis_etl_spark.plans.queries import (
            concentration_supplier_nations_q,  # noqa: F401  (import sanity)
        )
        # formula-level check in python ints
        for xs, expect in [([5, 5, 5, 5], 0), ([0, 0, 0, 100], 750000)]:
            n, S = len(xs), sum(xs)
            sx = sorted(xs)
            g = ((2 * sum(i * x for i, x in enumerate(sx, 1)) - (n + 1) * S)
                 * 10**6) // (n * S)
            assert g == expect
