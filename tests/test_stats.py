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
