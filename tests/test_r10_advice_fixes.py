"""R10 ADVICE-fix pins: input validation raises clearly (not a
cryptic generated-SQL parse error) and the ch_ppm sign-factoring
stays in place."""

import re

import pytest

from dpe_energy_performance_analysis_etl_spark.operators.stats import (
    jonckheere_pairwise_u,
    kendall_tau_b_bounded,
)


def test_kendall_tau_b_rejects_short_domain():
    with pytest.raises(ValueError, match="x_values"):
        kendall_tau_b_bounded(None, "g", "x", "y", x_values=[1])
    with pytest.raises(ValueError, match="x_values"):
        kendall_tau_b_bounded(None, "g", "x", "y", x_values=[])


def test_jonckheere_rejects_short_samples():
    with pytest.raises(ValueError, match="samples"):
        jonckheere_pairwise_u(None, "g", "s", "v", samples=["only"])
    with pytest.raises(ValueError, match="samples"):
        jonckheere_pairwise_u(None, "g", "s", "v", samples=[])


def test_ch_ppm_sign_factored():
    """The truncating division in ch_ppm must not see a negative
    dividend (engine floor/trunc divergence class — ADVICE r9); the
    sign is factored out as in mean_silhouette_ppm."""
    import inspect

    from dpe_energy_performance_analysis_etl_spark.operators import ml

    src = inspect.getsource(ml.kmeans_validity_indices)
    # the guarded form: sign CASE times abs(...) div (...)
    assert re.search(r"THEN 1 ELSE -1 END", src)
    assert "abs(tn2 - CAST(w AS DECIMAL(38,0)) * n)" in src.replace(
        '"\n            " ', ""
    ).replace('"\n            "', "")
