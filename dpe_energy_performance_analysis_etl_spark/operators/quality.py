"""Zero-extra-pass data-quality gates via Spark's Observation API.

The reference's pipeline gates are driver-side counts: non-empty
checks (``extract.py:430-432,452-454,496-498``; ``load.py:77-82``)
and shape logging (``extract.py:404,415``) — every one an extra
``df.count()`` job over the full input. ``observe`` attaches
aggregate metrics to a DataFrame that are collected AS A SIDE EFFECT
of whatever action materializes it: the gate costs nothing at 100 TB
because the data was flowing through that stage anyway.

Usage:
    gated, obs = observed(df, rows=F.count(F.lit(1)),
                          null_keys=F.count_if(F.col("k").isNull()))
    gated.write.parquet(...)            # the real action
    assert_metrics(obs, {"rows": (1, None), "null_keys": (None, 0)})
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observed(df: DataFrame, **metrics: F.Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; returns the observed
    frame (use it in place of ``df``) and the Observation handle
    whose ``.get`` blocks until the first action completes."""
    obs = Observation()
    named = [expr.alias(name) for name, expr in metrics.items()]
    return df.observe(obs, *named), obs


def assert_metrics(
    obs: Observation, bounds: dict[str, tuple[float | None, float | None]]
) -> dict[str, float]:
    """Check observed metrics against inclusive (lo, hi) bounds
    (None = unbounded). Raises ValueError naming every violated
    bound; returns the metric values otherwise."""
    got = obs.get
    errors = []
    for name, (lo, hi) in bounds.items():
        if name not in got:
            errors.append(f"{name}: metric not observed")
            continue
        v = got[name]
        if lo is not None and v < lo:
            errors.append(f"{name}={v} below minimum {lo}")
        if hi is not None and v > hi:
            errors.append(f"{name}={v} above maximum {hi}")
    if errors:
        raise ValueError("quality gate failed: " + "; ".join(errors))
    return {k: got[k] for k in bounds}


def non_empty_gate(df: DataFrame) -> tuple[DataFrame, Observation]:
    """The reference's is-empty check as a free-rider metric."""
    return observed(df, rows=F.count(F.lit(1)))
