"""Training-mix construction: temperature-scaled source sampling and
PII pseudonymization.

``temperature_mixture_sample`` implements the standard multilingual /
multi-source rebalancing recipe (public practice: mBERT/XLM-R
exponentiated-smoothing, T5 §3.4.3 temperature mixing): small sources
are kept whole while large sources are downsampled toward
``(min_count / count)^(1/T)``. With T = 2 the exponent is 0.5 — an
exact IEEE ``sqrt`` — so the keep rates (and therefore the sampled
set, via the deterministic key hash) are bit-reproducible across
engines; other temperatures go through ``pow`` (libm, ~1-ulp
engine-dependent) and are engine-internal only.

``pseudonymize`` is the privacy step every shared training corpus
needs: replace direct identifiers with a deterministic salted sha256
so joins/dedup still work on the pseudonym but the raw value is gone.

Scale: per-source counts are one tiny aggregation broadcast back;
the keep decision and hashing are row-local expressions — no extra
shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.text.curation import _RATE_DENOM, sampling_hash


def temperature_rates(
    df: DataFrame, strata_col: str = "source", temperature: float = 2.0
) -> DataFrame:
    """Per-stratum keep rates ``(min_count / count)^(1/T)`` as a tiny
    DataFrame (strata_col, n_rows, keep_rate). T=1 equalizes source
    sizes exactly; T→∞ keeps the natural distribution; T=2 (default)
    is the common compromise — and the only value whose exponent is
    IEEE-exact (sqrt)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive: {temperature}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    min_n = counts.agg(F.min("n_rows").alias("m"))
    ratio = F.col("n_rows").cast("double")
    base = F.col("m").cast("double") / ratio
    if temperature == 2.0:
        rate = F.sqrt(base)
    else:
        rate = F.pow(base, 1.0 / temperature)
    return counts.crossJoin(F.broadcast(min_n)).select(
        strata_col, "n_rows", rate.alias("keep_rate")
    )


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    temperature: float = 2.0,
) -> DataFrame:
    """Deterministically sample ``df`` to the temperature-scaled mix:
    keep row iff ``sampling_hash(key) < keep_rate(stratum) * 10000``.
    The smallest stratum is kept whole; a stratum 4x larger is kept at
    50% (T=2). Join with the per-stratum rate table is a broadcast of
    #strata rows; the decision is row-local."""
    rates = temperature_rates(df, strata_col=strata_col, temperature=temperature)
    return (
        df.join(F.broadcast(rates.select(strata_col, "keep_rate")), on=strata_col)
        .where(
            sampling_hash(F.col(key_col)).cast("double")
            < F.col("keep_rate") * F.lit(float(_RATE_DENOM))
        )
        .drop("keep_rate")
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    suffix: str = "_pseud",
    drop_original: bool = True,
) -> DataFrame:
    """Replace identifier columns with deterministic salted sha256
    hex digests. Same input + same salt → same pseudonym, so equality
    joins and dedup keep working across tables pseudonymized with the
    same salt; without the salt the mapping is not invertible by
    rainbow table. Row-local, codegen'd (JVM sha2), zero shuffle."""
    if not salt:
        raise ValueError("salt must be non-empty")
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string")), 256),
        )
        if drop_original:
            out = out.drop(c)
    return out
