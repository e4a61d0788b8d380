"""One-pass pairwise Pearson correlation matrix with exact integer
moment sums.

Profiling d numeric columns over 100 TB must not become d² scans (or
worse, d² shuffles): all d·(d+3)/2 moment sums — Σx̂ᵢ, Σx̂ᵢx̂ⱼ, n — fit
in ONE full-scan aggregate whose partials combine map-side, so the
whole matrix costs exactly one pass and one single-row exchange. The
correlation is then assembled from that one row in the plan (explode
of a literal-shaped array — no driver round-trip).

Determinism/portability: Pearson r is invariant under the affine map
x → x·10^s, so each column is converted to its exact scaled-integer
form (``operators.exact.scaled_long`` — inputs with ≤ s true decimal
places convert exactly). The moment sums are then bigint additions —
associative, partition-order-independent, bit-identical on any
engine — and the final r = (n·Sxy − SxSy) / (√(n·Sxx − Sx²)·√(n·Syy −
Sy²)) is a FIXED sequence of IEEE double ops (mult/sub/sqrt/div are
all correctly rounded), so the oracle hash-matches. The bigint→double
casts are exact while the moment sums stay under 2^53 — the same
envelope every exact-sum oracle in this repo documents; beyond it,
the sums remain exact and only the last ulp of r is engine-specific.

Reference analogue: the reference's pandas ``.corr()`` over its gold
frame (single-node, float accumulation, order-dependent); this is the
scale-safe deterministic form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.exact import scaled_long


def correlation_matrix(
    df: DataFrame, cols: dict[str, int] | list[str]
) -> DataFrame:
    """Pairwise Pearson r for the given columns → (col_a, col_b, n,
    corr) for every pair col_a < col_b. ``cols`` maps column → true
    decimal scale (list form assumes integers, scale 0). Rows with a
    NULL in ANY profiled column are excluded (pandas ``.corr``
    pairwise-complete differs — document the difference, don't hide
    it)."""
    scales = {c: 0 for c in cols} if isinstance(cols, list) else dict(cols)
    names = sorted(scales)
    clean = df.na.drop(subset=names)
    hatted = clean.select(
        *[scaled_long(c, scales[c]).alias(c) for c in names]
    )

    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(names):
        aggs.append(F.sum(F.col(a)).alias(f"s_{a}"))
        for b in names[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    moments = hatted.agg(*aggs)

    nn = F.col("n").cast("double")

    def _var(c: str) -> F.Column:
        s = F.col(f"s_{c}").cast("double")
        return nn * F.col(f"s_{c}_{c}").cast("double") - s * s

    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cov = nn * F.col(f"s_{a}_{b}").cast("double") - F.col(
                f"s_{a}"
            ).cast("double") * F.col(f"s_{b}").cast("double")
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n").alias("n"),
                    (cov / (F.sqrt(_var(a)) * F.sqrt(_var(b)))).alias("corr"),
                )
            )
    return moments.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.n", "p.corr"
    )
