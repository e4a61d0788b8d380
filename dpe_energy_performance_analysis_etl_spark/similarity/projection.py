"""Random-projection embedding compression (Johnson-Lindenstrauss):
project d-dim vectors onto a seedless deterministic Rademacher (+-1)
basis — the standard cheap dimensionality reduction in front of ANN
indexes and dedup sketches (Achlioptas 2003: +-1 entries preserve JL
guarantees; no Gaussian sampling needed).

Exactness contract (same discipline as the rest of the repo): the
sign matrix is a pure integer formula of (i, j) — no RNG state to
ship — and each output coordinate is a SEQUENTIAL left fold over the
input array (``F.aggregate``), so the double summation order is
fixed and identical in any engine; IEEE sqrt is correctly rounded by
spec, so the 1/sqrt(d_out) scaling is exact too. A groupBy-sum
formulation would be shuffle-order-nondeterministic in the last ulp.

Plan shape: entirely row-local column expressions — ZERO shuffle at
any scale; a 100 TB embedding table projects at scan speed. The HOF
fold is interpreted (measured pitfall #2), costing ~d_in*d_out lambda
evals per row — for hot paths where the last ulp does not matter, a
Pandas-UDF matmul does the same thing ~10x faster; this operator is
the reproducible twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

KNUTH = 2654435761
J_STRIDE = 40503


def rademacher_sign(i: Column, j: int) -> Column:
    """+-1.0 from the fixed integer formula ((i*KNUTH + j*STRIDE) % 2)."""
    parity = (i * F.lit(KNUTH) + F.lit(j * J_STRIDE)) % 2
    return F.when(parity == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _coord(vec: Column, d_in: int, j: int) -> Column:
    """Projected coordinate j: ordered fold of v[i] * sign(i, j)."""
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(d_in - 1)),
        lambda i: F.element_at(vec, i + 1).cast("double") * rademacher_sign(i, j),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def project_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    d_in: int = 64,
    d_out: int = 8,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``p_0..p_{d_out-1}`` projected coordinates (scaled by
    1/sqrt(d_out)) and ``norm_ratio`` = |p|^2 / |v|^2 — the JL
    distortion diagnostic (concentrates near 1 as d_out grows)."""
    vec = F.col(vec_col)
    scale = F.sqrt(F.lit(float(d_out)))
    proj = [(_coord(vec, d_in, j) / scale).alias(f"p_{j}") for j in range(d_out)]
    orig_sq = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(d_in - 1)),
            lambda i: F.element_at(vec, i + 1).cast("double")
            * F.element_at(vec, i + 1).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    keep = id_cols if id_cols is not None else [c for c in df.columns if c != vec_col]
    out = df.select(*keep, *proj, orig_sq.alias("__orig_sq"))
    proj_sq = F.lit(0.0)
    for j in range(d_out):
        proj_sq = proj_sq + F.col(f"p_{j}") * F.col(f"p_{j}")
    return out.withColumn(
        "norm_ratio",
        F.when(F.col("__orig_sq") > 0, proj_sq / F.col("__orig_sq")).otherwise(F.lit(0.0)),
    ).drop("__orig_sq")
