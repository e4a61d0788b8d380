"""MinHash + banded LSH near-duplicate detection.

Pipeline (all DataFrame ops, no driver loops):
  shingle → per-permutation min-hash signature → split signature into
  b bands of r rows → hash each band → self-join on (band, hash) for
  candidates → verify candidates with exact Jaccard.

Scale shape: candidate generation is an equi-join on band hashes
(uniform keys), so the shuffle volume is O(docs × bands), never
O(docs²). Verification touches only candidate pairs. This is the
100 TB path; the exact pairwise operator in ``shingles.py`` is the
small-scale baseline it's validated against (tests assert LSH recall
on known-similar pairs).

Hash family: h_i(s) = (a_i * x + b_i) mod p with x = xxhash64(s) mod p,
p = 2^31-1 (Mersenne), and (a_i, b_i) from a fixed seeded generator —
deterministic across runs and cluster sizes. p is 31-bit so a_i * x
stays below 2^62 and never overflows Spark's ANSI-checked long
arithmetic. xxhash64 is Spark-native (codegen'd); there is
deliberately no Python in the row path.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

from dpe_energy_performance_analysis_etl_spark.operators.scaling import scan_fanout

from dpe_energy_performance_analysis_etl_spark.dedup.shingles import word_shingles

_MERSENNE_P = (1 << 31) - 1


def _hash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P)) for _ in range(num_perm)]


def rolling_shingle_hash(shingle_col) -> F.Column:
    """Portable shingle hash: polynomial rolling hash (base 131) mod
    the Mersenne prime, SQL-expressible in any engine with a list
    reduction (DuckDB ``list_reduce``). Slower than xxhash64 (the hot
    path) — used by the oracle-checked portable LSH variant so the
    WHOLE minhash+banding pipeline can be replayed bit-exactly in
    another engine."""
    chars = F.regexp_extract_all(shingle_col, F.lit("."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 131 + F.ascii(ch)) % _MERSENNE_P,
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    fanout: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """(doc, shingles array<string>, signature array<bigint>[num_perm]).

    Plan shape: explode shingles → xxhash64 ONCE per shingle → one
    hash-aggregate with num_perm ``min((a_i*x+b_i) mod p)`` columns
    (whole-stage-codegen'd; a HOF-lambda fold was ~10× slower because
    higher-order functions are interpreted and re-hash per lane) +
    ``collect_set`` keeping the shingle set for later verification.
    One uniform-key shuffle total."""
    params = _hash_params(num_perm, seed)
    if fanout is None:
        fanout = df.sparkSession.sparkContext.defaultParallelism
    tok = scan_fanout(df, fanout).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    )
    if portable:
        tok = tok.withColumn("x", rolling_shingle_hash(F.col("shingle")))
    else:
        # hash once: the 64-bit value feeds the permutations (mod p) AND
        # replaces the string in the verification set — the cached
        # signature frame carries array<long> instead of array<string>
        # (~3× smaller, cheaper set-intersect; exact up to collisions).
        tok = tok.withColumn("shingle", F.xxhash64("shingle")).withColumn(
            "x", F.pmod("shingle", F.lit(_MERSENNE_P))
        )
    sigs = tok.groupBy("doc").agg(
        F.collect_set("shingle").alias("shingles"),
        *[
            F.min(F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(_MERSENNE_P))).alias(f"__h{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    return sigs.select(
        "doc",
        "shingles",
        F.array(*[F.col(f"__h{i}") for i in range(num_perm)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.2,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs via banded LSH, verified with exact Jaccard.
    Returns (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard ≥ threshold.

    b bands × r = num_perm/b rows tunes the S-curve: candidate
    probability at similarity s is 1-(1-s^r)^b.

    ``portable=True`` swaps both engine-specific hashes for
    SQL-expressible ones (rolling shingle hash; band key = the plain
    comma-joined signature slice instead of its xxhash64) so an
    external engine can replay the IDENTICAL pipeline — the
    oracle-checked correctness twin of the fast path.
    """
    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm, "num_perm must be divisible by bands"
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed, portable=portable)

    def band_key(i: int) -> F.Column:
        joined = F.concat_ws(
            ",",
            *[
                F.element_at("signature", i * rows_per_band + j + 1).cast("string")
                for j in range(rows_per_band)
            ],
        )
        return joined if portable else F.xxhash64(joined)

    band_structs = F.array(
        *[
            F.struct(F.lit(i).alias("band"), band_key(i).alias("band_hash"))
            for i in range(bands)
        ]
    )
    # materialize signatures once: the candidate self-join reads the
    # band table twice and the verification re-reads the shingle sets.
    # The band table carries ONLY (doc, band, band_hash) — shipping the
    # shingle arrays through the bands explode ×bands was the dominant
    # shuffle cost; candidates are few, so the sets join back cheaply.
    sigs = sigs.cache()
    banded = sigs.select("doc", F.explode(band_structs).alias("bh")).select(
        "doc", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, on=["band", "band_hash"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets = sigs.select("doc", "shingles")
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = candidates.join(sa, on="doc_a").join(sb, on="doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        verified.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
