"""Bloom-filter join pruning — the runtime-filter play, made explicit.

At 100 TB the dominant cost of ``fact JOIN dim-subset`` is shuffling
fact rows that can never match: a selective dim-side predicate keeps
1% of keys, but every fact row still crosses the wire before the join
discards it. The fix every large engine ships (Spark's own
``spark.sql.optimizer.runtime.bloomFilter``, Trino/Presto dynamic
filtering) is to build a Bloom filter over the surviving build-side
keys and drop non-matching probe rows BEFORE the exchange. This
module makes that pattern an explicit, composable operator — usable
when the automatic version doesn't fire (multi-stage plans, cached
inputs, pre-aggregated build sides, Python-assembled joins) and
reusable as a persistable artifact (a filter built today prunes
tomorrow's incremental loads).

Design:

- The filter state is a plain bitset DataFrame — 64-bit words keyed
  by word index, values OR-combined (``bit_or``). Bounded by
  ``n_bits/64`` rows regardless of build-side cardinality, and a
  monoid under bitwise OR (``bloom_merge``): partial filters from any
  partitioning/batching combine associatively, the same contract as
  the sketches in ``operators/sketch.py``. Build cost is one scan of
  the dim side + a bounded-key shuffle with map-side partial ORs.
- Probing injects the packed bitset as an array<long> LITERAL —
  exactly how Spark's runtime bloom filter and dynamic partition
  pruning ship their build-side state (the driver materializes a
  bounded aggregate and re-plans). The driver pull is the sketch,
  never data: ≤ n_bits/8 bytes (128 KiB at the default 2^20 bits).
  The probe itself is ``element_at``/shift/AND integer arithmetic on
  that literal — whole-stage codegen, no Python, no extra join.
- ``k`` probe positions come from double hashing
  (Kirsch–Mitzenmacher 2006): pos_i = h1 + i·h2 mod m, h1/h2 from two
  seeded ``xxhash64`` evaluations shifted into 31 bits (sums stay far
  inside int64 — Spark 4 ANSI mode aborts on overflow, so the
  arithmetic must be provably bounded). h2 is forced odd so the k
  positions never collapse when m is a power of two.

Correctness contract: no false negatives — every true match passes —
so ``bloom_prefilter → join`` ≡ ``join``; the oracle for the query
entry is the plain SQL join. False positives only cost shuffle bytes,
at the usual ``(1 - e^{-kn/m})^k`` rate (~2% at 8 bits/key, k=6).

Sizing at scale: bits ≈ 8–10 × expected surviving keys. 100 M dim
keys → a 100–128 MB filter: still a broadcast-class payload, versus
re-shuffling a multi-TB fact table that is 99% non-matching.

Reference parity: the reference joins its enriched frame against
address/DPE lookups eagerly in pandas
(src/dpe_enedis_ademe_etl_engine/pipelines/transform.py:154-210) —
at single-node scale pruning is moot; this operator is the scale path
for the same join shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Distinct seeds give two independent 64-bit streams for the
# Kirsch-Mitzenmacher construction.
_SEED_H1 = 0x9E3779B1
_SEED_H2 = 0x85EBCA77


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """k probe bit-positions for a key. 31-bit h1/h2 keep every
    intermediate sum < 2^35 (ANSI-safe)."""
    h1 = F.shiftrightunsigned(F.xxhash64(key, F.lit(_SEED_H1)), 33)
    h2 = F.shiftrightunsigned(F.xxhash64(key, F.lit(_SEED_H2)), 33).bitwiseOR(
        F.lit(1)
    )
    return [((h1 + F.lit(i) * h2) % F.lit(n_bits)) for i in range(k)]


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` — the pyspark ``shiftleft`` wrapper only
    takes a Python-int shift, so the column-valued shift goes through
    ``call_function`` (same JVM expression, still codegen)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_build(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 20, k: int = 6
) -> DataFrame:
    """Build the filter over ``dim[key_col]`` → (word: long, bits:
    long), at most ``n_bits/64`` rows. One bounded-key shuffle; the
    heavy OR-ing happens map-side inside codegen."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias("pos")
    words = dim.select(pos).select(
        F.floor(F.col("pos") / 64).alias("word"),
        _bit_mask(F.col("pos")).alias("mask"),
    )
    return words.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_merge(f1: DataFrame, f2: DataFrame) -> DataFrame:
    """OR-combine two filters built with identical (n_bits, k): the
    exact filter of the union — per-batch/per-day filters roll up."""
    u = f1.unionByName(f2)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def packed_bitset(bloom: DataFrame, n_bits: int) -> DataFrame:
    """ONE row holding the dense bitset as array<long> (missing words
    zero-filled): a range-join against the word index, then one
    sorted collect_list. Fully lazy — no driver action, no literal.

    This replaced a packed-LITERAL design that was measured 78x
    slower than the plain join it was supposed to beat: a Python-list
    ``F.lit`` becomes one Literal EXPRESSION PER ELEMENT, so a 2^20-bit
    filter injected 6 x 16384 expressions into codegen and every probe
    recompiled a megabyte of generated code. An array COLUMN riding a
    single-row broadcast keeps the probe at six O(1) ``element_at``
    calls whatever the filter size."""
    n_words = (n_bits + 63) // 64
    idx = bloom.sparkSession.range(n_words).select(F.col("id").alias("word"))
    dense = idx.join(bloom, on="word", how="left").select(
        "word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "bits"))),
            lambda s: s["bits"],
        ).alias("__bloom_words")
    )


def packed_words(bloom: DataFrame, n_bits: int) -> list[int]:
    """Driver-side dense word list (tests / persistence); the join
    path itself stays lazy via ``packed_bitset``."""
    row = packed_bitset(bloom, n_bits).collect()[0]
    return [int(w) for w in row["__bloom_words"]]


def might_contain(key: Column, words_col: Column, n_bits: int, k: int) -> Column:
    """Membership test against the packed array column: all k probe
    bits set — six O(1) ``element_at`` + shift/AND, codegen-only."""
    cond = F.lit(True)
    for pos in _positions(key, n_bits, k):
        word = F.element_at(words_col, F.floor(pos / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(pos)) != 0)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 20,
    k: int = 6,
) -> DataFrame:
    """Rows of ``fact`` whose key MIGHT appear in ``dim[dim_key]`` — a
    superset of the semi-join (no false negatives), evaluated before
    any fact-side shuffle. The packed bitset rides a single-row
    broadcast crossJoin: the fact side sees a scan-adjacent filter,
    never an exchange, and the whole plan stays lazy."""
    dim_key = dim_key or fact_key
    packed = packed_bitset(bloom_build(dim, dim_key, n_bits, k), n_bits)
    return (
        fact.crossJoin(F.broadcast(packed))
        .filter(might_contain(F.col(fact_key), F.col("__bloom_words"), n_bits, k))
        .drop("__bloom_words")
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 20,
    k: int = 6,
    how: str = "inner",
) -> DataFrame:
    """``fact JOIN dim`` with the fact side bloom-pruned first. Exact:
    the filter passes every true match and the join removes the
    bounded-rate false positives. Only inner/semi are eligible — an
    outer join must keep non-matching fact rows."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom pruning would change '{how}' join results")
    dim_key = dim_key or fact_key
    pruned = bloom_prefilter(fact, dim, fact_key, dim_key, n_bits, k)
    return pruned.join(dim, on=pruned[fact_key] == dim[dim_key], how=how)
