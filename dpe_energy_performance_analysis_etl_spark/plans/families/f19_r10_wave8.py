"""Round 10, wave 8: pipeline self-audit families — tokenizer
fertility by source, HLL estimate-vs-exact error, histogram-quantile
sketch error. Estimator AUDITS are first-class operators at 100 TB:
a sketch you cannot measure against truth at small scale is a sketch
you cannot trust at large scale."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401
    DataFrame,
    SparkSession,
    Window,
    F,
    QUERIES,
    ORACLE_SQL,
    register,
    read_documents,
)


# =====================================================================
# Round 10, wave 8: tokenizer fertility, HLL error, quantile error
# =====================================================================

@register(
    "tokenizer_fertility_sources",
    """
    WITH per_doc AS MATERIALIZED (
      SELECT source,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text),
                  '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\\S')) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_words) AS BIGINT) AS words,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CASE WHEN SUM(n_words) > 0 THEN CAST(
             (SUM(n_tokens)::HUGEINT * 1000000) // SUM(n_words) AS BIGINT)
           END AS fertility_ppm,
           CASE WHEN SUM(n_tokens) > 0 THEN CAST(
             (SUM(n_chars)::HUGEINT * 1000) // SUM(n_tokens) AS BIGINT)
           END AS chars_per_token_milli
    FROM per_doc GROUP BY 1 ORDER BY source
    """,
)
def tokenizer_fertility_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility profile per source (the SentencePiece
    paper's fertility = subword tokens per word; Rust et al. ACL'21
    use it to compare tokenizer quality across corpora): the BPE-ish
    pre-tokenizer (alnum runs + single non-space punct, the CLAUDE.md
    token-counting regex) measured against whitespace words and
    non-space chars — the per-SOURCE efficiency view that decides
    which corpus slices burn context budget
    (``token_counts`` is the per-document counter; this is the
    mixture-level audit).

    Exactness: pure integer counts from one scan; two truncating
    divisions per source (non-negative).

    Scale shape: one corpus scan with per-row regexp counts folded
    into a ≤|sources| aggregation — zero shuffle beyond the group."""
    docs = read_documents(spark, sf_dir)
    per_doc = docs.select(
        "source",
        F.expr("CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT)")
        .alias("n_words"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text),"
            " '[a-z0-9]+|[^a-z0-9\\\\s]', 0)) AS BIGINT)"
        ).alias("n_tokens"),
        F.expr("CAST(size(regexp_extract_all(text, '\\\\S', 0)) AS BIGINT)")
        .alias("n_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("n_words").cast("bigint").alias("words"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .selectExpr(
            "source",
            "words",
            "tokens",
            "chars",
            "CASE WHEN words > 0 THEN CAST("
            " (CAST(tokens AS DECIMAL(38,0)) * 1000000) div words AS BIGINT)"
            " END AS fertility_ppm",
            "CASE WHEN tokens > 0 THEN CAST("
            " (CAST(chars AS DECIMAL(38,0)) * 1000) div tokens AS BIGINT)"
            " END AS chars_per_token_milli",
        )
        .orderBy("source")
    )


@register(
    "hll_error_audit_tokens",
    """
    WITH toks AS MATERIALIZED (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), exact AS MATERIALIZED (
      SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
      FROM toks GROUP BY 1
    ), items AS MATERIALIZED (
      SELECT source, rpad(tok, 16, '#') AS s FROM toks
    ), h AS MATERIALIZED (
      SELECT source,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(s, '.'),
                               c -> CAST(ascii(c) AS BIGINT))),
                (acc, c) -> (acc * 131 + c) % 2147483647) AS h0
      FROM items
    ), mx AS MATERIALIZED (
      SELECT source, xor(s1, s1 >> 16) AS h32 FROM (
        SELECT source, (xor(h0, h0 >> 16) * 73244475) % 4294967296 AS s1
        FROM h)
    ), br AS MATERIALIZED (
      SELECT source, h32 % 64 AS b,
             CASE WHEN h32 // 64 = 0 THEN 27
                  ELSE 27 - length(bin(h32 // 64)) END AS rho
      FROM mx
    ), regs AS MATERIALIZED (
      SELECT source, b, MAX(rho) AS mreg FROM br GROUP BY 1, 2
    ), est AS MATERIALIZED (
      SELECT source,
             CAST(SUM(1 << (27 - mreg)) AS BIGINT) AS register_sum_x2p,
             (7.0937e-1 * 4096) /
               (SUM(1.0e0 / CAST(1 << mreg AS DOUBLE))
                + CAST(64 - COUNT(*) AS DOUBLE)) AS hll_estimate
      FROM regs GROUP BY 1
    )
    SELECT exact.source, exact.exact_distinct, est.register_sum_x2p,
           CASE WHEN exact.exact_distinct > 0 THEN CAST(floor(
             (est.hll_estimate / CAST(exact.exact_distinct AS DOUBLE) - 1e0)
             * 1000e0) AS BIGINT) END AS err_milli
    FROM exact JOIN est ON exact.source = est.source
    ORDER BY exact.source
    """,
)
def hll_error_audit_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-truth audit for the portable HyperLogLog
    (operators/sketch.py hll_portable): per source, the exact
    distinct-token count next to the 64-register HLL estimate and
    its signed relative error — the calibration gate that tells you
    whether the 13%-RSE regime documented on the sketch actually
    holds on YOUR data before you trust it at 100 TB (where exact
    distinct is a full shuffle and the sketch is mergeable state).

    Determinism: the register fingerprint is integer; the estimate
    is the documented exact-dyadic-sum double; err_milli is the
    double-floor class. Exact distinct rides a (source, token)
    distinct aggregation.

    Scale shape: one tokenization feeding the exact-distinct
    aggregation and the fixed-64-register sketch (map-side
    combinable); the audit join is |sources| rows."""
    from dpe_energy_performance_analysis_etl_spark.operators.sketch import (
        hll_portable,
    )

    docs = read_documents(spark, sf_dir)
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    ).cache()  # feeds the exact distinct AND the sketch
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").cast("bigint").alias("exact_distinct")
    )
    est = hll_portable(toks, "tok", by="source").select(
        "source", "register_sum_x2p", "hll_estimate"
    )
    return (
        exact.join(est, "source")
        .selectExpr(
            "source",
            "exact_distinct",
            "register_sum_x2p",
            "CASE WHEN exact_distinct > 0 THEN CAST(floor("
            " (hll_estimate / CAST(exact_distinct AS DOUBLE) - 1e0)"
            " * 1000e0) AS BIGINT) END AS err_milli",
        )
        .orderBy("source")
    )


@register(
    "quantile_sketch_error_audit",
    """
    WITH vals AS MATERIALIZED (
      SELECT l_extendedprice AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ), b AS MATERIALIZED (
      SELECT CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi
      FROM vals
    ), hist AS MATERIALIZED (
      SELECT least(greatest(CAST(floor((v - lo) / ((hi - lo) / 1024))
               AS BIGINT), 0), 1023) AS bucket,
             lo, (hi - lo) / 1024 AS width, CAST(count(*) AS BIGINT) AS cnt
      FROM vals CROSS JOIN b
      GROUP BY 1, 2, 3
    ), cum AS MATERIALIZED (
      SELECT bucket, lo, width, cnt,
             CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
             CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS n
      FROM hist
    ), hit AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, greatest(CAST(ceil(5.0e-1 * n) AS BIGINT), 1) AS target,
               row_number() OVER (
                 ORDER BY CASE WHEN cum >= greatest(CAST(ceil(5.0e-1 * n)
                   AS BIGINT), 1) THEN 0 ELSE 1 END, bucket) AS rn
        FROM cum
      ) WHERE rn = 1
    ), est AS MATERIALIZED (
      SELECT lo + width * (CAST(bucket AS DOUBLE)
               + (CAST(target AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                 / CAST(cnt AS DOUBLE)) AS q_est
      FROM hit
    ), exact AS MATERIALIZED (
      SELECT CAST(CAST(v AS DECIMAL(30,2)) * 100 AS BIGINT) AS med_cents
      FROM (
        SELECT v, row_number() OVER (ORDER BY v) AS rk, COUNT(*) OVER () AS n
        FROM vals
      ) WHERE rk = (n + 1) // 2
    )
    SELECT exact.med_cents AS exact_median_cents,
           CAST(floor(est.q_est * 100e0) AS BIGINT) AS est_median_cents,
           CAST(floor((est.q_est * 100e0
                       / CAST(exact.med_cents AS DOUBLE) - 1e0) * 1000000e0)
                AS BIGINT) AS err_ppm
    FROM exact, est
    """,
)
def quantile_sketch_error_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-truth audit for the mergeable 1024-bucket histogram
    median (operators/quantiles.py histogram_quantiles): the
    uniform-interpolation estimate next to the EXACT median (the
    k_of_n ranking recipe) with the signed relative error — the
    calibration gate for the fixed-state quantile path (at 100 TB the
    histogram is one map-side-combinable pass; exact ranks cost a
    range-partitioned shuffle).

    Determinism: the histogram estimate is the documented fixed-order
    IEEE pipeline; the exact median is an integer cents order
    statistic; err_ppm is the double-floor class.

    Scale shape: two passes over lineitem (bounded histogram + the
    grouped_kth_smallest range-partition recipe); the audit join is
    1x1. The oracle's global windows are the sf0.01 shortcut."""
    from dpe_energy_performance_analysis_etl_spark.operators.quantiles import (
        grouped_kth_smallest,
        histogram_quantiles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice").isNotNull()
    )
    est = histogram_quantiles(li, "l_extendedprice", [0.5]).select(
        F.col("q_est")
    )
    exact = grouped_kth_smallest(
        li.select(
            F.lit(1).alias("one"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        ),
        "one",
        "cents",
        k_of_n="(n + 1) div 2",
    ).select(F.col("kth_value").alias("med_cents"))
    return exact.crossJoin(F.broadcast(est)).selectExpr(
        "med_cents AS exact_median_cents",
        "CAST(floor(q_est * 100e0) AS BIGINT) AS est_median_cents",
        "CAST(floor((q_est * 100e0 / CAST(med_cents AS DOUBLE) - 1e0)"
        " * 1000000e0) AS BIGINT) AS err_ppm",
    )
