"""Corpus-curation operators (text/curation.py): repetition metrics
against hand-computed values, quality-gate branches, decontamination
overlap, deterministic stratified sampling, cluster survivorship.

The registry twins of these (gopher_repetition,
quality_filter_heuristic, decontaminate_overlap, stratified_sample_mix,
cluster_canonical_survivors) are oracle-checked bit-exact against
DuckDB by tools/check_queries.py; these tests pin the semantics on
adversarial micro-inputs the random corpus can't guarantee to contain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text import (
    canonical_per_cluster,
    gopher_repetition_filter,
    heuristic_quality_filter,
    ngram_decontaminate,
    repetition_metrics,
    sampling_hash,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionMetrics:
    def test_hand_computed_fractions(self, spark):
        # tokens [a a a b]: 4 tokens, 2 distinct -> dup_uni = 0.5
        # bigrams [a a, a a, a b]: top = 2/3
        # trigrams [a a a, a a b]: both unique -> dup_tri = 0.0
        row = repetition_metrics(_docs(spark, [(1, "a a a b")])).collect()[0]
        assert row.n_tokens == 4
        assert row.dup_unigram_frac == pytest.approx(0.5)
        assert row.top_bigram_frac == pytest.approx(2 / 3)
        assert row.dup_trigram_frac == 0.0

    def test_short_docs_null_not_dropped(self, spark):
        out = {
            r.doc_id: r
            for r in repetition_metrics(
                _docs(spark, [(1, "solo"), (2, "two words"), (3, "")])
            ).collect()
        }
        assert set(out) == {1, 2, 3}  # spine join keeps every doc
        assert out[1].n_tokens == 1
        assert out[1].top_bigram_frac is None  # < 2 tokens
        assert out[2].top_bigram_frac == pytest.approx(1.0)  # one bigram
        assert out[2].dup_trigram_frac is None
        assert out[3].n_tokens == 0
        assert out[3].dup_unigram_frac is None

    def test_filter_rejects_degenerate_loop(self, spark):
        df = _docs(
            spark,
            [
                (1, "spam spam spam spam spam"),  # dup_uni=0.8, top_bi=1.0
                # all-unique tokens, long enough that the top-bigram
                # floor 1/(n-1) sits under the 0.05 threshold
                (2, " ".join(f"w{i}" for i in range(30))),
            ],
        )
        out = {r.doc_id: r.keep for r in gopher_repetition_filter(df).collect()}
        assert out == {1: False, 2: True}

    def test_too_short_for_gram_passes(self, spark):
        # NULL metrics must not reject (Gopher convention)
        out = gopher_repetition_filter(_docs(spark, [(1, "one")])).collect()[0]
        assert out.keep is True


class TestHeuristicQualityFilter:
    def test_branches(self, spark):
        good = " ".join(["word"] * 25)  # 25 words, mean len 4.0
        df = _docs(
            spark,
            [
                (1, good),
                (2, "too short"),  # < 20 words
                (3, good + " lorem ipsum dolor"),  # boilerplate marker
                (4, " ".join(["hi"] * 30)),  # mean word len 2.0 < 4
                (5, good + " @@@@@@@@@@@@@@@@@@@@@@@@@@@@@@"),  # symbols
            ],
        )
        out = {r.doc_id: r for r in heuristic_quality_filter(df).collect()}
        assert out[1].keep is True
        assert out[1].n_words == 25
        assert out[1].mean_word_len == pytest.approx(4.0)
        assert out[2].keep is False
        assert out[3].keep is False and out[3].has_boilerplate is True
        assert out[4].keep is False
        assert out[5].keep is False and out[5].symbol_ratio > 0.1

    def test_empty_doc(self, spark):
        row = heuristic_quality_filter(_docs(spark, [(1, "")])).collect()[0]
        assert row.n_words == 0 and row.keep is False
        assert row.mean_word_len == 0.0  # guarded division


class TestDecontamination:
    def test_overlap_counts(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        corpus = _docs(
            spark,
            [
                # shares 2 distinct 4-grams: [alpha beta gamma delta], [beta gamma delta epsilon]
                (1, "x alpha beta gamma delta epsilon y"),
                (2, "completely different words here now"),  # clean
                (3, "alpha beta gamma delta"),  # shares 1
            ],
        )
        out = {r.doc_id: r for r in ngram_decontaminate(corpus, bench, n=4).collect()}
        assert set(out) == {1, 3}  # clean doc absent
        assert out[1].n_shared_ngrams == 2
        assert out[1].n_benchmark_docs == 1
        assert out[3].n_shared_ngrams == 1

    def test_repeated_gram_counted_once(self, spark):
        bench = _docs(spark, [(100, "a b c d")])
        corpus = _docs(spark, [(1, "a b c d a b c d")])
        out = ngram_decontaminate(corpus, bench, n=4).collect()[0]
        assert out.n_shared_ngrams == 1  # distinct grams, not occurrences


class TestStratifiedSample:
    def _mix(self, spark, n=400):
        rows = [(i, "A" if i % 2 == 0 else "B") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_extreme_rates(self, spark):
        df = self._mix(spark)
        out = stratified_sample(df, {"A": 1.0, "B": 0.0}).collect()
        assert len(out) == 200
        assert all(r.source == "A" for r in out)

    def test_deterministic_and_hash_consistent(self, spark):
        df = self._mix(spark)
        a = sorted(r.doc_id for r in stratified_sample(df, {"A": 0.5, "B": 0.25}).collect())
        b = sorted(r.doc_id for r in stratified_sample(df, {"A": 0.5, "B": 0.25}).collect())
        assert a == b
        # decisions match the documented hash predicate exactly
        buckets = {
            r.doc_id: r.b
            for r in df.select("doc_id", sampling_hash(F.col("doc_id")).alias("b")).collect()
        }
        expect = sorted(
            i for i, s in ((r.doc_id, r.source) for r in df.collect())
            if buckets[i] < (5000 if s == "A" else 2500)
        )
        assert a == expect

    def test_default_rate_drops_unlisted_strata(self, spark):
        df = self._mix(spark)
        out = stratified_sample(df, {"A": 1.0}).collect()  # B falls to default 0.0
        assert {r.source for r in out} == {"A"}

    def test_rate_validation(self, spark):
        with pytest.raises(ValueError):
            stratified_sample(self._mix(spark), {"A": 1.5})


class TestCanonicalPerCluster:
    def test_survivor_by_quality_then_id(self, spark):
        docs = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 5), (4, 20), (5, 20)],
            "doc_id long, n_chars long",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 3), (4, 4), (5, 4)],
            "doc_id long, component long",
        )
        out = {r.doc_id: r for r in canonical_per_cluster(docs, clusters).collect()}
        assert out[1].canonical_id == 2 and out[1].is_kept is False  # quality wins
        assert out[2].is_kept is True
        assert out[3].is_kept is True  # singleton survives
        assert out[4].canonical_id == 4 and out[5].canonical_id == 4  # tie -> min id


class TestC4LineFilter:
    def test_branches(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import c4_line_filter

        df = spark.createDataFrame(
            [
                (1, "no terminal punct\nKeep this five word line.\nshort.\nAnother good line stays here too!"),
                (2, "only fragments\nand more fragments"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in c4_line_filter(df).collect()}
        assert out[1].n_lines == 4 and out[1].n_kept_lines == 2 and out[1].keep_doc
        assert out[1].clean_text == "Keep this five word line.\nAnother good line stays here too!"
        assert out[2].n_kept_lines == 0 and not out[2].keep_doc and out[2].clean_text == ""

    def test_word_floor_configurable(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import c4_line_filter

        df = spark.createDataFrame([(1, "Tiny line.")], "doc_id long, text string")
        assert c4_line_filter(df, min_line_words=2).collect()[0].n_kept_lines == 1
        assert c4_line_filter(df, min_line_words=3).collect()[0].n_kept_lines == 0


class TestHtmlStrip:
    def test_tags_entities_whitespace(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import html_strip

        df = spark.createDataFrame(
            [(1, '<div class="a">Hello &amp; <b>world</b>&nbsp;&lt;tag&gt;</div>')],
            "doc_id long, text string",
        )
        r = html_strip(df).collect()[0]
        assert r.clean_text == "Hello & world <tag>"

    def test_amp_unescapes_last(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import html_strip

        df = spark.createDataFrame([(1, "a &amp;lt; b")], "doc_id long, text string")
        # &amp;lt; must become the LITERAL "&lt;", not "<"
        assert html_strip(df).collect()[0].clean_text == "a &lt; b"

    def test_plain_text_passthrough(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import html_strip

        df = spark.createDataFrame([(1, "no markup   here")], "doc_id long, text string")
        assert html_strip(df).collect()[0].clean_text == "no markup here"


class TestSourceOverlapMatrix:
    def test_hand_computed_overlap(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import source_overlap_matrix

        # srcA doc: grams {a b c, b c d}; srcB doc shares exactly one
        # of them; srcC is disjoint.
        rows = [
            (0, "a b c d", "srcA"),
            (1, "x a b c y", "srcB"),   # grams {x a b, a b c, b c y}
            (2, "p q r s", "srcC"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            (r["source_a"], r["source_b"]): (r["n_shared"], r["overlap_coef"])
            for r in source_overlap_matrix(df).collect()
        }
        # only the A-B pair shares grams: {a b c}; |A|=2, |B|=3 -> 1/2
        assert got == {("srcA", "srcB"): (1, 0.5)}

    def test_duplicate_grams_counted_once(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.curation import source_overlap_matrix

        rows = [
            (0, "a b c", "s1"),
            (1, "a b c", "s1"),   # same gram again in same source
            (2, "a b c z", "s2"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        row = source_overlap_matrix(df).collect()[0]
        assert row["n_shared"] == 1 and row["overlap_coef"] == 1.0


def test_flesch_reading_ease_hand_computed(spark):
    from dpe_energy_performance_analysis_etl_spark.text.analysis import flesch_reading_ease
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "a e i")], "doc_id long, text string"
    )
    cols = flesch_reading_ease("text")
    out = {r.doc_id: r for r in df.select("doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    r1 = out[1]
    # words=6, sentences=2, vowel groups: e,a,a,e,o,a = 6 -> syllables 6
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    assert abs(r1.flesch_score - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-12
    # no terminator -> sentences floors at 1; syllables floor at words
    assert out[2].n_sentences == 1 and out[2].n_syllables == 3


def test_compression_ratio_separates_repetitive_from_noise(spark):
    from dpe_energy_performance_analysis_etl_spark.text.analysis import compression_ratio

    import random

    rng = random.Random(5)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(4000))
    df = spark.createDataFrame(
        [(1, "spam " * 800), (2, noise)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[1].ratio < 0.05          # templated text collapses
    assert out[2].ratio > 0.5           # noise barely compresses
    assert out[1].raw_bytes == 4000
    # deterministic across partitionings
    again = {r.doc_id: r.compressed_bytes
             for r in compression_ratio(df.repartition(3)).collect()}
    assert again == {k: v.compressed_bytes for k, v in out.items()}
