"""Wave-16: Stupid Backoff bigram scoring + vocab coverage curve —
hand-computed ground truths."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.text.retrieval import (
    stupid_backoff_scores,
    vocab_coverage_curve,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestStupidBackoff:
    def test_seen_bigram_exact_ratio(self, spark):
        # train: "a b a b a c" -> c(a)=3, c(b)=2, c(c)=1, N=6
        # bigrams: ab:2, ba:2, ac:1
        train = _docs(spark, [(1, "a b a b a c")])
        # test doc "a b": bigram (a,b) seen -> (2*1e6) div 3 = 666666
        test = _docs(spark, [(10, "a b")])
        r = stupid_backoff_scores(train, test).collect()[0]
        assert r["n_bigrams"] == 1
        assert r["n_backoff"] == 0 and r["n_oov"] == 0
        assert r["score_q_sum"] == (2 * 1_000_000) // 3
        assert r["mean_score"] == r["score_q_sum"] / 1_000_000

    def test_backoff_and_oov_paths(self, spark):
        train = _docs(spark, [(1, "a b a b a c")])
        # test "c a": bigram (c,a) unseen, a known -> backoff:
        #   (2*3*1e6) div (5*6) = 200000
        # test "a zzz": w2 OOV -> score 0
        test = _docs(spark, [(10, "c a"), (20, "a zzz")])
        got = {r["doc_id"]: r for r in stupid_backoff_scores(train, test).collect()}
        assert got[10]["n_backoff"] == 1
        assert got[10]["score_q_sum"] == (2 * 3 * 1_000_000) // (5 * 6)
        assert got[20]["n_oov"] == 1
        assert got[20]["score_q_sum"] == 0

    def test_sub_two_token_docs_emit_nothing(self, spark):
        train = _docs(spark, [(1, "a b")])
        test = _docs(spark, [(10, "a"), (20, "")])
        assert stupid_backoff_scores(train, test).count() == 0


class TestVocabCoverage:
    def test_hand_computed_coverage(self, spark):
        # train vocab by count desc: a(3), b(2), c(1) -> ranks 1,2,3
        train = _docs(spark, [(1, "a a a b b c")])
        # test: a a b c d -> 5 tokens
        test = _docs(spark, [(10, "a a b c d")])
        got = {r["k"]: r for r in vocab_coverage_curve(train, test, ks=[1, 2, 3]).collect()}
        assert got[1]["n_test_tokens"] == 5
        assert got[1]["n_covered"] == 2          # only 'a'
        assert got[2]["n_covered"] == 3          # a + b
        assert got[3]["n_covered"] == 4          # a + b + c; 'd' OOV
        assert got[3]["coverage"] == 4 / 5

    def test_rank_tie_break_deterministic(self, spark):
        # equal counts tie-break by term asc: a before b
        train = _docs(spark, [(1, "a b")])
        test = _docs(spark, [(10, "b")])
        got = {r["k"]: r for r in vocab_coverage_curve(train, test, ks=[1, 2]).collect()}
        assert got[1]["n_covered"] == 0          # rank 1 is 'a'
        assert got[2]["n_covered"] == 1
