"""WordPiece tokenizer (text/tokenizer.py): greedy longest-match
semantics vs hand-worked splits, UNK fallback, and the weighted
sampler's priority bias (text/mixing.py)."""

from __future__ import annotations

from dpe_energy_performance_analysis_etl_spark.text.mixing import weighted_sample_topk
from dpe_energy_performance_analysis_etl_spark.text.tokenizer import (
    UNK,
    _index_vocab,
    wordpiece_tokenize,
    wordpiece_word,
)

VOCAB = ["spark", "join", "wind", "##ow", "##s", "un", "##able", "a", "##b", "##c"]


def _split(word):
    starts, conts, max_len = _index_vocab(VOCAB)
    return wordpiece_word(word, starts, conts, max_len)


def test_wordpiece_greedy_longest_match():
    assert _split("spark") == ["spark"]
    assert _split("window") == ["wind", "##ow"]
    assert _split("windows") == ["wind", "##ow", "##s"]
    assert _split("unable") == ["un", "##able"]
    assert _split("abc") == ["a", "##b", "##c"]


def test_wordpiece_unk_when_stuck():
    assert _split("xyz") == [UNK]          # no start piece
    assert _split("sparkx") == [UNK]       # stuck mid-word -> whole word UNK
    assert _split("ab") == ["a", "##b"]


def test_wordpiece_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "spark windows"), (2, "qqq"), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in wordpiece_tokenize(df, "text", VOCAB).collect()}
    assert got[1].pieces == ["spark", "wind", "##ow", "##s"]
    assert got[1].n_pieces == 4 and got[1].n_unk == 0
    assert got[2].pieces == [UNK] and got[2].n_unk == 1
    assert got[3].pieces is None


def test_wordpiece_default_vocab_no_unk_on_corpus_words(spark):
    df = spark.createDataFrame(
        [(1, "spark join window table customer stream")], "doc_id long, text string"
    )
    r = wordpiece_tokenize(df, "text").collect()[0]
    assert r.n_unk == 0 and r.n_pieces >= 6


def test_weighted_sample_bias(spark):
    # Two strata of weights: heavy rows (weight 1000) vs light
    # (weight 1). With priority = hash*1e6 DIV w, the top picks skew
    # overwhelmingly heavy.
    rows = [(i, 1000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample_topk(df, k=10, weight_col="w").collect()
    heavy = sum(1 for r in got if r.w == 1000)
    assert heavy == 10
    # Deterministic across partitionings.
    again = weighted_sample_topk(df.repartition(7), k=10, weight_col="w").collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)
