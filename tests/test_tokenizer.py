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


# =====================================================================
# BPE pair statistics + merge learning vs a pure-Python reference
# =====================================================================

def _ref_bpe(words: dict[str, int], n_merges: int):
    """Textbook BPE trainer (Sennrich et al. 2016, alg. 1) on a
    word-count dict; returns [(rank, a, b, merged, count)]."""
    syms = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


class TestBPE:
    CORPUS = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
    ]

    def _df(self, spark):
        return spark.createDataFrame([(i, t) for i, t in enumerate(self.CORPUS)], "doc_id long, text string")

    def test_pair_counts_match_reference(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_pair_counts

        words: dict[str, int] = {}
        for t in self.CORPUS:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        ref: dict[str, int] = {}
        for w, c in words.items():
            s = list(w) + ["</w>"]
            for i in range(len(s) - 1):
                ref[f"{s[i]} {s[i+1]}"] = ref.get(f"{s[i]} {s[i+1]}", 0) + c
        expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = [
            (r["pair"], r["pair_count"])
            for r in bpe_pair_counts(self._df(spark), top_k=20).orderBy("rank").collect()
        ]
        assert got == expected

    def test_learned_merges_match_reference(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_learn_merges

        words: dict[str, int] = {}
        for t in self.CORPUS:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        ref = _ref_bpe(words, 5)
        got = [
            (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe_learn_merges(self._df(spark), n_merges=5).orderBy("merge_rank").collect()
        ]
        assert got == ref
        # sanity on the classic corpus: 'es'/'est'-family merges appear early
        merged_tokens = [m[3] for m in ref]
        assert any("es" in m or "est" in m for m in merged_tokens)

    def test_merge_is_nonoverlapping_leftmost(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_learn_merges

        # 'aaaa' x3: first merge (a,a) must apply non-overlapping:
        # a a a a </w> -> aa aa </w> (2 per word), not 3 overlapping.
        df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], "doc_id long, text string")
        got = bpe_learn_merges(df, n_merges=2).orderBy("merge_rank").collect()
        assert (got[0]["left"], got[0]["right"], got[0]["pair_count"]) == ("a", "a", 9)
        # second round pairs tie at 3: (aa,aa) and (aa,</w>); the
        # lexicographic tiebreak picks '</w>' (0x3C sorts before 'a')
        assert (got[1]["left"], got[1]["right"], got[1]["pair_count"]) == ("aa", "</w>", 3)


class TestBPEEncode:
    def test_roundtrip_with_learned_merges(self, spark):
        """Encoding the training corpus with its own learned merges
        must reproduce the trainer's final symbol state per word."""
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import (
            bpe_encode,
            bpe_learn_merges,
        )

        corpus = TestBPE.CORPUS
        df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(df, n_merges=5).orderBy("merge_rank").collect()
        ]
        # reference: replay _ref_bpe's final symbols per word
        words: dict[str, int] = {}
        for t in corpus:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        syms = {w: list(w) + ["</w>"] for w in words}
        for a, b in merges:
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        got = bpe_encode(df, merges).select("doc_id", "pieces").collect()
        for r in got:
            expected = []
            for w in corpus[r["doc_id"]].split():
                expected.extend(syms[w])
            assert r["pieces"] == expected

    def test_rank_order_beats_position(self, spark):
        """The LOWEST-rank merge applies first even if a higher-rank
        pair appears earlier in the word (the classic BPE subtlety)."""
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_encode

        # merges: rank0 (b,c), rank1 (a,b). For 'abc': (a,b) appears
        # first positionally, but (b,c) has lower rank -> a + bc, then
        # no (a,bc) merge exists -> pieces [a, bc, </w>]
        df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
        row = bpe_encode(df, [("b", "c"), ("a", "b")]).collect()[0]
        assert row["pieces"] == ["a", "bc", "</w>"]

    def test_empty_and_null(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.tokenizer import bpe_encode

        df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
        out = {r["doc_id"]: r["pieces"] for r in bpe_encode(df, [("a", "b")]).collect()}
        assert out[0] == [] and out[1] == []
