"""Round-9 wave-20 tests: semantic decontamination, Yule's K, ESS."""

from __future__ import annotations

import math


class TestSemanticDecontaminate:
    def _run(self, spark, tmp_path, vectors):
        """vectors: dict vec_id -> list[float]."""
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [(vid, [float(x) for x in v]) for vid, v in vectors.items()]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        out = QUERIES["semantic_decontaminate_embeddings"](
            spark, str(tmp_path)
        ).collect()
        return {r["vec_id"]: r for r in out}

    def test_near_duplicate_flagged(self, spark, tmp_path):
        vecs = {
            0: [1.0, 0.0, 0.0],   # eval
            1: [0.0, 1.0, 0.0],   # eval
            25: [0.999, 0.01, 0.0],   # paraphrase of eval 0
            26: [0.0, 0.0, 1.0],      # orthogonal to both
            27: [0.5, 0.5, 0.0],      # between, not contaminated
        }
        got = self._run(spark, tmp_path, vecs)
        assert got[25]["contaminated"] and got[25]["nearest_eval_id"] == 0
        assert not got[26]["contaminated"]
        assert not got[27]["contaminated"]
        # cosine values match a plain python computation
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

        assert abs(got[27]["max_cosine"] - cos(vecs[27], vecs[0])) < 1e-12

    def test_tie_prefers_lower_eval_id(self, spark, tmp_path):
        vecs = {
            0: [1.0, 0.0],
            1: [1.0, 0.0],  # identical eval vectors
            30: [2.0, 0.0],
        }
        got = self._run(spark, tmp_path, vecs)
        assert got[30]["nearest_eval_id"] == 0


class TestYulesK:
    def _run(self, spark, tmp_path, source_docs):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [
            (i, text, "en", src, len(text))
            for i, (src, text) in enumerate(source_docs)
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = QUERIES["yules_k_sources"](spark, str(tmp_path)).collect()
        return {r["source"]: r for r in out}

    def test_formula(self, spark, tmp_path):
        # counts: a:3, b:2, c:1 -> M1=6, M2=9+4+1=14
        got = self._run(spark, tmp_path, [("s", "a a a b b c")])
        r = got["s"]
        assert r["m1_tokens"] == 6 and r["v_types"] == 3 and r["m2"] == 14
        assert r["yules_k_milli"] == (10000 * (14 - 6) * 1000) // 36

    def test_repetitive_beats_diverse(self, spark, tmp_path):
        got = self._run(
            spark,
            tmp_path,
            [("rep", "x x x x x x x y"), ("div", "a b c d e f g h")],
        )
        assert got["rep"]["yules_k_milli"] > got["div"]["yules_k_milli"]
        # all-distinct text: M2 = M1 -> K = 0
        assert got["div"]["yules_k_milli"] == 0


class TestEssLengthWeights:
    def _run(self, spark, tmp_path, source_lengths):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        rows = [
            (i, "t", "en", src, int(ln))
            for i, (src, ln) in enumerate(source_lengths)
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = QUERIES["ess_length_weights_sources"](spark, str(tmp_path)).collect()
        return {r["source"]: r for r in out}

    def test_uniform_weights_full_ess(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [("u", 100)] * 8)
        assert got["u"]["ess_ratio_ppm"] == 1_000_000

    def test_one_giant_dominates(self, spark, tmp_path):
        lens = [("g", 1)] * 9 + [("g", 10_000)]
        got = self._run(spark, tmp_path, lens)
        r = got["g"]
        w = [1] * 9 + [10_000]
        expect = (sum(w) ** 2 * 10**6) // (len(w) * sum(x * x for x in w))
        assert r["ess_ratio_ppm"] == expect
        assert r["ess_ratio_ppm"] < 150_000  # far below uniform
