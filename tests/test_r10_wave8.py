"""Round-10 wave-8 tests: tokenizer fertility, HLL error audit,
quantile-sketch error audit."""

from __future__ import annotations


def _docs_parquet(spark, tmp_path, docs):
    """docs: list of (source, text)."""
    spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(docs)],
        "doc_id bigint, source string, text string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestTokenizerFertility:
    def _run(self, spark, tmp_path, docs):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["tokenizer_fertility_sources"](
            spark, _docs_parquet(spark, tmp_path, docs)
        ).collect()
        return {r["source"]: r for r in out}

    def test_counts_and_ratios(self, spark, tmp_path):
        docs = [
            ("web", "hello, world! it's nice"),
            ("web", "alpha beta"),
            ("code", "x=1; y=2;"),
        ]
        got = self._run(spark, tmp_path, docs)
        web = got["web"]
        # words: 4 + 2; tokens (alnum runs + single punct):
        # 'hello',',','world','!','it',''','s','nice' = 8; 'alpha','beta' = 2
        assert web["words"] == 6
        assert web["tokens"] == 10
        assert web["fertility_ppm"] == (10 * 10**6) // 6
        code = got["code"]
        # 'x','=','1',';','y','=','2',';' = 8 tokens, 2 words
        assert code["words"] == 2 and code["tokens"] == 8
        assert code["fertility_ppm"] == 4_000_000
        assert code["chars_per_token_milli"] == (code["chars"] * 1000) // 8


class TestHLLErrorAudit:
    def _run(self, spark, tmp_path, docs):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        out = QUERIES["hll_error_audit_tokens"](
            spark, _docs_parquet(spark, tmp_path, docs)
        ).collect()
        return {r["source"]: r for r in out}

    def test_exact_counts_and_bounded_error(self, spark, tmp_path):
        words_a = " ".join(f"tok{i}" for i in range(400))
        words_b = " ".join(f"w{i}" for i in range(50)) + " w1 w2 w3"
        got = self._run(
            spark, tmp_path, [("a", words_a), ("b", words_b)]
        )
        assert got["a"]["exact_distinct"] == 400
        assert got["b"]["exact_distinct"] == 50
        # raw HLL (no linear counting) is biased low at tiny
        # cardinality and ~13% RSE above ~2.5m; the audit's JOB is to
        # report the error — just pin it is present and sane
        assert got["a"]["err_milli"] is not None
        assert -900 <= got["a"]["err_milli"] <= 900
        assert got["a"]["register_sum_x2p"] > 0


class TestQuantileSketchErrorAudit:
    def _run(self, spark, tmp_path, prices):
        from dpe_energy_performance_analysis_etl_spark.plans.queries import QUERIES

        spark.createDataFrame(
            [(float(p),) for p in prices], "l_extendedprice double"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))
        return QUERIES["quantile_sketch_error_audit"](
            spark, str(tmp_path)
        ).collect()[0]

    def test_uniformish_small_error(self, spark, tmp_path):
        prices = [100.0 + i for i in range(1001)]
        r = self._run(spark, tmp_path, prices)
        assert r["exact_median_cents"] == 60000  # 600.00
        # uniform data: interpolated histogram median lands within
        # one bucket width (~1 unit here)
        assert abs(r["est_median_cents"] - 60000) <= 200
        assert abs(r["err_ppm"]) <= 4000

    def test_skewed_error_reported(self, spark, tmp_path):
        prices = [10.0] * 900 + [10000.0] * 101
        r = self._run(spark, tmp_path, prices)
        assert r["exact_median_cents"] == 1000
        # the equal-width histogram collapses the low mass into one
        # bucket: the estimate interpolates inside it and the audit
        # must REPORT the (large, expected) error
        assert r["err_ppm"] is not None
