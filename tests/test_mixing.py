"""Temperature mixture sampling + pseudonymization (text/mixing.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.text.mixing import (
    pseudonymize,
    temperature_mixture_sample,
    temperature_rates,
)


def _mix(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


class TestTemperatureRates:
    def test_t2_rates_are_sqrt(self, spark):
        df = _mix(spark, {"small": 100, "big": 400})
        rates = {r.source: r.keep_rate for r in temperature_rates(df).collect()}
        assert rates["small"] == pytest.approx(1.0)
        assert rates["big"] == pytest.approx(0.5)  # sqrt(100/400)

    def test_t1_equalizes(self, spark):
        df = _mix(spark, {"small": 100, "big": 400})
        rates = {
            r.source: r.keep_rate
            for r in temperature_rates(df, temperature=1.0).collect()
        }
        assert rates["big"] == pytest.approx(0.25)

    def test_bad_temperature(self, spark):
        with pytest.raises(ValueError):
            temperature_rates(_mix(spark, {"a": 1}), temperature=0)


class TestTemperatureMixtureSample:
    def test_smallest_stratum_kept_whole(self, spark):
        df = _mix(spark, {"small": 50, "big": 800})
        out = temperature_mixture_sample(df).groupBy("source").count().collect()
        got = {r.source: r["count"] for r in out}
        assert got["small"] == 50
        # big kept at ~sqrt(50/800)=25%, hash-uniform within ~5pp
        assert 0.18 * 800 <= got["big"] <= 0.32 * 800

    def test_deterministic(self, spark):
        df = _mix(spark, {"a": 200, "b": 600})
        a = sorted(r.doc_id for r in temperature_mixture_sample(df).collect())
        b = sorted(r.doc_id for r in temperature_mixture_sample(df).collect())
        assert a == b


class TestPseudonymize:
    def test_deterministic_and_salted(self, spark):
        df = spark.createDataFrame([(1, "alice"), (2, "alice"), (3, "bob")], "id long, name string")
        out = {r.id: r.name_pseud for r in pseudonymize(df, ["name"], salt="s1").collect()}
        assert out[1] == out[2]  # same value -> same pseudonym (joins survive)
        assert out[1] != out[3]
        other = {r.id: r.name_pseud for r in pseudonymize(df, ["name"], salt="s2").collect()}
        assert out[1] != other[1]  # salt changes the mapping
        assert len(out[1]) == 64  # sha256 hex

    def test_original_dropped_or_kept(self, spark):
        df = spark.createDataFrame([(1, "alice")], "id long, name string")
        assert "name" not in pseudonymize(df, ["name"], salt="s").columns
        kept = pseudonymize(df, ["name"], salt="s", drop_original=False)
        assert {"name", "name_pseud"} <= set(kept.columns)

    def test_empty_salt_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(ValueError):
            pseudonymize(df, ["name"], salt="")


class TestRedactPii:
    def test_classes_replaced_and_counted(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import redact_pii

        df = spark.createDataFrame(
            [(1, "mail a@b.org and b@c.io from 192.168.0.1 call +1 555 123 4567 ok")],
            "id long, text string",
        )
        r = redact_pii(df).collect()[0]
        assert r.email_n == 2 and r.ipv4_n == 1 and r.phone_n == 1
        assert "[email]" in r.text and "[ipv4]" in r.text and "[phone]" in r.text
        assert "a@b.org" not in r.text and "192.168" not in r.text and "555" not in r.text

    def test_clean_text_untouched(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import redact_pii

        df = spark.createDataFrame([(1, "nothing sensitive here")], "id long, text string")
        r = redact_pii(df).collect()[0]
        assert r.text == "nothing sensitive here"
        assert r.email_n == 0 and r.ipv4_n == 0 and r.phone_n == 0

    def test_email_digits_not_double_counted_as_phone(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import redact_pii

        df = spark.createDataFrame(
            [(1, "reach 123456789012@corp.com today")], "id long, text string"
        )
        r = redact_pii(df).collect()[0]
        # the long digit run inside the address is consumed by the
        # email pass and must not ALSO count as a phone number
        assert r.email_n == 1 and r.phone_n == 0


class TestEpochShard:
    def test_deterministic_across_runs_and_balanced(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import epoch_shard

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: (r.shard, r.shuffle_key) for r in epoch_shard(df, 8, epoch=3).collect()}
        b = {r.doc_id: (r.shard, r.shuffle_key) for r in epoch_shard(df, 8, epoch=3).collect()}
        assert a == b  # reproducible
        counts = {}
        for s, _ in a.values():
            counts[s] = counts.get(s, 0) + 1
        assert set(counts) == set(range(8))
        assert max(counts.values()) < 2 * 2000 / 8  # no shard grossly overloaded

    def test_epoch_changes_permutation(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import epoch_shard

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        e0 = {r.doc_id: r.shuffle_key for r in epoch_shard(df, 4, epoch=0).collect()}
        e1 = {r.doc_id: r.shuffle_key for r in epoch_shard(df, 4, epoch=1).collect()}
        assert e0 != e1  # a new epoch reorders

    def test_invalid_shards_rejected(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import epoch_shard

        with pytest.raises(ValueError):
            epoch_shard(spark.range(1).withColumnRenamed("id", "doc_id"), 0)


class TestNegativeSamplingTable:
    def test_weight_is_three_quarter_power(self, spark):
        import math
        from dpe_energy_performance_analysis_etl_spark.text.mixing import negative_sampling_table

        df = spark.createDataFrame(
            [(0, "aa aa aa aa bb bb cc")], "doc_id long, text string"
        )
        got = {r["word"]: r for r in negative_sampling_table(df, k=10).collect()}
        for word, cnt in [("aa", 4), ("bb", 2), ("cc", 1)]:
            c = float(cnt)
            assert got[word]["wcount"] == cnt
            assert got[word]["weight"] == math.sqrt(math.sqrt(c * c * c))

    def test_draw_biased_toward_heavy_words(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import negative_sampling_table

        # 5 heavy words (x100, weight 100^.75 ~= 32) + 20 singletons:
        # heavy priorities land in [hash/32] <= ~312 while a singleton
        # needs hash <= 312 (a ~3% event), so a 10-draw is mostly
        # heavy. (With hash/weight ranking the bias is linear in
        # weight per word — a large light population can still crowd
        # the draw, which is why the operator is a weighted sample of
        # WORDS, not a with-replacement unigram table.)
        heavy = " ".join(f"h{i} " * 100 for i in range(5))
        light = " ".join(f"w{i:03d}" for i in range(20))
        df = spark.createDataFrame([(0, heavy + " " + light)], "doc_id long, text string")
        got = negative_sampling_table(df, k=10).collect()
        n_heavy = sum(1 for r in got if r["wcount"] == 100)
        assert n_heavy >= 4

    def test_deterministic_across_partitionings(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import negative_sampling_table

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = [tuple(r) for r in negative_sampling_table(docs, k=15).collect()]
        b = [tuple(r) for r in negative_sampling_table(docs.repartition(9), k=15).collect()]
        assert a == b


class TestFimTransform:
    def test_psm_reassembles_to_original(self, spark):
        """prefix+middle+suffix must reconstruct the exact text."""
        from dpe_energy_performance_analysis_etl_spark.text.mixing import fim_transform

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = fim_transform(docs).join(docs.select("doc_id", "text"), "doc_id")
        psm = out.where("mode = 'psm'").collect()
        assert len(psm) > 0
        for r in psm:
            t = r["fim_text"]
            assert t.startswith("<PRE>")
            pre, rest = t[5:].split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
            assert pre + mid + suf == r["text"]
        plain = out.where("mode = 'plain'").collect()
        assert all(r["fim_text"] == r["text"] for r in plain)

    def test_deterministic_rate(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.mixing import fim_transform

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = {(r["doc_id"], r["mode"]) for r in fim_transform(docs).collect()}
        b = {(r["doc_id"], r["mode"]) for r in fim_transform(docs.repartition(5)).collect()}
        assert a == b
        n_psm = sum(1 for _, m in a if m == "psm")
        assert 0.3 < n_psm / len(a) < 0.7  # ~50% selection


class TestPreferencePairs:
    def test_extremes_and_tie_break(self, spark):
        from pyspark.sql import functions as F
        from dpe_energy_performance_analysis_etl_spark.text.mixing import preference_pairs_by_quality

        rows = [
            ("s1", 1, 5.0), ("s1", 2, 9.0), ("s1", 3, 1.0),
            ("s2", 4, 7.0), ("s2", 5, 7.0),      # tie: ids decide
            ("s3", 6, 2.0),                        # singleton: dropped
        ]
        df = spark.createDataFrame(rows, "source string, doc_id long, q double")
        got = {r["source"]: r for r in preference_pairs_by_quality(df, F.col("q")).collect()}
        assert set(got) == {"s1", "s2"}
        assert (got["s1"]["chosen_id"], got["s1"]["rejected_id"]) == (2, 3)
        # tie at 7.0: chosen = larger id (desc,desc), rejected = smaller
        assert (got["s2"]["chosen_id"], got["s2"]["rejected_id"]) == (5, 4)
        assert got["s2"]["chosen_score"] == got["s2"]["rejected_score"] == 7.0


def test_target_mixture_weights_reshapes_to_target(spark):
    """weight = target/natural: uniform resampling by these weights
    yields the target mixture in expectation; absent sources drop."""
    from dpe_energy_performance_analysis_etl_spark.text.mixing import target_mixture_weights

    rows = [("a", 10)] * 6 + [("b", 10)] * 3 + [("c", 10)] * 1
    df = spark.createDataFrame(rows, "source string, toks long")
    out = {r.source: r for r in target_mixture_weights(
        df, {"a": 0.5, "b": 0.5}, "source", size_col="toks").collect()}
    assert out["a"].natural_share == 0.6 and out["b"].natural_share == 0.3
    assert abs(out["a"].weight - 0.5 / 0.6) < 1e-15
    assert abs(out["b"].weight - 0.5 / 0.3) < 1e-15
    assert out["c"].weight == 0.0
    # expected post-sampling mixture == target (up to the common norm)
    post_a = out["a"].natural_share * out["a"].weight
    post_b = out["b"].natural_share * out["b"].weight
    assert abs(post_a - 0.5) < 1e-15 and abs(post_b - 0.5) < 1e-15


def test_target_mixture_weights_rowcount_mode(spark):
    from dpe_energy_performance_analysis_etl_spark.text.mixing import target_mixture_weights

    df = spark.createDataFrame([("x",), ("x",), ("y",)], "source string")
    out = {r.source: r for r in target_mixture_weights(df, {"y": 1.0}).collect()}
    assert out["x"].size == 2 and out["y"].size == 1
    assert out["y"].target_share == 1.0
