"""Sequence assembly (text/packing.py): chunking semantics and
two-level-scan packing vs a reference cumulative sum."""

from __future__ import annotations

import random

import pytest

from dpe_energy_performance_analysis_etl_spark.text.packing import chunk_documents, sequence_pack


class TestChunkDocuments:
    def test_exact_chunks_with_overlap(self, spark):
        words = [f"w{i}" for i in range(10)]
        df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
        out = sorted(
            chunk_documents(df, chunk_tokens=4, overlap_tokens=2).collect(),
            key=lambda r: r.chunk_id,
        )
        # stride 2, starts 0,2,4,6,8
        assert [r.chunk_id for r in out] == [0, 1, 2, 3, 4]
        assert out[0].chunk_text == "w0 w1 w2 w3"
        assert out[1].chunk_text == "w2 w3 w4 w5"  # 2-token overlap
        assert out[4].chunk_text == "w8 w9"  # short tail
        assert out[4].n_chunk_tokens == 2

    def test_doc_shorter_than_chunk(self, spark):
        df = spark.createDataFrame([(1, "only three words")], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=32, overlap_tokens=8).collect()
        assert len(out) == 1
        assert out[0].n_chunk_tokens == 3

    def test_empty_doc_yields_no_chunks(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=4, overlap_tokens=0).collect()
        assert {r.doc_id for r in out} == {2}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


class TestSequencePack:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 200), (3, 30)], "doc_id long, n_tokens long"
        )
        out = {r.doc_id: r for r in sequence_pack(df, budget=256).collect()}
        assert (out[1].start_token, out[1].bin_id, out[1].offset_in_bin) == (0, 0, 0)
        assert (out[2].start_token, out[2].bin_id, out[2].offset_in_bin) == (100, 0, 100)
        assert (out[3].start_token, out[3].bin_id, out[3].offset_in_bin) == (300, 1, 44)
        assert out[1].spans_boundary is False
        assert out[2].spans_boundary is True  # 100+200 > 256
        assert out[3].spans_boundary is False

    def test_two_level_scan_matches_reference_cumsum(self, spark):
        rng = random.Random(11)
        rows = [(i, rng.randint(1, 500)) for i in range(1000)]
        # tiny bucket_size forces many buckets through the prefix path
        out = {
            r.doc_id: r.start_token
            for r in sequence_pack(
                spark.createDataFrame(rows, "doc_id long, n_tokens long"),
                budget=1024,
                bucket_size=7,
            ).collect()
        }
        cum = 0
        for i, n in rows:
            assert out[i] == cum
            cum += n

    def test_order_independence_of_input_partitioning(self, spark):
        rows = [(i, 10 + i % 5) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        a = {r.doc_id: (r.bin_id, r.offset_in_bin) for r in sequence_pack(df, 64).collect()}
        b = {
            r.doc_id: (r.bin_id, r.offset_in_bin)
            for r in sequence_pack(df.repartition(13), 64).collect()
        }
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
        with pytest.raises(ValueError):
            sequence_pack(df, budget=0)


class TestLengthBucketBatches:
    def test_bucket_and_batch_assignment(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.packing import length_bucket_batches

        # 10 docs of 3 tokens (bucket 0 at width 4) + 2 docs of 5 (bucket 1)
        rows = [(i, "a b c") for i in range(10)] + [(100, "a b c d e"), (101, "a b c d f")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["bucket"], r["batch_id"]): (r["n_seqs"], r["max_len"], r["pad_waste"])
            for r in length_bucket_batches(df, bucket_width=4, batch_size=4).collect()
        }
        # bucket 0: 10 seqs -> batches of 4,4,2; all len 3 -> zero waste
        assert got[(0, 0)] == (4, 3, 0) and got[(0, 1)] == (4, 3, 0) and got[(0, 2)] == (2, 3, 0)
        assert got[(1, 0)] == (2, 5, 0)

    def test_pad_waste_formula(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.packing import length_bucket_batches

        # one batch with lens 5 and 7 -> max 7, waste = 2*7-12 = 2
        df = spark.createDataFrame(
            [(0, "a b c d e"), (1, "a b c d e f g")], "doc_id long, text string"
        )
        row = length_bucket_batches(df, bucket_width=64, batch_size=8).collect()[0]
        assert (row["n_seqs"], row["max_len"], row["sum_len"], row["pad_waste"]) == (2, 7, 12, 2)

    def test_deterministic_across_partitionings(self, spark):
        from dpe_energy_performance_analysis_etl_spark.text.packing import length_bucket_batches

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, length_bucket_batches(docs).collect()))
        b = sorted(map(tuple, length_bucket_batches(docs.repartition(13)).collect()))
        assert a == b
