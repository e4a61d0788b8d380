"""Audio silence detection end-to-end: real PCM-WAV bytes through the
dependency-free codec (multimodal/codecs.py), per-frame RMS via
mapInPandas (multimodal/media.py audio_features), then run
segmentation (operators/temporal.py threshold_run_segments)."""

from __future__ import annotations

import numpy as np

from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_wav
from dpe_energy_performance_analysis_etl_spark.multimodal.media import audio_features
from dpe_energy_performance_analysis_etl_spark.operators.temporal import (
    threshold_run_segments,
)

FRAME = 16


def _wav_with_silence() -> bytes:
    """10 frames loud, 5 silent, 8 loud, 4 silent (16-sample frames)."""
    rng = np.random.default_rng(3)
    def loud(n):
        return (rng.uniform(0.4, 0.9, size=n * FRAME) * np.sign(rng.normal(size=n * FRAME))).astype(np.float32)
    def quiet(n):
        return (rng.uniform(-0.005, 0.005, size=n * FRAME)).astype(np.float32)
    samples = np.concatenate([loud(10), quiet(5), loud(8), quiet(4)])
    return encode_wav(samples, sample_rate=16000)


def test_silence_segments_end_to_end(spark):
    payload = _wav_with_silence()
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, content binary")
    frames = audio_features(df, frame_size=FRAME, fake_decode=False)
    segs = threshold_run_segments(
        frames, "media_id", ["frame_idx"], "rms_energy",
        threshold=0.02, min_len=2,
    ).collect()
    got = sorted((s.start_frame_idx, s.end_frame_idx, s.run_len) for s in segs)
    assert got == [(10, 14, 5), (23, 26, 4)]
    for s in segs:
        assert s.max_value < 0.02


def test_loud_segments_above_threshold(spark):
    payload = _wav_with_silence()
    df = spark.createDataFrame([(7, bytearray(payload))], "media_id long, content binary")
    frames = audio_features(df, frame_size=FRAME, fake_decode=False)
    segs = threshold_run_segments(
        frames, "media_id", ["frame_idx"], "rms_energy",
        threshold=0.02, min_len=1, below=False,
    ).collect()
    got = sorted((s.start_frame_idx, s.end_frame_idx, s.run_len) for s in segs)
    assert got == [(0, 9, 10), (15, 22, 8)]


def test_min_len_filters_short_runs(spark):
    # One silent frame sandwiched between loud ones is dropped at
    # min_len=2.
    rng = np.random.default_rng(5)
    loud = (rng.uniform(0.5, 0.9, size=4 * FRAME)).astype(np.float32)
    one_quiet = np.zeros(FRAME, dtype=np.float32)
    samples = np.concatenate([loud, one_quiet, loud])
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples)))], "media_id long, content binary"
    )
    frames = audio_features(df, frame_size=FRAME, fake_decode=False)
    segs = threshold_run_segments(
        frames, "media_id", ["frame_idx"], "rms_energy",
        threshold=0.02, min_len=2,
    ).collect()
    assert segs == []
