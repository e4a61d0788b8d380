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


class TestRawVideoFrames:
    def _video(self, frames):
        import numpy as np

        return b"".join(f.astype(np.uint8).tobytes() for f in frames)

    def test_every_nth_frame_pixel_exact(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import decode_ppm
        from dpe_energy_performance_analysis_etl_spark.multimodal.media import extract_raw_frames

        h, w = 4, 6
        frames = [np.full((h, w, 3), i * 10, dtype=np.uint8) for i in range(12)]
        df = spark.createDataFrame(
            [(1, self._video(frames))], "media_id long, content binary"
        )
        out = extract_raw_frames(df, width=w, height=h, every_n=5).collect()
        assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 5, 10]
        for r in out:
            pix = decode_ppm(bytes(r["content"]))
            assert pix.shape == (h, w, 3)
            assert (pix == frames[r["frame_idx"]]).all()

    def test_truncated_tail_and_null_dropped(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.multimodal.media import extract_raw_frames

        h, w = 2, 2
        frames = [np.zeros((h, w, 3), dtype=np.uint8)] * 2
        payload = self._video(frames) + b"\x01\x02\x03"  # partial frame tail
        df = spark.createDataFrame(
            [(1, payload), (2, None), (3, b"xx")], "media_id long, content binary"
        )
        out = extract_raw_frames(df, width=w, height=h, every_n=1).collect()
        assert {(r["media_id"], r["frame_idx"]) for r in out} == {(1, 0), (1, 1)}

    def test_frames_feed_resize_pipeline(self, spark):
        import numpy as np
        from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
            extract_raw_frames,
            resize_images,
        )

        h, w = 8, 8
        frames = [np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3) % 256 for _ in range(3)]
        df = spark.createDataFrame([(7, self._video(frames))], "media_id long, content binary")
        fr = extract_raw_frames(df, width=w, height=h, every_n=2)
        small = resize_images(fr, out_h=4, out_w=4, id_col="media_id").collect()
        assert len(small) == 2 and all(r["height"] == 4 and r["width"] == 4 for r in small)
