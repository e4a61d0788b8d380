"""Round-5 multimodal wave: pHash near-dup, frame-luma scene cuts,
Shazam-style audio fingerprint matching — all over REAL codec bytes
(PPM / rawvideo / WAV synthesized in-test)."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm, encode_wav


def _ppm_row(mid, pixels):
    return (mid, bytearray(encode_ppm(pixels)))


MEDIA_SCHEMA = "media_id long, content binary"


def test_phash_blur_robust_and_distinct(spark):
    """pHash survives mild blur (the case dHash is weakest on) and
    separates structurally different images."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        hash_near_dup_pairs,
        image_phash,
    )

    rng = np.random.default_rng(11)
    # structured image (gradients + a block), not white noise — pHash
    # thresholds low-frequency DCT coefficients, which pure noise
    # doesn't stabilize under blur
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    base = np.stack(
        [(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
    ).astype(np.uint8)
    base[16:40, 16:40] = 230
    # 3x3 box blur (valid region padded by edge replication)
    padded = np.pad(base.astype(np.int64), ((1, 1), (1, 1), (0, 0)), mode="edge")
    blurred = sum(
        padded[dy : dy + 64, dx : dx + 64] for dy in range(3) for dx in range(3)
    ) // 9
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [_ppm_row(1, base), _ppm_row(2, blurred.astype(np.uint8)), _ppm_row(3, other)],
        MEDIA_SCHEMA,
    )
    hashed = image_phash(df).select("media_id", "phash")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hash_near_dup_pairs(hashed, "phash", "media_id", max_hamming=10).collect()
    }
    assert (1, 2) in pairs, "blurred copy must match its original"
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_scene_cut_detect_on_real_rawvideo(spark):
    """Synthesize a rawvideo payload with two hard scene changes; the
    luma-delta detector finds exactly those frame indices."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        frame_luma_features,
        scene_cut_detect,
    )

    w = h = 16
    frames = []
    for i in range(12):
        level = 30 if i < 4 else (200 if i < 8 else 90)
        frames.append(np.full((h, w, 3), level, dtype=np.uint8))
    payload = b"".join(f.tobytes() for f in frames)
    df = spark.createDataFrame([(7, bytearray(payload))], MEDIA_SCHEMA)
    feats = frame_luma_features(df, width=w, height=h)
    assert feats.count() == 12
    cuts = {(r.frame_idx, r.delta) for r in scene_cut_detect(feats, threshold=40).collect()}
    assert {c[0] for c in cuts} == {4, 8}
    # gradual drift below threshold is NOT a cut
    drift = [np.full((h, w, 3), 100 + i, dtype=np.uint8) for i in range(6)]
    df2 = spark.createDataFrame([(8, bytearray(b"".join(f.tobytes() for f in drift)))], MEDIA_SCHEMA)
    assert scene_cut_detect(frame_luma_features(df2, w, h), threshold=40).count() == 0


def _tone_mix(freqs, n, rate=8000, seed=0):
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    sig = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs)
    return (sig / len(freqs)).astype(np.float64)


def test_audio_fingerprint_matches_clipped_copy(spark):
    """A 1-second clip cut from the middle of a track matches THAT
    track (not the decoy) with votes concentrated at the true offset."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.audiofp import (
        HOP,
        audio_fingerprints,
        audio_match,
    )

    rate = 8000
    # tracks: distinct chirpy tone sequences, 4 s each
    def track(seed):
        rng = np.random.default_rng(seed)
        segs = [
            _tone_mix(rng.integers(200, 3600, 3), rate // 2, rate, seed + i)
            for i in range(8)
        ]
        return np.concatenate(segs)

    t1, t2 = track(1), track(2)
    clip_start = rate  # 1 second in
    clip = t1[clip_start : clip_start + rate]
    db = spark.createDataFrame(
        [(1, bytearray(encode_wav(t1, rate))), (2, bytearray(encode_wav(t2, rate)))],
        MEDIA_SCHEMA,
    )
    q = spark.createDataFrame([(99, bytearray(encode_wav(clip, rate)))], MEDIA_SCHEMA)
    matches = audio_match(
        audio_fingerprints(db), audio_fingerprints(q), min_votes=5
    ).collect()
    assert matches, "no match found"
    best = max(matches, key=lambda r: r.votes)
    assert best.db_id == 1
    # offset in frames ~= clip_start / HOP
    assert abs(best.offset - clip_start // HOP) <= 1
    # the decoy never gets a competitive vote count
    decoy = [r.votes for r in matches if r.db_id == 2]
    assert not decoy or max(decoy) < best.votes // 2
