"""Audio fingerprinting and matching (the Shazam constellation-hash
scheme — Wang, ISMIR 2003, public paper): STFT magnitude peaks per
time frame, anchor→target peak pairs hashed as (f1, f2, Δt), matched
by hash equi-join + time-offset voting.

Why this shape at scale: the fingerprint table is (hash, track, t) —
matching a query is ONE equi-join on the 32-bit hash followed by a
(track, offset) count aggregation; the winning track shows a sharp
vote spike at the true offset. No DTW, no pairwise audio comparison —
the same bounded-candidate discipline as every dedup operator here,
applied to audio identity/dedup (find re-encoded or clipped copies in
a crawl).

Decode is stdlib WAV (multimodal/codecs.py); the FFT is numpy's —
deterministic per platform, which is all the rows-only media family
needs (decode isn't SQL; the matcher's join+vote layer IS relational
and is exercised by the tests end-to-end on synthesized audio).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

FRAME = 1024
HOP = 512
FAN_OUT = 5          # target peaks paired per anchor
MAX_DT = 64          # max frame distance anchor -> target
N_BANDS = 6          # one peak kept per log-ish band per frame


def _peaks(samples: np.ndarray) -> list[tuple[int, int]]:
    """(frame_idx, freq_bin) constellation: per frame, the strongest
    bin in each of N_BANDS fixed bands of the 512-bin half-spectrum —
    band-split keeps peaks spread across the spectrum instead of
    clustering at the loudest formant."""
    n_frames = max((len(samples) - FRAME) // HOP + 1, 0)
    edges = np.linspace(0, FRAME // 2, N_BANDS + 1, dtype=np.int64)
    out: list[tuple[int, int]] = []
    window = np.hanning(FRAME)
    for t in range(n_frames):
        frame = samples[t * HOP : t * HOP + FRAME].astype(np.float64) * window
        mag = np.abs(np.fft.rfft(frame))[: FRAME // 2]
        for b in range(N_BANDS):
            lo, hi = int(edges[b]), int(edges[b + 1])
            if hi <= lo:
                continue
            j = int(np.argmax(mag[lo:hi])) + lo
            if mag[j] > 0:
                out.append((t, j))
    return out


def _hashes(peaks: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """(hash, t1) pairs: anchor (t1, f1) paired with the next FAN_OUT
    peaks within MAX_DT frames; hash packs (f1, f2, dt) into 32 bits
    (9 + 9 + 14)."""
    out = []
    for i, (t1, f1) in enumerate(peaks):
        paired = 0
        for t2, f2 in peaks[i + 1 :]:
            dt = t2 - t1
            if dt <= 0:
                continue
            if dt > MAX_DT:
                break
            h = ((f1 & 0x1FF) << 23) | ((f2 & 0x1FF) << 14) | (dt & 0x3FFF)
            out.append((h, t1))
            paired += 1
            if paired >= FAN_OUT:
                break
    return out


def audio_fingerprints(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, fp_hash, t1) fingerprint table from WAV payloads —
    Arrow-batched mapInPandas, one row per constellation hash."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("fp_hash", T.LongType(), False),
            T.StructField("t1", T.IntegerType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
            sniff_decode_audio,
        )

        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                try:
                    samples = sniff_decode_audio(bytes(payload))
                except ValueError:
                    continue
                for h, t1 in _hashes(_peaks(samples)):
                    rows.append((int(mid), h, t1))
            yield pd.DataFrame(rows, columns=[id_col, "fp_hash", "t1"])

    return df.select(id_col, content_col).mapInPandas(work, out_schema)


def audio_match(
    db_fp: DataFrame,
    query_fp: DataFrame,
    min_votes: int = 5,
    id_col: str = "media_id",
) -> DataFrame:
    """Match query fingerprints against a database fingerprint table:
    equi-join on fp_hash, vote on (db track, time offset), keep
    offsets with ≥ min_votes aligned hashes. A true match concentrates
    votes at ONE offset; random collisions scatter. Returns
    (query_id, db_id, offset, votes) sorted by votes descending via
    the caller. Pure relational — this layer scales like any
    hash-keyed join."""
    db = db_fp.select(
        F.col(id_col).alias("db_id"), "fp_hash", F.col("t1").alias("db_t1")
    )
    q = query_fp.select(
        F.col(id_col).alias("query_id"), "fp_hash", F.col("t1").alias("q_t1")
    )
    return (
        q.join(db, "fp_hash")
        .groupBy(
            "query_id", "db_id", (F.col("db_t1") - F.col("q_t1")).alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
        .where(F.col("votes") >= min_votes)
    )
