"""Multimodal (image/audio/video) column plumbing.

Media rows are (id, content: binary, media_type, metadata…). The
Spark-side contract — schemas, Arrow batch shapes, partition-friendly
mapInPandas transforms — is real and tested, and so is the default
decode path: ``multimodal.codecs`` implements PNG (stdlib zlib),
BMP, PPM/PGM and PCM-WAV from their public specs with no third-party
dependency, so ``decode_image_batch()`` / ``decode_audio_batch()``
return REAL byte→pixels / byte→samples decoders. Formats beyond
those containers (JPEG, MP3, H.264…) still need Pillow/libvips/
ffmpeg — swap the decoder callable in one place. ``fake=True``
substitutes a deterministic md5-expansion generator for tests that
want payload-agnostic plumbing checks.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that
batch_size × avg_payload fits executor memory (e.g. 256 rows × 4 MB
images ≈ 1 GB — set 64). Partition by content size or repartition to
spread hot shards before the UDF stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap opaque-binary metadata — JVM-side only (no decode):
    payload size, content hash, magic-header hex. This is the
    dedup/integrity layer that works on any modality."""
    c = F.col(content_col)
    return df.withColumns(
        {
            "n_bytes": F.length(c).cast("bigint"),
            "content_md5": F.md5(c),
            "header_hex": F.lower(F.hex(F.substring(c, 1, 8))),
        }
    )


_FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: expand the md5
    digest into a pseudo-pixel array. Same bytes → same 'pixels'."""
    digest = hashlib.md5(payload or b"").digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)


def decode_image_batch(fake: bool = False):
    """Return a decode function ``bytes -> np.ndarray``.

    Default: the real dependency-free decoder (PNG/BMP/PPM/PGM via
    ``multimodal.codecs.sniff_decode_image``, uint8 (H, W, C)).
    Formats outside those containers raise ``ValueError`` — wire
    Pillow/torchvision in their place for JPEG/WebP/etc."""
    if not fake:
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
            sniff_decode_image,
        )

        return sniff_decode_image
    return _fake_decode


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    fake_decode: bool = True,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched; flatMap
    semantics — rows with NULL content produce no output row).
    Output: (media_id, feature: array<float>[16], feat_norm)."""
    decode = decode_image_batch(fake=fake_decode)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
            T.StructField("feat_norm", T.DoubleType(), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                pixels = decode(bytes(payload))
                feat = np.asarray(pixels).ravel()[:_FEATURE_DIM].astype(np.float32)
                rows.append(
                    {
                        id_col: int(mid),
                        "feature": feat.tolist(),
                        "feat_norm": float(np.sqrt((feat.astype(np.float64) ** 2).sum())),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "feature", "feat_norm"]) if rows else pd.DataFrame(
                columns=[id_col, "feature", "feat_norm"]
            )

    return df.select(id_col, content_col).mapInPandas(featurize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (the decode of the actual frame is the stubbed step). Pure
    DataFrame explode — demonstrates the 1→N fan-out shape."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col(duration_col).cast("long"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


def decode_audio_batch(fake: bool = False):
    """Return an audio decode fn ``bytes -> np.ndarray`` (mono
    float32 in [-1, 1]). Default: real PCM-WAV decode
    (``multimodal.codecs.sniff_decode_audio``, stdlib ``wave``);
    compressed codecs (MP3/AAC/Opus) need soundfile/librosa/ffmpeg —
    swap the callable here."""
    if not fake:
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
            sniff_decode_audio,
        )

        return sniff_decode_audio

    def _fake(payload: bytes) -> np.ndarray:
        digest = hashlib.md5(payload or b"").digest() * 4
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5

    return _fake


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    frame_size: int = 16,
    fake_decode: bool = True,
) -> DataFrame:
    """Audio feature extraction: decode → frame → per-frame RMS energy
    (the spectrogram-shaped plumbing; real STFT drops in where the
    decode stub does). One output row per frame — 1→N mapInPandas,
    same shape as the video frame sampler."""
    decode = decode_audio_batch(fake=fake_decode)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("rms_energy", T.DoubleType(), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                samples = decode(bytes(payload))
                n_frames = len(samples) // frame_size
                for i in range(n_frames):
                    frame = samples[i * frame_size : (i + 1) * frame_size].astype(np.float64)
                    rows.append(
                        {
                            id_col: int(mid),
                            "frame_idx": i,
                            "rms_energy": float(np.sqrt((frame**2).mean())),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "rms_energy"]) if rows else pd.DataFrame(
                columns=[id_col, "frame_idx", "rms_energy"]
            )

    return df.select(id_col, content_col).mapInPandas(featurize, schema=out_schema)


def read_media_dir(
    spark,
    path: str,
    glob: str | None = None,
    with_metadata: bool = True,
) -> DataFrame:
    """Ingest raw media files via Spark's built-in ``binaryFile``
    source: one row per file with (path, modificationTime, length,
    content) — the real on-disk entry point for the multimodal layer
    (images/audio/video land as files; this turns a directory into
    the opaque-binary DataFrame every operator here consumes).

    Scale notes: the source parallelizes by file (one task per split
    set of files), prunes on the ``pathGlobFilter``, and NEVER decodes
    — pair with ``binary_metadata`` for integrity/dedup and the
    ``mapInPandas`` featurizers for decode. Filters on length/path
    push down to the file index, so "skip files > 100 MB" costs a
    listing, not a read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if with_metadata:
        df = binary_metadata(df)
    return df


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    content_col: str = "content",
    id_col: str = "media_id",
    method: str = "bilinear",
    fake_decode: bool = False,
) -> DataFrame:
    """Batch image resize (the decode→resize→re-encode preprocessing
    stage of every vision-model pipeline): mapInPandas over the
    binary column, pure-numpy bilinear/nearest kernels
    (``codecs.resize_bilinear``/``resize_nearest``; Pillow/opencv
    swap in behind the same decode hook), output re-encoded as PNG
    plus the new dims. Arrow-batched, no driver involvement; rows
    with NULL or undecodable content are dropped (flatMap semantics,
    same contract as ``extract_features``)."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
        encode_png,
        resize_bilinear,
        resize_nearest,
    )

    if method not in ("bilinear", "nearest"):
        raise ValueError(f"unknown resize method {method!r}")
    kernel = resize_bilinear if method == "bilinear" else resize_nearest
    decode = decode_image_batch(fake=fake_decode)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                try:
                    pixels = decode(bytes(payload))
                except ValueError:
                    continue
                resized = kernel(np.asarray(pixels), out_h, out_w)
                rows.append(
                    {
                        id_col: int(mid),
                        "content": encode_png(resized),
                        "height": out_h,
                        "width": out_w,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "content", "height", "width"]) if rows else pd.DataFrame(
                columns=[id_col, "content", "height", "width"]
            )

    return df.select(id_col, content_col).mapInPandas(work, schema=out_schema)


def extract_raw_frames(
    df: DataFrame,
    width: int,
    height: int,
    every_n: int = 5,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL frame extraction for rawvideo payloads (RGB24 frames
    concatenated back-to-back — ffmpeg's ``rawvideo`` / ``-pix_fmt
    rgb24`` format, the one video container decodable with zero
    dependencies): every ``every_n``-th frame is sliced out and
    re-encoded as PPM so it flows straight into the existing image
    pipeline (``resize_images``, ``extract_features``). Compressed
    containers (H.264/VP9) need PyAV/ffmpeg — swap the slicer behind
    the same mapInPandas hook; the Spark-side contract (binary in,
    1→N frame rows out, Arrow-batched, no driver involvement) is
    what this operator pins down.

    Truncated trailing bytes are dropped (a partial frame is not a
    frame); NULL/short payloads yield zero rows (flatMap contract).
    """
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm

    frame_bytes = width * height * 3
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    raw = payload[idx * frame_bytes : (idx + 1) * frame_bytes]
                    pixels = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
                    rows.append((mid, idx, encode_ppm(pixels), height, width))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "content", "height", "width"])

    return df.select(id_col, content_col).mapInPandas(work, out_schema)


def _dhash64(pixels: np.ndarray) -> int:
    """Difference hash (dHash, 64-bit): grayscale-reduce, resize to
    9x8 with the deterministic nearest-neighbor kernel, set bit (r,c)
    iff pixel[r, c] < pixel[r, c+1]. INTEGER end to end (integer
    grayscale via the BT.601 29/150/77 >> 8 fixed-point weights, no
    float resampling), so the hash is bit-identical everywhere."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import resize_nearest

    if pixels.ndim == 1:
        # stub-decoder path (flat digest array): square it up
        side = max(int(len(pixels) ** 0.5), 1)
        pixels = pixels[: side * side].reshape(side, side)
    if pixels.ndim == 3:
        r = pixels[:, :, 0].astype(np.int64)
        g = pixels[:, :, 1].astype(np.int64)
        b = pixels[:, :, 2].astype(np.int64)
        gray = (77 * r + 150 * g + 29 * b) >> 8
    else:
        gray = pixels.astype(np.int64)
    small = resize_nearest(gray[:, :, None].astype(np.uint8), 8, 9)[:, :, 0].astype(
        np.int64
    )
    h = 0
    for r_ in range(8):
        for c in range(8):
            h = (h << 1) | int(small[r_, c] < small[r_, c + 1])
    # two's-complement into int64 so Spark's bigint holds it
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(
    df: DataFrame, content_col: str = "content", fake: bool = False
) -> DataFrame:
    """Adds ``dhash`` (bigint): the 64-bit difference hash of each
    image payload — the standard perceptual near-dup key for image
    corpora (small crops/recompressions/brightness shifts keep most
    bits; exact byte-hash dedup catches none of those). Arrow-batched
    mapInPandas over the stdlib codecs (``fake=True`` uses the
    deterministic stub decoder, the no-image-libs test path)."""
    decode = _fake_decode if fake else None

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
            sniff_decode_image,
        )

        dec = decode or sniff_decode_image
        for pdf in batches:
            hashes = []
            for payload in pdf[content_col]:
                try:
                    hashes.append(_dhash64(dec(bytes(payload))))
                except Exception:
                    hashes.append(None)
            out = pdf.copy()
            out["dhash"] = pd.array(hashes, dtype="Int64")
            yield out

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("dhash", T.LongType())]
    )
    return df.mapInPandas(work, schema=schema)


def dhash_near_dup_groups(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    max_hamming: int = 2,
    fake: bool = False,
) -> DataFrame:
    """Near-duplicate image pairs by dHash hamming distance <=
    ``max_hamming``: candidates come from BANDED equality (the 64-bit
    hash splits into max_hamming+1 bands of 64//(max_hamming+1) bits;
    the top remainder bits are uncovered — harmless for recall, since
    a differing uncovered bit dirties no band — and pigeonhole
    guarantees any pair within the radius agrees on at least one
    band), verified with an exact popcount on the XOR. The LSH discipline applied to
    perceptual hashes: candidate volume is bounded per band bucket,
    never all-pairs. Returns (id_a, id_b, hamming)."""
    hashed = image_dhash(df, content_col, fake).select(
        F.col(id_col).alias("iid"), "dhash"
    ).where(F.col("dhash").isNotNull())
    hashed = hashed.cache()
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), b * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    posted = hashed.select("iid", "dhash", F.explode(bands).alias("b")).select(
        "iid", "dhash", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    cand = (
        posted.alias("a")
        .join(posted.alias("b"), ["band", "key"])
        .where(F.col("a.iid") < F.col("b.iid"))
        .select(
            F.col("a.iid").alias("id_a"),
            F.col("b.iid").alias("id_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dhash_dup_summary(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    max_hamming: int = 2,
    fake: bool = False,
) -> DataFrame:
    """Scale-sane form of the dHash near-dup report. Measured lesson
    (sf5 synthetic corpus): emitting raw pairs is OUTPUT-bound — a
    cluster of m visually identical images has ~m²/2 true pairs
    (8.1 M pairs / 47 s at sf5, all honest work nobody wants). This
    variant collapses exact-hash groups FIRST (one groupBy: the
    representative id + member count), then runs the banded hamming
    join over DISTINCT hashes only — output is one row per
    near-duplicate HASH pair, weighted by the two cluster sizes
    (pair_count = n_a * n_b tells downstream how many raw pairs the
    row stands for). Feed the exact groups + these edges to the CC
    operator for full clusters."""
    hashed = (
        image_dhash(df, content_col, fake)
        .where(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min(id_col).alias("rep_id"))
        .cache()
    )
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), b * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    posted = hashed.select("dhash", "n_members", "rep_id", F.explode(bands).alias("b")).select(
        "dhash", "n_members", "rep_id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    cand = (
        posted.alias("a")
        .join(posted.alias("b"), ["band", "key"])
        .where(F.col("a.dhash") < F.col("b.dhash"))
        .select(
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
            F.col("a.rep_id").alias("rep_a"),
            F.col("b.rep_id").alias("rep_b"),
            F.col("a.n_members").alias("n_a"),
            F.col("b.n_members").alias("n_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select(
            "rep_a", "rep_b", "hamming", "n_a", "n_b",
            (F.col("n_a") * F.col("n_b")).alias("pair_count"),
        )
    )


_DCT32 = None


def _dct32_matrix() -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        n = 32
        m = np.zeros((n, n), dtype=np.float64)
        for k in range(n):
            a = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
            for i in range(n):
                m[k, i] = a * np.cos((2 * i + 1) * k * np.pi / (2 * n))
        _DCT32 = m
    return _DCT32


def _phash64(pixels: np.ndarray) -> int:
    """Perceptual hash (pHash, 64-bit): grayscale → 32×32 nearest
    resize → 2-D DCT-II → top-left 8×8 low-frequency block minus the
    DC term → bit = coefficient > median. Robust to blur/resize/
    recompression where dHash's neighbor gradients get noisy; the
    float DCT is deterministic per platform (this family is rows-only
    by design, like dHash — decode isn't SQL)."""
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import resize_nearest

    if pixels.ndim == 1:
        side = max(int(len(pixels) ** 0.5), 1)
        pixels = pixels[: side * side].reshape(side, side)
    if pixels.ndim == 3:
        r = pixels[:, :, 0].astype(np.int64)
        g = pixels[:, :, 1].astype(np.int64)
        b = pixels[:, :, 2].astype(np.int64)
        gray = (77 * r + 150 * g + 29 * b) >> 8
    else:
        gray = pixels.astype(np.int64)
    small = resize_nearest(gray[:, :, None].astype(np.uint8), 32, 32)[:, :, 0]
    m = _dct32_matrix()
    coeff = m @ small.astype(np.float64) @ m.T
    block = coeff[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    h = 0
    for v in block:
        h = (h << 1) | int(v > med)
    h <<= 1  # pad to 64 bits (63 comparisons)
    return h - (1 << 64) if h >= (1 << 63) else h


def image_phash(
    df: DataFrame, content_col: str = "content", fake: bool = False
) -> DataFrame:
    """Adds ``phash`` (bigint): the DCT perceptual hash — the blur/
    rescale-robust sibling of ``image_dhash`` (same mapInPandas
    contract, same codecs)."""
    decode = _fake_decode if fake else None

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
            sniff_decode_image,
        )

        dec = decode or sniff_decode_image
        for pdf in batches:
            hashes = []
            for payload in pdf[content_col]:
                try:
                    hashes.append(_phash64(dec(bytes(payload))))
                except Exception:
                    hashes.append(None)
            out = pdf.copy()
            out["phash"] = pd.array(hashes, dtype="Int64")
            yield out

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("phash", T.LongType())]
    )
    return df.mapInPandas(work, schema=schema)


def hash_near_dup_pairs(
    hashed: DataFrame,
    hash_col: str,
    id_col: str = "path",
    max_hamming: int = 2,
) -> DataFrame:
    """Banded near-dup matcher over ANY 64-bit perceptual hash column
    (dhash, phash, audio hashes): max_hamming+1 bands of
    64//(max_hamming+1) bits (top remainder uncovered — harmless for
    recall), pigeonhole candidates, exact popcount verify. The
    generalization of the dHash-specific matcher so every hash family
    shares one banding implementation."""
    hashed = hashed.select(
        F.col(id_col).alias("iid"), F.col(hash_col).alias("h")
    ).where(F.col("h").isNotNull()).cache()
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("h"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    posted = hashed.select("iid", "h", F.explode(bands).alias("b")).select(
        "iid", "h", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    cand = (
        posted.alias("a")
        .join(posted.alias("b"), ["band", "key"])
        .where(F.col("a.iid") < F.col("b.iid"))
        .select(
            F.col("a.iid").alias("id_a"),
            F.col("b.iid").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def frame_luma_features(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-frame mean luma for rawvideo payloads, INTEGER end to end:
    BT.601 fixed-point luma summed exactly, divided by the pixel count
    with int64 floor division — (media_id, frame_idx, mean_luma), the
    feature table scene-cut detection runs on. Every frame, one row
    (no sampling — the cut detector needs adjacent frames)."""
    frame_bytes = width * height * 3
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("mean_luma", T.LongType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch[id_col], batch[content_col]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for idx in range(n_frames):
                    raw = np.frombuffer(
                        payload[idx * frame_bytes : (idx + 1) * frame_bytes],
                        dtype=np.uint8,
                    ).astype(np.int64).reshape(height, width, 3)
                    luma = (
                        77 * raw[:, :, 0] + 150 * raw[:, :, 1] + 29 * raw[:, :, 2]
                    ) >> 8
                    rows.append((mid, idx, int(luma.sum()) // (width * height)))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "mean_luma"])

    return df.select(id_col, content_col).mapInPandas(work, out_schema)


def scene_cut_detect(
    features: DataFrame,
    threshold: int = 40,
    id_col: str = "media_id",
) -> DataFrame:
    """Scene-cut detection over a per-frame feature table: a cut at
    frame i when |feature(i) − feature(i−1)| > threshold — one lag
    window per video, pure SQL over whatever features the decode
    stage emitted (mean luma here; histograms/embeddings drop in).
    Returns (media_id, frame_idx, delta) for cut frames."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    delta = F.abs(F.col("mean_luma") - F.lag("mean_luma").over(w))
    return (
        features.withColumn("delta", delta)
        .where(F.col("delta") > threshold)
        .select(id_col, "frame_idx", F.col("delta").cast("bigint").alias("delta"))
    )
