"""GIF codec: LZW variable-width roundtrips, the KwKwK case, table
reset, interlace, sub-block framing, and a hand-derived byte anchor."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import sniff_decode_image
from dpe_energy_performance_analysis_etl_spark.multimodal.gif import (
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    encode_gif,
)


def test_hand_derived_2x2_anchor():
    """2x2 black/white checkerboard: every byte derived by hand from
    the GIF87a spec (min_code_size=2, codes [4,0,1,1,0,5] packed
    little-endian across the 3->4-bit width change)."""
    pal = b"\x00\x00\x00\xff\xff\xff"
    data = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
        + pal
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + b"\x02"          # min code size
        + b"\x03\x44\x02\x0a\x00"  # one 3-byte sub-block + terminator
        + b"\x3b"
    )
    px = decode_gif(data)
    expect = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]], dtype=np.uint8
    )
    assert (px == expect).all()
    # and the encoder reproduces the identical LZW payload
    assert encode_gif(expect) == data


def test_roundtrip_random_few_colors():
    rng = np.random.default_rng(3)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = rng.integers(0, 4, size=(23, 31))
    px = pal[idx]
    assert (decode_gif(encode_gif(px)) == px).all()


def test_roundtrip_256_gray_levels():
    # full 256-entry palette: min_code_size 8, widths 9..12 exercised
    g = np.tile(np.arange(256, dtype=np.uint8), (40, 2)).reshape(40, 512)
    px = np.stack([g] * 3, axis=-1)
    assert (decode_gif(encode_gif(px)) == px).all()


def test_roundtrip_large_repetitive_hits_table_reset():
    # >4096 dictionary entries forces the mid-stream clear path
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 8, size=(200, 300))
    pal = (np.arange(8)[:, None] * np.array([31, 17, 5])).astype(np.uint8)
    px = pal[idx]
    payload = encode_gif(px)
    assert (decode_gif(payload) == px).all()


def test_kwkwk_self_reference():
    # 'ababab...' drives the code == len(table) branch
    data = bytes([0, 1] * 200 + [0] * 50)
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_lzw_exhaustive_small_alphabets():
    rng = np.random.default_rng(5)
    for mcs in (2, 3, 4, 7):
        n = 1 << mcs
        data = bytes(rng.integers(0, min(n, 256), size=3000, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data


def test_sub_blocks_over_255():
    blob = bytes(range(256)) * 3
    framed = _sub_blocks(blob)
    # parse back
    out, pos = bytearray(), 0
    while framed[pos] != 0:
        ln = framed[pos]
        assert ln <= 255
        out += framed[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    assert bytes(out) == blob


def test_interlaced_decode():
    rng = np.random.default_rng(9)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = rng.integers(0, 2, size=(16, 8))
    px = pal[idx]
    plain = encode_gif(px)
    # rebuild as interlaced: permute rows into interlace order, set
    # the interlace flag; the decoder must undo the 4-pass shuffle
    h = 16
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    shuffled = px[order]
    enc = bytearray(encode_gif(shuffled))
    # image descriptor flag byte: 6 (header) + 7 (LSD) + 6 (palette)
    # + 1 (0x2c) + 8 = offset 27... compute: 13 + 6 pal + 1 + 8 = 28
    flag_off = 13 + 6 + 9
    assert enc[flag_off] == 0
    enc[flag_off] = 0x40
    got = decode_gif(bytes(enc))
    assert (got == px).all()
    assert (decode_gif(plain) == px).all()


def test_deinterlace_is_inverse_permutation():
    rows = np.arange(13)[:, None] * np.ones((1, 4), dtype=int)
    h = 13
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    assert (_deinterlace(rows[order]) == rows).all()


def test_too_many_colors_raises():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(px)


def test_gif89a_extensions_skipped():
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    px = pal[np.eye(4, dtype=int)]
    body = bytearray(encode_gif(px))
    # splice a Graphics Control Extension after the palette
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    insert_at = 13 + 6
    data = bytes(body[:insert_at]) + b"GIF89a"[0:0] + gce + bytes(body[insert_at:])
    data = b"GIF89a" + data[6:]
    assert (decode_gif(data) == px).all()


def test_sniff_dispatches_gif():
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    px = pal[np.zeros((3, 3), dtype=int)]
    assert (sniff_decode_image(encode_gif(px)) == px).all()


def test_truncated_payloads_raise_valueerror_not_indexerror():
    """Every truncation point must surface as the module's ValueError
    contract (sniff_decode_image dispatches on it) — the r6 version
    ran the sub-block scan loops off the end (IndexError)."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    px = pal[np.eye(6, dtype=int)]
    full = encode_gif(px)
    # splice in an extension so the extension-scan loop is also covered
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    full = full[: 13 + 6] + gce + full[13 + 6 :]
    assert (decode_gif(full) == px).all()
    for cut in range(6, len(full)):  # header sniff handles < 6
        # a cut past the image terminator but before the trailer still
        # holds a complete first frame — decoding it is correct; every
        # OTHER truncation must be ValueError, never Index/struct error
        try:
            got = decode_gif(full[:cut])
        except ValueError:
            continue
        assert (got == px).all(), f"cut={cut} decoded wrong pixels"
