"""Pure-numpy GIF87a/89a codec (CompuServe spec + the LZW variant it
mandates) — the fifth real image container next to PNG/BMP/PPM/JPEG
(`codecs.py`), chosen because GIF's variable-code-width LZW is the one
compression family the repo's codec suite didn't exercise yet
(deflate lives in PNG, DCT+Huffman in JPEG).

Scope (mirrors the reference repo's "decode the bytes a pipeline
actually meets" stance — reference analogue: the opaque-binary column
contract, SURVEY §2 multimodal):
  - encode: single-frame, global palette (≤256 colors, built from the
    image; raises past 256 — palette quantization is a separate
    concern), no interlace, no transparency, GIF87a header.
  - decode: single- or first-frame, global or local palette,
    non-interlaced or interlaced (the 4-pass row shuffle), skips
    87a/89a extensions (GCE, comments, application blocks).

LZW details the tests pin: initial code width = minimum-code-size+1,
clear/EOI codes, width grows AFTER code 2^w−1 is emitted (encoder)
/ table reaches 2^w (decoder), table reset at 4096, the KwKwK
self-referential case, and sub-block framing (≤255-byte chunks).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"


# ---------------------------------------------------------------------
# LZW (GIF flavor: little-endian bit packing, variable width 3..12)
# ---------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # width grows the moment the table SIZE reaches 2^width —
        # the decoder mirror checks len(table) == 1<<width after its
        # append, so the encoder must switch at the same code count
        # (one earlier than the tempting next_code == 2^width + 1,
        # the classic GIF-LZW off-by-one)
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(payload: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(payload):
                return bytes(out)  # tolerate missing EOI
            bitbuf |= payload[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        # the decoder's slot counter LEADS len(table) by one (the
        # entry for the current code is only completed when the NEXT
        # code arrives — giflib reserves the slot immediately), so
        # width grows when len(table)+1 reaches 2^width; counting
        # len(table) itself reads one code too late and desyncs from
        # the encoder (measured: every >2-code stream corrupts)
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out)


# ---------------------------------------------------------------------
# container
# ---------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> single-frame GIF87a with a global
    palette built from the image's distinct colors (≤256, else
    ValueError)."""
    if pixels.ndim == 2:
        pixels = np.stack([pixels] * 3, axis=-1)
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_gif expects uint8 (H, W, 3)")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed GIF's 256-entry palette")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors

    out = bytearray()
    out += _GIF87
    # logical screen descriptor: global table flag, color resolution,
    # table size bits
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4 | (bits - 1), 0, 0)
    out += pal.tobytes()
    # image descriptor (no local table, no interlace)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    out += _sub_blocks(_lzw_encode(inverse.astype(np.uint8).tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _byte_at(payload: bytes, pos: int) -> int:
    """Bounds-checked byte read: truncated payloads must surface as
    the module's ValueError contract (sniff_decode_image callers
    dispatch on it), never as a raw IndexError from running a
    sub-block scan off the end."""
    if pos >= len(payload):
        raise ValueError("truncated GIF")
    return payload[pos]


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a -> uint8 (H, W, 3) RGB."""
    if payload[:6] not in (_GIF87, _GIF89):
        raise ValueError(f"not a GIF (header {payload[:6]!r})")
    if len(payload) < 13:
        raise ValueError("truncated GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF")
        gpal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while _byte_at(payload, pos) != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        pal = gpal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF")
            pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
                -1, 3
            )
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no palette")
        min_code = _byte_at(payload, pos)
        pos += 1
        lzw = bytearray()
        while _byte_at(payload, pos) != 0:
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise ValueError("truncated GIF")
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), min_code)[: iw * ih], dtype=np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        frame = pal[idx]
        if (iw, ih) != (w, h):  # place sub-rectangle on canvas
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            canvas[iy : iy + ih, ix : ix + iw] = frame
            return canvas
        return frame
    raise ValueError("GIF contained no image data")
