"""Pure-numpy baseline JPEG codec (VERDICT r4 ask #7: "either document
JPEG as out-of-env or add a minimal baseline-JPEG decoder behind the
same sniff_decode_image seam" — this is the latter).

Implemented from the public ITU-T T.81 specification + JFIF: baseline
sequential DCT (SOF0), 8-bit samples, grayscale or YCbCr with any
standard sampling (4:4:4 / 4:2:2 / 4:2:0), restart markers, multiple
DQT/DHT segments. Progressive (SOF2), arithmetic coding, and 12-bit
precision raise a clear ``ValueError`` — they are out of scope for a
baseline decoder, and the sniffing front door reports them honestly.

The encoder exists so tests can generate REAL fixture bytes (the
container has no Pillow to make JPEGs with): quality-scaled Annex K
quantization tables, standard Annex K Huffman tables, optional 4:2:0
chroma subsampling. At quality=100 every quantizer is 1, so a
constant-color image round-trips bit-exactly — the test anchor that
doesn't depend on "looks close".

Scale shape: decode runs inside Arrow-batched ``mapInPandas`` stages
(multimodal/media.py), one Python call per image — the Huffman bit
loop is per-row cost, the distribution story is unchanged. Swap in
libjpeg-turbo via Pillow for production throughput; the seam and the
tests stay identical.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K base quantization tables (luminance, chrominance), natural order
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16] counts, symbol values)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# DCT-II basis matrix: block = C^T @ coeff @ C reconstructs pixels
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public libjpeg
    convention): quality 50 = base tables, 100 = all ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def scl(base):
        qt = (base * scale + 50) // 100
        return np.clip(qt, 1, 255)
    return scl(_QT_LUMA), scl(_QT_CHROMA)


def _build_decode_table(spec: tuple[list[int], list[int]]) -> dict[tuple[int, int], int]:
    """(code_length, code_value) -> symbol, canonical JPEG order."""
    counts, symbols = spec
    table: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    return {sym: (ln, code) for (ln, code), sym in _build_decode_table(spec).items()}


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0  # pad past EOI
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed byte
                else:
                    # real marker: pad with 1-bits (spec: fill bits)
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte; if positioned at a marker return its
        second byte and advance past it."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if m == 0x00:
                # stuffed 0xFF00 data byte (fill bits can legally
                # produce a 0xFF byte immediately before RSTn) —
                # skip the pair and keep scanning for the marker
                self.pos += 2
                continue
            self.pos += 2
            return m
        return None


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-JPEG bytes -> uint8 pixels ((H, W) gray or (H, W, 3)
    RGB via the JFIF YCbCr transform)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h_img = w_img = 0
    restart_interval = 0
    pos = 2
    data = payload

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored zigzag -> natural
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                table = _build_decode_table((counts, symbols))
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0}); "
                f"only baseline sequential (SOF0) is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            pos += seglen
            return _decode_scan(
                data, pos, scan, comps, qt, huff_dc, huff_ac,
                h_img, w_img, restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, scan, comps, qt, huff_dc, huff_ac, h_img, w_img, ri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                m = br.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected restart marker")
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(br, huff_dc[td])
                        diff = _extend(br.read_bits(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coeff = np.zeros(64, dtype=np.int64)
                        coeff[ZIGZAG] = zz
                        block = _idct2(
                            coeff.reshape(8, 8).astype(np.float64) * qt[comp["tq"]]
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        # nearest (replication) upsample to full grid
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        p = p[:h_img, :w_img] + 128.0
        out_planes.append(p)
    if len(out_planes) == 1:
        return np.clip(np.floor(out_planes[0] + 0.5), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# encoder (test-fixture generator; baseline, Annex K Huffman tables)
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category t, t-bit code) per T.81 encoding."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw, coeff_zz, pred, dc_tab, ac_tab):
    diff = int(coeff_zz[0]) - pred
    t, code = _magnitude(diff)
    ln, c = dc_tab[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeff_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeff_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, c = ac_tab[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        ln, c = ac_tab[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last_nz < 63:
        ln, c = ac_tab[0x00]  # EOB
        bw.write(c, ln)
    return int(coeff_zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample_chroma: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB -> baseline JFIF bytes.
    ``subsample_chroma`` writes 4:2:0 (Y at 2x2, box-averaged Cb/Cr);
    ``restart_interval`` > 0 emits DRI + RST0-7 markers every N MCUs
    (the resync points a parallel decoder shards on)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qy, qc = quality_tables(quality)
    qy_nat, qc_nat = qy.reshape(8, 8), qc.reshape(8, 8)

    if gray:
        planes = [pixels.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_chroma:
            # pad to even, box-average 2x2
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad_even(x):
                return np.pad(x, ((0, ph - h), (0, pw - w)), mode="edge")
            cb2 = pad_even(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr2 = pad_even(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y - 128.0, cb2 - 128.0, cr2 - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    dc_tabs = [_build_encode_table(_DC_LUMA_SPEC), _build_encode_table(_DC_CHROMA_SPEC)]
    ac_tabs = [_build_encode_table(_AC_LUMA_SPEC), _build_encode_table(_AC_CHROMA_SPEC)]

    bw = _BitWriter()
    preds = [0] * len(planes)
    qnat = [qy_nat, qc_nat]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        coeff = _fdct2(block)
                        q = qnat[qsel[ci]]
                        cq = np.sign(coeff) * np.floor(np.abs(coeff) / q + 0.5)
                        zz = cq.reshape(64)[ZIGZAG].astype(np.int64)
                        dc = _encode_block(
                            bw, zz, preds[ci], dc_tabs[tsel], ac_tabs[tsel]
                        )
                        preds[ci] = dc
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    def dqt(tq, nat):
        zz = nat.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += dqt(0, qy_nat)
    if not gray:
        out += dqt(1, qc_nat)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, qsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    def dht(tc, th, spec):
        counts, symbols = spec
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
