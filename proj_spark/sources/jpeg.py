"""Baseline JPEG codec (ITU-T T.81 / JFIF), pure numpy + stdlib.

The input_hint contract requires "decoded-pixel allclose (PSNR>=40dB
for lossy)" over binary image payloads, and the video lane stores
MJPEG frames inside a real AVI container (``sources/avi.py``).  No
image library ships in this container, so this module implements the
public baseline-sequential JPEG spec directly:

- :func:`encode_jpeg`: RGB -> JFIF YCbCr (BT.601, full range), 4:4:4
  (no chroma subsampling), 8x8 level-shifted blocks, orthonormal
  2-D DCT (one einsum over all blocks), Annex-K quantization tables
  scaled by the IJG quality formula, zigzag, DC-differential + AC
  run-length Huffman coding with the Annex-K standard tables, byte
  stuffing, JFIF marker structure (SOI APP0 DQT SOF0 DHT SOS EOI).
- :func:`decode_jpeg`: full marker parse (tables are read from the
  bitstream, not assumed), canonical Huffman decode over an
  unpacked-bit array, dequantize, inverse zigzag, IDCT, YCbCr->RGB.

Scope: baseline sequential, 8-bit, single scan, sampling factors up
to 2x2 — i.e. 4:4:4 (the encoder default, used by the PSNR>=40
payload gate), 4:2:2, and 4:2:0 (what stock encoders usually emit;
chroma upsampled by replication on decode) — for 1- or 3-component
images; progressive and restart-interval streams raise ValueError.  Everything is deterministic:
encoding the same pixels twice yields identical bytes (no timestamps,
fixed tables), per the repo-wide reproducibility rule.

Correctness is self-contained — DQT and DHT segments are embedded in
the stream and the decoder builds its tables from them, so roundtrip
fidelity never depends on table constants; the Annex-K tables only
set the rate/quality point.  A module self-check asserts each AC
table covers exactly the emittable symbol set (EOB, ZRL, 16 runs x
10 sizes) so encoding can never hit a missing code.

Scale note: this is the reference codec for correctness tests and the
PSNR gate; it is pure Python per image (~ms for 32x32).  At 10^12-row
production scale the decode call sites (`decode_image`) are the
single swap point for libjpeg-turbo — the Spark plumbing (schemas,
mapInPandas batching, AVI container walk) is unchanged.

Reference parity note: PROJ has no image codec; this file exists for
the graft's image-payload axis (BASELINE.json input_hint), not for
reference parity.
"""
from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ tables
# Annex K.1 / K.2 quantization tables (natural row-major order).
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
).reshape(8, 8)

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
).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation (T.81 fig. 5): anti-diagonals,
    odd sums row-ascending, even sums row-descending."""
    coords = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        coords.extend(diag if s % 2 == 1 else diag[::-1])
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


_ZZ = _zigzag_order()  # natural index for each zigzag position
_UNZZ = np.argsort(_ZZ)  # zigzag position for each natural index

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Self-check: the AC tables must cover every symbol the encoder can
# emit — EOB (0x00), ZRL (0xF0), and (run<<4)|size for run 0..15,
# size 1..10.  A garbled table would otherwise fail at encode time.
_AC_SYMBOLS = {0x00, 0xF0} | {
    (r << 4) | s for r in range(16) for s in range(1, 11)
}
for _bits, _vals in (
    (_AC_LUMA_BITS, _AC_LUMA_VALS),
    (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals) == 162, "AC Huffman table length"
    assert set(_vals) == _AC_SYMBOLS, "AC Huffman table symbol coverage"
for _bits, _vals in (
    (_DC_LUMA_BITS, _DC_LUMA_VALS),
    (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals) == 12, "DC Huffman table length"


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 C.2): sym -> (code, length)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return table


_ENC_DC = (_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

# Orthonormal 8x8 DCT-II matrix: T @ block @ T.T == T.81 FDCT
# (1/4 C(u)C(v) double sum), because row 0 is 1/sqrt(8) and rows i>0
# are 1/2 cos((2j+1) i pi / 16).
_DCT = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _DCT[_i, _j] = np.cos((2 * _j + 1) * _i * np.pi / 16.0) * (
            np.sqrt(1.0 / 8.0) if _i == 0 else 0.5
        )


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling, clamped to 8-bit table precision."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------------ encoder
class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padding, stuffed like any data byte) and emit
        RSTn — markers themselves are never stuffed (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (nby*nbx, 8, 8) in raster block order; H, W % 8 == 0."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _mag_bits(v: int) -> tuple[int, int]:
    """T.81 magnitude category coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 RGB -> YCbCr (float64, same shape)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rgb_to_ycbcr`, clipped to uint8."""
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


_SAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _emit_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int, t: int) -> int:
    """Entropy-code one zigzagged quantized block; returns its DC."""
    enc_dc, enc_ac = _ENC_DC[t], _ENC_AC[t]
    dc = int(zz[0])
    size, mbits = _mag_bits(dc - prev_dc)
    code, length = enc_dc[size]
    bw.write(code, length)
    bw.write(mbits, size)
    nz = np.nonzero(zz[1:])[0] + 1
    last = 0
    for pos in nz:
        run = int(pos) - last - 1
        while run >= 16:
            code, length = enc_ac[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, mbits = _mag_bits(int(zz[pos]))
        code, length = enc_ac[(run << 4) | size]
        bw.write(code, length)
        bw.write(mbits, size)
        last = int(pos)
    if last != 63:
        code, length = enc_ac[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(
    px: np.ndarray,
    quality: int = 98,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) or (H, W) uint8 array as baseline JFIF JPEG
    (single scan, standard tables scaled to ``quality``).

    ``subsampling``: '444' (default — every pixel keeps its chroma;
    what the PSNR>=40 payload gate uses), '422' (chroma halved
    horizontally), or '420' (halved both ways — the common rate point
    of stock encoders; expect chroma-limited PSNR on colorful
    content).

    ``restart_interval``: if > 0, emit a DRI segment and an RSTn
    marker every that-many MCUs (what camera MJPEG streams do so a
    corrupted packet only loses one restart interval)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3):
        raise ValueError(f"expected 1 or 3 channels, got {ncomp}")
    if not (0 < w <= 65535 and 0 < h <= 65535):
        raise ValueError("image dimensions out of JPEG range")
    if subsampling not in _SAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SAMPLING)}")
    samp = [(1, 1)] if ncomp == 1 else _SAMPLING[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # pad to MCU multiples by edge replication (minimizes ringing)
    ph, pw = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    if (ph, pw) != (h, w):
        px = np.pad(px, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    if ncomp == 3:
        full = rgb_to_ycbcr(px)
    else:
        full = px.astype(np.float64)
    qts = [_quality_scale(_QT_LUMA, quality), _quality_scale(_QT_CHROMA, quality)]

    # per-component planes (chroma box-averaged down to its sampling),
    # then FDCT + quantization vectorized over all blocks at once
    comp_zz: list[np.ndarray] = []
    comp_cols: list[int] = []
    for c in range(ncomp):
        hc, vc = samp[c]
        plane = full[..., c]
        fy, fx = vmax // vc, hmax // hc
        if fy > 1 or fx > 1:
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        blocks = _blockify(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qts[0] if c == 0 else qts[1]
        quant = np.rint(coef / q).astype(np.int64)
        comp_zz.append(quant.reshape(-1, 64)[:, _ZZ])
        comp_cols.append(plane.shape[1] // 8)

    # entropy coding: interleaved MCUs, h x v blocks per component in
    # raster order within each MCU (T.81 A.2.3)
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart(n_rst)
            n_rst += 1
            prev_dc = [0] * ncomp
        my, mx = divmod(m, mcux)
        for c in range(ncomp):
            hc, vc = samp[c]
            for sy in range(vc):
                for sx in range(hc):
                    idx = (my * vc + sy) * comp_cols[c] + (mx * hc + sx)
                    prev_dc[c] = _emit_block(
                        bw, comp_zz[c][idx], prev_dc[c], 0 if c == 0 else 1
                    )
    entropy = bw.flush()

    # marker structure
    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _segment(0xFFDB, b"\x00" + bytes(qts[0].reshape(-1)[_ZZ].tolist()))
    if ncomp == 3:
        out += _segment(0xFFDB, b"\x01" + bytes(qts[1].reshape(-1)[_ZZ].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hc, vc = samp[c]
        sof += bytes([c + 1, (hc << 4) | vc, 0 if c == 0 else 1])
    out += _segment(0xFFC0, sof)
    out += _segment(0xFFC4, _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _segment(0xFFC4, _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if ncomp == 3:
        out += _segment(0xFFC4, _dht_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _segment(0xFFC4, _dht_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += _segment(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])  # DC/AC table ids
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += _segment(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder
_POW2 = (1 << np.arange(32, dtype=np.int64))[::-1]


class _BitReader:
    """Bit cursor over byte-unstuffed entropy data (numpy bit array)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self.bits[self.pos : self.pos + n]
        if len(chunk) < n:
            raise ValueError("truncated entropy data")
        self.pos += n
        return int(chunk @ _POW2[32 - n :])


def _build_decode_table(bits: list[int], vals: list[int]) -> list[dict[int, int]]:
    """length -> {code: symbol} (index 0 unused)."""
    table: list[dict[int, int]] = [dict() for _ in range(17)]
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[length][code] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _decode_huff(br: _BitReader, table: list[dict[int, int]]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table[length].get(code)
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a size-bit magnitude code to its value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 JPEG produced by :func:`encode_jpeg`
    (or any other encoder within the supported scope) to (H, W, 3)
    uint8 RGB — or (H, W) luma for 1-component streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[dict[int, int]]] = {}
    h = w = 0
    restart_interval = 0
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, qtable_id)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_table, ac_table)
    entropy_start = -1

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xFFDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zzt = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = zzt  # DQT stores zigzag order
                qtables[tq] = nat.reshape(8, 8)
                o += 65
        elif marker == 0xFFC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(nf):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                hc, vc = samp >> 4, samp & 0x0F
                if hc not in (1, 2) or vc not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hc}x{vc} unsupported (1..2 only)"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            by_id = {cid: i for i, (cid, _, _) in enumerate(comps)}
            for s in range(ns):
                cid, tabs = body[1 + 2 * s], body[2 + 2 * s]
                scan.append((by_id[cid], tabs >> 4, tabs & 0x0F))
            entropy_start = pos + 2 + seglen
            break
        # other segments (APPn, COM) are skipped
        pos += 2 + seglen

    if entropy_start < 0 or not comps:
        raise ValueError("no scan found")

    # isolate + unstuff entropy data (ends at the next real marker);
    # RSTn markers split it into independently byte-aligned segments
    end = entropy_start
    segments: list[bytes] = []
    raw = bytearray()
    n_data = len(data)
    while end < n_data:
        b = data[end]
        if b == 0xFF:
            nxt = data[end + 1] if end + 1 < n_data else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                end += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart: new segment, reset below
                segments.append(bytes(raw))
                raw = bytearray()
                end += 2
                continue
            break
        raw.append(b)
        end += 1
    segments.append(bytes(raw))

    br = _BitReader(segments[0])
    seg_i = 0
    ncomp = len(comps)
    samp = [(s >> 4, s & 0x0F) for _, s, _ in comps]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * vc, mcux * 8 * hc)) for hc, vc in samp
    ]
    prev_dc = [0] * ncomp
    idct_t = _DCT.T

    def read_block(dct, act, q, ci):
        zz = np.zeros(64, dtype=np.float64)
        size = _decode_huff(br, dct)
        prev_dc[ci] += _extend(br.read_bits(size), size)
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            rs = _decode_huff(br, act)
            if rs == 0x00:  # EOB
                break
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC index overrun")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        block = np.zeros(64)
        block[_ZZ] = zz
        return idct_t @ (block.reshape(8, 8) * q) @ _DCT + 128.0

    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment in entropy data")
            br = _BitReader(segments[seg_i])
            prev_dc = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, dc_t, ac_t in scan:
            q = qtables[comps[ci][2]]
            dct = huff[(0, dc_t)]
            act = huff[(1, ac_t)]
            hc, vc = samp[ci]
            for sy in range(vc):
                for sx in range(hc):
                    pix = read_block(dct, act, q, ci)
                    y0 = (my * vc + sy) * 8
                    x0 = (mx * hc + sx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix

    # upsample subsampled components to full resolution (replication)
    out_planes = []
    for ci in range(ncomp):
        hc, vc = samp[ci]
        p = planes[ci]
        if vc < vmax:
            p = np.repeat(p, vmax // vc, axis=0)
        if hc < hmax:
            p = np.repeat(p, hmax // hc, axis=1)
        out_planes.append(p[:h, :w])

    if ncomp == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(out_planes, axis=-1))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
