"""Mutation fuzz for the PNG decoder and the AVI container walker —
the sibling of tests/test_jpeg.py::test_decoder_never_hangs_on_mutations.

At ingest scale (10^12 payload rows) truncated or bit-rotted blobs WILL
appear; the decode contract is: return SOME array or raise promptly
from a small controlled exception set — never hang, never segfault,
never leak an uncontrolled exception type into verify_payloads.
Deterministic mutation schedules, no RNG.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from proj_spark.sources.avi import read_avi_frames, write_avi_mjpeg
from proj_spark.sources.images import (
    decode_png,
    encode_png,
    synth_pixels,
)
from proj_spark.sources.jpeg import encode_jpeg

# the controlled failure modes: explicit validation (ValueError),
# running off a buffer (IndexError / struct.error), corrupt DEFLATE
# stream (zlib.error).  numpy reshape of a short buffer raises
# ValueError.  Anything else is a real bug.
CONTROLLED = (ValueError, IndexError, struct.error, zlib.error)


def _mutations(base: bytes, n_cuts: int = 23, n_flips: int = 37):
    for cut in range(1, len(base), max(len(base) // n_cuts, 1)):
        yield base[:cut]
    for pos in range(2, len(base), max(len(base) // n_flips, 1)):
        mutated = bytearray(base)
        mutated[pos] ^= 0x5A
        yield bytes(mutated)


def test_png_decoder_never_hangs_on_mutations():
    base = encode_png(synth_pixels(11, 24, 24))
    survived = total = 0
    for data in _mutations(base):
        total += 1
        try:
            px = decode_png(data)
            assert px.dtype == np.uint8
            survived += 1
        except CONTROLLED:
            pass
    # PNG is CRC-less in our decoder, so flips inside IDAT may still
    # inflate to a valid-length stream (garbage pixels are fine);
    # structural damage must raise from the controlled set
    assert 0 <= survived < total


def test_png_decoder_rejects_non_png_and_interlaced():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    data = bytearray(encode_png(synth_pixels(3, 8, 8)))
    # IHDR body starts at offset 16; interlace flag is its 13th byte
    data[16 + 12] = 1
    # re-seal the CRC so only the interlace flag differs
    body = bytes(data[12:16]) + bytes(data[16 : 16 + 13])
    data[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(bytes(data))


def test_avi_walker_never_hangs_on_mutations():
    frames = [encode_jpeg(synth_pixels(i, 16, 16)) for i in range(4)]
    base = write_avi_mjpeg(frames, 16, 16)
    for data in _mutations(base, n_cuts=29, n_flips=43):
        try:
            out = list(read_avi_frames(data))
            # whatever survives must still be (idx, bytes, codec) rows
            for idx, payload, codec in out:
                assert isinstance(idx, int) and isinstance(codec, str)
        except CONTROLLED:
            pass


def test_avi_walker_rejects_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        list(read_avi_frames(b"\x00" * 32))
    with pytest.raises(ValueError, match="RIFF"):
        list(read_avi_frames(b"RIFF\x04\x00\x00\x00WAVE"))
