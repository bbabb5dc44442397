"""EXIF APP1 lane: TIFF IFD writer/reader roundtrips, byte-order
handling, orientation-group algebra, splice compatibility with the
baseline JPEG codec, and the narrow Spark extraction stage.

The segment layout follows the public CIPA DC-008 / TIFF 6.0 specs;
the JPEG marker walk matches sources/jpeg.py (which skips APPn, so
spliced payloads stay decodable unchanged).
"""
import struct

import numpy as np
import pytest

from proj_spark.sources.exif import (
    build_app1,
    extract_exif,
    extract_exif_bytes,
    gps_quantize,
    insert_app1,
    normalize_orientation,
    orient_pixels,
    parse_tiff,
)
from proj_spark.sources.images import decode_image, encode_image, synth_pixels


def _jpeg(idx=0, w=16, h=16):
    return encode_image(synth_pixels(idx, w, h), "jpeg")


# ------------------------------------------------------------ roundtrip


def test_full_roundtrip_all_fields():
    qlat, qlon = gps_quantize(34.0522), gps_quantize(-118.2437)
    app1 = build_app1(
        orientation=6,
        lat=qlat,
        lon=qlon,
        dt="2026:08:18 12:00:00",
        description="fixture",
    )
    j = insert_app1(_jpeg(), app1)
    m = extract_exif_bytes(j)
    assert m["orientation"] == 6
    assert m["datetime"] == "2026:08:18 12:00:00"
    assert m["description"] == "fixture"
    # DMS-rational quantization reproduces the EXACT double
    assert m["lat"] == qlat and m["lon"] == qlon


@pytest.mark.parametrize(
    "lat,lon",
    [(0.0, 0.0), (-33.8688, 151.2093), (89.999, -179.999), (-89.999, 179.999),
     (25.0, -125.0), (48.99999, -67.00001)],
)
def test_gps_quantize_exact_roundtrip(lat, lon):
    qlat, qlon = gps_quantize(lat), gps_quantize(lon)
    m = parse_tiff(build_app1(lat=qlat, lon=qlon)[6:])
    assert m["lat"] == qlat and m["lon"] == qlon
    # quantization error bounded by half a millisecond-of-arc step
    assert abs(qlat - lat) <= 0.5 / 3_600_000 + 1e-12
    assert abs(qlon - lon) <= 0.5 / 3_600_000 + 1e-12
    # idempotent
    assert gps_quantize(qlat) == qlat


def test_orientation_only_no_gps():
    m = parse_tiff(build_app1(orientation=3)[6:])
    assert m["orientation"] == 3
    assert m["lat"] is None and m["lon"] is None


def test_big_endian_tiff_parse():
    """Reader must handle MM byte order (writer emits II); build the MM
    TIFF by hand: orientation-only IFD0."""
    ifd = (
        struct.pack(">H", 1)
        + struct.pack(">HHI", 0x0112, 3, 1)
        + struct.pack(">H", 7)
        + b"\x00\x00"
        + struct.pack(">I", 0)
    )
    t = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd
    assert parse_tiff(t)["orientation"] == 7


def test_bad_tiff_rejected():
    with pytest.raises(ValueError):
        parse_tiff(b"XX\x2a\x00\x08\x00\x00\x00")
    with pytest.raises(ValueError):
        parse_tiff(b"II\x2b\x00\x08\x00\x00\x00")


# ------------------------------------------------------------- splice


def test_splice_keeps_jpeg_decodable():
    base = _jpeg(5)
    j = insert_app1(base, build_app1(orientation=2, lat=1.0, lon=2.0))
    assert np.array_equal(decode_image(j, "jpeg"), decode_image(base, "jpeg"))


def test_splice_after_app0():
    base = _jpeg()
    j = insert_app1(base, build_app1())
    # APP0 (if present) still leads; APP1 before any DQT/SOF
    pos = 2
    seen = []
    while True:
        marker = struct.unpack_from(">H", j, pos)[0]
        seen.append(marker)
        if marker == 0xFFDA:
            break
        pos += 2 + struct.unpack_from(">H", j, pos + 2)[0]
    assert 0xFFE1 in seen
    idx_app1 = seen.index(0xFFE1)
    assert all(m == 0xFFE0 for m in seen[:idx_app1])


def test_no_exif_returns_none_and_bad_soi_raises():
    assert extract_exif_bytes(_jpeg()) is None
    with pytest.raises(ValueError):
        extract_exif_bytes(b"\x00\x01rubbish")
    with pytest.raises(ValueError):
        insert_app1(b"\x00\x01rubbish", build_app1())


def test_build_app1_validates_orientation():
    with pytest.raises(ValueError):
        build_app1(orientation=0)
    with pytest.raises(ValueError):
        build_app1(orientation=9)


# ----------------------------------------------------- orientation ops


def test_orientation_group_inverse():
    """normalize . orient == identity for all 8 flags, on a
    non-square, asymmetric image (w != h catches transposed axes)."""
    rect = synth_pixels(3, 24, 16)
    assert rect.shape[0] != rect.shape[1]
    for o in range(1, 9):
        stored = orient_pixels(rect, o)
        if o >= 5:
            assert stored.shape[:2] == rect.shape[:2][::-1]
        assert np.array_equal(normalize_orientation(stored, o), rect), o


def test_orientation_flags_distinct():
    """The 8 flags are the full dihedral group: all stored variants of
    an asymmetric image are pairwise distinct."""
    rect = synth_pixels(9, 24, 16)
    stored = [orient_pixels(rect, o) for o in range(1, 9)]
    for i in range(8):
        for j in range(i + 1, 8):
            a, b = stored[i], stored[j]
            assert a.shape != b.shape or not np.array_equal(a, b), (i + 1, j + 1)


def test_orientation_rejects_bad_flag():
    rect = synth_pixels(1, 8, 8)
    with pytest.raises(ValueError):
        orient_pixels(rect, 0)
    with pytest.raises(ValueError):
        normalize_orientation(rect, 9)


# ------------------------------------------------------------- spark


def test_upright_images_spark(spark):
    import pandas as pd

    from proj_spark.sources.exif import upright_images
    from proj_spark.sources.images import psnr_db

    upright = synth_pixels(11, 24, 16)  # w=24, h=16
    qlat, qlon = gps_quantize(40.7128), gps_quantize(-74.0060)
    rows = []
    for o in range(1, 9):
        stored = np.ascontiguousarray(orient_pixels(upright, o))
        j = insert_app1(
            encode_image(stored, "jpeg"),
            build_app1(orientation=o, lat=qlat, lon=qlon, dt="2026:08:18 09:00:00"),
        )
        rows.append((f"o{o}", j, "jpeg"))
    # a PNG (no EXIF channel) must pass through byte-identical
    png = encode_image(upright, "png")
    rows.append(("png0", png, "png"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))
    out = {r["image_id"]: r for r in upright_images(df.repartition(3)).collect()}
    assert len(out) == 9
    assert bytes(out["png0"]["bytes"]) == png and not out["png0"]["was_rotated"]
    for o in range(1, 9):
        r = out[f"o{o}"]
        # output is upright: w/h un-transposed, pixels near the original
        assert (r["w"], r["h"]) == (24, 16), o
        assert r["was_rotated"] == (o != 1)
        got = decode_image(bytes(r["bytes"]), "jpeg")
        assert psnr_db(upright, got) >= 38.0, o  # two lossy passes for o>1
        meta = extract_exif_bytes(bytes(r["bytes"]))
        if o == 1:
            assert meta["orientation"] == 1  # original APP1 untouched
        else:
            assert meta["orientation"] == 1
            assert meta["lat"] == qlat and meta["lon"] == qlon
            assert meta["datetime"] == "2026:08:18 09:00:00"


def test_extract_exif_spark(spark):
    import pandas as pd

    base = _jpeg()
    rows = []
    expected = {}
    for i in range(40):
        iid = f"im{i:04d}"
        if i % 10 == 9:  # non-JPEG payload: lenient default, no task kill
            rows.append((iid, b"\x89PNG not a jpeg"))
            expected[iid] = None
        elif i % 5 == 4:  # every 5th payload carries NO exif
            rows.append((iid, base))
            expected[iid] = None
        else:
            qlat = gps_quantize(25.0 + i * 0.37)
            qlon = gps_quantize(-125.0 + i * 0.91)
            o = i % 8 + 1
            rows.append(
                (iid, insert_app1(base, build_app1(orientation=o, lat=qlat, lon=qlon)))
            )
            expected[iid] = (o, qlat, qlon)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes"]))
    out = {r["image_id"]: r for r in extract_exif(df.repartition(4)).collect()}
    assert len(out) == 40
    for iid, exp in expected.items():
        r = out[iid]
        if exp is None:
            assert not r["has_gps"] and r["orientation"] == 1 and r["lat"] is None
        else:
            assert r["has_gps"]
            assert (r["orientation"], r["lat"], r["lon"]) == exp
