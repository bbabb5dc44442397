"""EXIF (APP1 / TIFF 6.0 IFD) metadata lane — pure python, no Spark deps
except the one thin DataFrame wrapper at the bottom.

Real camera payloads key geography INSIDE the bytes: the GPS IFD of the
Exif APP1 segment.  At 10^12-image scale the centroid columns may be
absent, stale, or untrusted, so the engine must be able to lift
(lat, lon, orientation, timestamp) straight out of the payload — a
narrow mapInPandas stage that touches ONLY the JPEG header segments
(never the entropy-coded scan), so it reads a few hundred bytes per row
regardless of payload size and keeps the big `bytes` column out of any
shuffle.

Format references are the public specs: CIPA DC-008 (Exif 2.x) and the
TIFF 6.0 IFD layout.  The JPEG marker walk mirrors
``proj_spark/sources/jpeg.py:decode_jpeg``, which SKIPS APPn segments —
so payloads spliced by :func:`insert_app1` remain bit-decodable by the
existing codec unchanged.

Writer emits little-endian ("II") TIFF; the reader handles both "II"
and "MM".  GPS coordinates are stored as the standard 3-RATIONAL
degree/minute/millisecond-second triple; :func:`gps_quantize` returns
the exactly-representable value so callers can assert integer-microdeg
roundtrip equality (used by the ``exif_gps_tiles`` oracle query).
"""
from __future__ import annotations

import struct
from typing import Iterator, Optional

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

_TAG_DESCRIPTION = 0x010E
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_VERSION = 0x0000
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


# ---------------------------------------------------------------- DMS


def _dms_parts(deg_abs: float) -> tuple[int, int, int]:
    """|degrees| -> (deg, min, sec_milli) with carry so sec_milli<60000."""
    d = int(deg_abs)
    rem = (deg_abs - d) * 60.0
    m = int(rem)
    sn = int(round((rem - m) * 60.0 * 1000.0))
    if sn >= 60000:
        sn -= 60000
        m += 1
    if m >= 60:
        m -= 60
        d += 1
    return d, m, sn


def gps_quantize(deg: float) -> float:
    """The value a deg->DMS-rational->deg roundtrip reproduces exactly.

    Quantization step is 1/3_600_000 deg (~3 cm) — callers that write
    ``gps_quantize(x)`` and parse it back can assert equality at
    integer-microdeg precision with zero tolerance.
    """
    sign = -1.0 if deg < 0 else 1.0
    d, m, sn = _dms_parts(abs(deg))
    return sign * (d + m / 60.0 + (sn / 1000.0) / 3600.0)


def _dms_rationals(deg_abs: float) -> bytes:
    d, m, sn = _dms_parts(deg_abs)
    return struct.pack("<IIIIII", d, 1, m, 1, sn, 1000)


# ------------------------------------------------------------- writer


def _pack_ifd(entries: list[tuple[int, int, int, bytes]], ifd_off: int) -> bytes:
    """One IFD block (count + 12B entries + next=0 + out-of-line data).

    ``entries`` = (tag, type, count, packed_value_bytes); values longer
    than 4 bytes go to the data area that immediately follows the IFD,
    addressed relative to the TIFF header via ``ifd_off``.  TIFF 6.0
    requires entries sorted by tag.
    """
    n = len(entries)
    data_off = ifd_off + 2 + 12 * n + 4
    body = b""
    data = b""
    for tag, typ, cnt, raw in sorted(entries):
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack("<I", data_off + len(data))
            data += raw + (b"\x00" if len(raw) % 2 else b"")
        body += struct.pack("<HHI", tag, typ, cnt) + val
    return struct.pack("<H", n) + body + struct.pack("<I", 0) + data


def build_app1(
    orientation: int = 1,
    lat: Optional[float] = None,
    lon: Optional[float] = None,
    dt: Optional[str] = None,
    description: Optional[str] = None,
) -> bytes:
    """APP1 payload (``Exif\\0\\0`` + II TIFF with IFD0 [+ GPS IFD])."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")
    has_gps = lat is not None and lon is not None
    base: list[tuple[int, int, int, bytes]] = []
    if description is not None:
        d = description.encode("ascii") + b"\x00"
        base.append((_TAG_DESCRIPTION, 2, len(d), d))
    base.append((_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation)))
    if dt is not None:
        db = dt.encode("ascii") + b"\x00"
        base.append((_TAG_DATETIME, 2, len(db), db))

    def pack0(gps_off: int) -> bytes:
        e = list(base)
        if has_gps:
            e.append((_TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_off)))
        return _pack_ifd(e, 8)

    blk0 = pack0(0)
    gps_blk = b""
    if has_gps:
        gps_off = 8 + len(blk0)
        blk0 = pack0(gps_off)  # same length, patched pointer
        lat_ref = b"N\x00" if lat >= 0 else b"S\x00"
        lon_ref = b"E\x00" if lon >= 0 else b"W\x00"
        gps_blk = _pack_ifd(
            [
                (_GPS_VERSION, 1, 4, bytes((2, 3, 0, 0))),
                (_GPS_LAT_REF, 2, 2, lat_ref),
                (_GPS_LAT, 5, 3, _dms_rationals(abs(lat))),
                (_GPS_LON_REF, 2, 2, lon_ref),
                (_GPS_LON, 5, 3, _dms_rationals(abs(lon))),
            ],
            gps_off,
        )
    tiff = b"II*\x00" + struct.pack("<I", 8) + blk0 + gps_blk
    return b"Exif\x00\x00" + tiff


def insert_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment into a JFIF stream (after APP0 if present,
    else right after SOI) — existing decoders skip it untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    if jpeg[pos : pos + 2] == b"\xff\xe0":  # APP0/JFIF stays first
        seg_len = struct.unpack_from(">H", jpeg, pos + 2)[0]
        pos += 2 + seg_len
    seg = struct.pack(">HH", 0xFFE1, len(app1_payload) + 2) + app1_payload
    return jpeg[:pos] + seg + jpeg[pos:]


# ------------------------------------------------------------- reader


def _read_ifd(t: bytes, off: int, e: str) -> dict[int, tuple[int, int, bytes]]:
    n = struct.unpack_from(e + "H", t, off)[0]
    out: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n):
        ent = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", t, ent)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = t[ent + 8 : ent + 8 + size]
        else:
            voff = struct.unpack_from(e + "I", t, ent + 8)[0]
            raw = t[voff : voff + size]
        out[tag] = (typ, cnt, raw)
    return out


def _rat3_deg(raw: bytes, e: str) -> float:
    v = struct.unpack(e + "IIIIII", raw)
    d = v[0] / v[1] if v[1] else 0.0
    m = v[2] / v[3] if v[3] else 0.0
    s = v[4] / v[5] if v[5] else 0.0
    return d + m / 60.0 + s / 3600.0


def parse_tiff(t: bytes) -> dict:
    """TIFF-in-Exif -> {orientation, datetime, description, lat, lon}."""
    bo = t[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    if struct.unpack_from(e + "H", t, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd0 = _read_ifd(t, struct.unpack_from(e + "I", t, 4)[0], e)
    out: dict = {
        "orientation": 1,
        "datetime": None,
        "description": None,
        "lat": None,
        "lon": None,
    }
    if _TAG_ORIENTATION in ifd0:
        out["orientation"] = struct.unpack(e + "H", ifd0[_TAG_ORIENTATION][2])[0]
    if _TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[_TAG_DATETIME][2].rstrip(b"\x00").decode("ascii")
    if _TAG_DESCRIPTION in ifd0:
        out["description"] = ifd0[_TAG_DESCRIPTION][2].rstrip(b"\x00").decode("ascii")
    if _TAG_GPS_IFD in ifd0:
        gps = _read_ifd(t, struct.unpack(e + "I", ifd0[_TAG_GPS_IFD][2])[0], e)
        if _GPS_LAT in gps and _GPS_LON in gps:
            lat = _rat3_deg(gps[_GPS_LAT][2], e)
            lon = _rat3_deg(gps[_GPS_LON][2], e)
            if gps.get(_GPS_LAT_REF, (0, 0, b""))[2][:1] == b"S":
                lat = -lat
            if gps.get(_GPS_LON_REF, (0, 0, b""))[2][:1] == b"W":
                lon = -lon
            out["lat"], out["lon"] = lat, lon
    return out


def extract_exif_bytes(jpeg: bytes) -> Optional[dict]:
    """Walk the JPEG header segments; parse the first Exif APP1.

    Returns None when the stream carries no Exif segment.  Stops at SOS
    (Exif/JFIF put all APPn before the scan), so cost is O(header), not
    O(payload).
    """
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = struct.unpack_from(">H", jpeg, pos)[0]
        if marker in (0xFFD8, 0xFFD9) or 0xFFD0 <= marker <= 0xFFD7 or marker == 0xFF01:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", jpeg, pos + 2)[0]
        if marker == 0xFFE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return parse_tiff(jpeg[pos + 10 : pos + 2 + seg_len])
        if marker == 0xFFDA:  # scan starts; no APPn can follow
            return None
        pos += 2 + seg_len
    return None


# ------------------------------------------- orientation normalization


def orient_pixels(px, orientation: int):
    """Store ``px`` the way a camera with this EXIF orientation flag
    would (the forward transform whose inverse is
    :func:`normalize_orientation`)."""
    import numpy as np

    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return np.transpose(px, (1, 0, 2))
    if orientation == 6:
        return np.rot90(px, 1)  # stored = upright rotated 90 CCW
    if orientation == 7:
        return np.transpose(px[::-1, ::-1], (1, 0, 2))
    if orientation == 8:
        return np.rot90(px, -1)
    raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")


def normalize_orientation(px, orientation: int):
    """Undo the EXIF orientation flag -> upright pixels (TIFF 6.0 /
    Exif 2.x orientation semantics; flags 5..8 transpose w and h)."""
    import numpy as np

    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return np.transpose(px, (1, 0, 2))
    if orientation == 6:
        return np.rot90(px, -1)
    if orientation == 7:
        return np.transpose(px[::-1, ::-1], (1, 0, 2))
    if orientation == 8:
        return np.rot90(px, 1)
    raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")


# ------------------------------------------------------ Spark wrapper


def extract_exif(df, bytes_col: str = "bytes", id_col: str = "image_id"):
    """(id, bytes) -> (id, orientation, datetime, lat, lon, has_gps) via
    a narrow header-only mapInPandas stage (payload never shuffles).

    Lenient per row: payloads that are not JPEG (or whose header walk /
    TIFF parse fails) yield the defaults (orientation 1, no GPS) rather
    than failing the task — a 10^12-row ingest must not die on one odd
    payload (same policy as the streaming ingest quarantine).  The
    byte-level :func:`extract_exif_bytes` stays strict for callers that
    want the error."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, StringType()),
            StructField("orientation", IntegerType()),
            StructField("datetime", StringType()),
            StructField("lat", DoubleType()),
            StructField("lon", DoubleType()),
            StructField("has_gps", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw in zip(b[id_col].to_numpy(), b[bytes_col].to_numpy()):
                try:
                    meta = extract_exif_bytes(bytes(raw))
                except ValueError:
                    meta = None
                if meta is None:
                    out.append((iid, 1, None, None, None, False))
                else:
                    out.append(
                        (
                            iid,
                            int(meta["orientation"]),
                            meta["datetime"],
                            meta["lat"],
                            meta["lon"],
                            meta["lat"] is not None,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[id_col, "orientation", "datetime", "lat", "lon", "has_gps"],
            )

    return df.select(id_col, bytes_col).mapInPandas(run, schema)


def upright_images(df, bytes_col: str = "bytes", fmt_col: str = "fmt",
                   id_col: str = "image_id"):
    """Normalize every JPEG payload to EXIF orientation 1: decode, undo
    the orientation flag (:func:`normalize_orientation`), re-encode,
    and re-splice an APP1 rebuilt from the parsed metadata with
    orientation reset to 1 (GPS / timestamp / description survive).
    Payloads with no Exif segment, orientation 1, or a non-JPEG codec
    (no EXIF channel) pass through byte-identical.

    Same narrow mapInPandas shape as resize_images — payloads never
    shuffle; w/h swap for the transposed flags 5..8.  Re-encoding is
    lossy (baseline JPEG) but stays inside the engine's PSNR>=40dB
    payload contract at the codec's default quality.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from proj_spark.sources.images import decode_image, encode_image

    schema = StructType(
        [
            StructField(id_col, StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField(fmt_col, StringType()),
            StructField("was_rotated", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            out = []
            for iid, raw, fmt in zip(
                b[id_col].to_numpy(),
                b[bytes_col].to_numpy(),
                b[fmt_col].to_numpy(),
            ):
                raw = bytes(raw)
                meta = extract_exif_bytes(raw) if fmt == "jpeg" else None
                if meta is None or meta["orientation"] == 1:
                    px = decode_image(raw, fmt)
                    out.append((iid, raw, px.shape[1], px.shape[0], fmt, False))
                    continue
                px = np.ascontiguousarray(
                    normalize_orientation(decode_image(raw, fmt), meta["orientation"])
                )
                data = encode_image(px, fmt)
                app1 = build_app1(
                    orientation=1,
                    lat=meta["lat"],
                    lon=meta["lon"],
                    dt=meta["datetime"],
                    description=meta["description"],
                )
                out.append(
                    (iid, insert_app1(data, app1), px.shape[1], px.shape[0], fmt, True)
                )
            yield pd.DataFrame(
                out, columns=[id_col, "bytes", "w", "h", fmt_col, "was_rotated"]
            )

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(run, schema)
