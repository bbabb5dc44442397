"""DMS (sexagesimal) parsing and formatting as native expressions.

Reference semantics: dmstor (src/dmstor.c:19-113) parses
``79d00'00.000"W`` -> radians with the shortened per-component
constants vm[] (deg/min/sec multipliers); rtodms (src/rtodms.c:38-72)
formats radians back.  Both are implemented as Column expressions
(regexp + arithmetic) so CSV/text sources parse coordinates without
any Python — the scan-side fast path for text ingest.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's shortened constants (src/dmstor.c vm[]) — NOT
# DEG_TO_RAD; golden outputs depend on the last-ulp difference
VM_DEG = 0.0174532925199433
VM_MIN = 0.0002908882086657216
VM_SEC = 0.0000048481368110953599

_DMS_PATTERN = r"^\s*([+-]?)(?:(\d+(?:\.\d*)?)[dD])?(?:(\d+(?:\.\d*)?)')?(?:(\d+(?:\.\d*)?)\")?([NSEWnsew]?)\s*$"


def dms_to_rad(col: Column | str) -> Column:
    """Parse a DMS or plain-decimal string column to radians.

    Mirrors dmstor: missing components are 0; trailing S/W negates;
    plain decimals are treated as degrees.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    sign_c = F.regexp_extract(c, _DMS_PATTERN, 1)
    deg = F.regexp_extract(c, _DMS_PATTERN, 2)
    minu = F.regexp_extract(c, _DMS_PATTERN, 3)
    sec = F.regexp_extract(c, _DMS_PATTERN, 4)
    hemi = F.upper(F.regexp_extract(c, _DMS_PATTERN, 5))
    # plain decimal fallback (no 'd' marker anywhere)
    plain = ~c.rlike("[dD]'\"") & c.rlike(r"^[+-]?\d+(\.\d*)?([eE][+-]?\d+)?[NSEWnsew]?$")
    plain_num = F.regexp_extract(c, r"^([+-]?\d+(?:\.\d*)?(?:[eE][+-]?\d+)?)", 1).cast(
        "double"
    )
    plain_hemi = F.upper(F.regexp_extract(c, r"([NSEWnsew])$", 1))

    def _num(x):
        return F.when(x == "", F.lit(0.0)).otherwise(x.cast("double"))

    v = _num(deg) * VM_DEG + _num(minu) * VM_MIN + _num(sec) * VM_SEC
    v = F.when(sign_c == "-", -v).otherwise(v)
    v = F.when(hemi.isin("S", "W"), -v).otherwise(v)
    pv = plain_num * VM_DEG
    pv = F.when(plain_hemi.isin("S", "W"), -pv).otherwise(pv)
    return F.when(plain, pv).otherwise(v)


def rad_to_dms(col: Column | str, ndec: int = 3, pos: str = "N", neg: str = "S") -> Column:
    """Format radians as ``DDdMM'SS.sss"H`` (rtodms semantics: round
    at the seconds decimal, carry into minutes/degrees)."""
    c = F.col(col) if isinstance(col, str) else col
    r = c * (1.0 / VM_DEG) * 3600.0  # total seconds
    neg_mask = r < 0
    r = F.round(F.abs(r), ndec)
    d = F.floor(r / 3600.0)
    rem = r - d * 3600.0
    mi = F.floor(rem / 60.0)
    s = rem - mi * 60.0
    body = F.concat(
        d.cast("long").cast("string"),
        F.lit("d"),
        F.lpad(mi.cast("long").cast("string"), 2, "0"),
        F.lit("'"),
        F.lpad(F.format_number(s, ndec), ndec + 3, "0"),
        F.lit('"'),
        F.when(neg_mask, F.lit(neg)).otherwise(F.lit(pos)),
    )
    return body


# ------------------------------------------------- scalar rtodms (CLI)
def rtodms_py(r: float, pos: str, neg: str, fract: int = 3, wide: bool = False) -> str:
    """Plain-Python rtodms (src/rtodms.c:38-72) for the CLI surface:
    round radians at ``fract`` second decimals (RES carry), trim
    trailing zeros in the seconds fraction, and drop zero
    seconds/minutes entirely (``111d0'3.085"W``, ``42d0'0.18"N``,
    ``5dW``).  ``set_rtodms(fract, 0)`` is the ``-w<n>`` flag;
    ``wide`` is ``-W<n>`` (set_rtodms con_w: constant field width —
    zero-padded minutes/seconds, zero fields kept, no fraction trim,
    rtodms.c:30-32,55-56)."""
    import math as _math

    res = 10.0 ** fract
    conv = 180.0 * 3600.0 * res / _math.pi
    if r < 0:
        r = -r
        sign = neg if pos else "-"
    else:
        sign = pos if pos else ""
    r = _math.floor(r * conv + 0.5)
    sec = _math.fmod(r / res, 60.0)
    r = _math.floor(r / (res * 60.0))
    minute = int(_math.fmod(r, 60.0))
    deg = int(_math.floor(r / 60.0))
    if wide:
        width = fract + 2 + (1 if fract else 0)
        return f"{deg}d{minute:02d}'{sec:0{width}.{fract}f}\"{sign}"
    if sec:
        s = f"{deg}d{minute}'{sec:.{fract}f}\"{sign}"
        # trim trailing zeros in the seconds fraction (rtodms.c:61-67)
        head, tail = s.rsplit('"', 1)
        head = head.rstrip("0")
        if head.endswith("."):
            head = head[:-1]
        return head + '"' + tail
    if minute:
        return f"{deg}d{minute}'{sign}"
    return f"{deg}d{sign}"
