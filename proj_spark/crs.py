"""proj-string parser and CRS compiler.

Mirrors the *semantics* of the reference init path
(/root/reference/src/pj_init.c:389-631, pj_ell_set.c:26-88,
pj_datum_set.c) as a driver-side, pure-python compile step.  The result
is a frozen :class:`CRS` holding only plain floats/tuples so it can be
pickled into pandas-UDF closures and broadcast.

No per-row work happens here.
"""
from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import lru_cache

from .kernels import tables
from .kernels.xmath import DEG_TO_RAD, SEC_TO_RAD

# datum types (src/projects.h PJD_*)
PJD_UNKNOWN = 0
PJD_3PARAM = 1
PJD_7PARAM = 2
PJD_GRIDSHIFT = 3
PJD_WGS84 = 4

# per-component deg/min/sec -> rad multipliers; these are deliberately
# the reference's own shortened constants (src/dmstor.c vm[]) — they
# differ from DEG_TO_RAD in the last ulp, and golden behavior depends
# on it (e.g. lon_wrap=180 parses to one ulp ABOVE pi, which is why
# the reference wraps 0 deg to 360 deg in nad/tv_out.dist)
_VM = (0.0174532925199433, 0.0002908882086657216, 0.0000048481368110953599)

_NUM_RE = re.compile(r"(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?")


def dmstor(s: str) -> float:
    """DMS or decimal string -> radians. Sequential parser mirroring
    src/dmstor.c:41-70: each number's trailing unit char picks its slot
    (d->deg, '->min, "->sec, r->radians); a number with NO unit char
    lands in the next expected slot, so ``116d2'11.12630`` parses the
    bare 11.12630 as seconds.  A postfix hemisphere letter REPLACES the
    leading sign (reference behavior).

    Accepts ``79d00'00.000"W``, ``116d2'11.12630``, ``1w``, ``0dE``,
    ``-3.5``, ``1.5r`` etc.
    """
    s = s.strip()
    if not s:
        return 0.0
    i = 0
    neg = False
    if s[0] in "+-":
        neg = s[0] == "-"
        i = 1
    start = i
    v = 0.0
    nl = 0
    while nl < 3:
        mm = _NUM_RE.match(s, i)
        if not mm:
            break
        tv = float(mm.group(0))
        i = mm.end()
        c = s[i] if i < len(s) else "\x00"
        if c in "Dd":
            n = 0
        elif c == "'":
            n = 1
        elif c == '"':
            n = 2
        elif c in "rR":
            if nl:
                raise ValueError(f"unparseable DMS value: {s!r}")
            i += 1
            v = tv
            break
        else:
            # bare number: next expected slot, then stop (dmstor.c:60-62)
            v += tv * _VM[nl]
            break
        if n < nl:
            raise ValueError(f"unparseable DMS value: {s!r}")
        v += tv * _VM[n]
        i += 1
        nl = n + 1
    if i == start and not (i < len(s) and s[i] in "NnEeSsWw"):
        raise ValueError(f"unparseable DMS value: {s!r}")
    if i < len(s) and s[i] in "NnEeSsWw":
        neg = s[i] in "SsWw"
        i += 1
    if i != len(s):
        raise ValueError(f"unparseable DMS value: {s!r}")
    return -v if neg else v


def parse_proj_string(defn: str) -> dict[str, str | bool]:
    """``+proj=utm +zone=11 +south`` -> ordered param dict."""
    params: dict[str, str | bool] = {}
    for tok in defn.split():
        if tok.startswith("+"):
            tok = tok[1:]
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            if k not in params:  # first occurrence wins (paralist scan order)
                params[k] = v
        else:
            params.setdefault(tok, True)
    return params


def _to_meter(val: str) -> float:
    if "/" in val:
        num, den = val.split("/", 1)
        return float(num) / float(den)
    return float(val)


@dataclass(frozen=True)
class CRS:
    """A compiled coordinate reference system (analog of struct PJ,
    src/projects.h:226-284, constants only — kernels are looked up by
    ``proj`` name at plan time)."""

    proj: str
    defn: str
    # ellipsoid
    a: float
    es: float
    e: float
    one_es: float
    rone_es: float
    ra: float
    a_orig: float
    es_orig: float
    # frame
    lam0: float = 0.0
    phi0: float = 0.0
    x0: float = 0.0
    y0: float = 0.0
    k0: float = 1.0
    to_meter: float = 1.0
    fr_meter: float = 1.0
    vto_meter: float = 1.0
    vfr_meter: float = 1.0
    from_greenwich: float = 0.0
    # datum
    datum_type: int = PJD_UNKNOWN
    datum_params: tuple[float, ...] = (0.0,) * 7
    nadgrids: str | None = None
    # vertical datum: +geoidgrids (pj_init.c:496-498, applied as
    # pj_transform stages 6/8 — pj_transform.c:215-222,240-247)
    geoidgrids: str | None = None
    # flags
    is_latlong: bool = False
    is_geocent: bool = False
    geoc: bool = False
    over: bool = False
    lon_wrap: float | None = None
    axis: str = "enu"
    # raw params for kernel setup
    params: dict = field(default_factory=dict, hash=False, compare=False)

    @staticmethod
    def from_proj4(defn: str) -> "CRS":
        return _compile(defn)

    def get_def(self) -> str:
        """Serialize back to a proj-string (pj_get_def semantics,
        ref src/pj_pr_list.c): the fully-expanded parameter set, with
        +init resolved and defaults folded in."""
        parts = [f"+proj={self.proj}"]
        for k, v in self.params.items():
            if k in ("proj", "init", "no_defs"):
                continue
            parts.append(f"+{k}" if v is True else f"+{k}={v}")
        if "ellps" not in self.params and "a" not in self.params and "R" not in self.params:
            parts.append(f"+a={self.a!r}")
            parts.append(f"+es={self.es_orig!r}")
        return " ".join(parts)

    @property
    def is_projected(self) -> bool:
        return not (self.is_latlong or self.is_geocent)

    def same_datum(self, other: "CRS") -> bool:
        """pj_compare_datums (src/pj_transform.c:459-496)."""
        if self.datum_type != other.datum_type:
            return False
        if self.a_orig != other.a_orig or abs(self.es_orig - other.es_orig) > 5.0e-11:
            return False
        if self.datum_type == PJD_3PARAM:
            return self.datum_params[:3] == other.datum_params[:3]
        if self.datum_type == PJD_7PARAM:
            return self.datum_params == other.datum_params
        if self.datum_type == PJD_GRIDSHIFT:
            return self.nadgrids == other.nadgrids
        return True


@lru_cache(maxsize=256)
def _compile(defn: str) -> CRS:
    params = parse_proj_string(defn)
    # +init=file:key catalog expansion (src/pj_init.c:425-434):
    # catalog params append AFTER explicit ones, so explicit params win
    # via the first-occurrence-wins rule of parse_proj_string
    if "init" in params:
        from .sources.initfiles import get_init

        init_params = parse_proj_string(get_init(str(params["init"])))
        for k, v in init_params.items():
            params.setdefault(k, v)
    if "proj" not in params:
        raise ValueError(f"no +proj in {defn!r}")
    proj = str(params["proj"])

    # --- datum (pj_datum_set.c) -------------------------------------
    datum_type = PJD_UNKNOWN
    datum_params = [0.0] * 7
    nadgrids = None
    ellps_from_datum = None
    if "datum" in params:
        d = tables.DATUMS.get(str(params["datum"]))
        if d is None:
            raise ValueError(f"unknown datum {params['datum']!r}")
        ellps_from_datum = d["ellps"]
        for k, v in d.items():
            if k != "ellps":
                params.setdefault(k, v)
    if "nadgrids" in params:
        datum_type = PJD_GRIDSHIFT
        nadgrids = str(params["nadgrids"])
    elif "towgs84" in params:
        vals = [float(x) for x in str(params["towgs84"]).split(",")]
        vals += [0.0] * (7 - len(vals))
        if any(v != 0.0 for v in vals[3:]):
            datum_type = PJD_7PARAM
            vals[3] *= SEC_TO_RAD
            vals[4] *= SEC_TO_RAD
            vals[5] *= SEC_TO_RAD
            vals[6] = vals[6] / 1e6 + 1.0
        else:
            datum_type = PJD_3PARAM
        datum_params = vals

    # --- ellipsoid (pj_ell_set.c), default from proj_def.dat <general>
    ellps_name = params.get("ellps") or ellps_from_datum
    if ellps_name is None and "a" not in params and "R" not in params and "no_defs" not in params:
        ellps_name = "WGS84"  # nad/proj_def.dat <general>
    base: dict[str, float] = {}
    if ellps_name is not None:
        e_def = tables.ELLPS.get(str(ellps_name))
        if e_def is None:
            raise ValueError(f"unknown ellps {ellps_name!r}")
        base = dict(e_def)
    a = float(params.get("a", base.get("a", 0.0)))
    if "R" in params:
        a = float(params["R"])
        es = 0.0
    elif "es" in params:
        es = float(params["es"])
    elif "e" in params:
        es = float(params["e"]) ** 2
    elif "rf" in params:
        f = 1.0 / float(params["rf"])
        es = f * (2.0 - f)
    elif "f" in params:
        f = float(params["f"])
        es = f * (2.0 - f)
    elif "b" in params:
        b = float(params["b"])
        es = 1.0 - (b * b) / (a * a)
    elif "rf" not in params and "rf" in base:
        f = 1.0 / base["rf"]
        es = f * (2.0 - f)
    elif "b" in base:
        b = base["b"]
        es = 1.0 - (b * b) / (a * a)
    else:
        es = 0.0
    if a <= 0.0:
        raise ValueError(f"invalid semi-major axis in {defn!r}")
    # spherification switches (pj_ell_set.c:60-88, full set); b is the
    # derived minor axis at this point
    _b = a * math.sqrt(1.0 - es)
    SIXTH = 0.1666666666666666667
    RA4 = 0.04722222222222222222
    RA6 = 0.02215608465608465608
    RV4 = 0.06944444444444444444  # 5/72
    RV6 = 0.04243827160493827160  # 55/1296
    if "R_A" in params:  # sphere with the ellipsoid's area
        a *= 1.0 - es * (SIXTH + es * (RA4 + es * RA6))
        es = 0.0
    elif "R_V" in params:  # sphere with the ellipsoid's volume
        a *= 1.0 - es * (SIXTH + es * (RV4 + es * RV6))
        es = 0.0
    elif "R_a" in params:  # arithmetic mean of semi-axes
        a = 0.5 * (a + _b)
        es = 0.0
    elif "R_g" in params:  # geometric mean
        a = math.sqrt(a * _b)
        es = 0.0
    elif "R_h" in params:  # harmonic mean
        a = 2.0 * a * _b / (a + _b)
        es = 0.0
    elif "R_lat_a" in params or "R_lat_g" in params:
        # arithmetic / geometric mean of principal radii at a latitude
        arith = "R_lat_a" in params
        tmp = math.sin(dmstor(str(params["R_lat_a" if arith else "R_lat_g"])))
        if abs(tmp) > 1.0:
            raise ValueError("|R_lat_*| must be <= 90")
        tmp = 1.0 - es * tmp * tmp
        if arith:
            a *= 0.5 * (1.0 - es + tmp) / (tmp * math.sqrt(tmp))
        else:
            a *= math.sqrt(1.0 - es) / tmp
        es = 0.0

    one_es = 1.0 - es
    if one_es == 0.0:
        raise ValueError("effective eccentricity = 1")

    a_orig, es_orig = a, es

    # Modified-stereographic fixed frames (PJ_mod_ster.c ENTRY blocks,
    # lines 99-209): the ENTRY bodies force a/es AFTER pj_init records
    # a_orig/es_orig, so datum transforms keep the user ellipsoid while
    # the projection math uses the hard-wired one.  gs48's sphere and
    # alsk/gs50's fixed Clarke-1866-like (a=6378206.4, es=.00676866) /
    # sphere pair are part of the published coefficient fits.
    if proj in ("mil_os", "lee_os"):
        es = 0.0
    elif proj == "gs48":
        es = 0.0
        a = 6370997.0
    elif proj in ("alsk", "gs50"):
        if es:
            a = 6378206.4
            es = 0.00676866
        else:
            a = 6370997.0
    one_es = 1.0 - es

    # WGS84 no-op detection (src/pj_init.c:479-487) — runs before the
    # projection ENTRY in the reference, so it sees the USER ellipsoid
    if (
        datum_type == PJD_3PARAM
        and datum_params[0] == 0.0
        and datum_params[1] == 0.0
        and datum_params[2] == 0.0
        and a_orig == 6378137.0
        and abs(es_orig - 0.006694379990) < 5.0e-11
    ):
        datum_type = PJD_WGS84

    # --- frame params (src/pj_init.c:532-610) ------------------------
    lam0 = dmstor(str(params["lon_0"])) if "lon_0" in params else 0.0
    phi0 = dmstor(str(params["lat_0"])) if "lat_0" in params else 0.0
    x0 = float(params.get("x_0", 0.0))
    y0 = float(params.get("y_0", 0.0))
    if "k_0" in params:
        k0 = float(params["k_0"])
    elif "k" in params:
        k0 = float(params["k"])
    else:
        k0 = 1.0
    if k0 <= 0.0:
        raise ValueError("k0 <= 0")

    if "units" in params:
        u = tables.UNITS.get(str(params["units"]))
        if u is None:
            raise ValueError(f"unknown units {params['units']!r}")
        to_meter = u
    elif "to_meter" in params:
        to_meter = _to_meter(str(params["to_meter"]))
    else:
        to_meter = 1.0
    fr_meter = 1.0 / to_meter
    if "vunits" in params:
        vto_meter = tables.UNITS[str(params["vunits"])]
    elif "vto_meter" in params:
        vto_meter = _to_meter(str(params["vto_meter"]))
    else:
        vto_meter = to_meter
    vfr_meter = 1.0 / vto_meter

    from_greenwich = 0.0
    if "pm" in params:
        pm = str(params["pm"])
        if pm in tables.PRIME_MERIDIANS:
            from_greenwich = tables.PRIME_MERIDIANS[pm] * DEG_TO_RAD
        else:
            from_greenwich = dmstor(pm)

    lon_wrap = dmstor(str(params["lon_wrap"])) if "lon_wrap" in params else None

    is_latlong = proj in ("latlong", "longlat", "latlon", "lonlat")
    is_geocent = proj == "geocent"
    # geoc is decided before the projection ENTRY in the reference
    # (pj_init.c), i.e. from the user ellipsoid, not ENTRY overrides
    geoc = bool(es_orig) and "geoc" in params
    over = "over" in params

    axis = str(params.get("axis", "enu"))
    if len(axis) != 3 or any(c not in "ewnsud" for c in axis):
        raise ValueError(f"bad axis {axis!r}")

    return CRS(
        proj=proj,
        defn=defn,
        a=a,
        es=es,
        e=math.sqrt(es),
        one_es=one_es,
        rone_es=1.0 / one_es,
        ra=1.0 / a,
        a_orig=a_orig,
        es_orig=es_orig,
        lam0=lam0,
        phi0=phi0,
        x0=x0,
        y0=y0,
        k0=k0,
        to_meter=to_meter,
        fr_meter=fr_meter,
        vto_meter=vto_meter,
        vfr_meter=vfr_meter,
        from_greenwich=from_greenwich,
        datum_type=datum_type,
        datum_params=tuple(datum_params),
        nadgrids=nadgrids,
        geoidgrids=str(params["geoidgrids"]) if "geoidgrids" in params else None,
        is_latlong=is_latlong,
        is_geocent=is_geocent,
        geoc=geoc,
        over=over,
        lon_wrap=lon_wrap,
        axis=axis,
        params=params,
    )
