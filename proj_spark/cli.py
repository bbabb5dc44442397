"""Command-line surface mirroring the reference's three filters
(ref src/proj.c, src/cs2cs.c, src/geod.c): text lines in, transformed
text lines out.

    python -m proj_spark.cli cs2cs "+proj=latlong +datum=NAD27 ..." \
        +to "+proj=latlong +datum=WGS84" [-f FMT] [-E] < points.txt
    python -m proj_spark.cli proj  [-I] "+proj=utm +zone=11 ..." < pts
    python -m proj_spark.cli geod  "+ellps=WGS84" [-I] < pairs

These are driver-local conveniences over the same kernel library the
Spark operators use (one code path): each line is parsed with dmstor
(DMS or decimal), batched, run through the fused numpy pipeline, and
formatted.  The distributed equivalents are functions/transform.py.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from .crs import CRS, dmstor
from .functions.dms import VM_DEG
from .kernels.xmath import RAD_TO_DEG
from .plans.pipeline import transform_arrays


def _parse_lines(lines, dms: bool = True, reversein: bool = False, tag: str = "#"):
    """Returns (u, v, z, tails, passes) where ``passes`` is a list of
    (data_row_position, raw_line) for tag-marked lines, which the
    reference copies straight to the output in place (proj.c:172-174,
    cs2cs.c:78-80 ``if (*s == tag) fputs(s, stdout)``); ``-r``
    (reversein) swaps the first two fields before parsing."""
    us, vs, zs, tails, passes = [], [], [], [], []
    for line in lines:
        line = line.rstrip("\n")
        if line.startswith(tag):
            passes.append((len(us), line))
            continue
        if not line.strip():
            continue
        toks = line.split()
        if reversein and len(toks) >= 2:
            toks[0], toks[1] = toks[1], toks[0]
        if len(toks) < 2:
            toks = [toks[0] if toks else "", ""]
        u, v = toks[0], toks[1]
        z = 0.0
        tail = ""
        if len(toks) > 2:
            try:
                z = float(toks[2])
                tail = " ".join(toks[3:])
            except ValueError:
                tail = " ".join(toks[2:])
        # unparseable coordinate -> NaN lane -> '*' output line, like the
        # reference's HUGE_VAL handling (cs2cs.c:99-100,123).  Projected
        # inputs parse as plain floats (informat=strtod when the source
        # is not latlong, cs2cs.c:405-408) — running them through dmstor
        # would wobble the value by the vm[0]*RAD_TO_DEG ulp.
        try:
            if dms:
                uu = dmstor(u) * RAD_TO_DEG
                vv = dmstor(v) * RAD_TO_DEG
            else:
                uu = float(u)
                vv = float(v)
        except ValueError:
            uu = vv = float("nan")
        us.append(uu)
        vs.append(vv)
        zs.append(z)
        tails.append(tail)
    return np.array(us), np.array(vs), np.array(zs), tails, passes


def _emit(xs, ys, zs, tails, fmt, echo_in=None, out=None, dms_out=False, wfract=3,
          suffixes=None, reverseout=False, err_line="*\t*", wide=False,
          passes=None):
    """Reference output contract (cs2cs.c:126-159): DMS via rtodms when
    the dst is latlong and no -f was given; otherwise printf with oform
    (default %.2f); z uses oform when given, else %.3f.  ``suffixes``
    (proj -S, src/proj.c:139-146) are appended tab-separated before the
    tail.  ``reverseout`` is -s (second coordinate first,
    proj.c:118-129); ``err_line`` is -e (oterr, proj.c:354-359);
    ``wide`` is -W's constant-width DMS; ``passes`` are tag-marked
    input lines copied through in position (proj.c:172-174)."""
    from .functions.dms import rtodms_py

    out = out or sys.stdout  # resolve at call time (testable)
    zfmt = fmt if fmt is not None else "%.3f"
    cfmt = fmt if fmt is not None else "%.2f"
    deg2rad = VM_DEG  # rtodms takes radians; xs/ys are degrees here
    pq = list(passes or [])
    for i in range(len(xs)):
        while pq and pq[0][0] <= i:
            out.write(pq.pop(0)[1] + "\n")
        prefix = f"{echo_in[i]}\t" if echo_in is not None else ""
        sfx = f"\t{suffixes[i]}" if suffixes is not None else ""
        tail = f" {tails[i]}" if tails[i] else ""
        if np.isnan(xs[i]) or np.isnan(ys[i]):
            out.write(f"{prefix}{err_line} {zfmt % zs[i]}{sfx}{tail}\n")
        elif dms_out and fmt is None:
            u = rtodms_py(xs[i] * deg2rad, "E", "W", wfract, wide)
            v = rtodms_py(ys[i] * deg2rad, "N", "S", wfract, wide)
            a, b = (v, u) if reverseout else (u, v)
            out.write(f"{prefix}{a}\t{b} {zfmt % zs[i]}{sfx}{tail}\n")
        else:
            a, b = (ys[i], xs[i]) if reverseout else (xs[i], ys[i])
            out.write(f"{prefix}{cfmt % a}\t{cfmt % b} {zfmt % zs[i]}{sfx}{tail}\n")
    while pq:
        out.write(pq.pop(0)[1] + "\n")


def cmd_cs2cs(args) -> int:
    src = CRS.from_proj4(args.src)
    dst = CRS.from_proj4(args.dst)
    lines = list(args.infile)
    u, v, z, tails, passes = _parse_lines(
        lines, dms=src.is_latlong, reversein=args.reversein, tag=args.tag
    )
    # cs2cs input order is lon lat for latlong CRS (matching our deg API)
    x, y, zo = transform_arrays(src, dst, u, v, z)
    echo = (
        [ln.strip() for ln in lines if ln.strip() and not ln.startswith(args.tag)]
        if args.echo
        else None
    )
    _emit(
        x, y, zo, tails, args.fmt, echo,
        dms_out=dst.is_latlong, wfract=args.wfract,
        reverseout=args.reverseout, err_line=args.err_line,
        wide=args.wide, passes=passes,
    )
    return 0


def _cmd_proj_cheby(args, crs) -> int:
    """proj -T: generate Chebyshev (or ,P power) approximation
    coefficients (ref src/gen_cheb.c:11-73 surface, src/mk_cheby.c
    engine).  Spec: lam_min,lam_max,phi_min,phi_max[,res[,NU[,NV]]][,P]
    — angles DMS/deg for forward, raw x,y for -I."""
    from .kernels.xmath import DEG_TO_RAD
    from .plans.cheby import mk_cheby, p_series_lines

    s = args.cheby
    pwr = s.endswith(",P")
    if pwr:
        s = s[:-2]
    toks = s.split(",")
    if len(toks) < 4:
        sys.stderr.write("null or absent -T parameters\n")
        return 16
    conv = (lambda t: float(t)) if args.inverse else (lambda t: dmstor(t))
    lo_u, up_u, lo_v, up_v = (conv(t) for t in toks[:4])
    res = int(toks[4]) if len(toks) > 4 and toks[4] else -1
    nu = int(toks[5]) if len(toks) > 5 and toks[5] else 15
    nv = int(toks[6]) if len(toks) > 6 and toks[6] else 15
    if lo_u == up_u or lo_v >= up_v:
        sys.stderr.write("approx. argument range error\n")
        return 16
    if lo_u > up_u:
        lo_u -= 2.0 * np.pi
    if nu < 2 or nv < 2:
        sys.stderr.write("approx. work dimensions too small\n")
        return 16

    ll = "+proj=latlong +a=%r +es=%r" % (crs.a_orig, crs.es_orig)
    R = RAD_TO_DEG

    def fwd_fn(lam, phi):
        if args.inverse:
            # projected (x, y) in -> geographic RADIANS out (pj_inv)
            x, y, _ = transform_arrays(crs, ll, lam, phi, None)
            return np.asarray(x) / R, np.asarray(y) / R
        # geographic radians in -> projected meters out (pj_fwd)
        x, y, _ = transform_arrays(ll, crs, np.asarray(lam) * R, np.asarray(phi) * R, None)
        return x, y

    cx, cy, resid, _cut = mk_cheby(
        (lo_u, lo_v), (up_u, up_v), 10.0 ** res * 0.5, fwd_fn, nu, nv, power=pwr
    )
    w = sys.stdout.write
    w(f"#proj_{'Power' if pwr else 'Chebyshev'}\n#    run-line:\n")
    w("# projection parameters\n")
    w(f"#  {crs.defn}\n")
    scale = 1.0 if args.inverse else R
    w(
        "%c,%.12g,%.12g,%.12g,%.12g,%.12g\n"
        % (
            "I" if args.inverse else "F",
            crs.lam0 * R,
            lo_u * scale,
            up_u * scale,
            lo_v * scale,
            up_v * scale,
        )
    )
    fmt = "%.15g" if pwr else ("%%.%df" % (-res + 1) if res <= 0 else "%.0f")
    for line in p_series_lines(cx, fmt):
        w(line + "\n")
    for line in p_series_lines(cy, fmt):
        w(line.replace("u:", "v:", 1) + "\n")
    w(f"# |u,v| sums {resid[0]:g} {resid[1]:g}\n")
    w(f"#end_proj_{'Power' if pwr else 'Chebyshev'}\n")
    return 0


def _factor_suffixes(crs, lon_deg, lat_deg, fail=None):
    """proj -S per-line factor annotations (src/proj.c:139-146):
    ``<h k s omega_deg a b>`` via %g, ``<* * * * * *>`` on failure."""
    from .functions.transform import factors_arrays
    from .kernels.xmath import DEG_TO_RAD

    fc = factors_arrays(crs, lon_deg * DEG_TO_RAD, lat_deg * DEG_TO_RAD,
                        analytic=True)
    out = []
    for i in range(len(lon_deg)):
        bad = not fc["valid"][i] or np.isnan(fc["h"][i])
        if fail is not None and fail[i]:
            bad = True
        if bad:
            out.append("<* * * * * *>")
        else:
            out.append(
                "<%g %g %g %g %g %g>"
                % (fc["h"][i], fc["k"][i], fc["s"][i],
                   fc["omega"][i] * RAD_TO_DEG, fc["a"][i], fc["b"][i])
            )
    return out


def _vprocess(crs, lon_deg, lat_deg, xs, ys, fmt, out=None) -> None:
    """proj -V verbose block per point (src/proj.c vprocess:153-240):
    geographic position, projected position, and the full factor set
    with '*' marking analytic (P->spc) values."""
    from .functions.dms import rtodms_py
    from .functions.transform import factors_arrays
    from .kernels.xmath import DEG_TO_RAD

    out = out or sys.stdout
    oform = fmt if fmt is not None else "%.3f"  # vprocess default (proj.c:159)
    fc = factors_arrays(crs, lon_deg * DEG_TO_RAD, lat_deg * DEG_TO_RAD,
                        analytic=True)
    hk_c = "*" if fc["code"] & 0o4 else " "
    cv_c = "*" if fc["code"] & 0o10 else " "
    for i in range(len(lon_deg)):
        if np.isnan(xs[i]) or np.isnan(ys[i]) or not fc["valid"][i]:
            out.write("*\t*\n")
            continue
        lon_r = lon_deg[i] * VM_DEG
        lat_r = lat_deg[i] * VM_DEG
        w = out.write
        w("Longitude: %s [ %.11g ]\n" % (rtodms_py(lon_r, "E", "W"), lon_deg[i]))
        w("Latitude:  %s [ %.11g ]\n" % (rtodms_py(lat_r, "N", "S"), lat_deg[i]))
        w("Easting (x):   " + (oform % xs[i]) + "\n")
        w("Northing (y):  " + (oform % ys[i]) + "\n")
        w("Meridian scale (h)%c: %.8f  ( %.4g %% error )\n"
          % (hk_c, fc["h"][i], (fc["h"][i] - 1.0) * 100.0))
        w("Parallel scale (k)%c: %.8f  ( %.4g %% error )\n"
          % (hk_c, fc["k"][i], (fc["k"][i] - 1.0) * 100.0))
        w("Areal scale (s):     %.8f  ( %.4g %% error )\n"
          % (fc["s"][i], (fc["s"][i] - 1.0) * 100.0))
        w("Angular distortion (w): %.3f\n" % (fc["omega"][i] * RAD_TO_DEG))
        w("Meridian/Parallel angle: %.5f\n" % (fc["thetap"][i] * RAD_TO_DEG))
        w("Convergence%c: %s [ %.8f ]\n"
          % (cv_c, rtodms_py(fc["conv"][i], "", ""), fc["conv"][i] * RAD_TO_DEG))
        w("Max-min (Tissot axis a-b) scale error: %.5f %.5f\n\n"
          % (fc["a"][i], fc["b"][i]))


def cmd_proj(args) -> int:
    crs = CRS.from_proj4(args.defn)
    if getattr(args, "cheby", None):
        return _cmd_proj_cheby(args, crs)
    ll = "+proj=latlong +a=%r +es=%r" % (crs.a_orig, crs.es_orig)
    bin_in = args.bin or args.bin_in
    bin_out = args.bin or args.bin_out
    if args.vverbose and (bin_in or bin_out):
        sys.stderr.write("binary I/O not available in -V option\n")
        return 1
    # -m cartesian multiplier (proj.c:364-377,414-418): forward scales
    # the projected OUTPUT by fscale; inverse scales the projected
    # INPUT by 1/fscale ("1/x" and "1:x" spellings mean 1/x)
    fscale = None
    if args.mult:
        ms = args.mult
        if ms.startswith(("1/", "1:")):
            fscale = 1.0 / float(ms[2:])
        else:
            fscale = float(ms)
        if fscale == 0.0:
            sys.stderr.write("invalid scale argument\n")
            return 1
        if args.inverse:
            fscale = 1.0 / fscale
    passes = None
    if bin_in:
        # raw little-endian float64 pairs, radians fwd / meters inverse
        # (src/proj.c:66-67 fread of projUV)
        raw = np.frombuffer(sys.stdin.buffer.read(), dtype=np.float64)
        raw = raw[: (len(raw) // 2) * 2].reshape(-1, 2)
        u, v = raw[:, 0].copy(), raw[:, 1].copy()
        if not args.inverse:
            u *= RAD_TO_DEG
            v *= RAD_TO_DEG
        z = np.zeros_like(u)
        tails = [""] * len(u)
        lines = []
    else:
        lines = list(args.infile)
        u, v, z, tails, passes = _parse_lines(
            lines, reversein=args.reversein, tag=args.tag
        )
        if args.inverse:
            # projected in (plain floats, not DMS): re-parse as raw floats
            toks = [
                ln.split()
                for ln in lines
                if ln.strip() and not ln.startswith(args.tag)
            ]
            if args.reversein:
                u = np.array([float(t[1]) for t in toks])
                v = np.array([float(t[0]) for t in toks])
            else:
                u = np.array([float(t[0]) for t in toks])
                v = np.array([float(t[1]) for t in toks])
    if args.inverse:
        if fscale is not None:  # prescale projected input (proj.c:103)
            u = u * fscale
            v = v * fscale
        x, y, zo = transform_arrays(crs, ll, u, v, z)
        lon_deg, lat_deg = x, y  # factors at the inverse result (proj.c:104)
    else:
        x, y, zo = transform_arrays(ll, crs, u, v, z)
        lon_deg, lat_deg = u, v  # factors at the input (proj.c:101)
        if fscale is not None:  # postscale projected output (proj.c:109)
            x = x * fscale
            y = y * fscale
    if args.vverbose:
        # Easting/Northing are the PROJECTED coords: the input pair in
        # inverse mode, the output pair forward (vprocess:90-101)
        ex, ny = (u, v) if args.inverse else (x, y)
        _vprocess(crs, lon_deg, lat_deg, ex, ny, args.fmt)
        return 0
    if bin_out:
        # raw float64 pairs: meters fwd / RADIANS inverse, errors as
        # HUGE_VAL lanes (src/proj.c:112-114)
        ox, oy = (x.copy(), y.copy())
        if args.inverse:
            ox = ox / RAD_TO_DEG
            oy = oy / RAD_TO_DEG
        bad = np.isnan(ox) | np.isnan(oy)
        ox = np.where(bad, np.inf, ox)
        oy = np.where(bad, np.inf, oy)
        sys.stdout.buffer.write(
            np.ascontiguousarray(np.stack([ox, oy], axis=1)).tobytes()
        )
        return 0
    sfx = (
        _factor_suffixes(crs, lon_deg, lat_deg, fail=np.isnan(x) | np.isnan(y))
        if args.factors
        else None
    )
    echo = (
        [ln.strip() for ln in lines if ln.strip() and not ln.startswith(args.tag)]
        if args.echo
        else None
    )
    if args.inverse and args.fmt is None:
        # inverse without -f prints DMS (proj.c:117 "ascii DMS output")
        _emit(x, y, zo, tails, None, echo, dms_out=True, wfract=args.wfract,
              suffixes=sfx, reverseout=args.reverseout,
              err_line=args.err_line, wide=args.wide, passes=passes)
        return 0
    # historical proj default oform is %.2f for BOTH coords and z
    # (golden replays encode it); only -V uses the %.3f vprocess default
    _emit(x, y, zo, tails, args.fmt if args.fmt is not None else "%.2f",
          echo, suffixes=sfx, reverseout=args.reverseout,
          err_line=args.err_line, wide=args.wide, passes=passes)
    return 0


def cmd_geod(args) -> int:
    """Reference output contract (src/geod.c:59-123): angles print as
    DMS (rtodms with no hemisphere chars for azimuths) unless -f gives
    a printf format; distance prints with -F (default %.3f); -a emits
    the full value set ``lat1 lon1  lat2 lon2  az12 az21 S``; -p folds
    azimuths positive; tag lines copy through."""
    from .functions.dms import rtodms_py
    from .kernels.geodesy import geod_direct, geod_inverse

    defn = args.defn if args.defn.startswith("+") else f"+ellps={args.defn}"
    if "+proj=" not in defn:
        defn = "+proj=latlong " + defn  # geod needs only the ellipsoid
    crs = CRS.from_proj4(defn)
    a = crs.a
    f = 1.0 - (1.0 - crs.es) ** 0.5
    oform = args.fmt
    osform = args.sform if args.sform else "%.3f"

    def ang(deg: float, pos: str, neg: str) -> str:
        if oform:
            return oform % deg
        return rtodms_py(deg * VM_DEG, pos, neg, args.wfract, args.wide)

    def azi_fold(az: float) -> float:
        return az + 360.0 if (args.pos_azi and az < 0.0) else az

    w = sys.stdout.write

    # ---- arc / geodesic-interval mode (geod.c:33-57, geod_set.c:37-60):
    # +lat_1/+lon_1 (+lat_2/+lon_2 | +S +A) with a divisor
    # (+n_A/+del_A: azimuth arc sweep; +del_S | +n_S: waypoints) emits
    # the line itself instead of filtering stdin.
    plus = {}
    for tok in defn.split():
        if tok.startswith("+") and "=" in tok:
            k, v = tok[1:].split("=", 1)
            plus[k] = v
    if "lat_1" in plus:
        def _deg(key: str) -> float:  # pj_param 'r': DMS-or-degrees
            return dmstor(plus[key]) * RAD_TO_DEG

        def _adjlon_deg(az: float) -> float:  # adjlon (radians) in degrees
            while abs(az) > 180.0:
                az -= 360.0 if az > 0.0 else -360.0
            return az

        def _print_ll(lat: float, lon: float) -> None:
            w(f"{ang(lat, 'N', 'S')}\t{ang(lon, 'E', 'W')}\n")

        lat1, lon1 = _deg("lat_1"), _deg("lon_1")
        if "lat_2" in plus:
            lat2, lon2 = _deg("lat_2"), _deg("lon_2")
            s12, azi1, _ = geod_inverse(
                np.array([lat1]), np.array([lon1]),
                np.array([lat2]), np.array([lon2]), a, f,
            )
            geod_s, al12 = float(s12[0]), float(azi1[0])
        elif float(plus.get("S", 0.0) or 0.0) != 0.0:
            geod_s, al12 = float(plus["S"]), _deg("A")
            la2, lo2, _ = geod_direct(
                np.array([lat1]), np.array([lon1]),
                np.array([al12]), np.array([geod_s]), a, f,
            )
            lat2, lon2 = float(la2[0]), float(lo2[0])
        else:
            sys.stderr.write("geod: incomplete geodesic/arc info\n")
            return 1
        n_alpha = int(plus.get("n_A", 0) or 0)
        if n_alpha > 0:
            if "del_A" not in plus or _deg("del_A") == 0.0:
                sys.stderr.write("geod: del azimuth == 0\n")
                return 1
            del_a = _deg("del_A")
            # do_arc (geod.c:33-43): the initial endpoint, then n_A
            # endpoints sweeping the azimuth by del_A at fixed S
            _print_ll(lat2, lon2)
            azs = []
            az = al12
            for _ in range(n_alpha):
                az = _adjlon_deg(az + del_a)
                azs.append(az)
            la, lo, _ = geod_direct(
                np.full(n_alpha, lat1), np.full(n_alpha, lon1),
                np.array(azs), np.full(n_alpha, geod_s), a, f,
            )
            for j in range(n_alpha):
                _print_ll(float(la[j]), float(lo[j]))
            return 0
        del_s = abs(float(plus.get("del_S", 0.0) or 0.0))
        n_s = int(geod_s / del_s + 0.5) if del_s else int(plus.get("n_S", 0) or 0)
        if n_s <= 0:
            sys.stderr.write("geod: no interval divisor selected\n")
            return 1
        # do_geod (geod.c:44-57): point 1, n_S-1 equally-spaced
        # waypoints along the line, then the stored endpoint
        _print_ll(lat1, lon1)
        if n_s > 1:
            step = geod_s / n_s
            dists = np.arange(1, n_s) * step
            la, lo, _ = geod_direct(
                np.full(n_s - 1, lat1), np.full(n_s - 1, lon1),
                np.full(n_s - 1, al12), dists, a, f,
            )
            for j in range(n_s - 1):
                _print_ll(float(la[j]), float(lo[j]))
        _print_ll(lat2, lon2)
        return 0

    for line in args.infile:
        if line.startswith(args.tag):
            w(line if line.endswith("\n") else line + "\n")
            continue
        if not line.strip():
            continue
        toks = line.split()
        try:
            if args.inverse:
                _vals = [dmstor(t) * RAD_TO_DEG for t in toks[:4]]
                if len(_vals) < 4:
                    raise ValueError("need 4 fields")
            else:
                _vals = [dmstor(t) * RAD_TO_DEG for t in toks[:3]]
                if len(_vals) < 3 or len(toks) < 4:
                    raise ValueError("need 4 fields")
                float(toks[3])
        except ValueError:
            w("*\t*\t*\n")
            continue
        if args.inverse:
            lat1, lon1, lat2, lon2 = _vals
            s12, azi1, azi2 = geod_inverse(
                np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]), a, f
            )
            # geod prints the BACK azimuth at point 2 (geod_interface.c:32)
            azi2 = azi2 + np.where(azi2 >= 0, -180.0, 180.0)
            a12, a21 = azi_fold(azi1[0]), azi_fold(azi2[0])
            dist = osform % s12[0]
            if args.fullout:  # -a (geod.c:93-104)
                w(f"{ang(lat1, 'N', 'S')}\t{ang(lon1, 'E', 'W')}\t"
                  f"{ang(lat2, 'N', 'S')}\t{ang(lon2, 'E', 'W')}\t"
                  f"{ang(a12, '', '')}\t{ang(a21, '', '')}\t{dist}\n")
            else:
                w(f"{ang(a12, '', '')}\t{ang(a21, '', '')}\t{dist}\n")
        else:
            lat1, lon1, azi = _vals
            s = float(toks[3])
            lat2, lon2, azi2 = geod_direct(
                np.array([lat1]), np.array([lon1]), np.array([azi]), np.array([s]), a, f
            )
            # geod prints the BACK azimuth at point 2 (geod_interface.c:19)
            azi2 = azi2 + np.where(azi2 >= 0, -180.0, 180.0)
            a12, a21 = azi_fold(azi), azi_fold(azi2[0])
            if args.fullout:
                w(f"{ang(lat1, 'N', 'S')}\t{ang(lon1, 'E', 'W')}\t"
                  f"{ang(lat2[0], 'N', 'S')}\t{ang(lon2[0], 'E', 'W')}\t"
                  f"{ang(a12, '', '')}\t{ang(a21, '', '')}\t{osform % s}\n")
            else:
                w(f"{ang(lat2[0], 'N', 'S')}\t{ang(lon2[0], 'E', 'W')}\t{ang(a21, '', '')}\n")
    return 0


def cmd_list(args) -> int:
    """Catalog listings (proj -l / -le / -lu / -ld, ref src/proj.c:295-359)."""
    from .kernels.core import REGISTRY
    from .kernels.tables import DATUMS, ELLPS, UNITS

    kind = args.kind
    if kind in ("p", "projections"):
        for pid in sorted(REGISTRY):
            if pid in ("latlong", "longlat", "geocent"):
                continue
            sys.stdout.write(f"{pid}\n")
    elif kind in ("e", "ellipsoids"):
        for name, p in ELLPS.items():
            parts = " ".join(f"{k}={v}" for k, v in p.items() if k != "comment")
            sys.stdout.write(f"{name} {parts} # {p.get('comment', '')}\n")
    elif kind in ("u", "units"):
        for name, to_m in UNITS.items():
            sys.stdout.write(f"{name} {to_m!r}\n")
    elif kind in ("d", "datums"):
        for name, p in DATUMS.items():
            sys.stdout.write(f"{name} {p.get('ellps', '')} {p.get('defn', '')}\n")
    else:
        sys.stderr.write(f"unknown list kind {kind!r} (p/e/u/d)\n")
        return 1
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="proj_spark.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cs2cs", help="CRS -> CRS filter (ref src/cs2cs.c)")
    c.add_argument("src")
    c.add_argument("plus_to", metavar="+to", choices=["+to"])
    c.add_argument("dst")
    c.add_argument("-f", dest="fmt", default=None)
    c.add_argument("-E", dest="echo", action="store_true")
    c.add_argument(
        "-w", dest="wfract", type=int, default=3,
        help="DMS output second decimals (set_rtodms fract, default 3)",
    )
    c.add_argument(
        "-W", dest="wfract_wide", type=int, default=None,
        help="like -w but constant field width (set_rtodms con_w)",
    )
    c.add_argument("-r", dest="reversein", action="store_true",
                   help="reverse order of the first two input fields")
    c.add_argument("-s", dest="reverseout", action="store_true",
                   help="reverse order of the two output coordinates")
    c.add_argument("-e", dest="err_line", default="*\t*",
                   help="alternative text for unprojectable lines (oterr)")
    c.add_argument("-t", dest="tag", default="#", metavar="CHAR",
                   help="col-1 tag marking lines to copy through unchanged")
    c.add_argument("infile", nargs="?", type=argparse.FileType("r"), default=sys.stdin)
    c.set_defaults(fn=cmd_cs2cs)

    p = sub.add_parser("proj", help="single-CRS fwd/inv filter (ref src/proj.c)")
    p.add_argument("-I", dest="inverse", action="store_true")
    p.add_argument("defn")
    p.add_argument("-f", dest="fmt", default=None)
    p.add_argument("-E", dest="echo", action="store_true")
    p.add_argument("-S", dest="factors", action="store_true",
                   help="append <h k s omega a b> scale factors (proj.c -S)")
    p.add_argument("-V", dest="vverbose", action="store_true",
                   help="verbose per-point factor report (proj.c vprocess)")
    p.add_argument("-b", dest="bin", action="store_true",
                   help="binary (raw float64 pair) input AND output")
    p.add_argument("-i", dest="bin_in", action="store_true",
                   help="binary input only")
    p.add_argument("-o", dest="bin_out", action="store_true",
                   help="binary output only")
    p.add_argument(
        "-T", dest="cheby", default=None,
        help="generate Chebyshev/power approximation coefficients "
        "(gen_cheb.c): lam_min,lam_max,phi_min,phi_max[,res[,NU[,NV]]][,P]",
    )
    p.add_argument(
        "-w", dest="wfract", type=int, default=3,
        help="DMS output second decimals (set_rtodms fract, default 3)",
    )
    p.add_argument(
        "-W", dest="wfract_wide", type=int, default=None,
        help="like -w but constant field width (set_rtodms con_w)",
    )
    p.add_argument("-r", dest="reversein", action="store_true",
                   help="reverse order of the first two input fields")
    p.add_argument("-s", dest="reverseout", action="store_true",
                   help="reverse order of the two output coordinates")
    p.add_argument("-e", dest="err_line", default="*\t*",
                   help="alternative text for unprojectable lines (oterr)")
    p.add_argument("-t", dest="tag", default="#", metavar="CHAR",
                   help="col-1 tag marking lines to copy through unchanged")
    p.add_argument("-m", dest="mult", default=None, metavar="SCALE",
                   help="cartesian multiplier: scale projected output "
                   "(input when -I); '1/x' and '1:x' mean 1/x")
    p.add_argument("infile", nargs="?", type=argparse.FileType("r"), default=sys.stdin)
    p.set_defaults(fn=cmd_proj)

    g = sub.add_parser("geod", help="geodesic problems (ref src/geod.c)")
    g.add_argument("-I", dest="inverse", action="store_true")
    g.add_argument("defn")
    g.add_argument("-f", dest="fmt", default=None,
                   help="printf format for angles (default: DMS)")
    g.add_argument("-F", dest="sform", default=None,
                   help="printf format for distance (default %%.3f)")
    g.add_argument("-a", dest="fullout", action="store_true",
                   help="output the full set of geodesic values")
    g.add_argument("-p", dest="pos_azi", action="store_true",
                   help="fold azimuths positive (0..360)")
    g.add_argument("-t", dest="tag", default="#", metavar="CHAR",
                   help="col-1 tag marking lines to copy through unchanged")
    g.add_argument(
        "-w", dest="wfract", type=int, default=3,
        help="DMS output second decimals (set_rtodms fract, default 3)",
    )
    g.add_argument(
        "-W", dest="wfract_wide", type=int, default=None,
        help="like -w but constant field width (set_rtodms con_w)",
    )
    g.add_argument("infile", nargs="?", type=argparse.FileType("r"), default=sys.stdin)
    g.set_defaults(fn=cmd_geod)

    ls = sub.add_parser("list", help="catalog listings (proj -l/-le/-lu/-ld)")
    ls.add_argument("kind", choices=["p", "projections", "e", "ellipsoids", "u", "units", "d", "datums"])
    ls.set_defaults(fn=cmd_list)

    args = ap.parse_args(argv)
    # -W<d> implies wide constant-width DMS at d second decimals
    if getattr(args, "wfract_wide", None) is not None:
        args.wfract = args.wfract_wide
        args.wide = True
    else:
        args.wide = False
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
