"""CLI filters (proj/cs2cs/geod surface, ref src/{proj,cs2cs,geod}.c)."""
from __future__ import annotations

import io
import math
import sys

import numpy as np
import pytest

from proj_spark.cli import main


def run_cli(argv, stdin_text):
    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin = io.StringIO(stdin_text)
    sys.stdout = io.StringIO()
    try:
        rc = main(argv)
        out = sys.stdout.getvalue()
    finally:
        sys.stdin, sys.stdout = old_in, old_out
    return rc, out


def test_proj_fwd_matches_kernel():
    rc, out = run_cli(["proj", "+proj=utm +zone=11 +datum=WGS84"], "-117.5 33.0\n")
    assert rc == 0
    x, y = (float(t) for t in out.split()[:2])
    from proj_spark.plans.pipeline import transform_arrays

    xe, ye, _ = transform_arrays(
        "+proj=latlong +datum=WGS84", "+proj=utm +zone=11 +datum=WGS84", [-117.5], [33.0]
    )
    assert x == pytest.approx(xe[0], abs=0.01)
    assert y == pytest.approx(ye[0], abs=0.01)


def test_proj_inverse_roundtrip():
    rc, out = run_cli(["proj", "+proj=utm +zone=11 +datum=WGS84"], "-117.5 33.0\n")
    rc2, out2 = run_cli(
        ["proj", "-I", "+proj=utm +zone=11 +datum=WGS84", "-f", "%.9f"],
        " ".join(out.split()[:2]) + "\n",
    )
    lon, lat = (float(t) for t in out2.split()[:2])
    assert lon == pytest.approx(-117.5, abs=1e-6)
    assert lat == pytest.approx(33.0, abs=1e-6)


def test_cs2cs_dms_and_comments():
    rc, out = run_cli(
        ["cs2cs", "+proj=latlong +datum=WGS84", "+to", "+proj=merc +datum=WGS84", "-f", "%.3f"],
        "# comment line\n79d00'W 43d30'N\n",
    )
    assert rc == 0
    lines = out.splitlines()
    # tag-marked lines are copied through in place (cs2cs.c:78-80)
    assert lines[0] == "# comment line"
    x = float(lines[1].split()[0])
    assert x == pytest.approx(-79.0 * 111319.49079327358, rel=1e-9)


def test_cs2cs_unprojectable_emits_star():
    rc, out = run_cli(
        ["cs2cs", "+proj=latlong +datum=WGS84", "+to", "+proj=merc +datum=WGS84"],
        "0 90\n",
    )
    assert "*" in out  # pole: sentinel, not a crash (HUGE_VAL semantics)


def test_geod_inverse_symmetric():
    rc, out = run_cli(["geod", "-I", "-f", "%.5f", "+ellps=WGS84"], "40 -75 41 -74\n")
    azi1, azi2, s12 = (float(t) for t in out.split())
    assert 135_000 < s12 < 145_000
    rc2, out2 = run_cli(["geod", "-I", "-f", "%.5f", "+ellps=WGS84"], "41 -74 40 -75\n")
    s21 = float(out2.split()[2])
    assert s12 == pytest.approx(s21, abs=1e-3)


def test_geod_default_dms_fullout_and_positive_azimuths():
    """geod defaults to DMS azimuths (geod.c:100-104 rtodms with no
    hemisphere chars); -a prints the full value set; -p folds
    azimuths positive; -F reformats the distance."""
    rc, out = run_cli(["geod", "-I", "+ellps=WGS84"], "40 -75 41 -74\n")
    toks = out.split("\t")
    assert len(toks) == 3 and "d" in toks[0]  # DMS azimuths
    rc, full = run_cli(
        ["geod", "-I", "-a", "-f", "%.5f", "-F", "%.1f", "+ellps=WGS84"],
        "40 -75 41 -74\n",
    )
    vals = [float(t) for t in full.split()]
    assert len(vals) == 7
    assert vals[:4] == [40.0, -75.0, 41.0, -74.0]
    assert 135_000 < vals[6] < 145_000
    # -p: the back azimuth (negative here) folds into 0..360
    rc, pos = run_cli(
        ["geod", "-I", "-p", "-f", "%.5f", "+ellps=WGS84"], "40 -75 41 -74\n"
    )
    a12, a21 = (float(t) for t in pos.split()[:2])
    assert 0.0 <= a12 <= 360.0 and 0.0 <= a21 <= 360.0
    # tag pass-through
    rc, tagged = run_cli(["geod", "-I", "+ellps=WGS84"], "# note\n40 -75 41 -74\n")
    assert tagged.splitlines()[0] == "# note"


def test_proj_T_chebyshev_block():
    """proj -T (gen_cheb.c surface): emits the #proj_Chebyshev block
    with the F-line domain echo and coefficient rows; merc x = a*lam
    shows exactly one u coefficient (degree 1)."""
    rc, out = run_cli(
        ["proj", "+proj=merc +ellps=WGS84", "-T-10,10,-20,20,-3,8,8"], ""
    )
    lines = out.splitlines()
    assert lines[0] == "#proj_Chebyshev"
    assert "F,0,-10,10,-20,20" in lines
    assert lines[-1] == "#end_proj_Chebyshev"
    iu = lines.index("u: 2")
    # merc x is linear in lam and phi-free: a single degree-1 row
    deg, m, coef = lines[iu + 1].split()[:3]
    assert (deg, m) == ("1", "1")
    assert abs(float(coef) - 2 * 6378137.0 * math.radians(10.0)) < 1.0


def test_proj_T_power_evaluates_like_projection():
    """-T ...,P emits a POWER series (bch2bps.c) that reproduces the
    projection inside the domain."""
    import numpy as np
    from numpy.polynomial import polynomial as P

    rc, out = run_cli(
        ["proj", "+proj=lcc +lat_1=33 +lat_2=45 +lon_0=0 +ellps=WGS84",
         "-T-10,10,30,50,-3,12,12,P"], ""
    )
    lines = out.splitlines()
    assert lines[0] == "#proj_Power"
    # parse the u: block back into a coefficient matrix
    iu = next(i for i, l in enumerate(lines) if l.startswith("u: "))
    iv = next(i for i, l in enumerate(lines) if l.startswith("v: "))
    nru = int(lines[iu].split()[1])
    cu = np.zeros((12, 12))
    for l in lines[iu + 1: iv]:
        t = l.split()
        i, m = int(t[0]), int(t[1])
        cu[i, :m] = [float(x) for x in t[2: 2 + m]]
    # compare against the real kernel at interior points
    from proj_spark.plans.pipeline import transform_arrays

    lam = np.radians(np.array([-5.0, 3.0, 8.0]))
    phi = np.radians(np.array([35.0, 40.0, 48.0]))
    x, y, _ = transform_arrays(
        "+proj=latlong +ellps=WGS84",
        "+proj=lcc +lat_1=33 +lat_2=45 +lon_0=0 +ellps=WGS84",
        np.degrees(lam), np.degrees(phi), None,
    )
    xa = P.polyval2d(lam, phi, cu)
    assert np.max(np.abs(xa - x)) < 0.5  # res=-3: ~1e-3 nominal, mm-level


def test_proj_S_factors_suffix():
    """proj -S appends <h k s omega a b> (src/proj.c:139-146); on a
    UTM central-meridian point h=k=k0=0.9996 and omega~0."""
    rc, out = run_cli(
        ["proj", "-S", "+proj=utm +zone=15 +ellps=GRS80"], "-93 40\nbogus line\n"
    )
    assert rc == 0
    lines = out.splitlines()
    sfx = lines[0].split("<")[1].rstrip(">")
    h, k, s, omega, a, b = (float(t) for t in sfx.split())
    assert abs(h - 0.9996) < 1e-6 and abs(k - 0.9996) < 1e-6
    assert abs(s - 0.9996**2) < 1e-6 and omega < 1e-2
    assert "<* * * * * *>" in lines[1]


def test_proj_V_verbose_block():
    """proj -V prints the vprocess report (src/proj.c:153-240) with '*'
    marking analytic (P->spc) factors on lcc."""
    rc, out = run_cli(
        ["proj", "-V", "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +ellps=GRS80"],
        "-96d30 44\n",
    )
    assert rc == 0
    assert "Longitude: 96d30'W [ -96.5 ]" in out
    assert "Latitude:  44dN [ 44 ]" in out
    assert "Meridian scale (h)*: 0.99828407" in out  # analytic -> '*'
    assert "Parallel scale (k)*: 0.99828407" in out
    assert "Areal scale (s):     0.99657107" in out
    assert "Meridian/Parallel angle: 89.999" in out
    assert "Convergence*: " in out
    # vprocess default oform is %.3f (proj.c:159)
    assert "Easting (x):   -40034.080" in out


def test_proj_V_numeric_projection_no_stars():
    rc, out = run_cli(["proj", "-V", "+proj=merc +ellps=WGS84"], "10 45\n")
    assert rc == 0
    assert "Meridian scale (h) : " in out  # numeric -> space, no '*'
    assert "Convergence : " in out


def test_proj_binary_io_roundtrip():
    """proj -b: raw float64 radian pairs in, meter pairs out
    (src/proj.c:66,112 projUV fread/fwrite)."""
    import subprocess

    data = np.array([[0.5, 0.7], [99.0, 99.0]], dtype=np.float64).tobytes()
    p = subprocess.run(
        [sys.executable, "-m", "proj_spark.cli", "proj", "-b", "+proj=merc +ellps=WGS84"],
        input=data, capture_output=True,
    )
    out = np.frombuffer(p.stdout, dtype=np.float64).reshape(-1, 2)
    from proj_spark.plans.pipeline import transform_arrays

    x, y, _ = transform_arrays(
        "+proj=latlong +ellps=WGS84", "+proj=merc +ellps=WGS84",
        np.array([0.5 * 180 / math.pi]), np.array([0.7 * 180 / math.pi]), None,
    )
    assert abs(out[0, 0] - x[0]) < 1e-6 and abs(out[0, 1] - y[0]) < 1e-6
    assert np.isinf(out[1]).all()  # overrange lane -> HUGE_VAL pair

    # -I -o: text meters in, binary radian pairs out
    p2 = subprocess.run(
        [sys.executable, "-m", "proj_spark.cli", "proj", "-I", "-o",
         "+proj=merc +ellps=WGS84"],
        input=f"{x[0]:.6f} {y[0]:.6f}\n".encode(), capture_output=True,
    )
    inv = np.frombuffer(p2.stdout, dtype=np.float64)
    assert abs(inv[0] - 0.5) < 1e-9 and abs(inv[1] - 0.7) < 1e-9


# ---------------------------------------------- r/s/e/m/t/W flag parity
def test_proj_reverse_in_out():
    """-r parses 'lat lon'; -s emits 'y x' (proj.c:83-89,118-129)."""
    base_rc, base = run_cli(["proj", "+proj=utm +zone=11 +datum=WGS84"], "-117.5 33.0\n")
    r_rc, r_out = run_cli(["proj", "-r", "+proj=utm +zone=11 +datum=WGS84"], "33.0 -117.5\n")
    assert (base_rc, r_out) == (0, base)
    s_rc, s_out = run_cli(["proj", "-s", "+proj=utm +zone=11 +datum=WGS84"], "-117.5 33.0\n")
    bx, by = base.split()[:2]
    assert s_out.split()[:2] == [by, bx]


def test_proj_error_line_and_tag():
    """-e substitutes oterr; -t retags the pass-through marker."""
    rc, out = run_cli(
        ["proj", "-e", "<fail>", "+proj=utm +zone=11 +datum=WGS84"], "xx yy\n"
    )
    assert out.startswith("<fail>")
    rc, out = run_cli(
        ["proj", "-t", "%", "+proj=utm +zone=11 +datum=WGS84"],
        "% keep me\n-117.5 33.0\n",
    )
    lines = out.splitlines()
    assert lines[0] == "% keep me" and len(lines) == 2


def test_proj_cartesian_multiplier_roundtrip():
    """-m scales forward output; -m with -I divides projected input
    (proj.c:414-418 inverse fscale = 1/fscale)."""
    rc, base = run_cli(["proj", "-f", "%.6f", "+proj=merc +ellps=WGS84"], "10 20\n")
    rc, doubled = run_cli(["proj", "-m", "2", "-f", "%.6f", "+proj=merc +ellps=WGS84"], "10 20\n")
    bx, by = (float(t) for t in base.split()[:2])
    dx, dy = (float(t) for t in doubled.split()[:2])
    assert dx == pytest.approx(2 * bx, rel=1e-12) and dy == pytest.approx(2 * by, rel=1e-12)
    # 1:2 spelling means 1/2
    rc, halved = run_cli(["proj", "-m", "1:2", "-f", "%.6f", "+proj=merc +ellps=WGS84"], "10 20\n")
    hx = float(halved.split()[0])
    assert hx == pytest.approx(0.5 * bx, rel=1e-12)
    # inverse: feed the doubled coords back with -m 2 -> original lon/lat
    rc, inv = run_cli(
        ["proj", "-I", "-m", "2", "-f", "%.9f", "+proj=merc +ellps=WGS84"],
        f"{dx:.6f} {dy:.6f}\n",
    )
    lon, lat = (float(t) for t in inv.split()[:2])
    assert lon == pytest.approx(10.0, abs=1e-7) and lat == pytest.approx(20.0, abs=1e-7)


def test_proj_inverse_default_dms_and_wide():
    """-I without -f prints DMS (proj.c:117); -W3 pads to constant
    width (rtodms.c:30-32 con_w format)."""
    rc, fwd = run_cli(["proj", "+proj=utm +zone=11 +datum=WGS84"], "-117.5 33.0\n")
    pt = " ".join(fwd.split()[:2]) + "\n"
    rc, dms = run_cli(["proj", "-I", "+proj=utm +zone=11 +datum=WGS84"], pt)
    assert "d" in dms and dms.split()[0].endswith("W")
    rc, wide = run_cli(["proj", "-I", "-W3", "+proj=utm +zone=11 +datum=WGS84"], pt)
    tok = wide.split()[0]
    # constant width: zero-padded minutes and seconds always present
    assert "'" in tok and '"' in tok
    mins = tok.split("d")[1].split("'")[0]
    assert len(mins) == 2


def test_cs2cs_reverse_flags():
    rc, base = run_cli(
        ["cs2cs", "-f", "%.4f", "+proj=latlong +datum=WGS84", "+to",
         "+proj=merc +datum=WGS84"],
        "-79.5 43.25\n",
    )
    rc, r_out = run_cli(
        ["cs2cs", "-r", "-f", "%.4f", "+proj=latlong +datum=WGS84", "+to",
         "+proj=merc +datum=WGS84"],
        "43.25 -79.5\n",
    )
    assert r_out == base
    rc, s_out = run_cli(
        ["cs2cs", "-s", "-f", "%.4f", "+proj=latlong +datum=WGS84", "+to",
         "+proj=merc +datum=WGS84"],
        "-79.5 43.25\n",
    )
    bx, by = base.split()[:2]
    assert s_out.split()[:2] == [by, bx]


def test_geod_waypoint_mode_endpoint_defined():
    """+lat_1/+lon_1/+lat_2/+lon_2 +n_S emits the n_S+1 points of the
    geodesic (do_geod, geod.c:44-57): point 1, n_S-1 equally spaced
    intermediates, the exact stored endpoint; stdin is not consumed."""
    rc, out = run_cli(
        ["geod", "-f", "%.9f",
         "+ellps=WGS84 +lat_1=40 +lon_1=-74 +lat_2=50 +lon_2=-3 +n_S=4"],
        "SHOULD NOT BE READ\n",
    )
    assert rc == 0
    rows = [tuple(float(t) for t in ln.split("\t")) for ln in out.splitlines()]
    assert len(rows) == 5
    assert rows[0] == (40.0, -74.0)
    assert rows[-1] == (50.0, -3.0)
    # consecutive points are equally spaced along the SAME geodesic:
    # each leg's distance is total/4 and the azimuth chain is continuous
    from proj_spark.kernels.geodesy import geod_inverse

    lats = np.array([r[0] for r in rows])
    lons = np.array([r[1] for r in rows])
    s_total = geod_inverse(lats[:1], lons[:1], lats[-1:], lons[-1:], 6378137.0, 1 / 298.257223563)[0][0]
    legs = geod_inverse(lats[:-1], lons[:-1], lats[1:], lons[1:], 6378137.0, 1 / 298.257223563)[0]
    assert np.allclose(legs, s_total / 4.0, atol=0.5)


def test_geod_waypoint_mode_del_S_rounding():
    """+del_S: n_S = S/del_S + .5 C-truncated (geod_set.c:57)."""
    rc, out = run_cli(
        ["geod",
         "+ellps=clrk66 +lat_1=30n +lon_1=0 +lat_2=60n +lon_2=0 +del_S=1112000"],
        "",
    )
    # meridian arc ~3335km -> n_S = int(2.999+0.5) = 3 -> 4 lines
    assert len(out.splitlines()) == 4
    # DMS default formatting with hemisphere letters (printLL)
    assert out.splitlines()[0] == "30dN\t0dE"


def test_geod_arc_mode_sweeps_azimuth():
    """+n_A/+del_A (do_arc, geod.c:33-43): initial endpoint then n_A
    points at azimuths al12 + i*del_A, fixed S — each output point is
    exactly geod_direct(point1, az_i, S)."""
    from proj_spark.kernels.geodesy import geod_direct

    rc, out = run_cli(
        ["geod", "-f", "%.9f",
         "+ellps=WGS84 +lat_1=40 +lon_1=-74 +S=100000 +A=45 +n_A=3 +del_A=10"],
        "",
    )
    rows = [tuple(float(t) for t in ln.split("\t")) for ln in out.splitlines()]
    assert len(rows) == 4
    a, f = 6378137.0, 1 / 298.257223563
    for i, az in enumerate([45.0, 55.0, 65.0, 75.0]):
        la, lo, _ = geod_direct(
            np.array([40.0]), np.array([-74.0]), np.array([az]), np.array([100000.0]), a, f
        )
        assert rows[i][0] == pytest.approx(la[0], abs=1e-9)
        assert rows[i][1] == pytest.approx(lo[0], abs=1e-9)


def test_geod_arc_mode_errors():
    rc, _ = run_cli(["geod", "+ellps=WGS84 +lat_1=40 +lon_1=-74"], "")
    assert rc == 1  # incomplete geodesic/arc info
    rc, _ = run_cli(
        ["geod", "+ellps=WGS84 +lat_1=40 +lon_1=-74 +lat_2=41 +lon_2=-73"], ""
    )
    assert rc == 1  # no interval divisor selected
