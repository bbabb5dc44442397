"""CLI filters (proj/cs2cs/geod surface, ref src/{proj,cs2cs,geod}.c)."""
from __future__ import annotations

import io
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
    x = float(out.split()[0])
    assert x == pytest.approx(-79.0 * 111319.49079327358, rel=1e-9)


def test_cs2cs_unprojectable_emits_star():
    rc, out = run_cli(
        ["cs2cs", "+proj=latlong +datum=WGS84", "+to", "+proj=merc +datum=WGS84"],
        "0 90\n",
    )
    assert "*" in out  # pole: sentinel, not a crash (HUGE_VAL semantics)


def test_geod_inverse_symmetric():
    rc, out = run_cli(["geod", "-I", "+ellps=WGS84"], "40 -75 41 -74\n")
    azi1, azi2, s12 = (float(t) for t in out.split())
    assert 135_000 < s12 < 145_000
    rc2, out2 = run_cli(["geod", "-I", "+ellps=WGS84"], "41 -74 40 -75\n")
    s21 = float(out2.split()[2])
    assert s12 == pytest.approx(s21, abs=1e-3)
