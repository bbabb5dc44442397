"""Karney geodesic port (kernels/karney.py vs src/geodesic.c): property
tests (direct/inverse closure, sphere-analytic agreement, Vincenty
cross-check) plus the hard near-antipodal cases quoted in the reference
source comments — exactly the region where Vincenty fails."""
from __future__ import annotations

import numpy as np
import pytest

from proj_spark.kernels.geodesy import vincenty_inverse
from proj_spark.kernels.karney import Geodesic, geod_direct, geod_inverse, geod_polygon_area


def test_inverse_direct_closure():
    g = Geodesic()
    rng = np.random.default_rng(11)
    lat1 = rng.uniform(-90, 90, 4000)
    lon1 = rng.uniform(-180, 180, 4000)
    lat2 = rng.uniform(-90, 90, 4000)
    lon2 = rng.uniform(-180, 180, 4000)
    s12, azi1, _ = g.inverse(lat1, lon1, lat2, lon2)
    lat2b, lon2b, _ = g.direct(lat1, lon1, azi1, s12)
    assert np.abs(lat2b - lat2).max() < 1e-11
    # longitude closure measured metrically (ill-conditioned near poles)
    dlon = np.abs((lon2b - lon2 + 180.0) % 360.0 - 180.0)
    assert (dlon * np.cos(np.radians(lat2))).max() < 1e-11


def test_sphere_matches_great_circle():
    R = 6371000.0
    g = Geodesic(R, 0.0)
    rng = np.random.default_rng(3)
    lat1 = rng.uniform(-89, 89, 500)
    lon1 = rng.uniform(-180, 180, 500)
    lat2 = rng.uniform(-89, 89, 500)
    lon2 = rng.uniform(-180, 180, 500)
    s12, _, _ = g.inverse(lat1, lon1, lat2, lon2)
    p1, l1 = np.radians(lat1), np.radians(lon1)
    p2, l2 = np.radians(lat2), np.radians(lon2)
    cd = np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(l2 - l1)
    ana = R * np.arccos(np.clip(cd, -1, 1))
    np.testing.assert_allclose(s12, ana, atol=1e-6)


def test_agrees_with_vincenty_away_from_antipode():
    rng = np.random.default_rng(5)
    lat1 = rng.uniform(-85, 85, 2000)
    lon1 = rng.uniform(-180, 180, 2000)
    lat2 = rng.uniform(-85, 85, 2000)
    lon2 = rng.uniform(-180, 180, 2000)
    s_k, a1_k, _ = geod_inverse(lat1, lon1, lat2, lon2)
    s_v, a1_v, _ = vincenty_inverse(lat1, lon1, lat2, lon2)
    benign = (s_k < 19_000_000) & ~np.isnan(a1_v)
    assert benign.sum() > 1500
    np.testing.assert_allclose(s_k[benign], s_v[benign], atol=2e-4)
    dazi = np.abs((a1_k[benign] - a1_v[benign] + 180.0) % 360.0 - 180.0)
    assert dazi.max() < 1e-5


@pytest.mark.parametrize(
    "lat1,lon1,lat2,lon2",
    [
        # inverse cases quoted in geodesic.c comments as historically
        # hard (near-antipodal / symmetric); Vincenty diverges here
        (48.522876735459, 0.0, -48.52287673545898293, 179.599720456223079643),
        (52.784459512564, 0.0, -52.784459512563990912, 179.634407464943777557),
        (56.320923501171, 0.0, -56.320923501171, 179.664747671772880215),
        (88.202499451857, 0.0, -88.202499451857, 179.981022032992859592),
        (89.262080389218, 0.0, -89.262080389218, 179.992207982775375662),
        (89.333123580033, 0.0, -89.333123580032997687, 179.99295812360148422),
        (20.001, 0.0, 20.001, 0.0),  # coincident
        (0.0, 0.0, 0.0, 179.5),  # equatorial near-antipodal
        (30.0, 10.0, -30.0, -170.0),  # exactly antipodal
    ],
)
def test_hard_cases_close(lat1, lon1, lat2, lon2):
    s12, azi1, _ = geod_inverse([lat1], [lon1], [lat2], [lon2])
    assert np.isfinite(s12[0])
    lat2b, lon2b, _ = geod_direct([lat1], [lon1], azi1, s12)
    err_deg = np.hypot(lat2b[0] - lat2, (lon2b[0] - lon2 + 180.0) % 360.0 - 180.0)
    assert err_deg < 1e-9  # ~0.1 mm


def test_equatorial_near_antipodal_golden():
    """Karney (2013) Table example: (0,0) -> (0,179.5) leaves the
    equator with azi1 = 55.96649514 deg."""
    s12, azi1, azi2 = geod_inverse([0.0], [0.0], [0.0], [179.5])
    assert azi1[0] == pytest.approx(55.96649514, abs=1e-7)
    assert s12[0] == pytest.approx(19980861.9089, abs=1e-3)


def test_meridian_and_equator_special_cases():
    # pure meridian: quarter meridian from equator to pole
    s12, azi1, _ = geod_inverse([0.0], [0.0], [90.0], [0.0])
    assert s12[0] == pytest.approx(10001965.729, abs=1e-2)  # WGS84 quadrant
    assert azi1[0] == pytest.approx(0.0, abs=1e-12)
    # equatorial line: arc length = a * lam12
    s12, azi1, _ = geod_inverse([0.0], [10.0], [0.0], [50.0])
    assert s12[0] == pytest.approx(6378137.0 * np.radians(40.0), rel=1e-12)
    assert azi1[0] == pytest.approx(90.0, abs=1e-12)


def test_polygon_area_known_values():
    # 1x1 degree square at the equator, ccw: GeographicLib value
    per, area = geod_polygon_area([0, 1, 1, 0], [0, 0, 1, 1])
    assert area / 1e6 == pytest.approx(12308.778361, abs=1e-3)
    # clockwise vertex order flips the sign
    _, area_cw = geod_polygon_area([0, 0, 1, 1], [0, 1, 1, 0])
    assert area_cw == pytest.approx(-area, rel=1e-15)
    # quad inscribed in the 89N parallel: area -> 2 r^2 (planar square
    # limit, r = ~111.7 km polar distance), within a percent
    _, area_p = geod_polygon_area([0, 90, 180, -90], [89, 89, 89, 89])
    r = 10001965.729 / 90.0  # meters per degree of meridian arc
    assert abs(area_p) == pytest.approx(2 * r * r, rel=2e-2)


def test_area_whole_ellipsoid_consistency():
    # hemisphere bounded by the equator, ccw seen from the north
    g = Geodesic()
    area0 = 4.0 * np.pi * g.c2
    _, area = geod_polygon_area([0, 90, 180, -90], [0, 0, 0, 0])
    assert abs(area) == pytest.approx(area0 / 2.0, rel=1e-9)
