"""+init= catalog files: parsing, search path, CRS integration,
explicit-parameter precedence, get_def roundtrip."""
from __future__ import annotations

import numpy as np
import pytest

from proj_spark.crs import CRS
from proj_spark.plans.pipeline import transform_arrays
from proj_spark.sources.initfiles import get_init, set_search_path


def test_bundled_demo_lookup():
    assert "+proj=utm" in get_init("demo:utm11n")
    assert "+lat_2=45" in get_init("demo:conus_lcc")  # multi-line block


def test_missing_key_raises():
    with pytest.raises(KeyError):
        get_init("demo:nope")
    with pytest.raises(FileNotFoundError):
        get_init("no_such_catalog:x")


def test_init_crs_equals_explicit():
    a = CRS.from_proj4("+init=demo:utm11n")
    b = CRS.from_proj4("+proj=utm +zone=11 +datum=WGS84")
    lon = np.array([-117.5, -116.0])
    lat = np.array([33.0, 41.0])
    xa, ya, _ = transform_arrays("+proj=latlong +datum=WGS84", a, lon, lat)
    xb, yb, _ = transform_arrays("+proj=latlong +datum=WGS84", b, lon, lat)
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)


def test_explicit_params_override_init():
    c = CRS.from_proj4("+init=demo:utm11n +zone=12")
    assert c.params["zone"] == "12"


def test_custom_search_path(tmp_path):
    p = tmp_path / "mycat"
    p.write_text("<local_merc> +proj=merc +R=6371000 <>\n")
    set_search_path([str(tmp_path)])
    try:
        c = CRS.from_proj4("+init=mycat:local_merc")
        assert c.proj == "merc" and c.a == 6371000.0
    finally:
        set_search_path([])


def test_get_def_roundtrip():
    c = CRS.from_proj4("+init=demo:swiss")
    d = CRS.from_proj4(c.get_def())
    assert d.proj == "somerc"
    lon = np.array([7.8, 8.5])
    lat = np.array([46.5, 47.2])
    x1, y1, _ = transform_arrays("+proj=latlong +ellps=bessel", c, lon, lat)
    x2, y2, _ = transform_arrays("+proj=latlong +ellps=bessel", d, lon, lat)
    assert np.array_equal(x1, x2) and np.array_equal(y1, y2)


def test_spherification_variants():
    """pj_ell_set.c:60-88 R_* switches (full set, round-2 addition)."""
    import math

    from proj_spark.crs import CRS

    a_w, b_w = 6378137.0, 6356752.314245179
    cases = {
        "+R_A": 6371007.180918,   # authalic (equal area)
        "+R_V": 6371000.790009,   # equal volume
        "+R_a": 0.5 * (a_w + b_w),
        "+R_g": math.sqrt(a_w * b_w),
        "+R_h": 2.0 * a_w * b_w / (a_w + b_w),
    }
    for flag, exp in cases.items():
        crs = CRS.from_proj4(f"+proj=merc +ellps=WGS84 {flag}")
        assert crs.es == 0.0, flag
        assert abs(crs.a - exp) < 0.5, (flag, crs.a, exp)
    # latitude-mean variants at 45 deg
    es = 0.0066943799901413165
    t = 1.0 - es * 0.5
    crs = CRS.from_proj4("+proj=merc +ellps=WGS84 +R_lat_a=45")
    assert abs(crs.a - a_w * 0.5 * (1.0 - es + t) / (t * math.sqrt(t))) < 1e-6
    crs = CRS.from_proj4("+proj=merc +ellps=WGS84 +R_lat_g=45")
    assert abs(crs.a - a_w * math.sqrt(1.0 - es) / t) < 1e-6
    # R_* changes projected output end-to-end
    from proj_spark.plans.pipeline import transform_arrays

    x1, _, _ = transform_arrays("+proj=latlong +ellps=WGS84",
                                "+proj=merc +ellps=WGS84 +R_A", [10.0], [0.0])
    x2, _, _ = transform_arrays("+proj=latlong +ellps=WGS84",
                                "+proj=merc +ellps=WGS84", [10.0], [0.0])
    assert abs(x1[0] - 6371007.180918 * math.radians(10.0)) < 0.01
    assert x1[0] != x2[0]
