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
