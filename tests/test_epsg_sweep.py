"""Catalog-wide compile + projection sweep: every entry of the
reference's epsg / esri / IGNF init catalogs must compile through our
CRS pipeline, and every projected CRS must produce finite output for a
point inside its nominal domain (lon_0 + 1, a latitude taken from its
own parameters).  This is the breadth counterpart to the golden-value
corpora: ~6.5k real-world CRS definitions exercising the full
parameter surface (ellipsoids, datums, towgs84, units, lat_ts/lat_1/
lonc/alpha variants, every projection family the catalogs use)."""
from __future__ import annotations

import math
import os

import numpy as np
import pytest

NAD = "/root/reference/nad"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(NAD, "epsg")), reason="reference tree absent"
)


def _sweep(path: str):
    import proj_spark.kernels.xmath as m
    from proj_spark.crs import CRS
    from proj_spark.kernels.core import compile_proj
    from proj_spark.sources.initfiles import _read_init_file

    os.environ["PROJ_SPARK_LIB"] = NAD
    entries = _read_init_file(path)
    compile_fails = []
    nan_fails = []
    n_proj = 0
    D = 180.0 / math.pi
    for key, params in entries.items():
        try:
            crs = CRS.from_proj4(params)
        except Exception as e:  # noqa: BLE001
            compile_fails.append((key, str(e)[:80]))
            continue
        if crs.is_latlong or crs.is_geocent:
            continue
        try:
            cp = compile_proj(crs)
        except Exception as e:  # noqa: BLE001
            compile_fails.append((key, str(e)[:80]))
            continue
        n_proj += 1
        lat = None
        for k in ("lat_1", "lat_0", "lat_ts"):
            if k in crs.params:
                try:
                    lat = m.dms_param(crs.params[k]) * D
                    break
                except Exception:  # noqa: BLE001
                    pass
        if lat is None or abs(lat) > 85.0:
            lat = 30.0
        if abs(lat) < 1.0:
            lat = 15.0
        x, y = cp.fwd(np.array([1.0 / D]), np.array([lat / D]))
        if not (np.isfinite(x[0]) and np.isfinite(y[0])):
            nan_fails.append((key, crs.proj))
    return len(entries), n_proj, compile_fails, nan_fails


def test_epsg_catalog_sweep():
    total, n_proj, cf, nf = _sweep(os.path.join(NAD, "epsg"))
    assert total > 4900
    assert not cf, f"{len(cf)} compile failures: {cf[:10]}"
    assert not nf, f"{len(nf)} non-finite projections: {nf[:10]}"
    assert n_proj > 4000


def test_esri_catalog_sweep():
    total, n_proj, cf, nf = _sweep(os.path.join(NAD, "esri"))
    assert total > 2900
    # the esri catalog ships 29 defective entries with no +proj at all
    # (e.g. <53001> '+a=6371000 +b=6371000 +units=m no_defs') — the
    # reference errors on them too (-26); every OTHER entry must pass
    real = [(k, m) for k, m in cf if "no +proj" not in m]
    assert not real, f"{len(real)} compile failures: {real[:10]}"
    assert len(cf) <= 30
    assert not nf, f"{len(nf)} non-finite projections: {nf[:10]}"


def test_ignf_catalog_sweep():
    total, n_proj, cf, nf = _sweep(os.path.join(NAD, "IGNF"))
    assert total > 300
    assert not cf, f"{len(cf)} compile failures: {cf[:10]}"
    assert not nf, f"{len(nf)} non-finite projections: {nf[:10]}"
