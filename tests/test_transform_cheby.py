"""Chebyshev surrogate transform (functions/transform.py
fit_transform_cheby / transform_cheby) — the DataFrame form of the
reference's mk_cheby/proj -T fast path (src/mk_cheby.c:36-177)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.functions.transform import (
    _cheb2d_eval,
    fit_transform_cheby,
    transform,
    transform_cheby,
)

SRC = "+proj=latlong +datum=WGS84"
UTM11 = "+proj=utm +zone=11 +datum=WGS84"
BBOX = ((-126.0, -108.0), (25.0, 49.0))


def test_fast_eval_matches_chebval2d():
    from numpy.polynomial import chebyshev as C

    rng = np.random.default_rng(0)
    coef = rng.normal(size=(13, 13))
    u = rng.uniform(-1, 1, 500)
    v = rng.uniform(-1, 1, 500)
    ref = C.chebval2d(u, v, coef)
    got = _cheb2d_eval(coef, u, v)
    assert np.abs(got - ref).max() < 1e-9 * np.abs(ref).max()


def test_surrogate_residual_vs_exact_kernel():
    k = fit_transform_cheby(SRC, UTM11, *BBOX, degree=12)
    assert k.max_residual < 1e-5  # measured ~4e-8 m
    # independent random points, not the fit/verification grids
    from proj_spark.crs import CRS
    from proj_spark.kernels import xmath as m
    from proj_spark.plans.pipeline import build_plan

    plan = build_plan(CRS.from_proj4(SRC), CRS.from_proj4(UTM11))
    rng = np.random.default_rng(5)
    lam = rng.uniform(-126, -108, 20_000)
    phi = rng.uniform(25, 49, 20_000)
    xe, ye, _ = plan(lam * m.DEG_TO_RAD, phi * m.DEG_TO_RAD, None)
    u, v = k._norm(lam, phi)
    xa = _cheb2d_eval(k.coef_x, u, v)
    ya = _cheb2d_eval(k.coef_y, u, v)
    assert np.hypot(xa - xe, ya - ye).max() < 1e-5


def test_tolerance_refusal_on_nonsmooth_plan():
    """A piecewise-bilinear nadgrid shift is C0, so the series cannot
    converge below the kink amplitude — the fit must REFUSE the
    tolerance rather than silently return an inaccurate surrogate."""
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    register_grid("conus_syn", make_synthetic_grid())
    with pytest.raises(ValueError, match="residual"):
        fit_transform_cheby(
            "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
            UTM11,
            (-124.9, -108.1),
            (25.1, 48.9),
            degree=16,
            tol=0.01,
        )


def test_dataframe_operator_matches_transform(spark):
    pts = spark.range(2_000).select(
        F.col("id").alias("pk"),
        (F.lit(-126.0) + (F.col("id") % 360) / 20.0).alias("lon"),
        (F.lit(25.0) + (F.col("id") % 470) / 20.0).alias("lat"),
    )
    exact = transform(pts, SRC, UTM11, "lon", "lat")
    approx = transform_cheby(pts, SRC, UTM11, *BBOX, degree=12, tol=1e-4)
    j = exact.select("pk", "x", "y").join(
        approx.select("pk", F.col("x").alias("xa"), F.col("y").alias("ya")), "pk"
    )
    row = j.select(
        F.max(
            F.sqrt(
                (F.col("x") - F.col("xa")) ** 2 + (F.col("y") - F.col("ya")) ** 2
            )
        ).alias("dev")
    ).first()
    assert row.dev < 1e-5


def test_out_of_domain_rows_are_nan(spark):
    pts = spark.createDataFrame(
        [(1, -120.0, 40.0), (2, -150.0, 40.0), (3, -120.0, 60.0)],
        "pk long, lon double, lat double",
    )
    out = {r.pk: (r.x, r.y) for r in transform_cheby(
        pts, SRC, UTM11, *BBOX, degree=12
    ).collect()}
    assert np.isfinite(out[1]).all()

    def _missing(v):  # Arrow maps NaN doubles to null on collect
        return v is None or np.isnan(v)

    assert all(_missing(v) for v in out[2]) and all(_missing(v) for v in out[3])
