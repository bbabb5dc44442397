"""Golden-vector tests transcribed from the reference regression
corpus /root/reference/nad/tv_out.dist (driven by nad/testvarious):
extended transverse Mercator (#97 blocks, tv_out.dist:59-71) and
HEALPix sphere/ellipsoid (tv_out.dist:95-111).  Tolerances follow the
golden print precision (%.2f m; %.3f arcsec DMS; %.5f healpix units).
"""
from __future__ import annotations

import numpy as np
import pytest

from proj_spark.crs import dmstor
from proj_spark.kernels.xmath import RAD_TO_DEG
from proj_spark.plans.pipeline import transform_arrays

ETMERC = "+proj=etmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000"
LL = "+proj=latlong +datum=WGS84"


def _dms(s: str) -> float:
    return dmstor(s) * RAD_TO_DEG


class TestEtmercGolden:
    # tv_out.dist:60-64 — etmerc -> latlong
    FWD_CASES = [
        ((10000.0, 20000.0), ("20dW", "0dN")),
        ((500000.0, 2000000.0), ("15d22'16.108\"W", "17d52'53.478\"N")),
        ((1000000.0, 2000000.0), ("10d40'55.532\"W", "17d42'48.526\"N")),
        ((2000000.0, 2000000.0), ("1d32'21.33\"W", "17d3'47.233\"N")),
        ((4000000.0, 2000000.0), ("15d4'42.357\"E", "14d48'56.372\"N")),
    ]

    @pytest.mark.parametrize("xy,exp", FWD_CASES)
    def test_etmerc_to_latlong(self, xy, exp):
        lon, lat, _ = transform_arrays(ETMERC, LL, [xy[0]], [xy[1]])
        # golden precision: 0.001 arcsec ~= 2.8e-7 deg
        assert lon[0] == pytest.approx(_dms(exp[0]), abs=5e-7)
        assert lat[0] == pytest.approx(_dms(exp[1]), abs=5e-7)

    # tv_out.dist:67-71 — latlong -> etmerc
    INV_CASES = [
        (("0dE", "0dN"), (2278817.00, 20000.00)),
        (("15d22'16.108\"W", "17d52'53.478\"N"), (499999.99, 2000000.01)),
        (("10d40'55.532\"W", "17d42'48.526\"N"), (999999.99, 1999999.99)),
        (("1d32'21.33\"W", "17d3'47.233\"N"), (2000000.00, 1999999.99)),
        (("15d4'42.357\"E", "14d48'56.372\"N"), (4000000.00, 2000000.01)),
    ]

    @pytest.mark.parametrize("ll,exp", INV_CASES)
    def test_latlong_to_etmerc(self, ll, exp):
        x, y, _ = transform_arrays(LL, ETMERC, [_dms(ll[0])], [_dms(ll[1])])
        # inputs quantized at 0.001" -> ~3cm positional tolerance
        assert x[0] == pytest.approx(exp[0], abs=0.05)
        assert y[0] == pytest.approx(exp[1], abs=0.05)


class TestHealpixGolden:
    # tv_out.dist:96-107 — sphere (+R=5 block scaled to R; +a=1 rows)
    SPHERE_R5 = [
        ((0.0, 0.0), (0.0, 0.0)),
        ((0.0, 41.810314895778596), (0.0, 3.92699)),
        ((0.0, -41.810314895778596), (0.0, -3.92699)),
        ((90.0, 0.0), (7.85398, 0.0)),
        ((-90.0, 0.0), (-7.85398, 0.0)),
        ((-180.0, 0.0), (-15.70796, 0.0)),
        ((-180.0, 90.0), (-19.63495, 7.85398)),
        ((-180.0, -90.0), (-19.63495, -7.85398)),
        ((0.0, 60.0), (1.43738, 5.36437)),
        ((0.0, -60.0), (1.43738, -5.36437)),
    ]

    @pytest.mark.parametrize("ll,exp", SPHERE_R5)
    def test_sphere_r5(self, ll, exp):
        # parse like cs2cs does (dmstor with the shortened vm[]
        # constants): "-180" lands one ulp BEYOND -pi, which flips the
        # polar cap index — the golden -19.63495 (= -5pi/4 * R) rows
        # depend on exactly this (see crs.py _VM note)
        lon = _dms(str(ll[0]))
        lat = _dms(str(ll[1]))
        x, y, _ = transform_arrays(
            "+proj=latlong +R=5", "+proj=healpix +R=5", [lon], [lat]
        )
        assert x[0] == pytest.approx(exp[0], abs=1e-5)
        assert y[0] == pytest.approx(exp[1], abs=1e-5)

    def test_sphere_a1(self):
        # tv_out.dist:96-97
        x, y, _ = transform_arrays(
            "+proj=latlong +a=1 +es=0", "+proj=healpix +a=1 +es=0", [0.0], [41.81031]
        )
        assert x[0] == pytest.approx(0.0, abs=1e-5)
        assert y[0] == pytest.approx(0.78540, abs=1e-5)

    ELL_A1 = [
        ((0.0, 41.937853904844985), (0.0, 0.78452)),
        ((-90.0, 0.0), (-1.56904, 0.0)),
        ((0.0, 0.0), (0.0, 0.0)),
    ]

    @pytest.mark.parametrize("ll,exp", ELL_A1)
    def test_ellipsoid_a1(self, ll, exp):
        # tv_out.dist:109-111 (+a=1 +ellps=WGS84 -> es of WGS84)
        x, y, _ = transform_arrays(
            "+proj=latlong +a=1 +rf=298.257223563",
            "+proj=healpix +a=1 +rf=298.257223563",
            [ll[0]],
            [ll[1]],
        )
        assert x[0] == pytest.approx(exp[0], abs=1e-5)
        assert y[0] == pytest.approx(exp[1], abs=1e-5)


class TestAxisAndVerticalUnits:
    """Pipeline stages 1/2/8/9 (pj_adjust_axis + vto_meter,
    src/pj_transform.c:104-121,349-367)."""

    def test_axis_swap_neu(self):
        # neu: northing first
        x, y, _ = transform_arrays(
            "+proj=latlong +datum=WGS84",
            "+proj=utm +zone=11 +datum=WGS84 +axis=neu",
            [-117.0],
            [35.0],
        )
        xe, ye, _ = transform_arrays(
            "+proj=latlong +datum=WGS84", "+proj=utm +zone=11 +datum=WGS84", [-117.0], [35.0]
        )
        assert x[0] == ye[0] and y[0] == xe[0]

    def test_axis_south_negates(self):
        x, y, _ = transform_arrays(
            "+proj=latlong +datum=WGS84",
            "+proj=utm +zone=11 +datum=WGS84 +axis=esu",
            [-117.0],
            [35.0],
        )
        xe, ye, _ = transform_arrays(
            "+proj=latlong +datum=WGS84", "+proj=utm +zone=11 +datum=WGS84", [-117.0], [35.0]
        )
        assert x[0] == xe[0] and y[0] == -ye[0]

    def test_vertical_units(self):
        # z in us-ft on the destination side
        _, _, z = transform_arrays(
            "+proj=latlong +datum=WGS84",
            "+proj=utm +zone=11 +datum=WGS84 +vunits=us-ft",
            [-117.0],
            [35.0],
            [100.0],
        )
        assert z[0] == pytest.approx(100.0 / 0.304800609601219241, rel=1e-12)

    def test_projected_units_us_ft(self):
        x_ft, _, _ = transform_arrays(
            "+proj=latlong +datum=WGS84",
            "+proj=utm +zone=11 +datum=WGS84 +units=us-ft",
            [-117.0],
            [35.0],
        )
        x_m, _, _ = transform_arrays(
            "+proj=latlong +datum=WGS84", "+proj=utm +zone=11 +datum=WGS84", [-117.0], [35.0]
        )
        assert x_ft[0] == pytest.approx(x_m[0] / 0.304800609601219241, rel=1e-12)


class TestObTranGolden:
    """testvarious #225 block (tv_out.dist:274-278): transverse ob_tran
    over moll with +lon_0=180 (o_lon_p/o_lat_p parse to 0 -> transverse
    branch). Locks the PJ_ob_tran.c rotation convention: unshifted lam
    inside the rotation, lamp added to the output longitude."""

    OB = "+proj=ob_tran +o_proj=moll +o_lon_p=0 +o_lat_p=0 +lon_0=180 +ellps=WGS84"

    def test_inverse_golden(self):
        # 300000 400000 -> 42d45'22.377"W 85d35'28.083"N
        lon, lat, _ = transform_arrays(self.OB, LL, [300000.0], [400000.0])
        assert lon[0] == pytest.approx(_dms("42d45'22.377\"W"), abs=5e-7)
        assert lat[0] == pytest.approx(_dms("85d35'28.083\"N"), abs=5e-7)

    def test_inverse_error_is_nan(self):
        # 20000000 30000000 -> '*' (off the moll disc, I_ERROR -19)
        lon, lat, _ = transform_arrays(self.OB, LL, [20000000.0], [30000000.0])
        assert np.isnan(lon[0]) and np.isnan(lat[0])

    def test_forward_golden(self):
        # 10 20 -> -1384841.19 7581707.88  (print precision %.2f)
        x, y, _ = transform_arrays(LL, self.OB, [10.0], [20.0])
        assert x[0] == pytest.approx(-1384841.19, abs=0.02)
        assert y[0] == pytest.approx(7581707.88, abs=0.02)


class TestOmercGolden:
    """omerc golden vectors from tv_out.dist: RSO Borneo (ticket 62,
    +alpha AND +gamma -> rotation by the raw gamma), #114 sensitivity
    (two-point, no_rot, km units), #190 pole differences (finite
    values at |phi|=89.9 near the pole branch, both hemispheres)."""

    LLC = "+proj=latlong +a=6377298.556 +rf=300.8017"
    RSO = ("+proj=omerc +a=6377298.556 +rf=300.8017 +lat_0=4 +lonc=115 "
           "+alpha=53d18'56.9537 +gamma=53d7'48.3685 +k_0=0.99984 "
           "+x_0=590476.87 +y_0=442857.65")

    def test_rso_borneo(self):
        lon = _dms("116d2'11.12630")
        lat = _dms("5d54'19.90183")
        x, y, _ = transform_arrays(self.LLC, self.RSO, [lon], [lat])
        assert x[0] == pytest.approx(704570.40, abs=0.01)
        assert y[0] == pytest.approx(653979.68, abs=0.01)

    def test_114_sensitivity(self):
        om = ("+proj=omerc +ellps=WGS84 +lon_1=62.581150 +lat_1=74.856102 "
              "+lon_2=53.942810 +lat_2=74.905884 +units=km +no_rot")
        x, y, _ = transform_arrays(
            LL, om, [56.958381652832, 56.9584], [72.8798, 72.8798]
        )
        np.testing.assert_allclose(x, [-9985.16336453, 9985.16263662], atol=1e-7)
        np.testing.assert_allclose(y, [-227.67701050, -227.67701050], atol=1e-7)

    @pytest.mark.parametrize("south", [False, True])
    def test_190_poles(self, south):
        sgn = -1.0 if south else 1.0
        om = (f"+proj=omerc +ellps=WGS84 +no_rot +lon_1=-27 +lat_1={70*sgn} "
              f"+lon_2=-38 +lat_2={80*sgn} +lat_0={70*sgn}")
        lons = [-27.0, -27.0, -27.0, 163.0, 163.0]
        lats = [v * sgn for v in (70.0, 80.0, 89.9, 89.9, 80.0)]
        x, y, _ = transform_arrays(LL, om, lons, lats)
        exp_x = np.array([7846957.203, 8944338.041, 10033520.737,
                          10055728.173, 11163496.121]) * sgn
        exp_y = [0.000, 204911.652, 402158.063, 404099.799, 397796.828]
        np.testing.assert_allclose(x, exp_x, atol=2e-3)
        np.testing.assert_allclose(y, exp_y, atol=2e-3)
