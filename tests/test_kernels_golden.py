"""Golden-vector regression tests.

Expected values are transcribed from the reference's golden corpora:
/root/reference/nad/tv_out.dist (driven by nad/testvarious).  Print
precision of the golden files bounds the tolerances: %.2f m for
projected coords, %.3f arcsec for DMS output, %.7f m for bug-245.
"""
import numpy as np
import pytest

from proj_spark.plans.pipeline import transform_arrays


def dms(d, mi=0.0, s=0.0, neg=False):
    v = d + mi / 60.0 + s / 3600.0
    return -v if neg else v


LL_WGS84 = "+proj=latlong +datum=WGS84"
TMERC97 = "+proj=tmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000"


class TestTmerc:
    # nad/testvarious "Test transverse mercator (inverse) (#97)",
    # goldens nad/tv_out.dist "Test transverse mercator" blocks
    LON = [0.0, -dms(15, 22, 16.108), -dms(10, 40, 55.532), -dms(1, 32, 21.33), dms(15, 4, 42.357)]
    LAT = [0.0, dms(17, 52, 53.478), dms(17, 42, 48.526), dms(17, 3, 47.233), dms(14, 48, 56.372)]
    X = [2278812.96, 499999.99, 999999.99, 2000000.03, 3999967.33]
    Y = [20000.00, 2000000.01, 1999999.99, 1999999.62, 1999855.31]

    def test_latlong_to_tmerc(self):
        x, y, _ = transform_arrays(LL_WGS84, TMERC97, self.LON, self.LAT)
        # golden has %.2f output but DMS input only carries ~0.3mm/0.001"
        np.testing.assert_allclose(x, self.X, atol=0.02)
        np.testing.assert_allclose(y, self.Y, atol=0.02)

    def test_tmerc_to_latlong(self):
        xin = [10000.0, 500000.0, 1000000.0, 2000000.0, 4000000.0]
        yin = [20000.0, 2000000.0, 2000000.0, 2000000.0, 2000000.0]
        lon, lat, _ = transform_arrays(TMERC97, LL_WGS84, xin, yin)
        exp_lon = [-20.0, -dms(15, 22, 16.108), -dms(10, 40, 55.532), -dms(1, 32, 21.399), dms(15, 4, 6.539)]
        exp_lat = [0.0, dms(17, 52, 53.478), dms(17, 42, 48.526), dms(17, 3, 47.244), dms(14, 49, 7.331)]
        np.testing.assert_allclose(lon, exp_lon, atol=0.001 / 3600)
        np.testing.assert_allclose(lat, exp_lat, atol=0.001 / 3600)

    def test_roundtrip_mesh(self):
        # fwd∘inv == id to 1e-9 deg within a UTM-zone-width band of the
        # CM (the truncated 8th-order series is only self-consistent
        # near the CM — same behavior as the reference tmerc; etmerc is
        # the reference's own answer for the far zone)
        rng = np.random.default_rng(42)
        lon = -20.0 + rng.uniform(-3, 3, 500)
        lat = rng.uniform(-75, 75, 500)
        x, y, _ = transform_arrays(LL_WGS84, TMERC97, lon, lat)
        lon2, lat2, _ = transform_arrays(TMERC97, LL_WGS84, x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestDatumPipeline:
    def test_bug245_carthage(self):
        # tv_out.dist "Test bug 245": full Helmert+ECEF+UTM pipeline, %.7f golden
        x, y, z = transform_arrays(
            "+proj=longlat +datum=WGS84", "+proj=utm +zone=32 +datum=carthage", [10.0], [34.0], [0.0]
        )
        assert abs(x[0] - 592302.9819462) < 1e-6
        assert abs(y[0] - 3762148.7340610) < 1e-6
        assert abs(z[0] - (-30.3110170)) < 1e-6

    def test_bug245_expanded(self):
        x, y, z = transform_arrays(
            "+proj=longlat +datum=WGS84",
            "+proj=utm +zone=32 +a=6378249.2 +b=6356515 +towgs84=-263.0,6.0,431.0",
            [10.0],
            [34.0],
            [0.0],
        )
        assert abs(x[0] - 592302.9819462) < 1e-6
        assert abs(y[0] - 3762148.7340610) < 1e-6

    def test_3param_between(self):
        # "Between two 3parameter approximations on same ellipsoid"
        x, y, z = transform_arrays(
            "+proj=latlong +ellps=bessel +towgs84=5,0,0",
            "+proj=latlong +ellps=bessel +towgs84=1,0,0",
            [0.0, -79.0],
            [0.0, 45.0],
            [0.0, 0.0],
        )
        assert abs(x[0]) < 1e-12 and abs(y[0]) < 1e-12
        assert abs(z[0] - 4.0) < 5e-4
        assert abs(x[1] - (-dms(78, 59, 59.821))) < 0.001 / 3600
        assert abs(y[1] - dms(44, 59, 59.983)) < 0.001 / 3600
        assert abs(z[1] - 0.540) < 5e-4

    def test_3param_to_raw_is_noop(self):
        # "3param to raw ellipsoid on same ellipsoid": dst UNKNOWN datum
        # short-circuits the whole datum leg (pj_transform.c:617-619)
        x, y, z = transform_arrays(
            "+proj=latlong +ellps=bessel +towgs84=5,0,0",
            "+proj=latlong +ellps=bessel",
            [-79.0],
            [45.0],
            [0.0],
        )
        assert x[0] == -79.0 and y[0] == 45.0 and z[0] == 0.0

    def test_raw_to_raw_is_noop(self):
        x, y, _ = transform_arrays(
            "+proj=latlong +ellps=clrk66", "+proj=latlong +ellps=bessel", [-dms(79, 58)], [dms(37, 2)]
        )
        assert abs(x[0] - (-dms(79, 58))) < 1e-12
        assert abs(y[0] - dms(37, 2)) < 1e-12


class TestGeocent:
    LON = [-0.001 / 3600, -0.001 / 3600, -79.0, -45.0]
    LAT = [0.001 / 3600, 0.001 / 3600, 45.0, dms(89, 59, 59.990)]
    Z = [0.0, 10.0, 0.0, 0.0]
    ECEF = [
        (6378137.00, -0.03, 0.03),
        (6378147.00, -0.03, 0.03),
        (861996.98, -4434590.01, 4487348.41),
        (0.22, -0.22, 6356752.31),
    ]

    def test_to_geocent(self):
        x, y, z = transform_arrays(LL_WGS84, "+proj=geocent +datum=WGS84", self.LON, self.LAT, self.Z)
        for i, (ex, ey, ez) in enumerate(self.ECEF):
            assert abs(x[i] - ex) < 0.005, i
            assert abs(y[i] - ey) < 0.005, i
            assert abs(z[i] - ez) < 0.005, i

    def test_from_geocent(self):
        x, y, z = transform_arrays(
            "+proj=geocent +datum=WGS84",
            LL_WGS84,
            [6378137.0, 6378147.0, 861996.98, 0.0],
            [0.0, 0.0, -4434590.01, 0.0],
            [0.0, 0.0, 4487348.41, 6356752.31],
        )
        assert abs(x[2] - (-79.0)) < 1e-6 and abs(y[2] - 45.0) < 1e-6
        assert abs(z[2] - 0.001) < 5e-4
        assert abs(y[3] - 90.0) < 1e-6
        assert abs(z[3] - (-0.004)) < 5e-4


class TestPrimeMeridian:
    def test_simple_pm(self):
        x, y, _ = transform_arrays(
            "+proj=latlong +datum=WGS84 +pm=greenwich",
            "+proj=latlong +datum=WGS84 +pm=1",
            [0.0, -79.0],
            [0.0, 45.0],
        )
        np.testing.assert_allclose(x, [-1.0, -80.0], atol=1e-12)
        np.testing.assert_allclose(y, [0.0, 45.0], atol=1e-12)

    def test_pm_within_projection(self):
        # "Test simple prime meridian handling within a projection"
        x, y, _ = transform_arrays(
            "+proj=utm +zone=11 +datum=WGS84 +pm=3",
            "+proj=latlong +datum=WGS84 +pm=1w",
            [500000.0],
            [3000000.0],
        )
        assert abs(x[0] - (-113.0)) < 0.001 / 3600
        assert abs(y[0] - dms(27, 7, 20.891)) < 0.001 / 3600


class TestLonWrap:
    def test_lon_wrap_180(self):
        lons = [-1.0, 0.0, 0.0, 1.0, 179.0, 181.0, 350.0, 370.0]
        lats = [10.0, 10.0, 10.0, 45.0, 45.0, 45.0, 45.0, 45.0]
        x, y, _ = transform_arrays(
            LL_WGS84, "+proj=latlong +datum=WGS84 +lon_wrap=180", lons, lats
        )
        np.testing.assert_allclose(
            x, [359.0, 360.0, 360.0, 1.0, 179.0, 181.0, 350.0, 10.0], atol=1e-9
        )


class TestStere:
    def test_polar_with_lat_ts(self):
        x, y, _ = transform_arrays(
            LL_WGS84, "+proj=stere +lat_0=90 +lon_0=0 +lat_ts=70 +datum=WGS84", [105.0], [40.0]
        )
        assert abs(x[0] - 5577808.93) < 0.01
        assert abs(y[0] - 1494569.40) < 0.01

    def test_oblique_no_lat_ts(self):
        x, y, _ = transform_arrays(
            LL_WGS84, "+proj=stere +lat_0=40 +lon_0=10 +datum=WGS84", [20.0], [45.0]
        )
        assert abs(x[0] - 789468.08) < 0.01
        assert abs(y[0] - 602385.33) < 0.01


class TestLcc:
    def test_snyder_example(self):
        # Snyder (1987) "Map Projections – A Working Manual" numerical
        # example for LCC, pp. 296-297: Clarke 1866, SP 33/45,
        # origin (23N, 96W); (35N, 75W) -> x=1894410.9 y=1564649.5
        x, y, _ = transform_arrays(
            LL_WGS84.replace("+datum=WGS84", "+ellps=clrk66"),
            "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=clrk66",
            [-75.0],
            [35.0],
        )
        assert abs(x[0] - 1894410.9) < 0.5
        assert abs(y[0] - 1564649.5) < 0.5

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        lon = -96 + rng.uniform(-30, 30, 300)
        lat = rng.uniform(20, 55, 300)
        crs = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=GRS80"
        x, y, _ = transform_arrays(LL_WGS84, crs, lon, lat)
        lon2, lat2, _ = transform_arrays(crs, LL_WGS84, x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestMerc:
    def test_sphere_vs_formula(self):
        # spherical Mercator: y = R ln tan(pi/4 + phi/2)
        R = 6378137.0
        x, y, _ = transform_arrays(
            "+proj=latlong +R=6378137", "+proj=merc +R=6378137", [45.0], [30.0]
        )
        assert abs(x[0] - np.radians(45.0) * R) < 1e-6
        assert abs(y[0] - R * np.log(np.tan(np.pi / 4 + np.radians(30.0) / 2))) < 1e-6

    def test_ellipsoidal_roundtrip(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-179, 179, 300)
        lat = rng.uniform(-85, 85, 300)
        crs = "+proj=merc +ellps=WGS84"
        x, y, _ = transform_arrays(LL_WGS84, crs, lon, lat)
        lon2, lat2, _ = transform_arrays(crs, LL_WGS84, x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_lat_ts(self):
        # +lat_ts rescales k0 via pj_msfn (PJ_merc.c:36-46)
        x1, _, _ = transform_arrays(LL_WGS84, "+proj=merc +ellps=WGS84 +lat_ts=30", [10.0], [0.0])
        x0, _, _ = transform_arrays(LL_WGS84, "+proj=merc +ellps=WGS84", [10.0], [0.0])
        assert x1[0] < x0[0]  # shrunk by cos-ish factor


class TestRoundTrips:
    @pytest.mark.parametrize(
        "crs,lon0",
        [
            ("+proj=utm +zone=11 +datum=WGS84", -117.0),
            ("+proj=stere +lat_0=90 +lat_ts=70 +datum=WGS84", 10.0),
            ("+proj=laea +lat_0=45 +lon_0=10 +ellps=WGS84", 10.0),
            ("+proj=laea +lat_0=45 +lon_0=10 +R=6371000", 10.0),
            ("+proj=cea +ellps=WGS84 +lat_ts=30", 0.0),
            ("+proj=eqc +lat_ts=30 +ellps=WGS84", 0.0),
            ("+proj=sinu +ellps=WGS84", 0.0),
            ("+proj=moll +R=6371000", 0.0),
        ],
    )
    def test_fwd_inv_identity(self, crs, lon0):
        rng = np.random.default_rng(11)
        lon = lon0 + rng.uniform(-3, 3, 200)
        lat = rng.uniform(5, 80, 200)
        x, y, _ = transform_arrays(LL_WGS84, crs, lon, lat)
        lon2, lat2, _ = transform_arrays(crs, LL_WGS84, x, y)
        np.testing.assert_allclose(lon2, lon, atol=2e-9)
        np.testing.assert_allclose(lat2, lat, atol=2e-9)


class TestErrorSentinels:
    def test_overrange_is_nan_not_raise(self):
        # per-point transient errors must not kill the batch
        # (src/pj_transform.c:70-76 transient_error semantics)
        x, y, _ = transform_arrays(LL_WGS84, TMERC97, [150.0, 0.0], [0.0, 10.0])
        assert np.isnan(x[0]) and np.isnan(y[0])
        assert np.isfinite(x[1]) and np.isfinite(y[1])

    def test_merc_pole_is_nan(self):
        x, y, _ = transform_arrays(LL_WGS84, "+proj=merc +ellps=WGS84", [0.0], [90.0])
        assert np.isnan(y[0])
