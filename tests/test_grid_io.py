"""Grid file format roundtrips (CTABLE2 / NTv2 / GTX + sniffer) and
shift equivalence between in-memory and file-loaded grids."""
from __future__ import annotations

import numpy as np
import pytest

from proj_spark.operators.gridshift import apply_gridshift, make_synthetic_grid
from proj_spark.sources.grids import (
    apply_vgridshift,
    open_grid,
    read_ctable2,
    read_gtx,
    read_ntv2,
    write_ctable2,
    write_gtx,
    write_ntv2,
)


@pytest.fixture()
def grid():
    return make_synthetic_grid("testgrid")


def test_ctable2_roundtrip(grid, tmp_path):
    p = str(tmp_path / "g.ct2")
    write_ctable2(grid, p)
    g2 = read_ctable2(p)
    assert g2.grid_id == "testgrid"
    assert (g2.ll_lam, g2.ll_phi, g2.del_lam, g2.del_phi) == (
        grid.ll_lam, grid.ll_phi, grid.del_lam, grid.del_phi,
    )
    assert np.array_equal(g2.cvs, grid.cvs)  # float32 bit-exact


def test_ntv2_roundtrip_shift_equivalence(grid, tmp_path):
    p = str(tmp_path / "g.gsb")
    write_ntv2([grid], p)
    roots = read_ntv2(p)
    assert len(roots) == 1
    g2 = roots[0]
    assert (g2.lim_lam, g2.lim_phi) == (grid.lim_lam, grid.lim_phi)
    # values went through arcsec float32 conversion: compare applied
    # shifts at full float64 pipeline tolerance
    rng = np.random.default_rng(1)
    lam = np.radians(rng.uniform(-124, -66, 200))
    phi = np.radians(rng.uniform(25, 53, 200))
    l1, p1 = apply_gridshift([grid], False, lam, phi)
    l2, p2 = apply_gridshift([g2], False, lam, phi)
    np.testing.assert_allclose(l2, l1, atol=2e-12)
    np.testing.assert_allclose(p2, p1, atol=2e-12)


def test_ntv2_known_bytes_shift_is_westward(tmp_path):
    """Hand-built NTv2 byte sequence (NOT via write_ntv2, so a symmetric
    sign error cannot hide): every node carries a +1.0 arcsec longitude
    shift, which NTv2 defines as positive WEST. The reference loads the
    raw value un-negated (pj_gridinfo.c:330) and nad_cvt applies it as
    ``lam -= t.lam`` — so the output longitude must DECREASE by 1"."""
    import struct as _s

    def rec(name, value):
        name = name.ljust(8)[:8]
        if isinstance(value, bytes):
            return name + value.ljust(8)[:8]
        if isinstance(value, int):
            return name + _s.pack("<i", value) + b"\x00" * 4
        return name + _s.pack("<d", float(value))

    nlat, nlon = 5, 7
    out = bytearray()
    out += rec(b"NUM_OREC", 11)
    out += rec(b"NUM_SREC", 11)
    out += rec(b"NUM_FILE", 1)
    out += rec(b"GS_TYPE", b"SECONDS")
    out += rec(b"VERSION", b"NTv2.0")
    out += rec(b"SYSTEM_F", b"NAD27")
    out += rec(b"SYSTEM_T", b"NAD83")
    out += rec(b"MAJOR_F", 6378206.4)
    out += rec(b"MINOR_F", 6356583.8)
    out += rec(b"MAJOR_T", 6378137.0)
    out += rec(b"MINOR_T", 6356752.314)
    out += rec(b"SUB_NAME", b"FIX")
    out += rec(b"PARENT", b"NONE")
    out += rec(b"CREATED", b"NOW")
    out += rec(b"UPDATED", b"NOW")
    out += rec(b"S_LAT", 30.0 * 3600)      # arcsec
    out += rec(b"N_LAT", 34.0 * 3600)
    out += rec(b"E_LONG", 100.0 * 3600)    # positive west: 100W..106W
    out += rec(b"W_LONG", 106.0 * 3600)
    out += rec(b"LAT_INC", 3600.0)
    out += rec(b"LONG_INC", 3600.0)
    out += rec(b"GS_COUNT", nlat * nlon)
    node = np.zeros((nlat * nlon, 4), dtype="<f4")
    node[:, 0] = 0.0   # lat shift
    node[:, 1] = 1.0   # lon shift: +1 arcsec, positive WEST
    out += node.tobytes()
    p = str(tmp_path / "fix.gsb")
    with open(p, "wb") as f:
        f.write(bytes(out))

    roots = read_ntv2(p)
    assert len(roots) == 1 and roots[0].lim_lam == nlon and roots[0].lim_phi == nlat
    lam_in = np.radians(np.array([-103.0]))
    phi_in = np.radians(np.array([32.0]))
    lam_out, phi_out = apply_gridshift(roots, False, lam_in, phi_in)
    one_arcsec_rad = np.radians(1.0 / 3600.0)
    # forward NAD27->NAD83 applies in.lam -= t.lam: 1" WESTWARD (decrease)
    np.testing.assert_allclose(lam_out - lam_in, -one_arcsec_rad, rtol=1e-6)
    np.testing.assert_allclose(phi_out, phi_in, atol=1e-15)


def test_ntv2_ctable2_conversion_consistent(grid, tmp_path):
    """NTv2 -> internal -> CTABLE2 -> internal preserves the shift values
    (both formats share the positive-west internal cvs convention)."""
    n = str(tmp_path / "conv.gsb")
    write_ntv2([grid], n)
    g_n = read_ntv2(n)[0]
    c = str(tmp_path / "conv.ct2")
    write_ctable2(g_n, c)
    g_c = read_ctable2(c)
    assert np.array_equal(g_c.cvs, g_n.cvs)


def test_ntv2_parent_child_nesting(grid, tmp_path):
    child = make_synthetic_grid(
        "child0", ll_lon_deg=-110.0, ll_lat_deg=30.0, n_lon=21, n_lat=11,
        cell_deg=0.5, amp_arcsec=1.0,
    )
    child.parent_id = "testgrid"  # type: ignore[attr-defined]
    p = str(tmp_path / "nest.gsb")
    write_ntv2([grid, child], p)
    roots = read_ntv2(p)
    assert len(roots) == 1
    assert roots[0].children is not None and roots[0].children[0].grid_id == "child0"


def test_gtx_roundtrip_and_vshift(tmp_path):
    h = np.linspace(-30, 50, 21 * 41).reshape(21, 41).astype(np.float32)
    p = str(tmp_path / "v.gtx")
    write_gtx(p, 25.0, -125.0, 1.0, 1.0, h)
    ll_lat, ll_lon, dlat, dlon, h2 = read_gtx(p)
    assert (ll_lat, ll_lon, dlat, dlon) == (25.0, -125.0, 1.0, 1.0)
    assert np.array_equal(h2, h)
    lam = np.radians(np.array([-105.0, -50.0]))  # second point outside
    phi = np.radians(np.array([35.0, 35.0]))
    z = np.zeros(2)
    z2 = apply_vgridshift(lam, phi, z, (ll_lat, ll_lon, dlat, dlon, h2))
    assert z2[0] != 0.0  # shifted (geoid -> ellipsoid direction)
    assert z2[1] == 0.0  # outside grid: unshifted passthrough


def test_sniffer_dispatch(grid, tmp_path):
    c = str(tmp_path / "a.ct2")
    n = str(tmp_path / "b.gsb")
    g = str(tmp_path / "c.gtx")
    write_ctable2(grid, c)
    write_ntv2([grid], n)
    write_gtx(g, 25.0, -125.0, 1.0, 1.0, np.zeros((3, 4), np.float32))
    assert open_grid(c)[0].grid_id == "testgrid"
    assert open_grid(n)[0].grid_id == "testgrid"
    assert open_grid(g)[4].shape == (3, 4)
    junk = str(tmp_path / "junk.bin")
    with open(junk, "wb") as f:
        f.write(b"this is not a grid file at all, definitely not")
    with pytest.raises(ValueError):
        open_grid(junk)


def test_geoidgrids_pipeline_stages(tmp_path):
    """+geoidgrids wiring (pj_transform.c:215-222,240-247): the source
    side ADDS the undulation before the datum leg, the destination side
    SUBTRACTS it after; a same-grid roundtrip restores z exactly."""
    import numpy as np

    from proj_spark.plans.pipeline import transform_arrays
    from proj_spark.sources.grids import register_vgrid

    h = np.full((31, 61), 13.25, dtype=np.float32)
    register_vgrid("flat13", (24.0, -125.0, 1.0, 1.0, h))

    src = "+proj=latlong +datum=WGS84 +geoidgrids=flat13"
    dst = "+proj=latlong +datum=WGS84"
    lon = [-100.0, -50.0]  # second point outside the grid
    lat = [35.0, 35.0]
    _, _, z = transform_arrays(src, dst, lon, lat, [100.0, 100.0])
    assert z[0] == pytest.approx(113.25, abs=1e-9)  # geoid -> ellipsoidal: +N
    assert z[1] == 100.0  # outside: passthrough

    # destination side subtracts
    _, _, z2 = transform_arrays(dst, src, lon, lat, [113.25, 100.0])
    assert z2[0] == pytest.approx(100.0, abs=1e-9)
    # roundtrip through both sides is identity
    _, _, z3 = transform_arrays(src, src, [-100.0], [35.0], [42.0])
    assert z3[0] == pytest.approx(42.0, abs=1e-12)


def test_geoidgrids_from_gtx_file(tmp_path):
    """+geoidgrids resolves a GTX file from disk via the search path."""
    import numpy as np

    from proj_spark.plans.pipeline import transform_arrays

    h = np.linspace(-30, 50, 21 * 41).reshape(21, 41).astype(np.float32)
    p = str(tmp_path / "geoid.gtx")
    write_gtx(p, 25.0, -125.0, 1.0, 1.0, h)
    src = f"+proj=latlong +datum=WGS84 +geoidgrids={p}"
    _, _, z = transform_arrays(src, "+proj=latlong +datum=WGS84", [-105.0], [35.0], [0.0])
    assert z[0] != 0.0
    # inverse direction recovers
    _, _, zb = transform_arrays("+proj=latlong +datum=WGS84", src, [-105.0], [35.0], [z[0]])
    assert zb[0] == pytest.approx(0.0, abs=1e-9)


def test_ctable_v1_roundtrip(grid, tmp_path):
    from proj_spark.sources.grids import read_ctable, write_ctable

    p = str(tmp_path / "g.ct1")
    write_ctable(grid, p)
    g2 = read_ctable(p)
    assert g2.grid_id == "testgrid"
    assert (g2.lim_lam, g2.lim_phi) == (grid.lim_lam, grid.lim_phi)
    assert np.array_equal(g2.cvs, grid.cvs)
    # sniffer falls through to the v1 reader
    assert open_grid(p)[0].grid_id == "testgrid"


def test_ntv1_roundtrip_and_sniff(grid, tmp_path):
    from proj_spark.sources.grids import read_ntv1, write_ntv1

    p = str(tmp_path / "g.dat")
    write_ntv1(grid, p)
    g2 = read_ntv1(p)
    assert (g2.lim_lam, g2.lim_phi) == (grid.lim_lam, grid.lim_phi)
    # NTv1 stores float64 arcsec; values derived from float32 radians
    # roundtrip to float32-exactness
    np.testing.assert_allclose(g2.cvs, grid.cvs, atol=1e-12)
    assert open_grid(p)[0].lim_lam == grid.lim_lam
    # applied shifts are equivalent through the full pipeline math
    rng = np.random.default_rng(2)
    lam = np.radians(rng.uniform(-124, -66, 100))
    phi = np.radians(rng.uniform(25, 53, 100))
    l1, p1 = apply_gridshift([grid], False, lam, phi)
    l2, p2 = apply_gridshift([g2], False, lam, phi)
    np.testing.assert_allclose(l2, l1, atol=2e-12)
    np.testing.assert_allclose(p2, p1, atol=2e-12)


def test_multigrid_first_match_ordering(tmp_path):
    """testdatumfile analog (nad/testdatumfile:37-50): gridlist
    '@conus_v1,@canada_ntv1' — a CONUS point uses the first grid, a
    Canada-only point falls through to the NTv1 grid, an uncovered
    point passes through unshifted."""
    from proj_spark.operators.gridshift import resolve_gridlist
    from proj_spark.sources.grids import write_ctable, write_ntv1

    conus = make_synthetic_grid("conus_v1", ll_lon_deg=-125.0, ll_lat_deg=24.0,
                                n_lon=61, n_lat=26, amp_arcsec=2.0)
    canada = make_synthetic_grid("canada_n1", ll_lon_deg=-141.0, ll_lat_deg=40.0,
                                 n_lon=81, n_lat=31, amp_arcsec=4.0)
    pc = str(tmp_path / "conus")
    pn = str(tmp_path / "ntv1_can.dat")
    write_ctable(conus, pc)
    write_ntv1(canada, pn)
    grids = resolve_gridlist(f"@{pc},@{pn},@{tmp_path}/missing_optional")
    assert len(grids) == 2
    lam = np.radians(np.array([-100.0, -120.0, -100.0, 10.0]))
    phi = np.radians(np.array([35.0, 60.0, 45.0, 0.0]))
    out_lam, out_phi = apply_gridshift(grids, False, lam, phi)
    # point 0: conus only; point 1: canada only; point 3: nowhere
    assert out_lam[0] != lam[0] and out_lam[1] != lam[1]
    assert out_lam[3] == lam[3] and out_phi[3] == phi[3]
    # point 2 (-100, 45): covered by BOTH -> first in list (conus) wins
    exp_lam, exp_phi = apply_gridshift([conus], False, lam[2:3], phi[2:3])
    assert out_lam[2] == exp_lam[0] and out_phi[2] == exp_phi[0]


def test_lla_parse_reference_null_and_compile(tmp_path):
    """Parse the reference's shipped null.lla verbatim, and compile a
    synthetic .lla through every output format (nad2bin analog)."""
    import os

    from proj_spark.sources.grids import compile_lla, parse_lla, read_ctable2

    null_path = "/root/reference/nad/null.lla"
    if os.path.isfile(null_path):
        g = parse_lla(open(null_path).read())
        assert (g.lim_lam, g.lim_phi) == (3, 3)
        assert np.all(g.cvs == 0.0)
        assert g.grid_id == "Null transform for whole world"

    # synthetic delta-encoded source: values in micro-arcsec
    text = (
        "tiny test grid\n"
        "   3   2   1  -120.00000     1.00000    30.00000   1.00000\n"
        "0: 1000000 2000000 10 20 10 20\n"
        "1: 1000020 2000040 10 20 10 20\n"
    )
    g = parse_lla(text)
    assert (g.lim_lam, g.lim_phi) == (3, 2)
    # row 0: lam values 1000000, 1000010, 1000020 micro-arcsec
    usec = 4.848136811095359935899141023e-12
    np.testing.assert_allclose(
        g.cvs[0, :, 0], np.float32([1000000 * usec, 1000010 * usec, 1000020 * usec])
    )
    for fmt in ["ctable", "ctable2", "ntv2", "ntv1"]:
        p = str(tmp_path / f"c.{fmt}")
        compile_lla(text, p, fmt=fmt)
        loaded = open_grid(p)
        assert loaded[0].lim_lam == 3


def test_vgrid_nodata_matches_reference_interpolated_check():
    """Reference parity (pj_apply_vgridshift.c:147-157): nodata is the
    INTERPOLATED value == -88.8888f, not any-corner — a point in a cell
    bordering a nodata node still gets a shift when the blend itself is
    off-sentinel; a point sitting exactly ON the sentinel node does not."""
    sent = np.float32(-88.8888)
    h = np.full((3, 3), 10.0, np.float32)
    h[0, 0] = sent  # nodata node at the grid's LL corner
    vg = (0.0, 0.0, 1.0, 1.0, h)
    lam = np.radians(np.array([0.5, 0.0, 1.5]))
    phi = np.radians(np.array([0.5, 0.0, 1.5]))
    z = np.zeros(3)
    z2 = apply_vgridshift(lam, phi, z, vg)
    # cell borders the sentinel but the blend != sentinel -> shifted
    assert z2[0] != 0.0
    # exactly on the sentinel node: blend == sentinel -> passthrough
    assert z2[1] == 0.0
    # interior cell far from nodata: plain value
    assert z2[2] == pytest.approx(10.0)
