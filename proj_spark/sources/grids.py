"""Datum-shift grid file I/O: CTABLE2, NTv2 (.gsb), GTX readers, a
CTABLE2 writer (the nad2bin-style grid compiler), and the magic-bytes
format sniffer.

Behavioral references:
- CTABLE2 layout   — /root/reference/src/pj_gridinfo.c:165-195 (header
  160 bytes: magic, id, ll, del, lim; float32 (lam,phi) pairs after)
- NTv2 (.gsb)      — /root/reference/src/pj_gridinfo.c:397-622
  (11x16-byte overview records, per-subgrid headers, 4xfloat32 nodes
  in arcseconds, longitudes positive WEST, columns stored east->west)
- GTX              — /root/reference/src/pj_gridinfo.c:711-812
  (big-endian: 4 doubles origin/steps + 2 int32 dims + float32 heights)
- format sniffer   — /root/reference/src/pj_gridinfo.c:822-934
- grid compiler    — /root/reference/src/nad2bin.c (.lla -> binary)

All grids load driver-side into :class:`ShiftGrid` (float32 cell
values exactly like the reference's FLP) and are broadcast into UDF
closures; a 100TB job ships grid files via --files and loads them
once per executor process.
"""
from __future__ import annotations

import os
import struct

import numpy as np

from ..operators.gridshift import ShiftGrid

_CTABLE2_MAGIC = b"CTABLE V2.0     "
_D2R = 0.017453292519943295
_SEC2R = _D2R / 3600.0


# ---------------------------------------------------------------- CTABLE2
def write_ctable2(grid: ShiftGrid, path: str) -> None:
    """Serialize a ShiftGrid to the CTABLE2 binary layout (the
    nad2bin 'binary' output format)."""
    hdr = bytearray(160)
    hdr[0:16] = _CTABLE2_MAGIC
    gid = grid.grid_id.encode()[:79]
    hdr[16 : 16 + len(gid)] = gid
    struct.pack_into("<dddd", hdr, 96, grid.ll_lam, grid.ll_phi, grid.del_lam, grid.del_phi)
    struct.pack_into("<ii", hdr, 128, grid.lim_lam, grid.lim_phi)
    # cvs rows are phi-major [phi, lam, 2]; file stores (lam, phi) pairs
    body = np.ascontiguousarray(grid.cvs, dtype="<f4").tobytes()
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(body)


def read_ctable2(path: str) -> ShiftGrid:
    with open(path, "rb") as f:
        hdr = f.read(160)
        if hdr[:16] != _CTABLE2_MAGIC:
            raise ValueError(f"{path}: not a CTABLE2 file")
        gid = hdr[16:96].split(b"\x00", 1)[0].decode(errors="replace").strip()
        ll_lam, ll_phi, del_lam, del_phi = struct.unpack_from("<dddd", hdr, 96)
        lim_lam, lim_phi = struct.unpack_from("<ii", hdr, 128)
        data = np.frombuffer(f.read(lim_lam * lim_phi * 8), dtype="<f4")
    cvs = data.reshape(lim_phi, lim_lam, 2).copy()
    return ShiftGrid(
        grid_id=gid or os.path.basename(path),
        ll_lam=ll_lam,
        ll_phi=ll_phi,
        del_lam=del_lam,
        del_phi=del_phi,
        lim_lam=lim_lam,
        lim_phi=lim_phi,
        cvs=cvs,
    )


# ------------------------------------------------------------------- NTv2
def _ntv2_rec(name: bytes, value) -> bytes:
    """One 16-byte NTv2 header record: 8-byte name + 8-byte value."""
    name = name.ljust(8)[:8]
    if isinstance(value, bytes):
        return name + value.ljust(8)[:8]
    if isinstance(value, int):
        return name + struct.pack("<i", value) + b"\x00\x00\x00\x00"
    return name + struct.pack("<d", float(value))


def write_ntv2(grids: list[ShiftGrid], path: str) -> None:
    """Write a multi-subgrid NTv2 .gsb file (little-endian variant).

    Conventions per the reference reader: values in arcseconds,
    longitudes positive WEST, nodes run south->north rows with
    columns stored east->west.
    """
    out = bytearray()
    out += _ntv2_rec(b"NUM_OREC", 11)
    out += _ntv2_rec(b"NUM_SREC", 11)
    out += _ntv2_rec(b"NUM_FILE", len(grids))
    out += _ntv2_rec(b"GS_TYPE", b"SECONDS")
    out += _ntv2_rec(b"VERSION", b"NTv2.0")
    out += _ntv2_rec(b"SYSTEM_F", b"NAD27")
    out += _ntv2_rec(b"SYSTEM_T", b"NAD83")
    out += _ntv2_rec(b"MAJOR_F", 6378206.4)
    out += _ntv2_rec(b"MINOR_F", 6356583.8)
    out += _ntv2_rec(b"MAJOR_T", 6378137.0)
    out += _ntv2_rec(b"MINOR_T", 6356752.314)
    for g in grids:
        s_lat = g.ll_phi / _SEC2R
        n_lat = (g.ll_phi + g.del_phi * (g.lim_phi - 1)) / _SEC2R
        # positive west: west edge has the LARGER value
        e_long = -(g.ll_lam + g.del_lam * (g.lim_lam - 1)) / _SEC2R
        w_long = -g.ll_lam / _SEC2R
        parent = getattr(g, "parent_id", None) or "NONE"
        out += _ntv2_rec(b"SUB_NAME", g.grid_id.encode()[:8])
        out += _ntv2_rec(b"PARENT", parent.encode()[:8])
        out += _ntv2_rec(b"CREATED", b"NOW")
        out += _ntv2_rec(b"UPDATED", b"NOW")
        out += _ntv2_rec(b"S_LAT", s_lat)
        out += _ntv2_rec(b"N_LAT", n_lat)
        out += _ntv2_rec(b"E_LONG", e_long)
        out += _ntv2_rec(b"W_LONG", w_long)
        out += _ntv2_rec(b"LAT_INC", g.del_phi / _SEC2R)
        out += _ntv2_rec(b"LONG_INC", g.del_lam / _SEC2R)
        out += _ntv2_rec(b"GS_COUNT", g.lim_lam * g.lim_phi)
        # nodes: (shift_lat, shift_lon, acc, acc) float32, arcsec,
        # lon shift positive west (same convention as our internal cvs —
        # ref pj_gridinfo.c:330 stores the raw seconds un-negated);
        # columns east->west
        lam_sec = g.cvs[:, :, 0] / np.float32(_SEC2R)
        phi_sec = g.cvs[:, :, 1] / np.float32(_SEC2R)
        lam_rev = lam_sec[:, ::-1]
        phi_rev = phi_sec[:, ::-1]
        node = np.zeros((g.lim_phi, g.lim_lam, 4), dtype="<f4")
        node[:, :, 0] = phi_rev
        node[:, :, 1] = lam_rev
        out += node.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_ntv2(path: str) -> list[ShiftGrid]:
    """Read every subgrid of an NTv2 .gsb file (detects endianness via
    the NUM_OREC value like the reference)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8].rstrip() != b"NUM_OREC":
        raise ValueError(f"{path}: not an NTv2 file")
    (n_orec_le,) = struct.unpack_from("<i", data, 8)
    endian = "<" if n_orec_le == 11 else ">"
    f8 = endian + "d"
    i4 = endian + "i"

    def rec_f(off):
        return struct.unpack_from(f8, data, off + 8)[0]

    def rec_i(off):
        return struct.unpack_from(i4, data, off + 8)[0]

    n_file = rec_i(2 * 16)
    pos = 11 * 16
    grids = []
    for _ in range(n_file):
        sub_name = data[pos + 8 : pos + 16].decode(errors="replace").strip("\x00 ").strip()
        parent = data[pos + 16 + 8 : pos + 32].decode(errors="replace").strip("\x00 ").strip()
        s_lat = rec_f(pos + 4 * 16)
        n_lat = rec_f(pos + 5 * 16)
        e_long = rec_f(pos + 6 * 16)
        w_long = rec_f(pos + 7 * 16)
        lat_inc = rec_f(pos + 8 * 16)
        long_inc = rec_f(pos + 9 * 16)
        gs_count = rec_i(pos + 10 * 16)
        pos += 11 * 16
        lim_phi = int(round((n_lat - s_lat) / lat_inc)) + 1
        lim_lam = int(round((w_long - e_long) / long_inc)) + 1
        assert lim_phi * lim_lam == gs_count, (lim_phi, lim_lam, gs_count)
        node = np.frombuffer(
            data[pos : pos + gs_count * 16], dtype=endian + "f4"
        ).reshape(lim_phi, lim_lam, 4)
        pos += gs_count * 16
        # undo the east->west column order; KEEP the positive-west sign —
        # the reference stores NTv2 lam shifts un-negated (pj_gridinfo.c:330)
        # and nad_cvt applies them as `lam -= t.lam`, i.e. the internal cvs
        # convention IS positive-west, same as CTABLE2.
        phi_sec = node[:, ::-1, 0]
        lam_sec = node[:, ::-1, 1]
        cvs = np.stack(
            [lam_sec * np.float32(_SEC2R), phi_sec * np.float32(_SEC2R)], axis=-1
        ).astype(np.float32)
        g = ShiftGrid(
            grid_id=sub_name,
            ll_lam=-w_long * _SEC2R,
            ll_phi=s_lat * _SEC2R,
            del_lam=long_inc * _SEC2R,
            del_phi=lat_inc * _SEC2R,
            lim_lam=lim_lam,
            lim_phi=lim_phi,
            cvs=cvs,
        )
        g.parent_id = None if parent in ("", "NONE") else parent  # type: ignore[attr-defined]
        grids.append(g)
    # attach children to parents (probe order: parents first, children
    # refine — ref pj_apply_gridshift.c:158-188)
    by_name = {g.grid_id: g for g in grids}
    roots = []
    for g in grids:
        pid = getattr(g, "parent_id", None)
        if pid and pid in by_name:
            parent_g = by_name[pid]
            if parent_g.children is None:
                parent_g.children = []
            parent_g.children.append(g)
        else:
            roots.append(g)
    return roots


# -------------------------------------------------------------------- GTX
def write_gtx(
    path: str,
    ll_lat_deg: float,
    ll_lon_deg: float,
    dlat_deg: float,
    dlon_deg: float,
    heights: np.ndarray,
) -> None:
    """NOAA GTX vertical grid (big-endian doubles + int32 dims +
    float32 heights)."""
    nrows, ncols = heights.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">dddd", ll_lat_deg, ll_lon_deg, dlat_deg, dlon_deg))
        f.write(struct.pack(">ii", nrows, ncols))
        f.write(np.ascontiguousarray(heights, dtype=">f4").tobytes())


def read_gtx(path: str):
    """Returns (ll_lat, ll_lon, dlat, dlon, heights[nrows, ncols])."""
    with open(path, "rb") as f:
        hdr = f.read(40)
        ll_lat, ll_lon, dlat, dlon = struct.unpack(">dddd", hdr[:32])
        nrows, ncols = struct.unpack(">ii", hdr[32:40])
        if not (0 < nrows < 100000 and 0 < ncols < 100000):
            raise ValueError(f"{path}: implausible GTX dims")
        h = np.frombuffer(f.read(nrows * ncols * 4), dtype=">f4").reshape(nrows, ncols)
    return ll_lat, ll_lon, dlat, dlon, h.astype(np.float32)


# ------------------------------------------------------------- CTABLE v1
_CTABLE1_HDR = 128  # struct CTABLE on LP64: id[80] + 2*LP(16) + ILP(8) + ptr(8)


def write_ctable(grid: ShiftGrid, path: str) -> None:
    """Original platform-specific CTABLE dump (nad2bin.c 'ctable'
    output: raw struct followed by FLP pairs, little-endian host)."""
    hdr = bytearray(_CTABLE1_HDR)
    gid = grid.grid_id.encode()[:79]
    hdr[0 : len(gid)] = gid
    struct.pack_into("<dddd", hdr, 80, grid.ll_lam, grid.ll_phi, grid.del_lam, grid.del_phi)
    struct.pack_into("<ii", hdr, 112, grid.lim_lam, grid.lim_phi)
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(np.ascontiguousarray(grid.cvs, dtype="<f4").tobytes())


def read_ctable(path: str) -> ShiftGrid:
    """Original CTABLE reader (nad_ctable_init/_load, nad_init.c:80-150):
    a raw struct dump — id[80], ll, del (radians, float64), lim (int32
    pair), dangling cvs pointer — then float32 (lam,phi) pairs."""
    with open(path, "rb") as f:
        hdr = f.read(_CTABLE1_HDR)
        if len(hdr) < _CTABLE1_HDR:
            raise ValueError(f"{path}: truncated CTABLE header")
        gid = hdr[0:80].split(b"\x00", 1)[0].decode(errors="replace").strip()
        ll_lam, ll_phi, del_lam, del_phi = struct.unpack_from("<dddd", hdr, 80)
        lim_lam, lim_phi = struct.unpack_from("<ii", hdr, 112)
        if not (1 <= lim_lam <= 100000 and 1 <= lim_phi <= 100000):
            raise ValueError(f"{path}: implausible CTABLE dims")
        data = np.frombuffer(f.read(lim_lam * lim_phi * 8), dtype="<f4")
    cvs = data.reshape(lim_phi, lim_lam, 2).copy()
    return ShiftGrid(
        grid_id=gid or os.path.basename(path),
        ll_lam=ll_lam,
        ll_phi=ll_phi,
        del_lam=del_lam,
        del_phi=del_phi,
        lim_lam=lim_lam,
        lim_phi=lim_phi,
        cvs=cvs,
    )


# ------------------------------------------------------------------- NTv1
def read_ntv1(path: str) -> ShiftGrid:
    """NTv1 Canadian grid (pj_gridinfo.c:624-709 header + 196-262 data):
    176-byte header of labeled big-endian fields, then float64
    (phi_sec, lam_sec) pairs with columns stored east->west; lam kept
    positive-west like NTv2."""
    with open(path, "rb") as f:
        hdr = f.read(176)
        if len(hdr) < 176 or hdr[:6] != b"HEADER":
            raise ValueError(f"{path}: not an NTv1 file")
        (nrec,) = struct.unpack_from(">i", hdr, 8)
        if nrec != 12:
            raise ValueError(f"{path}: NTv1 wrong record count")
        ll_phi_deg = struct.unpack_from(">d", hdr, 24)[0]
        ur_phi_deg = struct.unpack_from(">d", hdr, 40)[0]
        ur_lam_deg = -struct.unpack_from(">d", hdr, 56)[0]
        ll_lam_deg = -struct.unpack_from(">d", hdr, 72)[0]
        del_phi_deg = struct.unpack_from(">d", hdr, 88)[0]
        del_lam_deg = struct.unpack_from(">d", hdr, 104)[0]
        lim_lam = int(abs(ur_lam_deg - ll_lam_deg) / del_lam_deg + 0.5) + 1
        lim_phi = int(abs(ur_phi_deg - ll_phi_deg) / del_phi_deg + 0.5) + 1
        raw = np.frombuffer(f.read(lim_lam * lim_phi * 16), dtype=">f8").reshape(
            lim_phi, lim_lam, 2
        )
    # file pairs are (phi, lam) arcsec with columns east->west; reverse
    # columns, keep values un-negated (positive west)
    phi_sec = raw[:, ::-1, 0]
    lam_sec = raw[:, ::-1, 1]
    cvs = np.stack(
        [lam_sec * _SEC2R, phi_sec * _SEC2R], axis=-1
    ).astype(np.float32)
    return ShiftGrid(
        grid_id=os.path.basename(path),
        ll_lam=ll_lam_deg * _D2R,
        ll_phi=ll_phi_deg * _D2R,
        del_lam=del_lam_deg * _D2R,
        del_phi=del_phi_deg * _D2R,
        lim_lam=lim_lam,
        lim_phi=lim_phi,
        cvs=cvs,
    )


def _ntv1_label(field: bytes, pos: int, hdr: bytearray) -> None:
    hdr[pos : pos + len(field)] = field


def write_ntv1(grid: ShiftGrid, path: str) -> None:
    """NTv1 writer (for fixtures/tests): labeled big-endian header
    fields at the offsets pj_gridinfo_init_ntv1 reads, then float64
    (phi_sec, lam_sec) pairs east->west."""
    hdr = bytearray(176)
    _ntv1_label(b"HEADER", 0, hdr)
    struct.pack_into(">i", hdr, 8, 12)
    _ntv1_label(b"S LAT", 16, hdr)
    struct.pack_into(">d", hdr, 24, grid.ll_phi / _D2R)
    _ntv1_label(b"N LAT", 32, hdr)
    struct.pack_into(">d", hdr, 40, (grid.ll_phi + grid.del_phi * (grid.lim_phi - 1)) / _D2R)
    _ntv1_label(b"E LONG", 48, hdr)
    struct.pack_into(">d", hdr, 56, -(grid.ll_lam + grid.del_lam * (grid.lim_lam - 1)) / _D2R)
    _ntv1_label(b"W LONG", 64, hdr)
    struct.pack_into(">d", hdr, 72, -grid.ll_lam / _D2R)
    _ntv1_label(b"N GRID", 80, hdr)
    struct.pack_into(">d", hdr, 88, grid.del_phi / _D2R)
    _ntv1_label(b"W GRID", 96, hdr)
    struct.pack_into(">d", hdr, 104, grid.del_lam / _D2R)
    _ntv1_label(b"TYPE", 112, hdr)
    _ntv1_label(b"SECONDS", 120, hdr)
    _ntv1_label(b"FROM", 128, hdr)
    _ntv1_label(b"NAD27", 136, hdr)
    _ntv1_label(b"TO      NAD83   ", 144, hdr)
    lam_sec = (grid.cvs[:, ::-1, 0] / np.float32(_SEC2R)).astype(">f8")
    phi_sec = (grid.cvs[:, ::-1, 1] / np.float32(_SEC2R)).astype(">f8")
    body = np.stack([phi_sec, lam_sec], axis=-1).astype(">f8")
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(body.tobytes())


# -------------------------------------------------------------- .lla ASCII
_USEC_TO_RAD = 4.848136811095359935899141023e-12  # nad2bin.c U_SEC_TO_RAD


def parse_lla(text: str) -> ShiftGrid:
    """Parse the nad2bin ASCII grid source (.lla): header line, dims
    line ``lim.lam lim.phi <skip> ll.lam del.lam ll.phi del.phi``
    (degrees), then per-row delta-encoded integer micro-arcsec pairs
    (nad2bin.c:100-141)."""
    lines = text.splitlines()
    grid_id = lines[0].strip()
    rest = " ".join(lines[1:]).split()
    it = iter(rest)

    def nxt():
        return next(it)

    lim_lam = int(nxt())
    lim_phi = int(nxt())
    nxt()  # skipped field
    ll_lam = float(nxt())
    del_lam = float(nxt())
    ll_phi = float(nxt())
    del_phi = float(nxt())
    cvs = np.zeros((lim_phi, lim_lam, 2), dtype=np.float32)
    for i in range(lim_phi):
        row_tag = nxt()
        if not row_tag.endswith(":"):
            # "0: 12 34" may tokenize as "0:" or "0:12" — handle both
            if ":" in row_tag:
                tag, first = row_tag.split(":", 1)
                assert int(tag) == i, (tag, i)
                laml = int(first) if first else int(nxt())
            else:
                raise ValueError(f"bad row tag {row_tag!r}")
        else:
            assert int(row_tag[:-1]) == i, (row_tag, i)
            laml = int(nxt())
        phil = int(nxt())
        cvs[i, 0, 0] = laml * _USEC_TO_RAD
        cvs[i, 0, 1] = phil * _USEC_TO_RAD
        for j in range(1, lim_lam):
            laml += int(nxt())
            phil += int(nxt())
            cvs[i, j, 0] = laml * _USEC_TO_RAD
            cvs[i, j, 1] = phil * _USEC_TO_RAD
    return ShiftGrid(
        grid_id=grid_id,
        ll_lam=ll_lam * _D2R,
        ll_phi=ll_phi * _D2R,
        del_lam=del_lam * _D2R,
        del_phi=del_phi * _D2R,
        lim_lam=lim_lam,
        lim_phi=lim_phi,
        cvs=cvs,
    )


def compile_lla(text: str, path: str, fmt: str = "ctable2") -> ShiftGrid:
    """nad2bin analog: .lla source -> binary grid file."""
    g = parse_lla(text)
    if fmt == "ctable2":
        write_ctable2(g, path)
    elif fmt == "ctable":
        write_ctable(g, path)
    elif fmt == "ntv2":
        write_ntv2([g], path)
    elif fmt == "ntv1":
        write_ntv1(g, path)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return g


# ----------------------------------------------------------------- sniffer
def open_grid(path: str):
    """Magic-bytes dispatch in the reference's order
    (pj_gridinfo.c:872-934: NTv1 labels, NTv2 records, .gtx extension,
    CTABLE2 magic, CTABLE-v1 fallback with plausibility checks):
    returns list[ShiftGrid] for horizontal grids, a GTX tuple for
    vertical grids."""
    with open(path, "rb") as f:
        head = f.read(160)
    if (
        head[0:6] == b"HEADER"
        and head[96:102] == b"W GRID"
        and head[144:160] == b"TO      NAD83   "
    ):
        return [read_ntv1(path)]
    if head[:8].rstrip() == b"NUM_OREC" and head[48:55] == b"GS_TYPE":
        return read_ntv2(path)
    if path.lower().endswith("gtx"):
        ll_lat, ll_lon, dlat, dlon, h = read_gtx(path)
        return (ll_lat, ll_lon, dlat, dlon, h)
    if head[:16] == _CTABLE2_MAGIC:
        return [read_ctable2(path)]
    # GTX without extension: sanity-check header plausibility first
    try:
        ll_lat, ll_lon, dlat, dlon, h = read_gtx(path)
        if -90.0 <= ll_lat <= 90.0 and 0.0 < dlat < 10.0:
            return (ll_lat, ll_lon, dlat, dlon, h)
    except Exception:  # noqa: BLE001
        pass
    # CTABLE v1 fallback, validated like nad_ctable_init
    try:
        return [read_ctable(path)]
    except ValueError:
        pass
    raise ValueError(f"{path}: unrecognized grid format")


# --------------------------------------------------------------- vertical
def _vgrid_sample(lam, phi, vgrid):
    """Bilinear geoid-undulation sample; returns (value, ok_mask).

    Nodata matches the reference exactly: the INTERPOLATED value is
    compared against the float32 -88.8888 sentinel
    (pj_apply_vgridshift.c:147-157 ``value == -88.88880f`` with the
    bilinear blend computed in double from float nodes) — a point in a
    cell bordering nodata still gets a shift if the blend itself
    doesn't land on the sentinel (round-2 ADVICE parity fix; the old
    any-corner check diverged at grid nodata edges)."""
    ll_lat, ll_lon, dlat, dlon, h = vgrid
    lam_deg = np.degrees(np.asarray(lam, np.float64))
    phi_deg = np.degrees(np.asarray(phi, np.float64))
    gx = (lam_deg - ll_lon) / dlon
    gy = (phi_deg - ll_lat) / dlat
    nrows, ncols = h.shape
    inside = (gx >= 0) & (gx <= ncols - 1) & (gy >= 0) & (gy <= nrows - 1)
    ix = np.clip(np.floor(gx).astype(np.int64), 0, ncols - 2)
    iy = np.clip(np.floor(gy).astype(np.int64), 0, nrows - 2)
    fx = gx - ix
    fy = gy - iy
    h64 = h.astype(np.float64)
    v = (
        h64[iy, ix] * (1 - fx) * (1 - fy)
        + h64[iy, ix + 1] * fx * (1 - fy)
        + h64[iy + 1, ix] * (1 - fx) * fy
        + h64[iy + 1, ix + 1] * fx * fy
    )
    nodata = v == float(np.float32(-88.8888))
    return v, inside & ~nodata


def apply_vgridshift(lam, phi, z, vgrid, inverse: bool = False):
    """z +- bilinear(gtx): forward (src side, geoid -> ellipsoidal
    heights) ADDS the undulation, inverse SUBTRACTS it
    (pj_apply_vgridshift.c:160-163); outside/nodata passes through."""
    v, ok = _vgrid_sample(lam, phi, vgrid)
    z = np.asarray(z, np.float64)
    return np.where(ok, z + (-v if inverse else v), z)


# name -> vgrid tuple (ll_lat, ll_lon, dlat, dlon, heights)
_VGRID_REGISTRY: dict[str, list] = {}


def register_vgrid(name: str, vgrid) -> None:
    _VGRID_REGISTRY[name] = [vgrid]


def resolve_vgridlist(spec: str) -> list:
    """Comma list of vertical grids; '@' prefix marks optional entries
    (pj_gridlist semantics); unregistered names fall back to GTX files
    on the search path."""
    from .initfiles import _BUNDLED, _SEARCH_PATH

    out = []
    for tok in spec.split(","):
        tok = tok.strip()
        optional = tok.startswith("@")
        if optional:
            tok = tok[1:]
        grids = _VGRID_REGISTRY.get(tok)
        if grids is None:
            dirs = [*_SEARCH_PATH, os.environ.get("PROJ_SPARK_LIB", ""), _BUNDLED]
            cands = [tok] if os.path.isabs(tok) or os.sep in tok else []
            cands += [os.path.join(d, tok) for d in dirs if d]
            for path in cands:
                if os.path.isfile(path):
                    loaded = open_grid(path)
                    if not isinstance(loaded, tuple):
                        raise ValueError(f"{tok}: not a vertical (GTX) grid")
                    grids = [loaded]
                    _VGRID_REGISTRY[tok] = grids
                    break
        if grids is None:
            if optional:
                continue
            raise FileNotFoundError(f"required vertical grid {tok!r} not found")
        out.extend(grids)
    return out


def apply_vgridshift_stage(spec: str, inverse: bool):
    """Pipeline stage factory for +geoidgrids (first containing grid
    wins, like the horizontal path)."""
    vgrids = resolve_vgridlist(spec)

    def fn(lam, phi, z):
        z = np.asarray(z, np.float64).copy()
        remaining = ~np.isnan(np.asarray(lam, np.float64))
        for vg in vgrids:
            if not np.any(remaining):
                break
            v, ok = _vgrid_sample(lam, phi, vg)
            sel = remaining & ok
            z = np.where(sel, z + (-v if inverse else v), z)
            remaining = remaining & ~sel
        return lam, phi, z

    return fn
