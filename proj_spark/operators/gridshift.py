"""CTABLE-style datum shift grids: bilinear interpolation + iterative
inverse, vectorized, plus the ordered first-match-wins grid-list
application.

Behavioral reference: /root/reference/src/nad_intr.c (bilinear with
edge snapping), src/nad_cvt.c (forward subtract / inverse fixed point,
MAX_TRY 9, TOL 1e-12, first-order fallback at grid edge),
src/pj_apply_gridshift.c:115-254 (bbox containment with eps=cell/1e4,
first match in list order wins, points outside every grid pass through
unshifted — the documented fallback at :228-244).

Grid cell values are float32 (lam,phi) offsets exactly like ``FLP``
(src/projects.h:345) — interpolation happens in float64 on float32
inputs, matching the C code.

Grids are small (MBs); they are loaded at the driver and broadcast
into UDF closures.  The per-point work is pure numpy.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..kernels.xmath import PI, adjlon

_MAX_TRY = 9
_TOL = 1e-12


@dataclass
class ShiftGrid:
    """Analog of struct CTABLE (src/projects.h:348-354)."""

    grid_id: str
    ll_lam: float  # lower-left origin, radians
    ll_phi: float
    del_lam: float  # cell size, radians
    del_phi: float
    lim_lam: int  # columns
    lim_phi: int  # rows
    cvs: np.ndarray  # float32[lim_phi, lim_lam, 2] (lam, phi) offsets
    children: list["ShiftGrid"] | None = None

    def __post_init__(self):
        assert self.cvs.dtype == np.float32
        assert self.cvs.shape == (self.lim_phi, self.lim_lam, 2)

    @property
    def eps_lam(self) -> float:
        return self.del_lam / 10000.0

    @property
    def eps_phi(self) -> float:
        return self.del_phi / 10000.0

    def contains(self, lam, phi):
        """bbox test with epsilon (pj_apply_gridshift.c:149-156)."""
        tb_lam = adjlon(lam - self.ll_lam - PI) + PI
        tb_phi = phi - self.ll_phi
        max_lam = self.del_lam * (self.lim_lam - 1)
        max_phi = self.del_phi * (self.lim_phi - 1)
        return (
            (tb_lam >= -self.eps_lam)
            & (tb_lam <= max_lam + self.eps_lam)
            & (tb_phi >= -self.eps_phi)
            & (tb_phi <= max_phi + self.eps_phi)
        )


def nad_intr(t_lam, t_phi, g: ShiftGrid):
    """Bilinear interpolation in cell space with the reference's edge
    snapping (nad_intr.c:18-43).  Input is grid-relative radians;
    output (lam,phi) offsets, NaN when outside."""
    tl = t_lam / g.del_lam
    tp = t_phi / g.del_phi
    il = np.floor(tl)
    ip = np.floor(tp)
    fl = tl - il
    fp = tp - ip

    # edge snapping, lam
    snap_lo = (il == -1) & (fl > 0.99999999999)
    il = np.where(snap_lo, il + 1, il)
    fl = np.where(snap_lo, 0.0, fl)
    snap_hi = (il + 1 == g.lim_lam) & (fl < 1e-11)
    il = np.where(snap_hi, il - 1, il)
    fl = np.where(snap_hi, 1.0, fl)
    bad = (il < 0) | (il + 1 >= g.lim_lam)
    # edge snapping, phi
    snap_lo = (ip == -1) & (fp > 0.99999999999)
    ip = np.where(snap_lo, ip + 1, ip)
    fp = np.where(snap_lo, 0.0, fp)
    snap_hi = (ip + 1 == g.lim_phi) & (fp < 1e-11)
    ip = np.where(snap_hi, ip - 1, ip)
    fp = np.where(snap_hi, 1.0, fp)
    bad |= (ip < 0) | (ip + 1 >= g.lim_phi)

    ili = np.where(bad, 0, il).astype(np.int64)
    ipi = np.where(bad, 0, ip).astype(np.int64)
    f00 = g.cvs[ipi, ili]
    f10 = g.cvs[ipi, ili + np.where(bad, 0, 1)]
    f01 = g.cvs[ipi + np.where(bad, 0, 1), ili]
    f11 = g.cvs[ipi + np.where(bad, 0, 1), ili + np.where(bad, 0, 1)]

    m11 = fl * fp
    m10 = fl * (1.0 - fp)
    m01 = (1.0 - fl) * fp
    m00 = (1.0 - fl) * (1.0 - fp)
    val_lam = m00 * f00[..., 0] + m10 * f10[..., 0] + m01 * f01[..., 0] + m11 * f11[..., 0]
    val_phi = m00 * f00[..., 1] + m10 * f10[..., 1] + m01 * f01[..., 1] + m11 * f11[..., 1]
    return np.where(bad, np.nan, val_lam), np.where(bad, np.nan, val_phi)


def nad_cvt(lam, phi, inverse: bool, g: ShiftGrid):
    """Apply (or invert) a shift grid (nad_cvt.c:6-68), vectorized
    with per-lane convergence exactly mirroring the scalar do/while."""
    tb_lam = adjlon(lam - g.ll_lam - PI) + PI
    tb_phi = phi - g.ll_phi
    t_lam, t_phi = nad_intr(tb_lam, tb_phi, g)
    if not inverse:
        out_lam = np.where(np.isnan(t_lam), np.nan, lam - t_lam)
        out_phi = np.where(np.isnan(t_lam), np.nan, phi + t_phi)
        return out_lam, out_phi

    # inverse: fixed point on grid-relative coordinates
    cur_lam = tb_lam + t_lam
    cur_phi = tb_phi - t_phi
    dead = np.isnan(t_lam)  # outside on first probe -> failure
    active = ~dead
    failed = dead.copy()
    # do/while: body executes up to 10 times (i=9, post-decrement test)
    for it in range(_MAX_TRY + 1):
        if not np.any(active):
            break
        dl, dp = nad_intr(cur_lam[active], cur_phi[active], g)
        edge = np.isnan(dl)  # first-order fallback: keep current value
        dif_lam = cur_lam[active] - dl - tb_lam[active]
        dif_phi = cur_phi[active] + dp - tb_phi[active]
        new_lam = cur_lam[active] - dif_lam
        new_phi = cur_phi[active] - dif_phi
        # frozen lanes (edge) keep their previous value
        cur_lam[active] = np.where(edge, cur_lam[active], new_lam)
        cur_phi[active] = np.where(edge, cur_phi[active], new_phi)
        conv = edge | ~((np.abs(dif_lam) > _TOL) & (np.abs(dif_phi) > _TOL))
        idx = np.flatnonzero(active)
        if it == _MAX_TRY:  # i went negative for still-active lanes
            failed[idx[~conv]] = True
            active[idx] = False
        else:
            active[idx[conv]] = False
    out_lam = adjlon(cur_lam + g.ll_lam)
    out_phi = cur_phi + g.ll_phi
    out_lam = np.where(failed, np.nan, out_lam)
    out_phi = np.where(failed, np.nan, out_phi)
    return out_lam, out_phi


# --------------------------------------------------------------- registry
# name -> list[ShiftGrid] (probe order = file order; children probed
# before falling back to the parent, pj_apply_gridshift.c:158-188)
_GRID_REGISTRY: dict[str, list[ShiftGrid]] = {}


def register_grid(name: str, grids: list[ShiftGrid] | ShiftGrid) -> None:
    if isinstance(grids, ShiftGrid):
        grids = [grids]
    _GRID_REGISTRY[name] = grids


def null_grid() -> ShiftGrid:
    """The 'null' world grid: zero shift everywhere."""
    return ShiftGrid(
        grid_id="null",
        ll_lam=-PI,
        ll_phi=-PI / 2,
        del_lam=PI,
        del_phi=PI / 2,
        lim_lam=3,
        lim_phi=3,
        cvs=np.zeros((3, 3, 2), dtype=np.float32),
    )


register_grid("null", null_grid())


def _load_grid_file(tok: str) -> list[ShiftGrid] | None:
    """pj_open_lib analog: try the literal path, then the grid search
    path, and sniff the format (pj_gridinfo_init)."""
    import os

    from ..sources import initfiles
    from ..sources.grids import open_grid  # lazy: avoids import cycle

    dirs = [
        *initfiles._SEARCH_PATH,
        os.environ.get("PROJ_SPARK_LIB", ""),
        initfiles._BUNDLED,
    ]
    candidates = [tok] if os.path.isabs(tok) or os.sep in tok else []
    candidates += [os.path.join(d, tok) for d in dirs if d]
    for path in candidates:
        if not os.path.isfile(path):
            continue
        try:
            loaded = open_grid(path)
        except ValueError:
            # unreadable/corrupt file == the reference's "missing"
            # format stub (pj_gridinfo.c:861-866): optional entries
            # skip it, required ones raise at the caller
            return None
        if isinstance(loaded, ShiftGrid):
            return [loaded]
        if isinstance(loaded, list):
            return loaded
        # GTX tuple: a vertical grid — not usable as a horizontal shift
        raise ValueError(f"{tok}: GTX is a vertical grid (use +geoidgrids)")
    return None


def resolve_gridlist(nadgrids: str) -> list[ShiftGrid]:
    """Parse the comma list; '@' prefix = optional (missing grid is
    skipped silently), matching pj_gridlist.c:163-224.  Unregistered
    names fall back to disk via the search path (pj_open_lib)."""
    out: list[ShiftGrid] = []
    for tok in nadgrids.split(","):
        tok = tok.strip()
        optional = tok.startswith("@")
        if optional:
            tok = tok[1:]
        grids = _GRID_REGISTRY.get(tok)
        if grids is None:
            grids = _load_grid_file(tok)
            if grids is not None:
                _GRID_REGISTRY[tok] = grids  # cache for later plans
        if grids is None:
            if optional:
                continue
            raise FileNotFoundError(f"required shift grid {tok!r} not registered")
        out.extend(grids)
    return out


def apply_gridshift(grids: list[ShiftGrid], inverse: bool, lam, phi):
    """First-match-wins ordered application; unmatched points pass
    through unshifted (pj_apply_gridshift.c:228-244)."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    out_lam = lam.copy()
    out_phi = phi.copy()
    remaining = ~np.isnan(lam)
    for g in grids:
        if not np.any(remaining):
            break
        hit = remaining & g.contains(lam, phi)
        if not np.any(hit):
            continue
        # descend into children: first containing child wins
        applied = np.zeros_like(hit)
        if g.children:
            for ch in g.children:
                sub = hit & ~applied & ch.contains(lam, phi)
                if np.any(sub):
                    nl, npphi = nad_cvt(lam[sub], phi[sub], inverse, ch)
                    out_lam[sub] = nl
                    out_phi[sub] = npphi
                    applied |= sub
        rest = hit & ~applied
        if np.any(rest):
            nl, npphi = nad_cvt(lam[rest], phi[rest], inverse, g)
            out_lam[rest] = nl
            out_phi[rest] = npphi
        remaining &= ~hit
    return out_lam, out_phi


def apply_gridshift_stage(nadgrids: str, inverse: bool):
    """Pipeline-stage factory used by plans.pipeline._plan_datum."""
    grids = resolve_gridlist(nadgrids)

    def fn(x, y, z):
        lam, phi = apply_gridshift(grids, inverse, x, y)
        return lam, phi, z

    return fn


def make_synthetic_grid(
    grid_id: str = "conus_syn",
    ll_lon_deg: float = -125.0,
    ll_lat_deg: float = 24.0,
    n_lon: int = 61,
    n_lat: int = 31,
    cell_deg: float = 1.0,
    amp_arcsec: float = 2.0,
) -> ShiftGrid:
    """Deterministic smooth sinusoidal shift field (FIXTURES.md §3):
    amplitude a few arc-seconds so the iterative inverse converges in
    <=9 iterations like real NAD grids."""
    d2r = PI / 180.0
    sec2r = d2r / 3600.0
    jj, ii = np.meshgrid(np.arange(n_lat), np.arange(n_lon), indexing="ij")
    lam_off = amp_arcsec * sec2r * np.sin(2.0 * PI * ii / (n_lon - 1)) * np.cos(
        PI * jj / (n_lat - 1)
    )
    phi_off = 0.5 * amp_arcsec * sec2r * np.cos(2.0 * PI * jj / (n_lat - 1)) * np.sin(
        PI * ii / (n_lon - 1)
    )
    cvs = np.stack([lam_off, phi_off], axis=-1).astype(np.float32)
    return ShiftGrid(
        grid_id=grid_id,
        ll_lam=ll_lon_deg * d2r,
        ll_phi=ll_lat_deg * d2r,
        del_lam=cell_deg * d2r,
        del_phi=cell_deg * d2r,
        lim_lam=n_lon,
        lim_phi=n_lat,
        cvs=cvs,
    )
