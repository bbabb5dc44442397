"""Chebyshev approximate-kernel generator.

Role of the reference's -T/gen_cheb path (src/mk_cheby.c:36-177,
src/proj.c:435-438): fit a 2-D Chebyshev series to any (lam, phi) ->
(x, y) kernel over a rectangular domain to a requested tolerance, and
evaluate it as a fast approximate kernel.  The reference uses this as
a throughput fast-path where the tolerance allows (SURVEY.md §4
"Approximate-kernel substitution"); here the evaluator is a pair of
numpy chebval2d calls — typically 5-20x fewer flops than an iterative
ellipsoidal kernel, usable inside the same pandas-UDF pipeline.

The fit reports its measured max residual; callers decide whether the
tolerance is acceptable (never substituted silently — §4 table).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from numpy.polynomial import chebyshev as C


@dataclass
class ChebyKernel:
    """Fitted approximate kernel over [lam_min, lam_max] x
    [phi_min, phi_max] (radians)."""

    coef_x: np.ndarray
    coef_y: np.ndarray
    lam_rng: tuple[float, float]
    phi_rng: tuple[float, float]
    max_residual: float  # measured on a dense verification grid

    def _norm(self, lam, phi):
        l0, l1 = self.lam_rng
        p0, p1 = self.phi_rng
        u = (2.0 * np.asarray(lam, np.float64) - (l1 + l0)) / (l1 - l0)
        v = (2.0 * np.asarray(phi, np.float64) - (p1 + p0)) / (p1 - p0)
        return u, v

    def fwd(self, lam, phi):
        u, v = self._norm(lam, phi)
        return C.chebval2d(u, v, self.coef_x), C.chebval2d(u, v, self.coef_y)


def fit_chebyshev(
    fwd,
    lam_rng: tuple[float, float],
    phi_rng: tuple[float, float],
    degree: int = 12,
    grid: int = 40,
) -> ChebyKernel:
    """Least-squares fit of ``fwd(lam, phi) -> (x, y)`` on a
    Chebyshev-node grid (nodes avoid Runge oscillation, mirroring the
    reference's Chebyshev evaluation points)."""
    # Chebyshev nodes in each axis
    k = np.arange(grid)
    nodes = np.cos(np.pi * (k + 0.5) / grid)
    l0, l1 = lam_rng
    p0, p1 = phi_rng
    lam_n = 0.5 * (nodes + 1.0) * (l1 - l0) + l0
    phi_n = 0.5 * (nodes + 1.0) * (p1 - p0) + p0
    L, P = np.meshgrid(lam_n, phi_n)
    X, Y = fwd(L.ravel(), P.ravel())

    u = (2.0 * L.ravel() - (l1 + l0)) / (l1 - l0)
    v = (2.0 * P.ravel() - (p1 + p0)) / (p1 - p0)
    V = C.chebvander2d(u, v, [degree, degree])
    cx, *_ = np.linalg.lstsq(V, X, rcond=None)
    cy, *_ = np.linalg.lstsq(V, Y, rcond=None)
    coef_x = cx.reshape(degree + 1, degree + 1)
    coef_y = cy.reshape(degree + 1, degree + 1)

    kern = ChebyKernel(coef_x, coef_y, lam_rng, phi_rng, 0.0)
    # measure the residual on an independent dense uniform grid
    lam_t = np.linspace(l0, l1, 73)
    phi_t = np.linspace(p0, p1, 71)
    Lt, Pt = np.meshgrid(lam_t, phi_t)
    xt, yt = fwd(Lt.ravel(), Pt.ravel())
    xa, ya = kern.fwd(Lt.ravel(), Pt.ravel())
    kern.max_residual = float(
        np.nanmax(np.hypot(np.asarray(xa) - xt, np.asarray(ya) - yt))
    )
    return kern


# ----------------------------------------------------------- reference parity
# Exact ports of the reference's Chebyshev tool chain (src/bchgen.c,
# src/mk_cheby.c, src/bch2bps.c, src/gen_cheb.c): coefficient
# generation by discrete cosine sums at Chebyshev nodes, small-
# coefficient cut with residual audit, and conversion of the bivariate
# Chebyshev series to a bivariate POWER series over the same domain.
# Convention: coefficients include the full 2/n DCT factor, so
# evaluation halves the first row and first column (biv_eval).


def bchgen(a, b, nu: int, nv: int, func):
    """src/bchgen.c:4-58 vectorized: sample func on the nu x nv
    Chebyshev-node grid over [a.u,b.u] x [a.v,b.v] and run both DCT
    passes as matrix products.  Returns (cx, cy) each (nu, nv)."""
    au, av = a
    bu, bv = b
    iu = np.arange(nu)
    iv = np.arange(nv)
    xu = np.cos(np.pi * (iu + 0.5) / nu) * 0.5 * (bu - au) + 0.5 * (bu + au)
    xv = np.cos(np.pi * (iv + 0.5) / nv) * 0.5 * (bv - av) + 0.5 * (bv + av)
    U, V = np.meshgrid(xu, xv, indexing="ij")
    fx, fy = func(U.ravel(), V.ravel())
    FX = np.asarray(fx, np.float64).reshape(nu, nv)
    FY = np.asarray(fy, np.float64).reshape(nu, nv)
    mu = np.cos(np.pi * np.outer(iu, iu + 0.5) / nu)  # [i, k]
    mv = np.cos(np.pi * np.outer(iv, iv + 0.5) / nv)
    cx = (2.0 / nu) * (mu @ FX)
    cy = (2.0 / nu) * (mu @ FY)
    cx = (2.0 / nv) * (cx @ mv.T)
    cy = (2.0 / nv) * (cy @ mv.T)
    return cx, cy


def biv_cheb_eval(c: np.ndarray, a, b, u, v):
    """Evaluate a reference-convention bivariate Chebyshev matrix
    (first row/column halved) at (u, v) in the original domain."""
    from numpy.polynomial import chebyshev as C

    au, av = a
    bu, bv = b
    cc = np.array(c, np.float64)
    cc[0, :] *= 0.5
    cc[:, 0] *= 0.5
    x = (2.0 * np.asarray(u, np.float64) - (bu + au)) / (bu - au)
    y = (2.0 * np.asarray(v, np.float64) - (bv + av)) / (bv - av)
    return C.chebval2d(x, y, cc)


def _rows_to_power(c: np.ndarray) -> np.ndarray:
    """src/bch2bps.c rows(): 1-D Chebyshev (c0-halved convention) ->
    power series over [-1, 1]."""
    n = len(c)
    d = np.zeros(n)
    dd = np.zeros(n)
    d[0] = c[n - 1]
    for j in range(n - 2, 0, -1):
        for k in range(n - j, 0, -1):
            sv = d[k]
            d[k] = 2.0 * d[k - 1] - dd[k]
            dd[k] = sv
        sv = d[0]
        d[0] = -dd[0] + c[j]
        dd[0] = sv
    for j in range(n - 1, 0, -1):
        d[j] = d[j - 1] - dd[j]
    d[0] = -dd[0] + 0.5 * c[0]
    return d


def _rowshft(a: float, b: float, d: np.ndarray) -> np.ndarray:
    """src/bch2bps.c rowshft(): map power series from [-1,1] to [a,b]."""
    n = len(d)
    cnst = 2.0 / (b - a)
    fac = cnst
    for j in range(1, n):
        d[j] *= fac
        fac *= cnst
    cnst = 0.5 * (a + b)
    for j in range(0, n - 1):
        for k in range(n - 2, j - 1, -1):
            d[k] -= cnst * d[k + 1]
    return d


def _cols_to_power(c: np.ndarray) -> np.ndarray:
    """src/bch2bps.c cols(): the rows() recurrence applied down the
    first (u) axis, vectorized over the second axis."""
    nu = c.shape[0]
    d = np.zeros_like(c)
    dd = np.zeros_like(c)
    d[0] = c[nu - 1]
    for j in range(nu - 2, 0, -1):
        for k in range(nu - j, 0, -1):
            sv = d[k].copy()
            d[k] = 2.0 * d[k - 1] - dd[k]
            dd[k] = sv
        sv = d[0].copy()
        d[0] = c[j] - dd[0]
        dd[0] = sv
    for j in range(nu - 1, 0, -1):
        d[j] = d[j - 1] - dd[j]
    d[0] = 0.5 * c[0] - dd[0]
    return d


def _colshft(a: float, b: float, d: np.ndarray) -> np.ndarray:
    n = d.shape[0]
    cnst = 2.0 / (b - a)
    fac = cnst
    for j in range(1, n):
        d[j] *= fac
        fac *= cnst
    cnst = 0.5 * (a + b)
    for j in range(0, n - 1):
        for k in range(n - 2, j - 1, -1):
            d[k] -= cnst * d[k + 1]
    return d


def bch2bps(a, b, c: np.ndarray) -> np.ndarray:
    """src/bch2bps.c:123-140: bivariate Chebyshev coefficient matrix
    (reference convention) -> bivariate power series over the same
    domain; evaluate with numpy polyval2d(u, v, out)."""
    au, av = a
    bu, bv = b
    nu, nv = c.shape
    d = np.zeros_like(c, dtype=np.float64)
    for i in range(nu):
        d[i] = _rowshft(av, bv, _rows_to_power(np.asarray(c[i], np.float64)))
    out = _colshft(au, bu, _cols_to_power(d))
    return out


def mk_cheby(a, b, res: float, func, nu: int = 15, nv: int = 15,
             power: bool = False):
    """src/mk_cheby.c:36-177: generate, cut small coefficients until
    the summed residual fits ``res`` (halving the cut up to 4 tries),
    optionally convert to a power series.  Returns
    (cx, cy, resid_uv, cutres) with zeroed sub-threshold entries."""
    cx, cy = bchgen(a, b, nu, nv, func)
    cutres = res
    resid = (0.0, 0.0)
    for i in range(4, 0, -1):
        ru = float(np.abs(cx)[np.abs(cx) < cutres].sum())
        rv = float(np.abs(cy)[np.abs(cy) < cutres].sum())
        resid = (ru, rv)
        if ru < res and rv < res:
            break
        cutres *= 0.5
    else:
        resid = (-resid[0], resid[1])  # too many tries: flag like the C
    cx = np.where(np.abs(cx) < cutres, 0.0, cx)
    cy = np.where(np.abs(cy) < cutres, 0.0, cy)
    if power:
        cx = bch2bps(a, b, cx)
        cy = bch2bps(a, b, cy)
    return cx, cy, resid, cutres


def p_series_lines(c: np.ndarray, fmt: str = "%.5f") -> list[str]:
    """src/p_series.c: per-row trailing-zero-trimmed coefficient dump
    (one 'i m c...' line per non-empty row)."""
    out = []
    nru = 0
    ms = []
    for i in range(c.shape[0]):
        nz = np.nonzero(c[i])[0]
        m = int(nz[-1]) + 1 if len(nz) else 0
        ms.append(m)
        if m:
            nru = i + 1
    out.append(f"u: {nru}")
    for i in range(nru):
        if ms[i]:
            out.append(f"{i} {ms[i]} " + " ".join(fmt % v for v in c[i, : ms[i]]))
    return out
