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
