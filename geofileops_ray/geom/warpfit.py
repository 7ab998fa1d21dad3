"""GCP transform fitting for warp (rubbersheeting).

Reference: geoops.warp (geoops.py:1561-1612) hands gcps + algorithm
("polynomial" order 1/2/3 or "tps") to OGR (_geoops_ogr.py:80-108).
Here the transform is fitted ONCE on the driver with numpy least
squares / a dense TPS solve, and the resulting coefficient vectors are
broadcast closure state inside the map_batches kernel — no per-batch
refit, no GDAL.

Polynomial model (per output coordinate), GDAL GCP-transformer layout:
  order 1: 1, x, y
  order 2: 1, x, y, x², xy, y²
  order 3: 1, x, y, x², xy, y², x³, x²y, xy², y³

Thin plate spline: f(p) = a0 + a1·x + a2·y + Σᵢ wᵢ·U(|p − gcpᵢ|) with
the radial kernel U(r) = r²·ln(r²) (U(0) = 0); weights solve the
standard interpolation system [[K P],[Pᵀ 0]]·[w;a] = [v;0], so the fit
passes exactly through every control point.
"""

from __future__ import annotations

import numpy as np

_ORDER_TERMS = {1: 3, 2: 6, 3: 10}


def poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """(n, n_terms) design matrix of the polynomial model."""
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * x, x * y, y * y]
    if order >= 3:
        cols += [x**3, x * x * y, x * y * y, y**3]
    return np.stack(cols, axis=1)


def default_order(n_gcps: int) -> int:
    """Highest fully-determined polynomial order for n control points
    (GDAL's auto order selection: 1 needs ≥3, 2 needs ≥6, 3 needs ≥10)."""
    if n_gcps >= 10:
        return 3
    if n_gcps >= 6:
        return 2
    return 1


def fit_polynomial(
    gcps: list[tuple], order: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Least-squares polynomial fit (ax, ay, order) from gcps
    [(x_orig, y_orig, x_dest, y_dest[, elev]), ...]."""
    g = np.asarray([t[:4] for t in gcps], dtype=np.float64)
    if order is None:
        order = default_order(len(g))
    if order not in _ORDER_TERMS:
        raise ValueError(f"polynomial order must be 1, 2 or 3, got {order}")
    need = _ORDER_TERMS[order]
    if len(g) < need:
        raise ValueError(f"order {order} needs ≥{need} gcps, got {len(g)}")
    A = poly_terms(g[:, 0], g[:, 1], order)
    ax, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    ay, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    return ax, ay, order


def apply_polynomial(
    x: np.ndarray, y: np.ndarray, ax: np.ndarray, ay: np.ndarray, order: int
) -> tuple[np.ndarray, np.ndarray]:
    A = poly_terms(x, y, order)
    return A @ ax, A @ ay


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """U(r) = r²·ln(r²), with U(0) = 0."""
    out = np.zeros_like(r2)
    nz = r2 > 0
    out[nz] = r2[nz] * np.log(r2[nz])
    return out


def fit_tps(gcps: list[tuple]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thin-plate-spline weights (src_pts, wx, wy) — wx/wy each hold
    n radial weights followed by the 3 affine terms (a0, a1, a2)."""
    g = np.asarray([t[:4] for t in gcps], dtype=np.float64)
    n = len(g)
    if n < 3:
        raise ValueError(f"tps needs ≥3 gcps, got {n}")
    src = g[:, :2]
    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    K = _tps_kernel(d2)
    P = np.column_stack([np.ones(n), src])
    M = np.zeros((n + 3, n + 3))
    M[:n, :n] = K
    M[:n, n:] = P
    M[n:, :n] = P.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n, 0] = g[:, 2]
    rhs[:n, 1] = g[:, 3]
    sol = np.linalg.solve(M, rhs)
    return src, sol[:, 0], sol[:, 1]


def apply_tps(
    x: np.ndarray,
    y: np.ndarray,
    src: np.ndarray,
    wx: np.ndarray,
    wy: np.ndarray,
    chunk: int = 65536,
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate the fitted TPS at (x, y), chunked so the (points × gcps)
    kernel matrix stays bounded for any batch size."""
    n = len(src)
    ox = np.empty_like(x)
    oy = np.empty_like(y)
    for s in range(0, len(x), max(1, chunk // max(n, 1))):
        e = min(len(x), s + max(1, chunk // max(n, 1)))
        dx = x[s:e, None] - src[None, :, 0]
        dy = y[s:e, None] - src[None, :, 1]
        U = _tps_kernel(dx * dx + dy * dy)
        ox[s:e] = wx[n] + wx[n + 1] * x[s:e] + wx[n + 2] * y[s:e] + U @ wx[:n]
        oy[s:e] = wy[n] + wy[n + 1] * x[s:e] + wy[n + 2] * y[s:e] + U @ wy[:n]
    return ox, oy
