"""Terrain: multi-resolution bathymetry from scattered point clouds.

TPU-native rebuild of the reference's terrain module (reference:
modules/terrain.c — per-cell least-squares plane fits update_terrain_rms
:559-672, refinement on fit RMS update_height_and_check_for_refinement
:787-814, the Hmin/Hmax/He derived variables:1135-1170; the vendored
R*-tree / kd-tree spatial indexes reduce, on TPU, to one segment_sum of
point moments per level — a single batched scatter instead of millions
of tree queries).

Per cell the fit is z ~ h0 + hx (x-xc)/h + hy (y-yc)/h, solved from the
accumulated moments [N, Sx, Sy, Sxx, Sxy, Syy, Sz, Sxz, Syz] with a
batched 3x3 solve (MXU-friendly).  Cells with < 3 points inherit the
coarser fit (terrain_coarse_fine, terrain.c:986).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid


@dataclasses.dataclass
class CellFit:
    h0: jnp.ndarray       # height at the cell centre
    hx: jnp.ndarray       # d height / d(x/h)
    hy: jnp.ndarray
    rms: jnp.ndarray      # fit residual rms
    n: jnp.ndarray        # points per cell
    hmin: jnp.ndarray
    hmax: jnp.ndarray


def cell_fit(points: np.ndarray, grid: Grid) -> CellFit:
    """Least-squares plane fit of the points falling in every cell of
    ``grid`` (the reference's update_terrain over a full level)."""
    pts = jnp.asarray(points)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    h = grid.h
    nx, ny = grid.shape
    i = jnp.clip(jnp.floor((x - grid.origin[0]) / h).astype(jnp.int32),
                 0, nx - 1)
    j = jnp.clip(jnp.floor((y - grid.origin[1]) / h).astype(jnp.int32),
                 0, ny - 1)
    seg = i * ny + j
    ncell = nx * ny
    xc = grid.origin[0] + (i + 0.5) * h
    yc = grid.origin[1] + (j + 0.5) * h
    u = (x - xc) / h
    v = (y - yc) / h

    def ssum(w):
        return jax.ops.segment_sum(w, seg, num_segments=ncell)

    N = ssum(jnp.ones_like(z))
    Sx, Sy = ssum(u), ssum(v)
    Sxx, Sxy, Syy = ssum(u * u), ssum(u * v), ssum(v * v)
    Sz, Sxz, Syz = ssum(z), ssum(u * z), ssum(v * z)
    Szz = ssum(z * z)

    A = jnp.stack([
        jnp.stack([N, Sx, Sy], -1),
        jnp.stack([Sx, Sxx, Sxy], -1),
        jnp.stack([Sy, Sxy, Syy], -1)], -2)            # (ncell, 3, 3)
    b = jnp.stack([Sz, Sxz, Syz], -1)                  # (ncell, 3)
    ok = N >= 3
    A_safe = jnp.where(ok[:, None, None], A,
                       jnp.eye(3)[None])
    sol = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    h0, hx, hy = sol[:, 0], sol[:, 1], sol[:, 2]
    # residual rms from the moments
    ss = (Szz - 2 * (h0 * Sz + hx * Sxz + hy * Syz)
          + h0 * h0 * N + hx * hx * Sxx + hy * hy * Syy
          + 2 * (h0 * hx * Sx + h0 * hy * Sy + hx * hy * Sxy))
    rms = jnp.sqrt(jnp.maximum(ss, 0.0) / jnp.maximum(N, 1.0))
    big = jnp.asarray(jnp.finfo(z.dtype).max, z.dtype)
    hmin = -jax.ops.segment_max(-z, seg, num_segments=ncell)
    hmax = jax.ops.segment_max(z, seg, num_segments=ncell)
    shape = (nx, ny)

    def rs(a):
        return a.reshape(shape)

    return CellFit(h0=rs(jnp.where(ok, h0, 0.0)),
                   hx=rs(jnp.where(ok, hx, 0.0)),
                   hy=rs(jnp.where(ok, hy, 0.0)),
                   rms=rs(jnp.where(ok, rms, 0.0)),
                   n=rs(N),
                   hmin=rs(jnp.where(N > 0, hmin, big)),
                   hmax=rs(jnp.where(N > 0, hmax, -big)))


def terrain_height(points: np.ndarray, grid: Grid,
                   min_points: int = 3) -> jnp.ndarray:
    """Bathymetry H at cell centres: the per-cell fit where supported,
    filled from successively coarser fits elsewhere (terrain_coarse_fine
    prolongation, modules/terrain.c:986-1010)."""
    fit = cell_fit(points, grid)
    H = fit.h0
    filled = fit.n >= min_points
    level = grid.level
    while level > 0 and not bool(jnp.all(filled)):
        level -= 1
        import dataclasses as dc
        gc = dc.replace(grid, level=level)
        cf = cell_fit(points, gc)
        # coarse value + slope evaluated at the fine-cell centre
        r = grid.level - level
        f = 2 ** r
        ii = jnp.arange(grid.shape[0]) // f
        jj = jnp.arange(grid.shape[1]) // f
        # offset of the fine centre inside the coarse cell, in coarse h
        ox = ((jnp.arange(grid.shape[0]) % f) + 0.5) / f - 0.5
        oy = ((jnp.arange(grid.shape[1]) % f) + 0.5) / f - 0.5
        Hc = (cf.h0[jnp.ix_(ii, jj)]
              + cf.hx[jnp.ix_(ii, jj)] * ox[:, None]
              + cf.hy[jnp.ix_(ii, jj)] * oy[None, :])
        okc = cf.n[jnp.ix_(ii, jj)] >= min_points
        H = jnp.where(filled, H, jnp.where(okc, Hc, H))
        filled = filled | okc
    return H


def refine_criterion(points: np.ndarray, grid: Grid, tol: float):
    """True where the plane fit at this level is not yet within ``tol``
    (drives AMR refinement like GfsRefineTerrain,
    modules/terrain.c:787-814)."""
    fit = cell_fit(points, grid)
    return (fit.rms > tol) & (fit.n >= 3)
