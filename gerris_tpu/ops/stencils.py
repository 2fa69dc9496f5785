"""Discrete differential operators on uniform grids.

TPU-native replacement for the reference's per-cell traversal operators
(reference: src/fluid.c — gfs_center_gradient:434, gfs_face_gradient:778,
gfs_normal_divergence:2310, gfs_interpolate:2697, gfs_norm reductions
fluid.h:214-230).  All operators are whole-array jnp expressions that XLA
fuses; fields are unpadded cell-centred arrays unless stated otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.grid import Grid


def shift(a: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """a[..., i+offset, ...] for a padded array (valid region shrinks)."""
    idx = [slice(None)] * a.ndim
    n = a.shape[axis]
    idx[axis] = slice(offset, n + offset) if offset >= 0 else slice(0, n + offset)
    return a[tuple(idx)]


def center_gradient(u_pad: jnp.ndarray, grid: Grid, axis: int) -> jnp.ndarray:
    """Centred gradient at cell centres from a 1-ghost padded field.

    Reference: src/fluid.c:434 gfs_center_gradient (centred difference /2h).
    Returns an array of the interior shape.
    """
    a = _crop_other(u_pad, axis)
    n = a.shape[axis]
    hi = [slice(None)] * a.ndim
    hi[axis] = slice(2, n)
    lo = [slice(None)] * a.ndim
    lo[axis] = slice(0, n - 2)
    return (a[tuple(hi)] - a[tuple(lo)]) / (2.0 * grid.h)


def _crop_other(a, axis):
    """Crop ghost layers on all axes except ``axis``."""
    idx = [slice(1, s - 1) for s in a.shape]
    idx[axis] = slice(None)
    return a[tuple(idx)]


def _int(a, axis, start):
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(start, a.shape[axis] - 2 + start)
    return tuple(idx)


def face_gradient(u_pad: jnp.ndarray, grid: Grid, axis: int) -> jnp.ndarray:
    """Gradient normal to faces, at every face of axis ``axis`` (n+1 faces).

    Input is padded by 1 ghost on every axis; output has face shape
    (n+1 along ``axis``, n along others).
    Reference: src/fluid.c:778 gfs_face_gradient (uniform-grid branch).
    """
    a = _crop_other(u_pad, axis)
    n = a.shape[axis]
    hi = shift(a, axis, 1)  # length n-1 along axis => faces 0..n
    lo = a
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(0, n - 1)
    return (hi[tuple(idx)] - lo[tuple(idx)]) / grid.h


def face_average(u_pad: jnp.ndarray, grid: Grid, axis: int) -> jnp.ndarray:
    """Arithmetic mean of the two cells adjacent to each face (face shape)."""
    a = _crop_other(u_pad, axis)
    n = a.shape[axis]
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(0, n - 1)
    return 0.5 * (shift(a, axis, 1)[tuple(idx)] + a[tuple(idx)])


def divergence(fluxes, grid: Grid) -> jnp.ndarray:
    """Cell-centred divergence of face-normal fields.

    ``fluxes[axis]`` has face shape along ``axis``.  Returns interior shape.
    Reference: src/fluid.c:2310 gfs_normal_divergence (sum of face values).
    """
    out = 0.0
    for axis, f in enumerate(fluxes):
        n = f.shape[axis]
        idx_hi = [slice(None)] * f.ndim
        idx_hi[axis] = slice(1, n)
        idx_lo = [slice(None)] * f.ndim
        idx_lo[axis] = slice(0, n - 1)
        out = out + (f[tuple(idx_hi)] - f[tuple(idx_lo)]) / grid.h
    return out


def laplacian(u_pad: jnp.ndarray, grid: Grid, alpha_faces=None) -> jnp.ndarray:
    """div(alpha grad u) with the 5/7-point stencil.

    ``alpha_faces``: optional per-axis face-coefficient arrays (face shape),
    the analogue of the reference's weighted Poisson coefficients
    (src/poisson.c:756-901 gfs_poisson_coefficients).
    """
    fluxes = []
    for axis in range(grid.dim):
        g = face_gradient(u_pad, grid, axis)
        if alpha_faces is not None:
            g = g * alpha_faces[axis]
        fluxes.append(g)
    return divergence(fluxes, grid)


# -- slope limiters (reference: src/fluid.c:434-530, gfs_center_van_leer_gradient etc.)
def van_leer_limit(s0: jnp.ndarray, s1: jnp.ndarray) -> jnp.ndarray:
    """van Leer limited slope from one-sided differences s0 (lo) and s1 (hi).

    Returns per-cell limited slope (already in gradient units).
    Reference: src/fluid.c gfs_center_van_leer_gradient.
    """
    prod = s0 * s1
    harm = 2.0 * prod / jnp.where(s0 + s1 == 0.0, 1.0, s0 + s1)
    return jnp.where(prod > 0.0, harm, 0.0)


def minmod_limit(s0, s1):
    cond = s0 * s1 > 0.0
    return jnp.where(cond, jnp.where(jnp.abs(s0) < jnp.abs(s1), s0, s1), 0.0)


def center_limited_gradient(u_pad: jnp.ndarray, grid: Grid, axis: int,
                            limiter: str = "van_leer") -> jnp.ndarray:
    """Limited cell-centred slope du/dx (reference: advection gradient choice,
    src/advection.h GfsAdvectionParams.gradient, default van Leer)."""
    a = _crop_other(u_pad, axis)
    c = a[_int(a, axis, 1)]
    lo = a[_int(a, axis, 0)]
    hi = a[_int(a, axis, 2)]
    s0 = (c - lo) / grid.h
    s1 = (hi - c) / grid.h
    if limiter == "none":
        return 0.5 * (s0 + s1)
    if limiter == "van_leer":
        return van_leer_limit(s0, s1)
    if limiter == "minmod":
        return minmod_limit(s0, s1)
    raise ValueError(f"unknown limiter {limiter}")


# -- norms (reference: src/fluid.h:214-230 GfsNorm; volume-weighted) --------
def norms(e: jnp.ndarray, w: jnp.ndarray = None):
    """Volume-weighted L1/L2/Linf + bias of a cell field.

    Returns dict(first, second, infty, bias, w).
    Reference: src/fluid.c gfs_norm_add / gfs_norm_update.
    """
    if w is None:
        w = jnp.ones_like(e)
    tw = jnp.sum(w)
    first = jnp.sum(jnp.abs(e) * w) / tw
    second = jnp.sqrt(jnp.sum(e * e * w) / tw)
    infty = jnp.max(jnp.abs(e))
    bias = jnp.sum(e * w) / tw
    return {"first": first, "second": second, "infty": infty, "bias": bias, "w": tw}


def unbiased_error(e: jnp.ndarray, w: jnp.ndarray = None):
    """Subtract the volume-weighted mean before taking norms
    (reference: src/output.c OutputErrorNorm `unbiased = 1`)."""
    if w is None:
        w = jnp.ones_like(e)
    mean = jnp.sum(e * w) / jnp.sum(w)
    return e - mean
