"""Surface tension: well-balanced CSF via face sources in the projection.

TPU-native rebuild of the reference's height-function/CSF coupling
(reference: src/tension.c GfsSourceTension:307-385 + tension_coeff
src/poisson.c:903-996 + gfs_velocity_face_sources src/timestep.c:245-290):
the force sigma*kappa*grad(c) is discretized with the SAME face-gradient
stencil as the pressure gradient and injected into both projections, so a
static droplet's Laplace pressure balances tension to solver tolerance
(the test/spurious property).

Sign convention here: kappa > 0 for a convex fluid body; physical force
+ sigma * kappa * grad(c) (toward the fluid for a droplet).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from . import vof


def face_kappa_pair(kap: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Curvature at interior+boundary faces (face shape along axis) from
    the NaN-marked cell curvature: mean where both defined, one-sided
    where one is, 0 otherwise."""
    pad = [(0, 0)] * kap.ndim
    pad[axis] = (1, 1)
    kp = jnp.pad(kap, pad, mode="edge")
    n = kp.shape[axis]
    lo = [slice(None)] * kap.ndim
    lo[axis] = slice(0, n - 1)
    hi = [slice(None)] * kap.ndim
    hi[axis] = slice(1, n)
    k1 = kp[tuple(lo)]
    k2 = kp[tuple(hi)]
    ok1 = jnp.isfinite(k1)
    ok2 = jnp.isfinite(k2)
    k1z = jnp.where(ok1, k1, 0.0)
    k2z = jnp.where(ok2, k2, 0.0)
    both = 0.5 * (k1z + k2z)
    return jnp.where(ok1 & ok2, both,
                     jnp.where(ok1, k1z, jnp.where(ok2, k2z, 0.0)))


def tension_face_sources(T: jnp.ndarray, kap: jnp.ndarray, sigma,
                         grid: Grid, fbc: bcs.FieldBC, alpha=None,
                         t: float = 0.0) -> list:
    """Per-axis face arrays dp = alpha * sigma * kappa_face * grad_face(T),
    to be passed as mac_projection(face_sources=...).
    Reference: tension_coeff src/poisson.c:903-996 +
    gfs_correct_normal_velocities applied to the VOF fraction."""
    T_pad = bcs.apply_bc(T, grid, fbc, 1, t=t)
    out = []
    for axis in range(grid.dim):
        idx = [slice(1, s - 1) for s in T_pad.shape]
        idx[axis] = slice(None)
        a = T_pad[tuple(idx)]
        n = a.shape[axis]
        lo = [slice(None)] * a.ndim
        lo[axis] = slice(0, n - 1)
        hi = [slice(None)] * a.ndim
        hi[axis] = slice(1, n)
        gradT = (a[tuple(hi)] - a[tuple(lo)]) / grid.h
        kf = face_kappa_pair(kap, axis)
        dp = sigma * kf * gradT
        if alpha is not None:
            dp = dp * alpha[axis]
        out.append(dp)
    return out


def stability_dt(grid: Grid, sigma: float, rho1: float = 1.0,
                 rho2: float = 1.0) -> float:
    """Capillary timestep constraint dt <= sqrt(rho_avg h^3 / (pi sigma)).
    Reference: src/tension.c:106-137 gfs_source_tension_generic_stability."""
    if sigma <= 0.0:
        return math.inf
    rho = 0.5 * (rho1 + rho2)
    return math.sqrt(rho * grid.h ** 3 / (math.pi * sigma))

def _youngs_gradient(a_pad: jnp.ndarray):
    """2D Youngs (3x3, 1-2-1 weighted) gradient of a 1-ghost-padded
    field, h-scaled per-cell units (gfs_youngs_gradient, src/fluid.c)."""
    gx = ((a_pad[2:, :-2] + 2.0 * a_pad[2:, 1:-1] + a_pad[2:, 2:])
          - (a_pad[:-2, :-2] + 2.0 * a_pad[:-2, 1:-1] + a_pad[:-2, 2:])
          ) / 8.0
    gy = ((a_pad[:-2, 2:] + 2.0 * a_pad[1:-1, 2:] + a_pad[2:, 2:])
          - (a_pad[:-2, :-2] + 2.0 * a_pad[1:-1, :-2] + a_pad[2:, :-2])
          ) / 8.0
    return gx, gy


def css_tension_sources(T: jnp.ndarray, sigma, grid: Grid,
                        fbc: bcs.FieldBC, alpha_cell=None, t=0.0):
    """Continuum-Surface-Stress surface tension (GfsSourceTensionCSS,
    src/tension.c:181-305, 2D only): the capillary stress tensor
    sigma (|n| I - n n/|n|) is assembled from Youngs gradients and its
    divergence returned as per-component CELL accelerations —
      g0 = (sigma/h) nx^2/|n|, g1 = (sigma/h) ny^2/|n|,
      g2 = (sigma/h) nx ny/|n|,
      t_x = alpha (dx g1 - dy g2)/h,  t_y = alpha (dy g0 - dx g2)/h
    (foreach_cell_normal / foreach_cell_tension_css).  Unlike the
    well-balanced CSF default, CSS needs no curvature estimate; it is
    the reference's alternative for comparison studies."""
    assert grid.dim == 2, "CSS tension is 2D only (reference parity)"
    h = grid.h
    Tp = bcs.apply_bc(T, grid, fbc, 1, t=t)
    nx, ny = _youngs_gradient(Tp)
    nn = jnp.sqrt(nx * nx + ny * ny + 1e-50)
    sigh = sigma / h
    g0 = sigh * nx * nx / nn
    g1 = sigh * ny * ny / nn
    g2 = sigh * nx * ny / nn
    gbc = bcs.default_scalar_bc(2)
    g0p = bcs.apply_bc(g0, grid, gbc, 1, t=t)
    g1p = bcs.apply_bc(g1, grid, gbc, 1, t=t)
    g2p = bcs.apply_bc(g2, grid, gbc, 1, t=t)
    g1x, g1y = _youngs_gradient(g1p)
    g0x, g0y = _youngs_gradient(g0p)
    g2x, g2y = _youngs_gradient(g2p)
    a = 1.0 if alpha_cell is None else alpha_cell
    tx = a * (g1x - g2y) / h
    ty = a * (g0y - g2x) / h
    return [tx, ty]
