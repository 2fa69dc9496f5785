"""Godunov/BCG (Bell-Colella-Glaz) second-order upwind advection.

TPU-native rebuild of the reference's advection kernels
(reference: src/advection.c — gfs_cell_advected_face_values:58-99 with
transverse_term:30-47, gfs_face_upwinded_value:267-345,
gfs_face_advection_flux:356-385, gfs_face_velocity_advection_flux:398-436,
gfs_face_advected_normal_velocity:513-540), vectorized over whole arrays.

Scheme summary (2D; 3D adds a second transverse term):
  face value of v at t+dt/2, extrapolated from the upwind cell:
    v_face(+side) = v + min((1-u dt/h)/2, 1/2) * h dv/dx
                    - (dt/2) vtan dv/dy|upwind + (dt/2) src
  then a Riemann (upwind) selection between the two sides based on the
  face-normal velocity, and a conservative flux-difference update.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs


@dataclasses.dataclass(frozen=True)
class AdvectionParams:
    """Reference: src/advection.h GfsAdvectionParams; defaults cfl=0.8,
    gradient = gfs_center_gradient (UNLIMITED centred slope), scheme =
    Godunov, gc = TRUE (src/advection.c:924-948
    gfs_advection_params_init)."""
    cfl: float = 0.8
    gradient: str = "centered"  # centered | van_leer | minmod
    scheme: str = "godunov"     # or "none" (non-advected face values)
    gc: bool = True             # explicit pressure gradient in momentum rhs


def _slope(a: jnp.ndarray, axis: int, limiter: str) -> jnp.ndarray:
    """Limited slope * h (value increment per cell) for the interior of a
    once-padded array (output shape = input shrunk by 2 along axis)."""
    n = a.shape[axis]

    def tk(s0, s1):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(s0, n + s1)
        return a[tuple(idx)]

    c, lo, hi = tk(1, -1), tk(0, -2), tk(2, 0)
    s0 = c - lo
    s1 = hi - c
    if limiter in ("centered", "none"):
        return 0.5 * (s0 + s1)
    if limiter == "van_leer":
        prod = s0 * s1
        harm = 2.0 * prod / jnp.where(s0 + s1 == 0.0, 1.0, s0 + s1)
        return jnp.where(prod > 0.0, harm, 0.0)
    if limiter == "minmod":
        return jnp.where(s0 * s1 > 0.0,
                         jnp.where(jnp.abs(s0) < jnp.abs(s1), s0, s1), 0.0)
    raise ValueError(limiter)


def mac_cell_mean(u_face: list, grid: Grid) -> list:
    """Per-cell mean of the two MAC faces of each component, edge-padded by
    one ghost ring (reference: src/advection.c:34-35
    (s->f[2c].un+s->f[2c+1].un)/2)."""
    out = []
    for c in range(grid.dim):
        uf = u_face[c]
        n = uf.shape[c]
        lo = [slice(None)] * grid.dim
        lo[c] = slice(0, n - 1)
        hi = [slice(None)] * grid.dim
        hi[c] = slice(1, n)
        mean = 0.5 * (uf[tuple(lo)] + uf[tuple(hi)])
        out.append(jnp.pad(mean, [(1, 1)] * grid.dim, mode="edge"))
    return out


def advected_face_values(v: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
                         dt, par: AdvectionParams, uc_pad: list,
                         src: Optional[jnp.ndarray] = None,
                         t: float = 0.0, axes=None):
    """BCG-extrapolated face values of ``v`` at t+dt/2, per axis and side.

    ``uc_pad``: advecting velocity per component as 1-ghost padded cell
    arrays (from centered velocities + BCs for the predictor, or
    ``mac_cell_mean`` for the corrector).

    Returns list over axes of (v_plus, v_minus): the value at each cell's
    positive-side / negative-side face, on the 1-ghost padded cell layout
    (shape n+2 per axis) so boundary faces can be upwinded.  ``axes``
    restricts the computation to a subset of face axes (the velocity
    predictor only needs component c's own axis, src/timestep.c:695) —
    entries for skipped axes are None.
    Reference: src/advection.c:58-99.
    """
    dim = grid.dim
    h = grid.h
    v2 = bcs.apply_bc(v, grid, fbc, 2, t=t, corners=False)
    interior1 = tuple(slice(1, s - 1) for s in v2.shape)  # +1 ring
    v1 = v2[interior1]

    out = []
    for c in range(dim):
        if axes is not None and c not in axes:
            out.append(None)
            continue
        idx = [slice(1, s - 1) for s in v2.shape]
        idx[c] = slice(None)
        g = _slope(v2[tuple(idx)], c, par.gradient)
        if par.scheme == "none":
            out.append((v1 + 0.5 * g, v1 - 0.5 * g))
            continue
        unorm = dt * uc_pad[c] / h
        vp = v1 + jnp.minimum((1.0 - unorm) / 2.0, 0.5) * g
        vm = v1 + jnp.maximum((-1.0 - unorm) / 2.0, -0.5) * g

        # transverse terms (reference: src/advection.c transverse_term:30-47)
        dv = 0.0
        for o in range(dim):
            if o == c:
                continue
            vtan = uc_pad[o]
            idxo = [slice(1, s - 1) for s in v2.shape]
            idxo[o] = slice(None)
            a = v2[tuple(idxo)]
            no = a.shape[o]

            def tko(s0, s1):
                ii = [slice(None)] * a.ndim
                ii[o] = slice(s0, no + s1)
                return a[tuple(ii)]

            diff_up = tko(1, -1) - tko(0, -2)   # v - v[o-1]
            diff_dn = tko(2, 0) - tko(1, -1)    # v[o+1] - v
            gdiff = jnp.where(vtan > 0.0, diff_up,
                              jnp.where(vtan < 0.0, diff_dn, 0.0))
            dv = dv + dt * vtan * gdiff / (2.0 * h)
        vp = vp - dv
        vm = vm - dv
        if src is not None:
            s1 = dt * 0.5 * jnp.pad(src, [(1, 1)] * dim, mode="edge")
            vp = vp + s1
            vm = vm + s1
        out.append((vp, vm))
    return out


def upwind_face_value(vp: jnp.ndarray, vm: jnp.ndarray, un: jnp.ndarray,
                      axis: int) -> jnp.ndarray:
    """Resolve the two-sided face values with the face-normal velocity.

    ``vp``/``vm`` are on the 1-ghost padded cell layout; ``un`` has face
    shape (n+1 along axis, n other axes).  Output: face shape.
    Reference: src/advection.c:267-345 gfs_face_upwinded_value (FTT_FINE_FINE
    branch; fine-coarse faces are an AMR-layer concern).
    """
    n = vp.shape[axis]  # = ncells + 2
    idx_l = [slice(1, s - 1) for s in vp.shape]
    idx_l[axis] = slice(0, n - 1)
    idx_r = list(idx_l)
    idx_r[axis] = slice(1, n)
    left = vp[tuple(idx_l)]
    right = vm[tuple(idx_r)]
    return jnp.where(un > 0.0, left,
                     jnp.where(un < 0.0, right, 0.5 * (left + right)))


def flux_divergence(v_face: list, u_face: list, grid: Grid, dt) -> jnp.ndarray:
    """Conservative update increment: fv = -(dt/h) * sum_axis d(u v)_face.

    Reference: src/advection.c:356-385 gfs_face_advection_flux (flux =
    un*dt*value/h subtracted from the cell, added to the neighbor).
    """
    fv = 0.0
    for axis in range(len(v_face)):
        F = u_face[axis] * v_face[axis]
        n = F.shape[axis]
        hi = [slice(None)] * F.ndim
        hi[axis] = slice(1, n)
        lo = [slice(None)] * F.ndim
        lo[axis] = slice(0, n - 1)
        grid_h = grid.h
        fv = fv - dt * (F[tuple(hi)] - F[tuple(lo)]) / grid_h
    return fv
