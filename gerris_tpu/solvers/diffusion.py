"""Implicit (Crank-Nicolson / backward-Euler) diffusion via multigrid.

TPU-native rebuild of the reference's diffusion solver
(reference: src/poisson.c — gfs_diffusion_coefficients:1280-1399 (face
coefficient = beta*dt*D_face), gfs_diffusion_rhs:1401-1467
(rhs = u_old + ((1-beta)/beta) * div-part), gfs_diffusion_cycle; driver
gfs_diffusion src/timestep.c:720-790 and variable_diffusion
src/timestep.c:928-957).

Solves  rho u - beta dt div(D grad u) = rho u_old + (1-beta) dt div(D grad u_old)
as the multigrid operator  div((beta dt D) grad u) - rho u = -rho rhs.
beta = 0.5 is Crank-Nicolson, 1.0 backward Euler (reference default beta=1
read from SourceDiffusion params; GfsSourceDiffusion par.beta).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..ops.stencils import laplacian
from . import poisson


def diffuse(v: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, dt,
            D, rho=1.0, beta: float = 0.5,
            params: poisson.MultilevelParams = None,
            extra_rhs=None, t: float = 0.0):
    """One implicit diffusion solve for ``v``.

    ``D``: scalar diffusivity or per-axis face arrays.
    ``rho``: scalar or cell array (the reference's rhoc mass coefficient,
    density for velocity diffusion).
    ``extra_rhs``: optional additive right-hand side (advection fluxes are
    already folded into ``v`` by the caller, matching variable_sources ->
    variable_diffusion ordering in src/timestep.c:1003-1012).

    Returns (v_new, stats).
    """
    if params is None:
        # reference default GfsMultilevelParams tolerance = 1e-3
        # (src/poisson.c:40-126); the Crank-Nicolson system is
        # identity-dominated, 1-2 cycles reach it
        params = poisson.MultilevelParams(tolerance=1e-3, nitermax=10)
    dim = grid.dim
    # NOTE: D may be a tuple/list of traced per-axis face arrays —
    # jnp.ndim on such a container np.asarray's it (TracerArrayConversion
    # under jit); test isinstance first
    d_scalar = not isinstance(D, (tuple, list)) and jnp.ndim(D) == 0
    scalar_system = d_scalar and jnp.ndim(rho) == 0
    if d_scalar:
        alpha = tuple(jnp.full(grid.face_shape(c), D, dtype=v.dtype)
                      for c in range(dim))
    else:
        alpha = tuple(D)
    alpha_imp = tuple(beta * dt * a for a in alpha)

    rho_c = rho if scalar_system else \
        jnp.broadcast_to(jnp.asarray(rho, v.dtype), grid.shape)

    rhs = rho_c * v
    if beta < 1.0:
        v_pad = bcs.apply_bc(v, grid, fbc, 1, t=t, corners=False)
        rhs = rhs + (1.0 - beta) * dt * laplacian(v_pad, grid, alpha)
    if extra_rhs is not None:
        rhs = rhs + extra_rhs

    if scalar_system:
        # divide through by beta*dt*D: lap u - (rho/(beta dt D)) u = rhs'.
        # Unit face coefficients + scalar dia keep the fused Pallas
        # smoother eligible on TPU (ops/pallas/rbgs.py).
        scale = beta * dt * D
        v_new, stats = poisson.solve(v, -rhs / scale, grid, fbc, params,
                                     alpha=None, dia=rho / scale, t=t)
        return v_new, stats

    v_new, stats = poisson.solve(v, -rhs, grid, fbc, params,
                                 alpha=alpha_imp, dia=rho_c, t=t)
    return v_new, stats


def diffuse_pair(vs, grid: Grid, fbcs, dt, D, beta: float,
                 params: poisson.MultilevelParams, extra_rhss=None,
                 rhss=None, rr_pre=None, t: float = 0.0):
    """The U+V scalar implicit-diffusion systems solved together.

    On the fixed-cycle TPU path both Helmholtz systems ride ONE batched
    fused-cycle launch chain (3 kernels/cycle total instead of 3 per
    component); otherwise falls back to two sequential ``diffuse``
    calls.  Scalar D, unit rho (the constant-density velocity pair).
    Either ``extra_rhss`` (momentum increments; the rhs is built here)
    or ``rhss`` (the pre-built -dia*(v + extra) system rhs, e.g. from
    the advection kernel's oscale fold) must be given — or ``rr_pre``
    (the first cycle's (r0s, r1s, r2s) from the advection kernel's rr
    fold; requires ncycles == 1 since later cycles would need rhss).
    Returns ([v_new...], stats)."""
    scale = beta * dt * D
    dia = 1.0 / scale
    n = len(vs)
    if rr_pre is not None:
        assert params is not None and params.ncycles == 1 \
            and params.solver != "relax"
        return poisson.solve_fixed_batched(vs, None, grid, fbcs, params,
                                           [dia] * n, rr_pre=rr_pre)
    if (params is not None and params.ncycles > 0
            and poisson.batched_fixed_eligible(vs, grid, fbcs,
                                               [dia] * n)):
        if rhss is None:
            rhss = [-(vs[c] + extra_rhss[c]) * dia for c in range(n)]
        if params.solver == "relax":
            return poisson.solve_relax_pair(vs, rhss, grid, fbcs,
                                            params, [dia] * n)
        return poisson.solve_fixed_batched(vs, rhss, grid, fbcs, params,
                                           [dia] * n)
    if extra_rhss is None:
        extra_rhss = [-rhss[c] * scale - vs[c] for c in range(n)]
    outs = []
    stats = None
    for c in range(n):
        v_new, stats = diffuse(vs[c], grid, fbcs[c], dt, D, beta=beta,
                               params=params, extra_rhs=extra_rhss[c],
                               t=t)
        outs.append(v_new)
    return outs, stats
