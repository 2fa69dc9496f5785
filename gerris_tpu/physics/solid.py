"""Embedded solid boundaries (cut cells).

TPU-native rebuild of the reference's solid-fraction machinery
(reference: src/solid.c — 2D fraction marching gfs_set_2D_solid_fractions
_from_surface:213-272, full init driver gfs_domain_init_solid_fractions
:970, face/volume fractions in GfsSolidVector src/fluid.h:54-59; mixed-cell
Poisson coefficients src/poisson.c:756-901 where the face coefficient is
the fluid face fraction).

Here fractions come from a level set phi (fluid = {phi > 0}) sampled at
cell vertices: cell volume fractions via the PLIC linearization
(physics/vof.py fraction_from_levelset) and face fractions via the exact
1D cut of each face between its two vertices.  The cut-cell Poisson
operator is then just the existing face-coefficient multigrid with
alpha = face fractions and rhs weighted by the volume fraction
(the natural no-flux/Neumann condition on the solid surface —
the reference's default, test/circle).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from . import vof


def _vertex_values(grid: Grid, phi):
    ax = np.asarray(grid.axis_faces(0))
    ay = np.asarray(grid.axis_faces(1))
    X, Y = np.meshgrid(ax, ay, indexing="ij")
    return phi(jnp.asarray(X), jnp.asarray(Y))


def _edge_fraction(p0, p1):
    """Fluid fraction of a 1D edge with vertex level-set values p0, p1."""
    both_pos = (p0 > 0) & (p1 > 0)
    both_neg = (p0 <= 0) & (p1 <= 0)
    # crossing: fluid portion = |positive value| / |difference|
    frac = jnp.abs(jnp.maximum(p0, p1)) / jnp.maximum(jnp.abs(p0 - p1), 1e-300)
    return jnp.where(both_pos, 1.0, jnp.where(both_neg, 0.0,
                                              jnp.clip(frac, 0.0, 1.0)))


def solid_fractions(grid: Grid, phi):
    """(volume_fraction a, (face fractions sx, sy)) for fluid {phi > 0}.

    Reference: gfs_domain_init_solid_fractions (src/solid.c:970); face
    fractions are the 1D cuts of cell faces (solid.c:213-272)."""
    assert grid.dim == 2
    pv = _vertex_values(grid, phi)
    a = vof.fraction_from_levelset(grid, phi)
    # x-faces (normal x): the face at x_i spans y in [y_j, y_j+1]:
    # vertices (i, j) and (i, j+1)
    sx = _edge_fraction(pv[:, :-1], pv[:, 1:])
    # y-faces: vertices (i, j) and (i+1, j)
    sy = _edge_fraction(pv[:-1, :], pv[1:, :])
    return a, (sx, sy)


def poisson_solid_solve(rhs_pointwise, grid: Grid, phi, fbc, params,
                        u0=None):
    """Poisson solve in the fluid region outside/inside an embedded solid
    with the natural Neumann condition on the solid surface.

    Solves div(s grad u) = a * f with the pure-Neumann compatibility mean
    removed (reference: GfsPoisson poisson_run src/simulation.c:2213-2310
    with correct_div:2156-2186).  Returns (u, stats, a, s).
    """
    from ..solvers import poisson

    a, s = solid_fractions(grid, phi)
    rhs = a * rhs_pointwise
    w = jnp.sum(a)
    rhs = rhs - a * (jnp.sum(rhs) / jnp.maximum(w, 1e-300))
    u = jnp.zeros(grid.shape, rhs.dtype) if u0 is None else u0
    u, stats = poisson.solve(u, rhs, grid, fbc, params, alpha=s)
    return u, stats, a, s
