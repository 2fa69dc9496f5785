"""Adaptation criteria and the adapt step.

TPU-native rebuild of the reference's dynamic AMR layer
(reference: src/adaptive.c — GfsAdapt hierarchy adaptive.h:38-181 with
cost callbacks gradient_cost:545 / cost_error:594 (Richardson),
GfsAdaptVorticity, GfsAdaptFunction; the adapt driver
gfs_simulation_adapt:1445 marking refinable/coarsenable cells against
cmax with cfactor hysteresis and re-shaping the mesh :998).

Here a criterion is a cost field on the finest uniform resolution; the
adapt step turns it into a CompositeGrid (solvers/composite.py) through
the same threshold logic: refine where cost > cmax, coarsen (use a
coarser leaf) where cost < cmax / cfactor, hysteresis in between,
grading enforced by the composite mesh builder.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from ..solvers.composite import CompositeGrid


@dataclasses.dataclass(frozen=True)
class AdaptParams:
    """Reference: GfsAdapt parameters (cmax, cfactor hysteresis, level
    bounds; adaptive.h:38-80)."""
    cmax: float
    cfactor: float = 4.0
    minlevel: int = 4
    maxlevel: int = 8


def gradient_cost(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC) -> jnp.ndarray:
    """|grad f| h — the GfsAdaptGradient cost (adaptive.c:545: norm of the
    gradient times cell size)."""
    p = bcs.apply_bc(f, grid, fbc, 1)
    gx = (p[2:, 1:-1] - p[:-2, 1:-1]) / 2.0
    gy = (p[1:-1, 2:] - p[1:-1, :-2]) / 2.0
    return jnp.sqrt(gx * gx + gy * gy)


def vorticity_cost(U: list, grid: Grid, u_bcs: list) -> jnp.ndarray:
    """|vorticity| h^2 / |u|max — GfsAdaptVorticity (adaptive.h:98)."""
    from .particles import vorticity_field

    w = vorticity_field(U, grid, u_bcs)
    umax = jnp.maximum(jnp.max(jnp.sqrt(sum(u * u for u in U))), 1e-300)
    return jnp.abs(w) * grid.h / umax


def interface_cost(f: jnp.ndarray) -> jnp.ndarray:
    """1 at interface cells (the AdaptFunction used by test/oscillation:
    'T > 0 && T < 1 ? 1 : ...')."""
    return ((f > 1e-6) & (f < 1.0 - 1e-6)).astype(f.dtype)


def adapt_mesh(cost_fine: jnp.ndarray, base: Grid, params: AdaptParams,
               previous: Optional[CompositeGrid] = None) -> CompositeGrid:
    """Build the adapted composite mesh from a cost field sampled at the
    finest resolution.

    Refinement indicator per level l: a level-l cell wants children while
    the max cost under it exceeds cmax (cells below cmax / cfactor are
    left to coarser levels — the reference's hysteresis keeps cells whose
    cost sits in between at their current level; with a fresh mesh build
    the hysteresis band collapses to the cmax threshold unless a previous
    mesh is given).
    Reference: adapt_local / refine_cell_mark, adaptive.c:1351-1449.
    """
    cost = np.asarray(cost_fine)
    nfx, nfy = cost.shape
    keep = None
    if previous is not None:
        # hysteresis: cells already refined stay refined unless below
        # cmax / cfactor
        keep = np.zeros_like(cost, bool)
        for l in range(previous.lmin, previous.lmax + 1):
            if l <= params.minlevel:
                continue
            rep = nfx // previous.grid(l).shape[0]
            leaf = np.asarray(previous.leaf(l))
            keep |= leaf.repeat(rep, 0).repeat(rep, 1)

    def refine(x, y, l):
        g = dataclasses.replace(base, level=l)
        rep = nfx // g.shape[0]
        m = cost.reshape(g.shape[0], rep, g.shape[1], rep).max(axis=(1, 3))
        want = m > params.cmax
        if keep is not None:
            kl = keep.reshape(g.shape[0], rep, g.shape[1], rep).any(axis=(1, 3))
            want |= kl & (m > params.cmax / params.cfactor)
        return want

    b = dataclasses.replace(base, level=params.minlevel)
    return CompositeGrid.from_refine_fn(b, params.maxlevel, refine)


def resample(u: dict, old: CompositeGrid, new: CompositeGrid,
             fbc: bcs.FieldBC) -> dict:
    """Carry a composite solution onto a new mesh: sync the old mesh, copy
    per-level arrays (same dense shapes), and let the new mesh's sync fill
    the re-rolled cells — the refine/coarsen cell init
    (gfs_cell_fine_init via coarse_fine, src/variable.h:46)."""
    from ..solvers import composite as comp

    u = comp.sync(u, old, fbc)
    out = {}
    for l in range(new.lmin, new.lmax + 1):
        if l in u:
            out[l] = u[l]
        else:
            # level did not exist: prolong from the coarser neighbour level
            src = max(k for k in u if k < l)
            v = u[src]
            g = dataclasses.replace(new.base, level=src)
            from ..solvers import poisson
            for ll in range(src, l):
                v = poisson.prolong(v, dataclasses.replace(new.base,
                                                           level=ll), fbc,
                                    homogeneous=False)
            out[l] = v
    return comp.sync(out, new, fbc)
