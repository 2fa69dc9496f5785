"""Composite-grid (AMR) multigrid: SURVEY.md §7 stage 4.

Gates: multigrid convergence on a multi-level mesh (the reference's
adaptive Poisson behavior, test/circle res-7.ref style), and accuracy
between the bracketing uniform resolutions.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import composite as comp
from gerris_tpu.solvers import poisson
from gerris_tpu.ops.stencils import norms, unbiased_error

K = 3


def exact(x, y):
    return jnp.sin(math.pi * K * x) * jnp.sin(math.pi * K * y)


def rhs_fn(x, y):
    return -(math.pi ** 2) * 2 * K * K * exact(x, y)


def make_cg(lmin=5, lmax=7, r=0.25):
    base = Grid(level=lmin, dim=2)
    # refine inside a disk of radius growing with level (nested patches)
    def refine(x, y, l):
        return x * x + y * y < (r * (1.0 + 0.5 * (lmax - 1 - l))) ** 2
    return comp.CompositeGrid.from_refine_fn(base, lmax, refine)


def test_mesh_construction():
    cg = make_cg()
    # partition of the domain: leaf areas sum to the box area
    area = sum(float(jnp.sum(cg.leaf(l))) * cg.grid(l).cell_volume
               for l in range(cg.lmin, cg.lmax + 1))
    assert abs(area - 1.0) < 1e-12
    # finer leaves exist in the center, coarse outside
    assert bool(cg.leaf(cg.lmax)[cg.grid(cg.lmax).n // 2,
                                 cg.grid(cg.lmax).n // 2])
    assert bool(cg.leaf(cg.lmin)[0, 0])
    assert cg.n_leaves() < cg.grid(cg.lmax).n ** 2


def test_composite_mg_convergence():
    """Residual reduction stays multigrid-fast on the composite mesh
    (the reference's adaptive-mesh res-7.ref behavior)."""
    cg = make_cg(5, 7)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(exact), 2)
    rhs = {l: rhs_fn(*cg.grid(l).centers) for l in range(cg.lmin, cg.lmax + 1)}
    params = poisson.MultilevelParams(nitermin=8, nitermax=8, tolerance=0.0)
    u, hist = comp.composite_solve(rhs, cg, fbc, params)
    r0 = max(float(jnp.max(jnp.abs(r))) for r in comp.leaf_residual(
        comp.sync({l: jnp.zeros_like(u[l]) for l in u}, cg, fbc),
        rhs, cg, fbc).values())
    avg = (r0 / hist[-1]) ** (1.0 / len(hist))
    print("composite reductions:", [f"{a:.1e}" for a in hist], "avg", avg)
    assert avg > 5.0
    assert hist[-1] < 1e-6 * r0


def test_composite_accuracy_brackets_uniform():
    """Error of the composite solution on the refined region matches the
    FINE uniform solution; total error is between the uniform brackets."""
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(exact), 2)

    def uniform_err(level):
        g = Grid(level=level, dim=2)
        rhs = rhs_fn(*g.centers)
        params = poisson.MultilevelParams(nitermin=10, nitermax=10)
        u, _ = poisson.solve(jnp.zeros(g.shape), rhs, g, fbc, params)
        return float(jnp.max(jnp.abs(u - exact(*g.centers))))

    e5 = uniform_err(5)
    e7 = uniform_err(7)

    cg = make_cg(5, 7, r=0.3)
    rhs = {l: rhs_fn(*cg.grid(l).centers) for l in range(cg.lmin, cg.lmax + 1)}
    params = poisson.MultilevelParams(nitermin=10, nitermax=10, tolerance=0.0)
    u, _ = comp.composite_solve(rhs, cg, fbc, params)
    errs = {}
    for l in range(cg.lmin, cg.lmax + 1):
        e = jnp.abs(u[l] - exact(*cg.grid(l).centers))
        errs[l] = float(jnp.max(jnp.where(cg.leaf(l), e, 0.0)))
    print(f"uniform5 {e5:.2e} uniform7 {e7:.2e} composite {errs}")
    # the composite error is bounded by the coarse uniform error and the
    # fine-region error approaches the fine uniform error
    assert max(errs.values()) < 1.5 * e5
    assert errs[cg.lmax] < 5 * e7
