"""Dynamic adaptation criteria + adapt step (reference: src/adaptive.c
GfsAdapt*, gfs_simulation_adapt).  Gate: a gradient-adapted mesh reaches
near-fine accuracy at a fraction of the fine cell count (the point of AMR,
SURVEY.md §5 'scaling axes')."""
import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.physics import adapt
from gerris_tpu.solvers import composite as comp
from gerris_tpu.solvers import poisson


def exact(x, y):
    # sharp Gaussian bump: large gradients concentrated near the centre
    return jnp.exp(-((x - 0.1) ** 2 + (y - 0.1) ** 2) / (2 * 0.05 ** 2))


def rhs_of(x, y):
    s2 = 0.05 ** 2
    r2 = (x - 0.1) ** 2 + (y - 0.1) ** 2
    return exact(x, y) * (r2 - 2 * s2) / (s2 * s2)


def test_gradient_adapt_poisson():
    lmin, lmax = 5, 7
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(exact), 2)
    fine = Grid(level=lmax, dim=2)
    xf, yf = fine.centers

    # criterion from the exact solution's gradient at the fine resolution
    cost = adapt.gradient_cost(exact(xf, yf), fine, fbc)
    params = adapt.AdaptParams(cmax=0.01, minlevel=lmin, maxlevel=lmax)
    cg = adapt.adapt_mesh(cost, Grid(level=lmin, dim=2), params)

    assert cg.n_leaves() < 0.5 * fine.n ** 2      # real savings
    # solve on the adapted mesh
    rhs = {l: rhs_of(*cg.grid(l).centers) for l in range(cg.lmin, cg.lmax + 1)}
    u, hist = comp.composite_solve(
        rhs, cg, fbc, poisson.MultilevelParams(nitermin=10, nitermax=10,
                                               tolerance=0.0))
    # error in the refined (high-gradient) region matches the fine uniform
    uni, _ = poisson.solve(jnp.zeros(fine.shape), rhs_of(xf, yf), fine, fbc,
                           poisson.MultilevelParams(nitermin=10, nitermax=10))
    e_uni = float(jnp.max(jnp.abs(uni - exact(xf, yf))))
    e_fine_region = float(jnp.max(jnp.where(
        cg.leaf(lmax), jnp.abs(u[lmax] - exact(*cg.grid(lmax).centers)), 0.0)))
    print(f"adapted leaves {cg.n_leaves()} / uniform {fine.n**2}; "
          f"err fine-region {e_fine_region:.2e} vs uniform {e_uni:.2e}")
    assert e_fine_region < 5 * e_uni


def test_hysteresis_keeps_cells():
    lmin, lmax = 4, 6
    fine = Grid(level=lmax, dim=2)
    xf, yf = fine.centers
    fbc = bcs.default_scalar_bc(2)
    cost = adapt.gradient_cost(exact(xf, yf), fine, fbc)
    params = adapt.AdaptParams(cmax=0.01, cfactor=4.0,
                               minlevel=lmin, maxlevel=lmax)
    cg1 = adapt.adapt_mesh(cost, Grid(level=lmin, dim=2), params)
    # weaker cost on re-adapt: hysteresis keeps previously refined cells
    # whose cost is within cmax/cfactor
    cg2 = adapt.adapt_mesh(cost * 0.5, Grid(level=lmin, dim=2), params,
                           previous=cg1)
    cg3 = adapt.adapt_mesh(cost * 0.5, Grid(level=lmin, dim=2), params)
    assert cg2.n_leaves() >= cg3.n_leaves()


def test_resample_roundtrip():
    lmin, lmax = 4, 6
    fbc = bcs.default_scalar_bc(2)
    fine = Grid(level=lmax, dim=2)
    xf, yf = fine.centers
    cost = adapt.gradient_cost(exact(xf, yf), fine, fbc)
    params = adapt.AdaptParams(cmax=0.02, minlevel=lmin, maxlevel=lmax)
    cg1 = adapt.adapt_mesh(cost, Grid(level=lmin, dim=2), params)
    cg2 = adapt.adapt_mesh(cost, Grid(level=lmin, dim=2), params,
                           previous=cg1)
    u1 = {l: exact(*cg1.grid(l).centers) for l in range(lmin, lmax + 1)}
    u2 = adapt.resample(u1, cg1, cg2, fbc)
    # leaves of the new mesh carry the field accurately
    for l in range(lmin, lmax + 1):
        e = jnp.where(cg2.leaf(l),
                      jnp.abs(u2[l] - exact(*cg2.grid(l).centers)), 0.0)
        assert float(jnp.max(e)) < 0.05
