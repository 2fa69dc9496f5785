"""Gate: reference test/poisson — Dirichlet Poisson convergence.

Reference problem (test/poisson/poisson.gfs:57-90): solve lap(u) = f on the
unit box centred at the origin with
  f = -pi^2 (k^2+l^2) sin(pi k x) sin(pi l y),  k = l = 3,
Dirichlet BC u = sin(3 pi x) sin(3 pi y) on all sides.  Checks:
  * residual reduction per multigrid cycle ~ 10-15x
    (test/poisson/res-7.ref col 4: 10.5, 8.2, 17.6, ..., asymptote ~15);
  * error norms at level 8: L1 5.430e-05 L2 6.849e-05 Linf 1.693e-04
    (test/poisson/error.ref:6, unbiased);
  * convergence order ~2 in all norms (test/poisson/order.ref).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import poisson
from gerris_tpu.ops.stencils import norms, unbiased_error

K = 3


def exact(x, y, t=0.0):
    return jnp.sin(math.pi * K * x) * jnp.sin(math.pi * K * y)


def rhs_fn(x, y):
    return -(math.pi ** 2) * (K * K + K * K) * jnp.sin(math.pi * K * x) * jnp.sin(math.pi * K * y)


def setup(level):
    grid = Grid(level=level, dim=2)
    x, y = grid.centers
    rhs = rhs_fn(x, y)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(exact), dim=2)
    return grid, rhs, fbc


def solve_level(level, ncycles=10):
    grid, rhs, fbc = setup(level)
    params = poisson.MultilevelParams(nitermin=ncycles, nitermax=ncycles)
    u = jnp.zeros(grid.shape)
    u, stats = poisson.solve(u, rhs, grid, fbc, params)
    return grid, u, stats


def error_norms(grid, u):
    x, y = grid.centers
    e = unbiased_error(u - exact(x, y))
    return norms(e)


def test_residual_reduction_rate():
    """MG reduction factor per cycle matches the reference's ~10-15x."""
    grid, rhs, fbc = setup(8)
    params = poisson.MultilevelParams()
    u = jnp.zeros(grid.shape)
    res = [float(jnp.max(jnp.abs(poisson.residual_jit(u, rhs, grid, fbc))))]
    for _ in range(10):
        u = poisson.cycle_jit(u, rhs, grid, fbc, params)
        res.append(float(jnp.max(jnp.abs(poisson.residual_jit(u, rhs, grid, fbc)))))
    factors = [res[i] / res[i + 1] for i in range(len(res) - 1)]
    avg = (res[0] / res[-1]) ** (1.0 / 10)
    print("reduction factors:", [f"{f:.1f}" for f in factors], "avg", f"{avg:.1f}")
    # reference avg over 10 cycles = (2.623e5/9.698e-7)^(1/10) = 13.9
    assert avg >= 10.0, f"avg reduction {avg}"
    assert res[-1] / res[0] < 1e-10


def test_error_norms_level8():
    grid, u, _ = solve_level(8)
    n = error_norms(grid, u)
    print({k: float(v) for k, v in n.items()})
    # reference: test/poisson/error.ref:6 — 5.430e-05 6.849e-05 1.693e-04
    assert abs(float(n["first"]) - 5.430e-05) / 5.430e-05 < 0.05
    assert abs(float(n["second"]) - 6.849e-05) / 6.849e-05 < 0.05
    assert abs(float(n["infty"]) - 1.693e-04) / 1.693e-04 < 0.05


def test_convergence_order():
    errs = []
    for level in range(3, 9):
        grid, u, _ = solve_level(level)
        n = error_norms(grid, u)
        errs.append((float(n["first"]), float(n["second"]), float(n["infty"])))
    orders = np.log2(np.asarray(errs[:-1]) / np.asarray(errs[1:]))
    print("orders:\n", orders)
    # reference test/poisson/order.ref: ~2.0 in all norms at fine levels
    assert np.all(orders[-3:] > 1.75) and np.all(orders[-3:] < 2.3)


def test_tolerance_loop():
    """Dynamic while-loop solve reaches tolerance and reports stats."""
    grid, rhs, fbc = setup(6)
    params = poisson.MultilevelParams(tolerance=1e-9, nitermin=1, nitermax=50)
    u = jnp.zeros(grid.shape)
    u, stats = poisson.solve(u, rhs, grid, fbc, params)
    assert float(stats.residual_after["infty"]) <= 1e-9 * float(jnp.max(jnp.abs(rhs)))
    assert int(stats.niter) < 15


def test_cg_solver_seam():
    """The pluggable-solver seam (reference: poisson.h:32-51
    par->poisson_solve, swapped by modules/hypre.c): the CG backend
    reaches the same solution as the native multigrid."""
    import jax.numpy as jnp
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.solvers import poisson

    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    exact = jnp.cos(jnp.pi * x) * jnp.cos(jnp.pi * y)
    rhs = -2 * jnp.pi ** 2 * exact
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    u_mg, st_mg = poisson.solve(
        jnp.zeros(grid.shape), rhs, grid, fbc,
        poisson.MultilevelParams(tolerance=1e-10, nitermax=40))
    u_cg, st_cg = poisson.solve(
        jnp.zeros(grid.shape), rhs, grid, fbc,
        poisson.MultilevelParams(tolerance=1e-10, nitermax=40, solver="cg"))
    assert float(st_cg.residual_after["infty"]) <= 1e-10 * float(
        jnp.max(jnp.abs(rhs)))
    assert float(jnp.max(jnp.abs(u_cg - u_mg))) < 1e-8
    # variable-coefficient + pure Neumann (nullspace) path
    a = 1.0 + 0.5 * jnp.cos(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y)
    import gerris_tpu.ops.stencils as st
    pad = bcs.apply_bc(a, grid, bcs.default_scalar_bc(2), 1)
    alpha = tuple(st.face_average(pad, grid, c) for c in range(2))
    nbc = bcs.default_scalar_bc(2)
    rhs2 = rhs - jnp.mean(rhs)
    u2_mg, _ = poisson.solve(jnp.zeros(grid.shape), rhs2, grid, nbc,
                             poisson.MultilevelParams(tolerance=1e-9,
                                                      nitermax=60),
                             alpha=alpha)
    u2_cg, s2 = poisson.solve(jnp.zeros(grid.shape), rhs2, grid, nbc,
                              poisson.MultilevelParams(tolerance=1e-9,
                                                       nitermax=60,
                                                       solver="cg"),
                              alpha=alpha)
    d = (u2_cg - jnp.mean(u2_cg)) - (u2_mg - jnp.mean(u2_mg))
    assert float(jnp.max(jnp.abs(d))) < 1e-6, float(jnp.max(jnp.abs(d)))


def test_mgcg_backend_stiff_alpha():
    """AMG-class backend (solver="mgcg", the GModule hypre/lis/agmg
    seam, modules/hypre.c): on a high-contrast (1e4) variable-alpha
    system the MG-preconditioned flexible CG must reach a tight
    tolerance, and at least as fast as plain multigrid (test/poisson
    res-7.ref cols 5-8 show the Krylov wrapper's robustness edge)."""
    import numpy as np
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.solvers import poisson

    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    rng = np.random.default_rng(7)
    # blobby 4-decade coefficient field, face-averaged
    k = np.exp(4.0 * np.log(10.0) * rng.random((8, 8)))
    kf = np.kron(k, np.ones((8, 8)))
    kf = kf / kf.max()
    alpha = []
    for c in range(2):
        pad = np.pad(kf, [(1, 1) if a == c else (0, 0)
                          for a in range(2)], mode="edge")
        lo = pad[tuple(slice(0, -1) if a == c else slice(None)
                       for a in range(2))]
        hi = pad[tuple(slice(1, None) if a == c else slice(None)
                       for a in range(2))]
        alpha.append(jnp.asarray(2.0 / (1.0 / lo + 1.0 / hi)))
    alpha = tuple(alpha)
    rhs = jnp.sin(3 * jnp.pi * x) * jnp.sin(2 * jnp.pi * y)
    u0 = jnp.zeros(grid.shape)

    p_mg = poisson.MultilevelParams(tolerance=1e-10, nitermax=60)
    p_kr = poisson.MultilevelParams(tolerance=1e-10, nitermax=60,
                                    solver="mgcg")
    u_mg, s_mg = poisson.solve(u0, rhs, grid, fbc, p_mg, alpha=alpha)
    u_kr, s_kr = poisson.solve(u0, rhs, grid, fbc, p_kr, alpha=alpha)
    r_kr = poisson.residual(u_kr, rhs, grid, fbc, alpha=alpha)
    scale = float(jnp.max(jnp.abs(rhs)))
    print(f"stiff alpha: MG niter={int(s_mg.niter)} "
          f"mgcg niter={int(s_kr.niter)} "
          f"rinf={float(jnp.max(jnp.abs(r_kr)))/scale:.2e}")
    assert float(jnp.max(jnp.abs(r_kr))) < 1e-9 * scale
    assert int(s_kr.niter) <= int(s_mg.niter)
    # and the two backends agree on the solution
    d = float(jnp.max(jnp.abs(u_kr - u_mg)))
    assert d < 1e-6 * float(jnp.max(jnp.abs(u_mg)) + 1e-30)
