"""Gates: embedded solid boundaries with Dirichlet conditions.

1. Poisson with Dirichlet value on an embedded circle — the
   test/dirichlet class (relax_dirichlet, src/poisson.c:561-586):
   second-order convergence of the max error.
2. NS in a cylindrical Couette annulus — reference test/couette
   (couette.gfs: Solid annulus 0.25 < r < 0.5, inner cylinder rotating
   with u = (-y, x), Newtonian MODEL 0): steady tangential-velocity
   profile vs the analytic solution r ((0.5/r)^2 - 1)/((0.5/0.25)^2 - 1).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.physics import solid
from gerris_tpu.solvers import poisson


def test_dirichlet_poisson_order():
    K = 2
    R = 0.25

    def exact(x, y):
        return jnp.sin(math.pi * K * x) * jnp.sin(math.pi * K * y)

    def rhsf(x, y):
        return -(math.pi ** 2) * 2 * K * K * exact(x, y)

    def phi(x, y):
        return x * x + y * y - R * R       # fluid outside the circle

    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(exact), 2)
    errs = []
    for lvl in (5, 6, 7):
        g = Grid(level=lvl, dim=2)
        u, stats, a, s = solid.poisson_dirichlet_solve(
            rhsf(*g.centers), g, phi, exact, fbc,
            poisson.MultilevelParams(nitermin=10, nitermax=10))
        e = jnp.abs(u - exact(*g.centers))
        errs.append(float(jnp.max(jnp.where(a > 0.5, e, 0.0))))
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    print("dirichlet errors:", errs, "orders:", orders)
    assert errs[-1] < 2e-3
    assert orders[-1] > 1.6                # second-order boundary scheme


R_IN, R_OUT = 0.25, 0.49998


def couette_exact(r):
    return r * ((0.5 / r) ** 2 - 1.0) / ((0.5 / 0.25) ** 2 - 1.0)


@pytest.mark.slow
def test_couette_profile():
    level = 6
    grid = Grid(level=level, dim=2)

    def phi(x, y):
        r2 = x * x + y * y
        return jnp.minimum(R_OUT ** 2 - r2, r2 - R_IN ** 2)

    mid2 = 0.375 ** 2

    def us_u(x, y):
        return jnp.where(x * x + y * y > mid2, 0.0, -y)

    def us_v(x, y):
        return jnp.where(x * x + y * y > mid2, 0.0, x)

    cfg = ns.NSConfig(
        grid=grid, u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
        nu=1.0, beta=1.0, solid_phi=phi, surface_u=(us_u, us_v),
        advection=ns.adv.AdvectionParams(scheme="none"),
        approx_projection=poisson.MultilevelParams(tolerance=1e-6,
                                                   nitermax=100),
        projection=poisson.MultilevelParams(tolerance=1e-6, nitermax=100),
        diffusion_params=poisson.MultilevelParams(tolerance=1e-6,
                                                  nitermax=30))
    sim = Simulation(cfg, time=Time(iend=100, dtmax=1e-2)).init()
    prev = None
    for k in range(100):
        sim.run(max_steps=1)
        U = sim.state["U"]
        if prev is not None:
            du = float(jnp.max(jnp.abs(U - prev)))
            if du < 1e-5:
                break
        prev = U
    # tangential velocity profile on the x axis: u_theta(r) = V(r, 0)
    rs = np.linspace(0.27, 0.47, 11)
    vt = np.array([sim.interpolate("V", (r, 0.0)) for r in rs])
    ex = couette_exact(rs)
    err = np.abs(vt - ex)
    print("r:", rs)
    print("v_theta:", vt)
    print("exact:  ", ex)
    print(f"Linf={err.max():.4f} L2={np.sqrt((err**2).mean()):.4f} "
          f"steps={sim.time.i}")
    assert err.max() < 0.012               # profile max is 0.25
    assert np.sqrt((err ** 2).mean()) < 6e-3
