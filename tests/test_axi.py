"""Gates: axisymmetric metric (GfsAxi, reference src/simulation.c GfsAxi
class + src/metric.c metric hooks).  y is the radial coordinate.

1. Axisymmetric Poisson: div(r grad u)/r = f with manufactured solution —
   second-order convergence (the metric enters the same face-coefficient
   machinery as solids).
2. Axisymmetric Poiseuille pipe flow: body-force-driven steady profile
   u(r) = G (R^2 - r^2)/(4 nu) (the test/poiseuille class, axi variant).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.solvers import poisson


def test_axi_poisson_order():
    """u = (1 - r^2)^2 on r in [0,1]: div(r du/dr)/r = (1/r)(r u')' =
    8(2 r^2 - 1) (no z dependence); Neumann at the axis, Dirichlet 0 at
    r = 1."""
    def exact(r):
        return (1.0 - r * r) ** 2

    def rhsf(r):
        return 8.0 * (2.0 * r * r - 1.0)

    errs = []
    for lvl in (4, 5, 6):
        g = Grid(level=lvl, dim=2, origin=(-0.5, 0.0))
        x, y = g.centers
        yf = jnp.asarray(g.axis_faces(1))[None, :]
        yc = jnp.asarray(g.axis_centers(1))[None, :]
        fmx = jnp.broadcast_to(yc, g.face_shape(0))
        fmy = jnp.broadcast_to(yf, g.face_shape(1))
        fbc = bcs.FieldBC(((bcs.Neumann(), bcs.Neumann()),
                           (bcs.Neumann(), bcs.Dirichlet(0.0))))
        rhs = jnp.broadcast_to(yc, g.shape) * rhsf(y)   # cm-scaled rhs
        u, stats = poisson.solve(jnp.zeros(g.shape), rhs, g, fbc,
                                 poisson.MultilevelParams(nitermin=10,
                                                          nitermax=10),
                                 alpha=(fmx, fmy))
        errs.append(float(jnp.max(jnp.abs(u - exact(y)))))
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    print("axi poisson errors:", errs, "orders:", orders)
    assert orders[-1] > 1.8
    assert errs[-1] < 3e-4


@pytest.mark.slow
def test_axi_poiseuille():
    """Pipe flow driven by a constant axial body force G: steady profile
    u(r) = G (1 - r^2)/(4 nu) with R = 1 (radius = the y extent)."""
    level = 5
    G, NU = 1.0, 0.5
    grid = Grid(level=level, dim=2, origin=(-0.5, 0.0))
    # x periodic; y: symmetry at the axis, no-slip at the pipe wall
    ubc = bcs.FieldBC(((bcs.Periodic(), bcs.Periodic()),
                       (bcs.Neumann(), bcs.Dirichlet(0.0))))
    vbc = bcs.FieldBC(((bcs.Periodic(), bcs.Periodic()),
                       (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0))))
    cfg = ns.NSConfig(
        grid=grid, u_bcs=(ubc, vbc), nu=NU, beta=1.0, axi=True,
        body_force=(G, None),
        advection=ns.adv.AdvectionParams(scheme="none"),
        projection=poisson.MultilevelParams(tolerance=1e-8, nitermax=100),
        approx_projection=poisson.MultilevelParams(tolerance=1e-8,
                                                   nitermax=100),
        diffusion_params=poisson.MultilevelParams(tolerance=1e-8,
                                                  nitermax=30))
    sim = Simulation(cfg, time=Time(iend=400, dtmax=2e-2)).init()
    prev = None
    for _ in range(400):
        sim.run(max_steps=1)
        if prev is not None and \
                float(jnp.max(jnp.abs(sim.state["U"] - prev))) < 1e-7:
            break
        prev = sim.state["U"]
    y = jnp.asarray(grid.axis_centers(1))
    prof = np.asarray(sim.state["U"]).mean(axis=0)
    exact = np.asarray(G * (1.0 - y * y) / (4.0 * NU))
    err = np.abs(prof - exact)
    print("profile:", np.round(prof[::4], 4))
    print("exact:  ", np.round(exact[::4], 4))
    print(f"Linf={err.max():.4f} (umax={exact.max():.3f}) steps={sim.time.i}")
    assert err.max() < 0.01 * exact.max()
    # V stays at solver-tolerance level
    assert float(jnp.max(jnp.abs(sim.state["V"]))) < 1e-6
