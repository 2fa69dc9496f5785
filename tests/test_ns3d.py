"""3D Navier-Stokes validation (the reference compiles the same source as
gerris3D, src/ftt.h:34-38; here the solvers are dimension-generic).

Taylor-Green-like 3D decaying field:
  u =  cos(2 pi x) sin(2 pi y) sin(2 pi z) decays with known viscous rate
for the divergence-free 3D mode set below.
"""
import math

import jax.numpy as jnp
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time

NU = 0.02
K = 2 * math.pi


def fields(grid):
    x, y, z = grid.centers
    # classical 3D Taylor-Green initial condition (div-free)
    u = jnp.cos(K * x) * jnp.sin(K * y) * jnp.sin(K * z)
    v = -0.5 * jnp.sin(K * x) * jnp.cos(K * y) * jnp.sin(K * z)
    w = -0.5 * jnp.sin(K * x) * jnp.sin(K * y) * jnp.cos(K * z)
    return u, v, w


def test_3d_step_runs_and_decays():
    grid = Grid(level=4, dim=3, origin=(-0.5, -0.5, -0.5))
    per = bcs.periodic_bc(3)
    cfg = ns.NSConfig(grid=grid, u_bcs=(per, per, per), nu=NU, beta=0.5)
    u, v, w = fields(grid)
    sim = Simulation(cfg, time=Time(end=0.05, dtmax=0.5 * grid.h))
    sim.init(U=u, V=v, W=w)
    ke0 = float(jnp.mean(sim.state["U"]**2 + sim.state["V"]**2 +
                         sim.state["W"]**2))
    sim.run()
    ke1 = float(jnp.mean(sim.state["U"]**2 + sim.state["V"]**2 +
                         sim.state["W"]**2))
    assert ke1 < ke0                      # viscous decay
    assert ke1 > 0.3 * ke0                # but not blown up / overdamped
    for n in ("U", "V", "W", "P"):
        assert bool(jnp.all(jnp.isfinite(sim.state[n])))
    # each component is a triple-product mode: laplacian eigenvalue 3K^2,
    # so KE ~ exp(-2 * 3 K^2 nu t) at early times
    rate = -math.log(ke1 / ke0) / sim.time.t
    expect = 6 * K * K * NU
    assert abs(rate - expect) / expect < 0.05


def test_solid_fractions_3d_sphere():
    """3D embedded-solid fractions: sphere volume to O(h^2) and exact
    divergence consistency sum(div(s)) over the closed surface."""
    import jax.numpy as jnp
    import numpy as np
    import math
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.physics.solid import solid_fractions

    grid = Grid(level=5, dim=3)
    R = 0.3
    phi = lambda x, y, z, t=0.0: R - jnp.sqrt(x**2 + y**2 + z**2)  # fluid inside
    a, (sx, sy, sz) = solid_fractions(grid, phi)
    vol = float(jnp.sum(a)) * grid.h ** 3
    exact = 4.0 / 3.0 * math.pi * R ** 3
    assert abs(vol - exact) / exact < 1e-2, vol
    # face-fraction sanity: interior faces fully fluid, exterior zero
    assert float(sx[16, 16, 16]) == 1.0
    assert float(sx[0, 0, 0]) == 0.0
    # mixed cells have fractional faces
    assert bool(jnp.any((sx > 0.0) & (sx < 1.0)))


def test_poisson_solid_3d_sphere():
    """3D cut-cell Neumann Poisson in a spherical fluid region converges
    (the 3D analogue of test/circle)."""
    import jax.numpy as jnp
    import numpy as np
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.physics.solid import poisson_solid_solve
    from gerris_tpu.solvers import poisson

    R = 0.4
    phi = lambda x, y, z, t=0.0: R - jnp.sqrt(x**2 + y**2 + z**2)
    errs = []
    for level in (3, 4):
        grid = Grid(level=level, dim=3)
        x, y, z = grid.centers
        r2 = x**2 + y**2 + z**2
        # manufactured: u = r^2 -> lap u = 6, du/dr = 2r on the sphere
        # (NOT natural-Neumann compatible) -> use u with du/dr|_R = 0:
        # u = cos(pi r^2 / (2 R^2)): du/dr = -pi r/R^2 sin(.) != 0...
        # simplest: compare two resolutions (Richardson) of the same
        # compatible problem: f = x (odd, zero mean over the sphere)
        rhs = x
        fbc = bcs.default_scalar_bc(3)
        u, st, a, s = poisson_solid_solve(
            rhs, grid, phi, fbc,
            poisson.MultilevelParams(tolerance=1e-10, nitermax=60))
        assert float(st.residual_after["infty"]) < 1e-8 * float(
            jnp.max(jnp.abs(rhs)))
        errs.append(u)
    # Richardson: coarse vs restricted fine agree to O(h^2)-ish
    fine = errs[1]
    coarse = errs[0]
    fine_r = fine.reshape(8, 2, 8, 2, 8, 2).mean(axis=(1, 3, 5))
    a3, _ = __import__("gerris_tpu.physics.solid",
                       fromlist=["solid_fractions"]).solid_fractions(
        Grid(level=3, dim=3), phi)
    m = np.asarray(a3) > 0.99
    d = np.asarray(fine_r - coarse)
    d = d - d[m].mean()
    assert np.abs(d[m]).max() < 0.01, np.abs(d[m]).max()
