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
