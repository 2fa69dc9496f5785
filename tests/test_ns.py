"""Navier-Stokes core validation.

1. Taylor-Green vortex (periodic, viscous): analytic solution
   u = -cos(2 pi x) sin(2 pi y) exp(-8 pi^2 nu t)  (+ v counterpart);
   second-order accuracy check of the full BCG + projection + CN-diffusion
   step.  (The reference validates the same machinery end-to-end through
   test/lid & friends, SURVEY.md §4.)
2. Inviscid divergence: projection keeps the field divergence-free.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.ops.stencils import divergence
from gerris_tpu.solvers import poisson


NU = 0.01


def tg_u(x, y, t, nu=NU):
    return -jnp.cos(2 * math.pi * x) * jnp.sin(2 * math.pi * y) * \
        math.exp(-8 * math.pi ** 2 * nu * t)


def tg_v(x, y, t, nu=NU):
    return jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y) * \
        math.exp(-8 * math.pi ** 2 * nu * t)


def make_cfg(level, nu=NU, beta=0.5):
    grid = Grid(level=level, dim=2)
    per = bcs.periodic_bc(2)
    return ns.NSConfig(
        grid=grid,
        u_bcs=(per, per),
        nu=nu,
        beta=beta,
        projection=poisson.MultilevelParams(tolerance=1e-9, nitermax=50),
        approx_projection=poisson.MultilevelParams(tolerance=1e-9, nitermax=50),
    )


def run_tg(level, t_end=0.25):
    cfg = make_cfg(level)
    x, y = cfg.grid.centers
    sim = Simulation(cfg, time=Time(end=t_end, dtmax=0.5 * cfg.grid.h))
    sim.init(U=tg_u(x, y, 0.0), V=tg_v(x, y, 0.0))
    sim.run()
    ue = tg_u(x, y, sim.time.t)
    ve = tg_v(x, y, sim.time.t)
    err = float(jnp.max(jnp.abs(sim.state["U"] - ue)) +
                jnp.max(jnp.abs(sim.state["V"] - ve)))
    return sim, err


def test_taylor_green_accuracy_and_order():
    _, e4 = run_tg(4)
    _, e5 = run_tg(5)
    order = math.log2(e4 / e5)
    print(f"TG errors: L4={e4:.3e} L5={e5:.3e} order={order:.2f}")
    assert e5 < 2e-2
    assert order > 1.5


def test_divergence_free():
    """The MAC projection's output face field is div-free to tolerance
    (the centred field is only approximately projected, by design —
    reference: gfs_approximate_projection doc, src/timestep.c:541-556)."""
    sim, _ = run_tg(4, t_end=0.1)
    cfg = sim.cfg
    from gerris_tpu.solvers.projection import (face_interpolated_velocity,
                                               mac_projection)
    U = [sim.state["U"], sim.state["V"]]
    uf = face_interpolated_velocity(U, cfg.grid, list(cfg.u_bcs))
    div0 = float(jnp.max(jnp.abs(divergence(uf, cfg.grid))))
    uf2, _, _, _ = mac_projection(uf, sim.state["P"], cfg.grid, cfg.p_bc,
                                  sim.dt, cfg.approx_projection)
    div1 = float(jnp.max(jnp.abs(divergence(uf2, cfg.grid))))
    print(f"div before {div0:.2e} after {div1:.2e}")
    assert div1 < 1e-7 * div0


def test_energy_decay_rate():
    """Kinetic energy decays as exp(-16 pi^2 nu t)."""
    sim, _ = run_tg(5, t_end=0.2)
    x, y = sim.cfg.grid.centers
    ke = float(jnp.mean(sim.state["U"] ** 2 + sim.state["V"] ** 2))
    ke0 = float(jnp.mean(tg_u(x, y, 0.0) ** 2 + tg_v(x, y, 0.0) ** 2))
    rate = -math.log(ke / ke0) / sim.time.t
    expect = 16 * math.pi ** 2 * NU
    print(f"decay rate {rate:.3f} vs analytic {expect:.3f}")
    assert abs(rate - expect) / expect < 0.05
