"""Physics gate for the PRODUCTION bench schedule (VERDICT r4 weak #2).

bench.py runs the 2048^2 cavity with an aggressive fixed schedule:
1 sawtooth cycle per solve, 5 over-relaxed sweeps/level (omega = 1.5)
for both projections, and the implicit diffusion pair at a single fine
sweep per cycle.  The bench's own honesty check is one step of
fixed-vs-adaptive agreement; this file pins the schedule with physics:

* a 64^2 Re=1000 lid cavity run to steady state WITH the production
  schedule must match Ghia, Ghia & Shin (1982) centreline profiles at
  the reference's own tolerances (test/lid/lid.sh:8-18);
* 100 steps at 256^2 from an impulsive start: fixed-schedule vs
  adaptive-tolerance trajectories must stay within 2e-3 relative —
  a multi-step drift bound, not a single-step snapshot.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.events.events import EventStop
from gerris_tpu.solvers import poisson

from test_lid import GHIA_U, GHIA_V


def production_params():
    """The exact solver schedule bench.py bakes in (bench.py defaults:
    GERRIS_OMEGA=1.5, GERRIS_TPU_NRELAX=5, ncycles=1,
    GERRIS_DIFF_NRELAX=1)."""
    mp1 = poisson.MultilevelParams(tolerance=1e-3, nitermax=100,
                                   ncycles=1, omega=1.5, tpu_nrelax=5)
    mpd = dataclasses.replace(mp1, nrelax=1, omega=1.0, tpu_nrelax=1)
    return mp1, mpd


def cavity_cfg(level):
    grid = Grid(level=level, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    mp1, mpd = production_params()
    return ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3, beta=1.0,
                       projection=mp1, approx_projection=mp1,
                       diffusion_params=mpd)


@pytest.mark.slow
def test_production_schedule_ghia():
    """Steady lid cavity with the bench schedule vs Ghia (the
    reference's own lid gate, test/lid/lid.sh)."""
    cfg = cavity_cfg(6)
    sim = Simulation(cfg, time=Time(end=1e6),
                     events=[EventStop("U", 1e-4, istep=10)])
    sim.init()
    sim.run(max_steps=20000)
    assert sim.stop, "did not reach steady state"
    g = cfg.grid
    n = g.n
    U = np.asarray(sim.state["U"])
    V = np.asarray(sim.state["V"])
    y = np.asarray(g.axis_centers(1))
    x = np.asarray(g.axis_centers(0))
    u_mid = 0.5 * (U[n // 2 - 1, :] + U[n // 2, :])
    v_mid = 0.5 * (V[:, n // 2 - 1] + V[:, n // 2])
    eu = np.abs(np.interp(GHIA_U[:-1, 0], y, u_mid) - GHIA_U[:-1, 1])
    ev = np.abs(np.interp(GHIA_V[:-1, 0], x, v_mid) - GHIA_V[:-1, 1])
    # reference tolerances (lid.sh): Linf(U) <= 2e-2, Linf(V) <= 1.7e-2
    assert eu.max() <= 2.0e-2, eu.max()
    assert ev.max() <= 1.7e-2, ev.max()


@pytest.mark.slow
def test_fixed_vs_adaptive_100step_drift():
    """100-step trajectory agreement at 256^2 between the production
    fixed schedule and fully adaptive solves (multi-step version of
    bench.py's honesty check)."""
    import jax

    level = 8
    cfg_fix = cavity_cfg(level)
    ada = poisson.MultilevelParams(tolerance=1e-3, nitermax=100,
                                   tpu_nrelax=5)
    cfg_ada = dataclasses.replace(cfg_fix, projection=ada,
                                  approx_projection=ada,
                                  diffusion_params=None)
    g = cfg_fix.grid
    z = jnp.zeros(g.shape, jnp.float32)
    names = list(ns.velocity_names(2)) + ["P", "Pmac"] + \
        list(ns.gradient_names(2))
    state = {n: z for n in names}
    dt = jnp.float32(0.8 * g.h)

    def run(cfg, state, nsteps):
        @jax.jit
        def step(s):
            return ns.ns_step(s, dt, jnp.float32(0.0), cfg)
        for _ in range(nsteps):
            state = step(state)
        return state

    s_fix = run(cfg_fix, state, 100)
    s_ada = run(cfg_ada, state, 100)
    rel = max(
        float(jnp.max(jnp.abs(s_fix[n] - s_ada[n]))
              / jnp.maximum(jnp.max(jnp.abs(s_ada[n])), 1e-30))
        for n in ("U", "V"))
    assert rel < 2e-3, rel
