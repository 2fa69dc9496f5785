"""Skew-symmetric (energy-conserving) solver gates.

Reference: test/reynolds/skew/skew.gfs — Taylor-Green vortex in a periodic
unit box with the GfsSkewSymmetric scheme (modules/skewsymmetric.c); the
scheme's selling point is (near-)conservation of kinetic energy in the
inviscid limit.  Gates:

* inviscid TG at level 6: kinetic-energy drift < 0.2% over t=1 (the
  Godunov/BCG scheme loses ~2% on the same case), divergence at solver
  tolerance, solution stays close to the steady TG field;
* random solenoidal field: face energy conserved (property test of the
  skew-symmetric flux form);
* viscous TG: energy decays at the analytic rate exp(-16 pi^2 nu t).
"""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns, skew
from gerris_tpu.models.simulation import Time
from gerris_tpu.solvers import poisson
from gerris_tpu.ops.stencils import divergence


def _tg_cfg(level, nu=0.0):
    grid = Grid(level=level, dim=2)
    per = bcs.periodic_bc(2)
    return ns.NSConfig(grid=grid, u_bcs=(per, per), nu=nu, p_bc=per,
                       projection=poisson.MultilevelParams(tolerance=1e-6))


def _tg_init(grid):
    x, y = grid.centers
    u0 = -jnp.cos(2 * jnp.pi * x) * jnp.sin(2 * jnp.pi * y)
    v0 = jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y)
    return u0, v0


def _prepared(sim):
    """Run the i==0 face init so energy diagnostics see the face field."""
    sim.set_timestep()
    sim._initial_projection()
    return sim


def test_taylor_green_energy_conservation():
    cfg = _tg_cfg(6)
    grid = cfg.grid
    sim = skew.SkewSimulation(cfg, time=Time(end=1.0, dtmax=0.8 * grid.h))
    u0, v0 = _tg_init(grid)
    _prepared(sim.init(U=u0, V=v0))
    k0 = sim.kinetic_energy()
    sim.run()
    k1 = sim.kinetic_energy()
    assert abs(k1 / k0 - 1.0) < 2e-3, (k0, k1)
    # faces stay divergence-free at the projection tolerance
    div = divergence(list(sim.state["_uf"]), grid)
    assert float(jnp.max(jnp.abs(div))) < 50 * sim.skew.projection.tolerance
    # TG is a steady Euler solution: the field should stay close to it
    err = float(jnp.sqrt(jnp.mean((sim.state["U"] - u0) ** 2
                                  + (sim.state["V"] - v0) ** 2)))
    mag = float(jnp.sqrt(jnp.mean(u0 ** 2 + v0 ** 2)))
    assert err / mag < 0.05, err / mag


def test_random_solenoidal_energy_conservation():
    cfg = _tg_cfg(5)
    grid = cfg.grid
    rng = np.random.default_rng(7)
    # solenoidal from a low-pass streamfunction
    psi = jnp.asarray(rng.standard_normal((grid.n, grid.n)))
    psi = jnp.fft.irfft2(jnp.fft.rfft2(psi) * (jnp.arange(psi.shape[0])[:, None] < 8)
                         * (jnp.arange(psi.shape[1] // 2 + 1)[None, :] < 8)).real
    u0 = jnp.roll(psi, -1, 1) - psi
    v0 = psi - jnp.roll(psi, -1, 0)
    umax = max(float(jnp.max(jnp.abs(u0))), float(jnp.max(jnp.abs(v0))))
    sim = skew.SkewSimulation(cfg, time=Time(dtmax=0.5 * grid.h / umax))
    _prepared(sim.init(U=u0, V=v0))
    # gate on FACE energy — the discrete invariant of the skew-symmetric
    # form.  (Cell-averaged Velocity2 decays ~8% on this unresolved random
    # field purely because the cascade piles energy at grid scale where the
    # face->cell average filters it — a diagnostic artifact, not scheme
    # dissipation.)
    k0 = sim.face_kinetic_energy()
    sim.run(max_steps=50)
    k1 = sim.face_kinetic_energy()
    assert abs(k1 / k0 - 1.0) < 1e-2, (k0, k1)


def test_taylor_green_viscous_decay():
    nu = 2e-3
    cfg = _tg_cfg(6, nu=nu)
    grid = cfg.grid
    sim = skew.SkewSimulation(cfg, time=Time(end=0.5, dtmax=0.5 * grid.h))
    u0, v0 = _tg_init(grid)
    _prepared(sim.init(U=u0, V=v0))
    k0 = sim.kinetic_energy()
    sim.run()
    k1 = sim.kinetic_energy()
    expect = math.exp(-16.0 * math.pi ** 2 * nu * sim.time.t)
    assert abs(k1 / k0 - expect) < 0.02 * expect, (k1 / k0, expect)
