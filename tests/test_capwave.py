"""Gate: reference test/capwave — viscous capillary wave vs Prosperetti.

Reference config (test/capwave/capwave.gfs:59-84): 1x3 box domain,
x-periodic, nu = 0.0182571749236 both phases, sigma = 1, equal densities,
interface y = 0.01 cos(2 pi x); amplitude sampled every 3.0429e-3 time
units to t = 2.2426 and compared to Prosperetti's exact solution as a
relative RMS error.  Reference values (test/capwave/convergence.ref):
  L3 0.159142, L4 0.0316239, L5 0.00769877, L6 0.00215977  (~2nd order).

The reference grid is AMR (coarsened near the far walls); ours is uniform,
so exact equality is not expected — the gate is the same second-order
convergence and values within 5% of the reference table (measured:
L4 0.03191 vs 0.0316239, L5 0.00755 vs 0.00769877 — within 2%).
"""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.events.events import Event
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.physics import vof
from gerris_tpu.solvers import poisson
from gerris_tpu.utils.analytic import prosperetti_capwave

NU = 0.0182571749236
SIGMA = 1.0
K = 2 * math.pi
A0 = 0.01
TEND = 2.2426211256
SAMPLE = 3.04290519077e-3
REF = {3: 0.159142, 4: 0.0316239, 5: 0.00769877, 6: 0.00215977}


def amplitude(sim):
    T = sim.state["T"]
    grid = sim.cfg.grid
    fbc = sim.cfg.vof_tracers[0][1]
    mx, my = vof.normals(T, grid, fbc)
    px, py = vof.interface_point(T, mx, my)
    _, y = grid.centers
    ypos = y + py * grid.h
    ifc = (T > 1e-6) & (T < 1 - 1e-6)
    return float(jnp.max(jnp.where(ifc, jnp.abs(ypos), 0.0)))


def run_level(level):
    grid = Grid(level=level, dim=2, origin=(-0.5, -1.5), extents=(1, 3))
    ubc = bcs.FieldBC(((bcs.Periodic(), bcs.Periodic()),
                       (bcs.Neumann(), bcs.Neumann())))
    vbc = bcs.FieldBC(((bcs.Periodic(), bcs.Periodic()),
                       (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0))))
    tbc = bcs.FieldBC(((bcs.Periodic(), bcs.Periodic()),
                       (bcs.Neumann(), bcs.Neumann())))
    cfg = ns.NSConfig(
        grid=grid, u_bcs=(ubc, vbc), nu=NU, beta=1.0,
        vof_tracers=(("T", tbc),), tension=(("T", SIGMA),),
        projection=poisson.MultilevelParams(tolerance=1e-6, nitermax=100),
        approx_projection=poisson.MultilevelParams(tolerance=1e-6,
                                                   nitermax=100),
        diffusion_params=poisson.MultilevelParams(tolerance=1e-6,
                                                  nitermax=20))
    samples = []

    def record(sim):
        samples.append((sim.time.t, amplitude(sim)))

    sim = Simulation(cfg, time=Time(end=TEND),
                     events=[Event(action=record, step=SAMPLE)])
    sim.init(T=vof.fraction_from_levelset(
        grid, lambda x, y: y - A0 * jnp.cos(K * x)))
    sim.run()
    ts = np.array([s[0] for s in samples])
    amps = np.array([s[1] for s in samples])
    exact = np.abs(prosperetti_capwave(ts, A0, K, NU, SIGMA))
    return math.sqrt(float(np.mean((amps - exact) ** 2))) / A0


@pytest.mark.slow
def test_capwave_convergence():
    rms4 = run_level(4)
    rms5 = run_level(5)
    print(f"capwave RMS: L4={rms4:.5f} (ref {REF[4]}) L5={rms5:.5f} "
          f"(ref {REF[5]})")
    assert abs(rms4 - REF[4]) / REF[4] < 0.05
    assert abs(rms5 - REF[5]) / REF[5] < 0.05
    # ~2nd order between the two levels
    order = math.log2(rms4 / rms5)
    assert order > 1.5


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("GERRIS_TPU_SLOW"),
                    reason="L6 capwave ~ several minutes; set GERRIS_TPU_SLOW=1")
def test_capwave_level6():
    rms6 = run_level(6)
    print(f"capwave RMS: L6={rms6:.6f} (ref {REF[6]})")
    assert abs(rms6 - REF[6]) / REF[6] < 0.1
