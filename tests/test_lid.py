"""Gate: reference test/lid — lid-driven cavity at Re=1000.

Reference config (test/lid/lid.gfs): 64^2 grid, viscosity 1e-3, top lid
U=1 (Dirichlet), no-slip elsewhere; run to steady state (EventStop on U,
tol 1e-4 every 10 steps); compare centreline velocity profiles against
Ghia, Ghia & Shin (1982) at Re=1000 with
  Linf(U(y) - Ghia) <= 2e-2   and   Linf(V(x) - Ghia) <= 1.7e-2
(test/lid/lid.sh:8-18).

The benchmark table below is the published Ghia et al. data in the unit
box centred at the origin (x,y in [-0.5,0.5], lid at y=+0.5).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.events.events import EventStop
from gerris_tpu.solvers import poisson
from gerris_tpu.solvers.advection import AdvectionParams

# Ghia, Ghia & Shin (1982), Re=1000: u on the vertical centreline (y, u)
GHIA_U = np.array([
    (-0.49933, -0.000882), (-0.444335, -0.181701), (-0.43629, -0.201989),
    (-0.428914, -0.222276), (-0.397406, -0.297251), (-0.327052, -0.383699),
    (-0.217948, -0.27788), (-0.046595, -0.106804), (0.001598, -0.060949),
    (0.118733, 0.057217), (0.235193, 0.186849), (0.352315, 0.333239),
    (0.45404, 0.466401), (0.461386, 0.511382), (0.469392, 0.574884),
    (0.476719, 0.659554), (0.5, 0.999118),
])
# v on the horizontal centreline (x, v)
GHIA_V = np.array([
    (-0.500577, 0.00069404), (-0.43768, 0.275621), (-0.429602, 0.290847),
    (-0.421523, 0.303994), (-0.406521, 0.326826), (-0.343624, 0.371038),
    (-0.273803, 0.330015), (-0.265724, 0.32307), (-0.000289, 0.0252893),
    (0.304962, -0.318994), (0.359781, -0.427191), (0.40652, -0.515279),
    (0.445182, -0.392034), (0.45326, -0.336623), (0.461339, -0.277749),
    (0.46884, -0.214023), (0.5, -6.20706e-17),
])


def lid_cfg(level):
    grid = Grid(level=level, dim=2)
    u_bc = bcs.FieldBC.make(
        2, default=bcs.Dirichlet(0.0),
        top=bcs.Dirichlet(1.0), bottom=bcs.Dirichlet(0.0),
        left=bcs.Dirichlet(0.0), right=bcs.Dirichlet(0.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    return ns.NSConfig(
        grid=grid,
        u_bcs=(u_bc, v_bc),
        nu=1e-3,
        beta=1.0,  # reference SourceDiffusion default (backward Euler)
        advection=AdvectionParams(cfl=0.8),
    )


@pytest.mark.slow
def test_lid_cavity_ghia():
    level = int(os.environ.get("GERRIS_TPU_LID_LEVEL", "6"))
    cfg = lid_cfg(level)
    sim = Simulation(cfg, time=Time(end=300.0, dtmax=1.0),
                     events=[EventStop("U", 1e-4, istep=10, diff_name="DU")])
    sim.init()
    sim.run()
    print(f"steady at t={sim.time.t:.2f} i={sim.time.i} "
          f"dU={sim.diagnostics.get('DU')}")

    u_prof = sim.interpolate("U", [(0.0, y) for y in GHIA_U[:, 0]])
    v_prof = sim.interpolate("V", [(x, 0.0) for x in GHIA_V[:, 0]])
    du = np.max(np.abs(u_prof - GHIA_U[:, 1]))
    dv = np.max(np.abs(v_prof - GHIA_V[:, 1]))
    print(f"Linf U vs Ghia: {du:.4f}  V: {dv:.4f}")
    # reference tolerances: test/lid/lid.sh:8-18
    assert du <= 2e-2
    assert dv <= 1.7e-2
