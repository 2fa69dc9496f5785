"""Gate: reference test/oscillation — capillary droplet oscillation with
density ratio 1000.

Reference config (test/oscillation/oscillation.gfs): droplet D=0.2 with an
n=2 mode-shape perturbation epsilon=0.05 at the corner (-0.5,-0.5) (quarter
droplet with symmetry walls), sigma=1, rho=1 inside / 1e-3 outside
(filtered fraction T1 drives alpha), no viscosity.  Kinetic energy
k(t) = a exp(-b t)(1 - cos(c t)) is fitted; fit.ref column 4 (c = 2*omega):
  L5 152.80, L6 153.98, L7 154.59, L8 154.79
against the analytic omega0 = sqrt((n^3-n) sigma / ((rho_l+rho_g) r0^3)),
2*omega0 = 154.84.
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

D = 0.2
EPS = 0.05
SIGMA = 1.0
RHO_L, RHO_G = 1.0, 1e-3
OMEGA0 = math.sqrt((8 - 2) * SIGMA / ((RHO_L + RHO_G) * (D / 2) ** 3))
REF_C = {5: 152.80, 6: 153.984, 7: 154.591, 8: 154.785}


def phi(x, y):
    # quarter droplet at the corner; radius perturbed by the n=2 mode
    xx = x + 0.5
    yy = y + 0.5
    r = D / 2.0 * (1.0 + EPS * jnp.cos(2.0 * jnp.arctan2(yy, xx)))
    return r * r - (xx * xx + yy * yy)   # fluid (T=1) inside the droplet


def run_level(level, t_end=1.0):
    grid = Grid(level=level, dim=2)
    # symmetry walls: normal velocity Dirichlet 0, tangential free-slip
    u_bc = bcs.velocity_bc(0, 2)
    v_bc = bcs.velocity_bc(1, 2)
    tbc = bcs.default_scalar_bc(2)
    cfg = ns.NSConfig(
        grid=grid, u_bcs=(u_bc, v_bc), nu=0.0,
        vof_tracers=(("T", tbc),), tension=(("T", SIGMA),),
        density=("T", RHO_L, RHO_G, 1),
        projection=poisson.MultilevelParams(tolerance=1e-4, nitermax=100),
        approx_projection=poisson.MultilevelParams(tolerance=1e-4,
                                                   nitermax=100))
    ke = []

    def record(sim):
        rho = RHO_G + jnp.clip(sim.state["T"], 0, 1) * (RHO_L - RHO_G)
        k = float(jnp.sum(rho * (sim.state["U"] ** 2 + sim.state["V"] ** 2))
                  * grid.cell_volume)
        ke.append((sim.time.t, k))

    sim = Simulation(cfg, time=Time(end=t_end),
                     events=[Event(action=record, istep=1)])
    sim.init(T=vof.fraction_from_levelset(grid, phi))
    sim.run()
    return np.array(ke)


def fit_ke(ke):
    """Fit k(t) = a exp(-b t) (1 - cos(c t)) (oscillation.sh gnuplot fit)."""
    from scipy.optimize import curve_fit

    t, k = ke[:, 0], ke[:, 1]

    def model(t, a, b, c):
        return a * np.exp(-b * t) * (1.0 - np.cos(c * t))

    p0 = (3e-4, 1.5, 2 * OMEGA0)
    popt, _ = curve_fit(model, t, k, p0=p0, maxfev=20000)
    return popt


@pytest.mark.slow
def test_oscillation_frequency():
    level = 6
    ke = run_level(level)
    a, b, c = fit_ke(ke)
    print(f"L{level}: a={a:.3e} b={b:.3f} c={c:.3f} "
          f"(ref {REF_C[level]}, 2*omega0={2*OMEGA0:.2f})")
    # frequency within 0.5% of the reference fit (measured 0.098%; the
    # reference's own oscillation.sh tolerance is 1e-2 of fit.ref)
    assert abs(c - REF_C[level]) / REF_C[level] < 0.005
    assert b > 0  # decaying
