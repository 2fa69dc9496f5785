"""Gate: reference test/spurious — spurious (parasitic) currents around a
static droplet with surface tension.

Reference config (spurious.gfs): droplet D = 0.8 at the corner
(-0.5, 0.5), sigma = 1, mu = sqrt(0.8/La) with La = 12000, run to
tmax = 0.8^2/mu (or until the VOF field freezes, EventStop T 1e-9).
Reference values at LEVEL = 5 (D/h = 25.6):
  shape error     L2 = 9.129e-05, Linf = 1.271e-03 (convergence.ref)
  curvature error L2 = 4.904e-04, Linf = 3.021e-03 * K_exact
  (kconvergence.ref; K_exact = 2.5 = 1/R)
The well-balanced tension/pressure coupling (physics/tension.py) is what
makes the currents vanish instead of feeding the interface.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.events.events import Event, EventStop
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.physics import vof
from gerris_tpu.solvers import poisson

LA = 12000.0
MU = math.sqrt(0.8 / LA)
TMAX = 0.8 * 0.8 / MU
R = 0.4


def phi(x, y):
    return R * R - ((x + 0.5) ** 2 + (y - 0.5) ** 2)


@pytest.mark.slow
def test_spurious_currents_level5():
    level = 5
    grid = Grid(level=level, dim=2)
    cfg = ns.NSConfig(
        grid=grid, u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
        nu=MU, beta=1.0,
        advection=ns.adv.AdvectionParams(scheme="none"),
        vof_tracers=(("T", bcs.default_scalar_bc(2)),),
        tension=(("T", 1.0),),
        projection=poisson.MultilevelParams(tolerance=1e-6, nitermax=100),
        approx_projection=poisson.MultilevelParams(tolerance=1e-6,
                                                   nitermax=100),
        diffusion_params=poisson.MultilevelParams(tolerance=1e-6,
                                                  nitermax=20))
    umax_hist = []

    def track(sim):
        u = jnp.sqrt(sim.state["U"] ** 2 + sim.state["V"] ** 2)
        umax_hist.append(float(jnp.max(u)))

    sim = Simulation(cfg, time=Time(end=TMAX),
                     events=[Event(action=track, istep=20),
                             EventStop("T", 1e-9, istep=10)])
    T0 = vof.fraction_from_levelset(grid, phi)
    sim.init(T=T0)
    sim.run()

    # shape error vs the initial fraction (the droplet must not deform)
    E = np.asarray(sim.state["T"] - T0)
    e2 = math.sqrt(float((E ** 2).mean()))
    einf = float(np.abs(E).max())
    # curvature error on interface cells
    tbc = bcs.default_scalar_bc(2)
    kap = vof.curvature(sim.state["T"], grid, tbc)
    ifc = (sim.state["T"] > 1e-6) & (sim.state["T"] < 1 - 1e-6)
    kerr = jnp.where(ifc & jnp.isfinite(kap), jnp.abs(kap - 2.5), 0.0)
    kinf = float(jnp.max(kerr)) / 2.5
    # parasitic currents: final capillary-number max
    ca = umax_hist[-1] * MU
    print(f"steps={sim.time.i} t={sim.time.t:.1f} shape L2={e2:.2e} "
          f"Linf={einf:.2e} (ref 9.1e-5/1.3e-3); K Linf rel={kinf:.2e} "
          f"(ref 3.0e-3); Ca={ca:.2e}")
    # shape errors within ~3x of the reference table: the reference runs
    # VariableTracerVOFHeight with RefineSurface level-10 initial
    # fractions (spurious.gfs:7); plain HF columns + PLIC-linearized init
    # land at 2.5-3x (measured r2: L2 2.5e-4, Linf 3.0e-3, K 3.8e-3)
    assert e2 < 3.0 * 9.129e-05
    assert einf < 3.0 * 1.271e-03
    assert kinf < 3.0 * 3.021e-03
    # currents must have decayed, not grown
    assert umax_hist[-1] < 0.5 * max(umax_hist[:5])
    assert ca < 1e-4


def test_css_tension_laplace():
    """CSS tension variant (GfsSourceTensionCSS, src/tension.c:181-305):
    a static droplet develops the Laplace pressure jump sigma/R; the
    parasitic currents stay bounded (CSS is known noisier than the
    well-balanced CSF default — that is why the reference keeps both)."""
    level = 6
    grid = Grid(level=level, dim=2)
    sigma, Rd = 1.0, 0.25

    def phi_d(x, y):
        return Rd * Rd - (x ** 2 + y ** 2)

    cfg = ns.NSConfig(
        grid=grid, u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
        nu=0.02, beta=1.0,
        advection=ns.adv.AdvectionParams(scheme="none"),
        vof_tracers=(("T", bcs.default_scalar_bc(2)),),
        tension_css=(("T", sigma),),
        projection=poisson.MultilevelParams(tolerance=1e-8, nitermax=100),
        approx_projection=poisson.MultilevelParams(tolerance=1e-8,
                                                   nitermax=100))
    sim = Simulation(cfg, time=Time(end=30 * 0.4 * grid.h * 0.1))
    T0 = vof.fraction_from_levelset(grid, phi_d, refine=3)
    sim.init(T=T0)
    sim.run()
    x, y = [np.asarray(c) for c in grid.centers]
    r = np.sqrt(x ** 2 + y ** 2)
    P = np.asarray(sim.state["P"])
    inside = r < Rd - 3 * grid.h
    outside = r > Rd + 3 * grid.h
    jump = P[inside].mean() - P[outside].mean()
    umax = float(np.max(np.abs(np.asarray(sim.state["U"]))))
    print(f"CSS Laplace jump {jump:.3f} vs {sigma/Rd:.3f}, umax={umax:.3e}")
    assert np.isfinite(P).all() and np.isfinite(umax)
    assert abs(jump - sigma / Rd) / (sigma / Rd) < 0.25, jump
    assert umax < 0.5 * math.sqrt(sigma / Rd)   # bounded parasitic noise


def test_kmax_curvature_variable():
    """Kmax (VariableCurvature K T Kmax, src/tension.c:427-482 +
    diffuse_kmax :540-565): |kappa| extended off the interface with the
    f(1-f) weighting ~ 1/R in the interface band."""
    grid = Grid(level=6, dim=2)
    Rd = 0.25
    T = vof.fraction_from_levelset(
        grid, lambda x, y: Rd * Rd - (x ** 2 + y ** 2))
    tbc = bcs.default_scalar_bc(2)
    kap = vof.curvature(T, grid, tbc)
    kmax = vof.fill_curvature_weighted(jnp.abs(kap), jnp.asarray(T),
                                       niter=2)
    x, y = [np.asarray(c) for c in grid.centers]
    r = np.sqrt(x ** 2 + y ** 2)
    band = np.abs(r - Rd) < 2 * grid.h
    vals = np.asarray(kmax)[band]
    vals = vals[np.isfinite(vals)]
    assert vals.size > 0
    assert np.abs(vals - 1.0 / Rd).max() / (1.0 / Rd) < 0.15, \
        (vals.min(), vals.max())

    # .gfs wiring: the Kmax name resolves through sim_field
    from gerris_tpu.utils import gfs_config as G
    gfs = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Time { end = 0 }
  Refine 6
  VariableTracerVOFHeight T
  VariableCurvature K T Kmax
  SourceTension T 1 K
  InitFraction T (0.0625 - x*x - y*y)
}
GfsBox {}
"""
    sim = G.build_simulation(G.parse_gfs(gfs, {}, strict=True))
    from gerris_tpu.events.outputs import sim_field
    for nm in ("K", "Kmax"):
        v = np.asarray(sim_field(sim, nm))
        # sim_field maps unreached (NODATA) cells to 0 — compare only
        # cells the 2 diffusion passes populated
        b = v[band & (np.abs(v) > 0.1)]
        assert b.size > 100 and np.abs(np.abs(b) - 4.0).max() < 0.6, nm
