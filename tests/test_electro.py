"""Electrohydrodynamics gates (reference: modules/electrohydro.c +
test/electro, test/debye).

* variable-permittivity potential solve: smooth eps(x) with the exact
  1D solution of (eps phi')' = 0 — second-order convergence;
* Maxwell-stress well-balancedness: uniform E + uniform eps => zero
  force to round-off (save_fe flux form, electrohydro.c:669-740);
* f = rhoe E identity for uniform permittivity;
* ohmic charge relaxation in a periodic box: total charge conserved to
  round-off (conservative flux form — the reference test description's
  'total charge is conserved to within round-off'), deviation from the
  mean decays at the analytic rate sigma/eps.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import electro, ns
from gerris_tpu.models.simulation import Time
from gerris_tpu.solvers import poisson


def test_potential_variable_permittivity_convergence():
    # eps = exp(x): (eps phi')' = 0 with phi(-1/2)=0, phi(1/2)=1
    # => phi = (exp(-x) - exp(1/2)) / (exp(-1/2) - exp(1/2))
    errs = {}
    for lvl in (5, 6):
        grid = Grid(level=lvl, dim=2)
        phi_bc = bcs.FieldBC.make(
            2, default=bcs.Neumann(),
            left=bcs.Dirichlet(0.0), right=bcs.Dirichlet(1.0))
        eps_f = electro.coefficient_faces(
            lambda x, y: jnp.exp(x), grid)
        phi, st = electro.solve_potential(
            jnp.zeros(grid.shape), jnp.zeros(grid.shape), grid, phi_bc,
            poisson.MultilevelParams(tolerance=1e-12, nitermax=30), eps_f)
        x, _ = grid.centers
        exact = (jnp.exp(-x) - math.exp(0.5)) / (math.exp(-0.5)
                                                 - math.exp(0.5))
        errs[lvl] = float(jnp.max(jnp.abs(phi - exact)))
    assert errs[5] / errs[6] > 3.4, errs
    assert errs[6] < 5e-5


def test_maxwell_force_well_balanced():
    grid = Grid(level=5, dim=2)
    Ef = 1.34
    phi_bc = bcs.FieldBC.make(
        2, default=bcs.Neumann(),
        left=bcs.Dirichlet(lambda x, y, t=0.0: Ef * x),
        right=bcs.Dirichlet(lambda x, y, t=0.0: Ef * x))
    x, _ = grid.centers
    phi = Ef * x + jnp.zeros(grid.shape)
    f = electro.maxwell_force(phi, grid, phi_bc)
    for c in range(2):
        assert float(jnp.max(jnp.abs(f[c]))) < 1e-12 * Ef ** 2


def test_maxwell_force_equals_rhoe_E():
    # uniform eps: div(eps(EE - |E|^2/2 I)) = rhoe E with rhoe=div(eps E)
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    phi_bc = bcs.periodic_bc(2)
    phi = jnp.sin(2 * jnp.pi * x) * jnp.cos(4 * jnp.pi * y)
    f = electro.maxwell_force(phi, grid, phi_bc)
    # discrete charge consistent with the same face-gradient operator
    from gerris_tpu.ops.stencils import divergence
    from gerris_tpu.solvers.projection import face_gradients
    gf = face_gradients(phi, grid, phi_bc, None)
    rhoe = -divergence(gf, grid)
    E = electro.efield(phi, grid, phi_bc)
    for c in range(2):
        err = float(jnp.sqrt(jnp.mean((f[c] - rhoe * E[c]) ** 2)))
        mag = float(jnp.sqrt(jnp.mean((rhoe * E[c]) ** 2)))
        assert err / mag < 0.05, (c, err / mag)


def test_charge_relaxation():
    """Conducting medium: d rhoe/dt = -(sigma/eps) (rhoe - mean), total
    charge conserved exactly (periodic, conservative conduction flux)."""
    grid = Grid(level=5, dim=2)
    per = bcs.periodic_bc(2)
    sigma, eps = 2.0, 1.0
    cfg = ns.NSConfig(grid=grid, u_bcs=(per, per), nu=0.0, p_bc=per,
                      tracers=(("Rhoe", per, 0.0),))
    elec = electro.ElectroParams(
        phi_bc=per, perm=eps, charge="Rhoe", conductivity=sigma,
        projection=poisson.MultilevelParams(tolerance=1e-10, nitermax=30))
    x, y = grid.centers
    r2 = x ** 2 + y ** 2
    rho0 = jnp.exp(-r2 / 0.02)
    dt = 0.02
    sim = electro.ElectroSimulation(cfg, elec,
                                    time=Time(end=10 * dt, dtmax=dt))
    sim.init(Rhoe=rho0)
    sim.run()
    rho = sim.state["Rhoe"]
    # total charge conserved to round-off
    q0, q1 = float(jnp.sum(rho0)), float(jnp.sum(rho))
    assert abs(q1 - q0) < 1e-10 * abs(q0), (q0, q1)
    # deviation from the mean decays at the charge-relaxation rate
    # sigma/eps (explicit-Euler bias at this dt is ~0.8%)
    dev0 = rho0 - jnp.mean(rho0)
    dev1 = rho - jnp.mean(rho)
    expect = math.exp(-sigma / eps * sim.time.t)
    got = float(jnp.linalg.norm(dev1) / jnp.linalg.norm(dev0))
    assert abs(got - expect) < 0.02 * expect, (got, expect)


def test_electro_flow_coupling():
    """A charge blob in an applied field accelerates the fluid: the early
    velocity field matches t * P(f) where P is the discrete projection
    (in a closed box the irrotational part of rhoe*E is absorbed by the
    pressure, so only the projected force drives flow)."""
    grid = Grid(level=5, dim=2)
    Ef = 1.0
    u_bc = bcs.velocity_bc(0, 2)
    v_bc = bcs.velocity_bc(1, 2)
    phi_bc = bcs.FieldBC.make(
        2, default=bcs.Neumann(),
        left=bcs.Dirichlet(lambda x, y, t=0.0: Ef * x),
        right=bcs.Dirichlet(lambda x, y, t=0.0: Ef * x))
    sbc = bcs.default_scalar_bc(2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0,
                      tracers=(("Rhoe", sbc, 0.0),))
    elec = electro.ElectroParams(
        phi_bc=phi_bc, perm=1.0, charge="Rhoe",
        projection=poisson.MultilevelParams(tolerance=1e-10, nitermax=30))
    x, y = grid.centers
    rho0 = 0.05 * jnp.exp(-(x ** 2 + y ** 2) / 0.01)
    sim = electro.ElectroSimulation(cfg, elec,
                                    time=Time(iend=2, dtmax=1e-2))
    sim.init(Rhoe=rho0)
    sim.run()
    # expected: u ~= t * P(f_maxwell) for the initial fields
    from gerris_tpu.solvers import projection as proj
    sim0 = electro.ElectroSimulation(cfg, elec, time=Time(iend=0))
    sim0.init(Rhoe=rho0)
    sim0.dt = 1e-2
    sim0._initial_projection()
    fe = electro.maxwell_force(sim0.state["Phi"], grid, phi_bc)
    Pf, _, _, _ = proj.approximate_projection(
        fe, jnp.zeros(grid.shape), grid, [u_bc, v_bc], cfg.p_bc, 1.0,
        poisson.MultilevelParams(tolerance=1e-10, nitermax=30))
    t = sim.time.t
    num = jnp.sqrt(sum(jnp.mean((sim.state[n] - t * Pf[c]) ** 2)
                       for c, n in enumerate(("U", "V"))))
    den = jnp.sqrt(sum(jnp.mean((t * Pf[c]) ** 2) for c in range(2)))
    assert float(den) > 0.0
    assert float(num / den) < 0.25, float(num / den)


def test_gfs_electrohydro_parse_and_run():
    """GfsElectroHydro .gfs syntax: second read block with perm/charge/
    ElectricProjectionParams (modules/electrohydro.c:93-210), SourceElectric,
    SourceDiffusionExplicit, Phi boundary conditions and Init."""
    from gerris_tpu.utils import gfs_config as G
    txt = """
1 0 GfsElectroHydro GfsBox GfsGEdge {} {
    Time { end = 0.04 dtmax = 0.02 }
    Refine 4
    VariableTracer Rhoe
    SourceElectric
    SourceDiffusionExplicit Rhoe 2.0 Phi
    Init {} {
        Rhoe = exp(-(x*x + y*y)/0.02)
        Phi = 1.34*x
    }
} {
    perm = 1.
    charge = Rhoe
    ElectricProjectionParams { tolerance = 1e-8 }
}
GfsBox {
    right = Boundary { BcDirichlet Phi 1.34*x }
    left = Boundary { BcDirichlet Phi 1.34*x }
}
"""
    sim = G.build_simulation(G.parse_gfs(txt))
    assert type(sim).__name__ == "ElectroSimulation"
    assert sim.elec.charge == "Rhoe"
    assert sim.elec.conductivity == 2.0
    assert sim.elec.projection.tolerance == 1e-8
    q0 = float(jnp.sum(sim.state["Rhoe"]))
    sim.run()
    assert sim.time.i == 2
    # potential was solved and the E field is dominated by the applied one
    assert "Phi" in sim.state and "Ex" in sim.state
    exm = float(jnp.mean(sim.state["Ex"]))
    assert abs(exm + 1.34) < 0.15, exm    # E = -grad Phi = -1.34 x_hat
    q1 = float(jnp.sum(sim.state["Rhoe"]))
    assert q1 < q0  # conduction drains charge through Dirichlet sides
