"""Particle/bubble model validation (the fork's focus).

Reference behaviors reimplemented: drag law and relaxation
(modules/particulatecommon.c:519-600), buoyancy (:617-680), two-way
kernel deposition (:1929-2005, :2089-2177), Rayleigh-Plesset radius
dynamics (modules/bubbles.c:95-276).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.models.particle_system import ParticleSystem
from gerris_tpu.physics import particles as parts
from gerris_tpu.physics import bubbles as bub


def uniform_flow_cfg(level=5, nu=1e-2):
    grid = Grid(level=level, dim=2)
    per = bcs.periodic_bc(2)
    return ns.NSConfig(grid=grid, u_bcs=(per, per), nu=nu)


def test_interpolation_exact_linear():
    """Bilinear gather reproduces a linear field exactly at random points."""
    grid = Grid(level=5, dim=2)
    x, y = grid.centers
    f = 2.0 * x - 3.0 * y + 0.25
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.45, 0.45, (64, 2)))
    vals = parts.interpolate_at(f, grid, bcs.periodic_bc(2), pos)
    exact = 2.0 * pos[:, 0] - 3.0 * pos[:, 1] + 0.25
    assert float(jnp.max(jnp.abs(vals - exact))) < 1e-12


def test_drag_relaxation():
    """A heavy particle released at rest in a uniform stream relaxes toward
    the stream velocity monotonically (Cd(Re) law path)."""
    grid = Grid(level=5, dim=2)
    per = bcs.periodic_bc(2)
    u0 = 0.5
    U = [jnp.full(grid.shape, u0), jnp.zeros(grid.shape)]
    pcfg = parts.ParticleConfig(capacity=8, forces=("drag",), fluid_rho=1.0)
    p = parts.make_particles(8, 2, pos=[[0.0, 0.0]], vel=[[0.0, 0.0]],
                             vol=[1e-4], mass=[5e-4])
    dt = 0.01
    vels = []
    for _ in range(200):
        p, _ = parts.step_particles(p, U, U, grid, [per, per], pcfg,
                                    nu=1e-2, dt=dt)
        vels.append(float(p["vel"][0, 0]))
    v = np.array(vels)
    assert np.all(np.diff(v) >= -1e-12)          # monotone approach
    assert abs(v[-1] - u0) < 0.05 * u0           # near the stream velocity
    assert v[-1] < u0 + 1e-9


def test_buoyancy_terminal_velocity():
    """Light particle under gravity + drag reaches the terminal velocity
    where buoyancy balances drag (force balance of ref models)."""
    grid = Grid(level=5, dim=2)
    per = bcs.periodic_bc(2)
    U = [jnp.zeros(grid.shape), jnp.zeros(grid.shape)]
    g = -1.0
    cd = 1.0
    vol = 1e-4
    dia = parts.particle_diameter(jnp.array([vol]))[0]
    rho_p = 0.5
    pcfg = parts.ParticleConfig(capacity=4, forces=("drag", "buoy"),
                                cd=cd, gravity=(0.0, g), fluid_rho=1.0)
    p = parts.make_particles(4, 2, pos=[[0.0, -0.3]], vel=[[0.0, 0.0]],
                             vol=[vol], mass=[rho_p * vol])
    dt = 0.002
    for _ in range(2000):
        p, _ = parts.step_particles(p, U, U, grid, [per, per], pcfg,
                                    nu=1e-2, dt=dt)
    v_term = float(p["vel"][0, 1])
    # (rho_p - rho_f) g = (3 cd / 4 dia) |v| v  ->  v = sqrt(4 dia (1-rho_p)|g| / (3 cd))
    expect = math.sqrt(4.0 * float(dia) * (1.0 - rho_p) * abs(g) / (3.0 * cd))
    print(f"terminal v={v_term:.4f} expect={expect:.4f}")
    assert v_term > 0
    assert abs(v_term - expect) / expect < 0.02


def test_deposit_conserves_total():
    grid = Grid(level=5, dim=2)
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-0.3, 0.3, (32, 2)))
    vals = jnp.asarray(rng.uniform(0.5, 1.5, (32,)))
    p = parts.make_particles(32, 2, pos=pos)
    for rk in (0.0, 0.05):
        pcfg = parts.ParticleConfig(capacity=32, rkernel=rk)
        field = parts.deposit(vals, p, grid, pcfg)
        total = float(jnp.sum(field)) * grid.cell_volume
        assert abs(total - float(jnp.sum(vals))) < 1e-10, rk


def test_bubble_minnaert_frequency():
    """Small radial perturbation oscillates at the Minnaert frequency
    omega^2 = 3 gamma p0 / (rho R0^2) (linearized Rayleigh-Plesset,
    modules/bubbles.c:95)."""
    bcfg = bub.BubbleConfig(model="rp", gamma=1.4, substeps=64)
    R0 = 0.01
    p0 = 1.0
    rho = 1.0
    R = jnp.array([R0 * 1.001])
    Rdot = jnp.array([0.0])
    p_liq = jnp.array([p0])
    omega = math.sqrt(3 * 1.4 * p0 / (rho * R0 * R0))
    period = 2 * math.pi / omega
    dt = period / 64
    rs = []
    for _ in range(130):
        R, Rdot = bub.integrate_radius(R, Rdot, jnp.array([p0]),
                                       jnp.array([R0]), p_liq, rho, dt, bcfg)
        rs.append(float(R[0]))
    rs = np.array(rs)
    # measure the period via zero crossings of (R - R0)
    s = rs - R0
    crossings = np.where(np.diff(np.sign(s)) != 0)[0]
    assert len(crossings) >= 3
    measured = 2 * dt * np.mean(np.diff(crossings))
    print(f"period measured={measured:.5f} minnaert={period:.5f}")
    assert abs(measured - period) / period < 0.05


def test_two_way_coupling_momentum():
    """Two-way coupled sim runs and transfers momentum: heavy particles
    dragged by the flow decelerate it (total fluid+particle x-momentum
    approximately conserved in a periodic box)."""
    grid = Grid(level=5, dim=2)
    per = bcs.periodic_bc(2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(per, per), nu=1e-3,
                      particle_coupling=True)
    rng = np.random.default_rng(2)
    npart = 16
    vol = 2e-4
    pcfg = parts.ParticleConfig(capacity=npart, forces=("drag",),
                                two_way=True, rkernel=0.0, fluid_rho=1.0)
    p = parts.make_particles(npart, 2,
                             pos=rng.uniform(-0.4, 0.4, (npart, 2)),
                             vel=np.zeros((npart, 2)),
                             vol=np.full(npart, vol),
                             mass=np.full(npart, 10.0 * vol))
    psys = ParticleSystem(pcfg, p)
    sim = Simulation(cfg, time=Time(end=1.0, dtmax=0.01),
                     particle_systems=[psys])
    sim.init(U=jnp.full(grid.shape, 0.3))
    mom_f0 = float(jnp.sum(sim.state["U"])) * grid.cell_volume
    sim.run(max_steps=60)
    mom_f1 = float(jnp.sum(sim.state["U"])) * grid.cell_volume
    mom_p1 = float(jnp.sum(psys.state["vel"][:, 0] * psys.state["mass"]))
    gained = mom_p1
    lost = mom_f0 - mom_f1
    print(f"fluid lost {lost:.3e}, particles gained {gained:.3e}")
    assert gained > 0.0                      # particles picked up momentum
    assert lost > 0.0                        # the fluid paid for it
    assert abs(lost - gained) / gained < 0.2  # approximately conserved


def test_feed_particles():
    """GfsFeedParticle analogue (modules/particulatecommon.c:2377)."""
    p = parts.make_particles(8, 2, pos=[[0.0, 0.0]], vol=[1e-4],
                             mass=[1e-4])
    assert int(jnp.sum(p["alive"])) == 1
    p2 = parts.feed_particles(p, [[0.1, 0.1], [0.2, 0.2]], vol=2e-4)
    assert int(jnp.sum(p2["alive"])) == 3
    assert float(jnp.sum(jnp.where(p2["alive"], p2["vol"], 0.0))) == \
        pytest.approx(1e-4 + 2 * 2e-4)
    # over-capacity injections are dropped, not wrapped
    p3 = parts.feed_particles(p2, np.zeros((10, 2)), vol=1e-5)
    assert int(jnp.sum(p3["alive"])) <= 8


def test_bubble_interactions_frequency_shift():
    """Two coupled bubbles oscillating in phase have a LOWER natural
    frequency than an isolated bubble: omega^2 = omega0^2 / (1 + R0/d)
    (linearized mutual radiation coupling; the GfsBubbleInteractions
    physics, modules/bubbles.c:815-1130)."""
    import math
    import numpy as np
    from gerris_tpu.physics import bubbles as bub

    R0 = 0.01
    d = 0.05
    rho = 1000.0
    p0 = 1e5
    gamma = 1.4
    cfg = bub.BubbleConfig(model="rp", gamma=gamma, substeps=8,
                           interactions=True)
    omega0 = math.sqrt(3.0 * gamma * p0 / (rho * R0 * R0))

    def frequency(two):
        import jax

        n = 2 if two else 1
        pos = jnp.asarray([[0.0, 0.0], [d, 0.0]][:n])
        alive = jnp.ones((n,), bool)
        p_at = jnp.full((n,), p0)
        dt = 1.5e-5          # ~200 steps per omega0 period

        @jax.jit
        def rollout(R, Rd):
            def step(carry, _):
                R, Rd = carry
                R, Rd = bub.integrate_radius_coupled(
                    R, Rd, jnp.full((n,), p0), jnp.full((n,), R0), p_at,
                    rho, pos, alive, dt, cfg)
                return (R, Rd), R[0]
            _, hist = jax.lax.scan(step, (R, Rd), None, length=800)
            return hist

        rs = np.asarray(rollout(jnp.full((n,), R0 * 1.01),
                                jnp.zeros((n,))))
        ts = dt * (1.0 + np.arange(800))
        rs = rs - np.mean(rs)
        # frequency from zero crossings
        sgn = np.sign(rs)
        crossings = np.nonzero(sgn[1:] * sgn[:-1] < 0)[0]
        period = 2.0 * np.mean(np.diff(np.array(ts)[crossings]))
        return 2.0 * math.pi / period

    w1 = frequency(False)
    w2 = frequency(True)
    expected = omega0 / math.sqrt(1.0 + R0 / d)
    print(f"isolated w={w1:.0f} (theory {omega0:.0f}); "
          f"coupled w={w2:.0f} (theory {expected:.0f})")
    assert abs(w1 - omega0) / omega0 < 0.05
    assert abs(w2 - expected) / expected < 0.05
    assert w2 < 0.95 * w1
