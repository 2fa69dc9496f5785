"""GfsRiver (Saint-Venant) gates.

1. Well-balanced lake at rest over non-trivial (partly emerging)
   topography stays exactly still — the property the Audusse
   hydrostatic reconstruction is built for (reference:
   src/river.c:489-493 and Theorem 3.1 of Audusse et al. 2004).
2. Sampson parabolic-container oscillations vs the analytic solution:
   the reference's test/parabola/error.ref records time-averaged
   |h|_1/h0 = 0.00219 at level 6 — we gate the same quantity.
3. Dam break vs the Stoker solution (kinetic and hllc schemes).
"""
import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.models import river


def test_lake_at_rest():
    n = 64
    cfg = river.RiverConfig(shape=(n, n), L=1.0, g=9.81, dry=1e-6)
    x = (np.arange(n) + 0.5) / n - 0.5
    X, Y = np.meshgrid(x, x, indexing="ij")
    zb = 0.8 * np.exp(-((X / 0.15) ** 2 + (Y / 0.15) ** 2))  # emerges
    eta0 = 0.5
    P = np.maximum(0.0, eta0 - zb)
    state = {"P": jnp.asarray(P), "U": jnp.zeros((n, n)),
             "V": jnp.zeros((n, n)), "Zb": jnp.asarray(zb)}
    dt = jnp.asarray(0.5 * cfg.dx / math.sqrt(9.81 * eta0))
    for _ in range(20):
        state = river.river_step(state, dt, cfg)
    assert float(jnp.max(jnp.abs(state["U"]))) < 1e-12
    assert float(jnp.max(jnp.abs(state["V"]))) < 1e-12
    assert float(jnp.max(jnp.abs(state["P"] - P))) < 1e-12


def _sampson(x, t, h0=10.0, a=3000.0, tau=1e-3, B=5.0, G=9.81):
    """Analytic solution of the damped parabolic-container oscillation
    (Sampson et al. 2006; reference: test/parabola/parabola.gfs Global)."""
    p = math.sqrt(8.0 * G * h0) / a
    s = math.sqrt(p * p - tau * tau) / 2.0
    psi = (a * a * B * B * math.exp(-tau * t) / (8.0 * G * G * h0)
           * (-s * tau * math.sin(2 * s * t)
              + (tau * tau / 4.0 - s * s) * math.cos(2 * s * t))
           - B * B * math.exp(-tau * t) / (4.0 * G)
           - math.exp(-tau * t / 2.0) / G
           * (B * s * math.cos(s * t) + tau * B / 2.0 * math.sin(s * t)) * x)
    return h0 + psi


def test_parabola_level6():
    """test/parabola at LEVEL=6: time-averaged L1(P - Pt)/h0 must match
    error.ref (6: 0.00219, 0.00418, max 0.0447) within slack."""
    h0, a, tau, B, G, L = 10.0, 3000.0, 1e-3, 5.0, 9.81, 10000.0
    n = 64
    cfg = river.RiverConfig(shape=(n, 2), L=L, g=G, dry=1e-4, cfl=0.5,
                            coriolis=(0.0, tau, 0.5))
    x = ((np.arange(n) + 0.5) / n - 0.5) * L
    zb = h0 * (x / a) ** 2
    P0 = np.maximum(0.0, _sampson(x, 0.0) - zb)
    shape = (n, 2)
    state = {"P": jnp.asarray(np.broadcast_to(P0[:, None], shape)),
             "U": jnp.zeros(shape), "V": jnp.zeros(shape),
             "Zb": jnp.asarray(np.broadcast_to(zb[:, None], shape))}

    errs = []
    mx = 0.0

    def on_step(s, t, i):
        nonlocal mx
        Pt = np.maximum(0.0, np.asarray(
            [_sampson(xi, t) for xi in x]) - zb)
        d = np.abs(np.asarray(s["P"][:, 0]) - Pt)
        errs.append(d.mean())
        mx = max(mx, d.max())

    state, t, i = river.run(state, cfg, t_end=6000.0, on_step=on_step)
    l1 = float(np.mean(errs)) / h0
    assert l1 < 0.0033, l1          # ref: 0.00218884 (50% slack)
    assert mx / h0 < 0.07, mx / h0  # ref: 0.04465
    # 1D symmetry: the two y-rows must stay identical
    assert float(jnp.max(jnp.abs(state["P"][:, 0] - state["P"][:, 1]))) == 0.0


@pytest.mark.parametrize("scheme", ["kinetic", "hllc"])
def test_dam_break_stoker(scheme):
    """Flat-bottom dam break vs the Stoker similarity solution."""
    g = 9.81
    hl, hr = 1.0, 0.2
    n = 256
    L = 1.0
    cfg = river.RiverConfig(shape=(n, 2), L=L, g=g, scheme=scheme,
                            time_order=2)
    x = ((np.arange(n) + 0.5) / n - 0.5) * L
    P0 = np.where(x < 0.0, hl, hr)
    shape = (n, 2)
    state = {"P": jnp.asarray(np.broadcast_to(P0[:, None], shape)),
             "U": jnp.zeros(shape), "V": jnp.zeros(shape),
             "Zb": jnp.zeros(shape)}
    t_end = 0.06
    state, t, i = river.run(state, cfg, t_end=t_end)

    # Stoker: solve for cm (middle-state celerity)
    from scipy.optimize import brentq
    cl, cr = math.sqrt(g * hl), math.sqrt(g * hr)

    def f(cm):
        # rarefaction invariant u_m = 2(c_l - c_m) matched against the
        # Rankine-Hugoniot jump into still water of depth h_r
        hm = cm * cm / g
        return (2.0 * (cl - cm)
                - (hm - hr) * math.sqrt(g * (hm + hr) / (2.0 * hm * hr)))

    cm = brentq(f, cr * 1.0001, cl * 0.9999)
    hm = cm * cm / g
    um = 2.0 * (cl - cm)
    S = hm * um / (hm - hr)
    href = np.where(x < -cl * t_end, hl,
                    np.where(x < (um - cm) * t_end,
                             (2.0 * cl - x / t_end) ** 2 / (9.0 * g),
                             np.where(x < S * t_end, hm, hr)))
    err = np.abs(np.asarray(state["P"][:, 0]) - href).mean()
    assert err < 6e-3, (scheme, err)


def test_river_simulation_driver():
    """RiverSimulation + the shared Event machinery (OutputScalarSum)."""
    from gerris_tpu.models.simulation import Time
    from gerris_tpu.events import outputs as out
    n = 32
    cfg = river.RiverConfig(shape=(n, n), g=1.0)
    sums = []

    class VolSum(out.Event):
        def fire(self, sim, t, i):
            super().fire(sim, t, i)
            sums.append(float(jnp.sum(sim.state["P"])))

    sim = river.RiverSimulation(
        cfg, time=Time(end=0.2),
        events=[VolSum(istep=1)]).init(
            P=jnp.ones((n, n))
            + 0.01 * jnp.sin(jnp.linspace(0, 6.28, n))[:, None])
    sim.run()
    assert sim.time.t >= 0.2 - 1e-9
    assert len(sums) == sim.time.i
    assert abs(sums[-1] - sums[0]) < 1e-10 * sums[0]   # mass conserved


def test_subcritical_open_boundary():
    """("subcritical", hb) open boundary (GfsBcSubcritical,
    src/river.c:1495-1504): with hb equal to the rest depth nothing
    moves; with hb below it the channel drains toward hb."""
    cfg0 = river.RiverConfig(shape=(32, 4), g=1.0,
                             bcs=((("symmetry", "symmetry")),
                                  ("symmetry", "symmetry")))
    cfg = dataclasses.replace(
        cfg0, bcs=(("symmetry", ("subcritical", 1.0)),
                   ("symmetry", "symmetry")))
    z = jnp.zeros(cfg.shape)
    state = {"P": 1.0 + z, "U": z, "V": z, "Zb": z}
    s1, t, i = river.run(dict(state), cfg, t_end=1.0)
    assert float(jnp.max(jnp.abs(s1["U"]))) < 1e-12      # exact rest
    assert float(jnp.max(jnp.abs(s1["P"] - 1.0))) < 1e-12
    cfg2 = dataclasses.replace(
        cfg, bcs=(("symmetry", ("subcritical", 0.6)),
                  ("symmetry", "symmetry")))
    s2, t, i = river.run(dict(state), cfg2, t_end=2.0)
    # outflow through the right boundary: mean depth drops,
    # discharge is rightward, depth at the open end approaches hb
    assert float(jnp.mean(s2["P"])) < 0.95
    assert float(jnp.mean(s2["U"][-1])) > 0.0
    assert abs(float(jnp.mean(s2["P"][-1])) - 0.6) < 0.15
    assert bool(jnp.all(jnp.isfinite(s2["P"])))


def test_culvert_boyd87_reference_values():
    """Boyd-87 culvert hydraulics (modules/culvert/boyd87.c): spot
    values generated by compiling and running the reference C source
    (g=9.81; includes a non-converging outlet iteration whose
    limit-cycle endpoint is iteration-count sensitive)."""
    from gerris_tpu.physics import culvert as cv
    g = 9.81
    cases = [
        (cv.Q_inlet_box(1.0, 1.0, 0.6, 1, g), 1.39549),
        (cv.Q_inlet_box(2.5, 1.2, 1.2, 2, g), 5.16977),
        (cv.Q_inlet_pipe(0.5, 0.6, 1, g), 0.273168),
        (cv.Q_inlet_pipe(3.0, 1.2, 3, g), 5.15488),
        (cv.Q_outlet_box(2.0, 0.5, 1.0, 0.8, 0.01, 20.0, 0.015, 0.5, g),
         3.02206),
        (cv.Q_outlet_pipe(2.0, 0.5, 0.9, 0.01, 20.0, 0.015, 0.5, g),
         2.08742),
        (cv.Q_box(2.0, 0.5, 1.0, 0.8, 1, 0.01, 20.0, 0.015, 0.5, g),
         2.75138),
        (cv.Q_pipe(2.0, 0.5, 0.9, 1, 0.01, 20.0, 0.015, 0.5, g), 2.08742),
        (cv.Q_box(0.4, 0.1, 1.0, 0.8, 3, 0.005, 15.0, 0.02, 0.9, g),
         0.190338),
        (cv.Q_pipe(1.1, 0.9, 0.9, 2, 0.0, 10.0, 0.013, 0.2, g), 1.04937),
    ]
    for got, want in cases:
        assert abs(got - want) / want < 1e-4, (got, want)


def test_source_culvert_two_basins():
    """SourceCulvert on a two-basin GfsRiver domain: water drains from
    the high basin to the low one through the culvert; total volume is
    conserved and the head difference decreases monotonically."""
    from gerris_tpu.physics import culvert as cv
    from gerris_tpu.models.simulation import Time

    n = 32
    L = 100.0
    cfg = river.RiverConfig(shape=(n, n), L=L, g=9.81, dry=1e-6)
    x = (np.arange(n) + 0.5) / n - 0.5
    X, Y = np.meshgrid(x * L, x * L, indexing="ij")
    # central wall splits the domain; basins at different levels
    zb = np.where(np.abs(X) < 5.0, 10.0, 0.0)
    P0 = np.where(X < 0.0, 3.0, 1.0) * (np.abs(X) >= 5.0)
    pipe = cv.SourceCulvert(start=(-10.0, 0.0), end=(10.0, 0.0),
                            diameter=1.0, type="box", B=2.0,
                            entrance=1, n=0.015, ke=0.5)
    sim = river.RiverSimulation(cfg, time=Time(end=20.0, dtmax=0.5),
                                events=[pipe])
    sim.init(P=jnp.asarray(P0), Zb=jnp.asarray(zb))
    vol0 = float(jnp.sum(sim.state["P"]))
    h1_0 = float(sim.state["P"][8, 16])
    sim.run(max_steps=200)
    vol1 = float(jnp.sum(sim.state["P"]))
    h1_1 = float(sim.state["P"][8, 16])
    assert pipe.Q != 0.0                      # discharge engaged
    assert abs(vol1 - vol0) / vol0 < 1e-10    # pipe conserves volume
    assert h1_1 < h1_0                        # high basin drains
    assert np.isfinite(np.asarray(sim.state["P"])).all()


def test_gfs_river_with_culvert_parses_and_runs():
    """Minimal GfsRiver .gfs with a SourceCulvert: parses strict, builds
    a RiverSimulation, the culvert engages and conserves volume."""
    from gerris_tpu.utils import gfs_config as G

    gfs = """1 0 GfsRiver GfsBox GfsGEdge {} {
  Time { end = 10 dtmax = 0.5 }
  Refine 5
  PhysicalParams { L = 100 g = 9.81 }
  Init {} {
    Zb = (fabs(x) < 5. ? 10. : 0.)
    P = (fabs(x) >= 5. ? (x < 0. ? 3. : 1.) : 0.)
  }
  SourceCulvert (-10,0) (10,0) 1. { type = box B = 2. entrance = 1 n = 0.015 ke = 0.5 }
}
GfsBox {}
"""
    sim = G.build_simulation(G.parse_gfs(gfs, {}, strict=True))
    assert type(sim).__name__ == "RiverSimulation"
    assert sim.cfg.L == 100.0 and sim.cfg.g == 9.81
    vol0 = float(jnp.sum(sim.state["P"]))
    h_hi0 = float(sim.state["P"][8, 16])
    sim.run(max_steps=60)
    pipe = sim.events[0]
    assert pipe.Q != 0.0
    vol1 = float(jnp.sum(sim.state["P"]))
    assert abs(vol1 - vol0) / vol0 < 1e-10
    assert float(sim.state["P"][8, 16]) < h_hi0
    assert np.isfinite(np.asarray(sim.state["P"])).all()
