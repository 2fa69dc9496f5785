"""Navier BC + event utilities gates (reference: src/boundary.c
GfsBcNavier, src/event.c EventSum/Harmonic/Script/Filter/RemoveDroplets,
src/init.c InitVorticity)."""
import math
import os

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.events import variables as ev


def _sim(level=5, vof=False):
    from gerris_tpu.models import ns
    from gerris_tpu.models.simulation import Simulation, Time
    grid = Grid(level=level, dim=2)
    kw = {}
    if vof:
        kw["vof_tracers"] = (("T", bcs.default_scalar_bc(2)),)
    cfg = ns.NSConfig(grid=grid,
                      u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
                      nu=0.0, **kw)
    s = Simulation(cfg, time=Time(iend=0))
    s.init()
    return s


def test_navier_bc_limits():
    """lambda=0 reproduces Dirichlet-0; huge lambda reproduces Neumann."""
    grid = Grid(level=4, dim=2)
    u = jnp.arange(16.0 * 16).reshape(16, 16) / 256.0
    nav0 = bcs.FieldBC.uniform(bcs.Navier(0.0), 2)
    diri = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    navinf = bcs.FieldBC.uniform(bcs.Navier(1e12), 2)
    neum = bcs.FieldBC.uniform(bcs.Neumann(), 2)
    for corners in (True, False):
        a = bcs.apply_bc(u, grid, nav0, 1, corners=corners)
        b = bcs.apply_bc(u, grid, diri, 1, corners=corners)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-12
        c = bcs.apply_bc(u, grid, navinf, 1, corners=corners)
        d = bcs.apply_bc(u, grid, neum, 1, corners=corners)
        assert float(jnp.max(jnp.abs(c - d))) < 1e-9
    # intermediate slip length: ghost/interior ratio matches the formula
    lam = 0.05
    e = bcs.apply_bc(u, grid, bcs.FieldBC.uniform(bcs.Navier(lam), 2), 1)
    ratio = (2 * lam - grid.h) / (2 * lam + grid.h)
    assert abs(float(e[0, 5] / e[1, 5]) - ratio) < 1e-12


def test_event_sum_and_filter():
    s = _sim()
    es = ev.EventSum("Pt", "P")
    s.state["P"] = jnp.ones(s.cfg.grid.shape)
    s.time.t = 0.0
    es.fire(s, 0.0, 0)
    s.time.t = 0.5
    es.fire(s, 0.5, 1)
    s.time.t = 1.5
    es.fire(s, 1.5, 2)
    assert float(jnp.max(jnp.abs(s.state["Pt"] - 1.5))) < 1e-12
    # filter: constant field is invariant; a delta spreads
    x, y = s.cfg.grid.centers
    s.state["Q"] = jnp.ones(s.cfg.grid.shape)
    f = ev.EventFilter("Q")
    f.fire(s, 0.0, 0)
    assert float(jnp.max(jnp.abs(s.state["Q"] - 1.0))) < 1e-12


def test_event_harmonic_recovers_amplitudes():
    s = _sim(level=3)
    w = 2.0
    eh = ev.EventHarmonic("P", [w])
    for k in range(24):
        t = 0.3 * k
        s.time.t = t
        s.state["P"] = (1.5 + 2.0 * math.sin(w * t)
                        - 0.7 * math.cos(w * t)) * jnp.ones((8, 8))
        eh.fire(s, t, k)
    assert abs(float(jnp.mean(s.state["PZ"])) - 1.5) < 1e-8
    assert abs(float(jnp.mean(s.state["PA0"])) - 2.0) < 1e-8
    assert abs(float(jnp.mean(s.state["PB0"])) - (-0.7)) < 1e-8


def test_event_script(tmp_path):
    s = _sim(level=3)
    out = tmp_path / "es.txt"
    sc = ev.EventScript(f'echo "$GFS_I $GFS_T" >> {out}')
    s.time.t = 0.25
    s.time.i = 3
    sc.fire(s, 0.25, 3)
    assert out.read_text().strip() == "3 0.25"
    assert sc.returncodes == [0]


def test_remove_droplets_event():
    from gerris_tpu.physics import vof
    s = _sim(level=6, vof=True)
    grid = s.cfg.grid

    def phi(x, y, z=0.0, t=0.0):
        big = 0.2 - jnp.sqrt((x + 0.2) ** 2 + y ** 2)
        tiny = 0.02 - jnp.sqrt((x - 0.3) ** 2 + (y - 0.3) ** 2)
        return jnp.maximum(big, tiny)

    s.state["T"] = vof.fraction_from_levelset(grid, phi)
    vol0 = float(jnp.sum(s.state["T"]))
    ev.RemoveDroplets("T", min_cells=20).fire(s, 0.0, 0)
    vol1 = float(jnp.sum(s.state["T"]))
    assert vol1 < vol0                       # the tiny droplet went away
    x, y = grid.centers
    tiny_region = (jnp.sqrt((x - 0.3) ** 2 + (y - 0.3) ** 2) < 0.05)
    assert float(jnp.sum(jnp.where(tiny_region, s.state["T"], 0.0))) < 1e-12
    big_region = (jnp.sqrt((x + 0.2) ** 2 + y ** 2) < 0.15)
    assert float(jnp.sum(jnp.where(big_region, s.state["T"], 0.0))) > 10.0


def test_init_vorticity():
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    om = jnp.exp(-((x / 0.1) ** 2 + (y / 0.1) ** 2))
    U, V = ev.init_vorticity(om, grid, None)
    # curl(U, V) must reproduce omega (away from the walls)
    h = grid.h
    curl = ((V[2:, 1:-1] - V[:-2, 1:-1]) - (U[1:-1, 2:] - U[1:-1, :-2])) \
        / (2 * h)
    err = jnp.abs(curl - om[1:-1, 1:-1])
    interior = (jnp.abs(x[1:-1, 1:-1]) < 0.3) & (jnp.abs(y[1:-1, 1:-1])
                                                 < 0.3)
    rel = float(jnp.max(jnp.where(interior, err, 0.0)))
    assert rel < 0.02 * float(jnp.max(om)), rel


def test_variable_laplacian_and_poisson():
    """VariableLaplacian / VariablePoisson round-trip: lap then solve
    recovers the field (src/variable.c:1127-1330)."""
    import jax.numpy as jnp
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.events import variables as var
    from gerris_tpu.models import ns
    from gerris_tpu.models.simulation import Simulation, Time

    grid = Grid(level=6, dim=2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(bcs.velocity_bc(0, 2),
                                        bcs.velocity_bc(1, 2)), nu=0.0)
    sim = Simulation(cfg, time=Time(iend=0)).init()
    x, y = grid.centers
    f = jnp.cos(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y)
    sim.state["F"] = f
    var.VariableLaplacian("LapF", "F").fire(sim, 0.0, 0)
    lap = sim.state["LapF"]
    # interior: lap(f) = -8 pi^2 f to O(h^2)
    e = lap[2:-2, 2:-2] / (-8 * jnp.pi ** 2) - f[2:-2, 2:-2]
    assert float(jnp.max(jnp.abs(e))) < 2e-2
    ev = var.VariablePoisson("Back", "LapF")
    ev.fire(sim, 0.0, 0)
    back = sim.state["Back"]
    err = back - (f - jnp.mean(f))
    assert float(jnp.max(jnp.abs(err))) < 5e-3, float(jnp.max(jnp.abs(err)))


def test_output_maxima_progress_grd(tmp_path):
    """OutputScalarMaxima top-N, OutputGrd ESRI raster, OutputProgress
    (src/output.c:2155, 3404)."""
    import numpy as np
    import jax.numpy as jnp
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.events import outputs as out
    from gerris_tpu.models import ns
    from gerris_tpu.models.simulation import Simulation, Time

    grid = Grid(level=4, dim=2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(bcs.velocity_bc(0, 2),
                                        bcs.velocity_bc(1, 2)), nu=0.0)
    sim = Simulation(cfg, time=Time(iend=0, end=1.0)).init()
    x, y = grid.centers
    sim.state["P"] = jnp.exp(-20 * ((x - 0.2) ** 2 + y ** 2))
    mx = out.OutputScalarMaxima("P", n=3, file=str(tmp_path / "max.dat"))
    mx.fire(sim, 0.0, 0)
    t_, k, px, py, pz, v = mx.rows[0]
    assert abs(px - 0.2) < 2 * grid.h and abs(py) < 2 * grid.h
    assert v == max(r[-1] for r in mx.rows)
    g = out.OutputGrd("P", str(tmp_path / "p.grd"))
    g.fire(sim, 0.0, 0)
    lines = (tmp_path / "p.grd").read_text().splitlines()
    assert lines[0].split() == ["ncols", "16"]
    assert lines[4].split()[0] == "cellsize"
    data = np.array([[float(c) for c in ln.split()] for ln in lines[6:]])
    assert data.shape == (16, 16)
    # northern row first: raster[r, c] = F[c, ny-1-r]
    F = np.asarray(sim.state["P"])
    assert np.allclose(data, F.T[::-1], atol=1e-5)   # %g file precision
    out.OutputProgress(file=str(tmp_path / "prog.dat")).fire(sim, 0.0, 0)
    assert "% done" in (tmp_path / "prog.dat").read_text()
