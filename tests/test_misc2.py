"""Gates for the round-2 breadth batch: CSG surfaces, graphics exports,
GfsVariable* events, CLI, sharded checkpoint, tools.

References: src/spatial.h (CSG), src/graphic.c + src/unstructured.c
(exports), src/variable.c + src/tension.c:390-760 (variables),
src/gerris.c (CLI), tools/*.c (tools), output.c parallel files
(sharded checkpoint).
"""
import math
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs


# ---------------------------------------------------------------- CSG

def test_csg_shapes():
    from gerris_tpu.utils.gfs_config import _maybe_shape
    from gerris_tpu.physics import vof
    grid = Grid(level=6, dim=2)
    phi = _maybe_shape(
        "(difference(ellipse(0,0,0.3,0.3), ellipse(0,0,0.15,0.15)))", {})
    assert phi is not None
    f = vof.fraction_from_levelset(grid, phi)
    area = float(jnp.sum(f)) * grid.h ** 2
    exact = math.pi * (0.3 ** 2 - 0.15 ** 2)
    assert abs(area - exact) / exact < 0.01, area
    # union adds, intersection restricts
    phi_u = _maybe_shape("(union(ellipse(-0.2,0,0.1,0.1), "
                         "ellipse(0.2,0,0.1,0.1)))", {})
    fu = vof.fraction_from_levelset(grid, phi_u)
    assert abs(float(jnp.sum(fu)) * grid.h ** 2
               - 2 * math.pi * 0.1 ** 2) < 0.002


# ----------------------------------------------------------- graphics

def test_vtk_and_isolines(tmp_path):
    from gerris_tpu.events import graphics as gfx
    grid = Grid(level=5, dim=2)
    x, y = grid.centers
    f = jnp.sqrt(x ** 2 + y ** 2)
    path = tmp_path / "out.vtk"
    gfx.write_vtk(str(path), grid, {"r": f}, {"vel": (x, y)})
    text = path.read_text()
    assert "STRUCTURED_POINTS" in text and "SCALARS r" in text
    assert "VECTORS vel" in text
    segs = gfx.isolines(f, grid, 0.25)
    L = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1]).sum()
    assert abs(L - 2 * math.pi * 0.25) / (2 * math.pi * 0.25) < 0.02


def test_streamlines_rotation():
    from gerris_tpu.events import graphics as gfx
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    U, V = -y, x                       # solid-body rotation
    lines = gfx.streamlines(U, V, grid, [(0.3, 0.0)], ds=0.01,
                            max_steps=300, both=False)
    r = np.hypot(lines[0][:, 0], lines[0][:, 1])
    assert len(lines[0]) > 100
    assert np.abs(r - 0.3).max() < 0.01, np.abs(r - 0.3).max()


def test_pipe_sink(tmp_path):
    from gerris_tpu.events import graphics as gfx
    out = tmp_path / "piped.txt"
    fp, close = gfx.open_sink("{ cat > %s }" % out)
    fp.write("hello pipe\n")
    close()
    assert out.read_text() == "hello pipe\n"


# ---------------------------------------------------------- variables

def _mini_sim(level=5, vof_circle=False):
    from gerris_tpu.models import ns
    from gerris_tpu.models.simulation import Simulation, Time
    from gerris_tpu.physics import vof
    grid = Grid(level=level, dim=2)
    kw = {}
    if vof_circle:
        fbc = bcs.default_scalar_bc(2)
        kw["vof_tracers"] = (("T", fbc),)
    cfg = ns.NSConfig(grid=grid,
                      u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
                      nu=0.0, **kw)
    sim = Simulation(cfg, time=Time(iend=0))
    sim.init()
    if vof_circle:
        sim.state["T"] = vof.fraction_from_levelset(
            grid, lambda x, y, z=0.0, t=0.0: 0.3 - jnp.sqrt(x**2 + y**2))
    return sim


def test_variable_average_and_function():
    from gerris_tpu.events.variables import VariableAverage, VariableFunction
    sim = _mini_sim()
    av = VariableAverage("Pm", "P")
    fn = VariableFunction("Q", lambda s: s.state["P"] + 1.0)
    for k in range(3):
        sim.state["P"] = jnp.full(sim.cfg.grid.shape, float(k))
        av.fire(sim, 0.0, k)
        fn.fire(sim, 0.0, k)
    assert float(jnp.max(jnp.abs(sim.state["Pm"] - 1.0))) < 1e-12
    assert float(jnp.max(jnp.abs(sim.state["Q"] - 3.0))) < 1e-12


def test_variable_position_distance():
    from gerris_tpu.events.variables import VariablePosition, VariableDistance
    sim = _mini_sim(level=6, vof_circle=True)
    px = VariablePosition("Px", "T", 0)
    py = VariablePosition("Py", "T", 1)
    dist = VariableDistance("D", "T")
    px.fire(sim, 0.0, 0)
    py.fire(sim, 0.0, 0)
    dist.fire(sim, 0.0, 0)
    X = np.asarray(sim.state["Px"])
    Y = np.asarray(sim.state["Py"])
    ifc = X < 1e29
    r = np.hypot(X[ifc], Y[ifc])
    assert ifc.sum() > 50
    assert np.abs(r - 0.3).max() < 1.5 * sim.cfg.grid.h
    D = np.asarray(sim.state["D"])
    x, y = [np.asarray(c) for c in sim.cfg.grid.centers]
    rr = np.hypot(x, y)
    inside = rr < 0.2
    outside = rr > 0.4
    assert (D[inside] > 0).all() and (D[outside] < 0).all()
    err = np.abs(np.abs(D) - np.abs(0.3 - rr))
    assert err[inside | outside].max() < 2 * sim.cfg.grid.h


def test_variable_age_tracer_source():
    """Age = tracer with unit source (GfsVariableAge)."""
    from gerris_tpu.models import ns
    grid = Grid(level=4, dim=2)
    fbc = bcs.default_scalar_bc(2)
    cfg = ns.NSConfig(grid=grid,
                      u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
                      nu=0.0, tracers=(("Age", fbc, 0.0, 1.0),))
    uf = [jnp.zeros(grid.face_shape(c)) for c in range(2)]
    A = jnp.zeros(grid.shape)
    A = ns.advect_tracer(A, cfg.tracers[0], uf, grid, cfg, 0.25, 0.0)
    A = ns.advect_tracer(A, cfg.tracers[0], uf, grid, cfg, 0.25, 0.0)
    assert float(jnp.max(jnp.abs(A - 0.5))) < 1e-12


# ---------------------------------------------------------------- CLI

GFS_MINI = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Refine 4
  Time { iend = 2 dtmax = 1e-2 }
  Init {} { U = (-y) V = (x) }
}
GfsBox {}
"""


def test_cli_run(tmp_path):
    from gerris_tpu import cli
    f = tmp_path / "mini.gfs"
    f.write_text(GFS_MINI)
    assert cli.main([str(f), "--dry-run"]) == 0
    assert cli.main([str(f), "-e", "OutputScalarNorm U"]) == 0
    assert cli.main(["-V"]) == 0


# ------------------------------------------------- sharded checkpoint

def test_sharded_checkpoint(tmp_path):
    from gerris_tpu.parallel import mesh as pmesh
    from gerris_tpu.parallel import checkpoint as ckpt
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = pmesh.make_mesh(4, dim=2)
    n = 32
    state = {"U": jnp.arange(n * n, dtype=jnp.float32).reshape(n, n),
             "P": jnp.ones((n, n), jnp.float32)}
    sharded = pmesh.shard_state(state, mesh)
    files = ckpt.save_sharded(str(tmp_path / "ck"), sharded,
                              meta={"t": 1.5})
    assert len(files) == 4
    back = ckpt.load_sharded(str(tmp_path / "ck"))
    for k in state:
        assert np.array_equal(np.asarray(back[k]), np.asarray(state[k])), k
    # gfscombine reassembles the same files
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.gfscombine import main as combine
    out = tmp_path / "full.npz"
    assert combine([str(out)] + files) == 0
    z = np.load(out, allow_pickle=True)
    assert np.array_equal(z["U"], np.asarray(state["U"]))


# -------------------------------------------------------------- tools

def test_shapes_tool(capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.shapes import main as shapes_main
    assert shapes_main(["star", "--number", "5"]) == 0
    outp = capsys.readouterr().out
    pts = [l.split() for l in outp.splitlines() if l.strip()]
    r = np.hypot(*np.asarray(pts, float).T)
    assert r.min() > 0.05 and r.max() < 0.45


def test_ppmcombine(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.ppmcombine import main as ppm_main, read_ppm, write_ppm
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.zeros((8, 8, 3), np.uint8)
    a[:4] = 200
    b[4:] = 100
    write_ppm(str(tmp_path / "a.ppm"), a)
    write_ppm(str(tmp_path / "b.ppm"), b)
    out = tmp_path / "c.ppm"
    assert ppm_main([str(out), str(tmp_path / "a.ppm"),
                     str(tmp_path / "b.ppm")]) == 0
    c = read_ppm(str(out))
    assert (c[:4] == 200).all() and (c[4:] == 100).all()


def test_debug_layer():
    """catch_fpe traps NaN-producing ops; check_state flags the
    reference's invariant violations (utils.c FPE traps +
    solid.c:990-1169-style checks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from gerris_tpu.utils import debug

    with pytest.raises(FloatingPointError):
        with debug.catch_fpe():
            jax.jit(lambda x: x / x)(jnp.zeros(4)).block_until_ready()
    assert not jax.config.jax_debug_nans      # restored
    ok = {"U": jnp.ones((4, 4)), "T": jnp.full((4, 4), 0.5)}
    assert debug.check_state(ok) == []
    bad = {"U": jnp.full((4, 4), jnp.nan), "T": jnp.full((4, 4), 1.5)}
    msgs = debug.check_state(bad)
    assert len(msgs) == 2 and "non-finite" in msgs[0]
    with pytest.raises(AssertionError):
        debug.assert_consistent(bad)
    # as an in-loop event on a real simulation
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.core import bc as bcs
    from gerris_tpu.models import ns
    from gerris_tpu.models.simulation import Simulation, Time
    sim = Simulation(ns.NSConfig(grid=Grid(level=4, dim=2),
                     u_bcs=(bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
                     nu=1e-2), time=Time(iend=2, dtmax=0.05),
                     events=[debug.CheckEvent()])
    sim.init(U=lambda x, y: jnp.sin(2 * jnp.pi * y))
    sim.run()
    assert sim.time.i == 2
