"""The .gfs configuration layer: parse the reference's own test configs and
run them (reference: the simulation file IS the API, SURVEY.md intro;
parser gfs_simulation_read src/simulation.c:1276)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.utils import gfs_config as G
from gerris_tpu.ops.stencils import norms, unbiased_error

REF = "/root/reference/test"


def load(path, **defines):
    return G.parse_gfs(open(f"{REF}/{path}").read(),
                       {k: str(v) for k, v in defines.items()})


def test_parse_all_baseline_configs():
    cases = [
        ("poisson/poisson.gfs", dict(LEVEL=6, CYCLE=10, SOLVER="gerris")),
        ("lid/lid.gfs", {}),
        ("circle/circle.gfs", dict(LEVEL=6, CYCLE=5, SOLVER="gerris")),
        ("capwave/capwave.gfs", dict(LEVEL=4)),
        ("oscillation/oscillation.gfs", dict(LEVEL=5, DIAMETER=0.2)),
    ]
    for path, defines in cases:
        sim = load(path, **defines)
        assert sim.level >= 4, path
    cap = load("capwave/capwave.gfs", LEVEL=4)
    assert cap.box_stack == (1, 3) and 0 in cap.periodic
    assert cap.tension == [("T", 1.0)]
    circ = load("circle/circle.gfs", LEVEL=6, CYCLE=5, SOLVER="gerris")
    assert len(circ.solids) == 1
    lid = load("lid/lid.gfs")
    assert lid.boundaries["top"]["U"][1] == 1.0
    assert lid.nu == 1e-3


def test_run_poisson_from_gfs():
    """End-to-end: the reference's own poisson.gfs through our parser and
    GfsPoisson driver reproduces the test/poisson error norms
    (test/poisson/error.ref row 4: level 6)."""
    sim = load("poisson/poisson.gfs", LEVEL=6, CYCLE=10, SOLVER="gerris")
    ps = G.build_simulation(sim)
    ps.run()
    x, y = ps.grid.centers
    exact = jnp.sin(math.pi * 3 * x) * jnp.sin(math.pi * 3 * y)
    e = unbiased_error(ps.state["P"] - exact)
    n = norms(e)
    # error.ref level 6: 8.689e-04 1.096e-03 2.714e-03
    assert abs(float(n["first"]) - 8.689e-04) / 8.689e-04 < 0.05
    assert abs(float(n["second"]) - 1.096e-03) / 1.096e-03 < 0.05


def test_run_circle_from_gfs():
    """circle.gfs (embedded solid) parses and solves with converging MG."""
    sim = load("circle/circle.gfs", LEVEL=6, CYCLE=8, SOLVER="gerris")
    ps = G.build_simulation(sim)
    ps.run()
    assert float(ps.stats.residual_after["infty"]) < \
        1e-6 * float(ps.stats.residual_before["infty"])
    # solid is the ellipse(0,0,0.25,0.25): fluid fraction outside
    a = ps.state["A"]
    area = float(jnp.sum(1.0 - a)) * ps.grid.cell_volume
    assert abs(area - math.pi * 0.25 ** 2) / (math.pi * 0.25 ** 2) < 5e-3


def test_expression_translation():
    fn = G.translate_expr("(y - 0.01*cos (2.*M_PI*x))")
    assert abs(float(fn(0.0, 0.01)) - 0.0) < 1e-12
    fn2 = G.translate_expr(
        "{ int k = 3, l = 3; return -M_PI*M_PI*(k*k + l*l)*sin (M_PI*k*x)*sin (M_PI*l*y); }")
    assert abs(float(fn2(0.5 / 3, 0.5 / 3)) -
               (-math.pi ** 2 * 18)) < 1e-9


def test_translate_dx_dy():
    """GfsFunction derivative helpers dx()/dy() (src/utils.c function.h
    injected into compiled functions)."""
    import jax.numpy as jnp
    from gerris_tpu.utils.gfs_config import translate_expr
    from gerris_tpu.core.grid import Grid
    fn = translate_expr("dx(x*x) + dy(3.*y)")
    grid = Grid(level=5, dim=2)
    x, y = grid.centers
    out = fn(x, y)
    # d(x^2)/dx = 2x (exact for central diff of a parabola), d(3y)/dy = 3
    err = jnp.abs(out - (2 * x + 3.0))
    assert float(err[1:-1, 1:-1].max()) < 1e-10


def test_build_3d():
    """build_simulation(dim=3): the dimension-agnostic .gfs format run in
    3D (the reference's gerris3D binary on the same file, src/ftt.h
    FTT_DIMENSION)."""
    gfs = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Time { iend = 2 dtmax = 0.02 }
  Refine 4
  VariableTracer T
  Init {} {
    U = 0.25
    T = exp(-50.*(x*x + y*y + z*z))
  }
}
GfsBox { front = Boundary { BcDirichlet T 0 } }
"""
    ps = G.parse_gfs(gfs, {})
    sim = G.build_simulation(ps, dim=3)
    assert not ps.errors, ps.errors
    assert sim.cfg.grid.dim == 3 and sim.cfg.grid.shape == (16, 16, 16)
    # the z-dependent Init actually varied along z
    T0 = np.asarray(sim.state["T"])
    assert T0.std(axis=2).max() > 1e-3
    mass0 = float(T0.sum())
    sim.run()
    T1 = np.asarray(sim.state["T"])
    assert np.isfinite(T1).all()
    # tracer advected by uniform U: mass conserved (periodic-free interior)
    assert abs(float(T1.sum()) - mass0) / mass0 < 1e-3
    # front BC parsed onto the tracer's z-axis
    tb = sim.cfg.tracers[0][1]
    assert tb.sides[2][1].kind == "dirichlet"


def test_gfs_global_block():
    """GfsGlobal C blocks feed the GfsFunction namespace
    (src/utils.c:382-398): #define constants, function-like macros,
    single-return C functions, and global const declarations all become
    visible to every expression in the file."""
    gfs = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Time { end = 1 }
  Refine 4
  Global {
      #define A0 0.5
      #define SQ(a) ((a)*(a))
      double channel (double x) {
          double y1 = 0.2/4.;
          double y2 = 1e-6/4.;
          return x <= -0.25 ? y1 : x < 0.25 ?
              y2 + 0.5*(y1 - y2)*(1. + cos (2.*M_PI*(x + 0.25))) : y2;
      }
      static double B = A0*2.;
  }
  Init {} { U = A0*channel(x) + SQ(y) + B }
}
GfsBox {}
"""
    sim = G.parse_gfs(gfs, {}, strict=True)
    fn = sim.inits["U"]
    x = np.array([0.0, -0.3, 0.3])
    y = np.array([1.0, 2.0, 0.0])
    y1, y2 = 0.2 / 4.0, 1e-6 / 4.0
    ch = np.array([y2 + 0.5 * (y1 - y2) * (1 + np.cos(2 * np.pi * 0.25)),
                   y1, y2])
    want = 0.5 * ch + y ** 2 + 1.0
    assert np.allclose(fn.np(x, y), want)


def test_strict_mode_raises_on_unknown_directive():
    bad = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Time { end = 1 }
  FrobnicateQuux { istep = 1 } 3.0
}
GfsBox {}
"""
    import warnings

    with pytest.raises(ValueError, match="FrobnicateQuux"):
        G.parse_gfs(bad, {}, strict=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim = G.parse_gfs(bad, {})
    assert sim.unknown_directives == ["FrobnicateQuux"]
    assert any("FrobnicateQuux" in str(x.message) for x in w)
