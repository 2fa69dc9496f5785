"""Output-breadth gates: dynamic filenames, solid force, histograms,
interface facets (reference: src/output.c gfs_format_new:70-267,
OutputSolidForce:902-990 + gfs_domain_solid_force src/domain.c:3502,
OutputScalarHistogram:2273, OutputInterface/gfs_vof_facet src/vof.c:2088).
"""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.events import outputs as out
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.physics import vof


class _FakeSim:
    def __init__(self, i, t):
        class T:
            pass
        self.time = T()
        self.time.i = i
        self.time.t = t


def test_format_filename():
    s = _FakeSim(42, 1.25)
    assert out.format_filename("sim-%ld.dat", s) == "sim-42.dat"
    assert out.format_filename("sim-%09d.gfs", s) == "sim-000000042.gfs"
    assert out.format_filename("t-%g.dat", s) == "t-1.25.dat"
    assert out.format_filename("plain.dat", s) == "plain.dat"
    assert out.format_filename(None, s) is None


def test_solid_force_archimedes():
    """P = c*y around an embedded circle: F_p = -integral of grad P over
    the solid = (0, -c * pi R^2) (Archimedes: hydrostatic p = -rho g y
    gives the upward rho g V)."""
    R = 0.2
    c = 3.0
    grid = Grid(level=7, dim=2)
    phi = lambda x, y, z=0.0, t=0.0: jnp.sqrt(x ** 2 + y ** 2) - R  # fluid>0
    u_bc = bcs.velocity_bc(0, 2)
    v_bc = bcs.velocity_bc(1, 2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0, solid_phi=phi)
    sim = Simulation(cfg, time=Time(iend=0))
    sim.init()
    x, y = grid.centers
    sim.state["P"] = c * y + jnp.zeros(grid.shape)
    sim.dt = 1.0
    ev = out.OutputSolidForce()
    ev.fire(sim, 0.0, 0)
    t_, fpx, fpy, fvx, fvy, mp, mv = ev.rows[0]
    exact = -c * math.pi * R ** 2
    assert abs(fpx) < 0.02 * abs(exact), fpx
    assert abs(fpy - exact) / abs(exact) < 0.05, (fpy, exact)


def test_scalar_histogram():
    grid = Grid(level=5, dim=2)
    u_bc = bcs.velocity_bc(0, 2)
    v_bc = bcs.velocity_bc(1, 2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0)
    sim = Simulation(cfg, time=Time(iend=0))
    sim.init()
    x, _ = grid.centers
    sim.state["P"] = x + jnp.zeros(grid.shape)    # uniform in [-.5,.5]
    ev = out.OutputScalarHistogram("P", n=8, vmin=-0.5, vmax=0.5,
                                   y=lambda s: 2.0 * s.state["P"])
    ev.fire(sim, 0.0, 0)
    counts = ev.last[:, 1]
    assert np.all(counts == counts[0])            # uniform distribution
    centers = ev.last[:, 0]
    ymean = ev.last[:, 2]
    assert np.allclose(ymean, 2.0 * centers, atol=0.05)


def test_interface_facets_circle():
    R = 0.3
    grid = Grid(level=6, dim=2)
    fbc = bcs.default_scalar_bc(2)
    T = vof.fraction_from_levelset(grid, lambda x, y, z=0.0, t=0.0:
                                   R - jnp.sqrt(x ** 2 + y ** 2))
    segs = vof.facets(T, grid, fbc)
    assert segs.shape[0] > 100
    # endpoints lie on the circle to O(h)
    for px, py in ((segs[:, 0], segs[:, 1]), (segs[:, 2], segs[:, 3])):
        r = np.sqrt(px ** 2 + py ** 2)
        assert np.max(np.abs(r - R)) < 1.5 * grid.h, np.max(np.abs(r - R))
    # total length approximates the circumference
    L = float(np.sum(np.hypot(segs[:, 2] - segs[:, 0],
                              segs[:, 3] - segs[:, 1])))
    assert abs(L - 2 * math.pi * R) / (2 * math.pi * R) < 0.02, L


def test_correlation_and_squares(tmp_path):
    """OutputCorrelation = sum(v ref)/sum(ref^2) incl. unbiased option
    (src/output.c:3076); OutputSquares writes colored OOGL squares
    (src/output.c:3181)."""
    grid = Grid(level=5, dim=2)
    u_bc = bcs.velocity_bc(0, 2)
    v_bc = bcs.velocity_bc(1, 2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0)
    sim = Simulation(cfg, time=Time(iend=0))
    sim.init()
    x, y = grid.centers
    ref = jnp.cos(2 * jnp.pi * x)
    sim.state["P"] = 0.7 * ref + 0.1           # scaled + biased copy
    ev = out.OutputCorrelation("P", lambda x, y: jnp.cos(2 * jnp.pi * x))
    ev.fire(sim, 0.0, 0)
    assert abs(ev.rows[0][1] - 0.7) < 1e-6     # bias orthogonal to cos
    ev2 = out.OutputCorrelation("P", lambda x, y: jnp.cos(2 * jnp.pi * x),
                                unbiased=True)
    ev2.fire(sim, 0.0, 0)
    assert abs(ev2.rows[0][1] - 0.7) < 1e-6
    p = tmp_path / "sq.oogl"
    out.OutputSquares("P", str(p)).fire(sim, 0.0, 0)
    txt = p.read_text()
    assert txt.splitlines()[0].strip().startswith("LIST") or "QUAD" in txt


def test_parser_wires_new_outputs(tmp_path):
    """OutputCorrelation / OutputSquares / OutputLocation through the
    .gfs parser."""
    from gerris_tpu.utils import gfs_config as G
    gfs = """1 0 GfsSimulation GfsBox GfsGEdge {} {
  Time { iend = 0 }
  VariableTracer T
  Init {} { T = cos(2.*M_PI*y) }
  OutputCorrelation { istep = 1 } %s { v = T } { s = cos(2.*M_PI*y) }
  OutputSquares { istep = 1 } %s { v = T min = -1 max = 1 }
  OutputLocation { istep = 1 } %s 0.25 0.25
}
GfsBox {}
""" % (tmp_path / "corr.dat", tmp_path / "sq-%ld.oogl",
       tmp_path / "loc.dat")
    ps = G.parse_gfs(gfs, {})
    sim = G.build_simulation(ps)
    assert not ps.errors, ps.errors
    kinds = {type(e).__name__ for e in sim.events}
    assert {"OutputCorrelation", "OutputSquares",
            "OutputLocation"} <= kinds, kinds
    sim.run()
    # the tracer is untouched at i=0, so the correlation is exactly 1
    corr = (tmp_path / "corr.dat").read_text()
    assert abs(float(corr.split()[-1]) - 1.0) < 1e-3, corr
    assert (tmp_path / "sq-0.oogl").exists()
    loc = (tmp_path / "loc.dat").read_text().strip().splitlines()
    assert len(loc) >= 1 and len(loc[0].split()) >= 5, loc


def test_adapt_stats_and_boundaries(tmp_path):
    """OutputAdaptStats leaf counts + OutputBoundaries outline/solid
    segments (src/output.c:660, 1607)."""
    import jax.numpy as jnp
    grid = Grid(level=5, dim=2)
    R = 0.25
    phi = lambda x, y, z=0.0, t=0.0: jnp.sqrt(x ** 2 + y ** 2) - R
    cfg = ns.NSConfig(grid=grid, u_bcs=(bcs.velocity_bc(0, 2),
                                        bcs.velocity_bc(1, 2)),
                      nu=0.0, solid_phi=phi)
    sim = Simulation(cfg, time=Time(iend=0)).init()
    st = out.OutputAdaptStats(file=str(tmp_path / "as.dat"))
    st.fire(sim, 0.0, 0)
    txt = (tmp_path / "as.dat").read_text()
    assert "Number of cells" in txt and st.counts == [1024]
    assert "Compression vs uniform: 1.000" in txt
    ob = out.OutputBoundaries(str(tmp_path / "b.dat"))
    ob.fire(sim, 0.0, 0)
    segs = [ln.split() for ln in
            (tmp_path / "b.dat").read_text().splitlines() if ln.strip()]
    pts = np.array([[float(a), float(b)] for a, b in segs])
    # 4 outline segments + circle facets; outline corners at +-0.5
    assert pts[:8].min() == -0.5 and pts[:8].max() == 0.5
    r = np.hypot(pts[8:, 0], pts[8:, 1])
    assert len(r) > 50 and np.abs(r - R).max() < 2 * grid.h
