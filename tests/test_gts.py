"""Gates: GTS triangulated-surface input for embedded solids
(reference: src/surface.h:43-108 GfsSurface over GtsSurface; the
canonical consumer is test/hexagon — ``SolidMoving hexagon.gts
{ scale = 0.250001 }``).

The 2D gates use the reference's own hexagon.gts (a closed hexagonal
prism): z=0 sectioning must recover the hexagon polygon, the level-set
sign convention must match the implicit-shape path, and the cut-cell
Poisson machinery must run on the resulting fractions.  The 3D gate
checks parity ray-casting on a closed octahedron.
"""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.physics import gts
from gerris_tpu.physics.solid import poisson_solid_solve, solid_fractions
from gerris_tpu.solvers import poisson

HEX = "/root/reference/test/hexagon/hexagon.gts"

pytestmark = pytest.mark.skipif(not os.path.exists(HEX),
                                reason="reference not mounted")


def _hex_segments():
    v, f = gts.read_gts(HEX)
    return gts.section_z0(gts.transform(v, scale=0.250001), f)


def _shoelace(segs):
    return abs(sum(p0[0] * p1[1] - p1[0] * p0[1] for p0, p1 in segs)) / 2.0


def test_read_and_section():
    v, f = gts.read_gts(HEX)
    assert v.shape == (66, 3) and f.shape == (128, 3)
    # closed surface: every edge shared by exactly two faces
    from collections import Counter
    c = Counter()
    for (i, j, k) in f:
        for e in ((i, j), (j, k), (k, i)):
            c[tuple(sorted(e))] += 1
    assert all(n == 2 for n in c.values())
    segs = _hex_segments()
    # the z=0 section of the hexagonal prism: 6 unique edges (mesh nodes
    # sit exactly on the plane — degenerate/duplicate segments must be
    # filtered or the ray parity breaks)
    assert len(segs) == 6
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
    assert lengths.min() > 0.05


def test_polygon_phi_signs_and_distance():
    segs = _hex_segments()
    phi = gts.polygon_phi(segs)
    assert float(phi(0.0, 0.0)) > 0.10          # deep inside
    assert float(phi(0.45, 0.45)) < -0.2        # far outside
    # magnitude = distance to the nearest edge (probe against numpy)
    p = np.array([0.03, 0.01])
    d = min(np.linalg.norm(p - q) for s in segs
            for q in (s[0] + t * (s[1] - s[0])
                      for t in np.linspace(0, 1, 2001)))
    assert float(phi(*p)) == pytest.approx(d, rel=1e-3)
    # float32 grid sampling (the TPU path) stays finite
    g = Grid(level=6, dim=2)
    x, y = [jnp.asarray(c, jnp.float32) for c in g.centers]
    vals = phi(x, y)
    assert bool(jnp.isfinite(vals).all())


def test_fluid_fractions_match_polygon_area():
    """Cell fractions from the GTS level set integrate to the polygon
    area (the fraction machinery is the same as the implicit-shape
    path, so this gates the phi itself)."""
    segs = _hex_segments()
    area = _shoelace(segs)
    phi = gts.surface_phi(HEX, dim=2, scale=0.250001)
    grid = Grid(level=7, dim=2)
    # fluid outside the solid, as the parser wires Solid
    a, _ = solid_fractions(grid, lambda x, y, z=0.0, t=0.0: -phi(x, y))
    fluid = float(jnp.sum(a)) * grid.cell_volume
    assert fluid == pytest.approx(1.0 - area, rel=2e-4)


def test_cut_cell_poisson_on_gts_solid():
    """Poisson with the hexagon as embedded solid (test/hexagon's
    geometry under test/circle's solver setup): the cut-cell MG must
    converge at its usual rate."""
    phi = gts.surface_phi(HEX, dim=2, scale=0.250001)
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    rhs = -(math.pi ** 2) * 18 * jnp.sin(math.pi * 3 * x) * \
        jnp.sin(math.pi * 3 * y)
    fbc = bcs.default_scalar_bc(2)
    params = poisson.MultilevelParams(nitermin=8, nitermax=8, erelax=2)
    u, stats, a, s = poisson_solid_solve(
        rhs, grid, lambda xx, yy, z=0.0, t=0.0: -phi(xx, yy), fbc, params)
    red = float(stats.residual_before["infty"]) / \
        max(float(stats.residual_after["infty"]), 1e-300)
    assert red > 1e3
    assert bool(jnp.isfinite(u).all())


def test_parser_solid_gts():
    """``Solid file.gts { scale = ... }`` parses into a level-set solid
    exactly like the implicit-shape path (src/surface.c surface_read)."""
    from gerris_tpu.utils import gfs_config as G

    text = ("1 0 GfsPoisson GfsBox GfsGEdge {} {\n"
            "  Time { iend = 1 }\n"
            "  Refine 6\n"
            f"  Solid {HEX} {{ scale = 0.250001 }}\n"
            "  Init {} { Div = 0 }\n"
            "  ApproxProjectionParams { tolerance = 1e-30 nitermax = 2 }\n"
            "}\nGfsBox {}\n")
    sim = G.parse_gfs(text, {})
    assert sim.errors == []
    assert len(sim.solids) == 1
    # parser convention: solids[] is the FLUID level set (negated)
    assert float(sim.solids[0](0.0, 0.0)) < 0
    assert float(sim.solids[0](0.45, 0.45)) > 0


def test_polyhedron_phi_closed_octahedron():
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], float)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    phi = gts.polyhedron_phi(verts, faces)
    # centre: ray passes exactly through the apex — the jittered-parity
    # fix keeps it inside
    assert float(phi(0.0, 0.0, 0.0)) == pytest.approx(1 / math.sqrt(3),
                                                      rel=1e-4)
    assert float(phi(2.0, 0.0, 0.0)) == pytest.approx(-1.0, rel=1e-4)
    assert float(phi(0.3, 0.3, 0.3)) > 0
    # grid sampling stays finite and the inside volume is near the
    # octahedron's 4/3 (cell-counting on a coarse grid)
    n = 96
    c = (np.arange(n) + 0.5) / n * 3.0 - 1.5
    X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
    v = np.asarray(phi(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)))
    assert np.isfinite(v).all()
    vol = (v > 0).mean() * 27.0
    assert vol == pytest.approx(4.0 / 3.0, rel=2e-2)
