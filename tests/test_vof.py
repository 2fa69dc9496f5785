"""VOF/PLIC unit layer (the unit tests the reference lacks, SURVEY.md §4)
plus geometry parity with src/vof.c behavior."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.physics import vof

R = 0.3


def circle_fractions(grid):
    return vof.fraction_from_levelset(grid, lambda x, y: R * R - x * x - y * y)


def test_line_geometry_roundtrip():
    rng = np.random.default_rng(0)
    m1 = rng.uniform(0, 1, 2000)
    m2 = 1.0 - m1
    c = rng.uniform(0, 1, 2000)
    a = vof.line_alpha_positive(m1, m2, c)
    c2 = vof.line_area_positive(m1, m2, a)
    assert float(jnp.max(jnp.abs(c2 - c))) < 1e-12


def test_rectangle_fraction_consistency():
    """Whole-cell rectangle equals line_area; halves sum to the whole."""
    rng = np.random.default_rng(1)
    m1 = rng.uniform(0.05, 0.95, 500)
    m2 = 1.0 - m1
    a = rng.uniform(0, 1, 500)
    whole = vof.line_area_positive(m1, m2, a)
    again = vof.rectangle_fraction(m1, m2, a, 0.0, 1.0, 0.0, 1.0)
    left = vof.rectangle_fraction(m1, m2, a, 0.0, 0.5, 0.0, 1.0)
    right = vof.rectangle_fraction(m1, m2, a, 0.5, 1.0, 0.0, 1.0)
    assert float(jnp.max(jnp.abs(again - whole))) < 1e-12
    assert float(jnp.max(jnp.abs(0.5 * (left + right) - whole))) < 1e-12


def test_normals_linear_interface():
    grid = Grid(level=6, dim=2)
    f = vof.fraction_from_levelset(grid, lambda x, y: 0.2 - y)
    fp = bcs.apply_bc(f, grid, bcs.default_scalar_bc(2), 1)
    mx, my = vof.mycs_normals(fp)
    ifc = (f > 0.01) & (f < 0.99)
    assert float(jnp.max(jnp.abs(jnp.where(ifc, mx, 0.0)))) < 1e-12
    assert float(jnp.min(jnp.where(ifc, my, 1.0))) == pytest.approx(1.0)


def test_init_fraction_volume():
    grid = Grid(level=6, dim=2)
    f = circle_fractions(grid)
    vol = float(jnp.sum(f)) * grid.cell_volume
    assert abs(vol - math.pi * R * R) / (math.pi * R * R) < 2e-3


def test_advection_translation():
    """Uniform translation: exact mass conservation, small shape error.
    (Analogue of the reference's test/advection.)"""
    grid = Grid(level=7, dim=2)
    per = bcs.periodic_bc(2)
    f0 = circle_fractions(grid)
    uf = [jnp.full(grid.face_shape(0), 1.0), jnp.full(grid.face_shape(1), 0.5)]
    dt = 0.45 * grid.h
    nst = int(round(0.5 / dt))
    f = f0
    for i in range(nst):
        f = vof.advect(f, uf, grid, per, dt, cstart=i % 2)
    tend = nst * dt
    x, y = grid.centers
    fe = vof.fraction_from_levelset(
        grid, lambda x, y: R * R
        - (jnp.mod(x - 1.0 * tend + 0.5, 1.0) - 0.5) ** 2
        - (jnp.mod(y - 0.5 * tend + 0.5, 1.0) - 0.5) ** 2)
    mass_drift = abs(float(jnp.sum(f) - jnp.sum(f0))) / float(jnp.sum(f0))
    shape_err = float(jnp.sum(jnp.abs(f - fe))) * grid.cell_volume
    assert mass_drift < 1e-12
    assert shape_err < 5e-4


def test_rotation_shape():
    """Solid-body rotation of a circle: shape preserved after a half turn
    (analogue of the reference's test/rotate)."""
    grid = Grid(level=7, dim=2)
    per = bcs.periodic_bc(2)
    f0 = vof.fraction_from_levelset(
        grid, lambda x, y: 0.15 ** 2 - (x - 0.2) ** 2 - y ** 2)
    xf, yf0 = grid.face_centers(0)
    xf1, yf = grid.face_centers(1)
    omega = 2 * math.pi
    uf = [-omega * yf0, omega * xf1]
    dt = 0.45 * grid.h / (omega * 0.5 * math.sqrt(2))
    nst = int(round(0.5 / dt))
    dt = 0.5 / nst
    f = f0
    for i in range(nst):
        f = vof.advect(f, uf, grid, per, dt, cstart=i % 2)
    fe = vof.fraction_from_levelset(
        grid, lambda x, y: 0.15 ** 2 - (x + 0.2) ** 2 - y ** 2)
    shape_err = float(jnp.sum(jnp.abs(f - fe))) * grid.cell_volume
    mass_drift = abs(float(jnp.sum(f) - jnp.sum(f0))) / float(jnp.sum(f0))
    print("rotation: shape", shape_err, "mass", mass_drift)
    assert mass_drift < 1e-10
    assert shape_err < 1.5e-3


def test_curvature_circle():
    """HF curvature of a circle (reference: curvature machinery validated
    through test/capwave & test/oscillation).  With fractions from the
    vertex-linearized level set the mean error is bounded by the O(h^2
    kappa) initialization noise (~1.5%); with exact fractions the operator
    itself converges at 2nd order (5.5e-3 -> 1.6e-3 -> 3.6e-4 over levels
    5-7, measured)."""
    for lev in (6, 7):
        grid = Grid(level=lev, dim=2)
        f = circle_fractions(grid)
        k = vof.curvature(f, grid, bcs.default_scalar_bc(2))
        kv = np.asarray(k)[np.isfinite(np.asarray(k))]
        assert kv.size > 0
        assert abs(float(np.mean(kv)) * R - 1.0) < 0.03
        assert float(np.max(np.abs(kv * R - 1.0))) < 0.35


def test_3d_plane_geometry():
    """3D PLIC closed form: volume/alpha roundtrip + known cases
    (reference: gfs_plane_volume src/vof.c:288, gfs_plane_alpha:344)."""
    rng = np.random.default_rng(3)
    m = rng.dirichlet((1, 1, 1), 500)
    c = rng.uniform(0, 1, 500)
    a = vof.plane_alpha_positive(m[:, 0], m[:, 1], m[:, 2], c)
    c2 = vof.plane_volume_positive(m[:, 0], m[:, 1], m[:, 2], a)
    assert float(jnp.max(jnp.abs(c2 - c))) < 1e-10
    # diagonal plane through the centre cuts the cube in half
    v = float(vof.plane_volume_positive(jnp.array(1/3), jnp.array(1/3),
                                        jnp.array(1/3), jnp.array(0.5)))
    assert abs(v - 0.5) < 1e-12


def test_3d_sphere_fraction_and_advection():
    from gerris_tpu.core.grid import Grid as G3
    grid = G3(level=5, dim=3, origin=(-0.5, -0.5, -0.5))
    R = 0.25
    f0 = vof.fraction_from_levelset(
        grid, lambda x, y, z: R * R - x * x - y * y - z * z)
    vol = float(jnp.sum(f0)) * grid.cell_volume
    exact = 4.0 / 3.0 * math.pi * R ** 3
    # 32^3, R = 8 cells: the per-cell plane linearization carries
    # O((h/R)^2) volume error ~ 1.2% at this resolution
    assert abs(vol - exact) / exact < 2e-2
    per = bcs.periodic_bc(3)
    uf = [jnp.full(grid.face_shape(0), 1.0),
          jnp.full(grid.face_shape(1), 0.5),
          jnp.full(grid.face_shape(2), -0.25)]
    dt = 0.4 * grid.h
    f = f0
    for i in range(10):
        f = vof.advect(f, uf, grid, per, dt, cstart=i % 3)
    drift = abs(float(jnp.sum(f) - jnp.sum(f0))) / float(jnp.sum(f0))
    assert drift < 1e-10
    assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) <= 1.0


def test_concentration_coadvection():
    """VOF concentration co-advection (GfsVariableVOFConcentration,
    src/vof.c:962-1010, 1476-1577): a phase-intensive field rides the
    geometric phase fluxes — conserved, bounded, confined to the phase."""
    grid = Grid(level=6, dim=2)
    fbc = bcs.periodic_bc(2)
    x, y = grid.centers
    f = vof.fraction_from_levelset(
        grid, lambda X, Y, z=0.0, t=0.0: 0.15 - jnp.abs(X))
    c = jnp.where(f > 0.5, 1.0 + jnp.cos(2 * jnp.pi * y), 0.0)
    ux = jnp.ones((grid.shape[0] + 1, grid.shape[1]))
    uy = jnp.zeros((grid.shape[0], grid.shape[1] + 1))
    dt = 0.4 * grid.h
    mass0 = float(jnp.sum(c * f))
    f1, cs = f, [c]
    for i in range(24):
        f1, cs = vof.advect(f1, [ux, uy], grid, fbc, dt, cstart=i % 2,
                            concentrations=cs)
    c1 = cs[0]
    mass1 = float(jnp.sum(c1 * f1))
    assert abs(mass1 - mass0) / mass0 < 1e-10, (mass0, mass1)
    # boundedness (no new extrema) and confinement to the phase
    assert float(jnp.max(c1)) <= float(jnp.max(c)) + 1e-9
    assert float(jnp.min(c1)) >= -1e-12
    assert float(jnp.max(jnp.abs(jnp.where(f1 < 1e-9, c1, 0.0)))) < 1e-9
    # the slab translated by 24*dt: its center moved accordingly
    xc0 = float(jnp.sum(x * f) / jnp.sum(f))
    xc1raw = float(jnp.sum(x * f1) / jnp.sum(f1))
    expect = xc0 + 24 * dt
    # periodic wrap-aware comparison
    d = (xc1raw - expect + 0.5) % 1.0 - 0.5
    assert abs(d) < 2 * grid.h, (xc0, xc1raw, expect)
