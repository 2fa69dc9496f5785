"""df3 / adaptive integration / tide gates (reference: modules/df3.c,
modules/adaptiveintegration.c, modules/tide.c)."""
import math
import struct

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.utils import extras


def test_df3_roundtrip(tmp_path):
    grid = Grid(level=4, dim=2)
    x, y = grid.centers
    f = jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y)
    p = tmp_path / "t.df3"
    extras.write_df3(str(p), f)
    raw = p.read_bytes()
    nx, ny, nz = struct.unpack(">HHH", raw[:6])
    assert (nx, ny, nz) == (16, 16, 1)
    v = np.frombuffer(raw[6:], dtype=">u2").reshape(nz, ny, nx)
    back = v.transpose(2, 1, 0)[:, :, 0] / 65535.0
    fn = np.asarray(f)
    expect = (fn - fn.min()) / (fn.max() - fn.min())
    assert np.abs(back - expect).max() < 1e-4


def test_adaptive_integral_converges():
    """Cell means of a sharp function converge to the analytic mean."""
    grid = Grid(level=4, dim=2)

    def fn(x, y):
        return jnp.where(x * x + y * y < 0.3 ** 2, 1.0, 0.0)

    m = extras.adaptive_cell_integral(fn, grid, tol=1e-5, max_level=7)
    area = float(jnp.sum(m)) * grid.h ** 2
    exact = math.pi * 0.09
    assert abs(area - exact) / exact < 0.01, area
    # and far better than the plain midpoint estimate
    x, y = grid.centers
    mid = float(jnp.sum(fn(x, y))) * grid.h ** 2
    assert abs(area - exact) < 0.2 * abs(mid - exact)
    # smooth functions converge immediately (single refinement)
    m2 = extras.adaptive_cell_integral(
        lambda x, y: x + y, grid, tol=1e-12, max_level=3)
    x, y = grid.centers
    assert float(jnp.max(jnp.abs(m2 - (x + y)))) < 1e-12


def test_tidal_elevation():
    eta = extras.tidal_elevation(
        {"M2": (1.0, 0.0), "S2": (0.5, 90.0)})
    t0 = 0.0
    v0 = float(eta(0.0, 0.0, t0))
    assert abs(v0 - (1.0 + 0.5 * math.cos(-math.pi / 2))) < 1e-12
    # M2 periodicity
    TM2 = 2 * math.pi / extras.CONSTITUENTS["M2"]
    vT = float(eta(0.0, 0.0, TM2))
    w_s2 = extras.CONSTITUENTS["S2"]
    expect = 1.0 + 0.5 * math.cos(w_s2 * TM2 - math.pi / 2)
    assert abs(vT - expect) < 1e-9
    # spatial amplitude
    eta2 = extras.tidal_elevation({"M2": (lambda x, y: 2.0 + x, 0.0)})
    assert abs(float(eta2(0.5, 0.0, 0.0)) - 2.5) < 1e-12


def test_cartesian_grid(tmp_path):
    """GfsCartesianGrid text format + multilinear lookup
    (src/cartesian.c:31-467)."""
    p = tmp_path / "cg.dat"
    p.write_text("2\n3 0 1 2\n2 0 10\n"
                 "0 1\n2 3\n4 5\n")     # v[i,j] = 2i + j
    g = extras.CartesianGrid.read(str(p))
    assert abs(float(g(1.0, 0.0)) - 2.0) < 1e-12
    assert abs(float(g(1.5, 5.0)) - (3.0 + 0.5)) < 1e-12
    # clamped outside the table
    assert abs(float(g(5.0, 20.0)) - 5.0) < 1e-12


def test_wave_source_physics():
    """Wind input grows downwind bins, whitecapping caps growth
    (the wavewatch-seam physics)."""
    from gerris_tpu.core.grid import Grid
    from gerris_tpu.models import wave
    cfg = wave.WaveConfig(grid=Grid(level=4, dim=2), nk=25, ntheta=8,
                          g=9.81)
    src = extras.wave_source_physics(cfg, u10=15.0, wind_dir=0.0)
    F = jnp.full((cfg.nk, cfg.ntheta, 16, 16), 1e-4)
    F1 = src(F, 10.0)
    # downwind (theta=0) bins grow, upwind (theta=pi) bins only decay
    assert float(jnp.sum(F1[:, 0])) > float(jnp.sum(F[:, 0]))
    assert float(jnp.sum(F1[:, 4])) <= float(jnp.sum(F[:, 4])) + 1e-12
    assert bool(jnp.all(jnp.isfinite(F1)))
