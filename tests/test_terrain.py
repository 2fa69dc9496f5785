"""Terrain (point-cloud bathymetry) gates — reference: modules/terrain.c."""
import numpy as np
import jax.numpy as jnp

from gerris_tpu.core.grid import Grid
from gerris_tpu.physics import terrain


def _cloud(n=60000, seed=0, hole=False):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.5, 0.5, n)
    y = rng.uniform(-0.5, 0.5, n)
    if hole:
        keep = ~((np.abs(x - 0.2) < 0.12) & (np.abs(y - 0.2) < 0.12))
        x, y = x[keep], y[keep]
    z = bed(x, y) + rng.normal(0.0, 1e-3, x.shape)
    return np.stack([x, y, z], -1)


def bed(x, y):
    return 0.3 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) + 0.1 * x


def test_height_accuracy():
    pts = _cloud()
    grid = Grid(level=5, dim=2)
    H = np.asarray(terrain.terrain_height(pts, grid))
    x, y = [np.asarray(c) for c in grid.centers]
    err = np.abs(H - bed(x, y))
    # plane-fit accuracy ~ curvature * h^2 + noise
    assert err.max() < 0.02, err.max()
    assert err.mean() < 0.004, err.mean()


def test_hole_filled_from_coarse():
    pts = _cloud(hole=True)
    grid = Grid(level=6, dim=2)
    H = np.asarray(terrain.terrain_height(pts, grid))
    x, y = [np.asarray(c) for c in grid.centers]
    err = np.abs(H - bed(x, y))
    hole = (np.abs(x - 0.2) < 0.1) & (np.abs(y - 0.2) < 0.1)
    assert np.isfinite(H).all()
    # inside the data hole the coarse-fit fill still approximates the bed
    assert err[hole].max() < 0.3, err[hole].max()
    assert err[~hole].mean() < 0.004


def test_refine_criterion_decreases():
    pts = _cloud()
    frac = []
    for level in (3, 4, 5):
        grid = Grid(level=level, dim=2)
        m = np.asarray(terrain.refine_criterion(pts, grid, tol=5e-3))
        frac.append(m.mean())
    # finer cells fit the curved bed better -> fewer cells above tol
    assert frac[0] > frac[-1], frac
    assert frac[-1] < 0.2, frac
