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


# ---------------------------------------------------------------------------
# TOPICS tsunami sources (modules/topics.c)
# ---------------------------------------------------------------------------

def test_topics_submarine_landslide_shape():
    """Watts translational slide: dipole free surface (trough shoreward
    of crest along the slide axis), sech^2 transverse decay, linear-wave
    velocities only where eta > 0, correct rotation."""
    import warnings
    import numpy as np
    import jax.numpy as jnp
    from gerris_tpu.physics import topics

    n = 200
    xs = np.linspace(-5000.0, 5000.0, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    kw = dict(depth=500.0, theta=10.0, length=1000.0, thickness=100.0,
              width=500.0, gamma=1.85)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        eta, u, v = topics.submarine_landslide(jnp.asarray(X),
                                               jnp.asarray(Y), **kw)
    eta = np.asarray(eta)
    assert np.isfinite(eta).all()
    # dipole: both signs present, trough deeper than crest (nmin ~ -2x)
    assert eta.min() < 0 < eta.max()
    assert abs(eta.min()) > eta.max()
    # alpha=0 frame: slide axis qx = +y (grid j), transverse qy = -x
    # (grid i) — transverse decay checked along i
    icrest, jcrest = np.unravel_index(np.abs(eta).argmax(), eta.shape)
    ioff = np.argmin(np.abs(xs - 4 * kw["width"]))
    assert abs(eta[ioff, jcrest]) < 0.1 * abs(eta[icrest, jcrest])
    # velocity points along +y (alpha=0: u = 0, v = +) where eta > 0
    assert float(np.abs(np.asarray(u)).max()) < 1e-12
    vv = np.asarray(v)
    assert (vv[eta <= 0] == 0).all()
    assert vv[eta > 0].max() > 0

    # rotation equivariance: alpha=90 swaps the axes
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        eta90, u90, v90 = topics.submarine_landslide(
            jnp.asarray(X), jnp.asarray(Y), alpha=90.0, **kw)
    # eta90[i,j] = f(-x_i, -x_j) = eta[j, n-1-i] on the symmetric grid
    assert np.allclose(np.asarray(eta90), eta[:, ::-1].T, atol=1e-8)


def test_topics_runout_sources():
    """Subaerial landslide / pyroclastic flow: single-crest sech^2 in
    both directions with amplitude min(etal, etat, 0.86 depth)."""
    import warnings
    import numpy as np
    import jax.numpy as jnp
    from gerris_tpu.physics import topics

    n = 160
    xs = np.linspace(-8000.0, 8000.0, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    kw = dict(depth=100.0, volume=2e7, width=1000.0, ut=40.0,
              so=1000.0, to=60.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        eta, u, v = topics.subaerial_landslide(jnp.asarray(X),
                                               jnp.asarray(Y), **kw)
        eta2, _, _ = topics.pyroclastic_flow(jnp.asarray(X),
                                             jnp.asarray(Y), **kw)
    eta = np.asarray(eta)
    assert np.isfinite(eta).all()
    assert eta.min() >= 0.0                    # single crest
    g = 9.81
    lam = 0.27 * kw["to"] * np.sqrt(g * kw["depth"])
    etal = 1.32 * kw["depth"] * (
        kw["volume"] * 2 * kw["ut"]
        / (np.pi * kw["width"] * kw["so"] * kw["depth"]
           * np.sqrt(kw["depth"] * g))) ** 0.68
    etat = 1.32 * kw["depth"] * (
        kw["volume"] / (kw["width"] * kw["to"] * kw["depth"]
                        * np.sqrt(kw["depth"] * g))) ** 0.68
    eta0 = min(etal, etat, 0.86 * kw["depth"])
    # the volume-consistency branch (topics.c:739-742) rescales eta0
    term = 4.0 * eta0 * (kw["width"] + lam) * lam / kw["volume"]
    if (kw["width"] + lam) / term < lam:
        term = (kw["width"] + lam) / lam
        eta0 = term * kw["volume"] / (4.0 * (kw["width"] + lam) * lam)
    assert abs(eta.max() - eta0) / eta0 < 0.05
    # crest sits at qx = so + lambda: grid j (the alpha=0 axis), with
    # the transverse maximum at x ~ 0 (grid i)
    i, j = np.unravel_index(eta.argmax(), eta.shape)
    assert abs(xs[j] - (kw["so"] + lam)) < 2 * (xs[1] - xs[0])
    assert abs(xs[i]) < 2 * (xs[1] - xs[0])
    # both runout classes share the shape machinery (coefficients
    # differ only in validity warnings)
    assert np.allclose(np.asarray(eta2), eta)
