"""PLIC-geometric prolongation of VOF fractions (vof.prolong_geometric
+ amr.sync_vof): the composite-AMR ghost fill for fractions.

Reference behavior: gfs_vof_coarse_fine (src/vof.c:210-296) subdivides
the coarse PLIC reconstruction into the children, so (a) children
average exactly back to the parent and (b) a resolved linear interface
prolongs to the exact fine fractions (no smearing of the slave-cell
interface band that biased composite VOF advection)."""
import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.physics import vof


FBC = bcs.default_scalar_bc(2)


def test_prolong_conserves_parent_mean():
    grid = Grid(level=5, dim=2)
    f = vof.fraction_from_levelset(
        grid, lambda x, y: 0.3 ** 2 - x * x - y * y)
    fine = vof.prolong_geometric(f, grid, FBC)
    back = 0.25 * (fine[0::2, 0::2] + fine[0::2, 1::2]
                   + fine[1::2, 0::2] + fine[1::2, 1::2])
    assert float(jnp.max(jnp.abs(back - f))) < 1e-12
    assert float(jnp.min(fine)) >= -1e-12
    assert float(jnp.max(fine)) <= 1 + 1e-12


def test_prolong_exact_for_linear_interface():
    # an oblique plane: the coarse PLIC reconstruction IS the interface,
    # so each child must get the exact fine fraction (linear
    # prolongation instead smears the band by O(1))
    grid = Grid(level=5, dim=2)
    phi = lambda x, y: 0.1 + 0.3 * x - y  # noqa: E731
    f = vof.fraction_from_levelset(grid, phi)
    fine_grid = Grid(level=6, dim=2)
    f_exact = vof.fraction_from_levelset(fine_grid, phi)
    fine = vof.prolong_geometric(f, grid, FBC)
    err = jnp.abs(fine - f_exact)
    # interior: the coarse PLIC reconstruction IS the interface -> exact
    assert float(jnp.max(err[4:-4, 4:-4])) < 1e-12
    # boundary cells use ghost-extrapolated normals (reference does too)
    assert float(jnp.max(err)) < 0.1


def test_prolong_full_empty_passthrough():
    grid = Grid(level=4, dim=2)
    f = jnp.zeros(grid.shape).at[:, : grid.n // 2].set(1.0)
    fine = vof.prolong_geometric(f, grid, FBC)
    assert set(np.unique(np.asarray(fine))) <= {0.0, 1.0}


def test_prolong_3d_conserves_and_sharp():
    grid = Grid(level=4, dim=3)
    f = vof.fraction_from_levelset(
        grid, lambda x, y, z: 0.15 + 0.2 * x + 0.1 * y - z)
    fbc3 = bcs.default_scalar_bc(3)
    fine = vof.prolong_geometric(f, grid, fbc3)
    back = 0.125 * sum(fine[i::2, j::2, k::2]
                       for i in (0, 1) for j in (0, 1) for k in (0, 1))
    assert float(jnp.max(jnp.abs(back - f))) < 1e-12
    fine_grid = Grid(level=5, dim=3)
    f_exact = vof.fraction_from_levelset(
        fine_grid, lambda x, y, z: 0.15 + 0.2 * x + 0.1 * y - z)
    err = jnp.abs(fine - f_exact)
    # 1e-10: plane_alpha_positive is a 40-step bisection (~1e-12)
    assert float(jnp.max(err[4:-4, 4:-4, 4:-4])) < 1e-10
    assert float(jnp.max(err)) < 0.1  # ghost-normal boundary cells


def test_sync_vof_ghost_band_sharp():
    """sync_vof fills slave (non-leaf, non-covered) fine cells with the
    geometric prolongation; leaves and covered restrictions unchanged."""
    from gerris_tpu.solvers import amr
    from gerris_tpu.solvers.composite import Topo

    topo = Topo(base=Grid(level=4, dim=2), lmin=4, lmax=5)
    phi = lambda x, y: 0.1 + 0.3 * x - y  # noqa: E731
    # leaves: fine everywhere x<0 (interface through both regions)
    gf = topo.grid(5)
    xc = gf.centers[0]
    leaf5 = xc < 0.0
    leaf4 = ~amr.pool_any(leaf5, 2)
    leaf = {4: leaf4, 5: leaf5}
    f = {l: vof.fraction_from_levelset(topo.grid(l), phi) for l in (4, 5)}
    # corrupt the slave region at l=5 — sync must rebuild it geometrically
    f5_bad = jnp.where(leaf5, f[5], 0.5)
    out = amr.sync_vof({4: f[4], 5: f5_bad}, topo, leaf, FBC)
    err = jnp.abs(out[5] - f[5])
    assert float(jnp.max(jnp.where(leaf5, err, 0.0))) < 1e-12  # untouched
    # slaves rebuilt sharply (domain-boundary ring uses ghost normals)
    assert float(jnp.max(err[4:-4, 4:-4])) < 1e-12
    assert float(jnp.max(err)) < 0.1
