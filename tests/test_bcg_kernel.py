"""Fused BCG advection kernel vs the jnp reference path.

The kernel (ops/pallas/bcg.py, interpret mode on CPU) must reproduce
solvers/advection.py's advected_face_values + upwind_face_value +
flux_divergence and the gmac face correction of
models/ns.velocity_advection_diffusion — everywhere except the 4 corner
cells (the kernel's ghost corners are double-reflected; the jnp
corners=False path leaves them edge-extended).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import advection as adv
from gerris_tpu.ops.pallas import bcg


def _jnp_fv(v, uf, grid, fbc, dt, g=None, gbc=None, face_bc_axis=None,
            t=0.0):
    par = adv.AdvectionParams()
    uc_pad = adv.mac_cell_mean(uf, grid)
    fvals = adv.advected_face_values(v, grid, fbc, dt, par, uc_pad, t=t)
    from gerris_tpu.ops.stencils import face_average
    v_faces = []
    for a in range(2):
        vf = adv.upwind_face_value(fvals[a][0], fvals[a][1], uf[a], a)
        if g is not None:
            g_pad = bcs.apply_bc(g, grid, gbc, 1, t=t, corners=False)
            vf = vf - face_average(g_pad, grid, a) * dt / 2.0
        if face_bc_axis == a:
            vf = bcs.apply_face_bc(vf, grid, fbc, a, t=t)
        v_faces.append(vf)
    return adv.flux_divergence(v_faces, uf, grid, dt)


def _fields(grid, key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 3)
    v = jax.random.normal(k[0], grid.shape)
    ufx = jax.random.normal(k[1], grid.face_shape(0))
    ufy = jax.random.normal(k[2], grid.face_shape(1))
    return v, ufx, ufy


def _mask_corners(arr, m=2):
    a = np.array(arr)
    a[:m, :m] = a[-m:, :m] = a[:m, -m:] = a[-m:, -m:] = 0.0
    return a


@pytest.mark.parametrize("level", [5, 6])
def test_kernel_matches_jnp_dirichlet(level):
    grid = Grid(level=level, dim=2)
    v, ufx, ufy = _fields(grid, key=level)
    dt = 0.3 * grid.h
    # lid-like BCs: Dirichlet 0 except top Dirichlet 1
    fbc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                           top=bcs.Dirichlet(1.0))
    ref = _jnp_fv(v, [ufx, ufy], grid, fbc, dt, face_bc_axis=0)
    out = bcg.advect2d(v, ufx, ufy, jnp.asarray(dt), grid.h,
                       sgn=(-1.0, -1.0, -1.0, -1.0),
                       off=(0.0, 0.0, 0.0, 2.0),
                       fb_x=(0.0, 0.0), interpret=True)
    d = np.abs(_mask_corners(ref - out))
    assert d.max() < 1e-5, d.max()


@pytest.mark.parametrize("level", [5, 6])
def test_kernel_matches_jnp_neumann_with_g(level):
    grid = Grid(level=level, dim=2)
    v, ufx, ufy = _fields(grid, key=10 + level)
    g = jax.random.normal(jax.random.PRNGKey(99), grid.shape)
    dt = 0.25 * grid.h
    fbc = bcs.default_scalar_bc(2)
    gbc = bcs.default_scalar_bc(2)
    ref = _jnp_fv(v, [ufx, ufy], grid, fbc, dt, g=g, gbc=gbc)
    out = bcg.advect2d(v, ufx, ufy, jnp.asarray(dt), grid.h, g,
                       sgn=(1.0, 1.0, 1.0, 1.0),
                       off=(0.0, 0.0, 0.0, 0.0), interpret=True)
    d = np.abs(_mask_corners(ref - out))
    assert d.max() < 1e-5, d.max()


def test_kernel_matches_jnp_periodic_y():
    grid = Grid(level=6, dim=2)
    v, ufx, ufy = _fields(grid, key=42)
    dt = 0.2 * grid.h
    fbc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                       (bcs.Periodic(), bcs.Periodic())))
    ref = _jnp_fv(v, [ufx, ufy], grid, fbc, dt)
    out = bcg.advect2d(v, ufx, ufy, jnp.asarray(dt), grid.h,
                       sgn=(-1.0, -1.0, 1.0, 1.0),
                       off=(0.0, 0.0, 0.0, 0.0), per_y=True,
                       interpret=True)
    d = np.abs(_mask_corners(ref - out))
    assert d.max() < 1e-5, d.max()


def test_strip_decomposition_invariance():
    """Different strip sizes must give identical results."""
    grid = Grid(level=6, dim=2)
    v, ufx, ufy = _fields(grid, key=7)
    dt = 0.3 * grid.h
    outs = []
    for S in (16, 32, 64):
        outs.append(np.asarray(bcg.advect2d(
            v, ufx, ufy, jnp.asarray(dt), grid.h,
            sgn=(1.0, 1.0, -1.0, -1.0), off=(0.0, 0.0, 0.0, 0.0),
            S=S, interpret=True)))
    assert np.abs(outs[0] - outs[1]).max() < 1e-12
    assert np.abs(outs[0] - outs[2]).max() < 1e-12


def test_advect2d_gp_oscale_folds():
    """gp (gc momentum gradient) and oscale (diffusion-rhs) folds equal
    the explicit elementwise epilogue."""
    import jax
    grid = Grid(level=6, dim=2)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    spec = bcg.kernel_spec(fbc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    v = jax.random.normal(ks[0], grid.shape, jnp.float32)
    ufx = jax.random.normal(ks[1], (grid.n + 1, grid.n), jnp.float32)
    ufy = jax.random.normal(ks[2], (grid.n, grid.n + 1), jnp.float32)
    g = jax.random.normal(ks[3], grid.shape, jnp.float32)
    gp = jax.random.normal(ks[4], grid.shape, jnp.float32)
    dt = jnp.float32(0.3 * grid.h)
    kw = dict(sgn=spec["sgn"], off=spec["off"], per_y=spec["per_y"],
              fb_x=spec["fb_x"], fb_y=spec["fb_y"], interpret=True)
    fv = bcg.advect2d(v, ufx, ufy, dt, grid.h, g, **kw)
    ref = -3.0 * (v + fv - dt * gp)
    out = bcg.advect2d(v, ufx, ufy, dt, grid.h, g, gp=gp,
                       oscale=jnp.float32(-3.0), **kw)
    d = float(jnp.max(jnp.abs(ref - out)))
    assert d < 1e-4, d


def test_pair_kernel_matches_two_singles():
    """advect2d_pair (one launch, shared MAC-face DMAs) == two advect2d
    calls with the per-component BC encodings + gp/oscale folds."""
    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(11), 7)
    U = jax.random.normal(ks[0], grid.shape, jnp.float32)
    V = jax.random.normal(ks[1], grid.shape, jnp.float32)
    ufx = jax.random.normal(ks[2], (grid.n + 1, grid.n), jnp.float32)
    ufy = jax.random.normal(ks[3], (grid.n, grid.n + 1), jnp.float32)
    g0 = jax.random.normal(ks[4], grid.shape, jnp.float32)
    g1 = jax.random.normal(ks[5], grid.shape, jnp.float32)
    gp0 = jax.random.normal(ks[6], grid.shape, jnp.float32)
    gp1 = -gp0
    dt = jnp.float32(0.27 * grid.h)
    osc = jnp.float32(-2.5)
    r0 = bcg.advect2d(U, ufx, ufy, dt, grid.h, g0, gp=gp0, oscale=osc,
                      sgn=su["sgn"], off=su["off"], per_y=su["per_y"],
                      fb_x=su["fb_x"], fb_y=None, interpret=True)
    r1 = bcg.advect2d(V, ufx, ufy, dt, grid.h, g1, gp=gp1, oscale=osc,
                      sgn=sv["sgn"], off=sv["off"], per_y=sv["per_y"],
                      fb_x=None, fb_y=sv["fb_y"], interpret=True)
    p0, p1 = bcg.advect2d_pair(
        U, V, ufx, ufy, dt, grid.h, g0=g0, g1=g1, gp0=gp0, gp1=gp1,
        oscale=osc, sgns=(su["sgn"], sv["sgn"]),
        offs=(su["off"], sv["off"]), per_y=su["per_y"],
        fbxs=(su["fb_x"], None), fbys=(None, sv["fb_y"]),
        interpret=True)
    assert float(jnp.max(jnp.abs(p0 - r0))) == 0.0
    assert float(jnp.max(jnp.abs(p1 - r1))) == 0.0


def test_pair_kernel_rr_fold():
    """advect2d_pair with rr_dia == the plain pair output fed through
    rbgs.residual_restrict_pair (the diffusion chain's first launch
    folded into the advection kernel)."""
    from gerris_tpu.ops.pallas import rbgs
    from gerris_tpu.solvers.poisson import _signs_offs
    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(13), 7)
    U = jax.random.normal(ks[0], grid.shape, jnp.float32)
    V = jax.random.normal(ks[1], grid.shape, jnp.float32)
    ufx = jax.random.normal(ks[2], (grid.n + 1, grid.n), jnp.float32)
    ufy = jax.random.normal(ks[3], (grid.n, grid.n + 1), jnp.float32)
    g0 = jax.random.normal(ks[4], grid.shape, jnp.float32)
    g1 = jax.random.normal(ks[5], grid.shape, jnp.float32)
    gp0 = jax.random.normal(ks[6], grid.shape, jnp.float32)
    gp1 = -gp0
    dt = jnp.float32(0.27 * grid.h)
    dia = jnp.float32(37.5)
    h2 = grid.h * grid.h
    kw = dict(g0=g0, g1=g1, gp0=gp0, gp1=gp1, oscale=-dia,
              sgns=(su["sgn"], sv["sgn"]), offs=(su["off"], sv["off"]),
              per_y=su["per_y"], fbxs=(su["fb_x"], None),
              fbys=(None, sv["fb_y"]), interpret=True)
    v0, v1 = bcg.advect2d_pair(U, V, ufx, ufy, dt, grid.h, **kw)
    signs, _ = _signs_offs(grid, u_bc, False)
    rows = []
    for fbc in (u_bc, v_bc):
        _, offs = _signs_offs(grid, fbc, False)
        rows.append(jnp.stack([dia, jnp.float32(0.0)]
                              + [jnp.float32(o) for o in offs]))
    scal = jnp.stack(rows)
    ref0, ref1, ref2 = rbgs.residual_restrict_pair(
        [U, V], [v0, v1], scal, h2=h2, signs=signs, periodic_y=False,
        interpret=True)
    r0s, r1s, r2s = bcg.advect2d_pair(U, V, ufx, ufy, dt, grid.h,
                                      rr_dia=dia, h2=h2, **kw)
    for got, ref in zip(r0s + r1s + r2s, ref0 + ref1 + ref2):
        mag = float(jnp.max(jnp.abs(ref))) + 1e-30
        d = float(jnp.max(jnp.abs(got - ref)))
        assert d < 1e-5 * mag, (d, mag)
