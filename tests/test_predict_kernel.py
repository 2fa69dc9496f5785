"""Fused predictor kernels vs models/ns.predicted_face_velocities
(interpret mode) — reference: gfs_predicted_face_velocities,
src/timestep.c:681-717."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.ops.pallas import bcg, predict


def _jnp_pred(U, grid, cfg, dt):
    uc_pad = [bcs.apply_bc(U[c], grid, cfg.u_bcs[c], 1, corners=False)
              for c in range(2)]
    from gerris_tpu.solvers import advection as adv
    from gerris_tpu.ops.stencils import face_average
    uf = []
    for c in range(2):
        vp, vm = adv.advected_face_values(
            U[c], grid, cfg.u_bcs[c], dt, cfg.advection, uc_pad,
            axes=(c,))[c]
        un = face_average(uc_pad[c], grid, c)
        uf_c = adv.upwind_face_value(vp, vm, un, c)
        uf.append(bcs.apply_face_bc(uf_c, grid, cfg.u_bcs[c], c))
    return uf


def _mask_corner_faces(a, axis, m=2):
    a = np.array(a)
    a[:m, :m] = a[-m:, :m] = a[:m, -m:] = a[-m:, -m:] = 0.0
    return a


@pytest.mark.parametrize("lid", [True, False])
def test_predict_matches_jnp(lid):
    grid = Grid(level=6, dim=2)
    if lid:
        u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                                top=bcs.Dirichlet(1.0))
        v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    else:
        u_bc = bcs.velocity_bc(0, 2)
        v_bc = bcs.velocity_bc(1, 2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0)
    k = jax.random.split(jax.random.PRNGKey(5), 2)
    U = [jax.random.normal(k[0], grid.shape),
         jax.random.normal(k[1], grid.shape)]
    dt = 0.3 * grid.h
    ref = _jnp_pred(U, grid, cfg, dt)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=False, interpret=True)
    ufx, ufy = predict.predict_xy(U[0], U[1], dt, grid.h,
                                  fb_x=su["fb_x"],
                                  fb_y=sv["fb_y"] or (0.0, 0.0), **kw)
    dx = np.abs(_mask_corner_faces(ref[0] - ufx, 0))
    dy = np.abs(_mask_corner_faces(ref[1] - ufy, 1))
    assert dx.max() < 1e-5, dx.max()
    assert dy.max() < 1e-5, dy.max()


@pytest.mark.parametrize("lid", [True, False])
def test_predict_xy_packed_matches_plain(lid):
    """packed (FacePack) output == plain output exactly."""
    grid = Grid(level=6, dim=2)
    if lid:
        u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                                top=bcs.Dirichlet(1.0))
        v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
        per_y = False
    else:
        u_bc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                            (bcs.Periodic(), bcs.Periodic())))
        v_bc = u_bc
        per_y = True
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    U = jax.random.normal(ks[0], grid.shape, jnp.float32)
    V = jax.random.normal(ks[1], grid.shape, jnp.float32)
    dt = 0.4 * grid.h
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=per_y, fb_x=su["fb_x"],
              fb_y=sv["fb_y"] or (0.0, 0.0), interpret=True)
    rx, ry = predict.predict_xy(U, V, dt, grid.h, **kw)
    fp = predict.predict_xy(U, V, dt, grid.h, packed=True, **kw)
    ox, oy = fp.unpack()
    assert float(jnp.max(jnp.abs(ox - rx))) == 0.0
    assert float(jnp.max(jnp.abs(oy - ry))) == 0.0
    from gerris_tpu.ops.pallas.bcg import GP
    assert float(jnp.max(jnp.abs(fp.x[:GP]))) == 0.0
    assert float(jnp.max(jnp.abs(fp.x[GP + grid.n + 1:]))) == 0.0


@pytest.mark.parametrize("lid", [True, False])
def test_predict_xy_div_fold(lid):
    """div_scale output == projops.divergence_mac of the returned faces
    (the MAC projection's divergence launch folded into the predictor)."""
    from gerris_tpu.ops.pallas import projops
    grid = Grid(level=6, dim=2)
    if lid:
        u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                                top=bcs.Dirichlet(1.0))
        v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
        per_y = False
    else:
        u_bc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                            (bcs.Periodic(), bcs.Periodic())))
        v_bc = u_bc
        per_y = True
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    U = jax.random.normal(ks[0], grid.shape, jnp.float32)
    V = jax.random.normal(ks[1], grid.shape, jnp.float32)
    dt = 0.4 * grid.h
    dtp = dt / 2.0
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=per_y, fb_x=su["fb_x"],
              fb_y=sv["fb_y"] or (0.0, 0.0), interpret=True)
    ufx, ufy, div, tot = predict.predict_xy(
        U, V, dt, grid.h, div_scale=1.0 / (grid.h * dtp), **kw)
    rx, ry = predict.predict_xy(U, V, dt, grid.h, **kw)
    assert float(jnp.max(jnp.abs(ufx - rx))) == 0.0
    assert float(jnp.max(jnp.abs(ufy - ry))) == 0.0
    rdiv, rtot = projops.divergence_mac(rx, ry, jnp.asarray(dtp),
                                        grid.h, interpret=True)
    mag = float(jnp.max(jnp.abs(rdiv)))
    assert float(jnp.max(jnp.abs(div - rdiv))) < 1e-6 * mag
    # totals: different per-strip sum associations in f32
    assert abs(float(tot) - float(rtot)) < \
        1e-5 * float(jnp.sum(jnp.abs(rdiv))) + 1e-3
