"""Projection-auxiliary kernels vs the jnp path (interpret mode).

interp_faces must match solvers/projection.face_interpolated_velocity;
correct_project must match face_gradients + the uf correction +
cell_gradient_from_faces (reference: src/advection.c:546-566 +
src/timestep.c:60-145)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import projection as proj
from gerris_tpu.models import ns
from gerris_tpu.ops.pallas import bcg, projops


def _mask_corner(a, m=2):
    a = np.array(a)
    a[:m, :m] = a[-m:, :m] = a[:m, -m:] = a[-m:, -m:] = 0.0
    return a


def test_interp_faces_matches():
    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    k = jax.random.split(jax.random.PRNGKey(1), 2)
    U = [jax.random.normal(k[0], grid.shape),
         jax.random.normal(k[1], grid.shape)]
    ref = proj.face_interpolated_velocity(U, grid, [u_bc, v_bc])
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ufx, ufy = projops.interp_faces(
        U[0], U[1], sgn_u=su["sgn"], off_u=su["off"],
        sgn_v=sv["sgn"], off_v=sv["off"], per_y=False,
        fbx=su["fb_x"], fby=sv["fb_y"], interpret=True)
    assert np.abs(_mask_corner(ref[0] - ufx)).max() < 1e-6
    assert np.abs(_mask_corner(ref[1] - ufy)).max() < 1e-6


def test_correct_project_matches():
    grid = Grid(level=6, dim=2)
    p_bc = ns.grad_bc(bcs.velocity_bc(0, 2))   # Neumann everywhere
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    p = jax.random.normal(k[0], grid.shape)
    ufx = jax.random.normal(k[1], grid.face_shape(0))
    ufy = jax.random.normal(k[2], grid.face_shape(1))
    dt = 0.01
    gf = proj.face_gradients(p, grid, p_bc)
    ref_ufx = ufx - dt * gf[0]
    ref_ufy = ufy - dt * gf[1]
    ref_g = proj.cell_gradient_from_faces(gf, grid)
    spec = bcg.kernel_spec(p_bc)
    oux, ouy, gx, gy = projops.correct_project(
        p, ufx, ufy, jnp.asarray(dt), grid.h, sgn=spec["sgn"],
        off=spec["off"], per_y=spec["per_y"], interpret=True)
    assert np.abs(_mask_corner(ref_ufx - oux)).max() < 1e-6
    assert np.abs(_mask_corner(ref_ufy - ouy)).max() < 1e-6
    assert np.abs(_mask_corner(ref_g[0] - gx)).max() < 1e-6
    assert np.abs(_mask_corner(ref_g[1] - gy)).max() < 1e-6


def test_divergence_mac_matches():
    from gerris_tpu.ops.stencils import divergence
    grid = Grid(level=6, dim=2)
    k = jax.random.split(jax.random.PRNGKey(3), 2)
    ufx = jax.random.normal(k[0], grid.face_shape(0))
    ufy = jax.random.normal(k[1], grid.face_shape(1))
    dt = 0.02
    ref = divergence([ufx, ufy], grid) / dt
    div, total = projops.divergence_mac(ufx, ufy, jnp.asarray(dt),
                                        grid.h, interpret=True)
    assert float(jnp.max(jnp.abs(ref - div))) < 1e-9
    assert abs(float(total) - float(jnp.sum(ref))) < 1e-7


@pytest.mark.parametrize("use_gp", [False, True])
def test_interp_faces_div_fold(use_gp):
    """div_scale output == divergence_mac of the returned faces (the
    approximate projection's divergence launch folded into the face
    interpolation), with and without the gc gradient re-add."""
    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    U, V, Gx, Gy = [jax.random.normal(k, grid.shape, jnp.float32)
                    for k in ks]
    dt = jnp.float32(0.05)
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=False, fbx=su["fb_x"],
              fby=sv["fb_y"], interpret=True)
    sc = 1.0 / (grid.h * dt)
    if use_gp:
        ox, oy, ou, ov, div, tot = projops.interp_faces(
            U, V, (Gx, Gy), dt, div_scale=sc, **kw)
        rx, ry = projops.interp_faces(U + dt * Gx, V + dt * Gy, **kw)
    else:
        ox, oy, div, tot = projops.interp_faces(U, V, div_scale=sc,
                                                **kw)
        rx, ry = projops.interp_faces(U, V, **kw)
    assert float(jnp.max(jnp.abs(ox - rx))) < 1e-5
    assert float(jnp.max(jnp.abs(oy - ry))) < 1e-5
    rdiv, rtot = projops.divergence_mac(rx, ry, dt, grid.h,
                                        interpret=True)
    mag = float(jnp.max(jnp.abs(rdiv)))
    assert float(jnp.max(jnp.abs(div - rdiv))) < 1e-6 * mag
    # totals: different per-strip sum associations in f32
    assert abs(float(tot) - float(rtot)) < \
        1e-5 * float(jnp.sum(jnp.abs(rdiv))) + 1e-3


def test_interp_faces_gc_fold():
    """interp_faces with gp/dtv == update-then-interpolate, plus the
    updated cells as extra outputs."""
    from gerris_tpu.ops.pallas import bcg, projops
    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    U, V, Gx, Gy = [jax.random.normal(k, grid.shape, jnp.float32)
                    for k in ks]
    dt = jnp.float32(0.13)
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=False, fbx=su["fb_x"],
              fby=sv["fb_y"], interpret=True)
    rx, ry = projops.interp_faces(U + dt * Gx, V + dt * Gy, **kw)
    ox, oy, ou, ov = projops.interp_faces(U, V, (Gx, Gy), dt, **kw)
    assert float(jnp.max(jnp.abs(rx - ox))) < 1e-5
    assert float(jnp.max(jnp.abs(ry - oy))) < 1e-5
    assert float(jnp.max(jnp.abs(ou - (U + dt * Gx)))) < 1e-5
    assert float(jnp.max(jnp.abs(ov - (V + dt * Gy)))) < 1e-5


def test_correct_project_cells_fold():
    """correct_project with cells == the explicit u -= dt*g_cell."""
    from gerris_tpu.ops.pallas import bcg, projops
    grid = Grid(level=6, dim=2)
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    U, V, p = [jax.random.normal(k, grid.shape, jnp.float32)
               for k in ks[:3]]
    ufx = jax.random.normal(ks[3], (grid.n + 1, grid.n), jnp.float32)
    ufy = jax.random.normal(ks[4], (grid.n, grid.n + 1), jnp.float32)
    dt = jnp.float32(0.13)
    spec = bcg.kernel_spec(bcs.default_scalar_bc(2))
    kw = dict(sgn=spec["sgn"], off=spec["off"], per_y=spec["per_y"],
              interpret=True)
    r1, r2, rgx, rgy = projops.correct_project(p, ufx, ufy, dt, grid.h,
                                               **kw)
    o1, o2, ogx, ogy, ou, ov = projops.correct_project(
        p, ufx, ufy, dt, grid.h, (U, V), **kw)
    assert float(jnp.max(jnp.abs(r1 - o1))) == 0.0
    assert float(jnp.max(jnp.abs(rgx - ogx))) == 0.0
    assert float(jnp.max(jnp.abs(ou - (U - dt * rgx)))) < 1e-5
    assert float(jnp.max(jnp.abs(ov - (V - dt * rgy)))) < 1e-5


def test_packed_roundtrip_div_interp_correct():
    """Packed (FacePack) kernel I/O == plain I/O for interp_faces,
    divergence_mac and correct_project; the packed chain
    interp -> div -> correct equals the plain chain exactly."""
    from gerris_tpu.ops.pallas import bcg, projops
    from gerris_tpu.ops.pallas.facepack import FacePack, pack

    grid = Grid(level=6, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    U, V, p = [jax.random.normal(k, grid.shape, jnp.float32)
               for k in ks]
    dt = jnp.float32(0.2)
    kw = dict(sgn_u=su["sgn"], off_u=su["off"], sgn_v=sv["sgn"],
              off_v=sv["off"], per_y=False, fbx=su["fb_x"],
              fby=sv["fb_y"], interpret=True)
    rx, ry = projops.interp_faces(U, V, **kw)
    fp = projops.interp_faces(U, V, packed=True, **kw)
    ox, oy = fp.unpack()
    assert float(jnp.max(jnp.abs(ox - rx))) == 0.0
    assert float(jnp.max(jnp.abs(oy - ry))) == 0.0

    d1, t1 = projops.divergence_mac(rx, ry, dt, grid.h, interpret=True)
    d2, t2 = projops.divergence_mac(fp, None, dt, grid.h,
                                    interpret=True)
    assert float(jnp.max(jnp.abs(d1 - d2))) == 0.0
    assert float(jnp.abs(t1 - t2)) < 1e-3

    spec = bcg.kernel_spec(bcs.default_scalar_bc(2))
    ckw = dict(sgn=spec["sgn"], off=spec["off"], per_y=spec["per_y"],
               interpret=True)
    r1x, r1y, rgx, rgy = projops.correct_project(p, rx, ry, dt, grid.h,
                                                 **ckw)
    fp2, ogx, ogy = projops.correct_project(p, fp, None, dt, grid.h,
                                            packed=True, **ckw)
    o2x, o2y = fp2.unpack()
    assert float(jnp.max(jnp.abs(r1x - o2x))) < 2e-6
    assert float(jnp.max(jnp.abs(r1y - o2y))) == 0.0
    assert float(jnp.max(jnp.abs(rgx - ogx))) == 0.0
    # packed pad rows are zeroed
    from gerris_tpu.ops.pallas.bcg import GP
    assert float(jnp.max(jnp.abs(fp2.x[:GP]))) == 0.0
    assert float(jnp.max(jnp.abs(fp2.x[GP + grid.n + 1:]))) == 0.0

    # advect2d consumes the packed pair identically
    g = jax.random.normal(ks[0], grid.shape, jnp.float32)
    aspec = bcg.kernel_spec(u_bc, with_face_bc=True)
    akw = dict(sgn=aspec["sgn"], off=aspec["off"], per_y=False,
               fb_x=aspec["fb_x"], interpret=True)
    f1 = bcg.advect2d(U, r1x, r1y, dt, grid.h, g, **akw)
    f2 = bcg.advect2d(U, fp2, None, dt, grid.h, g, **akw)
    assert float(jnp.max(jnp.abs(f1 - f2))) < 2e-6
