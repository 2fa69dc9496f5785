"""Rigid-body fluid coupling (the ode module, modules/ode.c)."""
import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import rigid
from gerris_tpu.solvers import poisson


def test_hydrostatic_buoyancy_force():
    """Static body in a hydrostatic pressure field: the fluid force is
    the Archimedes buoyancy (solid_force jit path vs analytic)."""
    import math
    grid = Grid(level=6, dim=2)
    from gerris_tpu.models import ns as nsm
    R = 0.2

    def phi(x, y, t, cx, cy, vx, vy):
        return jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2) - R

    cfg = nsm.NSConfig(grid=grid,
                       u_bcs=(bcs.velocity_bc(0, 2),
                              bcs.velocity_bc(1, 2)),
                       nu=0.0, solid_phi=phi, moving_solid=True)
    x, y = grid.centers
    c = 2.5
    state = {"P": c * y + jnp.zeros(grid.shape),
             "U": jnp.zeros(grid.shape), "V": jnp.zeros(grid.shape)}
    args = (jnp.asarray(0.0),) * 4
    fx, fy = rigid.solid_force(state, cfg, jnp.asarray(0.0), args)
    exact = -c * math.pi * R ** 2
    assert abs(float(fx)) < 0.02 * abs(exact)
    assert abs(float(fy) - exact) / abs(exact) < 0.05


def test_accelerating_disk_no_retrace():
    """A gravity-driven disk accelerates; the traced-args design must
    not retrace per step (jit cache size check) and added-mass drag
    keeps the acceleration below free fall."""
    grid = Grid(level=5, dim=2)
    R = 0.12

    def shape(x, y, cx, cy):
        return jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2) - R

    drv = rigid.RigidBodyDriver(
        grid, (bcs.velocity_bc(0, 2), bcs.velocity_bc(1, 2)),
        shape, rigid.RigidBody(mass=0.1, pos=(0.0, 0.2),
                               gravity=(0.0, -1.0)),
        projection=poisson.MultilevelParams(tolerance=1e-6, nitermax=40),
        approx_projection=poisson.MultilevelParams(tolerance=1e-6,
                                                   nitermax=40))
    dt = 0.25 * grid.h
    from gerris_tpu.models.ns import ns_step
    for k in range(6):
        drv.step(dt)
    # moved down, gained downward speed, but less than free fall
    assert drv.body.pos[1] < 0.2
    assert drv.body.vel[1] < 0.0
    assert drv.body.vel[1] > -1.0 * drv.t * 1.5
    # single trace across steps (steps 2..6 share one cache entry;
    # step 1 differs via first_step)
    assert ns_step._cache_size() <= 4
    for _, pos, vel, F in drv.history:
        assert np.isfinite(pos).all() and np.isfinite(F).all()
