"""Rigid-body / fluid coupling for moving embedded solids.

TPU-native rebuild of the reference's ode module (reference:
modules/ode.c — GfsSolidMovingOde couples GfsSolidMoving to the Open
Dynamics Engine: fluid force integrals drive the body, the body motion
moves the solid).  Here the body state (position, velocity) is a traced
argument of the jitted step (NSConfig.solid_phi receives it as extra
``solid_args``), so the coupled system runs without retracing; the
fluid force on the body comes from the same pressure/viscous surface
integrals as OutputSolidForce (gfs_domain_solid_force,
src/domain.c:3502-3545).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import bc as bcs
from . import ns as nsm


@dataclasses.dataclass
class RigidBody:
    """2D rigid body (translation only): mass, position, velocity.
    ``gravity``: body-force vector on the body (buoyancy is implicit in
    the pressure integral)."""
    mass: float
    pos: tuple = (0.0, 0.0)
    vel: tuple = (0.0, 0.0)
    gravity: tuple = (0.0, 0.0)


def solid_force(state, cfg, t, solid_args=None):
    """(Fx, Fy) fluid force on the embedded solid: pressure + viscous
    surface integrals over the mixed cells (gfs_domain_solid_force,
    src/domain.c:3502; same scheme as events/outputs.OutputSolidForce,
    but jit-friendly — everything stays on device)."""
    from ..physics.solid import solid_fractions
    from ..ops.stencils import center_gradient

    grid = cfg.grid
    extra = tuple(solid_args) if solid_args is not None else ()
    phi = lambda x, y: cfg.solid_phi(x, y, t, *extra)
    a, (sx, sy) = solid_fractions(grid, phi)
    h = grid.h
    nsx = -(sx[1:, :] - sx[:-1, :]) * h
    nsy = -(sy[:, 1:] - sy[:, :-1]) * h
    mixed = (a > 0.0) & (a < 1.0)
    p = state["P"]
    fx = jnp.sum(jnp.where(mixed, p * nsx, 0.0))
    fy = jnp.sum(jnp.where(mixed, p * nsy, 0.0))
    if cfg.nu > 0.0:
        g = []
        for c, n in enumerate(nsm.velocity_names(2)):
            pad = bcs.apply_bc(state[n], grid, cfg.u_bcs[c], 1, t=t)
            g.append([center_gradient(pad, grid, ax) for ax in range(2)])
        txx = 2.0 * cfg.nu * g[0][0]
        tyy = 2.0 * cfg.nu * g[1][1]
        txy = cfg.nu * (g[0][1] + g[1][0])
        fx = fx - jnp.sum(jnp.where(mixed, txx * nsx + txy * nsy, 0.0))
        fy = fy - jnp.sum(jnp.where(mixed, txy * nsx + tyy * nsy, 0.0))
    return fx, fy


class RigidBodyDriver:
    """Couple one translating rigid body to the moving-solid NS step.

    ``shape_phi(x, y, cx, cy)``: body level set at centre (cx, cy)
    (fluid > 0).  The NSConfig is built with solid_phi reading the
    centre from ``solid_args`` — one jit trace covers the whole run
    (the reference's ode module re-cuts and re-integrates per step the
    same way, modules/ode.c)."""

    def __init__(self, grid, u_bcs, shape_phi, body: RigidBody,
                 nu=0.0, **cfg_kw):
        def phi(x, y, t, cx, cy, vx, vy):
            return shape_phi(x, y, cx, cy)

        def us_u(x, y, t, cx, cy, vx, vy):
            return vx

        def us_v(x, y, t, cx, cy, vx, vy):
            return vy

        self.cfg = nsm.NSConfig(grid=grid, u_bcs=u_bcs, nu=nu,
                                solid_phi=phi, moving_solid=True,
                                surface_u=(us_u, us_v), **cfg_kw)
        self.body = body
        z = jnp.zeros(grid.shape)
        self.state = {"U": z, "V": z, "P": z, "Pmac": z, "Gx": z,
                      "Gy": z}
        self.t = 0.0
        self.i = 0
        self.history = []

    def step(self, dt):
        b = self.body
        args = (jnp.asarray(b.pos[0]), jnp.asarray(b.pos[1]),
                jnp.asarray(b.vel[0]), jnp.asarray(b.vel[1]))
        self.state = nsm.ns_step(self.state, jnp.asarray(dt),
                                 jnp.asarray(self.t), self.cfg,
                                 first_step=(self.i == 0),
                                 solid_args=args)
        fx, fy = solid_force(self.state, self.cfg,
                             jnp.asarray(self.t + dt), args)
        ax = float(fx) / b.mass + b.gravity[0]
        ay = float(fy) / b.mass + b.gravity[1]
        self.body = dataclasses.replace(
            b,
            pos=(b.pos[0] + dt * b.vel[0], b.pos[1] + dt * b.vel[1]),
            vel=(b.vel[0] + dt * ax, b.vel[1] + dt * ay))
        self.t += dt
        self.i += 1
        self.history.append((self.t, self.body.pos, self.body.vel,
                             (float(fx), float(fy))))
        return self.state
