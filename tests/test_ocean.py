"""GfsOcean (linearised free-surface) gates — reference: src/ocean.c.

Standing gravity wave in a closed basin: eta = A cos(pi x) cos(omega t)
with omega = sqrt(G H) pi.  The theta=1/2 scheme is neutrally stable, so
after a half period the surface must be the mirror of the initial one
with (almost) no amplitude loss; a geostrophic current under rotation
must stay steady.
"""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ocean


def _wall_bcs():
    u_bc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                        (bcs.Neumann(), bcs.Neumann())))
    v_bc = bcs.FieldBC(((bcs.Neumann(), bcs.Neumann()),
                        (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0))))
    return (u_bc, v_bc)


def test_standing_wave_dispersion():
    G, H = 4.0, 0.25                 # c = sqrt(G H) = 1
    grid = Grid(level=6, dim=2)
    cfg = ocean.OceanConfig(grid=grid, u_bcs=_wall_bcs(), depth=H, G=G)
    x, y = grid.centers
    A = 1e-3
    p0 = G * A * jnp.cos(math.pi * (x + 0.5)) + jnp.zeros(grid.shape)
    state = {"U": jnp.zeros(grid.shape), "V": jnp.zeros(grid.shape),
             "P": p0}
    omega = math.sqrt(G * H) * math.pi
    T = 2 * math.pi / omega
    n = 64
    dt = jnp.asarray(T / 2 / n)
    t = 0.0
    for i in range(n):                # half period
        state = ocean.ocean_step(state, dt, jnp.asarray(t), cfg)
        t += float(dt)
    p = np.asarray(state["P"])
    ref = -np.asarray(p0)            # mirror after T/2
    corr = (p * ref).sum() / math.sqrt((p * p).sum() * (ref * ref).sum())
    assert corr > 0.995, corr
    amp = np.abs(p).max() / (G * A)
    assert 0.93 < amp < 1.03, amp


def test_geostrophic_balance():
    """f-plane geostrophy: u_g = -(1/f) dp/dy stays steady under the CN
    Coriolis + pressure-gradient balance (the rossby-adjustment class of
    reference tests, test/rossby)."""
    G, H, f = 1.0, 1.0, 10.0
    grid = Grid(level=6, dim=2)
    cfg = ocean.OceanConfig(grid=grid, u_bcs=_wall_bcs(), depth=H, G=G,
                            coriolis=(f, 0.0, 0.5))
    x, y = grid.centers
    A = 1e-3
    p0 = A * jnp.exp(-(x ** 2 + y ** 2) / (2 * 0.15 ** 2))
    # u_g = -dp/dy / f, v_g = dp/dx / f
    h = grid.h
    dpdx = (jnp.roll(p0, -1, 0) - jnp.roll(p0, 1, 0)) / (2 * h)
    dpdy = (jnp.roll(p0, -1, 1) - jnp.roll(p0, 1, 1)) / (2 * h)
    state = {"U": -dpdy / f, "V": dpdx / f, "P": p0}
    dt = jnp.asarray(0.2 * grid.h)
    t = 0.0
    for i in range(20):
        state = ocean.ocean_step(state, dt, jnp.asarray(t), cfg)
        t += float(dt)
    # the balanced vortex must persist (small Rossby number: slow drift
    # only) — compare against the initial fields
    dU = float(jnp.max(jnp.abs(state["U"] - (-dpdy / f))))
    assert dU < 0.1 * float(jnp.max(jnp.abs(dpdy / f))), dU
    dP = float(jnp.max(jnp.abs(state["P"] - p0))) / float(jnp.max(p0))
    assert dP < 0.05, dP
