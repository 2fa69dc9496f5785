"""Gate: block-windowed BCG advection (solvers/blockadv.py).

The gathered active-block corrector advection must reproduce the dense
per-level chain EXACTLY on active-block cells (same arithmetic on the
same synced neighborhoods) — this is what lets amr_step swap it in with
cost ∝ leaves (reference: leaf-only advection traversal,
src/advection.c gfs_face_advection_flux).
"""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import advection as adv
from gerris_tpu.solvers import amr as amrs
from gerris_tpu.solvers import blockadv, blockrt
from gerris_tpu.models import ns as nsm
from gerris_tpu.ops.stencils import face_average


def _mixed_topo(lmin=4, lmax=6):
    from gerris_tpu.solvers.amr import Topo
    from gerris_tpu.solvers.composite import CompositeGrid, grade_depth_map
    base = Grid(level=lmin, dim=2)
    topo = Topo(base=base, lmin=lmin, lmax=lmax)
    gf = topo.grid(lmax)
    x, y = gf.centers
    D = np.where(np.asarray(x) ** 2 + np.asarray(y) ** 2 < 0.04,
                 lmax, lmin).astype(np.int32)
    D = grade_depth_map(D)
    leaf = CompositeGrid.from_depth_map(base, lmax, D,
                                        graded=True).leaf_arrays()
    return topo, D, leaf


def _fields(topo, u_bc, v_bc, leaf):
    """Smooth velocity/face/gradient stacks, synced like amr_step."""
    cov = amrs.covered_masks(leaf, topo)
    U, V, ufs, gm = {}, {}, {}, {}
    for l in topo.levels:
        g = topo.grid(l)
        x, y = g.centers
        U[l] = (jnp.sin(2 * math.pi * x) * jnp.cos(math.pi * y)
                ).astype(jnp.float64)
        V[l] = (jnp.cos(math.pi * x) * jnp.sin(2 * math.pi * y)
                ).astype(jnp.float64)
        gm[l] = (0.3 * jnp.cos(math.pi * x * y)).astype(jnp.float64)
        # MAC faces from a stream function (divergence-free-ish; values
        # just need to be consistent across the stack)
        xfx, yfx = g.face_centers(0)
        xfy, yfy = g.face_centers(1)
        ufx = jnp.sin(math.pi * xfx) * jnp.cos(2 * math.pi * yfx)
        ufy = -jnp.cos(2 * math.pi * xfy) * jnp.sin(math.pi * yfy)
        ufs[l] = [ufx.astype(jnp.float64), ufy.astype(jnp.float64)]
    U = amrs.sync(U, topo, leaf, u_bc, cov=cov)
    V = amrs.sync(V, topo, leaf, v_bc, cov=cov)
    gm = amrs.sync(gm, topo, leaf, nsm.grad_bc(u_bc), cov=cov)
    ufs = amrs.sync_faces(ufs, topo, leaf, cov=cov)
    return U, V, ufs, gm


def _dense_fv(v, uf, gmac, grid, fbc, gbc, dt, par, c):
    """The amr_step phase-3 dense chain, verbatim."""
    uc_pad = adv.mac_cell_mean(uf, grid)
    fvals = adv.advected_face_values(v, grid, fbc, dt, par, uc_pad)
    g_pad = bcs.apply_bc(gmac, grid, gbc, 1)
    v_faces = []
    for a in range(2):
        vface = adv.upwind_face_value(fvals[a][0], fvals[a][1], uf[a], a)
        vface = vface - face_average(g_pad, grid, a) * dt / 2.0
        if a == c:
            vface = bcs.apply_face_bc(vface, grid, fbc, a)
        v_faces.append(vface)
    return adv.flux_divergence(v_faces, uf, grid, dt)


def test_blockadv_matches_dense_on_active_blocks():
    topo, D, leaf = _mixed_topo()
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    gbc = nsm.grad_bc(u_bc)
    U, V, ufs, gm = _fields(topo, u_bc, v_bc, leaf)
    rt, tables, _ = blockrt.make_blockrt(topo.base, topo.lmax, D, B=8)
    par = adv.AdvectionParams()
    assert blockadv.applicable(topo.base, par, u_bc)

    dt = 0.4 * topo.grid(topo.lmax).h
    for c, (field, fbc) in enumerate(((U, u_bc), (V, v_bc))):
        for l in topo.levels:
            g = topo.grid(l)
            fv_d = _dense_fv(field[l], ufs[l], gm[l], g, fbc, gbc, dt,
                             par, c)
            fv_b = blockadv.advect_level(field[l], ufs[l], gm[l], g, fbc,
                                         gbc, dt, par, tables[l], rt.B, c)
            # active-block cell mask
            ones = blockrt.scatter_blocks(
                jnp.zeros_like(field[l]),
                jnp.ones((rt.caps_dict[l], rt.B, rt.B)), tables[l], rt.B)
            m = np.asarray(ones) > 0.5
            assert m.any(), l
            d = np.abs(np.asarray(fv_b) - np.asarray(fv_d))[m]
            scale = np.abs(np.asarray(fv_d))[m].max() + 1e-30
            assert d.max() / scale < 1e-12, (c, l, d.max(), scale)
            # non-active cells must be exactly zero (never read)
            nz = np.abs(np.asarray(fv_b))[~m]
            if nz.size:
                assert nz.max() == 0.0, (c, l)


def test_amr_step_block_advect_matches_dense():
    """Full composite NS steps with block_advect=True track the dense
    chain on leaves (slaves carry prolonged instead of advected ghosts —
    composite-consistent, small leaf-level differences only)."""
    import dataclasses
    from gerris_tpu.models import amr_ns
    from gerris_tpu.models.simulation import Time
    from gerris_tpu.solvers.composite import CompositeGrid

    level, lmin = 6, 4
    gridf = Grid(level=level, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    gf = gridf
    x, y = gf.centers
    D = np.where(np.asarray(y) > 0.1, level, lmin).astype(np.int32)
    from gerris_tpu.solvers.composite import grade_depth_map
    D = grade_depth_map(D)
    mesh = CompositeGrid.from_depth_map(Grid(level=lmin, dim=2), level,
                                        D, graded=True)

    outs = {}
    for badv in (False, True):
        cfg = nsm.NSConfig(grid=gridf, u_bcs=(u_bc, v_bc), nu=1e-3,
                           block_advect=badv)
        sim = amr_ns.AMRSimulation(cfg, mesh=mesh,
                                   time=Time(end=1.0)).init()
        assert sim._use_blocks
        sim.run(max_steps=4)
        outs[badv] = sim

    for n in ("U", "V"):
        for l in outs[True].topo.levels:
            m = np.asarray(outs[True].leaf[l])
            if not m.any():
                continue
            a = np.asarray(outs[True].state[n][l])
            b = np.asarray(outs[False].state[n][l])
            scale = np.abs(b[m]).max() + 1e-12
            d = np.abs(a - b)[m].max()
            assert d / scale < 2e-2, (n, l, d, scale)


def test_blockadv_limiters():
    """van_leer / minmod limited slopes run through the same window
    machinery (AdvectionParams.gradient options)."""
    topo, D, leaf = _mixed_topo(lmin=4, lmax=5)
    u_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    gbc = nsm.grad_bc(u_bc)
    U, V, ufs, gm = _fields(topo, u_bc, u_bc, leaf)
    rt, tables, _ = blockrt.make_blockrt(topo.base, topo.lmax, D, B=8)
    dt = 0.4 * topo.grid(topo.lmax).h
    for lim in ("van_leer", "minmod"):
        par = adv.AdvectionParams(gradient=lim)
        l = topo.lmax
        g = topo.grid(l)
        fv_d = _dense_fv(U[l], ufs[l], gm[l], g, u_bc, gbc, dt, par, 0)
        fv_b = blockadv.advect_level(U[l], ufs[l], gm[l], g, u_bc, gbc,
                                     dt, par, tables[l], rt.B, 0)
        ones = blockrt.scatter_blocks(
            jnp.zeros_like(U[l]),
            jnp.ones((rt.caps_dict[l], rt.B, rt.B)), tables[l], rt.B)
        m = np.asarray(ones) > 0.5
        d = np.abs(np.asarray(fv_b) - np.asarray(fv_d))[m]
        assert d.max() < 1e-12 * (np.abs(np.asarray(fv_d))[m].max()
                                  + 1e-30), (lim, d.max())
