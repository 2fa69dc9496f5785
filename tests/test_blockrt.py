"""Gate: runtime-table block solves (AMR cost ∝ leaves inside jit).

VERDICT r2 item 2: the composite solve work must scale with the leaf
count AND survive per-step adaptation without recompiling.  blockrt
runs the blockmg engine from capacity-padded runtime tables: same
numerics (equality gate vs BlockSolver), mesh changes re-use the
compiled program (trace-count gate), work O(active blocks)
(static-capacity gate).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import blockmg, blockrt, poisson

K = 3


def exact(x, y):
    return jnp.cos(math.pi * K * x) * jnp.cos(math.pi * K * y)


def rhs_fn(x, y):
    return -(math.pi ** 2) * 2 * K * K * exact(x, y)


def ring_depth(lmin, lmax, r=0.35, wcells=6.0):
    gf = Grid(level=lmax, dim=2)
    x = np.asarray(gf.centers[0])
    y = np.asarray(gf.centers[1])
    d = np.abs(np.sqrt(x * x + y * y) - r)
    return np.where(d < wcells * gf.h, lmax, lmin).astype(np.int32)


def test_blockrt_matches_blockmg():
    """Identical numerics to the static-table BlockSolver (dia = 0,
    homogeneous Dirichlet)."""
    lmin, lmax = 5, 7
    base = Grid(level=lmin, dim=2)
    D = ring_depth(lmin, lmax)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    params = poisson.MultilevelParams(nrelax=4)

    mesh = blockmg.BlockMesh.build(base, lmax, D, B=8)
    solver = blockmg.BlockSolver(mesh, fbc, params)
    rhs = mesh.field_from_fn(rhs_fn)
    u_ref = {l: jnp.zeros_like(rhs[l]) for l in rhs}
    for _ in range(4):
        u_ref = solver._cycle(u_ref, rhs)

    rt, tables, mesh2 = blockrt.make_blockrt(base, lmax, D, B=8)
    # capacity-padded rhs (reuse the mesh's block order: identical)
    rhs_p = {l: jnp.zeros((rt.caps_dict[l], 8, 8))
             .at[:rhs[l].shape[0]].set(rhs[l]) for l in rhs}
    u = blockrt.solve(rhs_p, tables, rt, fbc, params, dia=0.0,
                      ncycles=4)
    for l in rhs:
        n = rhs[l].shape[0]
        leaf = np.asarray(mesh.lv[l]["leaf"])
        if not leaf.any():
            continue
        d = np.abs(np.asarray(u[l][:n]) - np.asarray(u_ref[l]))[leaf]
        assert d.max() < 1e-8, (l, d.max())


def test_blockrt_accuracy_and_dia():
    """Composite solve accuracy on the ring mesh (pure Neumann — K must
    be even so cos(K pi x) has zero normal derivative at +-1/2) and the
    Helmholtz dia path."""
    lmin, lmax = 5, 7
    KN = 2
    exn = lambda x, y: np.cos(math.pi * KN * x) * np.cos(math.pi * KN * y)
    rhsn = lambda x, y: -(math.pi ** 2) * 2 * KN * KN * exn(x, y)
    base = Grid(level=lmin, dim=2)
    D = ring_depth(lmin, lmax)
    fbc = bcs.FieldBC.uniform(bcs.Neumann(), 2)
    params = poisson.MultilevelParams(nrelax=4)
    rt, tables, mesh = blockrt.make_blockrt(base, lmax, D, B=8)
    rhs = mesh.field_from_fn(rhsn)
    rhs_p = {l: jnp.zeros((rt.caps_dict[l], 8, 8))
             .at[:rhs[l].shape[0]].set(rhs[l]) for l in rhs}
    # pure Neumann: remove the leaf-weighted mean (the analytic rhs has
    # integral -8 over the box — without this the solve stalls at the
    # incompatibility floor, like any singular-system solver)
    rhs_p = blockrt.demean_leaf(rhs_p, tables, rt)
    u = blockrt.solve(rhs_p, tables, rt, fbc, params, ncycles=8)
    # compare against the analytic solution on finest leaves (up to a
    # constant: pure Neumann)
    d = mesh.lv[lmax]
    gl = mesh.grid(lmax)
    h = gl.h
    ci = (np.arange(8) + 0.5) * h
    x = base.origin[0] + d["bx"][:, None, None] * 8 * h + ci[None, :, None]
    y = base.origin[1] + d["by"][:, None, None] * 8 * h + ci[None, None, :]
    ex = np.asarray(exn(x + 0 * y, y + 0 * x))
    n = len(d["bx"])
    uu = np.asarray(u[lmax][:n])
    leaf = d["leaf"]
    err = (uu - ex)[leaf]
    err = err - err.mean()
    # discretization-limited: the lmin=5 far field (h=1/32) pollutes the
    # fine leaves through the global elliptic coupling — O((2 pi/32)^2)
    assert np.abs(err).max() < 1.5e-2, np.abs(err).max()
    # and iteration-converged: leaf residual driven far below the rhs
    fbck = blockrt._bc_kinds(fbc)
    resN = blockrt.leaf_residual(u, rhs_p, tables, base, fbck, 0.0,
                                 rt.lmin, rt.lmax, 8, rt.caps_dict)
    rN = max(float(jnp.max(jnp.abs(r))) for r in resN.values())
    assert rN < 1e-5 * float(max(np.abs(np.asarray(rhs_p[l])).max()
                                 for l in rhs_p)), rN

    # Helmholtz: (lap - dia) u = rhs with large dia — residual drops
    dia = 1.0e3
    u2 = blockrt.solve(rhs_p, tables, rt, fbc, params, dia=dia,
                       ncycles=3)
    res = blockrt.leaf_residual(u2, rhs_p, tables, base,
                                blockrt._bc_kinds(fbc), dia, rt.lmin,
                                rt.lmax, 8, rt.caps_dict)
    r0 = max(float(jnp.max(jnp.abs(r))) for r in
             blockrt.leaf_residual(
                 {l: jnp.zeros_like(rhs_p[l]) for l in rhs_p}, rhs_p,
                 tables, base, blockrt._bc_kinds(fbc), dia, rt.lmin,
                 rt.lmax, 8, rt.caps_dict).values())
    r1 = max(float(jnp.max(jnp.abs(r))) for r in res.values())
    assert r1 < 1e-3 * r0, (r0, r1)


def test_blockrt_adaptation_no_recompile():
    """Mesh changes (same capacity buckets) re-use the compiled solve:
    the defining property the static-table engine lacks."""
    lmin, lmax = 5, 7
    base = Grid(level=lmin, dim=2)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    params = poisson.MultilevelParams(nrelax=4)
    rt0, tables0, mesh0 = blockrt.make_blockrt(
        base, lmax, ring_depth(lmin, lmax, r=0.3), B=8)
    # a different mesh, forced into the same buckets
    rt1, tables1, mesh1 = blockrt.make_blockrt(
        base, lmax, ring_depth(lmin, lmax, r=0.33), B=8,
        caps=rt0.caps_dict)
    traces = []

    @jax.jit
    def run(rhs, tables):
        traces.append(1)
        return blockrt.solve(rhs, tables, rt0, fbc, params, ncycles=2)

    assert rt1.caps == rt0.caps
    rhs0 = {l: jnp.ones((rt0.caps_dict[l], 8, 8)) for l in rt0.caps_dict}
    u0 = run(rhs0, tables0)
    u1 = run(rhs0, tables1)
    jax.block_until_ready((u0, u1))
    assert len(traces) == 1, "mesh change retraced the solve"
    # and the two meshes genuinely differ
    assert not np.array_equal(np.asarray(tables0[lmax]["bx"]),
                              np.asarray(tables1[lmax]["bx"]))


def test_blockrt_work_scales_with_leaves():
    """Static per-cycle array footprint (the FLOP proxy under jit) grows
    with the interface measure (~2x per level), not the area (4x)."""
    prev = None
    prev_cap = None
    for lmax in (8, 9):
        rt, _, mesh = blockrt.make_blockrt(
            Grid(level=4, dim=2), lmax, ring_depth(4, lmax), B=8)
        active = mesh.n_active()
        cells = sum(c * 64 for _, c in rt.caps)
        if prev is not None:
            # the true work grows with the interface (~2x per level)...
            assert active / prev < 2.8, (active, prev)
            # ...and the pow2 capacity headroom stays within ~2x of it
            assert cells / prev_cap < 4.0, (cells, prev_cap)
            # capacity (incl. pow2 headroom) stays within ~2x the active
            # count and well below the uniform footprint (the margin
            # tightens as lmax grows; 0.5 at this small lmax=9)
            assert cells < 2.2 * active, (cells, active)
            assert cells < 0.5 * (1 << lmax) ** 2
        prev = active
        prev_cap = cells


@pytest.mark.slow
def test_blockrt_walltime_scales_with_leaves():
    """VERDICT r2 item 2 'Done' gate: solve wall-time tracks the leaf
    count, not the uniform-domain size.  Between ring meshes at lmax=8
    and lmax=9 the active cells grow ~2x (perimeter) while the uniform
    domain grows 4x; the measured solve time must follow the former."""
    import time as _time

    fbc = bcs.FieldBC.uniform(bcs.Neumann(), 2)
    params = poisson.MultilevelParams(nrelax=4)
    times = {}
    actives = {}
    for lmax in (8, 9):
        rt, tables, mesh = blockrt.make_blockrt(
            Grid(level=4, dim=2), lmax, ring_depth(4, lmax), B=8)
        rhs = {l: jnp.ones((rt.caps_dict[l], 8, 8)) * (l % 3 - 1.0)
               for l in rt.caps_dict}
        rhs = blockrt.demean_leaf(rhs, tables, rt)

        run = jax.jit(lambda r, tb, rt=rt: blockrt.solve(
            r, tb, rt, fbc, params, ncycles=3))
        u = run(rhs, tables)
        jax.block_until_ready(u)
        best = math.inf
        for _ in range(3):
            t0 = _time.perf_counter()
            u = run(rhs, tables)
            jax.block_until_ready(u)
            best = min(best, _time.perf_counter() - t0)
        times[lmax] = best
        actives[lmax] = mesh.n_active()
    growth = times[9] / times[8]
    leaf_growth = actives[9] / actives[8]
    print(f"solve time {times} active {actives}: time x{growth:.2f} "
          f"vs leaves x{leaf_growth:.2f} (uniform would be x4)")
    assert growth < 3.0, (times, actives)


# ---------------------------------------------------------------------------
# Variable-coefficient block solves (VERDICT r3 item 3): per-face alpha
# (two-phase density projections) and per-cell dia (variable-density
# diffusion) must reproduce the dense mask engine on mixed-depth meshes.
# Reference: leaf-only relax covers ALL systems (src/poisson.c:604-631).
# ---------------------------------------------------------------------------

def _mixed_topo(lmin=4, lmax=6):
    from gerris_tpu.solvers.amr import Topo
    from gerris_tpu.solvers.composite import CompositeGrid, grade_depth_map
    import numpy as np
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


def _twophase_alpha(topo):
    """1000x-jump face coefficients built exactly like amr_step: finest
    evaluation + coarsen_face_coeff down the stack."""
    from gerris_tpu.solvers import poisson as psn
    gf = topo.grid(topo.lmax)
    x, y = gf.centers
    T = jnp.where(y + 0.1 * jnp.cos(2 * jnp.pi * x) < 0.0, 1.0, 0.0)
    rho = 1.0 * T + 1e-3 * (1.0 - T)
    af = []
    for c in range(2):
        pad = jnp.pad(rho, [(1, 1) if a == c else (0, 0)
                            for a in range(2)], mode="edge")
        lo = pad[tuple(slice(0, -1) if a == c else slice(None)
                       for a in range(2))]
        hi = pad[tuple(slice(1, None) if a == c else slice(None)
                       for a in range(2))]
        af.append(2.0 / (lo + hi))
    alpha = {topo.lmax: tuple(af)}
    rhod = {topo.lmax: rho}
    for l in range(topo.lmax - 1, topo.lmin - 1, -1):
        alpha[l] = psn.coarsen_face_coeff(alpha[l + 1], 2)
        rhod[l] = psn.restrict(rhod[l + 1], 2)
    return alpha, rhod


def test_blockrt_variable_alpha_matches_dense():
    """Two-phase Neumann projection system: block engine == dense mask
    engine to solver tolerance on a mixed-depth mesh."""
    from gerris_tpu.solvers import amr as amrs
    topo, D, leaf = _mixed_topo()
    alpha, _ = _twophase_alpha(topo)
    rt, tables, _ = blockrt.make_blockrt(topo.base, topo.lmax, D, B=8)
    fbc = bcs.FieldBC.uniform(bcs.Neumann(), 2)
    params = poisson.MultilevelParams(tolerance=1e-9, nitermax=60,
                                      nrelax=4)
    rhs = {}
    for l in topo.levels:
        x, y = topo.grid(l).centers
        rhs[l] = (jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y)
                  ).astype(jnp.float64)
    u_d, n_d, r_d = amrs.solve(rhs, topo, leaf, fbc, params, alpha=alpha)
    u_b, n_b, r_b = amrs.solve_block(rhs, topo, leaf, fbc,
                                     poisson.MultilevelParams(
                                         tolerance=1e-9, ncycles=25,
                                         nrelax=4),
                                     rt, tables, alpha=alpha)
    # the block engine must CONVERGE on its own operator ...
    assert float(r_b) < 1e-8 * float(jnp.max(jnp.abs(rhs[topo.lmax]))), \
        float(r_b)
    # ... and agree with the dense engine to the interface-stencil
    # difference (the two engines discretize fine-coarse faces with
    # different-but-both-consistent stencils; measured scalar baseline
    # ~3e-2 relative at interface-adjacent leaves)
    gscale = max(float(jnp.max(jnp.abs(jnp.where(jnp.asarray(leaf[l]),
                                                 u_d[l], 0.0))))
                 for l in topo.levels) + 1e-30
    for l in topo.levels:
        m = jnp.asarray(leaf[l])
        du = jnp.where(m, u_b[l] - u_d[l], 0.0)
        ofs = jnp.sum(du) / jnp.maximum(jnp.sum(m), 1)
        err = float(jnp.max(jnp.abs(jnp.where(m, du - ofs, 0.0))))
        assert err / gscale < 0.08, (l, err, gscale)


def test_blockrt_cell_dia_matches_dense():
    """Variable-density Helmholtz (diffusion) system: per-cell dia blocks
    == dense engine."""
    from gerris_tpu.solvers import amr as amrs
    topo, D, leaf = _mixed_topo()
    _, rhod = _twophase_alpha(topo)
    rt, tables, _ = blockrt.make_blockrt(topo.base, topo.lmax, D, B=8)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    scale = 0.05
    rhs, dia = {}, {}
    for l in topo.levels:
        x, y = topo.grid(l).centers
        rhs[l] = -(rhod[l] * jnp.cos(2 * math.pi * x)
                   * jnp.sin(math.pi * y)) / scale
        dia[l] = rhod[l] / scale
    params = poisson.MultilevelParams(tolerance=1e-10, nitermax=60,
                                      nrelax=4)
    u_d, _, _ = amrs.solve(rhs, topo, leaf, fbc, params, dia=dia)
    u_b, _, r_b = amrs.solve_block(rhs, topo, leaf, fbc,
                                   poisson.MultilevelParams(
                                       tolerance=1e-10, ncycles=25,
                                       nrelax=4),
                                   rt, tables, dia=dia)
    # own-operator convergence + dense agreement to the
    # interface-stencil difference (see the alpha test above)
    assert float(r_b) < 1e-8 * float(jnp.max(jnp.abs(rhs[topo.lmax]))), \
        float(r_b)
    gscale = max(float(jnp.max(jnp.abs(jnp.where(jnp.asarray(leaf[l]),
                                                 u_d[l], 0.0))))
                 for l in topo.levels) + 1e-30
    for l in topo.levels:
        m = jnp.asarray(leaf[l])
        err = float(jnp.max(jnp.abs(jnp.where(m, u_b[l] - u_d[l], 0.0))))
        assert err / gscale < 0.08, (l, err, gscale)


@pytest.mark.slow
def test_twophase_amr_solves_walltime_scale_with_leaves():
    """VERDICT r3 item 3 'Done' gate: with the variable-coefficient
    block engine, the SOLVE phases of a two-phase composite step
    (projection systems with 1000x face-coefficient jumps + the
    variable-density diffusion Helmholtz pair) cost O(leaves).  Between
    ring meshes at lmax=8 and lmax=9 the leaves grow ~2x while the
    uniform domain grows 4x; the measured solve walltime must track
    the former.  (The advection/sync phases remain dense per level —
    their cost is leaf-INDEPENDENT at fixed lmax, so the step total is
    gated by the solves.)"""
    import time as _time
    from gerris_tpu.solvers import amr as amrs
    from gerris_tpu.solvers.amr import Topo
    from gerris_tpu.solvers.composite import CompositeGrid

    fbc = bcs.FieldBC.uniform(bcs.Neumann(), 2)
    times = {}
    actives = {}
    for lmax in (8, 9):
        lmin = 4
        base = Grid(level=lmin, dim=2)
        topo = Topo(base=base, lmin=lmin, lmax=lmax)
        D = ring_depth(lmin, lmax)
        leaf = CompositeGrid.from_depth_map(base, lmax, D,
                                            graded=True).leaf_arrays()
        rt, tables, mesh = blockrt.make_blockrt(base, lmax, D, B=8)
        # two-phase-style coefficients: 1000x jump across the ring
        gf = topo.grid(lmax)
        x, y = gf.centers
        T = jnp.where(jnp.sqrt(x ** 2 + y ** 2) < 0.3, 1.0, 0.0)
        rho = {lmax: (1e-3 + (1.0 - 1e-3) * T)}
        # harmonic-mean face alpha from rho (1000x jump at the circle)
        af = []
        for c in range(2):
            pad = jnp.pad(rho[lmax], [(1, 1) if a == c else (0, 0)
                                      for a in range(2)], mode="edge")
            lo = pad[tuple(slice(0, -1) if a == c else slice(None)
                           for a in range(2))]
            hi = pad[tuple(slice(1, None) if a == c else slice(None)
                           for a in range(2))]
            af.append(2.0 / (lo + hi))
        alpha = {lmax: tuple(af)}
        dia = {lmax: rho[lmax] * 20.0}
        for l in range(lmax - 1, lmin - 1, -1):
            alpha[l] = poisson.coarsen_face_coeff(alpha[l + 1], 2)
            rho[l] = poisson.restrict(rho[l + 1], 2)
            dia[l] = poisson.restrict(dia[l + 1], 2)
        rhs = {l: jnp.sin(2 * math.pi * topo.grid(l).centers[0])
               for l in topo.levels}
        params = poisson.MultilevelParams(ncycles=3, nrelax=4)

        def solves(rhs, tables):
            # the two projections + the U,V diffusion pair of one step
            p1, _, _ = amrs.solve_block(rhs, topo, leaf, fbc, params,
                                        rt, tables, alpha=alpha)
            p2, _, _ = amrs.solve_block(rhs, topo, leaf, fbc, params,
                                        rt, tables, alpha=alpha)
            d1, _, _ = amrs.solve_block(rhs, topo, leaf, fbc, params,
                                        rt, tables, dia=dia)
            d2, _, _ = amrs.solve_block(rhs, topo, leaf, fbc, params,
                                        rt, tables, dia=dia)
            return p1[lmax] + p2[lmax] + d1[lmax] + d2[lmax]

        run = jax.jit(solves)
        out = run(rhs, tables)
        jax.block_until_ready(out)
        best = math.inf
        for _ in range(3):
            t0 = _time.perf_counter()
            out = run(rhs, tables)
            jax.block_until_ready(out)
            best = min(best, _time.perf_counter() - t0)
        times[lmax] = best
        actives[lmax] = mesh.n_active()
    growth = times[9] / times[8]
    leaf_growth = actives[9] / actives[8]
    print(f"two-phase solves time {times} active {actives}: "
          f"x{growth:.2f} vs leaves x{leaf_growth:.2f} (uniform x4)")
    assert growth < 3.0, (times, actives)
