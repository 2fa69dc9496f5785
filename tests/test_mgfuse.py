"""Fused prolong+relax kernel vs the jnp MG pieces (interpret mode).

prolong_relax (ops/pallas/rbgs.py) must reproduce
poisson.prolong -> poisson.relax (-> + u) exactly — it replaces the
2-3 launch upward step of every V-cycle level on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.solvers import poisson
from gerris_tpu.ops.pallas import rbgs


@pytest.mark.parametrize("kind,per_y", [
    ("neumann", False), ("dirichlet", False), ("mixed", True)])
@pytest.mark.parametrize("nsweeps", [2, 4])
def test_prolong_relax_matches_jnp(kind, per_y, nsweeps):
    level = 6
    grid = Grid(level=level, dim=2)
    gc = Grid(level=level - 1, dim=2)
    if kind == "neumann":
        fbc = bcs.default_scalar_bc(2)
        signs = (1.0, 1.0, 1.0, 1.0)
    elif kind == "dirichlet":
        fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
        signs = (-1.0, -1.0, -1.0, -1.0)
    else:
        fbc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Neumann()),
                           (bcs.Periodic(), bcs.Periodic())))
        signs = (-1.0, 1.0, 1.0, 1.0)
    key = jax.random.split(jax.random.PRNGKey(3), 3)
    du_c = jax.random.normal(key[0], gc.shape)
    r = jax.random.normal(key[1], grid.shape)
    u = jax.random.normal(key[2], grid.shape)
    dia = 0.7

    ref = poisson.prolong(du_c, gc, fbc, homogeneous=True)
    ref = poisson.relax(ref, r, grid, fbc, nsweeps, dia=dia,
                        homogeneous=True)
    out = rbgs.prolong_relax(du_c, r, dia, nsweeps=nsweeps,
                             h2=grid.h ** 2, signs=signs,
                             periodic_y=per_y, interpret=True)
    d = float(jnp.max(jnp.abs(ref - out)))
    assert d < 1e-10, d
    # fused final add
    out2 = rbgs.prolong_relax(du_c, r, dia, u, nsweeps=nsweeps,
                              h2=grid.h ** 2, signs=signs,
                              periodic_y=per_y, add_u=True,
                              interpret=True)
    d2 = float(jnp.max(jnp.abs((ref + u) - out2)))
    assert d2 < 1e-10, d2


def test_prolong_relax_strip_invariance():
    grid = Grid(level=7, dim=2)
    gc = Grid(level=6, dim=2)
    fbc = bcs.default_scalar_bc(2)
    du_c = jax.random.normal(jax.random.PRNGKey(0), gc.shape)
    r = jax.random.normal(jax.random.PRNGKey(1), grid.shape)
    outs = [np.asarray(rbgs.prolong_relax(
        du_c, r, 0.0, nsweeps=4, h2=grid.h ** 2,
        signs=(1.0, 1.0, 1.0, 1.0), S=S, interpret=True))
        for S in (32, 64, 128)]
    assert np.abs(outs[0] - outs[1]).max() < 1e-12
    assert np.abs(outs[0] - outs[2]).max() < 1e-12


def test_residual_pallas_inhomogeneous_offsets():
    """residual_pallas with static ghost offsets (lid-style inhomogeneous
    Dirichlet + Neumann gradients) vs the jnp residual."""
    from gerris_tpu.solvers.poisson import _neighbor_sums
    grid = Grid(level=6, dim=2)
    fbc = bcs.FieldBC(((bcs.Dirichlet(0.3), bcs.Dirichlet(-0.2)),
                       (bcs.Neumann(0.5), bcs.Dirichlet(1.0))))
    u = jax.random.normal(jax.random.PRNGKey(0), grid.shape)
    r = jax.random.normal(jax.random.PRNGKey(1), grid.shape)
    dia = 0.3
    u_pad = bcs.apply_bc(u, grid, fbc, 1)
    num, den = _neighbor_sums(u_pad, None, 2)
    h2 = grid.h ** 2
    ref = r - ((num - den * u) / h2 - dia * u)
    offs = (2 * 0.3, 2 * -0.2, -0.5 * grid.h, 2 * 1.0)
    out = rbgs.residual_pallas(u, r, dia, h2=h2,
                               signs=(-1.0, -1.0, 1.0, -1.0),
                               offs=offs, interpret=True)
    d = float(jnp.max(jnp.abs(ref - out)))
    assert d < 1e-10, d


@pytest.mark.parametrize("kind,per_y", [("neumann", False),
                                        ("dirichlet", True)])
def test_coarse_vcycle_matches_jnp(kind, per_y):
    """The single-launch coarse cascade vs the equivalent jnp
    restrict/relax/prolong ladder (identical sweep schedule)."""
    level, min_n = 7, 16              # 128 -> 16
    grid = Grid(level=level, dim=2)
    if kind == "neumann":
        fbc = bcs.default_scalar_bc(2)
        signs = (1.0, 1.0, 1.0, 1.0)
    else:
        sides = ((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                 (bcs.Periodic(), bcs.Periodic()) if per_y else
                 (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)))
        fbc = bcs.FieldBC(sides)
        signs = (-1.0, -1.0, -1.0, -1.0)
    r = jax.random.normal(jax.random.PRNGKey(7), grid.shape)
    dia = 0.4
    nsweeps, coarsest = 4, 12

    # jnp reference ladder
    import dataclasses as dc
    rs = [r]
    g = grid
    grids = [g]
    while g.shape[0] > min_n:
        rs.append(poisson.restrict(rs[-1], 2))
        g = dc.replace(g, level=g.level - 1)
        grids.append(g)
    du = jnp.zeros_like(rs[-1])
    du = poisson.relax(du, rs[-1], grids[-1], fbc, coarsest, dia=dia,
                       homogeneous=True)
    for k in range(len(grids) - 2, -1, -1):
        du = poisson.prolong(du, grids[k + 1], fbc, homogeneous=True)
        du = poisson.relax(du, rs[k], grids[k], fbc, nsweeps, dia=dia,
                           homogeneous=True)

    out = rbgs.coarse_vcycle(r, dia, nsweeps=nsweeps, coarsest=coarsest,
                             h2=grid.h ** 2, signs=signs, per_y=per_y,
                             min_n=min_n, interpret=True)
    d = float(jnp.max(jnp.abs(du - out)))
    assert d < 1e-10, d


def _ladder_cycle(u, rhs, grid, fbc, dia, nsweeps, coarsest, min_n=16):
    """jnp reference for one fused_cycle: residual + 2 restricts +
    coarse cascade + prolong/relax at n/2 and n (identical schedule)."""
    import dataclasses as dc
    r0 = poisson.residual(u, rhs, grid, fbc, dia=dia, homogeneous=False)
    r1 = poisson.restrict(r0, 2)
    r2 = poisson.restrict(r1, 2)
    gh = dc.replace(grid, level=grid.level - 1)
    gq = dc.replace(grid, level=grid.level - 2)
    # cascade on r2 down to min_n
    rs = [r2]
    grids = [gq]
    g = gq
    while g.shape[0] > min_n:
        rs.append(poisson.restrict(rs[-1], 2))
        g = dc.replace(g, level=g.level - 1)
        grids.append(g)
    du = jnp.zeros_like(rs[-1])
    du = poisson.relax(du, rs[-1], grids[-1], fbc, coarsest, dia=dia,
                       homogeneous=True)
    for k in range(len(grids) - 2, -1, -1):
        du = poisson.prolong(du, grids[k + 1], fbc, homogeneous=True)
        du = poisson.relax(du, rs[k], grids[k], fbc, nsweeps, dia=dia,
                           homogeneous=True)
    du = poisson.prolong(du, gq, fbc, homogeneous=True)
    du = poisson.relax(du, r1, gh, fbc, nsweeps, dia=dia, homogeneous=True)
    du = poisson.prolong(du, gh, fbc, homogeneous=True)
    du = poisson.relax(du, r0, grid, fbc, nsweeps, dia=dia,
                       homogeneous=True)
    return u + du, r0


@pytest.mark.parametrize("kind,per_y", [
    ("neumann", False), ("dirichlet", False), ("mixed", True)])
def test_residual_restrict_matches_jnp(kind, per_y):
    grid = Grid(level=8, dim=2)
    if kind == "neumann":
        fbc = bcs.FieldBC(((bcs.Neumann(0.25), bcs.Neumann(-0.5)),
                           (bcs.Neumann(), bcs.Neumann(0.75))))
        signs = (1.0, 1.0, 1.0, 1.0)
        offs = (-0.25 * grid.h, -0.5 * grid.h, -0.0, 0.75 * grid.h)
    elif kind == "dirichlet":
        fbc = bcs.FieldBC(((bcs.Dirichlet(0.3), bcs.Dirichlet(-0.2)),
                           (bcs.Dirichlet(0.0), bcs.Dirichlet(1.0))))
        signs = (-1.0, -1.0, -1.0, -1.0)
        offs = (0.6, -0.4, 0.0, 2.0)
    else:
        fbc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Neumann()),
                           (bcs.Periodic(), bcs.Periodic())))
        signs = (-1.0, 1.0, 1.0, 1.0)
        offs = (0.0, 0.0, 0.0, 0.0)
    u = jax.random.normal(jax.random.PRNGKey(0), grid.shape)
    rhs = jax.random.normal(jax.random.PRNGKey(1), grid.shape)
    dia, sub = 0.4, 0.37
    ref0 = poisson.residual(u, rhs - sub, grid, fbc, dia=dia,
                            homogeneous=False)
    ref1 = poisson.restrict(ref0, 2)
    ref2 = poisson.restrict(ref1, 2)
    r0, r1, r2 = rbgs.residual_restrict(
        u, rhs, dia, sub, h2=grid.h ** 2, signs=signs, offs=offs,
        periodic=(False, per_y), interpret=True)
    assert float(jnp.max(jnp.abs(ref0 - r0))) < 1e-9
    assert float(jnp.max(jnp.abs(ref1 - r1))) < 1e-9
    assert float(jnp.max(jnp.abs(ref2 - r2))) < 1e-9


@pytest.mark.parametrize("kind,per_y", [("neumann", False),
                                        ("dirichlet", False),
                                        ("dirichlet", True)])
def test_fused_cycle_matches_ladder(kind, per_y):
    """The 3-launch fixed cycle == the jnp restrict/cascade/prolong
    ladder with the identical sweep schedule."""
    grid = Grid(level=8, dim=2)
    if kind == "neumann":
        fbc = bcs.default_scalar_bc(2)
    else:
        sides = ((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                 (bcs.Periodic(), bcs.Periodic()) if per_y else
                 (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)))
        fbc = bcs.FieldBC(sides)
    u = jax.random.normal(jax.random.PRNGKey(2), grid.shape)
    rhs = jax.random.normal(jax.random.PRNGKey(3), grid.shape)
    dia = 0.25
    nsweeps, coarsest = 4, 40
    signs, offs = poisson._signs_offs(grid, fbc, homogeneous=False)

    ref_u, ref_r0 = _ladder_cycle(u, rhs, grid, fbc, dia, nsweeps,
                                  coarsest)
    r0, r1, r2 = rbgs.residual_restrict(
        u, rhs, dia, 0.0, h2=grid.h ** 2, signs=signs, offs=offs,
        periodic=(False, per_y), interpret=True)
    rep = rbgs.cascade_prolong_relax(
        r1, r2, dia, nsweeps=nsweeps, coarsest=coarsest,
        h2_half=4.0 * grid.h ** 2, signs=signs, per_y=per_y,
        min_n=16, interpret=True)
    out = rbgs.prolong_relax(rep, r0, dia, u, nsweeps=nsweeps,
                             h2=grid.h ** 2, signs=signs,
                             periodic_y=per_y, add_u=True, pre_rep=True,
                             interpret=True)
    d = float(jnp.max(jnp.abs(ref_u - out)))
    assert d < 1e-8, d


def test_batched_fused_cycle_matches_unbatched():
    """The batched (B=2) kernel chain == per-system unbatched chain,
    with different BC offsets and subs per system."""
    grid = Grid(level=8, dim=2)
    fbc_u = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                         (bcs.Dirichlet(0.0), bcs.Dirichlet(1.0))))
    fbc_v = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    signs = (-1.0, -1.0, -1.0, -1.0)
    nsweeps, coarsest = 4, 40
    h2 = grid.h ** 2
    dia = 3.7
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    us = [jax.random.normal(ks[i], grid.shape) for i in range(2)]
    rs = [jax.random.normal(ks[2 + i], grid.shape) for i in range(2)]
    subs = [0.0, 0.1]

    refs = []
    for b, fbc in enumerate((fbc_u, fbc_v)):
        _, offs = poisson._signs_offs(grid, fbc, homogeneous=False)
        r0, r1, r2 = rbgs.residual_restrict(
            us[b], rs[b], dia, subs[b], h2=h2, signs=signs, offs=offs,
            periodic=(False, False), interpret=True)
        rep = rbgs.cascade_prolong_relax(
            r1, r2, dia, nsweeps=nsweeps, coarsest=coarsest,
            h2_half=4 * h2, signs=signs, per_y=False, min_n=16,
            interpret=True)
        refs.append(rbgs.prolong_relax(
            rep, r0, dia, us[b], nsweeps=nsweeps, h2=h2, signs=signs,
            periodic_y=False, add_u=True, pre_rep=True, interpret=True))

    rows = []
    for b, fbc in enumerate((fbc_u, fbc_v)):
        _, offs = poisson._signs_offs(grid, fbc, homogeneous=False)
        rows.append([dia, subs[b]] + list(offs))
    scal = jnp.asarray(rows, jnp.float32)
    Us = [u.astype(jnp.float32) for u in us]
    Rs = [r.astype(jnp.float32) for r in rs]
    r0p, r1p, r2p = rbgs.residual_restrict_pair(
        Us, Rs, scal, h2=h2, signs=signs, periodic_y=False,
        interpret=True)
    repp = rbgs.cascade_prolong_relax_pair(
        r1p, r2p, jnp.asarray([dia, dia], jnp.float32),
        nsweeps=nsweeps, coarsest=coarsest, h2_half=4 * h2, signs=signs,
        per_y=False, min_n=16, interpret=True)
    outp = rbgs.prolong_relax_pair(
        repp, r0p, jnp.asarray([dia, dia], jnp.float32), Us,
        nsweeps=nsweeps, h2=h2, signs=signs, periodic_y=False,
        interpret=True)
    for b in range(2):
        d = float(jnp.max(jnp.abs(outp[b] - refs[b])))
        assert d < 1e-4, (b, d)


def test_solve_relax_and_pair_match():
    """solver='relax' (fine-relax-only correction) matches the explicit
    residual+relax ladder; the pair variant matches per-system runs."""
    grid = Grid(level=7, dim=2)
    fbc_u = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Dirichlet(0.0)),
                         (bcs.Dirichlet(0.0), bcs.Dirichlet(1.0))))
    fbc_v = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    dia = 1.0 / (0.8 * grid.h * 1e-3)
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    us = [0.1 * jax.random.normal(ks[i], grid.shape, jnp.float32)
          for i in range(2)]
    rhss = [-(us[i] + 0.01 * grid.h
              * jax.random.normal(ks[2 + i], grid.shape, jnp.float32))
            * dia for i in range(2)]
    mp = poisson.MultilevelParams(nrelax=16, solver="relax", ncycles=1)
    outs = []
    for b, fbc in enumerate((fbc_u, fbc_v)):
        u1, st = poisson.solve(us[b], rhss[b], grid, fbc, mp, dia=dia)
        # explicit ladder
        r0 = poisson.residual(us[b], rhss[b], grid, fbc, dia=dia)
        du = poisson.relax(jnp.zeros_like(us[b]), r0, grid, fbc, 16,
                           dia=dia, homogeneous=True)
        assert float(jnp.max(jnp.abs(u1 - (us[b] + du)))) < 1e-5
        # tolerance actually met (the diagonally-dominant regime)
        r1 = poisson.residual(u1, rhss[b], grid, fbc, dia=dia)
        assert float(jnp.max(jnp.abs(r1))) < \
            1e-3 * float(jnp.max(jnp.abs(rhss[b])))
        outs.append(u1)
    # pair variant (interpret kernels on CPU need the pallas path faked)
    import gerris_tpu.solvers.poisson as psn
    from gerris_tpu.ops.pallas import rbgs
    orig_rrp = rbgs.residual_restrict_pair
    orig_prp = rbgs.prolong_relax_pair
    rbgs_kw = dict(interpret=True)
    import functools as ft
    psn_rrp = ft.partial(orig_rrp, **rbgs_kw)
    psn_prp = ft.partial(orig_prp, **rbgs_kw)
    rbgs.residual_restrict_pair = psn_rrp
    rbgs.prolong_relax_pair = psn_prp
    try:
        o2, st2 = psn.solve_relax_pair(
            us, rhss, grid, (fbc_u, fbc_v), mp, [dia, dia])
    finally:
        rbgs.residual_restrict_pair = orig_rrp
        rbgs.prolong_relax_pair = orig_prp
    for b in range(2):
        d = float(jnp.max(jnp.abs(o2[b] - outs[b])))
        s = float(jnp.max(jnp.abs(outs[b]))) + 1e-30
        assert d / s < 1e-4, (b, d)


@pytest.mark.parametrize("per_y", [False, True])
def test_residual_restrict_div_matches_composition(per_y):
    """Fold (a): the in-kernel MAC-divergence rhs variant equals
    divergence/dt fed to the plain residual_restrict kernel."""
    from gerris_tpu.ops.stencils import divergence

    grid = Grid(level=8, dim=2)
    n = grid.shape[0]
    if per_y:
        fbc = bcs.FieldBC(((bcs.Neumann(), bcs.Neumann()),
                           (bcs.Periodic(), bcs.Periodic())))
        signs = (1.0, 1.0, 1.0, 1.0)
    else:
        fbc = bcs.FieldBC.uniform(bcs.Neumann(), 2)
        signs = (1.0, 1.0, 1.0, 1.0)
    offs = (0.0, 0.0, 0.0, 0.0)
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    ufx = jax.random.normal(k1, grid.face_shape(0))
    ufy = jax.random.normal(k2, grid.face_shape(1))
    u = jax.random.normal(k3, grid.shape)
    dt = 0.37
    dia, sub = 0.0, 0.11
    rhs = divergence([ufx, ufy], grid) / dt
    ref = rbgs.residual_restrict(
        u, rhs, dia, sub, h2=grid.h ** 2, signs=signs, offs=offs,
        periodic=(False, per_y), interpret=True)
    got = rbgs.residual_restrict_div(
        u, ufx, ufy, dt * grid.h, dia, sub, h2=grid.h ** 2,
        signs=signs, offs=offs, periodic=(False, per_y), interpret=True)
    for a, b in zip(ref, got):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-9


def test_fold_div_removes_divergence_launches():
    """params.fold_div folds the MAC-divergence launch of BOTH
    projections into the solve's first kernel (round-3 lever (a)):
    tracing the TPU step with a mocked backend, solve_fused_div serves
    both projections and divergence_mac disappears.  (Launch counting
    by jaxpr text is unreliable — repeated sub-jaxprs print once — so
    the gate spies the dispatch sites.)"""
    import functools
    import unittest.mock as mock
    from gerris_tpu.models import ns
    from gerris_tpu.ops.pallas import projops
    import dataclasses

    grid = Grid(level=9, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)

    def trace(fold):
        mp = poisson.MultilevelParams(tolerance=1e-3, nitermax=100,
                                      ncycles=1, fold_div=fold,
                                      dense_coarse_max=1024)
        cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3,
                          beta=1.0, projection=mp, approx_projection=mp,
                          diffusion_params=dataclasses.replace(
                              mp, nrelax=8, fold_div=False))
        z = jnp.zeros(grid.shape, jnp.float32)
        names = list(ns.velocity_names(2)) + ["P", "Pmac"] + \
            list(ns.gradient_names(2))
        state = {n: z for n in names}
        calls = {"fused": 0, "divmac": 0}
        orig_f = poisson.solve_fused_div
        orig_d = projops.divergence_mac
        try:
            def spy_f(*a, **k):
                calls["fused"] += 1
                return orig_f(*a, **k)

            def spy_d(*a, **k):
                calls["divmac"] += 1
                return orig_d(*a, **k)
            poisson.solve_fused_div = spy_f
            projops.divergence_mac = spy_d
            with mock.patch.object(jax, "default_backend",
                                   lambda: "tpu"):
                jax.make_jaxpr(functools.partial(ns.ns_step, cfg=cfg))(
                    state, jnp.float32(0.5 * grid.h), jnp.float32(0.0))
        finally:
            poisson.solve_fused_div = orig_f
            projops.divergence_mac = orig_d
        return calls

    off = trace(False)
    on = trace(True)
    print(f"fold off {off} on {on}")
    assert off == {"fused": 0, "divmac": 2}, off
    assert on == {"fused": 2, "divmac": 0}, on


@pytest.mark.parametrize("kind", ["dirichlet", "neumann", "mixed"])
def test_rbgs3d_matches_jnp(kind):
    """3D fused RBGS strip kernel == the generic jnp relax (7-point
    Laplacian + dia, homogeneous BCs), interpret mode."""
    from gerris_tpu.ops.pallas import rbgs3d

    grid = Grid(level=5, dim=3)      # 32^3
    if kind == "dirichlet":
        fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 3)
        signs = (-1.0,) * 6
    elif kind == "neumann":
        fbc = bcs.FieldBC.uniform(bcs.Neumann(), 3)
        signs = (1.0,) * 6
    else:
        fbc = bcs.FieldBC(((bcs.Dirichlet(0.0), bcs.Neumann()),
                           (bcs.Neumann(), bcs.Dirichlet(0.0)),
                           (bcs.Dirichlet(0.0), bcs.Dirichlet(0.0))))
        signs = (-1.0, 1.0, 1.0, -1.0, -1.0, -1.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    u = jax.random.normal(k1, grid.shape, jnp.float32)
    rhs = jax.random.normal(k2, grid.shape, jnp.float32)
    dia = jnp.float32(0.7)
    nsweeps, omega = 3, 1.3
    ref = poisson.relax(u, rhs, grid, fbc, nsweeps, dia=dia,
                        homogeneous=True, omega=omega)
    got = rbgs3d.rbgs_relax_3d(u, rhs, dia, nsweeps=nsweeps,
                               h2=grid.h ** 2, signs=signs,
                               omega=omega, interpret=True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-5


def test_rbgs3d_strip_invariance():
    """Strip decomposition must not change the result (halo >= 2*nsweeps
    keeps the emitted interior exact)."""
    from gerris_tpu.ops.pallas import rbgs3d

    n = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    u = jax.random.normal(k1, (n, 32, 32), jnp.float32)
    rhs = jax.random.normal(k2, (n, 32, 32), jnp.float32)
    a = rbgs3d.rbgs_relax_3d(u, rhs, 0.0, nsweeps=2, h2=1e-3,
                             S=n, interpret=True)
    b = rbgs3d.rbgs_relax_3d(u, rhs, 0.0, nsweeps=2, h2=1e-3,
                             S=16, interpret=True)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6


@pytest.mark.parametrize("with_cells", [False, True])
@pytest.mark.parametrize("per_y,nsweeps", [(False, 5), (True, 8)])
def test_prolong_relax_correct_matches_composition(with_cells, per_y,
                                                   nsweeps):
    """Round-4 lever (b): the correction-epilogue prolong_relax equals
    prolong_relax(add_u) followed by projops.correct_project."""
    from gerris_tpu.ops.pallas import projops

    grid = Grid(level=8, dim=2)              # 256^2: 4 strips at S=64
    n0, n1 = grid.shape
    if per_y:
        signs = (1.0, 1.0, 1.0, 1.0)
        offs = (0.0, 0.0, 0.0, 0.0)
    else:
        signs = (1.0, 1.0, 1.0, 1.0)
        offs = (0.0, 0.02, -0.01, 0.0)       # non-homogeneous Neumann
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    du_c = jax.random.normal(ks[0], (n0 // 2, n1 // 2), jnp.float32)
    rep = jnp.pad(jnp.repeat(du_c, 2, axis=1),
                  ((rbgs.GP, rbgs.GP), (0, 0)))
    rhs = jax.random.normal(ks[1], grid.shape, jnp.float32)
    u = jax.random.normal(ks[2], grid.shape, jnp.float32)
    ufx = jax.random.normal(ks[3], (n0 + 1, n1), jnp.float32)
    ufy = jax.random.normal(ks[4], (n0, n1 + 1), jnp.float32)
    cells = None
    if with_cells:
        kc = jax.random.split(ks[5])
        cells = (jax.random.normal(kc[0], grid.shape, jnp.float32),
                 jax.random.normal(kc[1], grid.shape, jnp.float32))
    dt, dia, omega = 0.37, 0.0, 1.5
    h2 = grid.h * grid.h

    p_ref = rbgs.prolong_relax(rep, rhs, dia, u, nsweeps=nsweeps,
                               h2=h2, signs=signs, periodic_y=per_y,
                               add_u=True, pre_rep=True, omega=omega,
                               interpret=True)
    ref = projops.correct_project(p_ref, ufx, ufy, dt, grid.h, cells,
                                  sgn=signs, off=offs, per_y=per_y,
                                  interpret=True)
    got = rbgs.prolong_relax_correct(rep, rhs, dia, u, ufx, ufy, dt,
                                     grid.h, cells, nsweeps=nsweeps,
                                     h2=h2, sgn=signs, off=offs,
                                     periodic_y=per_y, omega=omega,
                                     interpret=True)
    # scale-relative tolerances: the fold variant sweeps in a WIDER
    # window (H >= 2*nsweeps+1 for the ghost row), so XLA vectorizes
    # the strip arithmetic differently — p' agrees to f32 roundoff,
    # and the gradient outputs amplify that roundoff by 1/h.
    assert float(jnp.max(jnp.abs(got[0] - p_ref))) < 1e-6 * \
        (1.0 + float(jnp.max(jnp.abs(p_ref))))
    for a, b in zip(ref, got[1:]):
        assert a.shape == b.shape
        scale = 1.0 + float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-6 * scale


def test_fold_correct_removes_correction_launches():
    """params.fold_correct folds the correct_project launch of BOTH
    projections into the solve's final prolong_relax kernel."""
    import functools
    import unittest.mock as mock
    from gerris_tpu.models import ns
    from gerris_tpu.ops.pallas import projops
    import dataclasses

    grid = Grid(level=9, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)

    def trace(foldc):
        # nitermax=99: keep this cfg distinct from every other test's —
        # ns_step is jitted on static cfg, and an identical cfg would
        # reuse a cached trace in which the spies never fire
        mp = poisson.MultilevelParams(tolerance=1e-3, nitermax=99,
                                      ncycles=1, fold_div=True,
                                      fold_correct=foldc,
                                      dense_coarse_max=1024)
        cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3,
                          beta=1.0, projection=mp, approx_projection=mp,
                          diffusion_params=dataclasses.replace(
                              mp, nrelax=8, fold_div=False,
                              fold_correct=False))
        z = jnp.zeros(grid.shape, jnp.float32)
        names = list(ns.velocity_names(2)) + ["P", "Pmac"] + \
            list(ns.gradient_names(2))
        state = {n: z for n in names}
        calls = {"fusedc": 0, "correct": 0}
        orig_f = poisson.solve_fused_div_correct
        orig_c = projops.correct_project
        try:
            def spy_f(*a, **k):
                calls["fusedc"] += 1
                return orig_f(*a, **k)

            def spy_c(*a, **k):
                calls["correct"] += 1
                return orig_c(*a, **k)
            poisson.solve_fused_div_correct = spy_f
            projops.correct_project = spy_c
            with mock.patch.object(jax, "default_backend",
                                   lambda: "tpu"):
                jax.make_jaxpr(functools.partial(ns.ns_step, cfg=cfg))(
                    state, jnp.float32(0.5 * grid.h), jnp.float32(0.0))
        finally:
            poisson.solve_fused_div_correct = orig_f
            projops.correct_project = orig_c
        return calls

    off = trace(False)
    on = trace(True)
    print(f"fold_correct off {off} on {on}")
    assert off["fusedc"] == 0 and off["correct"] >= 2, off
    assert on == {"fusedc": 2, "correct": 0}, on
