"""Block-sparse composite solves with RUNTIME tables: AMR cost ∝ leaves
inside the jitted NS step.

solvers/blockmg.py builds its index arrays as compile-time constants, so
every mesh change recompiles — unusable inside the per-step adaptive
loop.  Here the same block engine runs from CAPACITY-PADDED tables that
travel as ordinary jit inputs: adaptation rebuilds the tables on the
host (cheap numpy) and the compiled program is reused as long as the
per-level block capacities (power-of-two buckets) are unchanged.  This
is SURVEY.md §7's "capacity headroom + masks" applied at block
granularity, and the answer to VERDICT r2 item 2: the relax/residual
work per cycle is O(active blocks) = O(leaves), the reference's
defining AMR cost property (leaf-only tree relax, src/poisson.c:604-631).

Scope: 2D single-box meshes with constant Dirichlet/Neumann box BCs.
Coefficients: unit OR per-face ``alpha`` blocks (two-phase density
projections, gfs_poisson_coefficients src/poisson.c:756-901) and scalar
OR per-cell ``dia`` blocks (variable-density implicit diffusion) — the
reference relaxes leaves-only for ALL these systems
(src/poisson.c:604-631); so does this engine.  Everything else stays on
the dense mask engine (solvers/amr.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from . import poisson
from .blockmg import (BlockMesh, _halo, _lap, _nsum_den,
                      _restrict_children, _prolong_parent,
                      _reflux_to_parent, _pn_edge_cache, _edge)


def bucket(n: int) -> int:
    """Capacity bucket (>= 8, ~25% growth steps, 8-aligned): table
    shapes change only when the active-block count crosses a bucket
    boundary, so adaptation almost never recompiles — while the padded
    compute waste stays below ~25% (pow2 buckets measurably broke the
    cost-tracks-leaves property: capacity x3.15 for active x2.15)."""
    c = 8
    while c < n:
        c = -(-int(c * 1.25) // 8) * 8
    return c


def build_tables(mesh: BlockMesh, caps: Optional[Dict[int, int]] = None):
    """Pad a BlockMesh's per-level index arrays to capacity.

    Returns (tables, caps): ``tables`` is a jit-input pytree
    {level: {name: array}} with pad rows inert (nbr/pnbr/children = -1,
    bnd/leaf/active = False, parent clamped to 0)."""
    caps = dict(caps or {})
    tables = {}
    for l in range(mesh.lmin, mesh.lmax + 1):
        d = mesh.lv[l]
        n = len(d["bx"])
        cap = caps.get(l) or (n if l == mesh.lmin else bucket(n))
        caps[l] = cap
        assert cap >= n, (l, cap, n)

        def pad(a, fill):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return jnp.asarray(out)

        t = {
            "bx": pad(d["bx"].astype(np.int32), 0),
            "by": pad(d["by"].astype(np.int32), 0),
            "active": jnp.asarray(np.arange(cap) < n),
            "leaf": pad(d["leaf"], False),
            "nbr": pad(d["nbr"], -1),
            "pnbr": pad(d["pnbr"], -1),
            "bnd": pad(d["bnd"], False),
        }
        if l > mesh.lmin:
            t["parent"] = pad(np.maximum(d["parent"], 0), 0)
            t["parity"] = pad(d["parity"], 0)
        if l < mesh.lmax:
            t["children"] = pad(d["children"], -1)
        tables[l] = t
    return tables, caps


def gather_blocks(dense: jnp.ndarray, t: dict, B: int) -> jnp.ndarray:
    """Dense level array -> [cap, B, B] active blocks (O(cap B^2))."""
    ii = t["bx"][:, None, None] * B + jnp.arange(B)[None, :, None]
    jj = t["by"][:, None, None] * B + jnp.arange(B)[None, None, :]
    return dense[ii, jj]


def scatter_blocks(dense: jnp.ndarray, u: jnp.ndarray, t: dict,
                   B: int) -> jnp.ndarray:
    """Write active blocks back into the dense level array.

    Pad rows alias block (0,0) (their bx/by are clamped to 0), and XLA
    scatter with duplicate indices has no deterministic winner — a pad
    row writing the old value could overwrite the real block-0 update
    (it DID, whenever the domain-corner block was an active leaf).  Pad
    rows are therefore routed out of bounds and dropped."""
    n = dense.shape[0]
    act = t["active"][:, None, None]
    ii = jnp.where(act, t["bx"][:, None, None] * B
                   + jnp.arange(B)[None, :, None], n)
    jj = t["by"][:, None, None] * B + jnp.arange(B)[None, None, :]
    return dense.at[ii, jj].set(jnp.where(act, u, 0.0), mode="drop")


def gather_face_blocks(alpha_l, t: dict, B: int):
    """Dense per-axis face-coefficient arrays ((N+1,N), (N,N+1)) ->
    block face arrays (fx [cap,B+1,B], fy [cap,B,B+1]).  A block's B+1
    face strips cover every face it touches, so the 5-point stencil
    needs no face halo."""
    ax, ay = alpha_l
    ii = t["bx"][:, None, None] * B + jnp.arange(B + 1)[None, :, None]
    jj = t["by"][:, None, None] * B + jnp.arange(B)[None, None, :]
    fx = ax[ii, jj]
    ii2 = t["bx"][:, None, None] * B + jnp.arange(B)[None, :, None]
    jj2 = t["by"][:, None, None] * B + jnp.arange(B + 1)[None, None, :]
    fy = ay[ii2, jj2]
    return fx, fy


def _edge_alpha(fxy, B: int):
    """[n,4,B] boundary-face coefficients of each block (directions
    -x,+x,-y,+y) for the alpha-weighted reflux."""
    fx, fy = fxy
    return jnp.stack([fx[:, 0, :], fx[:, B, :],
                      fy[:, :, 0], fy[:, :, B]], axis=1)


def _bc_kinds(fbc: bcs.FieldBC):
    """Static (isdir[k], dval[k]) per direction k (constant values)."""
    isdir = []
    dval = []
    for k in range(4):
        ax, sd = (0, 0) if k == 0 else (0, 1) if k == 1 else \
            (1, 0) if k == 2 else (1, 1)
        b = fbc.sides[ax][sd]
        isdir.append(b.kind == bcs.DIRICHLET)
        dval.append(0.0 if callable(b.value)
                    else float(bcs.bc_value(b) or 0.0))
    return tuple(isdir), tuple(dval)


def _bvals_rt(t: dict, isdir, dval, homogeneous: bool, cap: int, B: int):
    """(isdir[n,4], None, dval[n,4,B]) from runtime tables + static BC
    encodings (constant values only)."""
    isd = jnp.stack([t["bnd"][:, k] & bool(isdir[k]) for k in range(4)],
                    axis=1)
    dv = jnp.broadcast_to(
        jnp.asarray([0.0 if homogeneous else dval[k] for k in range(4)]
                    )[None, :, None], (cap, 4, B)).astype(jnp.float32)
    return (isd, None, dv)


def _relax_blocks(du, r, t, up, bv0, B, h, dia, nswp, fxy=None):
    """nswp red-black sweeps on [cap,B,B] blocks (homogeneous BCs).
    B is even, so the global cell parity is (i+j) % 2 independent of the
    block coordinates.  ``dia``: scalar or [cap,B,B]; ``fxy``: optional
    per-face coefficient blocks."""
    i = jnp.arange(B)[:, None] + jnp.arange(B)[None, :]
    for _ in range(nswp):
        for color in (0, 1):
            idx = dict(t)
            if up is not None:
                idx["_pn_edge"] = _pn_edge_cache(up, t, B)
            pad = _halo(du, up, idx, B, bvals=bv0, homogeneous=True)
            nsum, den = _nsum_den(pad, fxy)
            new = (nsum - h * h * r) / (den + dia * h * h)
            red = jnp.asarray((i % 2) == color)[None]
            du = jnp.where(red, new, du)
    return du


def sync_up(u, tables, lmin, lmax):
    """Restrict fine data into covered coarse blocks."""
    out = dict(u)
    for l in range(lmax - 1, lmin - 1, -1):
        t = tables[l]
        r = _restrict_children(out[l + 1], t["children"])
        cov = (~t["leaf"]) & t["active"]
        out[l] = jnp.where(cov[:, None, None], r, out[l])
    return out


def leaf_residual(u, rhs, tables, base: Grid, fbck, dia, lmin, lmax, B,
                  caps, alphab=None):
    """Leaf-masked composite residual with flux-conservative reflux at
    fine-coarse faces (src/poisson.c:634-747 + src/fluid.c:905).
    ``dia``: scalar or {level: [cap,B,B]}; ``alphab``: optional
    {level: (fx, fy)} face-coefficient blocks."""
    isdir, dval = fbck
    u = sync_up(dict(u), tables, lmin, lmax)
    res = {}
    reflux = {}
    for l in range(lmax, lmin - 1, -1):
        t = tables[l]
        h = base.size / (1 << l)
        up = u.get(l - 1) if l > lmin else None
        idx = dict(t)
        if up is not None:
            idx["_pn_edge"] = _pn_edge_cache(up, t, B)
        bv = _bvals_rt(t, isdir, dval, False, caps[l], B)
        pad = _halo(u[l], up, idx, B, bvals=bv, homogeneous=False)
        fxy = None if alphab is None else alphab[l]
        dl = dia[l] if isinstance(dia, dict) else dia
        r = rhs[l] - _lap(pad, h, fxy) + dl * u[l]
        if l in reflux:
            r = r - reflux[l]
        if up is not None:
            reflux[l - 1] = _reflux_to_parent(
                pad, idx, B, caps[l - 1], h,
                af4=None if fxy is None else _edge_alpha(fxy, B))
        res[l] = jnp.where((t["leaf"] & t["active"])[:, None, None],
                           r, 0.0)
    return res


def cycle(u, rhs, tables, base: Grid, fbc: bcs.FieldBC,
          params: poisson.MultilevelParams, dia, lmin, lmax, B, caps,
          alphab=None, alpha_dense0=None, dia_dense0=None):
    """One composite sawtooth cycle — pure jittable function of the
    runtime tables (adaptation changes table VALUES only).
    ``alphab``/``dia`` may carry per-level face/cell coefficient blocks;
    ``alpha_dense0``/``dia_dense0``: the base level's DENSE coefficient
    arrays for the uniform coarse solve."""
    fbck = _bc_kinds(fbc)
    u = sync_up(dict(u), tables, lmin, lmax)
    res = leaf_residual(u, rhs, tables, base, fbck, dia, lmin, lmax, B,
                        caps, alphab=alphab)
    # residual stack: restrict into covered blocks
    r = {}
    acc = None
    for l in range(lmax, lmin - 1, -1):
        t = tables[l]
        rl = res[l]
        if acc is not None:
            rr = _restrict_children(acc, t["children"])
            cov = (~t["leaf"]) & t["active"]
            rl = jnp.where(cov[:, None, None], rr, rl)
        r[l] = rl
        acc = rl
    # dense base solve at lmin (the base level is fully active: every
    # cell has depth >= lmin, so caps[lmin] == exact count)
    g0 = base
    N0 = g0.shape[0]
    t0 = tables[lmin]
    dense_r = jnp.zeros((N0, N0), r[lmin].dtype)
    ii = t0["bx"][:, None, None] * B + jnp.arange(B)[None, :, None]
    jj = t0["by"][:, None, None] * B + jnp.arange(B)[None, None, :]
    dense_r = dense_r.at[ii, jj].set(r[lmin])
    if dia_dense0 is None:
        assert not isinstance(dia, dict), \
            "per-cell dia blocks need dia_dense0 (dense base-level array)"
        dia0 = dia
    else:
        dia0 = dia_dense0
    du0 = poisson.correction(dense_r, g0, fbc, params, alpha=alpha_dense0,
                             dia=dia0)
    rl0 = poisson.residual(du0, dense_r, g0, fbc, alpha=alpha_dense0,
                           dia=dia0, homogeneous=True)
    du0 = du0 + poisson.correction(rl0, g0, fbc, params,
                                   alpha=alpha_dense0, dia=dia0)
    dus = {lmin: du0[ii, jj]}
    # upward: prolong + relax per level (homogeneous)
    isdir, dval = fbck
    for l in range(lmin + 1, lmax + 1):
        t = tables[l]
        h = base.size / (1 << l)
        du = _prolong_parent(dus[l - 1], t, B)
        bv0 = _bvals_rt(t, isdir, dval, True, caps[l], B)
        nswp = params.nrelax * (params.erelax ** (lmax - l))
        du = _relax_blocks(du, r[l], t, dus[l - 1], bv0, B, h,
                           dia[l] if isinstance(dia, dict) else dia,
                           nswp,
                           fxy=None if alphab is None else alphab[l])
        dus[l] = du
    out = {}
    for l in range(lmin, lmax + 1):
        out[l] = u[l] + dus[l]
    return sync_up(out, tables, lmin, lmax)


@dataclasses.dataclass(frozen=True)
class BlockRT:
    """Static descriptor of a runtime-table block solve (hashable; the
    tables themselves are jit inputs)."""
    base: Grid
    lmin: int
    lmax: int
    B: int
    caps: tuple          # ((level, cap), ...) static capacities

    @property
    def caps_dict(self):
        return dict(self.caps)


def make_blockrt(base: Grid, lmax: int, depth_cells: np.ndarray,
                 B: int = 8, caps: Optional[dict] = None):
    """(descriptor, tables) for a depth map.  Reuse the descriptor's caps
    on later adapts so table shapes (and the compiled step) are stable."""
    mesh = BlockMesh.build(base, lmax, depth_cells, B=B)
    # grow requested caps to fit this mesh
    caps = dict(caps or {})
    for l in range(mesh.lmin, mesh.lmax + 1):
        need = len(mesh.lv[l]["bx"])
        if caps.get(l, 0) < need:
            caps[l] = need if l == mesh.lmin else bucket(need)
    tables, caps = build_tables(mesh, caps)
    rt = BlockRT(base=base, lmin=mesh.lmin, lmax=mesh.lmax, B=B,
                 caps=tuple(sorted(caps.items())))
    return rt, tables, mesh


def demean_leaf(rhs_blocks, tables, rt: "BlockRT"):
    """Subtract the leaf-volume-weighted mean (pure-Neumann/periodic
    compatibility, cf. GfsPoisson correct_div
    src/simulation.c:2156-2186) — on the composite mesh the weight is
    the leaf cell volume per level."""
    tot = 0.0
    vol = 0.0
    for l in rhs_blocks:
        t = tables[l]
        w = (t["leaf"] & t["active"])[:, None, None]
        cv = (rt.base.size / (1 << l)) ** 2
        tot = tot + jnp.sum(jnp.where(w, rhs_blocks[l], 0.0)) * cv
        vol = vol + jnp.sum(w) * (rt.B ** 2) * cv
    mean = tot / jnp.maximum(vol, 1e-300)
    return {l: rhs_blocks[l] - mean for l in rhs_blocks}


def solve_tol(rhs_blocks, tables, rt: BlockRT, fbc: bcs.FieldBC,
              params: poisson.MultilevelParams, dia=0.0, u0=None,
              alphab=None, alpha_dense0=None, dia_dense0=None):
    """Tolerance-driven block solve (jit-compatible lax.while_loop over
    cycles with one leaf-residual evaluation each — the block-space
    analogue of amr.solve; reference gfs_poisson_solve semantics,
    src/poisson.c:1225-1269).  Needed for the stiff two-phase systems
    where a fixed short schedule under-converges (1000x density).
    Returns (u_blocks, niter, rinf)."""
    import jax

    u = u0 if u0 is not None else {
        l: jnp.zeros_like(rhs_blocks[l]) for l in rhs_blocks}
    fbck = _bc_kinds(fbc)
    lmin, lmax, B = rt.lmin, rt.lmax, rt.B
    caps = rt.caps_dict

    scale = 0.0
    for l in rhs_blocks:
        w = (tables[l]["leaf"] & tables[l]["active"])[:, None, None]
        scale = jnp.maximum(scale, jnp.max(jnp.abs(
            jnp.where(w, rhs_blocks[l], 0.0))))
    tol = params.tolerance * jnp.maximum(scale, 1e-300)

    def rinf_of(uu):
        res = leaf_residual(uu, rhs_blocks, tables, rt.base, fbck, dia,
                            lmin, lmax, B, caps, alphab=alphab)
        m = 0.0
        for l in res:
            m = jnp.maximum(m, jnp.max(jnp.abs(res[l])))
        return m

    def cond(s):
        uu, rinf, i = s
        return (i < params.nitermin) | ((i < params.nitermax)
                                        & (rinf > tol))

    def body(s):
        uu, _, i = s
        uu = cycle(uu, rhs_blocks, tables, rt.base, fbc, params, dia,
                   lmin, lmax, B, caps, alphab=alphab,
                   alpha_dense0=alpha_dense0, dia_dense0=dia_dense0)
        return uu, rinf_of(uu), i + 1

    big = jnp.asarray(jnp.inf, rhs_blocks[lmax].dtype)
    u, rinf, niter = jax.lax.while_loop(cond, body,
                                        (u, big, jnp.asarray(0)))
    return u, niter, rinf


def solve(rhs_blocks, tables, rt: BlockRT, fbc: bcs.FieldBC,
          params: poisson.MultilevelParams, dia=0.0, u0=None,
          ncycles: int = None, alphab=None, alpha_dense0=None,
          dia_dense0=None):
    """Fixed-cycle composite solve on block arrays (jittable).
    rhs/u0: {level: [cap, B, B]}; ``dia``: scalar or {level: blocks}
    (with ``dia_dense0`` the dense base-level array); ``alphab``:
    {level: (fx, fy)} face-coefficient blocks (with ``alpha_dense0``
    the dense base-level face arrays)."""
    n = ncycles if ncycles is not None else max(params.nitermin, 2)
    u = u0 if u0 is not None else {
        l: jnp.zeros_like(rhs_blocks[l]) for l in rhs_blocks}
    for _ in range(n):
        u = cycle(u, rhs_blocks, tables, rt.base, fbc, params, dia,
                  rt.lmin, rt.lmax, rt.B, rt.caps_dict, alphab=alphab,
                  alpha_dense0=alpha_dense0, dia_dense0=dia_dense0)
    return u


def solve_dense(rhs_dense, tables, rt: BlockRT, fbc: bcs.FieldBC,
                params: poisson.MultilevelParams, dia=0.0,
                u0_dense=None, ncycles: int = None):
    """Dense-per-level in/out wrapper: gather active blocks (O(active)),
    solve, scatter back (non-active regions keep u0)."""
    B = rt.B
    rhs_b = {l: gather_blocks(rhs_dense[l], tables[l], B)
             for l in rhs_dense}
    u0_b = None
    if u0_dense is not None:
        u0_b = {l: gather_blocks(u0_dense[l], tables[l], B)
                for l in u0_dense}
    u_b = solve(rhs_b, tables, rt, fbc, params, dia=dia, u0=u0_b,
                ncycles=ncycles)
    out = {}
    for l in rhs_dense:
        dense = u0_dense[l] if u0_dense is not None \
            else jnp.zeros_like(rhs_dense[l])
        out[l] = scatter_blocks(dense, u_b[l], tables[l], B)
    return out
