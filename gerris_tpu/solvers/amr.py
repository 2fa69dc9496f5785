"""Dynamic-mask composite AMR numerics (multigrid + interface transfers).

TPU-native rebuild of the reference's adaptive-tree numerics
(reference: src/poisson.c gfs_poisson_cycle on trees of non-uniform depth
:1109-1178, fine-coarse face gradients gfs_face_weighted_gradient
src/fluid.c:905, per-variable restriction/prolongation callbacks
src/variable.h:46, reshape/2:1 grading src/adaptive.c:998).

Design (the round-2 revision of solvers/composite.py): the mesh levels in
[lmin, lmax] each store a FULL domain array plus a *runtime* leaf mask.
The masks are ordinary jnp arrays — dynamic jit inputs — so adapting the
mesh every timestep NEVER recompiles: shapes are static, only mask values
change (SURVEY.md §7 hard part (a): "capacity headroom + masks").  This is
the XLA answer to dynamic AMR; the reference pays pointer surgery
(ftt_cell_refine/coarsen) instead.

Cell roles per level (all derived from the leaf masks inside jit):
  leaf(l)     — actual solution cell;
  covered(l)  — internal: under finer leaves, holds restricted fine data
                (the reference's gfs_cell_coarse_init);
  slave(l)    — over a coarser leaf, holds prolonged coarse data (the
                reference's ghost/fine-coarse interpolation).

With covered+slave synced, the uniform stencil at leaves IS the composite
operator; a flux-conservative correction (``reflux``) replaces the coarse
interface gradient with the area-weighted mean of the fine-side gradients
(gfs_face_weighted_gradient's fine-coarse branch).

The operator is div(alpha grad u) - dia u with per-level face-coefficient
tuples ``alpha`` and per-level cell (or scalar) ``dia`` — covering the
variable-density projections (PhysicalParams alpha) and the implicit
diffusion solver on adaptive meshes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from . import poisson


@dataclasses.dataclass(frozen=True)
class Topo:
    """Static (hashable) composite-mesh topology: base grid + level range.

    The dynamic part — which cells are leaves — travels separately as a
    ``{level: bool array}`` pytree."""
    base: Grid               # grid at lmin
    lmin: int
    lmax: int

    def grid(self, l: int) -> Grid:
        return dataclasses.replace(self.base, level=l)

    @property
    def levels(self):
        return range(self.lmin, self.lmax + 1)

    @property
    def dim(self):
        return self.base.dim


def pool_any(m: jnp.ndarray, dim: int) -> jnp.ndarray:
    """2x2(x2) any-pool: child mask -> parent mask."""
    sh = []
    for a in range(dim):
        sh += [m.shape[a] // 2, 2]
    red = tuple(2 * a + 1 for a in range(dim))
    return m.reshape(sh).any(axis=red)


def pool_max(c: jnp.ndarray, dim: int) -> jnp.ndarray:
    sh = []
    for a in range(dim):
        sh += [c.shape[a] // 2, 2]
    red = tuple(2 * a + 1 for a in range(dim))
    return c.reshape(sh).max(axis=red)


def covered_masks(leaf: Dict[int, jnp.ndarray], topo: Topo) -> Dict[int, jnp.ndarray]:
    """covered(l) = some finer leaf lies under the cell (internal cells)."""
    cov = {topo.lmax: jnp.zeros_like(leaf[topo.lmax])}
    acc = leaf[topo.lmax]
    for l in range(topo.lmax - 1, topo.lmin - 1, -1):
        cov[l] = pool_any(acc, topo.dim)
        acc = leaf[l] | cov[l]
    return cov


def sync(u: Dict[int, jnp.ndarray], topo: Topo, leaf: Dict[int, jnp.ndarray],
         fbc: bcs.FieldBC, homogeneous: bool = False, t: float = 0.0,
         cov: Optional[Dict[int, jnp.ndarray]] = None) -> Dict[int, jnp.ndarray]:
    """Restriction into covered cells (up), prolongation into slaves (down).

    Reference: gfs_domain_cell_traverse coarse-init + fine-coarse ghost
    interpolation (src/domain.c, src/variable.h:46)."""
    if cov is None:
        cov = covered_masks(leaf, topo)
    u = dict(u)
    for l in range(topo.lmax - 1, topo.lmin - 1, -1):
        r = poisson.restrict(u[l + 1], topo.dim)
        u[l] = jnp.where(cov[l], r, u[l])
    for l in range(topo.lmin + 1, topo.lmax + 1):
        p = poisson.prolong(u[l - 1], topo.grid(l - 1), fbc,
                            homogeneous=homogeneous, t=t)
        slave = ~(leaf[l] | cov[l])
        u[l] = jnp.where(slave, p, u[l])
    return u


def fill_slaves(u: Dict[int, jnp.ndarray], topo: Topo,
                leaf: Dict[int, jnp.ndarray], fbc: bcs.FieldBC,
                homogeneous: bool = False, t: float = 0.0,
                cov: Optional[Dict[int, jnp.ndarray]] = None
                ) -> Dict[int, jnp.ndarray]:
    """The downward (prolongation-into-slaves) half of ``sync`` only —
    refreshes ghost regions from fresh leaf data without touching
    covered cells (used after leaf-only block advection,
    solvers/blockadv.py)."""
    if cov is None:
        cov = covered_masks(leaf, topo)
    u = dict(u)
    for l in range(topo.lmin + 1, topo.lmax + 1):
        p = poisson.prolong(u[l - 1], topo.grid(l - 1), fbc,
                            homogeneous=homogeneous, t=t)
        slave = ~(leaf[l] | cov[l])
        u[l] = jnp.where(slave, p, u[l])
    return u


def sync_vof(u: Dict[int, jnp.ndarray], topo: Topo,
             leaf: Dict[int, jnp.ndarray], fbc: bcs.FieldBC,
             t: float = 0.0,
             cov: Optional[Dict[int, jnp.ndarray]] = None
             ) -> Dict[int, jnp.ndarray]:
    """sync() for VOF fractions: volume-mean restriction up (exact for
    fractions), PLIC-GEOMETRIC prolongation down (vof.prolong_geometric
    — the reference's gfs_vof_coarse_fine, src/vof.c:210-296).  Linear
    prolongation smears the slave-cell interface band that the finer
    sweeps read as ghosts and systematically biases composite VOF
    advection (round-4 oscillation-frequency drift)."""
    from ..physics import vof as vofm
    if cov is None:
        cov = covered_masks(leaf, topo)
    u = dict(u)
    for l in range(topo.lmax - 1, topo.lmin - 1, -1):
        r = poisson.restrict(u[l + 1], topo.dim)
        u[l] = jnp.where(cov[l], r, u[l])
    for l in range(topo.lmin + 1, topo.lmax + 1):
        p = vofm.prolong_geometric(u[l - 1], topo.grid(l - 1), fbc, t=t)
        slave = ~(leaf[l] | cov[l])
        u[l] = jnp.where(slave, p, u[l])
    return u


def _face_restrict(f: jnp.ndarray, axis: int, dim: int) -> jnp.ndarray:
    """Coarse face values = transverse mean of the aligned fine faces:
    take every 2nd face along ``axis``, mean-pool the transverse axes."""
    idx = [slice(None)] * dim
    idx[axis] = slice(0, f.shape[axis] + 1, 2)
    g = f[tuple(idx)]
    for o in range(dim):
        if o == axis:
            continue
        sh = list(g.shape)
        n = sh[o]
        sh[o:o + 1] = [n // 2, 2]
        g = g.reshape(sh).mean(axis=o + 1)
    return g


def sync_faces(uf: Dict[int, list], topo: Topo, leaf: Dict[int, jnp.ndarray],
               cov: Optional[Dict[int, jnp.ndarray]] = None) -> Dict[int, list]:
    """Make coarse face-normal fields consistent with the finer level: at
    faces under refined regions, coarse value := mean of the aligned fine
    faces (the reference's gfs_face_coarse_fine consistency; flux exactness
    at coarse-fine interfaces)."""
    if cov is None:
        cov = covered_masks(leaf, topo)
    dim = topo.dim
    out = {topo.lmax: list(uf[topo.lmax])}
    for l in range(topo.lmax - 1, topo.lmin - 1, -1):
        faces = []
        for axis in range(dim):
            f = uf[l][axis]
            r = _face_restrict(out[l + 1][axis], axis, dim)
            # a coarse face adopts the fine value when either adjacent cell
            # is covered-by-finer (interface faces + interior of the patch)
            pad = [(0, 0)] * dim
            pad[axis] = (1, 1)
            cp = jnp.pad(cov[l], pad)
            n = cp.shape[axis]
            lo = [slice(None)] * dim
            lo[axis] = slice(0, n - 1)
            hi = [slice(None)] * dim
            hi[axis] = slice(1, n)
            covf = cp[tuple(lo)] | cp[tuple(hi)]
            faces.append(jnp.where(covf, r, f))
        out[l] = faces
    return out


# ---------------------------------------------------------------------------
# Composite residual with flux-conservative interfaces
# ---------------------------------------------------------------------------

def _reflux(u: Dict[int, jnp.ndarray], topo: Topo, leaf, cov, l: int,
            alpha_f=None, alpha_c=None) -> jnp.ndarray:
    """Additive correction D to the level-l laplacian at coarse-fine
    interface leaves: coarse face gradient -> area-weighted mean of the two
    fine-side face gradients (optionally alpha-weighted).
    Reference: gfs_face_weighted_gradient fine-coarse branch
    (src/fluid.c:905), residual at fine-coarse faces (src/poisson.c:634).
    """
    if l == topo.lmax:
        return jnp.zeros(topo.grid(l).shape, u[l].dtype)
    gH, gh = topo.grid(l), topo.grid(l + 1)
    H, h = gH.h, gh.h
    dim = topo.dim
    uf, uc = u[l + 1], u[l]
    corr = jnp.zeros(gH.shape, uc.dtype)
    for axis in range(dim):
        nH = gH.shape[axis]
        # fine face gradients (full face array, 0 at domain boundary)
        d = jnp.diff(uf, axis=axis) / h
        if alpha_f is not None:
            inner = [slice(None)] * dim
            inner[axis] = slice(1, gh.shape[axis])
            d = d * alpha_f[axis][tuple(inner)]
        pad = [(0, 0)] * dim
        pad[axis] = (1, 1)
        d_full = jnp.pad(d, pad)
        g_fine = _face_restrict(d_full, axis, dim)          # (nH+1) faces
        # coarse one-sided gradients on the same faces
        dc = jnp.diff(uc, axis=axis) / H
        if alpha_c is not None:
            inner = [slice(None)] * dim
            inner[axis] = slice(1, nH)
            dc = dc * alpha_c[axis][tuple(inner)]
        g_coarse = jnp.pad(dc, pad)
        # interface faces: one side covered-by-finer, other side leaf
        covp = jnp.pad(cov[l], pad)
        leafp = jnp.pad(leaf[l], pad)
        lo = [slice(None)] * dim
        lo[axis] = slice(0, nH + 1)
        hi = [slice(None)] * dim
        hi[axis] = slice(1, nH + 2)
        iface = ((covp[tuple(lo)] & leafp[tuple(hi)]) |
                 (leafp[tuple(lo)] & covp[tuple(hi)]))
        delta = jnp.where(iface, g_fine - g_coarse, 0.0)
        hi_c = [slice(None)] * dim
        hi_c[axis] = slice(1, nH + 1)
        lo_c = [slice(None)] * dim
        lo_c[axis] = slice(0, nH)
        corr = corr + (delta[tuple(hi_c)] - delta[tuple(lo_c)]) / H
    return jnp.where(leaf[l], corr, 0.0)


def leaf_residual(u, rhs, topo: Topo, leaf, fbc: bcs.FieldBC,
                  alpha=None, dia=None, t: float = 0.0, reflux: bool = True,
                  cov=None) -> Dict[int, jnp.ndarray]:
    """Composite residual on leaves (zero elsewhere); assumes synced u."""
    if cov is None:
        cov = covered_masks(leaf, topo)
    out = {}
    for l in topo.levels:
        al = None if alpha is None else alpha[l]
        dl = None if dia is None else dia[l]
        r = poisson.residual(u[l], rhs[l], topo.grid(l), fbc,
                             alpha=al, dia=dl, t=t)
        if reflux:
            af = None if alpha is None else alpha.get(l + 1)
            r = r - _reflux(u, topo, leaf, cov, l, alpha_f=af, alpha_c=al)
        out[l] = jnp.where(leaf[l], r, 0.0)
    return out


def cycle(u, rhs, topo: Topo, leaf, fbc: bcs.FieldBC,
          params: poisson.MultilevelParams, alpha=None, dia=None,
          t: float = 0.0, cov=None) -> Dict[int, jnp.ndarray]:
    """One sawtooth cycle over the composite hierarchy (the reference's
    gfs_poisson_cycle, src/poisson.c:1109-1178, whose levels are tree
    cuts; each dense level array with masks IS the tree cut)."""
    if cov is None:
        cov = covered_masks(leaf, topo)
    u = sync(u, topo, leaf, fbc, t=t, cov=cov)
    res = leaf_residual(u, rhs, topo, leaf, fbc, alpha=alpha, dia=dia, t=t,
                        cov=cov)
    # residual stack: leaf residuals + restriction of finer residuals into
    # covered cells (get_from_below, src/poisson.c:1044)
    r = {}
    acc = None
    for l in range(topo.lmax, topo.lmin - 1, -1):
        rl = res[l]
        if acc is not None:
            rl = jnp.where(cov[l], poisson.restrict(acc, topo.dim), rl)
        r[l] = rl
        acc = rl

    # base-level correction: full uniform multigrid on the lmin grid (the
    # analogue of the reference's tree continuing below the shallowest
    # leaf, src/poisson.c:1225)
    a0 = None if alpha is None else alpha[topo.lmin]
    d0 = None if dia is None else dia[topo.lmin]
    du = jnp.zeros_like(r[topo.lmin])
    for _ in range(2):
        rl = poisson.residual(du, r[topo.lmin], topo.base, fbc,
                              alpha=a0, dia=d0, homogeneous=True)
        du = du + poisson.correction(rl, topo.base, fbc, params,
                                     alpha=a0, dia=d0)
    dus = {topo.lmin: du}
    for l in range(topo.lmin + 1, topo.lmax + 1):
        du = poisson.prolong(dus[l - 1], topo.grid(l - 1), fbc,
                             homogeneous=True)
        k = topo.lmax - l
        nswp = params.nrelax * (params.erelax ** k)
        act = leaf[l] | cov[l]
        al = None if alpha is None else alpha[l]
        dl = None if dia is None else dia[l]
        for _ in range(nswp):
            du_new = poisson.relax(du, r[l], topo.grid(l), fbc, 1,
                                   alpha=al, dia=dl, homogeneous=True,
                                   omega=params.omega)
            du = jnp.where(act, du_new, du)
        dus[l] = du

    out = {}
    for l in topo.levels:
        act = leaf[l] | cov[l]
        out[l] = u[l] + jnp.where(act, dus[l], 0.0)
    return sync(out, topo, leaf, fbc, t=t, cov=cov)


def leaf_volume_mean(f: Dict[int, jnp.ndarray], topo: Topo, leaf):
    # keep the field dtype: bool mask * python float would promote f32
    # fields to f64 under x64 (and poison the solve carry types)
    dt = jnp.result_type(*(f[l] for l in topo.levels))
    vol = 0.0
    tot = 0.0
    for l in topo.levels:
        w = leaf[l].astype(dt) * jnp.asarray(topo.grid(l).cell_volume, dt)
        vol = vol + jnp.sum(w)
        tot = tot + jnp.sum(f[l] * w)
    return tot / vol


def solve(rhs, topo: Topo, leaf, fbc: bcs.FieldBC,
          params: poisson.MultilevelParams = None, alpha=None, dia=None,
          u0=None, t: float = 0.0):
    """Tolerance-driven composite solve, fully jit-compatible
    (lax.while_loop; one residual evaluation per cycle).  Returns
    (u, niter, rinf).

    Pure-Neumann compatibility: the leaf-volume-weighted mean of rhs is
    removed when dia == 0 (GfsPoisson correct_div, src/simulation.c:2156).
    """
    params = params or poisson.MultilevelParams()
    cov = covered_masks(leaf, topo)
    if u0 is None:
        u = {l: jnp.zeros(topo.grid(l).shape,
                          jnp.result_type(rhs[topo.lmax]))
             for l in topo.levels}
    else:
        u = dict(u0)
    dirichlet = any(b.kind == bcs.DIRICHLET
                    for ax in fbc.sides for b in ax)
    if not dirichlet and dia is None:
        mean = leaf_volume_mean(rhs, topo, leaf)
        rhs = {l: rhs[l] - mean for l in rhs}

    scale = 0.0
    for l in topo.levels:
        scale = jnp.maximum(scale, jnp.max(jnp.abs(
            jnp.where(leaf[l], rhs[l], 0.0))))
    tol = params.tolerance * jnp.maximum(scale, 1e-300)

    def rinf_of(uu):
        res = leaf_residual(uu, rhs, topo, leaf, fbc, alpha=alpha, dia=dia,
                            t=t, cov=cov)
        m = 0.0
        for l in topo.levels:
            m = jnp.maximum(m, jnp.max(jnp.abs(res[l])))
        return m

    u = sync(u, topo, leaf, fbc, t=t, cov=cov)

    def cond(s):
        uu, rinf, i = s
        return (i < params.nitermin) | ((i < params.nitermax) & (rinf > tol))

    def body(s):
        uu, _, i = s
        uu = cycle(uu, rhs, topo, leaf, fbc, params, alpha=alpha, dia=dia,
                   t=t, cov=cov)
        return uu, rinf_of(uu), i + 1

    u, rinf, niter = jax.lax.while_loop(
        cond, body, (u, jnp.asarray(jnp.inf, jnp.result_type(rhs[topo.lmax])),
                     jnp.asarray(0)))
    return u, niter, rinf


def flatten(u, topo: Topo, leaf, fbc: bcs.FieldBC, t: float = 0.0):
    """Single finest-level array (prolonged from coarse where needed)."""
    return sync(u, topo, leaf, fbc, t=t)[topo.lmax]


def solve_block(rhs, topo: Topo, leaf, fbc: bcs.FieldBC,
                params: poisson.MultilevelParams, brt, btables,
                dia=None, u0=None, t: float = 0.0, alpha=None):
    """Leaf-proportional composite solve through the runtime-table block
    engine (solvers/blockrt.py) with the same in/out conventions as
    ``solve``: dense per-level arrays, slaves synced on return.  The
    relax/residual work per cycle is O(active blocks) — the reference's
    leaf-only tree relax (src/poisson.c:604-631) — while ``solve``
    touches every level's full domain.  2D single box; ``alpha``:
    optional {level: (ax, ay)} dense face coefficients (two-phase
    density); ``dia``: None, scalar, or {level: scalar|dense array}
    (variable-density diffusion).  Returns (u, ncycles, rinf)."""
    from . import blockrt as brtm

    params = params or poisson.MultilevelParams()
    B = brt.B
    # dia: normalize to scalar or per-level block arrays
    d = 0.0
    dia_dense0 = None
    if dia is not None:
        if isinstance(dia, dict):
            if jnp.ndim(dia[topo.lmax]) == 0:
                d = dia[topo.lmax]
            else:
                d = {l: brtm.gather_blocks(dia[l], btables[l], B)
                     for l in topo.levels}
                dia_dense0 = dia[topo.lmin]
        else:
            d = dia
    alphab = alpha_dense0 = None
    if alpha is not None:
        alphab = {l: brtm.gather_face_blocks(alpha[l], btables[l], B)
                  for l in topo.levels}
        alpha_dense0 = alpha[topo.lmin]
    rhs_b = {l: brtm.gather_blocks(rhs[l], btables[l], B)
             for l in topo.levels}
    dirichlet = any(b.kind == bcs.DIRICHLET
                    for ax in fbc.sides for b in ax)
    if not dirichlet and dia is None:
        rhs_b = brtm.demean_leaf(rhs_b, btables, brt)
        mean = leaf_volume_mean(rhs, topo, leaf)
        rhs = {l: rhs[l] - mean for l in rhs}
    u0_b = None
    if u0 is not None:
        u0_b = {l: brtm.gather_blocks(u0[l], btables[l], B)
                for l in topo.levels}
    if params.ncycles > 0:
        # fixed schedule (the launch-count-optimal TPU production path)
        ncycles = params.ncycles
        u_b = brtm.solve(rhs_b, btables, brt, fbc, params, dia=d,
                         u0=u0_b, ncycles=ncycles, alphab=alphab,
                         alpha_dense0=alpha_dense0,
                         dia_dense0=dia_dense0)
        niter = jnp.asarray(ncycles)
    else:
        # tolerance-driven (gfs_poisson_solve semantics) — the stiff
        # two-phase systems under-converge on short fixed schedules
        u_b, niter, _ = brtm.solve_tol(
            rhs_b, btables, brt, fbc, params, dia=d, u0=u0_b,
            alphab=alphab, alpha_dense0=alpha_dense0,
            dia_dense0=dia_dense0)
    u = {}
    for l in topo.levels:
        dense = u0[l] if u0 is not None else jnp.zeros_like(rhs[l])
        u[l] = brtm.scatter_blocks(dense, u_b[l], btables[l], B)
    u = sync(u, topo, leaf, fbc, t=t)
    # honest convergence report for the fixed schedule (ADVICE r3): one
    # leaf-residual evaluation so under-convergence is visible to
    # callers instead of a silent 0.0.  Evaluated with the BLOCK
    # engine's own operator: its fine-coarse interface stencil
    # (parent-interpolated ghosts + pair-mean reflux) is a consistent
    # discretization but NOT identical to the dense engine's, so the
    # dense residual of a fully-converged block solution is O(1) at
    # interface cells — meaningless as a convergence measure.
    fbck = brtm._bc_kinds(fbc)
    res_b = brtm.leaf_residual(
        u_b, rhs_b, btables, brt.base, fbck, d, brt.lmin, brt.lmax, B,
        brt.caps_dict, alphab=alphab)
    rinf = 0.0
    for l in topo.levels:
        rinf = jnp.maximum(rinf, jnp.max(jnp.abs(res_b[l])))
    return u, niter, rinf
