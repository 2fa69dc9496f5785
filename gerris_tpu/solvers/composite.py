"""Composite-grid (multi-level / AMR) Poisson multigrid.

TPU-native rebuild of the reference's tree multigrid on ADAPTIVE meshes
(reference: src/poisson.c gfs_poisson_cycle on trees of non-uniform depth —
relax with FTT_TRAVERSE_LEVEL semantics :604-631, fine-coarse face
gradients gfs_face_weighted_gradient src/fluid.c:905, restriction/
prolongation per variable via fine_coarse/coarse_fine callbacks
src/variable.h:46; mesh state after gfs_simulation_adapt / refine).

Dense-array composite design (SURVEY.md §7 stage 4): every level l in
[lmin, lmax] stores a FULL domain array at that resolution plus a leaf
mask.  Cell roles per level:

  leaf(l)     — an actual solution cell;
  internal(l) — covered by finer leaves: holds the restriction of finer
                data (the reference's gfs_cell_coarse_init);
  slave(l)    — under a coarser leaf: holds the prolongation of coarser
                data (the reference's ghost/fine-coarse interpolation).

With internal+slave kept in sync, the uniform 5-point stencil evaluated at
leaves IS the composite operator: a leaf next to a coarser region reads a
prolonged (slave) value, a leaf next to a finer region reads a restricted
(internal) value.  Memory cost is a geometric series (4/3 of the finest
level), and every kernel stays dense — the masks replace the reference's
pointer-tree branching.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from . import poisson


@dataclasses.dataclass(frozen=True)
class CompositeGrid:
    """Static multi-level mesh descriptor (hashable: masks as bytes)."""
    base: Grid                  # grid at lmin
    lmin: int
    lmax: int
    # per-level (shape, leaf bytes, active bytes), packed for hashability
    _masks: tuple

    @staticmethod
    def build(base: Grid, leaf_masks: Dict[int, np.ndarray]) -> "CompositeGrid":
        lmin = min(leaf_masks)
        lmax = max(leaf_masks)
        # active(l) = leaf(l) | covered-by-finer(l), computed upward
        packed = [None] * (lmax - lmin + 1)
        cover = None
        for l in range(lmax, lmin - 1, -1):
            m = np.asarray(leaf_masks[l], bool)
            act = m if cover is None else (m | cover)
            packed[l - lmin] = (m.shape, m.tobytes(), act.tobytes())
            n0, n1 = m.shape
            cover = act.reshape(n0 // 2, 2, n1 // 2, 2).any(axis=(1, 3))
        return CompositeGrid(base=dataclasses.replace(base, level=lmin),
                             lmin=lmin, lmax=lmax, _masks=tuple(packed))

    @staticmethod
    def from_refine_fn(base: Grid, lmax: int,
                       refine: Callable) -> "CompositeGrid":
        """Leaves from a refinement indicator: a cell at level l < lmax is
        refined where ``refine(x, y, l)`` is True (the static GfsRefine
        analogue, src/refine.c:115), with 2:1 grading enforced by a
        depth-map dilation fixpoint (gfs_domain_reshape,
        src/adaptive.c:998-1022)."""
        lmin = base.level
        gf = dataclasses.replace(base, level=lmax)
        D = np.full(gf.shape, lmin, np.int32)
        for l in range(lmin, lmax):
            g = dataclasses.replace(base, level=l)
            x = np.asarray(g.centers[0])
            y = np.asarray(g.centers[1])
            want = np.asarray(refine(x, y, l), bool)
            rep = 1 << (lmax - l)
            D = np.maximum(D, np.where(want.repeat(rep, 0).repeat(rep, 1),
                                       l + 1, lmin))
        # grading fixpoint: a cell's depth is at most 1 below any
        # (8-)neighbor's depth
        while True:
            Dn = np.maximum(D, _dilate_max(D) - 1)
            if np.array_equal(Dn, D):
                break
            D = Dn
        # leaf(l) at a level-l cell c: max depth under c <= l, and the
        # parent is split (max depth under parent > l-1)
        masks = {}
        M_prev = None
        Ms = {}
        for l in range(lmax, lmin - 1, -1):
            rep = 1 << (lmax - l)
            n = gf.shape[0] // rep
            m = gf.shape[1] // rep
            Ms[l] = D.reshape(n, rep, m, rep).max(axis=(1, 3))
        for l in range(lmin, lmax + 1):
            leaf = Ms[l] <= l
            if l > lmin:
                parent_split = (Ms[l - 1] > l - 1).repeat(2, 0).repeat(2, 1)
                leaf &= parent_split
            masks[l] = leaf
        return CompositeGrid.build(base, masks)

    def grid(self, l: int) -> Grid:
        return dataclasses.replace(self.base, level=l)

    def leaf(self, l: int) -> jnp.ndarray:
        shape, buf, _ = self._masks[l - self.lmin]
        return jnp.asarray(np.frombuffer(buf, bool).reshape(shape))

    def active(self, l: int) -> jnp.ndarray:
        shape, _, buf = self._masks[l - self.lmin]
        return jnp.asarray(np.frombuffer(buf, bool).reshape(shape))

    def covered_by_finer(self, l: int) -> jnp.ndarray:
        return self.active(l) & ~self.leaf(l)

    def n_leaves(self) -> int:
        return int(sum(int(np.frombuffer(b, bool).sum())
                       for _, b, _ in self._masks))


def _dilate_max(D: np.ndarray) -> np.ndarray:
    p = np.pad(D, 1, mode="edge")
    return np.maximum.reduce([
        p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
        p[:-2, :-2], p[:-2, 2:], p[2:, :-2], p[2:, 2:]])


# ---------------------------------------------------------------------------
# level synchronization (the reference's coarse_init + ghost interpolation)
# ---------------------------------------------------------------------------

def sync(u: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
         homogeneous: bool = False, t: float = 0.0) -> dict:
    """Restriction into internal cells (up the stack), then prolongation
    into slave cells (down the stack)."""
    u = dict(u)
    # upward: internal(l) <- restrict(u[l+1])
    for l in range(cg.lmax - 1, cg.lmin - 1, -1):
        r = poisson.restrict(u[l + 1], 2)
        mask = cg.covered_by_finer(l)
        u[l] = jnp.where(mask, r, u[l])
    # downward: slave(l) <- prolong(u[l-1])
    for l in range(cg.lmin + 1, cg.lmax + 1):
        p = poisson.prolong(u[l - 1], cg.grid(l - 1), fbc,
                            homogeneous=homogeneous, t=t)
        slave = ~cg.active(l)
        u[l] = jnp.where(slave, p, u[l])
    return u


def _reflux(u: dict, cg: CompositeGrid, l: int) -> jnp.ndarray:
    """Flux-conservative correction for level-l leaves at coarse-fine
    interfaces: the coarse face gradient (through the restricted internal
    value) is replaced by the area-weighted mean of the two fine-side face
    gradients, which makes the interface flux exactly conservative — the
    reference's fine->coarse face-gradient accumulation
    (gfs_face_weighted_gradient src/fluid.c:905, fine-coarse residual
    handling src/poisson.c:634-747).

    Returns the additive correction D such that lap_composite = lap + D.
    """
    if l == cg.lmax:
        return jnp.zeros(cg.grid(l).shape, u[l].dtype)
    gH = cg.grid(l)
    gh = cg.grid(l + 1)
    H, h = gH.h, gh.h
    uf = u[l + 1]
    uc = u[l]
    cov = cg.covered_by_finer(l)
    leaf = cg.leaf(l)
    corr = jnp.zeros(gH.shape, uc.dtype)
    for axis in range(2):
        nH = gH.shape[axis]
        o = 1 - axis
        # fine face gradients, full (n_f+1) face array (0 at boundaries)
        d = jnp.diff(uf, axis=axis) / h
        pad = [(0, 0), (0, 0)]
        pad[axis] = (1, 1)
        d_full = jnp.pad(d, pad)
        # coarse-aligned fine faces: every 2nd face; average transverse pairs
        idx = [slice(None), slice(None)]
        idx[axis] = slice(0, gh.shape[axis] + 1, 2)
        gc = d_full[tuple(idx)]
        s0 = [slice(None), slice(None)]
        s0[o] = slice(0, gc.shape[o], 2)
        s1 = [slice(None), slice(None)]
        s1[o] = slice(1, gc.shape[o], 2)
        g_fine = 0.5 * (gc[tuple(s0)] + gc[tuple(s1)])   # (nH+1 faces)
        # coarse one-sided gradients on the same faces
        dc = jnp.diff(uc, axis=axis) / H
        padc = [(0, 0), (0, 0)]
        padc[axis] = (1, 1)
        g_coarse = jnp.pad(dc, padc)
        # interface faces: one side covered-by-finer, other side leaf
        padm = [(0, 0), (0, 0)]
        padm[axis] = (1, 1)
        covp = jnp.pad(cov, padm)
        leafp = jnp.pad(leaf, padm)
        loc = [slice(None), slice(None)]
        loc[axis] = slice(0, nH + 1)
        hic = [slice(None), slice(None)]
        hic[axis] = slice(1, nH + 2)
        cell_lo_cov = covp[tuple(loc)]
        cell_hi_cov = covp[tuple(hic)]
        cell_lo_leaf = leafp[tuple(loc)]
        cell_hi_leaf = leafp[tuple(hic)]
        iface = (cell_lo_cov & cell_hi_leaf) | (cell_lo_leaf & cell_hi_cov)
        delta = jnp.where(iface, g_fine - g_coarse, 0.0)
        # lap(c) = (1/H)(g[c+1] - g[c]) -> D(c) = (1/H)(delta[c+1]-delta[c])
        hi = [slice(None), slice(None)]
        hi[axis] = slice(1, nH + 1)
        lo = [slice(None), slice(None)]
        lo[axis] = slice(0, nH)
        corr = corr + (delta[tuple(hi)] - delta[tuple(lo)]) / H
    return jnp.where(leaf, corr, 0.0)


def leaf_residual(u: dict, rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                  t: float = 0.0, reflux: bool = True) -> dict:
    """Composite residual on leaves (zero elsewhere); assumes synced u."""
    out = {}
    for l in range(cg.lmin, cg.lmax + 1):
        r = poisson.residual(u[l], rhs[l], cg.grid(l), fbc, t=t)
        if reflux:
            r = r - _reflux(u, cg, l)
        out[l] = jnp.where(cg.leaf(l), r, 0.0)
    return out


def composite_cycle(u: dict, rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                    params: poisson.MultilevelParams, t: float = 0.0) -> dict:
    """One sawtooth cycle over the composite hierarchy.

    Reference: gfs_poisson_cycle (src/poisson.c:1109-1178) whose levels are
    tree cuts; here each level's dense array with slaved/internal masks IS
    the tree cut.
    """
    u = sync(u, cg, fbc, t=t)
    # residual stack: on leaves at each level, plus restriction of finer
    # residuals into internal cells (get_from_below, poisson.c:1044)
    res = leaf_residual(u, rhs, cg, fbc, t=t)
    r = {}
    acc = None
    for l in range(cg.lmax, cg.lmin - 1, -1):
        rl = res[l]
        if acc is not None:
            rl = jnp.where(cg.covered_by_finer(l), poisson.restrict(acc, 2),
                           rl)
        r[l] = rl
        acc = rl

    # upward correction solve with homogeneous BCs.  The composite base
    # level is itself a (possibly large) uniform grid: solve it with full
    # uniform multigrid correction cycles down to the 4x4 coarsest — the
    # analogue of the reference's tree continuing below the shallowest
    # leaf level (its minlevel=0 root, src/poisson.c:1225).
    du = jnp.zeros_like(r[cg.lmin])
    for _ in range(2):
        rl = poisson.residual(du, r[cg.lmin], cg.grid(cg.lmin), fbc,
                              homogeneous=True)
        du = du + poisson.correction(rl, cg.grid(cg.lmin), fbc, params)
    dus = {cg.lmin: du}
    for l in range(cg.lmin + 1, cg.lmax + 1):
        du = poisson.prolong(dus[l - 1], cg.grid(l - 1), fbc,
                             homogeneous=True)
        # slaved cells keep the prolonged correction (consistent ghosts);
        # active cells relax
        k = cg.lmax - l
        nswp = params.nrelax * (params.erelax ** k)
        act = cg.active(l)
        for _ in range(nswp):
            du_new = poisson.relax(du, r[l], cg.grid(l), fbc, 1,
                                   homogeneous=True, omega=params.omega)
            du = jnp.where(act, du_new, du)
        dus[l] = du

    out = {}
    for l in range(cg.lmin, cg.lmax + 1):
        out[l] = u[l] + jnp.where(cg.active(l), dus[l], 0.0)
    return sync(out, cg, fbc, t=t)


def composite_solve(rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                    params: poisson.MultilevelParams = None,
                    u0: dict = None, t: float = 0.0):
    """Fixed/tolerance composite solve; returns (u dict, residual-infty list).

    Pure-Neumann compatibility: the leaf-volume-weighted mean of rhs is
    removed (GfsPoisson correct_div, src/simulation.c:2156)."""
    params = params or poisson.MultilevelParams()
    if u0 is None:
        u = {l: jnp.zeros(cg.grid(l).shape, jnp.result_type(rhs[cg.lmax]))
             for l in range(cg.lmin, cg.lmax + 1)}
    else:
        u = dict(u0)
    dirichlet = any(b.kind == bcs.DIRICHLET for ax in fbc.sides for b in ax)
    if not dirichlet:
        vol = 0.0
        tot = 0.0
        for l in range(cg.lmin, cg.lmax + 1):
            w = cg.leaf(l) * cg.grid(l).cell_volume
            vol = vol + jnp.sum(w)
            tot = tot + jnp.sum(rhs[l] * w)
        mean = tot / vol
        rhs = {l: rhs[l] - mean for l in rhs}

    hist = []
    for it in range(params.nitermax):
        u = composite_cycle(u, rhs, cg, fbc, params, t=t)
        res = leaf_residual(sync(u, cg, fbc, t=t), rhs, cg, fbc, t=t)
        rinf = max(float(jnp.max(jnp.abs(res[l]))) for l in res)
        hist.append(rinf)
        if it + 1 >= params.nitermin and rinf <= params.tolerance:
            break
    return u, hist


def flatten(u: dict, cg: CompositeGrid, fbc: bcs.FieldBC) -> jnp.ndarray:
    """Single finest-level array (prolonged from coarse where needed)."""
    u = sync(u, cg, fbc)
    return u[cg.lmax]
