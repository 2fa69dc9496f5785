"""Block-sparse composite multigrid: AMR Poisson with cost ∝ leaves.

TPU-native realization of SURVEY.md §7's core representational decision:
*level-indexed, Morton-ordered block arrays*.  Where solvers/amr.py stores
FULL domain arrays per level (simple, mask-driven, 4/3 memory of the
finest grid), this engine stores ONLY the active blocks of each level in a
``[nblocks, B, B]`` array — FLOPs and bytes scale with the leaf count, the
reference's defining AMR property (src/adaptive.c cost ∝ interface
measure; tree relax touches leaves only, src/poisson.c:604-631).

Mapping to the reference:
  block table / Morton keys      <- FttOct + ftt_cell_neighbor tables
                                    (src/ftt.h:143-530), here host-built
                                    gather indices (core/blocks.py keys)
  halo fill (same-level gather,  <- ghost-cell interpolation at fine-coarse
  parent-interp at patch edges)     faces (gfs_face_gradient fine-coarse
                                    branch, src/fluid.c:905)
  reflux scatter                 <- fine->coarse face-gradient aggregation
                                    in the residual (src/poisson.c:634-747)
  restrict/prolong via           <- get_from_below / get_from_above
  child/parent gathers              (src/poisson.c:1005-1068)
  dense base-level solve         <- the tree below the shallowest leaf
                                    (gfs_poisson_solve minlevel)

All per-level kernels are dense [n, B, B] array programs (gathers +
elementwise) — XLA/TPU-friendly; the topology lives in static-shaped index
arrays rebuilt on the host when the mesh changes.

2D, Dirichlet/Neumann box BCs (the test/circle / test/poisson class).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from . import poisson
from .composite import grade_depth_map


@dataclasses.dataclass
class BlockMesh:
    """Host-built block tables for one adaptive mesh.

    Levels are CELL levels; level l has 2**l / B blocks per axis, each
    holding B x B cells of size h(l) = size / 2**l.
    """
    B: int
    lmin: int
    lmax: int
    base: Grid                      # cell grid at lmin
    lv: dict                        # level -> dict of numpy index arrays

    @staticmethod
    def build(base: Grid, lmax: int, depth_cells: np.ndarray, B: int = 8):
        """``depth_cells``: target cell-level per finest cell (lmax res).
        Block granularity: a block's depth = max over its cells; graded
        2:1 at block level (implies cell-level grading)."""
        lmin = base.level
        dim = 2
        assert base.extents == (1, 1), "blockmg: single-box domains"
        nfb = (1 << lmax) // B      # finest blocks per axis
        D = np.asarray(depth_cells, np.int32)
        if D.shape[0] == (1 << lmax):   # cell-resolution map -> block map
            D = D.reshape(nfb, B, nfb, B).max(axis=(1, 3))
        Db = np.maximum(D, lmin)
        Db = grade_depth_map(Db)

        # per-level block leaf/covered masks (block resolution)
        masks = {}
        cover = None
        Ms = {}
        for l in range(lmax, lmin - 1, -1):
            rep = 1 << (lmax - l)
            Ms[l] = Db.reshape(nfb // rep, rep, nfb // rep, rep).max(
                axis=(1, 3))
        for l in range(lmin, lmax + 1):
            leaf = Ms[l] <= l
            if l > lmin:
                parent_split = (Ms[l - 1] > l - 1).repeat(2, 0).repeat(2, 1)
                leaf &= parent_split
            masks[l] = leaf
        active = {}
        cov = {lmax: np.zeros_like(masks[lmax])}
        acc = masks[lmax]
        for l in range(lmax - 1, lmin - 1, -1):
            cov[l] = acc.reshape(acc.shape[0] // 2, 2, -1, 2).any(
                axis=(1, 3))
            acc = masks[l] | cov[l]
        for l in range(lmin, lmax + 1):
            active[l] = masks[l] | cov[l]

        lv = {}
        slot_of = {}
        for l in range(lmin, lmax + 1):
            bx, by = np.nonzero(active[l])
            # Morton-sort for locality
            from ..core.blocks import morton_encode_2d
            order = np.argsort(morton_encode_2d(bx, by))
            bx, by = bx[order], by[order]
            slot = -np.ones(active[l].shape, np.int64)
            slot[bx, by] = np.arange(len(bx))
            slot_of[l] = slot
            lv[l] = {"bx": bx, "by": by,
                     "leaf": masks[l][bx, by].astype(np.bool_)}
        # index maps
        DIRS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]])
        for l in range(lmin, lmax + 1):
            d = lv[l]
            n = len(d["bx"])
            nb = np.full((n, 4), -1, np.int64)
            pnb = np.full((n, 4), -1, np.int64)
            bnd = np.zeros((n, 4), np.bool_)
            nbl = active[l].shape[0]
            for k in range(4):
                qx = d["bx"] + DIRS[k, 0]
                qy = d["by"] + DIRS[k, 1]
                inside = (qx >= 0) & (qx < nbl) & (qy >= 0) & (qy < nbl)
                bnd[:, k] = ~inside
                qxc = np.clip(qx, 0, nbl - 1)
                qyc = np.clip(qy, 0, nbl - 1)
                s = slot_of[l][qxc, qyc]
                nb[:, k] = np.where(inside, s, -1)
                if l > lmin:
                    ps = slot_of[l - 1][np.clip(qx // 2, 0, nbl // 2 - 1),
                                        np.clip(qy // 2, 0, nbl // 2 - 1)]
                    pnb[:, k] = np.where(inside & (s < 0), ps, -1)
            d["nbr"] = nb
            d["pnbr"] = pnb
            d["bnd"] = bnd
            if l > lmin:
                d["parent"] = slot_of[l - 1][d["bx"] // 2, d["by"] // 2]
                d["parity"] = np.stack([d["bx"] & 1, d["by"] & 1], 1)
            if l < lmax:
                ch = np.full((n, 2, 2), -1, np.int64)
                for cx in (0, 1):
                    for cy in (0, 1):
                        fx = 2 * d["bx"] + cx
                        fy = 2 * d["by"] + cy
                        nf = active[l + 1].shape[0]
                        ok = (fx < nf) & (fy < nf)
                        ch[:, cx, cy] = np.where(
                            ok, slot_of[l + 1][np.clip(fx, 0, nf - 1),
                                               np.clip(fy, 0, nf - 1)], -1)
                d["children"] = ch
        return BlockMesh(B=B, lmin=lmin, lmax=lmax, base=base, lv=lv)

    def grid(self, l: int) -> Grid:
        return dataclasses.replace(self.base, level=l)

    def n_active(self) -> int:
        return sum(len(self.lv[l]["bx"]) for l in self.lv) * self.B ** 2

    def n_leaf_cells(self) -> int:
        return sum(int(self.lv[l]["leaf"].sum()) for l in self.lv) \
            * self.B ** 2

    def field_from_fn(self, fn) -> Dict[int, jnp.ndarray]:
        """Evaluate fn(x, y) at cell centers of every active block."""
        out = {}
        for l in range(self.lmin, self.lmax + 1):
            d = self.lv[l]
            h = self.grid(l).h
            o = self.base.origin
            ci = (np.arange(self.B) + 0.5) * h
            x = o[0] + d["bx"][:, None, None] * self.B * h + \
                ci[None, :, None]
            y = o[1] + d["by"][:, None, None] * self.B * h + \
                ci[None, None, :]
            out[l] = jnp.asarray(fn(x + 0 * y, y + 0 * x))
        return out

    def to_dense(self, u: Dict[int, jnp.ndarray], l: int) -> np.ndarray:
        """Assemble level-l active blocks into the dense level-l array
        (inactive regions zero) — for gates/visualization."""
        d = self.lv[l]
        N = self.grid(l).shape[0]
        out = np.zeros((N, N))
        a = np.asarray(u[l])
        for s in range(len(d["bx"])):
            x0, y0 = d["bx"][s] * self.B, d["by"][s] * self.B
            out[x0:x0 + self.B, y0:y0 + self.B] = a[s]
        return out


# ---------------------------------------------------------------------------
# device-side kernels (index arrays travel as a pytree)
# ---------------------------------------------------------------------------

def _interp_strip(c: jnp.ndarray) -> jnp.ndarray:
    """1D coarse->fine strip interpolation: [n, B/2] -> [n, B] with the
    0.75/0.25 stencil, edge-clamped (get_from_above, src/poisson.c:1005)."""
    lo = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
    hi = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
    a = 0.75 * c + 0.25 * lo
    b = 0.75 * c + 0.25 * hi
    return jnp.stack([a, b], axis=-1).reshape(c.shape[0], -1)


def _edge(a: jnp.ndarray, k: int, off: int = 0) -> jnp.ndarray:
    """Edge strip of [n, B, B] blocks for direction k (0:-x 1:+x 2:-y 3:+y),
    ``off`` cells in from the face."""
    if k == 0:
        return a[:, off, :]
    if k == 1:
        return a[:, -1 - off, :]
    if k == 2:
        return a[:, :, off]
    return a[:, :, -1 - off]


def _halo(u, up, idx, B: int, bvals=None, homogeneous=True, h=None):
    """[n,B,B] -> [n,B+2,B+2] ghost-filled.

    ``up``: parent-level block array (or None at lmin); ``idx``: this
    level's index dict (jnp arrays); ``bvals``: optional (dirich[n,4,B],
    isdir[n,4], isneu[n,4]) precomputed boundary data."""
    n = u.shape[0]
    pad = jnp.zeros((n, B + 2, B + 2), u.dtype)
    pad = pad.at[:, 1:-1, 1:-1].set(u)
    for k in range(4):
        nb = idx["nbr"][:, k]
        valid = nb >= 0
        nbc = jnp.where(valid, nb, 0)
        opp = (1, 0, 3, 2)[k]
        same = _edge(u[nbc], opp)
        ghost = jnp.where(valid[:, None], same, 0.0)

        if up is not None:
            pn = idx["pnbr"][:, k]
            pvalid = pn >= 0
            pnc = jnp.where(pvalid, pn, 0)
            par = idx["parent"]
            # transverse parity: which half of the coarse strip we face
            tax = 1 if k < 2 else 0     # transverse axis (block parity)
            parity = idx["parity"][:, tax]
            c0 = _edge(up[pnc], opp)              # neighbor-parent col0
            c1 = _edge(up[par], k)                # own-parent edge col
            halfsel = parity[:, None] * (B // 2) + jnp.arange(B // 2)[None]
            c0h = jnp.take_along_axis(c0, halfsel, axis=1)
            c1h = jnp.take_along_axis(c1, halfsel, axis=1)
            fine = 0.75 * _interp_strip(c0h) + 0.25 * _interp_strip(c1h)
            ghost = jnp.where(pvalid[:, None], fine, ghost)

        own = _edge(u, k)
        if bvals is not None:
            isdir, _, dval = bvals
            if homogeneous:
                bg = jnp.where(isdir[:, k][:, None], -own, own)
            else:
                bg = jnp.where(isdir[:, k][:, None],
                               2.0 * dval[:, k] - own, own)
            ghost = jnp.where(idx["bnd"][:, k][:, None], bg, ghost)
        if k == 0:
            pad = pad.at[:, 0, 1:-1].set(ghost)
        elif k == 1:
            pad = pad.at[:, -1, 1:-1].set(ghost)
        elif k == 2:
            pad = pad.at[:, 1:-1, 0].set(ghost)
        else:
            pad = pad.at[:, 1:-1, -1].set(ghost)
    return pad


def _lap(pad, h, fxy=None):
    c = pad[:, 1:-1, 1:-1]
    if fxy is None:
        return (pad[:, :-2, 1:-1] + pad[:, 2:, 1:-1] + pad[:, 1:-1, :-2]
                + pad[:, 1:-1, 2:] - 4.0 * c) / (h * h)
    nsum, den = _nsum_den(pad, fxy)
    return (nsum - den * c) / (h * h)


def _nsum_den(pad, fxy):
    """(sum_d alpha_d u_d, sum_d alpha_d) of the 5-point stencil on
    ghost-padded blocks; ``fxy = (fx [n,B+1,B], fy [n,B,B+1])`` face
    coefficients (the variable-coefficient two-phase systems,
    src/poisson.c:756-901 gfs_poisson_coefficients), or None for unit
    coefficients."""
    if fxy is None:
        nsum = (pad[:, :-2, 1:-1] + pad[:, 2:, 1:-1]
                + pad[:, 1:-1, :-2] + pad[:, 1:-1, 2:])
        return nsum, 4.0
    fx, fy = fxy
    nsum = (fx[:, :-1, :] * pad[:, :-2, 1:-1]
            + fx[:, 1:, :] * pad[:, 2:, 1:-1]
            + fy[:, :, :-1] * pad[:, 1:-1, :-2]
            + fy[:, :, 1:] * pad[:, 1:-1, 2:])
    den = fx[:, :-1, :] + fx[:, 1:, :] + fy[:, :, :-1] + fy[:, :, 1:]
    return nsum, den


def _restrict_children(u_f, ch):
    """[n_f,B,B] children -> [n_c,B,B] restriction for covered blocks.
    ``ch``: [n_c,2,2] child slots (-1 where absent)."""
    B = u_f.shape[1]
    chc = jnp.where(ch >= 0, ch, 0)
    quads = []
    for cx in (0, 1):
        row = []
        for cy in (0, 1):
            blk = u_f[chc[:, cx, cy]]
            r = blk.reshape(-1, B // 2, 2, B // 2, 2).mean(axis=(2, 4))
            row.append(r)
        quads.append(jnp.concatenate(row, axis=2))
    out = jnp.concatenate(quads, axis=1)
    return jnp.where((ch[:, 0, 0] >= 0)[:, None, None], out, 0.0)


def _prolong_parent(du_c, idxf, B):
    """Parent-level correction -> child blocks (bilinear within the parent
    quadrant; parent halo ignored at quadrant borders via edge-clamp —
    followed by relax sweeps, cf. get_from_above + relax_loop)."""
    par = idxf["parent"]
    px = idxf["parity"][:, 0]
    py = idxf["parity"][:, 1]
    pb = du_c[par]                                   # [n,B,B]
    qsel_x = px[:, None] * (B // 2) + jnp.arange(B // 2)[None]
    qsel_y = py[:, None] * (B // 2) + jnp.arange(B // 2)[None]
    q = jnp.take_along_axis(
        jnp.take_along_axis(pb, qsel_x[:, :, None], axis=1),
        qsel_y[:, None, :], axis=2)                  # [n,B/2,B/2]

    def interp_axis(a, axis):
        lo = jnp.concatenate([jnp.take(a, jnp.asarray([0]), axis),
                              jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1,
                                                   axis=axis)], axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(a, 1, a.shape[axis],
                                                   axis=axis),
                              jnp.take(a, jnp.asarray([a.shape[axis] - 1]),
                                       axis)], axis)
        f0 = 0.75 * a + 0.25 * lo
        f1 = 0.75 * a + 0.25 * hi
        return jnp.stack([f0, f1], axis=axis + 1).reshape(
            *a.shape[:axis], 2 * a.shape[axis], *a.shape[axis + 1:])

    out = interp_axis(interp_axis(q, 1), 2)
    return out


def _reflux_to_parent(u_pad, idx, B, n_coarse, h_f, af4=None):
    """Flux-conservative corrections from this (fine) level into the
    parent level's leaf cells: replace the coarse interface-face gradient
    by the mean of the fine one-sided gradients (src/fluid.c:905,
    src/poisson.c:634-747 fine-coarse residual).

    For every direction the correction to the coarse lap reduces to
    -(pairmean((ghost - own_edge)/h) - (c_nbr - own_restricted)/H)/H
    (orientation and hi/lo-face signs cancel; zero for linear fields).
    ``af4``: optional [n,4,B] fine-boundary-face coefficients — fluxes
    are alpha-weighted, with the coarse face coefficient taken as the
    fine-pair mean (= coarsen_face_coeff's value at that face, keeping
    the correction consistent with the dense engine).
    Returns a [n_coarse,B,B] array to ADD to the coarse lap at leaves."""
    H = 2.0 * h_f
    corr = jnp.zeros((n_coarse, B, B), u_pad.dtype)
    interior = u_pad[:, 1:-1, 1:-1]
    for k in range(4):
        pn = idx["pnbr"][:, k]
        valid = pn >= 0
        pnc = jnp.where(valid, pn, 0)
        ghost = _edge(u_pad, k)[:, 1:-1]
        own = _edge(interior, k, 0)
        gf = (ghost - own) / h_f
        own_e1 = _edge(interior, k, 1)
        own_r = 0.25 * (own[:, 0::2] + own[:, 1::2]
                        + own_e1[:, 0::2] + own_e1[:, 1::2])  # 2x2 restrict
        tax = 1 if k < 2 else 0
        parity = idx["parity"][:, tax]
        halfsel = parity[:, None] * (B // 2) + jnp.arange(B // 2)[None]
        cnb = idx["_pn_edge"][:, k]                     # [n, B/2]
        if af4 is None:
            gpair = 0.5 * (gf[:, 0::2] + gf[:, 1::2])   # [n, B/2]
            gc = (cnb - own_r) / H
        else:
            af = af4[:, k]                              # [n, B]
            gfw = af * gf
            gpair = 0.5 * (gfw[:, 0::2] + gfw[:, 1::2])
            ac = 0.5 * (af[:, 0::2] + af[:, 1::2])
            gc = ac * (cnb - own_r) / H
        delta = jnp.where(valid[:, None], gpair - gc, 0.0)
        opp = (1, 0, 3, 2)[k]
        cells = halfsel                                 # transverse idx
        if opp == 0:
            ii = jnp.zeros_like(cells)
            jj = cells
        elif opp == 1:
            ii = jnp.full_like(cells, B - 1)
            jj = cells
        elif opp == 2:
            ii = cells
            jj = jnp.zeros_like(cells)
        else:
            ii = cells
            jj = jnp.full_like(cells, B - 1)
        slot = jnp.broadcast_to(pnc[:, None], cells.shape)
        contrib = -delta / H
        corr = corr.at[slot.ravel(), ii.ravel(), jj.ravel()].add(
            contrib.ravel())
    return corr


def _pn_edge_cache(u_c, idx, B):
    """Gather, per fine block and direction, the coarse neighbor's edge
    cells on our transverse half: [n, 4, B/2]."""
    outs = []
    for k in range(4):
        pn = idx["pnbr"][:, k]
        pnc = jnp.where(pn >= 0, pn, 0)
        opp = (1, 0, 3, 2)[k]
        col = _edge(u_c[pnc], opp)                     # [n, B]
        tax = 1 if k < 2 else 0
        parity = idx["parity"][:, tax]
        halfsel = parity[:, None] * (B // 2) + jnp.arange(B // 2)[None]
        outs.append(jnp.take_along_axis(col, halfsel, axis=1))
    return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# solve
# ---------------------------------------------------------------------------

def _bvals(mesh: BlockMesh, l: int, fbc: bcs.FieldBC, homogeneous):
    """Precompute (isdir[n,4], isneu[n,4], dval[n,4,B]) for level l."""
    d = mesh.lv[l]
    n = len(d["bx"])
    B = mesh.B
    g = mesh.grid(l)
    isdir = np.zeros((n, 4), np.bool_)
    dval = np.zeros((n, 4, B))
    for k in range(4):
        ax, sd = (0, 0) if k == 0 else (0, 1) if k == 1 else \
            (1, 0) if k == 2 else (1, 1)
        b = fbc.sides[ax][sd]
        mask = d["bnd"][:, k]
        if b.kind == bcs.DIRICHLET:
            isdir[:, k] = mask
            if not homogeneous:
                h = g.h
                o = mesh.base.origin
                tr = d["by"] if ax == 0 else d["bx"]
                tcoord = o[1 - ax] + (tr[:, None] * B +
                                      np.arange(B)[None] + 0.5) * h
                bc_coord = g.boundary_coord(ax, sd)
                if callable(b.value):
                    xy = (np.full_like(tcoord, bc_coord), tcoord) \
                        if ax == 0 else (tcoord,
                                         np.full_like(tcoord, bc_coord))
                    dval[:, k] = np.asarray(b.value(*xy))
                else:
                    dval[:, k] = bcs.bc_value(b)
    return (jnp.asarray(isdir), None, jnp.asarray(dval))


def _level_idx(mesh: BlockMesh, l: int):
    d = mesh.lv[l]
    idx = {"nbr": jnp.asarray(d["nbr"]), "pnbr": jnp.asarray(d["pnbr"]),
           "bnd": jnp.asarray(d["bnd"]),
           "leaf": jnp.asarray(d["leaf"])}
    if l > mesh.lmin:
        idx["parent"] = jnp.asarray(d["parent"])
        idx["parity"] = jnp.asarray(d["parity"])
    if l < mesh.lmax:
        idx["children"] = jnp.asarray(d["children"])
    return idx


class BlockSolver:
    """Composite MG on the block-sparse mesh.  Build once per mesh; the
    jitted cycle closes over static shapes (index arrays are runtime)."""

    def __init__(self, mesh: BlockMesh, fbc: bcs.FieldBC,
                 params: poisson.MultilevelParams = None):
        self.mesh = mesh
        self.fbc = fbc
        self.params = params or poisson.MultilevelParams()
        self.idx = {l: _level_idx(mesh, l)
                    for l in range(mesh.lmin, mesh.lmax + 1)}
        self.bv = {l: _bvals(mesh, l, fbc, homogeneous=False)
                   for l in range(mesh.lmin, mesh.lmax + 1)}
        self.bv0 = {l: _bvals(mesh, l, fbc, homogeneous=True)
                    for l in range(mesh.lmin, mesh.lmax + 1)}
        self._cycle = jax.jit(self._cycle_impl)
        self._resid = jax.jit(self._leaf_residual)

    # -- pieces ------------------------------------------------------------
    def _sync_up(self, u):
        m = self.mesh
        for l in range(m.lmax - 1, m.lmin - 1, -1):
            if "children" not in self.idx[l]:
                continue
            r = _restrict_children(u[l + 1], self.idx[l]["children"])
            cov = ~self.idx[l]["leaf"]
            u[l] = jnp.where(cov[:, None, None], r, u[l])
        return u

    def _leaf_residual(self, u, rhs):
        m = self.mesh
        u = self._sync_up(dict(u))
        res = {}
        reflux = {}
        for l in range(m.lmax, m.lmin - 1, -1):
            h = m.grid(l).h
            up = u.get(l - 1)
            idx = dict(self.idx[l])
            if up is not None:
                idx["_pn_edge"] = _pn_edge_cache(up, self.idx[l], m.B)
            pad = _halo(u[l], up, idx, m.B, bvals=self.bv[l],
                        homogeneous=False)
            r = rhs[l] - _lap(pad, h)
            if l in reflux:
                r = r - reflux[l]
            if up is not None:
                reflux[l - 1] = _reflux_to_parent(
                    pad, idx, m.B, u[l - 1].shape[0], h)
            res[l] = jnp.where(self.idx[l]["leaf"][:, None, None], r, 0.0)
        return res

    def _cycle_impl(self, u, rhs):
        m = self.mesh
        p = self.params
        u = self._sync_up(dict(u))
        res = self._leaf_residual(u, rhs)
        # residual stack: restrict into covered blocks
        r = {}
        acc = None
        for l in range(m.lmax, m.lmin - 1, -1):
            rl = res[l]
            if acc is not None:
                rr = _restrict_children(acc, self.idx[l]["children"])
                cov = ~self.idx[l]["leaf"]
                rl = jnp.where(cov[:, None, None], rr, rl)
            r[l] = rl
            acc = rl
        # dense base solve at lmin
        g0 = m.base
        N0 = g0.shape[0]
        d0 = self.mesh.lv[m.lmin]
        B = m.B
        dense_r = jnp.zeros((N0, N0), r[m.lmin].dtype)
        xs = jnp.asarray(d0["bx"] * B)
        ys = jnp.asarray(d0["by"] * B)
        ii = xs[:, None, None] + jnp.arange(B)[None, :, None]
        jj = ys[:, None, None] + jnp.arange(B)[None, None, :]
        dense_r = dense_r.at[ii, jj].set(r[m.lmin])
        du0 = poisson.correction(dense_r, g0, self.fbc, p)
        rl0 = poisson.residual(du0, dense_r, g0, self.fbc, homogeneous=True)
        du0 = du0 + poisson.correction(rl0, g0, self.fbc, p)
        dus = {m.lmin: du0[ii, jj]}
        # upward: prolong + relax per level (homogeneous BCs)
        for l in range(m.lmin + 1, m.lmax + 1):
            h = m.grid(l).h
            du = _prolong_parent(dus[l - 1], self.idx[l], B)
            nswp = p.nrelax * (p.erelax ** (m.lmax - l))
            for _ in range(nswp):
                for color in (0, 1):
                    idx = dict(self.idx[l])
                    idx["_pn_edge"] = _pn_edge_cache(
                        dus[l - 1], self.idx[l], B)
                    pad = _halo(du, dus[l - 1], idx, B,
                                bvals=self.bv0[l], homogeneous=True)
                    nsum = (pad[:, :-2, 1:-1] + pad[:, 2:, 1:-1]
                            + pad[:, 1:-1, :-2] + pad[:, 1:-1, 2:])
                    new = (nsum - h * h * r[l]) / 4.0
                    d = self.mesh.lv[l]
                    cell = (np.arange(B)[:, None] + np.arange(B)[None, :]
                            + d["bx"][:, None, None] * B
                            + d["by"][:, None, None] * B)
                    red = jnp.asarray((cell % 2) == color)
                    du = jnp.where(red, new, du)
            dus[l] = du
        out = {}
        for l in range(m.lmin, m.lmax + 1):
            out[l] = u[l] + dus[l]
        return self._sync_up(out)

    # -- API ---------------------------------------------------------------
    def solve(self, rhs, u0=None, tol_abs=None, max_cycles=20):
        m = self.mesh
        u = u0 or {l: jnp.zeros_like(rhs[l])
                   for l in range(m.lmin, m.lmax + 1)}
        hist = []
        for _ in range(max_cycles):
            u = self._cycle(u, rhs)
            res = self._resid(u, rhs)
            rinf = max(float(jnp.max(jnp.abs(res[l]))) for l in res)
            hist.append(rinf)
            if tol_abs is not None and rinf < tol_abs:
                break
        return u, hist
