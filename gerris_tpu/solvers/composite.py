"""Composite-grid (multi-level / AMR) mesh descriptor + Poisson wrappers.

The mesh builder (CompositeGrid: leaf masks per level, 2:1 grading) lives
here; the numerics (sync / residual / cycle / solve with runtime masks,
alpha and dia support) live in solvers/amr.py — see its docstring for the
design.  This module keeps the host-side descriptor and the convenience
wrappers used by tools and tests.

Reference: the mesh state after gfs_simulation_adapt / GfsRefine
(src/adaptive.c:998-1022 gfs_domain_reshape 2:1 grading, src/refine.c:115
static refines); the numerics map to src/poisson.c's tree multigrid.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from . import poisson
from . import amr
from .amr import Topo


@dataclasses.dataclass(frozen=True)
class CompositeGrid:
    """Host-side multi-level mesh descriptor (hashable: masks as bytes)."""
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
            cover = _pool_any_np(act, base.dim)
        return CompositeGrid(base=dataclasses.replace(base, level=lmin),
                             lmin=lmin, lmax=lmax, _masks=tuple(packed))

    @staticmethod
    def from_depth_map(base: Grid, lmax: int, D: np.ndarray,
                       graded: bool = False) -> "CompositeGrid":
        """Leaves from a per-finest-cell target depth map ``D`` (values in
        [base.level, lmax], sampled at the lmax resolution), with 2:1
        grading enforced by a dilation fixpoint (gfs_domain_reshape,
        src/adaptive.c:998-1022)."""
        lmin = base.level
        D = np.asarray(D, np.int32)
        if not graded:
            D = grade_depth_map(D)
        gf = dataclasses.replace(base, level=lmax)
        masks = {}
        Ms = {}
        for l in range(lmax, lmin - 1, -1):
            rep = 1 << (lmax - l)
            Ms[l] = _pool_reduce_np(D, rep, base.dim, np.max)
        for l in range(lmin, lmax + 1):
            leaf = Ms[l] <= l
            if l > lmin:
                parent_split = _repeat_np(Ms[l - 1] > l - 1, 2, base.dim)
                leaf &= parent_split
            masks[l] = leaf
        return CompositeGrid.build(base, masks)

    @staticmethod
    def from_refine_fn(base: Grid, lmax: int,
                       refine: Callable) -> "CompositeGrid":
        """Leaves from a refinement indicator: a cell at level l < lmax is
        refined where ``refine(x, y[, z], l)`` is True (the static
        GfsRefine analogue, src/refine.c:115)."""
        lmin = base.level
        gf = dataclasses.replace(base, level=lmax)
        D = np.full(gf.shape, lmin, np.int32)
        for l in range(lmin, lmax):
            g = dataclasses.replace(base, level=l)
            want = np.asarray(refine(*(np.asarray(c) for c in g.centers), l),
                              bool)
            rep = 1 << (lmax - l)
            D = np.maximum(D, np.where(_repeat_np(want, rep, base.dim),
                                       l + 1, lmin))
        return CompositeGrid.from_depth_map(base, lmax, D)

    # -- accessors -----------------------------------------------------------
    @property
    def topo(self) -> Topo:
        return Topo(base=self.base, lmin=self.lmin, lmax=self.lmax)

    def grid(self, l: int) -> Grid:
        return dataclasses.replace(self.base, level=l)

    def leaf_np(self, l: int) -> np.ndarray:
        shape, buf, _ = self._masks[l - self.lmin]
        return np.frombuffer(buf, bool).reshape(shape)

    def leaf(self, l: int) -> jnp.ndarray:
        return jnp.asarray(self.leaf_np(l))

    def active(self, l: int) -> jnp.ndarray:
        shape, _, buf = self._masks[l - self.lmin]
        return jnp.asarray(np.frombuffer(buf, bool).reshape(shape))

    def covered_by_finer(self, l: int) -> jnp.ndarray:
        return self.active(l) & ~self.leaf(l)

    def leaf_arrays(self) -> Dict[int, jnp.ndarray]:
        """The dynamic mask pytree consumed by solvers/amr.py."""
        return {l: self.leaf(l) for l in range(self.lmin, self.lmax + 1)}

    def n_leaves(self) -> int:
        return int(sum(int(np.frombuffer(b, bool).sum())
                       for _, b, _ in self._masks))

    def depth_map(self) -> np.ndarray:
        """Per-finest-cell leaf level (lmax resolution)."""
        gf = dataclasses.replace(self.base, level=self.lmax)
        D = np.full(gf.shape, self.lmin, np.int32)
        for l in range(self.lmin, self.lmax + 1):
            rep = 1 << (self.lmax - l)
            D = np.where(_repeat_np(self.leaf_np(l), rep, self.base.dim),
                         l, D)
        return D


def grade_depth_map(D: np.ndarray) -> np.ndarray:
    """2:1 grading fixpoint: a cell's depth is at most 1 below any
    (8/26-)neighbor's depth (gfs_domain_reshape corner grading loop,
    src/adaptive.c:1003-1009)."""
    D = np.asarray(D, np.int32)
    while True:
        Dn = np.maximum(D, _dilate_max(D) - 1)
        if np.array_equal(Dn, D):
            return D
        D = Dn


def _dilate_max(D: np.ndarray) -> np.ndarray:
    p = np.pad(D, 1, mode="edge")
    out = None
    dim = D.ndim
    import itertools
    for off in itertools.product((0, 1, 2), repeat=dim):
        idx = tuple(slice(o, o + D.shape[a]) for a, o in enumerate(off))
        v = p[idx]
        out = v if out is None else np.maximum(out, v)
    return out


def _pool_any_np(m: np.ndarray, dim: int) -> np.ndarray:
    sh = []
    for a in range(dim):
        sh += [m.shape[a] // 2, 2]
    red = tuple(2 * a + 1 for a in range(dim))
    return m.reshape(sh).any(axis=red)


def _pool_reduce_np(c: np.ndarray, rep: int, dim: int, op) -> np.ndarray:
    if rep == 1:
        return c
    sh = []
    for a in range(dim):
        sh += [c.shape[a] // rep, rep]
    red = tuple(2 * a + 1 for a in range(dim))
    return op(c.reshape(sh), axis=red)


def _repeat_np(m: np.ndarray, rep: int, dim: int) -> np.ndarray:
    for a in range(dim):
        m = m.repeat(rep, axis=a)
    return m


# ---------------------------------------------------------------------------
# Convenience wrappers over solvers/amr.py (static-mesh call sites)
# ---------------------------------------------------------------------------

def sync(u: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
         homogeneous: bool = False, t: float = 0.0) -> dict:
    return amr.sync(u, cg.topo, cg.leaf_arrays(), fbc,
                    homogeneous=homogeneous, t=t)


def leaf_residual(u: dict, rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                  t: float = 0.0, reflux: bool = True,
                  alpha=None, dia=None) -> dict:
    return amr.leaf_residual(u, rhs, cg.topo, cg.leaf_arrays(), fbc,
                             alpha=alpha, dia=dia, t=t, reflux=reflux)


def composite_cycle(u: dict, rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                    params: poisson.MultilevelParams, t: float = 0.0,
                    alpha=None, dia=None) -> dict:
    return amr.cycle(u, rhs, cg.topo, cg.leaf_arrays(), fbc, params,
                     alpha=alpha, dia=dia, t=t)


def composite_solve(rhs: dict, cg: CompositeGrid, fbc: bcs.FieldBC,
                    params: poisson.MultilevelParams = None,
                    u0: dict = None, t: float = 0.0, alpha=None, dia=None):
    """Host-looped composite solve returning (u dict, residual-infty
    history) — the test/tooling entry point; in-loop solvers use
    amr.solve (fully jitted lax.while_loop) instead."""
    params = params or poisson.MultilevelParams()
    topo, leaf = cg.topo, cg.leaf_arrays()
    if u0 is None:
        u = {l: jnp.zeros(cg.grid(l).shape, jnp.result_type(rhs[cg.lmax]))
             for l in range(cg.lmin, cg.lmax + 1)}
    else:
        u = dict(u0)
    dirichlet = any(b.kind == bcs.DIRICHLET for ax in fbc.sides for b in ax)
    if not dirichlet and dia is None:
        mean = amr.leaf_volume_mean(rhs, topo, leaf)
        rhs = {l: rhs[l] - mean for l in rhs}

    hist = []
    for it in range(params.nitermax):
        u = amr.cycle(u, rhs, topo, leaf, fbc, params, alpha=alpha, dia=dia,
                      t=t)
        res = amr.leaf_residual(u, rhs, topo, leaf, fbc, alpha=alpha,
                                dia=dia, t=t)
        rinf = max(float(jnp.max(jnp.abs(res[l]))) for l in res)
        hist.append(rinf)
        if it + 1 >= params.nitermin and rinf <= params.tolerance:
            break
    return u, hist


def flatten(u: dict, cg: CompositeGrid, fbc: bcs.FieldBC) -> jnp.ndarray:
    """Single finest-level array (prolonged from coarse where needed)."""
    return amr.flatten(u, cg.topo, cg.leaf_arrays(), fbc)
