"""Geometric multigrid for div(alpha grad u) - dia*u = rhs on uniform grids.

TPU-native rebuild of the reference's tree multigrid
(reference: src/poisson.c — relax kernels :507-586, residual :634-747,
restriction get_from_below :1044-1068, prolongation get_from_above
:1005-1042, V-cycle gfs_poisson_cycle :1109-1178, outer solve
gfs_poisson_solve :1225-1269, coefficient construction
gfs_poisson_coefficients :756-901).

Differences by design (not a port):
* levels are dense arrays (N = 2**level per axis), not tree traversals;
* the smoother is red-black Gauss-Seidel (the reference's in-order traversal
  relax is sequential Gauss-Seidel; red-black is its parallel equivalent and
  keeps the same sawtooth-cycle convergence ~10-20x residual reduction per
  cycle, cf. test/poisson/res-7.ref);
* BC application is ghost padding (core/bc.py) instead of boundary-object
  traversal; the homogeneous variants are used on correction sweeps exactly
  as relax_loop does (src/poisson.c:1141-1167).

The operator is L(u) = div(alpha grad u) - dia * u, with alpha per-face
coefficient arrays (density/metric/solid fractions) and dia a per-cell
coefficient (used by the implicit diffusion solver, src/poisson.c:1280-1640).
Poisson: dia = 0, solve L(u) = rhs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..ops.stencils import norms


@dataclasses.dataclass(frozen=True)
class MultilevelParams:
    """Reference: src/poisson.c:40-126 GfsMultilevelParams (defaults
    nrelax=4, erelax=1, tolerance=1e-3, nitermax=100, minlevel=0).
    minlevel here defaults to 2 (a 4x4 coarsest grid) — on dense arrays a
    1-cell coarse level is useless, extra sweeps at 4x4 are free."""

    tolerance: float = 1e-3
    nrelax: int = 4
    erelax: int = 1
    minlevel: int = 2
    nitermax: int = 100
    nitermin: int = 1
    omega: float = 1.0
    # number of extra relax sweeps at the coarsest level (near-exact solve)
    coarsest_relax: int = 8


# -----------------------------------------------------------------------------
# Building blocks
# -----------------------------------------------------------------------------

def _checkerboard(shape) -> jnp.ndarray:
    m = 0
    for d in range(len(shape)):
        m = m + jax.lax.broadcasted_iota(jnp.int32, shape, d)
    return (m % 2) == 0


def _neighbor_sums(u_pad: jnp.ndarray, alpha: Optional[Sequence[jnp.ndarray]], dim: int):
    """Return (sum_d alpha_d * u_d, sum_d alpha_d) for each interior cell.

    ``u_pad`` has one ghost layer on every axis.  ``alpha`` is a per-axis
    tuple of face arrays (n+1 along that axis) or None for unit coefficients.
    """
    num = 0.0
    den = 0.0
    for axis in range(dim):
        idx_c = [slice(1, s - 1) for s in u_pad.shape]
        idx_lo = list(idx_c)
        idx_lo[axis] = slice(0, u_pad.shape[axis] - 2)
        idx_hi = list(idx_c)
        idx_hi[axis] = slice(2, u_pad.shape[axis])
        u_lo = u_pad[tuple(idx_lo)]
        u_hi = u_pad[tuple(idx_hi)]
        if alpha is None:
            num = num + u_lo + u_hi
            den = den + 2.0
        else:
            a = alpha[axis]
            n = a.shape[axis]
            f_lo = [slice(None)] * a.ndim
            f_lo[axis] = slice(0, n - 1)
            f_hi = [slice(None)] * a.ndim
            f_hi[axis] = slice(1, n)
            a_lo = a[tuple(f_lo)]
            a_hi = a[tuple(f_hi)]
            num = num + a_lo * u_lo + a_hi * u_hi
            den = den + a_lo + a_hi
    return num, den


def residual(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
             alpha=None, dia=None, homogeneous: bool = False,
             t: float = 0.0) -> jnp.ndarray:
    """r = rhs - L(u).  Reference: src/poisson.c:634-747 residual_set.

    The Neumann-BC hot path (the pressure projections) dispatches to the
    single-pass Pallas kernel on TPU; zero-gradient Neumann residuals are
    identical whether or not the BC is 'homogeneous'."""
    neumann0 = all(
        b.kind in (bcs.NEUMANN, bcs.PERIODIC)
        and (homogeneous or b.kind == bcs.PERIODIC or b.value == 0.0)
        for ax in fbc.sides for b in ax)
    if ((homogeneous or neumann0) and
            _pallas_relax_applicable(u, grid, fbc, alpha, dia, True)
            and alpha is None):
        from ..ops.pallas.rbgs import residual_pallas

        signs = tuple(
            -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
            for ax in range(2) for sd in range(2))
        d = dia if dia is not None else 0.0
        return residual_pallas(u, rhs, d, h2=grid.h * grid.h, signs=signs,
                               periodic=(fbc.is_periodic(0),
                                         fbc.is_periodic(1)))
    u_pad = bcs.apply_bc(u, grid, fbc, 1, homogeneous=homogeneous, t=t)
    num, den = _neighbor_sums(u_pad, alpha, grid.dim)
    h2 = grid.h * grid.h
    lap = (num - den * u) / h2
    d = 0.0 if dia is None else dia
    return rhs - (lap - d * u)


def _pallas_relax_applicable(u, grid, fbc, alpha, dia, homogeneous):
    """The fused Pallas smoother covers the multigrid hot path: 2D f32 TPU
    with homogeneous or periodic BCs.  Unit coefficients + scalar dia use
    the scalar kernel; per-face alpha and/or cell dia use the
    variable-coefficient kernel (the two-phase projections and the
    variable-density diffusion systems)."""
    if not homogeneous or grid.dim != 2:
        return False
    if u.dtype not in (jnp.float32,):
        return False
    # lane/sublane floor: small coarse levels use the jnp path
    if u.shape[0] < 128 or u.shape[1] < 128:
        return False
    if alpha is not None:
        if any(a.dtype != u.dtype or a.shape != grid.face_shape(c)
               for c, a in enumerate(alpha)):
            return False
        if dia is not None and jnp.ndim(dia) not in (0, 2):
            return False
    elif dia is not None and jnp.ndim(dia) != 0:
        return False    # cell dia rides the alpha kernel only
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def relax(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
          nsweeps: int, alpha=None, dia=None, homogeneous: bool = True,
          omega: float = 1.0, t: float = 0.0) -> jnp.ndarray:
    """Red-black Gauss-Seidel sweeps.

    Reference: src/poisson.c:507-586 relax/relax2D (their traversal-ordered
    Gauss-Seidel, parallel-safe here as red/black half-sweeps with BC
    re-application between halves, matching relax_loop's per-sweep BC
    updates, src/poisson.c:1070-1087).  On TPU, the homogeneous-BC
    multigrid hot path dispatches to the fused Pallas kernel
    (ops/pallas/rbgs.py) — one HBM round-trip for all sweeps.
    """
    h2 = grid.h * grid.h
    if _pallas_relax_applicable(u, grid, fbc, alpha, dia, homogeneous):
        signs = tuple(
            -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
            for ax in range(2) for sd in range(2))
        periodic = (fbc.is_periodic(0), fbc.is_periodic(1))
        d = dia if dia is not None else 0.0
        if alpha is None:
            from ..ops.pallas.rbgs import rbgs_relax
            return rbgs_relax(u, rhs, d, nsweeps=nsweeps, h2=h2,
                              signs=signs, periodic=periodic, omega=omega)
        from ..ops.pallas.rbgs import rbgs_relax_alpha
        return rbgs_relax_alpha(u, rhs, alpha[0], alpha[1], d,
                                nsweeps=nsweeps, h2=h2, signs=signs,
                                periodic=periodic, omega=omega,
                                dia_cell=jnp.ndim(d) == 2)
    red = _checkerboard(u.shape)
    d = 0.0 if dia is None else dia

    def half(u, mask):
        u_pad = bcs.apply_bc(u, grid, fbc, 1, homogeneous=homogeneous, t=t)
        num, den = _neighbor_sums(u_pad, alpha, grid.dim)
        # fully-solid cells (all face fractions 0) stay untouched
        # (reference: relax skips cells with zero diagonal, poisson.c:507)
        new = (num - h2 * rhs) / jnp.maximum(den + d * h2, 1e-30)
        if omega != 1.0:
            new = (1.0 - omega) * u + omega * new
        return jnp.where(mask, new, u)

    for _ in range(nsweeps):
        u = half(u, red)
        u = half(u, ~red)
    return u


def restrict(r: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Average of children -> parent cell.

    Reference: src/poisson.c:1044-1068 get_from_below (child residual sum;
    with per-cell units the volume-consistent restriction is the mean).
    Implemented as a native mean-pool (reduce_window) — efficient on TPU."""
    win = (2,) * dim
    s = jax.lax.reduce_window(r, jnp.asarray(0.0, r.dtype), jax.lax.add,
                              win, win, "VALID")
    return s * (0.5 ** dim)


def _interleave(lo: jnp.ndarray, hi: jnp.ndarray, axis: int) -> jnp.ndarray:
    """[lo0, hi0, lo1, hi1, ...] along ``axis`` via interior padding (native
    lax.pad, no reshape/transpose materialization)."""
    cfg = [(0, 0, 0)] * lo.ndim
    cfg_lo = list(cfg)
    cfg_lo[axis] = (0, 1, 1)
    cfg_hi = list(cfg)
    cfg_hi[axis] = (1, 0, 1)
    zero = jnp.asarray(0.0, lo.dtype)
    return (jax.lax.pad(lo, zero, cfg_lo) + jax.lax.pad(hi, zero, cfg_hi))


def prolong(c: jnp.ndarray, grid_c: Grid, fbc: bcs.FieldBC,
            homogeneous: bool = True, t: float = 0.0) -> jnp.ndarray:
    """Bilinear/trilinear prolongation coarse -> fine (2x per axis).

    Reference: src/poisson.c:1005-1042 get_from_above (parent value plus
    gradient correction == tensor-product linear interpolation)."""
    a = bcs.apply_bc(c, grid_c, fbc, 1, homogeneous=homogeneous, t=t)
    dim = grid_c.dim
    # successively upsample each axis; crop ghosts of axes not yet processed
    for axis in range(dim):
        n = a.shape[axis]

        def tk(s0, s1):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(s0, n + s1)
            return a[tuple(idx)]

        center = tk(1, -1)
        left = tk(0, -2)
        right = tk(2, 0)
        lo = 0.75 * center + 0.25 * left
        hi = 0.75 * center + 0.25 * right
        a = _interleave(lo, hi, axis)
        # axis is now fine-resolution and ghost-free; later axes still padded
    return a


def coarsen_face_coeff(alpha, dim: int):
    """Coarsen per-face coefficient arrays by averaging child faces.

    Reference: src/fluid.c face coefficient coarsening (gfs_face_coarse_fine
    inverse); coarse face value = mean of the 2 (2D) / 4 (3D) child faces."""
    out = []
    for axis in range(dim):
        a = alpha[axis]
        # take every second face along `axis`, average transverse pairs
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(0, a.shape[axis], 2)
        a = a[tuple(idx)]
        for ax2 in range(dim):
            if ax2 == axis:
                continue
            n = a.shape[ax2]
            sh = list(a.shape)
            sh[ax2:ax2 + 1] = [n // 2, 2]
            a = a.reshape(sh).mean(axis=ax2 + 1)
        out.append(a)
    return tuple(out)


# -----------------------------------------------------------------------------
# V-cycle and outer solve
# -----------------------------------------------------------------------------

def _level_grids(grid: Grid, minlevel: int):
    return [dataclasses.replace(grid, level=l) for l in range(grid.level, minlevel - 1, -1)]


def _coeff_hierarchy(grid: Grid, minlevel: int, alpha, dia):
    """Coarsen alpha (face) and dia (cell) down the level stack."""
    alphas = [alpha]
    dias = [dia]
    for _ in range(grid.level - minlevel):
        alphas.append(None if alphas[-1] is None
                      else coarsen_face_coeff(alphas[-1], grid.dim))
        d = dias[-1]
        dias.append(d if d is None or jnp.ndim(d) == 0
                    else restrict(d, grid.dim))
    return alphas, dias


def correction(r: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
               params: MultilevelParams, alpha=None, dia=None) -> jnp.ndarray:
    """The correction phase of one sawtooth cycle: restrict the fine
    residual to all levels, then prolong+relax upward with homogeneous BCs.
    Reference: src/poisson.c:1109-1166 (get_from_below + relax_loop +
    get_from_above)."""
    minlevel = min(params.minlevel, grid.level)
    grids = _level_grids(grid, minlevel)
    alphas, dias = _coeff_hierarchy(grid, minlevel, alpha, dia)

    rs = [r]
    for g in grids[1:]:
        rs.append(restrict(rs[-1], grid.dim))

    nl = len(grids)
    du = jnp.zeros_like(rs[-1])
    nswp = params.nrelax * (params.erelax ** (nl - 1)) + params.coarsest_relax
    du = relax(du, rs[-1], grids[-1], fbc, nswp, alphas[-1], dias[-1],
               homogeneous=True, omega=params.omega)
    for k in range(nl - 2, -1, -1):
        du = prolong(du, grids[k + 1], fbc, homogeneous=True)
        nswp = params.nrelax * (params.erelax ** k)
        du = relax(du, rs[k], grids[k], fbc, nswp, alphas[k], dias[k],
                   homogeneous=True, omega=params.omega)
    return du


def cycle(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
          params: MultilevelParams, alpha=None, dia=None, t: float = 0.0) -> jnp.ndarray:
    """One sawtooth multigrid cycle (residual + correction).
    Reference: src/poisson.c:1109-1178 gfs_poisson_cycle."""
    r = residual(u, rhs, grid, fbc, alpha, dia, homogeneous=False, t=t)
    return u + correction(r, grid, fbc, params, alpha, dia)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SolveStats:
    """Reference: src/poisson.h GfsMultilevelParams output fields
    (residual_before/after, niter)."""
    niter: jnp.ndarray
    residual_before: dict
    residual_after: dict

    def reduction(self):
        return self.residual_before["infty"] / jnp.maximum(self.residual_after["infty"], 1e-300)

    def tree_flatten(self):
        return (self.niter, self.residual_before, self.residual_after), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# jit-cached building blocks (cache key = the hashable static descriptors)
cycle_jit = jax.jit(cycle, static_argnames=("grid", "fbc", "params"))
residual_jit = jax.jit(residual, static_argnames=("grid", "fbc", "homogeneous"))


@functools.partial(jax.jit, static_argnames=("grid", "fbc", "params"))
def _solve_adaptive(u, rhs, grid, fbc, params, alpha, dia, t, r0, tol):
    """Tolerance loop with ONE residual evaluation per cycle: the residual
    that ends iteration i is reused as the correction input of iteration
    i+1 (the reference recomputes it at the end of each cycle too,
    src/poisson.c:1175)."""
    def cond(state):
        u, r, i = state
        rinf = jnp.max(jnp.abs(r))
        return (i < params.nitermin) | ((i < params.nitermax) & (rinf > tol))

    def body(state):
        u, r, i = state
        u = u + correction(r, grid, fbc, params, alpha, dia)
        r = residual(u, rhs, grid, fbc, alpha, dia, t=t)
        return u, r, i + 1

    u, r, niter = jax.lax.while_loop(cond, body, (u, r0, jnp.asarray(0)))
    return u, niter, jnp.max(jnp.abs(r))


def solve(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
          params: MultilevelParams = MultilevelParams(), alpha=None, dia=None,
          t: float = 0.0):
    """Iterate cycles until residual.infty <= tolerance * max(|rhs|) or
    nitermax, at least nitermin (reference: src/poisson.c:1225-1269
    gfs_poisson_solve; tolerance semantics relative to the projection dt
    scale there — here relative to the rhs infinity norm)."""
    r0 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    res_before = norms(r0)
    scale = jnp.maximum(jnp.max(jnp.abs(rhs)), 1e-300)
    tol = params.tolerance * scale

    if params.nitermin == params.nitermax:
        # fixed cycle count: one compiled cycle, looped from the host
        # (matches the test-suite usage nitermin = nitermax = CYCLE,
        # test/poisson/poisson.gfs:57)
        for _ in range(params.nitermax):
            u = cycle_jit(u, rhs, grid, fbc, params, alpha, dia, t=t)
        niter = jnp.asarray(params.nitermax)
    else:
        u, niter, _ = _solve_adaptive(u, rhs, grid, fbc, params, alpha, dia,
                                      jnp.asarray(t, u.dtype), r0, tol)

    r1 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    return u, SolveStats(niter=niter, residual_before=res_before,
                         residual_after=norms(r1))
