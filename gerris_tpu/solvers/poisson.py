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
import numpy as np

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
    # pluggable linear solver (the reference's par->poisson_solve seam,
    # src/poisson.h:32-51, swapped by the hypre/lis/agmg modules):
    # "multigrid" (native MG) or "cg" (Jacobi-preconditioned CG)
    solver: str = "multigrid"
    # fixed cycle schedule: > 0 runs exactly this many sawtooth cycles
    # with NO residual/tolerance checks (the launch-count-optimal TPU
    # production path; on the fused-Pallas path each cycle is 3 kernel
    # launches).  0 = adaptive tolerance loop (the default; the
    # reference's nitermin/nitermax semantics).
    ncycles: int = 0
    # --- TPU Pallas-path tuning (formerly GERRIS_* env knobs) ---
    # smoothing depth per fused launch: on the launch-bound remote TPU
    # deeper in-kernel sweeps are ~free, so the Pallas path raises
    # nrelax to at least this (and coarsest_relax to 2x)
    tpu_nrelax: int = 8
    # grid size at/below which the whole remaining V-cascade collapses
    # into the single-launch ops/pallas/rbgs.coarse_vcycle kernel
    coarse_top: int = 512
    # max unknowns for the dense direct coarse eigensolve (0 disables);
    # CPU runs cap this at 1024 (trace-time eigh of 4096 unknowns costs
    # minutes of host time)
    dense_coarse_max: int = 4096
    # fold the MAC-divergence rhs into the first fused-cycle kernel
    # (round-3 lever (a): -1 launch per projection).  Only effective on
    # the fixed-1-cycle fused Pallas path with no-flux/periodic
    # boundaries (the compatibility mean is analytically zero there; the
    # f32 roundoff mean is projected out by the dense coarse eigensolve).
    fold_div: bool = False
    # fold the post-solve projection correction (face gradients +
    # uf -= dt grad p + cell gradient + centred correction) into the
    # final prolong_relax launch (round-4 lever (b): -1 launch per
    # projection).  Requires fold_div (the same fixed-1-cycle fused
    # path).
    fold_correct: bool = False


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
    static_ok = all(
        b.kind in (bcs.NEUMANN, bcs.PERIODIC, bcs.DIRICHLET)
        and not callable(b.value)
        for ax in fbc.sides for b in ax)
    if (static_ok and
            _pallas_relax_applicable(u, grid, fbc, alpha, dia, True)
            and alpha is None):
        from ..ops.pallas.rbgs import residual_pallas

        signs = tuple(
            -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
            for ax in range(2) for sd in range(2))
        # static ghost offsets: Dirichlet 2b, Neumann -/+ g h
        offs = []
        for ax in range(2):
            for sd in range(2):
                b = fbc.sides[ax][sd]
                if homogeneous or b.kind == bcs.PERIODIC:
                    offs.append(0.0)
                elif b.kind == bcs.DIRICHLET:
                    offs.append(2.0 * float(b.value))
                else:
                    offs.append((1.0 if sd else -1.0)
                                * float(bcs.bc_value(b)) * grid.h)
        d = dia if dia is not None else 0.0
        return residual_pallas(u, rhs, d, h2=grid.h * grid.h, signs=signs,
                               offs=tuple(offs),
                               periodic=(fbc.is_periodic(0),
                                         fbc.is_periodic(1)))
    if homogeneous or _bc_values_static(fbc):
        num, den = _neighbor_sums_shifted(u, alpha, grid, fbc, homogeneous,
                                          t)
    else:
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
    if any(b.kind == bcs.NAVIER for ax in fbc.sides for b in ax):
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


def _shifted_neighbor(u: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
                      axis: int, lo: bool, homogeneous: bool,
                      t: float = 0.0) -> jnp.ndarray:
    """Neighbour values along ``axis`` as a same-shape array: roll + a
    masked boundary-ghost formula.

    SPMD-native alternative to concatenate-based ghost padding: under
    GSPMD a concatenate along a sharded axis forces an all-gather of the
    whole operand, while roll lowers to a halo collective-permute and the
    boundary mask is local (measured on the level-8 dryrun: 27 half-domain
    all-gathers per step from the padded path, zero from this one).
    Constant BC values only (callables take the padded path)."""
    per = fbc.is_periodic(axis)
    v = jnp.roll(u, 1 if lo else -1, axis)
    if per:
        return v
    bc = fbc.sides[axis][0 if lo else 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, u.shape, axis)
    m = (idx == 0) if lo else (idx == u.shape[axis] - 1)
    if bc.kind == bcs.DIRICHLET:
        b = 0.0 if (homogeneous or callable(bc.value)) else bc.value
        ghost = 2.0 * b - u
    else:
        g = 0.0 if (homogeneous or callable(bc.value)) \
            else bcs.bc_value(bc)
        ghost = u - g * grid.h if lo else u + g * grid.h
    return jnp.where(m, ghost, v)


def _bc_values_static(fbc: bcs.FieldBC) -> bool:
    # Navier ghosts are not expressible as value+mirror: padded path only
    return all(not callable(b.value) and b.kind != bcs.NAVIER
               for ax in fbc.sides for b in ax)


def _neighbor_sums_shifted(u, alpha, grid: Grid, fbc: bcs.FieldBC,
                           homogeneous: bool, t: float = 0.0):
    """(num, den) of the 2dim-point stencil via shift-with-masked-BCs —
    same values as _neighbor_sums on apply_bc output, without the
    concatenates (see _shifted_neighbor)."""
    num = 0.0
    den = 0.0
    for axis in range(grid.dim):
        u_lo = _shifted_neighbor(u, grid, fbc, axis, True, homogeneous, t)
        u_hi = _shifted_neighbor(u, grid, fbc, axis, False, homogeneous, t)
        if alpha is None:
            num = num + u_lo + u_hi
            den = den + 2.0
        else:
            a = alpha[axis]
            n = a.shape[axis]
            sl_lo = [slice(None)] * a.ndim
            sl_lo[axis] = slice(0, n - 1)
            sl_hi = [slice(None)] * a.ndim
            sl_hi[axis] = slice(1, n)
            a_lo = a[tuple(sl_lo)]
            a_hi = a[tuple(sl_hi)]
            num = num + a_lo * u_lo + a_hi * u_hi
            den = den + a_lo + a_hi
    return num, den


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
    # 3D TPU fast path: fused strip kernel on the 7-point stencil
    # (ops/pallas/rbgs3d.py — VERDICT r3 item 9)
    if (homogeneous and grid.dim == 3 and alpha is None
            and (dia is None or jnp.ndim(dia) == 0)
            and not any(b.kind == bcs.PERIODIC
                        for ax in fbc.sides for b in ax)
            and all(b.kind in (bcs.DIRICHLET, bcs.NEUMANN)
                    for ax in fbc.sides for b in ax)):
        from ..ops.pallas import rbgs3d
        if rbgs3d.applicable3d(u):
            signs3 = tuple(
                -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
                for ax in range(3) for sd in range(2))
            return rbgs3d.rbgs_relax_3d(
                u, rhs, dia if dia is not None else 0.0,
                nsweeps=nsweeps, h2=h2, signs=signs3, omega=omega)
    red = _checkerboard(u.shape)
    d = 0.0 if dia is None else dia
    shifted = homogeneous or _bc_values_static(fbc)

    def half(u, mask):
        if shifted:
            num, den = _neighbor_sums_shifted(u, alpha, grid, fbc,
                                              homogeneous, t)
        else:
            u_pad = bcs.apply_bc(u, grid, fbc, 1, homogeneous=homogeneous,
                                 t=t)
            num, den = _neighbor_sums(u_pad, alpha, grid.dim)
        # fully-solid/disconnected cells (zero operator diagonal) stay
        # untouched even under nonzero rhs
        # (reference: relax skips cells with zero diagonal, poisson.c:507)
        dd = den + d * h2
        new = (num - h2 * rhs) / jnp.maximum(dd, 1e-30)
        if omega != 1.0:
            new = (1.0 - omega) * u + omega * new
        new = jnp.where(dd > 1e-20, new, u)
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
    dim = grid_c.dim
    if homogeneous or _bc_values_static(fbc):
        # SPMD-native: roll + masked ghosts, shapes stay evenly shardable
        a = c
        for axis in range(dim):
            left = _shifted_neighbor(a, grid_c, fbc, axis, True,
                                     homogeneous, t)
            right = _shifted_neighbor(a, grid_c, fbc, axis, False,
                                      homogeneous, t)
            lo = 0.75 * a + 0.25 * left
            hi = 0.75 * a + 0.25 * right
            a = _interleave(lo, hi, axis)
        return a
    a = bcs.apply_bc(c, grid_c, fbc, 1, homogeneous=homogeneous, t=t)
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


# Tuning knobs live on MultilevelParams (tpu_nrelax / coarse_top /
# dense_coarse_max) — checkpoint-visible config fields, not env vars.


@functools.lru_cache(maxsize=32)
def _coarse_eig(grid: Grid, kinds: tuple):
    """Eigendecomposition (w, Q) of the coarse homogeneous-BC Laplacian.

    TPU-native replacement for deep chains of tiny smoother levels (the
    reference descends to the root cell, src/poisson.c:1109): small grids
    are latency-bound on the MXU-rich chip, so two exact matvecs beat five
    levels of sequential sweeps — and make the coarse solve exact.  The
    factorization also solves the Helmholtz systems (L - d I) du = r of
    the implicit diffusion for any runtime scalar d via
    du = Q diag(1/(w - d)) Q^T r; the zero-eigenvalue pure-Neumann/
    periodic mode is projected out (the min-norm zero-mean solution)."""
    shape = grid.shape
    N = int(np.prod(shape))
    strides = np.cumprod((1,) + tuple(reversed(shape[1:])))[::-1]

    def idx(pos):
        return int(sum(p * s for p, s in zip(pos, strides)))

    A = np.zeros((N, N), np.float64)
    for pos in np.ndindex(*shape):
        k = idx(pos)
        diag = 0.0
        for axis in range(grid.dim):
            for side, d in ((0, -1), (1, +1)):
                nb = list(pos)
                nb[axis] += d
                if 0 <= nb[axis] < shape[axis]:
                    A[k, idx(nb)] += 1.0
                    diag -= 1.0
                elif kinds[axis][side] == bcs.PERIODIC:
                    nb[axis] %= shape[axis]
                    A[k, idx(nb)] += 1.0
                    diag -= 1.0
                elif kinds[axis][side] == bcs.DIRICHLET:
                    diag -= 2.0      # homogeneous ghost = -interior
                # homogeneous Neumann: ghost = interior -> no net term
        A[k, k] += diag
    A /= grid.h * grid.h
    w, Q = np.linalg.eigh(A)
    return w, Q


def _dense_max(params: "MultilevelParams") -> int:
    """Big direct-solve levels only pay off on the launch-bound TPU; the
    trace-time eigh of a 4096-unknown level costs minutes of host CPU,
    so CPU (test) runs keep the small cap."""
    try:
        if jax.default_backend() == "tpu":
            return params.dense_coarse_max
    except Exception:
        pass
    return min(params.dense_coarse_max, 1024)


def _dense_coarse_eligible(g: Grid, alpha, dia,
                           params: "MultilevelParams") -> bool:
    return (alpha is None and (dia is None or jnp.ndim(dia) == 0)
            and int(np.prod(g.shape)) <= _dense_max(params))


def correction(r: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
               params: MultilevelParams, alpha=None, dia=None,
               u_fine=None) -> jnp.ndarray:
    """The correction phase of one sawtooth cycle: restrict the fine
    residual down the hierarchy, solve the coarsest level (exactly, with
    the dense pseudo-inverse, when eligible), then prolong+relax upward
    with homogeneous BCs.  With ``u_fine`` the final u + du is fused into
    the last (Pallas) prolong-relax launch and returned.
    Reference: src/poisson.c:1109-1166 (get_from_below + relax_loop +
    get_from_above)."""
    minlevel = min(params.minlevel, grid.level)
    # single-launch coarse cascade: on the fused Pallas path every level
    # at/below 512 collapses into ops/pallas/rbgs.coarse_vcycle (kernel
    # launches dominate on the remote TPU)
    fused_coarse = (
        alpha is None and (dia is None or jnp.ndim(dia) == 0)
        and grid.dim == 2 and not fbc.is_periodic(0)
        and grid.shape[0] > params.coarse_top
        and _pallas_relax_applicable(r, grid, fbc, None, dia, True))
    if fused_coarse:
        minlevel = params.coarse_top.bit_length() - 1
    # with unit face coefficients, stop descending once the dense direct
    # solve takes over (two matvecs replace several latency-bound tiny
    # levels); scalar dia (implicit diffusion) rides the same eigenbasis
    elif alpha is None and (dia is None or jnp.ndim(dia) == 0):
        while minlevel < grid.level:
            g = dataclasses.replace(grid, level=minlevel + 1)
            if int(np.prod(g.shape)) > _dense_max(params):
                break
            minlevel += 1
    grids = _level_grids(grid, minlevel)
    alphas, dias = _coeff_hierarchy(grid, minlevel, alpha, dia)

    rs = [r]
    for g in grids[1:]:
        rs.append(restrict(rs[-1], grid.dim))

    nl = len(grids)
    if fused_coarse:
        from ..ops.pallas.rbgs import coarse_vcycle

        signs = tuple(
            -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
            for ax in range(2) for sd in range(2))
        dk = dias[-1]
        du = coarse_vcycle(
            rs[-1], 0.0 if dk is None else dk,
            nsweeps=params.nrelax,
            coarsest=max(params.coarsest_relax, 40),
            h2=grids[-1].h ** 2, signs=signs,
            per_y=fbc.is_periodic(1), min_n=16)
    elif _dense_coarse_eligible(grids[-1], alphas[-1], dias[-1], params):
        kinds = tuple(tuple(b.kind for b in ax) for ax in fbc.sides)
        w, Q = _coarse_eig(grids[-1], kinds)
        rc = rs[-1]
        wj = jnp.asarray(w, rc.dtype)
        Qj = jnp.asarray(Q, rc.dtype)
        d = 0.0 if dias[-1] is None else dias[-1]
        # system is (L - d I) du = r in the residual convention above
        denom = wj - d
        z = Qj.T @ rc.reshape(-1)
        z = jnp.where(jnp.abs(denom) > 1e-12 / (grids[-1].h ** 2),
                      z / jnp.where(denom == 0, 1.0, denom), 0.0)
        du = (Qj @ z).reshape(rc.shape)
    else:
        du = jnp.zeros_like(rs[-1])
        nswp = params.nrelax * (params.erelax ** (nl - 1)) \
            + params.coarsest_relax
        du = relax(du, rs[-1], grids[-1], fbc, nswp, alphas[-1], dias[-1],
                   homogeneous=True, omega=params.omega)
    for k in range(nl - 2, -1, -1):
        nswp = params.nrelax * (params.erelax ** k)
        dk = dias[k]
        # fused single-launch prolong+relax(+add) on the Pallas path
        # (launches dominate on the remote TPU — see prolong_relax)
        if (alphas[k] is None and (dk is None or jnp.ndim(dk) == 0)
                and not fbc.is_periodic(0)
                and _pallas_relax_applicable(rs[k], grids[k], fbc, None,
                                             dk, True)):
            from ..ops.pallas.rbgs import prolong_relax

            signs = tuple(
                -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
                for ax in range(2) for sd in range(2))
            add_u = k == 0 and u_fine is not None
            du = prolong_relax(du, rs[k], 0.0 if dk is None else dk,
                               u_fine if add_u else None,
                               nsweeps=nswp, h2=grids[k].h ** 2,
                               signs=signs,
                               periodic_y=fbc.is_periodic(1),
                               omega=params.omega, add_u=add_u)
            if add_u:
                return du
            continue
        du = prolong(du, grids[k + 1], fbc, homogeneous=True)
        du = relax(du, rs[k], grids[k], fbc, nswp, alphas[k], dias[k],
                   homogeneous=True, omega=params.omega)
    return du if u_fine is None else u_fine + du


def cycle(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
          params: MultilevelParams, alpha=None, dia=None, t: float = 0.0) -> jnp.ndarray:
    """One sawtooth multigrid cycle (residual + correction).
    Reference: src/poisson.c:1109-1178 gfs_poisson_cycle."""
    r = residual(u, rhs, grid, fbc, alpha, dia, homogeneous=False, t=t)
    return correction(r, grid, fbc, params, alpha, dia, u_fine=u)


def _signs_offs(grid: Grid, fbc: bcs.FieldBC, homogeneous: bool):
    """(signs, offs) ghost encodings for the fused kernels (ghost =
    sign * mirror + off per side)."""
    signs = tuple(
        -1.0 if fbc.sides[ax][sd].kind == bcs.DIRICHLET else 1.0
        for ax in range(2) for sd in range(2))
    offs = []
    for ax in range(2):
        for sd in range(2):
            b = fbc.sides[ax][sd]
            if homogeneous or b.kind == bcs.PERIODIC:
                offs.append(0.0)
            elif b.kind == bcs.DIRICHLET:
                offs.append(2.0 * float(b.value))
            else:
                offs.append((1.0 if sd else -1.0)
                            * float(bcs.bc_value(b)) * grid.h)
    return signs, tuple(offs)


def _fused_cycle_eligible(u, grid: Grid, fbc: bcs.FieldBC, alpha, dia):
    """The 3-launch fixed cycle (residual_restrict -> cascade_prolong ->
    prolong_relax): 2D f32 TPU, unit alpha, scalar dia, static BC
    values, non-periodic rows, power-of-two >= 512 shapes."""
    n0, n1 = u.shape if u.ndim == 2 else (0, 0)
    return (grid.dim == 2 and alpha is None
            and (dia is None or jnp.ndim(dia) == 0)
            and not fbc.is_periodic(0)
            and n0 >= 512 and n1 >= 512
            and (n0 & (n0 - 1)) == 0 and (n1 & (n1 - 1)) == 0
            and _bc_values_static(fbc)
            and _pallas_relax_applicable(u, grid, fbc, None, dia, True))


def fused_cycle(u, rhs, grid: Grid, fbc: bcs.FieldBC,
                params: MultilevelParams, dia=None, rhs_sub=0.0):
    """One sawtooth cycle in 3 kernel launches (the launch-bound remote
    TPU costs ~0.3 ms per launch regardless of size):
      1. residual_restrict: r0 = (rhs - rhs_sub) - L(u), r1, r2;
      2. cascade_prolong_relax: every level at/below n/2 (the whole
         sub-cascade + half-level prolong+relax) -> rep layout;
      3. prolong_relax(pre_rep): fine prolong + relax + u += du.
    Sweep schedule identical to the adaptive correction() fused path.
    Returns (u_new, r0)."""
    from ..ops.pallas.rbgs import (residual_restrict, cascade_prolong_relax,
                                   prolong_relax)

    signs, offs = _signs_offs(grid, fbc, homogeneous=False)
    d = dia if dia is not None else 0.0
    r0, r1, r2 = residual_restrict(
        u, rhs, d, rhs_sub, h2=grid.h * grid.h, signs=signs, offs=offs,
        periodic=(False, fbc.is_periodic(1)))
    nrelax = params.nrelax
    rep = cascade_prolong_relax(
        r1, r2, d, nsweeps=nrelax,
        coarsest=max(params.coarsest_relax, 40),
        h2_half=4.0 * grid.h * grid.h, signs=signs,
        per_y=fbc.is_periodic(1), min_n=16, omega=params.omega)
    u = prolong_relax(rep, r0, d, u, nsweeps=nrelax,
                      h2=grid.h * grid.h, signs=signs,
                      periodic_y=fbc.is_periodic(1), add_u=True,
                      pre_rep=True, omega=params.omega)
    return u, r0


def solve_fused_div(u, ufx, ufy, grid: Grid, fbc: bcs.FieldBC,
                    params: MultilevelParams, dt, dia=None):
    """Fixed-1-cycle fused solve of the MAC projection with the
    divergence rhs formed IN-KERNEL from the face velocities
    (ops/pallas/rbgs.residual_restrict_div — one launch replaces
    divergence_mac + residual_restrict).  The pure-Neumann
    compatibility mean is analytically zero for no-flux/periodic
    boundaries, so sub = 0 (the f32 roundoff mean lands in the dense
    coarse eigensolve's projected-out nullspace)."""
    from ..ops.pallas.rbgs import (residual_restrict_div,
                                   cascade_prolong_relax, prolong_relax)

    if _pallas_relax_applicable(u, grid, fbc, None, dia, True):
        params = dataclasses.replace(
            params, nrelax=max(params.nrelax, params.tpu_nrelax),
            coarsest_relax=max(params.coarsest_relax,
                               2 * params.tpu_nrelax))
    signs, offs = _signs_offs(grid, fbc, homogeneous=False)
    d = dia if dia is not None else 0.0
    r0, r1, r2 = residual_restrict_div(
        u, ufx, ufy, dt * grid.h, d, 0.0, h2=grid.h * grid.h,
        signs=signs, offs=offs, periodic=(False, fbc.is_periodic(1)))
    nrelax = params.nrelax
    rep = cascade_prolong_relax(
        r1, r2, d, nsweeps=nrelax,
        coarsest=max(params.coarsest_relax, 40),
        h2_half=4.0 * grid.h * grid.h, signs=signs,
        per_y=fbc.is_periodic(1), min_n=16, omega=params.omega)
    u = prolong_relax(rep, r0, d, u, nsweeps=nrelax,
                      h2=grid.h * grid.h, signs=signs,
                      periodic_y=fbc.is_periodic(1), add_u=True,
                      pre_rep=True, omega=params.omega)
    return u, SolveStats(niter=jnp.asarray(1),
                         residual_before=norms(r0),
                         residual_after=norms(r0))


def solve_fused_div_correct(u, ufx, ufy, grid: Grid, fbc: bcs.FieldBC,
                            params: MultilevelParams, dt, cells=None,
                            dia=None):
    """solve_fused_div with the projection-correction epilogue fused
    into the final launch (round-4 lever (b)): the whole MAC projection
    — divergence rhs, fixed MG cycle, face/cell correction — in THREE
    kernel launches.  Returns (ufx', ufy', p', gx, gy, stats[, U', V'])
    mirroring projection._mac_correct's outputs."""
    from ..ops.pallas.rbgs import (residual_restrict_div,
                                   cascade_prolong_relax,
                                   prolong_relax_correct)

    if _pallas_relax_applicable(u, grid, fbc, None, dia, True):
        params = dataclasses.replace(
            params, nrelax=max(params.nrelax, params.tpu_nrelax),
            coarsest_relax=max(params.coarsest_relax,
                               2 * params.tpu_nrelax))
    signs, offs = _signs_offs(grid, fbc, homogeneous=False)
    d = dia if dia is not None else 0.0
    r0, r1, r2 = residual_restrict_div(
        u, ufx, ufy, dt * grid.h, d, 0.0, h2=grid.h * grid.h,
        signs=signs, offs=offs, periodic=(False, fbc.is_periodic(1)))
    nrelax = params.nrelax
    rep = cascade_prolong_relax(
        r1, r2, d, nsweeps=nrelax,
        coarsest=max(params.coarsest_relax, 40),
        h2_half=4.0 * grid.h * grid.h, signs=signs,
        per_y=fbc.is_periodic(1), min_n=16, omega=params.omega)
    out = prolong_relax_correct(
        rep, r0, d, u, ufx, ufy, dt, grid.h, cells, nsweeps=nrelax,
        h2=grid.h * grid.h, sgn=signs, off=offs,
        periodic_y=fbc.is_periodic(1), omega=params.omega)
    stats = SolveStats(niter=jnp.asarray(1), residual_before=norms(r0),
                       residual_after=norms(r0))
    p, ufx2, ufy2, gx, gy = out[:5]
    if cells is not None:
        return ufx2, ufy2, p, gx, gy, stats, out[5], out[6]
    return ufx2, ufy2, p, gx, gy, stats


def fold_div_eligible(u, grid: Grid, fbc: bcs.FieldBC,
                      params: MultilevelParams) -> bool:
    """solve_fused_div applicability: the 1-cycle fused path with pure
    Neumann/periodic pressure BCs (analytic zero compatibility mean)."""
    return (params.fold_div and params.ncycles == 1
            and params.solver == "multigrid"
            and not any(b.kind == bcs.DIRICHLET
                        for ax in fbc.sides for b in ax)
            and _fused_cycle_eligible(u, grid, fbc, None, None))


def batched_fixed_eligible(us, grid: Grid, fbcs, dias) -> bool:
    """Can the component systems share one batched fused-cycle launch
    chain?  Same signs/periodicity across the batch, scalar dias, and
    the single-system fused-cycle constraints."""
    if not all(_fused_cycle_eligible(u, grid, f, None, d)
               for u, f, d in zip(us, fbcs, dias)):
        return False
    sp = [(_signs_offs(grid, f, False)[0], f.is_periodic(1))
          for f in fbcs]
    return all(x == sp[0] for x in sp[1:])


def solve_relax_pair(us, rhss, grid: Grid, fbcs,
                     params: MultilevelParams, dias):
    """Pair fine-relax-only solve in 2 launches (the U+V implicit
    diffusion): residual_restrict_pair for r0 + prolong_relax_pair with
    a zero coarse correction (= pure homogeneous relaxation on the
    correction + u += du; the zero 'rep' is loop-invariant so XLA hoists
    its materialisation).  See solve_relax for when this is the right
    backend."""
    from ..ops.pallas.rbgs import (residual_restrict_pair,
                                   prolong_relax_pair, GP)

    nsweeps = max(params.nrelax, 4)
    signs, _ = _signs_offs(grid, fbcs[0], False)
    per_y = fbcs[0].is_periodic(1)
    dt_ = us[0].dtype
    rows = []
    for b in range(2):
        _, offs = _signs_offs(grid, fbcs[b], False)
        d = jnp.asarray(0.0 if dias[b] is None else dias[b], dt_)
        rows.append(jnp.stack([d, jnp.asarray(0.0, dt_)]
                              + [jnp.asarray(o, dt_) for o in offs]))
    scal = jnp.stack(rows)
    dia_vec = scal[:, 0]
    h2 = grid.h * grid.h
    r0, _, _ = residual_restrict_pair(us, rhss, scal, h2=h2, signs=signs,
                                      periodic_y=per_y)
    n0, n1 = us[0].shape
    zrep = jnp.zeros((n0 // 2 + 2 * GP, n1), dt_)
    us = prolong_relax_pair([zrep, zrep], r0, dia_vec, us,
                            nsweeps=nsweeps, h2=h2, signs=signs,
                            periodic_y=per_y, omega=params.omega)
    stats = SolveStats(niter=jnp.asarray(1),
                       residual_before=norms(r0[0]),
                       residual_after=norms(r0[0]))
    return us, stats


def solve_fixed_batched(us, rhss, grid: Grid, fbcs,
                        params: MultilevelParams, dias, subs=None,
                        rr_pre=None):
    """ncycles fixed sawtooth cycles on the 2 independent scalar-dia
    systems of the U+V implicit-diffusion pair, in 3 PAIR launches per
    cycle — separate refs per system, zero host-side stacking copies
    (CLAUDE.md round-3 candidate (a)).  Caller must check
    batched_fixed_eligible.
    ``rr_pre``: precomputed (r0s, r1s, r2s) for the FIRST cycle (the
    advection pair kernel's rr fold, ops/pallas/bcg.advect2d_pair) —
    the first residual_restrict_pair launch is skipped; ``rhss`` may
    then be None when ncycles == 1."""
    from ..ops.pallas.rbgs import (residual_restrict_pair,
                                   cascade_prolong_relax_pair,
                                   prolong_relax_pair)

    assert len(us) == 2
    assert rr_pre is not None or rhss is not None
    if _pallas_relax_applicable(us[0], grid, fbcs[0], None, None, True):
        params = dataclasses.replace(
            params, nrelax=max(params.nrelax, params.tpu_nrelax),
            coarsest_relax=max(params.coarsest_relax,
                               2 * params.tpu_nrelax))
    signs, _ = _signs_offs(grid, fbcs[0], False)
    per_y = fbcs[0].is_periodic(1)
    dt_ = us[0].dtype
    rows = []
    for b in range(2):
        _, offs = _signs_offs(grid, fbcs[b], False)
        d = jnp.asarray(0.0 if dias[b] is None else dias[b], dt_)
        sb = jnp.asarray(0.0 if subs is None or subs[b] is None
                         else subs[b], dt_)
        rows.append(jnp.stack([d, sb] + [jnp.asarray(o, dt_)
                                         for o in offs]))
    scal = jnp.stack(rows)
    dia_vec = scal[:, 0]
    U = list(us)
    h2 = grid.h * grid.h
    r0 = None
    for ic in range(params.ncycles):
        if ic == 0 and rr_pre is not None:
            r0, r1, r2 = rr_pre
        else:
            r0, r1, r2 = residual_restrict_pair(
                U, rhss, scal, h2=h2, signs=signs, periodic_y=per_y)
        rep = cascade_prolong_relax_pair(
            r1, r2, dia_vec, nsweeps=params.nrelax,
            coarsest=max(params.coarsest_relax, 40),
            h2_half=4.0 * h2, signs=signs, per_y=per_y, min_n=16, omega=params.omega)
        U = prolong_relax_pair(rep, r0, dia_vec, U,
                               nsweeps=params.nrelax, h2=h2,
                               signs=signs, periodic_y=per_y,
                               omega=params.omega)
    stats = SolveStats(niter=jnp.asarray(params.ncycles),
                       residual_before=norms(r0[0]),
                       residual_after=norms(r0[0]))
    return U, stats


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
        u = correction(r, grid, fbc, params, alpha, dia, u_fine=u)
        r = residual(u, rhs, grid, fbc, alpha, dia, t=t)
        return u, r, i + 1

    u, r, niter = jax.lax.while_loop(cond, body, (u, r0, jnp.asarray(0)))
    return u, niter, r


def solve_cg(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
             params: MultilevelParams = MultilevelParams(), alpha=None,
             dia=None, t: float = 0.0):
    """Jacobi-preconditioned conjugate gradients on the same operator.

    The alternative backend behind the pluggable-solver seam — the
    reference swaps GfsMultilevelParams.poisson_solve for the hypre /
    lis / agmg module solvers the same way (src/poisson.h:32-51,
    modules/hypre.c).  Solves (L - d I) du = r0 for the correction with
    homogeneous BCs (-(L - d I) is SPD), iteration cap = 20x nitermax
    (a CG iteration is much cheaper than an MG cycle)."""
    r0 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    res_before = norms(r0)
    scale = jnp.maximum(jnp.max(jnp.abs(rhs)), 1e-300)
    tol = params.tolerance * scale

    dirichlet = any(b.kind == bcs.DIRICHLET for ax in fbc.sides for b in ax)

    def Aop(v):       # = -(L - d I) v with homogeneous BCs: SPD
        return residual(v, jnp.zeros_like(v), grid, fbc, alpha, dia,
                        homogeneous=True, t=t)

    # Jacobi preconditioner: diag(Aop) ~ (sum of face coefficients)/h^2 + d
    ones = jnp.ones_like(u)
    pad1 = jnp.pad(ones, [(1, 1)] * grid.dim)
    _, den = _neighbor_sums(pad1, alpha, grid.dim)
    d = 0.0 if dia is None else dia
    diag = jnp.maximum(den / (grid.h * grid.h) + d, 1e-30)

    b = -r0
    if not dirichlet:
        b = b - jnp.mean(b)

    z0 = b / diag
    state0 = (jnp.zeros_like(u), b, z0, z0, jnp.sum(b * z0), jnp.asarray(0))
    itmax = 20 * params.nitermax

    def cond(s):
        du, r, z, p, rz, i = s
        return (i < itmax) & (jnp.max(jnp.abs(r)) > tol)

    def body(s):
        du, r, z, p, rz, i = s
        Ap = Aop(p)
        denom = jnp.sum(p * Ap)
        a = rz / jnp.where(denom == 0, 1.0, denom)
        du = du + a * p
        r = r - a * Ap
        if not dirichlet:
            r = r - jnp.mean(r)
        z = r / diag
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        return du, r, z, z + beta * p, rz_new, i + 1

    du, r, _, _, _, niter = jax.lax.while_loop(cond, body, state0)
    u = u + du
    return u, SolveStats(niter=niter, residual_before=res_before,
                         residual_after=norms(-r))


def solve_relax(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid,
                fbc: bcs.FieldBC, params: MultilevelParams = None,
                alpha=None, dia=None, t: float = 0.0):
    """Fine-level-relaxation-only solve (no hierarchy): du-correction
    with ``nrelax`` homogeneous RBGS sweeps.  The right backend for
    strongly diagonally-dominant Helmholtz systems (the implicit
    diffusion solves: dia*h^2 = O(h/(dt*nu)) >> spectral radius), where
    the multigrid ladder buys nothing — the reference reaches the same
    regime through its tolerance check exiting after the first relax
    sweeps (gfs_diffusion, src/timestep.c:735)."""
    params = params or MultilevelParams()
    nsweeps = max(params.nrelax, 4)
    r0 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    res_before = norms(r0)
    du = jnp.zeros_like(u)
    du = relax(du, r0, grid, fbc, nsweeps, alpha, dia, homogeneous=True,
               omega=params.omega)
    u = u + du
    r1 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    return u, SolveStats(niter=jnp.asarray(1),
                         residual_before=res_before,
                         residual_after=norms(r1))


# the reference's pluggable-solver seam (par->poisson_solve): register
# additional backends under a name usable in MultilevelParams.solver
def solve_mgcg(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid,
               fbc: bcs.FieldBC,
               params: MultilevelParams = MultilevelParams(), alpha=None,
               dia=None, t: float = 0.0):
    """Multigrid-preconditioned flexible conjugate gradients — the
    AMG-class robust backend for stiff variable-coefficient systems
    (the role of the reference's hypre/lis/agmg module solvers,
    modules/hypre.c:766,1063; test/poisson res-7.ref columns 5-8 show
    the Krylov-wrapped hierarchy beating plain MG by orders of
    magnitude on hard alpha fields).  One V-cycle (``correction``) per
    preconditioner application; flexible (Polak-Ribiere) beta because
    red-black smoothing makes the V-cycle mildly nonsymmetric."""
    r0 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    res_before = norms(r0)
    scale = jnp.maximum(jnp.max(jnp.abs(rhs)), 1e-300)
    tol = params.tolerance * scale
    dirichlet = any(b.kind == bcs.DIRICHLET
                    for ax in fbc.sides for b in ax)

    def Aop(v):       # -(L - d I) v, homogeneous BCs: SPD
        return residual(v, jnp.zeros_like(v), grid, fbc, alpha, dia,
                        homogeneous=True, t=t)

    def prec(r):      # z ~ Aop^{-1} r = -(L - d I)^{-1} r via one V-cycle
        return -correction(r, grid, fbc, params, alpha=alpha, dia=dia)

    b = -r0
    if not dirichlet:
        b = b - jnp.mean(b)
    z0 = prec(b)
    state0 = (jnp.zeros_like(u), b, z0, z0, jnp.sum(b * z0),
              jnp.asarray(0))
    itmax = params.nitermax

    def cond(s):
        du, r, z, p, rz, i = s
        return (i < itmax) & (jnp.max(jnp.abs(r)) > tol)

    def body(s):
        du, r, z, p, rz, i = s
        Ap = Aop(p)
        denom = jnp.sum(p * Ap)
        a = rz / jnp.where(denom == 0, 1.0, denom)
        du = du + a * p
        r_new = r - a * Ap
        if not dirichlet:
            r_new = r_new - jnp.mean(r_new)
        z_new = prec(r_new)
        # flexible beta: z.(r_new - r) instead of z.r_new
        rz_new = jnp.sum(r_new * z_new)
        beta = jnp.sum((r_new - r) * z_new) / jnp.where(rz == 0, 1.0, rz)
        beta = jnp.maximum(beta, 0.0)
        return du, r_new, z_new, z_new + beta * p, rz_new, i + 1

    du, r, _, _, _, niter = jax.lax.while_loop(cond, body, state0)
    u = u + du
    return u, SolveStats(niter=niter, residual_before=res_before,
                         residual_after=norms(-r))


SOLVER_REGISTRY = {"cg": solve_cg, "relax": solve_relax,
                   "mgcg": solve_mgcg}


def register_solver(name: str, fn):
    SOLVER_REGISTRY[name] = fn


def solve(u: jnp.ndarray, rhs: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
          params: MultilevelParams = MultilevelParams(), alpha=None, dia=None,
          t: float = 0.0, rhs_sub=None):
    """Iterate cycles until residual.infty <= tolerance * max(|rhs|) or
    nitermax, at least nitermin (reference: src/poisson.c:1225-1269
    gfs_poisson_solve; tolerance semantics relative to the projection dt
    scale there — here relative to the rhs infinity norm).  Routes to the
    registered backend when params.solver != 'multigrid'.

    ``rhs_sub``: optional scalar subtracted from rhs (the pure-Neumann
    compatibility mean) — folded into the fused residual kernel on the
    fixed-cycle TPU path instead of costing an elementwise launch.
    ``params.ncycles > 0``: fixed cycle schedule, no tolerance checks;
    stats report the residual entering the last cycle (the final
    residual is one reduction factor smaller)."""
    if params.ncycles > 0 and params.solver == "multigrid":
        if _pallas_relax_applicable(u, grid, fbc, alpha, dia, True):
            params = dataclasses.replace(
                params, nrelax=max(params.nrelax, params.tpu_nrelax),
                coarsest_relax=max(params.coarsest_relax,
                                   2 * params.tpu_nrelax))
        if _fused_cycle_eligible(u, grid, fbc, alpha, dia):
            sub = 0.0 if rhs_sub is None else rhs_sub
            r0 = None
            for _ in range(params.ncycles):
                u, r0 = fused_cycle(u, rhs, grid, fbc, params, dia, sub)
            return u, SolveStats(niter=jnp.asarray(params.ncycles),
                                 residual_before=norms(r0),
                                 residual_after=norms(r0))
        if rhs_sub is not None:
            rhs = rhs - rhs_sub
        r0 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
        for _ in range(params.ncycles):
            u = cycle_jit(u, rhs, grid, fbc, params, alpha, dia, t=t)
        return u, SolveStats(niter=jnp.asarray(params.ncycles),
                             residual_before=norms(r0),
                             residual_after=norms(residual_jit(
                                 u, rhs, grid, fbc, alpha, dia, t=t)))
    if rhs_sub is not None:
        rhs = rhs - rhs_sub
    if params.solver != "multigrid":
        return SOLVER_REGISTRY[params.solver](u, rhs, grid, fbc, params,
                                              alpha, dia, t)
    # TPU-first smoothing depth: on the fused-Pallas path extra sweeps
    # run inside one kernel launch, and launches dominate wall time on
    # the remote device (~0.27 ms fixed cost per kernel measured on the
    # 2048^2 bench — deeper smoothing cuts the cycle count at the same
    # tolerance for nearly free).  CPU/f64 accuracy-gate paths keep the
    # reference sweep counts.
    if _pallas_relax_applicable(u, grid, fbc, alpha, dia, True):
        params = dataclasses.replace(
            params, nrelax=max(params.nrelax, params.tpu_nrelax),
            coarsest_relax=max(params.coarsest_relax,
                               2 * params.tpu_nrelax))
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
        r1 = residual_jit(u, rhs, grid, fbc, alpha, dia, t=t)
    else:
        # the loop's last residual IS the final residual — no recompute
        u, niter, r1 = _solve_adaptive(u, rhs, grid, fbc, params, alpha,
                                       dia, jnp.asarray(t, u.dtype), r0, tol)
    return u, SolveStats(niter=niter, residual_before=res_before,
                         residual_after=norms(r1))
