"""Fused red-black Gauss-Seidel sweeps as a Pallas TPU kernel.

The multigrid smoother is the hottest kernel of the solver (reference:
relax2D src/poisson.c:532-557 invoked via pointer-chasing traversals; here
it is the dominant HBM-bandwidth consumer).  This kernel fuses ``nsweeps``
full RBGS sweeps into a single pass over HBM: each row-strip is DMA'd into
VMEM once with a halo of >= 2*nsweeps rows (rounded up to the 8-row sublane
alignment), swept in VMEM (the valid interior shrinks by 2 rows/sweep, so
the strip interior stays exact), and written back once — instead of ~4 HBM
round-trips per half-sweep for the jnp path (pad copy + neighbor reads +
masked write).

Supported (the multigrid hot path): 2D f32, homogeneous Dirichlet
(ghost = -u) or Neumann (ghost = +u) BCs, uniform unit coefficients with an
optional scalar ``dia`` (the Crank-Nicolson diffusion system).  Everything
else falls back to the jnp path (solvers/poisson.py relax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GP = 8    # row alignment pad (f32 sublane)
CP = 128  # column alignment pad (lane width; DMA destinations must align)


def _kernel(u_hbm, rhs_hbm, dia_ref, out_ref, ub, rb, sem, *, n0, n1, S, H,
            nsweeps, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
            omega):
    s = pl.program_id(0)
    # multiple_of: S, H, n0 are all multiples of the 8-row sublane, and
    # Mosaic needs the hint to accept the dynamic offsets (it cannot prove
    # it through the clip)
    start = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - (S + 2 * H)), GP)
    W = S + 2 * H

    cp_u = pltpu.make_async_copy(
        u_hbm.at[pl.ds(start, W), :], ub.at[pl.ds(GP, W), pl.ds(CP, n1)],
        sem.at[0])
    cp_r = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, W), :], rb.at[pl.ds(0, W), :], sem.at[1])
    cp_u.start()
    cp_r.start()
    cp_u.wait()
    cp_r.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 0) + start
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 1)
    red = ((rows + cols) % 2) == 0
    first = start == 0
    last = start + W == n0
    denom = 4.0 + dia_ref[0, 0] * h2
    lo, hi = GP, GP + W  # interior rows of the buffer

    cl, ch = CP, CP + n1  # interior columns of the buffer
    for _ in range(nsweeps):
        for color in (red, ~red):
            # ghost columns (domain y boundaries)
            ub[:, cl - 1:cl] = sgn_y_lo * ub[:, cl:cl + 1]
            ub[:, ch:ch + 1] = sgn_y_hi * ub[:, ch - 1:ch]
            # ghost rows: only meaningful at the domain edges; harmless
            # elsewhere (halo shrink keeps the strip interior exact)
            ub[lo - 1:lo, :] = jnp.where(first, sgn_x_lo, 1.0) * ub[lo:lo + 1, :]
            ub[hi:hi + 1, :] = jnp.where(last, sgn_x_hi, 1.0) * ub[hi - 1:hi, :]
            c = ub[lo:hi, cl:ch]
            nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
                  ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
            new = (nb - h2 * rb[pl.ds(0, W), :]) / denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color, new, c)

    off = pl.multiple_of(s * S - start, GP)  # in {0, H, 2H}
    out_ref[:, :] = ub[pl.ds(GP + off, S), cl:ch]


def _residual_kernel(u_hbm, rhs_hbm, dia_ref, out_ref, ub, rb, sem, *, n0,
                     n1, S, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi):
    """r = rhs - (sum(neighbors) - 4 u)/h2 + dia*u, one strip pass.
    Reference: residual_set2D src/poisson.c:657."""
    s = pl.program_id(0)
    start = pl.multiple_of(s * S, GP)
    W = S

    cp_u = pltpu.make_async_copy(
        u_hbm.at[pl.ds(start, W), :], ub.at[pl.ds(GP, W), pl.ds(CP, n1)],
        sem.at[0])
    cp_r = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, W), :], rb.at[pl.ds(0, W), :], sem.at[1])
    cp_u.start()
    cp_r.start()
    cp_u.wait()
    cp_r.wait()
    # halo rows (one each side) from HBM, or BC ghosts at domain edges
    first = start == 0
    last = start + W == n0
    lo, hi = GP, GP + W
    cl, ch = CP, CP + n1

    @pl.when(jnp.logical_not(first))
    def _():
        cp = pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(start - GP, GP), GP), :],
            ub.at[pl.ds(0, GP), pl.ds(CP, n1)], sem.at[0])
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_not(last))
    def _():
        cp = pltpu.make_async_copy(
            u_hbm.at[pl.ds(start + W, GP), :],
            ub.at[pl.ds(GP + W, GP), pl.ds(CP, n1)], sem.at[1])
        cp.start()
        cp.wait()

    ub[:, cl - 1:cl] = sgn_y_lo * ub[:, cl:cl + 1]
    ub[:, ch:ch + 1] = sgn_y_hi * ub[:, ch - 1:ch]

    @pl.when(first)
    def _():
        ub[lo - 1:lo, :] = sgn_x_lo * ub[lo:lo + 1, :]

    @pl.when(last)
    def _():
        ub[hi:hi + 1, :] = sgn_x_hi * ub[hi - 1:hi, :]

    c = ub[lo:hi, cl:ch]
    nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
          ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
    out_ref[:, :] = rb[pl.ds(0, W), :] - (nb - 4.0 * c) / h2 + dia_ref[0, 0] * c


@functools.partial(jax.jit, static_argnames=("S", "signs", "h2"))
def residual_pallas(u: jnp.ndarray, rhs: jnp.ndarray, dia=0.0, *, h2: float,
                    signs=(-1.0, -1.0, -1.0, -1.0), S: int = 256):
    n0, n1 = u.shape
    if n0 % S:
        S = n0
    nstrips = n0 // S
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _residual_kernel, n0=n0, n1=n1, S=S, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi)
    dia_arr = jnp.asarray(dia, u.dtype).reshape(1, 1)
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((GP + S + GP, CP + n1 + CP), u.dtype),
            pltpu.VMEM((S, n1), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(u, rhs, dia_arr)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "signs", "omega", "h2"))
def rbgs_relax(u: jnp.ndarray, rhs: jnp.ndarray, dia=0.0, *, nsweeps: int,
               h2: float, signs=(-1.0, -1.0, -1.0, -1.0),
               omega: float = 1.0, S: int = 64):
    """nsweeps of RBGS on the 5-point Laplacian + scalar dia term, with
    homogeneous BCs.  ``dia`` is a runtime scalar (it carries the traced
    1/(beta dt D) coefficient of the diffusion system, so it must NOT be a
    compile-time constant).

    signs = (x_lo, x_hi, y_lo, y_hi) ghost multipliers (-1 Dirichlet,
    +1 Neumann)."""
    n0, n1 = u.shape
    H = -(-2 * nsweeps // GP) * GP   # halo rounded to the sublane multiple
    if n0 % S or n0 <= S + 2 * H:
        # small levels: one strip covers everything, no halo needed
        S, H = n0, 0
    nstrips = n0 // S
    W = S + 2 * H
    sx_lo, sx_hi, sy_lo, sy_hi = signs

    kern = functools.partial(
        _kernel, n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        omega=omega)
    dia_arr = jnp.asarray(dia, u.dtype).reshape(1, 1)
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((GP + W + GP, CP + n1 + CP), u.dtype),
            pltpu.VMEM((W, n1), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(u, rhs, dia_arr)
