"""Fused red-black Gauss-Seidel sweeps as a Pallas TPU kernel.

The multigrid smoother is the hottest kernel of the solver (reference:
relax2D src/poisson.c:532-557 invoked via pointer-chasing traversals; here
it is the dominant HBM-bandwidth consumer).  This kernel fuses ``nsweeps``
full RBGS sweeps into a single pass over HBM: each row-strip is DMA'd into
VMEM once with a halo of >= 2*nsweeps rows (rounded up to the 8-row
sublane alignment), swept in VMEM (the valid interior shrinks by 2 rows
per sweep, so the strip interior stays exact), and written back once —
instead of ~4 HBM round-trips per half-sweep for the jnp path.

Round-2 extensions (the two-phase / periodic hot paths, VERDICT r1):
* periodic BCs per axis — wrapped halo DMAs (rows) / wrapped columns;
* per-face coefficient arrays ``alpha`` (variable-density projections,
  gfs_poisson_coefficients src/poisson.c:756-901) and per-cell ``dia``
  (the rho coefficient of the implicit diffusion system,
  src/poisson.c:1280-1399), in rbgs_relax_alpha.

Everything else falls back to the jnp path (solvers/poisson.py relax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GP = 8    # row alignment pad (f32 sublane)
CP = 128  # column alignment pad (lane width; DMA destinations must align)


def _copy_rows(src, dst, dst_row0, start, nrows, n_mod, sem):
    """DMA ``nrows`` rows of ``src`` starting at global row ``start``
    (taken modulo ``n_mod``) into ``dst`` at (dst_row0, CP).  The window
    never straddles the wrap boundary in our usage (offsets and counts are
    strip/halo-aligned)."""
    s = jnp.where(start < 0, start + n_mod, start)
    s = jnp.where(s + nrows > n_mod, s - n_mod, s)
    s = pl.multiple_of(s, GP)
    cp = pltpu.make_async_copy(
        src.at[pl.ds(s, nrows), :],
        dst.at[pl.ds(dst_row0, nrows), pl.ds(CP, src.shape[1])], sem)
    cp.start()
    cp.wait()


def _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi,
              off_y_lo=0.0, off_y_hi=0.0):
    """Ghost columns: domain y boundaries (wrap or sgn*mirror+off)."""
    if periodic_y:
        ub[:, cl - 1:cl] = ub[:, ch - 1:ch]
        ub[:, ch:ch + 1] = ub[:, cl:cl + 1]
    else:
        ub[:, cl - 1:cl] = sgn_y_lo * ub[:, cl:cl + 1] + off_y_lo
        ub[:, ch:ch + 1] = sgn_y_hi * ub[:, ch - 1:ch] + off_y_hi


def _ghosts_x(ub, lo, hi, first, last, periodic_x, single_strip,
              sgn_x_lo, sgn_x_hi, off_x_lo=0.0, off_x_hi=0.0):
    """Ghost rows.  Non-periodic: reflect at the domain edges (harmless
    elsewhere — halo shrink keeps the strip interior exact).  Periodic
    with wrapped halos: nothing to do; periodic single-strip: wrap in
    VMEM."""
    if periodic_x:
        if single_strip:
            ub[lo - 1:lo, :] = ub[hi - 1:hi, :]
            ub[hi:hi + 1, :] = ub[lo:lo + 1, :]
        return
    ub[lo - 1:lo, :] = jnp.where(first, sgn_x_lo, 1.0) * ub[lo:lo + 1, :] \
        + jnp.where(first, off_x_lo, 0.0)
    ub[hi:hi + 1, :] = jnp.where(last, sgn_x_hi, 1.0) * ub[hi - 1:hi, :] \
        + jnp.where(last, off_x_hi, 0.0)


def _kernel(u_hbm, rhs_hbm, dia_ref, out_ref, ub, rb, sem, *, n0, n1, S, H,
            nsweeps, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
            periodic_x, periodic_y, omega):
    s = pl.program_id(0)
    W = S + 2 * H
    if periodic_x and H > 0:
        start = pl.multiple_of(s * S, GP)
        rstart = start - H
        _copy_rows(u_hbm, ub, GP, rstart, H, n0, sem.at[0])
        _copy_rows(u_hbm, ub, GP + H, start, S, n0, sem.at[0])
        _copy_rows(u_hbm, ub, GP + H + S, start + S, H, n0, sem.at[0])
        _copy_rows(rhs_hbm, rb, 0, rstart, H, n0, sem.at[1])
        _copy_rows(rhs_hbm, rb, H, start, S, n0, sem.at[1])
        _copy_rows(rhs_hbm, rb, H + S, start + S, H, n0, sem.at[1])
    else:
        rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
        _copy_rows(u_hbm, ub, GP, rstart, W, n0, sem.at[0])
        _copy_rows(rhs_hbm, rb, 0, rstart, W, n0, sem.at[1])

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 0) + rstart
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 1)
    red = ((rows + cols) % 2) == 0
    first = rstart == 0
    last = rstart + W == n0
    denom = 4.0 + dia_ref[0, 0] * h2
    inv_denom = 1.0 / denom
    lo, hi = GP, GP + W      # interior rows of the u buffer
    cl, ch = CP, CP + n1     # interior columns
    for _ in range(nsweeps):
        for color in (red, ~red):
            _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi)
            _ghosts_x(ub, lo, hi, first, last, periodic_x, H == 0,
                      sgn_x_lo, sgn_x_hi)
            c = ub[lo:hi, cl:ch]
            nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
                  ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
            new = (nb - h2 * rb[pl.ds(0, W), cl:ch]) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color, new, c)

    off = pl.multiple_of(s * S - rstart, GP)  # in {0, H, 2H}
    out_ref[:, :] = ub[pl.ds(GP + off, S), cl:ch]


def _kernel_alpha(u_hbm, rhs_hbm, ax_hbm, ay_hbm, dia_hbm, out_ref,
                  ub, rb, axb, ayb, db, sem, *, n0, n1, S, H, nsweeps, h2,
                  sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                  periodic_x, periodic_y, omega, dia_cell):
    """Variable-coefficient fused RBGS: div(alpha grad u) - dia u (the
    two-phase projection / diffusion smoother; relax src/poisson.c:507).

    Face-coefficient windows: cell row r needs x-faces r and r+1 — the ax
    buffer holds faces rstart..rstart+W; under x-periodicity face k is
    face k mod n0 (face n0 == face 0)."""
    s = pl.program_id(0)
    W = S + 2 * H
    if periodic_x and H > 0:
        start = pl.multiple_of(s * S, GP)
        rstart = start - H
        _copy_rows(u_hbm, ub, GP, rstart, H, n0, sem.at[0])
        _copy_rows(u_hbm, ub, GP + H, start, S, n0, sem.at[0])
        _copy_rows(u_hbm, ub, GP + H + S, start + S, H, n0, sem.at[0])
        _copy_rows(rhs_hbm, rb, 0, rstart, H, n0, sem.at[1])
        _copy_rows(rhs_hbm, rb, H, start, S, n0, sem.at[1])
        _copy_rows(rhs_hbm, rb, H + S, start + S, H, n0, sem.at[1])
        _copy_rows(ax_hbm, axb, 0, rstart, H, n0, sem.at[2])
        _copy_rows(ax_hbm, axb, H, start, S, n0, sem.at[2])
        _copy_rows(ax_hbm, axb, H + S, start + S, H + 1, n0, sem.at[2])
        _copy_rows(ay_hbm, ayb, 0, rstart, H, n0, sem.at[3])
        _copy_rows(ay_hbm, ayb, H, start, S, n0, sem.at[3])
        _copy_rows(ay_hbm, ayb, H + S, start + S, H, n0, sem.at[3])
        if dia_cell:
            _copy_rows(dia_hbm, db, 0, rstart, H, n0, sem.at[0])
            _copy_rows(dia_hbm, db, H, start, S, n0, sem.at[0])
            _copy_rows(dia_hbm, db, H + S, start + S, H, n0, sem.at[0])
    else:
        rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
        _copy_rows(u_hbm, ub, GP, rstart, W, n0, sem.at[0])
        _copy_rows(rhs_hbm, rb, 0, rstart, W, n0, sem.at[1])
        _copy_rows(ax_hbm, axb, 0, rstart, W + 1, n0 + 1, sem.at[2])
        _copy_rows(ay_hbm, ayb, 0, rstart, W, n0, sem.at[3])
        if dia_cell:
            _copy_rows(dia_hbm, db, 0, rstart, W, n0, sem.at[0])

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 0) + rstart
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 1)
    red = ((rows + cols) % 2) == 0
    first = rstart == 0
    last = rstart + W == n0
    lo, hi = GP, GP + W
    cl, ch = CP, CP + n1
    ax_lo = axb[pl.ds(0, W), cl:ch]
    ax_hi = axb[pl.ds(1, W), cl:ch]
    ay_lo = ayb[pl.ds(0, W), cl:ch]
    ay_hi = ayb[pl.ds(0, W), cl + 1:ch + 1]
    dia = db[pl.ds(0, W), cl:ch] if dia_cell else dia_hbm[0, 0]
    den0 = ax_lo + ax_hi + ay_lo + ay_hi + dia * h2
    den = jnp.maximum(den0, 1e-30)
    # zero-diagonal (fully-solid/disconnected) cells stay untouched
    live = den0 > 1e-20
    for _ in range(nsweeps):
        for color in (red, ~red):
            _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi)
            _ghosts_x(ub, lo, hi, first, last, periodic_x, H == 0,
                      sgn_x_lo, sgn_x_hi)
            c = ub[lo:hi, cl:ch]
            num = (ax_lo * ub[lo - 1:hi - 1, cl:ch] +
                   ax_hi * ub[lo + 1:hi + 1, cl:ch] +
                   ay_lo * ub[lo:hi, cl - 1:ch - 1] +
                   ay_hi * ub[lo:hi, cl + 1:ch + 1])
            new = (num - h2 * rb[pl.ds(0, W), cl:ch]) / den
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color & live, new, c)

    off = pl.multiple_of(s * S - rstart, GP)
    out_ref[:, :] = ub[pl.ds(GP + off, S), cl:ch]


def _residual_kernel(u_hbm, rhs_hbm, dia_ref, out_ref, ub, rb, sem, *, n0,
                     n1, S, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                     periodic_x, periodic_y,
                     off_x_lo=0.0, off_x_hi=0.0,
                     off_y_lo=0.0, off_y_hi=0.0):
    """r = rhs - (sum(neighbors) - 4 u)/h2 + dia*u, one strip pass.
    Reference: residual_set2D src/poisson.c:657."""
    s = pl.program_id(0)
    start = pl.multiple_of(s * S, GP)
    W = S
    _copy_rows(u_hbm, ub, GP, start, W, n0, sem.at[0])
    cp_r = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, W), :], rb.at[pl.ds(0, W), :], sem.at[1])
    cp_r.start()
    cp_r.wait()
    first = start == 0
    last = start + W == n0
    lo, hi = GP, GP + W
    cl, ch = CP, CP + n1

    # halo rows (one GP-block each side) from HBM — wrapped when periodic
    @pl.when(jnp.logical_not(first) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, 0, start - GP, GP, n0, sem.at[0])

    @pl.when(jnp.logical_not(last) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, GP + W, start + W, GP, n0, sem.at[1])

    _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi,
              off_y_lo, off_y_hi)

    if not periodic_x:
        @pl.when(first)
        def _():
            ub[lo - 1:lo, :] = sgn_x_lo * ub[lo:lo + 1, :] + off_x_lo

        @pl.when(last)
        def _():
            ub[hi:hi + 1, :] = sgn_x_hi * ub[hi - 1:hi, :] + off_x_hi

    c = ub[lo:hi, cl:ch]
    nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
          ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
    out_ref[:, :] = rb[pl.ds(0, W), :] - (nb - 4.0 * c) / h2 \
        + dia_ref[0, 0] * c


@functools.partial(jax.jit, static_argnames=("S", "signs", "offs", "h2",
                                             "periodic", "interpret"))
def residual_pallas(u: jnp.ndarray, rhs: jnp.ndarray, dia=0.0, *, h2: float,
                    signs=(-1.0, -1.0, -1.0, -1.0),
                    offs=(0.0, 0.0, 0.0, 0.0),
                    periodic=(False, False), S: int = 256,
                    interpret: bool = False):
    n0, n1 = u.shape
    if n0 % S:
        S = n0
    nstrips = n0 // S
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _residual_kernel, n0=n0, n1=n1, S=S, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_x=periodic[0], periodic_y=periodic[1],
        off_x_lo=offs[0], off_x_hi=offs[1],
        off_y_lo=offs[2], off_y_hi=offs[3])
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
        interpret=interpret,
    )(u, rhs, dia_arr)


def _prolong_relax_kernel(rep_hbm, rhs_hbm, dia_ref, u_hbm, out_ref,
                          ub, rb, fb, sem, *, n0, n1, S, H, nsweeps, h2,
                          sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                          periodic_y, omega, add_u, batched=False):
    """Fused coarse->fine correction: bilinear prolongation of the
    lane-doubled coarse array ``rep`` + ``nsweeps`` RBGS sweeps on the
    fine level (+ optional u += du) in ONE launch (reference:
    get_from_above + relax_loop, src/poisson.c:1005-1042,1141-1167 —
    fused because kernel launches dominate on the remote TPU).

    ``rep``: coarse du with lanes doubled (jnp.repeat(.., 2, axis=1))
    and GP rows of zero padding top+bottom, so the coarse-row DMA window
    [rstart/2 - GP, rstart/2 + W/2 + GP) is always in range; rstart is
    kept a multiple of 2*GP so the halved row start stays GP-aligned.
    Homogeneous BCs only (the correction phase).  Non-periodic rows."""
    if batched:
        b = pl.program_id(0)
        s = pl.program_id(1)
        rep_hbm = rep_hbm.at[b]
        rhs_hbm = rhs_hbm.at[b]
        u_hbm = u_hbm.at[b]
        dia = dia_ref[b, 0]
    else:
        s = pl.program_id(0)
        dia = dia_ref[0, 0]
    _pr_core(s, rep_hbm, rhs_hbm, u_hbm, dia, out_ref, ub, rb, fb, sem,
             n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps, h2=h2,
             sgn_x_lo=sgn_x_lo, sgn_x_hi=sgn_x_hi, sgn_y_lo=sgn_y_lo,
             sgn_y_hi=sgn_y_hi, periodic_y=periodic_y, omega=omega,
             add_u=add_u, out3d=batched)


def _pr_core(s, rep_hbm, rhs_hbm, u_hbm, dia, out_ref, ub, rb, fb, sem,
             *, n0, n1, S, H, nsweeps, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo,
             sgn_y_hi, periodic_y, omega, add_u, out3d):
    W = S + 2 * H
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), 2 * GP)
    cstart = pl.multiple_of(rstart // 2, GP)

    # DMAs: coarse rep rows (with GP halo from the padded source), rhs
    cp1 = pltpu.make_async_copy(
        rep_hbm.at[pl.ds(cstart, W // 2 + 2 * GP), :],
        ub.at[pl.ds(0, W // 2 + 2 * GP), pl.ds(CP, rep_hbm.shape[1])],
        sem.at[0])
    cp1.start()
    cp2 = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(rstart, W), :],
        rb.at[pl.ds(0, W), pl.ds(CP, rhs_hbm.shape[1])], sem.at[1])
    cp2.start()
    if add_u:
        start_u = pl.multiple_of(s * S, GP)
        cp3 = pltpu.make_async_copy(
            u_hbm.at[pl.ds(start_u, S), :],
            fb.at[pl.ds(0, S), pl.ds(CP, u_hbm.shape[1])], sem.at[2])
        cp3.start()
    cp1.wait()
    cp2.wait()

    cl, ch = CP, CP + n1
    first = rstart == 0
    last = rstart + W == n0

    # ---- prolongation into du rows rstart..rstart+W
    # coarse block rows: ub row i = coarse row cstart - GP + i (the rep
    # source is GP-padded, so row GP + k = coarse row cstart + k)
    C = ub[GP - 1:GP + W // 2 + 1, cl:ch]    # coarse rows -1..W/2
    RR = jnp.repeat(C, 2, axis=0)            # rows -2..W+1 (fine idx)
    # rows step: fine row r: base C[r//2]; neighbor C[r//2 -/+ 1]
    base_r = RR[2:W + 2, :]
    nb_up = RR[1:W + 1, :]                   # roll +1 equivalent
    nb_dn = RR[3:W + 3, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 0) + rstart
    even_r = (rows % 2) == 0
    nb_r = jnp.where(even_r, nb_up, nb_dn)
    # homogeneous domain-edge ghosts (sign * base)
    nb_r = jnp.where(rows == 0, sgn_x_lo * base_r,
                     jnp.where(rows == n0 - 1, sgn_x_hi * base_r, nb_r))
    A1 = 0.75 * base_r + 0.25 * nb_r
    # lanes step (rep already lane-doubled): neighbor via lane rolls
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 1)
    even_c = (cols % 2) == 0
    nb_c = jnp.where(even_c, jnp.roll(A1, 1, 1), jnp.roll(A1, -1, 1))
    if periodic_y:
        pass                                  # wrap is correct
    else:
        nb_c = jnp.where(cols == 0, sgn_y_lo * A1,
                         jnp.where(cols == n1 - 1, sgn_y_hi * A1, nb_c))
    du = 0.75 * A1 + 0.25 * nb_c

    # ---- place du into the sweep buffer and relax
    ub[GP:GP + W, cl:ch] = du
    red = ((rows + cols) % 2) == 0
    denom = 4.0 + dia * h2
    inv_denom = 1.0 / denom
    lo, hi = GP, GP + W
    for _ in range(nsweeps):
        for color in (red, ~red):
            _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi)
            _ghosts_x(ub, lo, hi, first, last, False, H == 0,
                      sgn_x_lo, sgn_x_hi)
            c = ub[lo:hi, cl:ch]
            nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
                  ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
            new = (nb - h2 * rb[pl.ds(0, W), cl:ch]) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color, new, c)

    off = pl.multiple_of(s * S - rstart, GP)
    res = ub[pl.ds(GP + off, S), cl:ch]
    if add_u:
        cp3.wait()
        res = res + fb[pl.ds(0, S), cl:ch]
    if out3d:
        out_ref[0, :, :] = res
    else:
        out_ref[:, :] = res


def _prolong_relax_kernel_pair(rep0, rhs0, u0, rep1, rhs1, u1, dia_ref,
                               o0, o1, ub, rb, fb, sem, *,
                               n0, n1, S, H, nsweeps, h2,
                               sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                               periodic_y, omega):
    """prolong_relax (pre_rep + add_u) for both pair systems per strip
    iteration — separate refs, zero stacking copies."""
    s = pl.program_id(0)
    for b, (rp, rh, uh, o) in enumerate(((rep0, rhs0, u0, o0),
                                         (rep1, rhs1, u1, o1))):
        _pr_core(s, rp, rh, uh, dia_ref[b, 0], o, ub, rb, fb, sem,
                 n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps, h2=h2,
                 sgn_x_lo=sgn_x_lo, sgn_x_hi=sgn_x_hi,
                 sgn_y_lo=sgn_y_lo, sgn_y_hi=sgn_y_hi,
                 periodic_y=periodic_y, omega=omega, add_u=True,
                 out3d=False)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "signs", "omega", "h2", "periodic_y", "interpret"))
def prolong_relax_pair(reps, rhss, dia, us, *, nsweeps: int, h2: float,
                       signs=(-1.0, -1.0, -1.0, -1.0), periodic_y=False,
                       omega: float = 1.0, S: int = 256,
                       interpret: bool = False):
    """Pair prolong_relax with pre_rep + add_u: reps (n0/2+2GP, n1)
    each; dia (2,) array.  Returns [u0', u1']."""
    n0, n1 = rhss[0].shape
    H = -(-2 * nsweeps // (2 * GP)) * (2 * GP)
    if n0 % S or n0 < S + 2 * H or (n0 // S) < 2:
        S = n0
        H = 0
    W = S + 2 * H
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _prolong_relax_kernel_pair, n0=n0, n1=n1, S=S, H=H,
        nsweeps=nsweeps, h2=h2, sgn_x_lo=sx_lo, sgn_x_hi=sx_hi,
        sgn_y_lo=sy_lo, sgn_y_hi=sy_hi, periodic_y=periodic_y,
        omega=omega)
    dia_arr = jnp.asarray(dia, rhss[0].dtype).reshape(2, 1)
    buf_rows = max(W + 2 * GP, W // 2 + 2 * GP)
    bs = pl.BlockSpec((S, n1), lambda s: (s, 0),
                      memory_space=pltpu.VMEM)
    o0, o1 = pl.pallas_call(
        kern,
        grid=(n0 // S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6 +
                 [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bs, bs),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), rhss[0].dtype),
                   jax.ShapeDtypeStruct((n0, n1), rhss[0].dtype)),
        scratch_shapes=[
            pltpu.VMEM((buf_rows, CP + n1 + CP), rhss[0].dtype),
            pltpu.VMEM((W, CP + n1 + CP), rhss[0].dtype),
            pltpu.VMEM((S, CP + n1 + CP), rhss[0].dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        # large-strip variants (S=256) exceed the 16M default scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(reps[0], rhss[0], us[0], reps[1], rhss[1], us[1], dia_arr)
    return [o0, o1]


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "signs", "omega", "h2", "periodic_y", "add_u",
    "pre_rep", "interpret"))
def prolong_relax(du_c, rhs, dia=0.0, u=None, *, nsweeps: int, h2: float,
                  signs=(-1.0, -1.0, -1.0, -1.0), periodic_y=False,
                  omega: float = 1.0, add_u: bool = False,
                  S: int = 256,
                  pre_rep: bool = False, interpret: bool = False):
    """One-launch prolong(du_c) -> relax(nsweeps) [-> + u] on the fine
    level.  du_c: (n0/2, n1/2) coarse correction; rhs: (n0, n1) fine
    residual; u: fine solution when ``add_u``.  Homogeneous static BCs,
    non-periodic rows (the correction-phase hot path).
    ``pre_rep``: du_c is already in rep layout (lane-doubled +
    GP-row-padded, shape (n0/2 + 2*GP, n1), e.g. from
    cascade_prolong_relax) — skips the host-side repeat/pad kernels."""
    n0, n1 = rhs.shape
    H = -(-2 * nsweeps // (2 * GP)) * (2 * GP)   # keep rstart 16-aligned
    if n0 % S or n0 < S + 2 * H or (n0 // S) < 2:
        S = n0
        H = 0
    W = S + 2 * H
    nstrips = n0 // S
    rep = du_c if pre_rep else \
        jnp.pad(jnp.repeat(du_c, 2, axis=1), ((GP, GP), (0, 0)))
    dia_arr = jnp.asarray(dia, rhs.dtype).reshape(1, 1)
    u_in = u if add_u else jnp.zeros((GP, n1), rhs.dtype)
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _prolong_relax_kernel, n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps,
        h2=h2, sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo,
        sgn_y_hi=sy_hi, periodic_y=periodic_y, omega=omega, add_u=add_u)
    buf_rows = max(W + 2 * GP, W // 2 + 2 * GP)
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), rhs.dtype),
        scratch_shapes=[
            pltpu.VMEM((buf_rows, CP + n1 + CP), rhs.dtype),   # ub
            pltpu.VMEM((W, CP + n1 + CP), rhs.dtype),          # rhs
            pltpu.VMEM((S if add_u else GP, CP + n1 + CP),
                       rhs.dtype),                             # u
            pltpu.SemaphoreType.DMA((3,)),
        ],
        # S=256 strips exceed the 16M default scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(rep, rhs, dia_arr, u_in)


def _pr_correct_kernel(scal_ref, rep_hbm, rhs_hbm, u_hbm, ux_hbm, uy_hbm,
                       uc_hbm, vc_hbm,
                       op, oux, ouy, ogx, ogy, ouc, ovc,
                       ub, rb, fb, uxb, uyb, ucb, vcb, sem, *,
                       n0, n1, n1p, S, H, nstrips, nsweeps, h2,
                       sgn, off, periodic_y, omega, with_cells):
    """prolong_relax (pre_rep + add_u) with the projection-correction
    epilogue fused in: after the fine-level sweeps the strip already
    holds p' = u + du in VMEM, so the face gradients of p', the MAC
    correction uf -= dt grad_f p', the cell gradient and (optionally)
    the centred correction are emitted from the SAME launch — the
    separate correct_project launch (ops/pallas/projops.py) disappears
    (round-4 lever (b); reference: the gfs_mac_projection +
    correct_normal_velocity + gfs_correct_centered_velocities chain,
    src/timestep.c:356-530).

    The wrapper bumps the halo to H >= 2*nsweeps + 1 so the ghost row
    p'[core-1] used by the boundary face gradient is still uncontaminated
    by the strip-edge sweeps.  The prolong+sweep section mirrors
    _pr_core (kept duplicated: _pr_core feeds the cached production
    programs and must stay byte-identical)."""
    from .projops import _ghost_rows_cols
    s = pl.program_id(0)
    W = S + 2 * H
    dia = scal_ref[0, 0]
    dt_h = scal_ref[0, 1]                 # dt / h
    ih = scal_ref[0, 2]                   # 1 / h
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), 2 * GP)
    cstart = pl.multiple_of(rstart // 2, GP)

    cp1 = pltpu.make_async_copy(
        rep_hbm.at[pl.ds(cstart, W // 2 + 2 * GP), :],
        ub.at[pl.ds(0, W // 2 + 2 * GP), pl.ds(CP, rep_hbm.shape[1])],
        sem.at[0])
    cp1.start()
    cp2 = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(rstart, W), :],
        rb.at[pl.ds(0, W), pl.ds(CP, rhs_hbm.shape[1])], sem.at[1])
    cp2.start()
    cp3 = pltpu.make_async_copy(
        u_hbm.at[pl.ds(rstart, W), :],
        fb.at[pl.ds(0, W), pl.ds(CP, u_hbm.shape[1])], sem.at[2])
    cp3.start()
    cp4 = pltpu.make_async_copy(
        ux_hbm.at[pl.ds(rstart, W + 2 * GP), :],
        uxb.at[pl.ds(0, W + 2 * GP), pl.ds(CP, ux_hbm.shape[1])],
        sem.at[3])
    cp4.start()
    cp5 = pltpu.make_async_copy(
        uy_hbm.at[pl.ds(rstart, W), :],
        uyb.at[pl.ds(0, W), pl.ds(CP, uy_hbm.shape[1])], sem.at[4])
    cp5.start()
    if with_cells:
        start_u = pl.multiple_of(s * S, GP)
        cp6 = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(start_u, S), :],
            ucb.at[pl.ds(0, S), pl.ds(CP, uc_hbm.shape[1])], sem.at[5])
        cp6.start()
        cp7 = pltpu.make_async_copy(
            vc_hbm.at[pl.ds(start_u, S), :],
            vcb.at[pl.ds(0, S), pl.ds(CP, vc_hbm.shape[1])], sem.at[6])
        cp7.start()
    cp1.wait()
    cp2.wait()

    cl, ch = CP, CP + n1
    first = rstart == 0
    last = rstart + W == n0
    sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi = sgn

    # ---- prolongation (as _pr_core)
    C = ub[GP - 1:GP + W // 2 + 1, cl:ch]
    RR = jnp.repeat(C, 2, axis=0)
    base_r = RR[2:W + 2, :]
    nb_up = RR[1:W + 1, :]
    nb_dn = RR[3:W + 3, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 0) + rstart
    even_r = (rows % 2) == 0
    nb_r = jnp.where(even_r, nb_up, nb_dn)
    nb_r = jnp.where(rows == 0, sgn_x_lo * base_r,
                     jnp.where(rows == n0 - 1, sgn_x_hi * base_r, nb_r))
    A1 = 0.75 * base_r + 0.25 * nb_r
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1), 1)
    even_c = (cols % 2) == 0
    nb_c = jnp.where(even_c, jnp.roll(A1, 1, 1), jnp.roll(A1, -1, 1))
    if not periodic_y:
        nb_c = jnp.where(cols == 0, sgn_y_lo * A1,
                         jnp.where(cols == n1 - 1, sgn_y_hi * A1, nb_c))
    du = 0.75 * A1 + 0.25 * nb_c

    # ---- sweeps (as _pr_core; homogeneous ghosts for du)
    ub[GP:GP + W, cl:ch] = du
    red = ((rows + cols) % 2) == 0
    denom = 4.0 + dia * h2
    inv_denom = 1.0 / denom
    lo, hi = GP, GP + W
    for _ in range(nsweeps):
        for color in (red, ~red):
            _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi)
            _ghosts_x(ub, lo, hi, first, last, False, H == 0,
                      sgn_x_lo, sgn_x_hi)
            c = ub[lo:hi, cl:ch]
            nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
                  ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
            new = (nb - h2 * rb[pl.ds(0, W), cl:ch]) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color, new, c)

    # ---- p' = u + du over the whole window (rb is free after the
    # sweeps; it becomes the p' buffer the ghost helper writes into)
    cp3.wait()
    cp4.wait()
    cp5.wait()
    if with_cells:
        cp6.wait()
        cp7.wait()
    rb[0:W, cl:ch] = ub[GP:GP + W, cl:ch] + fb[0:W, cl:ch]

    def body(soff: int, first: bool, last: bool):
        pe = _ghost_rows_cols(rb, W, cl, ch, sgn, off, periodic_y,
                              first, last)
        pa = pe[:, cl:ch]                      # p' rows -1..W
        op[:, :] = pa[soff + 1:soff + S + 1, :]
        # x-face gradients at faces soff..soff+S
        gfx = (pa[soff + 1:soff + S + 2, :]
               - pa[soff:soff + S + 1, :]) * ih
        ux = uxb[soff + GP:soff + GP + S + 1, cl:ch]
        ux_new = ux - (dt_h / ih) * gfx
        oux[:, :] = ux_new[0:S, :]
        gcx = 0.5 * (gfx[0:S, :] + gfx[1:S + 1, :])
        ogx[:, :] = gcx
        # y faces 0..n1 on strip rows
        pr = pe[soff + 1:soff + S + 1, cl - 1:ch + 1]
        gfy = (pr[:, 1:n1 + 2] - pr[:, 0:n1 + 1]) * ih
        uy = uyb[soff:soff + S, CP:CP + n1 + 1]
        uy_new = uy - (dt_h / ih) * gfy
        ouy[:, :] = jnp.pad(uy_new, ((0, 0), (0, n1p - (n1 + 1))))
        gcy = 0.5 * (gfy[:, 0:n1] + gfy[:, 1:n1 + 1])
        ogy[:, :] = gcy
        if with_cells:
            ouc[:, :] = ucb[0:S, cl:ch] - (dt_h / ih) * gcx
            ovc[:, :] = vcb[0:S, cl:ch] - (dt_h / ih) * gcy

    if nstrips == 1:
        body(0, True, True)
    else:
        @pl.when(s == 0)
        def _():
            body(0, True, False)

        if nstrips > 2:
            @pl.when((s > 0) & (s < nstrips - 1))
            def _():
                body(H, False, False)

        @pl.when(s == nstrips - 1)
        def _():
            body(2 * H, False, True)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "sgn", "off", "h2", "periodic_y", "omega",
    "interpret"))
def prolong_relax_correct(rep, rhs, dia, u, ufx, ufy, dt, h, cells=None,
                          *, nsweeps: int, h2: float, sgn, off,
                          periodic_y=False, omega: float = 1.0,
                          S: int = 64, interpret: bool = False):
    """One-launch prolong(rep) -> relax -> p' = u + du -> projection
    correction: returns (p', ufx', ufy', gx, gy[, U', V']).

    ``rep``: coarse correction in rep layout (lane-doubled +
    GP-row-padded, as cascade_prolong_relax emits); ``u``: the pressure
    before the correction du; ``ufx``/``ufy``: plain MAC face arrays
    ((n0+1, n1) / (n0, n1+1)); ``cells``: optional (U, V) centred
    velocities, corrected in the same launch.  ``sgn``/``off``: static
    ghost encodings of the REAL pressure BC (the sweeps use sgn with
    zero offset — the du correction BC is homogeneous)."""
    n0, n1 = rhs.shape
    # halo: 2*nsweeps contaminated rows per window edge PLUS the ghost
    # row the boundary face gradient reads (rounded to 2*GP alignment)
    H = -(-(2 * nsweeps + 1) // (2 * GP)) * (2 * GP)
    if n0 % S or n0 < S + 2 * H or (n0 // S) < 2:
        S = n0
        H = 0
    W = S + 2 * H
    nstrips = n0 // S
    n1p = n1 + 1 + ((-(n1 + 1)) % CP)
    uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
    uyp = jnp.pad(ufy, ((0, 0), (0, n1p - (n1 + 1))))
    dtype = rhs.dtype
    scal = jnp.stack([jnp.asarray(dia, dtype),
                      jnp.asarray(dt, dtype) / h,
                      jnp.asarray(1.0, dtype) / h]).reshape(1, 3)
    with_cells = cells is not None
    z = jnp.zeros((GP, n1), dtype)
    uc_in, vc_in = cells if with_cells else (z, z)
    cs = S if with_cells else GP
    kern = functools.partial(
        _pr_correct_kernel, n0=n0, n1=n1, n1p=n1p, S=S, H=H,
        nstrips=nstrips, nsweeps=nsweeps, h2=h2, sgn=sgn, off=off,
        periodic_y=periodic_y, omega=omega, with_cells=with_cells)
    buf_rows = max(W + 2 * GP, W // 2 + 2 * GP)
    bs = pl.BlockSpec((S, n1), lambda s: (s, 0), memory_space=pltpu.VMEM)
    bsc = pl.BlockSpec((cs, n1), lambda s: (s, 0),
                       memory_space=pltpu.VMEM)
    op, oux, ouy, ogx, ogy, ouc, ovc = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 7,
        out_specs=(bs, bs,
                   pl.BlockSpec((S, n1p), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   bs, bs, bsc, bsc),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), dtype),
                   jax.ShapeDtypeStruct((n0, n1), dtype),
                   jax.ShapeDtypeStruct((n0, n1p), dtype),
                   jax.ShapeDtypeStruct((n0, n1), dtype),
                   jax.ShapeDtypeStruct((n0, n1), dtype),
                   jax.ShapeDtypeStruct((cs * nstrips, n1), dtype),
                   jax.ShapeDtypeStruct((cs * nstrips, n1), dtype)),
        scratch_shapes=[
            pltpu.VMEM((buf_rows, CP + n1 + CP), dtype),       # ub
            pltpu.VMEM((W, CP + n1 + CP), dtype),              # rhs/p'
            pltpu.VMEM((W, CP + n1 + CP), dtype),              # u
            pltpu.VMEM((W + 2 * GP, CP + n1 + CP), dtype),     # ufx
            pltpu.VMEM((W, CP + n1p + CP), dtype),             # ufy
            pltpu.VMEM((S if with_cells else GP, CP + n1 + CP),
                       dtype),                                 # U
            pltpu.VMEM((S if with_cells else GP, CP + n1 + CP),
                       dtype),                                 # V
            pltpu.SemaphoreType.DMA((7,)),
        ],
        # 7 outputs + wide halo windows: stay clear of the 16M
        # scoped-vmem cap (see residual_restrict_div)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(scal, rep, rhs, u, uxp, uyp, uc_in, vc_in)
    # face n0 of ufx': gradient from the ghost of the OUTPUT p'
    pg = sgn[1] * op[-1:, :] + off[1]
    gtop = (pg - op[-1:, :]) / h
    uftop = ufx[-1:, :] - dt * gtop
    ufx_new = jnp.concatenate([oux, uftop], axis=0)
    if with_cells:
        return op, ufx_new, ouy[:, :n1 + 1], ogx, ogy, ouc, ovc
    return op, ufx_new, ouy[:, :n1 + 1], ogx, ogy


def _cv_relax(u, rhs, nsweeps, h2, dia, sgn, per_y, omega=1.0):
    """In-VMEM whole-array RBGS sweeps with roll+mask homogeneous ghosts
    (the coarse-cascade smoother; rolls wrap = periodic, masks overwrite
    the non-periodic edges)."""
    n0, n1 = u.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    red = ((rows + cols) % 2) == 0
    denom = 4.0 + dia * h2
    inv_denom = 1.0 / denom
    for _ in range(nsweeps):
        for color in (red, ~red):
            up = jnp.where(rows == 0, sgn[0] * u, jnp.roll(u, 1, 0))
            dn = jnp.where(rows == n0 - 1, sgn[1] * u, jnp.roll(u, -1, 0))
            if per_y:
                lf = jnp.roll(u, 1, 1)
                rt = jnp.roll(u, -1, 1)
            else:
                lf = jnp.where(cols == 0, sgn[2] * u, jnp.roll(u, 1, 1))
                rt = jnp.where(cols == n1 - 1, sgn[3] * u,
                               jnp.roll(u, -1, 1))
            new = (up + dn + lf + rt - h2 * rhs) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * u + omega * new
            u = jnp.where(color, new, u)
    return u


def _cv_kernel(r_hbm, dia_ref, out_ref, rb, sem, *, n_top, h2_top,
               nsweeps, coarsest, sgn, per_y, min_n):
    """The whole below-``n_top`` V-cascade in ONE launch: restriction via
    row reshape-pool + pair-mean matmul (Mosaic cannot reshape/stride on
    lanes — a 0.5-selection matmul is the MXU-native lane pooling),
    deep-sweep coarsest solve, then matmul lane-expansion + row-repeat
    prolongation with relax at each level (reference: the
    get_from_below/relax_loop/get_from_above ladder of
    src/poisson.c:1044-1167, collapsed because kernel launches dominate
    on the remote TPU)."""
    cp = pltpu.make_async_copy(
        r_hbm.at[:, :], rb.at[:, pl.ds(CP, n_top)], sem)
    cp.start()
    cp.wait()
    dia = dia_ref[0, 0]
    f32 = rb.dtype

    def pool_mat(n):
        # (n, n/2): P[k, j] = 0.5 * (k // 2 == j)
        k = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 1)
        return jnp.where(k // 2 == j, 0.5, 0.0).astype(f32)

    def expand_mat(n):
        # (n/2, n): E[j, k] = (k // 2 == j)
        j = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
        return jnp.where(k // 2 == j, 1.0, 0.0).astype(f32)

    # restriction pyramid n_top -> min_n
    rs = {n_top: rb[:, CP:CP + n_top]}
    n = n_top
    while n > min_n:
        a = rs[n]
        arow = a.reshape(n // 2, 2, n).mean(axis=1)
        rs[n // 2] = jnp.dot(arow, pool_mat(n),
                             preferred_element_type=f32)
        n //= 2

    # coarsest: deep sweeps from zero
    h2 = h2_top * (n_top // min_n) ** 2
    du = jnp.zeros((min_n, min_n), f32)
    du = _cv_relax(du, rs[min_n], coarsest, h2, dia, sgn, per_y)

    # upward: lane expand (matmul) + row repeat + bilinear + relax
    n = min_n * 2
    while n <= n_top:
        rep = jnp.dot(du, expand_mat(n), preferred_element_type=f32)
        RR = jnp.repeat(rep, 2, axis=0)            # (n, n)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        even_r = (rows % 2) == 0
        nb_r = jnp.where(even_r, jnp.roll(RR, 2, 0), jnp.roll(RR, -2, 0))
        nb_r = jnp.where(rows == 0, sgn[0] * RR,
                         jnp.where(rows == n - 1, sgn[1] * RR, nb_r))
        A1 = 0.75 * RR + 0.25 * nb_r
        even_c = (cols % 2) == 0
        nb_c = jnp.where(even_c, jnp.roll(A1, 2, 1), jnp.roll(A1, -2, 1))
        if not per_y:
            nb_c = jnp.where(cols == 0, sgn[2] * A1,
                             jnp.where(cols == n - 1, sgn[3] * A1,
                                       nb_c))
        du = 0.75 * A1 + 0.25 * nb_c
        h2 = h2_top * (n_top // n) ** 2
        du = _cv_relax(du, rs[n], nsweeps, h2, dia, sgn, per_y)
        n *= 2

    out_ref[:, :] = du


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "coarsest", "h2", "signs", "per_y", "min_n", "interpret"))
def coarse_vcycle(r, dia=0.0, *, nsweeps: int, coarsest: int, h2: float,
                  signs=(-1.0, -1.0, -1.0, -1.0), per_y=False,
                  min_n: int = 32, interpret: bool = False):
    """du for the sub-hierarchy at and below ``r``'s level, computed in a
    single kernel launch (homogeneous static BCs, non-periodic rows).
    ``h2`` is the cell size squared AT r's level."""
    n = r.shape[0]
    kern = functools.partial(
        _cv_kernel, n_top=n, h2_top=h2, nsweeps=nsweeps,
        coarsest=coarsest, sgn=signs, per_y=per_y, min_n=min(min_n, n))
    dia_arr = jnp.asarray(dia, r.dtype).reshape(1, 1)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), r.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, CP + n + CP), r.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(r, dia_arr)


def _pool_mat_f(n, dtype):
    """(n, n//2) lane-pooling selection matrix P[k, j] = 0.5*(k//2 == j)
    (Mosaic cannot reshape/stride lanes; pair-mean pooling is an MXU
    matmul)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 1)
    return jnp.where(k // 2 == j, 0.5, 0.0).astype(dtype)


def _expand_mat_f(n, dtype):
    """(n//2, n) lane-doubling matrix E[j, k] = (k//2 == j)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return jnp.where(k // 2 == j, 1.0, 0.0).astype(dtype)


_LANE_CHUNK = 512   # cap the selection-matrix VMEM footprint (n x n/2 f32)


def _lane_pool(x, chunk: int = _LANE_CHUNK):
    """Pair-mean along lanes: (..., L) -> (..., L//2).  The selection
    matrix is block-diagonal over 2:1-aligned chunks, so big L runs as
    several small matmuls instead of one (L, L/2) matrix (8 MB at
    L=2048 would blow the ~16 MB VMEM budget)."""
    L = x.shape[-1]
    c = min(chunk, L)
    P = _pool_mat_f(c, x.dtype)
    outs = [jnp.dot(x[..., i:i + c], P, preferred_element_type=x.dtype)
            for i in range(0, L, c)]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _lane_expand(x, chunk: int = _LANE_CHUNK):
    """Lane doubling: (..., L) -> (..., 2L), x2[.., 2j] = x2[.., 2j+1]
    = x[.., j]; chunked like _lane_pool."""
    L = x.shape[-1]
    c = min(chunk, L)
    E = _expand_mat_f(2 * c, x.dtype)
    outs = [jnp.dot(x[..., i:i + c], E, preferred_element_type=x.dtype)
            for i in range(0, L, c)]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _row_pool(x):
    """Pair-mean along rows (sublane reshape is Mosaic-native)."""
    m, n = x.shape
    return x.reshape(m // 2, 2, n).mean(axis=1)


def _resid_restrict_kernel(u_hbm, rhs_hbm, scal_ref, or0, or1, or2,
                           ub, rb, sem, *, n0, n1, S, h2,
                           sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                           periodic_x, periodic_y,
                           off_x_lo, off_x_hi, off_y_lo, off_y_hi,
                           batched=False):
    """One launch per cycle start: r0 = (rhs - sub) - L(u) + dia*u with
    real (static) BC ghosts, plus the two-level restriction pyramid
    r1 = restrict(r0), r2 = restrict(r1) (reference: residual_set2D +
    get_from_below, src/poisson.c:657,1044 — fused because kernel
    launches dominate on the remote TPU).  ``sub`` folds the
    pure-Neumann compatibility mean subtraction into the same pass.
    ``batched``: leading batch grid dim (u: (B, n0, n1)); per-batch
    scalars [dia, sub, off_x_lo, off_x_hi, off_y_lo, off_y_hi] in SMEM
    replace the static offsets (the U+V diffusion pair)."""
    if batched:
        b = pl.program_id(0)
        s = pl.program_id(1)
        u_hbm = u_hbm.at[b]
        rhs_hbm = rhs_hbm.at[b]
        dia = scal_ref[b, 0]
        sub = scal_ref[b, 1]
        off_x_lo = scal_ref[b, 2]
        off_x_hi = scal_ref[b, 3]
        off_y_lo = scal_ref[b, 4]
        off_y_hi = scal_ref[b, 5]
    else:
        s = pl.program_id(0)
        dia = scal_ref[0]
        sub = scal_ref[1]
    _rr_core(s, u_hbm, rhs_hbm, dia, sub, or0, or1, or2, ub, rb, sem,
             n0=n0, n1=n1, S=S, h2=h2, sgn_x_lo=sgn_x_lo,
             sgn_x_hi=sgn_x_hi, sgn_y_lo=sgn_y_lo, sgn_y_hi=sgn_y_hi,
             periodic_x=periodic_x, periodic_y=periodic_y,
             off_x_lo=off_x_lo, off_x_hi=off_x_hi, off_y_lo=off_y_lo,
             off_y_hi=off_y_hi, out3d=batched)


def _rr_core(s, u_hbm, rhs_hbm, dia, sub, or0, or1, or2, ub, rb, sem, *,
             n0, n1, S, h2, sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
             periodic_x, periodic_y, off_x_lo, off_x_hi, off_y_lo,
             off_y_hi, out3d):
    start = pl.multiple_of(s * S, GP)
    W = S
    _copy_rows(u_hbm, ub, GP, start, W, n0, sem.at[0])
    cp_r = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(start, W), :], rb.at[pl.ds(0, W), :], sem.at[1])
    cp_r.start()
    cp_r.wait()
    first = start == 0
    last = start + W == n0
    lo, hi = GP, GP + W
    cl, ch = CP, CP + n1

    @pl.when(jnp.logical_not(first) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, 0, start - GP, GP, n0, sem.at[0])

    @pl.when(jnp.logical_not(last) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, GP + W, start + W, GP, n0, sem.at[1])

    _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi,
              off_y_lo, off_y_hi)

    if not periodic_x:
        @pl.when(first)
        def _():
            ub[lo - 1:lo, :] = sgn_x_lo * ub[lo:lo + 1, :] + off_x_lo

        @pl.when(last)
        def _():
            ub[hi:hi + 1, :] = sgn_x_hi * ub[hi - 1:hi, :] + off_x_hi

    c = ub[lo:hi, cl:ch]
    nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
          ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
    r = rb[pl.ds(0, W), :] - sub - (nb - 4.0 * c) / h2 + dia * c
    r1 = _lane_pool(_row_pool(r))
    r2 = _lane_pool(_row_pool(r1))
    if out3d:
        or0[0, :, :] = r
        or1[0, :, :] = r1
        or2[0, :, :] = r2
    else:
        or0[:, :] = r
        or1[:, :] = r1
        or2[:, :] = r2


def _resid_restrict_div_kernel(u_hbm, ux_hbm, uy_hbm, scal_ref,
                               or0, or1, or2, ub, uxb, uyb, sem, *,
                               n0, n1, S, h2,
                               sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                               periodic_x, periodic_y,
                               off_x_lo, off_x_hi, off_y_lo, off_y_hi):
    """residual_restrict with the MAC-divergence rhs computed IN-KERNEL
    from the face arrays (round-3 lever (a)): rhs = div(uf)/(h dt) so
    the separate divergence_mac launch disappears from the projection.
    ``ux`` arrives GP-row-padded (face k at row k+GP, projops layout);
    ``uy`` width-padded to a 128 multiple.  scal = [dia, sub, scale]."""
    s = pl.program_id(0)
    dia = scal_ref[0]
    sub = scal_ref[1]
    scale = scal_ref[2]                  # 1 / (h dt)
    start = pl.multiple_of(s * S, GP)
    W = S
    _copy_rows(u_hbm, ub, GP, start, W, n0, sem.at[0])
    cpx = pltpu.make_async_copy(
        ux_hbm.at[pl.ds(start, W + 2 * GP), :],
        uxb.at[pl.ds(0, W + 2 * GP), pl.ds(CP, ux_hbm.shape[1])],
        sem.at[1])
    cpx.start()
    cpy = pltpu.make_async_copy(
        uy_hbm.at[pl.ds(start, W), :],
        uyb.at[pl.ds(0, W), pl.ds(CP, uy_hbm.shape[1])], sem.at[2])
    cpy.start()
    first = start == 0
    last = start + W == n0
    lo, hi = GP, GP + W
    cl, ch = CP, CP + n1

    @pl.when(jnp.logical_not(first) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, 0, start - GP, GP, n0, sem.at[0])

    @pl.when(jnp.logical_not(last) | periodic_x)
    def _():
        _copy_rows(u_hbm, ub, GP + W, start + W, GP, n0, sem.at[0])

    cpx.wait()
    cpy.wait()
    _ghosts_y(ub, cl, ch, periodic_y, sgn_y_lo, sgn_y_hi,
              off_y_lo, off_y_hi)

    if not periodic_x:
        @pl.when(first)
        def _():
            ub[lo - 1:lo, :] = sgn_x_lo * ub[lo:lo + 1, :] + off_x_lo

        @pl.when(last)
        def _():
            ub[hi:hi + 1, :] = sgn_x_hi * ub[hi - 1:hi, :] + off_x_hi

    # rhs = MAC divergence / dt (the _kern_div stencil, projops.py):
    # cell r of this strip has x-faces at buffer rows r+GP, r+GP+1
    ux = uxb[:, CP:CP + n1]
    dux = ux[GP + 1:GP + W + 1, :] - ux[GP:GP + W, :]
    uy = uyb[:, CP:CP + n1 + 1]
    duy = uy[:, 1:n1 + 1] - uy[:, 0:n1]
    rhs = (dux + duy[0:W, :]) * scale

    c = ub[lo:hi, cl:ch]
    nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
          ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
    r = rhs - sub - (nb - 4.0 * c) / h2 + dia * c
    r1 = _lane_pool(_row_pool(r))
    r2 = _lane_pool(_row_pool(r1))
    or0[:, :] = r
    or1[:, :] = r1
    or2[:, :] = r2


@functools.partial(jax.jit,
                   static_argnames=("h2", "signs", "offs", "periodic",
                                    "S", "interpret"))
def residual_restrict_div(u, ufx, ufy, dtm, dia=0.0, sub=0.0, *,
                          h2: float,
                          signs=(-1.0, -1.0, -1.0, -1.0),
                          offs=(0.0, 0.0, 0.0, 0.0),
                          periodic=(False, False), S: int = 256,
                          interpret: bool = False):
    """(r0, r1, r2) of the MAC-projection system with the divergence
    rhs formed in-kernel from the face velocities: r0 = div(uf)/dt -
    sub - L(u) + dia*u (one launch replaces divergence_mac +
    residual_restrict).  ``dtm`` = dt * h (the divergence scale is
    1/(h*dt))."""
    n0, n1 = u.shape
    if n0 % S or S % 4:
        S = n0
    nstrips = n0 // S
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
    n1p = n1 + 1 + ((-(n1 + 1)) % CP)
    uyp = jnp.pad(ufy, ((0, 0), (0, n1p - (n1 + 1))))
    kern = functools.partial(
        _resid_restrict_div_kernel, n0=n0, n1=n1, S=S, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_x=periodic[0], periodic_y=periodic[1],
        off_x_lo=offs[0], off_x_hi=offs[1],
        off_y_lo=offs[2], off_y_hi=offs[3])
    scal = jnp.stack([jnp.asarray(dia, u.dtype),
                      jnp.asarray(sub, u.dtype),
                      1.0 / jnp.asarray(dtm, u.dtype)])
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S // 2, n1 // 2), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S // 4, n1 // 4), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), u.dtype),
                   jax.ShapeDtypeStruct((n0 // 2, n1 // 2), u.dtype),
                   jax.ShapeDtypeStruct((n0 // 4, n1 // 4), u.dtype)),
        scratch_shapes=[
            pltpu.VMEM((GP + S + GP, CP + n1 + CP), u.dtype),
            pltpu.VMEM((S + 2 * GP, CP + n1 + CP), u.dtype),
            pltpu.VMEM((S, CP + n1p + CP), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        # inside the fold_correct step program XLA picks layouts that
        # push this kernel marginally (~32K) over the default 16M
        # scoped-vmem cap — raise it (device VMEM is 128M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(u, uxp, uyp, scal)


def _resid_restrict_kernel_pair(u0, rhs0, u1, rhs1, scal_ref,
                                o00, o01, o02, o10, o11, o12,
                                ub, rb, sem, *, n0, n1, S, h2,
                                sgn_x_lo, sgn_x_hi, sgn_y_lo, sgn_y_hi,
                                periodic_y):
    """Both systems of the U+V diffusion pair per strip iteration —
    separate input/output refs, NO host-side stacking copies (the
    jnp.stack of the batch-dim variant costs ~4 x 16 MB copy kernels
    per step, wiping out the launch savings)."""
    s = pl.program_id(0)
    for b, (uh, rh, a0, a1, a2) in enumerate(
            ((u0, rhs0, o00, o01, o02), (u1, rhs1, o10, o11, o12))):
        _rr_core(s, uh, rh, scal_ref[b, 0], scal_ref[b, 1], a0, a1, a2,
                 ub, rb, sem, n0=n0, n1=n1, S=S, h2=h2,
                 sgn_x_lo=sgn_x_lo, sgn_x_hi=sgn_x_hi,
                 sgn_y_lo=sgn_y_lo, sgn_y_hi=sgn_y_hi,
                 periodic_x=False, periodic_y=periodic_y,
                 off_x_lo=scal_ref[b, 2], off_x_hi=scal_ref[b, 3],
                 off_y_lo=scal_ref[b, 4], off_y_hi=scal_ref[b, 5],
                 out3d=False)


@functools.partial(jax.jit, static_argnames=("S", "signs", "h2",
                                             "periodic_y", "interpret"))
def residual_restrict_pair(us, rhss, scal, *, h2: float,
                           signs=(-1.0, -1.0, -1.0, -1.0),
                           periodic_y=False, S: int = 128,
                           interpret: bool = False):
    """residual_restrict for two systems in one launch with separate
    refs.  us/rhss: 2-lists of (n0, n1); scal: (2, 6) rows
    [dia, sub, off_x_lo, off_x_hi, off_y_lo, off_y_hi].
    Returns ([r0_0, r0_1], [r1_0, r1_1], [r2_0, r2_1])."""
    n0, n1 = us[0].shape
    if n0 % S or S % 4:
        S = n0
    nstrips = n0 // S
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _resid_restrict_kernel_pair, n0=n0, n1=n1, S=S, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_y=periodic_y)
    bs = lambda m, k: pl.BlockSpec((S // m, n1 // m), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM)
    sh = lambda m: jax.ShapeDtypeStruct((n0 // m, n1 // m), us[0].dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 +
                 [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bs(1, 0), bs(2, 1), bs(4, 2),
                   bs(1, 3), bs(2, 4), bs(4, 5)),
        out_shape=(sh(1), sh(2), sh(4), sh(1), sh(2), sh(4)),
        scratch_shapes=[
            pltpu.VMEM((GP + S + GP, CP + n1 + CP), us[0].dtype),
            pltpu.VMEM((S, n1), us[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(us[0], rhss[0], us[1], rhss[1], scal)
    return ([outs[0], outs[3]], [outs[1], outs[4]], [outs[2], outs[5]])


@functools.partial(jax.jit, static_argnames=("S", "signs", "offs", "h2",
                                             "periodic", "interpret"))
def residual_restrict(u, rhs, dia=0.0, sub=0.0, *, h2: float,
                      signs=(-1.0, -1.0, -1.0, -1.0),
                      offs=(0.0, 0.0, 0.0, 0.0),
                      periodic=(False, False), S: int = 256,
                      interpret: bool = False):
    """(r0, r1, r2): residual of (L - dia)u = rhs - sub with static BC
    ghosts, and its two mean-pool restrictions, in ONE launch.
    Requires n1 % (2*_LANE_CHUNK) == 0 or n1 <= _LANE_CHUNK-compatible
    power of two; S % 4 == 0."""
    n0, n1 = u.shape
    if n0 % S or S % 4:
        S = n0
    nstrips = n0 // S
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _resid_restrict_kernel, n0=n0, n1=n1, S=S, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_x=periodic[0], periodic_y=periodic[1],
        off_x_lo=offs[0], off_x_hi=offs[1],
        off_y_lo=offs[2], off_y_hi=offs[3])
    scal = jnp.stack([jnp.asarray(dia, u.dtype),
                      jnp.asarray(sub, u.dtype)])
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S // 2, n1 // 2), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S // 4, n1 // 4), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), u.dtype),
                   jax.ShapeDtypeStruct((n0 // 2, n1 // 2), u.dtype),
                   jax.ShapeDtypeStruct((n0 // 4, n1 // 4), u.dtype)),
        scratch_shapes=[
            pltpu.VMEM((GP + S + GP, CP + n1 + CP), u.dtype),
            pltpu.VMEM((S, n1), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(u, rhs, scal)


def _cascade_prolong_kernel(r1_hbm, r2_hbm, dia_ref, orep_hbm,
                            repsc, rb, r2b, stage, zb, sem, *,
                            n_half, S, H, nsweeps, coarsest, h2_half,
                            sgn, per_y, min_n, batched=False,
                            omega=1.0):
    """Levels <= n_half of the correction phase in ONE launch: at strip 0
    the whole sub-cascade on r2 (restriction pyramid -> deep coarsest
    sweeps -> prolong+relax back to n_q = n_half/2, exactly
    coarse_vcycle) lands in a persistent VMEM scratch in lane-doubled
    'rep' form; every strip then bilinearly prolongs it to the half
    level and relaxes ``nsweeps`` with halo shrink (exactly
    prolong_relax), writing the result lane-doubled + GP-row-padded so
    the fine-level prolong_relax consumes it with zero host reshaping.
    Non-periodic rows, homogeneous BCs (the correction phase)."""
    if batched:
        b = pl.program_id(0)
        s = pl.program_id(1)
        r1_hbm = r1_hbm.at[b]
        r2_hbm = r2_hbm.at[b]
        orep_hbm = orep_hbm.at[b]
        dia = dia_ref[b, 0]
    else:
        s = pl.program_id(0)
        dia = dia_ref[0, 0]
    _cp_core(s, r1_hbm, r2_hbm, orep_hbm, dia, repsc, rb, r2b, stage,
             zb, sem, n_half=n_half, S=S, H=H, nsweeps=nsweeps,
             coarsest=coarsest, h2_half=h2_half, sgn=sgn, per_y=per_y,
             min_n=min_n, omega=omega)


def _cp_core(s, r1_hbm, r2_hbm, orep_hbm, dia, repsc, rb, r2b, stage,
             zb, sem, *, n_half, S, H, nsweeps, coarsest, h2_half, sgn,
             per_y, min_n, omega=1.0):
    n_q = n_half // 2
    W = S + 2 * H
    f32 = rb.dtype
    cl, ch = CP, CP + n_half

    @pl.when(s == 0)
    def _():
        cp = pltpu.make_async_copy(
            r2_hbm.at[:, :], r2b.at[pl.ds(0, n_q), pl.ds(CP, n_q)],
            sem.at[0])
        cp.start()
        cp.wait()
        # ---- coarse_vcycle on r2 (n_q -> min_n -> n_q)
        rs = {n_q: r2b[pl.ds(0, n_q), cl:cl + n_q]}
        n = n_q
        while n > min_n:
            rs[n // 2] = _lane_pool(_row_pool(rs[n]))
            n //= 2
        h2c = h2_half * (2 * n_q // min_n) ** 2
        du = jnp.zeros((min_n, min_n), f32)
        du = _cv_relax(du, rs[min_n], coarsest, h2c, dia, sgn, per_y,
                       omega)
        n = min_n * 2
        while n <= n_q:
            rep = _lane_expand(du)
            RR = jnp.repeat(rep, 2, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            even_r = (rows % 2) == 0
            nb_r = jnp.where(even_r, jnp.roll(RR, 2, 0),
                             jnp.roll(RR, -2, 0))
            nb_r = jnp.where(rows == 0, sgn[0] * RR,
                             jnp.where(rows == n - 1, sgn[1] * RR, nb_r))
            A1 = 0.75 * RR + 0.25 * nb_r
            even_c = (cols % 2) == 0
            nb_c = jnp.where(even_c, jnp.roll(A1, 2, 1),
                             jnp.roll(A1, -2, 1))
            if not per_y:
                nb_c = jnp.where(cols == 0, sgn[2] * A1,
                                 jnp.where(cols == n - 1, sgn[3] * A1,
                                           nb_c))
            du = 0.75 * A1 + 0.25 * nb_c
            h2c = h2_half * (2 * n_q // n) ** 2
            du = _cv_relax(du, rs[n], nsweeps, h2c, dia, sgn, per_y,
                           omega)
            n *= 2
        # stash du_q (half-lane form; lane-doubled per strip below —
        # the full-width plane would blow the 16 MB VMEM budget in the
        # pair kernel) with GP row padding
        repsc[0:GP, :] = jnp.zeros((GP, n_q), f32)
        repsc[GP:GP + n_q, :] = du
        repsc[GP + n_q:GP + n_q + GP, :] = jnp.zeros((GP, n_q), f32)

    # ---- per-strip: prolong repsc -> half level + relax (homogeneous)
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n_half - W), 2 * GP)
    cstart = pl.multiple_of(rstart // 2, GP)
    cp2 = pltpu.make_async_copy(
        r1_hbm.at[pl.ds(rstart, W), :],
        rb.at[pl.ds(0, W), pl.ds(CP, n_half)], sem.at[1])
    cp2.start()
    cp2.wait()
    first = rstart == 0
    last = rstart + W == n_half

    Ch = repsc[pl.ds(cstart, W // 2 + 2 * GP), :][GP - 1:GP + W // 2 + 1,
                                                   :]
    C = _lane_expand(Ch, chunk=256)
    RR = jnp.repeat(C, 2, axis=0)
    base_r = RR[2:W + 2, :]
    nb_up = RR[1:W + 1, :]
    nb_dn = RR[3:W + 3, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n_half), 0) + rstart
    even_r = (rows % 2) == 0
    nb_r = jnp.where(even_r, nb_up, nb_dn)
    nb_r = jnp.where(rows == 0, sgn[0] * base_r,
                     jnp.where(rows == n_half - 1, sgn[1] * base_r, nb_r))
    A1 = 0.75 * base_r + 0.25 * nb_r
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n_half), 1)
    even_c = (cols % 2) == 0
    nb_c = jnp.where(even_c, jnp.roll(A1, 1, 1), jnp.roll(A1, -1, 1))
    if not per_y:
        nb_c = jnp.where(cols == 0, sgn[2] * A1,
                         jnp.where(cols == n_half - 1, sgn[3] * A1, nb_c))
    du = 0.75 * A1 + 0.25 * nb_c

    # relax in the strip buffer (halo shrink keeps the interior exact)
    ub = stage
    ub[GP:GP + W, cl:ch] = du
    red = ((rows + cols) % 2) == 0
    denom = 4.0 + dia * h2_half
    inv_denom = 1.0 / denom
    lo, hi = GP, GP + W
    for _ in range(nsweeps):
        for color in (red, ~red):
            _ghosts_y(ub, cl, ch, per_y, sgn[2], sgn[3])
            _ghosts_x(ub, lo, hi, first, last, False, H == 0,
                      sgn[0], sgn[1])
            c = ub[lo:hi, cl:ch]
            nb = (ub[lo - 1:hi - 1, cl:ch] + ub[lo + 1:hi + 1, cl:ch] +
                  ub[lo:hi, cl - 1:ch - 1] + ub[lo:hi, cl + 1:ch + 1])
            new = (nb - h2_half * rb[pl.ds(0, W), cl:ch]) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[lo:hi, cl:ch] = jnp.where(color, new, c)

    off = pl.multiple_of(s * S - rstart, GP)
    strip = ub[pl.ds(GP + off, S), cl:ch]
    zb[pl.ds(0, S), :] = _lane_expand(strip)
    cpo = pltpu.make_async_copy(
        zb.at[pl.ds(0, S), :],
        orep_hbm.at[pl.ds(pl.multiple_of(GP + s * S, GP), S), :],
        sem.at[2])
    cpo.start()
    cpo.wait()

    @pl.when(s == 0)
    def _():
        zb[pl.ds(0, GP), :] = jnp.zeros((GP, 2 * n_half), f32)
        cpz = pltpu.make_async_copy(
            zb.at[pl.ds(0, GP), :], orep_hbm.at[pl.ds(0, GP), :],
            sem.at[2])
        cpz.start()
        cpz.wait()
        cpz2 = pltpu.make_async_copy(
            zb.at[pl.ds(0, GP), :],
            orep_hbm.at[pl.ds(GP + n_half, GP), :], sem.at[2])
        cpz2.start()
        cpz2.wait()


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "coarsest", "h2_half", "signs", "per_y", "min_n", "S",
    "interpret", "omega"))
def cascade_prolong_relax(r1, r2, dia=0.0, *, nsweeps: int, coarsest: int,
                          h2_half: float, signs=(-1.0, -1.0, -1.0, -1.0),
                          per_y=False, min_n: int = 16, S: int = 64,
                          interpret: bool = False, omega: float = 1.0):
    """All correction levels at/below n_half = r1.shape[0] in one
    launch.  Returns the half-level correction in 'rep' layout
    (lane-doubled, GP-row-padded, shape (n_half + 2*GP, 2*n_half)) for
    prolong_relax(..., pre_rep=True).  Equivalent to
    coarse_vcycle(r2) -> prolong+relax(r1) of the jnp ladder."""
    n_half = r1.shape[0]
    H = -(-2 * nsweeps // (2 * GP)) * (2 * GP)
    if n_half % S or n_half < S + 2 * H or (n_half // S) < 2:
        S = n_half
        H = 0
    W = S + 2 * H
    kern = functools.partial(
        _cascade_prolong_kernel, n_half=n_half, S=S, H=H,
        nsweeps=nsweeps, coarsest=coarsest, h2_half=h2_half, sgn=signs,
        per_y=per_y, min_n=min(min_n, n_half // 2), omega=omega)
    dia_arr = jnp.asarray(dia, r1.dtype).reshape(1, 1)
    buf_rows = max(W + 2 * GP, n_half // 2)
    return pl.pallas_call(
        kern,
        grid=(n_half // S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_half + 2 * GP, 2 * n_half),
                                       r1.dtype),
        scratch_shapes=[
            pltpu.VMEM((GP + n_half // 2 + GP, n_half // 2),
                       r1.dtype),                                   # rep
            pltpu.VMEM((W, CP + n_half + CP), r1.dtype),            # rhs
            pltpu.VMEM((n_half // 2, CP + n_half // 2 + CP),
                       r1.dtype),                                   # r2
            pltpu.VMEM((GP + W + GP, CP + n_half + CP), r1.dtype),  # u
            pltpu.VMEM((S, 2 * n_half), r1.dtype),                  # out
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(r1, r2, dia_arr)


def _cascade_prolong_kernel_pair(r10, r20, r11, r21, dia_ref,
                                 o0, o1, repsc, rb, r2b, stage, zb,
                                 sem, *,
                                 n_half, S, H, nsweeps, coarsest,
                                 h2_half, sgn, per_y, min_n,
                                 omega=1.0):
    """cascade_prolong_relax for both pair systems per strip iteration
    (the sub-cascade recomputes per system at strip 0)."""
    s = pl.program_id(0)
    # repsc persists ACROSS strip iterations (filled at s == 0), so each
    # system needs its own plane — a shared buffer would leak system 1's
    # cascade into system 0's prolongs at s > 0
    for b, (r1h, r2h, oh) in enumerate(((r10, r20, o0),
                                        (r11, r21, o1))):
        _cp_core(s, r1h, r2h, oh, dia_ref[b, 0], repsc.at[b], rb, r2b,
                 stage, zb, sem, n_half=n_half, S=S, H=H,
                 nsweeps=nsweeps, coarsest=coarsest, h2_half=h2_half,
                 sgn=sgn, per_y=per_y, min_n=min_n, omega=omega)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "coarsest", "h2_half", "signs", "per_y", "min_n", "S",
    "interpret", "omega"))
def cascade_prolong_relax_pair(r1s, r2s, dia, *, nsweeps: int,
                               coarsest: int, h2_half: float,
                               signs=(-1.0, -1.0, -1.0, -1.0),
                               per_y=False, min_n: int = 16, S: int = 64,
                               interpret: bool = False,
                               omega: float = 1.0):
    """Pair cascade_prolong_relax: r1s/r2s 2-lists, dia (2,).
    Returns [rep0, rep1]."""
    n_half = r1s[0].shape[0]
    H = -(-2 * nsweeps // (2 * GP)) * (2 * GP)
    if n_half % S or n_half < S + 2 * H or (n_half // S) < 2:
        S = n_half
        H = 0
    W = S + 2 * H
    kern = functools.partial(
        _cascade_prolong_kernel_pair, n_half=n_half, S=S, H=H,
        nsweeps=nsweeps, coarsest=coarsest, h2_half=h2_half, sgn=signs,
        per_y=per_y, min_n=min(min_n, n_half // 2), omega=omega)
    dia_arr = jnp.asarray(dia, r1s[0].dtype).reshape(2, 1)
    buf_rows = max(W + 2 * GP, n_half // 2)
    oshape = jax.ShapeDtypeStruct((n_half + 2 * GP, 2 * n_half),
                                  r1s[0].dtype)
    o0, o1 = pl.pallas_call(
        kern,
        grid=(n_half // S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 +
                 [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        out_shape=(oshape, oshape),
        scratch_shapes=[
            pltpu.VMEM((2, GP + n_half // 2 + GP, n_half // 2),
                       r1s[0].dtype),
            pltpu.VMEM((W, CP + n_half + CP), r1s[0].dtype),
            pltpu.VMEM((n_half // 2, CP + n_half // 2 + CP),
                       r1s[0].dtype),
            pltpu.VMEM((GP + W + GP, CP + n_half + CP), r1s[0].dtype),
            pltpu.VMEM((S, 2 * n_half), r1s[0].dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(r1s[0], r2s[0], r1s[1], r2s[1], dia_arr)
    return [o0, o1]


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "signs", "omega", "h2", "periodic"))
def rbgs_relax(u: jnp.ndarray, rhs: jnp.ndarray, dia=0.0, *, nsweeps: int,
               h2: float, signs=(-1.0, -1.0, -1.0, -1.0),
               periodic=(False, False), omega: float = 1.0, S: int = 64):
    """nsweeps of RBGS on the 5-point Laplacian + scalar dia term, with
    homogeneous (or periodic) BCs.  ``dia`` is a runtime scalar (it
    carries the traced 1/(beta dt D) coefficient of the diffusion system,
    so it must NOT be a compile-time constant).

    signs = (x_lo, x_hi, y_lo, y_hi) ghost multipliers (-1 Dirichlet,
    +1 Neumann); ``periodic`` per axis overrides the signs."""
    n0, n1 = u.shape
    H = -(-2 * nsweeps // GP) * GP   # halo rounded to the sublane multiple
    S, H = _strip_plan(n0, S, H, periodic[0])
    nstrips = n0 // S
    W = S + 2 * H
    sx_lo, sx_hi, sy_lo, sy_hi = signs

    kern = functools.partial(
        _kernel, n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_x=periodic[0], periodic_y=periodic[1], omega=omega)
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
            pltpu.VMEM((W, CP + n1 + CP), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(u, rhs, dia_arr)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "S", "signs", "omega", "h2", "periodic", "dia_cell"))
def rbgs_relax_alpha(u, rhs, ax, ay, dia, *, nsweeps: int, h2: float,
                     signs=(-1.0, -1.0, -1.0, -1.0),
                     periodic=(False, False), omega: float = 1.0,
                     dia_cell: bool = False, S: int = 64):
    """Variable-coefficient fused RBGS: div(alpha grad u) - dia u = rhs.
    ``ax``: (n0+1, n1) x-face coefficients, ``ay``: (n0, n1+1) y-face.
    ``dia``: scalar or (n0, n1) cell array (dia_cell=True)."""
    n0, n1 = u.shape
    H = -(-2 * nsweeps // GP) * GP
    S, H = _strip_plan(n0, S, H, periodic[0])
    nstrips = n0 // S
    W = S + 2 * H
    sx_lo, sx_hi, sy_lo, sy_hi = signs
    kern = functools.partial(
        _kernel_alpha, n0=n0, n1=n1, S=S, H=H, nsweeps=nsweeps, h2=h2,
        sgn_x_lo=sx_lo, sgn_x_hi=sx_hi, sgn_y_lo=sy_lo, sgn_y_hi=sy_hi,
        periodic_x=periodic[0], periodic_y=periodic[1], omega=omega,
        dia_cell=dia_cell)
    if dia_cell:
        dia_in = jnp.broadcast_to(jnp.asarray(dia, u.dtype), u.shape)
        dia_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        dia_in = jnp.asarray(dia, u.dtype).reshape(1, 1)
        dia_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    buf = (GP + W + GP, CP + n1 + CP)
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 + [dia_spec],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), u.dtype),
        scratch_shapes=[
            pltpu.VMEM(buf, u.dtype),                     # u
            pltpu.VMEM((W, CP + n1 + CP), u.dtype),       # rhs
            pltpu.VMEM((W + 1, CP + n1 + CP), u.dtype),   # ax faces
            pltpu.VMEM((W, CP + n1 + CP), u.dtype),       # ay faces
            pltpu.VMEM((W, CP + n1 + CP), u.dtype),       # dia cells
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(u, rhs, ax, ay, dia_in)
