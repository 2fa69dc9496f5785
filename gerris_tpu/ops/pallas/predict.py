"""Fused BCG face-velocity predictor as Pallas TPU kernels.

gfs_predicted_face_velocities (reference: src/timestep.c:681-717 with
gfs_cell_advected_face_values restricted to the component's own axis and
CENTERED upwinding) costs ~10 XLA kernels per step on the jnp path; on
the launch-bound remote TPU that is ~3 ms.  These kernels compute each
component's predicted MAC face field in one launch (faces 0..n-1; the
domain-boundary face n is the static Dirichlet value, appended by the
wrapper with one concatenate).

Scope: 2D f32, centred slope + Godunov, static sign/offset BCs
(Dirichlet/Neumann-0; periodic transverse allowed for the *other* axis),
own-axis BCs Dirichlet with static values.  Fallback: models/ns jnp path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bcg import GP, CP, _dma


def _kern_x(dt_ref, u_hbm, v_hbm, out_ref, ubuf, vbuf, sem, *,
            n0, n1, S, H, nstrips, sgn_u, off_u, sgn_v, off_v, per_y,
            fb_lo):
    """x-faces of the x-component: own-axis BCG face values upwinded with
    the centred face-average velocity.  Output rows = faces s*S..s*S+S-1
    (face f between cells f-1 and f)."""
    s = pl.program_id(0)
    W = S + 2 * H
    dt_h = dt_ref[0, 0]
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(u_hbm, ubuf, 0, rstart, W, sem.at[0]),
           _dma(v_hbm, vbuf, 0, rstart, W, sem.at[1])]
    for cp in cps:
        cp.wait()
    cl, ch = CP, CP + n1

    # ghost columns (y BCs) for both components, 2 deep for u
    def ghost_cols(b, sg, of, deep2):
        if per_y:
            b[:, cl - 1:cl] = b[:, ch - 1:ch]
            b[:, ch:ch + 1] = b[:, cl:cl + 1]
            if deep2:
                b[:, cl - 2:cl - 1] = b[:, ch - 2:ch - 1]
                b[:, ch + 1:ch + 2] = b[:, cl + 1:cl + 2]
        else:
            b[:, cl - 1:cl] = sg[2] * b[:, cl:cl + 1] + of[2]
            b[:, ch:ch + 1] = sg[3] * b[:, ch - 1:ch] + of[3]
            if deep2:
                b[:, cl - 2:cl - 1] = sg[2] * b[:, cl + 1:cl + 2] + of[2]
                b[:, ch + 1:ch + 2] = sg[3] * b[:, ch - 2:ch - 1] + of[3]

    ghost_cols(ubuf, sgn_u, off_u, True)
    ghost_cols(vbuf, sgn_v, off_v, False)

    def body(soff: int, first: bool, last: bool):
        ue = jnp.concatenate([
            (sgn_u[0] * ubuf[1:2, :] + off_u[0]) if first else ubuf[0:1, :],
            (sgn_u[0] * ubuf[0:1, :] + off_u[0]) if first else ubuf[0:1, :],
            ubuf[0:W, :],
            (sgn_u[1] * ubuf[W - 1:W, :] + off_u[1]) if last
            else ubuf[W - 1:W, :],
            (sgn_u[1] * ubuf[W - 2:W - 1, :] + off_u[1]) if last
            else ubuf[W - 1:W, :],
        ], axis=0)                       # u cells -2..W+1
        vees = jnp.concatenate([
            (sgn_v[0] * vbuf[0:1, :] + off_v[0]) if first else vbuf[0:1, :],
            vbuf[0:W, :],
            (sgn_v[1] * vbuf[W - 1:W, :] + off_v[1]) if last
            else vbuf[W - 1:W, :],
        ], axis=0)                       # v cells -1..W

        gx = 0.5 * (ue[2:W + 4, cl:ch] - ue[0:W + 2, cl:ch])
        uc = ue[1:W + 3, cl:ch]          # u cells -1..W
        unorm = dt_h * uc
        vp = uc + jnp.minimum((1.0 - unorm) / 2.0, 0.5) * gx
        vm = uc + jnp.maximum((-1.0 - unorm) / 2.0, -0.5) * gx
        # transverse along y with vtan = v cells
        dup = ue[1:W + 3, cl:ch] - ue[1:W + 3, cl - 1:ch - 1]
        ddn = ue[1:W + 3, cl + 1:ch + 1] - ue[1:W + 3, cl:ch]
        vt = vees[:, cl:ch]              # rows -1..W matches vp rows
        gdiff = jnp.where(vt > 0.0, dup, jnp.where(vt < 0.0, ddn, 0.0))
        dv = dt_h * vt * gdiff / 2.0
        vp = vp - dv
        vm = vm - dv
        # centred upwinding velocity at faces soff..soff+S-1:
        # un[f] = 0.5 (u_pad[f-1] + u_pad[f])
        ua = ue[1:W + 3, cl:ch]
        un = 0.5 * (ua[soff:soff + S, :] + ua[soff + 1:soff + S + 1, :])
        left = vp[soff:soff + S, :]
        right = vm[soff + 1:soff + S + 1, :]
        F = jnp.where(un > 0.0, left,
                      jnp.where(un < 0.0, right, 0.5 * (left + right)))
        if first:
            F = jnp.concatenate(
                [jnp.full_like(F[0:1, :], fb_lo), F[1:, :]], 0)
        out_ref[:, :] = F

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


def _kern_y(dt_ref, v_hbm, u_hbm, out_ref, vbuf, ubuf, sem, *,
            n0, n1, S, H, nstrips, sgn_v, off_v, sgn_u, off_u, per_y,
            fb_lo):
    """y-faces of the y-component (faces along lanes 0..n1-1)."""
    s = pl.program_id(0)
    W = S + 2 * H
    dt_h = dt_ref[0, 0]
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(v_hbm, vbuf, 0, rstart, W, sem.at[0]),
           _dma(u_hbm, ubuf, 0, rstart, W, sem.at[1])]
    for cp in cps:
        cp.wait()
    cl, ch = CP, CP + n1

    # v: 2-deep ghost columns; u: 1-deep (transverse)
    if per_y:
        vbuf[:, cl - 1:cl] = vbuf[:, ch - 1:ch]
        vbuf[:, cl - 2:cl - 1] = vbuf[:, ch - 2:ch - 1]
        vbuf[:, ch:ch + 1] = vbuf[:, cl:cl + 1]
        vbuf[:, ch + 1:ch + 2] = vbuf[:, cl + 1:cl + 2]
        ubuf[:, cl - 1:cl] = ubuf[:, ch - 1:ch]
        ubuf[:, ch:ch + 1] = ubuf[:, cl:cl + 1]
    else:
        vbuf[:, cl - 1:cl] = sgn_v[2] * vbuf[:, cl:cl + 1] + off_v[2]
        vbuf[:, cl - 2:cl - 1] = sgn_v[2] * vbuf[:, cl + 1:cl + 2] \
            + off_v[2]
        vbuf[:, ch:ch + 1] = sgn_v[3] * vbuf[:, ch - 1:ch] + off_v[3]
        vbuf[:, ch + 1:ch + 2] = sgn_v[3] * vbuf[:, ch - 2:ch - 1] \
            + off_v[3]
        ubuf[:, cl - 1:cl] = sgn_u[2] * ubuf[:, cl:cl + 1] + off_u[2]
        ubuf[:, ch:ch + 1] = sgn_u[3] * ubuf[:, ch - 1:ch] + off_u[3]

    def body(soff: int, first: bool, last: bool):
        # v rows soff-1..soff+S (for the transverse x-difference)
        ve = jnp.concatenate([
            (sgn_v[0] * vbuf[0:1, :] + off_v[0]) if first else vbuf[0:1, :],
            vbuf[0:W, :],
            (sgn_v[1] * vbuf[W - 1:W, :] + off_v[1]) if last
            else vbuf[W - 1:W, :],
        ], axis=0)                       # v cells -1..W
        R = soff + 1                     # row r=soff in the -1..W frame
        vr = ve[R:R + S, cl - 2:ch + 2]  # strip rows, cols -2..n1+1
        gy = 0.5 * (vr[:, 2:n1 + 4] - vr[:, 0:n1 + 2])   # cols -1..n1
        vc = vr[:, 1:n1 + 3]             # cols -1..n1
        unorm = dt_h * vc
        vp = vc + jnp.minimum((1.0 - unorm) / 2.0, 0.5) * gy
        vm = vc + jnp.maximum((-1.0 - unorm) / 2.0, -0.5) * gy
        # transverse along x with vtan = u cells (cols -1..n1)
        up = ve[R:R + S, cl - 1:ch + 1] - ve[R - 1:R + S - 1,
                                             cl - 1:ch + 1]
        dn = ve[R + 1:R + S + 1, cl - 1:ch + 1] - ve[R:R + S,
                                                     cl - 1:ch + 1]
        ut = ubuf[soff:soff + S, cl - 1:ch + 1]
        gdiff = jnp.where(ut > 0.0, up, jnp.where(ut < 0.0, dn, 0.0))
        dv = dt_h * ut * gdiff / 2.0
        vp = vp - dv
        vm = vm - dv
        # centred upwinding at faces 0..n1-1: un = 0.5 (v[j-1] + v[j])
        un = 0.5 * (vc[:, 0:n1] + vc[:, 1:n1 + 1])
        left = vp[:, 0:n1]
        right = vm[:, 1:n1 + 1]
        F = jnp.where(un > 0.0, left,
                      jnp.where(un < 0.0, right, 0.5 * (left + right)))
        if not per_y:
            cidx = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
            F = jnp.where(cidx == 0, fb_lo, F)
        out_ref[:, :] = F

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


def _kern_xy(dt_ref, u_hbm, v_hbm, ox_ref, oy_ref, ubuf, vbuf, sem, *,
             n0, n1, n1p, S, H, nstrips, sgn_u, off_u, sgn_v, off_v,
             per_y, fbx_lo, fby_lo):
    """Both components' predicted MAC faces in ONE launch (the two
    predict kernels share their u/v strip DMAs; launches dominate on the
    remote TPU).  ox rows = x-faces s*S..s*S+S-1; oy = y-faces 0..n1
    (padded width n1p) on the strip rows."""
    s = pl.program_id(0)
    W = S + 2 * H
    dt_h = dt_ref[0, 0]
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(u_hbm, ubuf, 0, rstart, W, sem.at[0]),
           _dma(v_hbm, vbuf, 0, rstart, W, sem.at[1])]
    for cp in cps:
        cp.wait()
    cl, ch = CP, CP + n1

    def ghost_cols(b, sg, of):
        if per_y:
            b[:, cl - 1:cl] = b[:, ch - 1:ch]
            b[:, cl - 2:cl - 1] = b[:, ch - 2:ch - 1]
            b[:, ch:ch + 1] = b[:, cl:cl + 1]
            b[:, ch + 1:ch + 2] = b[:, cl + 1:cl + 2]
        else:
            b[:, cl - 1:cl] = sg[2] * b[:, cl:cl + 1] + of[2]
            b[:, cl - 2:cl - 1] = sg[2] * b[:, cl + 1:cl + 2] + of[2]
            b[:, ch:ch + 1] = sg[3] * b[:, ch - 1:ch] + of[3]
            b[:, ch + 1:ch + 2] = sg[3] * b[:, ch - 2:ch - 1] + of[3]

    ghost_cols(ubuf, sgn_u, off_u)
    ghost_cols(vbuf, sgn_v, off_v)

    def body(soff: int, first: bool, last: bool):
        # ---- x-component x-faces (the _kern_x body)
        ue = jnp.concatenate([
            (sgn_u[0] * ubuf[1:2, :] + off_u[0]) if first else ubuf[0:1, :],
            (sgn_u[0] * ubuf[0:1, :] + off_u[0]) if first else ubuf[0:1, :],
            ubuf[0:W, :],
            (sgn_u[1] * ubuf[W - 1:W, :] + off_u[1]) if last
            else ubuf[W - 1:W, :],
            (sgn_u[1] * ubuf[W - 2:W - 1, :] + off_u[1]) if last
            else ubuf[W - 1:W, :],
        ], axis=0)                       # u cells -2..W+1
        ve = jnp.concatenate([
            (sgn_v[0] * vbuf[0:1, :] + off_v[0]) if first else vbuf[0:1, :],
            vbuf[0:W, :],
            (sgn_v[1] * vbuf[W - 1:W, :] + off_v[1]) if last
            else vbuf[W - 1:W, :],
        ], axis=0)                       # v cells -1..W

        gx = 0.5 * (ue[2:W + 4, cl:ch] - ue[0:W + 2, cl:ch])
        uc = ue[1:W + 3, cl:ch]
        unorm = dt_h * uc
        vp = uc + jnp.minimum((1.0 - unorm) / 2.0, 0.5) * gx
        vm = uc + jnp.maximum((-1.0 - unorm) / 2.0, -0.5) * gx
        dup = ue[1:W + 3, cl:ch] - ue[1:W + 3, cl - 1:ch - 1]
        ddn = ue[1:W + 3, cl + 1:ch + 1] - ue[1:W + 3, cl:ch]
        vt = ve[:, cl:ch]
        gdiff = jnp.where(vt > 0.0, dup, jnp.where(vt < 0.0, ddn, 0.0))
        dv = dt_h * vt * gdiff / 2.0
        vp = vp - dv
        vm = vm - dv
        ua = ue[1:W + 3, cl:ch]
        un = 0.5 * (ua[soff:soff + S, :] + ua[soff + 1:soff + S + 1, :])
        left = vp[soff:soff + S, :]
        right = vm[soff + 1:soff + S + 1, :]
        F = jnp.where(un > 0.0, left,
                      jnp.where(un < 0.0, right, 0.5 * (left + right)))
        if first:
            F = jnp.concatenate(
                [jnp.full_like(F[0:1, :], fbx_lo), F[1:, :]], 0)
        ox_ref[:, :] = F

        # ---- y-component y-faces (the _kern_y body)
        R = soff + 1
        vr = ve[R:R + S, cl - 2:ch + 2]
        gy = 0.5 * (vr[:, 2:n1 + 4] - vr[:, 0:n1 + 2])
        vc = vr[:, 1:n1 + 3]
        unorm2 = dt_h * vc
        vp2 = vc + jnp.minimum((1.0 - unorm2) / 2.0, 0.5) * gy
        vm2 = vc + jnp.maximum((-1.0 - unorm2) / 2.0, -0.5) * gy
        up = ve[R:R + S, cl - 1:ch + 1] - ve[R - 1:R + S - 1,
                                             cl - 1:ch + 1]
        dn = ve[R + 1:R + S + 1, cl - 1:ch + 1] - ve[R:R + S,
                                                     cl - 1:ch + 1]
        ut = ubuf[soff:soff + S, cl - 1:ch + 1]
        gdiff2 = jnp.where(ut > 0.0, up, jnp.where(ut < 0.0, dn, 0.0))
        dv2 = dt_h * ut * gdiff2 / 2.0
        vp2 = vp2 - dv2
        vm2 = vm2 - dv2
        un2 = 0.5 * (vc[:, 0:n1] + vc[:, 1:n1 + 1])
        left2 = vp2[:, 0:n1]
        right2 = vm2[:, 1:n1 + 1]
        Fy = jnp.where(un2 > 0.0, left2,
                       jnp.where(un2 < 0.0, right2,
                                 0.5 * (left2 + right2)))
        if not per_y:
            cidx = jax.lax.broadcasted_iota(jnp.int32, Fy.shape, 1)
            Fy = jnp.where(cidx == 0, fby_lo, Fy)
        oy_ref[:, :] = Fy            # faces 0..n1-1 (width n1)

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
    "sgn_u", "off_u", "sgn_v", "off_v", "per_y", "fb_x", "fb_y", "S",
    "interpret"))
def predict_xy(U, V, dt, h, *, sgn_u, off_u, sgn_v, off_v, per_y,
               fb_x, fb_y, S=32, interpret=False):
    """(ufx (n0+1, n1), ufy (n0, n1+1)): both predicted MAC face fields
    in one launch (== predict_x + predict_y)."""
    n0, n1 = U.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    kern = functools.partial(
        _kern_xy, n0=n0, n1=n1, n1p=n1, S=S, H=H, nstrips=n0 // S,
        sgn_u=sgn_u, off_u=off_u, sgn_v=sgn_v, off_v=off_v,
        per_y=per_y, fbx_lo=fb_x[0],
        fby_lo=0.0 if fb_y[0] is None else fb_y[0])
    dt_arr = (jnp.asarray(dt, U.dtype) / h).reshape(1, 1)
    W = S + 2 * H
    ox, oy = pl.pallas_call(
        kern,
        grid=(n0 // S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), U.dtype),
                   jax.ShapeDtypeStruct((n0, n1), U.dtype)),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dt_arr, U, V)
    top = jnp.full((1, n1), fb_x[1], U.dtype)
    ufx = jnp.concatenate([ox, top], axis=0)
    if per_y:
        ufy = jnp.concatenate([oy, oy[:, :1]], axis=1)
    else:
        ufy = jnp.concatenate(
            [oy, jnp.full((n0, 1), fb_y[1], V.dtype)], axis=1)
    return ufx, ufy


def _call(kern, dt, h, a, b, n0, n1, S, H, nstrips, dtype,
          interpret):
    dt_arr = (jnp.asarray(dt, dtype) / h).reshape(1, 1)
    W = S + 2 * H
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), dtype),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), dtype),
            pltpu.VMEM((W, CP + n1 + CP), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dt_arr, a, b)


@functools.partial(jax.jit, static_argnames=(
    "sgn_u", "off_u", "sgn_v", "off_v", "per_y", "fb", "S", "interpret"))
def predict_x(U, V, dt, h, *, sgn_u, off_u, sgn_v, off_v, per_y,
              fb, S=32, interpret=False):
    """Predicted x-face field of U: (n0+1, n1).  ``fb`` = (lo, hi)
    static Dirichlet face values on the x boundaries."""
    n0, n1 = U.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    kern = functools.partial(
        _kern_x, n0=n0, n1=n1, S=S, H=H, nstrips=n0 // S,
        sgn_u=sgn_u, off_u=off_u, sgn_v=sgn_v, off_v=off_v,
        per_y=per_y, fb_lo=fb[0])
    main = _call(kern, dt, h, U, V, n0, n1, S, H, n0 // S, U.dtype,
                 interpret)
    top = jnp.full((1, n1), fb[1], U.dtype)
    return jnp.concatenate([main, top], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "sgn_u", "off_u", "sgn_v", "off_v", "per_y", "fb", "S", "interpret"))
def predict_y(U, V, dt, h, *, sgn_u, off_u, sgn_v, off_v, per_y,
              fb, S=32, interpret=False):
    """Predicted y-face field of V: (n0, n1+1)."""
    n0, n1 = V.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    kern = functools.partial(
        _kern_y, n0=n0, n1=n1, S=S, H=H, nstrips=n0 // S,
        sgn_v=sgn_v, off_v=off_v, sgn_u=sgn_u, off_u=off_u,
        per_y=per_y, fb_lo=fb[0])
    main = _call(kern, dt, h, V, U, n0, n1, S, H, n0 // S, V.dtype,
                 interpret)
    right = main[:, :1] if per_y else jnp.full((n0, 1), fb[1], V.dtype)
    return jnp.concatenate([main, right], axis=1)
