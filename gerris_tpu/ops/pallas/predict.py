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


def _kern_xy(dt_ref, u_hbm, v_hbm, ox_ref, oy_ref, *rest,
             n0, n1, n1p, S, H, nstrips, sgn_u, off_u, sgn_v, off_v,
             per_y, fbx_lo, fbx_hi, fby_lo, fby_hi, packed, with_div):
    """Both components' predicted MAC faces in ONE launch (the two
    predict kernels share their u/v strip DMAs; launches dominate on the
    remote TPU).  ox rows = x-faces s*S..s*S+S-1; oy = y-faces 0..n1
    (padded width n1p) on the strip rows.
    ``with_div``: also emit the MAC divergence of the predicted field
    (div = sum df / (h dt_proj), odiv) plus per-strip partial sums (osum)
    — the downstream projection's divergence launch folds in here, where
    the faces are already in VMEM (gfs_normal_divergence,
    src/fluid.c:2310)."""
    if with_div:
        odiv, osum, ubuf, vbuf, xstage, sem = rest
    else:
        ubuf, vbuf, xstage, sem = rest
    s = pl.program_id(0)
    W = S + 2 * H
    dt_h = dt_ref[0, 0]
    dscale = dt_ref[0, 1]
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
        # faces soff..soff+S (S+1 rows: the last one is the domain
        # boundary face n0, used only by the last strip in packed mode)
        un = 0.5 * (ua[soff:soff + S + 1, :]
                    + ua[soff + 1:soff + S + 2, :])
        left = vp[soff:soff + S + 1, :]
        right = vm[soff + 1:soff + S + 2, :]
        F = jnp.where(un > 0.0, left,
                      jnp.where(un < 0.0, right, 0.5 * (left + right)))
        if first:
            F = jnp.concatenate(
                [jnp.full_like(F[0:1, :], fbx_lo), F[1:, :]], 0)
        if not packed:
            ox_ref[:, :] = F[0:S, :]
        else:
            # write the PACKX rows this strip owns (zero pads included:
            # the first strip owns rows [0, GP+S), the last
            # [GP+(nstrips-1)S, n0+3GP), interior strips their S rows)
            z8 = jnp.zeros((GP, n1), F.dtype)
            base = GP if first else 0
            if first:
                xstage[0:GP, :] = z8
            xstage[base:base + S, :] = F[0:S, :]
            if last:
                top = jnp.full_like(F[0:1, :], fbx_hi)
                xstage[base + S:base + S + 1, :] = top
                xstage[base + S + 1:base + S + 1 + GP, :] = z8
                xstage[base + S + 1 + GP:base + S + 2 * GP, :] = \
                    z8[1:, :]
                nr = base + S + 2 * GP
                r0 = 0 if first else GP + (nstrips - 1) * S
            elif first:
                nr = GP + S
                r0 = 0
            else:
                nr = S
                r0 = GP + soff_row
            src0 = 0 if (first or last) else base
            cp = pltpu.make_async_copy(
                xstage.at[pl.ds(src0, nr), :],
                ox_ref.at[pl.ds(pl.multiple_of(r0, GP), nr), :],
                sem.at[0])
            cp.start()
            cp.wait()

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
        if with_div:
            # cell (r, j) divergence: F rows r..r+1 (this strip owns
            # faces soff..soff+S), Fy cols j..j+1 with the top face n1
            # being the static value fby_hi (or the periodic wrap)
            Fd = F
            if last:
                Fd = jnp.concatenate(
                    [F[0:S, :], jnp.full_like(F[0:1, :], fbx_hi)], 0)
            dux = Fd[1:S + 1, :] - Fd[0:S, :]
            fcol = Fy[:, 0:1] if per_y else jnp.full_like(Fy[:, 0:1],
                                                          fby_hi)
            duy = jnp.concatenate([Fy[:, 1:n1], fcol], axis=1) - Fy
            dv = (dux + duy) * dscale
            odiv[:, :] = dv
            osum[:, :] = jnp.pad(jnp.sum(dv).reshape(1, 1),
                                 ((0, GP - 1), (0, CP - 1)))
        if not packed:
            oy_ref[:, :] = Fy        # faces 0..n1-1 (width n1)
        else:
            fcol = Fy[:, 0:1] if per_y else jnp.full_like(
                Fy[:, 0:1], fby_hi)
            oy_ref[:, :] = jnp.pad(
                jnp.concatenate([Fy, fcol], axis=1),
                ((0, 0), (0, n1p - (n1 + 1))))

    soff_row = s * S

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
    "packed", "interpret"))
def predict_xy(U, V, dt, h, *, sgn_u, off_u, sgn_v, off_v, per_y,
               fb_x, fb_y, S=64, packed=False, div_scale=None,
               interpret=False):
    """(ufx (n0+1, n1), ufy (n0, n1+1)): both predicted MAC face fields
    in one launch (== predict_x + predict_y).  ``packed=True``: return a
    facepack.FacePack in the kernels' native padded layout instead —
    zero repacking launches downstream.
    ``div_scale``: also emit (div, total) — the MAC divergence of the
    predicted field scaled by div_scale (= 1/(h dt_proj)) and its global
    sum, exactly ``projops.divergence_mac`` of the returned faces — so
    the downstream MAC projection needs no divergence launch."""
    n0, n1 = U.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    with_div = div_scale is not None
    assert not (with_div and packed), "div fold: unpacked layout only"
    from .facepack import FacePack, n1p_of
    n1p = n1p_of(n1) if packed else n1
    kern = functools.partial(
        _kern_xy, n0=n0, n1=n1, n1p=n1p, S=S, H=H, nstrips=n0 // S,
        sgn_u=sgn_u, off_u=off_u, sgn_v=sgn_v, off_v=off_v,
        per_y=per_y, fbx_lo=fb_x[0],
        fbx_hi=0.0 if fb_x[1] is None else fb_x[1],
        fby_lo=0.0 if fb_y[0] is None else fb_y[0],
        fby_hi=0.0 if fb_y[1] is None else fb_y[1], packed=packed,
        with_div=with_div)
    dt_arr = jnp.stack([
        jnp.asarray(dt, U.dtype) / h,
        jnp.asarray(div_scale if with_div else 0.0, U.dtype),
    ]).reshape(1, 2)
    W = S + 2 * H
    nstrips = n0 // S
    if packed:
        ox_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        ox_shape = jax.ShapeDtypeStruct((n0 + 3 * GP, n1), U.dtype)
        xstage_rows = S + 3 * GP
    else:
        ox_spec = pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)
        ox_shape = jax.ShapeDtypeStruct((n0, n1), U.dtype)
        xstage_rows = GP
    out_specs = [ox_spec,
                 pl.BlockSpec((S, n1p), lambda s: (s, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [ox_shape,
                 jax.ShapeDtypeStruct((n0, n1p), U.dtype)]
    if with_div:
        out_specs += [pl.BlockSpec((S, n1), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GP, CP), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((n0, n1), U.dtype),
                      jax.ShapeDtypeStruct((nstrips * GP, CP), U.dtype)]
    out = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.VMEM((xstage_rows, n1), U.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(dt_arr, U, V)
    ox, oy = out[0], out[1]
    if packed:
        return FacePack(x=ox, y=oy, n0=n0, n1=n1)
    top = jnp.full((1, n1), fb_x[1], U.dtype)
    ufx = jnp.concatenate([ox, top], axis=0)
    if per_y:
        ufy = jnp.concatenate([oy, oy[:, :1]], axis=1)
    else:
        ufy = jnp.concatenate(
            [oy, jnp.full((n0, 1), fb_y[1], V.dtype)], axis=1)
    if with_div:
        return ufx, ufy, out[2], jnp.sum(out[3])
    return ufx, ufy
