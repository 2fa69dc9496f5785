"""Single-launch projection auxiliaries.

The MAC/approximate projections spend ~10 XLA kernels each on auxiliary
chains around the multigrid solve (face interpolation, face gradients,
velocity correction, cell-gradient averaging — reference:
gfs_face_interpolated_normal_velocity src/advection.c:546-566,
correct_normal_velocity + gfs_scale_gradients src/timestep.c:60-145).
On the launch-bound remote TPU (~0.3 ms/kernel) these chains cost more
than the solves' arithmetic; each becomes one Pallas launch here.

Layout conventions as ops/pallas/bcg.py: 128-aligned DMA columns,
GP-aligned dynamic row starts, static strip variants under pl.when.
y-face arrays are column-padded to 128 multiples by the wrappers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bcg import GP, CP, _dma


def _ghost_rows_cols(buf, W, cl, ch, sgn, off, per_y, first, last):
    """1-deep ghost columns written in place; returns the row-extended
    value array (cells -1..W)."""
    if per_y:
        buf[:, cl - 1:cl] = buf[:, ch - 1:ch]
        buf[:, ch:ch + 1] = buf[:, cl:cl + 1]
    else:
        buf[:, cl - 1:cl] = sgn[2] * buf[:, cl:cl + 1] + off[2]
        buf[:, ch:ch + 1] = sgn[3] * buf[:, ch - 1:ch] + off[3]
    return jnp.concatenate([
        (sgn[0] * buf[0:1, :] + off[0]) if first else buf[0:1, :],
        buf[0:W, :],
        (sgn[1] * buf[W - 1:W, :] + off[1]) if last else buf[W - 1:W, :],
    ], axis=0)


def _kern_interp(dt_ref, u_hbm, v_hbm, gx_hbm, gy_hbm,
                 ox_ref, oy_ref, ou_ref, ov_ref, *rest,
                 n0, n1, n1p, S, H, nstrips, sgn_u, off_u, sgn_v, off_v,
                 per_y, fbx_lo, fbx_hi, fby, use_gp, packed, with_div):
    """Face-interpolated MAC velocities for both components in one
    launch: ox rows = x-faces s*S..s*S+S-1 (face n0 appended by the
    wrapper); oy = y-faces 0..n1 (padded width n1p).
    ``use_gp``: the cells are first updated u += dt*gx, v += dt*gy (the
    gc pressure-gradient re-add, src/simulation.c:520) and the updated
    cells are emitted as ou/ov — zero extra launches.
    ``with_div``: also emit the MAC divergence (scaled by dt_ref[0,1])
    + per-strip partial sums — the approximate projection's divergence
    launch folds in here where the faces are already in VMEM."""
    if with_div:
        odiv, osum, ubuf, vbuf, gxb, gyb, xstage, sem = rest
    else:
        ubuf, vbuf, gxb, gyb, xstage, sem = rest
    s = pl.program_id(0)
    W = S + 2 * H
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(u_hbm, ubuf, 0, rstart, W, sem.at[0]),
           _dma(v_hbm, vbuf, 0, rstart, W, sem.at[1])]
    if use_gp:
        cps.append(_dma(gx_hbm, gxb, 0, rstart, W, sem.at[2]))
        cps.append(_dma(gy_hbm, gyb, 0, rstart, W, sem.at[3]))
    for cp in cps:
        cp.wait()
    cl, ch = CP, CP + n1
    if use_gp:
        dtv = dt_ref[0, 0]
        ubuf[0:W, cl:ch] = ubuf[0:W, cl:ch] + dtv * gxb[0:W, cl:ch]
        vbuf[0:W, cl:ch] = vbuf[0:W, cl:ch] + dtv * gyb[0:W, cl:ch]

    def body(soff: int, first: bool, last: bool):
        ue = _ghost_rows_cols(ubuf, W, cl, ch, sgn_u, off_u, per_y,
                              first, last)
        ve = _ghost_rows_cols(vbuf, W, cl, ch, sgn_v, off_v, per_y,
                              first, last)
        ua = ue[:, cl:ch]                 # u cells -1..W
        # x-faces f = soff..soff+S: 0.5 (u[f-1] + u[f])
        ux = 0.5 * (ua[soff:soff + S + 1, :]
                    + ua[soff + 1:soff + S + 2, :])
        if first and fbx_lo is not None:
            ux = jnp.concatenate(
                [jnp.full_like(ux[0:1, :], fbx_lo), ux[1:, :]], 0)
        if not packed:
            ox_ref[:, :] = ux[0:S, :]
        else:
            z8 = jnp.zeros((GP, n1), ux.dtype)
            base = GP if first else 0
            if first:
                xstage[0:GP, :] = z8
            xstage[base:base + S, :] = ux[0:S, :]
            if last:
                # None: replicate the last interior face (the plain
                # wrapper's concatenate([ox, ox[-1:]]) semantics)
                top = jnp.full_like(ux[0:1, :], fbx_hi) \
                    if fbx_hi is not None else ux[S - 1:S, :]
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
            cpx = pltpu.make_async_copy(
                xstage.at[pl.ds(0, nr), :],
                ox_ref.at[pl.ds(pl.multiple_of(r0, GP), nr), :],
                sem.at[0])
            cpx.start()
            cpx.wait()
        # y-faces j = 0..n1: 0.5 (v[j-1] + v[j]) on strip rows
        va = ve[soff + 1:soff + S + 1, cl - 1:ch + 1]   # cols -1..n1
        vy = 0.5 * (va[:, 0:n1 + 1] + va[:, 1:n1 + 2])
        if per_y:
            pass
        else:
            cidx = jax.lax.broadcasted_iota(jnp.int32, vy.shape, 1)
            if fby[0] is not None:
                vy = jnp.where(cidx == 0, fby[0], vy)
            if fby[1] is not None:
                vy = jnp.where(cidx == n1, fby[1], vy)
        oy_ref[:, :] = jnp.pad(vy, ((0, 0), (0, n1p - (n1 + 1))))
        if with_div:
            # cell (r, j) divergence from the faces just built; face n0
            # follows the wrapper's append semantics (fbx_hi, or the
            # replicated last interior face when fbx_hi is None)
            Fd = ux
            if last:
                topv = jnp.full_like(ux[0:1, :], fbx_hi) \
                    if fbx_hi is not None else ux[S - 1:S, :]
                Fd = jnp.concatenate([ux[0:S, :], topv], 0)
            dux = Fd[1:S + 1, :] - Fd[0:S, :]
            duy = vy[:, 1:n1 + 1] - vy[:, 0:n1]
            dv = (dux + duy) * dt_ref[0, 1]
            odiv[:, :] = dv
            osum[:, :] = jnp.pad(jnp.sum(dv).reshape(1, 1),
                                 ((0, GP - 1), (0, CP - 1)))
        if use_gp:
            ou_ref[:, :] = ubuf[soff:soff + S, cl:ch]
            ov_ref[:, :] = vbuf[soff:soff + S, cl:ch]

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
    "sgn_u", "off_u", "sgn_v", "off_v", "per_y", "fbx", "fby", "S",
    "packed", "interpret"))
def interp_faces(U, V, gp=None, dtv=None, *, sgn_u, off_u, sgn_v, off_v,
                 per_y, fbx, fby, S=128, packed=False, div_scale=None,
                 interpret=False):
    """(ufx, ufy[, U2, V2][, div, total]) face-interpolated MAC field
    from centred velocities with the Dirichlet face BCs applied
    (face_interpolated_velocity, solvers/projection.py).
    With ``gp=(Gx, Gy)`` and ``dtv``: the cells are updated
    u += dtv*Gx first (the gc gradient re-add) and the updated cells
    are also returned.
    ``div_scale``: also emit (div, total) — ``projops.divergence_mac``
    of the returned faces with scale 1/(h dt_proj) — so the downstream
    projection needs no divergence launch."""
    n0, n1 = U.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    with_div = div_scale is not None
    assert not (with_div and packed), "div fold: unpacked layout only"
    n1p = n1 + 1 + ((-(n1 + 1)) % CP)
    from .facepack import FacePack
    use_gp = gp is not None
    kern = functools.partial(
        _kern_interp, n0=n0, n1=n1, n1p=n1p, S=S, H=H, nstrips=n0 // S,
        sgn_u=sgn_u, off_u=off_u, sgn_v=sgn_v, off_v=off_v, per_y=per_y,
        fbx_lo=fbx[0], fbx_hi=fbx[1], fby=fby, use_gp=use_gp,
        packed=packed, with_div=with_div)
    W = S + 2 * H
    nstrips = n0 // S
    z = jnp.zeros((GP, n1), U.dtype)
    gx_in, gy_in = gp if use_gp else (z, z)
    dt_arr = jnp.stack([
        jnp.asarray(dtv if dtv is not None else 0.0, U.dtype),
        jnp.asarray(div_scale if with_div else 0.0, U.dtype),
    ]).reshape(1, 2)
    cs = S if use_gp else GP
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
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((cs, n1), lambda s: (s, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((cs, n1), lambda s: (s, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [ox_shape,
                 jax.ShapeDtypeStruct((n0, n1p), U.dtype),
                 jax.ShapeDtypeStruct((cs * nstrips, n1), U.dtype),
                 jax.ShapeDtypeStruct((cs * nstrips, n1), U.dtype)]
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.VMEM((W, CP + n1 + CP), U.dtype),
            pltpu.VMEM((W if use_gp else GP, CP + n1 + CP), U.dtype),
            pltpu.VMEM((W if use_gp else GP, CP + n1 + CP), U.dtype),
            pltpu.VMEM((xstage_rows, n1), U.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(dt_arr, U, V, gx_in, gy_in)
    ox, oy, ou, ov = out[:4]
    divs = (out[4], jnp.sum(out[5])) if with_div else ()
    if packed:
        uf_out = FacePack(x=ox, y=oy, n0=n0, n1=n1)
        if use_gp:
            return uf_out, ou, ov
        return uf_out
    top = jnp.full((1, n1), 0.0 if fbx[1] is None else fbx[1], U.dtype)
    ufx = jnp.concatenate([ox, top], axis=0) if fbx[1] is not None \
        else jnp.concatenate([ox, ox[-1:, :]], axis=0)
    if use_gp:
        return (ufx, oy[:, :n1 + 1], ou, ov) + divs
    return (ufx, oy[:, :n1 + 1]) + divs


def _kern_div(sc_ref, ux_hbm, uy_hbm, odiv, osum, uxb, uyb, sem, *,
              n0, n1, S, nstrips):
    """MAC divergence / dt + per-strip partial sums in one launch
    (gfs_normal_divergence + the pure-Neumann compatibility mean,
    src/fluid.c:2310 + src/simulation.c:2156-2186)."""
    s = pl.program_id(0)
    start = pl.multiple_of(s * S, GP)
    cps = [_dma(ux_hbm, uxb, 0, start, S + 2 * GP, sem.at[0]),
           _dma(uy_hbm, uyb, 0, start, S, sem.at[1])]
    for cp in cps:
        cp.wait()
    scale = sc_ref[0, 0]              # 1 / (h dt)
    # ufx arrives GP-row-padded (face k at padded row k + GP); the DMA
    # window starts at `start`, so buffer row i = face start + i - GP
    # and cell r (global start + r) has faces at rows r + GP, r + GP + 1
    ux = uxb[:, CP:CP + n1]
    dux = ux[GP + 1:GP + S + 1, :] - ux[GP:GP + S, :]
    uy = uyb[:, CP:CP + n1 + 1]
    duy = uy[:, 1:n1 + 1] - uy[:, 0:n1]
    div = (dux + duy[0:S, :]) * scale
    odiv[:, :] = div
    part = jnp.sum(div)
    osum[:, :] = jnp.pad(part.reshape(1, 1), ((0, GP - 1), (0, CP - 1)))


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def divergence_mac(ufx, ufy, dt, h, *, S=256, interpret=False):
    """(div, total): div = MAC divergence / dt and its global sum, in
    one pass (the caller forms the compatibility mean as
    total / ncells).  ``ufx`` may be a facepack.FacePack (native padded
    layout, zero repacking)."""
    from .facepack import FacePack
    if isinstance(ufx, FacePack):
        fp = ufx
        n0, n1 = fp.n0, fp.n1
        uxp, uyp = fp.x, fp.y
        n1p = uyp.shape[1]
        if n0 % S:
            S = n0
        nstrips = n0 // S
        sc = (1.0 / (jnp.asarray(dt, uxp.dtype) * h)).reshape(1, 1)
        kern = functools.partial(_kern_div, n0=n0, n1=n1, S=S,
                                 nstrips=nstrips)
        div, parts = pl.pallas_call(
            kern,
            grid=(nstrips,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(pl.BlockSpec((S, n1), lambda s: (s, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((GP, CP), lambda s: (s, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((n0, n1), uxp.dtype),
                       jax.ShapeDtypeStruct((nstrips * GP, CP),
                                            uxp.dtype)),
            scratch_shapes=[
                pltpu.VMEM((S + 2 * GP, CP + n1 + CP), uxp.dtype),
                pltpu.VMEM((S, CP + n1p + CP), uxp.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(sc, uxp, uyp)
        return div, jnp.sum(parts)
    n0, n1 = ufx.shape[0] - 1, ufx.shape[1]
    if n0 % S:
        S = n0
    nstrips = n0 // S
    uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
    n1p = n1 + 1 + ((-(n1 + 1)) % CP)
    uyp = jnp.pad(ufy, ((0, 0), (0, n1p - (n1 + 1))))
    sc = (1.0 / (jnp.asarray(dt, ufx.dtype) * h)).reshape(1, 1)
    kern = functools.partial(_kern_div, n0=n0, n1=n1, S=S,
                             nstrips=nstrips)
    div, parts = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((GP, CP), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n0, n1), ufx.dtype),
                   jax.ShapeDtypeStruct((nstrips * GP, CP), ufx.dtype)),
        scratch_shapes=[
            pltpu.VMEM((S + 2 * GP, CP + n1 + CP), ufx.dtype),
            pltpu.VMEM((S, CP + n1p + CP), ufx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sc, uxp, uyp)
    return div, jnp.sum(parts)


def _kern_correct(dt_ref, p_hbm, ux_hbm, uy_hbm, uc_hbm, vc_hbm,
                  oux, ouy, ogx, ogy, ouc, ovc,
                  pbuf, uxb, uyb, ucb, vcb, xstage, sem, *,
                  n0, n1, n1p, S, H, nstrips, sgn, off, per_y,
                  with_cells, packed):
    """Projection correction in one launch: face gradients of p,
    uf -= dt * grad_f p, and the cell gradient (mean of the two faces).
    ``ux`` input arrives GP-row-padded (face k at row k+GP) like bcg."""
    s = pl.program_id(0)
    W = S + 2 * H
    dt_h = dt_ref[0, 0]               # dt / h
    ih = dt_ref[0, 1]                 # 1 / h
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(p_hbm, pbuf, 0, rstart, W, sem.at[0]),
           _dma(ux_hbm, uxb, 0, rstart, W + 2 * GP, sem.at[1]),
           _dma(uy_hbm, uyb, 0, rstart, W, sem.at[2])]
    if with_cells:
        cps.append(_dma(uc_hbm, ucb, 0, rstart, W, sem.at[3]))
        cps.append(_dma(vc_hbm, vcb, 0, rstart, W, sem.at[4]))
    for cp in cps:
        cp.wait()
    cl, ch = CP, CP + n1

    def body(soff: int, first: bool, last: bool):
        pe = _ghost_rows_cols(pbuf, W, cl, ch, sgn, off, per_y,
                              first, last)
        pa = pe[:, cl:ch]             # p cells -1..W
        # x-face gradients at faces soff..soff+S: (p[f] - p[f-1])/h
        gfx = (pa[soff + 1:soff + S + 2, :]
               - pa[soff:soff + S + 1, :]) * ih
        ux = uxb[soff + GP:soff + GP + S + 1, cl:ch]
        ux_new = ux - (dt_h / ih) * gfx     # = uf - dt * grad_f p
        if not packed:
            oux[:, :] = ux_new[0:S, :]
        else:
            z8 = jnp.zeros((GP, n1), ux_new.dtype)
            base = GP if first else 0
            if first:
                xstage[0:GP, :] = z8
            xstage[base:base + S, :] = ux_new[0:S, :]
            if last:
                # ux_new[S] IS the domain face n0 (ghost-p gradient)
                xstage[base + S:base + S + 1, :] = ux_new[S:S + 1, :]
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
            cpx = pltpu.make_async_copy(
                xstage.at[pl.ds(0, nr), :],
                oux.at[pl.ds(pl.multiple_of(r0, GP), nr), :],
                sem.at[0])
            cpx.start()
            cpx.wait()
        # last x-face of the strip -> gx needs both faces
        ogx[:, :] = 0.5 * (gfx[0:S, :] + gfx[1:S + 1, :])
        # y faces 0..n1 on strip rows
        pr = pe[soff + 1:soff + S + 1, cl - 1:ch + 1]
        gfy = (pr[:, 1:n1 + 2] - pr[:, 0:n1 + 1]) * ih
        uy = uyb[soff:soff + S, CP:CP + n1 + 1]
        uy_new = uy - (dt_h / ih) * gfy
        ouy[:, :] = jnp.pad(uy_new, ((0, 0), (0, n1p - (n1 + 1))))
        gcy = 0.5 * (gfy[:, 0:n1] + gfy[:, 1:n1 + 1])
        ogy[:, :] = gcy
        if with_cells:
            # centred velocity correction u -= dt * g_cell in the same
            # launch (gfs_correct_centered_velocities,
            # src/timestep.c:509-530)
            gcx = 0.5 * (gfx[0:S, :] + gfx[1:S + 1, :])
            ouc[:, :] = ucb[soff:soff + S, cl:ch] - (dt_h / ih) * gcx
            ovc[:, :] = vcb[soff:soff + S, cl:ch] - (dt_h / ih) * gcy

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
    "sgn", "off", "per_y", "S", "packed", "interpret"))
def correct_project(p, ufx, ufy, dt, h, cells=None, *, sgn, off, per_y,
                    S=128, packed=False, interpret=False):
    """(ufx', ufy', gx, gy): the post-solve correction of one projection
    — face gradients of p with static-BC ghosts, uf -= dt grad p, and
    the cell-centred gradient (face mean).  Unit alpha (fallback: jnp
    path in solvers/projection.py).

    Note the LAST x-face row (face n0) of ufx' comes from the strip that
    owns face n0 via the appended tail (sgn/off ghosts make grad at the
    boundary face consistent).
    ``cells=(U, V)``: also apply the centred correction u -= dt*g_cell
    in the same launch and return (..., U', V')."""
    n0, n1 = p.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S, H = n0, 0
    from .facepack import FacePack
    n1p = n1 + 1 + ((-(n1 + 1)) % CP)
    if isinstance(ufx, FacePack):
        uxp, uyp = ufx.x, ufx.y
    else:
        uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
        uyp = jnp.pad(ufy, ((0, 0), (0, n1p - (n1 + 1))))
    dt_arr = jnp.stack([jnp.asarray(dt, p.dtype) / h,
                        jnp.asarray(1.0, p.dtype) / h]).reshape(1, 2)
    with_cells = cells is not None
    kern = functools.partial(
        _kern_correct, n0=n0, n1=n1, n1p=n1p, S=S, H=H, nstrips=n0 // S,
        sgn=sgn, off=off, per_y=per_y, with_cells=with_cells,
        packed=packed)
    W = S + 2 * H
    z = jnp.zeros((GP, n1), p.dtype)
    uc_in, vc_in = cells if with_cells else (z, z)
    cs = S if with_cells else GP
    if packed:
        oux_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        oux_shape = jax.ShapeDtypeStruct((n0 + 3 * GP, n1), p.dtype)
        xstage_rows = S + 3 * GP
    else:
        oux_spec = pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)
        oux_shape = jax.ShapeDtypeStruct((n0, n1), p.dtype)
        xstage_rows = GP
    oux, ouy, ogx, ogy, ouc, ovc = pl.pallas_call(
        kern,
        grid=(n0 // S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=(oux_spec,
                   pl.BlockSpec((S, n1p), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((S, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((cs, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((cs, n1), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(oux_shape,
                   jax.ShapeDtypeStruct((n0, n1p), p.dtype),
                   jax.ShapeDtypeStruct((n0, n1), p.dtype),
                   jax.ShapeDtypeStruct((n0, n1), p.dtype),
                   jax.ShapeDtypeStruct((cs * (n0 // S), n1), p.dtype),
                   jax.ShapeDtypeStruct((cs * (n0 // S), n1), p.dtype)),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), p.dtype),
            pltpu.VMEM((W + 2 * GP, CP + n1 + CP), p.dtype),
            pltpu.VMEM((W, CP + n1p + CP), p.dtype),
            pltpu.VMEM((W if with_cells else GP, CP + n1 + CP),
                       p.dtype),
            pltpu.VMEM((W if with_cells else GP, CP + n1 + CP),
                       p.dtype),
            pltpu.VMEM((xstage_rows, n1), p.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(dt_arr, p, uxp, uyp, uc_in, vc_in)
    if packed:
        uf_out = FacePack(x=oux, y=ouy, n0=n0, n1=n1)
        if with_cells:
            return uf_out, ogx, ogy, ouc, ovc
        return uf_out, ogx, ogy
    # face n0 of ufx: grad = (ghost - p[n0-1])/h with sgn/off ghosts
    ufx_pl = ufx.unpack()[0] if isinstance(ufx, FacePack) else ufx
    pg = sgn[1] * p[-1:, :] + off[1]
    gtop = (pg - p[-1:, :]) / h
    uftop = ufx_pl[-1:, :] - dt * gtop
    ufx_new = jnp.concatenate([oux, uftop], axis=0)
    if with_cells:
        return ufx_new, ouy[:, :n1 + 1], ogx, ogy, ouc, ovc
    return ufx_new, ouy[:, :n1 + 1], ogx, ogy
