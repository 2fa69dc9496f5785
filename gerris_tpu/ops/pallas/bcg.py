"""Fused BCG advection as a Pallas TPU kernel.

The corrector advection (BCG face values on both axes + transverse
terms + upwind selection + gmac face correction + conservative flux
difference) is the profiled hot spot of the NS step after the multigrid
smoother went to Pallas (round-1 VERDICT "Weak #1"; reference kernels:
gfs_cell_advected_face_values src/advection.c:58-99 with
transverse_term:30-47, gfs_face_upwinded_value:267-345,
gfs_face_advection_flux:356-385).  The jnp path materialises ~10
intermediates per field through HBM; this kernel reads each row-strip of
(v, ufx, ufy, g) into VMEM once (with halos) and writes only the
increment fv — one HBM pass per advected field.

Scope (the production TPU fast path; anything else falls back to the
jnp path in solvers/advection.py):
  * 2D, centred (unlimited) slope, Godunov scheme — the reference
    defaults (gfs_advection_params_init, src/advection.c:924-948);
  * x-BCs non-periodic with static values; y-BCs periodic or static;
  * BC encoding per side: ghost = sign * mirror + off
    (sign -1 / off 2b: Dirichlet b; sign +1 / off 0: Neumann-0).

Index model (non-periodic rows): strip s owns global cell rows
[b, b+S), b = s*S; the VMEM window holds rows [rstart, rstart+W),
rstart = clip(b-H, 0, n0-W) (GP-aligned), soff = b - rstart.  Mosaic
has no dynamic_slice on values, so the kernel body is instantiated
three times under pl.when — first / interior / last strip — which makes
soff (0 / H / 2H) and the first/last edge handling fully static.
x-faces arrive GP-padded (face k at row k+GP) so the face DMA stays
row-aligned (the axon compile helper requires pl.multiple_of(..., 8)
row offsets and 128-aligned DMA destination columns).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GP = 8    # f32 sublane alignment
CP = 128  # lane alignment for DMA destination columns


def _dma(src, dst, dst_row0, start, nrows, sem):
    """Issue one HBM->VMEM row-window copy (returned unwaited so all
    windows stream concurrently)."""
    s = pl.multiple_of(start, GP)
    cp = pltpu.make_async_copy(
        src.at[pl.ds(s, nrows), :],
        dst.at[pl.ds(dst_row0, nrows), pl.ds(CP, src.shape[1])], sem)
    cp.start()
    return cp


def _advect_core(s, dt_ref, vb, uxb, uyb, gb, gpb, out_ref, *,
                 n0, n1, S, H, nstrips, sgn, off, per_y, fb_x, fb_y,
                 use_g, use_gp, use_os, rr_refs=None):
    """Everything after the DMAs for ONE advected field (ghost fill +
    the strip body) — shared by the single-field kernel and the U+V
    pair kernel (which reuses the ux/uy buffers across fields).
    ``rr_refs=(or1, or2)``: diffusion-chain fold — out_ref receives the
    RESIDUAL r0 = rhs - L(v) + dia*v of the implicit-diffusion system
    at initial guess v (rhs being the oscale epilogue's output), and
    or1/or2 its two mean-pool restrictions: the whole
    residual_restrict_pair launch of solvers/poisson.solve_fixed_batched
    folds in here, where v and its BC ghosts are already in VMEM
    (reference: residual_set2D, src/poisson.c:657)."""
    W = S + 2 * H
    dt_h = dt_ref[0, 0]               # dt / h
    gscale = dt_ref[0, 1]             # h / 2 (g prescale, in-kernel)
    dt_full = dt_ref[0, 2]            # dt (for the cell-wise gp term)
    oscale = dt_ref[0, 3]             # output scale (rhs mode)
    if rr_refs is not None:           # (1, 6) dt_arr: pair wrapper only
        dia = dt_ref[0, 4]            # rr fold: Helmholtz diagonal
        inv_h2 = dt_ref[0, 5]         # rr fold: 1 / h^2
    cl, ch = CP, CP + n1

    # ---- ghost columns of v (y BCs), 2 deep, written into vb so the
    # extended array inherits them
    if per_y:
        vb[:, cl - 1:cl] = vb[:, ch - 1:ch]
        vb[:, cl - 2:cl - 1] = vb[:, ch - 2:ch - 1]
        vb[:, ch:ch + 1] = vb[:, cl:cl + 1]
        vb[:, ch + 1:ch + 2] = vb[:, cl + 1:cl + 2]
    else:
        vb[:, cl - 1:cl] = sgn[2] * vb[:, cl:cl + 1] + off[2]
        vb[:, cl - 2:cl - 1] = sgn[2] * vb[:, cl + 1:cl + 2] + off[2]
        vb[:, ch:ch + 1] = sgn[3] * vb[:, ch - 1:ch] + off[3]
        vb[:, ch + 1:ch + 2] = sgn[3] * vb[:, ch - 2:ch - 1] + off[3]

    def body(soff: int, first: bool, last: bool):
        """Everything below uses STATIC soff/first/last."""
        # extended v: row i = extended cell row i-2, i in 0..W+3
        ve = jnp.concatenate([
            (sgn[0] * vb[1:2, :] + off[0]) if first else vb[0:1, :],
            (sgn[0] * vb[0:1, :] + off[0]) if first else vb[0:1, :],
            vb[0:W, :],
            (sgn[1] * vb[W - 1:W, :] + off[1]) if last else vb[W - 1:W, :],
            (sgn[1] * vb[W - 2:W - 1, :] + off[1]) if last
            else vb[W - 1:W, :],
        ], axis=0)                    # (W+4, CP + n1 + CP)

        # advecting cell velocities (mac_cell_mean: face mean, domain
        # edges replicated = the jnp path's mode="edge")
        ux = uxb[:, cl:ch]            # row i = face rstart - GP + i
        ucx_raw = 0.5 * (ux[GP - 1:GP + W + 1, :]
                         + ux[GP:GP + W + 2, :])     # cells -1..W
        ucx_ext = jnp.concatenate([
            ucx_raw[1:2, :] if first else ucx_raw[0:1, :],
            ucx_raw[1:W + 1, :],
            ucx_raw[W:W + 1, :] if last else ucx_raw[W + 1:W + 2, :],
        ], axis=0)                    # index i = cell i-1, i in 0..W+1

        uy = uyb[:, CP:CP + n1 + 1]   # (W, n1+1) faces
        ucy_core = 0.5 * (uy[:, 0:n1] + uy[:, 1:n1 + 1])
        ucy_ext = jnp.concatenate([ucy_core[0:1, :], ucy_core,
                                   ucy_core[W - 1:W, :]], axis=0)
        ucy_extc = jnp.concatenate([ucy_ext[:, 0:1], ucy_ext,
                                    ucy_ext[:, n1 - 1:n1]], axis=1)

        # ========== x-axis face values (cells -1..W: W+2 rows) ==========
        gx = 0.5 * (ve[2:W + 4, cl:ch] - ve[0:W + 2, cl:ch])
        vcc = ve[1:W + 3, cl:ch]
        unx = dt_h * ucx_ext
        vpx = vcc + jnp.minimum((1.0 - unx) / 2.0, 0.5) * gx
        vmx = vcc + jnp.maximum((-1.0 - unx) / 2.0, -0.5) * gx
        dup = ve[1:W + 3, cl:ch] - ve[1:W + 3, cl - 1:ch - 1]
        ddn = ve[1:W + 3, cl + 1:ch + 1] - ve[1:W + 3, cl:ch]
        ucy_c = ucy_extc[:, 1:n1 + 1]
        gdiff = jnp.where(ucy_c > 0.0, dup,
                          jnp.where(ucy_c < 0.0, ddn, 0.0))
        dvx = dt_h * ucy_c * gdiff / 2.0
        vpx = vpx - dvx
        vmx = vmx - dvx
        # upwind at local faces soff..soff+S (face f: cells f-1 | f)
        left = vpx[soff:soff + S + 1, :]
        right = vmx[soff + 1:soff + S + 2, :]
        unf = ux[soff + GP:soff + GP + S + 1, :]
        Fx = jnp.where(unf > 0.0, left,
                       jnp.where(unf < 0.0, right,
                                 0.5 * (left + right)))
        if use_g:
            gc = gscale * gb[:, cl:ch]
            ge = jnp.concatenate([gc[0:1, :], gc[0:W, :],
                                  gc[W - 1:W, :]], axis=0)
            Fx = Fx - dt_h * 0.5 * (ge[soff:soff + S + 1, :]
                                    + ge[soff + 1:soff + S + 2, :])
        if fb_x is not None:
            if first and fb_x[0] is not None:
                Fx = jnp.concatenate(
                    [jnp.full_like(Fx[0:1, :], fb_x[0]), Fx[1:, :]], 0)
            if last and fb_x[1] is not None:
                Fx = jnp.concatenate(
                    [Fx[0:S, :], jnp.full_like(Fx[S:S + 1, :],
                                               fb_x[1])], 0)
        flx = unf * Fx
        fv = -dt_h * (flx[1:S + 1, :] - flx[0:S, :])

        # ========== y-axis face values (strip rows only) ==========
        vr = ve[soff + 2:soff + S + 2, cl - 1:ch + 1]   # cols -1..n1
        gy = 0.5 * (ve[soff + 2:soff + S + 2, cl:ch + 2]
                    - ve[soff + 2:soff + S + 2, cl - 2:ch])
        ucys = jnp.concatenate([
            ucy_core[soff:soff + S, 0:1],
            ucy_core[soff:soff + S, :],
            ucy_core[soff:soff + S, n1 - 1:n1]], axis=1)
        uny = dt_h * ucys
        vpy = vr + jnp.minimum((1.0 - uny) / 2.0, 0.5) * gy
        vmy = vr + jnp.maximum((-1.0 - uny) / 2.0, -0.5) * gy
        up_x = ve[soff + 2:soff + S + 2, cl - 1:ch + 1] \
            - ve[soff + 1:soff + S + 1, cl - 1:ch + 1]
        dn_x = ve[soff + 3:soff + S + 3, cl - 1:ch + 1] \
            - ve[soff + 2:soff + S + 2, cl - 1:ch + 1]
        ucx_r = ucx_ext[soff + 1:soff + S + 1, :]
        ucx_e = jnp.concatenate([ucx_r[:, 0:1], ucx_r,
                                 ucx_r[:, n1 - 1:n1]], axis=1)
        gdiffy = jnp.where(ucx_e > 0.0, up_x,
                           jnp.where(ucx_e < 0.0, dn_x, 0.0))
        dvy = dt_h * ucx_e * gdiffy / 2.0
        vpy = vpy - dvy
        vmy = vmy - dvy
        lefty = vpy[:, 0:n1 + 1]
        righty = vmy[:, 1:n1 + 2]
        uys = uy[soff:soff + S, :]
        Fy = jnp.where(uys > 0.0, lefty,
                       jnp.where(uys < 0.0, righty,
                                 0.5 * (lefty + righty)))
        if use_g:
            gs = gscale * gb[soff:soff + S, cl:ch]
            gey = jnp.concatenate([gs[:, 0:1], gs, gs[:, n1 - 1:n1]],
                                  axis=1)
            Fy = Fy - dt_h * 0.5 * (gey[:, 0:n1 + 1] + gey[:, 1:n1 + 2])
        if fb_y is not None and (fb_y[0] is not None
                                 or fb_y[1] is not None):
            cidx = jax.lax.broadcasted_iota(jnp.int32, Fy.shape, 1)
            if fb_y[0] is not None:
                Fy = jnp.where(cidx == 0, fb_y[0], Fy)
            if fb_y[1] is not None:
                Fy = jnp.where(cidx == n1, fb_y[1], Fy)
        fly = uys * Fy
        total = fv - dt_h * (fly[:, 1:n1 + 1] - fly[:, 0:n1])
        # optional folds (the momentum-rhs epilogue of
        # velocity_advection_diffusion: fv -= dt*g_prev, then the
        # diffusion system rhs -(v + fv) * dia — zero extra launches)
        if use_gp:
            total = total - dt_full * gpb[soff:soff + S, cl:ch]
        if use_os:
            total = oscale * (vb[soff:soff + S, cl:ch] + total)
        if rr_refs is not None:
            # r0 of (L - dia) u = rhs at u = v, plus the 2-level
            # restriction pyramid — exactly rbgs._rr_core with sub=0.
            # ve row i = cell i-2; strip cells soff..soff+S-1; the
            # 1-deep BC ghosts use the same sgn/off encoding the
            # diffusion solve derives from the same FieldBC.
            from .rbgs import _lane_pool, _row_pool
            c = ve[soff + 2:soff + S + 2, cl:ch]
            nbr = (ve[soff + 1:soff + S + 1, cl:ch]
                   + ve[soff + 3:soff + S + 3, cl:ch]
                   + ve[soff + 2:soff + S + 2, cl - 1:ch - 1]
                   + ve[soff + 2:soff + S + 2, cl + 1:ch + 1])
            r0 = total - (nbr - 4.0 * c) * inv_h2 + dia * c
            r1 = _lane_pool(_row_pool(r0))
            out_ref[:, :] = r0
            rr_refs[0][:, :] = r1
            rr_refs[1][:, :] = _lane_pool(_row_pool(r1))
        else:
            out_ref[:, :] = total

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




def _kernel(dt_ref, v_hbm, ux_hbm, uy_hbm, g_hbm, gp_hbm, out_ref,
            vb, uxb, uyb, gb, gpb, sem, *,
            n0, n1, S, H, nstrips, sgn, off, per_y, fb_x, fb_y, use_g,
            use_gp, use_os):
    s = pl.program_id(0)
    W = S + 2 * H
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(v_hbm, vb, 0, rstart, W, sem.at[0]),
           _dma(ux_hbm, uxb, 0, rstart, W + 2 * GP, sem.at[1]),
           _dma(uy_hbm, uyb, 0, rstart, W, sem.at[2])]
    if use_g:
        cps.append(_dma(g_hbm, gb, 0, rstart, W, sem.at[3]))
    if use_gp:
        cps.append(_dma(gp_hbm, gpb, 0, rstart, W, sem.at[4]))
    for cp in cps:
        cp.wait()

    _advect_core(s, dt_ref, vb, uxb, uyb, gb, gpb, out_ref,
                 n0=n0, n1=n1, S=S, H=H, nstrips=nstrips, sgn=sgn,
                 off=off, per_y=per_y, fb_x=fb_x, fb_y=fb_y,
                 use_g=use_g, use_gp=use_gp, use_os=use_os)


def _kernel_pair(dt_ref, v0_hbm, v1_hbm, ux_hbm, uy_hbm, g0_hbm,
                 g1_hbm, gp0_hbm, gp1_hbm, o0_ref, o1_ref, *rest,
                 n0, n1, S, H, nstrips, per_y,
                 sgn0, off0, fb_x0, fb_y0, sgn1, off1, fb_x1, fb_y1,
                 use_g, use_gp, use_os, with_rr=False):
    """Both velocity components' BCG corrector advections in ONE launch
    sharing the MAC-face DMAs (round-3 lever (c): the U and V advect2d
    calls of the batched-diffusion fast path read identical ufx/ufy).
    ``with_rr``: o0/o1 become the diffusion residuals r0 and four extra
    outputs carry the restriction pyramids (see _advect_core)."""
    if with_rr:
        (o01_ref, o02_ref, o11_ref, o12_ref,
         v0b, v1b, uxb, uyb, g0b, g1b, gp0b, gp1b, sem) = rest
        rr0, rr1 = (o01_ref, o02_ref), (o11_ref, o12_ref)
    else:
        v0b, v1b, uxb, uyb, g0b, g1b, gp0b, gp1b, sem = rest
        rr0 = rr1 = None
    s = pl.program_id(0)
    W = S + 2 * H
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    cps = [_dma(v0_hbm, v0b, 0, rstart, W, sem.at[0]),
           _dma(v1_hbm, v1b, 0, rstart, W, sem.at[1]),
           _dma(ux_hbm, uxb, 0, rstart, W + 2 * GP, sem.at[2]),
           _dma(uy_hbm, uyb, 0, rstart, W, sem.at[3])]
    if use_g:
        cps.append(_dma(g0_hbm, g0b, 0, rstart, W, sem.at[4]))
        cps.append(_dma(g1_hbm, g1b, 0, rstart, W, sem.at[5]))
    if use_gp:
        cps.append(_dma(gp0_hbm, gp0b, 0, rstart, W, sem.at[6]))
        cps.append(_dma(gp1_hbm, gp1b, 0, rstart, W, sem.at[7]))
    for cp in cps:
        cp.wait()
    _advect_core(s, dt_ref, v0b, uxb, uyb, g0b, gp0b, o0_ref,
                 n0=n0, n1=n1, S=S, H=H, nstrips=nstrips, sgn=sgn0,
                 off=off0, per_y=per_y, fb_x=fb_x0, fb_y=fb_y0,
                 use_g=use_g, use_gp=use_gp, use_os=use_os,
                 rr_refs=rr0)
    _advect_core(s, dt_ref, v1b, uxb, uyb, g1b, gp1b, o1_ref,
                 n0=n0, n1=n1, S=S, H=H, nstrips=nstrips, sgn=sgn1,
                 off=off1, per_y=per_y, fb_x=fb_x1, fb_y=fb_y1,
                 use_g=use_g, use_gp=use_gp, use_os=use_os,
                 rr_refs=rr1)


@functools.partial(
    jax.jit, static_argnames=("h", "h2", "sgns", "offs", "per_y",
                              "fbxs", "fbys", "S", "interpret"))
def advect2d_pair(v0, v1, ufx, ufy, dt, h, g0=None, g1=None,
                  gp0=None, gp1=None, oscale=None, rr_dia=None,
                  h2=None, *,
                  sgns, offs, per_y=False, fbxs=(None, None),
                  fbys=(None, None), S=64, interpret=False):
    """Both velocity components' advection increments in ONE launch
    sharing the MAC-face DMAs (round-3 lever (c)).  Per-field statics:
    ``sgns``/``offs``/``fbxs``/``fbys`` are (field0, field1) tuples of
    the advect2d encodings.  g/gp/oscale folds as in advect2d, applied
    to both fields (either both give g or neither, same for gp).
    ``rr_dia`` (+ static ``h2``, requires oscale): diffusion-chain
    fold — returns ([r0_0, r0_1], [r1_0, r1_1], [r2_0, r2_1]), the
    exact residual_restrict_pair of the two implicit-diffusion systems
    at initial guess (v0, v1), replacing that launch (round-4 lever)."""
    n0, n1 = v0.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S = n0
        H = 0
    with_rr = rr_dia is not None
    assert not with_rr or (oscale is not None and h2 is not None
                           and S % 4 == 0)
    W = S + 2 * H
    nstrips = n0 // S
    uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
    ypad = (-(n1 + 1)) % CP
    uyp = jnp.pad(ufy, ((0, 0), (0, ypad))) if ypad else ufy
    dt_arr = jnp.stack([
        jnp.asarray(dt, v0.dtype) / h,
        jnp.asarray(h, v0.dtype) / 2.0,
        jnp.asarray(dt, v0.dtype),
        jnp.asarray(0.0 if oscale is None else oscale, v0.dtype),
        jnp.asarray(0.0 if rr_dia is None else rr_dia, v0.dtype),
        jnp.asarray(1.0 / h2 if h2 is not None else 0.0, v0.dtype),
    ]).reshape(1, 6)
    use_g = g0 is not None
    use_gp = gp0 is not None
    use_os = oscale is not None
    zg = jnp.zeros((GP, n1), v0.dtype)
    kern = functools.partial(
        _kernel_pair, n0=n0, n1=n1, S=S, H=H, nstrips=nstrips,
        per_y=per_y,
        sgn0=tuple(sgns[0]), off0=tuple(offs[0]),
        fb_x0=fbxs[0], fb_y0=fbys[0],
        sgn1=tuple(sgns[1]), off1=tuple(offs[1]),
        fb_x1=fbxs[1], fb_y1=fbys[1],
        use_g=use_g, use_gp=use_gp, use_os=use_os, with_rr=with_rr)
    vmem = lambda rows: pltpu.VMEM((rows, CP + n1 + CP), v0.dtype)
    o_spec = lambda m: pl.BlockSpec((S // m, n1 // m), lambda s: (s, 0),
                                    memory_space=pltpu.VMEM)
    o_shape = lambda m: jax.ShapeDtypeStruct((n0 // m, n1 // m),
                                             v0.dtype)
    out_specs = [o_spec(1), o_spec(1)]
    out_shape = [o_shape(1), o_shape(1)]
    if with_rr:
        out_specs += [o_spec(2), o_spec(4), o_spec(2), o_spec(4)]
        out_shape += [o_shape(2), o_shape(4), o_shape(2), o_shape(4)]
    out = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 8,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            vmem(W), vmem(W),                                 # v0, v1
            pltpu.VMEM((W + 2 * GP, CP + n1 + CP), v0.dtype),  # ufx
            pltpu.VMEM((W, CP + n1 + 1 + ypad + CP), v0.dtype),  # ufy
            vmem(W if use_g else GP), vmem(W if use_g else GP),
            vmem(W if use_gp else GP), vmem(W if use_gp else GP),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        # S>=64 strips exceed the 16M default scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(dt_arr, v0, v1, uxp, uyp,
      g0 if use_g else zg, g1 if use_g else zg,
      gp0 if use_gp else zg, gp1 if use_gp else zg)
    if with_rr:
        return ([out[0], out[1]], [out[2], out[4]], [out[3], out[5]])
    return out


def kernel_spec(fbc, with_face_bc: bool = False):
    """Static (sgn, off, per_y, fb_x, fb_y) encoding of a FieldBC for
    the kernel, or None when the BCs are outside its scope (periodic x,
    callable values, inhomogeneous Neumann).  ``with_face_bc``: also
    force the Dirichlet value on the domain-boundary faces of each axis
    (the a == c face BC of the jnp path)."""
    from ...core import bc as bcs
    sgn = [1.0] * 4
    off = [0.0] * 4
    fb = [[None, None], [None, None]]
    per_y = False
    for ax in range(2):
        for side in range(2):
            b = fbc.sides[ax][side]
            k = 2 * ax + side
            if b.kind == bcs.PERIODIC:
                if ax == 0:
                    return None       # periodic rows: jnp fallback
                per_y = True
                continue
            if callable(b.value) or b.kind not in (bcs.DIRICHLET,
                                                    bcs.NEUMANN):
                return None
            val = float(b.value)
            if b.kind == bcs.DIRICHLET:
                sgn[k] = -1.0
                off[k] = 2.0 * val
                if with_face_bc:
                    fb[ax][side] = val
            else:                     # Neumann
                if val != 0.0:
                    return None
    return dict(sgn=tuple(sgn), off=tuple(off), per_y=per_y,
                fb_x=tuple(fb[0]) if with_face_bc else None,
                fb_y=tuple(fb[1]) if with_face_bc else None)


def applicable(v, grid, par=None) -> bool:
    """TPU f32 2D with the default advection parameters.
    GERRIS_NO_BCG_KERNEL=1 disables the kernel (A/B benchmarking)."""
    import os
    if os.environ.get("GERRIS_NO_BCG_KERNEL"):
        return False
    if grid.dim != 2 or v.dtype != jnp.float32:
        return False
    if v.shape[0] < 32 or v.shape[1] < 128:
        return False
    if par is not None and (par.gradient != "centered"
                            or par.scheme != "godunov"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=(
    "sgn", "off", "per_y", "fb_x", "fb_y", "S", "interpret"))
def advect2d(v, ufx, ufy, dt, h, g=None, gp=None, oscale=None, *,
             sgn, off, per_y=False,
             fb_x=None, fb_y=None, S=64, interpret=False):
    """Conservative BCG advection increment for one cell field:
    v_new = v + advect2d(...).

    v: (n0, n1) cells; ufx: (n0+1, n1); ufy: (n0, n1+1) MAC faces;
    dt traced scalar, h the (static) cell size; g: optional gmac cell
    array — the applied correction is dt/2 * face_average(g), matching
    models/ns.velocity_advection_diffusion.
    sgn/off: (x_lo, x_hi, y_lo, y_hi) ghost encodings;
    fb_x/fb_y: None or (lo, hi) forced domain-boundary face values.
    ``gp``: optional cell array subtracted as dt*gp from the increment
    (the gc pressure-gradient momentum term).  ``oscale``: when given,
    the output becomes oscale * (v + increment) — the implicit-diffusion
    system rhs — instead of the bare increment."""
    n0, n1 = v.shape
    H = GP
    if n0 % S or n0 < S + 2 * H:
        S = n0
        H = 0
    W = S + 2 * H
    nstrips = n0 // S
    from .facepack import FacePack
    if isinstance(ufx, FacePack):
        # faces already in the kernel's native packed layout: zero
        # repacking launches (see facepack.py)
        uxp, uyp = ufx.x, ufx.y
        ypad = uyp.shape[1] - (n1 + 1)
    else:
        uxp = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
        # DMA source widths must be 128-lane aligned: pad ufy columns
        ypad = (-(n1 + 1)) % CP
        uyp = jnp.pad(ufy, ((0, 0), (0, ypad))) if ypad else ufy
    dt_arr = jnp.stack([
        jnp.asarray(dt, v.dtype) / h,
        jnp.asarray(h, v.dtype) / 2.0,
        jnp.asarray(dt, v.dtype),
        jnp.asarray(0.0 if oscale is None else oscale, v.dtype),
    ]).reshape(1, 4)
    use_g = g is not None
    # the applied correction is dt/2 * face_avg(g): the h/2 prescale is
    # applied IN-KERNEL (gscale) so no elementwise launch touches g
    g_in = g if use_g else jnp.zeros((GP, n1), v.dtype)
    use_gp = gp is not None
    use_os = oscale is not None
    gp_in = gp if use_gp else jnp.zeros((GP, n1), v.dtype)
    kern = functools.partial(
        _kernel, n0=n0, n1=n1, S=S, H=H, nstrips=nstrips,
        sgn=tuple(sgn), off=tuple(off),
        per_y=per_y, fb_x=fb_x, fb_y=fb_y, use_g=use_g,
        use_gp=use_gp, use_os=use_os)
    return pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((S, n1), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, CP + n1 + CP), v.dtype),           # v
            pltpu.VMEM((W + 2 * GP, CP + n1 + CP), v.dtype),  # ufx
            pltpu.VMEM((W, CP + n1 + 1 + ypad + CP), v.dtype),  # ufy
            pltpu.VMEM((W if use_g else GP, CP + n1 + CP),
                       v.dtype),                              # g
            pltpu.VMEM((W if use_gp else GP, CP + n1 + CP),
                       v.dtype),                              # gp
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(dt_arr, v, uxp, uyp, g_in, gp_in)
