"""3D fused red-black Gauss-Seidel smoother (Pallas TPU).

The 3D analogue of ops/pallas/rbgs.py's strip kernel (VERDICT r3 item
9: the reference compiles the same multigrid for 2D and 3D,
src/ftt.h:34-38; relax kernels src/poisson.c:507-586): ``nsweeps`` of
RBGS on the 7-point Laplacian + scalar dia in ONE launch per level.

Layout: u is (n0, n1, n2) f32 with n2 on the lane axis (wrapper pads
n2 to a 128 multiple for the DMA width constraint), n1 on sublanes,
strips over n0 with a relax halo H >= 2*nsweeps (the full window is
relaxed each sweep with reflect ghosts at strip edges — only the
central S rows are emitted, so the interior stays exact, exactly the
2D kernel's scheme).  Homogeneous static BCs (the multigrid correction
phase); red = (i+j+k) even.

VMEM budget: (W, n1+2, n2p+2*CP) f32 for u + (W, n1, n2p) for rhs —
fits n1, n2 <= 128 at nsweeps<=4 (the 3D MG fine levels of the tests
and the 128^3-class bench); larger planes fall back to the jnp path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rbgs import GP, CP


def _kernel3d(u_hbm, rhs_hbm, dia_ref, out_ref, ub, rb, sem, *,
              n0, n1, n2, n2p, S, H, nsweeps, h2,
              signs, omega):
    s = pl.program_id(0)
    W = S + 2 * H
    rstart = pl.multiple_of(jnp.clip(s * S - H, 0, n0 - W), GP)
    # the DMA destination offset on the sublane (y) axis must be a
    # multiple of the (8,128) tile — a 1-row ghost pad fails Mosaic's
    # divisibility check on device ("tile index in dimension 1 is
    # divisible by the tiling (8)"), so the low-side ghost band is GP
    # rows wide and the real rows live at [GP, GP+n1)
    Y0 = GP
    cpu = pltpu.make_async_copy(
        u_hbm.at[pl.ds(rstart, W), :, :],
        ub.at[pl.ds(0, W), pl.ds(Y0, n1), pl.ds(CP, n2p)], sem.at[0])
    cpu.start()
    cpr = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(rstart, W), :, :],
        rb.at[pl.ds(0, W), pl.ds(0, n1), pl.ds(0, n2p)], sem.at[1])
    cpr.start()
    cpu.wait()
    cpr.wait()

    sx_lo, sx_hi, sy_lo, sy_hi, sz_lo, sz_hi = signs
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 0) + rstart
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 2)
    red = ((rows + cols + lanes) % 2) == 0
    first = rstart == 0
    last = rstart + W == n0
    denom = 6.0 + dia_ref[0] * h2
    inv_denom = 1.0 / denom
    cl, ch = CP, CP + n2         # real lanes inside the padded axis
    for _ in range(nsweeps):
        for color in (red, ~red):
            # ghosts: z (lane) and y (sublane) homogeneous BCs
            ub[:, Y0:Y0 + n1, cl - 1:cl] = \
                sz_lo * ub[:, Y0:Y0 + n1, cl:cl + 1]
            ub[:, Y0:Y0 + n1, ch:ch + 1] = \
                sz_hi * ub[:, Y0:Y0 + n1, ch - 1:ch]
            ub[:, Y0 - 1:Y0, :] = sy_lo * ub[:, Y0:Y0 + 1, :]
            ub[:, Y0 + n1:Y0 + n1 + 1, :] = \
                sy_hi * ub[:, Y0 + n1 - 1:Y0 + n1, :]
            c = ub[0:W, Y0:Y0 + n1, cl:ch]
            # x (strip axis) ghosts via in-place edge rows: reflect at
            # the domain edges, harmless at interior strip edges (halo)
            xm = jnp.concatenate(
                [jnp.where(first, sx_lo, 1.0)
                 * ub[0:1, Y0:Y0 + n1, cl:ch],
                 ub[0:W - 1, Y0:Y0 + n1, cl:ch]], axis=0)
            xp = jnp.concatenate(
                [ub[1:W, Y0:Y0 + n1, cl:ch],
                 jnp.where(last, sx_hi, 1.0)
                 * ub[W - 1:W, Y0:Y0 + n1, cl:ch]], axis=0)
            nb = (xm + xp
                  + ub[0:W, Y0 - 1:Y0 + n1 - 1, cl:ch]
                  + ub[0:W, Y0 + 1:Y0 + n1 + 1, cl:ch]
                  + ub[0:W, Y0:Y0 + n1, cl - 1:ch - 1]
                  + ub[0:W, Y0:Y0 + n1, cl + 1:ch + 1])
            new = (nb - h2 * rb[pl.ds(0, W), :, 0:n2]) * inv_denom
            if omega != 1.0:
                new = (1.0 - omega) * c + omega * new
            ub[0:W, Y0:Y0 + n1, cl:ch] = jnp.where(color, new, c)

    off = pl.multiple_of(s * S - rstart, GP)   # in {0, H, 2H}
    out_ref[:, :, :] = ub[pl.ds(off, S), Y0:Y0 + n1, cl:cl + n2p]


def applicable3d(u, fbc=None) -> bool:
    """3D f32 on TPU with planes small enough for the VMEM window.
    GERRIS_NO_3D_KERNEL=1 disables (A/B + on-device lowering is pending
    the tunnel: interpret-mode equality is gated in test_mgfuse)."""
    import os
    if os.environ.get("GERRIS_NO_3D_KERNEL"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return (u.ndim == 3 and u.dtype == jnp.float32
            and u.shape[1] <= 128 and u.shape[2] <= 128
            and u.shape[0] >= GP and u.shape[0] % GP == 0)


@functools.partial(jax.jit, static_argnames=(
    "nsweeps", "h2", "signs", "omega", "S", "interpret"))
def rbgs_relax_3d(u, rhs, dia=0.0, *, nsweeps: int, h2: float,
                  signs=(-1.0,) * 6, omega: float = 1.0, S: int = 32,
                  interpret: bool = False):
    """nsweeps of 3D RBGS on the 7-point Laplacian + scalar dia, one
    launch, homogeneous static BCs.  signs = (x_lo, x_hi, y_lo, y_hi,
    z_lo, z_hi) ghost multipliers (-1 Dirichlet, +1 Neumann)."""
    n0, n1, n2 = u.shape
    H = -(-2 * nsweeps // GP) * GP
    n2p = n2 + ((-n2) % CP)

    def vmem_bytes(S):
        # ub + rb scratch + the output block, all f32, with Mosaic's
        # sublane rounding on ub's middle axis (device scoped-vmem
        # limit is 16M; measured 17.12M OOM at 128^3 S=32)
        W = S + 2 * H
        n1r = -(-(GP + n1 + 1) // GP) * GP
        return 4 * (W * n1r * (CP + n2p + CP) + W * n1 * n2p
                    + S * n1 * n2p)
    while S > GP and (n0 % S or vmem_bytes(S) > 12 * 2**20):
        S //= 2
    if n0 % S or n0 < S + 2 * H:
        S = n0
        H = 0
    W = S + 2 * H
    nstrips = n0 // S
    up = jnp.pad(u, ((0, 0), (0, 0), (0, n2p - n2))) if n2p != n2 else u
    rp = jnp.pad(rhs, ((0, 0), (0, 0), (0, n2p - n2))) \
        if n2p != n2 else rhs
    kern = functools.partial(
        _kernel3d, n0=n0, n1=n1, n2=n2, n2p=n2p, S=S, H=H,
        nsweeps=nsweeps, h2=h2, signs=tuple(signs), omega=omega)
    out = pl.pallas_call(
        kern,
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((S, n1, n2p), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2p), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, GP + n1 + 1, CP + n2p + CP), u.dtype),
            pltpu.VMEM((W, n1, n2p), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the default 16M scoped-vmem cap counts compiler temporaries
        # (masks, neighbor sums) on top of the declared scratch and OOMs
        # at 128^3 planes; v5e VMEM is 128M — allow half
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(up, rp, jnp.asarray(dia, u.dtype).reshape(1))
    return out[:, :, :n2] if n2p != n2 else out
