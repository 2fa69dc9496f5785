"""Strip-size (S) A/B for the hot Pallas kernels, on device.

The per-strip input DMAs are issued+waited inside the kernel body with
no cross-strip prefetch, and the relax kernels' halo overhead is
W/S = (S + 2H)/S — both favour larger strips.  This times the kernels
standalone in fori_loops with evolving state (the axon runtime memoizes
identical pure executions, CLAUDE.md).

Usage: python tools/strip_ab.py [kernel ...]   (default: all)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.ops.pallas import bcg, rbgs
from gerris_tpu.solvers.poisson import _signs_offs

LEVEL = int(os.environ.get("BENCH_LEVEL", "11"))
ITERS = int(os.environ.get("BENCH_ITERS", "100"))
NSWEEPS = int(os.environ.get("AB_NSWEEPS", "5"))

grid = Grid(level=LEVEL, dim=2)
n = grid.n
h2 = grid.h * grid.h
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
GP = rbgs.GP


def timeit(name, fn, *args):
    try:
        t0 = time.time()
        out = fn(*args)
        chk = float(jnp.sum(out[0] if isinstance(out, (tuple, list))
                            else out))
        comp = time.time() - t0
        t0 = time.time()
        out = fn(*args)
        chk = float(jnp.sum(out[0] if isinstance(out, (tuple, list))
                            else out))
        run = time.time() - t0
        print(f"{name:28s} {run / ITERS * 1e3:8.3f} ms/iter  "
              f"(compile+1st {comp:.1f}s, chk {chk:.3e})", flush=True)
    except Exception as e:  # noqa: BLE001 — keep later variants running
        print(f"{name:28s} FAILED: {str(e)[:160]}", flush=True)


want = set(sys.argv[1:])


def sel(k):
    return not want or k in want


u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                        top=bcs.Dirichlet(1.0))
v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
signs, _ = _signs_offs(grid, u_bc, False)
dia = jnp.float32(2.56e6 * 1e-3)   # the bench diffusion pair's scale
rep = 0.01 * jax.random.normal(ks[0], (n // 2 + 2 * GP, n), jnp.float32)
rhs0 = jax.random.normal(ks[1], (n, n), jnp.float32)
rhs1 = jax.random.normal(ks[2], (n, n), jnp.float32)
U = 0.01 * jax.random.normal(ks[3], (n, n), jnp.float32)
V = 0.01 * jax.random.normal(ks[4], (n, n), jnp.float32)

if sel("pr_pair"):
    for S, ns in ((64, NSWEEPS), (128, NSWEEPS), (256, NSWEEPS),
                  (128, 1), (128, 3)):
        @jax.jit
        def loop(u0, u1, S=S, ns=ns):
            def body(i, uv):
                o = rbgs.prolong_relax_pair(
                    [rep, rep], [rhs0, rhs1], jnp.stack([dia, dia]),
                    list(uv), nsweeps=ns, h2=h2, signs=signs,
                    periodic_y=False, omega=1.0, S=S)
                return (0.999 * o[0], 0.999 * o[1])
            return jax.lax.fori_loop(0, ITERS, body, (u0, u1))
        timeit(f"pr_pair S={S} ns={ns}", loop, U, V)

if sel("pr"):
    for S in (64, 128, 256):
        @jax.jit
        def loop(u0, S=S):
            def body(i, u):
                o = rbgs.prolong_relax(
                    rep, rhs0, 0.0, u, nsweeps=NSWEEPS, h2=h2,
                    signs=signs, periodic_y=False, omega=1.5,
                    add_u=True, S=S)
                return 0.999 * o
            return jax.lax.fori_loop(0, ITERS, body, u0)
        timeit(f"pr single S={S} om=1.5", loop, U)

if sel("rr_pair"):
    rows = []
    for fbc in (u_bc, v_bc):
        _, offs = _signs_offs(grid, fbc, False)
        rows.append(jnp.stack([dia, jnp.float32(0.0)]
                              + [jnp.float32(o) for o in offs]))
    scal = jnp.stack(rows)
    for S in (128, 256):
        @jax.jit
        def loop(u0, u1, S=S):
            def body(i, uv):
                r0, r1, r2 = rbgs.residual_restrict_pair(
                    list(uv), [rhs0, rhs1], scal, h2=h2, signs=signs,
                    periodic_y=False, S=S)
                return (uv[0] + 1e-6 * r0[0], uv[1] + 1e-6 * r0[1])
            return jax.lax.fori_loop(0, ITERS, body, (u0, u1))
        timeit(f"rr_pair S={S}", loop, U, V)

if sel("advect"):
    ufx = 0.01 * jax.random.normal(ks[5], (n + 1, n), jnp.float32)
    ufy = 0.01 * jax.random.normal(ks[6], (n, n + 1), jnp.float32)
    g0 = 0.01 * jax.random.normal(ks[7], (n, n), jnp.float32)
    su = bcg.kernel_spec(u_bc, with_face_bc=True)
    sv = bcg.kernel_spec(v_bc, with_face_bc=True)
    dt = jnp.float32(0.8 * grid.h)
    for S in (32, 64, 128):
        @jax.jit
        def loop(u0, u1, S=S):
            def body(i, uv):
                o = bcg.advect2d_pair(
                    uv[0], uv[1], ufx, ufy, dt, grid.h,
                    g0=g0, g1=g0, gp0=g0, gp1=g0, oscale=-dia,
                    sgns=(su["sgn"], sv["sgn"]),
                    offs=(su["off"], sv["off"]), per_y=False,
                    fbxs=(su["fb_x"], None), fbys=(None, sv["fb_y"]),
                    S=S)
                return (uv[0] - 1e-7 * o[0], uv[1] - 1e-7 * o[1])
            return jax.lax.fori_loop(0, ITERS, body, (u0, u1))
        timeit(f"advect_pair S={S}", loop, U, V)
