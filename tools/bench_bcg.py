"""A/B microbenchmark: Pallas advect2d vs the jnp BCG path, one field.

Chained evolving state defeats the axon memoization; a scalar pull
closes each timing window (CLAUDE.md gotchas).
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
from gerris_tpu.solvers import advection as adv
from gerris_tpu.ops.pallas import bcg

LEVEL = int(os.environ.get("BENCH_LEVEL", "11"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))

grid = Grid(level=LEVEL, dim=2)
n = grid.n
fbc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0), top=bcs.Dirichlet(1.0))
key = jax.random.PRNGKey(0)
v0 = (0.01 * jax.random.normal(key, grid.shape)).astype(jnp.float32)
ufx = (0.1 * jax.random.normal(jax.random.PRNGKey(1),
                               grid.face_shape(0))).astype(jnp.float32)
ufy = (0.1 * jax.random.normal(jax.random.PRNGKey(2),
                               grid.face_shape(1))).astype(jnp.float32)
g0 = (0.01 * jax.random.normal(jax.random.PRNGKey(3),
                               grid.shape)).astype(jnp.float32)
dt = jnp.float32(0.3 * grid.h)
spec = bcg.kernel_spec(fbc, with_face_bc=True)


def timed(name, fn):
    t0 = time.time()
    out = fn(v0)
    chk = float(jnp.sum(out))
    comp = time.time() - t0
    t0 = time.time()
    out = fn(v0)
    chk = float(jnp.sum(out))
    run = (time.time() - t0) / ITERS
    gbps = (6 * n * n * 4) / run / 1e9
    print(f"{name:24s} {run*1e3:8.3f} ms/iter  ~{gbps:6.1f} GB/s  "
          f"(compile {comp:.1f}s, chk {chk:.4g})", flush=True)


def loop(step):
    @jax.jit
    def f(v):
        def body(i, v):
            return v + 1e-6 * step(v)
        return jax.lax.fori_loop(0, ITERS, body, v)
    return f


for S in (32, 64):
    timed(f"pallas advect2d S={S}", loop(lambda v, S=S: bcg.advect2d(
        v, ufx, ufy, dt, grid.h, g0, sgn=spec["sgn"], off=spec["off"],
        fb_x=spec["fb_x"], S=S)))


def jnp_step(v):
    uc_pad = adv.mac_cell_mean([ufx, ufy], grid)
    fvals = adv.advected_face_values(v, grid, fbc, dt,
                                     adv.AdvectionParams(), uc_pad)
    from gerris_tpu.ops.stencils import face_average
    g_pad = bcs.apply_bc(g0, grid, bcs.default_scalar_bc(2), 1,
                         corners=False)
    vf = []
    for a in range(2):
        x = adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                  [ufx, ufy][a], a)
        x = x - face_average(g_pad, grid, a) * dt / 2.0
        if a == 0:
            x = bcs.apply_face_bc(x, grid, fbc, a)
        vf.append(x)
    return adv.flux_divergence(vf, [ufx, ufy], grid, dt)


timed("jnp BCG path", loop(jnp_step))
