"""Component-level timing of the headline NS step at BENCH_LEVEL.

Times each phase of models/ns.ns_step in isolation with evolving state in
a fori_loop (the axon runtime memoizes repeated identical executions, so
static microbenchmarks read ~0 — CLAUDE.md).  Each phase is one jitted
loop; compiles go through the persistent cache.
"""
import functools
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
from gerris_tpu.models import ns
from gerris_tpu.solvers import projection as proj
from gerris_tpu.solvers import poisson, diffusion as diff

LEVEL = int(os.environ.get("BENCH_LEVEL", "11"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))

grid = Grid(level=LEVEL, dim=2)
u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0), top=bcs.Dirichlet(1.0))
v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3, beta=1.0)
dt = jnp.float32(0.8 * grid.h)
z = jnp.zeros(grid.shape, jnp.float32)
key = jax.random.PRNGKey(0)
U0 = 0.01 * jax.random.normal(key, grid.shape, jnp.float32)


def timeit(name, fn, *args):
    # scalar pulls close the timing window (remote async runtime)
    t0 = time.time()
    out = fn(*args)
    chk = float(jnp.sum(out[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    chk = float(jnp.sum(out[0]))
    run_s = time.time() - t0
    print(f"{name:28s} {run_s / STEPS * 1e3:8.2f} ms/iter   "
          f"(compile+1st {compile_s:.1f}s)", flush=True)
    return out


@jax.jit
def loop_predictor(U, V):
    def body(i, uv):
        u, v = uv
        uf = ns.predicted_face_velocities([u, v], grid, cfg, dt, 0.0)
        # fold face fields back into the cell fields to keep state evolving
        return (u + 1e-6 * uf[0][:-1, :],
                v + 1e-6 * uf[1][:, :-1])
    return jax.lax.fori_loop(0, STEPS, body, (U, V))


@jax.jit
def loop_mac(U, V, P):
    def body(i, s):
        u, v, p = s
        uf = proj.face_interpolated_velocity([u, v], grid, [u_bc, v_bc])
        uf2, p2, g, _ = proj.mac_projection(uf, p, grid, cfg.p_bc, dt,
                                            cfg.projection)
        return (u - dt * g[0], v - dt * g[1], p2)
    return jax.lax.fori_loop(0, STEPS, body, (U, V, P))


@jax.jit
def loop_advdiff(U, V, P):
    def body(i, s):
        u, v, p = s
        uf = ns.predicted_face_velocities([u, v], grid, cfg, dt, 0.0)
        gmac = [jnp.zeros_like(u), jnp.zeros_like(v)]
        out = ns.velocity_advection_diffusion([u, v], uf, gmac, None,
                                              grid, cfg, dt, 0.0)
        return (out[0], out[1], p)
    return jax.lax.fori_loop(0, STEPS, body, (U, V, P))


@jax.jit
def loop_advonly(U, V, P):
    cfg0 = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=0.0, beta=1.0)
    def body(i, s):
        u, v, p = s
        uf = ns.predicted_face_velocities([u, v], grid, cfg0, dt, 0.0)
        gmac = [jnp.zeros_like(u), jnp.zeros_like(v)]
        out = ns.velocity_advection_diffusion([u, v], uf, gmac, None,
                                              grid, cfg0, dt, 0.0)
        return (out[0], out[1], p)
    return jax.lax.fori_loop(0, STEPS, body, (U, V, P))


@jax.jit
def loop_diffonly(U, V):
    def body(i, uv):
        u, v = uv
        u2, _ = diff.diffuse(u, grid, u_bc, dt, cfg.nu, beta=cfg.beta)
        v2, _ = diff.diffuse(v, grid, v_bc, dt, cfg.nu, beta=cfg.beta)
        return (u2, v2)
    return jax.lax.fori_loop(0, STEPS, body, (U, V))


@jax.jit
def loop_full(U, V, P, Pmac, Gx, Gy):
    s0 = {"U": U, "V": V, "P": P, "Pmac": Pmac, "Gx": Gx, "Gy": Gy}
    def body(i, s):
        return ns.ns_step(s, dt, jnp.float32(0.0), cfg)
    s = jax.lax.fori_loop(0, STEPS, body, s0)
    return s["U"], s["V"]


if __name__ == "__main__":
    print(f"level {LEVEL} ({grid.n}^2), {STEPS} iters, "
          f"device {jax.devices()[0]}", flush=True)
    which = sys.argv[1:] or ["predictor", "mac", "advonly", "advdiff",
                             "diffonly", "full"]
    if "predictor" in which:
        timeit("predictor(BCG faces)", loop_predictor, U0, z)
    if "mac" in which:
        timeit("mac projection", loop_mac, U0, z, z)
    if "advonly" in which:
        timeit("pred+advection (nu=0)", loop_advonly, U0, z, z)
    if "advdiff" in which:
        timeit("pred+advection+diffusion", loop_advdiff, U0, z, z)
    if "diffonly" in which:
        timeit("diffusion x2", loop_diffonly, U0, z)
    if "full" in which:
        timeit("FULL ns_step", loop_full, U0, z, z, z, z, z)
