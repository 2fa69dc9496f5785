"""Per-op microbenchmarks of the NS-step building blocks at BENCH_LEVEL.

Times each op in a fori_loop with evolving state (the axon runtime
memoizes identical pure executions, CLAUDE.md).  Used to target Pallas
fusion work: prints ms/call and effective HBM bandwidth.
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
from gerris_tpu.solvers import poisson, advection as adv
from gerris_tpu.ops.pallas import rbgs

LEVEL = int(os.environ.get("BENCH_LEVEL", "11"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))

grid = Grid(level=LEVEL, dim=2)
n = grid.n
h2 = grid.h * grid.h
fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
nbc = bcs.default_scalar_bc(2)
key = jax.random.PRNGKey(0)
u0 = jax.random.normal(key, grid.shape, jnp.float32)
r0 = jax.random.normal(jax.random.PRNGKey(1), grid.shape, jnp.float32)


def timeit(name, fn, mbytes, *args):
    # a scalar pull closes the timing window (remote async runtime)
    t0 = time.time()
    chk = float(jnp.sum(fn(*args)))
    comp = time.time() - t0
    t0 = time.time()
    chk = float(jnp.sum(fn(*args)))
    run = (time.time() - t0) / ITERS
    print(f"{name:34s} {run * 1e3:8.3f} ms  "
          f"{mbytes / run / 1e3:8.1f} GB/s   (c {comp:.1f}s)", flush=True)
    return chk


def loop(op):
    @jax.jit
    def f(u, r):
        def body(i, u):
            return op(u, r) * (1.0 - 1e-9 * i)
        return jax.lax.fori_loop(0, ITERS, body, u)
    return f


MB = n * n * 4 / 1e6

if __name__ == "__main__":
    print(f"level {LEVEL} ({n}^2), {ITERS} iters, {jax.devices()[0]}",
          flush=True)
    # Pallas relax, 4 sweeps (the MG smoother call)
    for S in (64, 128, 256):
        timeit(f"rbgs_relax nsweeps=4 S={S}",
               loop(lambda u, r, S=S: rbgs.rbgs_relax(
                   u, r, 0.0, nsweeps=4, h2=h2, S=S)), 3 * MB, u0, r0)
    timeit("residual_pallas",
           loop(lambda u, r: rbgs.residual_pallas(u, r, 0.0, h2=h2)),
           3 * MB, u0, r0)
    timeit("jnp relax nsweeps=4 (shifted)",
           loop(lambda u, r: poisson.relax(u, r, grid, fbc, 4)),
           3 * MB, u0, r0)
    timeit("jnp residual (shifted)",
           loop(lambda u, r: poisson.residual(
               u, r, grid, fbc, homogeneous=True)), 3 * MB, u0, r0)
    timeit("restrict", loop(lambda u, r: jnp.pad(
        poisson.restrict(u, 2), ((0, n // 2), (0, n // 2)))), 1.25 * MB,
        u0, r0)
    timeit("prolong", loop(lambda u, r: poisson.prolong(
        u[:n // 2, :n // 2], Grid(level=LEVEL - 1, dim=2), fbc,
        homogeneous=True)), 1.25 * MB, u0, r0)
    timeit("one MG correction (full)",
           loop(lambda u, r: poisson.correction(
               r, grid, fbc, poisson.MultilevelParams()) + 1e-12 * u),
           10 * MB, u0, r0)
    timeit("one MG cycle (relax+resid+corr)",
           loop(lambda u, r: poisson.cycle(
               u, r, grid, fbc, poisson.MultilevelParams())),
           16 * MB, u0, r0)

    # advection pieces
    par = adv.AdvectionParams()
    dt = jnp.float32(0.4 * grid.h)
    ufx = jax.random.normal(jax.random.PRNGKey(2), grid.face_shape(0),
                            jnp.float32)
    ufy = jax.random.normal(jax.random.PRNGKey(3), grid.face_shape(1),
                            jnp.float32)

    def advect_once(v, _):
        uc_pad = adv.mac_cell_mean([ufx, ufy], grid)
        fvals = adv.advected_face_values(v, grid, fbc, dt, par, uc_pad)
        vf = [adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                    [ufx, ufy][a], a) for a in range(2)]
        return v + adv.flux_divergence(vf, [ufx, ufy], grid, dt)

    timeit("BCG advect+flux one field (jnp)", loop(advect_once),
           4 * MB, u0, r0)
