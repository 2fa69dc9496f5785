"""Phase-level timing of the bench NS step at BENCH_LEVEL.

Times each *phase* of the production step (bench.py schedule) in its own
fori_loop with evolving state (the axon runtime memoizes identical pure
executions, CLAUDE.md), so the 5.8 ms/step budget can be attributed:

  predict      predicted_face_velocities (1 fused launch)
  mac_proj     MAC projection, mp1 schedule (div + 3-launch MG + correct)
  advect_pair  both components' BCG corrector advections (1 launch)
  diff_pair    batched U+V implicit diffusion (3-launch MG pair chain)
  face_interp  face interpolation + gc gradient re-add (1 launch)
  approx_proj  approximate projection with cells (div + MG + correct)
  full_step    ns_step cross-check (should ~= sum of the above)

Each phase program is a separate (cached) remote compile.  Run on an
otherwise-idle box; phases are relative, the full_step line is the
anchor.
"""
import dataclasses
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
from gerris_tpu.solvers import poisson, projection as proj, diffusion as diff
from gerris_tpu.ops.pallas import bcg, predict

LEVEL = int(os.environ.get("BENCH_LEVEL", "11"))
ITERS = int(os.environ.get("BENCH_ITERS", "100"))
ONLY = os.environ.get("PHASE_ONLY", "")

grid = Grid(level=LEVEL, dim=2)
u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0), top=bcs.Dirichlet(1.0))
v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
nu = 1e-3
omega = float(os.environ.get("GERRIS_OMEGA", "1.5"))
nr5 = int(os.environ.get("GERRIS_TPU_NRELAX", "5"))
mp1 = poisson.MultilevelParams(tolerance=1e-3, nitermax=100, ncycles=1,
                               omega=omega, tpu_nrelax=nr5)
mpd = dataclasses.replace(mp1, nrelax=int(os.environ.get(
    "GERRIS_DIFF_NRELAX", "5")), omega=1.0)
cfg = ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=nu, beta=1.0,
                  projection=mp1, approx_projection=mp1,
                  diffusion_params=mpd, pair_advect=True)
dt = jnp.float32(0.8 * grid.h)

key = jax.random.PRNGKey(0)
n = grid.n
U0 = 0.01 * jax.random.normal(key, grid.shape, jnp.float32)
V0 = 0.01 * jax.random.normal(jax.random.PRNGKey(1), grid.shape, jnp.float32)
P0 = jnp.zeros(grid.shape, jnp.float32)
ufx0 = jnp.zeros(grid.face_shape(0), jnp.float32)
ufy0 = jnp.zeros(grid.face_shape(1), jnp.float32)

su = bcg.kernel_spec(u_bc, with_face_bc=True)
sv = bcg.kernel_spec(v_bc, with_face_bc=True)
dia = 1.0 / (float(dt) * nu)


def timeit(name, makef, carry):
    f = jax.jit(makef)
    t0 = time.time()
    out = f(carry)
    chk = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    comp = time.time() - t0
    t0 = time.time()
    out = f(carry)
    chk = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    run = (time.time() - t0) / ITERS
    print(f"{name:14s} {run * 1e3:8.3f} ms/call   (compile {comp:.1f}s, "
          f"chk {chk:.3e})", flush=True)
    return run


def loop(body):
    def f(carry):
        return jax.lax.fori_loop(0, ITERS, body, carry)
    return f


def want(name):
    return not ONLY or name in ONLY.split(",")


results = {}

if want("predict"):
    def body(i, c):
        U, V = c
        ox, oy = predict.predict_xy(
            U, V, dt, grid.h, sgn_u=su["sgn"], off_u=su["off"],
            sgn_v=sv["sgn"], off_v=sv["off"], per_y=su["per_y"],
            fb_x=su["fb_x"], fb_y=sv["fb_y"] or (0.0, 0.0))
        # cheap evolving epilogue (1 fused HBM pass)
        return (U + 0.001 * (ox[1:, :] - ox[:-1, :]),
                V + 0.001 * (oy[:, 1:] - oy[:, :-1]))
    results["predict"] = timeit("predict", loop(body), (U0, V0))

if want("mac_proj"):
    def body(i, c):
        ufx, ufy, p = c
        uf, p, g, _ = proj.mac_projection([ufx, ufy], p, grid, cfg.p_bc,
                                          dt / 2.0, mp1)
        return (uf[0] + 1e-6, uf[1] - 1e-6, p)
    results["mac_proj"] = timeit("mac_proj", loop(body), (ufx0, ufy0, P0))

if want("advect_pair"):
    def body(i, c):
        U, V, ufx, ufy = c
        v0, v1 = bcg.advect2d_pair(
            U, V, ufx, ufy, dt, grid.h, g0=U * 0.01, g1=V * 0.01,
            gp0=None, gp1=None, oscale=-dia,
            sgns=(su["sgn"], sv["sgn"]), offs=(su["off"], sv["off"]),
            per_y=su["per_y"], fbxs=(su["fb_x"], None),
            fbys=(None, sv["fb_y"]))
        return (U - 1e-6 * v0, V - 1e-6 * v1, ufx, ufy)
    results["advect_pair"] = timeit("advect_pair", loop(body),
                                    (U0, V0, ufx0, ufy0))

if want("diff_pair"):
    def body(i, c):
        U, V = c
        rhss = [-(U) * dia, -(V) * dia]
        out, _ = diff.diffuse_pair([U, V], grid, [u_bc, v_bc], dt, nu,
                                   1.0, mpd, rhss=rhss)
        return (out[0], out[1])
    results["diff_pair"] = timeit("diff_pair", loop(body), (U0, V0))

if want("face_interp"):
    def body(i, c):
        U, V = c
        uf, cells = proj.face_interpolated_velocity(
            [U, V], grid, [u_bc, v_bc], gp=(U, V), dtv=dt)
        return (cells[0] * (1.0 - 1e-9), cells[1] * (1.0 - 1e-9))
    results["face_interp"] = timeit("face_interp", loop(body), (U0, V0))

if want("approx_proj"):
    def body(i, c):
        U, V, ufx, ufy, p = c
        uf, p, g, _, cells = proj.mac_projection(
            [ufx, ufy], p, grid, cfg.p_bc, dt, mp1, cells=[U, V])
        return (cells[0], cells[1], uf[0] + 1e-6, uf[1] - 1e-6, p)
    results["approx_proj"] = timeit("approx_proj", loop(body),
                                    (U0, V0, ufx0, ufy0, P0))

if want("full_step"):
    names = list(ns.velocity_names(2)) + ["P", "Pmac"] + \
        list(ns.gradient_names(2))
    st0 = {nm: jnp.zeros(grid.shape, jnp.float32) for nm in names}
    st0["U"] = U0

    def body(i, s):
        return ns.ns_step(s, dt, jnp.float32(0.0), cfg)

    def f(s):
        return jax.lax.fori_loop(0, ITERS, body, s)["U"]
    results["full_step"] = timeit("full_step", f, st0)

tot = sum(v for k, v in results.items() if k != "full_step")
print(f"{'sum(phases)':14s} {tot * 1e3:8.3f} ms")
