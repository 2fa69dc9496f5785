"""Multi-device domain decomposition (SURVEY.md §7 stage 3 gate:
single-chip vs 8-chip results tolerance-equal, MG convergence unchanged).

Runs on the 8 virtual CPU devices set up by conftest's
--xla_force_host_platform_device_count.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.models import ns
from gerris_tpu.parallel import mesh as pmesh
from gerris_tpu.solvers import poisson

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


def lid_cfg(level=6):
    grid = Grid(level=level, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    return ns.NSConfig(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3)


@needs_devices
def test_mesh_factorization():
    assert pmesh.factor_mesh(8, 2) == (2, 4)
    assert pmesh.factor_mesh(4, 2) == (2, 2)
    assert pmesh.factor_mesh(8, 3) == (2, 2, 2)


@needs_devices
def test_sharded_step_matches_single_device():
    """The XLA-partitioned step produces the same answer as single-device
    execution (the reference's serial-vs-parallel gfscompare equivalence,
    SURVEY.md §4)."""
    cfg = lid_cfg(6)
    grid = cfg.grid
    z = jnp.zeros(grid.shape)
    state = {n: z for n in
             list(ns.velocity_names(2)) + ["P", "Pmac"] +
             list(ns.gradient_names(2))}
    dt = 0.01

    # single device
    out1 = ns.ns_step(state, dt, 0.0, cfg)
    for _ in range(3):
        out1 = ns.ns_step(out1, dt, 0.0, cfg)

    # 8-device mesh
    mesh = pmesh.make_mesh(8, dim=2)
    sstate = pmesh.shard_state(state, mesh)
    step = pmesh.sharded_ns_step(cfg, mesh)
    out8 = step(sstate, dt, 0.0)
    for _ in range(3):
        out8 = step(out8, dt, 0.0)

    for k in out1:
        d = float(jnp.max(jnp.abs(out1[k] - out8[k])))
        scale = float(jnp.max(jnp.abs(out1[k]))) + 1e-30
        assert d / scale < 1e-12, (k, d, scale)


@needs_devices
def test_sharded_multigrid_convergence():
    """MG convergence is unchanged under sharding (stage 3 gate)."""
    grid = Grid(level=7, dim=2)
    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    x, y = grid.centers
    rhs = jnp.sin(3 * math.pi * x) * jnp.sin(3 * math.pi * y)
    params = poisson.MultilevelParams()
    mesh = pmesh.make_mesh(8, dim=2)
    sh = pmesh.field_sharding(mesh)

    u0 = jnp.zeros(grid.shape)
    u_s = jax.device_put(u0, sh)
    rhs_s = jax.device_put(rhs, sh)

    def reductions(u, rhs):
        res = [float(jnp.max(jnp.abs(poisson.residual(u, rhs, grid, fbc))))]
        for _ in range(5):
            u = poisson.cycle_jit(u, rhs, grid, fbc, params)
            res.append(float(jnp.max(jnp.abs(
                poisson.residual(u, rhs, grid, fbc)))))
        return res

    r1 = reductions(u0, rhs)
    r8 = reductions(u_s, rhs_s)
    for a, b in zip(r1, r8):
        assert abs(a - b) / max(abs(a), 1e-30) < 1e-10
    assert r1[0] / r1[-1] > 1e4  # converging fast (~10x/cycle over 5 cycles)


# ---------------------------------------------------------------------------
# The driver-dryrun gates, mirrored into pytest (VERDICT r3 weak 2): the
# sharded two-phase (VOF + tension + variable density) and composite-AMR
# equality + all-gather audits must have CPU-pinned pytest evidence even
# when the driver's dryrun artifact cannot run.  Single source of truth:
# the gate code itself lives in __graft_entry__.
# ---------------------------------------------------------------------------

def _graft():
    import os
    import sys
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __graft_entry__
    return __graft_entry__


@needs_devices
def test_sharded_twophase_step_matches_single_device():
    g = _graft()
    g._dryrun_twophase(pmesh.make_mesh(8, dim=2))


@needs_devices
def test_sharded_composite_amr_step_matches_single_device():
    g = _graft()
    g._dryrun_composite(pmesh.make_mesh(8, dim=2))


@needs_devices
def test_gfsjoin_tool(tmp_path):
    """save_sharded per-rank files -> tools/gfsjoin.py -> one global
    restart equal to the unsharded state (reference: tools/gfsjoin2.c
    box merging; here shard offsets are the box-graph metadata)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import gfsjoin
    from gerris_tpu.parallel import checkpoint as ckpt

    grid = Grid(level=5, dim=2)
    mesh = pmesh.make_mesh(8)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 2)
    state = {"U": jax.random.normal(ks[0], grid.shape, jnp.float32),
             "P": jax.random.normal(ks[1], grid.shape, jnp.float32)}
    sharded = pmesh.shard_state(state, mesh)
    prefix = str(tmp_path / "ck")
    files = ckpt.save_sharded(prefix, sharded, meta={"t": 1.5})
    assert len(files) == 8
    out = str(tmp_path / "joined.npz")
    assert gfsjoin.main([prefix, "-o", out]) == 0
    z = np.load(out)
    import json as _json
    meta = _json.loads(str(z["__meta__"]))
    assert meta["t"] == 1.5
    for name in ("U", "P"):
        np.testing.assert_array_equal(z[name], np.asarray(state[name]))
