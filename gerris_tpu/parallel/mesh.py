"""Device-mesh domain decomposition.

TPU-native replacement for the reference's MPI box-graph parallelism
(reference: src/mpi_boundary.c:78-246 ghost exchange, src/balance.c dynamic
load balancing, gerris.c:334-426 static partitioning).  Instead of
explicit pack/send/recv of ghost trees, fields are globally-shaped arrays
laid out over a 2D/3D `jax.sharding.Mesh`; the XLA SPMD partitioner turns
the stencil shifts and pads of the numerics into collective-permutes over
ICI, and reductions (norms, CFL, residuals) into psums — the exact mapping
table of SURVEY.md §2.2.

Per-device tiles are contiguous blocks (the analogue of the reference's
`-s` split + bisection partition of root boxes); there is no dynamic
balancing to do because tiles stay uniform.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import Grid

AXIS_NAMES = ("dx", "dy", "dz")


def factor_mesh(n_devices: int, dim: int = 2) -> tuple:
    """Near-square factorization of the device count over spatial axes
    (the analogue of the reference's recursive graph bisection,
    gerris.c:351-426)."""
    if dim == 2:
        a = int(math.sqrt(n_devices))
        while n_devices % a:
            a -= 1
        return (a, n_devices // a)
    # 3D: greedy
    a = round(n_devices ** (1 / 3))
    while n_devices % a:
        a -= 1
    rest = n_devices // a
    b = int(math.sqrt(rest))
    while rest % b:
        b -= 1
    return (a, b, rest // b)


def make_mesh(n_devices: Optional[int] = None, dim: int = 2,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = factor_mesh(len(devices), dim)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXIS_NAMES[:dim])


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Cell fields (n per axis): block-sharded along every mesh axis."""
    return NamedSharding(mesh, P(*mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state: dict, mesh: Mesh) -> dict:
    """Place a state pytree of cell fields onto the mesh."""
    sh = field_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in state.items()}


def sharded_ns_step(cfg, mesh: Mesh):
    """jit ns_step with sharding constraints so XLA partitions every stencil
    and multigrid level across the mesh (halo exchange via ICI
    collective-permute, reductions via psum — inserted by the compiler)."""
    from ..models import ns

    sh = field_sharding(mesh)

    def step(state, dt, t):
        state = {k: jax.lax.with_sharding_constraint(v, sh)
                 for k, v in state.items()}
        out = ns.ns_step(state, dt, t, cfg)
        return {k: jax.lax.with_sharding_constraint(v, sh)
                for k, v in out.items()}

    return jax.jit(step)
