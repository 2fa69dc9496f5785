"""Dynamic load balancing: GfsEventBalance, TPU-native.

Reference mechanism (src/balance.c:226-318): each PE's cost = its cell
count; an event solves a graph-Poisson problem for a per-edge
"balancing flow" (Jacobi w/ double-loop fix, balance.c:77-138) and
migrates whole boxes between ranks over MPI object streams
(gfs_send_boxes, domain.c:4464-4651) until the max/min cost ratio drops
under a threshold.

TPU-native equivalent (SURVEY.md §2.2 row 6): the AMR runtime keeps
active blocks in capacity-padded tables over a *block axis* (Morton
order, solvers/blockrt.py).  Balancing is therefore not migration but
re-partitioning: recompute the Morton-contiguous block -> device split
so every device holds (nearly) the same number of ACTIVE blocks, then
re-apply the block-axis NamedSharding — GSPMD turns the re-shard into
the minimal collective permute over ICI.  Whole-box streams, ghost
rebuilds and the reference's flow solve disappear: a prefix-sum split
of the (already cost-sorted) Morton order is the exact optimum for
uniform-cost blocks.

The same machinery covers the reference's static partitioning entry
points (-p bisection / bubble): `balanced_split` at t=0 is the static
partition; `EventBalance` re-runs it whenever adaptivity skews the
distribution.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..events.events import Event

BLOCK_AXIS = "blocks"


def block_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1D device mesh over the block axis (the analogue of the
    reference's rank set)."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (BLOCK_AXIS,))


def device_costs(active: np.ndarray, split: np.ndarray) -> np.ndarray:
    """Per-device cost = number of active blocks in each device's
    contiguous Morton chunk (the reference's cost = cell count per PE,
    balance.c:226-240).  ``split``: device boundaries, len n_dev+1."""
    active = np.asarray(active, bool)
    csum = np.concatenate([[0], np.cumsum(active)])
    return csum[split[1:]] - csum[split[:-1]]


def imbalance(active: np.ndarray, split: np.ndarray) -> float:
    """max/mean active-cost ratio (balance.c uses max/min of PE cost;
    mean-normalized is stable when a device legitimately holds 0)."""
    c = device_costs(active, split)
    mean = max(float(c.mean()), 1e-30)
    return float(c.max()) / mean


def balanced_split(active: np.ndarray, n_dev: int) -> np.ndarray:
    """Morton-contiguous device boundaries with near-equal ACTIVE block
    counts: split the cumulative active count at multiples of
    total/n_dev (prefix-sum partition — optimal for uniform block cost;
    the role of the reference's balancing-flow solve + box migration)."""
    active = np.asarray(active, bool)
    n = active.size
    csum = np.cumsum(active)
    total = int(csum[-1]) if n else 0
    bounds = [0]
    for d in range(1, n_dev):
        target = total * d / n_dev
        bounds.append(int(np.searchsorted(csum, target, side="left") + 1)
                      if total else (n * d) // n_dev)
    bounds.append(n)
    b = np.maximum.accumulate(np.asarray(bounds))
    return np.minimum(b, n)


def pack_assignment(active: np.ndarray, n_dev: int):
    """Gather indices realizing a balanced even-chunk layout: device d
    gets the d-th balanced Morton chunk, padded to the common capacity
    cap = ceil(max chunk len).  Returns (idx[n_dev*cap], valid mask)
    — a padded permutation usable as one jnp.take over the block axis
    (re-sharding = this gather under the block-axis NamedSharding)."""
    active = np.asarray(active, bool)
    split = balanced_split(active, n_dev)
    chunks = [np.arange(split[d], split[d + 1]) for d in range(n_dev)]
    cap = max((len(c) for c in chunks), default=0)
    idx = np.zeros((n_dev, cap), np.int32)
    valid = np.zeros((n_dev, cap), bool)
    for d, c in enumerate(chunks):
        idx[d, :len(c)] = c
        valid[d, :len(c)] = True
    return idx.reshape(-1), valid.reshape(-1), split


def reshard(blocks: jnp.ndarray, idx: np.ndarray, mesh: Mesh):
    """Re-partition a block-axis-leading array to the balanced layout:
    gather rows by ``idx`` and place under the even block-axis sharding
    (GSPMD lowers this to a collective permute of whole blocks — the
    box-migration step of balance.c:156-199)."""
    spec = P(BLOCK_AXIS, *([None] * (blocks.ndim - 1)))
    out = jnp.take(blocks, jnp.asarray(idx), axis=0)
    return jax.device_put(out, NamedSharding(mesh, spec))


@dataclasses.dataclass
class EventBalance(Event):
    """GfsEventBalance istep max (src/balance.c event_balance_read):
    when the active-block imbalance exceeds ``max_ratio``, recompute the
    balanced Morton split and record it on the simulation
    (``sim.block_split`` / ``sim.block_gather_idx``); sharded runners
    apply it with :func:`reshard` at the next table rebuild."""
    max_ratio: float = 1.1
    n_devices: int = 0          # 0 = len(jax.devices())
    rebalanced: int = 0

    def __post_init__(self):
        super().__post_init__()
        self.action = self._balance

    def _active_mask(self, sim):
        """Active (leaf-containing) flags per Morton block of the
        finest-level block grid, from the sim's depth map."""
        depth = np.asarray(sim.depth)
        B = getattr(sim, "block_B", 8)
        nb = depth.shape[0] // B
        d = depth.reshape(nb, B, nb, B).max(axis=(1, 3))
        lmax = int(d.max()) if d.size else 0
        act = (d >= lmax).reshape(-1) if lmax else np.ones(nb * nb, bool)
        return act

    def _balance(self, sim):
        n_dev = self.n_devices or len(jax.devices())
        act = self._active_mask(sim)
        split = getattr(sim, "block_split", None)
        if split is None:
            n = act.size
            split = np.asarray([(n * d) // n_dev
                                for d in range(n_dev + 1)])
        if imbalance(act, split) <= self.max_ratio:
            return
        idx, valid, new_split = pack_assignment(act, n_dev)
        sim.block_split = new_split
        sim.block_gather_idx = idx
        sim.block_gather_valid = valid
        self.rebalanced += 1
