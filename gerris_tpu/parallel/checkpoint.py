"""Sharded (parallel) checkpointing.

TPU-native rebuild of the reference's parallel I/O: per-PE simulation
files + gfsjoin merging (reference: src/output.c:189-195,1378-1404
per-rank format strings, tools/gfsjoin2.c).  Each device writes exactly
its addressable shard (``name-rank.npz`` with ``__offset__`` metadata —
the layout tools/gfscombine.py reassembles), so checkpoint bandwidth
scales with hosts and no host ever materialises the global array.
"""
from __future__ import annotations

import json
import math

import jax
import numpy as np


def save_sharded(prefix: str, state: dict, meta: dict = None) -> list:
    """Write one ``{prefix}-{rank}.npz`` per device from the addressable
    shards of the (possibly sharded) arrays in ``state``.  Returns the
    file list.  Single-device arrays write one file."""
    per_dev = {}
    for name, arr in state.items():
        if hasattr(arr, "addressable_shards"):
            for sh in arr.addressable_shards:
                idx = sh.index  # tuple of slices into the global array
                off = tuple(0 if s.start is None else int(s.start)
                            for s in idx)
                per_dev.setdefault(sh.device.id, {})[name] = (
                    np.asarray(sh.data), off)
        else:
            per_dev.setdefault(0, {})[name] = (np.asarray(arr),
                                               (0,) * np.ndim(arr))
    files = []
    for rank, fields in sorted(per_dev.items()):
        arrays = {}
        offsets = {}
        for name, (data, off) in fields.items():
            arrays[name] = data
            offsets[name] = off
        m = dict(meta or {})
        m["__offsets__"] = offsets
        # the common per-file offset (gfscombine tiling key): use the
        # first 2D field's
        off2 = next((o for o in offsets.values() if len(o) >= 2), (0, 0))
        m["__offset__"] = off2[:2]
        path = f"{prefix}-{rank}.npz"
        np.savez(path, __meta__=np.asarray(m, dtype=object), **arrays)
        files.append(path)
    return files


def load_sharded(prefix: str, nranks: int = None, mesh=None) -> dict:
    """Reassemble a sharded checkpoint; with ``mesh`` the arrays are
    device_put back onto it (resharding on load — the gfsjoin step and
    the re-partitioned restart in one)."""
    import glob

    files = sorted(glob.glob(f"{prefix}-*.npz"))
    if nranks is not None:
        files = files[:nranks]
    if not files:
        raise FileNotFoundError(f"{prefix}-*.npz")
    parts = []
    for p in files:
        z = np.load(p, allow_pickle=True)
        meta = z["__meta__"].item()
        parts.append((meta, {k: z[k] for k in z.files
                             if not k.startswith("__")}))
    out = {}
    for name in parts[0][1]:
        offs = [tuple(m["__offsets__"][name]) for m, _ in parts]
        arrs = [f[name] for _, f in parts]
        nd = arrs[0].ndim
        shape = tuple(max(o[d] + a.shape[d] for o, a in zip(offs, arrs))
                      for d in range(nd))
        full = np.zeros(shape, arrs[0].dtype)
        for o, a in zip(offs, arrs):
            sl = tuple(slice(o[d], o[d] + a.shape[d]) for d in range(nd))
            full[sl] = a
        out[name] = full
    if mesh is not None:
        from . import mesh as pmesh
        out = pmesh.shard_state(
            {k: jax.numpy.asarray(v) for k, v in out.items()}, mesh)
    else:
        out = {k: jax.numpy.asarray(v) for k, v in out.items()}
    return out
