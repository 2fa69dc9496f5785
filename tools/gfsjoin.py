#!/usr/bin/env python
"""gfsjoin: merge per-rank sharded checkpoint files into ONE restart file.

TPU-native analogue of the reference's gfsjoin/gfsjoin2 (reference:
tools/gfsjoin2.c:140-188 — read every per-PE simulation file, add all
boxes to the first simulation, convert the MPI boundaries into internal
graph edges, write one joined file; tools/gfsjoin shell variant).  Here
the per-PE files are the ``{prefix}-{rank}.npz`` shard files written by
gerris_tpu.parallel.checkpoint.save_sharded (each shard carries its
global offsets = the box graph metadata), and the joined output is a
single ``.npz`` loadable by events.outputs.load_checkpoint /
numpy — the re-partitioned restart then reshards on load.

Usage: gfsjoin.py PREFIX [-o OUT.npz] [-n NRANKS] [-v]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def join(prefix: str, nranks=None, verbose=False):
    """Return (arrays, meta): global arrays assembled from the shard
    files' offsets, and the merged metadata (per-rank keys dropped)."""
    files = sorted(glob.glob(f"{prefix}-*.npz"))
    if nranks is not None:
        files = files[:nranks]
    if not files:
        raise FileNotFoundError(f"no shard files match {prefix}-*.npz")
    parts = []
    for p in files:
        z = np.load(p, allow_pickle=True)
        meta = z["__meta__"].item()
        fields = {k: z[k] for k in z.files if not k.startswith("__")}
        parts.append((meta, fields))
        if verbose:
            ncells = sum(int(np.prod(a.shape)) for a in fields.values())
            print(f"{p}: {len(fields)} field(s), {ncells} values",
                  file=sys.stderr)
    arrays = {}
    for name in parts[0][1]:
        offs = [tuple(m["__offsets__"][name]) for m, _ in parts]
        arrs = [f[name] for _, f in parts]
        nd = arrs[0].ndim
        shape = tuple(max(o[d] + a.shape[d] for o, a in zip(offs, arrs))
                      for d in range(nd))
        full = np.zeros(shape, arrs[0].dtype)
        for o, a in zip(offs, arrs):
            sl = tuple(slice(o[d], o[d] + a.shape[d])
                       for d in range(nd))
            full[sl] = a
        arrays[name] = full
    meta = {k: v for k, v in parts[0][0].items()
            if k not in ("__offsets__", "__offset__")}
    return arrays, meta


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="join per-rank shard checkpoints into one restart")
    ap.add_argument("prefix", help="shard file prefix (PREFIX-RANK.npz)")
    ap.add_argument("-o", "--output", default=None,
                    help="output file (default PREFIX.npz)")
    ap.add_argument("-n", "--nranks", type=int, default=None,
                    help="join only the first N ranks")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    arrays, meta = join(args.prefix, args.nranks, args.verbose)
    out = args.output or f"{args.prefix}.npz"
    np.savez(out, __meta__=json.dumps(meta), **arrays)
    if args.verbose:
        print(f"{out}: {len(arrays)} global field(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
