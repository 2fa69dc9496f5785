"""Combine split simulation checkpoints into one.

Rebuild of the reference's gfscombine/gfsjoin pair (reference:
tools/gfscombine.c, tools/gfsjoin2.c: merge per-PE simulation files back
into a single domain).  Here checkpoints are dense ``.npz`` arrays; a
"split" checkpoint is a set of files each holding a sub-block plus its
offset (written by sharded runs) — combining is array assembly.

Usage: python tools/gfscombine.py out.npz part0.npz part1.npz ...
Each part may carry ``__offset__`` (i, j) metadata; without it, parts
are assumed to tile axis 0 in order.
"""
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)

    parts = []
    for p in args.inputs:
        z = np.load(p, allow_pickle=True)
        meta = z["__meta__"].item() if "__meta__" in z else {}
        fields = {k: z[k] for k in z.files if not k.startswith("__")}
        parts.append((meta, fields))

    names = [k for k, v in parts[0][1].items() if v.ndim >= 2]
    out = {}
    meta0 = dict(parts[0][0])
    for name in parts[0][1]:
        arrs = [f[name] for _, f in parts]
        if arrs[0].ndim < 2:
            out[name] = arrs[0]
            continue
        if all("__offset__" in m or "offset" in m for m, _ in parts):
            offs = [tuple(m.get("__offset__", m.get("offset")))
                    for m, _ in parts]
            ni = max(o[0] + a.shape[0] for o, a in zip(offs, arrs))
            nj = max(o[1] + a.shape[1] for o, a in zip(offs, arrs))
            full = np.zeros((ni, nj) + arrs[0].shape[2:], arrs[0].dtype)
            for o, a in zip(offs, arrs):
                full[o[0]:o[0] + a.shape[0], o[1]:o[1] + a.shape[1]] = a
            out[name] = full
        else:
            out[name] = np.concatenate(arrs, axis=0)
    np.savez(args.output, __meta__=meta0, **out)
    print(f"wrote {args.output}: "
          f"{', '.join(f'{k}{out[k].shape}' for k in names)}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
