#!/usr/bin/env python3
"""Cell-by-cell comparison of two simulation checkpoints.

TPU-native rebuild of the reference's regression tool
(reference: tools/gfscompare.c — norms of per-cell differences between two
simulation files, used by the test suite for serial-vs-parallel and
level-to-level equivalence checks, SURVEY.md §2.4/§4).

Usage:
    python tools/gfscompare.py a.npz b.npz [VAR ...] [-C]

-C subtracts the mean difference first (constant-mode adjustment for
pure-Neumann fields, like the reference's -C flag).
Prints per-variable: first (L1), second (L2), infty norms; exit code 1 if
shapes mismatch.
"""
import argparse
import json
import sys

import numpy as np


def compare(a_path: str, b_path: str, variables=None, adjust=False):
    A = np.load(a_path)
    B = np.load(b_path)
    out = {}
    names = variables or [k for k in A.files if k != "__meta__"]
    for v in names:
        if v not in A.files or v not in B.files:
            continue
        x = np.asarray(A[v], np.float64)
        y = np.asarray(B[v], np.float64)
        if x.shape != y.shape:
            raise SystemExit(f"{v}: shape mismatch {x.shape} vs {y.shape}")
        d = x - y
        if adjust:
            d = d - d.mean()
        out[v] = {"first": float(np.mean(np.abs(d))),
                  "second": float(np.sqrt(np.mean(d * d))),
                  "infty": float(np.max(np.abs(d)))}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("variables", nargs="*")
    ap.add_argument("-C", "--constant", action="store_true",
                    help="subtract the mean difference (pure-Neumann fields)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    res = compare(args.a, args.b, args.variables or None, args.constant)
    if args.json:
        print(json.dumps(res))
    else:
        for v, n in res.items():
            print(f"{v}: first: {n['first']:.6g} second: {n['second']:.6g} "
                  f"infty: {n['infty']:.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
