"""Animated streamlines from a sequence of checkpoints.

Rebuild of the reference's streamline animator (reference:
tools/streamanime.c: reads successive sims, advances streamlines,
writes OOGL frames).  Reads ``.npz`` checkpoints, traces streamlines of
(U, V) from seed points and writes one gnuplot-ready polyline file per
frame (or OOGL with --oogl).

Usage:
  python tools/streamanime.py --seeds 8 frame-*.npz -o lines-%03d.dat
"""
import argparse
import glob
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--output", default="lines-%03d.dat",
                    help="per-frame output pattern")
    ap.add_argument("--seeds", type=int, default=8,
                    help="N -> NxN uniform seed grid")
    ap.add_argument("--oogl", action="store_true")
    args = ap.parse_args(argv)

    from tools.gfs2oogl import load
    from gerris_tpu.events import graphics as gfx

    files = []
    for pat in args.inputs:
        files += sorted(glob.glob(pat)) or [pat]
    n = args.seeds
    for k, path in enumerate(files):
        grid, fields = load(path)
        if "U" not in fields or "V" not in fields:
            print(f"{path}: no velocity fields", file=sys.stderr)
            return 1
        o = grid.origin
        L = grid.shape[0] * grid.h
        seeds = [(o[0] + (i + 0.5) * L / n, o[1] + (j + 0.5) * L / n)
                 for i in range(n) for j in range(n)]
        lines = gfx.streamlines(fields["U"], fields["V"], grid, seeds)
        out = args.output % k if "%" in args.output else args.output
        with open(out, "w") as f:
            if args.oogl:
                f.write("LIST\n")
                for ln in lines:
                    f.write("{ VECT 1 %d 0\n%d\n0\n" % (len(ln), len(ln)))
                    for x, y in ln:
                        f.write(f"{x} {y} 0\n")
                    f.write("}\n")
            else:
                for ln in lines:
                    for x, y in ln:
                        f.write(f"{x} {y}\n")
                    f.write("\n")
        print(f"{out}: {len(lines)} lines", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
