"""Convert a checkpoint to OOGL (Geomview) / gnuplot / VTK dumps.

Rebuild of the reference's converter (reference: tools/gfs2oogl.c —
scalar squares, vector fields, OOGL output via src/graphic.c writers).
Input is a gerris_tpu ``.npz`` checkpoint (events/outputs.py
save_checkpoint layout: fields + grid metadata).

Usage:
  python tools/gfs2oogl.py sim.npz --scalar P --format oogl > p.oogl
  python tools/gfs2oogl.py sim.npz --scalar P --format gnuplot > p.dat
  python tools/gfs2oogl.py sim.npz --vtk out.vtk
"""
import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(path):
    from gerris_tpu.core.grid import Grid
    z = np.load(path, allow_pickle=True)
    meta = z["__meta__"].item() if "__meta__" in z else {}
    level = int(meta.get("level", 0))
    fields = {k: z[k] for k in z.files if not k.startswith("__")}
    if not level:
        n = next(iter(fields.values())).shape[0]
        level = int(np.log2(n))
    grid = Grid(level=level, dim=2)
    return grid, fields


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file")
    ap.add_argument("--scalar", default="P")
    ap.add_argument("--format", choices=("oogl", "gnuplot", "vtk"),
                    default="oogl")
    ap.add_argument("--vtk", help="write all fields to a VTK file")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    grid, fields = load(args.file)
    from gerris_tpu.events import graphics as gfx

    if args.vtk or args.format == "vtk":
        out = args.vtk or args.output or "out.vtk"
        scalars = {k: v for k, v in fields.items()
                   if v.ndim == 2 and v.shape == tuple(grid.shape)}
        vec = None
        if "U" in scalars and "V" in scalars:
            vec = {"Velocity": (scalars.pop("U"), scalars.pop("V"))}
        gfx.write_vtk(out, grid, scalars, vec)
        print(f"wrote {out}", file=sys.stderr)
        return 0

    if args.scalar not in fields:
        print(f"no field '{args.scalar}' in {args.file} "
              f"(have: {sorted(fields)})", file=sys.stderr)
        return 1
    f = fields[args.scalar]
    if args.format == "oogl":
        out = args.output or "/dev/stdout"
        gfx.write_oogl(out, grid, f)
    else:
        gfx.write_gnuplot_squares(args.output or sys.stdout, grid, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
