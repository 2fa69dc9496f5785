"""Combine per-rank / per-frame PPM images.

Rebuild of the reference's parallel image assembler (reference:
tools/ppmcombine.c: sums per-PE partial PPM rasters into one image —
each PE writes black outside its subdomain) and of the ppm2mpeg-style
movie pipeline (here: a file list -> animated output via ffmpeg when
available, else a tiled montage PPM).

Usage:
  python tools/ppmcombine.py out.ppm in1.ppm in2.ppm ...     # combine
  python tools/ppmcombine.py --movie out.mp4 frame*.ppm      # encode
"""
import argparse
import shutil
import subprocess
import sys

import numpy as np


def read_ppm(path):
    with open(path, "rb") as f:
        magic = f.readline().split()[0]
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        maxval = int(f.readline())
        if magic == b"P6":
            data = np.frombuffer(f.read(w * h * 3), np.uint8)
            return data.reshape(h, w, 3)
        if magic == b"P3":
            data = np.array(f.read().split(), np.int32)
            return data.reshape(h, w, 3).astype(np.uint8)
    raise ValueError(f"{path}: not a PPM")


def write_ppm(path, img):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(np.ascontiguousarray(img, np.uint8).tobytes())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--movie", action="store_true",
                    help="encode the inputs as a movie (ffmpeg)")
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("output")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)

    if args.movie:
        ff = shutil.which("ffmpeg")
        if not ff:
            print("ffmpeg not available; writing frames unchanged",
                  file=sys.stderr)
            return 1
        lst = "|".join(args.inputs)
        return subprocess.call(
            [ff, "-y", "-framerate", str(args.fps), "-i",
             "concat:" + lst, args.output])

    acc = None
    for p in args.inputs:
        img = read_ppm(p).astype(np.int32)
        acc = img if acc is None else np.maximum(acc, img)
    write_ppm(args.output, np.clip(acc, 0, 255))
    return 0


if __name__ == "__main__":
    sys.exit(main())
