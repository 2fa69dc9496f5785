"""The ``gerris``-equivalent command line runner.

TPU-native rebuild of the reference's CLI (reference: src/gerris.c —
option parsing:200-300, -D define expansion:245-259 (the m4/awk pipeline
reduced to simple NAME=VALUE substitution), one-shot -e event
evaluation:300-316, split -s).

Usage:
    python -m gerris_tpu [options] file.gfs
    -D NAME=VALUE   define a macro (repeatable; reference -D)
    -e EVENT        run a one-shot event after the simulation, e.g.
                    "OutputScalarNorm P" (reference -e)
    -s N            report what -s would do (box splitting is implicit
                    here: the dense grid already IS the split layout)
    -V              version / backend info
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="gerris_tpu",
        description="TPU-native Gerris: run a .gfs simulation file")
    ap.add_argument("file", nargs="?", help=".gfs simulation file")
    ap.add_argument("-D", dest="defines", action="append", default=[],
                    metavar="NAME=VALUE", help="define a macro")
    ap.add_argument("-e", dest="events", action="append", default=[],
                    metavar="EVENT", help="one-shot event after the run")
    ap.add_argument("-s", dest="split", type=int, default=0,
                    help="box splitting (informational: dense arrays "
                    "shard via jax.sharding instead)")
    ap.add_argument("-V", action="store_true", dest="version",
                    help="print version/backend info")
    ap.add_argument("--dry-run", action="store_true",
                    help="parse + build only, print a summary, no steps")
    ap.add_argument("-3", "--dim3", action="store_true", dest="dim3",
                    help="run in 3D (the reference's gerris3D binary)")
    args = ap.parse_args(argv)

    if args.version:
        import jax
        import gerris_tpu
        print(f"gerris_tpu (Gerris-compatible TPU solver)")
        print(f"jax {jax.__version__}, backend "
              f"{jax.devices()[0].platform}:{len(jax.devices())} devices")
        return 0
    if not args.file:
        ap.error("no simulation file given")

    defines = {}
    for d in args.defines:
        if "=" not in d:
            ap.error(f"bad -D '{d}' (want NAME=VALUE)")
        k, v = d.split("=", 1)
        try:
            defines[k] = float(v)
        except ValueError:
            defines[k] = v

    from .utils import gfs_config
    with open(args.file) as f:
        text = f.read()
    parsed = gfs_config.parse_gfs(text, defines=defines)
    sim = gfs_config.build_simulation(parsed, dim=3 if args.dim3 else 2)
    for e in getattr(sim, "errors", []):
        print(f"warning: {e}", file=sys.stderr)

    if args.dry_run:
        print(f"{parsed.sim_class}: level {parsed.level}, "
              f"{len(parsed.events)} events, "
              f"time {parsed.time}", file=sys.stderr)
        return 0

    sim.run()

    for spec in args.events:
        _one_shot_event(sim, spec)
    return 0


def _one_shot_event(sim, spec: str):
    """-e EVENT: fire one output event on the final state
    (reference: src/gerris.c:300-316)."""
    from .events import outputs as out
    toks = spec.split()
    name = toks[0]
    arg = toks[1] if len(toks) > 1 else "P"
    t = sim.time.t
    i = sim.time.i
    if name == "OutputScalarNorm":
        ev = out.OutputScalarNorm(arg, sink=_print_sink(name))
    elif name == "OutputScalarSum":
        ev = out.OutputScalarSum(arg, sink=_print_sink(name))
    elif name == "OutputTime":
        ev = out.OutputTime()
    else:
        print(f"warning: unsupported -e event '{name}'", file=sys.stderr)
        return
    ev.fire(sim, t, i)


def _print_sink(name):
    def sink(sim, row):
        print(name, *row)
    return sink


if __name__ == "__main__":
    sys.exit(main())
