"""Debug / assertion layer.

TPU-native analogue of the reference's FP-exception trapping and domain
consistency checks (reference: src/utils.c gfs_catch_floating_point_
exceptions / gfs_restore_floating_point_exceptions, src/solid.c:990-1169
gfs_domain_solid_fractions_check-style invariants).  Instead of SIGFPE
traps, ``catch_fpe`` flips JAX's nan/inf debugging on for a scope (every
jitted op re-checks its outputs), and ``check_state`` asserts the solver
invariants the reference verifies cell-by-cell.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def catch_fpe(nans: bool = True, infs: bool = True):
    """Scope with JAX nan/inf checking enabled (the analogue of
    feenableexcept(FE_DIVBYZERO|FE_INVALID) in
    gfs_catch_floating_point_exceptions): any op producing a NaN/Inf
    raises immediately with the offending primitive.  Note: forces
    op-by-op re-execution on error paths — debugging only."""
    old_n = jax.config.jax_debug_nans
    old_i = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_n)
        jax.config.update("jax_debug_infs", old_i)


def check_state(state: dict, cfg=None, where: str = "") -> list:
    """Solver-invariant audit of a state dict; returns a list of
    violation strings (empty = consistent).  Invariants mirror the
    reference's checks: all fields finite; VOF fractions in [0,1]
    (vof.c clamps); solid fractions in [0,1] w/ faces bounded by volume
    neighbors (solid.c:990-1169); depths non-negative (river.c)."""
    bad = []
    for name, v in state.items():
        a = np.asarray(v)
        if not np.isfinite(a).all():
            n = int((~np.isfinite(a)).sum())
            bad.append(f"{where}{name}: {n} non-finite values")
        if name in ("T", "A") or name.startswith("T_"):
            if a.size and (a.min() < -1e-6 or a.max() > 1.0 + 1e-6):
                bad.append(f"{where}{name}: fraction outside [0,1] "
                           f"({a.min():.3g}..{a.max():.3g})")
        if name == "P" and cfg is not None and \
                type(cfg).__name__ == "RiverConfig":
            if a.size and a.min() < 0:
                bad.append(f"{where}P: negative depth {a.min():.3g}")
    return bad


def assert_consistent(state: dict, cfg=None, where: str = ""):
    """Raise AssertionError listing every violated invariant."""
    bad = check_state(state, cfg, where)
    assert not bad, "; ".join(bad)


def CheckEvent(istep: int = 1):
    """Per-step consistency check as an event (plug into
    Simulation(events=[...]); the analogue of running the reference
    under its consistency asserts)."""
    from ..events.events import Event
    return Event(action=lambda sim: assert_consistent(
        sim.state, sim.cfg, where=f"step {sim.time.i}: "),
        istep=istep, name="CheckConsistency")
