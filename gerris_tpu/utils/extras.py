"""Small module ports: df3 export, adaptive integration, tidal forcing.

TPU-native rebuilds of the reference's small modules:
- df3 (modules/df3.c): POV-Ray density-file export of a scalar field.
- adaptiveintegration (modules/adaptiveintegration.c): integrate a 2D
  function over a cell to a tolerance by recursive subdivision —
  vectorized over all cells at once (every refinement level is one
  batched evaluation instead of a per-cell recursion).
- tide (modules/tide.c + FES2004): harmonic tidal boundary forcing
  eta(t) = sum_k A_k cos(omega_k t - phi_k) from named constituents;
  the reference reads global FES2004 grids — here amplitudes/phases are
  user-supplied per constituent (constants or spatial arrays).
"""
from __future__ import annotations

import math
import struct

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# df3
# ---------------------------------------------------------------------------

def write_df3(path: str, f, vmin=None, vmax=None, depth: int = 1):
    """POV-Ray .df3 density file of a 2D/3D scalar (reference:
    modules/df3.c).  16-bit big-endian voxels scaled to [vmin, vmax]."""
    a = np.asarray(f, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
        if depth > 1:
            a = np.repeat(a, depth, axis=2)
    lo = float(a.min()) if vmin is None else vmin
    hi = float(a.max()) if vmax is None else vmax
    span = (hi - lo) or 1.0
    q = np.clip((a - lo) / span, 0.0, 1.0)
    v = (q * 65535.0).astype(">u2")
    nx, ny, nz = a.shape
    with open(path, "wb") as fp:
        fp.write(struct.pack(">HHH", nx, ny, nz))
        # POV df3 is x-fastest
        fp.write(np.ascontiguousarray(v.transpose(2, 1, 0)).tobytes())


# ---------------------------------------------------------------------------
# adaptive integration
# ---------------------------------------------------------------------------

def adaptive_cell_integral(fn, grid, tol: float = 1e-6,
                           max_level: int = 6, min_level: int = 2):
    """Mean of ``fn(x, y)`` over every cell of ``grid``, refined until
    the per-cell subdivided estimate changes by less than ``tol``
    (reference: modules/adaptiveintegration.c's convergence-controlled
    cell integrals).  Convergence is only trusted from ``min_level`` on
    (a discontinuity can hide from all coarse samples); each round
    evaluates all cells at 4x the previous density (batched — every
    refinement level is one vectorized sweep over the whole grid)."""
    x, y = grid.centers
    h = grid.h
    prev = fn(x, y)
    done = jnp.zeros(prev.shape, bool)
    out = prev
    n = 1
    for level in range(1, max_level + 1):
        n *= 2
        offs = (jnp.arange(n) + 0.5) / n - 0.5
        est = 0.0
        for ox in offs:
            for oy in offs:
                est = est + fn(x + ox * h, y + oy * h)
        est = est / (n * n)
        conv = (jnp.abs(est - prev) < tol) & (level >= min_level)
        out = jnp.where(done, out, est)
        done = done | conv
        prev = est
        if level >= min_level and bool(jnp.all(done)):
            break
    return out


# ---------------------------------------------------------------------------
# tide
# ---------------------------------------------------------------------------

# principal constituent angular frequencies (rad/s); periods in hours
CONSTITUENTS = {
    "M2": 2.0 * math.pi / (12.4206012 * 3600.0),
    "S2": 2.0 * math.pi / (12.0 * 3600.0),
    "N2": 2.0 * math.pi / (12.65834751 * 3600.0),
    "K2": 2.0 * math.pi / (11.96723606 * 3600.0),
    "K1": 2.0 * math.pi / (23.93447213 * 3600.0),
    "O1": 2.0 * math.pi / (25.81933871 * 3600.0),
    "P1": 2.0 * math.pi / (24.06588766 * 3600.0),
    "Q1": 2.0 * math.pi / (26.868350 * 3600.0),
}


def tidal_elevation(constituents):
    """eta(x, y, t) callable from {name: (amplitude, phase_deg)} where
    amplitude/phase are scalars or arrays/callables of (x, y)
    (reference behavior: GfsBcFlather + the tide module's FES2004
    amplitude/phase grids, modules/tide.c)."""
    parsed = []
    for name, (amp, ph) in constituents.items():
        parsed.append((CONSTITUENTS[name], amp, ph))

    def eta(x, y, t):
        out = 0.0
        for w, amp, ph in parsed:
            a = amp(x, y) if callable(amp) else amp
            p = ph(x, y) if callable(ph) else ph
            out = out + a * jnp.cos(w * t - jnp.radians(p))
        return out
    return eta
