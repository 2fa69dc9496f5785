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
# Cartesian grid reader (GfsCartesianGrid)
# ---------------------------------------------------------------------------

class CartesianGrid:
    """Tabulated Cartesian data with multilinear interpolation
    (reference: GfsCartesianGrid, src/cartesian.c:31-467 — the lookup
    tables usable inside GfsFunctions).

    File format (the reference's): first line = number of dims N, then
    per dim 'n x0 x1 ... xn-1' coordinate lines, then the values in
    C order.  Construct from a file or directly from (coords, values)."""

    def __init__(self, coords, values):
        self.coords = [jnp.asarray(c) for c in coords]
        self.values = jnp.asarray(values)
        assert self.values.shape == tuple(len(c) for c in self.coords)

    @classmethod
    def read(cls, path):
        toks = open(path).read().split()
        i = 0
        ndim = int(toks[i]); i += 1
        coords = []
        for _ in range(ndim):
            n = int(toks[i]); i += 1
            coords.append([float(v) for v in toks[i:i + n]])
            i += n
        vals = np.asarray([float(v) for v in toks[i:]]).reshape(
            [len(c) for c in coords])
        return cls(coords, vals)

    def __call__(self, *pts):
        """Multilinear interpolation at point arrays (one per dim)."""
        idxs = []
        ws = []
        for c, p in zip(self.coords, pts):
            p = jnp.asarray(p)
            i = jnp.clip(jnp.searchsorted(c, p) - 1, 0, c.size - 2)
            w = (p - c[i]) / (c[i + 1] - c[i])
            idxs.append(i)
            ws.append(jnp.clip(w, 0.0, 1.0))
        out = 0.0
        nd = len(self.coords)
        for corner in range(2 ** nd):
            wgt = 1.0
            ix = []
            for d in range(nd):
                hi = (corner >> d) & 1
                wgt = wgt * (ws[d] if hi else (1.0 - ws[d]))
                ix.append(idxs[d] + hi)
            out = out + wgt * self.values[tuple(ix)]
        return out


# ---------------------------------------------------------------------------
# wave physics source (the wavewatch seam)
# ---------------------------------------------------------------------------

def wave_source_physics(cfg, u10=0.0, wind_dir=0.0, cds=2.36e-5,
                        sin_coeff=0.25, rho_ratio=1.2e-3):
    """Deep-water wind input + whitecapping source for models/wave.run
    (the reference couples WAVEWATCH III through wave->source,
    modules/wavewatch.c; this is the classic Snyder-type exponential
    wind input and a Komen-type dissipation — the standard first-
    generation physics, giving the seam real content).

    Returns source(F, dt) -> F: per-bin exponential growth
    beta = max(0, sin_coeff (rho_a/rho_w) (u10 cos(theta-dir) c^-1 - 1))
    omega and whitecapping -cds (k/k_mean-weighted) omega F."""
    import numpy as np
    from ..models import wave as wv

    f = cfg.frequencies
    th = cfg.thetas
    g = cfg.g
    omega = 2.0 * math.pi * f
    cphase = g / omega                       # deep water
    cosd = np.cos(th - wind_dir)
    beta_in = np.maximum(
        0.0, sin_coeff * rho_ratio
        * (u10 * cosd[None, :] / cphase[:, None] - 1.0)) * omega[:, None]
    beta = jnp.asarray(beta_in)[:, :, None, None]
    om = jnp.asarray(omega)[:, None, None, None]

    def source(F, dt):
        Fin = F * jnp.exp(beta * dt)
        # Komen-type whitecapping: relative to the mean steepness
        E = wv.cell_E(Fin, cfg)
        om_mean = jnp.sum(om[:, 0, 0, 0][:, None, None]
                          * Fin.sum(axis=1), axis=0) \
            / jnp.maximum(Fin.sum(axis=(0, 1)), 1e-30)
        k_mean = om_mean ** 2 / g
        steep = E * k_mean ** 2
        gamma = cds * (steep / 3.02e-3) ** 2 * om_mean[None, None]
        return Fin * jnp.exp(-gamma * dt)
    return source


def _dia_interp_matrix(cfg, df_steps: float, dtheta: float):
    """(nb, nb) bilinear gather matrix in (log f, theta) for the DIA
    quadruplet offsets: row (i,t) interpolates F at
    (f_i * gamma^df_steps, theta_t + dtheta).  Theta wraps; frequencies
    outside the grid get zero weight (no parametric tail).  Dense
    (nb ~ 600): the gathers and their adjoint scatters run as MXU
    matmuls on TPU."""
    import numpy as np
    nf, nt = cfg.nk, cfg.ntheta
    nb = nf * nt
    P = np.zeros((nb, nb), np.float32)
    i0 = int(math.floor(df_steps))
    wf = df_steps - i0
    dth = 2.0 * math.pi / nt
    j0 = int(math.floor(dtheta / dth))
    wt = dtheta / dth - j0
    for i in range(nf):
        for ii, wfi in ((i + i0, 1.0 - wf), (i + i0 + 1, wf)):
            if not 0 <= ii < nf or wfi == 0.0:
                continue
            for jj, wtj in ((j0, 1.0 - wt), (j0 + 1, wt)):
                if wtj == 0.0:
                    continue
                for t in range(nt):
                    P[i * nt + t, ii * nt + (t + jj) % nt] += wfi * wtj
    return P


def wave_source_snl_dia(cfg, cnl: float = 3.0e7, lam: float = 0.25):
    """Nonlinear four-wave transfer Snl by the Discrete Interaction
    Approximation (Hasselmann et al. 1985; the WAM-cycle / WAVEWATCH III
    `w3snl1` physics the reference obtains by linking WAVEWATCH,
    modules/wavewatch.c).  One mirror-image pair of quadruplet
    configurations with f+ = (1+lam) f at theta + 11.5 deg and
    f- = (1-lam) f at theta - 33.6 deg:

      D = cnl g^-4 f^11 [F^2 (F+/(1+lam)^4 + F-/(1-lam)^4)
                          - 2 F F+ F- / (1-lam^2)^4]
      dSnl(f,th) -= 2 D;  dSnl(f+,th+) += D;  dSnl(f-,th-) += D

    Gathers AND adjoint scatters use the same bilinear (log f, theta)
    interpolation matrices, so the bin sum of Snl vanishes identically
    away from the frequency-grid edges (discrete conservation).
    Returns source(F, dt) -> F (explicit update, clipped at 0)."""
    import numpy as np
    from ..models import wave as wv

    nf, nt = cfg.nk, cfg.ntheta
    nb = nf * nt
    steps_p = math.log(1.0 + lam) / math.log(cfg.gamma)
    steps_m = math.log(1.0 - lam) / math.log(cfg.gamma)
    thp, thm = math.radians(11.5), math.radians(-33.6)
    mats = []
    for sp, sm in ((thp, thm), (-thp, -thm)):    # mirror pair
        mats.append((_dia_interp_matrix(cfg, steps_p, sp),
                     _dia_interp_matrix(cfg, steps_m, sm)))
    f = cfg.frequencies
    coef = cnl * cfg.g ** -4.0 * np.repeat(f ** 11.0, nt)
    coef = jnp.asarray(coef, jnp.float32)[:, None, None]
    wp4 = (1.0 + lam) ** -4.0
    wm4 = (1.0 - lam) ** -4.0
    wpm4 = (1.0 - lam * lam) ** -4.0
    mats = [(jnp.asarray(Pp), jnp.asarray(Pm)) for Pp, Pm in mats]

    def snl(F):
        nx, ny = F.shape[-2:]
        Ff = F.reshape(nb, nx, ny)
        out = jnp.zeros_like(Ff)
        for Pp, Pm in mats:
            Fp = jnp.tensordot(Pp, Ff, axes=1)
            Fm = jnp.tensordot(Pm, Ff, axes=1)
            D = coef * (Ff * Ff * (Fp * wp4 + Fm * wm4)
                        - 2.0 * Ff * Fp * Fm * wpm4)
            out = out - 2.0 * D \
                + jnp.tensordot(Pp.T, D, axes=1) \
                + jnp.tensordot(Pm.T, D, axes=1)
        return out.reshape(F.shape)

    def source(F, dt, limiter: float = 0.5):
        """Explicit update with the WW3-style growth limiter: the f^11
        weighting makes the high-frequency tail stiff under explicit
        integration (WW3 integrates sources semi-implicitly with a
        change limiter, w3srcemd); |dF| is capped at ``limiter``*F."""
        dF = dt * snl(F)
        cap = limiter * F
        return jnp.maximum(F + jnp.clip(dF, -cap, cap), 0.0)

    source.snl = snl
    return source


def wave_source_ww3(cfg, u10=0.0, wind_dir=0.0, cds=2.36e-5,
                    sin_coeff=0.25, rho_ratio=1.2e-3, cnl: float = 3.0e7):
    """Full WAVEWATCH-class source package Sin + Sds + Snl for
    models/wave.run: the Snyder-type exponential wind input and
    Komen-type whitecapping of wave_source_physics plus the DIA
    nonlinear transfer of wave_source_snl_dia (the three terms the
    reference delegates to WAVEWATCH III's w3srcemd,
    modules/wavewatch.c)."""
    lin = wave_source_physics(cfg, u10=u10, wind_dir=wind_dir, cds=cds,
                              sin_coeff=sin_coeff, rho_ratio=rho_ratio)
    nl = wave_source_snl_dia(cfg, cnl=cnl)

    def source(F, dt):
        return nl(lin(F, dt), dt)

    source.snl = nl.snl
    return source


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
