"""GfsWave: spectral wave-action model.

TPU-native rebuild of the reference's GfsWave simulation class
(reference: src/wave.c — frequency/theta/group_velocity:34-52,
cell_E:54-69, gse_alleviation_diffusion:125-164, wave_run:171-265,
GfsInitWave:401-505; defaults wave_init:346-371, constants
src/wave.h:31-32).

The spectrum F(k, theta) is ONE dense array of shape
(nk, ntheta, nx, ny): every spectral bin advects with its own constant
group velocity, so the whole spectrum is a single vmapped BCG advection
— the TPU replaces the reference's per-bin sequential traversals (and
its per-frequency subcycling, wave.c:219-224, which only saves CPU work)
with one batched kernel at the global CFL timestep.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from ..solvers import advection as adv

F0 = 0.04       # GFS_WAVE_F0 (src/wave.h:32)
GAMMA = 1.1     # GFS_WAVE_GAMMA (src/wave.h:31)


@dataclasses.dataclass(frozen=True)
class WaveConfig:
    """Static parameters (jit static arg).  Defaults follow wave_init
    (src/wave.c:346-352): nk=25, ntheta=24, g in km/h units, van Leer
    limiter, no GSE alleviation."""
    grid: Grid
    nk: int = 25
    ntheta: int = 24
    f0: float = F0
    gamma: float = GAMMA
    g: float = 9.81 / 1000.0 * 3600.0
    alpha_s: float = 0.0
    cfl: float = 0.8
    advection: adv.AdvectionParams = adv.AdvectionParams(
        gradient="van_leer", gc=False)

    @property
    def frequencies(self):
        return self.f0 * self.gamma ** np.arange(self.nk)

    @property
    def thetas(self):
        return 2.0 * math.pi * np.arange(self.ntheta) / self.ntheta

    def group_velocities(self):
        """(ncomp, 2) constant group velocity per (ik, ith) bin:
        cg = g/(4 pi f) (cos, sin) theta (wave.c:46-52)."""
        f = self.frequencies
        cg = self.g / (4.0 * math.pi * f)
        th = self.thetas
        cgx = np.outer(cg, np.cos(th)).reshape(-1)
        cgy = np.outer(cg, np.sin(th)).reshape(-1)
        return np.stack([cgx, cgy], -1)


def _scalar_bc():
    return bcs.default_scalar_bc(2)


def _advect_one(T, cgx, cgy, grid: Grid, par: adv.AdvectionParams, dt):
    """One BCG advection step of tracer T with a constant velocity
    (cgx, cgy) — the per-bin transport of wave_run (wave.c:228-240 via
    gfs_tracer_advection_diffusion with the face field set to cg)."""
    fbc = _scalar_bc()
    ufx = jnp.full(grid.face_shape(0), cgx, T.dtype)
    ufy = jnp.full(grid.face_shape(1), cgy, T.dtype)
    ones = jnp.ones([s + 2 for s in grid.shape], T.dtype)
    uc_pad = [cgx * ones, cgy * ones]
    fvals = adv.advected_face_values(T, grid, fbc, dt, par, uc_pad)
    vf = [adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                [ufx, ufy][a], a) for a in range(2)]
    return T + adv.flux_divergence(vf, [ufx, ufy], grid, dt)


def _gse_diffusion(T, cgx, cgy, grid: Grid, cfg: WaveConfig, dt):
    """Garden-sprinkler-effect alleviation: anisotropic diffusion aligned
    with the propagation direction (Booij & Holthuijsen 1987; reference:
    gse_alleviation_diffusion src/wave.c:125-164)."""
    ncg = jnp.sqrt(cgx * cgx + cgy * cgy) + 1e-300
    dcg = (cfg.gamma - 1.0 / cfg.gamma) * ncg / 2.0
    dtheta = 2.0 * math.pi / cfg.ntheta
    alpha = cfg.alpha_s * dcg * dt
    beta = cfg.alpha_s * ncg * dtheta * dt
    dtDss = alpha * alpha / 3.0
    dtDnn = beta * beta / 3.0
    cost = cgx / ncg
    sint = cgy / ncg
    D00 = dtDss * cost * cost + dtDnn * sint * sint
    D11 = dtDss * sint * sint + dtDnn * cost * cost
    D01 = (dtDss - dtDnn) * cost * sint
    h2 = grid.h * grid.h
    fbc = _scalar_bc()
    Tp = bcs.apply_bc(T, grid, fbc, 1)
    # centred first gradients (x half-difference units, wave.c:99-102)
    gx = 0.5 * (Tp[2:, 1:-1] - Tp[:-2, 1:-1])
    gy = 0.5 * (Tp[1:-1, 2:] - Tp[1:-1, :-2])
    gxp = bcs.apply_bc(gx, grid, fbc, 1)
    gyp = bcs.apply_bc(gy, grid, fbc, 1)
    out = T
    # off-diagonal terms d_j (D_j0 dF_0) etc. (wave.c:104-112)
    out = out + D01 * 0.5 * (gxp[1:-1, 2:] - gxp[1:-1, :-2]) / h2
    out = out + D01 * 0.5 * (gyp[2:, 1:-1] - gyp[:-2, 1:-1]) / h2
    # diagonal second derivatives (wave.c:113-118)
    out = out + D00 * (Tp[2:, 1:-1] - 2.0 * T + Tp[:-2, 1:-1]) / h2
    out = out + D11 * (Tp[1:-1, 2:] - 2.0 * T + Tp[1:-1, :-2]) / h2
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def wave_step(F: jnp.ndarray, dt, cfg: WaveConfig) -> jnp.ndarray:
    """Advance the full spectrum (nk, ntheta, nx, ny) by dt: batched
    constant-velocity BCG advection of every bin (+ GSE alleviation)."""
    grid = cfg.grid
    cg = jnp.asarray(cfg.group_velocities())
    flat = F.reshape(-1, *grid.shape)

    def one(T, cgxy):
        T = _advect_one(T, cgxy[0], cgxy[1], grid, cfg.advection, dt)
        if cfg.alpha_s > 0.0:
            T = _gse_diffusion(T, cgxy[0], cgxy[1], grid, cfg, dt)
        return T

    out = jax.vmap(one)(flat, cg)
    return out.reshape(F.shape)


def timescale(cfg: WaveConfig) -> float:
    """max dt/cfl over bins: h/max|cg| (the global timestep of wave_run;
    the reference subcycles slow bins instead, wave.c:219-224)."""
    cg = np.abs(cfg.group_velocities()).max()
    return cfg.grid.h / cg


def cell_E(F: jnp.ndarray, cfg: WaveConfig) -> jnp.ndarray:
    """Total wave energy per cell: E = sum_k sum_th F dsigma dtheta
    (cell_E, src/wave.c:54-69)."""
    sigma = 2.0 * math.pi * cfg.f0 * cfg.gamma ** np.arange(cfg.nk)
    sgamma = (cfg.gamma - 1.0 / cfg.gamma) / 2.0
    df = jnp.asarray(sigma * sgamma)
    E = jnp.tensordot(df, F.sum(axis=1), axes=1)
    return E * 2.0 * math.pi / cfg.ntheta


def significant_height(F: jnp.ndarray, cfg: WaveConfig) -> jnp.ndarray:
    """Hs = 4 sqrt(E) (cell_hs, src/wave.c:330-334)."""
    E = cell_E(F, cfg)
    return jnp.where(E > 0.0, 4.0 * jnp.sqrt(jnp.maximum(E, 0.0)), 0.0)


def init_wave(cfg: WaveConfig, d, hs) -> jnp.ndarray:
    """GfsInitWave: fill every bin with d(x, y, f, theta), then rescale
    so the significant height matches hs(x, y)
    (init_energy/scale_energy, src/wave.c:435-456)."""
    grid = cfg.grid
    x, y = grid.centers
    bins = []
    for f in cfg.frequencies:
        for th in cfg.thetas:
            bins.append(jnp.broadcast_to(
                jnp.asarray(d(x, y, f, th), jnp.float64
                            if jax.config.jax_enable_x64 else jnp.float32),
                grid.shape))
    F = jnp.stack(bins).reshape(cfg.nk, cfg.ntheta, *grid.shape)
    E = cell_E(F, cfg)
    Hs = hs(x, y) if callable(hs) else hs
    scale = jnp.where(E > 0.0, Hs * Hs / (16.0 * jnp.maximum(E, 1e-300)),
                      0.0)
    return F * scale


def run(F: jnp.ndarray, cfg: WaveConfig, t_end: float, source=None):
    """Drive the spectrum to t_end at the global CFL timestep; ``source``
    is the per-step physics hook (the wavewatch seam, wave->source,
    src/wave.h:46 + wave_run:252-254)."""
    dt = cfg.cfl * timescale(cfg)
    t = 0.0
    i = 0
    while t < t_end - 1e-12:
        step = min(dt, t_end - t)
        F = wave_step(F, jnp.asarray(step, F.dtype), cfg)
        if source is not None:
            F = source(F, step)
        t += step
        i += 1
    return F, t, i
