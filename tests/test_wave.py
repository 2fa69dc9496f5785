"""GfsWave (spectral wave model) gates — reference: src/wave.c.

Small spectra (nk=3, ntheta=8) keep the 1-CPU test cheap; the physics
being gated (per-bin group-velocity transport, energy bookkeeping, InitWave
scaling, GSE anisotropic spreading) is bin-count independent.
"""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.models import wave


def _cfg(**kw):
    kw.setdefault("grid", Grid(level=6, dim=2))
    kw.setdefault("nk", 3)
    kw.setdefault("ntheta", 8)
    kw.setdefault("g", 4.0 * math.pi * 0.04)  # cg(ik=0) = 1 / gamma^ik
    return wave.WaveConfig(**kw)


def test_packet_advection():
    """A Gaussian packet in a single bin advects at that bin's group
    velocity, conserving energy (no sources)."""
    cfg = _cfg()
    grid = cfg.grid
    x, y = grid.centers
    blob = jnp.exp(-((x + 0.2) ** 2 + (y + 0.1) ** 2) / (2 * 0.05 ** 2))
    F = jnp.zeros((cfg.nk, cfg.ntheta, *grid.shape))
    ik, ith = 1, 1                      # theta = 2 pi/8 = 45 degrees
    F = F.at[ik, ith].set(blob)
    cg = cfg.group_velocities()[ik * cfg.ntheta + ith]
    t_end = 0.25 / abs(cg[0])           # move 0.25 in x (and 0.25 in y)
    Fout, t, i = wave.run(F, cfg, t_end)
    T = np.asarray(Fout[ik, ith])
    assert abs(float(jnp.sum(Fout[ik, ith]) / jnp.sum(blob)) - 1.0) < 1e-6
    # other bins stay empty
    assert float(jnp.max(jnp.abs(Fout))) == float(jnp.max(Fout[ik, ith]))
    # centroid moved by cg * t
    tot = T.sum()
    cx = (np.asarray(x) * T).sum() / tot
    cy = (np.asarray(y) * T).sum() / tot
    assert abs(cx - (-0.2 + cg[0] * t)) < 2 * grid.h, cx
    assert abs(cy - (-0.1 + cg[1] * t)) < 2 * grid.h, cy


def test_init_wave_scaling():
    """GfsInitWave rescales an arbitrary directional distribution so
    Hs = 4 sqrt(E) matches the target (scale_energy, wave.c:443-456)."""
    cfg = _cfg()
    x, _ = cfg.grid.centers
    hs = lambda x, y: 2.0 + x
    F = wave.init_wave(cfg, lambda x, y, f, th: 1.0 + math.cos(th) ** 2, hs)
    Hs = wave.significant_height(F, cfg)
    assert float(jnp.max(jnp.abs(Hs - (2.0 + x)))) < 1e-10


def test_gse_spreads_and_conserves():
    """GSE alleviation diffuses the packet anisotropically (variance grows
    fastest along the propagation direction) and conserves energy."""
    cfg = _cfg(alpha_s=1.5, ntheta=8)
    grid = cfg.grid
    x, y = grid.centers
    blob = jnp.exp(-(x ** 2 + y ** 2) / (2 * 0.03 ** 2))
    F = jnp.zeros((cfg.nk, cfg.ntheta, *grid.shape))
    F = F.at[0, 0].set(blob)            # theta = 0: along +x
    dt = 0.5 * cfg.cfl * wave.timescale(cfg)
    F1 = wave.wave_step(F, jnp.asarray(dt), cfg)
    T0 = np.asarray(blob)
    T1 = np.asarray(F1[0, 0])
    assert abs(T1.sum() / T0.sum() - 1.0) < 1e-5
    xa = np.asarray(x)
    ya = np.asarray(y)

    def var(T, c, c0):
        tot = T.sum()
        mu = (c * T).sum() / tot
        return ((c - mu) ** 2 * T).sum() / tot

    # subtract pure-advection reference: compare against alpha_s = 0
    cfg0 = _cfg(ntheta=8)
    T1a = np.asarray(wave.wave_step(F, jnp.asarray(dt), cfg0)[0, 0])
    dvx = var(T1, xa, 0) - var(T1a, xa, 0)
    dvy = var(T1, ya, 0) - var(T1a, ya, 0)
    # for a theta=0 bin the TRANSVERSE (directional-binning) diffusion
    # dominates: dtDnn/dtDss = (ntheta dcg / (2 pi ncg))^-2 ~ 67 here
    # (wave.c:131-141)
    assert dvy > 0.0
    assert dvy > 5.0 * abs(dvx), (dvx, dvy)


def _jonswap_like(cfg, amp=1.0e3, ipeak=14, sigma=0.35, th0=0.0):
    """Smooth peaked spectrum away from the f-grid edges."""
    f = cfg.frequencies
    th = cfg.thetas
    lf = np.log(f / f[ipeak]) / sigma
    spec = np.exp(-lf ** 2)[:, None] * np.maximum(
        np.cos(th - th0), 0.0)[None, :] ** 2
    return amp * spec[:, :, None, None] * np.ones((1, 1, 4, 4))


def test_snl_dia_conserves_and_downshifts():
    """DIA gates (the WAM/WW3 w3snl1 physics, modules/wavewatch.c):
    (a) the bin sum of Snl vanishes (adjoint gather/scatter matrices),
    (b) the energy-weighted mean frequency DECREASES (the classic
    nonlinear peak downshift that drives JONSWAP fetch growth)."""
    from gerris_tpu.utils import extras
    g = Grid(level=2, dim=2)
    cfg = wave.WaveConfig(grid=g)
    src = extras.wave_source_snl_dia(cfg)
    F = jnp.asarray(_jonswap_like(cfg), jnp.float32)
    S = np.asarray(src.snl(F))
    tot = abs(S.sum())
    scale = np.abs(S).sum()
    assert scale > 0.0
    assert tot < 1e-3 * scale, (tot, scale)

    # nonlinear transfer feeds the frequencies BELOW the peak (the
    # inverse cascade behind the JONSWAP peak downshift) — the energy
    # in the sub-peak band must grow under Snl alone
    def e_low(Fa, ipeak=14):
        E = np.asarray(Fa).sum(axis=(1, 2, 3))
        return E[:ipeak].sum()

    F1 = F
    for _ in range(5):
        F1 = src(F1, 0.5)
    assert np.isfinite(np.asarray(F1)).all()
    assert float(jnp.min(F1)) >= 0.0
    assert e_low(F1) > 1.02 * e_low(F), (e_low(F1), e_low(F))


def test_ww3_source_package_growth():
    """Sin+Sds+Snl composition: from a small seed under wind the total
    energy grows (duration-limited growth) and stays finite."""
    from gerris_tpu.utils import extras
    g = Grid(level=2, dim=2)
    cfg = wave.WaveConfig(grid=g)
    src = extras.wave_source_ww3(cfg, u10=60.0, wind_dir=0.0)
    F = jnp.asarray(_jonswap_like(cfg, amp=10.0), jnp.float32)
    E0 = float(jnp.sum(F))
    for _ in range(5):
        F = src(F, 0.2)
    assert np.isfinite(np.asarray(F)).all()
    assert float(jnp.sum(F)) > E0
