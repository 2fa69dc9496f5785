"""Stokes wave + Okada fault init gates (reference: modules/stokes.c,
modules/okada.c)."""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.physics import geo


def test_stokes_deep():
    eps = 0.3
    eta, vel, c = geo.stokes_wave(eps, wavelength=1.0)
    x = jnp.linspace(-0.5, 0.5, 512, endpoint=False)
    e = np.asarray(eta(x))
    # zero mean, sharp crest / flat trough asymmetry of Stokes waves
    assert abs(e.mean()) < 1e-3
    assert e.max() > -e.min() * 1.2
    # third-order celerity correction
    assert abs(c - math.sqrt(9.81 / (2 * math.pi)) * (1 + eps ** 2 / 2)) \
        < 1e-12
    # irrotational below the surface
    X, Y = jnp.meshgrid(x, jnp.linspace(-0.5, -0.05, 64), indexing="ij")
    u, v = vel(X, Y)
    h = float(x[1] - x[0])
    dudy = (np.asarray(u)[:, 2:] - np.asarray(u)[:, :-2])
    dvdx = (np.asarray(v)[2:, :] - np.asarray(v)[:-2, :])
    dy = float(Y[0, 1] - Y[0, 0])
    curl = dudy[1:-1, :] / (2 * dy) - dvdx[:, 1:-1] / (2 * h)
    assert np.abs(curl).max() < 0.05 * np.abs(u).max()


def test_okada_strike_slip_antisymmetric():
    n = 128
    x = np.linspace(-50e3, 50e3, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    dz = np.asarray(geo.okada(jnp.asarray(X), jnp.asarray(Y),
                              length=20e3, width=10e3, depth=5e3,
                              strike=0.0, dip=90.0, rake=0.0, slip=1.0))
    assert np.isfinite(dz).all()
    # pure strike-slip on a vertical fault: quadrant-antisymmetric uplift
    assert abs(dz.sum()) < 0.05 * np.abs(dz).sum()


def test_okada_table2():
    """Okada (1985) Table 2 check case: x=2, y=3, d=4, dip=70deg, L=3,
    W=2, nu=1/4 — uz = -2.747e-3 (strike-slip), -3.564e-2 (dip-slip)."""
    ss, ds = geo._uz_fault(jnp.asarray(2.0), jnp.asarray(3.0),
                           d=4.0, dip=math.radians(70.0), L=3.0, W=2.0,
                           nu=0.25)
    assert abs(float(ss) - (-2.747e-3)) < 1e-6, float(ss)
    assert abs(float(ds) - (-3.564e-2)) < 1e-5, float(ds)


def test_okada_thrust_pattern():
    """Shallow thrust: uplift above the up-dip side, subsidence trough
    behind, and net positive displaced volume of the right order."""
    n = 256
    L, W, slip, dip = 30e3, 15e3, 2.0, 30.0
    x = np.linspace(-150e3, 150e3, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    dz = np.asarray(geo.okada(jnp.asarray(X), jnp.asarray(Y),
                              length=L, width=W, depth=5e3,
                              strike=90.0, dip=dip, rake=90.0, slip=slip))
    dA = (x[1] - x[0]) ** 2
    vol = dz.sum() * dA
    exact = slip * L * W * math.sin(math.radians(dip))
    assert np.isfinite(dz).all()
    assert dz.max() > 0.2 and dz.min() < -0.02
    # the displaced volume is positive and bounded by the fault potency
    # (the exact integral over the truncated window is convention- and
    # window-dependent; the pointwise gate is test_okada_table2)
    assert 0.0 < vol < 1.5 * exact, (vol, exact)
