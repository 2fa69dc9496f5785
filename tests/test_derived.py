"""Derived variables + wavelets (reference: GfsVariable* derived classes,
modules/wavelets.c)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.ops import derived
from gerris_tpu.spectral import wavelets


def test_vorticity_and_stream_function():
    """psi recovered from u = (-dpsi/dy, dpsi/dx) up to discretization."""
    grid = Grid(level=6, dim=2)
    per = bcs.periodic_bc(2)
    x, y = grid.centers
    psi_exact = jnp.sin(2 * math.pi * x) * jnp.sin(2 * math.pi * y) / \
        (2 * math.pi)
    U = [-jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y),
         jnp.cos(2 * math.pi * x) * jnp.sin(2 * math.pi * y)]
    w = derived.vorticity(U, grid, [per, per])
    # analytic vorticity = lap(psi) = -4 pi sin sin
    we = -4 * math.pi * jnp.sin(2 * math.pi * x) * jnp.sin(2 * math.pi * y)
    assert float(jnp.max(jnp.abs(w - we))) < 0.1
    psi = derived.stream_function(U, grid, [per, per])
    d = psi - psi_exact
    d = d - jnp.mean(d)
    assert float(jnp.max(jnp.abs(d))) < 2e-3
    assert float(jnp.max(derived.velocity_norm(U))) <= 1.0 + 1e-12


def test_haar_roundtrip_and_energy():
    f = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    a, det = wavelets.haar2d(f, 3)
    back = wavelets.ihaar2d(a, det)
    assert float(jnp.max(jnp.abs(back - f))) < 1e-12
    # Parseval for the orthonormal Haar transform
    e = float(jnp.sum(a * a) + sum(jnp.sum(d * d)
                                   for trio in det for d in trio))
    assert abs(e - float(jnp.sum(f * f))) < 1e-8
    # degrading a smooth field: error is the piecewise-constant (Haar)
    # representation error ~ |f'| * 2^levels * h / 2, and grows with levels
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    smooth = jnp.sin(2 * math.pi * x)
    e1 = float(jnp.max(wavelets.wavelet_error(smooth, 1)))
    e2 = float(jnp.max(wavelets.wavelet_error(smooth, 2)))
    assert e1 < e2 < 0.25
