"""Spectral module validation (reference: modules/fft.c, turbulence.c)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.ops.stencils import divergence
from gerris_tpu.spectral import fft as spec


def test_energy_spectrum_single_mode():
    """A single Fourier mode lands in the right shell with Parseval-exact
    energy."""
    grid = Grid(level=6, dim=2)
    x, y = grid.centers
    U = [jnp.sin(2 * math.pi * 5 * x), jnp.zeros(grid.shape)]
    k, E = spec.energy_spectrum(U, grid)
    ke_phys = float(jnp.mean(0.5 * U[0] ** 2))
    assert int(jnp.argmax(E)) == 5
    assert abs(float(jnp.sum(E)) - ke_phys) < 1e-12
    assert float(E[5]) / float(jnp.sum(E)) > 0.999


def test_init_solenoidal():
    """GfsInitSpectra analogue: divergence-free field with the prescribed
    shell spectrum (reference: turbulence.c:626-900)."""
    grid = Grid(level=6, dim=2)
    target = lambda k: jnp.where((k >= 3) & (k <= 20), k ** (-5.0 / 3.0), 0.0)
    U = spec.init_solenoidal(grid, target, jax.random.PRNGKey(0))
    # spectral divergence: check the discrete spectral div is ~0 via FFT
    ks = []
    for a in range(2):
        kk = jnp.fft.fftfreq(grid.shape[a]) * grid.shape[a]
        sh = [1, 1]
        sh[a] = grid.shape[a]
        ks.append(kk.reshape(sh))
    div_hat = sum(ks[a] * jnp.fft.fftn(U[a]) for a in range(2))
    rel = float(jnp.max(jnp.abs(div_hat)) /
                jnp.max(jnp.abs(jnp.fft.fftn(U[0]))))
    assert rel < 1e-10
    # spectrum matches the target in the populated band
    k, E = spec.energy_spectrum(U, grid)
    for kk in (4, 8, 16):
        tgt = float(target(jnp.asarray(float(kk))))
        assert abs(float(E[kk]) - tgt) / tgt < 1e-6, kk


def test_scalar_spectrum_parseval():
    grid = Grid(level=5, dim=2)
    f = jax.random.normal(jax.random.PRNGKey(1), grid.shape)
    k, E = spec.scalar_spectrum(f, grid)
    assert abs(float(jnp.sum(E)) - float(jnp.mean(f ** 2))) < 1e-10


def test_interface_spectrum():
    """GfsOutputSpectraInterface analogue: a single-mode interface shows a
    single spectral peak with the right amplitude."""
    import math
    from gerris_tpu.physics import vof as vofm
    grid = Grid(level=6, dim=2)
    a0, kmode = 0.03, 3
    f = vofm.fraction_from_levelset(
        grid, lambda x, y: (a0 * jnp.cos(2 * math.pi * kmode * x)) - y)
    k, E = spec.interface_spectrum(f, grid, axis=1)
    assert int(jnp.argmax(E[1:])) + 1 == kmode
    # |eta_hat|^2 doubled = a0^2/2 for a cosine (fraction discretization
    # carries ~2% amplitude error at this resolution)
    assert abs(float(E[kmode]) - a0 * a0 / 2) / (a0 * a0 / 2) < 0.05
