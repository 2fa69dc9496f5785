"""Spectral analysis and spectral initialization.

TPU-native rebuild of the reference's fft/turbulence modules
(reference: modules/fft.c — GfsOutputSpectra / GfsOutputEnergySpectra
fft.h:54-121, uniform-grid sampling + FFTW-MPI slab redistribution
fft.c:348-1031 (obsolete here: fields are already dense and sharded, XLA's
distributed FFT replaces the pack/send machinery, SURVEY.md §2.2 FFT row),
shell-binned spectra write_spectra fft.c:1049; modules/turbulence.c —
GfsInitSpectra solenoidal velocity from a prescribed energy spectrum,
solenoidal_vel_field turbulence.c:626-900).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.grid import Grid


def wavenumbers(grid: Grid):
    """Integer wavenumber grids for rfftn layout, in units of 2*pi/L."""
    shape = grid.shape
    ks = []
    for a in range(grid.dim):
        n = shape[a]
        if a == grid.dim - 1:
            k = jnp.arange(n // 2 + 1)
        else:
            k = jnp.fft.fftfreq(n) * n
        sh = [1] * grid.dim
        sh[a] = k.shape[0]
        ks.append(k.reshape(sh))
    return ks


def energy_spectrum(U: list, grid: Grid):
    """Shell-integrated kinetic-energy spectrum E(k).

    Reference: GfsOutputEnergySpectra + write_spectra (modules/fft.c:1049):
    E(k) summed over integer-|k| shells; normalization such that
    sum(E) = mean kinetic energy (Parseval).
    Returns (k_shells, E).
    """
    shape = grid.shape
    ntot = 1
    for s in shape:
        ntot *= s
    ks = wavenumbers(grid)
    k2 = sum(k.astype(jnp.float64) ** 2 for k in ks)
    kmag = jnp.sqrt(k2)
    # rfft double-count correction: interior last-axis modes appear once
    # but represent conjugate pairs
    nlast = shape[-1] // 2 + 1
    last = jnp.arange(nlast)
    dbl = jnp.where((last == 0) | ((shape[-1] % 2 == 0) & (last == nlast - 1)),
                    1.0, 2.0)
    sh = [1] * grid.dim
    sh[-1] = nlast
    dbl = dbl.reshape(sh)

    e = 0.0
    for u in U:
        uh = jnp.fft.rfftn(u) / ntot
        e = e + 0.5 * (jnp.abs(uh) ** 2) * dbl
    shells = jnp.rint(kmag).astype(jnp.int32)
    # cover the k-space corners (|k| up to sqrt(sum (n_a/2)^2)) so Parseval
    # holds exactly
    kmax = int(math.ceil(math.sqrt(sum((s // 2) ** 2 for s in shape)))) + 2
    E = jnp.zeros(kmax, dtype=e.dtype).at[shells.ravel()].add(e.ravel())
    return jnp.arange(kmax), E


def scalar_spectrum(f: jnp.ndarray, grid: Grid):
    """Shell-integrated power spectrum of a scalar field
    (GfsOutputSpectra, modules/fft.c:1101)."""
    k, E = energy_spectrum([f * math.sqrt(2.0)], grid)
    return k, E


def interface_spectrum(f: jnp.ndarray, grid: Grid, axis: int = 1):
    """Power spectrum of the VOF interface height along the transverse
    direction (GfsOutputSpectraInterface, modules/fft.c fft.h:54-121:
    spectra of the interface elevation).

    The height is the column sum of f along ``axis`` (valid for a
    single-valued interface); returns (k, |eta_hat|^2) with the mean
    removed.
    """
    eta = jnp.sum(f, axis=axis) * grid.h + grid.origin[axis]
    eta = eta - jnp.mean(eta)
    n = eta.shape[0]
    ek = jnp.abs(jnp.fft.rfft(eta) / n) ** 2
    # conjugate-pair doubling (interior modes)
    dbl = jnp.where((jnp.arange(ek.shape[0]) == 0) |
                    ((n % 2 == 0) &
                     (jnp.arange(ek.shape[0]) == ek.shape[0] - 1)), 1.0, 2.0)
    return jnp.arange(ek.shape[0]), ek * dbl


def init_solenoidal(grid: Grid, spectrum: Callable, key) -> list:
    """Random solenoidal velocity field with prescribed energy spectrum.

    Reference: GfsInitSpectra solenoidal_vel_field
    (modules/turbulence.c:626-900): random phases, k-space
    divergence-free (Helmholtz) projection, inverse FFT, then rescaling so
    the shell energies match ``spectrum(k)``.
    """
    shape = grid.shape
    dim = grid.dim
    ntot = 1
    for s in shape:
        ntot *= s
    keys = jax.random.split(key, dim)
    # full complex spectrum per component via fftn of white noise
    uh = [jnp.fft.fftn(jax.random.normal(keys[c], shape)) for c in range(dim)]
    # wavenumber grids (full fft layout)
    ks = []
    for a in range(dim):
        k = jnp.fft.fftfreq(shape[a]) * shape[a]
        sh = [1] * dim
        sh[a] = shape[a]
        ks.append(k.reshape(sh).astype(jnp.float64))
    # kill the Nyquist planes first: the +n/2 and -n/2 modes share one
    # index, so the Helmholtz projection there is not conjugate-
    # symmetric — it breaks Hermitian symmetry and the .real cast would
    # leak a divergent component (few-percent k-space divergence
    # measured at 64^2 before this mask)
    nyq = 0.0
    for a in range(dim):
        nyq = nyq + jnp.where(jnp.abs(ks[a]) == shape[a] // 2, 1.0, 0.0)
    uh = [jnp.where(nyq > 0, 0.0, uh[a]) for a in range(dim)]
    k2 = sum(k ** 2 for k in ks)
    k2s = jnp.where(k2 == 0.0, 1.0, k2)
    # Helmholtz projection: u <- u - k (k.u) / k^2
    kdotu = sum(ks[a] * uh[a] for a in range(dim))
    uh = [uh[a] - ks[a] * kdotu / k2s for a in range(dim)]
    # target amplitude per mode: |u(k)|^2 ~ E(k) / N(k) with N the shell
    # mode count; rescale each shell to match exactly
    kmag = jnp.sqrt(k2)
    shells = jnp.rint(kmag).astype(jnp.int32)
    kmax = int(max(shape)) // 2 + 1
    cur = 0.0
    for a in range(dim):
        cur = cur + 0.5 * jnp.abs(uh[a] / ntot) ** 2
    Ecur = jnp.zeros(kmax).at[jnp.clip(shells, 0, kmax - 1).ravel()].add(cur.ravel())
    ktab = jnp.arange(kmax, dtype=jnp.float64)
    Etgt = jnp.where(ktab > 0, spectrum(ktab), 0.0)
    scale_shell = jnp.sqrt(Etgt / jnp.maximum(Ecur, 1e-300))
    scale = scale_shell[jnp.clip(shells, 0, kmax - 1)]
    scale = jnp.where((shells <= 0) | (shells >= kmax), 0.0, scale)
    uh = [uh[a] * scale for a in range(dim)]
    U = [jnp.fft.ifftn(uh[a]).real for a in range(dim)]
    return U
