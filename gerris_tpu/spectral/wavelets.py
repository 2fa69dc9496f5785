"""Wavelet transforms on fields.

TPU-native rebuild of the reference's wavelets module
(reference: modules/wavelets.c — OutputWavelet, GfsVariableWavelet /
Degraded / ErrorWavelet: tree-based wavelet decomposition used for
analysis and compression-error adaptivity criteria).

On dense level arrays the natural equivalent is the 2D Haar multi-level
transform: detail coefficients per level ARE the reference's per-cell
wavelet coefficients (the difference between a cell and its parent's
prolongation), and the per-level energy is the compression-error
criterion.
"""
from __future__ import annotations

import jax.numpy as jnp


def haar2d(f: jnp.ndarray, levels: int):
    """Multi-level 2D Haar decomposition.

    Returns (approx, details) with details[k] = (LH, HL, HH) at level k
    (k=0 finest).  Inverse-exact with ihaar2d."""
    details = []
    a = f
    for _ in range(levels):
        n0, n1 = a.shape
        b = a.reshape(n0 // 2, 2, n1 // 2, 2)
        ll = (b[:, 0, :, 0] + b[:, 1, :, 0] + b[:, 0, :, 1] + b[:, 1, :, 1]) / 2
        lh = (b[:, 0, :, 0] - b[:, 1, :, 0] + b[:, 0, :, 1] - b[:, 1, :, 1]) / 2
        hl = (b[:, 0, :, 0] + b[:, 1, :, 0] - b[:, 0, :, 1] - b[:, 1, :, 1]) / 2
        hh = (b[:, 0, :, 0] - b[:, 1, :, 0] - b[:, 0, :, 1] + b[:, 1, :, 1]) / 2
        details.append((lh, hl, hh))
        a = ll
    return a, details


def ihaar2d(approx: jnp.ndarray, details):
    """Inverse of haar2d."""
    a = approx
    for lh, hl, hh in reversed(details):
        n0, n1 = a.shape
        b = jnp.empty((n0, 2, n1, 2), a.dtype)
        b = b.at[:, 0, :, 0].set((a + lh + hl + hh) / 2)
        b = b.at[:, 1, :, 0].set((a - lh + hl - hh) / 2)
        b = b.at[:, 0, :, 1].set((a + lh - hl - hh) / 2)
        b = b.at[:, 1, :, 1].set((a - lh - hl + hh) / 2)
        a = b.reshape(2 * n0, 2 * n1)
    return a


def wavelet_energy(f: jnp.ndarray, levels: int):
    """Per-level detail energy (OutputWavelet's spectrum-like report)."""
    _, details = haar2d(f, levels)
    return jnp.asarray([sum(jnp.sum(d * d) for d in trio)
                        for trio in details])


def degrade(f: jnp.ndarray, levels: int):
    """GfsVariableDegraded: zero the finest ``levels`` detail bands."""
    a, details = haar2d(f, levels)
    zeroed = [tuple(jnp.zeros_like(d) for d in trio) for trio in details]
    return ihaar2d(a, zeroed)


def wavelet_error(f: jnp.ndarray, levels: int):
    """GfsVariableErrorWavelet: per-cell compression error |f - degraded|."""
    return jnp.abs(f - degrade(f, levels))
