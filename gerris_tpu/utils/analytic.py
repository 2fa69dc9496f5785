"""Analytic reference solutions used by the validation suite.

The reference ships these as pre-generated data tables (e.g.
test/capwave/prosperetti); here they are computed directly.
"""
from __future__ import annotations

import math

import numpy as np


def prosperetti_capwave(times, a0, k, nu, sigma, rho1=1.0, rho2=1.0):
    """Prosperetti (1981) exact initial-value solution for the amplitude of
    a viscous capillary wave between two fluids of equal kinematic
    viscosity (J. Fluid Mech. 100 / Phys. Fluids 24:1217).

    Used by the reference's capwave test as the stored table
    test/capwave/prosperetti (see test/capwave/capwave.sh).
    Returns the signed amplitude at each time.
    """
    from scipy.special import wofz

    times = np.asarray(times, dtype=float)
    rho = rho1 + rho2
    beta = rho1 * rho2 / (rho ** 2)
    omega0_sq = sigma * k ** 3 / rho
    eps = nu * k * k
    coeffs = [1.0,
              -4.0 * beta * math.sqrt(eps),
              2.0 * (1.0 - 6.0 * beta) * eps,
              4.0 * (1.0 - 3.0 * beta) * eps ** 1.5,
              (1.0 - 4.0 * beta) * eps ** 2 + omega0_sq]
    z = np.roots(coeffs)
    out = np.zeros_like(times)
    for i, t in enumerate(times):
        s = 0.0 + 0.0j
        for j in range(4):
            Z = np.prod([z[m] - z[j] for m in range(4) if m != j])
            # exp((z^2 - eps) t) erfc(z sqrt(t)) = exp(-eps t) w(i z sqrt(t))
            s += (z[j] / Z) * (omega0_sq * a0) / (z[j] ** 2 - eps) * \
                np.exp(-eps * t) * wofz(1j * z[j] * math.sqrt(t))
        first = (4.0 * (1.0 - 4.0 * beta) * eps ** 2) / \
            (8.0 * (1.0 - 4.0 * beta) * eps ** 2 + omega0_sq) * a0 * \
            math.erfc(math.sqrt(eps * t))
        out[i] = first + s.real
    return out
