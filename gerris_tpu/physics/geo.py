"""Geophysical initial conditions: Stokes waves and Okada fault
dislocations.

TPU-native rebuild of the reference's geophysics init modules:
- GfsInitStokesWave (reference: modules/stokes.c:119-197, which wraps
  Fenton's Fortran stream-function solver) — here the classical
  closed-form third-order Stokes expansion (Fenton 1985) for a wave of
  given steepness in finite/infinite depth: surface elevation plus the
  irrotational velocity field below it, for initializing two-phase wave
  simulations.
- GfsInitOkada (reference: modules/okada.c, 308 LoC) — the Okada (1985)
  rectangular-fault half-space surface displacement, used to set the
  initial free-surface elevation of tsunami runs (GfsRiver P field).

Both are pure jnp functions of coordinate arrays.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Stokes waves
# ---------------------------------------------------------------------------

def stokes_wave(steepness: float, wavelength: float = 1.0,
                depth: float = None, g: float = 9.81):
    """Third-order Stokes wave (Fenton 1985 deep-water limit when
    ``depth`` is None).  Returns (eta(x), u(x, y), v(x, y), celerity):
    eta measured from the mean level, velocities valid for y < eta.

    Reference behavior: modules/stokes.c gfs_init_stokes_wave_event
    (:136-154) fills the VOF height via stokes_height and the velocity
    field below the surface (init_velocity:119-127)."""
    k = 2.0 * math.pi / wavelength
    eps = steepness                   # = k a
    a = eps / k
    if depth is None or depth * k > 10.0:
        # deep water third-order expansion
        c = math.sqrt(g / k) * (1.0 + eps * eps / 2.0)

        def eta(x):
            ph = k * x
            return a * (jnp.cos(ph)
                        + 0.5 * eps * jnp.cos(2 * ph)
                        + (3.0 / 8.0) * eps * eps * jnp.cos(3 * ph))

        def vel(x, y):
            ph = k * x
            ex = jnp.exp(k * y)       # y <= 0 below mean level
            u = a * math.sqrt(g * k) * ex * jnp.cos(ph)
            v = a * math.sqrt(g * k) * ex * jnp.sin(ph)
            return u, v
        return eta, vel, c
    # finite depth (second order)
    kh = k * depth
    S = 1.0 / jnp.cosh(2 * kh)
    c = math.sqrt(g / k * math.tanh(kh))

    def eta(x):
        ph = k * x
        c2 = (math.cosh(kh) * (2.0 + math.cosh(2 * kh))
              / (4.0 * math.sinh(kh) ** 3))
        return a * (jnp.cos(ph) + eps * c2 * jnp.cos(2 * ph))

    def vel(x, y):
        ph = k * x
        yy = y + depth                # y measured from the bed
        u = a * math.sqrt(g * k / math.tanh(kh)) \
            * jnp.cosh(k * yy) / math.cosh(kh) * jnp.cos(ph)
        v = a * math.sqrt(g * k / math.tanh(kh)) \
            * jnp.sinh(k * yy) / math.cosh(kh) * jnp.sin(ph)
        return u, v
    return eta, vel, c


# ---------------------------------------------------------------------------
# Okada fault dislocation
# ---------------------------------------------------------------------------

def _uz_kernels(xi, eta, q, dip, nu):
    """Okada (1985) vertical-displacement kernels f(xi, eta) for the
    rectangular source, Chinnery notation (eqs. 25-30 of the paper)."""
    sd = math.sin(dip)
    cd = math.cos(dip)
    eps = 1e-12
    R = jnp.sqrt(xi * xi + eta * eta + q * q)
    db = eta * sd - q * cd            # d-tilde
    X = jnp.sqrt(xi * xi + q * q)
    if abs(cd) > 1e-6:
        I4 = (1.0 - 2.0 * nu) / cd * (
            jnp.log(jnp.maximum(R + db, eps))
            - sd * jnp.log(jnp.maximum(R + eta, eps)))
        num = eta * (X + q * cd) + X * (R + X) * sd
        den = xi * (R + X) * cd
        I5 = (1.0 - 2.0 * nu) * 2.0 / cd * jnp.arctan(
            num / jnp.where(jnp.abs(den) < eps, eps, den))
        I5 = jnp.where(jnp.abs(xi) < eps, 0.0, I5)
    else:
        I4 = -(1.0 - 2.0 * nu) * q / jnp.maximum(R + db, eps)
        I5 = -(1.0 - 2.0 * nu) * xi * sd / jnp.maximum(R + db, eps)

    uz_ss = -(db * q / (R * jnp.maximum(R + eta, eps))
              + q * sd / jnp.maximum(R + eta, eps) + I4 * sd) \
        / (2.0 * math.pi)
    ath = jnp.arctan(xi * eta / jnp.where(jnp.abs(q * R) < eps, eps,
                                          q * R))
    ath = jnp.where(jnp.abs(q) < eps, 0.0, ath)
    uz_ds = -(db * q / (R * jnp.maximum(R + xi, eps))
              + sd * ath - I5 * sd * cd) / (2.0 * math.pi)
    return uz_ss, uz_ds


def _uz_fault(x, y, *, d, dip, L, W, nu=0.25):
    """(uz_strike, uz_dip) per unit slip in Okada's fault frame:
    x along strike (fault at x in [0, L]), y perpendicular, d the depth
    of the fault's bottom edge (the paper's geometry, fig. 2; gated in
    tests against its Table 2 check case)."""
    p = y * math.cos(dip) + d * math.sin(dip)
    q = y * math.sin(dip) - d * math.cos(dip)

    def chinnery(which):
        tot = 0.0
        for xi, sx in ((x, 1.0), (x - L, -1.0)):
            for eta, se in ((p, 1.0), (p - W, -1.0)):
                ss, ds = _uz_kernels(xi, eta, q, dip, nu)
                tot = tot + sx * se * (ss if which == 0 else ds)
        return tot

    return chinnery(0), chinnery(1)


def okada(x, y, *, length, width, depth, strike, dip, rake, slip,
          xc=0.0, yc=0.0, nu=0.25):
    """Vertical surface displacement of a rectangular fault (Okada 1985).

    Reference behavior: modules/okada.c (GfsInitOkada) — (xc, yc) is the
    surface projection of the fault centroid, ``strike``/``dip``/
    ``rake`` in degrees, ``depth`` the depth of the fault TOP edge,
    uniform ``slip``; returns dz on the (x, y) arrays (the tsunami
    free-surface initial condition)."""
    dip_r = math.radians(dip)
    rake_r = math.radians(rake)
    strike_r = math.radians(strike)
    U1 = slip * math.cos(rake_r)
    U2 = slip * math.sin(rake_r)

    sa, ca = math.sin(strike_r), math.cos(strike_r)
    # fault frame: x' along strike, y' 90deg clockwise from strike (the
    # down-dip horizontal direction)
    xr = (x - xc) * sa + (y - yc) * ca
    yr = (x - xc) * ca - (y - yc) * sa
    d_bottom = depth + width * math.sin(dip_r)
    # shift to the paper's corner-based frame: fault x in [0, L]; y
    # measured from the bottom-edge surface trace (the centroid's
    # up-dip horizontal offset from the bottom edge is W/2 cos(dip))
    xf = xr + length / 2.0
    yf = yr + (width / 2.0) * math.cos(dip_r)
    ss, ds = _uz_fault(xf, yf, d=d_bottom, dip=dip_r, L=length,
                       W=width, nu=nu)
    return U1 * ss + U2 * ds
