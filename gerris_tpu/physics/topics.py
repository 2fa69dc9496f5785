"""TOPICS tsunami-source initializers (landslide / slump / pyroclastic).

TPU-native rebuild of the reference's topics module
(reference: modules/topics.c, 1,328 LoC) — the Watts et al. TOPICS
(Tsunami Open and Progressive Initial Conditions System) closed-form
initial free-surface elevation + velocity fields for four generation
mechanisms, used with GfsRiver tsunami runs:

* ``submarine_landslide`` — translational underwater slide
  (gfs_init_submarine_landslide, topics.c:180-390)
* ``submarine_slump``     — rotational slump (topics.c:394-594)
* ``subaerial_landslide`` — slide entering the water
  (topics.c:598-789)
* ``pyroclastic_flow``    — pyroclastic flow entering the sea
  (topics.c:793-984)

Each returns (eta, u, v) arrays over the supplied physical coordinate
grids: the tsunami elevation and the linear-wave-theory velocity
estimate, in the same rotated local frame convention as the reference
(``alpha``: CCW angle of north from the grid top; the characteristic
scales so/lambda/eta follow the same empirical formulas, with the
reference's validity g_warnings surfaced as warnings)."""
from __future__ import annotations

import math
import warnings

import jax.numpy as jnp

_D2R = math.pi / 180.0


def _rotated(x, y, xo, yo, alpha):
    sina, cosa = math.sin(alpha * _D2R), math.cos(alpha * _D2R)
    px, py = x - xo, y - yo
    qx = -sina * px + cosa * py
    qy = -cosa * px - sina * py
    return qx, qy, sina, cosa


def _warn(cond, msg):
    if cond:
        warnings.warn(f"TOPICS: {msg} — amplitude may be inaccurate",
                      RuntimeWarning, stacklevel=3)


def _sech2(a):
    return (2.0 / (jnp.exp(a) + jnp.exp(-a))) ** 2


def _linear_wave_velocity(eta, depth, lam, g, sina, cosa):
    """Velocity magnitude from linear wave theory at 0.469*kd
    (init_submarine_landslide, topics.c:332-346)."""
    kappa = 2.0 * math.pi / lam
    kd = kappa * depth
    omega = math.sqrt(g * kappa * math.tanh(kd))
    utot = eta * g * kappa * math.cosh(0.469 * kd) / (
        omega * math.cosh(kd))
    pos = eta > 0.0
    return jnp.where(pos, -utot * sina, 0.0), \
        jnp.where(pos, utot * cosa, 0.0)


def submarine_landslide(x, y, *, xo=0.0, yo=0.0, alpha=0.0, depth,
                        theta, length, thickness, width, gamma=1.85,
                        g=9.81):
    """Watts translational-slide tsunami source.  Returns (eta, u, v)."""
    _warn(theta > 30, f"incline angle theta > 30 deg ({theta})")
    _warn(depth / length < 0.12, "depth/length < 0.12")
    _warn(thickness / length > 0.2, "thickness/length > 0.2")
    _warn(thickness / depth > 3.33, "thickness/depth > 3.33")
    _warn(width / length < 0.06, "width/length < 0.06")
    _warn(width / length > 1.0, "width/length > 1.0")
    sint, cost = math.sin(theta * _D2R), math.cos(theta * _D2R)
    tant = math.tan(theta * _D2R)
    gmo = gamma - 1.0
    ao = g * sint * gmo / (gamma + 1.0)
    ut = math.sqrt(0.5 * g * length * math.pi * sint * gmo)
    so = ut * ut / ao
    to = ut / ao
    lam = to * math.sqrt(g * depth)
    _warn(lam / length < 1.0, f"Hammack number < 1 ({lam / length:.3g})")
    _warn(so * sint / depth > 0.35, "submergence number > 0.35")
    eta0 = 0.723 * so * (4.772e-02 - 3.559e-02 * sint
                         + 8.13e-03 * sint * sint) * \
        (thickness / length) * (length * sint / depth) ** 1.25 * \
        1.18 * (1.0 - math.exp(-2.2027 * gmo))
    _warn(eta0 / (so * sint ** 1.5) > 0.2, "eta/(so sin^1.5) > 0.2")

    qx, qy, sina, cosa = _rotated(x, y, xo, yo, alpha)
    cut = 200.0 * width
    xg = (depth + thickness / cost) / tant
    xmin = 0.95 * ((xg + 0.4338 * so * cost) - xg)
    nmin = -1.2 * 2.1 * eta0
    nmax = 0.64 * eta0 * (0.8 + 0.2 * depth / (length * sint))
    term = 1.0 - math.exp(-2.0906 * (width / lam)
                          * (1.0 + 1.0903 * (width / lam)))
    eta = term * (
        nmin * jnp.exp(-(nmin * (qx - xmin) / (lam * nmax)) ** 2)
        + nmax * jnp.exp(-((qx - xmin - 0.5 * lam) / lam) ** 2)) \
        * _sech2(3.0 * term * qy / width)
    eta = jnp.where(jnp.abs(qy) > cut,
                    eta * jnp.exp(-(5.0 * (jnp.abs(qy) - cut)
                                    / cut) ** 2), eta)
    u, v = _linear_wave_velocity(eta, depth, lam, g, sina, cosa)
    return eta, u, v


def submarine_slump(x, y, *, xo=0.0, yo=0.0, alpha=0.0, depth, theta,
                    length, thickness, width, distance, gamma=1.85,
                    g=9.81):
    """Watts rotational-slump tsunami source (topics.c:394-594)."""
    _warn(theta > 30, f"incline angle theta > 30 deg ({theta})")
    _warn(depth / length < 0.12, "depth/length < 0.12")
    _warn(thickness / length > 0.2, "thickness/length > 0.2")
    _warn(width / length < 0.25, "width/length < 0.25")
    _warn(width / length > 2.0, "width/length > 2.0")
    sint, cost = math.sin(theta * _D2R), math.cos(theta * _D2R)
    tant = math.tan(theta * _D2R)
    gmo = gamma - 1.0
    r = 0.125 * length * length / thickness + thickness / 2.0
    dphi = distance / r
    _warn(dphi > 0.53, "angular displacement > 0.53")
    _warn(r / length > 2.0 or r / length < 1.0,
          "radius/length outside [1, 2]")
    so = distance / 2.0
    to = math.sqrt(r * (gamma + 1.0) / (g * gmo))
    lam = 2.0 * to * math.sqrt(g * depth)
    _warn(0.5 * lam / length < 1.0, "Hammack number < 1")
    sg = so * sint / depth
    _warn(sg > 0.35, "submergence number > 0.35")
    eta0 = 0.723 * so * (1.4662 * gmo - 0.3454 * gmo * gmo) * \
        sint ** 0.22 * (thickness / length) * \
        (length / depth) ** 1.25 * dphi ** 0.39 * \
        (length / r) ** 0.63 * 0.1309
    _warn(eta0 / (so * sint ** 1.5) > 0.2, "eta/(so sin^1.5) > 0.2")

    qx, qy, sina, cosa = _rotated(x, y, xo, yo, alpha)
    cut = 200.0 * width
    xg = (depth + thickness / cost) / tant
    xmin = 0.565 * (xg + 0.4597 * so * cost) - xg
    delx = 0.5 * lam
    zmin = -eta0 * ((2.480 * 0.2892 - 0.7904 * sg + 1.3376 * sg * sg)
                    / (0.2892 + 0.9163 * sg))
    zmax = eta0 * ((1.686 * 0.3498 - 0.3531 * sg + 0.6466 * sg * sg)
                   / (0.3498 + 1.0257 * sg))
    nmin = 1.22 * 1.15 * zmin
    nmax = 1.22 * zmax
    denom = 0.5 * lam
    shift = 0.8 * delx
    wid = 0.5 * lam
    term = 1.0 - math.exp(-2.0906 * (width / wid)
                          * (1.0 + 1.0903 * (width / wid)))
    eta = term * (
        nmin * jnp.exp(-(nmin * (qx - xmin) / (denom * nmax)) ** 2)
        + nmax * jnp.exp(-((qx - xmin - shift) / denom) ** 2)) \
        * _sech2(3.0 * term * qy / width)
    eta = jnp.where(jnp.abs(qy) > cut,
                    eta * jnp.exp(-(5.0 * (jnp.abs(qy) - cut)
                                    / cut) ** 2), eta)
    u, v = _linear_wave_velocity(eta, depth, lam, g, sina, cosa)
    return eta, u, v


def _runout_source(x, y, xo, yo, alpha, depth, vol, width, ut, so, to,
                   g, vol_coeff):
    """Shared subaerial/pyroclastic runout machinery
    (topics.c:640-789 / 840-984; they differ only in the
    volume-validity coefficient 3.4 vs 30)."""
    fr = ut / math.sqrt(g * depth)
    _warn(fr > 4.0, f"Froude number > 4 ({fr:.3g})")
    _warn(fr < 1.0, f"Froude number < 1 ({fr:.3g})")
    lam = 0.27 * to * math.sqrt(g * depth)
    etal = 1.32 * depth * (vol * 2.0 * ut
                           / (math.pi * width * so * depth
                              * math.sqrt(depth * g))) ** 0.68
    etat = 1.32 * depth * (vol / (width * to * depth
                                  * math.sqrt(depth * g))) ** 0.68
    eta0 = min(min(etal, etat), 0.86 * depth)
    _warn(2.0 * to * ut / (so * math.pi) < 0.4
          or 2.0 * to * ut / (so * math.pi) > 2.5,
          "runout time/velocity consistency outside [0.4, 2.5]")
    _warn(to / (4.5 * math.sqrt(10.0 * math.sqrt(vol / width) / g))
          < 0.3, "runout time too short")
    vtest = vol_coeff * vol ** (1.0 / 3.0) / width
    _warn(vtest < 0.25 or vtest > 4.0, "volume/width outside validity")

    qx, qy, sina, cosa = _rotated(x, y, xo, yo, alpha)
    xmin = so + lam
    term = 4.0 * eta0 * (width + lam) * lam / vol
    if (width + lam) / term < lam:
        term = (width + lam) / lam
        eta0 = term * vol / (4.0 * (width + lam) * lam)
    eta = eta0 * _sech2(term * qy / (width + lam)) \
        * _sech2((qx - xmin) / lam)
    # nonlinear long-wave velocity fit (topics.c:751-763)
    t = eta0 / depth
    utot = math.sqrt(g * depth) * (1.0 + t / 2.0) * (
        (1.0 + 0.17006 * t) * eta / depth
        - 1.25509 * (eta / depth) ** 2)
    pos = eta > 0.0
    return eta, jnp.where(pos, -utot * sina, 0.0), \
        jnp.where(pos, utot * cosa, 0.0)


def subaerial_landslide(x, y, *, xo=0.0, yo=0.0, alpha=0.0, depth,
                        volume, width, ut, so, to, g=9.81):
    """Subaerial-landslide tsunami source (topics.c:598-789)."""
    return _runout_source(x, y, xo, yo, alpha, depth, volume, width,
                          ut, so, to, g, vol_coeff=3.4)


def pyroclastic_flow(x, y, *, xo=0.0, yo=0.0, alpha=0.0, depth,
                     volume, width, ut, so, to, g=9.81):
    """Pyroclastic-flow tsunami source (topics.c:793-984)."""
    return _runout_source(x, y, xo, yo, alpha, depth, volume, width,
                          ut, so, to, g, vol_coeff=30.0)
