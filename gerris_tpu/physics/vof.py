"""Volume-of-fluid interface tracking with PLIC reconstruction (2D).

TPU-native rebuild of the reference's VOF machinery
(reference: src/vof.c — line geometry gfs_line_area:40 / gfs_line_alpha:93,
rectangle fractions (gfs_rectangle_fraction), MYC normals src/myc2d.h:6-66
(Aulisa et al. 2007 mixed-Youngs-centered scheme), direction-split
geometric advection with dilation compensation gfs_tracer_vof_advection
src/vof.c:1644-1737 + vof_flux:1476-1577, height-function curvature
curvature_along_direction src/vof.c:2068-2200 / gfs_height_curvature:2548).

Everything is whole-array jnp with `where` ladders instead of branches —
the branch-heavy per-cell C becomes data-parallel masks (SURVEY.md §7
stage 5).

Conventions (matching the reference):
* f = 1 in the fluid phase, 0 outside;
* the PLIC normal m points OUT of the fluid; the fluid region of the unit
  cell is {x : m.x <= alpha} with the normalization |mx| + |my| = 1;
* curvature kappa > 0 for a convex fluid body (droplet), the divergence of
  the outward normal.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs

EPS = 1e-30
FULL_TOL = 1e-10   # reference: f_over_dV clamping, src/vof.c:1616


# ---------------------------------------------------------------------------
# PLIC line geometry (closed forms; reference src/vof.c:40-230)
# ---------------------------------------------------------------------------

def line_area_positive(m1, m2, alpha):
    """Fraction of the unit square below m1 x + m2 y = alpha, for
    m1, m2 >= 0, m1 + m2 = 1.  Reference: gfs_line_area src/vof.c:40."""
    a = jnp.clip(alpha, 0.0, 1.0)
    m1s = jnp.maximum(m1, EPS)
    m2s = jnp.maximum(m2, EPS)
    v = (a * a
         - jnp.maximum(a - m1, 0.0) ** 2
         - jnp.maximum(a - m2, 0.0) ** 2) / (2.0 * m1s * m2s)
    # degenerate (one-component) normals
    v = jnp.where(m1 < EPS, jnp.clip(a / jnp.maximum(m2, EPS), 0.0, 1.0), v)
    v = jnp.where(m2 < EPS, jnp.clip(a / m1s, 0.0, 1.0), v)
    return jnp.clip(v, 0.0, 1.0)


def line_alpha_positive(m1, m2, c):
    """Inverse of line_area_positive: alpha such that the fraction is c.
    Reference: gfs_line_alpha src/vof.c:93."""
    c = jnp.clip(c, 0.0, 1.0)
    # sort so mlo <= mhi
    mlo = jnp.minimum(m1, m2)
    mhi = jnp.maximum(m1, m2)
    mlo = jnp.clip(mlo, 0.0, None)
    mhi = jnp.maximum(mhi, EPS)
    # mirror c > 1/2
    cm = jnp.minimum(c, 1.0 - c)
    c1 = mlo / (2.0 * mhi)             # triangle regime threshold
    alpha_tri = jnp.sqrt(jnp.maximum(2.0 * cm * mlo * mhi, 0.0))
    alpha_band = cm * mhi + mlo / 2.0
    a = jnp.where(cm <= c1, alpha_tri, alpha_band)
    a = jnp.where(c > 0.5, 1.0 - a, a)
    # exact full/empty
    a = jnp.where(c <= 0.0, 0.0, jnp.where(c >= 1.0, 1.0, a))
    return a


def rectangle_fraction(m1, m2, alpha, x0, x1, y0, y1):
    """Fluid fraction of the sub-rectangle [x0,x1]x[y0,y1] of the unit cell
    cut by {m.x <= alpha}, m positive-normalized.
    Reference: gfs_rectangle_fraction (src/vof.c)."""
    dx = jnp.maximum(x1 - x0, EPS)
    dy = jnp.maximum(y1 - y0, EPS)
    a = alpha - m1 * x0 - m2 * y0
    n1 = m1 * dx
    n2 = m2 * dy
    norm = jnp.maximum(n1 + n2, EPS)
    return line_area_positive(n1 / norm, n2 / norm, a / norm)


def positive_normal(mx, my, alpha):
    """Map arbitrary-sign (m, alpha) for fluid {m.x <= alpha} (cell coords
    in [0,1]^2) onto positive m via reflections.  Returns (m1, m2, alpha')."""
    a = alpha + jnp.where(mx < 0.0, -mx, 0.0) + jnp.where(my < 0.0, -my, 0.0)
    return jnp.abs(mx), jnp.abs(my), a


# ---------------------------------------------------------------------------
# 3D plane geometry (reference: gfs_plane_volume src/vof.c:288,
# gfs_plane_alpha:344 — Scardovelli & Zaleski closed forms; the inverse
# here is a vectorized bisection, exact to f64 roundoff in 40 steps)
# ---------------------------------------------------------------------------

def plane_volume_positive(m1, m2, m3, alpha):
    """Fluid volume fraction of the unit cube below m.x = alpha, for
    m >= 0 with m1+m2+m3 = 1 (inclusion-exclusion closed form)."""
    a = jnp.clip(alpha, 0.0, 1.0)

    def p3(x):
        return jnp.maximum(x, 0.0) ** 3

    den = 6.0 * jnp.maximum(m1, EPS) * jnp.maximum(m2, EPS) * \
        jnp.maximum(m3, EPS)
    v = (a ** 3 - p3(a - m1) - p3(a - m2) - p3(a - m3)
         + p3(a - m1 - m2) + p3(a - m1 - m3) + p3(a - m2 - m3)) / den
    # degenerate: one (or two) vanishing components reduce to 2D/1D
    small1 = m1 < 1e-9
    small2 = m2 < 1e-9
    small3 = m3 < 1e-9
    v2_12 = line_area_positive(m1 / jnp.maximum(m1 + m2, EPS),
                               m2 / jnp.maximum(m1 + m2, EPS),
                               a / jnp.maximum(m1 + m2, EPS))
    v2_13 = line_area_positive(m1 / jnp.maximum(m1 + m3, EPS),
                               m3 / jnp.maximum(m1 + m3, EPS),
                               a / jnp.maximum(m1 + m3, EPS))
    v2_23 = line_area_positive(m2 / jnp.maximum(m2 + m3, EPS),
                               m3 / jnp.maximum(m2 + m3, EPS),
                               a / jnp.maximum(m2 + m3, EPS))
    v = jnp.where(small3, v2_12, v)
    v = jnp.where(small2, v2_13, v)
    v = jnp.where(small1, v2_23, v)
    return jnp.clip(v, 0.0, 1.0)


def plane_alpha_positive(m1, m2, m3, c, iters: int = 40):
    """Inverse of plane_volume_positive by monotone bisection."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = jnp.zeros_like(c)
    hi = jnp.ones_like(c)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        v = plane_volume_positive(m1, m2, m3, mid)
        lo = jnp.where(v < c, mid, lo)
        hi = jnp.where(v < c, hi, mid)
    a = 0.5 * (lo + hi)
    return jnp.where(c <= 0.0, 0.0, jnp.where(c >= 1.0, 1.0, a))


def box_fraction(m1, m2, m3, alpha, b0, b1):
    """Fluid fraction of the sub-box [b0, b1] (tuples per axis) of the unit
    cube cut by {m.x <= alpha}, positive-normalized m."""
    d = [jnp.maximum(b1[k] - b0[k], EPS) for k in range(3)]
    a = alpha - m1 * b0[0] - m2 * b0[1] - m3 * b0[2]
    n = [m1 * d[0], m2 * d[1], m3 * d[2]]
    norm = jnp.maximum(n[0] + n[1] + n[2], EPS)
    return plane_volume_positive(n[0] / norm, n[1] / norm, n[2] / norm,
                                 a / norm)


def positive_normal_3d(mx, my, mz, alpha):
    a = alpha + jnp.where(mx < 0.0, -mx, 0.0) + \
        jnp.where(my < 0.0, -my, 0.0) + jnp.where(mz < 0.0, -mz, 0.0)
    return jnp.abs(mx), jnp.abs(my), jnp.abs(mz), a


def mycs_normals_3d(f_pad: jnp.ndarray):
    """3D mixed-Youngs-centered interface normal (|m|_1 = 1, pointing OUT
    of the fluid).  Reference behavior: src/myc.h:17-200 (the Aulisa et
    al. 2007 scheme); this is an independent vectorized re-derivation
    mirroring the 2D selection logic of mycs_normals: the dominant axis
    comes from the Youngs gradient, the centered candidate uses 9-cell
    column sums along it, and Youngs wins when its transverse slope
    estimate is steeper (interface too inclined for the columns)."""
    n0, n1, n2 = f_pad.shape

    def sh(i, j, k):
        return f_pad[i:n0 - 2 + i, j:n1 - 2 + j, k:n2 - 2 + k]

    my_y = youngs_normals_3d(f_pad)            # (mx, my, mz), L1-normalized

    # column sums along each axis over the 3x3 transverse neighborhood
    def colsum(d, t1, t2):
        """Sum of f over the 3-cell column along axis d at transverse
        offset (t1, t2) (cells -1..1 along d)."""
        out = 0.0
        for k in (-1, 0, 1):
            off = [0, 0, 0]
            off[d] = k
            taxes = [a for a in range(3) if a != d]
            off[taxes[0]] += t1
            off[taxes[1]] += t2
            out = out + sh(off[0] + 1, off[1] + 1, off[2] + 1)
        return out

    # centered candidate per dominant axis d: transverse slopes from
    # column-sum differences, dominant component = +-1
    cands = []
    for d in range(3):
        s_t1 = 0.0
        s_t2 = 0.0
        for t in (-1, 0, 1):
            w = 2.0 if t == 0 else 1.0
            s_t1 = s_t1 + w * (colsum(d, -1, t) - colsum(d, 1, t))
            s_t2 = s_t2 + w * (colsum(d, t, -1) - colsum(d, t, 1))
        mt1 = 0.5 * s_t1 / 4.0
        mt2 = 0.5 * s_t2 / 4.0
        # dominant sign from the central difference of f along d
        off_m = [1, 1, 1]
        off_p = [1, 1, 1]
        off_m[d] = 0
        off_p[d] = 2
        dd = sh(*off_m) - sh(*off_p)
        md = jnp.sign(dd) + (dd == 0.0)
        cands.append((mt1, mt2, md))

    mx_y, my_y2, mz_y = my_y
    absY = [jnp.abs(mx_y), jnp.abs(my_y2), jnp.abs(mz_y)]
    # dominant axis = largest Youngs component
    dom = jnp.argmax(jnp.stack(absY), axis=0)

    out = []
    for comp in range(3):
        v = 0.0
        for d in range(3):
            mt1, mt2, md = cands[d]
            taxes = [a for a in range(3) if a != d]
            if comp == d:
                c = md
            elif comp == taxes[0]:
                c = mt1
            else:
                c = mt2
            v = jnp.where(dom == d, c, v)
        out.append(v)

    # centered vs Youngs: compare transverse steepness at the dominant axis
    slope_c = 0.0
    slope_y = 0.0
    for d in range(3):
        mt1, mt2, _ = cands[d]
        taxes = [a for a in range(3) if a != d]
        sc = jnp.maximum(jnp.abs(mt1), jnp.abs(mt2))
        sy = jnp.maximum(absY[taxes[0]], absY[taxes[1]]) / \
            jnp.maximum(absY[d], EPS)
        slope_c = jnp.where(dom == d, sc, slope_c)
        slope_y = jnp.where(dom == d, sy, slope_y)
    take_youngs = slope_y > slope_c
    mx = jnp.where(take_youngs, mx_y, out[0])
    my = jnp.where(take_youngs, my_y2, out[1])
    mz = jnp.where(take_youngs, mz_y, out[2])
    norm = jnp.abs(mx) + jnp.abs(my) + jnp.abs(mz) + EPS
    return mx / norm, my / norm, mz / norm


def youngs_normals_3d(f_pad: jnp.ndarray):
    """3D Youngs-gradient interface normal (|mx|+|my|+|mz| = 1, pointing
    out of the fluid).  Reference: gfs_youngs_gradient src/vof.c:672-891
    (the full 3D MYC of src/myc.h is a later refinement)."""
    def sh(i, j, k):
        n0, n1, n2 = f_pad.shape
        return f_pad[i:n0 - 2 + i, j:n1 - 2 + j, k:n2 - 2 + k]

    def grad(axis):
        g = 0.0
        for a in (-1, 0, 1):
            for b in (-1, 0, 1):
                wt = (2.0 if a == 0 else 1.0) * (2.0 if b == 0 else 1.0)
                if axis == 0:
                    g = g + wt * (sh(2, a + 1, b + 1) - sh(0, a + 1, b + 1))
                elif axis == 1:
                    g = g + wt * (sh(a + 1, 2, b + 1) - sh(a + 1, 0, b + 1))
                else:
                    g = g + wt * (sh(a + 1, b + 1, 2) - sh(a + 1, b + 1, 0))
        return g

    # m points out of the fluid: gradient of f points INTO the fluid
    mx, my, mz = -grad(0), -grad(1), -grad(2)
    norm = jnp.abs(mx) + jnp.abs(my) + jnp.abs(mz) + EPS
    return mx / norm, my / norm, mz / norm


def reconstruct_alpha_3d(f, mx, my, mz):
    m1, m2, m3 = jnp.abs(mx), jnp.abs(my), jnp.abs(mz)
    a_pos = plane_alpha_positive(m1, m2, m3, f)
    return a_pos - jnp.where(mx < 0.0, -mx, 0.0) - \
        jnp.where(my < 0.0, -my, 0.0) - jnp.where(mz < 0.0, -mz, 0.0)


# ---------------------------------------------------------------------------
# Interface normals: MYC (mixed Youngs-centered)
# ---------------------------------------------------------------------------

def mycs_normals(f_pad: jnp.ndarray):
    """Per-cell interface normal, |mx|+|my| = 1, pointing OUT of the fluid.

    ``f_pad`` must be padded by 1 on both axes; output has the interior
    shape.  Vectorized form of the Aulisa et al. MYC scheme
    (reference: src/myc2d.h:6-66 mycs)."""
    def sh(i, j):
        n0, n1 = f_pad.shape
        return f_pad[i:n0 - 2 + i, j:n1 - 2 + j]

    c = {(i - 1, j - 1): sh(i, j) for i in range(3) for j in range(3)}
    c_t = c[-1, 1] + c[0, 1] + c[1, 1]
    c_b = c[-1, -1] + c[0, -1] + c[1, -1]
    c_r = c[1, -1] + c[1, 0] + c[1, 1]
    c_l = c[-1, -1] + c[-1, 0] + c[-1, 1]

    mx0 = 0.5 * (c_l - c_r)
    my0 = 0.5 * (c_b - c_t)
    use_y = jnp.abs(mx0) <= jnp.abs(my0)   # interface mostly horizontal
    mx0c = jnp.where(use_y, mx0, jnp.sign(mx0) + (mx0 == 0.0))
    my0c = jnp.where(use_y, jnp.sign(my0) + (my0 == 0.0), my0)

    # Youngs normal
    mx1 = (c[-1, -1] + 2.0 * c[-1, 0] + c[-1, 1]) - \
          (c[1, -1] + 2.0 * c[1, 0] + c[1, 1])
    my1 = (c[-1, -1] + 2.0 * c[0, -1] + c[1, -1]) - \
          (c[-1, 1] + 2.0 * c[0, 1] + c[1, 1])

    # pick Youngs when its slope estimate beats the central one
    slope_c = jnp.where(use_y, jnp.abs(mx0), jnp.abs(my0))
    slope_y = jnp.where(use_y,
                        jnp.abs(mx1) / (jnp.abs(my1) + EPS),
                        jnp.abs(my1) / (jnp.abs(mx1) + EPS))
    take_youngs = slope_y > slope_c
    mx = jnp.where(take_youngs, mx1, mx0c)
    my = jnp.where(take_youngs, my1, my0c)
    norm = jnp.abs(mx) + jnp.abs(my) + EPS
    return mx / norm, my / norm


def reconstruct_alpha(f: jnp.ndarray, mx: jnp.ndarray, my: jnp.ndarray):
    """Per-cell alpha of the PLIC line {m.x <= alpha} reproducing fraction f
    (in positive-normal frame, mapped back to the signed frame).
    Reference: gfs_vof_plane / vof update, src/vof.c:962."""
    m1, m2 = jnp.abs(mx), jnp.abs(my)
    a_pos = line_alpha_positive(m1, m2, f)
    # map back: alpha_signed = a_pos - (negative parts)
    a = a_pos - jnp.where(mx < 0.0, -mx, 0.0) - jnp.where(my < 0.0, -my, 0.0)
    return a


# ---------------------------------------------------------------------------
# Direction-split geometric advection
# ---------------------------------------------------------------------------

def is_full(f):
    return (f <= FULL_TOL) | (f >= 1.0 - FULL_TOL)


def _band_fraction(donor_f, m1, m2, ap, neg_axis_m, neg_trans_m, uni,
                   axis, b0, b1):
    """Fluid fraction of the upwind slab of width |uni| restricted to the
    transverse band [b0, b1] of the donor cell (positive-normal frame;
    reflections of the slab/band handle the original normal signs)."""
    cfl = jnp.abs(uni)
    s0 = jnp.where(uni > 0.0, 1.0 - cfl, 0.0)
    s1 = jnp.where(uni > 0.0, 1.0, cfl)
    r0 = jnp.where(neg_axis_m, 1.0 - s1, s0)
    r1 = jnp.where(neg_axis_m, 1.0 - s0, s1)
    t0 = jnp.where(neg_trans_m, 1.0 - b1, b0)
    t1 = jnp.where(neg_trans_m, 1.0 - b0, b1)
    if axis == 0:
        frac = rectangle_fraction(m1, m2, ap, r0, r1, t0, t1)
    else:
        frac = rectangle_fraction(m1, m2, ap, t0, t1, r0, r1)
    return jnp.where(is_full(donor_f), jnp.clip(donor_f, 0.0, 1.0), frac)


def _face_flux_1d(f_pad, mx_pad, my_pad, un, axis, dun=None, bands=4):
    """Geometric fluid flux (fraction * CFL) through each face of ``axis``.

    Inputs on the 1-ghost padded cell layout; ``un`` = u_face dt / h with
    face shape; ``dun`` = transverse velocity-gradient increment dt*du
    (face shape) enabling the reference's sub-face band refinement at
    interfacial faces.  Reference: vof_flux src/vof.c:1476-1577 (n=4
    horizontal bands with linearly interpolated band velocities at
    interfacial faces, one band elsewhere)."""
    n = f_pad.shape[axis]
    lo = [slice(None)] * f_pad.ndim
    lo[axis] = slice(0, n - 1)
    hi = [slice(None)] * f_pad.ndim
    hi[axis] = slice(1, n)
    crop = [slice(1, s - 1) for s in f_pad.shape]
    crop[axis] = slice(None)

    def cr(a):
        return a[tuple(crop)]

    fL, fR = cr(f_pad)[tuple(lo)], cr(f_pad)[tuple(hi)]
    mxL, mxR = cr(mx_pad)[tuple(lo)], cr(mx_pad)[tuple(hi)]
    myL, myR = cr(my_pad)[tuple(lo)], cr(my_pad)[tuple(hi)]

    def donor_quantities(upos):
        donor_f = jnp.where(upos, fL, fR)
        donor_mx = jnp.where(upos, mxL, mxR)
        donor_my = jnp.where(upos, myL, myR)
        a = reconstruct_alpha(donor_f, donor_mx, donor_my)
        m1, m2, ap = positive_normal(donor_mx, donor_my, a)
        neg_ax = (donor_mx if axis == 0 else donor_my) < 0.0
        neg_tr = (donor_my if axis == 0 else donor_mx) < 0.0
        return donor_f, m1, m2, ap, neg_ax, neg_tr

    # single-band flux (non-interfacial faces)
    dq = donor_quantities(un > 0.0)
    frac1 = _band_fraction(*dq, un, axis, 0.0, 1.0)
    flux = frac1 * un

    if dun is None or bands <= 1:
        return flux

    # banded flux at interfacial faces (reference: n=4, band velocity
    # uni = un + (1-n+2j) dun / (2n), vof.c:1509-1530)
    flux_b = 0.0
    for j in range(bands):
        uni = un + (1 - bands + 2 * j) * dun / (2.0 * bands)
        dqj = donor_quantities(uni > 0.0)
        fracj = _band_fraction(*dqj, uni, axis,
                               j / bands, (j + 1) / bands)
        flux_b = flux_b + fracj * uni / bands
    interfacial = ~(is_full(fL) & is_full(fR))
    return jnp.where(interfacial, flux_b, flux)


def normals(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, t=0.0):
    if grid.dim == 3:
        return mycs_normals_3d(bcs.apply_bc(f, grid, fbc, 1, t=t))
    if has_contact(fbc):
        return mycs_normals(contact_fill(
            bcs.apply_bc(f, grid, fbc, 1, t=t), 1, grid, fbc, t=t))
    return mycs_normals(bcs.apply_bc(f, grid, fbc, 1, t=t))


def _face_flux_3d(f_pad, m_pads, un, axis):
    """Single-band 3D geometric flux through faces of ``axis`` (the 3D
    counterpart of _face_flux_1d; reference vof_flux's 3D branch with
    n=1, src/vof.c:1510-1520)."""
    n = f_pad.shape[axis]
    lo = [slice(None)] * 3
    lo[axis] = slice(0, n - 1)
    hi = [slice(None)] * 3
    hi[axis] = slice(1, n)
    crop = [slice(1, sdim - 1) for sdim in f_pad.shape]
    crop[axis] = slice(None)

    def cr(a):
        return a[tuple(crop)]

    def side(a, which):
        return cr(a)[tuple(lo if which == 0 else hi)]

    upos = un > 0.0
    donor_f = jnp.where(upos, side(f_pad, 0), side(f_pad, 1))
    dm = [jnp.where(upos, side(m_pads[k], 0), side(m_pads[k], 1))
          for k in range(3)]
    a = reconstruct_alpha_3d(donor_f, *dm)
    m1, m2, m3, ap = positive_normal_3d(dm[0], dm[1], dm[2], a)
    cfl = jnp.abs(un)
    b0 = [jnp.zeros_like(cfl)] * 3
    b1 = [jnp.ones_like(cfl)] * 3
    s0 = jnp.where(upos, 1.0 - cfl, 0.0)
    s1 = jnp.where(upos, 1.0, cfl)
    neg = dm[axis] < 0.0
    b0 = list(b0)
    b1 = list(b1)
    b0[axis] = jnp.where(neg, 1.0 - s1, s0)
    b1[axis] = jnp.where(neg, 1.0 - s0, s1)
    frac = box_fraction(m1, m2, m3, ap, tuple(b0), tuple(b1))
    frac = jnp.where(is_full(donor_f), jnp.clip(donor_f, 0.0, 1.0), frac)
    return frac * un


def advect(f: jnp.ndarray, u_face: list, grid: Grid, fbc: bcs.FieldBC,
           dt, cstart: int = 0, t=0.0, concentrations=None, cbc=None):
    """One full VOF advection step: direction-split sweeps starting at
    component ``cstart`` (rotated by the caller each step, reference:
    src/vof.c:1648,1721), with the dilation field dV carried across sweeps
    (initialize_dV/f_times_dV/f_over_dV, src/vof.c:1577-1640).

    ``concentrations``: optional list of phase-intensive fields c (the
    conserved quantity is c*f per cell): each is co-advected with the
    geometric phase fluxes, c_face = donor-cell c (reference:
    GfsVariableVOFConcentration, src/vof.c:962-1010 + the t[] fluxes in
    vof_flux :1476-1577).  Returns (f, concentrations) when given.

    Requires per-sweep CFL = u dt/h <= 0.5 (reference: src/vof.c:1654).
    """
    dim = grid.dim
    dV = jnp.ones_like(f)
    cq = None
    if concentrations is not None:
        cbc = cbc or fbc
        cq = [jnp.asarray(c) * f for c in concentrations]

    def _conc_sweep(cq, fcur, dV, flux, volflux, un, c, hi, lo):
        """One sweep of every concentration amount cq = c*f (same dV
        bookkeeping as f itself)."""
        out = []
        nfc_ = flux.shape[c]
        lo_ = [slice(None)] * dim
        lo_[c] = slice(0, nfc_)
        hi_ = [slice(None)] * dim
        hi_[c] = slice(1, nfc_ + 1)
        for q in cq:
            ccur = jnp.where(fcur > EPS, q / jnp.maximum(fcur, EPS), 0.0)
            cp = bcs.apply_bc(ccur, grid, cbc, 1, t=t)
            sl = [slice(1, -1)] * dim
            sl[c] = slice(None)
            cp = cp[tuple(sl)]
            cdon = jnp.where(un > 0.0, cp[tuple(lo_)], cp[tuple(hi_)])
            cflux = cdon * flux
            cfv = -(cflux[tuple(hi)] - cflux[tuple(lo)])
            out.append((q * dV + cfv) / jnp.maximum(dV + volflux, EPS))
        return out
    for k in range(dim):
        c = (cstart + k) % dim
        flux, un = sweep_flux(f, u_face, grid, fbc, c, dt, t=t)
        n = flux.shape[c]
        hi = [slice(None)] * dim
        hi[c] = slice(1, n)
        lo = [slice(None)] * dim
        lo[c] = slice(0, n - 1)
        volflux = -(un[tuple(hi)] - un[tuple(lo)])
        if cq is not None:
            cq = _conc_sweep(cq, f, dV, flux, volflux, un, c, hi, lo)
        f, dV = sweep_update(f, dV, flux, un, c)
    if cq is not None:
        return f, [jnp.where(f > EPS, q / jnp.maximum(f, EPS), 0.0)
                   for q in cq]
    return f


def sweep_flux(f: jnp.ndarray, u_face: list, grid: Grid, fbc: bcs.FieldBC,
               c: int, dt, t=0.0):
    """Geometric fraction flux (fraction * CFL per face) + face CFL for
    ONE direction-split sweep along ``c`` — factored out of ``advect``
    so the composite-AMR advection can restrict fine fluxes onto coarse
    faces (gfs_vof_flux fine/coarse branches, src/vof.c:1214-1272)."""
    import os
    dim = grid.dim
    if dim == 2 and has_contact(fbc) \
            and os.environ.get("GERRIS_CONTACT_SWEEPS", "1") != "0":
        # contact-angle ghosts feed the reconstruction normals so the
        # interface advects through a wall contact line at the imposed
        # angle (the reference routes this through the height-function
        # normals, vof_height_plane/height_normal src/vof.c:3354-3412)
        pad2 = contact_fill(bcs.apply_bc(f, grid, fbc, 2, t=t), 2,
                            grid, fbc, t=t)
        f_pad = pad2[1:-1, 1:-1]
    else:
        f_pad = bcs.apply_bc(f, grid, fbc, 1, t=t)
        pad2 = bcs.apply_bc(f, grid, fbc, 2, t=t)
    un = u_face[c] * dt / grid.h
    if dim == 3:
        m_pads = mycs_normals_3d(pad2)
        return _face_flux_3d(f_pad, m_pads, un, c), un
    mx, my = mycs_normals(pad2)     # on the +1 ring layout
    # transverse velocity-gradient increment for the band refinement
    # (reference: grad_u src/vof.c:1595 + dun interpolation :1491)
    o = 1 - c
    uf = u_face[c]
    nfc = uf.shape[c]
    s_lo = [slice(None)] * dim
    s_lo[c] = slice(0, nfc - 1)
    s_hi = [slice(None)] * dim
    s_hi[c] = slice(1, nfc)
    ucm = 0.5 * (uf[tuple(s_lo)] + uf[tuple(s_hi)])   # cell means
    ue = jnp.pad(ucm, [(1, 1)] * dim, mode="edge")
    sl = [slice(1, s - 1) for s in ue.shape]
    slo = list(sl)
    slo[o] = slice(0, ue.shape[o] - 2)
    shi = list(sl)
    shi[o] = slice(2, ue.shape[o])
    du_cell = (ue[tuple(shi)] - ue[tuple(slo)]) / (2.0 * grid.h)
    dup = jnp.pad(du_cell, [(1, 1) if a == c else (0, 0)
                            for a in range(dim)], mode="edge")
    nf2 = dup.shape[c]
    f_lo = [slice(None)] * dim
    f_lo[c] = slice(0, nf2 - 1)
    f_hi = [slice(None)] * dim
    f_hi[c] = slice(1, nf2)
    dun = 0.5 * (dup[tuple(f_lo)] + dup[tuple(f_hi)]) * dt
    return _face_flux_1d(f_pad, mx, my, un, c, dun=dun), un


def sweep_update(f: jnp.ndarray, dV, flux, un, c: int):
    """Apply one sweep's flux divergence with the dilation-field
    bookkeeping (f_times_dV/f_over_dV, src/vof.c:1577-1640).
    Returns (f, dV)."""
    dim = f.ndim
    n = flux.shape[c]
    hi = [slice(None)] * dim
    hi[c] = slice(1, n)
    lo = [slice(None)] * dim
    lo[c] = slice(0, n - 1)
    fv = -(flux[tuple(hi)] - flux[tuple(lo)])
    volflux = -(un[tuple(hi)] - un[tuple(lo)])
    f = f * dV + fv
    dV = dV + volflux
    f = f / jnp.maximum(dV, EPS)
    f = jnp.where(f < FULL_TOL, 0.0,
                  jnp.where(f > 1.0 - FULL_TOL, 1.0, f))
    return f, dV


# ---------------------------------------------------------------------------
# Height-function curvature
# ---------------------------------------------------------------------------

def curvature(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, t=0.0,
              off_max: int = 2):
    """Interface curvature on interface cells (NaN elsewhere).

    New-style height-function method (the GfsVariableTracerVOFHeight
    estimator): 7-cell column sums of f along the dominant normal
    direction with RECENTRED windows — each cell retries window offsets
    o in {0, ±1, ±2} along the column until all three columns straddle
    the interface, the dense-array equivalent of the reference's cached
    hb/ht height variables whose column walks extend beyond the local
    7-cell window (curvature_along_direction_new src/vof.c:2732,
    height fields src/vof.h:130-146).  kappa = -H'' / (1 + H'^2)^{3/2}
    in physical units (curvature_along_direction src/vof.c:2068-2200,
    gfs_height_curvature:2548); cells where no window validates fall
    back to the parabola fit (:2201-2493)."""
    dim = grid.dim
    if dim == 3:
        return curvature_3d(f, grid, fbc, t=t)
    R = 3  # column half-height
    # Window recentring offsets, nearest first.  ``off_max=0`` selects
    # the plain centred estimator: on composite-AMR level stacks the
    # coarse restrictions of an under-resolved interface let an offset
    # window "validate" against the WRONG crossing (a different branch
    # of the same droplet), which shifted the verbatim oscillation fit
    # frequency -8.8% — the AMR tension path requests 0.  The offsets
    # also shrink with level resolution so the ghost padding never
    # exceeds the array (the 4-row capwave base level).
    o_max = min(off_max, max(0, (min(grid.shape) - 2 * R) // 2))
    OFF = (0,) + sum(((-o, o) for o in range(1, o_max + 1)), ())
    P = R + o_max + 1
    f_pad = bcs.apply_bc(f, grid, fbc, P, t=t)
    if has_contact(fbc):
        f_pad = contact_fill(f_pad, P, grid, fbc, t=t)
    n0, n1 = grid.shape

    def sub(di, dj):
        """(n0, n1) block of f_pad offset by (di, dj) cells."""
        return f_pad[P + di:P + di + n0, P + dj:P + dj + n1]

    # NOTE: the 1-ring corner ghosts of a width-P pad are NOT identical
    # to a width-1 pad's (mirror-of-mirror distances differ), and the
    # spurious-currents equilibrium is sensitive to the normals' corner
    # stencil — keep the original 1-pad for the mirror path and use the
    # contact-filled slice only when contact ghosts are required
    if has_contact(fbc):
        mx, my = mycs_normals(f_pad[P - 1:P + n0 + 1, P - 1:P + n1 + 1])
    else:
        mx, my = mycs_normals(bcs.apply_bc(f, grid, fbc, 1, t=t))
    interface = (f > FULL_TOL) & (f < 1.0 - FULL_TOL)

    kappas = []
    valids = []
    for d in range(2):
        kap_d = jnp.full(grid.shape, jnp.nan, f.dtype)
        val_d = jnp.zeros(grid.shape, bool)
        for o in OFF:
            # heights: column sums of f over the 2R+1 window at offset o
            # along axis d, for the centre column and its transverse
            # neighbours
            if d == 1:
                def col(dtrans):
                    return sum(sub(dtrans, k)
                               for k in range(o - R, o + R + 1))
                top, bot = sub(0, o + R), sub(0, o - R)
            else:
                def col(dtrans):
                    return sum(sub(k, dtrans)
                               for k in range(o - R, o + R + 1))
                top, bot = sub(o + R, 0), sub(o - R, 0)
            Hm, H0, Hp = col(-1), col(0), col(1)
            # contact-angle walls transverse to this height direction:
            # the ghost column height is EXACTLY the wall cell's height
            # shifted by cot(theta) (contact_angle_height,
            # src/vof.c:3282-3313; our column sums are orientation-free
            # so the shift is +cot at a low wall, -cot at a high wall)
            tr = 1 - d
            for side_ in range(2):
                if fbc.sides[tr][side_].kind != bcs.CONTACT \
                        or min(grid.shape) < _CONTACT_MIN_CELLS:
                    continue
                th_w = _contact_theta(grid, fbc, tr, side_, t, f.dtype)
                cot = jnp.clip(1.0 / jnp.tan(th_w), -_SLOPE_MAX,
                               _SLOPE_MAX)
                sgn = 1.0 if side_ == 0 else -1.0
                shp = [1, 1]
                shp[d] = grid.shape[d]
                cot = cot.reshape(shp)
                ridx = jax.lax.broadcasted_iota(jnp.int32, grid.shape, tr)
                wall = ridx == (0 if side_ == 0 else grid.shape[tr] - 1)
                if side_ == 0:
                    Hm = jnp.where(wall, H0 + sgn * cot, Hm)
                else:
                    Hp = jnp.where(wall, H0 + sgn * cot, Hp)
            Hx = 0.5 * (Hp - Hm)
            Hxx = Hp - 2.0 * H0 + Hm
            # orientation-free: heights counted along +d; with the fluid
            # on the +d side H -> C - H, and the formula is invariant
            # under that map combined with the outward-normal flip.
            kap = -Hxx / grid.h / jnp.power(1.0 + Hx * Hx, 1.5)
            # validity: all three columns must straddle the interface
            # (pure and opposite phases at both window ends) and the
            # height slope must be mild
            ends_ok = is_full(top) & is_full(bot) \
                & (jnp.abs(top - bot) > 0.5)
            sane = (H0 > 0.0) & (H0 < 2.0 * R + 1.0) \
                & (jnp.abs(Hx) <= 1.0)
            val = ends_ok & sane
            take = val & jnp.logical_not(val_d)
            kap_d = jnp.where(take, kap, kap_d)
            val_d = val_d | val
        kappas.append(kap_d)
        valids.append(val_d)

    # choose the dominant-normal direction's estimate
    use_y = jnp.abs(my) >= jnp.abs(mx)   # mostly-horizontal interface
    kap = jnp.where(use_y & valids[1], kappas[1],
                    jnp.where(valids[0], kappas[0],
                              jnp.where(valids[1], kappas[1], jnp.nan)))
    # parabola-fit fallback where no height column was usable
    kap_fit = parabola_curvature(f, grid, fbc, mx, my, t=t)
    kap = jnp.where(jnp.isfinite(kap), kap, kap_fit)
    return jnp.where(interface, kap, jnp.nan)


def has_contact(fbc: bcs.FieldBC) -> bool:
    """True if any boundary side carries a contact-angle BC."""
    return any(b.kind == bcs.CONTACT for pair in fbc.sides for b in pair)


# reference saturation: SLOPE_MAX = 2*HMAX/3 (src/vof.c:3211); cot(theta)
# beyond this can't be represented by neighbouring height columns anyway
_SLOPE_MAX = 2.0
# contact machinery needs the wall band resolved; below this many cells
# per axis (coarse AMR restrictions) it falls back to mirror ghosts
_CONTACT_MIN_CELLS = 12


def _contact_theta(grid: Grid, fbc: bcs.FieldBC, tr_ax: int, side: int,
                   t, dtype):
    """Contact angle (radians, saturated) along the wall on
    (tr_ax, side), evaluated at the wall-face centres."""
    b = fbc.sides[tr_ax][side]
    ta = 1 - tr_ax
    ntan = grid.shape[ta]
    xt = grid.origin[ta] + (jnp.arange(ntan) + 0.5) * grid.h
    xw = grid.boundary_coord(tr_ax, side)
    coords = (xt, xw) if tr_ax == 1 else (xw, xt)
    theta = jnp.deg2rad(jnp.broadcast_to(
        jnp.asarray(bcs._eval(b.value, coords, t), dtype), (ntan,)))
    tmin = jnp.arctan(1.0 / _SLOPE_MAX)
    return jnp.clip(theta, tmin, jnp.pi - tmin)


def contact_fill(f_pad: jnp.ndarray, P: int, grid: Grid,
                 fbc: bcs.FieldBC, t=0.0) -> jnp.ndarray:
    """Overwrite the ghost band of ``f_pad`` at contact-angle boundaries
    with fractions of the PLIC interface EXTENDED into the wall at the
    prescribed angle (2D).

    The reference imposes contact angles on its cached height columns:
    tangential ghost columns get h + cot(theta)
    (contact_angle_height, src/vof.c:3282-3313) and wall-normal columns
    at the contact line get heights from a plane with normal
    (sin(theta), cos(theta)) (height_contact_normal_bc,
    src/vof.c:3224-3284).  On dense arrays every height IS a column sum
    of the padded fraction, so one ghost-band construction yields both:
    for each wall-adjacent interior cell whose reconstruction wets part
    of the wall face (a contact-line cell), build the line with
    fluid-out normal at angle theta to the inward wall normal and the
    cell's own alpha, and evaluate its fraction in the ghost cells below
    (including tangentially shifted ghost columns, the analogue of the
    reference also setting the neighbouring column n1).  Cells with a
    fully wet (dry) wall face continue full (empty) into the wall.
    """
    if grid.dim != 2:
        return f_pad
    n0, n1 = [s - 2 * P for s in f_pad.shape]
    if min(n0, n1) < _CONTACT_MIN_CELLS:
        # coarse composite-AMR restrictions can't support the line
        # construction (the drop spans ~2 cells there); contact ghosts
        # on those levels destabilise the per-level sweeps + tension —
        # measured on test/sessile (L4 stack blows up at t~0.02 with
        # contact applied at the 4^2/8^2 levels, relaxes cleanly
        # without).  The reference has no analogue: its heights/angles
        # live on leaf cells only.
        return f_pad
    shape = (n0, n1)
    mxa, mya = mycs_normals(f_pad[P - 1:P + n0 + 1, P - 1:P + n1 + 1])
    ms = (mxa, mya)
    for tr_ax in range(2):
        for side in range(2):
            b = fbc.sides[tr_ax][side]
            if b.kind != bcs.CONTACT:
                continue
            ta = 1 - tr_ax
            ntan = shape[ta]
            r0 = 0 if side == 0 else shape[tr_ax] - 1

            def row(a):
                return a[r0, :] if tr_ax == 0 else a[:, r0]

            fr = row(f_pad[P:P + n0, P:P + n1])
            s_t = jnp.where(row(ms[ta]) < 0.0, -1.0, 1.0)
            # angle at the wall-face centres, saturated like the
            # reference (THETA_MIN, src/vof.c:3211)
            theta = _contact_theta(grid, fbc, tr_ax, side, t, f_pad.dtype)
            # local frame: +tr = INTO the domain; the fluid-out normal
            # makes angle theta with it (theta < pi/2 wets the wall)
            nrm = jnp.sin(theta) + jnp.abs(jnp.cos(theta))
            mt = s_t * jnp.sin(theta) / nrm
            mi = jnp.cos(theta) / nrm
            a_pos = line_alpha_positive(jnp.abs(mt), jnp.abs(mi), fr)
            alpha = a_pos - jnp.maximum(-mt, 0.0) - jnp.maximum(-mi, 0.0)
            # wetted fraction of the wall face (local tr = 0 edge)
            small = jnp.abs(mt) < 1e-6
            w = jnp.where(
                small, (alpha > 0.0).astype(fr.dtype),
                jnp.clip((alpha - jnp.minimum(mt, 0.0))
                         / jnp.maximum(jnp.abs(mt), EPS), 0.0, 1.0))
            interf = (fr > FULL_TOL) & (fr < 1.0 - FULL_TOL)
            contact = interf & (w > FULL_TOL) & (w < 1.0 - FULL_TOL)

            def line_val(al, k, g):
                """Fraction the line (mt, mi, al) cuts from the ghost
                cell k columns over, g rows into the wall."""
                a_kg = al + k * mt + g * mi
                ap = a_kg + jnp.maximum(-mt, 0.0) + jnp.maximum(-mi, 0.0)
                return line_area_positive(jnp.abs(mt), jnp.abs(mi), ap)

            idx = jnp.arange(ntan)
            for g in range(1, P + 1):
                ghost = jnp.where(fr >= 0.5, 1.0, 0.0)
                ghost = jnp.where(interf,
                                  jnp.where(w >= 0.5, 1.0, 0.0), ghost)
                ghost = jnp.where(contact, line_val(alpha, 0, g), ghost)
                # tangentially shifted contributions: a contact cell's
                # extended interface can cross neighbouring ghost
                # columns when |cot theta| > 1 (the reference sets the
                # neighbour column n1 explicitly, src/vof.c:3270-3279).
                # At ghost depth g the shift reaches g*SLOPE_MAX columns
                # — widen with depth, nearest-k written last (wins).
                kmax = int(g * _SLOPE_MAX) + 1
                for k in sorted(range(-kmax, kmax + 1),
                                key=lambda q: -abs(q)):
                    if k == 0:
                        continue
                    cand = jnp.roll(line_val(alpha, k, g), -k)
                    src_contact = jnp.roll(contact, -k)
                    inb = (idx + k >= 0) & (idx + k < ntan)
                    take = src_contact & inb & ~contact \
                        & (cand > FULL_TOL) & (cand < 1.0 - FULL_TOL)
                    ghost = jnp.where(take, cand, ghost)
                gi = P - g if side == 0 else P + shape[tr_ax] - 1 + g
                ghost = ghost.astype(f_pad.dtype)
                if tr_ax == 0:
                    f_pad = f_pad.at[gi, P:P + n1].set(ghost)
                else:
                    f_pad = f_pad.at[P:P + n0, gi].set(ghost)
    return f_pad


def height_fields(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, t=0.0,
                  R: int = 3):
    """Per-direction height fields — the GfsVariableTracerVOFHeight
    hb/ht API (reference src/vof.h:130-146).  In the reference the
    heights are maintained INCREMENTALLY after each VOF sweep because a
    tree traversal per use is expensive; on dense arrays a column sum is
    one vectorized op, so the equivalent is recomputation on demand.
    Returns {axis: H} with H the (2R+1)-cell fluid column sum centred on
    each cell along that axis (H - R - 1/2 is the signed interface
    height above the cell centre, in cells, where the column is
    valid)."""
    P = R + 1
    f_pad = bcs.apply_bc(f, grid, fbc, P, t=t)
    n0, n1 = grid.shape

    def sub(di, dj):
        return f_pad[P + di:P + di + n0, P + dj:P + dj + n1]

    return {
        0: sum(sub(k, 0) for k in range(-R, R + 1)),
        1: sum(sub(0, k) for k in range(-R, R + 1)),
    }


def curvature_3d(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC, t=0.0):
    """3D height-function curvature: 7-cell column sums along the dominant
    normal axis over the 3x3 transverse stencil,
    kappa = -(Hxx(1+Hy^2) + Hyy(1+Hx^2) - 2 Hxy Hx Hy) /
            (h (1+Hx^2+Hy^2)^{3/2})
    (the sum of principal curvatures — div of the outward normal, the
    quantity SourceTension consumes).  Invalid columns fall back to
    neighbor averaging via fill_curvature (the reference fits a paraboloid
    there, src/vof.c:2201-2493; averaging loses the corner cells only).
    Reference: curvature_along_direction / gfs_height_curvature,
    src/vof.c:2068-2200,2548 (3D branches)."""
    R = 3
    P = R + 1
    f_pad = bcs.apply_bc(f, grid, fbc, P, t=t)
    n0, n1, n2 = grid.shape

    def sub(di, dj, dk):
        return f_pad[P + di:P + di + n0, P + dj:P + dj + n1,
                     P + dk:P + dk + n2]

    mx, my, mz = mycs_normals_3d(bcs.apply_bc(f, grid, fbc, 1, t=t))
    m = [mx, my, mz]
    interface = (f > FULL_TOL) & (f < 1.0 - FULL_TOL)

    kappas = []
    valids = []
    for d in range(3):
        taxes = [a for a in range(3) if a != d]

        def col(t1, t2):
            s = 0.0
            for k in range(-R, R + 1):
                off = [0, 0, 0]
                off[d] = k
                off[taxes[0]] += t1
                off[taxes[1]] += t2
                s = s + sub(*off)
            return s

        H = {}
        for t1 in (-1, 0, 1):
            for t2 in (-1, 0, 1):
                H[t1, t2] = col(t1, t2)
        Hx = 0.5 * (H[1, 0] - H[-1, 0])
        Hy = 0.5 * (H[0, 1] - H[0, -1])
        Hxx = H[1, 0] - 2.0 * H[0, 0] + H[-1, 0]
        Hyy = H[0, 1] - 2.0 * H[0, 0] + H[0, -1]
        Hxy = 0.25 * (H[1, 1] - H[1, -1] - H[-1, 1] + H[-1, -1])
        den = jnp.power(1.0 + Hx * Hx + Hy * Hy, 1.5)
        kap = -(Hxx * (1.0 + Hy * Hy) + Hyy * (1.0 + Hx * Hx)
                - 2.0 * Hxy * Hx * Hy) / (grid.h * den)
        off_top = [0, 0, 0]
        off_top[d] = R
        off_bot = [0, 0, 0]
        off_bot[d] = -R
        top, bot = sub(*off_top), sub(*off_bot)
        ends_ok = is_full(top) & is_full(bot) & (jnp.abs(top - bot) > 0.5)
        sane = (H[0, 0] > 0.0) & (H[0, 0] < 2.0 * R + 1.0) & \
            (jnp.abs(Hx) <= 1.0) & (jnp.abs(Hy) <= 1.0)
        kappas.append(kap)
        valids.append(ends_ok & sane)

    absm = [jnp.abs(c) for c in m]
    dom = jnp.argmax(jnp.stack(absm), axis=0)
    kap = jnp.full(grid.shape, jnp.nan, f.dtype)
    # dominant direction first, then any valid one
    for d in range(3):
        kap = jnp.where((dom == d) & valids[d], kappas[d], kap)
    for d in range(3):
        kap = jnp.where(jnp.isnan(kap) & valids[d], kappas[d], kap)
    return jnp.where(interface, kap, jnp.nan)


def interface_point(f, mx, my):
    """A point on each cell's PLIC line, in cell-local coordinates centred
    at the cell centre: the projection of the centre onto the line.
    (Reference uses the facet centroid, gfs_vof_facet src/vof.c:1833;
    the centre projection lies on the same line.)"""
    a = reconstruct_alpha(f, mx, my)
    # line: m.(x+0.5) = a with x in [-0.5,0.5]^2 cell-local
    d = a - 0.5 * (mx + my)
    m2 = mx * mx + my * my + EPS
    return mx * d / m2, my * d / m2


def parabola_curvature(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
                       mx: jnp.ndarray, my: jnp.ndarray, t=0.0):
    """Least-squares parabola fit through neighbouring interface points in
    the local normal frame; kappa = -2 a2 / (1 + a1^2)^{3/2}.

    Reference: ParabolaFit src/vof.c:2201-2493 (fit in the rotated frame
    of the cell normal using interface fragments of the 5x5 stencil).
    """
    W = 2  # 5x5 window
    if grid.dim == 2 and has_contact(fbc):
        f_big = contact_fill(bcs.apply_bc(f, grid, fbc, W + 1, t=t),
                             W + 1, grid, fbc, t=t)
        f_all = f_big[1:-1, 1:-1]
        mcx, mcy = mycs_normals(f_big)
    else:
        f_all = bcs.apply_bc(f, grid, fbc, W, t=t)  # (n+2W) layout
        mcx, mcy = mycs_normals(bcs.apply_bc(f, grid, fbc, W + 1, t=t))
    n0, n1 = grid.shape

    def sub(a, di, dj, P=W):
        return a[P + di:P + di + n0, P + dj:P + dj + n1]

    # interface points of every padded cell (cell-local coords)
    px_all, py_all = interface_point(f_all, mcx, mcy)
    ifc_all = (f_all > FULL_TOL) & (f_all < 1.0 - FULL_TOL)

    # local frame of the centre cell
    mag = jnp.sqrt(mx * mx + my * my) + EPS
    nx, ny = mx / mag, my / mag
    tx, ty = -ny, nx
    pcx, pcy = interface_point(f, mx, my)

    # accumulate weighted normal equations for eta = a0 + a1 xi + a2 xi^2
    S = {k: 0.0 for k in ("w", "x", "x2", "x3", "x4", "y", "xy", "x2y")}
    for di in range(-W, W + 1):
        for dj in range(-W, W + 1):
            # neighbour interface point in global cell units
            qx = sub(px_all, di, dj) + di
            qy = sub(py_all, di, dj) + dj
            wgt = sub(ifc_all, di, dj).astype(f.dtype)
            rx = qx - pcx
            ry = qy - pcy
            xi = rx * tx + ry * ty
            eta = rx * nx + ry * ny
            S["w"] += wgt
            S["x"] += wgt * xi
            S["x2"] += wgt * xi * xi
            S["x3"] += wgt * xi ** 3
            S["x4"] += wgt * xi ** 4
            S["y"] += wgt * eta
            S["xy"] += wgt * xi * eta
            S["x2y"] += wgt * xi * xi * eta
    # solve the 3x3 normal equations by Cramer
    A = [[S["w"], S["x"], S["x2"]],
         [S["x"], S["x2"], S["x3"]],
         [S["x2"], S["x3"], S["x4"]]]
    b = [S["y"], S["xy"], S["x2y"]]

    def det3(M):
        return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1])
                - M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0])
                + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]))

    D = det3(A)
    Dsafe = jnp.where(jnp.abs(D) < 1e-12, 1.0, D)
    a1 = det3([[A[0][0], b[0], A[0][2]],
               [A[1][0], b[1], A[1][2]],
               [A[2][0], b[2], A[2][2]]]) / Dsafe
    a2 = det3([[A[0][0], A[0][1], b[0]],
               [A[1][0], A[1][1], b[1]],
               [A[2][0], A[2][1], b[2]]]) / Dsafe
    kap = -2.0 * a2 / grid.h / jnp.power(1.0 + a1 * a1, 1.5)
    ok = (S["w"] >= 4.0) & (jnp.abs(D) >= 1e-12)
    return jnp.where(ok, kap, jnp.nan)


def fill_curvature_weighted(kap: jnp.ndarray, T: jnp.ndarray,
                            niter: int = 2, fmin: float = 0.01):
    """f(1-f)-weighted curvature extension — the reference's kmax
    diffusion (diffuse_kmax, src/tension.c:540-565): cells where the
    fraction is well inside the interface band (f(1-f) > fmin(1-fmin))
    keep their value; other cells take the f(1-f)-weighted average of
    such neighbours.  nD."""
    dim = kap.ndim
    thr = fmin * (1.0 - fmin)
    for _ in range(niter):
        w_core = jnp.where(jnp.isfinite(kap) & (T * (1.0 - T) > thr),
                           T * (1.0 - T), 0.0)
        k0 = jnp.where(w_core > 0.0, kap, 0.0)
        pad_k = jnp.pad(k0 * w_core, 1)
        pad_w = jnp.pad(w_core, 1)
        s = 0.0
        w = 0.0
        for ax in range(dim):
            for off in (0, 2):
                idx = [slice(1, -1)] * dim
                idx[ax] = slice(off, pad_k.shape[ax] - 2 + off)
                s = s + pad_k[tuple(idx)]
                w = w + pad_w[tuple(idx)]
        avg = s / jnp.maximum(w, 1e-30)
        keep = w_core > 0.0
        kap = jnp.where(keep, kap, jnp.where(w > 0.0, avg, kap))
    return kap


def fill_curvature(kap: jnp.ndarray, interface_band: jnp.ndarray,
                   niter: int = 4):
    """Propagate defined curvature to neighbouring cells by averaging
    (replaces the reference's interpolation from interface fragments,
    src/tension.c:390-760 GfsVariableCurvature diffusion).  nD."""
    dim = kap.ndim
    for _ in range(niter):
        ok = jnp.isfinite(kap)
        k0 = jnp.where(ok, kap, 0.0)
        pad_k = jnp.pad(k0, 1)
        pad_ok = jnp.pad(ok, 1).astype(kap.dtype)
        s = 0.0
        w = 0.0
        for ax in range(dim):
            for off in (0, 2):
                idx = [slice(1, -1)] * dim
                idx[ax] = slice(off, pad_k.shape[ax] - 2 + off)
                s = s + pad_k[tuple(idx)]
                w = w + pad_ok[tuple(idx)]
        avg = s / jnp.maximum(w, 1.0)
        kap = jnp.where(ok, kap, jnp.where(w > 0, avg, jnp.nan))
    return kap


# ---------------------------------------------------------------------------
# Fraction initialization from an implicit function
# ---------------------------------------------------------------------------

def fraction_from_levelset(grid: Grid, phi, refine: int = 0):
    """Volume fraction of {phi > 0} by per-cell linearization of the level
    set sampled at cell vertices — exact for linear phi, O(h^2 kappa)
    smooth error for curved interfaces.

    Reference: gfs_vof_init / GfsInitFraction intersect the implicit
    surface exactly (src/vof.c gfs_vof_init, src/solid.c); the vertex
    linearization is its dense-array equivalent (same approach as the
    reference's fraction-from-levelset helpers) and, unlike pointwise
    subsampling, produces smooth fractions usable for height-function
    curvature.

    ``refine``: evaluate ``refine`` levels finer and average-pool back —
    the dense analogue of the reference's ``RefineSurface N`` high-res
    initial fractions (test/spurious/spurious.gfs:7).
    """
    import numpy as np

    if refine > 0:
        import dataclasses
        gf = dataclasses.replace(grid, level=grid.level + refine)
        f = fraction_from_levelset(gf, phi)
        r = 1 << refine
        sh = []
        for ax in range(grid.dim):
            sh += [f.shape[ax] // r, r]
        return f.reshape(sh).mean(
            axis=tuple(2 * a + 1 for a in range(grid.dim)))

    if grid.dim == 3:
        ax = np.asarray(grid.axis_faces(0))
        ay = np.asarray(grid.axis_faces(1))
        az = np.asarray(grid.axis_faces(2))
        X, Y, Z = np.meshgrid(ax, ay, az, indexing="ij")
        pv = phi(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
        c = {}
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    c[i, j, k] = pv[i:pv.shape[0] - 1 + i,
                                    j:pv.shape[1] - 1 + j,
                                    k:pv.shape[2] - 1 + k]
        gx = 0.25 * sum(c[1, j, k] - c[0, j, k]
                        for j in (0, 1) for k in (0, 1))
        gy = 0.25 * sum(c[i, 1, k] - c[i, 0, k]
                        for i in (0, 1) for k in (0, 1))
        gz = 0.25 * sum(c[i, j, 1] - c[i, j, 0]
                        for i in (0, 1) for j in (0, 1))
        pc = 0.125 * sum(c.values())
        mx, my, mz = -gx, -gy, -gz
        alpha = pc + 0.5 * (mx + my + mz)
        norm = jnp.abs(mx) + jnp.abs(my) + jnp.abs(mz) + EPS
        m1, m2, m3, a = positive_normal_3d(mx / norm, my / norm, mz / norm,
                                           alpha / norm)
        fr = plane_volume_positive(m1, m2, m3, a)
        allpos = sum((v > 0) for v in c.values()) == 8
        allneg = sum((v <= 0) for v in c.values()) == 8
        return jnp.where(allpos, 1.0, jnp.where(allneg, 0.0, fr))

    ax = np.asarray(grid.axis_faces(0))
    ay = np.asarray(grid.axis_faces(1))
    X, Y = np.meshgrid(ax, ay, indexing="ij")
    pv = phi(jnp.asarray(X), jnp.asarray(Y))
    p00 = pv[:-1, :-1]
    p10 = pv[1:, :-1]
    p01 = pv[:-1, 1:]
    p11 = pv[1:, 1:]
    # gradient (per cell edge units) and centre value from the vertices
    gx = 0.5 * ((p10 + p11) - (p00 + p01))
    gy = 0.5 * ((p01 + p11) - (p00 + p10))
    pc = 0.25 * (p00 + p01 + p10 + p11)
    # linearize phi(u) ~ pc + g.(u - 1/2) on the unit cell; fluid {phi > 0}
    # becomes {m.u <= alpha} with m = -g, alpha = pc + (mx+my)/2
    mx = -gx
    my = -gy
    alpha = pc + 0.5 * (mx + my)
    norm = jnp.abs(mx) + jnp.abs(my) + EPS
    m1, m2, a = positive_normal(mx / norm, my / norm, alpha / norm)
    f = line_area_positive(m1, m2, a)
    allpos = (p00 > 0) & (p01 > 0) & (p10 > 0) & (p11 > 0)
    allneg = (p00 <= 0) & (p01 <= 0) & (p10 <= 0) & (p11 <= 0)
    return jnp.where(allpos, 1.0, jnp.where(allneg, 0.0, f))


def _interleave2(c00, c01, c10, c11):
    """fine[2a+i, 2b+j] = c_ij[a, b]."""
    n0, n1 = c00.shape
    r0 = jnp.stack([c00, c01], axis=-1).reshape(n0, 2 * n1)
    r1 = jnp.stack([c10, c11], axis=-1).reshape(n0, 2 * n1)
    return jnp.stack([r0, r1], axis=1).reshape(2 * n0, 2 * n1)


def prolong_geometric(f: jnp.ndarray, grid: Grid, fbc: bcs.FieldBC,
                      t=0.0):
    """PLIC-geometric prolongation of a VOF fraction to the next finer
    level: each fine child gets the volume of the coarse PLIC
    reconstruction inside its sub-box, so the children average exactly
    back to the coarse fraction and interface sharpness is preserved.

    Reference: gfs_vof_coarse_fine (src/vof.c:210-296) — the reference
    subdivides the reconstruction the same way; the composite VOF
    sweeps must see these ghosts, NOT linearly interpolated fractions
    (linear prolongation smears the slave-cell interface band and
    systematically biases the lmax sweeps — the round-4 composite
    oscillation-frequency drift).
    """
    full = is_full(f)
    f_pad = bcs.apply_bc(f, grid, fbc, 1, t=t)
    if grid.dim == 2:
        mx, my = mycs_normals(f_pad)
        alpha = reconstruct_alpha(f, mx, my)
        m1, m2, ap = positive_normal(mx, my, alpha)
        ch = {}
        for i in (0, 1):
            # the positive-normal frame reflects axes with m < 0:
            # child i covers [0.5i, 0.5i+0.5] in the signed frame
            x0 = jnp.where(mx < 0.0, 0.5 * (1 - i), 0.5 * i)
            for j in (0, 1):
                y0 = jnp.where(my < 0.0, 0.5 * (1 - j), 0.5 * j)
                q = rectangle_fraction(m1, m2, ap, x0, x0 + 0.5,
                                       y0, y0 + 0.5)
                ch[i, j] = jnp.where(full, f, q)
        return _interleave2(ch[0, 0], ch[0, 1], ch[1, 0], ch[1, 1])
    mx, my, mz = mycs_normals_3d(f_pad)
    alpha = reconstruct_alpha_3d(f, mx, my, mz)
    m1, m2, m3, ap = positive_normal_3d(mx, my, mz, alpha)
    ch = {}
    for i in (0, 1):
        x0 = jnp.where(mx < 0.0, 0.5 * (1 - i), 0.5 * i)
        for j in (0, 1):
            y0 = jnp.where(my < 0.0, 0.5 * (1 - j), 0.5 * j)
            for k in (0, 1):
                z0 = jnp.where(mz < 0.0, 0.5 * (1 - k), 0.5 * k)
                q = box_fraction(m1, m2, m3, ap, (x0, y0, z0),
                                 (x0 + 0.5, y0 + 0.5, z0 + 0.5))
                ch[i, j, k] = jnp.where(full, f, q)
    n0, n1, n2 = f.shape
    pair = {}
    for i in (0, 1):
        for j in (0, 1):
            pair[i, j] = jnp.stack([ch[i, j, 0], ch[i, j, 1]],
                                   axis=-1).reshape(n0, n1, 2 * n2)
    quad = {}
    for i in (0, 1):
        quad[i] = jnp.stack([pair[i, 0], pair[i, 1]],
                            axis=2).reshape(n0, 2 * n1, 2 * n2)
    return jnp.stack([quad[0], quad[1]], axis=1).reshape(
        2 * n0, 2 * n1, 2 * n2)


def init_fraction(grid: Grid, phi, subsample: int = 4):
    """Volume fraction of {phi > 0} per cell by sub-cell sampling.

    Reference: GfsInitFraction / gfs_domain_init_fraction (src/event.c,
    src/vof.c gfs_vof_init) — the reference intersects exactly with the
    implicit surface; sub-sampling at ``subsample``^dim points converges to
    the same fractions at O((h/subsample)^2).
    """
    import numpy as np

    n = subsample
    offs = (np.arange(n) + 0.5) / n - 0.5
    f = 0.0
    if grid.dim == 2:
        x, y = grid.centers
        for ox in offs:
            for oy in offs:
                f = f + (phi(x + ox * grid.h, y + oy * grid.h) > 0.0)
        return jnp.asarray(f) / (n * n)
    x, y, z = grid.centers
    for ox in offs:
        for oy in offs:
            for oz in offs:
                f = f + (phi(x + ox * grid.h, y + oy * grid.h,
                             z + oz * grid.h) > 0.0)
    return jnp.asarray(f) / (n ** 3)


def facets(f, grid: Grid, fbc: bcs.FieldBC, t=0.0):
    """PLIC interface facets as physical line segments (2D, host-side).

    Returns an (nseg, 4) numpy array of (x1, y1, x2, y2): for each
    interface cell, the intersection of its PLIC line {m.s = alpha,
    s in [0,1]^2 cell-local} with the cell boundary.
    Reference: gfs_vof_facet src/vof.c:2088-2158 (the facet endpoints
    walked along the cell border)."""
    import numpy as np
    mx, my = normals(f, grid, fbc, t=t)
    a = reconstruct_alpha(f, mx, my)
    fa = np.asarray(f)
    ifc = (fa > FULL_TOL) & (fa < 1.0 - FULL_TOL)
    idx = np.argwhere(ifc)
    mxa = np.asarray(mx)[ifc]
    mya = np.asarray(my)[ifc]
    aa = np.asarray(a)[ifc]
    eps = 1e-30
    # candidate intersections with the 4 edges of the unit square
    cands = np.stack([
        np.stack([np.zeros_like(aa), aa / (mya + eps)], -1),          # sx=0
        np.stack([np.ones_like(aa), (aa - mxa) / (mya + eps)], -1),   # sx=1
        np.stack([aa / (mxa + eps), np.zeros_like(aa)], -1),          # sy=0
        np.stack([(aa - mya) / (mxa + eps), np.ones_like(aa)], -1),   # sy=1
    ], axis=1)                                                        # (n,4,2)
    tol = 1e-9
    valid = np.all((cands >= -tol) & (cands <= 1.0 + tol), axis=-1)
    segs = []
    h = grid.h
    x0 = np.asarray(grid.axis_faces(0))
    y0 = np.asarray(grid.axis_faces(1))
    for k in range(idx.shape[0]):
        pts = [cands[k, e] for e in range(4) if valid[k, e]]
        # dedupe corner hits
        uniq = []
        for p in pts:
            if not any(abs(p[0] - q[0]) + abs(p[1] - q[1]) < 1e-7
                       for q in uniq):
                uniq.append(p)
        if len(uniq) < 2:
            continue
        i, j = idx[k]
        p1, p2 = uniq[0], uniq[1]
        segs.append((x0[i] + p1[0] * h, y0[j] + p1[1] * h,
                     x0[i] + p2[0] * h, y0[j] + p2[1] * h))
    return np.asarray(segs).reshape(-1, 4)
