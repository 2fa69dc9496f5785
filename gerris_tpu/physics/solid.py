"""Embedded solid boundaries (cut cells).

TPU-native rebuild of the reference's solid-fraction machinery
(reference: src/solid.c — 2D fraction marching gfs_set_2D_solid_fractions
_from_surface:213-272, full init driver gfs_domain_init_solid_fractions
:970, face/volume fractions in GfsSolidVector src/fluid.h:54-59; mixed-cell
Poisson coefficients src/poisson.c:756-901 where the face coefficient is
the fluid face fraction).

Here fractions come from a level set phi (fluid = {phi > 0}) sampled at
cell vertices: cell volume fractions via the PLIC linearization
(physics/vof.py fraction_from_levelset) and face fractions via the exact
1D cut of each face between its two vertices.  The cut-cell Poisson
operator is then just the existing face-coefficient multigrid with
alpha = face fractions and rhs weighted by the volume fraction
(the natural no-flux/Neumann condition on the solid surface —
the reference's default, test/circle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from . import vof


def _vertex_values(grid: Grid, phi):
    ax = np.asarray(grid.axis_faces(0))
    ay = np.asarray(grid.axis_faces(1))
    X, Y = np.meshgrid(ax, ay, indexing="ij")
    return phi(jnp.asarray(X), jnp.asarray(Y))


def _edge_fraction(p0, p1):
    """Fluid fraction of a 1D edge with vertex level-set values p0, p1."""
    both_pos = (p0 > 0) & (p1 > 0)
    both_neg = (p0 <= 0) & (p1 <= 0)
    # crossing: fluid portion = |positive value| / |difference|
    frac = jnp.abs(jnp.maximum(p0, p1)) / jnp.maximum(jnp.abs(p0 - p1), 1e-300)
    return jnp.where(both_pos, 1.0, jnp.where(both_neg, 0.0,
                                              jnp.clip(frac, 0.0, 1.0)))


def _face_fraction_2d(p00, p10, p01, p11):
    """Fluid area fraction of a square face from its 4 corner level-set
    values (the per-face linearization — the 2D cell machinery applied
    to one 3D face; reference: the 3D cube-face marching of
    src/solid.c:385-601)."""
    gx = 0.5 * ((p10 + p11) - (p00 + p01))
    gy = 0.5 * ((p01 + p11) - (p00 + p10))
    pc = 0.25 * (p00 + p01 + p10 + p11)
    mx, my = -gx, -gy
    alpha = pc + 0.5 * (mx + my)
    norm = jnp.abs(mx) + jnp.abs(my) + 1e-300
    m1, m2, a = vof.positive_normal(mx / norm, my / norm, alpha / norm)
    f = vof.line_area_positive(m1, m2, a)
    allpos = (p00 > 0) & (p01 > 0) & (p10 > 0) & (p11 > 0)
    allneg = (p00 <= 0) & (p01 <= 0) & (p10 <= 0) & (p11 <= 0)
    return jnp.where(allpos, 1.0, jnp.where(allneg, 0.0,
                                            jnp.clip(f, 0.0, 1.0)))


def solid_fractions(grid: Grid, phi):
    """(volume_fraction a, per-axis face fractions) for fluid {phi > 0}.

    Reference: gfs_domain_init_solid_fractions (src/solid.c:970); 2D
    face fractions are the 1D cuts of cell faces (solid.c:213-272), 3D
    face fractions the 2D cuts of the square faces (solid.c:385-601)."""
    if grid.dim == 3:
        import numpy as np
        ax = np.asarray(grid.axis_faces(0))
        ay = np.asarray(grid.axis_faces(1))
        az = np.asarray(grid.axis_faces(2))
        X, Y, Z = np.meshgrid(ax, ay, az, indexing="ij")
        pv = phi(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
        a = vof.fraction_from_levelset(grid, phi)
        sx = _face_fraction_2d(pv[:, :-1, :-1], pv[:, 1:, :-1],
                               pv[:, :-1, 1:], pv[:, 1:, 1:])
        sy = _face_fraction_2d(pv[:-1, :, :-1], pv[1:, :, :-1],
                               pv[:-1, :, 1:], pv[1:, :, 1:])
        sz = _face_fraction_2d(pv[:-1, :-1, :], pv[1:, :-1, :],
                               pv[:-1, 1:, :], pv[1:, 1:, :])
        return a, (sx, sy, sz)
    assert grid.dim == 2
    pv = _vertex_values(grid, phi)
    a = vof.fraction_from_levelset(grid, phi)
    # x-faces (normal x): the face at x_i spans y in [y_j, y_j+1]:
    # vertices (i, j) and (i, j+1)
    sx = _edge_fraction(pv[:, :-1], pv[:, 1:])
    # y-faces: vertices (i, j) and (i+1, j)
    sy = _edge_fraction(pv[:-1, :], pv[1:, :])
    return a, (sx, sy)


def surface_geometry(grid: Grid, phi):
    """Per-cell embedded-surface geometry for mixed cells: the PLIC cut
    segment length (in units of h) and the distance (in h) from the cell
    centre to the surface line.

    Reference: the mixed-cell metrics of GfsSolidVector (src/fluid.h:54-59,
    solid centroid ca) used by the Dirichlet flux (src/poisson.c:561-586,
    gfs_mixed_cell_gradient src/fluid.c:778-1000)."""
    assert grid.dim == 2
    pv = _vertex_values(grid, phi)
    p00 = pv[:-1, :-1]
    p10 = pv[1:, :-1]
    p01 = pv[:-1, 1:]
    p11 = pv[1:, 1:]
    gx = 0.5 * ((p10 + p11) - (p00 + p01))
    gy = 0.5 * ((p01 + p11) - (p00 + p10))
    pc = 0.25 * (p00 + p01 + p10 + p11)
    # linearized phi(u) = pc + g.(u - 1/2) on the unit cell; the surface is
    # the zero line {m.u = alpha} with m = -g, alpha = pc + (mx+my)/2
    mx, my = -gx, -gy
    alpha = pc + 0.5 * (mx + my)
    norm1 = jnp.abs(mx) + jnp.abs(my) + 1e-300
    m1, m2, a = vof.positive_normal(mx / norm1, my / norm1, alpha / norm1)
    # endpoints of the cut segment on the unit square -> length
    # (vectorized intersection with the 4 edges; at most 2 hits)
    def hits(m1, m2, a):
        pts = []
        # x = 0 / 1 edges: y = (a - m1*x)/m2
        for x0 in (0.0, 1.0):
            y0 = (a - m1 * x0) / jnp.where(m2 == 0, 1e-300, m2)
            ok = (y0 >= 0.0) & (y0 <= 1.0)
            pts.append((x0 * jnp.ones_like(y0), y0, ok))
        for y0 in (0.0, 1.0):
            x0 = (a - m2 * y0) / jnp.where(m1 == 0, 1e-300, m1)
            ok = (x0 >= 0.0) & (x0 <= 1.0)
            pts.append((x0, y0 * jnp.ones_like(x0), ok))
        return pts

    pts = hits(m1, m2, a)
    # pairwise max distance between valid intersection points = length
    length = 0.0
    for i in range(4):
        for j in range(i + 1, 4):
            xi, yi, oki = pts[i]
            xj, yj, okj = pts[j]
            d = jnp.sqrt((xi - xj) ** 2 + (yi - yj) ** 2)
            length = jnp.maximum(length, jnp.where(oki & okj, d, 0.0))
    # centre-to-surface distance (cell units): |m.(1/2,1/2) - alpha| / |m|2
    m2norm = jnp.sqrt(m1 * m1 + m2 * m2) + 1e-300
    dist = jnp.abs(0.5 * (m1 + m2) - a) / m2norm
    allpos = (p00 > 0) & (p01 > 0) & (p10 > 0) & (p11 > 0)
    allneg = (p00 <= 0) & (p01 <= 0) & (p10 <= 0) & (p11 <= 0)
    mixed = ~allpos & ~allneg & (length > 1e-6)
    return jnp.where(mixed, length, 0.0), jnp.maximum(dist, 0.05)


def dirichlet_terms(grid: Grid, phi, u_s, a=None):
    """(dia_s, rhs_s) adding the embedded Dirichlet flux
    ℓ_b (u_s - u)/(d h²) to the operator div(s grad u) - dia u = rhs:
    dia += dia_s, rhs += rhs_s.  ``u_s``: scalar or callable(x, y) surface
    value.  Reference: the Dirichlet relax/residual variants
    (src/poisson.c:561-586) built on gfs_mixed_cell_gradient.
    """
    length, dist = surface_geometry(grid, phi)
    h2 = grid.h * grid.h
    dia_s = length / (dist * h2)
    if callable(u_s):
        us = u_s(*grid.centers)
    else:
        us = u_s
    rhs_s = -dia_s * us
    return dia_s, rhs_s


class DirichletSurface:
    """Embedded Dirichlet machinery for one level set (static per config).

    Scheme: the flux through the cut segment is ℓ (u_p − u_s)/d_p, with
    u_s the boundary value at the surface projection point and u_p the
    solution bilinearly sampled at a probe d_p = 1.2 h along the inward
    normal — second-order, evaluated by a deferred-correction split
    ℓ/d_p [(u_c − u_s) implicit + (u_p − u_c) explicit] so the implicit
    operator stays the 5-point multigrid stencil.
    Reference: the Dirichlet relax/residual variants of
    src/poisson.c:561-586 over gfs_mixed_cell_gradient
    (src/fluid.c:778-1000), which reconstruct the same boundary gradient
    from the surface point + interpolated fluid values."""

    def __init__(self, grid: Grid, phi, dp_cells: float = 1.2):
        self.grid = grid
        self.a, self.s = solid_fractions(grid, phi)
        pv = _vertex_values(grid, phi)
        p00, p10 = pv[:-1, :-1], pv[1:, :-1]
        p01, p11 = pv[:-1, 1:], pv[1:, 1:]
        gx = 0.5 * ((p10 + p11) - (p00 + p01))
        gy = 0.5 * ((p01 + p11) - (p00 + p10))
        pc = 0.25 * (p00 + p01 + p10 + p11)
        mnorm = jnp.sqrt(gx * gx + gy * gy) + 1e-300
        # inward normal (into the fluid {phi > 0}) = +grad(phi)/|grad|
        nx, ny = gx / mnorm, gy / mnorm
        # signed distance centre -> surface along the normal (cell units)
        dsurf = -pc / mnorm
        length, _ = surface_geometry(grid, phi)
        self.length = length
        self.mixed = length > 0.0
        h = grid.h
        x, y = grid.centers
        # surface projection point and probe (physical coords)
        sx_ = x + dsurf * nx * h
        sy_ = y + dsurf * ny * h
        self.surf_xy = (sx_, sy_)
        self.dp = dp_cells * h
        px = sx_ + nx * self.dp
        py = sy_ + ny * self.dp
        # bilinear gather stencil for the probes (cell-centred field)
        fx = jnp.clip((px - grid.origin[0]) / h - 0.5, 0.0,
                      grid.shape[0] - 1.001)
        fy = jnp.clip((py - grid.origin[1]) / h - 0.5, 0.0,
                      grid.shape[1] - 1.001)
        i0 = jnp.floor(fx).astype(jnp.int32)
        j0 = jnp.floor(fy).astype(jnp.int32)
        self._ij = (i0, j0)
        self._w = (fx - i0, fy - j0)
        self.dia = jnp.where(self.mixed,
                             length / (dp_cells * h * h), 0.0)

    def probe(self, u):
        i0, j0 = self._ij
        wx, wy = self._w
        i1 = jnp.minimum(i0 + 1, u.shape[0] - 1)
        j1 = jnp.minimum(j0 + 1, u.shape[1] - 1)
        return ((1 - wx) * (1 - wy) * u[i0, j0] +
                wx * (1 - wy) * u[i1, j0] +
                (1 - wx) * wy * u[i0, j1] +
                wx * wy * u[i1, j1])

    def surface_value(self, u_s, t=0.0):
        if callable(u_s):
            return u_s(*self.surf_xy)
        return u_s

    def solve(self, rhs_pointwise, u_s, fbc, params, u0=None, t=0.0,
              outer: int = 4):
        """div(s grad u) = a f with u = u_s on the embedded surface."""
        from ..solvers import poisson

        usv = self.surface_value(u_s, t)
        base = self.a * rhs_pointwise - self.dia * usv
        u = jnp.zeros(self.grid.shape, base.dtype) if u0 is None else u0
        stats = None
        for _ in range(outer):
            corr = jnp.where(self.mixed,
                             self.dia * (self.probe(u) - u), 0.0)
            u, stats = poisson.solve(u, base + corr, self.grid, fbc,
                                     params, alpha=self.s, dia=self.dia,
                                     t=t)
        return u, stats


def poisson_dirichlet_solve(rhs_pointwise, grid: Grid, phi, u_s, fbc,
                            params, u0=None, outer: int = 4):
    """Poisson solve with Dirichlet value ``u_s`` on the embedded surface
    {phi = 0} (fluid = {phi > 0}) — the test/dirichlet class."""
    ds = DirichletSurface(grid, phi)
    u, stats = ds.solve(rhs_pointwise, u_s, fbc, params, u0=u0,
                        outer=outer)
    return u, stats, ds.a, ds.s


def poisson_solid_solve(rhs_pointwise, grid: Grid, phi, fbc, params,
                        u0=None):
    """Poisson solve in the fluid region outside/inside an embedded solid
    with the natural Neumann condition on the solid surface.

    Solves div(s grad u) = a * f with the pure-Neumann compatibility mean
    removed (reference: GfsPoisson poisson_run src/simulation.c:2213-2310
    with correct_div:2156-2186).  Returns (u, stats, a, s).
    """
    from ..solvers import poisson

    a, s = solid_fractions(grid, phi)
    rhs = a * rhs_pointwise
    w = jnp.sum(a)
    rhs = rhs - a * (jnp.sum(rhs) / jnp.maximum(w, 1e-300))
    u = jnp.zeros(grid.shape, rhs.dtype) if u0 is None else u0
    u, stats = poisson.solve(u, rhs, grid, fbc, params, alpha=s)
    return u, stats, a, s


def merged_cell_update(v, fv, a, s):
    """True merged-cell advection update for small cut cells.

    The reference merges each small cut cell (a/s_d < GFS_SMALL = 0.5
    through some open face, src/advection.c:595-611) with its best
    neighbour — a full neighbour through an open face if one exists,
    else the mixed neighbour with the largest fluid fraction
    (set_merged, src/advection.c:613-667) — and sets every member of
    the merged group to the volume-weighted average
    w = sum(vol (a v + fv)) / sum(vol a)
    (gfs_advection_update, src/advection.c:784-851).

    Dense-array equivalent: each cell picks a root (itself when not
    small; pointer-jumped twice so chains of small cells terminate),
    the group sums are one segment-sum scatter over flat root indices,
    and the average is gathered back.  For cells in singleton groups
    the formula reduces to the plain v + fv/a update, so one pass
    covers everything.

    ``fv`` is the ACCUMULATED increment (flux sum, not yet divided by
    the fluid fraction); ``a`` cell fluid fractions; ``s`` tuple of
    face-fraction arrays (staggered layouts, s[c].shape[c] == n_c+1).
    """
    dim = v.ndim
    shape = v.shape
    ntot = int(np.prod(shape))
    flat = jnp.arange(ntot).reshape(shape)

    # neighbour fluid fractions + open-face fractions per direction
    # (order: for each axis, (low side, high side))
    BIG = 1e6
    pad_a = jnp.pad(a, 1)          # zero outside => never chosen
    score = []
    targets = []
    small = jnp.zeros(shape, bool)
    for ax in range(dim):
        s_lo = jax.lax.slice_in_dim(s[ax], 0, shape[ax], axis=ax)
        s_hi = jax.lax.slice_in_dim(s[ax], 1, shape[ax] + 1, axis=ax)
        ctr = [slice(1, -1)] * dim
        lo = list(ctr)
        hi = list(ctr)
        lo[ax] = slice(0, -2)
        hi[ax] = slice(2, None)
        a_lo = pad_a[tuple(lo)]
        a_hi = pad_a[tuple(hi)]
        small = small | ((s_lo > 0.0) & (a / jnp.maximum(s_lo, 1e-30) < 0.5))
        small = small | ((s_hi > 0.0) & (a / jnp.maximum(s_hi, 1e-30) < 0.5))
        for s_d, a_nb, shift in ((s_lo, a_lo, -1), (s_hi, a_hi, 1)):
            ok = (s_d > 0.0) & (a_nb > 0.0)
            # full neighbours dominate any mixed one (the C returns
            # immediately on the first full neighbour; argmax over
            # a + BIG*(a==1) picks one deterministically)
            score.append(jnp.where(ok, a_nb + BIG * (a_nb >= 1.0), -1.0))
            tgt = jnp.roll(flat, -shift, axis=ax)
            targets.append(tgt)
    small = small & (a > 0.0) & (a < 1.0)
    sc = jnp.stack(score)
    tg = jnp.stack(targets)
    best = jnp.argmax(sc, axis=0)
    tgt = jnp.take_along_axis(tg, best[None], axis=0)[0]
    root = jnp.where(small, tgt, flat).reshape(-1)
    # pointer-jump: a small cell may merge into another small cell;
    # two hops terminate all practical chains (the C builds the full
    # transitive closure; beyond two hops the geometry is degenerate)
    root = root[root]
    root = root[root]

    num = (a * v + fv).reshape(-1)
    den = a.reshape(-1)
    seg_num = jnp.zeros(ntot, v.dtype).at[root].add(num)
    seg_den = jnp.zeros(ntot, v.dtype).at[root].add(den)
    w = (seg_num / jnp.maximum(seg_den, 1e-30))[root].reshape(shape)
    return jnp.where(a > 0.0, w, v)
