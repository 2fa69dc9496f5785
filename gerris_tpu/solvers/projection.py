"""MAC and approximate projections.

TPU-native rebuild of the reference's projection drivers
(reference: src/timestep.c — mac_projection:356-432, gfs_mac_projection:460,
gfs_approximate_projection:560-596, correct_normal_velocity:115-145,
gfs_correct_centered_velocities:509-530, scale_divergence:181-187).

The MAC projection makes the face-normal velocity field exactly
divergence-free:  solve div(alpha grad p) = div(u_f)/dt, then
u_f -= dt * alpha_face * grad_face p.  The cell-centred pressure gradient
g[c] = mean of the two face values of alpha*grad p (used both to correct
centred velocities and as the BCG flux pressure correction).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..ops.stencils import divergence, face_average
from . import poisson


def face_gradients(p: jnp.ndarray, grid: Grid, p_bc: bcs.FieldBC,
                   alpha=None, t: float = 0.0) -> list:
    """alpha_face * grad_face p for every face, per axis (face shapes)."""
    p_pad = bcs.apply_bc(p, grid, p_bc, 1, t=t, corners=False)
    out = []
    for axis in range(grid.dim):
        idx = [slice(1, s - 1) for s in p_pad.shape]
        idx[axis] = slice(None)
        a = p_pad[tuple(idx)]
        n = a.shape[axis]
        lo = [slice(None)] * a.ndim
        lo[axis] = slice(0, n - 1)
        hi = [slice(None)] * a.ndim
        hi[axis] = slice(1, n)
        g = (a[tuple(hi)] - a[tuple(lo)]) / grid.h
        if alpha is not None:
            g = g * alpha[axis]
        out.append(g)
    return out


def cell_gradient_from_faces(gf: list, grid: Grid) -> list:
    """Average face gradients to cell centres (reference:
    correct_normal_velocity accumulates both faces then
    gfs_scale_gradients divides by 2, src/timestep.c:60-113)."""
    out = []
    for axis in range(grid.dim):
        f = gf[axis]
        n = f.shape[axis]
        lo = [slice(None)] * f.ndim
        lo[axis] = slice(0, n - 1)
        hi = [slice(None)] * f.ndim
        hi[axis] = slice(1, n)
        out.append(0.5 * (f[tuple(lo)] + f[tuple(hi)]))
    return out


def _mac_correct(u_face, p, grid: Grid, p_bc, dt, stats, face_sources,
                 cells):
    """Post-solve correction tail shared by mac_projection and the
    folded-divergence fast path: the single-launch correct_project
    kernel when applicable, else the jnp chain."""
    from ..ops.pallas import bcg as _bcg
    from ..ops.pallas import projops as _projops
    if (face_sources is None and grid.dim == 2
            and _bcg.applicable(p, grid)):
        spec = _bcg.kernel_spec(p_bc)
        if spec is not None:
            if cells is not None:
                ufx, ufy, gx, gy, u2, v2 = _projops.correct_project(
                    p, u_face[0], u_face[1], dt, grid.h,
                    tuple(cells), sgn=spec["sgn"], off=spec["off"],
                    per_y=spec["per_y"])
                return [ufx, ufy], p, [gx, gy], stats, [u2, v2]
            ufx, ufy, gx, gy = _projops.correct_project(
                p, u_face[0], u_face[1], dt, grid.h,
                sgn=spec["sgn"], off=spec["off"], per_y=spec["per_y"])
            return [ufx, ufy], p, [gx, gy], stats
    gf = face_gradients(p, grid, p_bc, None)
    u_face = [u_face[c] - dt * gf[c] for c in range(grid.dim)]
    if face_sources is not None:
        gf = [gf[c] - face_sources[c] for c in range(grid.dim)]
    g_cell = cell_gradient_from_faces(gf, grid)
    if cells is not None:
        cells = [cells[c] - dt * g_cell[c] for c in range(grid.dim)]
        return u_face, p, g_cell, stats, cells
    return u_face, p, g_cell, stats


def mac_projection(u_face: list, p: jnp.ndarray, grid: Grid,
                   p_bc: bcs.FieldBC, dt,
                   params: poisson.MultilevelParams,
                   alpha=None, div_source=None, face_sources=None,
                   face_frac=None, vol_frac=None, t: float = 0.0,
                   cells=None, div_pre=None):
    """Project the MAC field. Returns (u_face', p, g_cell, stats).

    ``div_source``: optional extra divergence (the reference's
    divergence_hook / volume sources, src/timestep.c:396-402).
    ``face_sources``: optional per-axis face force/density arrays dp
    (e.g. the well-balanced surface-tension term alpha*sigma*kappa*grad(c),
    reference: gfs_velocity_face_sources src/timestep.c:245-290 +
    tension_coeff src/poisson.c:903-996): u_face += dt*dp before the solve,
    and g_cell returns the NET gradient (alpha grad p - dp) so the momentum
    update sees the balanced force.
    ``face_frac``: optional embedded-solid face fractions s — the flux is
    s*u_f, the Poisson coefficient s*alpha, the velocity correction the
    unweighted alpha grad p (reference: gfs_poisson_coefficients carries
    the face fraction, src/poisson.c:756-901).
    ``cells``: optional centred velocity list — the correction
    u -= dt*g_cell is applied (in the fused correction launch on the
    TPU path) and the return grows a 5th element with the corrected
    cells (gfs_correct_centered_velocities, src/timestep.c:509-530).
    Reference: src/timestep.c:356-432.
    """
    from ..ops.pallas.facepack import FacePack, as_pair
    packed = isinstance(u_face, FacePack)
    if face_sources is not None:
        u_face = as_pair(u_face)
        packed = False
        u_face = [u_face[c] + dt * face_sources[c] for c in range(grid.dim)]
    conn = None
    div_total = None
    if div_pre is not None:
        # the producer kernel (predict_xy / interp_faces) already
        # emitted the divergence + its sum — zero launches here
        assert face_frac is None and alpha is None and div_source is None
        div, div_total = div_pre
        alpha_solve = alpha
    elif face_frac is None:
        from ..ops.pallas import bcg as _bcg
        if (not packed and alpha is None and div_source is None
                and grid.dim == 2 and _bcg.applicable(p, grid)
                and poisson.fold_div_eligible(p, grid, p_bc, params)):
            # round-3 lever (a): the divergence launch folds into the
            # solve's first kernel (rhs from faces in-kernel)
            u_face = as_pair(u_face)
            if params.fold_correct:
                # round-4 lever (b): the correction launch folds into
                # the solve's final prolong_relax kernel
                out = poisson.solve_fused_div_correct(
                    p, u_face[0], u_face[1], grid, p_bc, params, dt,
                    cells)
                ufx, ufy, p, gx, gy, stats = out[:6]
                if cells is not None:
                    return [ufx, ufy], p, [gx, gy], stats, \
                        [out[6], out[7]]
                return [ufx, ufy], p, [gx, gy], stats
            p, stats = poisson.solve_fused_div(
                p, u_face[0], u_face[1], grid, p_bc, params, dt)
            return _mac_correct(u_face, p, grid, p_bc, dt, stats,
                                face_sources, cells)
        if grid.dim == 2 and _bcg.applicable(p, grid):
            from ..ops.pallas import projops as _projops
            if packed:
                div, div_total = _projops.divergence_mac(
                    u_face, None, dt, grid.h)
            else:
                div, div_total = _projops.divergence_mac(
                    u_face[0], u_face[1], dt, grid.h)
        else:
            u_face = as_pair(u_face)
            packed = False
            div = divergence(u_face, grid) / dt
        alpha_solve = alpha
    else:
        u_face = as_pair(u_face)
        packed = False
        div = divergence([face_frac[c] * u_face[c]
                          for c in range(grid.dim)], grid) / dt
        alpha_solve = tuple(
            face_frac[c] * (1.0 if alpha is None else alpha[c])
            for c in range(grid.dim))
        # operator connectivity: cells whose faces are all solid have no
        # pressure dof — their rhs must stay zero or the system is
        # inconsistent (the reference merges such cells away,
        # src/advection.c gfs_set_merged)
        conn = 0.0
        for c in range(grid.dim):
            f = face_frac[c]
            n = f.shape[c]
            lo = [slice(None)] * f.ndim
            lo[c] = slice(0, n - 1)
            hi = [slice(None)] * f.ndim
            hi[c] = slice(1, n)
            conn = conn + f[tuple(lo)] + f[tuple(hi)]
    if div_source is not None:
        div = div + div_source
    if conn is not None:
        div = jnp.where(conn > 1e-9, div, 0.0)
        if vol_frac is not None:
            vol_frac = jnp.where(conn > 1e-9, vol_frac, 0.0)
    # pure-Neumann/periodic compatibility: remove the mean (the reference
    # achieves this by construction; discretely we enforce it, cf.
    # GfsPoisson correct_div, src/simulation.c:2156-2186).  With embedded
    # solids the mean is fluid-volume weighted so fully-solid cells (zero
    # operator diagonal) keep rhs = 0.
    rhs_sub = None
    if not any(side.kind == bcs.DIRICHLET for ax in p_bc.sides for side in ax):
        if vol_frac is None:
            if div_total is not None:
                # the fused divergence kernel already summed div; the
                # subtraction folds into the solver's residual kernel
                rhs_sub = div_total / div.size
            else:
                div = div - jnp.mean(div)
        else:
            div = div - vol_frac * (jnp.sum(div)
                                    / jnp.maximum(jnp.sum(vol_frac), 1e-30))
    p, stats = poisson.solve(p, div, grid, p_bc, params, alpha=alpha_solve,
                             t=t, rhs_sub=rhs_sub)
    # single-launch correction on the TPU fast path (launch-bound remote
    # device): face gradients + uf correction + cell gradient in one
    # Pallas kernel (ops/pallas/projops.correct_project)
    if (alpha is None and face_frac is None and face_sources is None
            and grid.dim == 2):
        from ..ops.pallas import bcg as _bcg
        from ..ops.pallas import projops as _projops
        if _bcg.applicable(p, grid):
            spec = _bcg.kernel_spec(p_bc)
            if spec is not None and packed:
                if cells is not None:
                    uf2, gx, gy, u2, v2 = _projops.correct_project(
                        p, u_face, None, dt, grid.h, tuple(cells),
                        sgn=spec["sgn"], off=spec["off"],
                        per_y=spec["per_y"], packed=True)
                    return uf2, p, [gx, gy], stats, [u2, v2]
                uf2, gx, gy = _projops.correct_project(
                    p, u_face, None, dt, grid.h, sgn=spec["sgn"],
                    off=spec["off"], per_y=spec["per_y"], packed=True)
                return uf2, p, [gx, gy], stats
            if spec is not None:
                if cells is not None:
                    ufx, ufy, gx, gy, u2, v2 = _projops.correct_project(
                        p, u_face[0], u_face[1], dt, grid.h,
                        tuple(cells), sgn=spec["sgn"], off=spec["off"],
                        per_y=spec["per_y"])
                    return [ufx, ufy], p, [gx, gy], stats, [u2, v2]
                ufx, ufy, gx, gy = _projops.correct_project(
                    p, u_face[0], u_face[1], dt, grid.h,
                    sgn=spec["sgn"], off=spec["off"],
                    per_y=spec["per_y"])
                return [ufx, ufy], p, [gx, gy], stats
    u_face = as_pair(u_face)
    gf = face_gradients(p, grid, p_bc, alpha, t=t)
    if face_frac is not None:
        # no correction through zero-fraction (fully solid) faces
        gf = [jnp.where(face_frac[c] > 0.0, gf[c], 0.0)
              for c in range(grid.dim)]
    u_face = [u_face[c] - dt * gf[c] for c in range(grid.dim)]
    if face_sources is not None:
        gf = [gf[c] - face_sources[c] for c in range(grid.dim)]
    if face_frac is not None and face_sources is not None:
        # mixed cells: average the NET gradient over OPEN faces only —
        # a closed face has no pressure dof behind it, so its (0 - dp)
        # residue would leak the body force into cut cells (the
        # reference's mixed-cell centred gradients come from the solid
        # machinery, gfs_correct_centered_velocities); s-weighting
        # restores the exact hydrostatic balance (test/hydrostatic)
        g_cell = []
        for axis in range(grid.dim):
            f = gf[axis]
            w = face_frac[axis]
            n = f.shape[axis]
            lo = [slice(None)] * f.ndim
            lo[axis] = slice(0, n - 1)
            hi = [slice(None)] * f.ndim
            hi[axis] = slice(1, n)
            num = (w * f)[tuple(lo)] + (w * f)[tuple(hi)]
            den = w[tuple(lo)] + w[tuple(hi)]
            g_cell.append(num / jnp.maximum(den, 1e-30))
    else:
        g_cell = cell_gradient_from_faces(gf, grid)
    if cells is not None:
        cells = [cells[c] - dt * g_cell[c] for c in range(grid.dim)]
        return u_face, p, g_cell, stats, cells
    return u_face, p, g_cell, stats


def face_interpolated_velocity(u_cell: list, grid: Grid, u_bcs: list,
                               t: float = 0.0, gp=None, dtv=None,
                               packed: bool = False, div_scale=None):
    """MAC velocities by simple averaging of centred values, with the BC
    value imposed on boundary faces (reference:
    gfs_face_interpolated_normal_velocity src/advection.c:546-566 +
    gfs_domain_face_bc).

    ``gp``/``dtv``: optional per-component cell gradients first folded
    into the cells (u += dtv*gp[c], the gc gradient re-add,
    src/simulation.c:520); the updated cells are then returned as a
    second element: (faces, cells).
    ``div_scale``: ask the kernel to also emit the MAC divergence
    (scaled by 1/(h dt_proj)); the return grows a final element —
    (div, total), or None when the kernel path is not taken."""
    if gp is not None:
        fold = [u_cell[c] + dtv * gp[c] for c in range(grid.dim)]
    if grid.dim == 2:
        from ..ops.pallas import bcg as _bcg
        from ..ops.pallas import projops as _projops
        if _bcg.applicable(u_cell[0], grid):
            su = _bcg.kernel_spec(u_bcs[0], with_face_bc=True)
            sv = _bcg.kernel_spec(u_bcs[1], with_face_bc=True)
            if (su is not None and sv is not None
                    and su["per_y"] == sv["per_y"]
                    and None not in su["fb_x"]
                    and (sv["per_y"] or None not in sv["fb_y"])):
                kw = dict(sgn_u=su["sgn"], off_u=su["off"],
                          sgn_v=sv["sgn"], off_v=sv["off"],
                          per_y=su["per_y"], fbx=su["fb_x"],
                          fby=sv["fb_y"] or (None, None),
                          packed=packed,
                          div_scale=None if packed else div_scale)
                if gp is not None:
                    out = _projops.interp_faces(
                        u_cell[0], u_cell[1], tuple(gp), dtv, **kw)
                    if packed:
                        res = out[0], [out[1], out[2]]
                        return res + (None,) if div_scale is not None \
                            else res
                    res = [out[0], out[1]], [out[2], out[3]]
                    if div_scale is not None:
                        return res + ((out[4], out[5]),)
                    return res
                out = _projops.interp_faces(u_cell[0], u_cell[1], **kw)
                if div_scale is not None:
                    if packed:
                        return out, None
                    return [out[0], out[1]], (out[2], out[3])
                return out if packed else [out[0], out[1]]
    src = fold if gp is not None else u_cell
    out = []
    for c in range(grid.dim):
        pad = bcs.apply_bc(src[c], grid, u_bcs[c], 1, t=t, corners=False)
        uf = face_average(pad, grid, c)
        uf = bcs.apply_face_bc(uf, grid, u_bcs[c], c, t=t)
        out.append(uf)
    base = (out, fold) if gp is not None else (out,)
    if div_scale is not None:
        base = base + (None,)
    return base if len(base) > 1 else base[0]


def approximate_projection(u_cell: list, p: jnp.ndarray, grid: Grid,
                           u_bcs: list, p_bc: bcs.FieldBC, dt,
                           params: poisson.MultilevelParams,
                           alpha=None, div_source=None, t: float = 0.0):
    """Approximate projection of the centred velocity field.

    Returns (u_cell', p, g_cell, stats).
    Reference: src/timestep.c:560-596 gfs_approximate_projection.
    """
    u_face = face_interpolated_velocity(u_cell, grid, u_bcs, t=t)
    u_face, p, g_cell, stats = mac_projection(u_face, p, grid, p_bc, dt,
                                              params, alpha, div_source, t=t)
    u_cell = [u_cell[c] - dt * g_cell[c] for c in range(grid.dim)]
    return u_cell, p, g_cell, stats
