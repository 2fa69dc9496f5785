"""Incompressible Navier-Stokes time step (the GfsSimulation core).

TPU-native rebuild of the reference's central loop
(reference: src/simulation.c simulation_run:432-557):

  1. predicted face velocities (BCG from centred field)
        gfs_predicted_face_velocities, src/timestep.c:681-717
  2. MAC projection with dt/2 on Pmac  -> divergence-free face field + gmac
        gfs_mac_projection, src/timestep.c:460
  3. centred velocity advection (BCG fluxes w/ MAC field, gmac face
     pressure correction) + implicit diffusion
        gfs_centered_velocity_advection_diffusion, src/timestep.c:976-1017
  4. approximate projection with dt on P -> divergence-free centred field
        gfs_approximate_projection, src/timestep.c:560
  5. tracer advection with the projected face field
        gfs_advance_tracers, src/simulation.c:2031

The whole step is a pure jittable function of (state, dt); the host-side
Simulation driver (models/simulation.py) handles events/timestep control,
matching the reference's host/numerics split.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..solvers import advection as adv
from ..solvers import projection as proj
from ..solvers import diffusion as diff
from ..solvers import poisson


def grad_bc(u_bc: bcs.FieldBC) -> bcs.FieldBC:
    """BC for pressure-gradient fields: periodic where the domain is
    periodic, symmetric (Neumann-0) otherwise."""
    sides = tuple(
        tuple(bcs.Periodic() if b.kind == bcs.PERIODIC else bcs.Neumann()
              for b in ax)
        for ax in u_bc.sides)
    return bcs.FieldBC(sides)


@dataclasses.dataclass(frozen=True)
class NSConfig:
    """Static configuration (hashable; jit static arg).

    Mirrors GfsSimulation's parameter blocks: advection_params
    (src/advection.h), projection_params / approx_projection_params
    (src/poisson.h GfsMultilevelParams), physical_params alpha, and the
    per-variable diffusion sources (SourceDiffusion, src/source.c).
    """
    grid: Grid
    u_bcs: tuple                      # FieldBC per velocity component
    p_bc: bcs.FieldBC = None
    advection: adv.AdvectionParams = adv.AdvectionParams()
    projection: poisson.MultilevelParams = poisson.MultilevelParams(
        tolerance=1e-3, nitermax=100)
    approx_projection: poisson.MultilevelParams = poisson.MultilevelParams(
        tolerance=1e-3, nitermax=100)
    nu: float = 0.0                   # kinematic viscosity (SourceDiffusion)
    beta: float = 1.0                 # diffusion implicitness (ref default 1)
    diffusion_params: poisson.MultilevelParams = None  # None = cheap default
    tracers: tuple = ()               # (name, FieldBC, diffusivity) triples
    # VOF interface tracking (GfsVariableTracerVOF(Height), src/vof.c)
    vof_tracers: tuple = ()           # (name, FieldBC) pairs
    # surface tension (GfsSourceTension, src/tension.c): (vof_name, sigma)
    tension: tuple = ()
    # CSS tension variant (GfsSourceTensionCSS, src/tension.c:181-305):
    # (vof_name, sigma) — centred capillary-stress-divergence
    # accelerations instead of well-balanced face sources
    tension_css: tuple = ()
    # two-way particle coupling: read reaction-force fields PFx/PFy(/PFz)
    # from the state (GfsSourceParticulate, modules/particulatecommon.c:2089)
    particle_coupling: bool = False
    # variable density via a VOF tracer (PhysicalParams { alpha = 1/RHO(T1) },
    # test/oscillation/oscillation.gfs): (tracer, rho1, rho2, filter_passes)
    density: tuple = None
    # embedded solid: level-set callable, fluid = {phi > 0} (Solid in .gfs,
    # src/solid.c) + per-component surface velocity (SurfaceBc Dirichlet,
    # src/timestep.c:1062-1229); None = free-slip/no solid
    solid_phi: object = None
    surface_u: tuple = None
    # moving embedded solid (GfsSimulationMoving/GfsSolidMoving,
    # src/moving.c): solid_phi takes (x, y, t) and the fractions are
    # re-cut every step inside the trace; surface_u callables take
    # (x, y, t).  First-order scheme (moving_order=1, the reference
    # default): uncovered cells are filled with the solid surface
    # velocity (init_new_cell_velocity_from_solid, moving.c:135-140) and
    # the projections see the solid's volume displacement as divergence
    # sources (divergence_mac_hook_order_1 moving.c:1053,
    # divergence_approx_hook moving.c:1027).
    moving_solid: bool = False
    # moving-solid scheme order (AdvectionParams { moving_order = 2 },
    # src/advection.h:60 + src/moving2.c): order 2 uses time-centred
    # face fractions for the advection fluxes (face_fraction_half,
    # moving2.c:563-570) and fills freshly-uncovered cells by fluid
    # neighbour extrapolation instead of the solid surface velocity.
    moving_order: int = 1
    # axisymmetric metric (GfsAxi, src/simulation.c + src/metric.c): y is
    # the radial coordinate; cell/face metric factors r enter the same
    # face-coefficient machinery as solid fractions (domain metric hooks,
    # src/domain.h:94-110)
    axi: bool = False
    # constant/callable body force per component (GfsSource on velocity,
    # src/source.c; gravity etc.)
    body_force: tuple = None
    # general orthogonal metric (core/metric.py: MetricStretch/LonLat/
    # Cubed) — cell/face factors composed into the face coefficients
    # exactly like axi (reference: domain metric hooks src/domain.h:94-110)
    metric: object = None
    # route MAC faces through the packed Pallas layout end-to-end
    # (ops/pallas/facepack.py); measured slower at 2048^2, kept as an
    # A/B seam (formerly the GERRIS_PACK_FACES env knob)
    pack_faces: bool = False
    # variable dynamic viscosity (GfsSourceViscosity with a GfsFunction,
    # src/source.c source_viscosity_read; e.g. MU(T1) in
    # test/capwave/air-water): callable (x, y[, z], t=..., **fields) ->
    # per-cell viscosity.  The implicit solve uses face-averaged mu; the
    # transpose-stress remainder sum_j (d_c u_j)(d_j mu) / rho is added
    # explicitly (source_viscosity_non_diffusion_value,
    # src/source.c:1412-1438).  nu_var_fields: (name, parent, npass)
    # triples naming the state fields the function reads (parent+npass
    # materialize VariableFiltered derived fields).
    nu_var: object = None
    nu_var_fields: tuple = ()
    # one shared-DMA launch for both components' BCG advections in the
    # batched-diffusion fast path (round-3 lever (c)); default OFF so
    # the production program stays byte-identical to the cached one
    # until the A/B lands
    pair_advect: bool = False
    # fold each projection's divergence into its PRODUCER kernel
    # (predict_xy / interp_faces emit div where the faces are already in
    # VMEM) instead of a separate divergence_mac launch — unlike
    # MultilevelParams.fold_div (fold into the solve's first kernel,
    # which re-reads the faces and measured slower), this adds one
    # output to an existing launch (round-4 lever)
    div_in_src: bool = False
    # fold the diffusion chain's first residual_restrict_pair into the
    # advection pair kernel (which already holds U/V + BC ghosts in
    # VMEM): the kernel emits (r0, r1, r2) instead of the system rhs,
    # and the 3-launch diffusion MG chain becomes 2 launches.  Needs
    # pair_advect and a 1-cycle fixed diffusion schedule.
    rr_in_advect: bool = False
    # AMR corrector advection through the gathered active-block windows
    # (solvers/blockadv.py): BCG FLOPs ∝ leaves instead of dense per
    # level (reference: leaf-only advection traversal, src/advection.c
    # gfs_face_advection_flux).  Opt-in: slave cells then carry
    # prolonged (not advected) ghosts between phases 3 and 4 — composite
    # -consistent but not bitwise equal to the dense path, so the slow
    # verbatim AMR gates must be re-run before defaulting it on.
    block_advect: bool = False
    # composite (any-level) VOF advection on AMR meshes
    # (amr_ns.amr_advect_vof, src/vof.c:1214-1272 flux matching).
    # Default OFF: with the interface pinned to lmax (the standard
    # criterion) the lmax-only path is equivalent and the composite
    # sweeps were measured to drift the oscillation frequency ~7% over
    # 1e4 steps (per-step interface differences ~2e-7 with a systematic
    # bias — under investigation).  Turn ON for meshes whose interface
    # legitimately lives on coarser leaves.
    composite_vof: bool = False

    def __post_init__(self):
        if self.p_bc is None:
            object.__setattr__(self, "p_bc", grad_bc(self.u_bcs[0]))

    @property
    def dim(self):
        return self.grid.dim


def velocity_names(dim):
    return ("U", "V", "W")[:dim]


def predicted_face_velocities(U: list, grid: Grid, cfg: NSConfig, dt, t,
                              packed: bool = False, div_scale=None):
    """Reference: src/timestep.c:681-717 (use_centered_velocity=TRUE,
    CENTERED upwinding).  ``packed``: return a FacePack in the kernels'
    native padded face layout (zero repacking launches downstream).
    ``div_scale``: ask the kernel to also emit the MAC divergence
    (scaled by 1/(h dt_proj)) — returns (uf, (div, total)) then, with
    the second element None when the kernel path is not taken."""
    from ..ops.pallas import bcg, predict
    if grid.dim == 2 and bcg.applicable(U[0], grid, cfg.advection):
        su = bcg.kernel_spec(cfg.u_bcs[0], with_face_bc=True)
        sv = bcg.kernel_spec(cfg.u_bcs[1], with_face_bc=True)
        if (su is not None and sv is not None
                and su["per_y"] == sv["per_y"]
                and None not in su["fb_x"]
                and (sv["per_y"] or None not in sv["fb_y"])):
            out = predict.predict_xy(
                U[0], U[1], dt, grid.h, sgn_u=su["sgn"], off_u=su["off"],
                sgn_v=sv["sgn"], off_v=sv["off"], per_y=su["per_y"],
                fb_x=su["fb_x"], fb_y=sv["fb_y"] or (0.0, 0.0),
                packed=packed,
                div_scale=None if packed else div_scale)
            if div_scale is not None and not packed:
                return [out[0], out[1]], (out[2], out[3])
            if div_scale is not None:
                return out, None
            return out if packed else [out[0], out[1]]
    uc_pad = [bcs.apply_bc(U[c], grid, cfg.u_bcs[c], 1, t=t, corners=False)
              for c in range(grid.dim)]
    uf = []
    for c in range(grid.dim):
        vp, vm = adv.advected_face_values(
            U[c], grid, cfg.u_bcs[c], dt, cfg.advection, uc_pad, t=t,
            axes=(c,))[c]
        # centred upwinding: un = face-interpolated centred velocity
        from ..ops.stencils import face_average
        un = face_average(uc_pad[c], grid, c)
        uf_c = adv.upwind_face_value(vp, vm, un, c)
        uf_c = bcs.apply_face_bc(uf_c, grid, cfg.u_bcs[c], c, t=t)
        uf.append(uf_c)
    if div_scale is not None:
        return uf, None
    return uf


def velocity_advection_diffusion(U: list, uf: list, gmac: list, g_prev,
                                 grid: Grid, cfg: NSConfig, dt, t,
                                 sources=None, rho=None, solid=None,
                                 mu=None):
    """Reference: src/timestep.c:976-1017 + variable_sources:872-921.

    With gc=TRUE (the reference default), the previous approximate
    projection's cell pressure gradient ``g_prev`` enters the momentum rhs
    (add_pressure_gradient, src/timestep.c:810-813) so the implicit
    diffusion solve sees the full momentum balance; the caller removes it
    again after this returns (gfs_correct_centered_velocities with -dt,
    src/simulation.c:520-522)."""
    dim = grid.dim
    uc_pad = None
    gbc = grad_bc(cfg.u_bcs[0])
    from ..ops.pallas import bcg

    # batched U+V fast path: both components' BCG kernels + ONE batched
    # implicit-diffusion launch chain (fixed-cycle schedules only)
    # per-axis face viscosity for the variable-viscosity implicit solve
    # (gfs_diffusion_coefficients face evaluation, src/poisson.c:1280)
    Dfaces = None
    if mu is not None:
        from ..ops.stencils import face_average as _favg
        mu_pad = bcs.apply_bc(mu, grid, bcs.default_scalar_bc(dim), 1,
                              t=t)
        Dfaces = tuple(_favg(mu_pad, grid, a) for a in range(dim))

    # beta must be exactly 1 (fully implicit): diffuse_pair's rhs
    # -dia*(v+fv) omits the Crank-Nicolson explicit term
    # (1-beta)*dt*lap(u_old) that diffuse() adds when beta < 1
    if (solid is None and dim == 2 and rho is None and cfg.nu > 0.0
            and cfg.beta == 1.0 and mu is None
            and cfg.diffusion_params is not None
            and cfg.diffusion_params.ncycles > 0
            and bcg.applicable(U[0], grid, cfg.advection)):
        specs = [bcg.kernel_spec(cfg.u_bcs[c], with_face_bc=True)
                 for c in range(dim)]
        if all(sp is not None and not sp["per_y"] for sp in specs):
            # when no extra per-cell sources, the whole momentum-rhs
            # epilogue folds into the advection kernel (gp/oscale):
            # rhs_c = -dia (v + fv - dt g_prev) with zero extra launches
            plain = (sources is None and cfg.body_force is None)
            dia = 1.0 / (cfg.beta * dt * cfg.nu)
            from ..ops.pallas.facepack import FacePack
            fp = isinstance(uf, FacePack)
            if cfg.pair_advect and not fp and plain:
                # round-3 lever (c): one launch for both components'
                # advections (shared MAC-face DMAs)
                su, sv = specs
                dp = cfg.diffusion_params
                use_rr = (cfg.rr_in_advect and dp.ncycles == 1
                          and dp.solver != "relax"
                          and poisson.batched_fixed_eligible(
                              U, grid, list(cfg.u_bcs), [dia, dia]))
                kw = dict(
                    g0=gmac[0], g1=gmac[1],
                    gp0=g_prev[0] if g_prev is not None else None,
                    gp1=g_prev[1] if g_prev is not None else None,
                    oscale=-dia,
                    sgns=(su["sgn"], sv["sgn"]),
                    offs=(su["off"], sv["off"]), per_y=su["per_y"],
                    fbxs=(su["fb_x"], None),
                    fbys=(None, sv["fb_y"]))
                if use_rr:
                    # round-4 lever: the advection launch also emits
                    # the diffusion pair's first-cycle residual pyramid
                    rrs = bcg.advect2d_pair(
                        U[0], U[1], uf[0], uf[1], dt, grid.h,
                        rr_dia=dia, h2=grid.h * grid.h, **kw)
                    out, _ = diff.diffuse_pair(
                        U, grid, list(cfg.u_bcs), dt, cfg.nu,
                        cfg.beta, dp, rr_pre=rrs, t=t)
                    return out
                v0, v1 = bcg.advect2d_pair(
                    U[0], U[1], uf[0], uf[1], dt, grid.h, **kw)
                out, _ = diff.diffuse_pair(
                    U, grid, list(cfg.u_bcs), dt, cfg.nu, cfg.beta,
                    cfg.diffusion_params, rhss=[v0, v1], t=t)
                return out
            vals = []
            for c in range(dim):
                spec = specs[c]
                fv = bcg.advect2d(U[c], uf if fp else uf[0],
                                  None if fp else uf[1], dt, grid.h,
                                  gmac[c],
                                  gp=(g_prev[c] if g_prev is not None
                                      else None),
                                  oscale=(-dia if plain else None),
                                  sgn=spec["sgn"],
                                  off=spec["off"], per_y=spec["per_y"],
                                  fb_x=spec["fb_x"] if c == 0 else None,
                                  fb_y=spec["fb_y"] if c == 1 else None)
                if not plain:
                    if sources is not None and sources[c] is not None:
                        fv = fv + dt * sources[c]
                    if (cfg.body_force is not None
                            and cfg.body_force[c] is not None):
                        bf = cfg.body_force[c]
                        fv = fv + dt * (bf(*grid.centers, t=t)
                                        if callable(bf) else bf)
                vals.append(fv)
            out, _ = diff.diffuse_pair(
                U, grid, list(cfg.u_bcs), dt, cfg.nu, cfg.beta,
                cfg.diffusion_params,
                extra_rhss=None if plain else vals,
                rhss=vals if plain else None, t=t)
            return out

    from ..ops.pallas.facepack import as_pair as _as_pair
    uf = _as_pair(uf)
    out = []
    for c in range(dim):
        # fused Pallas path (TPU f32, static BCs, no cut cells): one HBM
        # pass replacing the whole face-value/upwind/flux chain below
        spec = None
        if solid is None and dim == 2 and bcg.applicable(U[c], grid,
                                                         cfg.advection):
            spec = bcg.kernel_spec(cfg.u_bcs[c], with_face_bc=True)
            if spec is not None and spec["per_y"]:
                spec = None           # per-y gmac ghosts differ: fallback
        if spec is not None:
            fv = bcg.advect2d(U[c], uf[0], uf[1], dt, grid.h, gmac[c],
                              sgn=spec["sgn"], off=spec["off"],
                              per_y=spec["per_y"],
                              fb_x=spec["fb_x"] if c == 0 else None,
                              fb_y=spec["fb_y"] if c == 1 else None)
            if g_prev is not None:
                fv = fv - dt * g_prev[c]
            if sources is not None and sources[c] is not None:
                fv = fv + dt * sources[c]
            if cfg.body_force is not None and cfg.body_force[c] is not None:
                bf = cfg.body_force[c]
                fv = fv + dt * (bf(*grid.centers, t=t) if callable(bf)
                                else bf)
            if cfg.nu > 0.0 or Dfaces is not None:
                rr = 1.0 if rho is None else rho
                v_new, _ = diff.diffuse(U[c], grid, cfg.u_bcs[c], dt,
                                        Dfaces if Dfaces is not None
                                        else cfg.nu,
                                        rho=rr, beta=cfg.beta,
                                        params=cfg.diffusion_params,
                                        extra_rhs=(rr * fv
                                                   if rho is not None
                                                   else fv), t=t)
            else:
                v_new = U[c] + fv
            out.append(v_new)
            continue
        if uc_pad is None:
            uc_pad = adv.mac_cell_mean(uf, grid)
        fvals = adv.advected_face_values(U[c], grid, cfg.u_bcs[c], dt,
                                         cfg.advection, uc_pad, t=t)
        # face-interpolated gmac correction (reference: src/advection.c:419)
        g_pad = bcs.apply_bc(gmac[c], grid, gbc, 1, t=t, corners=False)
        from ..ops.stencils import face_average
        v_faces = []
        for a in range(dim):
            vface = adv.upwind_face_value(fvals[a][0], fvals[a][1], uf[a], a)
            vface = vface - face_average(g_pad, grid, a) * dt / 2.0
            if a == c:
                vface = bcs.apply_face_bc(vface, grid, cfg.u_bcs[c], a, t=t)
            v_faces.append(vface)
        if solid is None:
            fv = adv.flux_divergence(v_faces, uf, grid, dt)
        else:
            # fluxes through fractional faces scale with s; the update
            # divides by the (clamped) fluid volume weight
            # (the reference merges cells with a < 0.5 instead,
            # src/advection.c:784 gfs_advection_update)
            a_s, s_s, ds_s, a_cl = solid[:4]
            # moving_order=2: time-centred face fractions for the
            # advection fluxes (face_fraction_half, moving2.c:563-570)
            s_adv = solid[4] if len(solid) > 4 else s_s
            fv_acc = adv.flux_divergence(
                [s_adv[ax] * v_faces[ax] for ax in range(dim)],
                [s_adv[ax] * uf[ax] for ax in range(dim)], grid, dt)
            # true merged-cell update: small cells (a/s < 0.5) average
            # with their merge group instead of dividing by a clamped
            # volume (gfs_advection_update, src/advection.c:784-851);
            # expressed as an increment so the source/diffusion terms
            # below compose unchanged
            from ..physics.solid import merged_cell_update
            v_merged = merged_cell_update(U[c], fv_acc, a_s, s_s)
            fv = jnp.where(a_s > 0.0, v_merged - U[c], 0.0)
        if g_prev is not None:
            fv = fv - dt * g_prev[c]
        if sources is not None and sources[c] is not None:
            fv = fv + dt * sources[c]
        if cfg.body_force is not None and cfg.body_force[c] is not None:
            bf = cfg.body_force[c]
            fv = fv + dt * (bf(*grid.centers, t=t) if callable(bf) else bf)
        if cfg.nu > 0.0 or Dfaces is not None:
            rr = 1.0 if rho is None else rho
            if solid is not None:
                a_s, s_s, ds_s, a_cl = solid[:4]
                us_c = 0.0 if cfg.surface_u is None else cfg.surface_u[c]
                extra_dia = None
                if cfg.axi and c == 1:
                    # radial vector-Laplacian term -nu u_r / r^2
                    # (reference: metric viscous terms, src/metric.c)
                    yc = jnp.asarray(grid.axis_centers(1))[None, :]
                    extra_dia = a_s / (yc * yc)
                v_new = solid_velocity_diffusion(
                    U[c], ds_s, us_c, grid, cfg.u_bcs[c], dt, cfg.nu,
                    rr * a_s, s_s, cfg.beta, cfg.diffusion_params,
                    rr * a_s * fv, t, extra_dia=extra_dia)
            else:
                v_new, _ = diff.diffuse(U[c], grid, cfg.u_bcs[c], dt,
                                        Dfaces if Dfaces is not None
                                        else cfg.nu,
                                        rho=rr, beta=cfg.beta,
                                        params=cfg.diffusion_params,
                                        extra_rhs=(rr * fv
                                                   if rho is not None
                                                   else fv), t=t)
        else:
            v_new = U[c] + fv
        if solid is not None:
            v_new = jnp.where(solid[0] > 0.0, v_new, 0.0)
        out.append(v_new)
    return out


def advect_tracer(T: jnp.ndarray, name_bc_D, uf: list, grid: Grid,
                  cfg: NSConfig, dt, t):
    """Reference: gfs_tracer_advection_diffusion src/timestep.c:1028.
    A 4th tuple element is a source term dT/dt (scalar or callable
    (x.., t) — e.g. the unit source of GfsVariableAge,
    src/variable.c age variables)."""
    name, fbc, D = name_bc_D[:3]
    src = name_bc_D[3] if len(name_bc_D) > 3 else None
    from ..ops.pallas import bcg
    spec = bcg.kernel_spec(fbc) if grid.dim == 2 \
        and bcg.applicable(T, grid, cfg.advection) else None
    if spec is not None:
        fv = bcg.advect2d(T, uf[0], uf[1], dt, grid.h,
                          sgn=spec["sgn"], off=spec["off"],
                          per_y=spec["per_y"])
    else:
        uc_pad = adv.mac_cell_mean(uf, grid)
        fvals = adv.advected_face_values(T, grid, fbc, dt, cfg.advection,
                                         uc_pad, t=t)
        v_faces = [adv.upwind_face_value(fvals[a][0], fvals[a][1],
                                         uf[a], a)
                   for a in range(grid.dim)]
        fv = adv.flux_divergence(v_faces, uf, grid, dt)
    if src is not None:
        sv = src(*grid.centers, t) if callable(src) else src
        fv = fv + dt * sv
    if D and D > 0.0:
        T_new, _ = diff.diffuse(T, grid, fbc, dt, D, beta=cfg.beta,
                                params=cfg.diffusion_params,
                                extra_rhs=fv, t=t)
    else:
        T_new = T + fv
    return T_new


def gradient_names(dim):
    return ("Gx", "Gy", "Gz")[:dim]


def filtered(T: jnp.ndarray, grid: Grid, fbc, npass: int = 1, t=0.0):
    """Smoothed tracer (GfsVariableFiltered, src/variable.c): one pass of
    the separable (1,2,1)/4 tensor kernel per filter level (nD)."""
    for _ in range(npass):
        p = bcs.apply_bc(T, grid, fbc, 1, t=t)
        for ax in range(grid.dim):
            n = p.shape[ax]

            def tk(s0, s1):
                idx = [slice(None)] * p.ndim
                idx[ax] = slice(s0, n + s1)
                return p[tuple(idx)]

            p = 0.25 * (tk(0, -2) + 2.0 * tk(1, -1) + tk(2, 0))
        T = p
    return T


def density_fields(state: dict, cfg: NSConfig, t, grid: Grid = None):
    """(rho_cell, alpha_faces) from the VOF tracer: rho = rho2 + T1 (rho1 -
    rho2) with T1 the filtered fraction; alpha_face = 1/rho(T1_face)
    (reference: gfs_poisson_coefficients alpha face evaluation,
    src/poisson.c:868; PhysicalParams alpha in test/oscillation).
    ``grid`` overrides cfg.grid for per-level AMR evaluation."""
    if cfg.density is None:
        return None, None
    name, rho1, rho2, npass = cfg.density
    fbc = dict((v[0], v[1]) for v in cfg.vof_tracers)[name]
    grid = grid or cfg.grid
    T1 = filtered(state[name], grid, fbc, npass, t)
    T1c = jnp.clip(T1, 0.0, 1.0)
    rho_c = rho2 + T1c * (rho1 - rho2)
    from ..ops.stencils import face_average
    T1p = bcs.apply_bc(T1, grid, fbc, 1, t=t)
    alpha = []
    for ax in range(grid.dim):
        Tf = jnp.clip(face_average(T1p, grid, ax), 0.0, 1.0)
        alpha.append(1.0 / (rho2 + Tf * (rho1 - rho2)))
    return rho_c, tuple(alpha)


def viscosity_field(state: dict, cfg: NSConfig, t, grid: Grid = None):
    """Per-cell dynamic viscosity from cfg.nu_var (GfsSourceViscosity
    with a GfsFunction, src/source.c source_viscosity_read).  Derived
    (VariableFiltered) fields named in nu_var_fields are materialized
    from their parent tracer."""
    if cfg.nu_var is None:
        return None
    grid = grid or cfg.grid
    vof_bc = dict((v[0], v[1]) for v in cfg.vof_tracers)
    tr_bc = dict((tr[0], tr[1]) for tr in cfg.tracers)
    fields = {}
    for name, parent, npass in cfg.nu_var_fields:
        if parent is None or name in state:
            fields[name] = state[name]
        else:
            fbc = vof_bc.get(parent) or tr_bc.get(parent) \
                or bcs.default_scalar_bc(grid.dim)
            fields[name] = filtered(state[parent], grid, fbc, npass, t=t)
    return jnp.asarray(cfg.nu_var(*grid.centers, t=t, **fields))


def viscous_transpose_sources(U, mu, grid: Grid, cfg: NSConfig,
                              alpha_cell, t):
    """Explicit remainder of the variable-viscosity stress divergence:
    src_c = (1/rho) sum_j (d_c u_j)(d_j mu) — the div(mu grad(u)^T) part
    the implicit div(mu grad u_c) solve does not see
    (source_viscosity_non_diffusion_value, src/source.c:1412-1438;
    exactly their centered-gradient product form)."""
    from ..ops.stencils import center_gradient
    dim = grid.dim
    mu_pad = bcs.apply_bc(mu, grid, bcs.default_scalar_bc(dim), 1, t=t)
    dmu = [center_gradient(mu_pad, grid, j) for j in range(dim)]
    u_pads = [bcs.apply_bc(U[j], grid, cfg.u_bcs[j], 1, t=t,
                           corners=False) for j in range(dim)]
    srcs = []
    for c in range(dim):
        s = 0.0
        for j in range(dim):
            s = s + center_gradient(u_pads[j], grid, c) * dmu[j]
        if alpha_cell is not None:
            s = s * alpha_cell
        srcs.append(s)
    return srcs


def tension_sources(state: dict, cfg: NSConfig, t, alpha=None,
                    grid: Grid = None, off_max: int = 2):
    """Curvature + well-balanced tension face sources from the current VOF
    fields (reference: GfsVariableCurvature event + tension_coeff; the
    face coefficient carries alpha=1/rho, src/poisson.c:907).
    ``grid`` overrides cfg.grid for per-level AMR evaluation."""
    if not cfg.tension:
        return None
    from ..physics import vof as vofm
    from ..physics import tension as tens

    grid = grid or cfg.grid
    srcs = None
    for name, sigma in cfg.tension:
        fbc = dict((v[0], v[1]) for v in cfg.vof_tracers)[name]
        T = state[name]
        kap = vofm.curvature(T, grid, fbc, t=t, off_max=off_max)
        kap = vofm.fill_curvature(kap, None, niter=2)
        dp = tens.tension_face_sources(T, kap, sigma, grid, fbc,
                                       alpha=alpha, t=t)
        srcs = dp if srcs is None else [a + b for a, b in zip(srcs, dp)]
    return srcs


@functools.lru_cache(maxsize=32)
def _axi_metric(grid: Grid):
    """(cm, fm): cell and per-axis face metric factors r = y for the
    axisymmetric metric (GfsAxi; reference src/metric.c + the generic
    per-face metric hooks src/domain.h:94-110)."""
    import numpy as np

    with jax.ensure_compile_time_eval():
        yc = jnp.asarray(grid.axis_centers(1))
        yf = jnp.asarray(grid.axis_faces(1))
        cm = jnp.broadcast_to(yc[None, :], grid.shape)
        fmx = jnp.broadcast_to(yc[None, :], grid.face_shape(0))
        fmy = jnp.broadcast_to(yf[None, :], grid.face_shape(1))
    return cm, (fmx, fmy)


def _weights(cfg: NSConfig):
    """Combined (vol, faces, dirichlet-surface, clamped-vol) weights:
    solid fractions x metric factors — both enter the reference's face
    coefficients identically (gfs_poisson_coefficients,
    src/poisson.c:756-901).  The clamp applies to the solid fraction only
    (small-cut-cell guard, the merged-cell stand-in); metric factors are
    exact."""
    grid = cfg.grid
    a = s = ds = a_cl = None
    if cfg.solid_phi is not None:
        a, s, ds = _solid_ctx(grid, cfg.solid_phi)
        a_cl = jnp.maximum(a, 0.25)
    if cfg.axi:
        cm, fm = _axi_metric(grid)
        a = cm if a is None else a * cm
        a_cl = cm if a_cl is None else a_cl * cm
        s = fm if s is None else tuple(s[c] * fm[c] for c in range(2))
    if cfg.metric is not None:
        with jax.ensure_compile_time_eval():
            cm, fm = cfg.metric.weights(grid)
        a = cm if a is None else a * cm
        a_cl = cm if a_cl is None else a_cl * cm
        s = fm if s is None else tuple(s[c] * fm[c]
                                       for c in range(grid.dim))
    return a, s, ds, a_cl


def _eval_surface_u(us, x, y, t):
    """Surface-velocity entry: scalar, f(x, y) or f(x, y, t)."""
    if callable(us):
        try:
            return us(x, y, t)
        except TypeError:
            return us(x, y)
    return us


def _redistribute_small(src, a, s):
    """Move the divergence source of small cut cells (a < 0.5, the
    reference's GFS_SMALL merge threshold) into the neighbour across
    their largest fluid face — the dense-array stand-in for the
    reference's merged-cell divergence distribution
    (moving_divergence_distribution, src/moving.c:1000-1025): tiny cells
    cannot absorb a finite volume displacement (their operator row is
    nearly zero), so the projection rhs must live in their well-connected
    neighbours."""
    sx, sy = s
    fr = jnp.stack([sx[:-1, :], sx[1:, :], sy[:, :-1], sy[:, 1:]])
    small = (a < 0.5) & (a > 0.0)
    d = jnp.argmax(fr, axis=0)
    moved = jnp.where(small, src, 0.0)
    out = src - moved
    # scatter into the chosen neighbour via opposite-direction shifts
    for k, (axis, shift) in enumerate(((0, -1), (0, 1), (1, -1), (1, 1))):
        m = jnp.where(d == k, moved, 0.0)
        out = out + jnp.roll(m, shift, axis)
    return out


def _moving_solid_ctx(cfg: NSConfig, U: list, dt, t, solid_args=None):
    """Per-step re-cut moving-solid context (first-order scheme).

    Returns (solid weights, filled velocities, MAC divergence source,
    approximate-projection divergence source).  The solid is cut at its
    t+dt position (reference: move_solids before the step,
    src/moving.c:949-990,1155); cells uncovered since t — and the solid
    interior — carry the solid surface velocity
    (init_new_cell_velocity_from_solid, moving.c:135-140).  The
    projections see the solid's volume displacement: the MAC hook uses
    the geometric rate (a(t+dt)-a(t))/dt (divergence_mac_hook_order_1,
    moving.c:1043-1068 with q.dt=-2dt), the approximate hook the surface
    flux -u_s.(s_hi-s_lo)/h (moving_divergence_approx, moving.c:993-998;
    note FTT direction 2c is the + face, so the reference's
    s[2c+1]-s[2c] is lo-hi)."""
    from ..physics.solid import solid_fractions, DirichletSurface

    grid = cfg.grid
    dim = grid.dim
    extra = tuple(solid_args) if solid_args is not None else ()
    a_old, s_old = solid_fractions(
        grid, lambda x, y: cfg.solid_phi(x, y, t, *extra))
    ds = DirichletSurface(
        grid, lambda x, y: cfg.solid_phi(x, y, t + dt, *extra))
    a, s = ds.a, ds.s
    a_cl = jnp.maximum(a, 0.25)
    x, y = grid.centers
    if solid_args is not None and cfg.surface_u is not None:
        us = [cfg.surface_u[c](x, y, t + dt, *extra)
              if callable(cfg.surface_u[c]) else cfg.surface_u[c]
              for c in range(dim)]
    else:
        us = [_eval_surface_u(cfg.surface_u[c] if cfg.surface_u else 0.0,
                              x, y, t + dt) for c in range(dim)]
    if cfg.moving_order >= 2:
        # second-order scheme (moving2.c): freshly-uncovered cells get
        # the average of their old-fluid neighbours (the merged-cell
        # interpolation analogue, moving2.c:488-560) — the solid
        # surface velocity is only the fallback where no fluid
        # neighbour exists; solid interior keeps us
        valid = (a > 0.0) & (a_old > 0.0)
        Uf = []
        for c in range(dim):
            u_c = U[c]
            vmask = valid
            for _ in range(2):
                up = jnp.pad(jnp.where(vmask, u_c, 0.0), 1)
                vp = jnp.pad(vmask.astype(u_c.dtype), 1)
                ssum = (up[:-2, 1:-1] + up[2:, 1:-1]
                        + up[1:-1, :-2] + up[1:-1, 2:])
                cnt = (vp[:-2, 1:-1] + vp[2:, 1:-1]
                       + vp[1:-1, :-2] + vp[1:-1, 2:])
                fill = jnp.where(cnt > 0.0,
                                 ssum / jnp.maximum(cnt, 1.0),
                                 jnp.asarray(us[c], u_c.dtype))
                fresh = (a > 0.0) & ~vmask
                u_c = jnp.where(fresh, fill, u_c)
                vmask = vmask | (fresh & (cnt > 0.0))
            u_c = jnp.where(a > 0.0, u_c,
                            jnp.broadcast_to(
                                jnp.asarray(us[c], u_c.dtype), u_c.shape))
            Uf.append(u_c)
        U = Uf
        # time-centred face fractions for the advection fluxes
        # (face_fraction_half, moving2.c:563-570)
        s_half = tuple(0.5 * (s_old[c] + s[c]) for c in range(dim))
    else:
        U = [jnp.where((a > 0.0) & (a_old > 0.0), U[c],
                       jnp.broadcast_to(jnp.asarray(us[c], U[c].dtype),
                                        U[c].shape))
             for c in range(dim)]
        s_half = None
    if s_half is not None:
        # order 2: the MAC projection runs on the time-centred face
        # fractions with the OLD cell fraction (swap_face_fractions
        # around gfs_mac_projection, moving2.c:744-751 + moving.c:1095);
        # in our div-source convention the compatible source for the
        # half fractions is the same centred swept-volume rate
        # (div(s_half u_s) ~ (a_new - a_old)/dt), redistributed with the
        # OLD fractions (moving_divergence_distribution_second_order,
        # moving2.c:780)
        mac_div = _redistribute_small(2.0 * (a - a_old) / (dt * dt),
                                      a_old, s_half)
    else:
        mac_div = _redistribute_small(2.0 * (a - a_old) / (dt * dt), a, s)
    h = grid.h
    approx_div = -(us[0] * (s[0][1:, :] - s[0][:-1, :]) +
                   us[1] * (s[1][:, 1:] - s[1][:, :-1])) / (h * dt)
    approx_div = _redistribute_small(jnp.where(a > 0.0, approx_div, 0.0),
                                     a, s)
    solid = (a, s, ds, a_cl) if s_half is None else \
        (a, s, ds, a_cl, s_half, a_old)
    return solid, U, mac_div, approx_div


@functools.lru_cache(maxsize=32)
def _solid_ctx(grid: Grid, solid_phi):
    """Cached embedded-solid geometry for a config: (a, s faces,
    DirichletSurface) — static per (grid, phi).  Evaluated eagerly even
    when first touched inside a jit trace (geometry is constant data; the
    cache must never hold tracers)."""
    from ..physics.solid import solid_fractions, DirichletSurface

    with jax.ensure_compile_time_eval():
        a, s = solid_fractions(grid, solid_phi)
        ds = DirichletSurface(grid, solid_phi)
    return a, s, ds


def solid_velocity_diffusion(v, ds, us_v, grid, fbc, dt, nu, a, s,
                             beta, params, extra_rhs, t, extra_dia=None):
    """Implicit viscous solve with weighted coefficients (cut cells and/or
    metric factors) and optional Dirichlet velocity on an embedded
    surface:
    a u - beta dt [div(nu s grad u) + nu l_b (u_s - u_probe)/(d_p h^2)]
        + beta dt nu extra_dia u = a u_old + extra.
    The probe term is deferred-corrected (2 outer iterations).
    ``extra_dia``: per-cell addition (the axisymmetric -u/r^2 term for the
    radial component; reference src/metric.c viscous metric terms).
    Reference: surface BCs in the viscous solve (GfsSurfaceBc,
    src/timestep.c:1062-1229; Dirichlet relax src/poisson.c:561-586)."""
    from ..solvers import poisson as psn

    dim = grid.dim
    scale = beta * dt * nu
    alpha = tuple(scale * s[c] for c in range(dim))
    dia = a + (0.0 if extra_dia is None else scale * extra_dia)
    if ds is not None:
        dia = dia + scale * ds.dia
        usv = ds.surface_value(us_v, t)
        base = -(a * v + extra_rhs + scale * ds.dia * usv)
    else:
        base = -(a * v + extra_rhs)
    params = params or psn.MultilevelParams(tolerance=1e-3, nitermax=10)
    u = v
    for _ in range(2 if ds is not None else 1):
        if ds is not None:
            corr = jnp.where(ds.mixed,
                             scale * ds.dia * (ds.probe(u) - u), 0.0)
        else:
            corr = 0.0
        u, _ = psn.solve(u, base + corr, grid, fbc, params, alpha=alpha,
                         dia=dia, t=t)
    return u


@functools.partial(jax.jit, static_argnames=("cfg", "cstart", "first_step"))
def ns_step(state: dict, dt, t, cfg: NSConfig, cstart: int = 0,
            first_step: bool = False, sources=None,
            solid_args=None) -> dict:
    """One full time step.  ``state`` keys: U,V(,W), P, Pmac, Gx,Gy(,Gz),
    tracers, VOF tracers.  ``cstart``: rotating first sweep direction for
    VOF advection (reference: src/vof.c:1648,1721).  ``sources``: optional
    extra per-component cell accelerations (GfsSourceGeneric centered
    sources, e.g. the electrohydro Maxwell stress)."""
    grid = cfg.grid
    dim = grid.dim
    names = velocity_names(dim)
    U = [state[n] for n in names]
    gc = cfg.advection.gc
    g_prev = [state[n] for n in gradient_names(dim)] if gc else None
    rho_c, alpha = density_fields(state, cfg, t)
    fs = tension_sources(state, cfg, t, alpha=alpha)
    if cfg.tension_css:
        from ..physics import tension as tens
        for name, sigma in cfg.tension_css:
            fbc_t = dict((v[0], v[1]) for v in cfg.vof_tracers)[name]
            css = tens.css_tension_sources(
                state[name], sigma, grid, fbc_t,
                alpha_cell=None if rho_c is None else 1.0 / rho_c, t=t)
            sources = css if sources is None else \
                [css[c] + sources[c] for c in range(dim)]
    if cfg.body_force is not None:
        # body forces ride the SAME well-balanced face-source path as
        # surface tension: dp enters both projections (u_face += dt dp,
        # g_cell = alpha grad p - dp) so a conservative force is
        # absorbed into the pressure EXACTLY — cell-side application
        # left O(0.2) spurious velocities where the reference's
        # test/hydrostatic demands < 1.5e-12 (gfs_velocity_face_sources
        # src/timestep.c:245-290)
        fs_g = []
        for c in range(dim):
            bf = cfg.body_force[c]
            shp = grid.face_shape(c)
            if bf is None:
                fs_g.append(jnp.zeros(shp, U[0].dtype))
            elif callable(bf):
                coords = []
                for a in range(dim):
                    ax = (grid.axis_faces(a) if a == c
                          else grid.axis_centers(a))
                    sh = [1] * dim
                    sh[a] = len(ax)
                    coords.append(jnp.asarray(ax).reshape(sh))
                fs_g.append(jnp.broadcast_to(
                    jnp.asarray(bf(*coords, t=t), U[0].dtype), shp))
            else:
                fs_g.append(jnp.full(shp, bf, U[0].dtype))
            if not cfg.u_bcs[c].is_periodic(c):
                # boundary faces carry a prescribed normal velocity —
                # the force must not act there, and its absence is what
                # feeds the wall-cell divergence that makes p exactly
                # hydrostatic (p = g.x solves the discrete system
                # exactly when interior faces see dp = g and wall
                # faces see 0)
                idx = jax.lax.broadcasted_iota(jnp.int32, shp, c)
                interior = (idx > 0) & (idx < shp[c] - 1)
                fs_g[c] = jnp.where(interior, fs_g[c], 0.0)
        fs = fs_g if fs is None else \
            [fs[c] + fs_g[c] for c in range(dim)]
        cfg = dataclasses.replace(cfg, body_force=None)
    mu = viscosity_field(state, cfg, t)
    if mu is not None:
        assert cfg.solid_phi is None and not cfg.moving_solid, \
            "variable viscosity + embedded solids not composed"
        tsrc = viscous_transpose_sources(
            U, mu, grid, cfg, None if rho_c is None else 1.0 / rho_c, t)
        sources = tsrc if sources is None else \
            [tsrc[c] + sources[c] for c in range(dim)]
    solid = None
    sfrac = None
    mac_div_src = approx_div_src = None
    if cfg.moving_solid:
        assert not cfg.axi, "moving solids + axi metric not composed"
        solid, U, mac_div_src, approx_div_src = _moving_solid_ctx(
            cfg, U, dt, t, solid_args)
        sfrac = solid[1]
    elif cfg.solid_phi is not None or cfg.axi or cfg.metric is not None:
        solid = _weights(cfg)
        sfrac = solid[1]

    # 1. prediction.  cfg.pack_faces routes the MAC faces through the
    # packed kernel layout end-to-end (ops/pallas/facepack.py).
    # Default OFF: measured A/B at 2048^2 (315M packed vs 338M unpacked)
    # shows the packed producers' ANY-memory-space staged output DMAs
    # serialize per strip, costing ~1.4 ms/step — more than the
    # pad/concat launches they remove.
    use_pk = sfrac is None and dim == 2 and cfg.pack_faces
    # divergence-in-producer fold: only when nothing touches the faces
    # between the producer and the projection (no tension sources, no
    # solid masking, constant density, no volume sources)
    fold_src = (cfg.div_in_src and dim == 2 and not use_pk
                and fs is None and alpha is None
                and mac_div_src is None and solid is None)
    mac_divp = None
    if fold_src:
        uf, mac_divp = predicted_face_velocities(
            U, grid, cfg, dt, t, packed=use_pk,
            div_scale=1.0 / (grid.h * (dt / 2.0)))
    else:
        uf = predicted_face_velocities(U, grid, cfg, dt, t,
                                       packed=use_pk)
    # moving_order=2: the MAC projection runs on the time-centred face
    # fractions + OLD cell fraction (swap_face_fractions, moving2.c)
    mac_sfrac = sfrac
    mac_vfrac = None if solid is None else solid[0]
    if solid is not None and len(solid) > 4:
        mac_sfrac = solid[4]
        mac_vfrac = solid[5]
    if mac_sfrac is not None:
        uf = [jnp.where(mac_sfrac[c] > 0.0, uf[c], 0.0)
              for c in range(dim)]

    # 2. MAC projection at dt/2 on Pmac (reference swaps P<->Pmac around it,
    #    src/simulation.c:498-504)
    uf, pmac, gmac, _ = proj.mac_projection(
        uf, state["Pmac"], grid, cfg.p_bc, dt / 2.0, cfg.projection,
        alpha=alpha, div_source=mac_div_src, face_sources=fs,
        face_frac=mac_sfrac,
        vol_frac=mac_vfrac, t=t, div_pre=mac_divp)

    # 3. centred advection + diffusion (momentum rhs includes -dt*g_prev);
    # at i==0 the gc gradient role is played by this step's gmac
    # (reference: src/simulation.c:514-521 'time.i > 0 ? gc : gmac')
    if gc and first_step:
        g_prev = gmac
    if cfg.particle_coupling:
        ps = [state["PF" + ax] for ax in ("x", "y", "z")[:dim]]
        sources = ps if sources is None else \
            [ps[c] + sources[c] for c in range(dim)]
    U = velocity_advection_diffusion(U, uf, gmac, g_prev, grid, cfg, dt, t,
                                     sources=sources, rho=rho_c,
                                     solid=solid, mu=mu)
    # 4. approximate projection at dt.  The gc gradient re-add
    # (gfs_correct_centered_velocities with -dt, src/simulation.c:520)
    # folds into the face-interpolation launch; the post-solve centred
    # correction folds into the projection-correction launch.
    apx_divp = None
    fold_src2 = fold_src and approx_div_src is None and sfrac is None
    if gc:
        if fold_src2:
            uf2, U, apx_divp = proj.face_interpolated_velocity(
                U, grid, list(cfg.u_bcs), t=t, gp=g_prev, dtv=dt,
                packed=use_pk, div_scale=1.0 / (grid.h * dt))
        else:
            uf2, U = proj.face_interpolated_velocity(
                U, grid, list(cfg.u_bcs), t=t, gp=g_prev, dtv=dt,
                packed=use_pk)
    elif fold_src2:
        uf2, apx_divp = proj.face_interpolated_velocity(
            U, grid, list(cfg.u_bcs), t=t, packed=use_pk,
            div_scale=1.0 / (grid.h * dt))
    else:
        uf2 = proj.face_interpolated_velocity(U, grid, list(cfg.u_bcs),
                                              t=t, packed=use_pk)
    if sfrac is not None:
        uf2 = [jnp.where(sfrac[c] > 0.0, uf2[c], 0.0) for c in range(dim)]
    uf2, p, g_cell, _, U = proj.mac_projection(
        uf2, state["P"], grid, cfg.p_bc, dt, cfg.approx_projection,
        alpha=alpha, div_source=approx_div_src, face_sources=fs,
        face_frac=sfrac,
        vol_frac=None if solid is None else solid[0], t=t, cells=U,
        div_pre=apx_divp)
    if solid is not None:
        U = [jnp.where(solid[0] > 0.0, U[c], 0.0) for c in range(dim)]

    new = dict(state)
    for c, n in enumerate(names):
        new[n] = U[c]
    new["P"] = p
    new["Pmac"] = pmac
    if gc:
        for c, n in enumerate(gradient_names(dim)):
            new[n] = g_cell[c]

    # 5. tracers with the projected face field (gfs_advance_tracers)
    if cfg.tracers or cfg.vof_tracers:
        from ..ops.pallas.facepack import as_pair as _ap
        uf2 = _ap(uf2)
    for tr in cfg.tracers:
        new[tr[0]] = advect_tracer(state[tr[0]], tr, uf2, grid, cfg, dt, t)
    if cfg.vof_tracers:
        from ..physics import vof as vofm
        for name, fbc in cfg.vof_tracers:
            new[name] = vofm.advect(state[name], uf2, grid, fbc, dt,
                                    cstart=cstart, t=t)
    return new


@functools.partial(jax.jit, static_argnames=("cfg",))
def initial_projection(state: dict, dt, t, cfg: NSConfig) -> dict:
    """i==0 approximate projection making the initial field divergence-free
    and seeding the gc gradient (reference: src/simulation.c:466-474).
    Tension face sources are deliberately NOT applied here: in the
    reference the curvature variable has not been evaluated yet at init
    time, so tension_coeff sees undefined kappa and contributes nothing
    (src/poisson.c:929-936); matching that reproduces the capwave
    convergence table, seeding tension here does not."""
    names = velocity_names(cfg.dim)
    U = [state[n] for n in names]
    rho_c, alpha = density_fields(state, cfg, t)
    sfrac = vfrac = None
    if cfg.moving_solid:
        from ..physics.solid import solid_fractions
        vfrac, sfrac = solid_fractions(
            cfg.grid, lambda x, y: cfg.solid_phi(x, y, t))
    elif cfg.solid_phi is not None or cfg.axi or cfg.metric is not None:
        ctx = _weights(cfg)
        sfrac, vfrac = ctx[1], ctx[0]
    U, _, p, g_cell, _ = _approx(U, state["P"], cfg, dt, t,
                                 alpha=alpha, face_sources=None,
                                 face_frac=sfrac, vol_frac=vfrac)
    new = dict(state)
    for c, n in enumerate(names):
        new[n] = U[c]
    new["P"] = p
    if cfg.advection.gc:
        for c, n in enumerate(gradient_names(cfg.dim)):
            new[n] = g_cell[c]
    return new


def _approx(U, p, cfg, dt, t, alpha=None, face_sources=None,
            face_frac=None, vol_frac=None):
    uf = proj.face_interpolated_velocity(U, cfg.grid, list(cfg.u_bcs), t=t)
    if face_frac is not None:
        uf = [jnp.where(face_frac[c] > 0.0, uf[c], 0.0)
              for c in range(cfg.dim)]
    uf, p, g_cell, stats = proj.mac_projection(
        uf, p, cfg.grid, cfg.p_bc, dt, cfg.approx_projection,
        alpha=alpha, face_sources=face_sources, face_frac=face_frac,
        vol_frac=vol_frac, t=t)
    U = [U[c] - dt * g_cell[c] for c in range(cfg.dim)]
    return U, uf, p, g_cell, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def timescale(state: dict, cfg: NSConfig):
    """min over cells/components of h/|u|, plus the acceleration-source
    stability bound sqrt(2h/|a|) for body forces and particle reaction
    forces (reference: gfs_domain_cfl src/domain.c:2857-2906 including
    the g/(2 size) source terms)."""
    grid = cfg.grid
    ts = jnp.asarray(jnp.inf, state["P"].dtype)
    for c, n in enumerate(velocity_names(grid.dim)):
        umax = jnp.max(jnp.abs(state[n]))
        ts = jnp.minimum(ts, grid.h / jnp.maximum(umax, 1e-300))
        amax = 0.0
        if cfg.body_force is not None and cfg.body_force[c] is not None:
            bf = cfg.body_force[c]
            bfv = bf(*grid.centers, 0.0) if callable(bf) else bf
            amax = amax + jnp.max(jnp.abs(bfv))
        if cfg.particle_coupling:
            amax = amax + jnp.max(jnp.abs(state["PF" + "xyz"[c]]))
        ts = jnp.minimum(ts, jnp.sqrt(
            2.0 * grid.h / jnp.maximum(amax, 1e-300)))
    return ts
