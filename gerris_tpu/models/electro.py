"""Electrohydrodynamics: potential solve, Maxwell stress, ohmic charge.

TPU-native rebuild of the reference electrohydro module
(reference: modules/electrohydro.c:29-896, GfsElectroHydro +
GfsSourceElectric).  The extra state is the electric potential ``Phi``
(and the derived field ``E = -grad Phi``) with per-step physics:

* electric Poisson ``div(eps grad Phi) = -rhoe`` with per-face
  permittivity (poisson_electric, electrohydro.c:413-477; the rhs sign
  from rescale_div:339-343);
* Maxwell-stress momentum source
  ``f = div(eps (E otimes E - |E|^2 I / 2))`` evaluated in conservative
  face-flux form (save_fe, electrohydro.c:669-740) — identically zero
  for a uniform field, so the scheme is well-balanced;
* ohmic conduction ``d rhoe/dt = div(sigma grad Phi)``
  (SourceDiffusionExplicit with potential argument, the charge-transport
  model of test/electro and test/debye).

Everything is dense jnp on the uniform grid; the potential reuses the
multigrid Poisson solver with face-coefficient alpha = eps.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax.numpy as jnp

from ..core.grid import Grid
from ..core import bc as bcs
from ..ops.stencils import divergence, face_average
from ..solvers import poisson
from ..solvers.projection import face_gradients, cell_gradient_from_faces
from .simulation import Simulation


@dataclasses.dataclass(frozen=True)
class ElectroParams:
    """Reference: the GfsElectroHydro read block
    ``{ perm = ... charge = ... ElectricProjectionParams {...} }``
    (electrohydro.c:92-210)."""
    phi_bc: bcs.FieldBC
    perm: Union[float, Callable] = 1.0    # eps(x, y[, z], t, **fields)
    charge: Union[str, Callable, None] = None   # tracer name or function
    conductivity: Union[float, Callable, None] = None  # sigma for ohmic
    projection: poisson.MultilevelParams = None

    def __post_init__(self):
        if self.projection is None:
            object.__setattr__(self, "projection",
                               poisson.MultilevelParams(tolerance=1e-4))


def _eval_coeff(coeff, grid: Grid, t, fields: dict):
    """Evaluate a permittivity/conductivity function on cell centres."""
    if callable(coeff):
        try:
            val = coeff(*grid.centers, t=t, **fields)
        except TypeError:
            val = coeff(*grid.centers)
        return val + jnp.zeros(grid.shape)
    return jnp.full(grid.shape, float(coeff))


def coefficient_faces(coeff, grid: Grid, t=0.0, fields=None,
                      fbc: bcs.FieldBC = None):
    """Per-face coefficient by averaging the cell field (reference
    evaluates GfsFunctions at faces with face-interpolated variables,
    gfs_poisson_coefficients src/poisson.c:868; the arithmetic face mean
    is the same stencil)."""
    if not callable(coeff) and fields is None:
        return None if float(coeff) == 1.0 else tuple(
            jnp.full(grid.face_shape(c), float(coeff))
            for c in range(grid.dim))
    cell = _eval_coeff(coeff, grid, t, fields or {})
    fbc = fbc or bcs.default_scalar_bc(grid.dim)
    pad = bcs.apply_bc(cell, grid, fbc, 1, t=t)
    return tuple(face_average(pad, grid, c) for c in range(grid.dim))


def solve_potential(phi, rhoe, grid: Grid, phi_bc: bcs.FieldBC,
                    params: poisson.MultilevelParams, eps_face=None, t=0.0):
    """div(eps grad Phi) = -rhoe (reference: poisson_electric,
    electrohydro.c:413-455; set_dive + rescale_div give rhs = -charge)."""
    rhs = -rhoe
    if not any(b.kind == bcs.DIRICHLET for ax in phi_bc.sides for b in ax):
        rhs = rhs - jnp.mean(rhs)     # compatibility
    phi, stats = poisson.solve(phi, rhs, grid, phi_bc, params,
                               alpha=eps_face, t=t)
    return phi, stats


def efield(phi, grid: Grid, phi_bc: bcs.FieldBC, t=0.0):
    """E = -grad Phi at cell centres (minus_gradient,
    electrohydro.c:346-357: mean of the two one-sided face gradients)."""
    gf = face_gradients(phi, grid, phi_bc, None, t=t)
    g = cell_gradient_from_faces(gf, grid)
    return [-gc for gc in g]


def maxwell_force(phi, grid: Grid, phi_bc: bcs.FieldBC, eps_face=None,
                  t=0.0, alpha_cell=None, metric=None):
    """Maxwell-stress force per unit volume in conservative face-flux form
    (reference: save_fe electrohydro.c:669-740):

        f_c = (1/h) sum_faces eps_f [E_c (E . n) - |E|^2 n_c / 2]

    with the face-normal field from the direct face gradient of Phi and
    tangential components face-interpolated — exactly zero for uniform E
    (well-balanced).  ``alpha_cell``: optional 1/rho scaling.
    """
    dim = grid.dim
    gf = face_gradients(phi, grid, phi_bc, None, t=t)     # grad phi at faces
    En = [-g for g in gf]                                  # normal E per axis
    Ec = efield(phi, grid, phi_bc, t=t)                    # cell E
    sbc = bcs.default_scalar_bc(dim)
    if eps_face is None:
        eps_face = tuple(1.0 for _ in range(dim))
    # tangential components interpolated to each face family
    Et = {}
    for a in range(dim):          # face family (normal axis a)
        for c in range(dim):
            if c == a:
                continue
            pad = bcs.apply_bc(Ec[c], grid, sbc, 1, t=t)
            Et[(a, c)] = face_average(pad, grid, a)
    out = []
    for c in range(dim):
        fluxes = []
        for a in range(dim):
            if a == c:
                emod2 = En[a] * En[a]
                for cc in range(dim):
                    if cc != a:
                        emod2 = emod2 + Et[(a, cc)] ** 2
                F = eps_face[a] * (En[a] * En[a] - 0.5 * emod2)
            else:
                F = eps_face[a] * Et[(a, c)] * En[a]
            fluxes.append(F)
        f = divergence(fluxes, grid)
        if alpha_cell is not None:
            f = f * alpha_cell
        out.append(f)
    return out


def ohmic_update(rhoe, phi, grid: Grid, phi_bc: bcs.FieldBC, sigma_face,
                 dt, t=0.0):
    """Explicit conduction: rhoe += dt * div(sigma grad Phi)
    (SourceDiffusionExplicit <sigma> Phi — test/electro/electro.gfs)."""
    gf = face_gradients(phi, grid, phi_bc, None, t=t)
    if sigma_face is not None:
        gf = [gf[c] * sigma_face[c] for c in range(grid.dim)]
    return rhoe + dt * divergence(gf, grid)


class ElectroSimulation(Simulation):
    """GfsElectroHydro: the NS driver plus the electric subsystem
    (reference: gfs_electro_hydro_run electrohydro.c:478-610).

    The charge may be a tracer named in ``cfg.tracers`` (advected with
    the flow, conducted ohmically) or a prescribed function; the
    Maxwell-stress force enters the momentum equation as a centred
    source.
    """

    def __init__(self, cfg, elec: ElectroParams, time=None, events=None):
        super().__init__(cfg, time=time, events=events)
        self.elec = elec
        self.electric_stats = None

    def init(self, **fields):
        super().init(**fields)
        if "Phi" in fields:     # initial guess for the potential solve
            v = fields["Phi"]
            if callable(v):
                v = v(*self.cfg.grid.centers)
            self.state["Phi"] = jnp.asarray(v) + jnp.zeros(self.cfg.grid.shape)
        return self

    def _fields(self):
        names = [tr[0] for tr in self.cfg.tracers] + \
            [tr[0] for tr in self.cfg.vof_tracers]
        return {n: self.state[n] for n in names}

    def _charge(self):
        e = self.elec
        if e.charge is None:
            return jnp.zeros(self.cfg.grid.shape)
        if isinstance(e.charge, str):
            return self.state[e.charge]
        return _eval_coeff(e.charge, self.cfg.grid, self.time.t,
                           self._fields())

    def poisson_electric(self):
        """Reference: poisson_electric electrohydro.c:413-477."""
        grid, e = self.cfg.grid, self.elec
        fields = self._fields()
        eps_f = coefficient_faces(e.perm, grid, self.time.t, fields)
        phi = self.state.get("Phi", jnp.zeros(grid.shape))
        phi, stats = solve_potential(phi, self._charge(), grid, e.phi_bc,
                                     e.projection, eps_f, t=self.time.t)
        self.state["Phi"] = phi
        self.electric_stats = stats
        E = efield(phi, grid, e.phi_bc, t=self.time.t)
        for c, n in enumerate(("Ex", "Ey", "Ez")[:grid.dim]):
            self.state[n] = E[c]
        return eps_f

    def _initial_projection(self):
        super()._initial_projection()
        self.poisson_electric()

    def _advance(self):
        from . import ns as _ns
        grid, e = self.cfg.grid, self.elec
        fields = self._fields()
        eps_f = coefficient_faces(e.perm, grid, self.time.t, fields)
        alpha_cell = None
        if self.cfg.density is not None:
            name, r1, r2, npass = self.cfg.density
            T = _ns.filtered(self.state[name], grid,
                             dict(self.cfg.vof_tracers)[name], npass,
                             self.time.t)
            alpha_cell = 1.0 / (r1 * T + r2 * (1.0 - T))
        fe = maxwell_force(self.state["Phi"], grid, e.phi_bc, eps_f,
                           t=self.time.t, alpha_cell=alpha_cell)
        self.state = self._timed(
            "step", _ns.ns_step, self.state, self.dt, self.time.t, self.cfg,
            cstart=self.time.i % grid.dim,
            first_step=(self.time.i == 0), sources=fe)
        # charge transport: ohmic conduction with the *current* potential
        # (gfs_advance_tracers then poisson_electric, electrohydro.c:591-593)
        if isinstance(e.charge, str) and e.conductivity is not None:
            sig_f = coefficient_faces(e.conductivity, grid, self.time.t,
                                      self._fields())
            self.state[e.charge] = ohmic_update(
                self.state[e.charge], self.state["Phi"], grid, e.phi_bc,
                sig_f, self.dt, t=self.time.t)
        self.poisson_electric()
