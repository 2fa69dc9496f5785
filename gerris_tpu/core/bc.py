"""Boundary conditions applied as ghost-cell padding.

TPU-native replacement for the reference's per-box boundary objects and
ghost-tree exchange (reference: src/boundary.h:35-173, src/domain.c:723-878
``gfs_domain_bc``).  A BC here is a small static descriptor; "applying" BCs
returns the field padded with ``width`` ghost layers so downstream stencil
kernels are branch-free.  Ghost-cell formulas follow the reference:

* Dirichlet: ghost = 2*b - interior, a linear profile through the face value
  (reference: src/boundary.c bc_dirichlet / GFS_STATE ghost symmetry).
* Neumann:   ghost = interior - g * (distance), mirror for g=0
  (reference: src/boundary.c bc_neumann).
* Periodic:  wrap-around copy (reference: src/boundary.h:252-287
  GfsBoundaryPeriodic buffer copy).

``homogeneous=True`` gives the zero-valued variants used by the multigrid
correction sweeps (reference: src/poisson.c:1141-1167 relax_loop applies
homogeneous BCs each sweep).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid

Value = Union[float, Callable]

DIRICHLET = "dirichlet"
NEUMANN = "neumann"
PERIODIC = "periodic"
NAVIER = "navier"
CONTACT = "contact"


@dataclasses.dataclass(frozen=True)
class BC:
    kind: str
    value: Value = 0.0

    def __hash__(self):
        return hash((self.kind, self.value if not callable(self.value) else id(self.value)))


def Dirichlet(value: Value = 0.0) -> BC:
    return BC(DIRICHLET, value)


def Neumann(grad: Value = 0.0) -> BC:
    return BC(NEUMANN, grad)


def Periodic() -> BC:
    return BC(PERIODIC)


def Navier(slip_length: float = 0.0) -> BC:
    """Navier slip: du/dn = u/lambda at the wall (reference: GfsBcNavier,
    src/boundary.c; lambda=0 is no-slip Dirichlet, lambda->inf free
    slip).  Ghost = (2 lambda - h)/(2 lambda + h) * interior."""
    return BC(NAVIER, slip_length)


def bc_value(b: BC):
    """BC value for static-offset ghost consumers (Pallas offsets,
    block engines, roll+mask ghosts).  A CONTACT angle is NOT a
    Dirichlet/Neumann value — those consumers must pad it as a plain
    mirror (value 0); the angle only acts inside physics/vof.py.
    Omitting this turned the 60-degree angle into a Neumann gradient of
    60 in the block advection path (test/sessile blow-up, round 5)."""
    return 0.0 if b.kind == CONTACT else b.value


def Contact(angle: Value = 90.0) -> BC:
    """Contact-angle BC for a VOF fraction (reference: GfsBcAngle,
    src/boundary.c:412-457).  ``angle`` is in degrees (constant or a
    function of the boundary-face coordinates and t).  For the fraction
    itself this is a homogeneous Neumann (mirror) ghost — the reference
    sets ``bc = homogeneous_neumann`` (src/boundary.c:426-430); the
    angle acts on the height functions / PLIC ghosts inside
    physics/vof.py (box_contact_bc, src/vof.c:3333-3352)."""
    return BC(CONTACT, angle)


@dataclasses.dataclass(frozen=True)
class FieldBC:
    """One BC per (axis, side). ``sides[axis][side]``, side 0=low, 1=high."""

    sides: tuple  # tuple over axes of (low BC, high BC)

    @staticmethod
    def uniform(bc: BC, dim: int = 2) -> "FieldBC":
        return FieldBC(tuple(((bc, bc) for _ in range(dim))))

    @staticmethod
    def make(dim: int = 2, default: BC = None, **named) -> "FieldBC":
        """Build from side names: left/right (x), bottom/top (y), back/front (z).

        Mirrors the reference's .gfs box side naming (src/boundary.h
        FTT_RIGHT/LEFT/TOP/BOTTOM/FRONT/BACK).
        """
        default = default if default is not None else Neumann()
        names = {"left": (0, 0), "right": (0, 1), "bottom": (1, 0), "top": (1, 1),
                 "back": (2, 0), "front": (2, 1)}
        sides = [[default, default] for _ in range(dim)]
        for k, bc in named.items():
            ax, sd = names[k]
            if ax < dim:
                sides[ax][sd] = bc
        return FieldBC(tuple(tuple(s) for s in sides))

    def is_periodic(self, axis: int) -> bool:
        return self.sides[axis][0].kind == PERIODIC


def default_scalar_bc(dim: int = 2) -> FieldBC:
    """Reference default: symmetry (zero-Neumann) on solid box walls."""
    return FieldBC.uniform(Neumann(), dim)


def velocity_bc(component: int, dim: int = 2) -> FieldBC:
    """Reference default wall BC: no-penetration => normal component Dirichlet 0,
    tangential components symmetric (free-slip) (src/boundary.c symmetry BCs)."""
    sides = []
    for ax in range(dim):
        bc = Dirichlet(0.0) if ax == component else Neumann()
        sides.append((bc, bc))
    return FieldBC(tuple(sides))


def periodic_bc(dim: int = 2) -> FieldBC:
    return FieldBC.uniform(Periodic(), dim)


def _boundary_coords(grid: Grid, axis: int, side: int, width: int, ghost_layer: int,
                     pad_lo: tuple, pad_hi: tuple):
    """Coordinates of face centres for one boundary slab.

    The slab spans the *extended* (already padded) transverse axes so corner
    ghosts get consistent values. Returns a tuple of dim coordinate arrays
    broadcastable to the slab shape.
    """
    coords = []
    bnd = grid.boundary_coord(axis, side)
    for a in range(grid.dim):
        if a == axis:
            coords.append(bnd)
        else:
            i = np.arange(-pad_lo[a], grid.shape[a] + pad_hi[a])
            c = grid.origin[a] + (i + 0.5) * grid.h
            shape = [1] * grid.dim
            shape[a] = c.size
            coords.append(jnp.asarray(c).reshape(shape))
    return tuple(coords)


def _eval(value: Value, coords, t=0.0):
    if callable(value):
        try:
            return value(*coords, t)
        except TypeError:
            return value(*coords)
    return value


def apply_bc(field: jnp.ndarray, grid: Grid, fbc: FieldBC, width: int = 1,
             homogeneous: bool = False, t: float = 0.0,
             corners: bool = True) -> jnp.ndarray:
    """Return ``field`` padded with ``width`` ghost layers per the BCs.

    ``corners=False`` takes the SPMD-native path: one multi-axis zero pad
    plus masked ghost-slab writes (corner ghosts stay zero).  Sequential
    per-axis concatenates force GSPMD to all-gather half the domain per
    pad (measured on the level-8 dryrun); the masked form lowers to local
    slices + halo permutes.  Use it for axis-separable stencils (all the
    NS hot paths); anything reading diagonal neighbours (VOF normals,
    parabola fits) keeps the corner-filling path."""
    if not corners:
        return _apply_bc_nocorner(field, grid, fbc, width, homogeneous, t)
    dim = grid.dim
    out = field
    pad_done_lo = [0] * dim
    pad_done_hi = [0] * dim
    for axis in range(dim):
        lo_bc, hi_bc = fbc.sides[axis]
        slabs_lo, slabs_hi = [], []
        if lo_bc.kind == PERIODIC or hi_bc.kind == PERIODIC:
            # both sides must be periodic
            lo = _take(out, axis, slice(out.shape[axis] - width, out.shape[axis]))
            hi = _take(out, axis, slice(0, width))
            out = jnp.concatenate([lo, out, hi], axis=axis)
        else:
            for k in range(1, width + 1):
                # interior cell mirrored through the boundary face
                int_lo = _take(out, axis, slice(k - 1, k))
                int_hi = _take(out, axis, slice(out.shape[axis] - k, out.shape[axis] - k + 1))
                if lo_bc.kind == DIRICHLET:
                    b = 0.0 if homogeneous else _eval(
                        lo_bc.value,
                        _boundary_coords(grid, axis, 0, width, k, tuple(pad_done_lo), tuple(pad_done_hi)), t)
                    g_lo = 2.0 * b - int_lo
                elif lo_bc.kind == NAVIER:
                    lam = float(lo_bc.value)
                    g_lo = (2.0 * lam - grid.h) / (2.0 * lam + grid.h) \
                        * int_lo
                else:  # NEUMANN (CONTACT pads as mirror, src/boundary.c:426)
                    g = 0.0 if homogeneous or lo_bc.kind == CONTACT \
                        else _eval(
                        lo_bc.value,
                        _boundary_coords(grid, axis, 0, width, k, tuple(pad_done_lo), tuple(pad_done_hi)), t)
                    g_lo = int_lo - g * (2 * k - 1) * grid.h
                if hi_bc.kind == DIRICHLET:
                    b = 0.0 if homogeneous else _eval(
                        hi_bc.value,
                        _boundary_coords(grid, axis, 1, width, k, tuple(pad_done_lo), tuple(pad_done_hi)), t)
                    g_hi = 2.0 * b - int_hi
                elif hi_bc.kind == NAVIER:
                    lam = float(hi_bc.value)
                    g_hi = (2.0 * lam - grid.h) / (2.0 * lam + grid.h) \
                        * int_hi
                else:
                    g = 0.0 if homogeneous or hi_bc.kind == CONTACT \
                        else _eval(
                        hi_bc.value,
                        _boundary_coords(grid, axis, 1, width, k, tuple(pad_done_lo), tuple(pad_done_hi)), t)
                    g_hi = int_hi + g * (2 * k - 1) * grid.h
                slabs_lo.append(jnp.broadcast_to(g_lo, int_lo.shape).astype(field.dtype))
                slabs_hi.append(jnp.broadcast_to(g_hi, int_hi.shape).astype(field.dtype))
            out = jnp.concatenate(list(reversed(slabs_lo)) + [out] + slabs_hi, axis=axis)
        pad_done_lo[axis] = width
        pad_done_hi[axis] = width
    return out


def _apply_bc_nocorner(field: jnp.ndarray, grid: Grid, fbc: FieldBC,
                       width: int, homogeneous: bool, t: float):
    """Ghost padding without corner ghosts (see apply_bc docstring)."""
    dim = grid.dim
    n_ax = field.shape
    g = jnp.pad(field, [(width, width)] * dim)

    def place(gg, axis, pad_index, slab):
        """Write ``slab`` (thin slice broadcast along ``axis``) at padded
        position ``pad_index`` along ``axis``."""
        idx = jax.lax.broadcasted_iota(jnp.int32, gg.shape, axis)
        sl_shape = list(gg.shape)
        sl_shape[axis] = 1
        pads = [(width, width) if a != axis else (0, 0) for a in range(dim)]
        slab_p = jnp.pad(slab, pads, mode="edge")
        return jnp.where(idx == pad_index, slab_p, gg)

    for axis in range(dim):
        lo_bc, hi_bc = fbc.sides[axis]
        per = lo_bc.kind == PERIODIC or hi_bc.kind == PERIODIC
        for k in range(1, width + 1):
            if per:
                lo_slab = _take(field, axis, slice(n_ax[axis] - k,
                                                   n_ax[axis] - k + 1))
                hi_slab = _take(field, axis, slice(k - 1, k))
            else:
                int_lo = _take(field, axis, slice(k - 1, k))
                int_hi = _take(field, axis, slice(n_ax[axis] - k,
                                                 n_ax[axis] - k + 1))
                if lo_bc.kind == DIRICHLET:
                    b = 0.0 if homogeneous else _eval(
                        lo_bc.value,
                        _boundary_coords(grid, axis, 0, width, k,
                                         (0,) * dim, (0,) * dim), t)
                    lo_slab = 2.0 * b - int_lo
                elif lo_bc.kind == NAVIER:
                    lam = float(lo_bc.value)
                    lo_slab = (2.0 * lam - grid.h) / (2.0 * lam
                                                      + grid.h) * int_lo
                else:
                    gr = 0.0 if homogeneous or lo_bc.kind == CONTACT \
                        else _eval(
                        lo_bc.value,
                        _boundary_coords(grid, axis, 0, width, k,
                                         (0,) * dim, (0,) * dim), t)
                    lo_slab = int_lo - gr * (2 * k - 1) * grid.h
                if hi_bc.kind == DIRICHLET:
                    b = 0.0 if homogeneous else _eval(
                        hi_bc.value,
                        _boundary_coords(grid, axis, 1, width, k,
                                         (0,) * dim, (0,) * dim), t)
                    hi_slab = 2.0 * b - int_hi
                elif hi_bc.kind == NAVIER:
                    lam = float(hi_bc.value)
                    hi_slab = (2.0 * lam - grid.h) / (2.0 * lam
                                                      + grid.h) * int_hi
                else:
                    gr = 0.0 if homogeneous or hi_bc.kind == CONTACT \
                        else _eval(
                        hi_bc.value,
                        _boundary_coords(grid, axis, 1, width, k,
                                         (0,) * dim, (0,) * dim), t)
                    hi_slab = int_hi + gr * (2 * k - 1) * grid.h
            lo_slab = jnp.broadcast_to(
                lo_slab, tuple(1 if a == axis else s
                               for a, s in enumerate(field.shape))
            ).astype(field.dtype)
            hi_slab = jnp.broadcast_to(
                hi_slab, tuple(1 if a == axis else s
                               for a, s in enumerate(field.shape))
            ).astype(field.dtype)
            g = place(g, axis, width - k, lo_slab)
            g = place(g, axis, width + n_ax[axis] + k - 1, hi_slab)
    return g


def _take(a: jnp.ndarray, axis: int, sl: slice) -> jnp.ndarray:
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


def interior(a: jnp.ndarray, width: int) -> jnp.ndarray:
    """Strip ``width`` ghost layers from every axis."""
    sl = tuple(slice(width, s - width) for s in a.shape)
    return a[sl]


def apply_face_bc(f: jnp.ndarray, grid: Grid, fbc: FieldBC, axis: int,
                  homogeneous: bool = False, t: float = 0.0) -> jnp.ndarray:
    """Overwrite the two boundary slabs of a face-shaped array with the BC
    value of the variable (Dirichlet only; Neumann/periodic keep the
    computed one-sided/wrapped values).

    Reference: src/boundary.c bc-on-face variants applied by
    gfs_domain_face_bc (src/domain.c); used on advected face values and on
    the normal MAC velocity at boundary faces.
    """
    n = f.shape[axis]
    for side in (0, 1):
        bc = fbc.sides[axis][side]
        if bc.kind != DIRICHLET:
            continue
        if homogeneous:
            val = 0.0
        else:
            coords = []
            bnd = grid.boundary_coord(axis, side)
            for a in range(grid.dim):
                if a == axis:
                    coords.append(bnd)
                else:
                    c = grid.axis_centers(a)
                    shape = [1] * grid.dim
                    shape[a] = c.size
                    coords.append(c.reshape(shape))
            val = _eval(bc.value, tuple(coords), t)
        idx = [slice(None)] * f.ndim
        idx[axis] = slice(0, 1) if side == 0 else slice(n - 1, n)
        slab_shape = list(f.shape)
        slab_shape[axis] = 1
        f = f.at[tuple(idx)].set(jnp.broadcast_to(val, slab_shape).astype(f.dtype))
    return f
