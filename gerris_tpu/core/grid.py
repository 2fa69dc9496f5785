"""Uniform structured grid descriptor.

TPU-native replacement for the reference's fully-threaded tree geometry
(reference: src/ftt.h:88-160).  Instead of a pointer-linked quad/octree we
describe dense, level-indexed Cartesian arrays: a ``Grid`` is the uniform
grid at refinement ``level`` (N = 2**level cells per axis), covering the same
default unit box centred at the origin as a single GfsBox
(reference: src/ftt.c ftt_cell_new root cell, box size 1, centre (0,0)).

Static (hashable) so it can be a jit static argument; all array-producing
methods return jnp arrays.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A uniform grid over a box of ``extents`` unit boxes per axis.

    The default is the single unit box centred at the origin (one GfsBox);
    ``extents=(1, 3)`` is e.g. a 1x3 stack of boxes (the reference builds
    such domains as box graphs, test/capwave/capwave.gfs:59 '3 5 ...').
    Cell size h = size / 2**level is isotropic; axis ``a`` has
    2**level * extents[a] cells.

    dim: 2 or 3 (the reference compiles the same source as gerris2D/gerris3D,
    src/ftt.h:34-38; here the dimension is a runtime descriptor field).
    """

    level: int
    dim: int = 2
    origin: tuple = (-0.5, -0.5)   # lower corner of the box
    size: float = 1.0              # edge length of one unit box
    extents: tuple = None          # unit boxes per axis (default all 1)

    def __post_init__(self):
        if self.dim not in (2, 3):
            raise ValueError("dim must be 2 or 3")
        if len(self.origin) != self.dim:
            object.__setattr__(self, "origin", tuple(self.origin[: self.dim])
                               if len(self.origin) > self.dim
                               else tuple(self.origin) + (-0.5,) * (self.dim - len(self.origin)))
        if self.extents is None:
            object.__setattr__(self, "extents", (1,) * self.dim)

    @property
    def n(self) -> int:
        """Cells per unit box edge."""
        return 1 << self.level

    @property
    def h(self) -> float:
        return self.size / self.n

    @property
    def shape(self) -> tuple:
        return tuple(self.n * self.extents[a] for a in range(self.dim))

    def length(self, axis: int) -> float:
        return self.size * self.extents[axis]

    @property
    def cell_volume(self) -> float:
        return self.h ** self.dim

    def coarser(self) -> "Grid":
        return dataclasses.replace(self, level=self.level - 1)

    def finer(self) -> "Grid":
        return dataclasses.replace(self, level=self.level + 1)

    # -- coordinates ---------------------------------------------------------
    # numpy (host) arrays: coordinates are static geometry, safe to build
    # inside jit traces (they become constants, never tracers)
    def axis_centers(self, axis: int) -> np.ndarray:
        """Cell-centre coordinates along one axis."""
        i = np.arange(self.shape[axis])
        return self.origin[axis] + (i + 0.5) * self.h

    def axis_faces(self, axis: int) -> np.ndarray:
        """Face coordinates along one axis (n+1 values)."""
        i = np.arange(self.shape[axis] + 1)
        return self.origin[axis] + i * self.h

    @cached_property
    def centers(self) -> tuple:
        """Meshgrid of cell-centre coordinates, indexing='ij'.

        Axis 0 is x, axis 1 is y (axis 2 is z in 3D) — matching the
        reference's FttVector component order (src/ftt.h:44-52).
        """
        axes = [np.asarray(self.axis_centers(a)) for a in range(self.dim)]
        # constants even when first touched inside a jit trace (the cache
        # must never hold tracers — e.g. the moving-solid re-cut path)
        import jax
        with jax.ensure_compile_time_eval():
            return tuple(jnp.asarray(c)
                         for c in np.meshgrid(*axes, indexing="ij"))

    def face_centers(self, axis: int) -> tuple:
        """Meshgrid of face-centre coordinates for faces normal to ``axis``.

        Shape along ``axis`` is n+1, the others n.
        """
        axes = [
            np.asarray(self.axis_faces(a) if a == axis else self.axis_centers(a))
            for a in range(self.dim)
        ]
        return tuple(jnp.asarray(c) for c in np.meshgrid(*axes, indexing="ij"))

    def face_shape(self, axis: int) -> tuple:
        s = list(self.shape)
        s[axis] += 1
        return tuple(s)

    def boundary_coord(self, axis: int, side: int) -> float:
        """Physical coordinate of the domain boundary plane."""
        return self.origin[axis] + (self.length(axis) if side == 1 else 0.0)
