"""Orthogonal metrics / coordinate mappings.

TPU-native rebuild of the reference's metric layer (reference:
src/metric.c, 2,440 LoC — GfsMetricStretch, GfsMetricLonLat,
GfsMetricCubed (gnomonic cubed-sphere panels), wired through the domain
metric hooks src/domain.h:94-110: every operator consumes one per-cell
area factor ``cm`` and per-face length factors ``fm``).

Here a metric is an object producing (cm, (fmx, fmy)) dense arrays for a
grid; models/ns._weights multiplies them into the same face-coefficient
machinery as solid fractions (exactly the reference's composition:
gfs_poisson_coefficients takes both, src/poisson.c:756-901).  The
axisymmetric metric (GfsAxi) lives in models/ns._axi_metric and predates
this module; MetricLonLat/MetricStretch/MetricCubed compose the same
way via NSConfig.metric.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid


@dataclasses.dataclass(frozen=True)
class MetricStretch:
    """Constant anisotropic stretching: physical dx = sx h, dy = sy h
    (reference: GfsMetricStretch, src/metric.c; test/lake uses sy=0.1).
    cm = sx sy; the Poisson face weight is (face length)/(normal scale)
    (poisson_coeff src/poisson.c:772: face_metric/face_scale_metric):
    x-faces sy/sx, y-faces sx/sy."""
    sx: float = 1.0
    sy: float = 1.0

    def weights(self, grid: Grid):
        cm = jnp.full(grid.shape, self.sx * self.sy)
        fmx = jnp.full(grid.face_shape(0), self.sy / self.sx)
        fmy = jnp.full(grid.face_shape(1), self.sx / self.sy)
        return cm, (fmx, fmy)


@dataclasses.dataclass(frozen=True)
class MetricLonLat:
    """Longitude-latitude spherical metric: x = lon, y = lat, in domain
    units scaled by ``scale`` to radians.  cm = cos(lat); face weights
    (length/normal-scale, src/poisson.c:772 with lon_lat_face_metric /
    lon_lat_scale_metric, src/metric.c): lon-faces 1/cos(lat), lat-faces
    cos(lat_face).  Reference: GfsMetricLonLat."""
    scale: float = math.pi          # domain [-0.5, 0.5] -> +-pi/2 lat

    def weights(self, grid: Grid):
        lat_c = jnp.asarray(grid.axis_centers(1)) * self.scale
        lat_f = jnp.asarray(grid.axis_faces(1)) * self.scale
        cm = jnp.broadcast_to(jnp.cos(lat_c)[None, :], grid.shape)
        fmx = jnp.broadcast_to(1.0 / jnp.cos(lat_c)[None, :],
                               grid.face_shape(0))
        fmy = jnp.broadcast_to(jnp.cos(lat_f)[None, :],
                               grid.face_shape(1))
        return cm, (fmx, fmy)


@dataclasses.dataclass(frozen=True)
class MetricCubed:
    """One gnomonic cubed-sphere panel: [-0.5, 0.5]^2 -> a sphere sixth
    via X = tan(a x), Y = tan(a y), a = pi/2.  Discrete factors like the
    reference (GfsMetricCubed, src/metric.c computes them from the
    projected cell geometry): cm = spherical quad area / h^2, face
    weight = (face arc length)/(arc between the adjacent cell centres).
    Full six-panel topology needs the rotated box graph; per-panel
    metric here."""
    a: float = math.pi / 2.0

    def _project(self, x, y):
        X = jnp.tan(self.a * x)
        Y = jnp.tan(self.a * y)
        rho = jnp.sqrt(1.0 + X * X + Y * Y)
        return jnp.stack([1.0 / rho, X / rho, Y / rho], -1)

    @staticmethod
    def _arc(p, q):
        cross = jnp.cross(p, q)
        s = jnp.sqrt(jnp.sum(cross * cross, -1))
        c = jnp.sum(p * q, -1)
        return jnp.arctan2(s, c)

    def weights(self, grid: Grid):
        h = grid.h
        xf = jnp.asarray(grid.axis_faces(0))
        yf = jnp.asarray(grid.axis_faces(1))
        Xf, Yf = jnp.meshgrid(xf, yf, indexing="ij")
        corners = self._project(Xf, Yf)            # (nx+1, ny+1, 3)
        xc = jnp.asarray(grid.axis_centers(0))
        yc = jnp.asarray(grid.axis_centers(1))
        Xc, Yc = jnp.meshgrid(xc, yc, indexing="ij")
        centers = self._project(Xc, Yc)            # (nx, ny, 3)

        # cell area from the spherical excess of the two triangles
        def tri_area(p, q, r):
            num = jnp.abs(jnp.sum(p * jnp.cross(q, r), -1))
            den = (1.0 + jnp.sum(p * q, -1) + jnp.sum(q * r, -1)
                   + jnp.sum(r * p, -1))
            return 2.0 * jnp.arctan2(num, den)

        p00 = corners[:-1, :-1]
        p10 = corners[1:, :-1]
        p11 = corners[1:, 1:]
        p01 = corners[:-1, 1:]
        area = tri_area(p00, p10, p11) + tri_area(p00, p11, p01)
        cm = area / (h * h)

        # x-faces: arc between (i, j) and (i, j+1) corners over the arc
        # between the two adjacent cell centres (edge-extended at the
        # panel boundary)
        arc_fx = self._arc(corners[:, :-1], corners[:, 1:])
        cdist_x = self._arc(centers[:-1, :], centers[1:, :])
        cdist_x = jnp.concatenate(
            [cdist_x[:1], cdist_x, cdist_x[-1:]], 0)
        fmx = arc_fx / cdist_x
        arc_fy = self._arc(corners[:-1, :], corners[1:, :])
        cdist_y = self._arc(centers[:, :-1], centers[:, 1:])
        cdist_y = jnp.concatenate(
            [cdist_y[:, :1], cdist_y, cdist_y[:, -1:]], 1)
        fmy = arc_fy / cdist_y
        return cm, (fmx, fmy)


@dataclasses.dataclass(frozen=True)
class MapTransform:
    """Coordinate translation + rotation applied to positions before
    evaluating user functions/solids (reference: GfsMapTransform,
    src/map.c:   translate + rotate)."""
    tx: float = 0.0
    ty: float = 0.0
    angle: float = 0.0              # degrees, about z

    def forward(self, x, y):
        a = math.radians(self.angle)
        ca, sa = math.cos(a), math.sin(a)
        return ca * x - sa * y + self.tx, sa * x + ca * y + self.ty

    def inverse(self, x, y):
        a = math.radians(self.angle)
        ca, sa = math.cos(a), math.sin(a)
        xr, yr = x - self.tx, y - self.ty
        return ca * xr + sa * yr, -sa * xr + ca * yr


@dataclasses.dataclass(frozen=True)
class MapProjection:
    """Cartographic projection between (lon, lat) degrees and model
    (x, y) — the proj4 module's common cases (reference: modules/map.c,
    GfsMapProjection): 'mercator' or 'lonlat' (plate carree), scaled by
    ``L`` model units per radian."""
    kind: str = "lonlat"
    L: float = 1.0
    lon0: float = 0.0

    def forward(self, lon, lat):
        lam = jnp.radians(lon - self.lon0)
        phi = jnp.radians(lat)
        if self.kind == "mercator":
            return self.L * lam, self.L * jnp.log(
                jnp.tan(math.pi / 4.0 + phi / 2.0))
        return self.L * lam, self.L * phi

    def inverse(self, x, y):
        lam = x / self.L
        if self.kind == "mercator":
            phi = 2.0 * jnp.arctan(jnp.exp(y / self.L)) - math.pi / 2.0
        else:
            phi = y / self.L
        return jnp.degrees(lam) + self.lon0, jnp.degrees(phi)
