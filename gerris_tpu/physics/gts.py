"""GTS triangulated-surface input for embedded solids.

TPU-native replacement for the reference's GTS surface machinery
(reference: src/surface.h:43-108 GfsSurface over GtsSurface;
tools/shapes.c emits these files; test/hexagon/hexagon.gts is the
canonical consumer via ``SolidMoving hexagon.gts { scale = ... }``).

Design: the triangulation is static per configuration, so all geometry
is precomputed host-side with vectorised numpy and exposed to the
solver as a level-set callable — positive inside the closed surface,
the same convention as the parser's implicit CSG shapes (gfs_config
negates for the fluid side).  In 2D the surface is sectioned by the
z = 0 plane into a closed polygon (the reference flattens cut cells the
same way, gfs_cell_is_cut(..., flatten=TRUE, src/surface.c:563-599));
in 3D the full triangle set is used with parity ray-casting.
"""
from __future__ import annotations

import numpy as np


def read_gts(path: str):
    """Parse a GTS file -> (verts (nv,3) float, faces (nf,3) int vertex
    indices).  Format (gts_surface_read): header ``nv ne nf [classes]``,
    nv vertex lines ``x y z``, ne edge lines ``v1 v2`` (1-based), nf
    face lines ``e1 e2 e3`` (1-based edges)."""
    with open(path) as f:
        toks = f.read().split("\n")
    head = toks[0].split()
    nv, ne, nf = int(head[0]), int(head[1]), int(head[2])
    verts = np.array([[float(x) for x in toks[1 + i].split()[:3]]
                      for i in range(nv)])
    edges = np.array([[int(x) for x in toks[1 + nv + i].split()[:2]]
                      for i in range(ne)]) - 1
    faces_e = np.array([[int(x) for x in toks[1 + nv + ne + i].split()[:3]]
                        for i in range(nf)]) - 1
    # face vertices from its edge triple, oriented e1 -> e2 -> e3
    # (gts_face_new: the shared vertex ordering fixes orientation)
    fv = np.empty((nf, 3), int)
    for k in range(nf):
        e1, e2, e3 = edges[faces_e[k]]
        # start with e1 oriented so its second vertex is shared with e2
        a, b = e1
        if b not in e2:
            a, b = b, a
        c = e2[0] if e2[1] == b else e2[1]
        fv[k] = (a, b, c)
    return verts, fv


def transform(verts: np.ndarray, scale=1.0, translate=(0.0, 0.0, 0.0),
              flip: bool = False):
    """The reference's surface transformation (vertices are mapped
    directly for GTS surfaces, gfs_surface_transformation
    src/surface.c): scaling about the origin then translation.  ``flip``
    reverses orientation (handled by the caller negating the section
    level set)."""
    v = np.asarray(verts, float) * float(scale) + np.asarray(translate,
                                                             float)
    return v


def section_z0(verts: np.ndarray, faces: np.ndarray):
    """Intersect the triangulation with the z = 0 plane -> segment array
    (ns, 2, 2).  Each triangle crossing the plane contributes the
    segment between its two edge crossings."""
    segs = {}
    scale = float(np.abs(verts).max()) or 1.0
    eps = 1e-9 * scale
    for (i, j, k) in faces:
        tri = verts[[i, j, k]]
        z = tri[:, 2]
        pts = []
        for a, b in ((0, 1), (1, 2), (2, 0)):
            za, zb = z[a], z[b]
            if (za > 0) != (zb > 0):
                s = za / (za - zb)
                pts.append(tri[a, :2] + s * (tri[b, :2] - tri[a, :2]))
            elif za == 0.0 and zb != 0.0:
                pts.append(tri[a, :2])
        if len(pts) < 2:
            continue
        p0, p1 = pts[0], pts[1]
        if np.hypot(*(p1 - p0)) < eps:
            continue   # vertex-only touch (mesh nodes exactly on z=0)
        # canonical key: adjacent triangles sharing an in-plane edge
        # yield the segment twice — duplicates flip the ray parity
        key = tuple(sorted((tuple(np.round(p0 / eps).astype(np.int64)),
                            tuple(np.round(p1 / eps).astype(np.int64)))))
        segs.setdefault(key, (p0, p1))
    if not segs:
        raise ValueError("surface does not intersect the z=0 plane")
    return np.asarray(list(segs.values()))


def polygon_phi(segs: np.ndarray):
    """Level-set callable from a closed segment soup: positive inside
    (even-odd ray parity), magnitude = distance to the nearest segment.
    Vectorised over grid arrays; geometry is baked in as constants."""
    import jax.numpy as jnp

    p0 = jnp.asarray(segs[:, 0])          # (ns, 2)
    p1 = jnp.asarray(segs[:, 1])
    d = p1 - p0
    # guards must survive float32 (1e-300 underflows to 0 -> nan)
    L2 = jnp.maximum((d * d).sum(-1), 1e-30)

    def phi(x, y, z=0.0, t=0.0):
        P = jnp.stack([jnp.asarray(x, float), jnp.asarray(y, float)],
                      axis=-1)[..., None, :]          # (..., 1, 2)
        w = P - p0                                     # (..., ns, 2)
        s = jnp.clip((w * d).sum(-1) / L2, 0.0, 1.0)
        prj = p0 + s[..., None] * d
        dist = jnp.sqrt(jnp.min(((P - prj) ** 2).sum(-1), axis=-1))
        # even-odd parity of upward-ray crossings
        x0, y0 = p0[:, 0], p0[:, 1]
        x1, y1 = p1[:, 0], p1[:, 1]
        xx = P[..., 0, 0][..., None]
        yy = P[..., 0, 1][..., None]
        straddle = (x0 <= xx) != (x1 <= xx)
        dx = x1 - x0
        ycross = y0 + (xx - x0) / jnp.where(dx == 0.0, 1e-30, dx) * (y1 - y0)
        inside = jnp.sum(straddle & (ycross > yy), axis=-1) % 2 == 1
        return jnp.where(inside, dist, -dist)

    return phi


def polyhedron_phi(verts: np.ndarray, faces: np.ndarray):
    """3D level set from the closed triangulation: positive inside
    (+z-ray parity), magnitude = distance to the nearest triangle."""
    import jax.numpy as jnp

    A = jnp.asarray(verts[faces[:, 0]])
    B = jnp.asarray(verts[faces[:, 1]])
    C = jnp.asarray(verts[faces[:, 2]])

    def phi(x, y, z=0.0, t=0.0):
        P = jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, float),
                                           jnp.asarray(y, float),
                                           jnp.asarray(z, float) +
                                           0.0 * jnp.asarray(x, float)),
                      axis=-1)[..., None, :]           # (..., 1, 3)
        # distance to triangles: project on plane, clamp to edges
        ab, ac, ap = B - A, C - A, P - A
        n = jnp.cross(ab, ac)
        nn = jnp.maximum((n * n).sum(-1), 1e-30)
        # barycentric of the plane projection
        dU = jnp.cross(ap, ac[None, ...] if ap.ndim > 2 else ac)
        u = (dU * n).sum(-1) / nn
        dV = jnp.cross(ab[None, ...] if ap.ndim > 2 else ab, ap)
        v = (dV * n).sum(-1) / nn
        w = 1.0 - u - v
        inside_tri = (u >= 0) & (v >= 0) & (w >= 0)
        plane_d = jnp.abs((ap * n).sum(-1)) / jnp.sqrt(nn)

        def seg_d(Q0, E):
            qp = P - Q0
            ee = jnp.maximum((E * E).sum(-1), 1e-30)
            s = jnp.clip((qp * E).sum(-1) / ee, 0.0, 1.0)
            r = qp - s[..., None] * E
            return jnp.sqrt((r * r).sum(-1))

        edge_d = jnp.minimum(seg_d(A, ab),
                             jnp.minimum(seg_d(A, ac), seg_d(B, C - B)))
        tri_d = jnp.where(inside_tri, plane_d, edge_d)
        dist = jnp.min(tri_d, axis=-1)
        # +z ray parity: 2D point-in-triangle test of (x, y) against the
        # triangle's xy projection, counting crossings above z.  The ray
        # origin is jittered by irrational offsets so it never passes
        # exactly through a mesh vertex or edge (grid points routinely
        # align with the geometry; an exact hit double-counts and flips
        # the parity) — the distance above stays exact.
        scale = jnp.max(jnp.abs(jnp.stack([A, B, C])))
        jx = 1.23456789e-6 * scale
        jy = 2.02468135e-6 * scale
        px = P[..., 0, 0][..., None] + jx
        py = P[..., 0, 1][..., None] + jy
        x1, y1 = A[:, 0], A[:, 1]
        x2, y2 = B[:, 0], B[:, 1]
        x3, y3 = C[:, 0], C[:, 1]
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        # vertical walls project to ~zero xy-area: they contribute no
        # z-ray crossing and must be excluded, not divided through
        ok = jnp.abs(det) > 1e-20
        dsafe = jnp.where(ok, det, 1.0)
        l1 = ((y2 - y3) * (px - x3) + (x3 - x2) * (py - y3)) / dsafe
        l2 = ((y3 - y1) * (px - x3) + (x1 - x3) * (py - y3)) / dsafe
        l3 = 1.0 - l1 - l2
        in_xy = ok & (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        zc = l1 * A[:, 2] + l2 * B[:, 2] + l3 * C[:, 2]
        above = zc > P[..., 0, 2][..., None]
        inside = jnp.sum(in_xy & above, axis=-1) % 2 == 1
        return jnp.where(inside, dist, -dist)

    return phi


def surface_phi(path: str, dim: int = 2, scale=1.0,
                translate=(0.0, 0.0, 0.0), flip: bool = False):
    """Load a .gts file into a level-set callable for ``Solid`` /
    ``SolidMoving`` (positive inside; gfs_config negates for the fluid
    side, matching the implicit-shape convention)."""
    verts, faces = read_gts(path)
    verts = transform(verts, scale=scale, translate=translate)
    if dim == 2:
        fn = polygon_phi(section_z0(verts, faces))
    else:
        fn = polyhedron_phi(verts, faces)
    if flip:
        return lambda x, y, z=0.0, t=0.0, f=fn: -f(x, y, z, t)
    return fn
