"""General box graph with rotated connections (GfsGEdge rotate).

Reference: boxes are nodes of a weighted graph (GfsDomain extends
GtsWGraph, src/boundary.h:290-327); an edge ``GfsGEdge b1 b2 d rotate``
connects side ``d`` of box b1 to side ``rotate`` of box b2
(gfs_gedge_link_boxes, src/boundary.c:1704-1753: a rotated-periodic
boundary pair with orientations +1/-1) — the topology that makes the
six-panel cubed sphere (and any non-grid box layout) possible.

TPU-native form: every box is its own (n, n) array; ghost exchange is a
static per-edge gather — source strip, tangential reversal flag — baked
at trace time (pure slicing/flips, no data-dependent control flow), so
the whole multi-box solve jits into one program.  Linear box stacks
keep the faster embedded single-array path (core/grid.py extents);
this module handles the general graph.

Sides follow the FttDirection order: 0=right(+x) 1=left(-x) 2=top(+y)
3=bottom(-y) (src/ftt.h:52-59).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RIGHT, LEFT, TOP, BOTTOM = 0, 1, 2, 3
_AXIS = {RIGHT: 0, LEFT: 0, TOP: 1, BOTTOM: 1}
_SIDE = {RIGHT: 1, LEFT: 0, TOP: 1, BOTTOM: 0}
OPPOSITE = {RIGHT: LEFT, LEFT: RIGHT, TOP: BOTTOM, BOTTOM: TOP}


@dataclasses.dataclass(frozen=True)
class Edge:
    """One directed connection: ghosts of ``b1`` at side ``d1`` read the
    interior strip of ``b2`` adjacent to side ``d2``; ``rev`` reverses
    the tangential order (the discrete form of the reference's rotated
    buffer traversal, boundary.c match/send/receive)."""
    b1: int
    d1: int
    b2: int
    d2: int
    rev: bool = False


def link(edges: List[Tuple]) -> Tuple[Edge, ...]:
    """Expand user edges (b1, d1, b2, d2[, rev]) with their reciprocal
    partners (gfs_gedge_link_boxes creates both boundary objects)."""
    out = []
    for e in edges:
        b1, d1, b2, d2, *r = e
        rev = bool(r[0]) if r else False
        out.append(Edge(b1, d1, b2, d2, rev))
        out.append(Edge(b2, d2, b1, d1, rev))
    # deduplicate (keep first occurrence of each (b1, d1))
    seen = {}
    for e in out:
        seen.setdefault((e.b1, e.d1), e)
    return tuple(seen.values())


def _interior_strip(f: jnp.ndarray, d: int) -> jnp.ndarray:
    """Interior row/column adjacent to side ``d`` (1D, tangential
    order = increasing index)."""
    if d == RIGHT:
        return f[-1, :]
    if d == LEFT:
        return f[0, :]
    if d == TOP:
        return f[:, -1]
    return f[:, 0]


def fill_ghosts(fields: List[jnp.ndarray], edges: Tuple[Edge, ...],
                default: str = "neumann") -> List[jnp.ndarray]:
    """Pad every box with one ghost layer: connected sides copy the
    neighbor's interior strip (with reversal), unconnected sides mirror
    (symmetry) — gfs_domain_bc over the box graph.  Corner ghosts stay
    zero: every consumer here is a 5-point stencil that never reads
    them (extend before adding 9-point consumers)."""
    emap = {(e.b1, e.d1): e for e in edges}
    out = []
    for b, f in enumerate(fields):
        n0, n1 = f.shape
        g = jnp.zeros((n0 + 2, n1 + 2), f.dtype)
        g = g.at[1:-1, 1:-1].set(f)
        for d in (LEFT, RIGHT, BOTTOM, TOP):
            e = emap.get((b, d))
            if e is None:
                strip = _interior_strip(f, d)       # mirror
            else:
                strip = _interior_strip(fields[e.b2], e.d2)
                if e.rev:
                    strip = strip[::-1]
            if d == LEFT:
                g = g.at[0, 1:-1].set(strip)
            elif d == RIGHT:
                g = g.at[-1, 1:-1].set(strip)
            elif d == BOTTOM:
                g = g.at[1:-1, 0].set(strip)
            else:
                g = g.at[1:-1, -1].set(strip)
        out.append(g)
    return out


def laplacian(fields: List[jnp.ndarray], edges: Tuple[Edge, ...],
              h: float, cm: Optional[list] = None,
              fm: Optional[list] = None) -> List[jnp.ndarray]:
    """Metric-weighted 5-point Laplacian over the box graph:
    (1/(cm h^2)) sum_faces fm (u_nb - u) — the face-coefficient operator
    of gfs_poisson_coefficients (src/poisson.c:756-901) with the metric
    factors of src/metric.c.  ``fm[b] = (fmx (n+1, n), fmy (n, n+1))``."""
    padded = fill_ghosts(fields, edges)
    out = []
    for b, g in enumerate(padded):
        flux_x = g[1:, 1:-1] - g[:-1, 1:-1]      # (n+1, n) face diffs
        flux_y = g[1:-1, 1:] - g[1:-1, :-1]      # (n, n+1)
        if fm is not None:
            flux_x = jnp.asarray(fm[b][0]) * flux_x
            flux_y = jnp.asarray(fm[b][1]) * flux_y
        lap = (flux_x[1:, :] - flux_x[:-1, :]
               + flux_y[:, 1:] - flux_y[:, :-1])
        area = (jnp.asarray(cm[b]) if cm is not None else 1.0) * h * h
        out.append(lap / area)
    return out


def solve_cg(rhs: List[jnp.ndarray], edges: Tuple[Edge, ...], h: float,
             cm: Optional[list] = None, fm: Optional[list] = None,
             tol: float = 1e-10, maxiter: int = 2000,
             demean: bool = True):
    """Matrix-free CG for -lap(u) = -rhs on a closed box graph (pure
    rotated-periodic topology: solution defined up to a constant —
    demean like the reference's compatibility projection).  Weighted
    inner products use the metric cell areas so the operator is
    symmetric (the reference's stencil symmetry, poisson.c relax)."""
    w = [jnp.asarray(cm[b]) * h * h if cm is not None
         else jnp.full(rhs[b].shape, h * h) for b in range(len(rhs))]

    def dot(a, b):
        return sum(jnp.sum(w[i] * a[i] * b[i]) for i in range(len(a)))

    def demean_f(fs):
        if not demean:
            return fs
        tot = sum(jnp.sum(w[i] * fs[i]) for i in range(len(fs)))
        area = sum(jnp.sum(w[i]) for i in range(len(fs)))
        m = tot / area
        return [f - m for f in fs]

    def A(u):
        return [-l for l in laplacian(u, edges, h, cm, fm)]

    b = demean_f([-r for r in rhs])
    x = [jnp.zeros_like(r) for r in rhs]
    r = b
    p = list(r)
    rs = dot(r, r)

    def body(state):
        x, r, p, rs, it = state
        Ap = A(p)
        alpha = rs / dot(p, Ap)
        x = [x[i] + alpha * p[i] for i in range(len(x))]
        r = [r[i] - alpha * Ap[i] for i in range(len(r))]
        rs_new = dot(r, r)
        p = [r[i] + (rs_new / rs) * p[i] for i in range(len(p))]
        return x, r, p, rs_new, it + 1

    def cond(state):
        _, _, _, rs, it = state
        return (rs > tol * tol) & (it < maxiter)

    x, r, p, rs, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0)))
    return demean_f(x), {"niter": it, "rnorm": jnp.sqrt(rs)}


_DIR = {"right": RIGHT, "left": LEFT, "top": TOP, "bottom": BOTTOM}


def edges_from_gfs(box_edges) -> Tuple[Edge, ...]:
    """Convert parsed .gfs connections [(b1, b2, d, rotate|None)]
    (1-based ids, ParsedSim.box_edges) into linked Edge tuples.  The
    reference encodes tangential orientation implicitly in its boundary
    traversal order; here reversals must be set from geometry
    (cubed_sphere() derives them for the sphere) — plain .gfs edges map
    with rev=False."""
    raw = []
    for b1, b2, d, rot in box_edges:
        if b1 == b2:
            continue                               # periodicity, not graph
        d1 = _DIR[d]
        d2 = _DIR[rot] if rot else OPPOSITE[d1]
        raw.append((b1 - 1, d1, b2 - 1, d2, False))
    return link(raw)


# ---------------------------------------------------------------------------
# cubed sphere: the six-panel rotated topology
# ---------------------------------------------------------------------------

# panel frames: point = R @ [1, X, Y] normalized, X = tan(a x), Y = tan(a y)
def _panel_frames():
    e = np.eye(3)
    frames = []
    # (normal, x-tangent, y-tangent) for panels 0..5
    specs = [(+e[0], +e[1], +e[2]),   # 0: +x
             (+e[1], -e[0], +e[2]),   # 1: +y
             (-e[0], -e[1], +e[2]),   # 2: -x
             (-e[1], +e[0], +e[2]),   # 3: -y
             (+e[2], +e[1], -e[0]),   # 4: +z (north)
             (-e[2], +e[1], +e[0])]   # 5: -z (south)
    for n, tx, ty in specs:
        frames.append(np.stack([n, tx, ty], axis=1))   # columns
    return frames


def cubed_centers(n: int, panel: int, a: float = math.pi / 2.0):
    """3D unit-sphere positions of panel cell centers (equiangular
    gnomonic, MetricCubed's mapping)."""
    R = _panel_frames()[panel]
    h = 1.0 / n
    c = -0.5 + (np.arange(n) + 0.5) * h
    X, Y = np.meshgrid(np.tan(a * c), np.tan(a * c), indexing="ij")
    v = np.stack([np.ones_like(X), X, Y], -1)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return v @ R.T


def edge_face_centers(n: int, panel: int, d: int,
                      a: float = math.pi / 2.0):
    """Positions of the boundary FACE centres of side ``d`` — points on
    the shared cube edge (boundary coordinate exactly +-0.5, tangential
    cell centres).  Unlike ghost-cell centres (the equiangular
    tangential coordinate compresses across the edge), these coincide
    exactly between adjacent panels — they define the topology match,
    just as the reference matches boundary ghost trees cell-by-cell
    along box faces (gfs_domain_match, src/domain.c:1257-1291)."""
    R = _panel_frames()[panel]
    h = 1.0 / n
    t = -0.5 + (np.arange(n) + 0.5) * h
    if d == RIGHT:
        x = np.full(n, 0.5); y = t
    elif d == LEFT:
        x = np.full(n, -0.5); y = t
    elif d == TOP:
        x = t; y = np.full(n, 0.5)
    else:
        x = t; y = np.full(n, -0.5)
    v = np.stack([np.ones_like(x), np.tan(a * x), np.tan(a * y)], -1)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return v @ R.T


def cubed_sphere(n: int):
    """Six-panel cubed-sphere topology: the 12 edges (with rotations and
    reversals) are DERIVED from the gnomonic geometry — two panel sides
    are joined iff their boundary face centres coincide along the shared
    cube edge (matching orientation sets the reversal flag).  Ghost
    cells are then index-matched copies of the neighbor's interior
    strip, exactly the reference's rotated-periodic boundary
    (gfs_gedge_link_boxes rotate, src/boundary.c:1718-1724).  Returns
    (edges, centers) with centers[panel] of shape (n, n, 3)."""
    centers = [cubed_centers(n, p) for p in range(6)]
    edges = []
    seen = set()
    for p in range(6):
        for d in (RIGHT, LEFT, TOP, BOTTOM):
            if (p, d) in seen:
                continue
            g = edge_face_centers(n, p, d)
            best = None
            for q in range(6):
                if q == p:
                    continue
                for d2 in (RIGHT, LEFT, TOP, BOTTOM):
                    if (q, d2) in seen:
                        continue
                    s = edge_face_centers(n, q, d2)
                    if np.allclose(g, s, atol=1e-12):
                        best = (q, d2, False)
                        break
                    if np.allclose(g, s[::-1], atol=1e-12):
                        best = (q, d2, True)
                        break
                if best:
                    break
            assert best is not None, (p, d)
            q, d2, rev = best
            edges.append((p, d, q, d2, rev))
            seen.add((p, d))
            seen.add((q, d2))
    assert len(edges) == 12
    return link(edges), centers


def cubed_metric_weights(n: int):
    """Per-panel MetricCubed weights (identical on all panels by
    symmetry): cm (n, n), (fmx (n+1, n), fmy (n, n+1)).

    MetricCubed extends the centre-to-centre arc at panel boundaries by
    copying the last interior distance (fine for a standalone panel);
    on the full six-panel sphere the neighbor centre is the CONTINUED
    equiangular point, so the boundary face weights are recomputed here
    with the true cross-edge arc (the property cubed_sphere() asserts)."""
    from .grid import Grid
    from .metric import MetricCubed
    g = Grid(level=int(round(math.log2(n))), dim=2)
    assert g.n == n, "n must be a power of two"
    m = MetricCubed()
    cm, (fmx, fmy) = m.weights(g)
    a = m.a
    h = 1.0 / n

    def proj(x, y):
        v = np.stack([np.ones_like(x), np.tan(a * x), np.tan(a * y)], -1)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def arc(p, q):
        return np.arctan2(np.linalg.norm(np.cross(p, q), axis=-1),
                          np.sum(p * q, -1))

    t = -0.5 + (np.arange(n) + 0.5) * h
    yf = np.asarray(g.axis_faces(1))
    xf = np.asarray(g.axis_faces(0))
    # true cross-edge centre distance: between the last interior centre
    # [1, T1, tau] and its INDEX-MATCHED neighbor cell [T1, 1, tau]
    # (adjacent panel frame; same for every edge by cube symmetry, and
    # symmetric under tangential reversal)
    T1 = np.tan(a * (0.5 - h / 2.0))
    tau = np.tan(a * t)
    A = np.stack([np.ones_like(tau), np.full_like(tau, T1), tau], -1)
    B = np.stack([np.full_like(tau, T1), np.ones_like(tau), tau], -1)
    A = A / np.linalg.norm(A, axis=-1, keepdims=True)
    B = B / np.linalg.norm(B, axis=-1, keepdims=True)
    dist = arc(A, B)
    arc_fx_hi = arc(proj(np.full(n, 0.5), yf[:-1]),
                    proj(np.full(n, 0.5), yf[1:]))
    fmx = jnp.asarray(fmx).at[-1, :].set(arc_fx_hi / dist)
    fmx = fmx.at[0, :].set(arc_fx_hi / dist)       # mirror symmetry
    arc_fy_hi = arc(proj(xf[:-1], np.full(n, 0.5)),
                    proj(xf[1:], np.full(n, 0.5)))
    fmy = jnp.asarray(fmy).at[:, -1].set(arc_fy_hi / dist)
    fmy = fmy.at[:, 0].set(arc_fy_hi / dist)
    return cm, (fmx, fmy)


# ---------------------------------------------------------------------------
# flux-form transport on the box graph (the metric's production use:
# the reference runs flux-form hyperbolic systems on the cubed sphere —
# test/lonlat/cubed drives GfsRiver on this exact 12-edge topology)
# ---------------------------------------------------------------------------

def cubed_corner_points(n: int, panel: int, a: float = math.pi / 2.0):
    """3D positions of panel cell corners, (n+1, n+1, 3)."""
    R = _panel_frames()[panel]
    f = np.linspace(-0.5, 0.5, n + 1)
    X, Y = np.meshgrid(np.tan(a * f), np.tan(a * f), indexing="ij")
    v = np.stack([np.ones_like(X), X, Y], -1)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return v @ R.T


def streamfunction_face_fluxes(n: int, psi):
    """EXACT discretely-divergence-free face volume fluxes from a
    stream function on the sphere: the flux through a face equals the
    difference of psi at its endpoints (so the discrete divergence
    telescopes to zero in every cell — the property the reference's
    well-balanced flux-form schemes rely on).  ``psi(points3d)`` maps
    (..., 3) unit vectors to stream-function values.  Returns per-panel
    (Fx (n+1, n), Fy (n, n+1)) with outward-positive orientation along
    +x/+y."""
    out = []
    for p in range(6):
        c = cubed_corner_points(n, p)
        s = psi(c)                                   # (n+1, n+1)
        # flux across an x-face (normal +x): psi(y_hi) - psi(y_lo)
        Fx = s[:, 1:] - s[:, :-1]                    # (n+1, n)
        # flux across a y-face (normal +y): -(psi(x_hi) - psi(x_lo))
        Fy = -(s[1:, :] - s[:-1, :])                 # (n, n+1)
        out.append((jnp.asarray(Fx), jnp.asarray(Fy)))
    return out


def _interior_strip2(f: jnp.ndarray, d: int) -> jnp.ndarray:
    """The TWO interior rows/columns adjacent to side ``d``, shaped
    (2, n) with row 0 = the strip nearest the boundary (matching the
    first ghost layer) and row 1 = one cell deeper."""
    if d == RIGHT:
        return jnp.stack([f[-1, :], f[-2, :]])
    if d == LEFT:
        return jnp.stack([f[0, :], f[1, :]])
    if d == TOP:
        return jnp.stack([f[:, -1], f[:, -2]])
    return jnp.stack([f[:, 0], f[:, 1]])


def fill_ghosts2(fields: List[jnp.ndarray],
                 edges: Tuple[Edge, ...]) -> List[jnp.ndarray]:
    """Two-deep ghost exchange: pad every box with TWO ghost layers
    (the stencil width the slope-reconstructing advection needs — the
    upwind cell of a panel-boundary face can be a ghost cell, and its
    normal slope reads one cell beyond it).  Connected sides copy the
    neighbor's two interior strips (with tangential reversal),
    unconnected sides mirror.  Corner blocks stay zero: the scheme
    only ever reads normal-direction neighbors of first-layer ghosts,
    never diagonal corners."""
    emap = {(e.b1, e.d1): e for e in edges}
    out = []
    for b, f in enumerate(fields):
        n0, n1 = f.shape
        g = jnp.zeros((n0 + 4, n1 + 4), f.dtype)
        g = g.at[2:-2, 2:-2].set(f)
        for d in (LEFT, RIGHT, BOTTOM, TOP):
            e = emap.get((b, d))
            if e is None:
                strip = _interior_strip2(f, d)       # mirror
            else:
                strip = _interior_strip2(fields[e.b2], e.d2)
                if e.rev:
                    strip = strip[:, ::-1]
            if d == LEFT:
                g = g.at[1, 2:-2].set(strip[0])
                g = g.at[0, 2:-2].set(strip[1])
            elif d == RIGHT:
                g = g.at[-2, 2:-2].set(strip[0])
                g = g.at[-1, 2:-2].set(strip[1])
            elif d == BOTTOM:
                g = g.at[2:-2, 1].set(strip[0])
                g = g.at[2:-2, 0].set(strip[1])
            else:
                g = g.at[2:-2, -2].set(strip[0])
                g = g.at[2:-2, -1].set(strip[1])
        out.append(g)
    return out


def _slope(gm, gc, gp, limiter: str):
    """Per-cell normal slope from the three-cell stencil (index space).
    ``centered`` is the reference's default unlimited gfs_center_gradient
    (src/graphic.c advection defaults; test/cosine uses it); minmod /
    vanleer for monotone transport."""
    if limiter == "centered":
        return 0.5 * (gp - gm)
    dl = gc - gm
    dr = gp - gc
    if limiter == "minmod":
        s = jnp.sign(dl)
        return s * jnp.maximum(0.0, jnp.minimum(jnp.abs(dl), s * dr))
    if limiter == "vanleer":
        prod = dl * dr
        return jnp.where(prod > 0.0, 2.0 * prod / (dl + dr + 1e-300), 0.0)
    raise ValueError(limiter)


def flux_divergence_muscl(fields, edges, fluxes, cm, h,
                          limiter: str = "centered"):
    """dc/dt = -div(F c)/(cm h^2) with SECOND-ORDER face values:
    c_face = c_up + slope_up / 2 (slope limited per ``limiter``).  The
    flux-form counterpart of the reference's tracer advection on
    MetricCubed (test/cosine: VariableTracer { gradient =
    gfs_center_gradient }, advection.c gfs_face_advection_flux).

    Cross-edge faces stay exactly conservative: the upwind cell is the
    same physical cell seen from both panels and its two-deep ghost
    copy reproduces the identical reconstruction, so the shared-face
    value (and the equal-and-opposite stream-function flux) agree."""
    padded = fill_ghosts2(fields, edges)
    out = []
    for b, g in enumerate(padded):
        Fx, Fy = fluxes[b]
        # x-direction slopes at all cells incl. one ghost layer:
        # columns 1..-1 of the (n+4) padded axis
        sx = _slope(g[:-2, 2:-2], g[1:-1, 2:-2], g[2:, 2:-2], limiter)
        cW = g[1:-2, 2:-2] + 0.5 * sx[:-1]           # (n+1, n) from west
        cE = g[2:-1, 2:-2] - 0.5 * sx[1:]            # from east
        fx = Fx * jnp.where(Fx > 0, cW, cE)
        sy = _slope(g[2:-2, :-2], g[2:-2, 1:-1], g[2:-2, 2:], limiter)
        cS = g[2:-2, 1:-2] + 0.5 * sy[:, :-1]        # (n, n+1) from south
        cN = g[2:-2, 2:-1] - 0.5 * sy[:, 1:]
        fy = Fy * jnp.where(Fy > 0, cS, cN)
        div = (fx[1:, :] - fx[:-1, :] + fy[:, 1:] - fy[:, :-1])
        out.append(-div / (jnp.asarray(cm[b]) * h * h))
    return out


def bcg_flux_context(fluxes, edges, cm, n: int):
    """Static per-panel context for the BCG-style face values
    (advect_bcg): padded donor volumes and signed transverse-flux cell
    means, including the first ghost layer through the (possibly
    rotated) edges.

    Ghost transverse means are gathered from the NEIGHBOR panel's own
    flux arrays with the edge orientation applied (rev flips both the
    tangential order and the flux sign), so a shared-face donor
    reconstructs to the identical value from both panels — the property
    that keeps cross-edge advection exactly conservative."""
    nb = len(fluxes)
    emap = {(e.b1, e.d1): e for e in edges}
    Fx = [np.asarray(f[0]) for f in fluxes]
    Fy = [np.asarray(f[1]) for f in fluxes]

    def tmean_strip(b2, d2):
        """Neighbor's boundary-cell transverse-flux means along side
        d2, in the neighbor's own tangential order/orientation."""
        if d2 == LEFT:
            return 0.5 * (Fy[b2][0, :-1] + Fy[b2][0, 1:])
        if d2 == RIGHT:
            return 0.5 * (Fy[b2][-1, :-1] + Fy[b2][-1, 1:])
        if d2 == BOTTOM:
            return 0.5 * (Fx[b2][:-1, 0] + Fx[b2][1:, 0])
        return 0.5 * (Fx[b2][:-1, -1] + Fx[b2][1:, -1])

    def ghost_tmean(b, d):
        e = emap.get((b, d))
        if e is None:                       # mirror: reflected tangential
            return tmean_strip(b, d)        # flow keeps its sign
        s = tmean_strip(e.b2, e.d2)
        return -s[::-1] if e.rev else s

    MY, MX = [], []
    for b in range(nb):
        my = np.zeros((n + 2, n))
        my[1:-1] = 0.5 * (Fy[b][:, :-1] + Fy[b][:, 1:])
        my[0] = ghost_tmean(b, LEFT)
        my[-1] = ghost_tmean(b, RIGHT)
        MY.append(jnp.asarray(my))
        mx = np.zeros((n, n + 2))
        mx[:, 1:-1] = 0.5 * (Fx[b][:-1, :] + Fx[b][1:, :])
        mx[:, 0] = ghost_tmean(b, BOTTOM)
        mx[:, -1] = ghost_tmean(b, TOP)
        MX.append(jnp.asarray(mx))

    cmp = fill_ghosts([jnp.asarray(w) for w in cm], edges)
    VX = [w[:, 1:-1] for w in cmp]          # (n+2, n) volumes/h^2
    VY = [w[1:-1, :] for w in cmp]          # (n, n+2)
    return {"MY": MY, "MX": MX, "VX": VX, "VY": VY}


def _corner_mask(n: int):
    """(n+2, n) mask zeroing the transverse slope at cells within one
    cell of a panel corner (incl. their ghost copies): three panels
    meet there and no consistent transverse stencil exists — both
    views of a shared-face donor apply the same rule, preserving exact
    conservation."""
    m = np.ones((n + 2, n))
    m[np.ix_([0, 1, n, n + 1], [0, n - 1])] = 0.0
    return jnp.asarray(m)


def advect_bcg(fields, edges, fluxes, cm, h, dt, ctx,
               limiter: str = "centered"):
    """One single-stage step with the reference's BCG-style face value
    (gfs_face_advection_flux, src/advection.c): donor value plus the
    CFL-corrected normal slope and the transverse upwind shift,
    c_face = c_d + (1 - nu)/2 * s_n - tau/2 * s_t,
    nu = F dt / V_donor, tau = (mean transverse flux) dt / V_donor.
    At nu -> 1 the normal correction vanishes (exact 1D translation):
    run at CFL ~0.8 for the near-dissipation-free transport the
    reference demonstrates on test/cosine at cfl = 1.  ``ctx`` from
    bcg_flux_context."""
    padded = fill_ghosts2(fields, edges)
    n = fields[0].shape[0]
    cmask = _corner_mask(n)
    out = []
    for b, g in enumerate(padded):
        Fx, Fy = fluxes[b]
        VXp, VYp = ctx["VX"][b], ctx["VY"][b]
        MYp, MXp = ctx["MY"][b], ctx["MX"][b]
        hh = h * h

        # x-faces -------------------------------------------------
        sx = _slope(g[:-2, 2:-2], g[1:-1, 2:-2], g[2:, 2:-2], limiter)
        PX = g[1:-1, :]                      # (n+2, n+4) cells + x-ghosts
        sy_x = _slope(PX[:, 1:-3], PX[:, 2:-2], PX[:, 3:-1],
                      limiter) * cmask
        nuL = Fx * dt / (VX_L := VXp[:-1] * hh)
        tauL = MYp[:-1] * dt / VX_L
        cW = (g[1:-2, 2:-2] + 0.5 * (1.0 - nuL) * sx[:-1]
              - 0.5 * tauL * sy_x[:-1])
        nuR = Fx * dt / (VX_R := VXp[1:] * hh)
        tauR = MYp[1:] * dt / VX_R
        cE = (g[2:-1, 2:-2] - 0.5 * (1.0 + nuR) * sx[1:]
              - 0.5 * tauR * sy_x[1:])
        fx = Fx * jnp.where(Fx > 0, cW, cE)

        # y-faces -------------------------------------------------
        sy = _slope(g[2:-2, :-2], g[2:-2, 1:-1], g[2:-2, 2:], limiter)
        PY = g[:, 1:-1]                      # (n+4, n+2)
        sx_y = _slope(PY[1:-3, :], PY[2:-2, :], PY[3:-1, :],
                      limiter) * cmask.T
        nuS = Fy * dt / (VY_S := VYp[:, :-1] * hh)
        tauS = MXp[:, :-1] * dt / VY_S
        cS = (g[2:-2, 1:-2] + 0.5 * (1.0 - nuS) * sy[:, :-1]
              - 0.5 * tauS * sx_y[:, :-1])
        nuN = Fy * dt / (VY_N := VYp[:, 1:] * hh)
        tauN = MXp[:, 1:] * dt / VY_N
        cN = (g[2:-2, 2:-1] - 0.5 * (1.0 + nuN) * sy[:, 1:]
              - 0.5 * tauN * sx_y[:, 1:])
        fy = Fy * jnp.where(Fy > 0, cS, cN)

        div = (fx[1:, :] - fx[:-1, :] + fy[:, 1:] - fy[:, :-1])
        out.append(fields[b] - dt * div / (jnp.asarray(cm[b]) * hh))
    return out


def advect_muscl(fields, edges, fluxes, cm, h, dt,
                 limiter: str = "centered"):
    """One second-order step (Heun / RK2 in time, slope-reconstructed
    upwind fluxes in space) of flux-form transport over the box graph.
    Mass is conserved to round-off; with ``centered`` slopes this is
    the scheme class the reference validates on test/cosine (Williamson
    problem #1, cosine bell once around the sphere on MetricCubed)."""
    k1 = flux_divergence_muscl(fields, edges, fluxes, cm, h, limiter)
    mid = [c + dt * d for c, d in zip(fields, k1)]
    k2 = flux_divergence_muscl(mid, edges, fluxes, cm, h, limiter)
    return [c + 0.5 * dt * (d1 + d2)
            for c, d1, d2 in zip(fields, k1, k2)]


def advect_upwind(fields, edges, fluxes, cm, h, dt):
    """One conservative donor-cell step over the box graph:
    c^{n+1} = c - dt/(cm h^2) * sum_faces F * c_upwind.  Ghost upwind
    values cross rotated edges through fill_ghosts; mass is conserved
    to round-off because cross-edge faces carry equal-and-opposite
    fluxes (stream-function construction + index-matched topology)."""
    padded = fill_ghosts(fields, edges)
    out = []
    for b, g in enumerate(padded):
        Fx, Fy = fluxes[b]
        cW = g[:-1, 1:-1]                            # (n+1, n) west value
        cE = g[1:, 1:-1]
        up_x = jnp.where(Fx > 0, cW, cE)
        cS = g[1:-1, :-1]
        cN = g[1:-1, 1:]
        up_y = jnp.where(Fy > 0, cS, cN)
        fx = Fx * up_x
        fy = Fy * up_y
        div = (fx[1:, :] - fx[:-1, :] + fy[:, 1:] - fy[:, :-1])
        out.append(fields[b] - dt * div / (jnp.asarray(cm[b]) * h * h))
    return out


def total_mass(fields, cm, h):
    return sum(jnp.sum(jnp.asarray(cm[b]) * h * h * fields[b])
               for b in range(len(fields)))


# ---------------------------------------------------------------------------
# shallow water on the sphere (the reference's test/lonlat/cubed class:
# GfsRiver dam break on the six-panel graph)
# ---------------------------------------------------------------------------

def cubed_face_geometry(n: int):
    """Per-panel face geometry for flux-form solvers: for each x/y face
    its arc length L and constant in-surface unit normal (the pole of
    the great circle through the face corners — exact, since every
    gnomonic grid line is a great-circle arc).  Returns
    [(Lx (n+1,n), Nx (n+1,n,3), Ly (n,n+1), Ny (n,n+1,3))] and cell
    areas [(n,n)] (spherical excess, same discrete areas as
    MetricCubed)."""
    def tri_area(p, q, r):
        num = np.abs(np.sum(p * np.cross(q, r), -1))
        den = (1.0 + np.sum(p * q, -1) + np.sum(q * r, -1)
               + np.sum(r * p, -1))
        return 2.0 * np.arctan2(num, den)

    def oriented(A, B, ref):
        """Great-circle face normal unit(A x B), flipped to align with
        the +axis reference direction ``ref`` at each face."""
        cross = np.cross(A, B)
        L = np.arctan2(np.linalg.norm(cross, axis=-1),
                       np.sum(A * B, -1))
        N = cross / np.linalg.norm(cross, axis=-1, keepdims=True)
        sgn = np.where(np.sum(N * ref, -1, keepdims=True) < 0, -1.0, 1.0)
        return L, N * sgn

    out = []
    areas = []
    for p in range(6):
        c = cubed_corner_points(n, p)             # (n+1, n+1, 3)
        centers = cubed_centers(n, p)
        # +x reference at every x-face: interior = centre-to-centre;
        # boundary = face-midpoint to first/last centre
        A = c[:, :-1]; B = c[:, 1:]
        midx = A + B
        midx = midx / np.linalg.norm(midx, axis=-1, keepdims=True)
        refx = np.empty_like(midx)
        refx[1:-1] = centers[1:] - centers[:-1]
        refx[0] = centers[0] - midx[0]
        refx[-1] = midx[-1] - centers[-1]
        Lx, Nx = oriented(A, B, refx)
        A2 = c[:-1, :]; B2 = c[1:, :]
        midy = A2 + B2
        midy = midy / np.linalg.norm(midy, axis=-1, keepdims=True)
        refy = np.empty_like(midy)
        refy[:, 1:-1] = centers[:, 1:] - centers[:, :-1]
        refy[:, 0] = centers[:, 0] - midy[:, 0]
        refy[:, -1] = midy[:, -1] - centers[:, -1]
        Ly, Ny = oriented(A2, B2, refy)
        # cell areas
        p00 = c[:-1, :-1]; p10 = c[1:, :-1]; p11 = c[1:, 1:]
        p01 = c[:-1, 1:]
        area = tri_area(p00, p10, p11) + tri_area(p00, p11, p01)
        out.append((jnp.asarray(Lx), jnp.asarray(Nx),
                    jnp.asarray(Ly), jnp.asarray(Ny)))
        areas.append(jnp.asarray(area))
    return out, areas


def _fill_ghosts_vec(fields, edges):
    """Component-wise ghost exchange of (n, n, 3) ambient-vector
    fields: storing momentum as tangent 3-vectors makes the rotated
    exchange a plain scalar copy per component — no swap/sign swizzle
    (the reference approximates the cross-panel vector transform with
    +-1 component swaps, boundary.c face_periodic_rotate; ambient
    storage is exact)."""
    comps = [fill_ghosts([f[..., k] for f in fields], edges)
             for k in range(3)]
    return [jnp.stack([comps[k][b] for k in range(3)], -1)
            for b in range(len(fields))]


def swe_step(h, m, geom, areas, edges, dt, g: float = 1.0):
    """One Rusanov flux-form shallow-water step on the box graph:
    state per panel = depth h (n, n) and ambient tangent momentum
    m (n, n, 3).  Pressure fluxes use the well-balanced difference form
    g (h_f^2 - h_c^2)/2 (the discrete geometric source: a lake at rest
    is EXACTLY steady on the curved geometry — the C-property of the
    reference's well-balanced GfsRiver, src/river.c).  Momentum is
    re-projected onto the local tangent plane after the update."""
    hp = fill_ghosts(h, edges)
    mp = _fill_ghosts_vec(m, edges)
    out_h = []
    out_m = []
    for b in range(len(h)):
        Lx, Nx, Ly, Ny = geom[b]
        A = areas[b]
        hg = hp[b]
        mg = mp[b]

        def face_flux(hL, hR, mL, mR, N, L):
            eps = 1e-12
            unL = jnp.sum(mL * N, -1) / jnp.maximum(hL, eps)
            unR = jnp.sum(mR * N, -1) / jnp.maximum(hR, eps)
            cL = jnp.sqrt(g * jnp.maximum(hL, 0.0))
            cR = jnp.sqrt(g * jnp.maximum(hR, 0.0))
            lam = jnp.maximum(jnp.abs(unL) + cL, jnp.abs(unR) + cR)
            Fh = 0.5 * (hL * unL + hR * unR) - 0.5 * lam * (hR - hL)
            Fp = 0.5 * g * 0.5 * (hL * hL + hR * hR)
            Fm = (0.5 * (mL * unL[..., None] + mR * unR[..., None])
                  + Fp[..., None] * N
                  - 0.5 * lam[..., None] * (mR - mL))
            return L * Fh, L[..., None] * Fm, Fp

        # x faces: left state = cell west of face, right = east
        Fh_x, Fm_x, Fp_x = face_flux(hg[:-1, 1:-1], hg[1:, 1:-1],
                                     mg[:-1, 1:-1], mg[1:, 1:-1],
                                     Nx, Lx)
        Fh_y, Fm_y, Fp_y = face_flux(hg[1:-1, :-1], hg[1:-1, 1:],
                                     mg[1:-1, :-1], mg[1:-1, 1:],
                                     Ny, Ly)
        hc = h[b]
        # well-balance: subtract the cell-pressure geometric source
        # g h_c^2/2 * sum(L N) so a constant-h lake at rest is steady
        src = (g * 0.5 * hc * hc)[..., None] * (
            Lx[1:, :, None] * Nx[1:, :] - Lx[:-1, :, None] * Nx[:-1, :]
            + Ly[:, 1:, None] * Ny[:, 1:]
            - Ly[:, :-1, None] * Ny[:, :-1])
        div_h = (Fh_x[1:, :] - Fh_x[:-1, :]
                 + Fh_y[:, 1:] - Fh_y[:, :-1])
        div_m = (Fm_x[1:, :] - Fm_x[:-1, :]
                 + Fm_y[:, 1:] - Fm_y[:, :-1]) - src
        h_new = hc - dt * div_h / A
        m_new = m[b] - dt * div_m / A[..., None]
        out_h.append(h_new)
        out_m.append(m_new)
    # keep momentum tangent to the sphere (curvature drift control)
    return out_h, out_m


def swe_project_tangent(m, centers):
    """Remove the radial momentum component (m stays in the tangent
    plane; the ambient-vector analogue of the metric's Christoffel
    terms acting on the radial direction)."""
    out = []
    for b in range(len(m)):
        r = jnp.asarray(centers[b])
        out.append(m[b] - jnp.sum(m[b] * r, -1, keepdims=True) * r)
    return out
