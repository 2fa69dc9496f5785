"""Rotated box-graph gates (GfsGEdge rotate, src/boundary.c:1704-1753).

The six-panel cubed sphere is the canonical rotated topology (the
reference's test/lonlat/cubed runs GfsRiver on exactly this 12-edge
graph): edges are derived from the gnomonic geometry, ghost exchange is
the index-matched rotated-periodic copy, and the metric-weighted FV
operator must satisfy the exact discrete conservation and symmetry
identities across rotated edges.  (Two-point fluxes are first-order on
the non-orthogonal gnomonic grid — like the reference, the cubed metric
targets flux-form hyperbolic systems; elliptic convergence is gated on
orthogonal/plain graphs.)
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core import boxgraph as bg


def test_cubed_sphere_edges_derived():
    edges, centers = bg.cubed_sphere(8)
    assert len(edges) == 24                       # 12 undirected links
    # every panel has all four sides connected
    sides = {(e.b1, e.d1) for e in edges}
    assert len(sides) == 24
    # some edges MUST be rotated (reversed) — a cube cannot be meshed
    # with translation-only identifications
    assert any(e.rev for e in edges)


def test_ghost_exchange_is_index_matched_copy():
    """Every edge joins two panel sides whose boundary face centres
    coincide (with the recorded reversal), and ghost strips are the
    index-matched neighbor interior values at those positions — the
    rotated-periodic boundary semantics (src/boundary.c
    center_periodic_rotate + gfs_domain_match)."""
    n = 8
    edges, centers = bg.cubed_sphere(n)

    def f3(v):                                    # smooth, asymmetric
        return v[..., 0] + 2.0 * v[..., 1] * v[..., 2] + 0.5 * v[..., 2]

    fields = [jnp.asarray(f3(c)) for c in centers]
    padded = bg.fill_ghosts(fields, edges)
    for e in edges:
        # topology: shared cube-edge face centres coincide
        g1 = bg.edge_face_centers(n, e.b1, e.d1)
        g2 = bg.edge_face_centers(n, e.b2, e.d2)
        assert np.allclose(g1, g2[::-1] if e.rev else g2, atol=1e-12)
        # data: ghost strip is the (possibly reversed) neighbor strip
        g = padded[e.b1]
        got = {bg.LEFT: g[0, 1:-1], bg.RIGHT: g[-1, 1:-1],
               bg.BOTTOM: g[1:-1, 0], bg.TOP: g[1:-1, -1]}[e.d1]
        src = np.asarray(centers[e.b2])
        strip = {bg.LEFT: src[0, :], bg.RIGHT: src[-1, :],
                 bg.BOTTOM: src[:, 0], bg.TOP: src[:, -1]}[e.d2]
        want = f3(strip[::-1] if e.rev else strip)
        assert np.allclose(np.asarray(got), want, atol=1e-12), e


def test_rotated_two_box_reversal():
    """A reversed edge flips the tangential order (the buffer traversal
    of the rotated periodic boundary)."""
    a = jnp.arange(16.0).reshape(4, 4)
    b = 100.0 + jnp.arange(16.0).reshape(4, 4)
    edges = bg.link([(0, bg.RIGHT, 1, bg.RIGHT, True)])
    pa, pb = bg.fill_ghosts([a, b], edges)
    # ghost right of box 0 = box 1's right interior column, reversed
    assert np.allclose(np.asarray(pa[-1, 1:-1]),
                       np.asarray(b[-1, ::-1]))
    assert np.allclose(np.asarray(pb[-1, 1:-1]),
                       np.asarray(a[-1, ::-1]))


def test_discrete_gauss_identity_on_sphere():
    """Global integral of the FV Laplacian vanishes EXACTLY on the
    closed six-panel topology: every cross-edge face flux must cancel
    with its partner, which only happens when the edge matching
    (including reversals) is right — the conservation property the
    rotated-periodic boundaries guarantee in the reference."""
    n = 16
    edges, centers = bg.cubed_sphere(n)
    cm, fm = bg.cubed_metric_weights(n)
    h = 1.0 / n
    rng = np.random.default_rng(3)

    def f3(v):
        return (np.sin(3 * v[..., 0]) + v[..., 1] * v[..., 2] ** 2
                + 0.3 * np.cos(2 * v[..., 1]))

    fields = [jnp.asarray(f3(c) + rng.normal(scale=0.1, size=(n, n)))
              for c in centers]
    L = bg.laplacian(fields, edges, h, cm=[cm] * 6, fm=[fm] * 6)
    total = sum(float(jnp.sum(jnp.asarray(cm) * h * h * L[i]))
                for i in range(6))
    scale = sum(float(jnp.sum(jnp.abs(jnp.asarray(cm) * h * h * L[i])))
                for i in range(6))
    assert abs(total) < 1e-12 * scale, (total, scale)


def test_operator_symmetry_on_sphere():
    """<u, -lap v> == <-lap u, v> in the metric inner product — the
    stencil symmetry gfs_relax relies on, across rotated edges too."""
    n = 8
    edges, centers = bg.cubed_sphere(n)
    cm, fm = bg.cubed_metric_weights(n)
    h = 1.0 / n
    rng = np.random.default_rng(7)
    u = [jnp.asarray(rng.normal(size=(n, n))) for _ in range(6)]
    v = [jnp.asarray(rng.normal(size=(n, n))) for _ in range(6)]
    Lu = bg.laplacian(u, edges, h, cm=[cm] * 6, fm=[fm] * 6)
    Lv = bg.laplacian(v, edges, h, cm=[cm] * 6, fm=[fm] * 6)
    w = jnp.asarray(cm) * h * h
    a = sum(float(jnp.sum(w * u[i] * Lv[i])) for i in range(6))
    b = sum(float(jnp.sum(w * Lu[i] * v[i])) for i in range(6))
    assert abs(a - b) < 1e-11 * (abs(a) + 1.0), (a, b)


def test_plain_box_graph_matches_single_grid():
    """A 2x2 box graph with translation edges reproduces the embedded
    single-array 5-point Laplacian EXACTLY (mirror outer boundaries) —
    the box-graph engine vs the fast-path equivalence."""
    n = 8
    rng = np.random.default_rng(1)
    big = rng.normal(size=(2 * n, 2 * n))
    boxes = [jnp.asarray(big[:n, :n]), jnp.asarray(big[n:, :n]),
             jnp.asarray(big[:n, n:]), jnp.asarray(big[n:, n:])]
    # box 0 lower-left, 1 lower-right(+x), 2 upper-left(+y), 3 upper-right
    edges = bg.link([(0, bg.RIGHT, 1, bg.LEFT),
                     (2, bg.RIGHT, 3, bg.LEFT),
                     (0, bg.TOP, 2, bg.BOTTOM),
                     (1, bg.TOP, 3, bg.BOTTOM)])
    h = 1.0
    L = bg.laplacian(boxes, edges, h)
    # reference: mirror-padded single grid
    g = np.pad(big, 1, mode="edge")
    ref = (g[2:, 1:-1] + g[:-2, 1:-1] + g[1:-1, 2:] + g[1:-1, :-2]
           - 4 * big)
    got = np.zeros_like(big)
    got[:n, :n] = L[0]; got[n:, :n] = L[1]
    got[:n, n:] = L[2]; got[n:, n:] = L[3]
    assert np.allclose(got, ref, atol=1e-13)


def test_poisson_solve_on_plain_box_graph():
    """solve_cg on a closed (fully periodic) 2-box graph matches the
    analytic periodic solution to second order."""
    import math as m
    errs = []
    for n in (16, 32):
        # two boxes side by side, wrapped periodically in both axes:
        # domain = [0, 2] x [0, 1]
        h = 1.0 / n
        edges = bg.link([(0, bg.RIGHT, 1, bg.LEFT),
                         (1, bg.RIGHT, 0, bg.LEFT),
                         (0, bg.TOP, 0, bg.BOTTOM),
                         (1, bg.TOP, 1, bg.BOTTOM)])
        xs = (np.arange(n) + 0.5) * h
        def exact(x0):
            X, Y = np.meshgrid(x0, xs, indexing="ij")
            return np.cos(m.pi * X) * np.cos(2 * m.pi * Y)
        u_ex = [exact(xs), exact(1.0 + xs)]
        lam = (m.pi ** 2 + 4 * m.pi ** 2)
        rhs = [jnp.asarray(-lam * u) for u in u_ex]
        u, stats = bg.solve_cg(rhs, edges, h, tol=1e-12, maxiter=4000)
        err = max(float(jnp.max(jnp.abs(u[i] - u_ex[i])))
                  for i in range(2))
        errs.append(err)
    order = m.log2(errs[0] / errs[1])
    assert errs[1] < 4e-3 and order > 1.8, (errs, order)


def test_total_sphere_area():
    """Sum of metric cell areas over the six panels = 4 pi (the
    discrete partition of the sphere the reference's cubed metric
    guarantees, src/metric.c)."""
    n = 16
    cm, _ = bg.cubed_metric_weights(n)
    area = 6.0 * float(jnp.sum(cm)) / n ** 2
    assert area == pytest.approx(4.0 * math.pi, rel=1e-12)


def test_gfs_rotated_edges_parse():
    """`1 2 right top` records a rotated GfsGEdge (b1 side right joins
    b2 side top) and converts to linked Edge pairs."""
    from gerris_tpu.utils import gfs_config as gc
    gfs = """
3 3 GfsSimulation GfsBox GfsGEdge {} {
  Refine 3
  Time { iend = 0 }
}
GfsBox {}
GfsBox {}
GfsBox {}
1 2 right top
2 3 right
3 3 top
"""
    sim = gc.parse_gfs(gfs)
    assert (1, 2, "right", "top") in sim.box_edges
    assert (2, 3, "right", None) in sim.box_edges
    assert (3, 3, "top", None) in sim.box_edges
    edges = bg.edges_from_gfs(sim.box_edges)
    # rotated link: box0 right <-> box1 top, both directions present
    assert bg.Edge(0, bg.RIGHT, 1, bg.TOP, False) in edges
    assert bg.Edge(1, bg.TOP, 0, bg.RIGHT, False) in edges
    # plain link: box1 right <-> box2 left
    assert bg.Edge(2, bg.LEFT, 1, bg.RIGHT, False) in edges
    # self-edge (periodicity) excluded from the graph
    assert all(e.b1 != e.b2 or e.d1 != e.d2 for e in edges)


# ---------------------------------------------------------------------------
# flux-form transport across the rotated topology (the reference's
# cubed-sphere production use: test/lonlat/cubed drives flux-form
# shallow water on this graph)
# ---------------------------------------------------------------------------

def _rotation_setup(n):
    edges, centers = bg.cubed_sphere(n)
    cm, _ = bg.cubed_metric_weights(n)
    cms = [cm] * 6
    h = 1.0 / n
    # solid-body rotation about z: psi = -z (v = z_hat x r, period 2*pi)
    fluxes = bg.streamfunction_face_fluxes(n, lambda p: -p[..., 2])
    return edges, centers, cms, h, fluxes


def test_uniform_field_is_steady_under_advection():
    """c == 1 must be EXACTLY steady: stream-function fluxes are
    discretely divergence-free in every cell, including across rotated
    edges (equal-and-opposite shared-face fluxes)."""
    n = 8
    edges, centers, cms, h, fluxes = _rotation_setup(n)
    c = [jnp.ones((n, n)) for _ in range(6)]
    dt = 0.5 * h * h  # any stable dt
    c1 = bg.advect_upwind(c, edges, fluxes, cms, h, dt)
    for i in range(6):
        assert float(jnp.max(jnp.abs(c1[i] - 1.0))) < 1e-13, i


def test_solid_body_rotation_conserves_and_transports():
    """A blob advected around the sphere through four panel edges:
    exact mass conservation, monotonicity (donor-cell), and the blob
    comes back (correlation with the initial condition improves with
    resolution)."""
    import math as m

    def run(n):
        edges, centers, cms, h, fluxes = _rotation_setup(n)
        # blob centred on the equator at +x
        c0 = [jnp.asarray(np.exp(-(np.arccos(
            np.clip(c[..., 0], -1, 1)) / 0.5) ** 2)) for c in centers]
        fmax = max(float(jnp.max(jnp.abs(f))) for pair in fluxes
                   for f in pair)
        wmin = min(float(jnp.min(jnp.asarray(w) * h * h)) for w in cms)
        dt = 0.4 * wmin / fmax
        nsteps = int(m.ceil(2 * m.pi / dt))
        dt = 2 * m.pi / nsteps                  # land exactly on 1 rev

        import jax as _jax

        @_jax.jit
        def step_all(cs):
            return bg.advect_upwind(cs, edges, fluxes, cms, h, dt)

        cs = c0
        for _ in range(nsteps):
            cs = step_all(cs)
        m0 = float(bg.total_mass(c0, cms, h))
        m1 = float(bg.total_mass(cs, cms, h))
        assert abs(m1 - m0) < 1e-12 * abs(m0), (m0, m1)
        lo = min(float(jnp.min(c)) for c in c0)
        hi = max(float(jnp.max(c)) for c in c0)
        assert all(float(jnp.min(c)) >= lo - 1e-12 for c in cs)
        assert all(float(jnp.max(c)) <= hi + 1e-12 for c in cs)
        num = sum(float(jnp.sum(cs[i] * c0[i])) for i in range(6))
        den = m.sqrt(sum(float(jnp.sum(cs[i] ** 2)) for i in range(6))
                     * sum(float(jnp.sum(c0[i] ** 2)) for i in range(6)))
        return num / den

    corr16 = run(16)
    corr32 = run(32)
    assert corr16 > 0.55, corr16
    assert corr32 > corr16, (corr16, corr32)


def test_uniform_field_is_steady_under_bcg_advection():
    """c == 1 must be exactly steady under the BCG face values too
    (slopes vanish, face value = 1, stream-function fluxes are
    divergence-free)."""
    n = 8
    edges, centers, cms, h, fluxes = _rotation_setup(n)
    ctx = bg.bcg_flux_context(fluxes, edges, cms, n)
    c = [jnp.ones((n, n)) for _ in range(6)]
    dt = 0.25 * h * h
    c1 = bg.advect_bcg(c, edges, fluxes, cms, h, dt, ctx)
    for i in range(6):
        assert float(jnp.max(jnp.abs(c1[i] - 1.0))) < 1e-13, i


def _williamson_case(n, alpha_deg, cfl=0.8):
    """Williamson et al. problem #1 (reference test/cosine/cosine.gfs):
    cosine bell of radius 1/3 at (3pi/2, 0), one solid-body revolution
    at angle ALPHA to the polar axis, relative error norms against the
    returned (= initial) bell.  45 degrees passes over four cube
    'poles'; 90 degrees avoids them."""
    import jax as _jax

    edges, centers = bg.cubed_sphere(n)
    cm, _ = bg.cubed_metric_weights(n)
    cms = [cm] * 6
    h = 1.0 / n
    al = math.radians(alpha_deg)
    u0 = 2 * math.pi
    # psi = -u0*(sin(theta) cos(alpha) - cos(lambda) cos(theta) sin(alpha))
    #     = -u0*(z cos(alpha) - x sin(alpha)) on the unit sphere
    fluxes = bg.streamfunction_face_fluxes(
        n, lambda p: -u0 * (p[..., 2] * math.cos(al)
                            - p[..., 0] * math.sin(al)))
    ctx = bg.bcg_flux_context(fluxes, edges, cms, n)

    R = 1.0 / 3.0
    cvec = np.array([0.0, -1.0, 0.0])   # (lambda_c, theta_c) = (3pi/2, 0)

    def bell(pts):
        r = np.arccos(np.clip(pts @ cvec, -1, 1))
        return np.where(r < R, 0.5 * (1 + np.cos(np.pi * r / R)), 0.0)

    c0 = [jnp.asarray(bell(np.asarray(c))) for c in centers]
    fmax = max(float(jnp.max(jnp.abs(f))) for pair in fluxes for f in pair)
    wmin = min(float(jnp.min(jnp.asarray(w) * h * h)) for w in cms)
    nsteps = int(math.ceil(1.0 / (cfl * wmin / fmax)))
    dt = 1.0 / nsteps

    @_jax.jit
    def step(cs, dtv):
        return bg.advect_bcg(cs, edges, fluxes, cms, h, dtv, ctx)

    cs = c0
    dtv = jnp.asarray(dt)
    for _ in range(nsteps):
        cs = step(cs, dtv)

    w = [np.asarray(cm) * h * h] * 6
    ea = [np.abs(np.asarray(a) - np.asarray(b)) for a, b in zip(cs, c0)]
    xa = [np.abs(np.asarray(b)) for b in c0]
    l1 = (sum((wi * e).sum() for wi, e in zip(w, ea))
          / sum((wi * x).sum() for wi, x in zip(w, xa)))
    l2 = math.sqrt(sum((wi * e ** 2).sum() for wi, e in zip(w, ea))
                   / sum((wi * x ** 2).sum() for wi, x in zip(w, xa)))
    linf = max(e.max() for e in ea) / max(x.max() for x in xa)
    m0 = float(bg.total_mass(c0, cms, h))
    m1 = float(bg.total_mass(cs, cms, h))
    return l1, l2, linf, abs(m1 - m0) / abs(m0)


def test_cosine_bell_once_around_the_sphere():
    """test/cosine gate: relative error norms after one revolution vs
    the reference tables (error-45.ref / error-90.ref columns L1 L2
    Linf at levels 4-5 = 16^2/32^2 per panel).  alpha=45 BEATS the
    reference at both levels; alpha=90 is within 1.35x.  Mass conserved
    to round-off either way (measured: 45deg 0.459/0.177 vs ref
    0.531/0.208; 90deg 0.427/0.165 vs ref 0.406/0.126)."""
    ref = {  # (alpha, n) -> (L1, L2, Linf) from error-*.ref
        (45, 16): (1.002, 0.5311, 0.5350),
        (45, 32): (0.3549, 0.2078, 0.1893),
        (90, 16): (0.6534, 0.4056, 0.3469),
        (90, 32): (0.1995, 0.1260, 0.0931),
    }
    fac = {45: 1.0, 90: 1.35}           # beat / stay within
    got = {}
    for alpha in (45, 90):
        for n in (16, 32):
            l1, l2, linf, dm = _williamson_case(n, alpha)
            assert dm < 1e-12, (alpha, n, dm)
            r1, r2, ri = ref[(alpha, n)]
            f = fac[alpha]
            assert l2 < f * r2, (alpha, n, l2, r2)
            assert l1 < f * r1, (alpha, n, l1, r1)
            assert linf < 1.45 * ri, (alpha, n, linf, ri)
            got[(alpha, n)] = l2
    # second-order-class convergence between the two levels
    for alpha in (45, 90):
        ratio = got[(alpha, 16)] / got[(alpha, 32)]
        assert ratio > 2.2, (alpha, ratio)


def test_swe_lake_at_rest_is_exact():
    """C-property on the curved geometry: constant depth + zero
    momentum stays EXACTLY steady (the well-balanced pressure/geometric
    source cancellation of the reference's GfsRiver, src/river.c)."""
    n = 16
    edges, centers = bg.cubed_sphere(n)
    geom, areas = bg.cubed_face_geometry(n)
    h = [jnp.full((n, n), 1.0) for _ in range(6)]
    m = [jnp.zeros((n, n, 3)) for _ in range(6)]
    dt = 0.01
    for _ in range(3):
        h, m = bg.swe_step(h, m, geom, areas, edges, dt, g=1.0)
        m = bg.swe_project_tangent(m, centers)
    for b in range(6):
        assert float(jnp.max(jnp.abs(h[b] - 1.0))) < 1e-13, b
        assert float(jnp.max(jnp.abs(m[b]))) < 1e-13, b


def test_swe_dam_break_conserves_and_stays_radial():
    """Radially-symmetric dam break centred on a panel CORNER (the
    worst spot: the flow crosses three panels immediately) — total mass
    conserved to round-off, depth field stays a function of
    great-circle radius (the symmetry measure of the reference's
    test/lonlat dam-break cases)."""
    import math as m_
    n = 24
    edges, centers = bg.cubed_sphere(n)
    geom, areas = bg.cubed_face_geometry(n)
    # cylinder of extra depth around the point where panels meet
    p0 = np.array([1.0, 1.0, 1.0]) / m_.sqrt(3.0)
    rad = [np.arccos(np.clip(np.asarray(c) @ p0, -1, 1))
           for c in centers]
    h = [jnp.asarray(np.where(r < 0.35, 1.2, 1.0)) for r in rad]
    m = [jnp.zeros((n, n, 3)) for _ in range(6)]
    mass0 = float(sum(jnp.sum(areas[b] * h[b]) for b in range(6)))

    import jax as _jax

    @_jax.jit
    def step(h, m):
        h, m = bg.swe_step(h, m, geom, areas, edges, 0.004, g=1.0)
        return h, bg.swe_project_tangent(m, centers)

    for _ in range(60):                   # t = 0.24, front well inside
        h, m = step(h, m)
    mass1 = float(sum(jnp.sum(areas[b] * h[b]) for b in range(6)))
    assert abs(mass1 - mass0) < 1e-11 * mass0
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in h)
    # radial-symmetry scatter: bin depth by great-circle radius and
    # measure the in-bin spread relative to the full signal range
    r_all = np.concatenate([r.ravel() for r in rad])
    h_all = np.concatenate([np.asarray(x).ravel() for x in h])
    nb = 24
    bins = np.linspace(0.0, m_.pi, nb + 1)
    idx = np.digitize(r_all, bins) - 1
    spread = 0.0
    wsum = 0
    for k in range(nb):
        sel = idx == k
        if sel.sum() > 8:
            spread += float(h_all[sel].std()) * sel.sum()
            wsum += int(sel.sum())
    spread /= wsum
    rng = float(h_all.max() - h_all.min())
    assert spread < 0.08 * rng, (spread, rng)
