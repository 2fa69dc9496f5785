"""Metric layer gates (reference: src/metric.c — GfsMetricStretch,
GfsMetricLonLat, GfsMetricCubed; face weights per poisson_coeff
src/poisson.c:772)."""
import math

import jax.numpy as jnp
import numpy as np

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.core.metric import (MetricStretch, MetricLonLat,
                                    MetricCubed, MapProjection)
from gerris_tpu.solvers import poisson


def test_stretch_poisson_order():
    """Anisotropic Poisson via the stretch metric: physical domain
    [-.5,.5] x [-.5 sy, .5 sy]; exact u = cos(pi x) cos(pi Y/sy)."""
    sy = 0.4
    m = MetricStretch(1.0, sy)
    errs = []
    for level in (5, 6):
        grid = Grid(level=level, dim=2)
        x, y = grid.centers
        exact = jnp.cos(jnp.pi * x) * jnp.cos(jnp.pi * y)   # Y/sy = y
        rhs_phys = -(math.pi ** 2) * (1.0 + 1.0 / sy ** 2) * exact
        cm, fm = m.weights(grid)
        fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
        u, st = poisson.solve(jnp.zeros(grid.shape), cm * rhs_phys, grid,
                              fbc, poisson.MultilevelParams(
                                  tolerance=1e-11, nitermax=60),
                              alpha=fm)
        errs.append(float(jnp.max(jnp.abs(u - exact))))
    order = math.log2(errs[0] / errs[1])
    assert 1.8 < order < 2.2, (errs, order)


def test_identity_metric_ns_equality():
    from gerris_tpu.models import ns
    grid = Grid(level=5, dim=2)
    u_bc = bcs.FieldBC.make(2, default=bcs.Dirichlet(0.0),
                            top=bcs.Dirichlet(1.0))
    v_bc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), 2)
    # tight solves: the metric path routes through the cut-cell
    # formulation, equal to the plain one only at convergence
    base = dict(grid=grid, u_bcs=(u_bc, v_bc), nu=1e-3,
                projection=poisson.MultilevelParams(tolerance=1e-10,
                                                    nitermax=60),
                approx_projection=poisson.MultilevelParams(
                    tolerance=1e-10, nitermax=60),
                diffusion_params=poisson.MultilevelParams(
                    tolerance=1e-10, nitermax=60))
    cfg0 = ns.NSConfig(**base)
    cfg1 = ns.NSConfig(**base, metric=MetricStretch(1.0, 1.0))
    z = jnp.zeros(grid.shape)
    x, y = grid.centers
    s = {"U": 0.1 * jnp.sin(2 * jnp.pi * y), "V": z, "P": z, "Pmac": z,
         "Gx": z, "Gy": z}
    dt = jnp.asarray(0.2 * grid.h)
    a = ns.ns_step(dict(s), dt, jnp.asarray(0.0), cfg0)
    b = ns.ns_step(dict(s), dt, jnp.asarray(0.0), cfg1)
    for k in ("U", "V"):
        assert float(jnp.max(jnp.abs(a[k] - b[k]))) < 1e-8, k
    # pure-Neumann pressure: defined up to a constant (the plain path's
    # dense coarse solve picks the min-norm solution, the identity-alpha
    # path does not) — compare mean-free
    dP = (a["P"] - jnp.mean(a["P"])) - (b["P"] - jnp.mean(b["P"]))
    assert float(jnp.max(jnp.abs(dP))) < 1e-6, float(jnp.max(jnp.abs(dP)))


def test_lonlat_poisson():
    """Zonally-symmetric Poisson on a lat band: u = sin(lat),
    lap_sphere u = -2 sin(lat) (the l=1 spherical harmonic)."""
    scale = math.pi / 2.0           # lat in [-pi/4, pi/4]
    m = MetricLonLat(scale)
    errs = []
    for level in (5, 6):
        grid = Grid(level=level, dim=2)
        x, y = grid.centers
        lat = y * scale
        exact = jnp.sin(lat)
        cm, fm = m.weights(grid)
        rhs = cm * scale * scale * (-2.0 * jnp.sin(lat))
        blat = lambda x_, y_, t=0.0: jnp.sin(
            jnp.asarray(y_) * scale)
        fbc = bcs.FieldBC(((bcs.Neumann(), bcs.Neumann()),
                           (bcs.Dirichlet(blat), bcs.Dirichlet(blat))))
        u, st = poisson.solve(jnp.zeros(grid.shape), rhs, grid, fbc,
                              poisson.MultilevelParams(tolerance=1e-11,
                                                       nitermax=60),
                              alpha=fm)
        errs.append(float(jnp.max(jnp.abs(u - exact))))
    order = math.log2(errs[0] / errs[1])
    assert errs[-1] < 5e-4, errs
    assert order > 1.6, (errs, order)


def test_cubed_panel_area():
    """The gnomonic panel covers exactly one sixth of the sphere:
    sum(cm) h^2 = 4 pi / 6."""
    grid = Grid(level=6, dim=2)
    cm, (fmx, fmy) = MetricCubed().weights(grid)
    area = float(jnp.sum(cm)) * grid.h * grid.h
    assert abs(area - 4 * math.pi / 6) / (4 * math.pi / 6) < 1e-3, area
    # weights are symmetric across the panel centre
    assert float(jnp.max(jnp.abs(cm - cm[::-1, :]))) < 1e-12
    assert float(jnp.max(jnp.abs(cm - cm[:, ::-1]))) < 1e-12


def test_map_projection_roundtrip():
    proj = MapProjection("mercator", L=2.0, lon0=10.0)
    lon = jnp.asarray([-30.0, 0.0, 45.0])
    lat = jnp.asarray([-60.0, 10.0, 70.0])
    x, y = proj.forward(lon, lat)
    lon2, lat2 = proj.inverse(x, y)
    assert float(jnp.max(jnp.abs(lon2 - lon))) < 1e-10
    assert float(jnp.max(jnp.abs(lat2 - lat))) < 1e-10
