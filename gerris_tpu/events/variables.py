"""GfsVariable* subclasses as state-updating events.

TPU-native rebuild of the reference's derived-variable classes
(reference: src/variable.c + src/tension.c:390-760 — the registry
init.c:166-189: Average, Function, Position, Distance, Age, Residual,
...).  In the reference these are GfsEvent subclasses owning one cell
slot each; here each is an Event writing one entry of ``sim.state``
after every step, so downstream outputs/adaptivity read them uniformly.

GfsVariableAge has no class here: it is `cfg.tracers` entry
("Age", bc, 0.0, 1.0) — a tracer with unit source
(models/ns.advect_tracer).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .events import Event


class VariableFunction(Event):
    """state[name] = fn(sim) re-evaluated every step (reference:
    GfsVariableFunction, src/variable.c — an always-on Init)."""

    def __init__(self, name: str, fn, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableFunction({name})", **kw)
        self.var = name
        self.fn = fn

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        sim.state[self.var] = jnp.asarray(self.fn(sim))


class VariableTurbulentViscosity(Event):
    """LES subgrid eddy viscosity nu_t recomputed from the resolved
    velocity gradients every step (reference:
    GfsVariableTurbulentViscosity, modules/turbulence.c:934-1131).

    model="smagorinsky": nu_t = (Cs h)^2 sqrt(2 S_ij S_ij) with
    S_ij = (d_i u_j + d_j u_i)/2 (get_smagorinsky_viscosity,
    modules/turbulence.c:965-981).
    model="sigma": the Nicoud et al. sigma model
    nu_t = (Cs h)^2 sigma3 (sigma1-sigma2)(sigma2-sigma3)/sigma1^2
    from the singular values of the velocity-gradient tensor
    (get_sigma_viscosity, modules/turbulence.c:983-1054).

    Feeds SourceViscosity expressions by name, e.g.
    ``SourceViscosity (MU + NUT)`` — the reference wires it the same
    way (an expression-valued viscosity reading the variable).
    """

    def __init__(self, name: str, cs: float = 0.17,
                 model: str = "smagorinsky", **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableTurbulentViscosity({name})", **kw)
        self.var = name
        self.cs = float(cs)
        self.model = model

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..core import bc as bcs
        from ..models.ns import velocity_names

        amr = hasattr(sim, "fine")
        grid = sim.topo.grid(sim.topo.lmax) if amr else sim.cfg.grid
        dim = grid.dim
        U = [jnp.asarray(sim.fine(n)) if amr else sim.state[n]
             for n in velocity_names(dim)]
        h = grid.h
        # velocity-gradient tensor g[i][j] = d u_i / d x_j (central)
        pads = [bcs.apply_bc(u, grid, sim.cfg.u_bcs[k], 1, t=t)
                for k, u in enumerate(U)]

        def ctr(p, ax):
            lo = [slice(1, -1)] * dim
            hi = [slice(1, -1)] * dim
            lo[ax] = slice(0, -2)
            hi[ax] = slice(2, None)
            return (p[tuple(hi)] - p[tuple(lo)]) / (2.0 * h)

        g = [[ctr(pads[i_], j) for j in range(dim)] for i_ in range(dim)]
        cs2h2 = (self.cs * h) ** 2
        if self.model == "smagorinsky":
            s2 = sum((0.5 * (g[a][b] + g[b][a])) ** 2
                     for a in range(dim) for b in range(dim))
            nut = cs2h2 * jnp.sqrt(2.0 * s2)
        else:  # sigma model
            # G = g^T g; invariants -> singular values (exact 2x2/3x3
            # closed forms, modules/turbulence.c:1005-1049)
            G = [[sum(g[k][a] * g[k][b] for k in range(dim))
                  for b in range(dim)] for a in range(dim)]
            inv1 = sum(G[a][a] for a in range(dim))
            G2tr = sum(sum(G[a][k] * G[k][a] for k in range(dim))
                       for a in range(dim))
            inv2 = (inv1 ** 2 - G2tr) / 2.0
            if dim == 2:
                # embed as diag(G, 0): the third singular value of a 2D
                # gradient is 0, so det of the 3x3 embedding vanishes
                # (the C's 2D branch uses the 2x2 det — dimensionally
                # inconsistent and unreachable: model_type is never
                # parsed, modules/turbulence.c:1073-1086)
                inv3 = jnp.zeros_like(inv1)
            else:
                inv3 = (G[0][0] * (G[1][1] * G[2][2] - G[1][2] * G[2][1])
                        - G[0][1] * (G[1][0] * G[2][2] - G[1][2] * G[2][0])
                        + G[0][2] * (G[1][0] * G[2][1] - G[1][1] * G[2][0]))
            a1 = jnp.maximum(inv1 ** 2 / 9.0 - inv2 / 3.0, 0.0)
            a2 = inv1 ** 3 / 27.0 - inv1 * inv2 / 6.0 + inv3 / 2.0
            a132 = jnp.power(jnp.maximum(a1, 1e-300), 1.5)
            a3 = jnp.arccos(jnp.clip(a2 / jnp.maximum(a132, 1e-300),
                                     -1.0, 1.0)) / 3.0
            sq = jnp.sqrt(a1)
            s1 = jnp.sqrt(jnp.maximum(inv1 / 3.0 + 2 * sq * jnp.cos(a3),
                                      0.0))
            s2_ = jnp.sqrt(jnp.maximum(
                inv1 / 3.0 - 2 * sq * jnp.cos(jnp.pi / 3.0 + a3), 0.0))
            s3 = jnp.sqrt(jnp.maximum(
                inv1 / 3.0 - 2 * sq * jnp.cos(jnp.pi / 3.0 - a3), 0.0))
            dsig = jnp.where(s1 > 0.0,
                             s3 * (s1 - s2_) * (s2_ - s3)
                             / jnp.maximum(s1 ** 2, 1e-300), 0.0)
            ok = (a1 > 0.0) & (a2 < a132)
            nut = jnp.where(ok, cs2h2 * dsig, 0.0)
        if amr:
            # store at the finest level; coarse sources read restrictions
            sim.state[self.var] = sim.restrict_stack(nut) \
                if hasattr(sim, "restrict_stack") else nut
        else:
            sim.state[self.var] = nut


class VariableAverage(Event):
    """Running time average <v> over the steps fired so far (reference:
    GfsVariableAverage, src/variable.c: A_n = A_{n-1} + (v - A_{n-1})/n)."""

    def __init__(self, name: str, of: str, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableAverage({name})", **kw)
        self.var = name
        self.of = of
        self.n = 0

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        v = sim.state[self.of]
        self.n += 1
        prev = sim.state.get(self.var)
        if prev is None or self.n == 1:
            sim.state[self.var] = v
        else:
            sim.state[self.var] = prev + (v - prev) / self.n


class VariablePosition(Event):
    """Coordinate of the VOF interface centroid in interface cells, nodata
    elsewhere (reference: GfsVariablePosition, src/tension.c:638-760)."""

    NODATA = 1e30

    def __init__(self, name: str, tracer: str, component: int, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariablePosition({name})", **kw)
        self.var = name
        self.tracer = tracer
        self.component = component

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics import vof
        grid = sim.cfg.grid
        fbc = dict(sim.cfg.vof_tracers)[self.tracer]
        T = sim.state[self.tracer]
        mx, my = vof.normals(T, grid, fbc, t=sim.time.t)
        alpha = vof.reconstruct_alpha(T, mx, my)
        # PLIC centroid of the cut segment midpoint, cell-local [0,1]^2:
        # intersection midpoint of {m.s = alpha} with the unit square
        sx, sy = _segment_midpoint(mx, my, alpha)
        x, y = grid.centers
        pos = (x + (sx - 0.5) * grid.h) if self.component == 0 \
            else (y + (sy - 0.5) * grid.h)
        ifc = (T > vof.FULL_TOL) & (T < 1.0 - vof.FULL_TOL)
        sim.state[self.var] = jnp.where(ifc, pos, self.NODATA)


def _segment_midpoint(mx, my, alpha):
    """Midpoint of {mx sx + my sy = alpha} clipped to the unit square
    (vectorized; degenerate cells give the cell centre)."""
    eps = 1e-30
    cands = []
    for x0 in (0.0, 1.0):
        y0 = (alpha - mx * x0) / jnp.where(jnp.abs(my) < eps, eps, my)
        ok = (y0 >= 0.0) & (y0 <= 1.0)
        cands.append((jnp.full_like(y0, x0), y0, ok))
    for y0 in (0.0, 1.0):
        x0 = (alpha - my * y0) / jnp.where(jnp.abs(mx) < eps, eps, mx)
        ok = (x0 >= 0.0) & (x0 <= 1.0)
        cands.append((x0, jnp.full_like(x0, y0), ok))
    sx = sy = w = 0.0
    for cx, cy, ok in cands:
        sx = sx + jnp.where(ok, cx, 0.0)
        sy = sy + jnp.where(ok, cy, 0.0)
        w = w + ok.astype(mx.dtype)
    w = jnp.maximum(w, 1.0)
    sx = sx / w
    sy = sy / w
    deg = w < 2.0
    return jnp.where(deg, 0.5, sx), jnp.where(deg, 0.5, sy)


class VariableDistance(Event):
    """Signed distance to the VOF interface (reference:
    GfsVariableDistance, src/variable.c / levelset.c): host-side
    nearest-facet distance, sign from the local fraction."""

    def __init__(self, name: str, tracer: str, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableDistance({name})", **kw)
        self.var = name
        self.tracer = tracer

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics import vof
        grid = sim.cfg.grid
        fbc = dict(sim.cfg.vof_tracers)[self.tracer]
        T = np.asarray(sim.state[self.tracer])
        segs = vof.facets(sim.state[self.tracer], grid, fbc,
                          t=sim.time.t)
        x, y = [np.asarray(c) for c in grid.centers]
        if segs.shape[0] == 0:
            sim.state[self.var] = jnp.full(grid.shape, 1e30)
            return
        pts = np.concatenate([segs[:, :2], segs[:, 2:],
                              0.5 * (segs[:, :2] + segs[:, 2:])], 0)
        from scipy.spatial import cKDTree
        d, _ = cKDTree(pts).query(
            np.stack([x.ravel(), y.ravel()], -1))
        d = d.reshape(grid.shape)
        sign = np.where(T > 0.5, 1.0, -1.0)
        sim.state[self.var] = jnp.asarray(sign * d)


class EventSum(Event):
    """Time integral of an expression into a state variable (reference:
    GfsEventSum, src/event.c: sv += v * dt)."""

    def __init__(self, name: str, of, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"EventSum({name})", **kw)
        self.var = name
        self.of = of
        self._last_t = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        v = self.of(sim) if callable(self.of) else sim.state[self.of]
        dt = 0.0 if self._last_t is None else sim.time.t - self._last_t
        self._last_t = sim.time.t
        prev = sim.state.get(self.var)
        sim.state[self.var] = (v * 0.0 if prev is None else prev) + v * dt


class EventHarmonic(Event):
    """Running harmonic decomposition of a field at given angular
    frequencies: least-squares A_k, B_k of v ~ Z + sum A sin(w t) +
    B cos(w t), accumulated online (reference: GfsEventHarmonic,
    src/event.c — the M/rhs accumulation solved per fire)."""

    def __init__(self, v: str, omegas, prefix: str = None, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"EventHarmonic({v})", **kw)
        self.v = v
        self.om = list(omegas)
        self.prefix = prefix or v
        self.M = None
        self.rhs = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        import numpy as np
        tt = sim.time.t
        basis = [1.0] + [f(w * tt) for w in self.om
                         for f in (np.sin, np.cos)]
        b = np.asarray(basis)
        n = b.size
        if self.M is None:
            self.M = np.zeros((n, n))
            self.rhs = [0.0] * n
        self.M += np.outer(b, b)
        v = sim.state[self.v]
        for k in range(n):
            self.rhs[k] = self.rhs[k] + b[k] * v
        if np.linalg.matrix_rank(self.M) == n:
            import numpy.linalg as la
            Minv = la.inv(self.M)
            names = [f"{self.prefix}Z"] + [
                f"{self.prefix}{f}{k}" for k in range(len(self.om))
                for f in ("A", "B")]
            for r, nm in enumerate(names):
                acc = 0.0
                for c in range(n):
                    acc = acc + Minv[r, c] * self.rhs[c]
                sim.state[nm] = acc


class EventScript(Event):
    """Run a shell command at each firing; the simulation time/step are
    exported as $GFS_T / $GFS_I (reference: GfsEventScript,
    src/event.c)."""

    def __init__(self, command: str, **kw):
        super().__init__(name="EventScript", **kw)
        self.command = command
        self.returncodes = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        import os
        import subprocess
        env = dict(os.environ, GFS_T=str(sim.time.t), GFS_I=str(sim.time.i))
        self.returncodes.append(
            subprocess.call(self.command, shell=True, env=env))


class EventFilter(Event):
    """Apply the (1,2,1)/4 tensor filter to a variable on schedule
    (reference: GfsEventFilter, src/event.c + gfs_filter)."""

    def __init__(self, v: str, scale: int = 1, **kw):
        super().__init__(name=f"EventFilter({v})", **kw)
        self.v = v
        self.scale = scale

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..models.ns import filtered
        from ..core import bc as bcs
        fbc = bcs.default_scalar_bc(sim.cfg.grid.dim)
        sim.state[self.v] = filtered(sim.state[self.v], sim.cfg.grid,
                                     fbc, self.scale, t=sim.time.t)


class RemoveDroplets(Event):
    """Remove VOF droplets below a cell-count threshold (reference:
    GfsRemoveDroplets, src/event.c via gfs_domain_remove_droplets,
    src/domain.c:3727)."""

    def __init__(self, tracer: str, min_cells: int, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"RemoveDroplets({tracer})", **kw)
        self.tracer = tracer
        self.min_cells = min_cells

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics.droplets import remove_droplets
        sim.state[self.tracer] = remove_droplets(
            sim.state[self.tracer], sim.cfg.grid, self.min_cells)


def init_vorticity(omega, grid, u_bcs, params=None):
    """(U, V) whose curl is ``omega`` via the stream function:
    lap psi = -omega, u = dpsi/dy, v = -dpsi/dx (reference:
    GfsInitVorticity, src/init.c / utils: stream-function solve)."""
    import jax.numpy as jnp
    from ..core import bc as bcs
    from ..solvers import poisson

    fbc = bcs.FieldBC.uniform(bcs.Dirichlet(0.0), grid.dim)
    params = params or poisson.MultilevelParams(tolerance=1e-9,
                                               nitermax=60)
    psi, _ = poisson.solve(jnp.zeros(grid.shape, omega.dtype), -omega,
                           grid, fbc, params)
    pad = bcs.apply_bc(psi, grid, fbc, 1)
    h = grid.h
    U = (pad[1:-1, 2:] - pad[1:-1, :-2]) / (2 * h)
    V = -(pad[2:, 1:-1] - pad[:-2, 1:-1]) / (2 * h)
    return U, V


class VariableLaplacian(Event):
    """state[name] = Laplacian of a field (or of fn(sim)), re-evaluated
    every firing (reference: GfsVariableLaplacian,
    src/variable.c:1278-1330 — ghost BCs applied, then the same
    face-weighted operator as the Poisson solver)."""

    def __init__(self, name: str, of, fbc=None, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableLaplacian({name})", **kw)
        self.var = name
        self.of = of
        self.fbc = fbc

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..core import bc as bcs
        from ..ops.stencils import laplacian
        grid = sim.cfg.grid
        u = self.of(sim) if callable(self.of) else sim.state[self.of]
        fbc = self.fbc or bcs.default_scalar_bc(grid.dim)
        up = bcs.apply_bc(jnp.asarray(u), grid, fbc, t=sim.time.t)
        sim.state[self.var] = laplacian(up, grid)


class VariablePoisson(Event):
    """state[name] solves lap(v) = rhs each firing (reference:
    GfsVariablePoisson, src/variable.c:1127-1240 — the rhs function is
    rescaled per cell and handed to par.poisson_solve).  Pure-Neumann
    compatibility: the rhs mean is removed and the solution zero-meaned."""

    def __init__(self, name: str, rhs, params=None, fbc=None, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariablePoisson({name})", **kw)
        self.var = name
        self.rhs = rhs
        self.params = params
        self.fbc = fbc
        self.stats = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..core import bc as bcs
        from ..solvers import poisson
        grid = sim.cfg.grid
        if callable(self.rhs):
            r = self.rhs(sim)
        else:
            r = sim.state[self.rhs]
        r = jnp.asarray(r) + jnp.zeros(grid.shape)
        fbc = self.fbc or bcs.default_scalar_bc(grid.dim)
        if all(b.kind != bcs.DIRICHLET for s in fbc.sides for b in s):
            r = r - jnp.mean(r)
        u0 = sim.state.get(self.var, jnp.zeros(grid.shape)) + \
            jnp.zeros(grid.shape)
        params = self.params or poisson.MultilevelParams()
        sol, self.stats = poisson.solve(u0, r, grid, fbc, params,
                                        t=sim.time.t)
        if all(b.kind != bcs.DIRICHLET for s in fbc.sides for b in s):
            sol = sol - jnp.mean(sol)
        sim.state[self.var] = sol


class VariableResidual(Event):
    """Residual of the last approximate projection as a state field
    (reference: GfsVariableResidual, src/variable.c; filled by
    gfs_approximate_projection when present)."""

    def __init__(self, name: str = "Res", **kw):
        kw.setdefault("istep", 1)
        super().__init__(name=f"VariableResidual({name})", **kw)
        self.var = name

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..solvers import poisson
        from ..solvers import projection as proj
        cfg = sim.cfg
        grid = cfg.grid
        U = [sim.state[n] for n in ("U", "V", "W")[:grid.dim]]
        uf = proj.face_interpolated_velocity(U, grid, list(cfg.u_bcs),
                                             t=sim.time.t)
        from ..ops.stencils import divergence
        div = divergence(uf, grid)
        sim.state[self.var] = div
