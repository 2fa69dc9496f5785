"""Output/observability events.

TPU-native rebuild of the reference's GfsOutput family
(reference: src/output.c — dynamic filenames gfs_format_new:70-267,
OutputScalarNorm/Stats/Sum, OutputErrorNorm:2791 (unbiased option),
OutputSimulation full checkpoint:1354-1564, OutputTime, OutputTiming
:772-830, OutputLocation probes, OutputPPM raster via src/graphic.c:600
gfs_write_ppm).

Checkpoints are a single .npz of the state pytree + time metadata (the
reference's checkpoint is the .gfs dump itself re-read by the parser;
ours is the state dict re-loadable into a Simulation — resume = load()).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time as _time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .events import Event
from ..core import bc as bcs_mod
from ..ops.stencils import norms, unbiased_error


import contextlib


@contextlib.contextmanager
def open_output(name, mode="a"):
    """Output stream for a GfsOutput file name: the names ``stdout`` /
    ``stderr`` are the streams themselves, anything else a file
    (reference: src/output.c gfs_output_open)."""
    if name == "stdout":
        yield sys.stdout
    elif name == "stderr":
        yield sys.stderr
    else:
        with open(name, mode) as f:
            yield f


def sim_field(sim, name):
    """Field at the finest resolution — uniform Simulation or
    AMRSimulation (which exposes ``fine``) — including the reference's
    derived variable names (Velocity/Velocity2/Vorticity/Divergence,
    src/variable.c gfs_derived_variables)."""
    get = (lambda n: sim.fine(n)) if hasattr(sim, "fine") \
        else (lambda n: sim.state[n])
    if name in ("Velocity", "Velocity2", "Vorticity", "Divergence"):
        from ..models.ns import velocity_names
        from ..ops import derived
        dim = sim.cfg.grid.dim
        U = [get(n) for n in velocity_names(dim)]
        if name == "Velocity2":
            return derived.velocity2(U)
        if name == "Velocity":
            return derived.velocity_norm(U)
        grid = sim.cfg.grid if not hasattr(sim, "fine") \
            else sim.topo.grid(sim.topo.lmax)
        if name == "Vorticity":
            return derived.vorticity(U, grid, list(sim.cfg.u_bcs),
                                     t=sim.time.t)
        from ..solvers.projection import face_interpolated_velocity
        from ..ops.stencils import divergence
        uf = face_interpolated_velocity(U, grid, list(sim.cfg.u_bcs),
                                        t=sim.time.t)
        # reference normalisation: cell-size-weighted flux sum / h
        return divergence(uf, grid)
    # curvature variables K (+Kmax) registered by VariableCurvature
    # (src/tension.c variable_curvature_from_fraction + diffuse passes)
    cvars = getattr(sim, "curvature_vars", None) or {}
    hit = None
    for kname, (tracer, kmax) in cvars.items():
        if name == kname:
            hit = (tracer, False)
        elif name == kmax:
            hit = (tracer, True)
    if hit is not None:
        from ..physics import vof as vofm
        from ..core import bc as _b
        tracer, want_kmax = hit
        grid = sim.cfg.grid if not hasattr(sim, "fine") \
            else sim.topo.grid(sim.topo.lmax)
        fbc = dict(sim.cfg.vof_tracers).get(
            tracer, _b.default_scalar_bc(grid.dim))
        T = get(tracer)
        kap = vofm.curvature(T, grid, fbc, t=sim.time.t)
        if want_kmax:
            # kmax: |kappa| diffused with the f(1-f) weighting
            # (diffuse_kmax, src/tension.c:540-565); in 2D the single
            # principal curvature makes kmax = |kappa|
            k = vofm.fill_curvature_weighted(jnp.abs(kap), jnp.asarray(T),
                                             niter=2)
            return jnp.where(jnp.isfinite(k), k, 0.0)
        kap = vofm.fill_curvature(kap, None, niter=2)
        return jnp.where(jnp.isfinite(kap), kap, 0.0)
    return get(name)


class OutputScalarNorm(Event):
    """L1/L2/Linf of a field or expression each firing.
    Reference: src/output.c OutputScalarNorm."""

    def __init__(self, v, file=None, sink: Optional[Callable] = None, **kw):
        super().__init__(name=f"OutputScalarNorm({v})", **kw)
        self.v = v
        self.file = file
        self.sink = sink
        self.rows = []

    def _value(self, sim):
        if callable(self.v):
            return self.v(sim)
        return sim_field(sim, self.v)

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        n = norms(self._value(sim))
        row = (sim.time.t, float(n["first"]), float(n["second"]),
               float(n["infty"]))
        self.rows.append(row)
        if self.sink:
            self.sink(sim, row)
        if self.file:
            with open_output(self.file) as f:
                f.write("%s time: %g first: %g second: %g infty: %g\n"
                        % (self.name, *row))


class OutputScalarSum(OutputScalarNorm):
    """Volume integral of a field/expression (src/output.c OutputScalarSum)."""

    def fire(self, sim, t, i):
        Event.fire(self, sim, t, i)
        v = self._value(sim)
        s = float(jnp.sum(v)) * sim.cfg.grid.cell_volume
        self.rows.append((sim.time.t, s))
        if self.sink:
            self.sink(sim, (sim.time.t, s))
        if self.file:
            with open_output(self.file) as f:
                f.write("%s time: %g sum: %.12g\n" % (self.name, sim.time.t, s))


class OutputErrorNorm(Event):
    """Norms of (field - reference solution), optionally unbiased.
    Reference: src/output.c:2791 OutputErrorNorm."""

    def __init__(self, v: str, solution: Callable, unbiased: bool = False,
                 relative: bool = False, file=None, **kw):
        super().__init__(name=f"OutputErrorNorm({v})", **kw)
        self.v = v
        self.solution = solution
        self.unbiased = unbiased
        self.relative = relative
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        grid = sim.cfg.grid
        exact = self.solution(*grid.centers, sim.time.t) \
            if self.solution.__code__.co_argcount >= grid.dim + 1 \
            else self.solution(*grid.centers)
        e = sim_field(sim, self.v) - exact
        if self.unbiased:
            e = unbiased_error(e)
        n = norms(e)
        if self.relative:
            # error norms relative to the norm of the exact solution
            # (src/output.c:2849 relative option)
            nref = norms(exact + jnp.zeros_like(e))
            n = {k: n[k] / max(float(nref[k]), 1e-300) for k in n}
        row = (sim.time.t, float(n["first"]), float(n["second"]),
               float(n["infty"]))
        self.rows.append(row)
        if self.file:
            with open_output(self.file) as f:
                f.write("%s time: %g first: %g second: %g infty: %g\n"
                        % (self.name, *row))


class OutputAdaptStats(Event):
    """Adaptive-mesh statistics: current/min/mean/max leaf counts and the
    compression ratio vs the uniform finest grid (src/output.c:660
    GfsOutputAdaptStats; cells created/removed become the leaf-count
    deltas of our depth-map swaps)."""

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputAdaptStats", **kw)
        self.file = file
        self.counts = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        if not hasattr(sim, "n_leaves"):     # uniform simulation
            n = int(np.prod(sim.cfg.grid.shape))
            uniform = n
        else:
            n = sim.n_leaves()
            topo = sim.topo
            uniform = int(np.prod(topo.grid(topo.lmax).shape))
        delta = n - self.counts[-1] if self.counts else 0
        self.counts.append(n)
        c = np.asarray(self.counts, float)
        line = ("Adaptive mesh refinement statistics\n"
                "  Cells changed: %10d\n"
                "  Number of cells\n"
                "    min: %10.0f avg: %10.3f max: %10.0f n: %10d\n"
                "  Compression vs uniform: %.3f\n"
                % (delta, c.min(), c.mean(), c.max(), len(c),
                   n / uniform))
        if self.file:
            with open_output(self.file) as f:
                f.write(line)
        else:
            sys.stderr.write(line)


class OutputBoundaries(Event):
    """Gnuplot segments of the domain outline and embedded-solid
    interface (src/output.c:1607 GfsOutputBoundaries via
    gfs_draw_refined_boundaries/gfs_draw_solid_boundaries)."""

    def __init__(self, file, **kw):
        super().__init__(name="OutputBoundaries", **kw)
        self.file = file

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        grid = sim.cfg.grid
        xf = np.asarray(grid.axis_faces(0))
        yf = np.asarray(grid.axis_faces(1))
        x0, x1, y0, y1 = xf[0], xf[-1], yf[0], yf[-1]
        with open_output(format_filename(self.file, sim), "w") as f:
            for (ax, ay), (bx, by) in (((x0, y0), (x1, y0)),
                                       ((x1, y0), (x1, y1)),
                                       ((x1, y1), (x0, y1)),
                                       ((x0, y1), (x0, y0))):
                f.write("%g %g\n%g %g\n\n" % (ax, ay, bx, by))
            if getattr(sim.cfg, "solid_phi", None) is not None \
                    and grid.dim == 2:
                from ..physics import vof as vofm
                from ..core import bc as bcs_m
                phi = sim.cfg.solid_phi
                T = vofm.fraction_from_levelset(
                    grid, lambda x, y, z=0.0, tt=0.0:
                    -phi(x, y, 0.0, sim.time.t))
                segs = vofm.facets(T, grid,
                                   bcs_m.default_scalar_bc(2))
                for sx0, sy0, sx1, sy1 in np.asarray(segs):
                    f.write("%g %g\n%g %g\n\n" % (sx0, sy0, sx1, sy1))


class OutputProgress(Event):
    """Percentage progress toward Time end/iend with a wall-clock rate
    estimate (src/output.c GfsOutputProgress)."""

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputProgress", **kw)
        self.file = file
        self.t0 = _time.time()

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        if math.isfinite(sim.time.end) and sim.time.end > 0:
            frac = sim.time.t / sim.time.end
        elif sim.time.iend < 2 ** 31 and sim.time.iend > 0:
            frac = sim.time.i / sim.time.iend
        else:
            frac = 0.0
        el = _time.time() - self.t0
        eta = el * (1.0 - frac) / frac if frac > 0 else float("inf")
        line = "%3.0f%% done, %.0f s elapsed, ETA %.0f s\n" \
            % (100.0 * frac, el, eta)
        if self.file:
            with open_output(self.file) as f:
                f.write(line)
        else:
            sys.stderr.write(line)


class OutputScalarMaxima(Event):
    """The N largest cell values of a scalar with their coordinates
    (src/output.c:2155 GfsOutputScalarMaxima; ours is the exact top-N
    rather than the reference's greedy single-pass insertion)."""

    def __init__(self, v: str, n: int = 1, file=None, **kw):
        super().__init__(name=f"OutputScalarMaxima({v})", **kw)
        self.v = v
        self.n = n
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        grid = sim.cfg.grid
        f = np.asarray(sim_field(sim, self.v))
        cs = [np.asarray(c) for c in grid.centers]
        flat = f.ravel()
        idx = np.argsort(flat)[::-1][:self.n]
        for k, j in enumerate(idx):
            pos = [float(c.ravel()[j]) for c in cs] + [0.0] * (3 - grid.dim)
            row = (sim.time.t, k, *pos, float(flat[j]))
            self.rows.append(row)
            if self.file:
                with open_output(self.file) as fp:
                    fp.write("%s time: %g #: %d x: %g y: %g z: %g "
                             "value: %g\n" % (self.name, *row))


class OutputGrd(Event):
    """ESRI ASCII raster of a 2D scalar (src/output.c:3404 GfsOutputGRD
    via gfs_write_grd: ncols/nrows/xllcorner/.../NODATA_value header,
    rows written north to south)."""

    NODATA = -9999.0

    def __init__(self, v: str, file, **kw):
        super().__init__(name=f"OutputGrd({v})", **kw)
        self.v = v
        self.file = file

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        grid = sim.cfg.grid
        assert grid.dim == 2, "GRD output is 2D"
        f = np.asarray(sim_field(sim, self.v), np.float64)
        f = np.where(np.isfinite(f), f, self.NODATA)
        nx, ny = f.shape
        x0 = float(np.asarray(grid.axis_faces(0))[0])
        y0 = float(np.asarray(grid.axis_faces(1))[0])
        with open_output(format_filename(self.file, sim), "w") as fp:
            fp.write("ncols          %d\n" % nx)
            fp.write("nrows          %d\n" % ny)
            fp.write("xllcorner      %g\n" % x0)
            fp.write("yllcorner      %g\n" % y0)
            fp.write("cellsize       %g\n" % grid.h)
            fp.write("NODATA_value  %g\n" % self.NODATA)
            # row 0 of the raster is the NORTHERN edge: j descending
            for j in range(ny - 1, -1, -1):
                fp.write(" ".join("%g" % f[ii, j]
                                  for ii in range(nx)) + "\n")


class OutputCorrelation(Event):
    """Weighted correlation of a field with a reference solution:
    sum(v * ref) / sum(ref^2), optionally with the bias (mean of
    v - ref) removed first.  Reference: src/output.c:3076
    GfsOutputCorrelation (volume weights are uniform on our grids so
    they cancel)."""

    def __init__(self, v: str, solution: Callable, unbiased: bool = False,
                 file=None, **kw):
        super().__init__(name=f"OutputCorrelation({v})", **kw)
        self.v = v
        self.solution = solution
        self.unbiased = unbiased
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        grid = sim.cfg.grid
        ref = self.solution(*grid.centers, sim.time.t) \
            if self.solution.__code__.co_argcount >= grid.dim + 1 \
            else self.solution(*grid.centers)
        v = sim_field(sim, self.v)
        if self.unbiased:
            v = v - jnp.mean(v - ref)
        sumref = float(jnp.sum(ref * ref))
        corr = float(jnp.sum(v * ref)) / sumref if sumref > 0.0 else 0.0
        self.rows.append((sim.time.t, corr))
        if self.file:
            with open_output(self.file) as f:
                f.write("%s time: %g %10.3e\n"
                        % (self.name, sim.time.t, corr))


class OutputSquares(Event):
    """OOGL dump of cells as colored squares (src/output.c:3181
    GfsOutputSquares via gfs_write_squares, src/graphic.c)."""

    def __init__(self, v: str, file, vmin=None, vmax=None, **kw):
        super().__init__(name=f"OutputSquares({v})", **kw)
        self.v = v
        self.file = file
        self.vmin = vmin
        self.vmax = vmax

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from .graphics import write_oogl
        write_oogl(format_filename(self.file, sim),
                   sim.cfg.grid, sim_field(sim, self.v),
                   vmin=self.vmin, vmax=self.vmax)


class OutputTime(Event):
    """Reference: src/output.c OutputTime (t, i, wall-clock)."""

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputTime", **kw)
        self.file = file
        self.t0 = _time.time()

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        line = ("step: %d t: %.6f dt: %g cpu: %.2f\n"
                % (sim.time.i, sim.time.t, sim.dt or 0.0,
                   _time.time() - self.t0))
        if self.file:
            with open_output(self.file) as f:
                f.write(line)
        else:
            sys.stderr.write(line)


class OutputLocation(Event):
    """Interpolated field values at probe points
    (src/output.c OutputLocation)."""

    def __init__(self, variables, points, file=None, **kw):
        super().__init__(name="OutputLocation", **kw)
        self.variables = variables
        self.points = np.atleast_2d(np.asarray(points, float))
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        vals = {v: np.atleast_1d(sim.interpolate(v, self.points))
                for v in self.variables}
        for k, pt in enumerate(self.points):
            row = [sim.time.t, *pt] + [float(vals[v][k])
                                       for v in self.variables]
            self.rows.append(row)
            if self.file:
                with open_output(self.file) as f:
                    f.write(" ".join("%g" % x for x in row) + "\n")


class OutputSimulation(Event):
    """Full checkpoint: state + time metadata as .npz
    (reference: src/output.c:1354-1564 OutputSimulation — the dump IS the
    restart file there; here ``load`` restores into a Simulation)."""

    def __init__(self, file: str, **kw):
        super().__init__(name="OutputSimulation", **kw)
        self.file = file

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        save_checkpoint(self.file.format(t=sim.time.t, i=sim.time.i), sim)


def save_checkpoint(path: str, sim):
    """Uniform sims store {name: array}; AMR sims store every level as
    ``name@level`` plus the depth map (bit-exact multi-level resume,
    mirroring the reference's tree dump, src/output.c:1354).

    A path ending in ``.gfs`` (the reference's OutputSimulation
    convention — end.gfs dumps are themselves runnable .gfs files,
    src/output.c:1354-1564) writes a RE-PARSEABLE text dump: the
    original config source with an ``InitCheckpoint <sidecar>``
    directive injected, plus the state arrays in ``<path>.npz``.
    ``parse_gfs(open(path)) -> build_simulation -> run`` resumes."""
    if path.endswith(".gfs") and getattr(sim, "gfs_source", None):
        text, defines = sim.gfs_source
        _save_gfs_text(path, text, defines, sim)
        path = path + ".npz"
    amr = hasattr(sim, "topo")
    if amr:
        # flat (non-stack) entries — e.g. an EventStop diff field —
        # live at the finest level
        arrays = {f"{k}@{l}": np.asarray(v)
                  for k, stack in sim.state.items()
                  for l, v in (stack.items() if isinstance(stack, dict)
                               else ((sim.topo.lmax, stack),))}
        arrays["__depth__"] = np.asarray(sim.depth)
    else:
        arrays = {k: np.asarray(v) for k, v in sim.state.items()}
    meta = {"t": sim.time.t, "i": sim.time.i, "end": sim.time.end,
            "iend": min(sim.time.iend, 2 ** 31), "dtmax": sim.time.dtmax
            if math.isfinite(sim.time.dtmax) else -1.0, "amr": amr}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def _save_gfs_text(path: str, text: str, defines: dict, sim):
    """Write the re-parseable .gfs dump: original source with any prior
    InitCheckpoint removed, -D defines materialised as Define lines, and
    an InitCheckpoint directive injected after the simulation block's
    opening brace."""
    import re as _re
    text = _re.sub(r"^\s*InitCheckpoint\s+\S+\s*$", "", text,
                   flags=_re.MULTILINE)
    # the header line is "NB NE GfsClass GfsBox GfsGEdge {...} {"; the
    # simulation parameter block is the NEXT '{' after the GfsGEdge block
    m = _re.search(r"(GfsGEdge\s*\{[^}]*\}\s*\{)", text)
    inj = f"\n    InitCheckpoint {path}.npz\n"
    if m:
        text = text[:m.end()] + inj + text[m.end():]
    else:
        text = inj + text
    header = "".join(f"Define {k} {v}\n" for k, v in defines.items()
                     if _re.match(r"^\w+$", str(k)))
    with open(path, "w") as f:
        f.write(header + text)


def load_checkpoint(path: str, sim):
    """Restore state+time into an existing Simulation (resume = run())."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta.get("amr"):
        state = {}
        for k in data.files:
            if k in ("__meta__", "__depth__"):
                continue
            name, l = k.rsplit("@", 1)
            state.setdefault(name, {})[int(l)] = jnp.asarray(data[k])
        sim.state = state
        sim.depth = np.asarray(data["__depth__"])
        sim.leaf = sim._masks_from_depth(sim.depth)
    else:
        sim.state = {k: jnp.asarray(data[k]) for k in data.files
                     if k != "__meta__"}
    sim.time.t = meta["t"]
    sim.time.i = meta["i"]
    if meta["dtmax"] > 0:
        sim.time.dtmax = meta["dtmax"]
    return sim


class OutputPPM(Event):
    """Colormapped PPM raster of a scalar field (reference:
    src/graphic.c:600 gfs_write_ppm via src/output.c OutputPPM)."""

    def __init__(self, v, file: str, vmin=None, vmax=None, **kw):
        super().__init__(name=f"OutputPPM({v})", **kw)
        self.v = v
        self.file = file
        self.vmin = vmin
        self.vmax = vmax

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        f = np.asarray(self._value(sim)) if callable(self.v) else \
            np.asarray(sim_field(sim, self.v))
        write_ppm(self.file.format(t=sim.time.t, i=sim.time.i), f,
                  self.vmin, self.vmax)

    def _value(self, sim):
        return self.v(sim)


def write_ppm(path: str, f: np.ndarray, vmin=None, vmax=None):
    """Jet-like colormap PPM (the reference's default colormap,
    src/graphic.c)."""
    vmin = float(np.min(f)) if vmin is None else vmin
    vmax = float(np.max(f)) if vmax is None else vmax
    x = (f - vmin) / max(vmax - vmin, 1e-300)
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    img = (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)
    # image convention: y up -> row 0 at top
    img = np.transpose(img, (1, 0, 2))[::-1]
    with open(path, "wb") as fp:
        fp.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        fp.write(img.tobytes())


class OutputProjectionStats(Event):
    """Projection residual report: recompute the MAC divergence residual of
    the current centred field (reference: src/output.c
    OutputProjectionStats printing niter + residual norms via
    gfs_multilevel_params_stats_write src/poisson.c:142)."""

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputProjectionStats", **kw)
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..solvers.projection import face_interpolated_velocity
        from ..ops.stencils import divergence
        from ..models import ns as _ns

        grid = sim.cfg.grid
        U = [sim_field(sim, n) for n in _ns.velocity_names(grid.dim)]
        uf = face_interpolated_velocity(U, grid, list(sim.cfg.u_bcs),
                                        t=sim.time.t)
        div = divergence(uf, grid)
        n = norms(div)
        row = (sim.time.t, float(n["first"]), float(n["second"]),
               float(n["infty"]))
        self.rows.append(row)
        line = ("residual.infty: %g first: %g second: %g t: %g\n"
                % (row[3], row[1], row[2], row[0]))
        if self.file:
            with open_output(self.file) as f:
                f.write(line)
        else:
            sys.stderr.write(line)


class OutputDropletSums(Event):
    """Per-droplet volume sums of a VOF tracer (reference: src/output.c
    OutputDropletSums via gfs_domain_tag_droplets)."""

    def __init__(self, v: str, file=None, **kw):
        super().__init__(name=f"OutputDropletSums({v})", **kw)
        self.v = v
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics import droplets

        grid = sim.cfg.grid
        T = sim_field(sim, self.v)
        labels, n = droplets.tag_droplets(T)
        counts, vol, cent, _ = droplets.droplet_stats(T, labels, n, grid)
        for k in range(n):
            row = (sim.time.t, k + 1, float(vol[k]))
            self.rows.append(row)
            if self.file:
                with open_output(self.file) as f:
                    f.write("%g %d %.12g\n" % row)


class OutputTiming(Event):
    """Performance report from the simulation's timer registry
    (reference: src/output.c:772-830 OutputTiming + the per-phase timer
    hash src/domain.h:50-61)."""

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputTiming", **kw)
        self.file = file

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        lines = ["# Timing summary (seconds)"]
        for name, (total, count) in sorted(
                getattr(sim, "timers", {}).items(),
                key=lambda kv: -kv[1][0]):
            lines.append("  %-28s %10.3f  (%d calls, %.2f ms/call)"
                         % (name, total, count, 1e3 * total / max(count, 1)))
        text = "\n".join(lines) + "\n"
        if self.file:
            with open_output(self.file) as f:
                f.write(text)
        else:
            sys.stderr.write(text)


def format_filename(name: str, sim) -> str:
    """Dynamic output filenames: C printf patterns formatted with the
    simulation step (%ld / %d / %i) or time (%g / %f / %e) — reference:
    src/output.c:175-213 (format_string, one variable per pattern)."""
    if name is None or "%" not in name:
        return name
    out = []
    i = 0
    while i < len(name):
        ch = name[i]
        if ch == "%" and i + 1 < len(name):
            j = i + 1
            while j < len(name) and name[j] in "0123456789.-+l#":
                j += 1
            conv = name[j] if j < len(name) else ""
            spec = name[i:j + 1].replace("l", "")
            if conv in "di":
                out.append(spec % sim.time.i)
                i = j + 1
                continue
            if conv in "gfe":
                out.append(spec % sim.time.t)
                i = j + 1
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class OutputSolidForce(Event):
    """Net pressure + viscous force (and moments) exerted by the fluid on
    the embedded solid (reference: src/output.c:902-990 OutputSolidForce +
    gfs_domain_solid_force src/domain.c:3502-3545).

    Per mixed cell the solid-surface area vector follows from closure of
    the cell boundary: A_s n_s = -(sum of fluid face fractions * n) h, with
    n_s pointing out of the fluid (into the solid); then
    F_p = sum p A_s n_s and F_v = -sum mu (grad u + grad u^T) . A_s n_s.
    """

    def __init__(self, file=None, **kw):
        super().__init__(name="OutputSolidForce", **kw)
        self.file = file
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics import solid as solidm
        from ..models import ns as nsm
        cfg = sim.cfg
        grid = cfg.grid
        assert grid.dim == 2 and cfg.solid_phi is not None
        a, (sx, sy) = solidm.solid_fractions(grid, cfg.solid_phi)
        h = grid.h
        # solid-surface area vector per cell (2D: length vector)
        nsx = -(sx[1:, :] - sx[:-1, :]) * h
        nsy = -(sy[:, 1:] - sy[:, :-1]) * h
        mixed = (a > 0.0) & (a < 1.0)
        p = sim_field(sim, "P")
        fpx = float(jnp.sum(jnp.where(mixed, p * nsx, 0.0)))
        fpy = float(jnp.sum(jnp.where(mixed, p * nsy, 0.0)))
        x, y = grid.centers
        mp = float(jnp.sum(jnp.where(mixed, x * p * nsy - y * p * nsx, 0.0)))
        fvx = fvy = mv = 0.0
        if cfg.nu > 0.0:
            from ..ops.stencils import center_gradient
            U = [sim_field(sim, n) for n in nsm.velocity_names(2)]
            g = []
            for c in range(2):
                pad = bcs_mod.apply_bc(U[c], grid, cfg.u_bcs[c], 1,
                                       t=sim.time.t)
                g.append([center_gradient(pad, grid, ax) for ax in range(2)])
            # deviatoric stress 2 mu D, traction = stress . n_s
            txx = 2.0 * cfg.nu * g[0][0]
            tyy = 2.0 * cfg.nu * g[1][1]
            txy = cfg.nu * (g[0][1] + g[1][0])
            fvx = -float(jnp.sum(jnp.where(mixed, txx * nsx + txy * nsy, 0.0)))
            fvy = -float(jnp.sum(jnp.where(mixed, txy * nsx + tyy * nsy, 0.0)))
            mv = -float(jnp.sum(jnp.where(
                mixed, x * (txy * nsx + tyy * nsy)
                - y * (txx * nsx + txy * nsy), 0.0)))
        row = (sim.time.t, fpx, fpy, fvx, fvy, mp, mv)
        self.rows.append(row)
        if self.file:
            with open_output(format_filename(self.file, sim)) as f:
                f.write(" ".join("%g" % v for v in row) + "\n")


class OutputScalarHistogram(Event):
    """Volume-weighted histogram of a field (reference:
    src/output.c:2273-2450 OutputScalarHistogram: n bins, optional weight
    and y-mean functions)."""

    def __init__(self, v, n: int = 20, vmin=None, vmax=None, w=None, y=None,
                 file=None, **kw):
        super().__init__(name=f"OutputScalarHistogram({v})", **kw)
        self.v, self.n, self.vmin, self.vmax = v, n, vmin, vmax
        self.w, self.y = w, y
        self.file = file
        self.last = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        vals = np.asarray(self.v(sim) if callable(self.v)
                          else sim_field(sim, self.v)).ravel()
        lo = self.vmin if self.vmin is not None else vals.min()
        hi = self.vmax if self.vmax is not None else vals.max()
        w = None
        if self.w is not None:
            w = np.asarray(self.w(sim)).ravel()
        counts, edges = np.histogram(vals, bins=self.n, range=(lo, hi),
                                     weights=w)
        centers = 0.5 * (edges[:-1] + edges[1:])
        rows = [centers, counts]
        if self.y is not None:
            yv = np.asarray(self.y(sim)).ravel()
            ysum, _ = np.histogram(vals, bins=self.n, range=(lo, hi),
                                   weights=yv if w is None else yv * w)
            rows.append(ysum / np.maximum(counts, 1e-300))
        self.last = np.stack(rows, axis=-1)
        if self.file:
            with open_output(format_filename(self.file, sim)) as f:
                for r in self.last:
                    f.write(" ".join("%g" % x for x in r) + "\n")
                f.write("\n")


class OutputVTK(Event):
    """Full-state VTK export (reference: gfs_domain_write_vtk,
    src/unstructured.c:641)."""

    def __init__(self, file: str, **kw):
        super().__init__(name="OutputVTK", **kw)
        self.file = file

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from . import graphics as gfx
        grid = sim.cfg.grid
        scalars = {k: v for k, v in sim.state.items()
                   if hasattr(v, "shape") and tuple(v.shape)
                   == tuple(grid.shape)}
        vec = None
        if "U" in scalars and "V" in scalars:
            vec = {"Velocity": (scalars.pop("U"), scalars.pop("V"))}
        gfx.write_vtk(format_filename(self.file, sim), grid, scalars, vec)


class OutputStreamline(Event):
    """Streamlines seeded on a uniform grid (reference:
    gfs_streamline_new + OutputStreamline, src/graphic.c:2032-2107)."""

    def __init__(self, file=None, nseeds: int = 8, **kw):
        super().__init__(name="OutputStreamline", **kw)
        self.file = file
        self.nseeds = nseeds
        self.lines = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from . import graphics as gfx
        grid = sim.cfg.grid
        o = grid.origin
        L = grid.shape[0] * grid.h
        n = self.nseeds
        seeds = [(o[0] + (a + 0.5) * L / n, o[1] + (b + 0.5) * L / n)
                 for a in range(n) for b in range(n)]
        self.lines = gfx.streamlines(sim.state["U"], sim.state["V"],
                                     grid, seeds)
        if self.file:
            fp, close = gfx.open_sink(self.file, sim)
            for ln in self.lines:
                for x, y in ln:
                    fp.write(f"{x} {y}\n")
                fp.write("\n")
            close()


class OutputInterface(Event):
    """PLIC interface facets of a VOF tracer as line segments
    (reference: src/output.c OutputInterface via gfs_vof_facet,
    src/vof.c:2088-2158).  Rows: t x1 y1 x2 y2 per facet."""

    def __init__(self, tracer: str = "T", file=None, **kw):
        super().__init__(name=f"OutputInterface({tracer})", **kw)
        self.tracer = tracer
        self.file = file
        self.segments = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        from ..physics import vof
        grid = sim.cfg.grid if not hasattr(sim, "fine") \
            else sim.topo.grid(sim.topo.lmax)
        fbc = dict(sim.cfg.vof_tracers)[self.tracer]
        T = sim_field(sim, self.tracer)
        self.segments = np.asarray(vof.facets(T, grid, fbc))
        if self.file:
            with open_output(format_filename(self.file, sim)) as f:
                for x1, y1, x2, y2 in self.segments:
                    f.write("%g %g %g %g %g\n" % (sim.time.t, x1, y1, x2, y2))


class OutputParticleList(Event):
    """Per-particle state lines of a named GfsParticleList
    (gfs_output_particle_list_event, modules/particulatecommon.c:2695:
    one OutputLocation-style line per particle).  Columns:
    t id x y [z] vx vy [vz]."""

    def __init__(self, plist_name, file=None, sink=None, **kw):
        super().__init__(name=f"OutputParticleList({plist_name})", **kw)
        self.plist_name = plist_name
        self.file = file
        self.sink = sink
        self.rows = []

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        psys = next((p for p in sim.particle_systems
                     if getattr(p, "name", None) == self.plist_name),
                    None)
        if psys is None and sim.particle_systems:
            psys = sim.particle_systems[0]
        if psys is None:
            return
        st = psys.state
        alive = np.asarray(st["alive"])
        pos = np.asarray(st["pos"])
        vel = np.asarray(st["vel"])
        pid = np.asarray(st.get("pid", np.arange(len(alive))))
        lines = []
        for k in np.nonzero(alive)[0]:
            row = (sim.time.t, int(pid[k]), *pos[k], *vel[k])
            self.rows.append(row)
            lines.append(" ".join("%g" % x for x in row))
        if self.sink:
            self.sink(sim, self.rows)
        if self.file:
            with open_output(self.file) as f:
                f.write("\n".join(lines) + "\n")


class OutputSpectra(Event):
    """Shell-integrated power spectrum of one variable
    (GfsOutputSpectra, modules/fft.c:1168 + write_spectra:1049).
    Columns per firing: k E(k)."""

    def __init__(self, v, file=None, sink=None, **kw):
        super().__init__(name=f"OutputSpectra({v})", **kw)
        self.v = v
        self.file = file
        self.sink = sink
        self.last = None

    def _spectrum(self, sim):
        from ..spectral import fft as sfft
        f = sim_field(sim, self.v)
        return sfft.scalar_spectrum(f, sim.cfg.grid)

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        k, E = self._spectrum(sim)
        self.last = (np.asarray(k), np.asarray(E))
        if self.sink:
            self.sink(sim, self.last)
        if self.file:
            with open_output(self.file) as f:
                f.write("# t = %g\n" % sim.time.t)
                for kk, ee in zip(*self.last):
                    f.write("%g %g\n" % (kk, ee))


class OutputEnergySpectra(OutputSpectra):
    """Kinetic-energy spectrum E(k) of the velocity field
    (GfsOutputEnergySpectra, modules/fft.c:1476)."""

    def __init__(self, file=None, sink=None, **kw):
        Event.__init__(self, name="OutputEnergySpectra", **kw)
        self.v = "Velocity"
        self.file = file
        self.sink = sink
        self.last = None

    def _spectrum(self, sim):
        from ..spectral import fft as sfft
        from ..models.ns import velocity_names
        U = [sim_field(sim, n)
             for n in velocity_names(sim.cfg.grid.dim)]
        return sfft.energy_spectrum(U, sim.cfg.grid)
