"""Host-side simulation driver (the GfsSimulation run loop).

TPU-native rebuild of the reference's driver
(reference: src/simulation.c — simulation_run:432-557, set_timestep
:1569-1640 with event-time snapping, run-loop event dispatch).  The
numerics are jitted pure functions (models/ns.py); this class owns time,
events, and diagnostics on the host.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core import bc as bcs
from . import ns
from ..events.events import Event


@dataclasses.dataclass
class Time:
    """Reference: src/simulation.h GfsTime {t, i, end, iend, dtmax}."""
    t: float = 0.0
    i: int = 0
    end: float = math.inf
    iend: int = 2 ** 31
    dtmax: float = math.inf


class Simulation:
    """Incompressible NS simulation on a uniform grid.

    Usage:
        sim = Simulation(cfg, time=Time(end=300), events=[...])
        sim.init(U=..., V=...)
        sim.run()
    """

    def __init__(self, cfg: ns.NSConfig, time: Time = None, events=None,
                 particle_systems=None):
        self.cfg = cfg
        self.time = time or Time()
        self.events = list(events or [])
        self.particle_systems = list(particle_systems or [])
        self.state = {}
        self.prev_state = None
        self.diagnostics = {}
        self.stop = False
        self.dt = None
        self._tnext = None
        # named wall-clock timers (reference: gfs_domain_timer_start/stop
        # hash, src/domain.h:50-61; reported by OutputTiming)
        self.timers = {}

    def _timed(self, name, fn, *args, **kw):
        import time as _t
        t0 = _t.perf_counter()
        out = fn(*args, **kw)
        try:
            import jax
            jax.block_until_ready(out)
        except Exception:
            pass
        total, count = self.timers.get(name, (0.0, 0))
        self.timers[name] = (total + _t.perf_counter() - t0, count + 1)
        return out

    # -- setup ---------------------------------------------------------------
    def init(self, **fields):
        grid = self.cfg.grid
        zeros = jnp.zeros(grid.shape)
        names = list(ns.velocity_names(grid.dim)) + ["P", "Pmac"] + \
            [tr[0] for tr in self.cfg.tracers] + \
            [tr[0] for tr in self.cfg.vof_tracers]
        if self.cfg.advection.gc:
            names += list(ns.gradient_names(grid.dim))
        if self.cfg.particle_coupling:
            names += ["PF" + ax for ax in ("x", "y", "z")[:grid.dim]]
        for n in names:
            v = fields.get(n, zeros)
            if callable(v):
                v = v(*grid.centers)
            self.state[n] = jnp.asarray(v) + zeros
        return self

    # -- timestep control ----------------------------------------------------
    def set_timestep(self):
        """Reference: gfs_simulation_set_timestep src/simulation.c:1569."""
        ts = float(ns.timescale(self.state, self.cfg))
        cfl = self.cfg.advection.cfl
        if self.cfg.vof_tracers:
            # VOF sweeps require CFL <= 0.5 (reference: src/vof.c:1654)
            cfl = min(cfl, 0.45)
        dt = cfl * ts
        dt = min(dt, self.time.dtmax)
        # capillary stability (reference: src/tension.c:106-137)
        for name, sigma in self.cfg.tension:
            from ..physics.tension import stability_dt
            r1, r2 = (1.0, 1.0) if self.cfg.density is None else \
                (self.cfg.density[1], self.cfg.density[2])
            dt = min(dt, stability_dt(self.cfg.grid, sigma, r1, r2))
        # snap to the next event time (event.c gfs_event_next + ceil split)
        t = self.time.t
        tnext = min((e.next_time(t) for e in self.events), default=math.inf)
        tnext = min(tnext + 1e-9 if tnext < math.inf else tnext, math.inf)
        if self.time.end < tnext:
            tnext = self.time.end
        if tnext < math.inf:
            n = max(1.0, math.ceil((tnext - t) / dt))
            if n < 2 ** 31:
                dt = (tnext - t) / n
                self._tnext = tnext if n == 1 else t + dt
            else:
                self._tnext = t + dt
        else:
            self._tnext = t + dt
        self.dt = max(dt, 1e-9)

    # -- event dispatch --------------------------------------------------
    def do_events(self):
        for e in self.events:
            if e.should_fire(self.time.t, self.time.i):
                e.fire(self, self.time.t, self.time.i)

    def do_end_events(self):
        for e in self.events:
            if e.at_end:
                e.fire(self, self.time.t, self.time.i)

    # -- numerics hooks (overridden by SkewSimulation & friends) ----------
    def _initial_projection(self):
        self.state = ns.initial_projection(self.state, self.dt,
                                           self.time.t, self.cfg)

    def _advance(self):
        cfg = self.cfg
        self.state = self._timed(
            "step", ns.ns_step, self.state, self.dt, self.time.t, cfg,
            cstart=self.time.i % cfg.grid.dim,
            first_step=(self.time.i == 0))

    # -- main loop -------------------------------------------------------
    def run(self, max_steps: Optional[int] = None):
        """Reference: simulation_run src/simulation.c:432-557."""
        cfg = self.cfg
        self.set_timestep()
        if self.time.i == 0:
            self._initial_projection()
            self.set_timestep()
        steps = 0
        while (self.time.t < self.time.end and self.time.i < self.time.iend
               and not self.stop):
            self.do_events()
            if self.stop:
                break
            # particle/bubble systems advance in the event phase with the
            # current fields (reference: GfsParticleList event,
            # modules/particulatecommon.c:955-1010)
            for psys in self.particle_systems:
                psys.step(self)
            self.prev_state = {n: self.state[n]
                               for n in ns.velocity_names(cfg.grid.dim)}
            self._advance()
            self.time.t = self._tnext
            self.time.i += 1
            self.set_timestep()
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        self.do_events()
        self.do_end_events()
        return self

    # -- probing ----------------------------------------------------------
    def field_bc(self, name: str) -> bcs.FieldBC:
        names = ns.velocity_names(self.cfg.grid.dim)
        if name in names:
            return self.cfg.u_bcs[names.index(name)]
        if name in ("P", "Pmac"):
            return self.cfg.p_bc
        for tr in self.cfg.tracers:
            if tr[0] == name:
                return tr[1]
        return bcs.default_scalar_bc(self.cfg.grid.dim)

    def interpolate(self, name: str, points):
        """Bilinear interpolation of a cell field at physical points,
        boundary-aware: the field is first padded with BC ghost cells so
        points on (or near) the domain boundary honour the BC value —
        matching the reference, whose interpolation sees ghost-cell values
        (gfs_interpolate src/fluid.c:2697; OutputLocation src/output.c).
        """
        grid = self.cfg.grid
        f = np.asarray(bcs.apply_bc(self.state[name], grid,
                                    self.field_bc(name), 1, t=self.time.t))
        pts = np.atleast_2d(np.asarray(points, dtype=float))
        out = np.empty(pts.shape[0])
        for k, pt in enumerate(pts):
            idx = []
            w = []
            for a in range(grid.dim):
                # padded grid: cell i at origin + (i - 0.5) h, i in [0, n+1]
                x = (pt[a] - grid.origin[a]) / grid.h + 0.5
                i0 = int(np.floor(x))
                fr = x - i0
                i0c = min(max(i0, 0), grid.shape[a] + 1)
                i1c = min(max(i0 + 1, 0), grid.shape[a] + 1)
                idx.append((i0c, i1c))
                w.append(fr)
            val = 0.0
            for corner in range(2 ** grid.dim):
                wt = 1.0
                ii = []
                for a in range(grid.dim):
                    b = (corner >> a) & 1
                    wt *= w[a] if b else (1.0 - w[a])
                    ii.append(idx[a][b])
                val += wt * f[tuple(ii)]
            out[k] = val
        return out if out.size > 1 else float(out[0])
