"""Event scheduling (host-side orchestration).

TPU-native rebuild of the reference's event system
(reference: src/event.{h,c} — GfsEvent start/end/step/istep scheduling
event.h:32-51, gfs_event_next feeding timestep clamping event.c:46 +
src/simulation.c:1603-1616, EventStop steady-state detection
event.h:228-246).  Events run on the host between jitted steps, matching
the reference's split between orchestration and numerics.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class Event:
    """Fires at t >= start, then every ``step`` time units or ``istep``
    iterations, until ``end``.  start='end' fires once at simulation end."""
    action: Optional[Callable] = None     # action(sim) -> None
    start: float = 0.0
    end: float = math.inf
    step: Optional[float] = None
    istep: Optional[int] = None
    name: str = ""
    # internal
    _t_next: float = dataclasses.field(default=None, repr=False)
    _i_last: int = dataclasses.field(default=None, repr=False)
    at_end: bool = False

    def __post_init__(self):
        if self.start == "end":
            self.at_end = True
            self.start = math.inf
        if self.step is None and self.istep is None and not self.at_end:
            # one-shot at start
            self.istep = None

    def next_time(self, t: float) -> float:
        """Next firing time strictly after t (for timestep clamping).
        Reference: gfs_event_next src/event.c."""
        if self.at_end or self.step is None:
            return math.inf
        if t < self.start:
            return self.start
        n = math.floor((t - self.start) / self.step) + 1
        return self.start + n * self.step

    def should_fire(self, t: float, i: int) -> bool:
        if self.at_end:
            return False
        if t < self.start - 1e-12 or t > self.end:
            return False
        if self.istep is not None:
            if self._i_last is None or i - self._i_last >= self.istep:
                return True
            return False
        if self.step is not None:
            if self._t_next is None:
                self._t_next = max(self.start, t)
            return t >= self._t_next - 1e-9
        # one-shot
        return self._i_last is None

    def fire(self, sim, t: float, i: int):
        self._i_last = i
        if self.step is not None:
            if self._t_next is None:
                self._t_next = max(self.start, t)
            while self._t_next <= t + 1e-9:
                self._t_next += self.step
        if self.action is not None:
            self.action(sim)


class EventStop(Event):
    """Stop when max|v - v_prev| < tolerance, checking every ``istep``.
    Optionally stores the difference under ``diff_name``.
    Reference: src/event.h:228-246 GfsEventStop."""

    def __init__(self, var: str, tolerance: float, istep: int = 1,
                 diff_name: Optional[str] = None, **kw):
        super().__init__(istep=istep, name=f"EventStop({var})", **kw)
        self.var = var
        self.tolerance = tolerance
        self.diff_name = diff_name
        self._prev = None

    def fire(self, sim, t, i):
        super().fire(sim, t, i)
        if self.var in sim.state:
            v = sim.state[self.var]
            if isinstance(v, dict):
                # AMR per-level stack: compare at the finest level
                cur = np.asarray(sim.fine(self.var))
            else:
                cur = np.asarray(v)
        else:
            # derived variables (EventStop K 1e-5 DK on a
            # VariableCurvature, test/sessile/sessile.gfs) — sim_field
            # resolves curvature/Velocity/… names and maps NODATA to 0
            from .outputs import sim_field
            cur = np.asarray(sim_field(sim, self.var))
        if self.diff_name and self.diff_name not in sim.state:
            sim.state[self.diff_name] = np.zeros_like(cur)
        if self._prev is not None and cur.shape == self._prev.shape:
            dfield = np.abs(cur - self._prev)
            d = np.max(dfield)
            if self.diff_name:
                # the reference stores the per-cell change as a real
                # variable (gfs_event_stop, src/event.c) readable by
                # Output* — mirror that in state
                sim.state[self.diff_name] = dfield
                if not hasattr(sim, "diagnostics"):
                    sim.diagnostics = {}
                sim.diagnostics[self.diff_name] = d
            if d < self.tolerance:
                sim.stop = True
        elif self._prev is not None and self.diff_name:
            # shape changed (e.g. AMR resample): the stored per-cell
            # diff is stale — reset it to the new shape rather than
            # leaving the old-shape array in state
            sim.state[self.diff_name] = np.zeros_like(cur)
        self._prev = cur
