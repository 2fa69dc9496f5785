"""Culvert hydraulics + point-to-point pipe discharge for GfsRiver.

TPU-native rebuild of the reference's culvert module
(reference: modules/culvert.c:1-176 over modules/culvert/boyd87.c, and
the GfsSourcePipe base in src/river.c:1737-1900).  The hydraulic model
is Boyd (1987), "Generalised Head-Discharge Equations for Culverts":
inlet control (Section 4.3 equations 9-10), outlet control via the
Bernoulli/Manning balance (Section 5 equations 11-12) iterated with the
critical-depth outlet level, and the working discharge = min(inlet,
outlet).  All per-pipe scalar hydraulics run on the host (one culvert =
one number per step); only the +/- discharge application touches device
arrays — the same split as the reference's per-event tree traversal.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..events.events import Event

MAX_ITER = 50


# ---------------------------------------------------------------------------
# Boyd (1987) generalised head-discharge equations (modules/culvert/boyd87.c)
# ---------------------------------------------------------------------------

def dc_box(B, Q):
    """Critical depth in a box culvert (eq. 1)."""
    return 0.4672 * (Q / B) ** 0.667 if Q > 0.0 else 0.0


def dc_pipe(D, Q, g):
    """Critical depth in a circular culvert (eq. 4a/4b)."""
    if Q <= 0.0:
        return 0.0
    dc = D * ((Q / math.sqrt(g) * D ** 2.5) / 1.26) ** (1.0 / 3.75)
    if dc / D < 0.85:
        dc = D * ((Q / math.sqrt(g) * D ** 2.5) / 0.95) ** (1.0 / 1.95)
    return dc


def Q_inlet_box(HW, B, D, entrance, g):
    """Box culvert, inlet control (eq. 9a-9d)."""
    if HW <= 0.0:
        return 0.0
    if entrance == 2:      # wingwall flare 90 and 15 degrees
        HW = D * (HW / D / 1.09) ** (1.0 / 0.99)
    elif entrance == 3:    # wingwall flare 0 degrees
        HW = D * (HW / D / 1.07) ** (1.0 / 1.08)
    if HW / D < 1.35:      # inlet not submerged
        return 0.544 * math.sqrt(g) * B * HW ** 1.50
    return 0.702 * math.sqrt(g) * B * D ** 0.89 * HW ** 0.61


def Q_inlet_pipe(HW, D, entrance, g):
    """Circular culvert, inlet control (eq. 10a-10d)."""
    if HW <= 0.0:
        return 0.0
    if entrance == 2:      # groove end with headwall
        HW = D * (HW / D / 0.92) ** (1.0 / 0.90)
    elif entrance == 3:    # groove end projecting
        HW = D * (HW / D / 0.91) ** (1.0 / 0.94)
    if HW / D < 1.2:       # inlet not submerged
        return 0.421 * math.sqrt(g) * D ** 0.87 * HW ** 1.63
    return 0.530 * math.sqrt(g) * D ** 1.87 * HW ** 0.63


def _Q_bernoulli(HW, TW, area, Rh, S0, L, n, ke, g):
    """Outlet-control Bernoulli/Manning balance (eq. 11, 12a)."""
    if area <= 0.0 or Rh <= 0.0:
        return 0.0
    v2 = 2.0 * g * abs(HW + S0 * L - TW) / (
        ke + 1.0 + 2.0 * g * n * n * L / Rh ** 1.333)
    return area * math.sqrt(v2)


def _close_enough(Q0, Q):
    return abs(Q - Q0) < 1e-3 or (Q0 > 1e-3 and abs(Q - Q0) / Q0 < 5e-2)


def Q_outlet_box(HW, TW, B, D, S0, L, n, ke, g):
    """Box culvert, outlet control (Section 5 iteration)."""
    area = B * D
    Rh = B * D / (2.0 * (B + D))
    Q = _Q_bernoulli(HW, TW, area, Rh, S0, L, n, ke, g)
    if TW > D:             # outlet submerged
        return Q
    # exact do/while(nmax-- && !close) semantics: the fixed point can be
    # a limit cycle, so the returned value is iteration-count sensitive
    # and must match the reference bit-for-bit (modules/culvert/boyd87.c)
    nmax = MAX_ITER
    while True:
        dc = dc_box(B, Q)
        h0 = min(max((dc + D) / 2.0, TW), D)
        Q0 = Q
        area = B * h0
        Rh = B * h0 / (B + 2.0 * h0) if h0 > 0.0 else 0.0
        Q = _Q_bernoulli(HW, h0, area, Rh, S0, L, n, ke, g)
        old = nmax
        nmax -= 1
        if old == 0 or _close_enough(Q0, Q):
            break
    return Q


def Q_outlet_pipe(HW, TW, D, S0, L, n, ke, g):
    """Circular culvert, outlet control (Section 5 iteration with the
    circular-segment geometry, eq. 3a-3c)."""
    area = math.pi * D * D / 4.0
    Rh = D / 4.0
    Q = _Q_bernoulli(HW, TW, area, Rh, S0, L, n, ke, g)
    if TW > D:
        return Q
    nmax = MAX_ITER
    while True:
        dc = dc_pipe(D, Q, g)
        h0 = min(max((dc + D) / 2.0, TW), D)
        Q0 = Q
        theta = math.acos(max(-1.0, min(1.0, 1.0 - 2.0 * h0 / D)))
        B = D * math.sin(theta)
        area = D * D * (theta - math.sin(2.0 * theta) / 2.0) / 4.0
        perimeter = B + theta * D
        Rh = area / perimeter if perimeter > 0.0 else 0.0
        Q = _Q_bernoulli(HW, h0, area, Rh, S0, L, n, ke, g)
        old = nmax
        nmax -= 1
        if old == 0 or _close_enough(Q0, Q):
            break
    return Q


def Q_box(HW, TW, B, D, entrance, S0, L, n, ke, g):
    """Working box-culvert discharge = min(inlet, outlet) control."""
    return min(Q_outlet_box(HW, TW, B, D, S0, L, n, ke, g),
               Q_inlet_box(HW, B, D, entrance, g))


def Q_pipe(HW, TW, D, entrance, S0, L, n, ke, g):
    """Working circular-culvert discharge = min(inlet, outlet)."""
    return min(Q_outlet_pipe(HW, TW, D, S0, L, n, ke, g),
               Q_inlet_pipe(HW, D, entrance, g))


# ---------------------------------------------------------------------------
# SourcePipe / SourceCulvert events on RiverSimulation
# ---------------------------------------------------------------------------

class SourcePipe(Event):
    """Point-to-point discharge on a GfsRiver water column
    (GfsSourcePipe, src/river.c:1737-1900): each step the discharge Q
    through the pipe between ``start`` and ``end`` is found by
    secant-bisection on Q = flow_rate(h - Q/a1, h + Q/a2) — the
    implicit coupling that keeps the source stable when the cells are
    small — then +/- Q dt / cell-area is applied to the depth.

    ``flow_rate(z1, h1, z2, h2, l, g)``: physical-unit culvert law.
    RiverSimulation state is already in physical units (dx = L/n), so
    unlike source_pipe_event no L^3 rescaling is needed; ``start`` /
    ``end`` are physical coordinates in [-L/2, L/2]^2."""

    def __init__(self, start, end, diameter, flow_rate=None, **kw):
        kw.setdefault("istep", 1)
        super().__init__(name="SourcePipe", **kw)
        # Event is a dataclass whose `action` FIELD would shadow a
        # method of the same name — bind it explicitly
        self.action = self._apply
        # NOTE: Event's own `start`/`end` are firing times — the pipe
        # endpoints live under p_start/p_end
        self.p_start = tuple(start)
        self.p_end = tuple(end)
        self.diameter = float(diameter)
        if flow_rate is not None:
            self.flow_rate = flow_rate
        self.Q = 0.0

    def flow_rate(self, z1, h1, z2, h2, l, g):  # pragma: no cover
        raise ValueError("SourcePipe needs a flow_rate law "
                         "(use SourceCulvert)")

    def _cell(self, pos, n, L):
        i = int(min(max((pos[0] / L + 0.5) * n, 0), n - 1))
        j = int(min(max((pos[1] / L + 0.5) * n, 0), n - 1))
        return i, j

    def _signed_rate(self, z1, h1, z2, h2, l, g):
        if z1 + h1 > z2 + h2:
            return +self.flow_rate(z1, h1, z2, h2, l, g)
        return -self.flow_rate(z2, h2, z1, h1, l, g)

    def _apply(self, sim):
        cfg = sim.cfg
        g = cfg.g
        n = cfg.shape[0]
        dx = cfg.dx
        dt = sim.dt if sim.dt else 0.0
        if dt <= 0.0:
            return
        s = self._cell(self.p_start, n, cfg.L)
        e = self._cell(self.p_end, n, cfg.L)
        if s == e:
            return
        P = sim.state["P"]
        Zb = sim.state["Zb"]
        h1 = max(float(P[s]), 0.0)
        z1 = float(Zb[s])
        h2 = max(float(P[e]), 0.0)
        z2 = float(Zb[e])
        l = math.hypot(self.p_start[0] - self.p_end[0],
                       self.p_start[1] - self.p_end[1])
        a1 = a2 = dx * dx / dt                 # cell area / dt

        def rate_q(Q):
            Q1 = self._signed_rate(z1, h1 - Q / a1, z2, h2 + Q / a2, l, g)
            return min(Q1, a1 * h1) if Q1 > 0.0 else max(Q1, -a2 * h2)

        # secant-bisection on f(Q) = rate_q(Q) - Q (source_pipe_event)
        Q = self._signed_rate(z1, h1, z2, h2, l, g)
        Q1, Q2 = 2.0 * Q, 0.0
        v1 = rate_q(Q1) - Q1
        v2 = Q
        DQ = 1e-4
        if abs(v1) > DQ and abs(v2) > DQ:
            if v1 > v2:
                v1, v2 = v2, v1
                Q1, Q2 = Q2, Q1
            if v1 * v2 < 0.0:
                Q = (v1 * Q2 - v2 * Q1) / (v1 - v2)
                for _ in range(1000):
                    Qb = Q
                    v = rate_q(Q) - Q
                    if v < 0.0:
                        v1, Q1 = v, Q
                    else:
                        v2, Q2 = v, Q
                    Q = (v1 * Q2 - v2 * Q1) / (v1 - v2)
                    if abs(Q - Qb) <= DQ:
                        break
        self.Q = Q               # physical volume rate (diagnostic)
        dP = Q * dt / (dx * dx)
        P = P.at[s].add(-dP).at[e].add(dP)
        sim.state["P"] = jnp.maximum(P, 0.0)


class SourceCulvert(SourcePipe):
    """Boyd-87 culvert (GfsSourceCulvert, modules/culvert.c): ``type``
    'box' (width B) or 'pipe' (circular, diameter); entrance type 1-3;
    Manning n; entrance loss ke."""

    def __init__(self, start, end, diameter, type="box", entrance=1,
                 B=1.0, n=0.012, ke=0.2, **kw):
        super().__init__(start, end, diameter, **kw)
        assert type in ("box", "pipe"), type
        assert 1 <= int(entrance) <= 3, entrance
        self.type = type
        self.entrance = int(entrance)
        self.B = float(B)
        self.n = float(n)
        self.ke = float(ke)

    def flow_rate(self, z1, h1, z2, h2, l, g):
        S0 = (z1 - z2) / l if l > 0.0 else 0.0
        if self.type == "box":
            return Q_box(h1, h2, self.B, self.diameter, self.entrance,
                         S0, l, self.n, self.ke, g)
        return Q_pipe(h1, h2, self.diameter, self.entrance,
                      S0, l, self.n, self.ke, g)
