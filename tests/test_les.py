"""LES subgrid eddy viscosity (GfsVariableTurbulentViscosity,
reference modules/turbulence.c:934-1131).

Gates: the Smagorinsky nu_t matches the hand-derived formula for an
analytic velocity field; the sigma model vanishes for 2D pure shear /
solid rotation (its design property: sigma3 = 0 for two-component
flows ... in 2D the third singular value is always 0, so nu_t == 0 —
the model only activates in 3D); a verbatim-style .gfs with
SourceViscosity (MU + NUT) runs and transports the variable into the
diffusion solve.
"""
import math

import numpy as np
import pytest
import jax.numpy as jnp

from gerris_tpu.utils import gfs_config as G


def _mk(level=5, extra=""):
    txt = f"""
1 0 GfsSimulation GfsBox GfsGEdge {{}} {{
    Refine {level}
    VariableTurbulentViscosity NUT 0.17 {extra}
    SourceViscosity (0.001 + NUT)
    Init {{}} {{
        U = sin(2.*M_PI*y)
        V = sin(2.*M_PI*x)
    }}
    Time {{ iend = 2 }}
}}
GfsBox {{}}
"""
    return G.build_simulation(G.parse_gfs(txt, {}, strict=True))


def test_smagorinsky_formula():
    sim = _mk()
    sim.do_events()  # one event pass updates NUT from U,V
    g = sim.cfg.grid
    h = g.h
    x, y = [np.asarray(c) for c in np.broadcast_arrays(*g.centers)]
    # du/dy = 2 pi cos(2 pi y), dv/dx = 2 pi cos(2 pi x); S12 = (a+b)/2
    dudy = 2 * math.pi * np.cos(2 * math.pi * y)
    dvdx = 2 * math.pi * np.cos(2 * math.pi * x)
    s12 = 0.5 * (dudy + dvdx)
    smag = (0.17 * h) ** 2 * np.sqrt(2.0 * (2 * s12 ** 2))
    got = np.asarray(sim.state["NUT"])
    # centred differences of the analytic field: O(h^2) interior
    err = np.abs(got[2:-2, 2:-2] - smag[2:-2, 2:-2])
    assert err.max() < 0.05 * smag.max(), err.max()
    assert got.min() >= 0.0


def test_sigma_vanishes_2d():
    """sigma model: in 2D the gradient tensor has rank <= 2 so the third
    singular value is 0 and nu_t == 0 identically (the Nicoud sigma
    property the reference implements, modules/turbulence.c:983-1054)."""
    sim = _mk(extra="sigma")
    sim.do_events()
    # zero up to cubic-root roundoff on the f64 invariants
    assert float(np.abs(np.asarray(sim.state["NUT"])).max()) < 1e-10


def test_les_runs_into_diffusion():
    """The variable feeds SourceViscosity each step and the run stays
    finite; with Cs > 0 the effective viscosity exceeds the molecular
    floor somewhere (so the coupling is live, not a dead variable)."""
    sim = _mk()
    sim.run()
    nut = np.asarray(sim.state["NUT"])
    assert np.isfinite(np.asarray(sim.state["U"])).all()
    assert nut.max() > 1e-6  # sheared field -> active eddy viscosity
    assert sim.cfg.nu_var is not None


def test_parse_cs_value():
    sim = _mk()
    ev = [e for e in sim.events
          if type(e).__name__ == "VariableTurbulentViscosity"]
    assert len(ev) == 1 and ev[0].cs == pytest.approx(0.17)
