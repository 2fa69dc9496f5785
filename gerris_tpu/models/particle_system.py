"""Host-side particle/bubble system plugged into the Simulation loop.

TPU-native rebuild of the reference's GfsParticleList event container
(reference: modules/particulatecommon.c — GfsParticleList
particulatecommon.h:53-61, list event :955-1010 with
remove_particles_not_in_domain, two-way sources GfsSourceParticulate:2089,
GfsParticulateField:1929; bubbles modules/bubbles.c).  The reference runs
each particle's event in the event phase of every iteration; here the whole
array advances in one jitted call before each fluid step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..physics import particles as parts
from ..physics import bubbles as bub
from . import ns


class ParticleSystem:
    """Owns a particle (or bubble) state array and advances it each step.

    two-way coupling: writes reaction-force density fields PFx/PFy(/PFz)
    into sim.state (read by ns_step when cfg.particle_coupling=True).
    """

    def __init__(self, pcfg: parts.ParticleConfig, state: dict,
                 bubble_cfg: Optional[bub.BubbleConfig] = None,
                 rho_liq: float = 1.0, name: str = "particles"):
        self.pcfg = pcfg
        self.state = state
        self.bubble_cfg = bubble_cfg
        self.rho_liq = rho_liq
        self.name = name
        self.last_force = None

    def n_alive(self):
        return int(jnp.sum(self.state["alive"]))

    def step(self, sim):
        cfg = sim.cfg
        grid = cfg.grid
        names = ns.velocity_names(grid.dim)
        U = [sim.state[n] for n in names]
        U_old = [sim.prev_state[n] for n in names] if sim.prev_state else U
        if self.bubble_cfg is not None:
            self.state, total = bub.step_bubbles(
                self.state, U, U_old, sim.state["P"], grid,
                list(cfg.u_bcs), cfg.p_bc, self.pcfg, self.bubble_cfg,
                cfg.nu, self.rho_liq, sim.dt, sim.time.t)
        else:
            self.state, total = parts.step_particles(
                self.state, U, U_old, grid, list(cfg.u_bcs), self.pcfg,
                cfg.nu, sim.dt, sim.time.t)
        self.last_force = total
        if self.pcfg.two_way:
            fields = parts.reaction_force_fields(total, self.state, grid,
                                                 self.pcfg)
            for c, ax in enumerate(("x", "y", "z")[:grid.dim]):
                key = "PF" + ax
                acc = fields[c] / self.pcfg.fluid_rho
                if key in sim.state and sim.particle_systems.index(self) > 0:
                    sim.state[key] = sim.state[key] + acc
                else:
                    sim.state[key] = acc
