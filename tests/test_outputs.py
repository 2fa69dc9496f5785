"""Outputs, checkpoint/resume, timers, droplet conversion
(reference: src/output.c family, SURVEY.md §5)."""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gerris_tpu.core.grid import Grid
from gerris_tpu.core import bc as bcs
from gerris_tpu.events import outputs as out
from gerris_tpu.events.events import Event
from gerris_tpu.models import ns
from gerris_tpu.models.simulation import Simulation, Time
from gerris_tpu.physics import vof, droplets


def tg_sim(level=4, t_end=0.1):
    grid = Grid(level=level, dim=2)
    per = bcs.periodic_bc(2)
    cfg = ns.NSConfig(grid=grid, u_bcs=(per, per), nu=0.01)
    x, y = grid.centers
    sim = Simulation(cfg, time=Time(end=t_end, dtmax=0.5 * grid.h))
    sim.init(U=-jnp.cos(2 * math.pi * x) * jnp.sin(2 * math.pi * y),
             V=jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y))
    return sim


def test_checkpoint_resume(tmp_path):
    """Resume from a checkpoint reproduces the uninterrupted run exactly
    (reference: OutputSimulation dump re-run by gerris, SURVEY.md §5)."""
    path = str(tmp_path / "ckpt.npz")
    sim = tg_sim(t_end=0.2)
    # run halfway, checkpoint, continue
    sim.run(max_steps=5)
    out.save_checkpoint(path, sim)
    sim.run(max_steps=5)
    u_direct = np.asarray(sim.state["U"])
    i_direct = sim.time.i

    sim2 = tg_sim(t_end=0.2)
    out.load_checkpoint(path, sim2)
    sim2.run(max_steps=5)
    assert sim2.time.i == i_direct
    assert np.max(np.abs(np.asarray(sim2.state["U"]) - u_direct)) < 1e-14


def test_output_events(tmp_path):
    sim = tg_sim(t_end=0.05)
    norm_file = str(tmp_path / "norm.txt")
    loc_file = str(tmp_path / "loc.txt")
    ppm_file = str(tmp_path / "f.ppm")
    enorm = out.OutputScalarNorm("U", file=norm_file, istep=2)
    eloc = out.OutputLocation(["U", "V"], [(0.1, 0.2), (0.0, 0.0)],
                              file=loc_file, istep=2)
    sim.events += [enorm, eloc, out.OutputTiming(file=str(tmp_path / "t.txt"),
                                                 start="end")]
    sim.run()
    assert len(enorm.rows) >= 2
    assert os.path.getsize(norm_file) > 0
    assert len(eloc.rows) >= 4
    out.write_ppm(ppm_file, np.asarray(sim.state["U"]))
    with open(ppm_file, "rb") as f:
        assert f.read(2) == b"P6"
    assert "step" in open(str(tmp_path / "t.txt")).read()


def test_error_norm_event():
    sim = tg_sim(t_end=0.02)
    nu = 0.01

    def exact(x, y, t):
        return -jnp.cos(2 * math.pi * x) * jnp.sin(2 * math.pi * y) * \
            math.exp(-8 * math.pi ** 2 * nu * t)

    ev = out.OutputErrorNorm("U", exact, istep=1)
    sim.events.append(ev)
    sim.run()
    assert ev.rows[-1][3] < 0.05  # Linf error small at early times


def test_droplet_tagging_and_conversion():
    grid = Grid(level=6, dim=2)
    f = (vof.fraction_from_levelset(grid, lambda x, y: 0.15 ** 2 - x * x - y * y)
         + vof.fraction_from_levelset(
             grid, lambda x, y: 0.02 ** 2 - (x - 0.35) ** 2 - (y - 0.35) ** 2)
         + vof.fraction_from_levelset(
             grid, lambda x, y: 0.015 ** 2 - (x + 0.3) ** 2 - (y - 0.3) ** 2))
    labels, n = droplets.tag_droplets(f)
    assert n == 3
    U = [jnp.ones(grid.shape), jnp.zeros(grid.shape)]
    f2, plist = droplets.droplets_to_particles(f, U, grid, min_cells=30)
    # the two small droplets convert; the big one stays
    assert len(plist) == 2
    lab2, n2 = droplets.tag_droplets(f2)
    assert n2 == 1
    for p in plist:
        assert abs(p["vel"][0] - 1.0) < 1e-12
        assert p["vol"] > 0
    # and back: reinsert one particle as a droplet
    f3 = droplets.particle_to_droplet(f2, plist[0]["pos"], plist[0]["vol"],
                                      grid)
    _, n3 = droplets.tag_droplets(f3)
    assert n3 == 2
    vol_err = abs(float(jnp.sum(f3) - jnp.sum(f2)) * grid.cell_volume
                  - plist[0]["vol"]) / plist[0]["vol"]
    assert vol_err < 0.05


def test_projection_stats_and_droplet_sums():
    sim = tg_sim(t_end=0.03)
    ps = out.OutputProjectionStats(istep=2, file="/dev/null")
    sim.events.append(ps)
    sim.run()
    assert len(ps.rows) >= 1
    # the MAC divergence of the interpolated centred field is O(h^2), small
    assert ps.rows[-1][3] < 10.0

    from gerris_tpu.physics import vof as vof2
    grid = sim.cfg.grid
    f = (vof2.fraction_from_levelset(grid, lambda x, y: 0.1 ** 2 - x * x - y * y)
         + vof2.fraction_from_levelset(
             grid, lambda x, y: 0.05 ** 2 - (x - 0.3) ** 2 - (y - 0.3) ** 2))
    sim.state["T"] = f
    ev = out.OutputDropletSums("T", istep=1)
    ev.fire(sim, sim.time.t, sim.time.i)
    assert len(ev.rows) == 2
    vols = sorted(r[2] for r in ev.rows)
    import math as m
    # tg_sim's grid is only 16^2: the R=0.1 droplet spans ~3 cells, so the
    # linearized fractions carry O(10%) volume error here
    assert abs(vols[1] - m.pi * 0.01) / (m.pi * 0.01) < 0.2
