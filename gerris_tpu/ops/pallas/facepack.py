"""Packed MAC-face layout carried end-to-end through the TPU fast path.

Every face-field kernel (BCG predictor, divergence, advection,
projection correction, face interpolation) DMAs x-faces from a
GP-row-padded array and y-faces from a lane-padded array.  Producing
plain (n0+1, n1)/(n0, n1+1) arrays between kernels forces a pad or
concatenate launch per hand-off — measured ~18 full-size pad/concat
kernels per NS step at 2048^2 on the launch-bound remote TPU (~0.3 ms
each).  Carrying the faces in the kernels' native layout removes them.

PACKX: (n0 + 3*GP, n1), row GP + k = x-face k (k = 0..n0), pad rows
zeroed.  PACKY: (n0, n1p), col j = y-face j (j = 0..n1), n1p = n1+1
rounded up to the 128-lane multiple, pad cols zeroed.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .bcg import GP, CP


def n1p_of(n1: int) -> int:
    return n1 + 1 + ((-(n1 + 1)) % CP)


@dataclasses.dataclass
class FacePack:
    """A MAC face-velocity pair in packed kernel layout (a jit-friendly
    pytree: arrays are children, the logical sizes static aux data)."""
    x: jnp.ndarray          # (n0 + 3*GP, n1)
    y: jnp.ndarray          # (n0, n1p)
    n0: int
    n1: int

    def unpack(self):
        """Plain (ufx (n0+1, n1), ufy (n0, n1+1)) views (slice kernels)."""
        return (self.x[GP:GP + self.n0 + 1, :],
                self.y[:, : self.n1 + 1])


def _fp_flatten(fp):
    return (fp.x, fp.y), (fp.n0, fp.n1)


def _fp_unflatten(aux, children):
    return FacePack(x=children[0], y=children[1], n0=aux[0], n1=aux[1])


import jax as _jax  # noqa: E402
_jax.tree_util.register_pytree_node(FacePack, _fp_flatten, _fp_unflatten)


def pack(ufx: jnp.ndarray, ufy: jnp.ndarray) -> FacePack:
    """Pack plain face arrays (pad launches — only for path hand-offs
    outside the fast path)."""
    n0 = ufx.shape[0] - 1
    n1 = ufx.shape[1]
    x = jnp.pad(ufx, ((GP, 2 * GP - 1), (0, 0)))
    ypad = n1p_of(n1) - (n1 + 1)
    y = jnp.pad(ufy, ((0, 0), (0, ypad))) if ypad else ufy
    return FacePack(x=x, y=y, n0=n0, n1=n1)


def as_pair(uf):
    """Plain [ufx, ufy] list from either representation."""
    if isinstance(uf, FacePack):
        return list(uf.unpack())
    return uf
