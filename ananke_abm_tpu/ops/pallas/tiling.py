"""Shared BlockSpec / padding helpers for the fused Pallas kernels.

Every agent-tiled kernel in this package pads the agent axis up to a
tile multiple, replicates the (small) weight operands into VMEM, and
row-tiles the per-agent operands over the grid. One canonical copy
lives here so a padding or index_map fix lands everywhere at once
(fused_rhs / fused_dopri5 / fused_train previously carried private
near-identical copies).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_tile(x, tile):
    """Pad axis 0 of ``x`` up to a multiple of ``tile``; returns the
    padded array and the tile count. Padding rows are zeros — kernels
    must mask them out of reductions (or keep them grad-inert, e.g.
    zero cotangent rows on VJP inputs)."""
    n = x.shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n_tiles


def rep_spec(shape):
    """BlockSpec replicating a full (weight-sized) operand into every
    grid step's VMEM window."""
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i: zeros, memory_space=pltpu.VMEM)


def tile_spec(d, tile):
    """BlockSpec row-tiling a (N, d) per-agent operand over a 1-D grid."""
    return pl.BlockSpec((tile, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


# the 16 MB scoped-VMEM default rejects the training/adjoint kernels'
# working sets; 100 MB is the measured-safe override (see fused_train)
VMEM_100MB = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
