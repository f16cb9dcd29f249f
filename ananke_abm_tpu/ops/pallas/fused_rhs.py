"""Fused GAT-ODE drift RHS as a single Pallas kernel.

One RK4 stage of the flagship model chains several small matmuls around a
softmax (query proj -> zone scores -> attention -> context -> drift MLP).
Executed as separate XLA ops, each intermediate (N, Dz)/(N, Z) round-trips
HBM; this kernel keeps one agent tile plus ALL weights resident in VMEM
and writes only the final (TILE_N, Da) derivative — the intermediates
never leave the chip.

Grid: one program per agent tile; each tile's work is pure MXU matmuls +
VPU softmax/tanh. Falls back to interpret mode off-TPU (tests run it on
the CPU mesh)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu


def fused_drift_rhs(
    x, h, zone_emb, tfeat,
    Wq, W1, b1, Wr1, br1, Wr2, br2, W3, b3,
    *, interpret=None,
):
    """dx/dt for a GAT-ODE agent block (matches GATODE.rhs, num_blocks=1).

    x: (N, Da); h: (N, H); zone_emb: (Z, Dz); tfeat: (2,) [sin t, cos t].
    Pipeline: q = x Wq; attn = softmax(q zone_emb^T / sqrt(Dz));
    ctx = attn zone_emb; f = [x, ctx, h, tfeat];
    z = tanh(f W1 + b1); r = (tanh(z Wr1 + br1)) Wr2 + br2;
    z = tanh(z + r); out = z W3 + b3.
    """
    N, Da = x.shape
    Z, Dz = zone_emb.shape
    H = h.shape[1]
    if interpret is None:
        interpret = not _on_tpu()

    n_tiles = -(-N // TILE_N)
    pad = n_tiles * TILE_N - N
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))

    scale = 1.0 / np.sqrt(float(Dz))
    tfeat2 = jnp.broadcast_to(tfeat[None, :], (TILE_N, 2))

    def kernel(x_ref, h_ref, ze_ref, tf_ref, wq_ref, w1_ref, b1_ref,
               wr1_ref, br1_ref, wr2_ref, br2_ref, w3_ref, b3_ref,
               out_ref):
        xt = x_ref[:]
        ze = ze_ref[:]
        q = jnp.dot(xt, wq_ref[:], preferred_element_type=jnp.float32)
        scores = jnp.dot(q, ze.T, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.dot(attn, ze, preferred_element_type=jnp.float32)

        feats = jnp.concatenate([xt, ctx, h_ref[:], tf_ref[:]], axis=-1)
        z = jnp.tanh(
            jnp.dot(feats, w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[:]
        )
        r = jnp.tanh(
            jnp.dot(z, wr1_ref[:], preferred_element_type=jnp.float32)
            + br1_ref[:]
        )
        r = (
            jnp.dot(r, wr2_ref[:], preferred_element_type=jnp.float32)
            + br2_ref[:]
        )
        z = jnp.tanh(z + r)
        out_ref[:] = (
            jnp.dot(z, w3_ref[:], preferred_element_type=jnp.float32)
            + b3_ref[:]
        )

    def rep(shape):
        if len(shape) == 1:
            return pl.BlockSpec(shape, lambda i: (0,), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, Da), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep((Z, Dz)),
            rep((TILE_N, 2)),
            rep(Wq.shape),
            rep(W1.shape), rep(b1.shape),
            rep(Wr1.shape), rep(br1.shape),
            rep(Wr2.shape), rep(br2.shape),
            rep(W3.shape), rep(b3.shape),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, Da), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_N, Da), x.dtype),
        interpret=interpret,
    )(x, h, zone_emb, tfeat2, Wq, W1, b1, Wr1, br1, Wr2, br2, W3, b3)
    return out[:N]


def drift_params_from_gatode(params):
    """Extract the kernel's weight tuple from GATODE flax params
    (requires num_blocks == 1)."""
    drift = params["drift"]
    return (
        params["query_proj"]["kernel"],
        drift["Dense_0"]["kernel"], drift["Dense_0"]["bias"],
        drift["Dense_1"]["kernel"], drift["Dense_1"]["bias"],
        drift["Dense_2"]["kernel"], drift["Dense_2"]["bias"],
        drift["Dense_3"]["kernel"], drift["Dense_3"]["bias"],
    )
