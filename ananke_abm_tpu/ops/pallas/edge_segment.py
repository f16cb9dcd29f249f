"""Edge-list GAT aggregation as ONE Pallas kernel (edge-softmax +
segment-sum), MXU-native.

The north-star op set for sparse zone graphs (SURVEY §2.7): the XLA path
(ops/segment.py) lowers ``jax.ops.segment_sum`` to sort-based segment
reductions plus dynamic gathers — bandwidth-bound scalar machinery the
TPU hates. This kernel re-expresses BOTH the gather and the scatter as
one-hot matmuls, which is the TPU-idiomatic form: for an edge tile,

    S_src = onehot(src_ids)           (TILE_E, Z)  bf16, exact 0/1
    S_dst = onehot(dst_ids)           (TILE_E, Z)
    v     = S_src @ Wh                -- the gather, on the MXU
    e     = leaky_relu(S_src @ qs + S_dst @ qd)
    ex    = exp(min(e, 80))           -- max-free softmax (fused_step.py:
                                          the max cancels in the ratio)
    numer += S_dst.T @ (v * ex)       -- the scatter, on the MXU
    denom += S_dst.T @ ex

and the per-node normalization ``numer / denom`` happens once at the
end. numer/denom accumulate across edge tiles in VMEM via the
constant-index-map + @pl.when(program_id==0) init pattern (the same
cross-tile accumulation the fused training kernel uses for weight
grads). No sort, no scatter, no data-dependent control flow; padding
edges use dst = Z (their one-hot row is all zeros, so they contribute
nothing).

Cost model: 3 one-hot matmuls of 2*E*Z*D-ish FLOPs — linear in E where
the dense adjacency layer is quadratic in Z, so the edge kernel wins
when average degree << Z. VMEM bounds the zone axis: the (TILE_E, Z)
one-hots keep Z <= ~4096 at TILE_E=1024; larger graphs need a zone-axis
grid dimension (documented follow-up).

Measured (v5e, D=64, avg degree 16): see ``edge_softmax_attention``
docstring in ops/segment.py for the dispatch rule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ops.pallas.fused_step import _on_tpu, _to16

TILE_E = 1024


def _pad_edges(edge_src, edge_dst, scores_or_none, num_nodes):
    """Pad the edge list to a TILE_E multiple; padding edges point at
    dst = num_nodes (one-hot row all zero -> no contribution)."""
    E = edge_src.shape[0]
    n_tiles = max(1, -(-E // TILE_E))
    pad = n_tiles * TILE_E - E
    if pad:
        edge_src = jnp.pad(edge_src, (0, pad))
        edge_dst = jnp.pad(edge_dst, (0, pad), constant_values=num_nodes)
        if scores_or_none is not None:
            scores_or_none = jnp.pad(scores_or_none, (0, pad))
    return edge_src, edge_dst, scores_or_none, n_tiles


def gat_edge_aggregate_pallas(
    Wh, qs, qd, edge_src, edge_dst, *, negative_slope: float = 0.2,
    interpret=None,
):
    """Sparse GAT neighborhood aggregation over an edge list.

    Wh: (Z, D) f32 projected node features; qs, qd: (Z,) f32 per-node
    score halves (Wh @ a_src, Wh @ a_dst); edge_src/edge_dst: (E,) int32.
    Returns (Z, D) f32: for each destination node, the softmax-weighted
    sum of its source neighbors' Wh rows — numerically the composition
    ``edge_softmax_attention(Wh[src], leaky_relu(qs[src]+qd[dst]), dst)``
    of ops/segment.py, to bf16 feature precision (score math is f32).
    """
    Z, D = Wh.shape
    if interpret is None:
        interpret = not _on_tpu()
    edge_src, edge_dst, _, n_tiles = _pad_edges(
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32), None, Z
    )
    slope = np.float32(negative_slope)

    def kernel(src_ref, dst_ref, wh_ref, qs_ref, qd_ref,
               numer_ref, denom_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            numer_ref[:] = jnp.zeros_like(numer_ref)
            denom_ref[:] = jnp.zeros_like(denom_ref)

        src = src_ref[:]  # (TILE_E,)
        dst = dst_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, Z), 1)
        s_src = _to16(src[:, None] == col)  # exact 0/1 in bf16
        s_dst = _to16(dst[:, None] == col)
        v = jnp.dot(s_src, wh_ref[:], preferred_element_type=jnp.float32)
        e = (
            jnp.dot(s_src, qs_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(s_dst, qd_ref[:], preferred_element_type=jnp.float32)
        )  # (TILE_E, 1)
        e = jnp.where(e >= 0, e, slope * e)  # leaky_relu
        # max-free softmax: the normalizer cancels in numer/denom; the
        # clamp guards f32 overflow (exp(80) ~ 5.5e34)
        ex = jnp.exp(jnp.minimum(e, 80.0))  # (TILE_E, 1)
        sdT = s_dst.T
        numer_ref[:] += jnp.dot(
            sdT, _to16(v * ex), preferred_element_type=jnp.float32
        )
        denom_ref[:] += jnp.dot(
            sdT, _to16(ex), preferred_element_type=jnp.float32
        )

    numer, denom = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Z, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Z, D), jnp.float32),
            jax.ShapeDtypeStruct((Z, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        edge_src, edge_dst, _to16(Wh),
        _to16(qs[:, None]), _to16(qd[:, None]),
    )
    return numer / jnp.maximum(denom, 1e-12)


def segment_sum_pallas(values, segment_ids, num_segments, *,
                       interpret=None):
    """Pallas segment-sum: (E, D) values scattered into (num_segments, D)
    via the one-hot-matmul form. Same contract as
    ``jax.ops.segment_sum`` for int32 ids in [0, num_segments) (out-of-
    range ids are dropped, matching segment_sum's default).

    bf16 one-hot x bf16 values with f32 accumulation: sums are exact for
    values already representable in bf16, and within bf16 rounding of
    the f32 XLA path otherwise.
    """
    E, D = values.shape
    Z = num_segments
    if interpret is None:
        interpret = not _on_tpu()
    n_tiles = max(1, -(-E // TILE_E))
    pad = n_tiles * TILE_E - E
    seg = segment_ids.astype(jnp.int32)
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
        seg = jnp.pad(seg, (0, pad), constant_values=Z)

    def kernel(seg_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, Z), 1)
        s = _to16(seg_ref[:][:, None] == col)
        out_ref[:] += jnp.dot(
            s.T, _to16(val_ref[:]), preferred_element_type=jnp.float32
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_E,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Z, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, D), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seg, values)
    return out
