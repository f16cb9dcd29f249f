"""Segment ops for sparse edge-list graphs: edge-softmax attention and
segment-sum neighborhood aggregation.

These are the edge-list counterparts of the dense adjacency-masked GAT
(models/gnn_embed/gat.py) for zone graphs too large for dense (Z, Z)
attention. Built on ``jax.ops.segment_sum`` — XLA lowers these to
efficient sorted-segment reductions on TPU; the Pallas double-buffered
variant is the designated follow-up for pod-scale graphs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(scores, segment_ids, num_segments):
    """Softmax over edges grouped by ``segment_ids`` (e.g. destination
    node). scores: (E, ...) with leading edge axis."""
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(scores - seg_max[segment_ids])
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / jnp.maximum(denom[segment_ids], 1e-12)


def edge_softmax_attention(
    values, scores, dst_ids, num_nodes
):
    """Aggregate edge ``values`` (E, D) into nodes via per-destination
    softmax of ``scores`` (E,). Returns (num_nodes, D)."""
    alpha = segment_softmax(scores, dst_ids, num_nodes)
    return jax.ops.segment_sum(
        values * alpha[:, None], dst_ids, num_segments=num_nodes
    )


def gat_edge_layer(h, edge_src, edge_dst, W, a_src, a_dst, num_nodes=None):
    """Sparse single-head GAT layer over an edge list.

    h: (Z, F); W: (F, D); a_src/a_dst: (D,). Equivalent (up to heads) to
    the dense GATLayer with adjacency = edge list.
    """
    if num_nodes is None:
        num_nodes = h.shape[0]
    Wh = h @ W  # (Z, D)
    e = (
        (Wh @ a_src)[edge_src] + (Wh @ a_dst)[edge_dst]
    )  # (E,)
    e = jax.nn.leaky_relu(e, negative_slope=0.2)
    return edge_softmax_attention(Wh[edge_src], e, edge_dst, num_nodes)


def person_zone_segment_sum(values, zone_ids, num_zones):
    """Aggregate per-person values (N, D) into their zones — the sharded
    segment-sum primitive for zone-level statistics (BASELINE config 4).
    Under pjit, shard ``values``/``zone_ids`` over the agent axis; the
    cross-shard combine is the compiler-inserted psum."""
    return jax.ops.segment_sum(values, zone_ids, num_segments=num_zones)
