"""Segment ops for sparse edge-list graphs: edge-softmax attention and
segment-sum neighborhood aggregation.

These are the edge-list counterparts of the dense adjacency-masked GAT
(models/gnn_embed/gat.py) for zone graphs too large for dense (Z, Z)
attention. Two implementations:

- XLA ``jax.ops.segment_sum`` (this module): correct everywhere, but its
  gather/scatter lowering is catastrophically slow on TPU.
- Pallas one-hot-matmul kernels (ops/pallas/edge_segment.py): gather and
  scatter both run on the MXU.

Measured head-to-head (v5e, D=64, avg degree 16): the Pallas kernel is
**458x** faster at Z=512 (1.74 vs 798 ms — the XLA scatter path
degenerates at small Z) and **6.4x** at Z=2048 (1.65 vs 10.6 ms); the
plain segment-sum is 1.16x at Z=2048/E=131k. Dispatch rule:
``gat_edge_layer`` uses the Pallas kernel on TPU whenever
Z <= _PALLAS_MAX_Z (the (TILE_E, Z) one-hot VMEM bound); beyond that it
falls back to XLA until the zone-axis-tiled variant lands.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_PALLAS_MAX_Z = 4096


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


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


def gat_edge_layer(h, edge_src, edge_dst, W, a_src, a_dst, num_nodes=None,
                   use_pallas: str | bool = "auto"):
    """Sparse single-head GAT layer over an edge list.

    h: (Z, F); W: (F, D); a_src/a_dst: (D,). Equivalent (up to heads) to
    the dense GATLayer with adjacency = edge list.

    ``use_pallas``: "auto" picks the one-hot-matmul Pallas kernel on TPU
    for Z <= 4096 (measured 6-458x faster than the XLA scatter path, see
    module docstring); True forces it; False forces XLA.
    """
    if num_nodes is None:
        num_nodes = h.shape[0]
    Wh = h @ W  # (Z, D)
    qs = Wh @ a_src  # (Z,)
    qd = Wh @ a_dst
    if use_pallas == "auto":
        use_pallas = _on_tpu() and num_nodes <= _PALLAS_MAX_Z
    if use_pallas:
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )

        return gat_edge_aggregate_pallas(Wh, qs, qd, edge_src, edge_dst)
    e = jax.nn.leaky_relu(
        qs[edge_src] + qd[edge_dst], negative_slope=0.2
    )  # (E,)
    return edge_softmax_attention(Wh[edge_src], e, edge_dst, num_nodes)


def person_zone_segment_sum(values, zone_ids, num_zones):
    """Aggregate per-person values (N, D) into their zones — the sharded
    segment-sum primitive for zone-level statistics (BASELINE config 4).
    Under pjit, shard ``values``/``zone_ids`` over the agent axis; the
    cross-shard combine is the compiler-inserted psum."""
    return jax.ops.segment_sum(values, zone_ids, num_segments=num_zones)
