"""Segment ops for sparse edge-list graphs: edge-softmax attention and
segment-sum neighborhood aggregation.

These are the edge-list counterparts of the dense adjacency-masked GAT
(models/gnn_embed/gat.py) for zone graphs too large for dense (Z, Z)
attention. Two implementations:

- XLA ``jax.ops.segment_sum`` (this module): correct everywhere, but its
  gather/scatter lowering is catastrophically slow on TPU.
- Pallas one-hot-matmul kernels (ops/pallas/edge_segment.py): gather and
  scatter both run on the MXU.

Measured head-to-head (v5e, final exact two-pass kernel with the
pair-matmul score gather, docs/evidence_round3/edge_bench_final.json;
Pallas timings are run-to-run stable, the XLA path's vary up to ~3x
over the remote tunnel):

    Z=512  deg16 D=64   exact 4.6 ms vs XLA 2.6-16.6 ms  (parity-ish)
    Z=2048 deg16 D=64   exact 3.3 ms vs XLA 4.6-15.6 ms  (1.4-5x)
    Z=2048 deg64 D=64   exact 1.65x, bounded 2.0x
    Z=4096 deg16        exact ~1.0x (parity), bounded ~1.2x
    Z=8192+             XLA wins (the one-hot form is O(E*Z*D))
    segment-sum:        1.2x at Z=2048/E=131k, 0.5x at Z=512/E=33k
    rel err vs XLA f32: <= 3e-3 (exact) / 6e-3 (bounded) at any scale

Dispatch rule: ``gat_edge_layer`` uses the Pallas kernel on TPU for
Z <= _PALLAS_MAX_Z (2048); beyond that the XLA path serves. (Round-2
docs cited far larger speedups for the earlier single-pass kernel;
superseded by this re-measurement of the exact kernel — the old 458x
figure is not reproducible under the scalar-pull-synced protocol.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu

_PALLAS_MAX_Z = 2048  # measured crossover: XLA wins from Z=4096 up
# Multihead auto-dispatch additionally requires this TOTAL feature
# width (H * d). Round-4 measurement of the BATCHED all-heads kernel
# itself (docs/evidence_round4/edge_mh_bench.json, v5e, 30-rep
# scalar-pull sync) at the flagship default geometry and around the
# dispatch boundary:
#
#   Z=500  deg8  H4 d16 (default)  fwd 1.03x   fwd+bwd 1.15x
#   Z=500  deg16 H4 d16            fwd 1.18x   fwd+bwd 1.52x
#   Z=512  deg16 H4 d8  (HD=32)    fwd 1.13x   fwd+bwd 1.68x
#   Z=512  deg16 H2 d8  (HD=16)    fwd 1.01x   fwd+bwd 1.50x
#   Z=2048 deg16 H4 d16            fwd 0.99x   fwd+bwd 1.88x
#   Z=4096 deg16 H4 d16            fwd 0.70x   fwd+bwd 1.13x
#
# (grad cosine vs the XLA composition: 1.0 at every geometry.) The
# hand-written Pallas backward wins everywhere in-region, so the width
# floor only needs to exclude geometries where even the forward loses;
# measured parity holds down to HD=16.
_PALLAS_MIN_TOTAL_D = 16


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
    inside the measured win region (Z <= 2048 — see module docstring);
    True forces it; False forces XLA. The Pallas path is differentiable
    (custom_vjp; on TPU the backward is the hand-written Pallas kernel,
    off-TPU the VJP of this function's own XLA composition), so
    jax.grad works under either dispatch.
    """
    if num_nodes is None:
        num_nodes = h.shape[0]
    Wh = h @ W  # (Z, D)
    qs = Wh @ a_src  # (Z,)
    qd = Wh @ a_dst
    if use_pallas == "auto":
        use_pallas = (
            _on_tpu() and max(num_nodes, h.shape[0]) <= _PALLAS_MAX_Z
        )
    if use_pallas:
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate,
        )

        return gat_edge_aggregate(
            Wh, qs, qd, edge_src, edge_dst, num_nodes=num_nodes
        )
    e = jax.nn.leaky_relu(
        qs[edge_src] + qd[edge_dst], negative_slope=0.2
    )  # (E,)
    return edge_softmax_attention(Wh[edge_src], e, edge_dst, num_nodes)


def edges_from_adj(adj):
    """Edge list from a dense {0,1} adjacency, host-side (numpy).

    ``adj[i, j] != 0`` means a message j -> i (the dense GATLayer's
    row-wise softmax semantics: row i aggregates over columns j).
    Returns ``(edge_src, edge_dst)`` int32 arrays with src=j, dst=i.
    Build this ONCE per graph outside jit — the edge count is static.

    This is a CONVENIENCE for graphs that already exist in dense form.
    For graphs too large to materialize (Z, Z) at all, skip it: any
    ``(edge_src, edge_dst)`` int32 COO pair in the j -> i orientation
    above is a valid ``edge_index``, and the consumers (GATLayer /
    ZoneGAT / GATODE.encode_zones) accept ``adj=None`` alongside it —
    the sparse path never reads the dense matrix.
    """
    import numpy as np

    pairs = np.argwhere(np.asarray(adj) != 0)  # (E, 2) rows (dst, src)
    return (
        pairs[:, 1].astype(np.int32),
        pairs[:, 0].astype(np.int32),
    )


def gat_edge_attention_multihead(
    Wh, e_recv, e_send, edge_src, edge_dst, num_nodes,
    use_pallas: str | bool = "auto",
):
    """Multi-head edge-list GAT aggregation — the sparse counterpart of
    the dense ``GATLayer`` attention (models/gnn_embed/gat.py:31-39).

    Wh: (Z, H, d) per-head projected features; ``e_recv``/``e_send``:
    (Z, H) attention logits coupling to the receiving (destination) /
    sending (source) node; edges carry messages edge_src -> edge_dst.
    Returns (num_nodes, H, d) with
    ``out[i] = sum_j alpha_ij Wh[j]``, ``alpha_i: = softmax_j``
    over i's in-neighbors of ``leaky_relu(e_recv[i] + e_send[j])`` —
    exactly the dense layer with ``adj[i, j] = 1 <=> edge (src=j,
    dst=i)`` (see ``edges_from_adj``).

    Dispatch: the Pallas branch runs ONE batched kernel for all heads
    (``gat_edge_aggregate_multihead`` — shared one-hot gather/scatter
    matrices, heavy matmuls at full H*d width; see its docstring for
    why a per-head launch is the wrong shape). The batched kernel's own
    round-4 measurements (see the ``_PALLAS_MIN_TOTAL_D`` table above)
    put its win region at Z <= ``_PALLAS_MAX_Z`` with forward parity and
    1.15-1.88x on fwd+bwd, holding down to total width H*d = 16, so
    ``"auto"`` requires ``H * d >= _PALLAS_MIN_TOTAL_D`` in addition to
    the Z bound; True forces the kernel. Both paths are differentiable.
    ``use_pallas="interpret"`` runs the kernel in Pallas interpret mode
    (forward-only — for testing the kernel argument mapping off-TPU).
    """
    Z, H, d = Wh.shape
    if use_pallas == "auto":
        use_pallas = (
            _on_tpu()
            and max(num_nodes, Z) <= _PALLAS_MAX_Z
            and H * d >= _PALLAS_MIN_TOTAL_D
        )
    if use_pallas:
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead,
            gat_edge_aggregate_multihead_pallas,
        )

        # kernel scores are leaky_relu(qs[src] + qd[dst]) — the
        # receiving-node logits therefore ride qd
        if use_pallas == "interpret":
            return gat_edge_aggregate_multihead_pallas(
                Wh, e_send, e_recv, edge_src, edge_dst,
                num_nodes=num_nodes, interpret=True,
            )
        return gat_edge_aggregate_multihead(
            Wh, e_send, e_recv, edge_src, edge_dst, num_nodes=num_nodes
        )
    scores = jax.nn.leaky_relu(
        e_recv[edge_dst] + e_send[edge_src], negative_slope=0.2
    )  # (E, H)
    alpha = segment_softmax(scores, edge_dst, num_nodes)
    # static H*d (not -1): reshape(0, -1) is ambiguous at E == 0
    vals = (Wh[edge_src] * alpha[:, :, None]).reshape(
        edge_src.shape[0], H * d
    )
    out = jax.ops.segment_sum(vals, edge_dst, num_segments=num_nodes)
    return out.reshape(num_nodes, H, d)


def person_zone_segment_sum(values, zone_ids, num_zones):
    """Aggregate per-person values (N, D) into their zones — the sharded
    segment-sum primitive for zone-level statistics (BASELINE config 4).
    Under pjit, shard ``values``/``zone_ids`` over the agent axis; the
    cross-shard combine is the compiler-inserted psum."""
    return jax.ops.segment_sum(values, zone_ids, num_segments=num_zones)
