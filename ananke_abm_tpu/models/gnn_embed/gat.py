"""Graph-attention zone encoder.

Multi-head GAT over the zone graph. Two attention paths sharing ONE
parameter set:

- dense (default): adjacency-masked (Z, Z) attention — zone counts are
  O(10^2..10^3), one small MXU matmul;
- sparse: pass ``edge_index`` — built once host-side, either from a
  dense matrix (``ops.segment.edges_from_adj``) or directly as COO
  ``(edge_src, edge_dst)`` int arrays without ever materializing the
  (Z, Z) matrix (``adj`` may then be ``None``) — to route the same
  math through the edge-list segment ops / Pallas one-hot-matmul
  kernels (ops/segment.py, ops/pallas/edge_segment.py) for zone
  graphs too large or too sparse for dense (Z, Z) scores. Same
  params; output exact vs dense on the XLA path, bf16-feature
  precision (rel err <= ~3e-3) when the TPU Pallas dispatch engages.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

NEG = -1e30


class GATLayer(nn.Module):
    features: int
    heads: int = 4

    @nn.compact
    def __call__(self, h, adj, edge_index=None, edge_chunks=None):
        """h: (Z, F_in), adj: (Z, Z) {0,1} with self loops. -> (Z, features)

        ``edge_index``: optional ``(edge_src, edge_dst)`` int arrays
        equivalent to ``adj`` (``adj[i, j] != 0 <=> (src=j, dst=i)``);
        when given, attention runs over the edge list instead of the
        dense mask, sharing the same parameters, and ``adj`` may be
        ``None`` (it is not read — the sparse path never materializes
        the (Z, Z) matrix). Output equivalence: exact on the CPU/XLA
        segment path; on TPU the auto dispatch may route through the
        bf16-feature Pallas kernel (rel err vs dense f32 <= ~3e-3, so
        near-tie argmaxes downstream can flip — see ops/segment.py).

        ``edge_chunks``: optional ``ops.pallas.edge_gather.EdgeChunks``
        built from the SAME edge list — routes the sparse attention
        through the large-Z block-pair kernel (the win region is
        Z >= 8192 with chunk fill >= ~0.3; callers decide by only
        passing chunks there — gnn_embed ``train`` gates it). Same
        params, bf16 feature precision.
        """
        if edge_index is None and adj is None:
            raise ValueError(
                "GATLayer needs `adj` (dense path) or `edge_index` "
                "(sparse path); both were None"
            )
        Z = h.shape[0]
        assert self.features % self.heads == 0
        d = self.features // self.heads
        Wh = nn.Dense(self.features, use_bias=False)(h)  # (Z, H*d)
        Wh = Wh.reshape(Z, self.heads, d)

        a_src = self.param("a_src", nn.initializers.xavier_uniform(), (self.heads, d))
        a_dst = self.param("a_dst", nn.initializers.xavier_uniform(), (self.heads, d))
        # a_src couples to the RECEIVING row i, a_dst to the neighbor j
        # (the dense broadcast below fixes that orientation)
        e_src = jnp.einsum("zhd,hd->zh", Wh, a_src)  # (Z, H)
        e_dst = jnp.einsum("zhd,hd->zh", Wh, a_dst)
        if edge_index is not None:
            if edge_chunks is not None:
                from ananke_abm_tpu.ops.pallas.edge_gather import (
                    gat_edge_attention_gather,
                )

                out = gat_edge_attention_gather(
                    Wh, e_src, e_dst, edge_chunks,
                    edge_index[0], edge_index[1], Z,
                )
                return out.reshape(Z, self.features)
            from ananke_abm_tpu.ops.segment import (
                gat_edge_attention_multihead,
            )

            out = gat_edge_attention_multihead(
                Wh, e_src, e_dst, edge_index[0], edge_index[1], Z
            )
            return out.reshape(Z, self.features)
        scores = nn.leaky_relu(
            e_src[:, None, :] + e_dst[None, :, :], negative_slope=0.2
        )  # (Zi, Zj, H)
        scores = jnp.where(adj[:, :, None] > 0, scores, NEG)
        alpha = nn.softmax(scores, axis=1)
        out = jnp.einsum("ijh,jhd->ihd", alpha, Wh)  # (Z, H, d)
        return out.reshape(Z, self.features)


class ZoneGAT(nn.Module):
    """Stack of GAT layers with residual connections -> zone embeddings."""

    features: int = 64
    heads: int = 4
    num_layers: int = 2

    @nn.compact
    def __call__(self, zone_feats, adj, edge_index=None,
                 edge_chunks=None):
        h = nn.Dense(self.features)(zone_feats)
        for _ in range(self.num_layers):
            h = h + nn.elu(
                GATLayer(self.features, self.heads)(
                    h, adj, edge_index, edge_chunks
                )
            )
            h = nn.LayerNorm()(h)
        return h
