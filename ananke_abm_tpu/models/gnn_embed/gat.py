"""Graph-attention zone encoder.

Multi-head GAT over the zone graph (adjacency-masked dense attention —
zone counts are O(10^2..10^3), so the (Z, Z) attention is a single small
MXU matmul; the sparse edge-list path for larger graphs lives in
ananke_abm_tpu.ops.segment / ops.pallas).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

NEG = -1e30


class GATLayer(nn.Module):
    features: int
    heads: int = 4

    @nn.compact
    def __call__(self, h, adj):
        """h: (Z, F_in), adj: (Z, Z) {0,1} with self loops. -> (Z, features)"""
        Z = h.shape[0]
        assert self.features % self.heads == 0
        d = self.features // self.heads
        Wh = nn.Dense(self.features, use_bias=False)(h)  # (Z, H*d)
        Wh = Wh.reshape(Z, self.heads, d)

        a_src = self.param("a_src", nn.initializers.xavier_uniform(), (self.heads, d))
        a_dst = self.param("a_dst", nn.initializers.xavier_uniform(), (self.heads, d))
        e_src = jnp.einsum("zhd,hd->zh", Wh, a_src)  # (Z, H)
        e_dst = jnp.einsum("zhd,hd->zh", Wh, a_dst)
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
    def __call__(self, zone_feats, adj):
        h = nn.Dense(self.features)(zone_feats)
        for _ in range(self.num_layers):
            h = h + nn.elu(GATLayer(self.features, self.heads)(h, adj))
            h = nn.LayerNorm()(h)
        return h
