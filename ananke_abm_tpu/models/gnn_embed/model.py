"""GAT-ODE: the flagship integrate-then-decode trajectory model.

North-star architecture (BASELINE.json): a graph-attention encoder embeds
the zone graph once per step; each agent carries a latent position x(t)
whose dynamics attend over the zone embeddings (person<->zone bipartite
attention); a fixed-step RK4 / adaptive dopri5 sweep integrates all agents
in one fused program; decoding contracts agent positions against the zone
embeddings to produce per-time zone logits.

Everything is one jit: encode -> integrate (lax.scan) -> decode. The agent
axis is embarrassingly shardable (mesh axis "data"); the zone axis shards
over "model" with psum-normalized attention (see parallel/sharded.py).

FLOP structure per RK4 stage: (N, Da) x (Da, Dz) query proj, (N, Dz) x
(Dz, Z) attention scores, (N, Z) x (Z, Dz) context, then the drift MLP —
all MXU matmuls batched over the full agent population.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.gnn_embed.gat import ZoneGAT
from ananke_abm_tpu.ode import odeint


class AgentDrift(nn.Module):
    """dx/dt = f([x, ctx, h, sin t, cos t]) with residual MLP.

    ``dtype`` is the computation dtype: bfloat16 feeds the MXU at full
    rate while params stay float32; the returned derivative is cast back
    to float32 so integrator state/accumulation stays full precision.
    """

    agent_dim: int
    hidden_dim: int
    num_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, h, t):
        n = x.shape[0]
        sin_t = jnp.broadcast_to(jnp.sin(t * 2 * jnp.pi / 24.0), (n, 1))
        cos_t = jnp.broadcast_to(jnp.cos(t * 2 * jnp.pi / 24.0), (n, 1))
        z = jnp.concatenate([x, ctx, h, sin_t, cos_t], axis=-1)
        z = z.astype(self.dtype)
        z = nn.Dense(self.hidden_dim, dtype=self.dtype)(z)
        z = nn.tanh(z)
        for _ in range(self.num_blocks):
            r = nn.Dense(self.hidden_dim, dtype=self.dtype)(z)
            r = nn.tanh(r)
            r = nn.Dense(self.hidden_dim, dtype=self.dtype)(r)
            z = nn.tanh(z + r)
        out = nn.Dense(self.agent_dim, dtype=self.dtype)(z)
        return out.astype(jnp.float32)


class GATODE(nn.Module):
    """Flagship graph-ODE model over (agents x zones)."""

    num_zone_features: int
    person_feat_dim: int
    zone_dim: int = 64
    agent_dim: int = 32
    context_dim: int = 32
    hidden_dim: int = 128
    gat_heads: int = 4
    gat_layers: int = 2
    num_blocks: int = 2
    attn_temp: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.zone_gat = ZoneGAT(
            features=self.zone_dim,
            heads=self.gat_heads,
            num_layers=self.gat_layers,
        )
        self.context_encoder = nn.Sequential(
            [nn.Dense(self.hidden_dim), nn.relu, nn.Dense(self.context_dim)]
        )
        self.query_proj = nn.Dense(self.zone_dim, use_bias=False)
        self.drift = AgentDrift(
            agent_dim=self.agent_dim,
            hidden_dim=self.hidden_dim,
            num_blocks=self.num_blocks,
            dtype=self.compute_dtype,
        )
        self.init_proj = nn.Dense(self.agent_dim)
        self.decode_proj = nn.Dense(self.zone_dim, use_bias=False)

    def encode_zones(self, zone_feats, adj, edge_index=None,
                     edge_chunks=None):
        """(Z, Dz) zone embeddings. Pass ``edge_index`` (host-built once
        — via ops.segment.edges_from_adj or directly as COO src/dst
        arrays, in which case ``adj`` may be None and the (Z, Z) matrix
        is never materialized) to run the attention over the edge list
        instead of the dense mask. Same params; exact equality vs dense
        on the XLA path, bf16-feature precision (rel err <= ~3e-3) when
        the TPU Pallas dispatch engages (Z <= 2048 win region).
        ``edge_chunks`` additionally routes the edge attention through
        the large-Z block-pair kernel (win region Z >= 8192 — see
        ops/pallas/edge_gather.py; train() gates it on chunk fill)."""
        return self.zone_gat(
            zone_feats, adj, edge_index, edge_chunks
        )  # (Z, Dz)

    def zone_attention(self, x, zone_emb):
        """Bipartite person->zone attention. x: (N, Da) -> ctx (N, Dz)."""
        dt = self.compute_dtype
        q = self.query_proj(x).astype(dt)  # (N, Dz)
        ze = zone_emb.astype(dt)
        scores = jnp.einsum(
            "nd,zd->nz", q, ze, preferred_element_type=jnp.float32
        ) / (self.attn_temp * jnp.sqrt(float(zone_emb.shape[-1])))
        attn = jax.nn.softmax(scores, axis=-1).astype(dt)
        return jnp.einsum(
            "nz,zd->nd", attn, ze, preferred_element_type=jnp.float32
        )

    def initial_state(self, person_feats, home_zone_ids, zone_emb):
        h = self.context_encoder(person_feats)  # (N, H)
        x0 = self.init_proj(
            jnp.concatenate([zone_emb[home_zone_ids], h], axis=-1)
        )
        return x0, h

    def rhs(self, t, x, h, zone_emb):
        ctx = self.zone_attention(x, zone_emb)
        return self.drift(x, ctx, h, t)

    def decode(self, x, zone_emb):
        """x: (..., Da) -> zone logits (..., Z)."""
        d = self.decode_proj(x)
        return jnp.einsum(
            "...d,zd->...z", d, zone_emb, preferred_element_type=jnp.float32
        )

    def __call__(
        self,
        zone_feats,
        adj,
        person_feats,
        home_zone_ids,
        times,
        *,
        ode_method: str = "rk4",
        substeps: int = 4,
        rtol: float = 1e-5,
        atol: float = 1e-5,
        checkpoint: bool = True,
        edge_index=None,
        edge_chunks=None,
    ):
        """Full integrate-then-decode. Returns (logits (N, T, Z), xs (N, T, Da))."""
        zone_emb = self.encode_zones(zone_feats, adj, edge_index,
                                     edge_chunks)
        x0, h = self.initial_state(person_feats, home_zone_ids, zone_emb)

        if self.is_initializing():
            _ = self.rhs(times[0], x0, h, zone_emb)
            xs = jnp.broadcast_to(
                x0[:, None, :], (x0.shape[0], times.shape[0], x0.shape[1])
            )
            return self.decode(xs, zone_emb), xs

        def rhs(t, x, args):
            return self.rhs(t, x, h, zone_emb)

        xs = odeint(
            rhs, x0, times,
            method=ode_method, substeps=substeps, rtol=rtol, atol=atol,
            adjoint=False,  # flax closure holds the params (see mode_sep)
            checkpoint=checkpoint,
        )  # (T, N, Da)
        xs = jnp.swapaxes(xs, 0, 1)
        logits = self.decode(xs, zone_emb)
        return logits, xs
