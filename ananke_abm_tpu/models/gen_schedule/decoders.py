"""Schedule decoders: latent -> (B, T, P) logits.

Capability parity with the reference decoders
(src/ananke_abm/models/gen_schedule/models/decoders.py:5-182): a low-rank
factorization — learned time basis (T, H) contracted with latent-derived
per-purpose factors (B, P, H) — plus, in the PDS variant, an additive bias
computed from fixed Purpose-Distribution-Space features.

The contraction runs as one batched matmul (B*P, H) x (H, T): a single MXU
call per decode; XLA fuses the bias adds into it.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ScheduleDecoderLowRank(nn.Module):
    """logits[b,t,p] = <time_basis[t], factor[b,p]> + bias[p]."""

    T: int
    P: int
    emb_dim: int

    @nn.compact
    def __call__(self, z):
        B = z.shape[0]
        time_basis = self.param(
            "time_basis",
            lambda k, s: 0.01 * nn.initializers.normal(1.0)(k, s),
            (self.T, self.emb_dim),
        )
        factors = nn.Dense(self.P * self.emb_dim, name="latent_to_factor")(z)
        factors = factors.reshape(B, self.P, self.emb_dim)
        bias = self.param("bias", nn.initializers.zeros, (self.P,))
        logits = jnp.einsum(
            "th,bph->btp", time_basis, factors, preferred_element_type=jnp.float32
        )
        return logits + bias[None, None, :]


class ScheduleDecoderPDS(nn.Module):
    """Low-rank latent pathway + additive PDS-feature bias.

    ``pds_features`` (P, T, D_pds) — e.g. stacked [m_tod, start_rate] — is
    a fixed input (closed over by the factory), projected by a shared
    no-bias linear to a (T, P) score plus a learned per-purpose bias,
    broadcast over the batch.
    """

    T: int
    P: int
    emb_dim: int

    @nn.compact
    def __call__(self, z, pds_features):
        B = z.shape[0]

        h = nn.Dense(self.emb_dim, name="latent_proj_in")(z)
        h = nn.relu(h)
        factors = nn.Dense(self.P * self.emb_dim, name="latent_proj_out")(h)
        factors = factors.reshape(B, self.P, self.emb_dim)

        time_basis = self.param(
            "time_basis",
            nn.initializers.xavier_normal(),
            (self.T, self.emb_dim),
        )
        latent_bias = self.param(
            "latent_bias", nn.initializers.zeros, (self.P,)
        )
        latent_logits = jnp.einsum(
            "th,bph->btp", time_basis, factors, preferred_element_type=jnp.float32
        )
        latent_logits = latent_logits + latent_bias[None, None, :]

        # PDS pathway: (P, T, D) -> (P, T) -> (T, P), shared linear + bias
        pds_score = nn.Dense(1, use_bias=False, name="pds_linear")(pds_features)
        pds_score = pds_score[..., 0]  # (P, T)
        pds_bias = self.param("pds_bias", nn.initializers.zeros, (self.P,))
        pds_score = (pds_score + pds_bias[:, None]).T  # (T, P)

        return latent_logits + pds_score[None, :, :]
