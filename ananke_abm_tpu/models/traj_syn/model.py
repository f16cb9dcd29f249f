"""TrajEmbed: schedule VAE with FiLM purpose-catalog conditioning.

Dual-space design: the latent pathway produces per-purpose factors that a
FiLM layer modulates with the purposes-catalog statistics (participation,
duration/start percentiles, circular variance, flexibility — the
make_purposes output, SURVEY.md §2.6/§2.8), so purposes with similar
real-world statistics share decoder structure. A TransitionCRF (linear) or
semi-CRF head refines the frame logits into coherent segment sequences.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.gen_schedule.encoders import (
    ScheduleEncoderCNN,
    reparameterize,
)


class FiLMDecoder(nn.Module):
    """Low-rank time-basis decoder with FiLM modulation per purpose."""

    T: int
    P: int
    emb_dim: int

    @nn.compact
    def __call__(self, z, purpose_feats):
        """z: (B, z_dim); purpose_feats: (P, F) catalog features."""
        B = z.shape[0]
        time_basis = self.param(
            "time_basis", nn.initializers.xavier_normal(),
            (self.T, self.emb_dim),
        )
        factors = nn.Dense(self.P * self.emb_dim, name="latent_to_factor")(z)
        factors = factors.reshape(B, self.P, self.emb_dim)

        film = nn.Dense(2 * self.emb_dim, name="film")(purpose_feats)
        scale, shift = jnp.split(film, 2, axis=-1)  # (P, H) each
        factors = factors * (1.0 + scale)[None] + shift[None]

        bias = self.param("bias", nn.initializers.zeros, (self.P,))
        logits = jnp.einsum(
            "th,bph->btp", time_basis, factors,
            preferred_element_type=jnp.float32,
        )
        return logits + bias[None, None, :]


class TrajEmbedVAE(nn.Module):
    L: int
    P: int
    z_dim: int
    emb_dim: int
    cnn_channels: tuple = (64, 64)
    cnn_kernel: int = 5
    cnn_dropout: float = 0.1

    def setup(self):
        self.encoder = ScheduleEncoderCNN(
            P=self.P, z_dim=self.z_dim, emb_dim=self.emb_dim,
            cnn_channels=tuple(self.cnn_channels),
            cnn_kernel=self.cnn_kernel, cnn_dropout=self.cnn_dropout,
        )
        self.decoder = FiLMDecoder(T=self.L, P=self.P, emb_dim=self.emb_dim)

    def encode(self, y_seq, deterministic=True):
        return self.encoder(y_seq, deterministic=deterministic)

    def decode(self, z, purpose_feats):
        return self.decoder(z, purpose_feats)

    def __call__(self, y_seq, rng, purpose_feats, deterministic=True):
        mu, logvar = self.encode(y_seq, deterministic)
        z = reparameterize(rng, mu, logvar)
        logits = self.decode(z, purpose_feats)
        return logits, mu, logvar

    def sample_from_prior(self, rng, batch_size, purpose_feats):
        z = jax.random.normal(rng, (batch_size, self.z_dim))
        return self.decode(z, purpose_feats)
