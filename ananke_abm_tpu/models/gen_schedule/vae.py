"""Schedule VAE wrappers: encoder + reparameterize + decoder.

Parity with the reference VAE wrappers
(src/ananke_abm/models/gen_schedule/models/vae_models.py:11-220):
``__call__(y) -> (logits, mu, logvar)`` and prior sampling via
``decode(z)`` / ``sample_from_prior``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.gen_schedule.decoders import (
    ScheduleDecoderLowRank,
    ScheduleDecoderPDS,
)
from ananke_abm_tpu.models.gen_schedule.encoders import (
    ScheduleEncoderCNN,
    ScheduleEncoderRNN,
    reparameterize,
)


class ScheduleVAE(nn.Module):
    """One module covering the reference's three wrappers, selected by config:

    encoder_kind in {"cnn", "rnn"}; ``use_pds`` switches the decoder to the
    PDS-conditioned variant (pds_features then required at call time).
    """

    L: int
    P: int
    z_dim: int
    emb_dim: int
    encoder_kind: str = "cnn"
    cnn_channels: Sequence[int] = (64, 64)
    cnn_kernel: int = 5
    cnn_dropout: float = 0.1
    cnn_norm: str = "group"
    rnn_hidden_dim: int = 64
    use_emb_layernorm: bool = False
    rnn_cell: str = "gru"
    use_pds: bool = False

    def setup(self):
        if self.encoder_kind == "cnn":
            self.encoder = ScheduleEncoderCNN(
                P=self.P,
                z_dim=self.z_dim,
                emb_dim=self.emb_dim,
                cnn_channels=tuple(self.cnn_channels),
                cnn_kernel=self.cnn_kernel,
                cnn_dropout=self.cnn_dropout,
                norm=self.cnn_norm,
            )
        elif self.encoder_kind == "rnn":
            self.encoder = ScheduleEncoderRNN(
                P=self.P,
                z_dim=self.z_dim,
                emb_dim=self.emb_dim,
                rnn_hidden_dim=self.rnn_hidden_dim,
                use_emb_layernorm=self.use_emb_layernorm,
                cell=self.rnn_cell,
            )
        else:
            raise ValueError(f"Unknown encoder_kind {self.encoder_kind!r}")

        if self.use_pds:
            self.decoder = ScheduleDecoderPDS(
                T=self.L, P=self.P, emb_dim=self.emb_dim
            )
        else:
            self.decoder = ScheduleDecoderLowRank(
                T=self.L, P=self.P, emb_dim=self.emb_dim
            )

    def encode(self, y_seq, deterministic: bool = True):
        return self.encoder(y_seq, deterministic=deterministic)

    def decode(self, z, pds_features: Optional[jnp.ndarray] = None):
        if self.use_pds:
            return self.decoder(z, pds_features)
        return self.decoder(z)

    def __call__(
        self,
        y_seq,
        rng_key,
        pds_features: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        mu, logvar = self.encode(y_seq, deterministic=deterministic)
        z = reparameterize(rng_key, mu, logvar)
        logits = self.decode(z, pds_features)
        return logits, mu, logvar

    def sample_from_prior(
        self, rng_key, batch_size: int, pds_features=None
    ):
        z = jax.random.normal(rng_key, (batch_size, self.z_dim))
        return self.decode(z, pds_features)
