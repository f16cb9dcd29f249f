"""Schedule encoders: residual Conv1D stack and bidirectional GRU.

Capability parity with the reference encoders
(src/ananke_abm/models/gen_schedule/models/encoders.py:5-200):
embed -> feature extractor -> (mu, logvar) heads.

TPU-first deviations (documented, config-controlled):
- Convs run in NWC layout (flax native) — (B, T, C) maps the T axis onto
  XLA's spatial tiling with no transposes.
- Normalization defaults to GroupNorm: shard-invariant under data
  parallelism, no mutable batch statistics to synchronize across the mesh
  (the reference's BatchNorm1d would need cross-shard psum of batch stats
  — SURVEY.md §7.3 hard-part 6). ``norm="batch"`` is intentionally not
  offered; GroupNorm with groups=min(8, C) is the supported semantics.
- The RNN encoder uses a bidirectional GRU scan (flax RNN over GRUCell):
  same summary contract (concat of final forward/backward states).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResidualConvBlock(nn.Module):
    """Conv -> GN -> relu -> dropout -> Conv -> GN, relu(residual + out)."""

    features: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # x: (B, T, C_in)
        residual = x
        h = nn.Conv(self.features, (self.kernel_size,), padding="SAME")(x)
        h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.features, (self.kernel_size,), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1,))(residual)
        return nn.relu(h + residual)


class ScheduleEncoderCNN(nn.Module):
    """(B, T) int labels -> (mu, logvar) each (B, z_dim)."""

    P: int
    z_dim: int
    emb_dim: int
    cnn_channels: Sequence[int] = (64, 64)
    cnn_kernel: int = 5
    cnn_dropout: float = 0.1

    @nn.compact
    def __call__(self, y_seq, deterministic: bool = True):
        x = nn.Embed(self.P, self.emb_dim)(y_seq)  # (B, T, E)
        for ch in self.cnn_channels:
            x = ResidualConvBlock(ch, self.cnn_kernel, self.cnn_dropout)(
                x, deterministic
            )
        pooled = jnp.mean(x, axis=1)  # global average over time
        mu = nn.Dense(self.z_dim)(pooled)
        logvar = nn.Dense(self.z_dim)(pooled)
        return mu, logvar


class ScheduleEncoderRNN(nn.Module):
    """Bidirectional recurrent encoder; summary = concat(final fwd, final
    bwd hidden states).

    ``cell="gru"`` (default, TPU-friendly: 3 gates/step) or ``cell="lstm"``
    — the reference ``ScheduleEncoderRNN`` is a BiLSTM
    (src/ananke_abm/models/gen_schedule/models/encoders.py:125-166); the
    lstm option reproduces that architecture exactly (the summary is the
    hidden state h, not the cell state c)."""

    P: int
    z_dim: int
    emb_dim: int
    rnn_hidden_dim: int = 64
    use_emb_layernorm: bool = False
    cell: str = "gru"

    def _make_cell(self):
        if self.cell == "gru":
            return nn.GRUCell(self.rnn_hidden_dim)
        if self.cell == "lstm":
            return nn.OptimizedLSTMCell(self.rnn_hidden_dim)
        raise ValueError(f"Unknown rnn cell {self.cell!r}; use gru|lstm")

    @nn.compact
    def __call__(self, y_seq, deterministic: bool = True):
        emb = nn.Embed(self.P, self.emb_dim)(y_seq)  # (B, T, E)
        if self.use_emb_layernorm:
            emb = nn.LayerNorm()(emb)

        fwd = nn.RNN(self._make_cell(), return_carry=True)
        bwd = nn.RNN(
            self._make_cell(), return_carry=True, reverse=True
        )
        carry_f, _ = fwd(emb)
        carry_b, _ = bwd(emb)
        if self.cell == "lstm":  # carry = (c, h); summarize h
            carry_f, carry_b = carry_f[1], carry_b[1]
        summary = jnp.concatenate([carry_f, carry_b], axis=-1)
        mu = nn.Dense(self.z_dim)(summary)
        logvar = nn.Dense(self.z_dim)(summary)
        return mu, logvar


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, mu.shape, mu.dtype)
