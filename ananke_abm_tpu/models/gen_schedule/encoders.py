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
  — SURVEY.md §7.3 hard-part 6). ``norm="batch"`` is the reference-exact
  escape hatch: :class:`SyncBatchNorm` reproduces torch ``BatchNorm1d``
  semantics (biased variance for normalization, unbiased for the running
  update, momentum 0.1, eps 1e-5) with cross-shard stat sync — implicit
  under GSPMD data parallelism (the batch reduction is global, XLA
  inserts the collective) and explicit ``psum`` over ``axis_name`` inside
  shard_map/pmap bodies. Tradeoff vs GroupNorm: per-example outputs
  depend on the global batch composition, so loss values are only
  shard-invariant when the global batch is identical — and the mutable
  ``batch_stats`` collection must ride the train loop and checkpoints.
- The RNN encoder uses a bidirectional GRU scan (flax RNN over GRUCell):
  same summary contract (concat of final forward/backward states).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SyncBatchNorm(nn.Module):
    """torch ``BatchNorm1d``-exact batch norm over the (batch, time) axes.

    Matches the reference encoder's normalizer
    (src/ananke_abm/models/gen_schedule/models/encoders.py:23-26) bit-for-
    bit in semantics: normalization uses the BIASED batch variance, the
    running-variance update uses the UNBIASED one (n/(n-1)), the running
    update is ``(1-m)*old + m*new`` with torch's m=0.1 default, eps=1e-5.
    Running stats live in the mutable ``batch_stats`` collection
    ({"mean", "var"} per instance) and are read verbatim in eval mode
    (``use_running_average=True``), exactly torch ``model.eval()``.

    Sharding: under GSPMD data parallelism the (B, T) reductions below are
    over the GLOBAL batch — XLA inserts the cross-shard collective, so
    stats are synced with no code here. Inside shard_map/pmap bodies the
    global batch is invisible; pass ``axis_name`` and the sums/counts psum
    across the named axis (torch ``SyncBatchNorm`` equivalent).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        # x: (B, T, C)
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = float(x.shape[0] * x.shape[1])
            s = jnp.sum(x, axis=(0, 1))
            ss = jnp.sum(jnp.square(x), axis=(0, 1))
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            mean = s / n
            var = ss / n - jnp.square(mean)  # biased, for normalization
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * gamma + beta


class ResidualConvBlock(nn.Module):
    """Conv -> norm -> relu -> dropout -> Conv -> norm, relu(residual + out).

    ``norm="group"`` (default, shard-invariant) or ``norm="batch"``
    (reference-exact torch BatchNorm1d semantics via SyncBatchNorm)."""

    features: int
    kernel_size: int
    dropout: float
    norm: str = "group"
    bn_axis_name: Optional[str] = None

    def _norm(self, h, deterministic: bool):
        if self.norm == "group":
            return nn.GroupNorm(num_groups=min(8, self.features))(h)
        if self.norm == "batch":
            return SyncBatchNorm(axis_name=self.bn_axis_name)(
                h, use_running_average=deterministic
            )
        raise ValueError(f"Unknown norm {self.norm!r}; use group|batch")

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # x: (B, T, C_in)
        residual = x
        h = nn.Conv(self.features, (self.kernel_size,), padding="SAME")(x)
        h = self._norm(h, deterministic)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.features, (self.kernel_size,), padding="SAME")(h)
        h = self._norm(h, deterministic)
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
    norm: str = "group"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, y_seq, deterministic: bool = True):
        x = nn.Embed(self.P, self.emb_dim)(y_seq)  # (B, T, E)
        for ch in self.cnn_channels:
            x = ResidualConvBlock(
                ch, self.cnn_kernel, self.cnn_dropout,
                norm=self.norm, bn_axis_name=self.bn_axis_name,
            )(x, deterministic)
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
