"""GenerativeODE: conditional latent SDE over rich-feature positions.

Capability parity with the reference GenerativeODE
(src/ananke_abm/models/latent_ode/architecture/model.py:132-220):
- zone-feature linear encoder; VAE encoder over [person attrs, home/work
  zone embeds, initial purpose/mode features] -> (mu, logvar) of h0;
- position p = [zone_embed, purpose_features, mode_features]; second-order
  state s = [p, v]; solver state y = [s, h] with dh/dt = 0;
- drift dv = net([p, v, h, sin t, cos t]) PLUS a physics correction
  -correction_strength * d/dp (sigmoid(is_moving) - (1 -
  sigmoid(is_stationary)))^2 — the reference computes this with
  torch.autograd.grad inside the RHS (model.py:93-98); here it is
  ``jax.grad`` of the potential, fused into the RHS and composing cleanly
  with both backprop-through-scan and the continuous adjoint;
- decode: loc logits via einsum against candidate zone embeddings,
  purpose/mode linear heads.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.latent_ode.config import GenerativeODEConfig
from ananke_abm_tpu.ode import euler_maruyama_solve, odeint


class ResidualBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim)(x)
        h = nn.tanh(h)
        h = nn.Dense(self.dim)(h)
        return nn.tanh(x + h)


class DynamicsNet(nn.Module):
    """Core drift network (acceleration for 2nd-order, velocity otherwise)."""

    out_dim: int
    hidden_dim: int
    num_blocks: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.hidden_dim)(x)
        return nn.Dense(self.out_dim)(x)


class GenerativeODE(nn.Module):
    person_feat_dim: int
    num_zone_features: int
    config: GenerativeODEConfig

    def setup(self):
        c = self.config
        self.zone_feature_encoder = nn.Dense(c.zone_embed_dim)
        self.encoder = nn.Sequential(
            [
                nn.Dense(c.encoder_hidden_dim),
                nn.relu,
                nn.Dense(c.hidden_dim * 2),
            ]
        )
        self.dynamics = DynamicsNet(
            out_dim=c.position_dim,
            hidden_dim=c.ode_hidden_dim,
            num_blocks=c.num_residual_blocks,
        )
        self.decoder_loc = nn.Dense(c.zone_embed_dim)
        self.decoder_purpose = nn.Dense(len(c.purpose_groups))
        self.decoder_mode = nn.Dense(c.num_modes)

    # ---- physics constraint ----
    def _potential(self, p):
        c = self.config
        zs = c.zone_embed_dim
        purpose_feat = p[..., zs : zs + c.purpose_feature_dim]
        mode_feat = p[..., zs + c.purpose_feature_dim :]
        is_moving = jax.nn.sigmoid(mode_feat[..., 0])
        is_stationary = jax.nn.sigmoid(purpose_feat[..., 0])
        return jnp.sum((is_moving - (1.0 - is_stationary)) ** 2)

    def dynamics_rhs(self, t, y):
        """dy/dt for y = [state, h]."""
        c = self.config
        state, h = jnp.split(y, [c.state_dim], axis=-1)
        b = state.shape[0]
        sin_t = jnp.broadcast_to(jnp.sin(t * 2 * jnp.pi / 24.0), (b, 1))
        cos_t = jnp.broadcast_to(jnp.cos(t * 2 * jnp.pi / 24.0), (b, 1))

        if c.use_second_order_sde:
            p, v = jnp.split(state, 2, axis=-1)
            a = self.dynamics(jnp.concatenate([p, v, h, sin_t, cos_t], -1))
            corr = -jax.grad(self._potential)(p)
            d_state = jnp.concatenate(
                [v, a + c.correction_strength * corr], axis=-1
            )
        else:
            p = state
            vel = self.dynamics(jnp.concatenate([p, h, sin_t, cos_t], -1))
            corr = -jax.grad(self._potential)(p)
            d_state = vel + c.correction_strength * corr
        return jnp.concatenate([d_state, jnp.zeros_like(h)], axis=-1)

    def encode_h0(
        self,
        person_features,
        home_embed,
        work_embed,
        initial_purpose_features,
        initial_mode_features,
        rng,
    ):
        c = self.config
        enc_in = jnp.concatenate(
            [
                person_features,
                home_embed,
                work_embed,
                initial_purpose_features,
                initial_mode_features,
            ],
            axis=-1,
        )
        out = self.encoder(enc_in)
        mu, logvar = jnp.split(out, 2, axis=-1)
        h0 = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return h0, mu, logvar

    def __call__(
        self,
        person_features,
        home_zone_features,
        work_zone_features,
        initial_purpose_features,
        initial_mode_features,
        times,
        all_zone_features,
        rng,
    ):
        c = self.config
        candidate_embeds = self.zone_feature_encoder(all_zone_features)
        home_embed = self.zone_feature_encoder(home_zone_features)
        work_embed = self.zone_feature_encoder(work_zone_features)

        h0, mu, logvar = self.encode_h0(
            person_features, home_embed, work_embed,
            initial_purpose_features, initial_mode_features,
            jax.random.fold_in(rng, 0),
        )
        p0 = jnp.concatenate(
            [home_embed, initial_purpose_features, initial_mode_features], -1
        )
        s0 = (
            jnp.concatenate([p0, jnp.zeros_like(p0)], -1)
            if c.use_second_order_sde
            else p0
        )
        y0 = jnp.concatenate([s0, h0], axis=-1)

        if self.is_initializing():
            # materialize dynamics params outside the solver scan (see
            # mode_sep/model.py for rationale), skip the solve
            _ = self.dynamics_rhs(times[0], y0)
            ys = jnp.broadcast_to(
                y0[:, None, :], (y0.shape[0], times.shape[0], y0.shape[1])
            )
        else:
            def rhs(t, y, args):
                return self.dynamics_rhs(t, y)

            if c.enable_sde:
                def diffusion(t, y, args):
                    g = jnp.zeros_like(y)
                    return g.at[..., : c.state_dim].set(c.sde_noise_strength)

                sde_dt = getattr(c, "sde_dt", None)
                if sde_dt:
                    # fixed internal grid: discretization + noise path
                    # independent of the output times (see config.py)
                    ys = euler_maruyama_solve(
                        rhs, diffusion, y0, times,
                        jax.random.fold_in(rng, 1),
                        dt=sde_dt,
                        num_steps=int(round(
                            getattr(c, "sde_span_hours", 24.0) / sde_dt
                        )),
                    )
                else:
                    ys = euler_maruyama_solve(
                        rhs, diffusion, y0, times,
                        jax.random.fold_in(rng, 1),
                        substeps=c.sde_substeps,
                    )
            else:
                ys = odeint(
                    rhs, y0, times,
                    method=c.ode_method, rtol=c.rtol, atol=c.atol,
                    substeps=c.rk4_substeps,
                    # params live in the flax closure -> the adjoint
                    # custom_vjp cannot see them; dopri5 here is
                    # forward-only (training uses SDE/RK4 backprop, or
                    # ode_components.ode_block_solve for adjoint)
                    adjoint=False,
                )
            ys = jnp.swapaxes(ys, 0, 1)  # (B, T, D)

        pred_s = ys[..., : c.state_dim]
        pred_p = (
            pred_s[..., : c.position_dim] if c.use_second_order_sde else pred_s
        )
        zs = c.zone_embed_dim
        loc_embed = pred_p[..., :zs]
        purpose_feat = pred_p[..., zs : zs + c.purpose_feature_dim]
        mode_feat = pred_p[..., zs + c.purpose_feature_dim :]

        target_loc = self.decoder_loc(loc_embed)
        loc_logits = jnp.einsum(
            "bsd,zd->bsz", target_loc, candidate_embeds,
            preferred_element_type=jnp.float32,
        )
        purp_logits = self.decoder_purpose(purpose_feat)
        mode_logits = self.decoder_mode(mode_feat)
        return (
            loc_logits, loc_embed, purp_logits, mode_logits,
            purpose_feat, mode_feat, mu, logvar,
        )

    def encode_zones(self, all_zone_features):
        return self.zone_feature_encoder(all_zone_features)
