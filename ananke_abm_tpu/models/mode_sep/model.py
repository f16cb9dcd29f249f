"""ModeSepModel: 2nd-order ODE over a location-embedding state.

Capability parity with the reference ModeSepModel
(src/ananke_abm/models/mode_sep/architecture/model.py:92-203):
- learnable class_table (Z, E) of zone-embedding anchors,
- static person context h from [age, income, emb(home), emb(work)],
- state y = [p, v, h]; drift a = net([p, v, h, sin t, cos t]), dp=v, dh=0,
- decode: MLP(p) -> cosine logits against the normalized class table / tau.

TPU-first: the solve is the integrator core's checkpointed-RK4 scan (or
adaptive dopri5 with adjoint gradients), batched over persons in one
program; optional diagonal Euler–Maruyama noise on [p, v].
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.mode_sep.config import ModeSepConfig
from ananke_abm_tpu.ode import euler_maruyama_solve, odeint


class ResidualBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim)(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim)(h)
        return nn.relu(x + h)


class DriftNet(nn.Module):
    """Acceleration network a = f([p, v, h, sin t, cos t]).

    The output layer is ZERO-initialized (standard neural-ODE practice):
    the dynamics start at rest, so the day-horizon solve is bounded at
    init and the squared velocity penalties produce finite first
    gradients. (The reference's default torch init makes the same
    unbounded relu-drift merely *less* explosive by luck of scale —
    epoch-1 loss ~1e7 — while an unlucky draw overflows the loss and
    freezes training under global-norm clipping.)"""

    emb_dim: int
    hidden_dim: int
    num_blocks: int

    @nn.compact
    def __call__(self, p, v, h, t):
        b = p.shape[0]
        sin_t = jnp.broadcast_to(jnp.sin(t * 2 * jnp.pi / 24.0), (b,))
        cos_t = jnp.broadcast_to(jnp.cos(t * 2 * jnp.pi / 24.0), (b,))
        x = jnp.concatenate(
            [p, v, h, sin_t[:, None], cos_t[:, None]], axis=-1
        )
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.hidden_dim)(x)
        return nn.Dense(self.emb_dim, kernel_init=nn.initializers.zeros)(x)


class ModeSepModel(nn.Module):
    Z: int
    config: ModeSepConfig

    def setup(self):
        c = self.config
        self.class_table = self.param(
            "class_table",
            nn.initializers.xavier_uniform(),
            (self.Z, c.emb_dim),
        )
        self.zone_embed = nn.Embed(self.Z, c.zone_emb_dim)
        self.context_encoder = nn.Sequential(
            [nn.Dense(c.hidden_dim), nn.relu, nn.Dense(c.context_dim)]
        )
        self.drift = DriftNet(
            emb_dim=c.emb_dim,
            hidden_dim=c.hidden_dim,
            num_blocks=c.num_res_blocks,
        )
        self.decoder = nn.Sequential(
            [nn.Dense(c.hidden_dim), nn.relu, nn.Dense(c.emb_dim)]
        )

    def encode_context(self, traits, home_idx, work_idx):
        home = self.zone_embed(home_idx)
        work = self.zone_embed(work_idx)
        return self.context_encoder(
            jnp.concatenate([traits, home, work], axis=-1)
        )

    def initial_state(self, home_idx, traits, work_idx):
        E = self.config.emb_dim
        p0 = jax.lax.stop_gradient(self.class_table)[home_idx]
        v0 = jnp.zeros_like(p0)
        h = self.encode_context(traits, home_idx, work_idx)
        return jnp.concatenate([p0, v0, h], axis=-1)

    def rhs(self, t, y):
        E, H = self.config.emb_dim, self.config.context_dim
        p, v, h = jnp.split(y, [E, 2 * E], axis=-1)
        a = self.drift(p, v, h, t)
        return jnp.concatenate([v, a, jnp.zeros_like(h)], axis=-1)

    def decode_logits(self, p_t):
        pred_emb = self.decoder(p_t)  # (B, T, E)
        table = self.class_table
        table_n = table / (
            jnp.linalg.norm(table, axis=-1, keepdims=True) + 1e-8
        )
        emb_n = pred_emb / (
            jnp.linalg.norm(pred_emb, axis=-1, keepdims=True) + 1e-8
        )
        logits = (
            jnp.einsum(
                "bte,ze->btz", emb_n, table_n, preferred_element_type=jnp.float32
            )
            / self.config.softmax_tau
        )
        return pred_emb, logits

    def __call__(self, times_union, home_idx, work_idx, traits, rng=None):
        """Returns (pred_emb (B,T,E), logits (B,T,Z), v (B,T,E))."""
        c = self.config
        E, H = c.emb_dim, c.context_dim
        y0 = self.initial_state(home_idx, traits, work_idx)

        if self.is_initializing():
            # Materialize every submodule's params with ONE un-scanned call —
            # creating params inside the solver's scan/checkpoint bodies
            # would leak init tracers. The solve itself is skipped at init.
            _ = self.rhs(times_union[0], y0)
            ys0 = jnp.broadcast_to(
                y0[:, None, :], (y0.shape[0], times_union.shape[0], y0.shape[1])
            )
            p_t, v_t, _ = jnp.split(ys0, [E, 2 * E], axis=-1)
            pred_emb, logits = self.decode_logits(p_t)
            return pred_emb, logits, v_t

        def rhs(t, y, args):
            return self.rhs(t, y)

        if c.enable_sde and c.sde_noise_strength > 0.0:
            if rng is None:
                rng = self.make_rng("sde")

            def diffusion(t, y, args):
                g = jnp.zeros_like(y)
                return g.at[..., : 2 * E].set(c.sde_noise_strength)

            sde_dt = getattr(c, "sde_dt", None)
            if sde_dt:
                # fixed internal grid: noise path independent of the
                # union-grid choice (see config.py)
                ys = euler_maruyama_solve(
                    rhs, diffusion, y0, times_union, rng,
                    dt=sde_dt,
                    num_steps=int(round(
                        getattr(c, "sde_span_hours", 24.0) / sde_dt
                    )),
                )
            else:
                ys = euler_maruyama_solve(
                    rhs, diffusion, y0, times_union, rng,
                    substeps=c.sde_substeps,
                )
        else:
            ys = odeint(
                rhs,
                y0,
                times_union,
                method=c.ode_method,
                rtol=c.rtol,
                atol=c.atol,
                substeps=c.rk4_substeps,
                # params live in the flax closure -> the adjoint custom_vjp
                # cannot see them; adaptive dopri5 here is forward-only
                # (training uses checkpointed-RK4/SDE, or ode_components.
                # ode_block_solve which threads params via args)
                adjoint=False,
            )
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, 2E+H)
        p_t, v_t, _ = jnp.split(ys, [E, 2 * E], axis=-1)
        pred_emb, logits = self.decode_logits(p_t)
        return pred_emb, logits, v_t
