"""Alternative ODE building blocks (parity with the reference's
ode_components.py:6-49 — a time-embedded drift with a learnable
``restart_alpha * (h0 - x)`` pullback toward the initial state, solved with
adjoint gradients; unused by the main training path in the reference but
part of its API surface)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ananke_abm_tpu.ode import odeint_adjoint


class TimeEmbedODEFunc(nn.Module):
    """dx/dt = net([x, time_embed(t)]) + restart_alpha * (x0 - x)."""

    dim: int
    hidden_dim: int = 64
    time_embed_dim: int = 8

    @nn.compact
    def __call__(self, t, x, x0):
        b = x.shape[0]
        freqs = 2.0 ** jnp.arange(self.time_embed_dim // 2)
        ang = t * freqs * 2 * jnp.pi / 24.0
        temb = jnp.broadcast_to(
            jnp.concatenate([jnp.sin(ang), jnp.cos(ang)]),
            (b, self.time_embed_dim),
        )
        h = nn.Dense(self.hidden_dim)(jnp.concatenate([x, temb], -1))
        h = nn.tanh(h)
        drift = nn.Dense(self.dim)(h)
        restart_alpha = self.param(
            "restart_alpha", nn.initializers.constant(0.1), ()
        )
        return drift + restart_alpha * (x0 - x)


def ode_block_solve(
    func: TimeEmbedODEFunc,
    params,
    x0,
    times,
    rtol: float = 1e-5,
    atol: float = 1e-5,
):
    """Integrate ``func`` over ``times`` with continuous-adjoint gradients
    at rtol=atol=1e-5 (the reference's odeint_adjoint usage,
    ode_components.py:30).

    ``params`` (the func's flax params) and ``x0`` (also referenced by the
    restart pullback) are threaded through the solver's differentiable
    ``args`` — closures over traced values would cut them out of the
    custom_vjp and silently zero their gradients.
    """

    def rhs(t, x, args):
        p, x0_ref = args
        return func.apply({"params": p}, t, x, x0_ref)

    return odeint_adjoint(
        rhs, x0, times, (params, x0), rtol=rtol, atol=atol
    )
