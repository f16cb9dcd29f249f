"""Fixed-step RK4 integrator as a ``lax.scan``.

TPU-native replacement for ``torchdiffeq.odeint(..., method="rk4")``
(reference: src/ananke_abm/models/mode_sep/architecture/model.py:184-191).

The whole day-horizon sweep is a single scan; each scan step is optionally
wrapped in ``jax.checkpoint`` so the backward pass rematerializes stage values
instead of storing every k_i in HBM — forward+backward stay HBM-resident for
long horizons (the "scan-remat" design from SURVEY.md §5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ode.tree import tree_axpy, tree_lincomb


def _rk4_step(rhs, t, dt, y, args):
    half = dt * 0.5
    k1 = rhs(t, y, args)
    k2 = rhs(t + half, tree_axpy(half, k1, y), args)
    k3 = rhs(t + half, tree_axpy(half, k2, y), args)
    k4 = rhs(t + dt, tree_axpy(dt, k3, y), args)
    incr = tree_lincomb(
        [dt / 6.0, dt / 3.0, dt / 3.0, dt / 6.0], [k1, k2, k3, k4]
    )
    return jax.tree_util.tree_map(jnp.add, y, incr)


def rk4_solve(rhs, y0, ts, args=None, *, substeps: int = 1, checkpoint: bool = True):
    """Integrate ``dy/dt = rhs(t, y, args)`` with fixed-step RK4.

    Args:
        rhs: callable ``(t, y, args) -> dy/dt`` over pytrees.
        y0: initial state pytree at ``ts[0]``.
        ts: (T,) strictly increasing output times.
        args: parameter pytree threaded to ``rhs`` (differentiable).
        substeps: RK4 substeps per output interval (static).
        checkpoint: rematerialize each interval in the backward pass.

    Returns:
        pytree with leaves of shape ``(T,) + leaf.shape`` — states at ``ts``
        (``ys[0] == y0``).
    """
    ts = jnp.asarray(ts)

    def interval(y, t0t1):
        t0, t1 = t0t1
        dt = (t1 - t0) / substeps

        def sub(i, y):
            return _rk4_step(rhs, t0 + i * dt, dt, y, args)

        y = jax.lax.fori_loop(0, substeps, sub, y, unroll=min(substeps, 4))
        return y, y

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, ys_tail = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    # prepend y0 so ys aligns with ts
    return jax.tree_util.tree_map(
        lambda y0_leaf, tail: jnp.concatenate([y0_leaf[None], tail], axis=0),
        y0,
        ys_tail,
    )


def euler_solve(rhs, y0, ts, args=None, *, substeps: int = 1, checkpoint: bool = True):
    """Fixed-step explicit Euler (useful as a convergence-test control)."""
    ts = jnp.asarray(ts)

    def interval(y, t0t1):
        t0, t1 = t0t1
        dt = (t1 - t0) / substeps

        def sub(i, y):
            return tree_axpy(dt, rhs(t0 + i * dt, y, args), y)

        y = jax.lax.fori_loop(0, substeps, sub, y, unroll=min(substeps, 4))
        return y, y

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, ys_tail = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    return jax.tree_util.tree_map(
        lambda y0_leaf, tail: jnp.concatenate([y0_leaf[None], tail], axis=0),
        y0,
        ys_tail,
    )
