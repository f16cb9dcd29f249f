"""Euler–Maruyama SDE integrator with counter-based PRNG.

TPU-native replacement for ``torchsde.sdeint(..., method="euler")``
(reference: src/ananke_abm/models/latent_ode/architecture/model.py:194,
mode_sep/architecture/model.py:176-182).

Noise is generated per-substep via ``jax.random.fold_in`` on a base key, so
the whole sweep is one ``lax.scan`` with no host-side RNG state and fully
reproducible across shardings. Differentiable by (optionally checkpointed)
backprop through the scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ode.tree import tree_axpy, tree_map


def euler_maruyama_solve(
    drift,
    diffusion,
    y0,
    ts,
    key,
    args=None,
    *,
    substeps: int = 1,
    checkpoint: bool = True,
):
    """Integrate ``dy = f(t,y) dt + g(t,y) dW`` (diagonal noise, Itô).

    Args:
        drift: ``(t, y, args) -> f`` pytree.
        diffusion: ``(t, y, args) -> g`` pytree (diagonal diffusion,
            elementwise std-dev per state coordinate).
        y0: initial state pytree at ``ts[0]``.
        ts: (T,) strictly increasing output times.
        key: PRNG key; substep noise derives from ``fold_in(key, step_id)``.
        substeps: Euler–Maruyama substeps per output interval (static). The
            reference integrates with a fixed ``dt``; choose
            ``substeps >= ceil(max_gap / dt)`` for equivalent resolution.
        checkpoint: rematerialize intervals in the backward pass.

    Returns:
        pytree with leaves ``(T,) + leaf.shape`` — states at ``ts``.
    """
    ts = jnp.asarray(ts)

    def interval(carry, inp):
        y, step_base = carry
        t0, t1 = inp
        dt = (t1 - t0) / substeps
        sqrt_dt = jnp.sqrt(jnp.abs(dt))

        def sub(i, y):
            t = t0 + i * dt
            k = jax.random.fold_in(key, step_base + i)
            f = drift(t, y, args)
            g = diffusion(t, y, args)
            leaves, treedef = jax.tree_util.tree_flatten(y)
            subkeys = jax.random.split(k, len(leaves))
            noise_leaves = [
                jax.random.normal(sk, l.shape, l.dtype)
                for sk, l in zip(subkeys, leaves)
            ]
            dW = jax.tree_util.tree_unflatten(treedef, noise_leaves)
            y = tree_axpy(dt, f, y)
            y = tree_map(lambda yl, gl, wl: yl + gl * wl * sqrt_dt, y, g, dW)
            return y

        y = jax.lax.fori_loop(0, substeps, sub, y)
        return (y, step_base + substeps), y

    interval_fn = jax.checkpoint(interval) if checkpoint else interval
    (_, _), ys_tail = jax.lax.scan(
        interval_fn, (y0, jnp.asarray(0)), (ts[:-1], ts[1:])
    )
    return jax.tree_util.tree_map(
        lambda y0_leaf, tail: jnp.concatenate([y0_leaf[None], tail], axis=0),
        y0,
        ys_tail,
    )
