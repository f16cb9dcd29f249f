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
import numpy as np

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
    dt: float | None = None,
    num_steps: int | None = None,
    checkpoint: bool = True,
):
    """Integrate ``dy = f(t,y) dt + g(t,y) dW`` (diagonal noise, Itô).

    Args:
        drift: ``(t, y, args) -> f`` pytree.
        diffusion: ``(t, y, args) -> g`` pytree (diagonal noise,
            elementwise std-dev per state coordinate).
        y0: initial state pytree at ``ts[0]``.
        ts: (T,) strictly increasing output times.
        key: PRNG key; substep noise derives from ``fold_in`` on a step
            counter.
        substeps: Euler–Maruyama substeps PER OUTPUT INTERVAL (static).
            NOTE: this makes the discretization (and the noise path)
            depend on the output grid — two calls with different ``ts``
            integrate different paths. Fine for a fixed training grid;
            WRONG whenever train and inference use different grids (the
            trajectory decoded on a dense grid diverges from the one
            trained on event times). Use the fixed-grid mode below for
            grid-independent semantics.
        dt: fixed INTERNAL step size (the reference's
            ``torchsde.sdeint(..., dt=0.01)`` semantics). When given,
            the solver integrates the uniform grid ``ts[0] + i*dt`` for
            ``i in [0, num_steps]`` — independent of the output grid —
            and returns the state at the internal point nearest each
            requested time (<= dt/2 snap). ``substeps`` is ignored.
        num_steps: static internal step count for the ``dt`` mode; must
            satisfy ``num_steps * dt >= ts[-1] - ts[0]`` (steps past
            ``ts[-1]`` are zero-dt no-ops, so oversizing is safe).
        checkpoint: rematerialize intervals in the backward pass.

    Returns:
        pytree with leaves ``(T,) + leaf.shape`` — states at ``ts``.
    """
    ts = jnp.asarray(ts)
    if dt is not None:
        if num_steps is None:
            raise ValueError("fixed-grid mode needs a static num_steps")
        return _euler_maruyama_fixed_grid(
            drift, diffusion, y0, ts, key, args,
            dt=float(dt), num_steps=int(num_steps), checkpoint=checkpoint,
        )

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


def _euler_maruyama_fixed_grid(
    drift, diffusion, y0, ts, key, args, *, dt, num_steps, checkpoint
):
    """Fixed internal grid Euler–Maruyama (see ``euler_maruyama_solve``'s
    ``dt`` mode): one scan over ``num_steps + 1`` internal steps anchored
    at ``ts[0]``; requested outputs are scattered into a (T+1)-row buffer
    (row T is the discard slot) as the sweep passes their snapped grid
    index, then gathered back in requested order (duplicate snaps copy
    the first hit). Noise is keyed by the INTERNAL step counter, so the
    realized path is identical for any output grid over the same span.
    """
    T = ts.shape[0]
    t_start = ts[0]
    t_end = ts[-1]
    # enforce the documented num_steps * dt >= span contract: clamping
    # an out-of-span time to index num_steps would silently return the
    # end-of-grid state for every later time. Concrete ts -> eager
    # error; traced ts -> NaN-poison the out-of-span rows (the same
    # convention dopri5 uses for unfilled rows). Concreteness is probed
    # with np.asarray, NOT isinstance(ts, Tracer): a closure-captured
    # grid inside jit is a concrete Array whose jnp ops are still staged
    # (op-level constant lifting), so float(ts[-1] - ts[0]) would raise.
    try:
        ts_host = np.asarray(ts)
    except jax.errors.TracerArrayConversionError:
        ts_host = None
    if ts_host is not None:
        span = float(ts_host[-1] - ts_host[0])
        if num_steps * dt < span - 1e-9:
            raise ValueError(
                f"fixed-grid SDE: num_steps * dt = {num_steps * dt:g} "
                f"does not cover ts span {span:g}; raise num_steps (or "
                f"the caller's sde_span_hours)"
            )
    # snapped internal index per requested time, ascending (ts sorted)
    raw_idx = jnp.round((ts - t_start) / dt).astype(jnp.int32)
    out_of_span = raw_idx > num_steps
    idx = jnp.clip(raw_idx, 0, num_steps)

    leaves0, treedef = jax.tree_util.tree_flatten(y0)
    out0 = [
        jnp.zeros((T + 1,) + l.shape, l.dtype) for l in leaves0
    ]

    def step(carry, i):
        y, out = carry
        # write y (the state at internal time i) into its output slot
        pos = jnp.searchsorted(idx, i)
        pos = jnp.where(
            (pos < T) & (idx[jnp.minimum(pos, T - 1)] == i), pos, T
        )
        yl = jax.tree_util.tree_leaves(y)
        out = [o.at[pos].set(l) for o, l in zip(out, yl)]
        # advance: zero-dt no-op past ts[-1]; partial last step lands on it
        t = t_start + i * dt
        dt_i = jnp.clip(t_end - t, 0.0, dt)
        sqrt_dt = jnp.sqrt(dt_i)
        k = jax.random.fold_in(key, i)
        f = drift(t, y, args)
        g = diffusion(t, y, args)
        subkeys = jax.random.split(k, len(yl))
        noise = [
            jax.random.normal(sk, l.shape, l.dtype)
            for sk, l in zip(subkeys, yl)
        ]
        gl = jax.tree_util.tree_leaves(g)
        fl = jax.tree_util.tree_leaves(f)
        y_new = [
            l + dt_i * fi + gi * wi * sqrt_dt
            for l, fi, gi, wi in zip(yl, fl, gl, noise)
        ]
        y = jax.tree_util.tree_unflatten(treedef, y_new)
        return (y, out), None

    step_fn = jax.checkpoint(step) if checkpoint else step
    (y, out), _ = jax.lax.scan(
        step_fn, (y0, out0), jnp.arange(num_steps + 1)
    )
    # duplicate snapped indices: copy each row from the first row with
    # the same internal index (the only one the scatter populated)
    first = jnp.searchsorted(idx, idx)
    outs = []
    for o in out:
        rows = o[first]
        if jnp.issubdtype(rows.dtype, jnp.floating):
            mask = out_of_span.reshape((T,) + (1,) * (rows.ndim - 1))
            rows = jnp.where(mask, jnp.nan, rows)
        outs.append(rows)
    return jax.tree_util.tree_unflatten(treedef, outs)
