"""Pytree arithmetic helpers shared by the integrators.

The solvers operate on arbitrary pytrees of arrays so models can keep
structured states; the hot path is a handful of fused element-wise ops that
XLA folds into the surrounding computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_map(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def tree_add(a, b):
    return tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return tree_map(jnp.subtract, a, b)


def tree_scale(s, a):
    return tree_map(lambda x: s * x, a)


def tree_axpy(s, x, y):
    """y + s * x, elementwise over the trees."""
    return tree_map(lambda xi, yi: yi + s * xi, x, y)


def tree_zeros_like(a):
    return tree_map(jnp.zeros_like, a)


def tree_lincomb(coeffs, trees):
    """sum_i coeffs[i] * trees[i] for a list of same-structure pytrees."""
    out = tree_scale(coeffs[0], trees[0])
    for c, t in zip(coeffs[1:], trees[1:]):
        out = tree_axpy(c, t, out)
    return out


def tree_where(pred, a, b):
    return tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_error_norm(err, y0, y1, rtol, atol):
    """Hairer-style scaled RMS error norm over the whole pytree.

    norm = sqrt( mean_i ( err_i / (atol + rtol * max(|y0_i|, |y1_i|)) )^2 )

    One norm for the whole (batched) state — a single step controller for the
    batch, matching torchdiffeq semantics (and keeping one XLA program).
    """
    sq_sums = []
    counts = []
    for e, a, b in zip(
        jax.tree_util.tree_leaves(err),
        jax.tree_util.tree_leaves(y0),
        jax.tree_util.tree_leaves(y1),
    ):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = e / scale
        sq_sums.append(jnp.sum(r * r))
        counts.append(r.size)
    total = sum(sq_sums)
    n = sum(counts)
    return jnp.sqrt(total / n)


def tree_stack_buffer(y0, num_steps):
    """Allocate a (num_steps, ...) output buffer for each leaf of ``y0``."""
    return tree_map(
        lambda x: jnp.zeros((num_steps,) + x.shape, dtype=x.dtype), y0
    )


def tree_buffer_set(buf, idx, val):
    """Write ``val`` into the leading axis of ``buf`` at dynamic index ``idx``."""
    return tree_map(
        lambda b, v: jax.lax.dynamic_update_index_in_dim(b, v, idx, axis=0),
        buf,
        val,
    )
