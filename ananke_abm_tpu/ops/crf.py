"""Linear-chain CRF recursions as time-axis scans.

TPU-native replacement for the reference's Python-loop recursions
(src/ananke_abm/models/gen_schedule/models/crf/linear_chain.py:23-81 and the
per-sample constrained DP at crf/model.py:47-109). Everything here is a
``lax.scan`` over T with batched (B, P, P) tensor ops — O(T) sequential, all
P^2 work on the VPU/MXU, no host loops, fully vmap/jit/shard-compatible.

The constrained "no-all-home" decode augments the state space to P x {0,1}
(visited-a-non-home-state flag) and runs the same batched Viterbi scan —
replacing the reference's per-sample Python DP with one fixed-shape program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def crf_log_partition(unaries_btp, A_pp):
    """log Z via the forward algorithm.

    Args:
        unaries_btp: (B, T, P) per-time per-state scores.
        A_pp: (P, P) transition scores, A[prev, next].

    Returns:
        (B,) log-partition.
    """
    u_tbp = jnp.swapaxes(unaries_btp, 0, 1)  # (T, B, P) scan over T

    def step(alpha, u_t):
        # alpha: (B, P); scores[b, p_prev, p_next] = alpha + A
        scores = alpha[:, :, None] + A_pp[None, :, :]
        alpha = jax.nn.logsumexp(scores, axis=1) + u_t
        return alpha, None

    alpha0 = u_tbp[0]
    alpha, _ = jax.lax.scan(step, alpha0, u_tbp[1:])
    return jax.nn.logsumexp(alpha, axis=-1)


def crf_path_score(unaries_btp, labels_bt, A_pp):
    """Score of a label path: sum_t U[t, y_t] + sum_{t>0} A[y_{t-1}, y_t]."""
    unary = jnp.take_along_axis(unaries_btp, labels_bt[..., None], axis=-1)
    unary = unary[..., 0].sum(axis=-1)  # (B,)
    pair = A_pp[labels_bt[:, :-1], labels_bt[:, 1:]].sum(axis=-1)
    return unary + pair


def crf_nll(unaries_btp, labels_bt, A_pp, mask_b=None):
    """Mean negative log-likelihood over the batch (reference crf_nll_batch).

    ``mask_b``: optional (B,) row weights — padded tail-batch rows get 0
    so wrapped duplicates don't double-count in the gradient."""
    logZ = crf_log_partition(unaries_btp, A_pp)
    gold = crf_path_score(unaries_btp, labels_bt, A_pp)
    per_row = logZ - gold
    if mask_b is None:
        return jnp.mean(per_row)
    return jnp.sum(per_row * mask_b) / jnp.maximum(jnp.sum(mask_b), 1.0)


def crf_marginals(unaries_btp, A_pp):
    """Posterior state marginals p(y_t = p | U) via forward-backward.

    Returns (B, T, P) probabilities. Not in the reference API; used by the
    traj_syn family for marginal-matched training.
    """
    u_tbp = jnp.swapaxes(unaries_btp, 0, 1)
    T = u_tbp.shape[0]

    def fwd(alpha, u_t):
        scores = alpha[:, :, None] + A_pp[None, :, :]
        alpha = jax.nn.logsumexp(scores, axis=1) + u_t
        return alpha, alpha

    alpha0 = u_tbp[0]
    _, alphas_tail = jax.lax.scan(fwd, alpha0, u_tbp[1:])
    alphas = jnp.concatenate([alpha0[None], alphas_tail], axis=0)  # (T,B,P)

    def bwd(beta, u_t):
        # beta_{t-1}[p] = logsumexp_q( A[p,q] + U[t,q] + beta_t[q] )
        scores = A_pp[None, :, :] + (u_t + beta)[:, None, :]
        new_beta = jax.nn.logsumexp(scores, axis=2)
        return new_beta, new_beta

    beta_last = jnp.zeros_like(alpha0)
    # reverse scan over inputs U_1..U_{T-1}: output at position t-1 is beta_{t-1}
    _, betas_head = jax.lax.scan(bwd, beta_last, u_tbp[1:], reverse=True)
    betas = jnp.concatenate([betas_head, beta_last[None]], axis=0)

    log_marg = alphas + betas
    log_marg = log_marg - jax.nn.logsumexp(log_marg, axis=-1, keepdims=True)
    return jnp.swapaxes(jnp.exp(log_marg), 0, 1)


def viterbi_decode(unaries_btp, A_pp):
    """Batched max-product decode.

    Returns (B, T) int32 best paths under
    ``sum_t U[t, y_t] + sum_t A[y_{t-1}, y_t]``.
    """
    u_tbp = jnp.swapaxes(unaries_btp, 0, 1)

    def fwd(dp, u_t):
        scores = dp[:, :, None] + A_pp[None, :, :]  # (B, P_prev, P_next)
        best_prev = jnp.argmax(scores, axis=1)  # (B, P)
        dp = jnp.max(scores, axis=1) + u_t
        return dp, best_prev

    dp0 = u_tbp[0]
    dp, backptrs = jax.lax.scan(fwd, dp0, u_tbp[1:])  # backptrs: (T-1, B, P)

    last = jnp.argmax(dp, axis=-1)  # (B,)

    def bwd(state, bp_t):
        nxt = state  # (B,)
        prev = jnp.take_along_axis(bp_t, nxt[:, None], axis=1)[:, 0]
        return prev, nxt

    first, tail = jax.lax.scan(bwd, last, backptrs, reverse=True)
    paths = jnp.concatenate([first[None], tail], axis=0)  # (T, B)
    return jnp.swapaxes(paths, 0, 1).astype(jnp.int32)


def viterbi_decode_no_all_home(unaries_btp, A_pp, home_idx):
    """Constrained Viterbi: the best path that visits >=1 non-home state.

    Augmented state (p, v) with v = "visited non-home yet". Transitions:
        (q, 0) -> (home, 0)
        (q, 1) -> (home, 1)
        (q, 0) -> (p, 1), (q, 1) -> (p, 1)   for p != home
    Terminate in v=1. One batched scan — replaces the reference's per-sample
    Python DP (crf/model.py:47-109).

    Returns (B, T) int32 paths.
    """
    B, T, P = unaries_btp.shape
    u_tbp = jnp.swapaxes(unaries_btp, 0, 1)
    is_home = jnp.arange(P) == home_idx  # (P,)

    # dp has shape (B, P, 2): best score ending at (p, v).
    dp0 = jnp.full((B, P, 2), NEG_INF, dtype=unaries_btp.dtype)
    # t=0: home -> v=0; non-home -> v=1
    dp0 = dp0.at[:, :, 0].set(jnp.where(is_home, u_tbp[0], NEG_INF))
    dp0 = dp0.at[:, :, 1].set(jnp.where(is_home, NEG_INF, u_tbp[0]))

    def fwd(dp, u_t):
        prev0 = dp[:, :, 0]  # (B, P)
        prev1 = dp[:, :, 1]

        s0 = prev0[:, :, None] + A_pp[None, :, :]  # (B, Pprev, Pnext)
        s1 = prev1[:, :, None] + A_pp[None, :, :]

        best0_val = jnp.max(s0, axis=1)  # (B, P) best arriving from v=0
        best0_arg = jnp.argmax(s0, axis=1)
        best1_val = jnp.max(s1, axis=1)
        best1_arg = jnp.argmax(s1, axis=1)

        # v'=0: only home reachable, only from v=0.
        new0 = jnp.where(is_home[None, :], best0_val + u_t, NEG_INF)
        ptr0_p = best0_arg
        ptr0_v = jnp.zeros_like(best0_arg)

        # v'=1: home only from v=1; non-home from max(v=0, v=1).
        from1 = best1_val
        use0 = (best0_val > best1_val) & (~is_home)[None, :]
        new1_val = jnp.where(use0, best0_val, from1) + u_t
        new1_val = jnp.where(
            is_home[None, :], best1_val + u_t, new1_val
        )
        ptr1_p = jnp.where(use0, best0_arg, best1_arg)
        ptr1_p = jnp.where(is_home[None, :], best1_arg, ptr1_p)
        ptr1_v = jnp.where(use0, 0, 1)
        ptr1_v = jnp.where(is_home[None, :], 1, ptr1_v)

        dp = jnp.stack([new0, new1_val], axis=-1)  # (B, P, 2)
        ptr_p = jnp.stack([ptr0_p, ptr1_p], axis=-1)  # (B, P, 2)
        ptr_v = jnp.stack([ptr0_v, ptr1_v], axis=-1)
        return dp, (ptr_p, ptr_v)

    dp, (ptrs_p, ptrs_v) = jax.lax.scan(fwd, dp0, u_tbp[1:])

    last_p = jnp.argmax(dp[:, :, 1], axis=-1)  # (B,) terminate in v=1
    last_v = jnp.ones_like(last_p)

    def bwd(state, ptr_t):
        p, v = state
        ptr_p_t, ptr_v_t = ptr_t  # (B, P, 2)
        bidx = jnp.arange(p.shape[0])
        prev_p = ptr_p_t[bidx, p, v]
        prev_v = ptr_v_t[bidx, p, v]
        return (prev_p, prev_v), p

    (first_p, _), tail = jax.lax.scan(bwd, (last_p, last_v), (ptrs_p, ptrs_v), reverse=True)
    paths = jnp.concatenate([first_p[None], tail], axis=0)
    return jnp.swapaxes(paths, 0, 1).astype(jnp.int32)
