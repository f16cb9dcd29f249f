"""Semi-Markov CRF (segment-level linear-chain CRF with bounded durations).

The traj_syn family's ``crf_mode="semi"`` (reference behavior pinned by its
callers: src/ananke_abm/cli/run_models/gen_n_val_traj.py:20-36 with
``semi_Dmax_minutes`` ~ 300; the module itself is missing from the
reference snapshot — SURVEY.md §2.8).

Model: a day is a sequence of segments (purpose p, duration d <= D bins);
segment score = sum of frame unaries + a learned duration score
``dur[p, d-1]``; adjacent segments cannot repeat a purpose; transitions
carry ``A[p_prev, p_next]`` scores.

Recursions are lax.scans over time with a ring buffer of the last D
alpha rows — O(T * D * P^2) batched tensor work, fixed shapes throughout
(the inner max/logsumexp over durations is a dense (D, B, P, P) reduce).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _segment_scores_from_cumsum(U_cumsum, t, d_arange, D):
    """Scores of segments ending at time t (inclusive) with durations
    1..D: sum_{s=t-d+1..t} U[s, p].

    U_cumsum: (B, T+1, P) with U_cumsum[:, k] = sum of U[:, :k].
    Returns (D, B, P); rows with d > t+1 are NEG_INF-masked by caller.
    """
    end = U_cumsum[:, t + 1]  # (B, P)
    starts = jnp.clip(t + 1 - (d_arange + 1), 0, None)  # (D,)
    start_vals = U_cumsum[:, starts]  # (B, D, P) via fancy index on axis 1
    return jnp.swapaxes(end[:, None, :] - start_vals, 0, 1)  # (D, B, P)


def _prep(unaries_btp, dur_scores_pd, A_pp, allow_self=False):
    B, T, P = unaries_btp.shape
    D = dur_scores_pd.shape[1]
    U_cumsum = jnp.concatenate(
        [
            jnp.zeros((B, 1, P), unaries_btp.dtype),
            jnp.cumsum(unaries_btp, axis=1),
        ],
        axis=1,
    )
    if allow_self:
        A_eff = A_pp
    else:
        A_eff = jnp.where(jnp.eye(P, dtype=bool), NEG_INF, A_pp)
    return B, T, P, D, U_cumsum, A_eff


def semicrf_log_partition(unaries_btp, dur_scores_pd, A_pp, allow_self=False):
    """log Z over all valid segmentations. Returns (B,).

    ``allow_self``: permit same-purpose adjacent segments (scored by the
    diagonal of A). Required by the exact-likelihood mode, where dense
    label runs longer than Dmax are covered by chains of self-transiting
    capped segments."""
    B, T, P, D, U_cumsum, A_ns = _prep(
        unaries_btp, dur_scores_pd, A_pp, allow_self
    )
    d_ar = jnp.arange(D)

    def step(carry, t):
        alpha_ring = carry  # (D, B, P): alpha at t-1, t-2, ..., t-D
        seg = _segment_scores_from_cumsum(U_cumsum, t, d_ar, D)  # (D, B, P)
        seg = seg + jnp.swapaxes(dur_scores_pd[:, :D], 0, 1)[:, None, :]

        # predecessor mass: for duration d (index i=d-1), segment starts at
        # s = t-d+1; if s == 0 it's the first segment (no predecessor);
        # else combine alpha at s-1 = t-d -> ring index i.
        prev = jax.nn.logsumexp(
            alpha_ring[:, :, :, None] + A_ns[None, None, :, :], axis=2
        )  # (D, B, P)
        starts = t - d_ar  # s = t-d+1 - ... wait: duration d=i+1, s=t-i
        is_first = (t - d_ar) == 0  # segment covers [0..t] when d = t+1
        valid = (t - d_ar) >= 0
        combined = jnp.where(is_first[:, None, None], 0.0, prev)
        scores = jnp.where(
            valid[:, None, None], seg + combined, NEG_INF
        )  # (D, B, P)
        alpha_t = jax.nn.logsumexp(scores, axis=0)  # (B, P)

        alpha_ring = jnp.concatenate(
            [alpha_t[None], alpha_ring[:-1]], axis=0
        )
        return alpha_ring, None

    ring0 = jnp.full((D, B, P), NEG_INF, unaries_btp.dtype)
    ring, _ = jax.lax.scan(step, ring0, jnp.arange(T))
    return jax.nn.logsumexp(ring[0], axis=-1)  # alpha at T-1


def semicrf_path_score(unaries_btp, labels_bt, dur_scores_pd, A_pp):
    """Score of the segmentation induced by a dense label grid (run-length
    segments; durations clipped into the learned table's range)."""
    B, T, P = unaries_btp.shape
    D = dur_scores_pd.shape[1]

    unary = jnp.take_along_axis(unaries_btp, labels_bt[..., None], -1)[..., 0]
    unary_score = unary.sum(axis=1)

    is_start = jnp.concatenate(
        [
            jnp.ones((B, 1), bool),
            labels_bt[:, 1:] != labels_bt[:, :-1],
        ],
        axis=1,
    )
    # transition score at every non-first segment start
    prev_label = jnp.concatenate([labels_bt[:, :1], labels_bt[:, :-1]], axis=1)
    trans = A_pp[prev_label, labels_bt] * is_start
    trans = trans.at[:, 0].set(0.0)
    trans_score = trans.sum(axis=1)

    # duration score per segment: each frame maps to its segment's start
    # position (running max of start positions), then frames scatter-add
    # onto that start to get per-segment lengths
    pos = jnp.arange(T)[None, :]
    seg_id = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1), axis=1
    )
    ones = jnp.ones_like(labels_bt)
    # length of each segment: scatter-add frames onto their start position
    lengths = jnp.zeros((B, T), unaries_btp.dtype)
    lengths = jax.vmap(
        lambda l, sid, o: l.at[sid].add(o.astype(l.dtype))
    )(lengths, seg_id, ones)
    d_idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, D - 1)
    dur = jnp.where(
        is_start,
        jnp.take_along_axis(
            dur_scores_pd[labels_bt], d_idx[..., None], -1
        )[..., 0],
        0.0,
    )
    dur_score = dur.sum(axis=1)

    return unary_score + trans_score + dur_score


def semicrf_gold_log_marginal(unaries_btp, labels_bt, dur_scores_pd, A_pp):
    """log-sum of scores of ALL segmentations whose dense projection equals
    the gold label grid (self-transitions allowed). Returns (B,).

    This is the exact numerator of the capped-duration likelihood: a gold
    run longer than Dmax is covered by chains of <=Dmax segments joined by
    self-transitions, so its probability is finite and exact — unlike the
    clip-scored bound (semicrf_path_score with clipped durations).
    Normalize against ``semicrf_log_partition(..., allow_self=True)``.

    Constrained forward: alpha[t] sums segmentations of labels[:, :t+1]
    ending a segment at t; a segment [s..t] is admissible iff the gold
    labels are constant on it (s >= run_start[t]) and its duration <= D.
    O(T * D) per row, a lax.scan with a (D, B) ring of alpha history.
    """
    B, T, P = unaries_btp.shape
    D = dur_scores_pd.shape[1]

    gy = jnp.take_along_axis(unaries_btp, labels_bt[..., None], -1)[..., 0]
    G = jnp.concatenate(
        [jnp.zeros((B, 1), unaries_btp.dtype), jnp.cumsum(gy, axis=1)], axis=1
    )  # (B, T+1) cumulative gold-label unaries

    pos = jnp.arange(T)[None, :]
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), labels_bt[:, 1:] != labels_bt[:, :-1]], axis=1
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1), axis=1
    )  # (B, T)

    dur_y = dur_scores_pd[labels_bt]  # (B, T, D)
    d_ar = jnp.arange(D)  # duration d = d_ar + 1

    def step(ring, t):
        # ring[i] = alpha at time t-1-i; segment duration d ends at t,
        # starts at s = t-d+1, predecessor alpha is ring[d-1] = ring[d_ar]
        s = t - d_ar  # (D,) segment start per duration
        s_safe = jnp.clip(s, 0, None)
        valid = (s >= 0)[:, None] & (
            s[:, None] >= run_start[:, t][None, :]
        )  # (D, B)
        seg_u = (G[:, t + 1][:, None] - G[:, s_safe]).T  # (D, B)
        dscore = dur_y[:, t, :].T  # (D, B)
        y_t = labels_bt[:, t]  # (B,)
        y_prev = labels_bt[:, jnp.clip(s - 1, 0, None)]  # (B, D)
        trans = A_pp[y_prev, y_t[:, None]].T  # (D, B)
        is_first = (s == 0)[:, None]
        cand = seg_u + dscore + jnp.where(is_first, 0.0, ring + trans)
        cand = jnp.where(valid, cand, NEG_INF)
        alpha_t = jax.nn.logsumexp(cand, axis=0)  # (B,)
        ring = jnp.concatenate([alpha_t[None], ring[:-1]], axis=0)
        return ring, None

    ring0 = jnp.full((D, B), NEG_INF, unaries_btp.dtype)
    ring, _ = jax.lax.scan(step, ring0, jnp.arange(T))
    return ring[0]


def semicrf_nll(unaries_btp, labels_bt, dur_scores_pd, A_pp, mask_b=None,
                exact_long=False):
    """Mean NLL of the gold label grids.

    ``exact_long=True``: the exact likelihood of the dense gold grid under
    the Dmax-capped model with self-transitions — logZ(allow_self) minus
    the marginal over all consistent segmentations
    (:func:`semicrf_gold_log_marginal`). Use when gold runs can exceed
    Dmax (e.g. overnight Home at semi_Dmax_minutes=300).

    ``exact_long=False``: the no-self-transition model with the gold run
    segmentation clip-scored into the duration table — a bound, not a
    likelihood, when a gold run exceeds Dmax.

    ``mask_b``: optional (B,) row weights — padded tail-batch rows get 0
    so wrapped duplicates don't double-count in the gradient."""
    if exact_long:
        logZ = semicrf_log_partition(
            unaries_btp, dur_scores_pd, A_pp, allow_self=True
        )
        gold = semicrf_gold_log_marginal(
            unaries_btp, labels_bt, dur_scores_pd, A_pp
        )
    else:
        logZ = semicrf_log_partition(unaries_btp, dur_scores_pd, A_pp)
        gold = semicrf_path_score(unaries_btp, labels_bt, dur_scores_pd, A_pp)
    per_row = logZ - gold
    if mask_b is None:
        return jnp.mean(per_row)
    return jnp.sum(per_row * mask_b) / jnp.maximum(jnp.sum(mask_b), 1.0)


def semicrf_decode(unaries_btp, dur_scores_pd, A_pp, allow_self=False):
    """Max-scoring segmentation -> dense (B, T) labels.

    Viterbi over (t, d, p) with backpointers; backtrace is a bounded
    while_loop painting segments right-to-left. With ``allow_self`` (the
    exact-likelihood mode's decode), adjacent same-purpose segments are
    admissible and merge in the dense output, so runs can exceed Dmax.
    """
    B, T, P, D, U_cumsum, A_ns = _prep(
        unaries_btp, dur_scores_pd, A_pp, allow_self
    )
    d_ar = jnp.arange(D)

    def step(carry, t):
        v_ring = carry  # (D, B, P)
        seg = _segment_scores_from_cumsum(U_cumsum, t, d_ar, D)
        seg = seg + jnp.swapaxes(dur_scores_pd[:, :D], 0, 1)[:, None, :]

        prev_scores = v_ring[:, :, :, None] + A_ns[None, None, :, :]
        prev_best = jnp.max(prev_scores, axis=2)  # (D, B, P)
        prev_arg = jnp.argmax(prev_scores, axis=2)

        is_first = (t - d_ar) == 0
        valid = (t - d_ar) >= 0
        combined = jnp.where(is_first[:, None, None], 0.0, prev_best)
        scores = jnp.where(valid[:, None, None], seg + combined, NEG_INF)

        v_t = jnp.max(scores, axis=0)  # (B, P)
        best_d = jnp.argmax(scores, axis=0)  # (B, P) duration index
        # previous purpose for the chosen duration (only meaningful if the
        # segment is not first)
        bp_prev = jnp.take_along_axis(
            prev_arg, best_d[None, :, :], axis=0
        )[0]  # (B, P)

        v_ring = jnp.concatenate([v_t[None], v_ring[:-1]], axis=0)
        return v_ring, (best_d, bp_prev, v_t)

    ring0 = jnp.full((D, B, P), NEG_INF, unaries_btp.dtype)
    _, (best_d_t, bp_prev_t, v_all) = jax.lax.scan(
        step, ring0, jnp.arange(T)
    )  # each (T, B, P)
    v_last = v_all[-1]

    labels = jnp.zeros((B, T), jnp.int32)
    bidx = jnp.arange(B)
    pos = jnp.arange(T)[None, :]

    def cond(state):
        t, _, _ = state
        return jnp.any(t >= 0)

    def body(state):
        t, p, labels = state
        active = t >= 0
        t_safe = jnp.maximum(t, 0)
        d_idx = best_d_t[t_safe, bidx, p]  # (B,) duration index
        start = t_safe - d_idx  # segment covers [start, t]
        in_seg = active[:, None] & (pos >= start[:, None]) & (pos <= t_safe[:, None])
        labels = jnp.where(in_seg, p[:, None], labels)
        prev_p = bp_prev_t[t_safe, bidx, p]
        t_new = jnp.where(active, start - 1, t)
        p_new = jnp.where(active & (t_new >= 0), prev_p, p)
        return t_new, p_new, labels

    t0 = jnp.full((B,), T - 1)
    p0 = jnp.argmax(v_last, axis=-1)
    _, _, labels = jax.lax.while_loop(cond, body, (t0, p0, labels))
    return labels
