"""mode_sep losses — masked jnp ports of the reference semantics
(src/ananke_abm/models/mode_sep/architecture/losses.py:14-156 and the train
loop's aux terms, train/train.py:124-159). Every term is a masked mean so
shapes stay fixed regardless of how many union points carry supervision.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.models.mode_sep.config import ModeSepConfig


def _masked_mean(values, mask):
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def ce_at_mask(logits, y, mask):
    """CE of logits vs labels y over masked positions (y may be -1 outside)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(y, 0)[..., None], axis=-1
    )[..., 0]
    return _masked_mean(nll, mask)


def mse_at_mask(pred_emb, y, class_table, mask):
    target = class_table[jnp.maximum(y, 0)]  # junk rows masked away
    d2 = jnp.sum((pred_emb - target) ** 2, axis=-1)
    return _masked_mean(d2, mask)


def expected_distance_at_mask(logits, y, dist_mat, mask):
    probs = jax.nn.softmax(logits, axis=-1)
    gt_rows = dist_mat[jnp.maximum(y, 0)]  # (B, T, Z)
    exp_d = jnp.sum(gt_rows * probs, axis=-1)
    return _masked_mean(exp_d, mask)


def _dist_to_classes(pred_emb, table, idx):
    target = table[jnp.maximum(idx, 0)]
    return jnp.sqrt(jnp.sum((pred_emb - target) ** 2, axis=-1) + 1e-12)


def travel_margin_loss(pred_emb, table, travel_mask, prev_idx, dest_idx, m):
    d_prev = _dist_to_classes(pred_emb, table, prev_idx)
    d_dest = _dist_to_classes(pred_emb, table, dest_idx)
    hinge = jnp.maximum(m - (d_prev - d_dest), 0.0)
    return _masked_mean(hinge, travel_mask)


def travel_monotonicity_loss(
    pred_emb, table, travel_mask, prev_idx, dest_idx, eps
):
    """Finite-difference: move away from prev and toward dest inside a
    travel segment (same prev/dest on consecutive points)."""
    d_prev = _dist_to_classes(pred_emb, table, prev_idx)
    d_dest = _dist_to_classes(pred_emb, table, dest_idx)

    pair = (
        travel_mask[:, :-1]
        & travel_mask[:, 1:]
        & (prev_idx[:, :-1] == prev_idx[:, 1:])
        & (dest_idx[:, :-1] == dest_idx[:, 1:])
    )
    away = jnp.maximum(d_prev[:, :-1] - d_prev[:, 1:] + eps, 0.0)
    toward = jnp.maximum(d_dest[:, 1:] - d_dest[:, :-1] + eps, 0.0)
    return 0.5 * (_masked_mean(away, pair) + _masked_mean(toward, pair))


def total_loss(
    config: ModeSepConfig,
    logits,
    pred_emb,
    v,
    class_table,
    dist_mat,
    batch,
):
    """Full training objective + component dict. ``batch`` is the jnp-ified
    UnionBatch field dict."""
    y = batch["y_union"]
    is_gt = batch["is_gt"]

    ce = ce_at_mask(logits, y, is_gt)
    mse = mse_at_mask(pred_emb, y, class_table, is_gt)
    dist = expected_distance_at_mask(logits, y, dist_mat, is_gt)
    t_margin = travel_margin_loss(
        pred_emb, class_table, batch["travel_mask"],
        batch["prev_zone"], batch["dest_zone"], config.m_travel,
    )
    t_mono = travel_monotonicity_loss(
        pred_emb, class_table, batch["travel_mask"],
        batch["prev_zone"], batch["dest_zone"], config.epsilon_mono,
    )

    # aux supervision inside stays at non-snap points
    stay_aux_mask = batch["stay_non_gt"]
    y_stay = batch["stay_loc_ids"]
    aux = (
        ce_at_mask(logits, y_stay, stay_aux_mask)
        + mse_at_mask(pred_emb, y_stay, class_table, stay_aux_mask)
        + expected_distance_at_mask(logits, y_stay, dist_mat, stay_aux_mask)
    )

    # velocity regularization
    # eps inside the sqrt: |v| has a 0/0 gradient at v == 0, and the
    # zero-initialized drift starts training EXACTLY there — a bare
    # norm() poisons every drift gradient with NaN on step one.
    v_abs = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-12)  # (B, T)
    stay_vel = _masked_mean(v_abs**2, stay_aux_mask)
    low = jnp.maximum(config.v_min_move - v_abs, 0.0)
    high = jnp.maximum(v_abs - config.v_max_move, 0.0)
    move_vel = _masked_mean(low**2 + high**2, batch["gt_interior"])

    total = (
        config.w_ce * ce
        + config.w_mse * mse
        + config.w_dist * dist
        + config.w_travel_margin * t_margin
        + config.w_travel_mono * t_mono
        + config.w_stay_aux * aux
        + config.w_stay_vel_core * stay_vel
        + config.w_move_vel_hinge * move_vel
    )

    # GT-snap accuracy diagnostic
    pred_idx = jnp.argmax(logits, axis=-1)
    correct = ((pred_idx == y) & is_gt).sum()
    acc = correct / jnp.maximum(is_gt.sum(), 1)

    comps = {
        "loss": total,
        "ce": ce,
        "mse": mse,
        "dist": dist,
        "travel_margin": t_margin,
        "travel_mono": t_mono,
        "stay_aux": config.w_stay_aux * aux,
        "stay_vel": stay_vel,
        "move_vel": move_vel,
        "acc": acc,
    }
    return total, comps
