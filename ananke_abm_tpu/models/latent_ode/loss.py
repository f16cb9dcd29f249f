"""Composite masked loss for the GenerativeODE (parity with the reference
calculate_composite_loss, src/ananke_abm/models/latent_ode/architecture/
loss.py:7-100): masked location CE, time-weighted-interpolated embedding
MSE, physical expected distance (distance_matrix[argmax, gt]), purpose/mode
CE + feature MSE, and KL on h0."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_ce(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1
    )[..., 0]
    nll = jnp.where(labels < 0, 0.0, nll)  # ignore_index=-1
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def calculate_composite_loss(batch, outputs, candidate_embeds, config):
    (
        loc_logits, loc_embed, purp_logits, mode_logits,
        purpose_feat, mode_feat, mu, logvar,
    ) = outputs

    t = batch["t_unified"]  # (T,)
    y_loc = batch["y_loc_dense"]  # (B, T)
    mask = batch["loss_mask"]  # (B, T)
    msum = jnp.maximum(jnp.sum(mask), 1.0)
    B = loc_logits.shape[0]

    # 1. location CE
    l_class = _masked_ce(loc_logits, y_loc, mask)

    # 2. time-weighted interpolated embedding target
    prev_i = batch["prev_real_indices"]  # (B, T)
    next_i = batch["next_real_indices"]
    prev_zone = jnp.take_along_axis(y_loc, prev_i, axis=1)
    next_zone = jnp.take_along_axis(y_loc, next_i, axis=1)
    prev_emb = candidate_embeds[jnp.maximum(prev_zone, 0)]
    next_emb = candidate_embeds[jnp.maximum(next_zone, 0)]
    t_prev = t[prev_i]
    t_next = t[next_i]
    w_next = jnp.clip(
        (t[None, :] - t_prev) / (t_next - t_prev + 1e-8), 0.0, 1.0
    )[..., None]
    target_emb = (1 - w_next) * prev_emb + w_next * next_emb
    l_embed = (
        jnp.sum(jnp.mean((loc_embed - target_emb) ** 2, -1) * mask) / msum
    )

    # 3. physical expected distance of the argmax prediction
    pred_ids = jnp.argmax(loc_logits, axis=-1)
    dmat = batch["distance_matrix"]
    phys = dmat[pred_ids, jnp.maximum(y_loc, 0)]
    l_dist = jnp.sum(phys * mask) / msum

    # 4. purpose CE + feature MSE
    l_purp = _masked_ce(purp_logits, batch["y_purp_dense"], mask)
    l_purp_mse = (
        jnp.sum(
            jnp.mean((purpose_feat - batch["y_purp_feat_dense"]) ** 2, -1)
            * mask
        )
        / msum
    )

    # 5. mode CE + feature MSE
    l_mode = _masked_ce(mode_logits, batch["y_mode_dense"], mask)
    l_mode_mse = (
        jnp.sum(
            jnp.mean((mode_feat - batch["y_mode_feat_dense"]) ** 2, -1) * mask
        )
        / msum
    )

    # 6. KL over h0, averaged per batch row
    kl = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar)) / B

    total = (
        config.loss_weight_classification * l_class
        + config.loss_weight_embedding * l_embed
        + config.loss_weight_distance * l_dist
        + config.loss_weight_purpose_class * l_purp
        + config.loss_weight_mode_class * l_mode
        + config.loss_weight_purpose_mse * l_purp_mse
        + config.loss_weight_mode_mse * l_mode_mse
        + config.kl_weight * kl
    )
    comps = {
        "total": total,
        "classification": l_class,
        "embedding": l_embed,
        "distance": l_dist,
        "purpose_class": l_purp,
        "purpose_mse": l_purp_mse,
        "mode_class": l_mode,
        "mode_mse": l_mode_mse,
        "kl": kl,
    }
    return total, comps
