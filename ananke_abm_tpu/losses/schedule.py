"""Schedule-VAE losses.

Same quantities as the reference losses package
(src/ananke_abm/models/gen_schedule/losses/{kl,reg,home_loss,utils_loss_pds}.py),
expressed as pure jnp functions. Where batches may carry padding (the
fixed-shape train loop pads the tail batch), means are computed over a
row-validity mask so padded rows contribute nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    """Mean of x over rows where mask is 1. x: (B, ...), mask: (B,)."""
    w = mask.astype(x.dtype)
    extra = (1,) * (x.ndim - 1)
    num = jnp.sum(x * w.reshape((-1,) + extra))
    den = jnp.maximum(jnp.sum(w), 1.0) * (x.size / x.shape[0])
    return num / den


def kl_gaussian(mu, logvar, mask=None):
    """0.5 * mean(mu^2 + e^logvar - 1 - logvar) (reference kl.py:3)."""
    kl = 0.5 * (mu**2 + jnp.exp(logvar) - 1.0 - logvar)
    if mask is None:
        return jnp.mean(kl)
    return _masked_mean(kl, mask)


def cross_entropy_masked(logits_btp, labels_bt, mask=None):
    """Mean token CE, optionally over valid rows only."""
    logp = jax.nn.log_softmax(logits_btp, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_bt[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    return _masked_mean(nll, mask)


def time_total_variation(logits_btp, mask=None):
    """mean |U_{t+1} - U_t| over the logit trajectory (reference reg.py:3)."""
    diff = jnp.abs(logits_btp[:, 1:, :] - logits_btp[:, :-1, :])
    if mask is None:
        return jnp.mean(diff)
    return _masked_mean(diff, mask)


def start_end_home_loss(logits_btp, home_idx, mask=None):
    """-0.5 * (logP(home | t=0) + logP(home | t=T-1)) (home_loss.py:5)."""
    logp0 = jax.nn.log_softmax(logits_btp[:, 0, :], axis=-1)[:, home_idx]
    logpT = jax.nn.log_softmax(logits_btp[:, -1, :], axis=-1)[:, home_idx]
    per_row = -0.5 * (logp0 + logpT)
    if mask is None:
        return jnp.mean(per_row)
    return _masked_mean(per_row, mask)


def time_of_day_marginal_loss(logits_btp, m_tod_emp_pt, mask=None):
    """MSE between batch-mean softmax marginal (P,T) and the empirical one
    (utils_loss_pds.py:3). With a row mask the batch mean excludes padding."""
    probs = jax.nn.softmax(logits_btp, axis=-1)  # (B, T, P)
    if mask is None:
        batch_mean = probs.mean(axis=0)
    else:
        w = mask.astype(probs.dtype)[:, None, None]
        batch_mean = jnp.sum(probs * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    diff = batch_mean.T - m_tod_emp_pt  # (P, T)
    return jnp.mean(diff * diff)


def presence_rate_loss(logits_btp, presence_emp_p, mask=None):
    """Soft presence 1 - prod_t(1 - p_t) vs empirical rate, MSE
    (utils_loss_pds.py:25). Product as exp-sum-log for stability."""
    probs = jax.nn.softmax(logits_btp, axis=-1)
    log_not = jnp.log1p(-jnp.clip(probs, 0.0, 1.0 - 1e-6))
    present = 1.0 - jnp.exp(jnp.sum(log_not, axis=1))  # (B, P)
    if mask is None:
        batch_presence = present.mean(axis=0)
    else:
        w = mask.astype(present.dtype)[:, None]
        batch_presence = jnp.sum(present * w, axis=0) / jnp.maximum(
            jnp.sum(w), 1.0
        )
    diff = batch_presence - presence_emp_p
    return jnp.mean(diff * diff)


def minutes_share_loss(logits_btp, share_emp_p, mask=None):
    """MSE between the batch's expected minutes share per purpose (softmax
    probabilities averaged over batch and time) and the empirical share.
    Implements the ``lambda_share`` calibration knob that the reference's
    phase2 configs declare but never wire up (phase2.yaml lambda_share)."""
    probs = jax.nn.softmax(logits_btp, axis=-1)  # (B, T, P)
    if mask is None:
        share = probs.mean(axis=(0, 1))
    else:
        w = mask.astype(probs.dtype)[:, None, None]
        share = jnp.sum(probs * w, axis=(0, 1)) / (
            jnp.maximum(jnp.sum(w), 1.0) * probs.shape[1]
        )
    diff = share - share_emp_p
    return jnp.mean(diff * diff)
