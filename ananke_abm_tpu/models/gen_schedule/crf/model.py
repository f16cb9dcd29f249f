"""TransitionCRF: full transition matrix + per-state bias, functional form.

Capability parity with the reference TransitionCRF
(src/ananke_abm/models/gen_schedule/models/crf/model.py:5-109). The
recursions come from ``ananke_abm_tpu.ops.crf`` — batched scans instead of
Python loops; the constrained decode is the augmented-state scan instead of
a per-sample DP.

Deviation (documented): the per-state bias participates in the NLL, not
just in decoding. In the reference the bias is a parameter that never
receives gradient (nll ignores it, crf/model.py:17-19), so it stays at its
zero init — training behavior is identical, but here a loaded non-zero
bias would be consistent between training and decoding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ops.crf import (
    crf_nll,
    viterbi_decode,
    viterbi_decode_no_all_home,
)


def init_crf_params(key, num_purposes: int, init_scale: float = 0.01):
    return {
        "A": jax.random.uniform(
            key, (num_purposes, num_purposes), minval=-init_scale, maxval=init_scale
        ),
        "bias": jnp.zeros((num_purposes,)),
    }


def crf_nll_loss(params, unaries_btp, labels_bt):
    u = unaries_btp + params["bias"][None, None, :]
    return crf_nll(u, labels_bt, params["A"])


def crf_decode(params, unaries_btp, home_idx=None, enforce_nonhome=False):
    u = unaries_btp + params["bias"][None, None, :]
    if enforce_nonhome:
        if home_idx is None:
            raise ValueError("home_idx required for enforce_nonhome decoding")
        return viterbi_decode_no_all_home(u, params["A"], home_idx)
    return viterbi_decode(u, params["A"])
