"""Fused integrate-and-decode rollout for population-scale inference.

``GATODE.__call__`` materializes the full (N, T, Z) logits tensor — ~3 GB
at 262k agents x 48 bins x 64 zones, which thrashes HBM well before the
1M-agent target. This rollout fuses the decode + argmax into the
integration scan: the carry is just the (N, Da) state and each step emits
only the (N,) zone ids, so device memory is O(N * Da + N * T) regardless
of Z. This is the serving path for BASELINE configs 2/5.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ode.rk4 import _rk4_step


def make_decoded_rollout(model, config, zone_feats, adj, times):
    """Returns jitted ``rollout(params, person_feats, home_zone_ids) ->
    (N, T) int32 zone ids`` with decode fused into the integration scan."""
    substeps = config.substeps

    @jax.jit
    def rollout(params, person_feats, home_zone_ids):
        zone_emb = model.apply(
            {"params": params}, zone_feats, adj, method=model.encode_zones
        )
        x0, h = model.apply(
            {"params": params}, person_feats, home_zone_ids, zone_emb,
            method=model.initial_state,
        )

        def rhs(t, x):
            return model.apply(
                {"params": params}, t, x, h, zone_emb, method=model.rhs
            )

        def decode_ids(x):
            logits = model.apply(
                {"params": params}, x, zone_emb, method=model.decode
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def interval(x, t0t1):
            t0, t1 = t0t1
            dt = (t1 - t0) / substeps

            def sub(i, x):
                return _rk4_step(
                    lambda t, y, args: rhs(t, y), t0 + i * dt, dt, x, None
                )

            x = jax.lax.fori_loop(0, substeps, sub, x)
            return x, decode_ids(x)

        y0_ids = decode_ids(x0)
        _, ids_tail = jax.lax.scan(interval, x0, (times[:-1], times[1:]))
        ids = jnp.concatenate([y0_ids[None], ids_tail], axis=0)  # (T, N)
        return jnp.swapaxes(ids, 0, 1)

    return rollout
