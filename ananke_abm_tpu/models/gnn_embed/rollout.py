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


def _pallas_eligible(config, expected_n=None, num_zones=None) -> bool:
    """The fused bf16 step kernel wins (measured, ops/pallas/fused_step.py)
    when contraction dims reach the 128-lane MXU tile, OR at large agent
    counts where the XLA path becomes HBM-bound: at 1M agents the kernel's
    grid-pipelined (auto double-buffered) tiles run 2.4x faster than XLA
    (974k vs 412k agents/s on v5e) with 99.98% decode agreement.

    Zone-count cap: the kernel holds the (tile, Z) attention scores in
    VMEM per tile — measured working through Z=2048 (41.3% MFU at the
    round-5 serving ladder) and REJECTED by the Mosaic compiler at
    Z=8192 (VMEM overflow); above the cap the XLA rollout (graph
    threaded as jit args) serves."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if not on_tpu:
        return False
    if getattr(config, "num_blocks", 1) < 1:
        return False  # serving kernels assume >= 1 residual drift block
    if num_zones is not None and num_zones > 2048:
        return False
    aligned = (
        config.agent_dim % 128 == 0
        and config.zone_dim % 128 == 0
        and config.hidden_dim % 128 == 0
    )
    large_n = expected_n is not None and expected_n >= 131072
    return aligned or large_n


def make_decoded_rollout(model, config, zone_feats, adj, times,
                         use_pallas: str | bool = "auto",
                         expected_n: int | None = None,
                         mesh=None, edge_index=None, edge_chunks=None):
    """Returns jitted ``rollout(params, person_feats, home_zone_ids) ->
    (N, T) int32 zone ids`` with decode fused into the integration scan.

    ``use_pallas``: "auto" selects the fused bf16 RK4-step Pallas kernel
    when the model dims are MXU-aligned on a TPU (where it measures ~35%
    faster than the XLA path); True forces it; False forces XLA.

    ``mesh``: an (agents, zones) `jax.sharding.Mesh`; agent arrays shard
    over the ``agents`` axis (Pallas path via shard_map, XLA path via
    GSPMD in/out shardings), params replicated.

    ``edge_index``: serve with the sparse edge-list zone encoder (adj
    may then be None — the dense (Z, Z) matrix is never needed). Forces
    the XLA rollout body: the fused serving kernels embed the dense
    zone-encode.
    """
    if edge_index is not None:
        use_pallas = False
    if use_pallas == "auto":
        use_pallas = _pallas_eligible(
            config, expected_n, num_zones=zone_feats.shape[0]
        )
    if use_pallas:
        from ananke_abm_tpu.ops.pallas.fused_step import make_pallas_rollout

        # fuse_decode: substeps + decode/argmax of each interval in one
        # kernel — measured +11% at 1M agents over per-step kernels with
        # exact id agreement (and +24% combined with the max-free softmax)
        return make_pallas_rollout(
            model, zone_feats, adj, times,
            substeps=config.substeps, mesh=mesh, fuse_decode=True,
        )

    substeps = config.substeps
    # graph arrays ride as a jit ARGUMENT: closure-captured device arrays
    # are baked into the program as constants, and the sparse edge-list
    # path exists precisely for Z ~ 1e5-1e6 where that blows up the
    # remote compile (CLAUDE.md no-closure rule). Same arrays each call
    # -> jit cache hit, no retrace.
    graph = (zone_feats, adj, edge_index, times, edge_chunks)

    def rollout_body(params, person_feats, home_zone_ids, graph):
        zone_feats, adj, edge_index, times, edge_chunks = graph
        zone_emb = model.apply(
            {"params": params}, zone_feats, adj, edge_index, edge_chunks,
            method=model.encode_zones,
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

    if mesh is None:
        jitted = jax.jit(rollout_body)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

        rep = NamedSharding(mesh, P())
        ag = NamedSharding(mesh, P(AGENT_AXIS))
        jitted = jax.jit(
            rollout_body, in_shardings=(rep, ag, ag, rep), out_shardings=ag
        )

    def rollout(params, person_feats, home_zone_ids):
        return jitted(params, person_feats, home_zone_ids, graph)

    return rollout
