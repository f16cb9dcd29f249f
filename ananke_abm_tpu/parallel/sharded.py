"""Sharded GAT-ODE training/rollout over the (agents x zones) mesh.

Global-semantics code + sharding annotations; GSPMD inserts the
collectives. Layout (BASELINE.json configs 4-5):
- agent arrays (person feats, home ids, targets, agent states): leading
  dim sharded over ``agents``;
- zone embeddings: sharded over ``zones`` (the model axis);
- the (N, Z) attention-score and logit matrices: sharded over both —
  each device holds its (N/dp, Z/mp) tile; softmax/CE reductions over Z
  become psums on the zone axis, inserted by the compiler from the
  with_sharding_constraint annotations;
- parameters: replicated; gradient reduction is the automatic psum over
  the agent axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ananke_abm_tpu.parallel.mesh import AGENT_AXIS, ZONE_AXIS


def _constraint(mesh, x, *axes):
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*axes))
    )


def make_sharded_train_step(model, optimizer, config, mesh, static,
                            zone_ring: bool = False):
    """Returns a jitted step(params, opt_state, pf, hz, targets) whose agent
    inputs shard over the agent axis and whose (N, Z) intermediates tile
    over the full mesh.

    ``static`` is (zone_feats, adj, times) or the 4-element sparse form
    (zone_feats, adj_or_None, times, edge_index) — the edge-list zone
    encoder composes with the agent-sharded step (graph replicated,
    batch rows sharded), so large sparse zone worlds train data-parallel
    too. The graph rides as an explicit jit argument, never a closure
    capture (CLAUDE.md no-closure rule — at sparse scale captured edge
    lists become program constants and blow up the remote compile).

    ``zone_ring=True`` replaces the GSPMD-annotated zone encoder with
    the hand-written ring halo exchange (``parallel/halo.py``): the
    zone-graph attention's key blocks rotate around the zone mesh axis
    via ``lax.ppermute`` with online-softmax accumulation, O(Z/mp)
    peak zone-table memory per device — the pod-scale zone-parallel
    training path (BASELINE config 5). Dense adjacency only; gradients
    flow through the ``shard_map`` (ppermute transposes to the inverse
    ring), and the step is numerically the ``zone_ring=False`` step
    (tested on the 8-device mesh).
    """
    from ananke_abm_tpu.models.gnn_embed.train import _unpack_static

    graph = _unpack_static(static)
    ring_enc = None
    if zone_ring:
        from ananke_abm_tpu.parallel.halo import ring_encoder_shard_map

        if graph[1] is None:
            raise ValueError(
                "zone_ring=True needs the dense adjacency (the ring "
                "streams (Z, Z) mask columns); got adj=None"
            )
        # the ring contract (divisibility, col_block, specs) is wired
        # once in halo.py — this step and the standalone encoder share it
        ring_enc = ring_encoder_shard_map(
            mesh, static[0].shape[0],
            heads=config.gat_heads, num_layers=config.gat_layers,
            axis_name=ZONE_AXIS,
        )

    def loss_fn(params, pf, hz, targets, graph):
        zone_feats, adj, times, edge_index, edge_chunks = graph
        if ring_enc is not None:
            zone_emb = ring_enc(params["zone_gat"], zone_feats, adj)
        else:
            zone_emb = model.apply(
                {"params": params}, zone_feats, adj, edge_index,
                edge_chunks, method=model.encode_zones,
            )
        zone_emb = _constraint(mesh, zone_emb, ZONE_AXIS)

        x0, h = model.apply(
            {"params": params}, pf, hz, zone_emb,
            method=model.initial_state,
        )
        x0 = _constraint(mesh, x0, AGENT_AXIS)

        if config.method == "dopri5":
            # the adaptive while_loop is not reverse-differentiable under
            # jax.value_and_grad: route through the discrete adjoint with
            # params/h/zone_emb threaded as solver args (never
            # closure-captured into the custom_vjp — CLAUDE.md)
            from ananke_abm_tpu.ode import odeint_discrete_adjoint

            def rhs_a(t, x, args):
                p_, h_, ze_ = args
                x = _constraint(mesh, x, AGENT_AXIS)
                return model.apply(
                    {"params": p_}, t, x, h_, ze_, method=model.rhs
                )

            xs = odeint_discrete_adjoint(
                rhs_a, x0, times, (params, h, zone_emb),
                rtol=config.rtol, atol=config.atol,
            )
        else:
            from ananke_abm_tpu.ode import odeint

            def rhs(t, x, args):
                x = _constraint(mesh, x, AGENT_AXIS)
                return model.apply(
                    {"params": params}, t, x, h, zone_emb, method=model.rhs
                )

            xs = odeint(
                rhs, x0, times, method=config.method,
                substeps=config.substeps,
                rtol=config.rtol, atol=config.atol, adjoint=False,
            )
        xs = jnp.swapaxes(xs, 0, 1)  # (N, T, Da)
        logits = model.apply(
            {"params": params}, xs, zone_emb, method=model.decode
        )
        logits = _constraint(mesh, logits, AGENT_AXIS, None, ZONE_AXIS)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        acc = jnp.mean(jnp.argmax(logits, -1) == targets)
        return jnp.mean(nll), acc

    rep = NamedSharding(mesh, P())
    agent_sh = NamedSharding(mesh, P(AGENT_AXIS))

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, agent_sh, agent_sh, agent_sh, rep),
        out_shardings=(rep, rep, rep, rep),
    )
    def train_step_g(params, opt_state, pf, hz, targets, graph):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pf, hz, targets, graph
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def train_step(params, opt_state, pf, hz, targets):
        return train_step_g(params, opt_state, pf, hz, targets, graph)

    return train_step


def make_sharded_fused_train_step(model, optimizer, config, mesh, static):
    """The fused Pallas train path (ops/pallas/fused_train.py) under
    ``shard_map`` over the agent mesh axis.

    GSPMD cannot partition a ``pallas_call`` on its own, so — like the
    serving rollout in fused_step.py — the whole step body runs
    per-device on its local agent shard: params/zone tables replicated,
    batch rows sharded, hand-written-VJP gradients ``psum``'d over the
    agent axis, optimizer update computed replicated. Loss/acc are
    global-batch means (local sums / global count, then psum), so the
    step is numerically the single-device fused step.
    """
    from ananke_abm_tpu.models.gnn_embed.train import build_fused_loss_fn

    zone_feats, adj, times = static

    def body(params, opt_state, pf, hz, targets):
        # local sums normalized by the GLOBAL row count; psum'd below
        global_rows = (
            pf.shape[0] * mesh.shape[AGENT_AXIS] * times.shape[0]
        )
        loss_fn = build_fused_loss_fn(
            model, config, zone_feats, adj, times,
            global_rows=global_rows,
        )
        (loss_l, acc_l), grads_l = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, pf, hz, targets)
        grads = jax.lax.psum(grads_l, AGENT_AXIS)
        loss = jax.lax.psum(loss_l, AGENT_AXIS)
        acc = jax.lax.psum(acc_l, AGENT_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(AGENT_AXIS), P(AGENT_AXIS), P(AGENT_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    ag = NamedSharding(mesh, P(AGENT_AXIS))
    return jax.jit(
        sharded,
        in_shardings=(rep, rep, ag, ag, ag),
        out_shardings=(rep, rep, rep, rep),
    )


def make_sharded_rollout(model, config, mesh, static):
    """Forward-only integrate-then-decode, agent-sharded (inference path).

    Accepts the 3- or 4-element (sparse edge-list) ``static`` like
    ``make_sharded_train_step``; the graph rides as a replicated jit
    argument."""
    from ananke_abm_tpu.models.gnn_embed.train import _unpack_static

    graph = _unpack_static(static)
    rep = NamedSharding(mesh, P())
    agent_sh = NamedSharding(mesh, P(AGENT_AXIS))

    @functools.partial(
        jax.jit,
        in_shardings=(rep, agent_sh, agent_sh, rep),
        out_shardings=agent_sh,
    )
    def rollout_g(params, pf, hz, graph):
        zone_feats, adj, times, edge_index, edge_chunks = graph
        logits, _ = model.apply(
            {"params": params}, zone_feats, adj, pf, hz, times,
            ode_method=config.method, substeps=config.substeps,
            rtol=config.rtol, atol=config.atol,
            edge_index=edge_index, edge_chunks=edge_chunks,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def rollout(params, pf, hz):
        return rollout_g(params, pf, hz, graph)

    return rollout
