"""GAT-ODE training on synthetic agent populations.

One jitted train step: encode zones -> integrate agent dynamics ->
decode -> masked CE vs observed zone grids, AdamW, all device-resident.
Supports single-chip jit and the sharded multi-chip step in
ananke_abm_tpu/parallel/sharded.py.
"""
from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.data_generator.agent_trajectories import (
    ZONES,
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.model import GATODE
from ananke_abm_tpu.utils import ensure_dir, save_checkpoint


@dataclasses.dataclass
class GATODEConfig:
    zone_dim: int = 64
    agent_dim: int = 32
    context_dim: int = 32
    hidden_dim: int = 128
    gat_heads: int = 4
    gat_layers: int = 2
    num_blocks: int = 2
    method: str = "rk4"
    substeps: int = 2
    rtol: float = 1e-5
    atol: float = 1e-5
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    batch_size: int = 4096
    epochs: int = 10
    compute_dtype: str = "float32"  # "bfloat16" feeds the MXU at full rate


def build_model(config: GATODEConfig, num_zone_features: int, person_feat_dim: int):
    return GATODE(
        num_zone_features=num_zone_features,
        person_feat_dim=person_feat_dim,
        zone_dim=config.zone_dim,
        agent_dim=config.agent_dim,
        context_dim=config.context_dim,
        hidden_dim=config.hidden_dim,
        gat_heads=config.gat_heads,
        gat_layers=config.gat_layers,
        num_blocks=config.num_blocks,
        compute_dtype=jnp.bfloat16
        if config.compute_dtype == "bfloat16"
        else jnp.float32,
    )


def init_params(model, config, data, batch_size, key, edge_index=None):
    adj = data.get("adj") if edge_index is None else None
    return model.init(
        {"params": key},
        jnp.asarray(data["zone_features"]),
        jnp.asarray(adj) if adj is not None else None,
        jnp.asarray(data["person_feats"][:batch_size]),
        jnp.asarray(data["home_zone"][:batch_size]),
        jnp.asarray(data["times"]),
        ode_method=config.method,
        substeps=config.substeps,
        edge_index=edge_index,
    )["params"]


def _unpack_static(static):
    """``static`` is (zone_feats, adj, times) or, for sparse edge-list
    zone graphs, (zone_feats, adj_or_None, times, edge_index) — the
    4th element routes the zone encoder through ops.segment (adj may
    then be None; the dense matrix is never required). An optional 5th
    element (``EdgeChunks``) additionally routes the edge attention
    through the large-Z block-pair kernel (ops/pallas/edge_gather.py)."""
    zone_feats, adj, times = static[:3]
    edge_index = static[3] if len(static) > 3 else None
    edge_chunks = static[4] if len(static) > 4 else None
    return zone_feats, adj, times, edge_index, edge_chunks


def _maybe_edge_chunks(edge_index, num_zones):
    """Build the block-pair kernel's chunk layout for a sparse zone
    graph when it pays: TPU backend, Z in the kernel's measured win
    region (>= 8192), and the Cuthill-McKee chunking holds up
    (fill >= 0.3 — low-locality graphs keep the XLA path, which wins
    there; docs/evidence_round5/edge_gather_bench.json). Returns an
    EdgeChunks or None."""
    if jax.default_backend() != "tpu" or num_zones < 8192:
        return None
    import numpy as _np

    from ananke_abm_tpu.ops.pallas.edge_gather import build_edge_chunks

    ch = build_edge_chunks(
        _np.asarray(edge_index[0]), _np.asarray(edge_index[1]),
        num_zones,
    )
    return ch if ch.fill >= 0.3 else None


def _build_loss_fn_g(model, config):
    """Graph-threaded loss body shared by the per-step and whole-epoch
    trainers: ``loss_fn_g(params, pf, hz, targets, graph)`` where graph
    is the `_unpack_static` 5-tuple passed as an explicit jit argument
    (never closure-captured — CLAUDE.md no-closure rule)."""

    def loss_fn_g(params, pf, hz, targets, graph):
        zone_feats, adj, times, edge_index, edge_chunks = graph
        logits, _ = model.apply(
            {"params": params}, zone_feats, adj, pf, hz, times,
            ode_method=config.method, substeps=config.substeps,
            rtol=config.rtol, atol=config.atol,
            edge_index=edge_index, edge_chunks=edge_chunks,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        acc = jnp.mean(jnp.argmax(logits, -1) == targets)
        return jnp.mean(nll), acc

    return loss_fn_g


def make_step_fns(model, optimizer, config, static):
    # The zone graph is threaded through the jitted fns as an explicit
    # argument, NOT closure-captured: captured device arrays are baked
    # into the compiled program as constants, and on the sparse path
    # (edge lists at Z ~ 1e5-1e6) that reproduces the documented
    # remote-compile blowup (CLAUDE.md no-closure rule). Passing the
    # same arrays every call hits the jit cache — no retrace.
    graph = _unpack_static(static)
    loss_fn_g = _build_loss_fn_g(model, config)

    @jax.jit
    def train_step_g(params, opt_state, pf, hz, targets, graph):
        (loss, acc), grads = jax.value_and_grad(loss_fn_g, has_aux=True)(
            params, pf, hz, targets, graph
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    loss_jit = jax.jit(loss_fn_g)

    def train_step(params, opt_state, pf, hz, targets):
        return train_step_g(params, opt_state, pf, hz, targets, graph)

    def loss_fn(params, pf, hz, targets):
        return loss_jit(params, pf, hz, targets, graph)

    return train_step, loss_fn


def make_epoch_fn(optimizer, loss_fn_g, graph=(), accum=1):
    """One jit = one EPOCH: ``lax.scan`` over permuted batch-index rows
    with the full data arrays device-resident.

    A per-batch Python loop pays the dispatch round-trip (~31 ms over
    the remote TPU tunnel) plus a host sync (``float(loss)``) on EVERY
    batch; scanning the whole epoch amortizes both to once per epoch —
    the same fused-epochs design as ``pipeline/train.py``. Update order
    matches the per-step loop exactly (same batches, same ops).

    ``loss_fn_g(params, pf, hz, targets, graph) -> (loss, acc)``;
    ``graph`` threads static device arrays as explicit jit arguments.
    Passing ``()`` is only safe when the loss closes over SMALL tables
    (closure-captured arrays become program constants — CLAUDE.md);
    the caller must bound them, as train()'s fused gate does with its
    Z <= 2048 check.

    Returns ``epoch(params, opt_state, pf, hz, tg, batches)`` with
    ``batches`` an (n_batches, bsz) int array of agent rows; yields
    ``(params, opt_state, losses, accs)`` with per-batch (n_batches,)
    loss/acc arrays.

    ``accum=k`` turns every k consecutive microbatches into ONE
    optimizer update on their mean gradient — the effective batch is
    ``k * bsz`` agents while HBM holds only one microbatch of
    activations at a time, which is how a full 1M-agent population
    trains as a single gradient on one chip (BASELINE config 5's
    training half). ``n_batches`` must be a multiple of ``accum``.
    The returned loss/acc arrays stay per-MICRObatch (n_batches,).
    """

    @jax.jit
    def epoch_g(params, opt_state, pf, hz, tg, batches, graph):
        def micrograd(params, rows):
            (loss, acc), grads = jax.value_and_grad(
                loss_fn_g, has_aux=True
            )(params, pf[rows], hz[rows], tg[rows], graph)
            return loss, acc, grads

        def body(carry, rows):
            params, opt_state = carry
            if accum == 1:
                loss, acc, grads = micrograd(params, rows)
            else:
                # rows: (accum, bsz) — mean the microbatch grads, one
                # update. Inner scan keeps one microbatch of
                # activations live; the grad accumulator is params-
                # sized, so HBM is unchanged from accum=1.
                def inner(g_acc, sub_rows):
                    loss, acc, grads = micrograd(params, sub_rows)
                    g_acc = jax.tree_util.tree_map(
                        jnp.add, g_acc, grads
                    )
                    return g_acc, (loss, acc)

                zeros = jax.tree_util.tree_map(
                    jnp.zeros_like, params
                )
                g_sum, (loss, acc) = jax.lax.scan(inner, zeros, rows)
                grads = jax.tree_util.tree_map(
                    lambda g: g / accum, g_sum
                )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, acc)

        if accum > 1:
            n_b, bsz = batches.shape
            if n_b % accum:
                raise ValueError(
                    f"accum={accum} must divide n_batches={n_b}"
                )
            batches = batches.reshape(n_b // accum, accum, bsz)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), batches
        )
        if accum > 1:
            losses = losses.reshape(-1)
            accs = accs.reshape(-1)
        return params, opt_state, losses, accs

    def epoch(params, opt_state, pf, hz, tg, batches):
        return epoch_g(params, opt_state, pf, hz, tg, batches, graph)

    # expose the jitted inner fn + bound graph for AOT inspection
    # (lower().compile().memory_analysis() — the only HBM accounting
    # the remote backend offers; device.memory_stats() returns None)
    epoch.jitted = epoch_g
    epoch.graph = graph
    return epoch


def build_fused_loss_fn(model, config, zone_feats, adj, times,
                        global_rows=None):
    """Shared loss body of the fused Pallas train path — used by both
    the single-device step (below) and the shard_map'd step
    (parallel/sharded.py::make_sharded_fused_train_step) so the two can
    never diverge.

    Enforces the kernel contract: fixed-step RK4 (``config.method``) and
    attn_temp == 1.0 — the fused kernels hard-code that attention, so
    silently accepting anything else would train a different model than
    configured. Any number of residual drift blocks is supported.

    ``zone_feats``/``adj``/``times`` are closure-captured and therefore
    embedded as constants in the jitted program; callers must keep the
    dense graph small (train() gates this path at Z <= 2048) — at large
    Z the serialized constants blow up the remote compile (CLAUDE.md
    no-closure rule).

    ``global_rows``: if given, loss/acc are local sums divided by this
    global row count (the shard_map caller psums them); otherwise plain
    local means.
    """
    if getattr(config, "method", "rk4") != "rk4":
        raise ValueError(
            f"fused train step implements fixed-step rk4, not "
            f"{config.method!r}; use make_step_fns/make_adjoint_step_fns"
        )
    if getattr(model, "attn_temp", 1.0) != 1.0:
        raise ValueError("fused train step requires attn_temp == 1.0")
    if getattr(config, "num_blocks", 1) < 1:
        raise ValueError(
            "fused train step requires num_blocks >= 1 (the VJP kernel's "
            "reverse sweep assumes at least one residual drift block); "
            "use make_step_fns for a block-free drift"
        )
    from ananke_abm_tpu.ops.pallas.fused_gat import (
        fits_vmem,
        probe_lowering,
        zone_gat_fused,
    )
    from ananke_abm_tpu.ops.pallas.fused_train import (
        decode_ce,
        rk4_day_rollout,
    )

    # the zone encoder is the last XLA small-op chain in the fused step
    # (~2 ms of the config-4 budget fwd+bwd); run it as one kernel pair
    # when it fits VMEM, identical math (tested vs flax, values + grads).
    # probe_lowering compiles the kernels eagerly once per geometry and
    # demotes to the flax encoder if this backend rejects the lowering.
    fuse_gat = fits_vmem(
        zone_feats.shape[0], model.gat_heads, model.gat_layers
    ) and probe_lowering(
        zone_feats.shape[0], zone_feats.shape[1], model.zone_dim,
        model.gat_heads, model.gat_layers,
    )

    def encode(params):
        if fuse_gat:
            return zone_gat_fused(
                zone_feats, adj, params["zone_gat"],
                heads=model.gat_heads, num_layers=model.gat_layers,
            )
        return model.apply(
            {"params": params}, zone_feats, adj, method=model.encode_zones
        )

    def loss_fn(params, pf, hz, targets):
        zone_emb = encode(params)
        x0, h = model.apply(
            {"params": params}, pf, hz, zone_emb,
            method=model.initial_state,
        )
        d = params["drift"]
        n_dense = len([k for k in d if k.startswith("Dense_")])
        blocks = tuple(
            (d[f"Dense_{1 + 2 * i}"]["kernel"],
             d[f"Dense_{1 + 2 * i}"]["bias"],
             d[f"Dense_{2 + 2 * i}"]["kernel"],
             d[f"Dense_{2 + 2 * i}"]["bias"])
            for i in range((n_dense - 2) // 2)
        )
        out_layer = d[f"Dense_{n_dense - 1}"]
        xs = rk4_day_rollout(
            x0, h, zone_emb,
            d["Dense_0"]["kernel"], d["Dense_0"]["bias"],
            params["query_proj"]["kernel"], blocks,
            out_layer["kernel"], out_layer["bias"],
            times, substeps=config.substeps,
        )  # (T, N, Da)
        # fused decode+CE: the (N, T, Z) logits tensor never reaches HBM
        T, N, Da = xs.shape
        rows = jnp.swapaxes(xs, 0, 1).reshape(N * T, Da)
        tgt = targets.reshape(-1).astype(jnp.int32)
        nll, correct = decode_ce(
            rows, tgt, params["decode_proj"]["kernel"], zone_emb
        )
        denom = global_rows if global_rows is not None else nll.shape[0]
        loss = jnp.sum(nll) / denom
        acc = jnp.sum(correct.astype(jnp.float32)) / denom
        return loss, acc

    return loss_fn


def make_fused_train_step(model, optimizer, config, static):
    """Train step whose day integration runs through the fused Pallas
    fwd/VJP kernel pair (ops/pallas/fused_train.py) instead of the
    remat'd XLA scan. Same loss, same gradients to bf16 accuracy
    (cosine > 0.999, tested).

    Contract: fixed-step rk4, attn_temp == 1.0 (the kernels mirror that
    attention); any number of residual drift blocks. The zone encoder,
    initial state, decode head, CE loss, and optimizer stay ordinary
    XLA — their gradients compose with the custom VJP through
    zone_emb / x0 / h.
    """
    zone_feats, adj, times = static
    loss_fn = build_fused_loss_fn(model, config, zone_feats, adj, times)

    @jax.jit
    def train_step(params, opt_state, pf, hz, targets):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pf, hz, targets
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return train_step, jax.jit(loss_fn)


def train(
    outdir: str,
    n_agents: int = 8192,
    num_times: int = 48,
    config: GATODEConfig | None = None,
    seed: int = 0,
    num_zones: int | None = None,
    sparse_zones: bool = False,
    sparse_world: bool = False,
    data_parallel: bool = False,
    ckpt_every: int = 0,
    resume: bool = False,
    accum_steps: int = 1,
):
    """``sparse_zones=True`` trains with the edge-list zone encoder:
    the zone graph rides a COO edge list and the dense (Z, Z) matrix
    never reaches the device — the path for zone graphs too large or
    too sparse for dense attention. Uses the general XLA/remat step
    (the fused Pallas train kernel's zone encoder is dense-only).

    ``sparse_world=True`` (implies sparse_zones) goes further: the
    generator itself builds the graph as an edge list
    (``sparse_zone_world``'s grid-bucketed kNN) so no O(Z^2) array
    exists at ANY stage — generation, init, or training.

    ``data_parallel=True`` shards each batch over ALL visible devices
    (agent-axis mesh, ``parallel/sharded.py``; params replicated,
    gradient psum inserted by GSPMD) — composes with the sparse paths.
    Falls back to the single-device step when only one device is
    visible. Batches are trimmed to a multiple of the device count.

    ``ckpt_every=k`` writes ``gatode_last.ckpt`` (params + opt_state +
    epoch) every k epochs; ``resume=True`` continues a run from it —
    the epoch permutations are seeded per epoch, so a resumed run
    reproduces the uninterrupted one exactly. Checkpoint fetches over
    the remote tunnel dominate training wall clock (CLAUDE.md), so the
    default keeps everything on device until the final save.

    ``accum_steps=k`` accumulates gradients over k consecutive
    microbatches per optimizer update (effective batch ``k *
    batch_size`` with unchanged HBM — see ``make_epoch_fn``); it must
    divide the epoch's batch count and is single-device-only (the
    data-parallel step already scales its batch across chips)."""
    sparse_zones = sparse_zones or sparse_world
    config = config or GATODEConfig()
    ensure_dir(outdir)
    data = generate_agent_population(
        n_agents, num_times=num_times, seed=seed, num_zones=num_zones,
        sparse_world=sparse_world,
    )

    model = build_model(
        config, data["zone_features"].shape[-1], data["person_feats"].shape[-1]
    )
    key = jax.random.PRNGKey(seed)
    bsz = min(config.batch_size, n_agents)
    edge_index = None
    if sparse_zones:
        if "edge_index" in data:
            ei = data["edge_index"]
        else:
            from ananke_abm_tpu.ops.segment import edges_from_adj

            ei = edges_from_adj(data["adj"])
        edge_index = (jnp.asarray(ei[0]), jnp.asarray(ei[1]))
    params = init_params(model, config, data, bsz, key,
                         edge_index=edge_index)
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )
    opt_state = optimizer.init(params)

    static = (
        jnp.asarray(data["zone_features"]),
        None if sparse_zones else jnp.asarray(data["adj"]),
        jnp.asarray(data["times"]),
    )
    if sparse_zones:
        static = static + (edge_index,)
        static = static + (_maybe_edge_chunks(
            edge_index, int(data["zone_features"].shape[0])),)
    n_dev = jax.device_count()
    data_parallel = data_parallel and n_dev > 1
    # fused Pallas fwd+VJP loss where its contract holds (TPU backend,
    # fixed-step rk4, dense zone encoder, Z small enough that the dense
    # graph build_fused_loss_fn embeds as program constants stays tiny —
    # see its docstring); XLA+remat loss otherwise — the gate must
    # mirror the configured integrator, never replace it.
    # Single-device paths run one jitted lax.scan per EPOCH
    # (make_epoch_fn — per-batch dispatch and host syncs amortized);
    # the data-parallel path keeps the per-batch GSPMD/shard_map step
    # (the epoch scan's row gathers would turn into per-step cross-chip
    # collectives under agent sharding).
    fused_ok = (
        config.method == "rk4"
        and jax.default_backend() == "tpu"
        and not sparse_zones
        and static[0].shape[0] <= 2048
    )
    train_step = epoch_fn = None
    if accum_steps > 1 and data_parallel:
        raise ValueError(
            "accum_steps > 1 is a single-device feature; the "
            "data-parallel step scales its effective batch across "
            "chips instead"
        )
    if data_parallel:
        from ananke_abm_tpu.parallel.mesh import make_mesh
        from ananke_abm_tpu.parallel.sharded import (
            make_sharded_fused_train_step,
            make_sharded_train_step,
        )

        mesh = make_mesh(n_dev, zone_parallel=1)
        if fused_ok:
            train_step = make_sharded_fused_train_step(
                model, optimizer, config, mesh, static
            )
        else:
            train_step = make_sharded_train_step(
                model, optimizer, config, mesh, static
            )
        if bsz < n_dev:
            raise ValueError(
                f"data_parallel over {n_dev} devices needs a batch of at "
                f"least {n_dev} agents; got batch_size={bsz}"
            )
        bsz -= bsz % n_dev  # the agent mesh axis must divide the batch
    elif fused_ok:
        fused_loss = build_fused_loss_fn(
            model, config, static[0], static[1], static[2]
        )
        epoch_fn = make_epoch_fn(
            optimizer,
            lambda p, pf, hz, tg, _g: fused_loss(p, pf, hz, tg),
            graph=(),
            accum=accum_steps,
        )
    elif config.method == "dopri5":
        # the adaptive solver's while_loop is not reverse-differentiable:
        # training MUST route through an adjoint (params threaded as
        # solver args, never closure-captured — CLAUDE.md). Discrete
        # mode = backprop through the accepted-step sequence, the
        # config-3 measured path.
        epoch_fn = make_epoch_fn(
            optimizer,
            build_adjoint_loss_fn_g(
                model, config, static, adjoint_mode="discrete"
            ),
            graph=_unpack_static(static),
            accum=accum_steps,
        )
    else:
        epoch_fn = make_epoch_fn(
            optimizer, _build_loss_fn_g(model, config),
            graph=_unpack_static(static),
            accum=accum_steps,
        )

    pf = jnp.asarray(data["person_feats"])
    hz = jnp.asarray(data["home_zone"])
    tg = jnp.asarray(data["zone_ids"])
    n_batches = max(1, n_agents // bsz)
    if accum_steps > 1 and n_batches % accum_steps:
        raise ValueError(
            f"accum_steps={accum_steps} must divide the epoch's batch "
            f"count ({n_batches} batches of {bsz} agents)"
        )

    last_ckpt = os.path.join(outdir, "gatode_last.ckpt")
    start_epoch = 1
    hist = []
    if resume:
        from ananke_abm_tpu.utils import load_checkpoint

        if not os.path.exists(last_ckpt):
            raise FileNotFoundError(
                f"resume=True but no {last_ckpt}; run with ckpt_every "
                "to produce one"
            )
        ck = load_checkpoint(last_ckpt)
        # everything but the epoch target must match, or the continued
        # run silently diverges from the uninterrupted one (different
        # batching/optimizer) or crashes on shape mismatch (different
        # world). `epochs` is the one legitimate delta: resume exists
        # precisely to extend a run.
        want = {
            "world_seed": seed, "n_agents": n_agents,
            "num_times": num_times,
            "num_zones": int(data["zone_features"].shape[0]),
            "sparse_world": bool(sparse_world),
        }
        got = {k: ck.get(k) for k in want}
        cfg_now = {k: v for k, v in dataclasses.asdict(config).items()
                   if k != "epochs"}
        cfg_ck = {k: v for k, v in (ck.get("config") or {}).items()
                  if k != "epochs"}
        if got != want or cfg_ck != cfg_now:
            diffs = [f"{k}: ckpt {got[k]!r} vs {want[k]!r}"
                     for k in want if got[k] != want[k]]
            diffs += [f"config.{k}: ckpt {cfg_ck.get(k)!r} vs {v!r}"
                      for k, v in cfg_now.items() if cfg_ck.get(k) != v]
            raise ValueError(
                "resume checkpoint was written for a different run: "
                + "; ".join(diffs)
            )
        params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
            ck["opt_state"],
        )
        hist = list(ck["history"])
        start_epoch = int(ck["epoch"]) + 1

    t0 = time.time()
    for epoch in range(start_epoch, config.epochs + 1):
        perm = np.random.default_rng(seed + epoch).permutation(n_agents)
        if epoch_fn is not None:
            batches = jnp.asarray(
                perm[: n_batches * bsz].reshape(n_batches, bsz)
            )
            params, opt_state, losses, accs = epoch_fn(
                params, opt_state, pf, hz, tg, batches
            )
        else:
            ls, as_ = [], []
            for b in range(n_batches):
                rows = jnp.asarray(perm[b * bsz : (b + 1) * bsz])
                params, opt_state, loss, acc = train_step(
                    params, opt_state, pf[rows], hz[rows], tg[rows]
                )
                ls.append(loss)  # device scalars; one host sync below
                as_.append(acc)
            losses, accs = jnp.stack(ls), jnp.stack(as_)
        hist.append(
            {"epoch": epoch, "loss": float(jnp.mean(losses)),
             "acc": float(jnp.mean(accs))}
        )
        if ckpt_every and epoch % ckpt_every == 0:
            save_checkpoint(
                {
                    "params": params,
                    "opt_state": opt_state,
                    "epoch": epoch,
                    "history": hist,
                    "config": dataclasses.asdict(config),
                    "world_seed": seed,
                    "n_agents": n_agents,
                    "num_times": num_times,
                    "num_zones": int(data["zone_features"].shape[0]),
                    "sparse_world": bool(sparse_world),
                },
                last_ckpt,
            )
    elapsed = time.time() - t0

    ckpt = os.path.join(outdir, "gatode_best.ckpt")
    save_checkpoint(
        {
            "params": params,
            "config": dataclasses.asdict(config),
            "num_zones": int(data["zone_features"].shape[0]),
            "num_times": num_times,
            "history": hist,
            # world reconstruction keys for serve(): the zone world is
            # regenerated deterministically from these
            "world_seed": seed,
            "sparse_world": bool(sparse_world),
        },
        ckpt,
    )
    return {
        "final_loss": hist[-1]["loss"],
        "final_acc": hist[-1]["acc"],
        "seconds": elapsed,
        "ckpt": ckpt,
    }


def serve(
    ckpt_path: str,
    out_npz: str,
    n_agents: int = 4096,
    num_times: int | None = None,
    seed: int = 1,
    use_pallas: str | bool = "auto",
    world_seed: int | None = None,
):
    """Serve a trained GAT-ODE checkpoint: regenerate its zone world
    (deterministic from the ckpt's world keys), draw a FRESH agent
    population of ``n_agents`` (``seed`` governs the agents only), run
    the fused integrate-then-decode rollout, and write
    ``out_npz{zone_ids (N, T) int32, times (T,)}``.

    Sparse-world checkpoints serve through the edge-list encoder
    (no (Z, Z) array); dense checkpoints use the Pallas serving kernels
    where eligible (``use_pallas`` as in ``make_decoded_rollout``).

    ``world_seed`` overrides the checkpoint's stored world seed.
    Checkpoints written before the world keys existed don't record one;
    serving them requires passing it explicitly — silently guessing
    would rebuild a DIFFERENT zone world than the model was trained on
    and decode meaningless ids.
    """
    from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout
    from ananke_abm_tpu.utils import load_checkpoint

    ck = load_checkpoint(ckpt_path)
    config = GATODEConfig(**ck["config"])
    sparse = bool(ck.get("sparse_world", False))
    if world_seed is None:
        if "world_seed" in ck:
            world_seed = int(ck["world_seed"])
        elif not sparse and int(ck["num_zones"]) == len(ZONES):
            # the default mock world is fixed — seed-independent
            # (agent_trajectories routes num_zones in (None, 8) to the
            # hand-built 8-zone city), so pre-world-key checkpoints
            # trained on it serve correctly with any value here
            world_seed = 0
        else:
            raise ValueError(
                f"checkpoint {ckpt_path} predates the world-reconstruction "
                "keys (no 'world_seed') and its zone world is seeded; pass "
                "world_seed= (the seed the model was trained with) to "
                "serve it"
            )
    data = generate_agent_population(
        n_agents,
        num_times=int(num_times or ck["num_times"]),
        seed=seed,
        num_zones=int(ck["num_zones"]),
        sparse_world=sparse,
        world_seed=int(world_seed),
    )
    model = build_model(
        config, data["zone_features"].shape[-1],
        data["person_feats"].shape[-1],
    )
    edge_index = None
    edge_chunks = None
    adj = None
    if sparse:
        ei = data["edge_index"]
        edge_index = (jnp.asarray(ei[0]), jnp.asarray(ei[1]))
        edge_chunks = _maybe_edge_chunks(
            edge_index, int(data["zone_features"].shape[0])
        )
    else:
        adj = jnp.asarray(data["adj"])
    rollout = make_decoded_rollout(
        model, config, jnp.asarray(data["zone_features"]), adj,
        jnp.asarray(data["times"]), use_pallas=use_pallas,
        expected_n=n_agents, edge_index=edge_index,
        edge_chunks=edge_chunks,
    )
    t0 = time.time()
    ids = np.asarray(rollout(
        ck["params"], jnp.asarray(data["person_feats"]),
        jnp.asarray(data["home_zone"]),
    ))
    elapsed = time.time() - t0
    ensure_dir(os.path.dirname(os.path.abspath(out_npz)))
    np.savez(out_npz, zone_ids=ids, times=data["times"])
    return {
        "n_agents": n_agents,
        "num_times": ids.shape[1],
        "seconds": elapsed,
        "out": out_npz,
    }


def build_adjoint_loss_fn_g(model, config, static,
                            use_fused="auto", adjoint_mode="continuous",
                            max_accepted=512, ckpt_every=16,
                            bwd_precision=None, store_f="auto",
                            ckpt_dtype="auto"):
    """Graph-threaded ``loss_fn_g(params, pf, hz, targets, graph)`` whose
    integration uses adaptive DOPRI5 with adjoint gradients — the loss
    core shared by :func:`make_adjoint_step_fns` (per-step trainer) and
    :func:`train`'s ``method="dopri5"`` epoch path (make_epoch_fn).
    ``static`` is used only for the ``use_fused="auto"`` geometry check;
    the graph itself arrives as the loss's final argument. See
    :func:`make_adjoint_step_fns` for the knob semantics."""
    from ananke_abm_tpu.ode import odeint_adjoint, odeint_discrete_adjoint

    if adjoint_mode not in ("continuous", "discrete"):
        raise ValueError(f"unknown adjoint_mode {adjoint_mode!r}")
    explicit_ckpt_dtype = None if ckpt_dtype == "auto" else ckpt_dtype
    ckpt_dtype = None
    if store_f == "auto":
        if ckpt_every == 1 and bwd_precision == "bf16":
            # both buffers bf16: together they cost what the f32 state
            # buffer alone did (the f32 pair OOMs one chip at config-3
            # scale: +6.4 GB over the ~9 GB already live)
            store_f = ckpt_dtype = "bf16"
        else:
            store_f = False
    if explicit_ckpt_dtype is not None:
        # explicit override (e.g. ckpt_every=2 with a bf16 state buffer
        # — halves checkpoint memory where the store_f auto-coupling
        # doesn't engage); validation happens in dopri5_solve
        ckpt_dtype = explicit_ckpt_dtype

    # graph threaded as a jit argument, not closure-captured — see
    # make_step_fns
    graph = _unpack_static(static)
    if use_fused == "auto":
        use_fused = (
            jax.default_backend() == "tpu"
            and getattr(model, "attn_temp", 1.0) == 1.0
            and getattr(config, "num_blocks", 0) >= 1
            and graph[0].shape[0] <= 2048
        )
    rhs_vjp = None
    step_impl = step_vjp = None
    if use_fused:
        if getattr(model, "attn_temp", 1.0) != 1.0:
            raise ValueError(
                "fused adjoint RHS requires attn_temp == 1.0 (the "
                "kernels hard-code that attention); pass use_fused=False"
            )
        if adjoint_mode == "continuous":
            from ananke_abm_tpu.ops.pallas.fused_rhs import (
                make_fused_adjoint_rhs,
            )

            _, rhs_vjp = make_fused_adjoint_rhs()
        else:
            from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
                make_fused_dopri5_hooks,
            )

            step_impl, step_vjp = make_fused_dopri5_hooks(
                bwd_precision=bwd_precision,
                # in-kernel Hairer error reduction — the controller then
                # skips its full-state norm pass (same rtol/atol as the
                # solve below, threaded from the one config)
                err_stats=(config.rtol, config.atol))

    def rhs(t, x, args):
        params, h, zone_emb = args
        return model.apply(
            {"params": params}, t, x, h, zone_emb, method=model.rhs
        )

    def loss_fn_g(params, pf, hz, targets, graph):
        zone_feats, adj, times, edge_index, edge_chunks = graph
        zone_emb = model.apply(
            {"params": params}, zone_feats, adj, edge_index, edge_chunks,
            method=model.encode_zones,
        )
        x0, h = model.apply(
            {"params": params}, pf, hz, zone_emb, method=model.initial_state
        )
        if adjoint_mode == "discrete":
            xs = odeint_discrete_adjoint(
                rhs, x0, times, (params, h, zone_emb),
                rtol=config.rtol, atol=config.atol,
                max_accepted=max_accepted, ckpt_every=ckpt_every,
                store_f=store_f, ckpt_dtype=ckpt_dtype,
                step_impl=step_impl, step_vjp=step_vjp,
            )
        else:
            xs = odeint_adjoint(
                rhs, x0, times, (params, h, zone_emb),
                rtol=config.rtol, atol=config.atol, rhs_vjp=rhs_vjp,
            )
        xs = jnp.swapaxes(xs, 0, 1)
        logits = model.apply(
            {"params": params}, xs, zone_emb, method=model.decode
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        acc = jnp.mean(jnp.argmax(logits, -1) == targets)
        return jnp.mean(nll), acc

    return loss_fn_g


def make_adjoint_step_fns(model, optimizer, config, static,
                          use_fused="auto", adjoint_mode="continuous",
                          max_accepted=512, ckpt_every=16,
                          bwd_precision=None, store_f="auto",
                          ckpt_dtype="auto"):
    """Training step whose integration uses adaptive DOPRI5 with
    adjoint gradients (BASELINE config 3: "adaptive dopri5 + adjoint
    gradients through the GAT dynamics").

    The flax params are threaded through the solver's differentiable
    ``args`` (NOT closure-captured — see CLAUDE.md), so the custom_vjp
    propagates cotangents into the drift/attention weights; zone embeddings
    and contexts ride along in args and receive gradients the same way.

    ``adjoint_mode``:

    - ``"continuous"`` — torchdiffeq-style continuous adjoint
      (ode/adjoint.py): a second adaptive solve of the augmented system
      per output interval.
    - ``"discrete"`` — backprop through the forward's accepted step
      sequence (ode/discrete_adjoint.py): the exact gradient of the
      computed output at roughly the forward's own step count instead
      of a ~3x augmented re-solve; ``max_accepted``/``ckpt_every`` size
      its recording buffers (a solve exceeding ``max_accepted``
      accepted steps NaN-poisons loudly).

    ``use_fused``: "auto" engages the Pallas kernels on TPU when their
    contract holds (attn_temp == 1.0, num_blocks >= 1, Z small enough
    for the VMEM-replicated zone table); True forces them (interpret
    mode off-TPU); False keeps generic XLA + ``jax.vjp``. What gets
    fused depends on the mode — continuous: the backward's augmented
    RHS (one eval + full VJP per launch,
    ops/pallas/fused_rhs.py::drift_rhs_and_vjp; forward stays XLA —
    the single-eval fused forward kernel measured SLOWER than XLA's
    fusion, 2279 vs 1600 ms at config-3 dims,
    docs/evidence_round4/config3_fused.json). Discrete: whole DOPRI5
    steps — one kernel per attempted forward step and one
    recompute+VJP kernel per accepted backward step
    (ops/pallas/fused_dopri5.py). All kernels share the serving/
    fixed-step stage math; the continuous-mode RHS kernel keeps the
    bf16 matmul precision class (gradient cosine vs the XLA path
    0.9999997 at 98k agents) while the discrete-mode step kernels run
    f32 activations — bf16 stage rounding noise-floors the embedded
    5(4) error estimate and blows up the controller's step count
    (see ops/pallas/fused_dopri5.py). ``bwd_precision`` (discrete mode
    only; None = follow the forward's f32) sets the BACKWARD step-VJP
    kernel's class independently: "bf16" buys 1-pass MXU matmuls in
    the weight-gradient dots at the fixed-step trainer's tested ~4e-3
    relative gradient-noise budget, without touching the f32
    controller or its accepted-step sequence.

    ``store_f`` (discrete mode): record the pre-step FSAL eval at every
    checkpoint so the backward skips its per-segment ``rhs``
    re-evaluation. End-to-end effect is modest — 1611.7 -> 1587.5
    ms/step at config-3 scale (XLA overlaps most of the re-eval;
    docs/evidence_round4/config3_storef.json) — but free at the
    bf16 noise class. "auto" enables it when ``ckpt_every == 1`` AND
    ``bwd_precision == "bf16"`` — there the eval is per-step, and
    storing BOTH buffers bf16 (states + FSAL evals, the bf16 backward's
    existing linearization noise class) costs exactly what the f32
    state buffer alone did; the f32 pair OOMs one chip at config-3
    scale. True/"bf16"/False force it.

    ``ckpt_dtype`` ("auto" | None | "bf16"): the state-checkpoint
    buffer's dtype. "auto" follows the store_f coupling above (bf16
    exactly when store_f auto-engages); an explicit "bf16" narrows the
    buffer at any ``ckpt_every`` — the lever that halves checkpoint
    memory for large chunks at ckpt_every >= 2 (the backward then
    linearizes each segment start at a bf16-rounded state, the same
    noise class as ``bwd_precision="bf16"``).
    """
    loss_fn_g = build_adjoint_loss_fn_g(
        model, config, static, use_fused=use_fused,
        adjoint_mode=adjoint_mode, max_accepted=max_accepted,
        ckpt_every=ckpt_every, bwd_precision=bwd_precision,
        store_f=store_f, ckpt_dtype=ckpt_dtype,
    )
    # graph threaded as a jit argument, not closure-captured — see
    # make_step_fns
    graph = _unpack_static(static)

    @jax.jit
    def train_step_g(params, opt_state, pf, hz, targets, graph):
        (loss, acc), grads = jax.value_and_grad(loss_fn_g, has_aux=True)(
            params, pf, hz, targets, graph
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    loss_jit = jax.jit(loss_fn_g)

    def train_step(params, opt_state, pf, hz, targets):
        return train_step_g(params, opt_state, pf, hz, targets, graph)

    def loss_fn(params, pf, hz, targets):
        return loss_jit(params, pf, hz, targets, graph)

    return train_step, loss_fn
