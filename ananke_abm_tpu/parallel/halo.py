"""Ring halo exchange for the zone-sharded GAT encoder (BASELINE config 5).

At pod scale the (Z, Z) zone-graph attention shards its rows over the
``zones`` mesh axis; each shard's queries must still attend over ALL
zones. Instead of all_gathering the full key/value table, the key blocks
(Wh, e_dst) rotate around the ring via ``lax.ppermute`` — one neighbor
hop per step, flash-attention-style online-softmax accumulation, O(Z/mp)
peak memory per device. This is the hand-written halo-exchange pattern
the GSPMD paths don't produce on their own; everything else in
parallel/ relies on compiler-inserted collectives.

``encode_zones_ring`` reproduces ``GATODE.encode_zones`` (the flax
ZoneGAT, models/gnn_embed/gat.py) numerically from the same param pytree;
tests assert equality against the dense single-device encoder on the
virtual mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ananke_abm_tpu.parallel.mesh import ZONE_AXIS

NEG = -1e30  # same mask value as gat.py


def ring_gat_attention(Wh, e_src, e_dst, adj_rows, axis_name, n_shards,
                       col_block):
    """One GAT attention layer with key blocks streamed around the ring.

    Wh: (Zl, H, d) local zone projections (queries AND this shard's key
    block); e_src/e_dst: (Zl, H) attention logits halves; adj_rows:
    (Zl, Z_global) this shard's adjacency rows. Returns (Zl, H, d), equal
    to softmax-normalized masked attention over all Z_global zones.
    """
    Zl, H, d = Wh.shape
    me = jax.lax.axis_index(axis_name)
    m = jnp.full((Zl, H), -jnp.inf, Wh.dtype)
    l = jnp.zeros((Zl, H), Wh.dtype)
    acc = jnp.zeros((Zl, H, d), Wh.dtype)
    blk_wh, blk_ed = Wh, e_dst
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    for r in range(n_shards):
        # after r hops, this device is visiting the block of shard me - r
        owner = (me - r) % n_shards
        a = jax.lax.dynamic_slice(
            adj_rows, (0, owner * col_block), (Zl, col_block)
        )
        scores = jax.nn.leaky_relu(
            e_src[:, None, :] + blk_ed[None, :, :], negative_slope=0.2
        )  # (Zl, Zb, H)
        scores = jnp.where(a[:, :, None] > 0, scores, NEG)
        m_new = jnp.maximum(m, scores.max(axis=1))
        corr = jnp.exp(m - m_new)  # exp(-inf - finite) == 0 on first step
        p = jnp.exp(scores - m_new[:, None, :])
        l = l * corr + p.sum(axis=1)
        acc = acc * corr[..., None] + jnp.einsum("ibh,bhd->ihd", p, blk_wh)
        m = m_new
        if r < n_shards - 1:
            blk_wh = jax.lax.ppermute(blk_wh, axis_name, perm)
            blk_ed = jax.lax.ppermute(blk_ed, axis_name, perm)
    return acc / l[..., None]


def _layer_norm(h, scale, bias, eps=1e-6):
    mu = h.mean(axis=-1, keepdims=True)
    var = ((h - mu) ** 2).mean(axis=-1, keepdims=True)
    return (h - mu) / jnp.sqrt(var + eps) * scale + bias


def _zone_gat_local(gat_params, zone_feats_local, adj_rows_local, *,
                    axis_name, n_shards, col_block, heads, num_layers):
    """Per-shard ZoneGAT forward (functional mirror of gat.py::ZoneGAT,
    same param pytree), with the attention step ring-exchanged."""
    dense0 = gat_params["Dense_0"]
    h = zone_feats_local @ dense0["kernel"] + dense0["bias"]
    for li in range(num_layers):
        lp = gat_params[f"GATLayer_{li}"]
        Wh = h @ lp["Dense_0"]["kernel"]  # use_bias=False
        Zl, F = Wh.shape
        d = F // heads
        Wh = Wh.reshape(Zl, heads, d)
        e_src = jnp.einsum("zhd,hd->zh", Wh, lp["a_src"])
        e_dst = jnp.einsum("zhd,hd->zh", Wh, lp["a_dst"])
        out = ring_gat_attention(
            Wh, e_src, e_dst, adj_rows_local, axis_name, n_shards, col_block
        )
        h = h + jax.nn.elu(out.reshape(Zl, F))
        ln = gat_params[f"LayerNorm_{li}"]
        h = _layer_norm(h, ln["scale"], ln["bias"])
    return h


def ring_encoder_shard_map(mesh, Z, *, heads, num_layers,
                           axis_name: str = ZONE_AXIS):
    """The shard_map'd ring zone encoder
    ``(gat_params, zone_feats, adj) -> zone_emb`` (all zone-sharded over
    ``axis_name``, params replicated) — the ONE place the ring contract
    (divisibility check, col_block derivation, in/out specs) is wired;
    used by :func:`encode_zones_ring` standalone and composed inside
    ``parallel/sharded.py::make_sharded_train_step(zone_ring=True)``."""
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if Z % n_shards:
        raise ValueError(f"Z={Z} not divisible by {axis_name}={n_shards}")
    col_block = Z // n_shards

    local = functools.partial(
        _zone_gat_local,
        axis_name=axis_name, n_shards=n_shards, col_block=col_block,
        heads=heads, num_layers=num_layers,
    )
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )


def encode_zones_ring(params, zone_feats, adj, mesh, *, heads, num_layers,
                      axis_name: str = ZONE_AXIS):
    """Zone-sharded GATODE.encode_zones with ring halo exchange.

    ``params``: the GATODE param tree (uses ``params["zone_gat"]``).
    Returns (Z, Dz) zone embeddings sharded over ``axis_name``.
    """
    sharded = ring_encoder_shard_map(
        mesh, zone_feats.shape[0], heads=heads, num_layers=num_layers,
        axis_name=axis_name,
    )
    rep = NamedSharding(mesh, P())
    zsh = NamedSharding(mesh, P(axis_name))
    fn = jax.jit(sharded, in_shardings=(rep, zsh, zsh), out_shardings=zsh)
    return fn(params["zone_gat"], zone_feats, adj)
