"""Gather/scatter sparse edge kernel for LARGE zone worlds (Z >= 8192).

The one-hot-matmul edge kernels (``edge_segment.py``) are O(E*Z*D):
their (tile_e, Z) one-hots and full (Z, H*d) VMEM accumulators stop
winning at Z=4096 and VMEM-OOM at Z=32768 — closed as a dead end in
round 4. The XLA segment path that serves this band instead measures
**50-227x off the HBM roofline** at Z=8192-65536
(docs/evidence_round5/edge_roofline.json): its gathers/scatters
sort-and-serialize.

This kernel is the TPU-native design for the band:

- Edges are pre-sorted and chunked by (destination tile, source tile)
  pair (``build_edge_chunks`` — host preprocessing, once per graph,
  like the reference's CSR build): every chunk reads from ONE
  TZ-node source block and scatters into ONE TZ-node destination
  block, both selected by scalar-prefetched chunk tables.
- Gather AND scatter are then SMALL (tile_e, TZ) one-hot matmuls —
  O(E*TZ*W) with TZ a constant 512, never Z. (A true dynamic row
  gather from a VMEM-resident table would be O(E*W); Mosaic rejects
  every lowering form of it — jnp.take / take_along_axis variants all
  fail, recorded in docs/evidence_round5/edge_roofline.json — so the
  two-level one-hot is the TPU-native form.)
- Block-pair chunking relies on graph LOCALITY: geometric kNN worlds
  (this framework's zone graphs — ids follow the generator's spatial
  grid) touch ~2-4 source tiles per destination tile, so padding waste
  is small; a uniform-random graph at large Z shatters into
  near-empty chunks. ``EdgeChunks.fill`` reports the real-edge
  fraction so dispatch can fall back to XLA when chunking degenerates.

Scores: single sweep, no cross-chunk max phase — the softmax shift is
precomputed in XLA. ``score_shift="exact"`` (wrapper default) uses the
true per-dst max from one cheap ``segment_max`` over (E, H);
``"bounded"`` uses the upper bound ``leaky_relu(max_src qs + qd)``
(identical value where no underflow, matching the one-hot kernel's
bounded mode).

Forward kernel + XLA-composition VJP (custom_vjp): gradients flow on
TPU through the same ``jax.vjp`` of the segment composition the
one-hot kernels fall back to off-TPU.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu

TZ = 512       # destination-tile width (output block rows)
# edges per chunk: swept on hardware at the kNN-world band
# (docs/evidence_round5/edge_gather_bench.json tile_e sweep) — 1024
# balances chunk fill (~0.73-0.77 after the CM reorder) against
# per-chunk fixed costs; 2048 halves fill, 512 doubles chunk count
TILE_E = 1024  # edges per chunk


@dataclass(frozen=True)
class EdgeChunks:
    """Host-built chunk layout for :func:`gat_edge_attention_gather`.

    Edges sorted by (dst tile, src tile) and chunked so each chunk
    reads one TZ-wide source block and scatters into one TZ-wide
    destination block. Arrays (jnp, device-resident; thread them as jit
    arguments, never closure captures):

    - ``src_local``: (8*C, tile_e) int32 src id within the chunk's src
      tile (sublane-expanded: each chunk's row repeated 8x — the TPU
      block layout for id rows); padding edges hold TZ (matches no
      one-hot column).
    - ``dst_local``: (8*C, tile_e) int32 dst id within the chunk's dst
      tile; padding edges hold TZ.
    - ``src_tile``/``dst_tile``: (C,) int32 block ids.
    - ``first``: (C,) int32 1 on each dst tile's first chunk (output
      block init flag).
    - ``num_dst``: original destination-node count (un-padded).
    - ``fill``: real-edge fraction across all chunk slots — dispatch
      should fall back to the XLA path when chunking degenerates
      (low-locality graphs).
    """

    src_local: jnp.ndarray
    dst_local: jnp.ndarray
    src_tile: jnp.ndarray
    dst_tile: jnp.ndarray
    first: jnp.ndarray
    num_dst: int
    fill: float = 1.0
    # bandwidth-reducing node relabeling (Cuthill-McKee BFS): ``order``
    # lists ORIGINAL ids in relabeled order (gather tables with it),
    # ``rank`` is its inverse (scatter outputs back). None = identity.
    order: jnp.ndarray | None = None
    rank: jnp.ndarray | None = None

    @property
    def n_chunks(self) -> int:
        return int(self.dst_tile.shape[0])


# registered as a pytree (arrays = children, num_dst/fill = static aux)
# so an EdgeChunks can thread through jit/scan boundaries as an
# explicit argument — the same no-closure discipline as edge_index
jax.tree_util.register_dataclass(
    EdgeChunks,
    data_fields=["src_local", "dst_local", "src_tile", "dst_tile",
                 "first", "order", "rank"],
    meta_fields=["num_dst", "fill"],
)


def _cuthill_mckee(src, dst, n):
    """Bandwidth-reducing BFS ordering over the undirected edge set
    (numpy CSR + queue sweep). Neighbors visit in degree order; every
    component is seeded from its minimum-degree node. Returns ``order``
    (original ids in new order)."""
    i = np.concatenate([src, dst])
    j = np.concatenate([dst, src])
    deg = np.bincount(i, minlength=n)
    csr_order = np.argsort(i, kind="stable")
    nbr = j[csr_order]
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])

    visited = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    pos = 0
    seeds = np.argsort(deg, kind="stable")
    head = 0
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        pos += 1
        head = pos - 1
        while head < pos:
            u = order[head]
            head += 1
            cand = nbr[indptr[u]:indptr[u + 1]]
            cand = cand[~visited[cand]]
            if cand.size:
                cand = np.unique(cand)  # dedupe, ascending (≈ degree-lite)
                visited[cand] = True
                order[pos:pos + cand.size] = cand
                pos += cand.size
    return order


def build_edge_chunks(edge_src, edge_dst, num_dst, tile_e: int = TILE_E,
                      reorder: str = "cm"):
    """Sort edges by (dst tile, src tile) and chunk within block pairs
    (host numpy, once per graph — the analog of a CSR build).

    Chunks never span a block-pair boundary, so each chunk gathers from
    exactly one source block and scatters into exactly one output
    block; boundaries pad to ``tile_e`` with inert edges (local id TZ
    -> zero one-hot row). Empty dst tiles still emit one inert chunk:
    every output block must be VISITED (and zero-initialized) — an
    unvisited block would return uninitialized memory.

    ``reorder="cm"`` (default) first relabels nodes with a
    Cuthill-McKee BFS ordering: arbitrary node numbering carries no
    block locality (measured fill 0.016 at Z=65536 on the kNN worlds —
    63x padding), while the BFS relabeling clusters each tile's
    neighbors into a few source tiles. The permutation is applied to
    the feature/score tables and inverted on the outputs at runtime
    (cheap (Z, W) row gathers — ``EdgeChunks.order``/``rank``);
    ``reorder="none"`` keeps original ids.
    """
    src = np.asarray(edge_src, np.int32)
    dst = np.asarray(edge_dst, np.int32)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError(f"edge arrays must be matching 1-D; got "
                         f"{src.shape} vs {dst.shape}")
    if dst.size and (dst.min() < 0 or dst.max() >= num_dst):
        raise ValueError("edge_dst out of range")
    if src.size and src.min() < 0:
        raise ValueError("edge_src out of range")
    if reorder not in ("cm", "none"):
        raise ValueError(f"reorder must be cm|none, got {reorder!r}")
    order_arr = rank_arr = None
    if reorder == "cm" and src.size:
        n_all = int(max(num_dst, src.max() + 1))
        if n_all != int(num_dst):
            raise ValueError(
                "reorder='cm' relabels src and dst through ONE "
                f"permutation, so it needs a square graph; got src ids "
                f"to {n_all - 1} with num_dst={num_dst}. Pass "
                "reorder='none' for bipartite graphs."
            )
        order_np = _cuthill_mckee(src, dst, n_all)
        rank_np = np.empty(n_all, np.int64)
        rank_np[order_np] = np.arange(n_all)
        src = rank_np[src].astype(np.int32)
        dst = rank_np[dst].astype(np.int32)
        order_arr = jnp.asarray(order_np, jnp.int32)
        rank_arr = jnp.asarray(rank_np, jnp.int32)
    stile_all = src // TZ
    dtile_all = dst // TZ
    order = np.lexsort((stile_all, dtile_all))
    src, dst = src[order], dst[order]
    stile, dtile = stile_all[order], dtile_all[order]

    chunk_sl, chunk_dl, chunk_st, chunk_dt, chunk_first = \
        [], [], [], [], []
    n_dst_tiles = -(-int(num_dst) // TZ)
    n_real = src.size
    # group boundaries of the sorted (dtile, stile) key
    if n_real:
        key = dtile.astype(np.int64) << 32 | stile.astype(np.int64)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], n_real]
    else:
        starts = ends = np.array([], np.int64)
    seen_dt = set()
    for a, b in zip(starts, ends):
        t_d, t_s = int(dtile[a]), int(stile[a])
        e_s = src[a:b] - t_s * TZ
        e_d = dst[a:b] - t_d * TZ
        n = e_s.size
        n_ch = -(-n // tile_e)
        pad = n_ch * tile_e - n
        e_s = np.pad(e_s, (0, pad), constant_values=TZ)
        e_d = np.pad(e_d, (0, pad), constant_values=TZ)
        for c in range(n_ch):
            chunk_sl.append(e_s[c * tile_e:(c + 1) * tile_e])
            chunk_dl.append(e_d[c * tile_e:(c + 1) * tile_e])
            chunk_st.append(t_s)
            chunk_dt.append(t_d)
            chunk_first.append(1 if t_d not in seen_dt else 0)
            seen_dt.add(t_d)
    for t in range(n_dst_tiles):  # inert chunks for empty dst tiles
        if t not in seen_dt:
            chunk_sl.append(np.full((tile_e,), TZ, np.int32))
            chunk_dl.append(np.full((tile_e,), TZ, np.int32))
            chunk_st.append(0)
            chunk_dt.append(t)
            chunk_first.append(1)
    # re-sort chunks by dst tile (output-block revisits must be
    # consecutive); stable keeps the first-flag on the first chunk
    reorder = np.argsort(np.asarray(chunk_dt), kind="stable")
    pick = lambda lst: [lst[i] for i in reorder]  # noqa: E731
    chunk_sl, chunk_dl, chunk_st, chunk_dt, chunk_first = map(
        pick, (chunk_sl, chunk_dl, chunk_st, chunk_dt, chunk_first)
    )

    def expand8(rows):
        a = np.stack(rows).astype(np.int32)  # (C, tile_e)
        return jnp.asarray(np.repeat(a, 8, axis=0))  # (8C, tile_e)

    return EdgeChunks(
        src_local=expand8(chunk_sl),
        dst_local=expand8(chunk_dl),
        src_tile=jnp.asarray(np.asarray(chunk_st, np.int32)),
        dst_tile=jnp.asarray(np.asarray(chunk_dt, np.int32)),
        first=jnp.asarray(np.asarray(chunk_first, np.int32)),
        num_dst=int(num_dst),
        fill=float(n_real) / float(max(1, len(chunk_sl) * tile_e)),
        order=(jnp.arange(num_dst, dtype=jnp.int32)
               if order_arr is None else order_arr),
        rank=(jnp.arange(num_dst, dtype=jnp.int32)
              if rank_arr is None else rank_arr),
    )


def _to16(a):
    return a.astype(jnp.bfloat16)


def _hi_lo16_cols(x):
    """(Z, H) f32 -> (Z, 2H) bf16 [hi | lo] so a bf16 gather keeps ~f32
    score precision (same decomposition as edge_segment.py)."""
    hi_f32 = jax.lax.reduce_precision(x, 8, 7)  # bf16-representable
    return jnp.concatenate([_to16(hi_f32), _to16(x - hi_f32)], axis=1)


def gat_edge_aggregate_gather_pallas(
    Wh, qs, qd, chunks: EdgeChunks, *, negative_slope: float = 0.2,
    interpret=None, shift=None,
):
    """Forward sparse multi-head GAT aggregation for large Z.

    Wh: (Zs, H, d) f32; qs/qd: (Zs, H)/(Zd, H) f32 score halves (edge
    score = leaky_relu(qs[src] + qd[dst])); ``chunks`` from
    :func:`build_edge_chunks`. Returns (Zd, H, d) f32 — the
    ``segment_softmax`` composition at bf16 feature / ~f32 score
    precision, ``bounded`` shift class (pass ``shift`` = the true
    per-dst score max for scale-robust exactness).

    Per chunk, ONE (tile_e, TZ) source one-hot gathers
    [Wh | qs_hi | qs_lo] rows from the chunk's (TZ, W) source block,
    and the destination one-hot pair scatters numerator/denominator
    into the chunk's (TZ, *) output block.
    """
    Zs, H, d = Wh.shape
    HD = H * d
    Zd = chunks.num_dst
    if interpret is None:
        interpret = not _on_tpu()
    tile_e = chunks.src_local.shape[1]
    C = chunks.n_chunks
    slope = np.float32(negative_slope)

    # combined gather table: [Wh_flat | qs_hi | qs_lo], lane-padded,
    # row-padded to a TZ multiple (source blocks)
    comb = jnp.concatenate(
        [_to16(Wh.reshape(Zs, HD)), _hi_lo16_cols(qs)], axis=1
    )
    W_comb = comb.shape[1]
    pad_w = (-W_comb) % 128
    if pad_w:
        comb = jnp.pad(comb, ((0, 0), (0, pad_w)))
    pad_r = (-Zs) % TZ
    if pad_r:
        comb = jnp.pad(comb, ((0, pad_r), (0, 0)))
    Zp_s, Wc = comb.shape

    n_dst_tiles = -(-Zd // TZ)
    Zp_d = n_dst_tiles * TZ
    qd_p = jnp.pad(qd, ((0, Zp_d - Zd), (0, 0)))
    qd_cols = _hi_lo16_cols(qd_p)  # (Zp_d, 2H)
    if shift is None:
        # bounded shift: leaky(upper bound of every dst's scores). Exact
        # softmax value when no underflow; scores sitting far below the
        # bound (pathological scales: bound - true_max > ~80) underflow
        # to zero rows — pass the true per-dst max as ``shift`` for
        # scale-robust behavior (gat_edge_attention_gather's "exact").
        b = jnp.max(qs, axis=0)[None, :] + qd_p  # (Zp_d, H)
        shift = jnp.where(b >= 0, b, slope * b).astype(jnp.float32)
    else:
        shift = jnp.pad(
            shift.astype(jnp.float32), ((0, Zp_d - shift.shape[0]), (0, 0))
        )
    expand = _to16(jnp.repeat(jnp.eye(H, dtype=jnp.float32), d, axis=1))

    def kernel(st_ref, dt_ref, ff_ref, src_ref, dl_ref, comb_ref,
               qd_ref, shift_ref, exp_ref, numer_ref, denom_ref):
        c = pl.program_id(0)
        sl = src_ref[0, :]
        dl = dl_ref[0, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, TZ), 1)
        s_src16 = _to16(sl[:, None] == col)
        s_dst16 = _to16(dl[:, None] == col)

        gath = jnp.dot(s_src16, comb_ref[:],
                       preferred_element_type=jnp.float32)  # (TE, Wc)
        v = gath[:, :HD]
        qs_e = gath[:, HD:HD + H] + gath[:, HD + H:HD + 2 * H]
        qd_g = jnp.dot(s_dst16, qd_ref[:],
                       preferred_element_type=jnp.float32)  # (TE, 2H)
        qd_e = qd_g[:, :H] + qd_g[:, H:]
        e = qs_e + qd_e
        e = jnp.where(e >= 0, e, slope * e)
        sh = jnp.dot(s_dst16, _to16(shift_ref[:]),
                     preferred_element_type=jnp.float32)  # (TE, H)
        valid = dl[:, None] < TZ
        ex = jnp.where(valid, jnp.exp(e - sh), 0.0)
        ex16 = _to16(ex)
        w = jnp.dot(ex16, exp_ref[:],
                    preferred_element_type=jnp.float32)  # (TE, HD)
        vw16 = _to16(v * w)

        @pl.when(ff_ref[c] == 1)
        def _init():
            numer_ref[:] = jnp.zeros_like(numer_ref)
            denom_ref[:] = jnp.zeros_like(denom_ref)

        sdT = s_dst16.T
        numer_ref[:] += jnp.dot(sdT, vw16,
                                preferred_element_type=jnp.float32)
        denom_ref[:] += jnp.dot(sdT, ex16,
                                preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((8, tile_e), lambda c, st, dt, ff: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_e), lambda c, st, dt, ff: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, Wc), lambda c, st, dt, ff: (st[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, 2 * H), lambda c, st, dt, ff: (dt[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, H), lambda c, st, dt, ff: (dt[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, HD), lambda c, st, dt, ff: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TZ, HD), lambda c, st, dt, ff: (dt[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, H), lambda c, st, dt, ff: (dt[c], 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    numer, denom = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Zp_d, HD), jnp.float32),
            jax.ShapeDtypeStruct((Zp_d, H), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        chunks.src_tile, chunks.dst_tile, chunks.first,
        chunks.src_local, chunks.dst_local, comb, qd_cols, shift,
        expand,
    )
    out = numer[:Zd] / jnp.maximum(denom[:Zd], 1e-12).repeat(d, axis=1)
    return out.reshape(Zd, H, d)


def gat_edge_attention_gather(Wh, e_recv, e_send, chunks: EdgeChunks,
                              edge_src, edge_dst, num_nodes,
                              negative_slope: float = 0.2,
                              score_shift: str = "exact"):
    """Differentiable large-Z sparse GAT aggregation: gather/scatter
    Pallas forward, XLA-composition VJP.

    Same score convention as ``ops.segment.gat_edge_attention_multihead``
    (``leaky_relu(e_recv[dst] + e_send[src])``); ``chunks`` from
    :func:`build_edge_chunks` over the SAME (edge_src, edge_dst) —
    the raw edge arrays ride along for the backward composition.
    Off-TPU (no Mosaic) both directions use the XLA composition.

    ``score_shift``: "exact" (default) precomputes the TRUE per-dst
    score max with one cheap XLA ``segment_max`` over (E, H) — robust
    at any score scale; "bounded" skips that pass, guarding overflow
    with the per-dst upper bound ``leaky(max_src(e_send) + e_recv)``
    (same value where no underflow; scores > ~80 below the bound
    underflow to zero rows).
    """
    if score_shift not in ("exact", "bounded"):
        raise ValueError(
            f"score_shift must be exact|bounded, got {score_shift!r}"
        )
    return _gat_gather_vjp(
        Wh, e_send, e_recv, chunks.src_local, chunks.dst_local,
        chunks.src_tile, chunks.dst_tile, chunks.first,
        chunks.order, chunks.rank, edge_src, edge_dst,
        int(num_nodes), float(negative_slope), score_shift,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _gat_gather_vjp(Wh, qs, qd, c_sl, c_dl, c_st, c_dt, c_first,
                    c_order, c_rank, edge_src, edge_dst, num_nodes,
                    negative_slope, score_shift):
    out, _ = _gat_gather_fwd(
        Wh, qs, qd, c_sl, c_dl, c_st, c_dt, c_first, c_order, c_rank,
        edge_src, edge_dst, num_nodes, negative_slope, score_shift,
    )
    return out


def _xla_composition(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                     negative_slope):
    from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

    return gat_edge_attention_multihead(
        Wh, qd, qs, edge_src, edge_dst, num_nodes, use_pallas=False,
    )


def _gat_gather_fwd(Wh, qs, qd, c_sl, c_dl, c_st, c_dt, c_first,
                    c_order, c_rank, edge_src, edge_dst, num_nodes,
                    negative_slope, score_shift):
    if _on_tpu():
        shift = None
        if score_shift == "exact":
            e = qs[edge_src] + qd[edge_dst]  # (E, H)
            e = jnp.where(e >= 0, e, negative_slope * e)
            m = jax.ops.segment_max(e, edge_dst,
                                    num_segments=num_nodes)
            # isolated dsts come back -inf; any -inf in the shift block
            # would NaN-poison the one-hot gather matmul (0 * -inf)
            shift = jnp.where(jnp.isfinite(m), m, 0.0)
            shift = shift[c_order]
        chunks = EdgeChunks(src_local=c_sl, dst_local=c_dl,
                            src_tile=c_st, dst_tile=c_dt,
                            first=c_first, num_dst=num_nodes)
        # apply the bandwidth-reducing relabeling to the node tables
        # (cheap (Z, W) row gathers); the kernel works in relabeled ids
        out_p = gat_edge_aggregate_gather_pallas(
            Wh[c_order], qs[c_order], qd[c_order], chunks,
            negative_slope=negative_slope, shift=shift,
        )
        out = out_p[c_rank]  # back to original ids
    else:
        out = _xla_composition(Wh, qs, qd, edge_src, edge_dst,
                               num_nodes, negative_slope)
    res = (Wh, qs, qd, edge_src, edge_dst,
           c_sl.shape, c_dl.shape, c_st.shape, c_dt.shape,
           c_first.shape, c_order.shape, c_rank.shape)
    return out, res


def _gat_gather_bwd(num_nodes, negative_slope, score_shift, res, g):
    (Wh, qs, qd, edge_src, edge_dst,
     s_sl, s_dl, s_st, s_dt, s_first, s_order, s_rank) = res
    _, vjp = jax.vjp(
        lambda Wh_, qs_, qd_: _xla_composition(
            Wh_, qs_, qd_, edge_src, edge_dst, num_nodes, negative_slope
        ),
        Wh, qs, qd,
    )
    gWh, gqs, gqd = vjp(g)

    def zi(shape):
        return np.zeros(shape, jax.dtypes.float0)

    return (gWh, gqs, gqd, zi(s_sl), zi(s_dl), zi(s_st), zi(s_dt),
            zi(s_first), zi(s_order), zi(s_rank),
            zi(edge_src.shape), zi(edge_dst.shape))


_gat_gather_vjp.defvjp(_gat_gather_fwd, _gat_gather_bwd)
