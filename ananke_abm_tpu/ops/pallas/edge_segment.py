"""Edge-list GAT aggregation as ONE Pallas kernel (edge-softmax +
segment-sum), MXU-native.

The north-star op set for sparse zone graphs (SURVEY §2.7): the XLA path
(ops/segment.py) lowers ``jax.ops.segment_sum`` to sort-based segment
reductions plus dynamic gathers — bandwidth-bound scalar machinery the
TPU hates. This kernel re-expresses BOTH the gather and the scatter as
one-hot matmuls, which is the TPU-idiomatic form: for an edge tile,

    S_src = onehot(src_ids)           (TILE_E, Zs)  bf16, exact 0/1
    S_dst = onehot(dst_ids)           (TILE_E, Zd)
    e     = leaky_relu(S_src @ qs + S_dst @ qd)
    -- pass 0 (all edge tiles): per-destination running max
    dmax  = max(dmax, max_rows(where(S_dst, e, -BIG)))
    -- pass 1 (all edge tiles again): exact shifted softmax + scatter
    v     = S_src @ Wh                -- the gather, on the MXU
    ex    = exp(e - S_dst @ dmax)     -- e - shift <= 0 per destination:
                                         no overflow OR underflow at any
                                         caller-supplied score scale,
                                         bit-matching the XLA
                                         segment-softmax's max
                                         subtraction
    numer += S_dst.T @ (v * ex)       -- the scatter, on the MXU
    denom += S_dst.T @ ex

The two passes are one kernel with grid (2, n_tiles): the dmax / numer /
denom outputs use constant index maps so they stay VMEM-resident across
the whole grid, and pass 1 reads the dmax block pass 0 finished. Pass 0
skips the (Zs, D) feature gather, so the overhead over a single sweep is
the score re-gather plus a VPU masked row-max — the big matmuls
(feature gather + both scatters) still run once.

Score precision: qs/qd are gathered through the bf16 one-hot matmul as
hi+lo bf16 pairs (qs = hi + lo, hi = bf16(qs), lo = bf16(qs - hi))
accumulated in f32, so pre-exp scores carry ~f32 precision (exp
amplifies argument error; a plain bf16 gather costs ~2^-8 relative on
the attention weights). Feature values (Wh) stay plain bf16 — the
documented feature precision.

Differentiation: the kernels are forward-only under AD (their
cross-tile ``out_ref +=`` accumulation is not auto-differentiable), so
the public entry points wrap them in ``jax.custom_vjp``. The
single-head ``gat_edge_aggregate``'s backward is the VJP of the
reference XLA composition (ops/segment.py). The multihead
``gat_edge_aggregate_multihead`` goes further: on TPU its backward is
the hand-written ``gat_edge_backward_multihead_pallas`` — one sweep in
the same shared one-hot form, exploiting the telescoped softmax-VJP
correction <g_i, out_i> so no second per-destination reduction pass is
needed (off-TPU it falls back to the XLA-composition VJP).

and the per-node normalization ``numer / denom`` happens once at the
end. numer/denom accumulate across edge tiles in VMEM via the
constant-index-map + @pl.when(program_id==0) init pattern (the same
cross-tile accumulation the fused training kernel uses for weight
grads). No sort, no scatter, no data-dependent control flow; padding
edges use dst = Zd (their one-hot row is all zeros, so they contribute
nothing).

Cost model: 3 one-hot matmuls of 2*E*Z*D-ish FLOPs — linear in E where
the dense adjacency layer is quadratic in Z, so the edge kernel wins
when average degree << Z. VMEM bounds the PRODUCT TILE_E * Z (the
(TILE_E, Z) one-hots): the edge-tile size adapts to the zone count
(``_tile_e``), holding TILE_E * Z <= 2^22 elements — TILE_E=1024 up to
Z=4096, shrinking to the 128-row MXU floor at Z=32768. The one-hot
matmuls stay MXU-shaped at every size (K = Z >= 4096 when the tile
shrinks). Beyond Z=32768 the kernel refuses ("auto" dispatch falls back
to XLA); note the one-hot form is O(E*Z*D) FLOPs, so its advantage over
the XLA segment path narrows as Z grows regardless of VMEM.

Measured (v5e, D=64, avg degree 16): see ``edge_softmax_attention``
docstring in ops/segment.py for the dispatch rule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ops.pallas.fused_step import _on_tpu, _to16

TILE_E = 1024
_ONEHOT_BUDGET = 1 << 22  # max TILE_E * Z elements per one-hot
_MAX_Z = 32768  # _tile_e's 128-row floor


def _tile_e(num_nodes: int) -> int:
    """Edge-tile size for a given zone count: the largest power-of-two
    tile in [128, 1024] keeping the (TILE_E, Z) one-hots within the VMEM
    budget. Raises for zone counts past the 128-row floor."""
    if num_nodes > _MAX_Z:
        raise ValueError(
            f"edge kernels support num_nodes <= {_MAX_Z} "
            f"(got {num_nodes}); use the XLA segment path"
        )
    tile = TILE_E
    while tile > 128 and tile * num_nodes > _ONEHOT_BUDGET:
        tile //= 2
    return tile


def _sublane_expand(ids_2d):
    """(n_tiles, tile_e) -> (n_tiles * 8, tile_e) with each tile's ids in
    the first row of its 8-row group: Mosaic requires the last two block
    dims divisible by (8, 128), so an id block is (8, tile_e) of which
    the kernel reads row 0 (rows 1-7 are dead padding)."""
    n_tiles, tile_e = ids_2d.shape
    return jnp.broadcast_to(
        ids_2d[:, None, :], (n_tiles, 8, tile_e)
    ).reshape(n_tiles * 8, tile_e)


def _pad_edges(edge_src, edge_dst, scores_or_none, num_nodes, tile_e):
    """Pad the edge list to a tile_e multiple and lay it out for
    (8, tile_e) id blocks (``_sublane_expand``). Padding edges point at
    dst = num_nodes (one-hot row all zero -> no contribution)."""
    E = edge_src.shape[0]
    n_tiles = max(1, -(-E // tile_e))
    pad = n_tiles * tile_e - E
    if pad:
        edge_src = jnp.pad(edge_src, (0, pad))
        edge_dst = jnp.pad(edge_dst, (0, pad), constant_values=num_nodes)
        if scores_or_none is not None:
            scores_or_none = jnp.pad(scores_or_none, (0, pad))
    edge_src = _sublane_expand(edge_src.reshape(n_tiles, tile_e))
    edge_dst = _sublane_expand(edge_dst.reshape(n_tiles, tile_e))
    return edge_src, edge_dst, scores_or_none, n_tiles


def _trunc_bf16_f32(x_f32):
    """bf16-truncate an f32 array WITHOUT a dtype round-trip: mask the
    low 16 mantissa bits via bitcast. The naive ``x - f32(bf16(x))``
    residual is constant-folded to ZERO under XLA's
    --xla_allow_excess_precision (the bf16->f32 round-trip is elided),
    which silently dropped the lo half on TPU — observed as O(1)
    attention-ratio errors between near-tied large scores. Bit-masking
    cannot be elided."""
    xi = jax.lax.bitcast_convert_type(x_f32, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(xi, jnp.int32(-65536)), jnp.float32
    )


def _hi_lo16_pair(x_col):
    """(Z, 1) f32 -> (Z, 2) bf16 [hi, lo] with x == hi + lo to f32
    precision when the two matmul output columns are re-added in f32
    (hi is the bf16 truncation, computed fold-proof; lo the exact f32
    residual rounded to bf16)."""
    hi_f32 = _trunc_bf16_f32(x_col)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: low mantissa bits are 0
    lo = _to16(x_col - hi_f32)
    return jnp.concatenate([hi, lo], axis=1)


def _pair_gather(onehot16, pair_ref_val):
    """Gather an f32 value through its bf16 [hi, lo] pair columns:
    one (tile, Z) @ (Z, 2) matmul, then an f32 column sum."""
    p = jnp.dot(onehot16, pair_ref_val, preferred_element_type=jnp.float32)
    return p[:, :1] + p[:, 1:2]  # (tile, 1) f32


def gat_edge_aggregate_pallas(
    Wh, qs, qd, edge_src, edge_dst, *, num_nodes=None,
    negative_slope: float = 0.2, score_shift: str = "exact",
    interpret=None, return_residuals: bool = False,
):
    """Sparse GAT neighborhood aggregation over an edge list
    (forward-only kernel; use ``gat_edge_aggregate`` under jax.grad).

    Wh: (Zs, D) f32 projected node features; qs, qd: (Zs,) f32 per-node
    score halves (Wh @ a_src, Wh @ a_dst); edge_src/edge_dst: (E,) int32;
    ``num_nodes``: number of output rows Zd (defaults to Zs). Returns
    (Zd, D) f32: for each destination node, the softmax-weighted sum of
    its source neighbors' Wh rows — numerically the composition
    ``edge_softmax_attention(Wh[src], leaky_relu(qs[src]+qd[dst]), dst)``
    of ops/segment.py (edges with dst >= num_nodes are dropped, matching
    segment_sum), to bf16 feature precision with ~f32 score math (hi+lo
    gather, see module docstring).

    ``score_shift``: "exact" (default) runs the two-pass kernel — true
    per-destination max subtraction, robust at ANY caller-supplied score
    scale, like the XLA path. "bounded" runs a single sweep shifted by
    leaky_relu(max(qs) + qd[d]) — still a per-destination constant
    (cancels exactly in the ratio) and an upper bound on every incoming
    score (no overflow), ~2x faster, but destinations whose incoming
    qs[src] all sit > ~87 below the global max(qs) underflow to zero
    output. Use "bounded" only where scores are known-moderate (e.g. a
    trained model's forward).
    """
    if score_shift not in ("exact", "bounded"):
        raise ValueError(f"score_shift must be exact|bounded, got "
                         f"{score_shift!r}")
    exact = score_shift == "exact"
    Zs, D = Wh.shape
    Zd = Zs if num_nodes is None else int(num_nodes)
    if exact and max(Zs, Zd) > 16384:
        # the max-scan pass's (tile_e, Zd) f32 masked intermediate
        # VMEM-OOMs at the 128-row tile floor (measured at Z=32768)
        raise ValueError(
            "score_shift='exact' supports num_nodes <= 16384; use "
            "score_shift='bounded' or the XLA segment path"
        )
    if interpret is None:
        interpret = not _on_tpu()
    tile_e = _tile_e(max(Zs, Zd))
    edge_src, edge_dst, _, n_tiles = _pad_edges(
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32), None, Zd,
        tile_e,
    )
    slope = np.float32(negative_slope)
    # qd is indexed by dst ids (< Zd): resize its row axis to Zd
    qd_d = qd[:Zd]
    if qd_d.shape[0] < Zd:
        qd_d = jnp.pad(qd_d, (0, Zd - qd_d.shape[0]))
    qs_pair = _hi_lo16_pair(qs[:, None])  # (Zs, 2) bf16
    qd_pair = _hi_lo16_pair(qd_d[:, None])  # (Zd, 2) bf16
    # finite stand-in for -inf: avoids inf/nan entering the bf16 hi/lo
    # shift gather (0 * inf = nan would poison the one-hot matmul)
    NEG_BIG = np.float32(-1e30)
    if exact:
        shift_in = jnp.zeros((Zd, 1), jnp.float32)  # unused
    else:
        # per-destination upper bound on the incoming scores
        b = jnp.max(qs) + qd_d.astype(jnp.float32)
        shift_in = jnp.where(b >= 0, b, slope * b)[:, None]

    def kernel(src_ref, dst_ref, wh_ref, qs_ref, qd_ref,
               shift_ref, numer_ref, denom_ref, dmax_ref):
        # in bounded mode the max-scan phase is skipped entirely:
        # the single grid sweep is the aggregation phase
        phase = pl.program_id(0) + (0 if exact else 1)
        tile = pl.program_id(1)

        @pl.when((phase == 0) & (tile == 0))
        def _init0():
            dmax_ref[:] = jnp.full_like(dmax_ref, NEG_BIG)

        src = src_ref[0, :]  # (tile_e,)
        dst = dst_ref[0, :]
        col_s = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zs), 1)
        col_d = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zd), 1)
        is_dst = dst[:, None] == col_d
        s_src = _to16(src[:, None] == col_s)  # exact 0/1 in bf16
        s_dst = _to16(is_dst)
        e = (
            _pair_gather(s_src, qs_ref[:])
            + _pair_gather(s_dst, qd_ref[:])
        )  # (tile_e, 1), ~f32-accurate scores
        e = jnp.where(e >= 0, e, slope * e)  # leaky_relu

        @pl.when(phase == 0)
        def _scan_max():
            # per-destination running max over this edge tile
            masked = jnp.where(is_dst, e, NEG_BIG)  # (tile_e, Zd) f32
            dmax_ref[:] = jnp.maximum(
                dmax_ref[:], jnp.max(masked, axis=0)[:, None]
            )

        @pl.when((phase == 1) & (tile == 0))
        def _init1():
            numer_ref[:] = jnp.zeros_like(numer_ref)
            denom_ref[:] = jnp.zeros_like(denom_ref)
            if not exact:
                dmax_ref[:] = shift_ref[:]

        @pl.when(phase == 1)
        def _aggregate():
            v = jnp.dot(
                s_src, wh_ref[:], preferred_element_type=jnp.float32
            )
            # gather each edge's destination max as a bf16 hi+lo pair
            # (f32-accurate shift; fold-proof in-kernel split, pure VPU)
            dm = dmax_ref[:]
            dm_hi_f32 = _trunc_bf16_f32(dm)
            dm_pair = jnp.concatenate(
                [dm_hi_f32.astype(jnp.bfloat16), _to16(dm - dm_hi_f32)],
                axis=1,
            )
            shift = _pair_gather(s_dst, dm_pair)  # (tile_e, 1)
            # e - shift <= 0 per destination (exact max subtraction).
            # Padding edges (dst == Zd, all-zero one-hot row) gather
            # shift 0, so exp(e) could overflow to inf at large caller
            # scores — and 0 * inf = NaN would poison the scatter
            # matmul. Clamp their exp argument to NEG_BIG (exp -> 0)
            # BEFORE exponentiating (masking after would still compute
            # the inf).
            valid = (dst[:, None] >= 0) & (dst[:, None] < Zd)  # (tile_e, 1)
            ex = jnp.exp(jnp.where(valid, e - shift, NEG_BIG))
            sdT = s_dst.T
            numer_ref[:] += jnp.dot(
                sdT, _to16(v * ex), preferred_element_type=jnp.float32
            )
            denom_ref[:] += jnp.dot(
                sdT, _to16(ex), preferred_element_type=jnp.float32
            )

    const = lambda i, j: (0, 0)
    numer, denom, dmax_out = pl.pallas_call(
        kernel,
        grid=(2 if exact else 1, n_tiles),
        in_specs=[
            pl.BlockSpec((8, tile_e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, 2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Zd, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 1), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Zd, D), jnp.float32),
            jax.ShapeDtypeStruct((Zd, 1), jnp.float32),
            jax.ShapeDtypeStruct((Zd, 1), jnp.float32),  # dmax
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        edge_src, edge_dst, _to16(Wh), qs_pair, qd_pair, shift_in,
    )
    out = numer / jnp.maximum(denom, 1e-12)
    if return_residuals:
        # the actual shift used: true per-destination max in exact
        # mode, the bounded upper bound otherwise (see the multihead
        # variant) — what the backward kernel re-applies
        return out, denom, (dmax_out if exact else shift_in)
    return out


def gat_edge_aggregate(Wh, qs, qd, edge_src, edge_dst, num_nodes=None,
                       negative_slope: float = 0.2):
    """Differentiable sparse GAT aggregation: Pallas one-hot-matmul
    forward; backward is the hand-written Pallas kernel on TPU (routed
    through the multihead backward with H=1 — identical math) and the
    XLA-composition VJP off-TPU. bf16-feature grad precision on the
    TPU path, f32 under XLA."""
    return _gat_edge_aggregate_vjp(
        Wh, qs, qd, edge_src, edge_dst, num_nodes, float(negative_slope)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gat_edge_aggregate_vjp(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                            negative_slope):
    return gat_edge_aggregate_pallas(
        Wh, qs, qd, edge_src, edge_dst, num_nodes=num_nodes,
        negative_slope=negative_slope,
    )


def _xla_composition(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                     negative_slope):
    from ananke_abm_tpu.ops.segment import edge_softmax_attention

    e = jax.nn.leaky_relu(
        qs[edge_src] + qd[edge_dst], negative_slope=negative_slope
    )
    return edge_softmax_attention(
        Wh[edge_src], e, edge_dst,
        Wh.shape[0] if num_nodes is None else num_nodes,
    )


def _gat_agg_fwd(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                 negative_slope):
    out, denom, shift = gat_edge_aggregate_pallas(
        Wh, qs, qd, edge_src, edge_dst, num_nodes=num_nodes,
        negative_slope=negative_slope, return_residuals=True,
    )
    return out, (Wh, qs, qd, edge_src, edge_dst, out, denom, shift)


def _gat_agg_bwd(num_nodes, negative_slope, res, g):
    Wh, qs, qd, edge_src, edge_dst, out, denom, shift = res
    if _on_tpu():
        # the multihead backward with H=1 is exactly the single-head
        # backward (shared one-hot form, telescoped softmax VJP)
        dWh, dqs, dqd = gat_edge_backward_multihead_pallas(
            Wh[:, None, :], qs[:, None], qd[:, None],
            edge_src, edge_dst, g[:, None, :], out[:, None, :],
            denom, shift, num_nodes=num_nodes,
            negative_slope=negative_slope,
        )
        gWh, gqs, gqd = dWh[:, 0, :], dqs[:, 0], dqd[:, 0]
    else:
        _, vjp = jax.vjp(
            lambda Wh, qs, qd: _xla_composition(
                Wh, qs, qd, edge_src, edge_dst, num_nodes, negative_slope
            ),
            Wh, qs, qd,
        )
        gWh, gqs, gqd = vjp(g)
    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return gWh, gqs, gqd, zero_int(edge_src), zero_int(edge_dst)


_gat_edge_aggregate_vjp.defvjp(_gat_agg_fwd, _gat_agg_bwd)


def _hi_lo16_cols(x):
    """(Z, H) f32 -> (Z, 2H) bf16 ``[hi_0..hi_{H-1} | lo_0..lo_{H-1}]``
    with x[:, h] == hi_h + lo_h to f32 precision when the two matmul
    output column groups are re-added in f32 (the (Z, H) generalization
    of ``_hi_lo16_pair``)."""
    hi_f32 = _trunc_bf16_f32(x)
    return jnp.concatenate(
        [hi_f32.astype(jnp.bfloat16), _to16(x - hi_f32)], axis=1
    )


def _cols_gather(onehot16, pair_cols, H):
    """Gather (Z, H) f32 values through their (Z, 2H) bf16 hi|lo column
    groups: one (tile, Z) @ (Z, 2H) matmul, then an f32 column re-add."""
    p = jnp.dot(onehot16, pair_cols, preferred_element_type=jnp.float32)
    return p[:, :H] + p[:, H:]  # (tile, H) f32


def gat_edge_aggregate_multihead_pallas(
    Wh, qs, qd, edge_src, edge_dst, *, num_nodes=None,
    negative_slope: float = 0.2, score_shift: str = "exact",
    interpret=None, return_residuals: bool = False,
):
    """ALL heads of a sparse multi-head GAT aggregation in ONE kernel.

    Wh: (Zs, H, d) f32 per-head projected features; qs/qd: (Zs, H) f32
    per-head score halves; edge_src/edge_dst: (E,) int32. Returns
    (Zd, H, d) f32 — numerically the per-head composition
    ``edge_softmax_attention(Wh[:, h][src], leaky_relu(qs[src, h] +
    qd[dst, h]), dst)`` stacked over h, to bf16 feature precision with
    ~f32 score math (hi+lo column gathers).

    Launching one kernel per head (the obvious lift of the single-head
    kernel) pays the one-hot construction H times and runs (.., d)
    matmuls that waste most of each MXU tile at small per-head widths
    (the model default is d = 16). This kernel instead shares the
    (tile_e, Z) one-hots across heads and keeps every heavy matmul at
    full width:

        v      = S_src @ Wh_flat            (tile_e, H*d)  one gather
        e      = cols_gather(qs) + cols_gather(qd)   (tile_e, H) scores
        w      = exp(e - shift) @ EXPAND    (tile_e, H*d)  -- EXPAND is
                 the constant 0/1 (H, H*d) block-diagonal that repeats
                 each head's weight across its d feature columns (a
                 tiny MXU matmul instead of a Mosaic-hostile reshape)
        numer += S_dst.T @ (v * w)          (Zd, H*d)      one scatter
        denom += S_dst.T @ ex               (Zd, H)

    so the extra cost over the single-head kernel at equal total width
    D = H*d is only the H-wide score/shift gathers and the per-head
    running-max scan. ``score_shift`` semantics match
    ``gat_edge_aggregate_pallas``. Forward-only (cross-tile VMEM
    accumulation); use ``gat_edge_aggregate_multihead`` under jax.grad.
    """
    if score_shift not in ("exact", "bounded"):
        raise ValueError(f"score_shift must be exact|bounded, got "
                         f"{score_shift!r}")
    exact = score_shift == "exact"
    Zs, H, d = Wh.shape
    HD = H * d
    Zd = Zs if num_nodes is None else int(num_nodes)
    if exact and max(Zs, Zd) > 16384:
        raise ValueError(
            "score_shift='exact' supports num_nodes <= 16384; use "
            "score_shift='bounded' or the XLA segment path"
        )
    if interpret is None:
        interpret = not _on_tpu()
    tile_e = _tile_e(max(Zs, Zd))
    edge_src, edge_dst, _, n_tiles = _pad_edges(
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32), None, Zd,
        tile_e,
    )
    slope = np.float32(negative_slope)
    qd_d = qd[:Zd]
    if qd_d.shape[0] < Zd:
        qd_d = jnp.pad(qd_d, ((0, Zd - qd_d.shape[0]), (0, 0)))
    qs_cols = _hi_lo16_cols(qs)  # (Zs, 2H)
    qd_cols = _hi_lo16_cols(qd_d)  # (Zd, 2H)
    NEG_BIG = np.float32(-1e30)
    if exact:
        shift_in = jnp.zeros((Zd, H), jnp.float32)  # unused
    else:
        b = jnp.max(qs, axis=0)[None, :] + qd_d  # (Zd, H)
        shift_in = jnp.where(b >= 0, b, slope * b)
    # constant head->feature-column expander (block diagonal 0/1)
    expand = _to16(
        jnp.repeat(jnp.eye(H, dtype=jnp.float32), d, axis=1)
    )  # (H, H*d)

    def kernel(src_ref, dst_ref, wh_ref, qs_ref, qd_ref, shift_ref,
               exp_ref, numer_ref, denom_ref, dmax_ref):
        phase = pl.program_id(0) + (0 if exact else 1)
        tile = pl.program_id(1)

        @pl.when((phase == 0) & (tile == 0))
        def _init0():
            dmax_ref[:] = jnp.full_like(dmax_ref, NEG_BIG)

        src = src_ref[0, :]
        dst = dst_ref[0, :]
        col_s = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zs), 1)
        col_d = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zd), 1)
        is_dst = dst[:, None] == col_d
        s_src = _to16(src[:, None] == col_s)
        s_dst = _to16(is_dst)
        e = (
            _cols_gather(s_src, qs_ref[:], H)
            + _cols_gather(s_dst, qd_ref[:], H)
        )  # (tile_e, H)
        e = jnp.where(e >= 0, e, slope * e)

        @pl.when(phase == 0)
        def _scan_max():
            # per-destination, per-head running max; one (tile_e, Zd)
            # masked reduce per head (H is small)
            for h in range(H):
                masked = jnp.where(is_dst, e[:, h:h + 1], NEG_BIG)
                dmax_ref[:, h:h + 1] = jnp.maximum(
                    dmax_ref[:, h:h + 1],
                    jnp.max(masked, axis=0)[:, None],
                )

        @pl.when((phase == 1) & (tile == 0))
        def _init1():
            numer_ref[:] = jnp.zeros_like(numer_ref)
            denom_ref[:] = jnp.zeros_like(denom_ref)
            if not exact:
                dmax_ref[:] = shift_ref[:]

        @pl.when(phase == 1)
        def _aggregate():
            v = jnp.dot(
                s_src, wh_ref[:], preferred_element_type=jnp.float32
            )  # (tile_e, H*d)
            dm = dmax_ref[:]  # (Zd, H)
            dm_hi_f32 = _trunc_bf16_f32(dm)
            dm_cols = jnp.concatenate(
                [dm_hi_f32.astype(jnp.bfloat16), _to16(dm - dm_hi_f32)],
                axis=1,
            )
            shift = _cols_gather(s_dst, dm_cols, H)  # (tile_e, H)
            valid = (dst[:, None] >= 0) & (dst[:, None] < Zd)
            ex = jnp.exp(jnp.where(valid, e - shift, NEG_BIG))
            ex16 = _to16(ex)
            w = jnp.dot(
                ex16, exp_ref[:], preferred_element_type=jnp.float32
            )  # (tile_e, H*d) per-head weights at feature width
            sdT = s_dst.T
            numer_ref[:] += jnp.dot(
                sdT, _to16(v * w), preferred_element_type=jnp.float32
            )
            denom_ref[:] += jnp.dot(
                sdT, ex16, preferred_element_type=jnp.float32
            )

    const = lambda i, j: (0, 0)
    numer, denom, dmax_out = pl.pallas_call(
        kernel,
        grid=(2 if exact else 1, n_tiles),
        in_specs=[
            pl.BlockSpec((8, tile_e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, HD), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Zd, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Zd, HD), jnp.float32),
            jax.ShapeDtypeStruct((Zd, H), jnp.float32),
            jax.ShapeDtypeStruct((Zd, H), jnp.float32),  # dmax
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        edge_src, edge_dst, _to16(Wh.reshape(Zs, HD)), qs_cols, qd_cols,
        shift_in, expand,
    )
    numer = numer.reshape(Zd, H, d)
    out = numer / jnp.maximum(denom, 1e-12)[:, :, None]
    if return_residuals:
        # dmax holds the actual shift used (true max in exact mode, the
        # bounded upper bound otherwise) — exactly what the backward
        # kernel must re-apply to recompute alpha
        dmax = dmax_out if exact else shift_in
        return out, denom, dmax
    return out


def gat_edge_backward_multihead_pallas(
    Wh, qs, qd, edge_src, edge_dst, g, out, denom, shift, *,
    num_nodes=None, negative_slope: float = 0.2, interpret=None,
):
    """Hand-written backward of the multihead edge aggregation: one
    Pallas sweep over edge tiles computing (dWh, dqs, dqd) from the
    output cotangent ``g`` (Zd, H, d) and the forward residuals
    ``out``/``denom``/``shift`` (the actual softmax shift used — true
    per-destination max in exact mode).

    The softmax VJP normally needs a second per-destination reduction
    (sum_j alpha_ij dalpha_ij), but here that sum telescopes:
    sum_j alpha_ij <g_i, Wh_j> = <g_i, sum_j alpha_ij Wh_j>
    = <g_i, out_i> — a pure elementwise product of two residuals,
    computed OUTSIDE the kernel. So the backward is a single pass with
    the same shared one-hot matrices as the forward:

        ge     = S_dst @ g              (tile_e, H*d)  cotangent gather
        vs     = S_src @ Wh             (tile_e, H*d)  feature gather
        alpha  = exp(e - shift) / denom (tile_e, H)    recompute
        dalpha = (ge * vs) @ EXPAND.T   (tile_e, H)    per-head <g, Wh>
        de     = alpha * (dalpha - S_dst @ corr)       softmax VJP
        dpre   = de * leaky'(e)                        (sign(e) = sign(x))
        dWh   += S_src.T @ (ge * (alpha @ EXPAND))     feature scatter
        dqs   += S_src.T @ dpre; dqd += S_dst.T @ dpre

    FLOP cost ~= the forward's (two full-width gathers + one full-width
    scatter + two narrow scatters). Grads carry bf16 feature precision
    (matmul operands are bf16, f32 accumulation), like the forward —
    concretely, absolute grad error is O(2^-8) of the cotangent x
    feature scale. Note the softmax-VJP difference (dalpha - corr) is a
    catastrophic cancellation when attention saturates (one edge takes
    all the weight): the TRUE score grads then collapse toward zero
    while the bf16 rounding noise does not, so at extreme score scales
    the relative error on dqs/dqd is unbounded even though the absolute
    error stays at ordinary bf16-training magnitude. Padding edges
    recompute ex with the same valid-clamp as the forward, so alpha = 0
    and they contribute nothing.
    """
    Zs, H, d = Wh.shape
    HD = H * d
    Zd = Zs if num_nodes is None else int(num_nodes)
    if interpret is None:
        interpret = not _on_tpu()
    tile_e = _tile_e(max(Zs, Zd))
    edge_src, edge_dst, _, n_tiles = _pad_edges(
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32), None, Zd,
        tile_e,
    )
    slope = np.float32(negative_slope)
    NEG_BIG = np.float32(-1e30)
    qs_cols = _hi_lo16_cols(qs)  # (Zs, 2H)
    qd_d = qd[:Zd]
    if qd_d.shape[0] < Zd:
        qd_d = jnp.pad(qd_d, ((0, Zd - qd_d.shape[0]), (0, 0)))
    qd_cols = _hi_lo16_cols(qd_d)  # (Zd, 2H)
    shift_cols = _hi_lo16_cols(shift)  # (Zd, 2H)
    # per-destination softmax-VJP correction <g_i, out_i> per head —
    # the telescoped second reduction (see docstring)
    g2 = g.reshape(Zd, HD)
    corr = jnp.sum(
        (g2 * out.reshape(Zd, HD)).reshape(Zd, H, d), axis=-1
    )  # (Zd, H) f32
    corr_cols = _hi_lo16_cols(corr)
    inv_den = 1.0 / jnp.maximum(denom, 1e-12)  # (Zd, H)
    inv_cols = _hi_lo16_cols(inv_den)
    expand = _to16(
        jnp.repeat(jnp.eye(H, dtype=jnp.float32), d, axis=1)
    )  # (H, HD)
    expand_t = expand.T  # precomputed: in-kernel transpose is Mosaic-hostile

    def kernel(src_ref, dst_ref, wh_ref, g_ref, qs_ref, qd_ref,
               shift_ref, corr_ref, inv_ref, exp_ref, exp_t_ref,
               dwh_ref, dqs_ref, dqd_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            dqs_ref[:] = jnp.zeros_like(dqs_ref)
            dqd_ref[:] = jnp.zeros_like(dqd_ref)

        src = src_ref[0, :]
        dst = dst_ref[0, :]
        col_s = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zs), 1)
        col_d = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Zd), 1)
        s_src = _to16(src[:, None] == col_s)
        s_dst = _to16(dst[:, None] == col_d)
        e = (
            _cols_gather(s_src, qs_ref[:], H)
            + _cols_gather(s_dst, qd_ref[:], H)
        )
        e = jnp.where(e >= 0, e, slope * e)  # (tile_e, H)
        sh = _cols_gather(s_dst, shift_ref[:], H)
        valid = (dst[:, None] >= 0) & (dst[:, None] < Zd)
        ex = jnp.exp(jnp.where(valid, e - sh, NEG_BIG))
        alpha = ex * _cols_gather(s_dst, inv_ref[:], H)  # (tile_e, H)

        ge = jnp.dot(s_dst, g_ref[:], preferred_element_type=jnp.float32)
        vs = jnp.dot(s_src, wh_ref[:], preferred_element_type=jnp.float32)
        dalpha = jnp.dot(
            _to16(ge * vs), exp_t_ref[:],
            preferred_element_type=jnp.float32,
        )  # (tile_e, H): per-head sum over the d feature columns
        de = alpha * (dalpha - _cols_gather(s_dst, corr_ref[:], H))
        # leaky_relu'(x): sign(e) == sign(x) since leaky preserves sign
        dpre = de * jnp.where(e >= 0, 1.0, slope)
        aw = jnp.dot(
            _to16(alpha), exp_ref[:], preferred_element_type=jnp.float32
        )  # (tile_e, HD) per-head alpha at feature width
        dpre16 = _to16(dpre)
        dwh_ref[:] += jnp.dot(
            s_src.T, _to16(ge * aw), preferred_element_type=jnp.float32
        )
        dqs_ref[:] += jnp.dot(
            s_src.T, dpre16, preferred_element_type=jnp.float32
        )
        dqd_ref[:] += jnp.dot(
            s_dst.T, dpre16, preferred_element_type=jnp.float32
        )

    const = lambda i: (0, 0)
    dwh, dqs, dqd = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile_e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Zs, HD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zs, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Zd, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Zs, HD), jnp.float32),
            jax.ShapeDtypeStruct((Zs, H), jnp.float32),
            jax.ShapeDtypeStruct((Zd, H), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        edge_src, edge_dst, _to16(Wh.reshape(Zs, HD)), _to16(g2),
        qs_cols, qd_cols, shift_cols, corr_cols, inv_cols, expand,
        expand_t,
    )
    if qd.shape[0] == Zd:
        dqd_full = dqd
    elif qd.shape[0] > Zd:
        # qd rows beyond Zd never influence the output -> zero grads
        dqd_full = jnp.zeros_like(qd).at[:Zd].set(dqd)
    else:
        # kernel padded qd up to Zd; drop the padding rows' grads
        dqd_full = dqd[: qd.shape[0]]
    return dwh.reshape(Zs, H, d), dqs, dqd_full


def gat_edge_aggregate_multihead(Wh, qs, qd, edge_src, edge_dst,
                                 num_nodes=None,
                                 negative_slope: float = 0.2):
    """Differentiable batched-multihead sparse GAT aggregation: Pallas
    one-hot-matmul forward (one kernel for ALL heads) AND, on TPU, the
    hand-written Pallas backward (``gat_edge_backward_multihead_pallas``
    — same shared one-hot form, fed by the forward's denom/shift
    residuals); off-TPU the backward is the VJP of the XLA composition.
    Grads carry bf16 feature precision under the TPU path, f32 under
    XLA."""
    return _gat_edge_aggregate_mh_vjp(
        Wh, qs, qd, edge_src, edge_dst, num_nodes, float(negative_slope)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gat_edge_aggregate_mh_vjp(Wh, qs, qd, edge_src, edge_dst,
                               num_nodes, negative_slope):
    return gat_edge_aggregate_multihead_pallas(
        Wh, qs, qd, edge_src, edge_dst, num_nodes=num_nodes,
        negative_slope=negative_slope,
    )


def _xla_composition_mh(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                        negative_slope):
    from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

    return gat_edge_attention_multihead(
        Wh, qd, qs, edge_src, edge_dst,
        Wh.shape[0] if num_nodes is None else num_nodes,
        use_pallas=False,
    )


def _gat_agg_mh_fwd(Wh, qs, qd, edge_src, edge_dst, num_nodes,
                    negative_slope):
    out, denom, shift = gat_edge_aggregate_multihead_pallas(
        Wh, qs, qd, edge_src, edge_dst, num_nodes=num_nodes,
        negative_slope=negative_slope, return_residuals=True,
    )
    return out, (Wh, qs, qd, edge_src, edge_dst, out, denom, shift)


def _gat_agg_mh_bwd(num_nodes, negative_slope, res, g):
    Wh, qs, qd, edge_src, edge_dst, out, denom, shift = res
    if _on_tpu():
        gWh, gqs, gqd = gat_edge_backward_multihead_pallas(
            Wh, qs, qd, edge_src, edge_dst, g, out, denom, shift,
            num_nodes=num_nodes, negative_slope=negative_slope,
        )
    else:
        _, vjp = jax.vjp(
            lambda Wh, qs, qd: _xla_composition_mh(
                Wh, qs, qd, edge_src, edge_dst, num_nodes, negative_slope
            ),
            Wh, qs, qd,
        )
        gWh, gqs, gqd = vjp(g)
    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return gWh, gqs, gqd, zero_int(edge_src), zero_int(edge_dst)


_gat_edge_aggregate_mh_vjp.defvjp(_gat_agg_mh_fwd, _gat_agg_mh_bwd)


def segment_sum_pallas(values, segment_ids, num_segments, *,
                       interpret=None):
    """Pallas segment-sum: (E, D) values scattered into (num_segments, D)
    via the one-hot-matmul form. Same contract as
    ``jax.ops.segment_sum`` for int32 ids in [0, num_segments) (out-of-
    range ids are dropped, matching segment_sum's default).

    bf16 one-hot x bf16 values with f32 accumulation: sums are exact for
    values already representable in bf16, and within bf16 rounding of
    the f32 XLA path otherwise.
    """
    E, D = values.shape
    Z = num_segments
    if interpret is None:
        interpret = not _on_tpu()
    tile_e = _tile_e(Z)
    n_tiles = max(1, -(-E // tile_e))
    pad = n_tiles * tile_e - E
    seg = segment_ids.astype(jnp.int32)
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
        seg = jnp.pad(seg, (0, pad), constant_values=Z)
    # (8, tile_e) id blocks, row 0 meaningful (see _sublane_expand)
    seg = _sublane_expand(seg.reshape(n_tiles, tile_e))

    def kernel(seg_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, Z), 1)
        s = _to16(seg_ref[0, :][:, None] == col)
        out_ref[:] += jnp.dot(
            s.T, _to16(val_ref[:]), preferred_element_type=jnp.float32
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile_e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_e, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Z, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, D), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seg, values)
    return out
