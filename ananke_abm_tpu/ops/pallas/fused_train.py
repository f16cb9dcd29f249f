"""Training-path GAT-ODE day rollout as two Pallas kernels (fwd + VJP bwd).

Why: at BASELINE config-4 dims (32k agents x 500 zones, T=12, substeps=2)
the XLA train step spends ~23 ms in the forward integrate and ~67 ms in
the remat backward, while the serving-style fused forward kernel covers
the same integration in ~10 ms (measured v5e). This module gives training
the same treatment: ONE forward kernel integrates the whole day per agent
tile (writing every substep carry to HBM as the residual), and ONE
backward kernel sweeps the day in reverse — recomputing each RK4 stage's
intermediates in VMEM from the stashed carries, chaining hand-written
VJPs of the attention + drift MLP, and accumulating weight / zone-
embedding / time-table gradients across agent tiles via the sequential
TPU grid (constant-index output blocks). The pair is wrapped in
``jax.custom_vjp`` so the zone encoder, decode head, loss, and optimizer
stay ordinary XLA.

All matmuls (forward, recompute, and gradient) run bf16 x bf16 -> f32 on
the MXU; accumulators are f32. Gradients agree with the f32 XLA path to
cosine > 0.999 (tested), standard bf16-training accuracy.

Reference parity: training counterpart of the serving kernels in
fused_step.py; the reference trains the same architecture through torch
autograd (reference gnn_embed model.py / train.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ops.pallas.fused_step import (
    _nt_dot,
    _on_tpu,
    _stage_math,
    _stage_vjp_math,
    _to16,
)

# Tile sizes swept on v5e at config-4 dims (32k x 500): fwd 512->1024
# is -6% step time; bwd 256->1024 is -22% (fewer per-tile fixed costs:
# accumulator zero/add passes, transposed weight copies, fori_loop
# bookkeeping — and K=1024 TN-form weight-grad matmuls). 2048 exceeds
# VMEM at these dims. Non-powers-of-two (640/768) measured slower.
FWD_TILE_N = 1024  # fwd kernel holds one stage at a time
BWD_TILE_N = 1024  # bwd kernel holds all 4 stages' intermediates (bf16)


def split_w1(W1, Da, Dz):
    """Full Dense_0 kernel -> (x/ctx rows, h rows, time rows)."""
    Hc = W1.shape[0] - Da - Dz - 2
    return W1[: Da + Dz], W1[Da + Dz: Da + Dz + Hc], W1[Da + Dz + Hc:]


def _stage_times_table(times, substeps, W1t, b1):
    """(T,) output times -> per-substep dts and the differentiable
    (n_steps, 4, H) Dense_0 time-feature pre-activation table."""
    dt_int = (times[1:] - times[:-1]) / substeps  # (T-1,)
    dts = jnp.repeat(dt_int, substeps)  # (n_steps,)
    sub_starts = (
        times[:-1, None] + dt_int[:, None] * jnp.arange(substeps)[None, :]
    ).reshape(-1)  # (n_steps,)
    offs = jnp.stack(
        [jnp.zeros_like(dts), 0.5 * dts, 0.5 * dts, dts], axis=-1
    )  # (n_steps, 4)
    stage_t = sub_starts[:, None] + offs  # (n_steps, 4)
    ang = stage_t * (2 * np.pi / 24.0)
    tfeat = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (ns, 4, 2)
    tf_pre = (
        jnp.einsum("sct,th->sch", tfeat.astype(jnp.float32),
                   W1t.astype(jnp.float32))
        + b1.astype(jnp.float32)[None, None, :]
    )
    return dts.astype(jnp.float32), tf_pre


def rk4_day_rollout(x0, h, zone_emb, W1_full, b1, Wq, blocks, W3, b3,
                    times, *, substeps: int, interpret=None):
    """Differentiable full-day RK4 rollout via the fused train kernels.

    x0: (N, Da) f32; h: (N, Hc) f32; zone_emb: (Z, Dz) f32;
    W1_full: (Da+Dz+Hc+2, H) Dense_0 kernel in the rhs concat row order
    [x, ctx, h, sin_t, cos_t] (gnn_embed/model.py:46); ``blocks``: tuple
    of (Wr1, br1, Wr2, br2) per residual drift block; times: (T,).
    Returns xs (T, N, Da) f32 at the output times (row 0 == x0), with
    gradients wrt every array argument via the hand-written VJP kernels —
    EXCEPT ``times``: the time grid is treated as fixed data
    (stop_gradient below). The VJP kernels do not propagate the direct
    dt-dependence of the RK4 update, so rather than return a silently
    partial gradient (sin/cos feature path only), times are explicitly
    non-differentiable.
    """
    times = jax.lax.stop_gradient(times)
    Da = x0.shape[1]
    Dz = zone_emb.shape[1]
    W1xc, W1h, W1t = split_w1(W1_full, Da, Dz)
    dts, tf_pre = _stage_times_table(times, substeps, W1t, b1)
    if interpret is None:
        interpret = not _on_tpu()
    xs_all = _day_core(
        x0, h, zone_emb, Wq, W1xc, W1h, tf_pre, tuple(blocks), W3, b3,
        dts, interpret,
    )
    return xs_all[::substeps]  # (T, N, Da)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _day_core(x0, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts,
              interpret):
    return _day_fwd_impl(
        x0, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts, interpret,
    )


def _day_core_fwd(x0, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts,
                  interpret):
    xs_all = _day_fwd_impl(
        x0, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts, interpret,
    )
    res = (xs_all, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts)
    return xs_all, res


def _day_core_bwd(interpret, res, g_xs):
    (xs_all, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts) = res
    grads = _day_bwd_impl(
        xs_all, g_xs, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts,
        interpret,
    )
    return grads + (jnp.zeros_like(dts),)


_day_core.defvjp(_day_core_fwd, _day_core_bwd)


from ananke_abm_tpu.ops.pallas.tiling import (  # noqa: E402
    pad_tile as _pad_tiles,
    rep_spec as _rep,
)


def _day_fwd_impl(x0, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3, b3, dts,
                  interpret):
    """Forward kernel: in-kernel loop over all substeps, stash carries."""
    N, Da = x0.shape
    Z, Dz = ze.shape
    Hc = h.shape[1]
    n_steps = dts.shape[0]
    n_blocks = len(blocks)
    flat_blocks = [_to16(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))

    xp, n_tiles = _pad_tiles(x0, FWD_TILE_N)
    hp, _ = _pad_tiles(h, FWD_TILE_N)
    Np = n_tiles * FWD_TILE_N

    def kernel(x_ref, h_ref, ze_ref, tfp_ref, dts_ref,
               wq_ref, w1xc_ref, w1h_ref, *rest):
        blk_refs = rest[: 4 * n_blocks]
        w3_ref, b3_ref, xs_ref = rest[4 * n_blocks:]
        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        hb = _to16(h_ref[:])
        ze16 = ze_ref[:]
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)
        xs_ref[0] = x_ref[:]

        def step(s, x):
            dt = dts_ref[s]
            tfp = tfp_ref[s]  # (4, H) f32

            def rhs(xc, row):
                k, _ = _stage_math(
                    _to16(xc), hpre, tfp[row][None, :], ze16, scale,
                    wq_ref[:], w1xc_ref[:], blk, w3_ref[:], b3_ref[:],
                )
                return k

            k1 = rhs(x, 0)
            k2 = rhs(x + (dt * 0.5) * k1, 1)
            k3 = rhs(x + (dt * 0.5) * k2, 2)
            k4 = rhs(x + dt * k3, 3)
            x = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            xs_ref[s + 1] = x
            return x

        jax.lax.fori_loop(0, n_steps, step, x_ref[:])

    xs_all = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((FWD_TILE_N, Da), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FWD_TILE_N, Hc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _rep((Z, Dz)), _rep((n_steps, 4, tf_pre.shape[-1])),
            pl.BlockSpec((n_steps,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=pl.BlockSpec(
            (n_steps + 1, FWD_TILE_N, Da), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_steps + 1, Np, Da), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # one stage's f32 attention intermediates at TILE=1024 x Z
            # already clear the 16MB scoped default
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        xp, hp, _to16(ze), tf_pre, dts,
        _to16(Wq), _to16(W1xc), _to16(W1h), *flat_blocks,
        _to16(W3), _to16(b3),
    )
    return xs_all[:, :N]


def _day_bwd_impl(xs_all, g_xs, h, ze, Wq, W1xc, W1h, tf_pre, blocks, W3,
                  b3, dts, interpret):
    """Backward kernel: reverse sweep with in-VMEM grad accumulation.

    Weight/zone-emb/time-table grads use constant-index output blocks:
    the sequential TPU grid keeps them VMEM-resident across agent tiles,
    so cross-tile accumulation is a read-modify-write, not an HBM pass.
    """
    n_steps_p1, N, Da = xs_all.shape
    n_steps = n_steps_p1 - 1
    Z, Dz = ze.shape
    Hc = h.shape[1]
    H = W1xc.shape[1]
    n_blocks = len(blocks)
    flat_blocks = [_to16(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))

    n_tiles = -(-N // BWD_TILE_N)
    pad = n_tiles * BWD_TILE_N - N
    # pad the agent axis in place — no transposed copies of the (steps,
    # N, Da) residual (they doubled peak HBM at large N)
    xsp = jnp.pad(xs_all, ((0, 0), (0, pad), (0, 0))) if pad else xs_all
    gxsp = jnp.pad(g_xs, ((0, 0), (0, pad), (0, 0))) if pad else g_xs
    hp, _ = _pad_tiles(h, BWD_TILE_N)
    Np = n_tiles * BWD_TILE_N

    def kernel(*refs):
        (xs_ref, gxs_ref, h_ref, ze_ref, tfp_ref, dts_ref,
         wq_ref, w1xc_ref, w1h_ref) = refs[:9]
        blk_refs = refs[9: 9 + 4 * n_blocks]
        (w3_ref, b3_ref,
         gx0_ref, gh_ref, gze_ref, gwq_ref, gw1xc_ref, gw1h_ref,
         gtfp_ref) = refs[9 + 4 * n_blocks: 18 + 4 * n_blocks]
        gblk_refs = refs[18 + 4 * n_blocks: 18 + 8 * n_blocks]
        gw3_ref, gb3_ref = refs[18 + 8 * n_blocks:]

        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        hb = _to16(h_ref[:])
        ze16 = ze_ref[:]
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)
        wq16, w1xc16, w316 = wq_ref[:], w1xc_ref[:], w3_ref[:]
        # transposed copies hoisted out of the 4 * n_steps stage VJPs
        wqT = wq16.T
        w1xcT = w1xc16.T
        w3T = w316.T
        zeT = ze16.T
        blkT = tuple((b[0].T, b[2].T) for b in blk)  # (Wr1T, Wr2T)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in ((gze_ref, gwq_ref, gw1xc_ref, gw1h_ref, gtfp_ref,
                       gw3_ref, gb3_ref) + tuple(gblk_refs)):
                r[:] = jnp.zeros_like(r)

        # the ONE copy of the stage backward (fused_step._stage_vjp_math,
        # shared with the adjoint RHS kernel in fused_rhs.py) with this
        # tile's hoisted transposed weights bound
        tw = (ze16, zeT, wqT, w1xcT, blkT, w3T)

        def stage_vjp(gk, inter, acc):
            return _stage_vjp_math(gk, inter, acc, tw, scale, Da)

        def rhs_full(xc, tfp_row):
            return _stage_math(
                _to16(xc), hpre, tfp_row, ze16, scale, wq16, w1xc16, blk,
                w316, b3_ref[:],
            )

        acc0 = (
            jnp.zeros((Z, Dz), jnp.float32),
            jnp.zeros((Da, Dz), jnp.float32),
            jnp.zeros((Da + Dz, H), jnp.float32),
            jnp.zeros((BWD_TILE_N, H), jnp.float32),
            tuple(
                (jnp.zeros((H, H), jnp.float32),
                 jnp.zeros((1, H), jnp.float32),
                 jnp.zeros((H, H), jnp.float32),
                 jnp.zeros((1, H), jnp.float32))
                for _ in range(n_blocks)
            ),
            jnp.zeros((H, Da), jnp.float32),
            jnp.zeros((1, Da), jnp.float32),
        )

        def rev_step(i, state):
            g_carry, acc = state
            s = n_steps - 1 - i
            dt = dts_ref[s]
            x = xs_ref[s]
            tfp = tfp_ref[s]  # (4, H)
            g = g_carry + gxs_ref[s + 1]
            # recompute the four stages (+ intermediates), forward order
            k1, i1 = rhs_full(x, tfp[0][None, :])
            k2, i2 = rhs_full(x + (dt * 0.5) * k1, tfp[1][None, :])
            k3, i3 = rhs_full(x + (dt * 0.5) * k2, tfp[2][None, :])
            _, i4 = rhs_full(x + dt * k3, tfp[3][None, :])

            # backward chain: stage 4 first
            gk4 = (dt / 6.0) * g
            gx4, gtf3, acc = stage_vjp(gk4, i4, acc)
            gk3 = (dt / 3.0) * g + dt * gx4
            gx3, gtf2, acc = stage_vjp(gk3, i3, acc)
            gk2 = (dt / 3.0) * g + (dt * 0.5) * gx3
            gx2, gtf1, acc = stage_vjp(gk2, i2, acc)
            gk1 = (dt / 6.0) * g + (dt * 0.5) * gx2
            gx1, gtf0, acc = stage_vjp(gk1, i1, acc)

            gtfp_ref[s] += jnp.concatenate(
                [gtf0, gtf1, gtf2, gtf3], axis=0
            )  # (4, H)
            g_next = g + gx1 + gx2 + gx3 + gx4
            return g_next, acc

        g_final, acc = jax.lax.fori_loop(
            0, n_steps, rev_step,
            (jnp.zeros((BWD_TILE_N, Da), jnp.float32), acc0),
        )
        (gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A) = acc

        gx0_ref[:] = g_final
        # hpre = hb @ W1h : gh is per-tile, gW1h accumulates across tiles
        gh_ref[:] = jnp.dot(_to16(ghpA), w1h_ref[:].T,
                            preferred_element_type=jnp.float32)
        gze_ref[:] += gzeA
        gwq_ref[:] += gwqA
        gw1xc_ref[:] += gw1A
        gw1h_ref[:] += _nt_dot(hb, _to16(ghpA))
        for b in range(n_blocks):
            for j in range(4):
                gblk_refs[4 * b + j][:] += blkA[b][j]
        gw3_ref[:] += gw3A
        gb3_ref[:] += gb3A

    def tile_spec(d):
        return pl.BlockSpec((BWD_TILE_N, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    steps_spec = pl.BlockSpec(
        (n_steps + 1, BWD_TILE_N, Da), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    blk_grad_shapes = []
    for _ in range(n_blocks):
        blk_grad_shapes += [(H, H), (1, H), (H, H), (1, H)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            steps_spec, steps_spec,
            tile_spec(Hc),
            _rep((Z, Dz)), _rep((n_steps, 4, H)),
            pl.BlockSpec((n_steps,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=[
            tile_spec(Da), tile_spec(Hc),
            _rep((Z, Dz)), _rep((Da, Dz)), _rep((Da + Dz, H)),
            _rep((Hc, H)), _rep((n_steps, 4, H)),
            *[_rep(s) for s in blk_grad_shapes],
            _rep((H, Da)), _rep((1, Da)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Hc), jnp.float32),
            jax.ShapeDtypeStruct((Z, Dz), jnp.float32),
            jax.ShapeDtypeStruct((Da, Dz), jnp.float32),
            jax.ShapeDtypeStruct((Da + Dz, H), jnp.float32),
            jax.ShapeDtypeStruct((Hc, H), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 4, H), jnp.float32),
            *[jax.ShapeDtypeStruct(s, jnp.float32)
              for s in blk_grad_shapes],
            jax.ShapeDtypeStruct((H, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the reverse sweep holds 4 stages' intermediates + the grad
            # accumulators: past XLA's 16M default scoped window but well
            # inside physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        xsp, gxsp, hp, _to16(ze), tf_pre, dts,
        _to16(Wq), _to16(W1xc), _to16(W1h), *flat_blocks,
        _to16(W3), _to16(b3),
    )
    gx0p, ghp_, gze, gWq, gW1xc, gW1h, gtfp = outs[:7]
    flat_gblk = outs[7: 7 + 4 * n_blocks]
    gW3, gb3 = outs[7 + 4 * n_blocks:]
    gblocks = tuple(
        (flat_gblk[4 * i], flat_gblk[4 * i + 1][0],
         flat_gblk[4 * i + 2], flat_gblk[4 * i + 3][0])
        for i in range(n_blocks)
    )
    gx0 = gx0p[:N] + g_xs[0]  # x0 is also returned directly as row 0
    gh = ghp_[:N]
    return (gx0, gh, gze, gWq, gW1xc, gW1h, gtfp, gblocks, gW3, gb3[0])


# ---------------------------------------------------------------------------
# Fused decode + cross-entropy head (training loss).
#
# The XLA path materializes the (N, T, Z) logits tensor in HBM (786 MB at
# config-4 dims) just to reduce it to a scalar loss. These kernels compute
# per-row NLL and its backward tile-by-tile in VMEM — logits never leave
# the chip. Rows are the flattened (agent, time) axis.
# ---------------------------------------------------------------------------

CE_TILE_M = 2048  # swept on v5e: 2048 is ~13% faster than 1024; 4096 exceeds VMEM


def decode_ce(xs_rows, targets, Wd, ze, *, interpret=None):
    """Per-row softmax cross-entropy of the decode head.

    xs_rows: (M, Da) f32 flattened agent-time states; targets: (M,) int32;
    Wd: (Da, Dz) decode projection; ze: (Z, Dz) zone embeddings.
    Returns (nll (M,) f32, correct (M,) int32), differentiable wrt
    xs_rows / Wd / ze via the hand-written VJP kernel (logits recomputed
    tile-wise in the backward, never materialized in HBM).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _ce_core(xs_rows, targets, Wd, ze, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ce_core(xs_rows, targets, Wd, ze, interpret):
    nll, correct = _ce_fwd_impl(xs_rows, targets, Wd, ze, interpret)
    return nll, correct


def _ce_core_fwd(xs_rows, targets, Wd, ze, interpret):
    out = _ce_fwd_impl(xs_rows, targets, Wd, ze, interpret)
    return out, (xs_rows, targets, Wd, ze)


def _ce_core_bwd(interpret, res, g):
    g_nll, _ = g  # `correct` is integer-valued: no gradient
    xs_rows, targets, Wd, ze = res
    gxs, gWd, gze = _ce_bwd_impl(
        xs_rows, targets, Wd, ze, g_nll, interpret
    )
    return gxs, None, gWd, gze


_ce_core.defvjp(_ce_core_fwd, _ce_core_bwd)


def _ce_fwd_impl(xs_rows, targets, Wd, ze, interpret):
    M, Da = xs_rows.shape
    Z, Dz = ze.shape
    xp, n_tiles = _pad_tiles(xs_rows, CE_TILE_M)
    tp, _ = _pad_tiles(targets, CE_TILE_M)
    Mp = n_tiles * CE_TILE_M

    def kernel(x_ref, t_ref, wd_ref, ze_ref, nll_ref, corr_ref):
        xb = _to16(x_ref[:])
        d = jnp.dot(xb, wd_ref[:], preferred_element_type=jnp.float32)
        logits = jnp.dot(_to16(d), ze_ref[:].T,
                         preferred_element_type=jnp.float32)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - mx)
        logZ = jnp.log(jnp.sum(ex, axis=-1)) + mx[:, 0]
        tgt = t_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        onehot = (col == tgt[:, None])
        l_tgt = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
        nll_ref[:] = logZ - l_tgt
        ids = jnp.min(jnp.where(logits >= mx, col, jnp.int32(Z)), axis=-1)
        corr_ref[:] = (ids == tgt).astype(jnp.int32)

    nll, correct = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((CE_TILE_M, Da), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CE_TILE_M,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            _rep(Wd.shape), _rep((Z, Dz)),
        ],
        out_specs=[
            pl.BlockSpec((CE_TILE_M,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CE_TILE_M,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp,), jnp.float32),
            jax.ShapeDtypeStruct((Mp,), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, tp, _to16(Wd), _to16(ze))
    return nll[:M], correct[:M]


def _ce_bwd_impl(xs_rows, targets, Wd, ze, g_nll, interpret):
    M, Da = xs_rows.shape
    Z, Dz = ze.shape
    xp, n_tiles = _pad_tiles(xs_rows, CE_TILE_M)
    tp, _ = _pad_tiles(targets, CE_TILE_M)
    gp, _ = _pad_tiles(g_nll, CE_TILE_M)  # padded rows: zero upstream grad
    Mp = n_tiles * CE_TILE_M

    def kernel(x_ref, t_ref, g_ref, wd_ref, ze_ref,
               gx_ref, gwd_ref, gze_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            gwd_ref[:] = jnp.zeros_like(gwd_ref)
            gze_ref[:] = jnp.zeros_like(gze_ref)

        xb = _to16(x_ref[:])
        wd16 = wd_ref[:]
        ze16 = ze_ref[:]
        d = jnp.dot(xb, wd16, preferred_element_type=jnp.float32)
        d16 = _to16(d)
        logits = jnp.dot(d16, ze16.T, preferred_element_type=jnp.float32)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - mx)
        p = ex / jnp.sum(ex, axis=-1, keepdims=True)
        tgt = t_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        onehot = (col == tgt[:, None]).astype(jnp.float32)
        grow = (p - onehot) * g_ref[:][:, None]  # dL/dlogits
        grow16 = _to16(grow)
        # logits = d @ ze.T
        gd = jnp.dot(grow16, ze16, preferred_element_type=jnp.float32)
        gze_ref[:] += _nt_dot(grow16, d16)
        # d = xs @ Wd
        gd16 = _to16(gd)
        gx_ref[:] = jnp.dot(gd16, wd16.T,
                            preferred_element_type=jnp.float32)
        gwd_ref[:] += _nt_dot(xb, gd16)

    gxs, gWd, gze = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((CE_TILE_M, Da), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CE_TILE_M,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CE_TILE_M,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            _rep(Wd.shape), _rep((Z, Dz)),
        ],
        out_specs=[
            pl.BlockSpec((CE_TILE_M, Da), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _rep(Wd.shape), _rep((Z, Dz)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Da), jnp.float32),
            jax.ShapeDtypeStruct(Wd.shape, jnp.float32),
            jax.ShapeDtypeStruct((Z, Dz), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, tp, gp, _to16(Wd), _to16(ze))
    return gxs[:M], gWd, gze
