"""Full RK4 step of the GAT-ODE as ONE Pallas kernel, bf16 MXU compute.

Motivation (measured, CLAUDE.md): at production dims the XLA-fused RHS runs
at ~60% of f32 MXU peak and is compute-bound; flax-level bf16 was a wash
because XLA scatters converts around every op. This kernel owns the
conversion points instead: weights are pre-converted to bf16 once per
solve, each agent tile is converted on load, all eight matmuls per stage
run bf16 x bf16 -> f32 on the MXU, and the state update accumulates in
f32. One kernel per step also keeps all four stages' intermediates in
VMEM — x is read from HBM once and written once per full RK4 step instead
of once per stage.

Matches ``GATODE.rhs`` with any num_blocks, attn_temp=1.0 (the same contract
as ops/pallas/fused_rhs.py).

Measured crossover (TPU v5e): at the default small dims (Da=32, Dz=64,
hidden=128) XLA's fusion still wins (~20%); at MXU-aligned dims (Da=128,
Dz=128, hidden=256, Z=512) this kernel is ~35% FASTER than the XLA f32
path (2539 vs 3418 us per 32k-agent RK4 step) with ~7e-4 relative
deviation. Rule of thumb: use the kernel when the contraction dims reach
the 128-lane tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Agent-tile size for the serving kernels. Swept at the bench workload
# (1M agents x 48 times x 2 substeps, Z=64, nb=2 —
# docs/evidence_round4/serve_tile_sweep.json): 2048 runs 1.185M
# agents/s vs 1.120M at 1024 (+5.8%, exact decode-id agreement; 512 and
# 4096 fail the remote compiler's memory budget). Small-N calls pad to
# one tile either way. The sweep covered Z=64 only, and the serving
# kernels set no vmem_limit override — at larger zone tables the
# (TILE, Z) attention/logit intermediates scale with the tile, so
# :func:`_serve_tile` falls back to 1024 past Z=128 (unswept ground;
# the pre-round-4 default).
TILE_N = 2048


def _serve_tile(num_zones):
    return TILE_N if num_zones <= 128 else 1024


from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu


def pack_weights_bf16(params):
    """GATODE flax params -> bf16 weight tuple for the kernels
    (any number of residual drift blocks).

    Dense_0's kernel is split by the rhs concat order
    [x, ctx, h, sin_t, cos_t] (model.py:46): only the x/ctx rows
    participate in the per-stage matmul; the h rows fold into a
    once-per-interval precompute (h is constant across RK4 stages) and
    the 2 time-feature rows fold into a per-stage (stages, H) table
    computed outside the kernel. This drops the stage matmul from
    ceil((Da+Dz+H+2)/128) MXU passes to ceil((Da+Dz)/128) — at
    production dims (32+64+128+2 -> 32+64) that is 2 passes -> 1 —
    and removes the h/t lanes from the per-stage concat copy.

    Returns (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) where ``blocks`` is
    a tuple of (Wr1, br1, Wr2, br2) per residual block (flax auto-names:
    block i uses Dense_{1+2i}/Dense_{2+2i}; the output layer is the
    last Dense)."""
    d = params["drift"]
    to = lambda x: jnp.asarray(x, jnp.bfloat16)
    Wq = params["query_proj"]["kernel"]
    Da, Dz = Wq.shape
    W1 = d["Dense_0"]["kernel"]
    Hc = W1.shape[0] - Da - Dz - 2
    n_dense = len([k for k in d if k.startswith("Dense_")])
    num_blocks = (n_dense - 2) // 2
    if num_blocks < 1:
        raise ValueError(
            "the fused Pallas kernels require num_blocks >= 1 residual "
            f"drift blocks (got a drift with {n_dense} Dense layers => "
            f"num_blocks={num_blocks}); use the XLA path for block-free "
            "drifts"
        )
    blocks = tuple(
        (to(d[f"Dense_{1 + 2 * i}"]["kernel"]),
         to(d[f"Dense_{1 + 2 * i}"]["bias"]),
         to(d[f"Dense_{2 + 2 * i}"]["kernel"]),
         to(d[f"Dense_{2 + 2 * i}"]["bias"]))
        for i in range(num_blocks)
    )
    out = d[f"Dense_{n_dense - 1}"]
    return (
        to(Wq),
        to(W1[: Da + Dz]),               # x/ctx rows: per-stage matmul
        to(W1[Da + Dz: Da + Dz + Hc]),   # h rows: per-interval precompute
        to(W1[Da + Dz + Hc:]),           # sin/cos rows: per-stage table
        to(d["Dense_0"]["bias"]),
        blocks,
        to(out["kernel"]), to(out["bias"]),
    )


def _to16(a):
    return a.astype(jnp.bfloat16)


def _nt_dot(a, b):
    """(N, I), (N, O) -> (I, O): contract the agent axis (weight grads)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stage_math(xb, hpre, tfp_row, ze, scale, wq, w1xc, blocks, w3, b3,
                cast=_to16):
    """One drift-RHS evaluation returning (k, intermediates-for-VJP).

    THE single copy of the stage math — the serving kernels below call
    it discarding the intermediates (Mosaic dead-code-eliminates the
    unused casts), and the training kernels in fused_train.py call it
    keeping them for the hand-written backward. Forward/backward
    bit-compatibility (the tested gradient cosine > 0.999) depends on
    every caller using this one definition: max-free softmax with the
    f32-overflow clamp, bf16 matmuls with f32 accumulation, the split
    Dense_0 (x/ctx rows only; h and time rows pre-folded into hpre and
    tfp_row).

    ``blocks``: tuple of (wr1, br1, wr2, br2) per residual MLP block
    (model.py AgentDrift num_blocks), applied in order:
    z <- tanh(z + W2 tanh(W1 z + b1) + b2).

    ``cast``: the activation-narrowing function applied before each
    matmul (and to the stored intermediates). Default bf16 — the
    serving/fixed-step precision class. The adaptive fused-DOPRI5
    kernels pass identity: bf16 rounding of per-stage activations acts
    as non-smooth noise that does NOT cancel in the embedded 5(4)
    error difference, noise-flooring the step controller (measured
    343 vs 8 accepted steps at rtol=1e-5 — ops/pallas/fused_dopri5.py).
    """
    q = jnp.dot(xb, wq, preferred_element_type=jnp.float32)
    scores = (
        jnp.dot(cast(q), ze.T, preferred_element_type=jnp.float32) * scale
    )
    # max-free softmax: exp(s)/sum(exp(s)) is exact (the usual max
    # subtraction cancels in the ratio); the clamp guards f32 overflow
    # for scores > 80, unreachable at trained scales. Saves a per-stage
    # lane reduction: +12% rollout throughput at 1M agents (v5e).
    p_att = jnp.exp(jnp.minimum(scores, 80.0))
    inv = 1.0 / jnp.sum(p_att, axis=-1, keepdims=True)  # (N, 1)
    # normalize AFTER the ctx matmul: the (N, 1) reciprocal-multiply on
    # the (N, Dz) product replaces a (N, Z) division — interleaved A/B
    # at 1M agents (v5e, Z=64): +0.9% rollout throughput, consistently.
    # ~0.3% of decode ids move within bf16 noise (both forms are bf16
    # roundings of the same f32 attention). ``attn`` is still produced
    # for the training VJP — Mosaic dead-code-eliminates it in the
    # serving kernels.
    ctx = jnp.dot(cast(p_att), ze, preferred_element_type=jnp.float32) * inv
    attn = p_att * inv  # f32
    feats = jnp.concatenate([xb, cast(ctx)], axis=-1)
    z = jnp.tanh(
        jnp.dot(feats, w1xc, preferred_element_type=jnp.float32)
        + hpre
        + tfp_row
    )
    # per block: (z_in bf16, rt bf16, z_out bf16) for the backward chain;
    # intermediates bf16 halve the training bwd kernel's VMEM live set
    # (4 stages held at once); tanh' recomputed from the bf16 activation
    # in f32 is ~4e-3 relative gradient noise, inside the tested budget
    block_inter = []
    for (wr1, br1, wr2, br2) in blocks:
        z_in16 = cast(z)
        rt = jnp.tanh(
            jnp.dot(z_in16, wr1, preferred_element_type=jnp.float32)
            + br1.astype(jnp.float32)
        )
        r3 = (
            jnp.dot(cast(rt), wr2, preferred_element_type=jnp.float32)
            + br2.astype(jnp.float32)
        )
        z = jnp.tanh(z + r3)
        block_inter.append((z_in16, cast(rt), cast(z)))
    k = (
        jnp.dot(cast(z), w3, preferred_element_type=jnp.float32)
        + b3.astype(jnp.float32)
    )
    return k, (cast(q), cast(attn), tuple(block_inter), feats)


def _stage_vjp_math(gk, inter, acc, tw, scale, Da, cast=_to16):
    """Hand-written VJP of ONE :func:`_stage_math` evaluation.

    THE single copy of the stage backward — the training day kernel
    (fused_train.py) chains it four times per RK4 substep inside its
    reverse sweep, and the adjoint RHS kernel (fused_rhs.py) applies it
    once per augmented-system eval. Keeping one definition is what makes
    the tested gradient agreement transfer between the two paths.

    gk: (TILE, Da) f32 cotangent of the stage output ``k``.
    inter: the intermediates tuple returned by ``_stage_math``.
    acc: running f32 accumulators
    ``(gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A)`` (blkA: per-block
    ``(gwr1, gbr1, gwr2, gbr2)``).
    tw: hoisted kernel-resident weights
    ``(ze16, zeT, wqT, w1xcT, blkT, w3T)`` with ``blkT`` a per-block
    tuple of ``(Wr1T, Wr2T)`` — callers hoist the transposes once per
    tile instead of once per stage eval.

    Returns ``(gx, gtf, acc')`` — the cotangent wrt the stage input x,
    the (1, H) cotangent of the additive time-row pre-activation, and
    the updated accumulators.
    """
    (ze16, zeT, wqT, w1xcT, blkT, w3T) = tw
    n_blocks = len(blkT)
    (q16, attn16, block_inter, feats) = inter
    (gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A) = acc
    gk16 = cast(gk)
    # k = z_out @ W3 + b3  (z_out = last block's output)
    z_out16 = block_inter[-1][2]
    gw3A += _nt_dot(z_out16, gk16)
    gb3A += jnp.sum(gk, axis=0, keepdims=True)
    gz = jnp.dot(gk16, w3T, preferred_element_type=jnp.float32)
    # residual blocks, reversed: z_out = tanh(z_in + rt @ Wr2 + b)
    blkA_new = list(blkA)
    for b in range(n_blocks - 1, -1, -1):
        z_in16, rt16, zo16 = block_inter[b]
        (gwr1A, gbr1A, gwr2A, gbr2A) = blkA[b]
        wr1T, wr2T = blkT[b]
        zo = zo16.astype(jnp.float32)
        gpre = gz * (1.0 - zo * zo)
        gp16 = cast(gpre)
        gwr2A += _nt_dot(rt16, gp16)
        gbr2A += jnp.sum(gpre, axis=0, keepdims=True)
        grt = jnp.dot(gp16, wr2T,
                      preferred_element_type=jnp.float32)
        rt = rt16.astype(jnp.float32)
        gpre2 = grt * (1.0 - rt * rt)
        gp216 = cast(gpre2)
        gwr1A += _nt_dot(z_in16, gp216)
        gbr1A += jnp.sum(gpre2, axis=0, keepdims=True)
        gz = gpre + jnp.dot(gp216, wr1T,
                            preferred_element_type=jnp.float32)
        blkA_new[b] = (gwr1A, gbr1A, gwr2A, gbr2A)
    # z1 = tanh(feats @ W1xc + hpre + tfp_row); z1 == first block's input
    z1 = block_inter[0][0].astype(jnp.float32)
    gpre1 = gz * (1.0 - z1 * z1)
    gp116 = cast(gpre1)
    gw1A += _nt_dot(feats, gp116)
    ghpA += gpre1
    gtf = jnp.sum(gpre1, axis=0, keepdims=True)  # (1, H)
    gfeats = jnp.dot(gp116, w1xcT,
                     preferred_element_type=jnp.float32)
    gxb = gfeats[:, :Da]
    gctx = gfeats[:, Da:]
    gctx16 = cast(gctx)
    # ctx = attn @ ze
    gzeA += _nt_dot(attn16, gctx16)
    gattn = jnp.dot(gctx16, zeT,
                    preferred_element_type=jnp.float32)
    # softmax vjp (the max-free form has the same jacobian)
    attn = attn16.astype(jnp.float32)
    ds = attn * (
        gattn - jnp.sum(attn * gattn, axis=-1, keepdims=True)
    ) * scale
    ds16 = cast(ds)
    # scores = (q @ ze.T) * scale
    gq = jnp.dot(ds16, ze16, preferred_element_type=jnp.float32)
    gzeA += _nt_dot(ds16, q16)
    # q = xb @ Wq
    gq16 = cast(gq)
    gwqA += _nt_dot(feats[:, :Da], gq16)
    gx = gxb + jnp.dot(gq16, wqT,
                       preferred_element_type=jnp.float32)
    acc = (gzeA, gwqA, gw1A, ghpA, tuple(blkA_new), gw3A, gb3A)
    return gx, gtf, acc


def _time_feature_table(stage_t, W1t_bf16, b1_bf16):
    """(stages,) stage times -> (stages, H) f32 additive pre-activations:
    the sin/cos rows of Dense_0 plus its bias, evaluated per stage."""
    ang = stage_t * (2 * np.pi / 24.0)
    tfeat = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (stages, 2)
    return (
        jnp.dot(tfeat.astype(jnp.float32), W1t_bf16.astype(jnp.float32))
        + b1_bf16.astype(jnp.float32)[None, :]
    )


def rk4_step_fused(
    x, h, zone_emb_bf16, weights_bf16, t0, dt, *, interpret=None
):
    """One RK4 step x(t0) -> x(t0 + dt) for the GAT-ODE drift.

    x: (N, Da) f32; h: (N, H) f32; zone_emb_bf16: (Z, Dz) bf16;
    weights_bf16: tuple from :func:`pack_weights_bf16`; t0, dt: scalars.
    Returns (N, Da) f32.
    """
    N, Da = x.shape
    Z, Dz = zone_emb_bf16.shape
    H = h.shape[1]
    (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = weights_bf16
    n_blocks = len(blocks)
    flat_blocks = [w for blk in blocks for w in blk]
    if interpret is None:
        interpret = not _on_tpu()
    tile = _serve_tile(Z)

    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))

    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    # RK4 stage times -> (4, H) additive Dense_0 pre-activations
    # (sin/cos rows + bias), precomputed outside the kernel per step
    stage_t = jnp.stack([t0, t0 + dt / 2, t0 + dt / 2, t0 + dt])
    tf_pre = _time_feature_table(stage_t, W1t, b1)  # (4, H) f32
    dt32 = jnp.asarray(dt, jnp.float32)

    def kernel(x_ref, h_ref, ze_ref, tfp_ref, dt_ref,
               wq_ref, w1xc_ref, w1h_ref, *rest):
        blk_refs = rest[: 4 * n_blocks]
        w3_ref, b3_ref, out_ref = rest[4 * n_blocks:]
        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        x0 = x_ref[:]  # (TILE_N, Da) f32
        hb = h_ref[:].astype(jnp.bfloat16)
        ze = ze_ref[:]  # bf16
        step = dt_ref[0]
        # h is constant across the four stages: its Dense_0 contribution
        # is one matmul per step instead of one per stage
        h_pre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)

        def rhs(xs, stage):
            k, _ = _stage_math(
                xs.astype(jnp.bfloat16), h_pre, tfp_ref[stage][None, :],
                ze, scale, wq_ref[:], w1xc_ref[:], blk, w3_ref[:],
                b3_ref[:],
            )
            return k

        k1 = rhs(x0, 0)
        k2 = rhs(x0 + (step * 0.5) * k1, 1)
        k3 = rhs(x0 + (step * 0.5) * k2, 2)
        k4 = rhs(x0 + step * k3, 3)
        out_ref[:] = x0 + (step / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def rep(arr):
        shape = arr.shape
        if len(shape) == 1:
            return pl.BlockSpec(shape, lambda i: (0,), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, Da), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep(zone_emb_bf16),
            rep(tf_pre),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            rep(Wq), rep(W1xc), rep(W1h),
            *[rep(w) for w in flat_blocks],
            rep(W3), rep(b3),
        ],
        out_specs=pl.BlockSpec(
            (tile, Da), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, Da), jnp.float32),
        interpret=interpret,
    )(
        x, h, zone_emb_bf16, tf_pre, dt32[None],
        Wq, W1xc, W1h, *flat_blocks, W3, b3,
    )
    return out[:N]


def rk4_interval_decode_fused(
    x, h, zone_emb_bf16, weights_bf16, wd_bf16, t0, dt_sub, substeps,
    *, interpret=None
):
    """One OUTPUT interval of the decoded rollout as a single kernel:
    ``substeps`` RK4 steps then decode+argmax, emitting (x_new, ids).

    vs. the per-step kernel + XLA decode, the agent state is read from
    HBM once and written once per interval (instead of once per substep
    plus again for the decode), and the (N, Z) logits tensor is never
    materialized — the argmax happens on the (TILE_N, Z) tile in VMEM.

    x: (N, Da) f32; h: (N, H) f32; zone_emb_bf16: (Z, Dz); weights_bf16:
    tuple from :func:`pack_weights_bf16`; wd_bf16: (Da, Dz) decode
    projection; t0: interval start; dt_sub: sub-step size. Returns
    (x_new (N, Da) f32, ids (N,) int32).
    """
    N, Da = x.shape
    Z, Dz = zone_emb_bf16.shape
    H = h.shape[1]
    (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = weights_bf16
    n_blocks = len(blocks)
    flat_blocks = [w for blk in blocks for w in blk]
    if interpret is None:
        interpret = not _on_tpu()
    tile = _serve_tile(Z)

    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))

    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    # stage times for every substep -> (substeps * 4, H) additive
    # Dense_0 pre-activations (sin/cos rows + bias)
    sub_starts = t0 + dt_sub * jnp.arange(substeps)
    offs = jnp.asarray([0.0, 0.5, 0.5, 1.0]) * dt_sub
    stage_t = (sub_starts[:, None] + offs[None, :]).reshape(-1)
    tf_pre = _time_feature_table(stage_t, W1t, b1)  # (substeps*4, H) f32
    dt32 = jnp.asarray(dt_sub, jnp.float32)

    def kernel(x_ref, h_ref, ze_ref, tfp_ref, dt_ref,
               wq_ref, w1xc_ref, w1h_ref, *rest):
        blk_refs = rest[: 4 * n_blocks]
        w3_ref, b3_ref, wd_ref, xout_ref, ids_ref = rest[4 * n_blocks:]
        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        xs = x_ref[:]
        hb = h_ref[:].astype(jnp.bfloat16)
        ze = ze_ref[:]
        step = dt_ref[0]
        # h is constant across the whole interval: one Dense_0
        # contribution for all substeps * 4 stages
        h_pre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)

        def rhs(xc, stage):
            k, _ = _stage_math(
                xc.astype(jnp.bfloat16), h_pre, tfp_ref[stage][None, :],
                ze, scale, wq_ref[:], w1xc_ref[:], blk, w3_ref[:],
                b3_ref[:],
            )
            return k

        for s in range(substeps):
            k1 = rhs(xs, 4 * s + 0)
            k2 = rhs(xs + (step * 0.5) * k1, 4 * s + 1)
            k3 = rhs(xs + (step * 0.5) * k2, 4 * s + 2)
            k4 = rhs(xs + step * k3, 4 * s + 3)
            xs = xs + (step / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        xout_ref[:] = xs
        d = jnp.dot(
            xs.astype(jnp.bfloat16), wd_ref[:],
            preferred_element_type=jnp.float32,
        )
        logits = jnp.dot(
            d.astype(jnp.bfloat16), ze.T, preferred_element_type=jnp.float32
        )
        # hand-rolled argmax (first max index): Mosaic can't lower
        # jnp.argmax's f32->i32 materialization over the lane axis
        mx = jnp.max(logits, axis=-1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        z_count = jnp.int32(logits.shape[-1])
        ids_ref[:] = jnp.min(
            jnp.where(logits >= mx, col, z_count), axis=-1
        )

    def rep(arr):
        shape = arr.shape
        if len(shape) == 1:
            return pl.BlockSpec(shape, lambda i: (0,), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    x_new, ids = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, Da), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep(zone_emb_bf16),
            rep(tf_pre),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            rep(Wq), rep(W1xc), rep(W1h),
            *[rep(w) for w in flat_blocks],
            rep(W3), rep(b3), rep(wd_bf16),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, Da), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile, Da), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile,), jnp.int32),
        ],
        interpret=interpret,
    )(
        x, h, zone_emb_bf16, tf_pre, dt32[None],
        Wq, W1xc, W1h, *flat_blocks, W3, b3, wd_bf16,
    )
    return x_new[:N], ids[:N]


def make_pallas_rollout(model, zone_feats, adj, times, substeps=2, mesh=None,
                        fuse_decode=False):
    """Jitted decoded rollout driven by the fused bf16 RK4 step kernel.

    Returns ``rollout(params, person_feats, home_zone_ids) -> (N, T) int32``.
    Params are explicit call arguments — never baked into the compiled
    program — so one compiled rollout serves any checkpoint and updated
    params take effect immediately (weight packing + zone encode happen
    inside the jit; their cost is amortized over the T-step scan).

    With ``mesh``, the whole rollout body runs under ``shard_map`` over the
    ``agents`` axis (params / zone embeddings / packed weights replicated,
    agent arrays sharded), so the Pallas serving path composes with the
    multi-chip mesh instead of falling back to the slower XLA program.

    ``fuse_decode``: use :func:`rk4_interval_decode_fused` — substeps and
    the decode/argmax of each output interval in ONE kernel (one HBM
    round-trip of the agent state per interval, no (N, Z) logits
    materialization).

    The zone graph rides as an explicit jit argument, never a closure
    capture (CLAUDE.md no-closure rule): a captured dense adjacency
    becomes a program constant, and at Z=8192 the 268 MB serialized
    program overflows the remote-compile tunnel (HTTP 413 — measured in
    the round-5 serving ladder). Same arrays every call -> jit cache
    hit, no retrace.
    """

    def body(params, person_feats, home_zone_ids, graph):
        zone_feats, adj, times = graph
        zone_emb = model.apply(
            {"params": params}, zone_feats, adj, method=model.encode_zones
        )
        ze_bf16 = zone_emb.astype(jnp.bfloat16)
        weights = pack_weights_bf16(params)
        x0, h = model.apply(
            {"params": params}, person_feats, home_zone_ids, zone_emb,
            method=model.initial_state,
        )

        wd_bf16 = params["decode_proj"]["kernel"].astype(jnp.bfloat16)

        def decode_ids(x):
            # SAME bf16 decode math as the in-kernel decode of
            # rk4_interval_decode_fused (bf16 matmuls, f32 accumulation),
            # so the per-step and interval-fused paths emit identical ids
            # at any num_blocks — both are bf16 serving paths and must be
            # interchangeable.
            d = jnp.dot(
                x.astype(jnp.bfloat16), wd_bf16,
                preferred_element_type=jnp.float32,
            )
            logits = jnp.dot(
                d.astype(jnp.bfloat16), ze_bf16.T,
                preferred_element_type=jnp.float32,
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        if fuse_decode:
            def interval(x, t0t1):
                t0, t1 = t0t1
                x, ids = rk4_interval_decode_fused(
                    x, h, ze_bf16, weights, wd_bf16,
                    t0, (t1 - t0) / substeps, substeps,
                )
                return x, ids
        else:
            def interval(x, t0t1):
                t0, t1 = t0t1
                dt = (t1 - t0) / substeps

                def sub(i, x):
                    return rk4_step_fused(
                        x, h, ze_bf16, weights, t0 + i * dt, dt
                    )

                x = jax.lax.fori_loop(0, substeps, sub, x)
                return x, decode_ids(x)

        y0 = decode_ids(x0)
        _, tail = jax.lax.scan(interval, x0, (times[:-1], times[1:]))
        ids = jnp.concatenate([y0[None], tail], axis=0)
        return jnp.swapaxes(ids, 0, 1)

    graph = (zone_feats, adj, times)

    if mesh is None:
        jitted = jax.jit(body)

        def rollout(params, person_feats, home_zone_ids):
            return jitted(params, person_feats, home_zone_ids, graph)

        return rollout

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(AGENT_AXIS), P(AGENT_AXIS), P()),
        out_specs=P(AGENT_AXIS),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    ag = NamedSharding(mesh, P(AGENT_AXIS))
    jitted_sh = jax.jit(
        sharded, in_shardings=(rep, ag, ag, rep), out_shardings=ag
    )

    def rollout_sh(params, person_feats, home_zone_ids):
        return jitted_sh(params, person_feats, home_zone_ids, graph)

    return rollout_sh
