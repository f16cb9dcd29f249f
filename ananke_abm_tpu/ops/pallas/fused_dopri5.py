"""Fused DOPRI5 step kernels for the adaptive/adjoint training path.

The adaptive trainer (BASELINE config 3: dopri5 + adjoint gradients,
reference torchdiffeq usage at
src/ananke_abm/models/latent_ode/architecture/ode_components.py:29-50)
previously evaluated the drift once per XLA launch — six launches per
attempted step, each reloading every weight and round-tripping all
(N, *) intermediates through HBM. Measured at config-3 scale (98k
agents, Z=64) that put the forward solve at 1.22 ms/eval while the
fused *joint* backward kernel ran ~3x the FLOPs in far less
(docs/evidence_round4/config3_fused.json): the forward is
launch/HBM-bound, not FLOP-bound.

:func:`dopri5_step_fused` executes ONE whole Dormand-Prince 5(4) step —
all six stage evaluations, the 5th-order update, the embedded error
vector, and the dense-output ``r5`` coefficient — in a single Pallas
kernel. Weights and the zone table load into VMEM once per tile per
STEP (not per stage), the FSAL ``k1`` arrives as an input, and the ks
never touch HBM. The step-size controller (accept/reject, dense output,
NaN poisoning, stats) stays the one tested copy in ``ode/dopri5.py`` —
this kernel plugs into its ``step_impl`` hook.

:func:`dopri5_step_vjp_fused` is the backward twin for the discrete
adjoint (``ode/discrete_adjoint.py``): it re-evaluates the six stages
keeping every intermediate in VMEM, then reverse-chains the shared
stage backward (`fused_step._stage_vjp_math`) through the tableau,
producing cotangents for the step inputs and accumulated weight/zone
gradients — one launch per accepted step instead of a separate
adaptive solve of the augmented system.

Stage math / stage backward are the ONE shared copy in
``fused_step.py``, so gradient agreement transfers between the
fixed-step, continuous-adjoint, and discrete-adjoint trainers. Unlike
the serving/fixed-step kernels these default to **f32 activations**
(``precision="f32"``): bf16 per-stage rounding is non-smooth noise that
does not cancel in the embedded 5(4) error difference and noise-floors
the step controller (measured 343 vs 8 accepted steps at rtol=1e-5);
at these launch/VPU-bound dims the f32 matmuls cost little.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ode.dopri5 import _A, _B4, _B5, _C, _D
from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu
from ananke_abm_tpu.ops.pallas.fused_step import (
    _nt_dot,
    _stage_math,
    _stage_vjp_math,
    _time_feature_table,
    _to16,
)

# Per-kernel defaults from the config-3-scale tile sweep
# (docs/evidence_round4/config3_bwd_ablate.json, 98,304 agents, Z=64):
# the forward step kernel runs fastest at 2048 (1.539 vs 1.615 ms/step
# at 1024); the VJP kernel — whose per-tile VMEM live set is ~6x larger
# (six stages of intermediates held for the reverse chain) — peaks at
# 1024 (4.681 vs 5.048 at 2048; 4096 exceeds the remote compiler's
# scoped-memory budget and fails to compile).
TILE_N_FWD = 2048
TILE_N_BWD = 1024

from ananke_abm_tpu.ops.pallas.tiling import (  # noqa: E402
    VMEM_100MB as _VMEM_100MB,
    pad_tile as _pad_tile,
    rep_spec as _rep,
    tile_spec as _tile_spec,
)

# embedded-error coefficients b5 - b4 (k7's b5 is 0)
_BE = tuple(b5 - b4 for b5, b4 in zip(_B5, _B4))


def _mk_cast(precision):
    """Activation/weight narrowing for the stage math. "f32" (default)
    keeps everything f32: bf16 per-stage activation rounding is
    non-smooth noise that does NOT cancel in the embedded 5(4) error
    difference, noise-flooring the step controller — measured 343 vs 8
    accepted steps at rtol=1e-5 on the GAT-ODE drift. At these dims the
    kernel is launch/VPU-bound, so f32 matmuls cost little; "bf16"
    stays available for loose tolerances (rtol >= ~1e-3)."""
    if precision == "f32":
        return lambda a: a.astype(jnp.float32)
    if precision == "bf16":
        return _to16
    raise ValueError(f"precision must be 'f32' or 'bf16', got {precision!r}")


def stage_time_rows(t0, h_step, W1t, b1):
    """(7, H) f32 additive Dense_0 pre-activations at the seven DOPRI5
    stage times ``t0 + c_i * h`` (row 0 is unused — k1 is the FSAL
    input — but kept so row index == stage index). Plain XLA and
    differentiable: W1t/b1 cotangents flow through it outside the
    kernels."""
    stage_t = t0 + jnp.asarray(_C, jnp.float32) * h_step
    return _time_feature_table(stage_t, W1t, b1)


def dopri5_step_fused(x, f0, h, ze, tf_rows, Wq, W1xc, W1h, blocks, W3,
                      b3, h_step, *, interpret=None, precision="f32",
                      tile=None, err_stats=None):
    """One full DOPRI5 step for the GAT-ODE drift in a single kernel.

    x: (N, Da) f32 state at t0; f0: (N, Da) f32 FSAL eval f(t0, x);
    h: (N, Hc) f32 agent context (constant over the solve — its Dense_0
    contribution is ONE matmul per step, not one per stage); ze: (Z, Dz)
    f32/bf16 zone embeddings; tf_rows: (7, H) f32 from
    :func:`stage_time_rows`; weights: f32 arrays in
    ``fused_rhs.split_drift_params`` order (narrowed per ``precision``
    here); h_step: scalar step size (dynamic).

    Returns ``(y1, f1, err, r5)`` — the 5th-order update, the FSAL eval
    at (t0 + h, y1), the embedded 5(4) error vector, and the CONTD5
    dense-output coefficient ``h * sum d_i k_i``; all (N, Da) f32. The
    remaining interpolation coefficients (r2..r4) are elementwise in
    (x, f0, y1, f1) and are formed lazily at dense-output fill time
    (ode/dopri5.py ``_Interp``).

    ``err_stats=(rtol, atol)`` replaces the full (N, Da) ``err`` output
    with the CONTROLLER-READY reduction: ``err`` comes back as a (1, 1)
    array holding ``sum((err/scale)^2)`` over all real rows
    (scale = atol + rtol*max(|x|,|y1|), padded rows masked, accumulated
    across tiles in-kernel).
    The step-size controller only ever consumes the scaled RMS norm, so
    shipping the raw err vector through HBM (one 25 MB write + a 75 MB
    err/y0/y1 re-read by ``tree_error_norm`` per attempted step at
    config-3 scale) is pure glue — this folds it into the step kernel.

    NOT differentiable (no AD rule): the adaptive controller's
    while_loop never differentiates; training gradients come from
    ``ode/adjoint.py`` (continuous) or ``ode/discrete_adjoint.py``
    (which pairs this with :func:`dopri5_step_vjp_fused`).
    """
    N, Da = x.shape
    Z, Dz = ze.shape
    Hc = h.shape[1]
    n_blocks = len(blocks)
    cast = _mk_cast(precision)
    flat_blocks = [cast(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    if interpret is None:
        interpret = not _on_tpu()
    tile = TILE_N_FWD if tile is None else tile

    xp, n_tiles = _pad_tile(x, tile)
    fp, _ = _pad_tile(f0, tile)
    hp, _ = _pad_tile(h, tile)
    Np = n_tiles * tile
    hs = jnp.asarray(h_step, jnp.float32)
    if err_stats is not None:
        err_rtol = np.float32(err_stats[0])
        err_atol = np.float32(err_stats[1])

    def kernel(x_ref, f0_ref, h_ref, ze_ref, tf_ref, hs_ref,
               wq_ref, w1xc_ref, w1h_ref, *rest):
        blk_refs = rest[: 4 * n_blocks]
        w3_ref, b3_ref, y1_ref, f1_ref, err_ref, r5_ref = \
            rest[4 * n_blocks:]
        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        x0 = x_ref[:]
        hstep = hs_ref[0]
        hb = cast(h_ref[:])
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)

        ks = [f0_ref[:]]
        for i in range(1, 7):
            y_stage = x0
            for j, a in enumerate(_A[i]):
                if a != 0.0:
                    y_stage = y_stage + (hstep * a) * ks[j]
            k, _ = _stage_math(
                cast(y_stage), hpre, tf_ref[i][None, :], ze_ref[:],
                scale, wq_ref[:], w1xc_ref[:], blk, w3_ref[:], b3_ref[:],
                cast=cast,
            )
            ks.append(k)

        incr5 = sum(b * k for b, k in zip(_B5[:6], ks[:6]) if b != 0.0)
        y1 = x0 + hstep * incr5
        y1_ref[:] = y1
        f1_ref[:] = ks[6]
        err = hstep * sum(
            e * k for e, k in zip(_BE, ks) if e != 0.0
        )
        if err_stats is None:
            err_ref[:] = err
        else:
            # Hairer scaled-RMS sum, padded rows masked, accumulated
            # across tiles in a (1, 1) grid-accumulated output
            # (constant index_map + program_id==0 init — the
            # fused_train cross-tile pattern; Mosaic rejects per-tile
            # scalar blocks over an (n_tiles, 1) array)
            esc = err / (err_atol
                         + err_rtol * jnp.maximum(jnp.abs(x0),
                                                  jnp.abs(y1)))
            rows = pl.program_id(0) * tile + jax.lax.broadcasted_iota(
                jnp.int32, (tile, Da), 0
            )
            esc = jnp.where(rows < N, esc, 0.0)

            @pl.when(pl.program_id(0) == 0)
            def _init_err():
                err_ref[:] = jnp.zeros_like(err_ref)

            err_ref[:] += jnp.sum(esc * esc)
        r5_ref[:] = hstep * sum(
            d * k for d, k in zip(_D, ks) if d != 0.0
        )

    row_shape = jax.ShapeDtypeStruct((Np, Da), jnp.float32)
    if err_stats is None:
        err_shape = row_shape
        err_spec = _tile_spec(Da, tile)
    else:
        err_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        err_spec = _rep((1, 1))
    out_shapes = [row_shape, row_shape, err_shape, row_shape]
    y1, f1, err, r5 = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _tile_spec(Da, tile), _tile_spec(Da, tile),
            _tile_spec(Hc, tile),
            _rep((Z, Dz)), _rep(tf_rows.shape),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=[_tile_spec(Da, tile), _tile_spec(Da, tile),
                   err_spec, _tile_spec(Da, tile)],
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_100MB,
    )(
        xp, fp, hp, cast(ze), tf_rows.astype(jnp.float32), hs[None],
        cast(Wq), cast(W1xc), cast(W1h), *flat_blocks,
        cast(W3), cast(b3),
    )
    if err_stats is not None:
        return y1[:N], f1[:N], err, r5[:N]
    return y1[:N], f1[:N], err[:N], r5[:N]


def dopri5_step_vjp_fused(x, f0, h, ze, tf_rows, Wq, W1xc, W1h, blocks,
                          W3, b3, h_step, g_dy, g_r5, g_k1x, g_k7x,
                          g_y0_direct, *, interpret=None,
                          precision="f32", tile=None):
    """VJP of one accepted DOPRI5 step in a single kernel (discrete
    adjoint backward).

    Re-evaluates the six stages (intermediates VMEM-resident) from the
    exact f32 ``(x, f0)`` the forward controller accepted, at
    ``precision`` — "f32" replays the forward bit-compatibly; "bf16"
    linearizes at a bf16-rounded replay of the same trajectory (the
    fixed-step trainer's tested noise class, ~4e-3 relative) in
    exchange for 1-pass MXU matmuls — then
    reverse-chains the shared stage backward through the tableau:
    stage cotangents are ``gk_j = h*(b5_j*g_dy + d_j*g_r5) +
    [j==1]*g_k1x + [j==7]*g_k7x`` plus the chain terms
    ``h * A[i][j] * gx_i`` from later stages; every stage's input
    cotangent also lands on y0.

    The caller (``ode/discrete_adjoint.py``) folds the step's OUTPUT
    cotangents (g_y1, g_f1 and the dense-output interpolation
    cotangents g_r1..g_r5) into this input set in plain XLA — see the
    derivation there. ``g_y0_direct`` is the part of y0's cotangent
    that bypasses the stages (from y1 = y0 + ... and r1 = y0).

    Returns ``(gy0, gf0, gh, gze, gtf, gWq, gW1xc, gW1h, gblocks, gW3,
    gb3)`` — per-agent gy0 (N, Da) / gf0 (N, Da) / gh (N, Hc);
    gtf (7, H) per-stage time-row cotangents (row 0 zero — k1 is an
    input); the rest accumulated across tiles (constant-index output
    blocks, sequential TPU grid).
    """
    N, Da = x.shape
    Z, Dz = ze.shape
    Hc = h.shape[1]
    H = W1xc.shape[1]
    n_blocks = len(blocks)
    cast = _mk_cast(precision)
    flat_blocks = [cast(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    if interpret is None:
        interpret = not _on_tpu()
    tile = TILE_N_BWD if tile is None else tile

    xp, n_tiles = _pad_tile(x, tile)
    fp, _ = _pad_tile(f0, tile)
    hp, _ = _pad_tile(h, tile)
    # zero cotangents on padded rows: no gradient leak from padding
    gdyp, _ = _pad_tile(g_dy, tile)
    gr5p, _ = _pad_tile(g_r5, tile)
    gk1p, _ = _pad_tile(g_k1x, tile)
    gk7p, _ = _pad_tile(g_k7x, tile)
    gy0p, _ = _pad_tile(g_y0_direct, tile)
    Np = n_tiles * tile
    hs = jnp.asarray(h_step, jnp.float32)

    def kernel(*refs):
        (x_ref, f0_ref, h_ref, gdy_ref, gr5_ref, gk1_ref, gk7_ref,
         gy0d_ref, ze_ref, tf_ref, hs_ref,
         wq_ref, w1xc_ref, w1h_ref) = refs[:14]
        blk_refs = refs[14: 14 + 4 * n_blocks]
        w3_ref, b3_ref = refs[14 + 4 * n_blocks: 16 + 4 * n_blocks]
        outs = refs[16 + 4 * n_blocks:]
        (gy0_ref, gf0_ref, gh_ref, gze_ref, gtf_ref,
         gwq_ref, gw1xc_ref, gw1h_ref) = outs[:8]
        gblk_refs = outs[8: 8 + 4 * n_blocks]
        gw3_ref, gb3_ref = outs[8 + 4 * n_blocks:]

        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        x0 = x_ref[:]
        hstep = hs_ref[0]
        hb = cast(h_ref[:])
        ze16 = ze_ref[:]
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)
        wq16, w1xc16, w316 = wq_ref[:], w1xc_ref[:], w3_ref[:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in ((gze_ref, gtf_ref, gwq_ref, gw1xc_ref, gw1h_ref,
                       gw3_ref, gb3_ref) + tuple(gblk_refs)):
                r[:] = jnp.zeros_like(r)

        # -- forward recompute, keeping every stage's intermediates ----
        ks = [f0_ref[:]]
        inters = [None]  # stage 0 (k1) is an input, no eval
        for i in range(1, 7):
            y_stage = x0
            for j, a in enumerate(_A[i]):
                if a != 0.0:
                    y_stage = y_stage + (hstep * a) * ks[j]
            k, inter = _stage_math(
                cast(y_stage), hpre, tf_ref[i][None, :], ze16,
                scale, wq16, w1xc16, blk, w316, b3_ref[:],
                cast=cast,
            )
            ks.append(k)
            inters.append(inter)

        # -- reverse sweep through the tableau ---------------------------
        tw = (
            ze16, ze16.T, wq16.T, w1xc16.T,
            tuple((b[0].T, b[2].T) for b in blk), w316.T,
        )
        acc = (
            jnp.zeros((Z, Dz), jnp.float32),
            jnp.zeros((Da, Dz), jnp.float32),
            jnp.zeros((Da + Dz, H), jnp.float32),
            jnp.zeros((tile, H), jnp.float32),
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
        gdy = gdy_ref[:]
        gr5 = gr5_ref[:]
        gk = [
            hstep * (_B5[j] * gdy + _D[j] * gr5)
            if (_B5[j] != 0.0 or _D[j] != 0.0)
            else jnp.zeros((tile, Da), jnp.float32)
            for j in range(7)
        ]
        gk[0] = gk[0] + gk1_ref[:]
        gk[6] = gk[6] + gk7_ref[:]
        gy0 = gy0d_ref[:]
        # row 0 stays zero: k1 is the FSAL input, no stage eval
        gtf_rows = [jnp.zeros((1, H), jnp.float32)] * 7
        for i in range(6, 0, -1):
            gx_i, gtf_i, acc = _stage_vjp_math(
                gk[i], inters[i], acc, tw, scale, Da, cast=cast
            )
            gtf_rows[i] = gtf_i
            gy0 = gy0 + gx_i
            for j, a in enumerate(_A[i]):
                if a != 0.0:
                    gk[j] = gk[j] + (hstep * a) * gx_i

        (gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A) = acc
        gy0_ref[:] = gy0
        gf0_ref[:] = gk[0]
        gh_ref[:] = jnp.dot(cast(ghpA), w1h_ref[:].T,
                            preferred_element_type=jnp.float32)
        gze_ref[:] += gzeA
        gtf_ref[:] += jnp.concatenate(gtf_rows, axis=0)
        gwq_ref[:] += gwqA
        gw1xc_ref[:] += gw1A
        gw1h_ref[:] += _nt_dot(hb, cast(ghpA))
        for i in range(4 * n_blocks):
            gblk_refs[i][:] += blkA[i // 4][i % 4]
        gw3_ref[:] += gw3A
        gb3_ref[:] += gb3A

    blk_grad_shapes = []
    for _ in range(n_blocks):
        blk_grad_shapes += [(H, H), (1, H), (H, H), (1, H)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _tile_spec(Da, tile), _tile_spec(Da, tile),
            _tile_spec(Hc, tile),
            _tile_spec(Da, tile), _tile_spec(Da, tile),
            _tile_spec(Da, tile),
            _tile_spec(Da, tile), _tile_spec(Da, tile),
            _rep((Z, Dz)), _rep(tf_rows.shape),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=[
            _tile_spec(Da, tile), _tile_spec(Da, tile),
            _tile_spec(Hc, tile),
            _rep((Z, Dz)), _rep(tf_rows.shape),
            _rep((Da, Dz)), _rep((Da + Dz, H)), _rep((Hc, H)),
            *[_rep(s) for s in blk_grad_shapes],
            _rep((H, Da)), _rep((1, Da)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Hc), jnp.float32),
            jax.ShapeDtypeStruct((Z, Dz), jnp.float32),
            jax.ShapeDtypeStruct(tf_rows.shape, jnp.float32),
            jax.ShapeDtypeStruct((Da, Dz), jnp.float32),
            jax.ShapeDtypeStruct((Da + Dz, H), jnp.float32),
            jax.ShapeDtypeStruct((Hc, H), jnp.float32),
            *[jax.ShapeDtypeStruct(s, jnp.float32)
              for s in blk_grad_shapes],
            jax.ShapeDtypeStruct((H, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_100MB,
    )(
        xp, fp, hp, gdyp, gr5p, gk1p, gk7p, gy0p,
        cast(ze), tf_rows.astype(jnp.float32), hs[None],
        cast(Wq), cast(W1xc), cast(W1h), *flat_blocks,
        cast(W3), cast(b3),
    )
    gy0, gf0, gh, gze, gtf, gWq, gW1xc, gW1h = outs[:8]
    flat_gblk = outs[8: 8 + 4 * n_blocks]
    gW3, gb3 = outs[8 + 4 * n_blocks:]
    gblocks = tuple(
        (flat_gblk[4 * i], flat_gblk[4 * i + 1][0],
         flat_gblk[4 * i + 2], flat_gblk[4 * i + 3][0])
        for i in range(n_blocks)
    )
    return (gy0[:N], gf0[:N], gh[:N], gze, gtf, gWq, gW1xc, gW1h,
            gblocks, gW3, gb3[0])


def dopri5_backward_fused(ckpts, ckpt_f, hc, ze, tf_all, rec_t0, rec_h,
                          n_acc, g, out_step, ts, Wq, W1xc, W1h, blocks,
                          W3, b3, *, interpret=None, precision="bf16",
                          tile=None):
    """The ENTIRE discrete-adjoint backward sweep in ONE kernel launch.

    The per-step backward (``dopri5_step_vjp_fused`` under the
    ``ode/discrete_adjoint.py`` scan) pays, per accepted step: a kernel
    launch over all agent tiles, an HBM round-trip of the (N, Da)
    cotangent carries, a widen of the bf16 checkpoint pair, per-step
    weight-gradient partial outputs plus their XLA tree-adds, and the
    dense-output cotangent fold as a separate XLA cond. At config-3
    scale that glue plus relaunch overhead is ~10% of the backward and
    the carries alone move ~100 MB/step.

    Here the grid is ``(agent_tile, step)`` with the step axis innermost
    (TPU grids iterate the last dimension fastest): for each tile the
    kernel replays the accepted steps in reverse, carrying ``g_y``/
    ``g_f`` in VMEM scratch — they NEVER touch HBM — while the
    checkpointed states/FSAL evals stream in as per-(tile, step) blocks
    (cast from their storage dtype in-VMEM, no widen round-trip) and the
    weight/zone/time-row gradients accumulate in grid-persistent output
    blocks (constant index maps, ``program_id == 0`` init — the
    fused_train cross-tile pattern). The dense-output cotangent fold
    runs unconditionally per step from SMEM scalars (out_step/ts/rec_*):
    for the ~T of n_acc steps that filled a row it reproduces the CONTD5
    derivation in ``ode/discrete_adjoint.py``; for every other step the
    masks are zero and it degenerates to the plain (g_y, 0, 0, g_f,
    g_y) gset, so there is no branch.

    Contract: ``ckpt_every == 1`` with ``store_f`` recording (every
    accepted step's pre-step state AND FSAL eval are in the buffers) —
    the configuration the fast adaptive trainer ships.

    Shapes: ckpts/ckpt_f (max_acc, N, Da) (any float dtype — cast
    in-kernel); hc (N, Hc); ze (Z, Dz); tf_all (max_acc, 7, H) f32 from
    the per-step stage-time rows; rec_t0/rec_h (max_acc,) f32; n_acc
    scalar int32; g (T, N, Da) f32 output cotangents; out_step (T,)
    int32; ts (T,) f32.

    Returns ``(gy0, gf0, gh, gze, gtf_all, gWq, gW1xc, gW1h, gblocks,
    gW3, gb3)`` — gy0/gf0 the carries after step 0 (the caller adds the
    row-0 and initial-FSAL terms), gh (N, Hc), gtf_all (max_acc, 7, H),
    the rest accumulated weight gradients.
    """
    max_acc, N, Da = ckpts.shape
    Z, Dz = ze.shape
    Hc = hc.shape[1]
    H = W1xc.shape[1]
    T = g.shape[0]
    n_blocks = len(blocks)
    cast = _mk_cast(precision)
    flat_blocks = [cast(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    if interpret is None:
        interpret = not _on_tpu()
    tile = TILE_N_BWD if tile is None else tile

    # pad the agent axis of every per-agent operand (zeros: zero
    # cotangent rows and zero states are grad-inert through the linear
    # backward — same argument as dopri5_step_vjp_fused)
    hcp, n_tiles = _pad_tile(hc, tile)
    Np = n_tiles * tile
    pad_n = Np - N
    if pad_n:
        ckpts = jnp.pad(ckpts, ((0, 0), (0, pad_n), (0, 0)))
        ckpt_f = jnp.pad(ckpt_f, ((0, 0), (0, pad_n), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_n), (0, 0)))

    def kernel(*refs):
        (nacc_ref, t0_ref, h_ref, ostep_ref, ts_ref,
         ck_ref, ckf_ref, g_ref, hc_ref, ze_ref, tf_ref,
         wq_ref, w1xc_ref, w1h_ref) = refs[:14]
        blk_refs = refs[14: 14 + 4 * n_blocks]
        w3_ref, b3_ref = refs[14 + 4 * n_blocks: 16 + 4 * n_blocks]
        n_in = 16 + 4 * n_blocks
        n_out = 10 + 4 * n_blocks
        outs = refs[n_in: n_in + n_out]
        (gy0_ref, gf0_ref, gh_ref, gze_ref, gtf_ref,
         gwq_ref, gw1xc_ref, gw1h_ref) = outs[:8]
        gblk_refs = outs[8: 8 + 4 * n_blocks]
        gw3_ref, gb3_ref = outs[8 + 4 * n_blocks:]
        gy_scr, gf_scr = refs[n_in + n_out:]

        i = pl.program_id(1)
        s = max_acc - 1 - i
        blk = tuple(
            (blk_refs[4 * b][:], blk_refs[4 * b + 1][:],
             blk_refs[4 * b + 2][:], blk_refs[4 * b + 3][:])
            for b in range(n_blocks)
        )

        @pl.when(i == 0)
        def _init_tile():
            gy_scr[:] = jnp.zeros_like(gy_scr)
            gf_scr[:] = jnp.zeros_like(gf_scr)
            gh_ref[:] = jnp.zeros_like(gh_ref)

        @pl.when((i == 0) & (pl.program_id(0) == 0))
        def _init_global():
            for r in ((gze_ref, gtf_ref, gwq_ref, gw1xc_ref, gw1h_ref,
                       gw3_ref, gb3_ref) + tuple(gblk_refs)):
                r[:] = jnp.zeros_like(r)

        @pl.when(s < nacc_ref[0])
        def _body():
            x0 = ck_ref[0].astype(jnp.float32)
            f0 = ckf_ref[0].astype(jnp.float32)
            hstep = h_ref[s]
            t0s = t0_ref[s]
            hb = cast(hc_ref[:])
            ze16 = ze_ref[:]
            hpre = jnp.dot(hb, w1h_ref[:],
                           preferred_element_type=jnp.float32)
            wq16, w1xc16, w316 = wq_ref[:], w1xc_ref[:], w3_ref[:]

            # ---- dense-output cotangent fold (CONTD5, from SMEM) ----
            g_y = gy_scr[:]
            g_f = gf_scr[:]
            zrow = jnp.zeros((tile, Da), jnp.float32)
            gr = [zrow, zrow, zrow, zrow, zrow]
            safe_h = jnp.where(hstep == 0.0, 1.0, hstep)
            for t in range(T):
                mask = (ostep_ref[t] == s).astype(jnp.float32)
                theta = jnp.clip((ts_ref[t] - t0s) / safe_h, 0.0, 1.0)
                om = 1.0 - theta
                w = (mask, theta * mask, theta * om * mask,
                     theta * theta * om * mask,
                     theta * theta * om * om * mask)
                gt = g_ref[t]
                gr = [gr[k] + w[k] * gt for k in range(5)]
            gr1, gr2, gr3, gr4, gr5 = gr
            g_dy = g_y + gr2 - gr3 + 2.0 * gr4
            g_k1x = hstep * (gr3 - gr4)
            g_k7x = g_f - hstep * gr4
            g_y0d = g_y + gr1

            # ---- forward recompute, stage intermediates in VMEM -----
            ks = [f0]
            inters = [None]
            for st in range(1, 7):
                y_stage = x0
                for j, a in enumerate(_A[st]):
                    if a != 0.0:
                        y_stage = y_stage + (hstep * a) * ks[j]
                k, inter = _stage_math(
                    cast(y_stage), hpre, tf_ref[0, st][None, :], ze16,
                    scale, wq16, w1xc16, blk, w316, b3_ref[:],
                    cast=cast,
                )
                ks.append(k)
                inters.append(inter)

            # ---- reverse sweep through the tableau ------------------
            tw = (
                ze16, ze16.T, wq16.T, w1xc16.T,
                tuple((b[0].T, b[2].T) for b in blk), w316.T,
            )
            acc = (
                jnp.zeros((Z, Dz), jnp.float32),
                jnp.zeros((Da, Dz), jnp.float32),
                jnp.zeros((Da + Dz, H), jnp.float32),
                jnp.zeros((tile, H), jnp.float32),
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
            gk = [
                hstep * (_B5[j] * g_dy + _D[j] * gr5)
                if (_B5[j] != 0.0 or _D[j] != 0.0)
                else jnp.zeros((tile, Da), jnp.float32)
                for j in range(7)
            ]
            gk[0] = gk[0] + g_k1x
            gk[6] = gk[6] + g_k7x
            gy0 = g_y0d
            gtf_rows = [jnp.zeros((1, H), jnp.float32)] * 7
            for st in range(6, 0, -1):
                gx_i, gtf_i, acc = _stage_vjp_math(
                    gk[st], inters[st], acc, tw, scale, Da, cast=cast
                )
                gtf_rows[st] = gtf_i
                gy0 = gy0 + gx_i
                for j, a in enumerate(_A[st]):
                    if a != 0.0:
                        gk[j] = gk[j] + (hstep * a) * gx_i

            (gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A) = acc
            gy_scr[:] = gy0
            gf_scr[:] = gk[0]
            gh_ref[:] += jnp.dot(cast(ghpA), w1h_ref[:].T,
                                 preferred_element_type=jnp.float32)
            gze_ref[:] += gzeA
            gwq_ref[:] += gwqA
            gw1xc_ref[:] += gw1A
            gw1h_ref[:] += _nt_dot(hb, cast(ghpA))
            for b in range(4 * n_blocks):
                gblk_refs[b][:] += blkA[b // 4][b % 4]
            gw3_ref[:] += gw3A
            gb3_ref[:] += gb3A
            gtf_step = jnp.concatenate(gtf_rows, axis=0)  # (7, H)
            gtf_ref[pl.dslice(s, 1)] = (
                gtf_ref[pl.dslice(s, 1)] + gtf_step[None]
            )

        @pl.when(i == max_acc - 1)
        def _final():
            gy0_ref[:] = gy_scr[:]
            gf0_ref[:] = gf_scr[:]

    blk_grad_shapes = []
    for _ in range(n_blocks):
        blk_grad_shapes += [(H, H), (1, H), (H, H), (1, H)]

    def smem(shape, dtype=jnp.float32):
        return pl.BlockSpec(shape, lambda t, i: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    rep2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    step_blk = pl.BlockSpec((1, tile, Da),
                            lambda t, i: (max_acc - 1 - i, t, 0),
                            memory_space=pltpu.VMEM)
    tf_blk = pl.BlockSpec((1, 7, H), lambda t, i: (max_acc - 1 - i, 0, 0),
                          memory_space=pltpu.VMEM)
    g_blk = pl.BlockSpec((T, tile, Da), lambda t, i: (0, t, 0),
                         memory_space=pltpu.VMEM)
    tile_out = lambda d: pl.BlockSpec(  # noqa: E731
        (tile, d), lambda t, i: (t, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, max_acc),
        in_specs=[
            smem((1,)), smem((max_acc,)), smem((max_acc,)),
            smem((T,)), smem((T,)),
            step_blk, step_blk, g_blk,
            pl.BlockSpec((tile, Hc), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            rep2((Z, Dz)), tf_blk,
            rep2(Wq.shape), rep2(W1xc.shape), rep2(W1h.shape),
            *[rep2(w.shape) for w in flat_blocks],
            rep2(W3.shape), rep2(b3.shape),
        ],
        out_specs=[
            tile_out(Da), tile_out(Da), tile_out(Hc),
            rep2((Z, Dz)), rep2((max_acc, 7, H)),
            rep2((Da, Dz)), rep2((Da + Dz, H)), rep2((Hc, H)),
            *[rep2(sh) for sh in blk_grad_shapes],
            rep2((H, Da)), rep2((1, Da)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Hc), jnp.float32),
            jax.ShapeDtypeStruct((Z, Dz), jnp.float32),
            jax.ShapeDtypeStruct((max_acc, 7, H), jnp.float32),
            jax.ShapeDtypeStruct((Da, Dz), jnp.float32),
            jax.ShapeDtypeStruct((Da + Dz, H), jnp.float32),
            jax.ShapeDtypeStruct((Hc, H), jnp.float32),
            *[jax.ShapeDtypeStruct(sh, jnp.float32)
              for sh in blk_grad_shapes],
            jax.ShapeDtypeStruct((H, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, Da), jnp.float32),
            pltpu.VMEM((tile, Da), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_100MB,
    )(
        jnp.asarray(n_acc, jnp.int32)[None],
        jnp.asarray(rec_t0, jnp.float32),
        jnp.asarray(rec_h, jnp.float32),
        jnp.asarray(out_step, jnp.int32),
        jnp.asarray(ts, jnp.float32),
        ckpts, ckpt_f, g, hcp, cast(ze),
        tf_all.astype(jnp.float32),
        cast(Wq), cast(W1xc), cast(W1h), *flat_blocks,
        cast(W3), cast(b3),
    )
    gy0, gf0, gh, gze, gtf, gWq, gW1xc, gW1h = outs[:8]
    flat_gblk = outs[8: 8 + 4 * n_blocks]
    gW3, gb3 = outs[8 + 4 * n_blocks:]
    gblocks = tuple(
        (flat_gblk[4 * b], flat_gblk[4 * b + 1][0],
         flat_gblk[4 * b + 2], flat_gblk[4 * b + 3][0])
        for b in range(n_blocks)
    )
    return (gy0[:N], gf0[:N], gh[:N], gze, gtf, gWq, gW1xc, gW1h,
            gblocks, gW3, gb3[0])


def make_fused_dopri5_hooks(params_template=None, *, interpret=None,
                            precision="f32", bwd_precision=None,
                            err_stats=None):
    """Build the ``(step_impl, step_vjp)`` pair for
    ``ode.odeint_discrete_adjoint`` over GATODE drift dynamics with
    ``args = (params, h_ctx, zone_emb)``.

    ``step_impl`` runs :func:`dopri5_step_fused` (one kernel per
    attempted step — forward solve AND backward segment recompute);
    ``step_vjp`` runs :func:`dopri5_step_vjp_fused` and scatters the
    weight cotangents back into the params tree via ``jax.vjp`` of the
    split (zeros for params the drift never touches — encoder/decoder/
    init weights get their gradients from the XLA parts of the loss).
    Pass ``params_template`` to validate the drift structure eagerly.

    ``precision`` ("f32" default / "bf16") is the FORWARD controller's
    activation class — f32 is required at tight tolerances (see
    :func:`_mk_cast`). ``bwd_precision`` (default: same as
    ``precision``) applies only to :func:`dopri5_step_vjp_fused`: the
    step-size CONTROL decisions were already taken on the f32 forward,
    so the backward's in-kernel stage recompute + cotangent chain can
    run the bf16 precision class of the shipping RK4 trainer
    (fused_train.py) without touching the accepted-step sequence. The
    cost is bf16-class gradient noise (linearization at a bf16-rounded
    replay of the f32 trajectory, bf16 matmul inputs in the reverse
    chain) — same budget as the fixed-step trainer's tested ~4e-3
    relative class; the win is 1-pass MXU matmuls in the
    weight-gradient NT dots that dominate the backward kernel.

    ``err_stats=(rtol, atol)``: fold the Hairer scaled-RMS error
    reduction into the step kernel (see :func:`dopri5_step_fused`) —
    ``step_impl`` then returns an ``ode.dopri5.ErrNormSq`` instead of
    the raw err vector and the controller skips its full-state norm
    pass. Pass the SAME tolerances the solve uses; a mismatch would
    steer the controller with a different norm than configured, so
    ``odeint_discrete_adjoint`` callers thread them from one place
    (gnn_embed ``build_adjoint_loss_fn_g``).
    """
    from ananke_abm_tpu.ode.dopri5 import ErrNormSq, _Interp
    from ananke_abm_tpu.ops.pallas.fused_rhs import split_drift_params

    if bwd_precision is None:
        bwd_precision = precision
    _mk_cast(bwd_precision)  # validate eagerly
    if params_template is not None:
        split_drift_params(params_template)  # raises on num_blocks < 1

    def _prep(params, t0, h_step):
        (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = split_drift_params(
            params)
        tf_rows = stage_time_rows(t0, h_step, W1t, b1)
        return (Wq, W1xc, W1h, blocks, W3, b3, tf_rows)

    def step_impl(t0, h_step, y, f, args):
        params, hc, ze = args
        (Wq, W1xc, W1h, blocks, W3, b3, tf_rows) = _prep(
            params, t0, h_step)
        y1, f1, err, r5 = dopri5_step_fused(
            y, f, hc, ze, tf_rows, Wq, W1xc, W1h, blocks, W3, b3,
            h_step, interpret=interpret, precision=precision,
            err_stats=err_stats,
        )
        if err_stats is not None:
            err = ErrNormSq(sq_sum=jnp.sum(err), count=y.size)
        # _Interp is lazy (ode/dopri5.py): endpoints only — the CONTD5
        # r2..r4 combines are formed at fill time, not per attempted step
        return y1, f1, err, _Interp(t0=t0, h=h_step, y0=y, f0=f,
                                    y1=y1, f1=f1, r5=r5)

    def step_vjp(t0, h_step, y, f, args, gset):
        params, hc, ze = args
        g_dy, g_r5, g_k1x, g_k7x, g_y0d = gset
        wt, pull = jax.vjp(lambda p: _prep(p, t0, h_step), params)
        (Wq, W1xc, W1h, blocks, W3, b3, tf_rows) = wt
        (gy0, gf0, gh, gze, gtf, gWq, gW1xc, gW1h, gblocks, gW3,
         gb3) = dopri5_step_vjp_fused(
            y, f, hc, ze, tf_rows, Wq, W1xc, W1h, blocks, W3, b3,
            h_step, g_dy, g_r5, g_k1x, g_k7x, g_y0d,
            interpret=interpret, precision=bwd_precision,
        )
        (gparams,) = pull((gWq, gW1xc, gW1h, gblocks, gW3, gb3, gtf))
        return gy0, gf0, (gparams, gh, gze)

    def backward_all(ckpts, ckpt_f, rec_t0, rec_h, n_acc, g, out_step,
                     ts, args):
        """Whole-backward fast path (``ode/discrete_adjoint.py`` calls
        this instead of its per-step scan when ckpt_every == 1 and the
        FSAL buffer was recorded): one :func:`dopri5_backward_fused`
        launch replaces n_acc step-VJP launches."""
        params, hc, ze = args
        max_acc = ckpts.shape[0]

        def prep_all(p):
            (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = \
                split_drift_params(p)
            stage_t = (rec_t0[:, None]
                       + jnp.asarray(_C, jnp.float32)[None, :]
                       * rec_h[:, None])  # (max_acc, 7)
            tf_all = _time_feature_table(
                stage_t.reshape(-1), W1t, b1
            ).reshape(max_acc, 7, -1)
            return (Wq, W1xc, W1h, blocks, W3, b3, tf_all)

        wt, pull = jax.vjp(prep_all, params)
        (Wq, W1xc, W1h, blocks, W3, b3, tf_all) = wt
        (gy0, gf0, gh, gze, gtf_all, gWq, gW1xc, gW1h, gblocks, gW3,
         gb3) = dopri5_backward_fused(
            ckpts, ckpt_f, hc, ze, tf_all, rec_t0, rec_h, n_acc, g,
            out_step, ts, Wq, W1xc, W1h, blocks, W3, b3,
            interpret=interpret, precision=bwd_precision,
        )
        (gparams,) = pull(
            (gWq, gW1xc, gW1h, gblocks, gW3, gb3, gtf_all)
        )
        return gy0, gf0, (gparams, gh, gze)

    step_vjp.backward_all = backward_all
    return step_impl, step_vjp
