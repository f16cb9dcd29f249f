"""Fused GAT-ODE drift RHS kernels for the adaptive/adjoint training path.

The continuous-adjoint trainer (BASELINE config 3: adaptive dopri5 +
adjoint gradients, reference torchdiffeq usage at
src/ananke_abm/models/latent_ode/architecture/ode_components.py:29-50)
evaluates the drift RHS thousands of times per train step: ~6 evals per
accepted forward step, and in the backward pass one forward + one VJP per
augmented-system eval. Executed as separate XLA ops, each eval round-trips
every (N, Dz)/(N, Z) intermediate through HBM; these kernels keep one agent
tile plus ALL weights resident in VMEM:

- :func:`drift_rhs_fused` — ONE eval, forward only (the dopri5 forward
  solve and HINIT probes; nothing differentiates through them — the
  adjoint's custom_vjp owns the gradient).
- :func:`drift_rhs_and_vjp` — ONE kernel computing the eval AND its VJP at
  a given cotangent, sharing the forward intermediates in VMEM. This is
  the whole augmented RHS ``(f, (df/dx)^T a, (df/dargs)^T a)`` of
  ode/adjoint.py in a single launch at 3x forward FLOPs (the generic
  ``jax.vjp`` route costs a fwd + a separate bwd with HBM-resident
  residuals).

Both reuse the ONE copy of the stage math / stage backward
(`fused_step._stage_math` / `fused_step._stage_vjp_math`) shared with the
serving and fixed-step training kernels, so all Pallas paths stay
bit-compatible. Matmuls are bf16 x bf16 -> f32 (MXU full rate) — the same
precision class as XLA's DEFAULT f32 matmul lowering on TPU, so the
adaptive error control sees comparable stage noise to the XLA path it
replaces. Falls back to interpret mode off-TPU (tests run on the CPU
mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ananke_abm_tpu.ops._platform import on_tpu as _on_tpu
from ananke_abm_tpu.ops.pallas.fused_step import (
    _nt_dot,
    _stage_math,
    _stage_vjp_math,
    _to16,
)

TILE_N = 1024


def split_drift_params(params):
    """GATODE flax params -> f32 weight tuple for the adjoint RHS kernels
    (any number of residual drift blocks).

    Same split as ``fused_step.pack_weights_bf16`` — Dense_0's kernel is
    split by the rhs concat row order [x, ctx, h, sin_t, cos_t]
    (gnn_embed/model.py:46) — but the slices stay f32 so the caller can
    ``jax.vjp`` through this function to scatter weight cotangents back
    into the params tree (bf16 conversion happens inside the kernels).

    Returns ``(Wq, W1xc, W1h, W1t, b1, blocks, W3, b3)`` with ``blocks``
    a tuple of (Wr1, br1, Wr2, br2) per residual block.
    """
    d = params["drift"]
    Wq = params["query_proj"]["kernel"]
    Da, Dz = Wq.shape
    W1 = d["Dense_0"]["kernel"]
    Hc = W1.shape[0] - Da - Dz - 2
    n_dense = len([k for k in d if k.startswith("Dense_")])
    num_blocks = (n_dense - 2) // 2
    if num_blocks < 1:
        raise ValueError(
            "the fused adjoint RHS kernels require num_blocks >= 1 "
            f"residual drift blocks (got a drift with {n_dense} Dense "
            "layers); use the XLA path for block-free drifts"
        )
    blocks = tuple(
        (d[f"Dense_{1 + 2 * i}"]["kernel"], d[f"Dense_{1 + 2 * i}"]["bias"],
         d[f"Dense_{2 + 2 * i}"]["kernel"], d[f"Dense_{2 + 2 * i}"]["bias"])
        for i in range(num_blocks)
    )
    out = d[f"Dense_{n_dense - 1}"]
    return (
        Wq,
        W1[: Da + Dz],
        W1[Da + Dz: Da + Dz + Hc],
        W1[Da + Dz + Hc:],
        d["Dense_0"]["bias"],
        blocks,
        out["kernel"], out["bias"],
    )


def time_row(t, W1t, b1):
    """Scalar time -> (1, H) f32 additive Dense_0 pre-activation (the
    sin/cos feature rows plus the bias). Plain XLA and differentiable, so
    W1t/b1 cotangents flow through it without kernel involvement."""
    ang = t * (2 * np.pi / 24.0)
    tfeat = jnp.stack([jnp.sin(ang), jnp.cos(ang)]).astype(jnp.float32)
    return tfeat[None, :] @ W1t.astype(jnp.float32) + b1.astype(
        jnp.float32)[None, :]


from ananke_abm_tpu.ops.pallas.tiling import (  # noqa: E402
    VMEM_100MB as _VMEM_100MB,
    pad_tile,
    rep_spec as _rep,
    tile_spec,
)


def _pad_tile(x):
    return pad_tile(x, TILE_N)


def _tile_spec(d):
    return tile_spec(d, TILE_N)


def drift_rhs_fused(x, h, ze, tf_row, Wq, W1xc, W1h, blocks, W3, b3,
                    *, interpret=None):
    """dx/dt for the GAT-ODE drift, ONE Pallas eval (forward only).

    x: (N, Da) f32; h: (N, Hc) f32; ze: (Z, Dz) f32 zone embeddings;
    tf_row: (1, H) f32 from :func:`time_row`; weights: f32 arrays from
    :func:`split_drift_params` (converted to bf16 here). Returns
    (N, Da) f32.

    NOT differentiable (no AD rule): it serves the adjoint's forward
    solve and HINIT probes, which the custom_vjp in ode/adjoint.py never
    differentiates. Use :func:`drift_rhs_and_vjp` for the backward.
    """
    N, Da = x.shape
    Z, Dz = ze.shape
    Hc = h.shape[1]
    n_blocks = len(blocks)
    flat_blocks = [_to16(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    if interpret is None:
        interpret = not _on_tpu()

    xp, n_tiles = _pad_tile(x)
    hp, _ = _pad_tile(h)
    Np = n_tiles * TILE_N

    def kernel(x_ref, h_ref, ze_ref, tf_ref, wq_ref, w1xc_ref, w1h_ref,
               *rest):
        blk_refs = rest[: 4 * n_blocks]
        w3_ref, b3_ref, out_ref = rest[4 * n_blocks:]
        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        hb = _to16(h_ref[:])
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)
        k, _ = _stage_math(
            _to16(x_ref[:]), hpre, tf_ref[:], ze_ref[:], scale,
            wq_ref[:], w1xc_ref[:], blk, w3_ref[:], b3_ref[:],
        )
        out_ref[:] = k

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _tile_spec(Da), _tile_spec(Hc),
            _rep((Z, Dz)), _rep((1, tf_row.shape[-1])),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=_tile_spec(Da),
        out_shape=jax.ShapeDtypeStruct((Np, Da), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_100MB,
    )(
        xp, hp, _to16(ze), tf_row.astype(jnp.float32),
        _to16(Wq), _to16(W1xc), _to16(W1h), *flat_blocks,
        _to16(W3), _to16(b3),
    )
    return out[:N]


def drift_rhs_and_vjp(x, h, ze, tf_row, Wq, W1xc, W1h, blocks, W3, b3, a,
                      *, interpret=None):
    """One drift eval AND its VJP at cotangent ``a`` in a single kernel.

    This is the augmented adjoint RHS in one launch: the forward
    intermediates never leave VMEM between the eval and its backward
    chain (~3x forward FLOPs total, vs fwd + separate bwd with HBM
    residuals under generic ``jax.vjp``). Weight/zone-embedding/time-row
    cotangents accumulate across agent tiles via constant-index output
    blocks (sequential TPU grid).

    a: (N, Da) f32 cotangent of the output. Returns
    ``(f, gx, gh, gze, gtf, gWq, gW1xc, gW1h, gblocks, gW3, gb3)`` —
    f (N, Da); per-agent gx (N, Da) / gh (N, Hc); accumulated gze (Z,
    Dz), gtf (1, H), and weight grads shaped like their f32 inputs.
    """
    N, Da = x.shape
    Z, Dz = ze.shape
    Hc = h.shape[1]
    H = W1xc.shape[1]
    n_blocks = len(blocks)
    flat_blocks = [_to16(w) for blk in blocks for w in blk]
    scale = np.float32(1.0 / np.sqrt(float(Dz)))
    if interpret is None:
        interpret = not _on_tpu()

    xp, n_tiles = _pad_tile(x)
    hp, _ = _pad_tile(h)
    ap, _ = _pad_tile(a)  # zero cotangents on padded rows: no grad leak
    Np = n_tiles * TILE_N

    def kernel(*refs):
        (x_ref, h_ref, a_ref, ze_ref, tf_ref,
         wq_ref, w1xc_ref, w1h_ref) = refs[:8]
        blk_refs = refs[8: 8 + 4 * n_blocks]
        w3_ref, b3_ref = refs[8 + 4 * n_blocks: 10 + 4 * n_blocks]
        outs = refs[10 + 4 * n_blocks:]
        (f_ref, gx_ref, gh_ref, gze_ref, gtf_ref,
         gwq_ref, gw1xc_ref, gw1h_ref) = outs[:8]
        gblk_refs = outs[8: 8 + 4 * n_blocks]
        gw3_ref, gb3_ref = outs[8 + 4 * n_blocks:]

        blk = tuple(
            (blk_refs[4 * i][:], blk_refs[4 * i + 1][:],
             blk_refs[4 * i + 2][:], blk_refs[4 * i + 3][:])
            for i in range(n_blocks)
        )
        hb = _to16(h_ref[:])
        ze16 = ze_ref[:]
        hpre = jnp.dot(hb, w1h_ref[:], preferred_element_type=jnp.float32)
        wq16, w1xc16, w316 = wq_ref[:], w1xc_ref[:], w3_ref[:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in ((gze_ref, gtf_ref, gwq_ref, gw1xc_ref, gw1h_ref,
                       gw3_ref, gb3_ref) + tuple(gblk_refs)):
                r[:] = jnp.zeros_like(r)

        k, inter = _stage_math(
            _to16(x_ref[:]), hpre, tf_ref[:], ze16, scale,
            wq16, w1xc16, blk, w316, b3_ref[:],
        )
        f_ref[:] = k

        tw = (
            ze16, ze16.T, wq16.T, w1xc16.T,
            tuple((b[0].T, b[2].T) for b in blk), w316.T,
        )
        acc0 = (
            jnp.zeros((Z, Dz), jnp.float32),
            jnp.zeros((Da, Dz), jnp.float32),
            jnp.zeros((Da + Dz, H), jnp.float32),
            jnp.zeros((TILE_N, H), jnp.float32),
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
        gx, gtf, acc = _stage_vjp_math(a_ref[:], inter, acc0, tw, scale, Da)
        (gzeA, gwqA, gw1A, ghpA, blkA, gw3A, gb3A) = acc

        gx_ref[:] = gx
        # hpre = hb @ W1h: gh is per-tile, gW1h accumulates across tiles
        gh_ref[:] = jnp.dot(_to16(ghpA), w1h_ref[:].T,
                            preferred_element_type=jnp.float32)
        gze_ref[:] += gzeA
        gtf_ref[:] += gtf
        gwq_ref[:] += gwqA
        gw1xc_ref[:] += gw1A
        gw1h_ref[:] += _nt_dot(hb, _to16(ghpA))
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
            _tile_spec(Da), _tile_spec(Hc), _tile_spec(Da),
            _rep((Z, Dz)), _rep((1, H)),
            _rep(Wq.shape), _rep(W1xc.shape), _rep(W1h.shape),
            *[_rep(w.shape) for w in flat_blocks],
            _rep(W3.shape), _rep(b3.shape),
        ],
        out_specs=[
            _tile_spec(Da), _tile_spec(Da), _tile_spec(Hc),
            _rep((Z, Dz)), _rep((1, H)),
            _rep((Da, Dz)), _rep((Da + Dz, H)), _rep((Hc, H)),
            *[_rep(s) for s in blk_grad_shapes],
            _rep((H, Da)), _rep((1, Da)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Da), jnp.float32),
            jax.ShapeDtypeStruct((Np, Hc), jnp.float32),
            jax.ShapeDtypeStruct((Z, Dz), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
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
        xp, hp, ap, _to16(ze), tf_row.astype(jnp.float32),
        _to16(Wq), _to16(W1xc), _to16(W1h), *flat_blocks,
        _to16(W3), _to16(b3),
    )
    f, gx, gh, gze, gtf, gWq, gW1xc, gW1h = outs[:8]
    flat_gblk = outs[8: 8 + 4 * n_blocks]
    gW3, gb3 = outs[8 + 4 * n_blocks:]
    gblocks = tuple(
        (flat_gblk[4 * i], flat_gblk[4 * i + 1][0],
         flat_gblk[4 * i + 2], flat_gblk[4 * i + 3][0])
        for i in range(n_blocks)
    )
    return (f[:N], gx[:N], gh[:N], gze, gtf, gWq, gW1xc, gW1h, gblocks,
            gW3, gb3[0])


def make_fused_adjoint_rhs(params_template=None, *, interpret=None):
    """Build the ``(rhs, rhs_vjp)`` pair for ``ode.odeint_adjoint`` over
    GATODE drift dynamics with ``args = (params, h, zone_emb)``.

    ``rhs(t, x, args)`` runs :func:`drift_rhs_fused`;
    ``rhs_vjp(t, x, args, a)`` runs :func:`drift_rhs_and_vjp` and
    scatters the weight cotangents back into the params tree via
    ``jax.vjp`` of :func:`split_drift_params` (zeros for params the
    drift never touches — encoder/decoder/init weights get their
    gradients from the XLA parts of the loss). Pass ``params_template``
    to validate the drift structure eagerly instead of at first call.
    """
    if params_template is not None:
        split_drift_params(params_template)  # raises on num_blocks < 1

    def _prep(params, t):
        (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = split_drift_params(
            params)
        return (Wq, W1xc, W1h, blocks, W3, b3, time_row(t, W1t, b1))

    def rhs(t, x, args):
        params, h, zone_emb = args
        (Wq, W1xc, W1h, blocks, W3, b3, tf_row) = _prep(params, t)
        return drift_rhs_fused(
            x, h, zone_emb, tf_row, Wq, W1xc, W1h, blocks, W3, b3,
            interpret=interpret,
        )

    def rhs_vjp(t, x, args, a):
        params, h, zone_emb = args
        wt, pull = jax.vjp(lambda p: _prep(p, t), params)
        (Wq, W1xc, W1h, blocks, W3, b3, tf_row) = wt
        (f, gx, gh, gze, gtf, gWq, gW1xc, gW1h, gblocks, gW3,
         gb3) = drift_rhs_and_vjp(
            x, h, zone_emb, tf_row, Wq, W1xc, W1h, blocks, W3, b3, a,
            interpret=interpret,
        )
        (gparams,) = pull((gWq, gW1xc, gW1h, gblocks, gW3, gb3, gtf))
        return f, gx, (gparams, gh, gze)

    return rhs, rhs_vjp
