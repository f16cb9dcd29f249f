"""Discrete-adjoint gradients for the adaptive DOPRI5 solver.

``ode/adjoint.py`` (continuous adjoint) integrates a SECOND adaptive
solve of the augmented system backwards — at config-3 scale that costs
~3x the forward's RHS evaluations on a step grid the controller has to
rediscover. The discrete adjoint instead backpropagates through the
exact step sequence the forward controller chose: the forward records
each accepted step's ``(t0, h)`` (plus periodic state checkpoints), and
the backward replays those steps in reverse, applying the VJP of one
DOPRI5 step per accepted step. No augmented system, no second adaptive
solve, and the gradient is the EXACT derivative of the computed
(discretized) output rather than a re-discretization of the continuous
adjoint ODE — the same semantics torch gets from backprop through the
torchdiffeq graph (the reference's default everywhere outside the
unused ODEBlock: src/ananke_abm/models/latent_ode/architecture/
ode_components.py:29-50).

Step-size control is treated as non-differentiable (cotangents do not
flow through accept/reject decisions or ``h`` proposals), matching both
torchdiffeq and the continuous adjoint here.

Memory: O(max_accepted / ckpt_every) states for checkpoints plus one
``ckpt_every``-step recompute window — NOT O(n_steps) full activation
storage. Backward cost per accepted step = one step recompute + one
step VJP; with the fused Pallas step kernels
(ops/pallas/fused_dopri5.py) both are single launches.
``ckpt_every=1`` removes the recompute entirely (every pre-step state
is checkpointed; backward = one RHS eval + one step VJP per accepted
step) at O(max_accepted) state memory — at config-3 scale
(98,304 x 64 f32, max_accepted=256) the checkpoint buffer is 6.4 GB,
comfortably inside one v5e chip's HBM next to the 1.4 GB working set.

Hooks (same split as ``dopri5_solve``):

- ``step_impl(t0, h, y, f, args) -> (y1, f1, err, interp)`` — fused
  forward step, used for the forward solve AND the backward's segment
  recompute (bit-identical replay is what makes the VJP exact).
- ``step_vjp(t0, h, y, f, args, gset) -> (gy, gf, gargs)`` with
  ``gset = (g_dy, g_r5, g_k1x, g_k7x, g_y0_direct)`` — fused step
  backward. The generic fallback builds it from ``jax.vjp`` of the
  tableau step.

Cotangent folding (derivation): with ``dy = h*sum(b5_j k_j)`` the step
outputs are ``y1 = y0 + dy``, ``f1 = k7`` and the CONTD5 interpolation
coefficients ``r1 = y0``, ``r2 = dy``, ``r3 = h k1 - dy``,
``r4 = 2 dy - h k1 - h k7``, ``r5 = h*sum(d_j k_j)``. Incoming
cotangents ``(g_y1, g_f1, g_r1..g_r5)`` therefore fold to

    g_dy        = g_y1 + g_r2 - g_r3 + 2 g_r4
    g_k1_extra  = h (g_r3 - g_r4)        # k1 = f0 is a step INPUT
    g_k7_extra  = g_f1 - h g_r4
    g_y0_direct = g_y1 + g_r1

and the per-stage cotangents are ``gk_j = h (b5_j g_dy + d_j g_r5)``
plus the extras on k1/k7 plus the reverse tableau chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ode.dopri5 import _step, dopri5_solve
from ananke_abm_tpu.ode.tree import tree_add, tree_map, tree_where

_tm = jax.tree_util.tree_map


def _generic_step_vjp(rhs, step):
    """``step_vjp`` fallback via ``jax.vjp`` of the tableau step (works
    over arbitrary pytrees; the Pallas kernel path replaces it for the
    GAT-ODE drift)."""

    def step_vjp(t0, h, y, f, args, gset):
        g_dy, g_r5, g_k1x, g_k7x, g_y0_direct = gset

        def raw(y_, f_, a_):
            y1, f1, _err, interp = step(t0, h, y_, f_, a_)
            dy = tree_map(jnp.subtract, y1, y_)
            return dy, interp.r5, f1

        _, pull = jax.vjp(raw, y, f, args)
        gy, gf, gargs = pull((g_dy, g_r5, g_k7x))
        # raw's dy = y1 - y routes -g_dy into y; the direct fold term
        # g_y0_direct already carries y1's +g_y1 and r1's +g_r1
        gy = tree_add(gy, g_y0_direct)
        gf = tree_add(gf, g_k1x)
        return gy, gf, gargs

    return step_vjp


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9))
def _odeint_disc(rhs, step_impl, step_vjp, rtol, atol, max_steps,
                 max_accepted, ckpt_every, store_f, ckpt_dtype,
                 y0, ts, args):
    # value-only path records too, so the max_accepted cap NaN-poisons
    # identically whether or not gradients are requested
    ys, _ = dopri5_solve(
        rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps,
        step_impl=step_impl,
        record={"max_accepted": max_accepted, "ckpt_every": ckpt_every,
                "store_f": store_f, "ckpt_dtype": ckpt_dtype},
    )
    return ys


def _disc_fwd(rhs, step_impl, step_vjp, rtol, atol, max_steps,
              max_accepted, ckpt_every, store_f, ckpt_dtype,
              y0, ts, args):
    ys, stats = dopri5_solve(
        rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps,
        step_impl=step_impl,
        record={"max_accepted": max_accepted, "ckpt_every": ckpt_every,
                "store_f": store_f, "ckpt_dtype": ckpt_dtype},
    )
    res = (ts, args, stats["rec_t0"], stats["rec_h"], stats["out_step"],
           stats["ckpts"], stats.get("ckpt_f"), stats["n_accepted"])
    return ys, res


def _disc_bwd(rhs, step_impl, step_vjp, rtol, atol, max_steps,
              max_accepted, ckpt_every, store_f, ckpt_dtype, res, g):
    ts, args, rec_t0, rec_h, out_step, ckpts, ckpt_f, n_acc = res
    step = step_impl if step_impl is not None else functools.partial(
        _step, rhs
    )
    if step_vjp is None:
        step_vjp = _generic_step_vjp(rhs, step)
    K = ckpt_every
    n_ckpt = jax.tree_util.tree_leaves(ckpts)[0].shape[0]

    def zeros_like_row(tree):
        return _tm(lambda l: jnp.zeros_like(l[0]), tree)

    def dense_cotangents(idx, t0j, hj):
        """Fold the dense-output rows this step produced into
        (g_r1..g_r5) — one pass over g via a (5, T) weight matrix."""
        mask = (out_step == idx).astype(jnp.float32)
        safe_h = jnp.where(hj == 0, 1.0, hj)
        theta = jnp.clip((ts - t0j) / safe_h, 0.0, 1.0)
        om = 1.0 - theta
        w = jnp.stack([
            jnp.ones_like(theta), theta, theta * om,
            theta * theta * om, theta * theta * om * om,
        ]) * mask[None, :]  # (5, T)
        gr = _tm(lambda gl: jnp.tensordot(w, gl, axes=1), g)
        return tuple(_tm(lambda s: s[k], gr) for k in range(5))

    def seg_bwd(carry, s):
        g_y, g_f, g_args = carry

        def do(c):
            g_y, g_f, g_args = c
            # checkpoints may be stored narrowed (ckpt_dtype="bf16");
            # widen to the cotangent dtype for the replay/VJP inputs
            y_c = _tm(lambda b, gl: b[s].astype(gl.dtype), ckpts, g)
            if ckpt_f is not None:
                # segment-start FSAL eval recorded by the forward — the
                # forward's own (kernel-computed) f: skips one rhs eval
                # per segment (~0.1 ms/accepted-step end-to-end at
                # config-3 scale; XLA overlaps most of it)
                f_c = _tm(lambda b, yl: b[s].astype(yl.dtype),
                          ckpt_f, y_c)
            else:
                f_c = rhs(rec_t0[s * K], y_c, args)

            # ckpt_every=1: every accepted step's pre-step state is
            # checkpointed, so there is NO segment recompute — the
            # backward is one RHS eval (the FSAL f above) plus one
            # step VJP per accepted step, called directly below (no
            # stacks, no scan). This trades O(max_accepted) checkpoint
            # memory for skipping a full forward replay.
            ys_seg = fs_seg = None

            def fwd_body(cc, j):
                y, f = cc
                idx = s * K + j
                act = idx < n_acc
                y1, f1, _err, _interp = step(
                    rec_t0[idx], rec_h[idx], y, f, args
                )
                y_new = tree_where(act, y1, y)
                f_new = tree_where(act, f1, f)
                return (y_new, f_new), (y, f)

            if K != 1:
                _, (ys_seg, fs_seg) = jax.lax.scan(
                    fwd_body, (y_c, f_c), jnp.arange(K)
                )

            def bwd_body(cc, xs):
                g_y, g_f, g_args = cc
                j, y_j, f_j = xs
                idx = s * K + j
                # K == 1: the outer cond (s*K < n_acc) already proves
                # this step was accepted — the act masking below is
                # statically dead, and skipping it removes two
                # full-state selects plus a masked g_args accumulate
                # (~150 MB of pure HBM traffic per accepted step at
                # config-3 scale) from the backward glue.
                act = True if K == 1 else idx < n_acc
                t0j, hj = rec_t0[idx], rec_h[idx]

                # Fold dense-output cotangents into the step's gset
                # UNDER the cond: only the handful of steps whose
                # interpolant filled an output row (T of n_acc) pay the
                # five (5, N, *) tensordots and elementwise combines;
                # every other step's gset is just (g_y, 0, 0, g_f, g_y)
                # — materializing five zero trees and combining them on
                # every step cost ~0.4 ms/step of pure HBM traffic at
                # config-3 scale.
                def with_outputs():
                    gr1, gr2, gr3, gr4, gr5 = dense_cotangents(
                        idx, t0j, hj)
                    g_dy = _tm(
                        lambda a, b, c_, d: a + b - c_ + 2.0 * d,
                        g_y, gr2, gr3, gr4,
                    )
                    g_k1x = _tm(lambda a, b: hj * (a - b), gr3, gr4)
                    g_k7x = _tm(lambda a, b: a - hj * b, g_f, gr4)
                    g_y0d = tree_add(g_y, gr1)
                    return (g_dy, gr5, g_k1x, g_k7x, g_y0d)

                def without_outputs():
                    z = zeros_like_row(g)
                    return (g_y, z, z, g_f, g_y)

                gset = jax.lax.cond(
                    jnp.any(out_step == idx), with_outputs,
                    without_outputs,
                )
                gy0, gf0, gargs_j = step_vjp(
                    t0j, hj, y_j, f_j, args, gset,
                )
                if act is True:
                    g_y, g_f = gy0, gf0
                    g_args = tree_add(g_args, gargs_j)
                else:
                    g_y = tree_where(act, gy0, g_y)
                    g_f = tree_where(act, gf0, g_f)
                    g_args = _tm(
                        lambda a, b: a + jnp.where(
                            act, b, jnp.zeros_like(b)),
                        g_args, gargs_j,
                    )
                return (g_y, g_f, g_args), None

            if K == 1:
                # single-step segment: call the body directly — no
                # length-1 scan, no [None]-stack/reverse shuffling
                (g_y, g_f, g_args), _ = bwd_body(
                    (g_y, g_f, g_args), (jnp.asarray(0), y_c, f_c)
                )
            else:
                rev = (
                    jnp.arange(K - 1, -1, -1),
                    _tm(lambda b: b[::-1], ys_seg),
                    _tm(lambda b: b[::-1], fs_seg),
                )
                (g_y, g_f, g_args), _ = jax.lax.scan(
                    bwd_body, (g_y, g_f, g_args), rev
                )
            return g_y, g_f, g_args

        carry = jax.lax.cond(s * K < n_acc, do, lambda c: c,
                             (g_y, g_f, g_args))
        return carry, None

    # Whole-backward fast path: at ckpt_every=1 with the FSAL buffer
    # recorded, a hook may replay ALL accepted steps in one kernel
    # launch (grid (tile, step), cotangent carries in VMEM — see
    # ops/pallas/fused_dopri5.py::dopri5_backward_fused) instead of the
    # per-step scan below. Single-array states only; the scan stays the
    # general path.
    backward_all = getattr(step_vjp, "backward_all", None)
    use_whole = (
        backward_all is not None
        and K == 1
        and ckpt_f is not None
        and len(jax.tree_util.tree_leaves(g)) == 1
        and len(jax.tree_util.tree_leaves(ckpts)) == 1
    )
    if use_whole:
        ydef = jax.tree_util.tree_structure(ckpts)
        gy_l, gf_l, g_args = backward_all(
            jax.tree_util.tree_leaves(ckpts)[0],
            jax.tree_util.tree_leaves(ckpt_f)[0],
            rec_t0, rec_h, n_acc,
            jax.tree_util.tree_leaves(g)[0],
            out_step, ts, args,
        )
        g_y = jax.tree_util.tree_unflatten(ydef, [gy_l])
        g_f = jax.tree_util.tree_unflatten(ydef, [gf_l])
    else:
        init = (
            zeros_like_row(g),                  # g_y: cotangent of y after
            zeros_like_row(g),                  # g_f: cotangent of FSAL f
            tree_map(jnp.zeros_like, args) if args is not None else None,
        )
        (g_y, g_f, g_args), _ = jax.lax.scan(
            seg_bwd, init, jnp.arange(n_ckpt - 1, -1, -1)
        )

    # row 0 of ys is y0 written directly; the solve's initial FSAL eval
    # f0 = rhs(ts[0], y0, args) closes the chain
    g0 = _tm(lambda gl: gl[0], g)
    g_y0 = tree_add(g_y, g0)
    # rows never filled (max_accepted/max_steps exhaustion) hold NaN in
    # the forward; their cotangents match no accepted step and would be
    # silently DROPPED here, turning a loudly-poisoned value into a
    # quietly-finite gradient. Route them into g_y0 instead: a loss that
    # touched a poisoned row carries NaN cotangents and the gradient
    # NaN-poisons too; a loss that never touched one adds exact zeros.
    unfilled = (out_step == -1) & (jnp.arange(out_step.shape[0]) > 0)
    g_tail = _tm(
        lambda gl: jnp.tensordot(
            unfilled.astype(gl.dtype),
            gl.reshape(gl.shape[0], -1),
            axes=1,
        ).reshape(gl.shape[1:]),
        g,
    )
    g_y0 = tree_add(g_y0, g_tail)
    y00 = _tm(lambda b, gl: b[0].astype(gl.dtype), ckpts, g)
    _, pull0 = jax.vjp(lambda y_, a_: rhs(ts[0], y_, a_), y00, args)
    gy_f0, gargs_f0 = pull0(g_f)
    g_y0 = tree_add(g_y0, gy_f0)
    if g_args is not None:
        g_args = tree_add(g_args, gargs_f0)
    grad_ts = jnp.zeros_like(ts)  # output-time gradients not propagated
    return g_y0, grad_ts, g_args


_odeint_disc.defvjp(_disc_fwd, _disc_bwd)


def odeint_discrete_adjoint(
    rhs,
    y0,
    ts,
    args=None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 16384,
    max_accepted: int = 512,
    ckpt_every: int = 16,
    store_f=False,
    ckpt_dtype=None,
    step_impl=None,
    step_vjp=None,
):
    """Adaptive DOPRI5 solve with discrete-adjoint (backprop-through-
    the-solver) gradients.

    Same interface/returns as :func:`dopri5_solve` (without stats);
    gradients flow to ``y0`` and ``args``, output-time gradients are
    zero — drop-in for :func:`ode.adjoint.odeint_adjoint` with a
    cheaper, exact backward.

    ``max_accepted`` caps the recordable accepted-step count: a solve
    that would exceed it stops and NaN-poisons the remaining output
    rows (loud failure, like ``max_steps``) — size it ~2x the expected
    accepted count. ``ckpt_every`` trades checkpoint memory
    (``max_accepted/ckpt_every`` states) against recompute window size.

    ``store_f`` (False | True | "bf16") additionally records the
    pre-step FSAL eval at every checkpoint so the backward skips its
    per-segment ``rhs`` re-evaluation, at the cost of a second
    checkpoint buffer (halved by "bf16", whose rounding of the
    backward's linearization point is the bf16-backward noise class).
    End-to-end win is modest — ~0.1 ms per accepted step at config-3
    scale (XLA overlaps most of the skipped eval;
    docs/evidence_round4/config3_storef.json).

    ``ckpt_dtype`` ("bf16" | None) narrows the state-checkpoint buffer
    the same way — the backward linearizes each step at a bf16 rounding
    of the accepted state. With both narrowed, ``store_f`` costs no
    memory over the plain f32 state buffer. Values are unaffected
    (checkpoints are only read by the backward).

    ``step_impl``/``step_vjp`` must be provided TOGETHER (e.g. from
    :func:`ops.pallas.fused_dopri5.make_fused_dopri5_hooks`): the generic
    ``jax.vjp`` fallback differentiates the step function itself, which
    fails at trace time for a Pallas step kernel with no AD rule — an
    opaque error far from the misuse site. A custom step_impl that IS
    reverse-differentiable may opt into the fallback explicitly with
    ``step_vjp="generic"``.
    """
    if (step_impl is None) != (step_vjp is None):
        raise ValueError(
            "step_impl and step_vjp must be provided together (see "
            "ops.pallas.fused_dopri5.make_fused_dopri5_hooks); the "
            "generic fallback would jax.vjp the step function itself, "
            "which fails at trace time for Pallas step kernels. Pass "
            "step_vjp='generic' to differentiate a custom "
            "reverse-differentiable step_impl, or step_impl='tableau' "
            "to pair a custom step_vjp with the generic tableau step."
        )
    if isinstance(step_vjp, str):
        if step_vjp != "generic":
            raise ValueError(f"unknown step_vjp sentinel {step_vjp!r}")
        step_vjp = None
    if isinstance(step_impl, str):
        if step_impl != "tableau":
            raise ValueError(f"unknown step_impl sentinel {step_impl!r}")
        step_impl = None
    return _odeint_disc(
        rhs, step_impl, step_vjp, rtol, atol, max_steps, max_accepted,
        ckpt_every, store_f, ckpt_dtype, y0, jnp.asarray(ts), args,
    )
