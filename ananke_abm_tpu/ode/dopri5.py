"""Adaptive Dormand–Prince 5(4) integrator inside ``jit``.

TPU-native replacement for ``torchdiffeq.odeint(..., method="dopri5")``
(reference: src/ananke_abm/models/latent_ode/architecture/model.py:194-196,
ode_components.py:29-50) — adaptive step control runs in a
``lax.while_loop`` with fixed-shape state; dense output at the requested
times uses the standard DOPRI5 4th-order continuous extension, so there is
no data-dependent shape anywhere.

Gradients: the while_loop is not reverse-differentiable by design — use
``ananke_abm_tpu.ode.adjoint.odeint_adjoint`` (continuous adjoint) or
``rk4_solve`` (checkpointed backprop) for training.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ananke_abm_tpu.ode.tree import (
    tree_axpy,
    tree_buffer_set,
    tree_error_norm,
    tree_lincomb,
    tree_map,
    tree_stack_buffer,
    tree_where,
)

# Dormand–Prince 5(4) tableau.
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
# 5th-order solution weights (same as last A row — FSAL).
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
# Embedded 4th-order weights.
_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)
# Dense-output coefficients (Hairer CONTD5).
_D = (
    -12715105075.0 / 11282082432.0,
    0.0,
    87487479700.0 / 32700410799.0,
    -10690763975.0 / 1880347072.0,
    701980252875.0 / 199316789632.0,
    -1453857185.0 / 822651844.0,
    69997945.0 / 29380423.0,
)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -0.2  # err ** (-1/5)


class ErrNormSq(NamedTuple):
    """Pre-reduced error norm from a fused step kernel.

    A ``step_impl`` may return this in place of the raw ``err`` pytree:
    ``sq_sum`` is ``sum((err/scale)^2)`` with the Hairer scale
    ``atol + rtol*max(|y0|,|y1|)`` already applied (padded rows masked),
    ``count`` the number of real elements. The controller then skips
    :func:`tree_error_norm`'s full-state HBM re-read — at config-3 scale
    that pass (err+y0+y1, ~75 MB/attempted step) plus the kernel's err
    write were ~25% of the forward controller glue.
    """

    sq_sum: jnp.ndarray  # scalar f32
    count: int


class _Interp(NamedTuple):
    """Continuous extension over one accepted step [t0, t0+h].

    LAZY representation: the CONTD5 coefficients r2..r4 are elementwise
    in (y0, f0, y1, f1) — r2 = y1-y0, r3 = h*f0-r2, r4 = r2-h*f1-r3 —
    so the step stores the raw endpoints (arrays it produces anyway)
    and :func:`_dense_eval` forms the coefficients only when an output
    row is actually filled (a handful of accepted steps per solve).
    The eager form cost three extra elementwise passes over the full
    state on EVERY attempted step (~0.1 ms/step of the config-3
    controller glue, docs/evidence_round4/config3_fwd_ablate.json).
    Only ``r5 = h * sum d_i k_i`` needs the stage evals, so it alone is
    materialized by the step.
    """

    t0: jnp.ndarray
    h: jnp.ndarray
    y0: object
    f0: object  # k1
    y1: object
    f1: object  # k7
    r5: object  # h * sum d_i k_i


def _dense_eval(interp: _Interp, t):
    # guard h == 0 (duplicate output times / zero-span integration)
    h = interp.h
    safe_h = jnp.where(h == 0, 1.0, h)
    theta = jnp.clip((t - interp.t0) / safe_h, 0.0, 1.0)
    om = 1.0 - theta

    def leaf(y0, f0, y1, f1, r5):
        r2 = y1 - y0
        r3 = h * f0 - r2
        r4 = r2 - h * f1 - r3
        return y0 + theta * (r2 + om * (r3 + theta * (r4 + om * r5)))

    return tree_map(leaf, interp.y0, interp.f0, interp.y1, interp.f1,
                    interp.r5)


def _step(rhs, t0, h, y0, f0, args):
    """One DOPRI5 step. Returns (y1, f1(FSAL), err_norm_inputs, interp)."""
    ks = [f0]
    for i in range(1, 7):
        y_stage = y0
        row = _A[i]
        y_stage = tree_axpy(h * row[0], ks[0], y_stage)
        for j in range(1, len(row)):
            if row[j] != 0.0:
                y_stage = tree_axpy(h * row[j], ks[j], y_stage)
        ks.append(rhs(t0 + _C[i] * h, y_stage, args))

    incr5 = tree_lincomb([h * b for b in _B5[:6]], ks[:6])
    y1 = tree_map(jnp.add, y0, incr5)
    f1 = ks[6]  # FSAL: f(t0 + h, y1)

    # error = h * sum (b5 - b4) k_i
    e_coeffs = [h * (b5 - b4) for b5, b4 in zip(_B5, _B4)]
    err = tree_lincomb(e_coeffs, ks)

    d_nz = [(c, k) for c, k in zip(_D, ks) if c != 0.0]
    r5 = tree_lincomb([h * c for c, _ in d_nz], [k for _, k in d_nz])
    interp = _Interp(t0=t0, h=h, y0=y0, f0=ks[0], y1=y1, f1=f1, r5=r5)
    return y1, f1, err, interp


def _initial_step(rhs, t0, y0, f0, args, rtol, atol, direction=1.0):
    """Hairer's automatic initial step size (HINIT)."""

    def norm(tree, scale):
        sq = sum(
            jnp.sum((l / s) ** 2)
            for l, s in zip(
                jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(scale)
            )
        )
        n = sum(l.size for l in jax.tree_util.tree_leaves(tree))
        return jnp.sqrt(sq / n)

    scale = tree_map(lambda y: atol + rtol * jnp.abs(y), y0)
    d0 = norm(y0, scale)
    d1 = norm(f0, scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)

    y1 = tree_axpy(direction * h0, f0, y0)
    f1 = rhs(t0 + direction * h0, y1, args)
    d2 = norm(tree_map(jnp.subtract, f1, f0), scale) / h0
    dm = jnp.maximum(d1, d2)
    # Hairer HINIT: h1 = (0.01 / max(d1, d2))^(1/(p+1)) with p = 5 for the
    # DOPRI5 pair, so the exponent is 1/6 (not 1/5).
    h1 = jnp.where(
        dm <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / dm) ** (1.0 / 6.0),
    )
    return jnp.minimum(100.0 * h0, h1)


def dopri5_solve(
    rhs,
    y0,
    ts,
    args=None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 16384,
    first_step=None,
    step_impl=None,
    record=None,
):
    """Integrate with adaptive DOPRI5, returning dense output at ``ts``.

    Args:
        rhs: ``(t, y, args) -> dy/dt`` over pytrees.
        y0: state at ``ts[0]``.
        ts: (T,) strictly increasing output times (may be traced values).
        args: parameter pytree.
        rtol, atol: tolerances for the scaled RMS error norm.
        max_steps: hard cap on attempted steps (fixed-shape bound).
        first_step: optional initial step size; automatic if None.
        step_impl: optional replacement for the generic tableau step —
            ``step_impl(t0, h, y, f, args) -> (y1, f1, err, interp)``
            with the same contract as the internal ``_step`` (``f`` is
            the FSAL eval at ``(t0, y)``; ``interp`` an ``_Interp``).
            The fused Pallas dopri5-step kernels plug in here: the
            controller (accept/reject, dense output, poisoning, stats)
            stays THIS one tested copy; only the 6-stage evaluation is
            swapped. ``rhs`` is still used for the initial eval and
            HINIT.
        record: optional ``{"max_accepted": int, "ckpt_every": int}``.
            Records the accepted-step sequence for the discrete adjoint
            (ode/discrete_adjoint.py): stats gains ``rec_t0``/``rec_h``
            (max_accepted,) start time and ACTUAL (clamped) step size
            per accepted step, ``out_step`` (T,) the accepted-step
            ordinal whose interpolant filled each output row (-1 for
            row 0, written directly), and ``ckpts`` — the pre-step
            state ``y`` at every ``ckpt_every``-th accepted step
            (leaves ``(ceil(max_accepted/ckpt_every),) + leaf.shape``).
            Optional ``"store_f"`` (False | True | "bf16") additionally
            records the pre-step FSAL eval ``f`` at the same indices as
            ``stats["ckpt_f"]`` — the discrete adjoint's backward then
            starts each segment from the forward's own kernel-computed
            ``f`` instead of re-evaluating ``rhs`` (~0.1 ms per
            accepted step end-to-end at config-3 scale — XLA overlaps
            most of the skipped eval). ``"bf16"`` halves the buffer at
            the bf16-backward noise class; True stores the exact f32.
            Optional ``"ckpt_dtype"`` ("bf16") likewise narrows the
            state-checkpoint buffer itself — the backward then
            linearizes each step at a bf16 rounding of the accepted
            state (the bf16-backward noise class again); together with
            ``store_f="bf16"`` the two buffers cost what the f32 state
            buffer alone did.
            Solves that would exceed ``max_accepted`` accepted steps
            stop and NaN-poison the unfilled rows exactly like
            ``max_steps`` exhaustion (``ok`` False) — a silent
            truncation would make gradients wrong, a loud one makes the
            cap a visible tuning knob.

    Returns:
        (ys, stats) where ys has leaves of shape ``(T,) + leaf.shape`` and
        stats is a dict with ``n_steps``, ``n_accepted``, ``ok``.
    """
    ts = jnp.asarray(ts)
    num_out = ts.shape[0]
    t0 = ts[0]
    t_end = ts[-1]

    f0 = rhs(t0, y0, args)
    if first_step is None:
        h_init = _initial_step(rhs, t0, y0, f0, args, rtol, atol)
    elif isinstance(first_step, (int, float)):
        h_init = jnp.asarray(first_step, dtype=ts.dtype)
    else:
        # traced/array first_step: values <= 0 mean "auto" — lax.cond
        # runs HINIT's two probe evals only when actually needed. This
        # is the warm-restart hook; NOTE it is currently unused —
        # ode/adjoint.py measured threading the previous interval's
        # proposed step through its backward scan and REJECTED it
        # (669 vs 643 aug steps, see adjoint.py:29-33) — kept for
        # callers with correlated intervals.
        fs = jnp.asarray(first_step, dtype=ts.dtype)
        h_init = jax.lax.cond(
            fs > 0,
            lambda: fs,
            lambda: _initial_step(rhs, t0, y0, f0, args, rtol, atol),
        )
    h_init = jnp.minimum(h_init, t_end - t0)

    ys = tree_stack_buffer(y0, num_out)
    ys = tree_buffer_set(ys, 0, y0)

    step = step_impl if step_impl is not None else functools.partial(
        _step, rhs
    )

    if record is not None:
        max_acc = int(record["max_accepted"])
        ckpt_every = int(record["ckpt_every"])
        store_f = record.get("store_f", False)
        ckpt_dtype = record.get("ckpt_dtype")
        # loud validation: a typo'd value would otherwise silently pick
        # a different memory/precision configuration (e.g. a full-size
        # f32 ckpt_f buffer — the pairing that OOMs one chip at
        # config-3 scale)
        if store_f not in (False, True, "bf16"):
            raise ValueError(
                f"store_f must be False, True, or 'bf16'; got {store_f!r}"
            )
        if ckpt_dtype not in (None, "bf16"):
            raise ValueError(
                f"ckpt_dtype must be None or 'bf16'; got {ckpt_dtype!r}"
            )
        y_dtype = jnp.bfloat16 if ckpt_dtype == "bf16" else None
        n_ckpt = -(-max_acc // ckpt_every)
        rec0 = {
            "rec_t0": jnp.zeros((max_acc,), ts.dtype),
            "rec_h": jnp.zeros((max_acc,), ts.dtype),
            "out_step": jnp.full((num_out,), -1, jnp.int32),
            "ckpts": tree_map(
                lambda l: jnp.zeros((n_ckpt,) + jnp.shape(l),
                                    y_dtype or jnp.asarray(l).dtype), y0
            ),
        }
        if store_f:
            f_dtype = jnp.bfloat16 if store_f == "bf16" else None
            rec0["ckpt_f"] = tree_map(
                lambda l: jnp.zeros(
                    (n_ckpt,) + jnp.shape(l),
                    f_dtype or jnp.asarray(l).dtype), f0
            )
    else:
        rec0 = None
        store_f = False

    def fill_outputs(carry, interp, t_new, n_acc):
        """Write every requested output time that falls inside this step."""
        out_idx, ys, out_step = carry
        eps = 1e-7 * jnp.maximum(jnp.abs(t_new), 1.0)

        def cond(c):
            i, _, _ = c
            return (i < num_out) & (ts[jnp.minimum(i, num_out - 1)] <= t_new + eps)

        def body(c):
            i, ys, out_step = c
            y_t = _dense_eval(interp, ts[i])
            if out_step is not None:
                out_step = out_step.at[i].set(n_acc)
            return i + 1, tree_buffer_set(ys, i, y_t), out_step

        return jax.lax.while_loop(cond, body, (out_idx, ys, out_step))

    State = tuple  # (t, y, f, h, out_idx, ys, n_steps, n_accepted, rec)

    def cond_fn(s: State):
        t, _, _, _, out_idx, _, n_steps, n_acc, _ = s
        more = (out_idx < num_out) & (n_steps < max_steps)
        if record is not None:
            more = more & (n_acc < max_acc)
        return more

    def body_fn(s: State):
        t, y, f, h, out_idx, ys, n_steps, n_acc, rec = s
        h = jnp.minimum(h, t_end - t)
        y1, f1, err, interp = step(t, h, y, f, args)
        if isinstance(err, ErrNormSq):
            # fused step kernels pre-reduce the scaled error in-kernel
            err_norm = jnp.sqrt(err.sq_sum / err.count)
        else:
            err_norm = tree_error_norm(err, y, y1, rtol, atol)
        # guard NaN: treat as rejection with aggressive shrink
        bad = ~jnp.isfinite(err_norm)
        err_norm = jnp.where(bad, 2.0, err_norm)
        accept = err_norm <= 1.0

        factor = _SAFETY * jnp.power(jnp.maximum(err_norm, 1e-10), _ORDER_EXP)
        factor = jnp.clip(factor, _MIN_FACTOR, _MAX_FACTOR)
        factor = jnp.where(bad, _MIN_FACTOR, factor)
        h_next = h * factor

        t_new = t + h
        out_step = None if rec is None else rec["out_step"]
        # dense-output rows land only on accepted steps: running the fill
        # under cond (fill-or-passthrough) keeps the (T, N, *) output
        # buffer IN PLACE on rejections AND on accepts that cover no
        # output time — the previous fill-then-select moved the buffer's
        # full footprint (e.g. 302 MB at config-3 scale) through HBM on
        # every attempted step, which dominated the controller overhead.
        out_idx, ys, out_step = jax.lax.cond(
            accept,
            lambda c: fill_outputs(c, interp, t_new, n_acc),
            lambda c: c,
            (out_idx, ys, out_step),
        )

        if rec is not None:
            # the big ckpt buffer is written under the SAME cond it's
            # needed (accepted ckpt_every-th step) — an accept-select
            # over the whole buffer would move its full footprint every
            # attempted step
            def _write(bufs, vals):
                return tree_map(
                    lambda buf, l: jax.lax.dynamic_update_index_in_dim(
                        buf, l.astype(buf.dtype), n_acc // ckpt_every, 0
                    ),
                    bufs, vals,
                )

            bufs = (rec["ckpts"], rec["ckpt_f"]) if store_f \
                else (rec["ckpts"],)
            vals = (y, f) if store_f else (y,)
            bufs = jax.lax.cond(
                accept & (n_acc % ckpt_every == 0),
                lambda b: _write(b, vals),
                lambda b: b,
                bufs,
            )
            rec = {
                "rec_t0": jnp.where(
                    accept, rec["rec_t0"].at[n_acc].set(t), rec["rec_t0"]
                ),
                "rec_h": jnp.where(
                    accept, rec["rec_h"].at[n_acc].set(h), rec["rec_h"]
                ),
                "out_step": out_step,
                "ckpts": bufs[0],
            }
            if store_f:
                rec["ckpt_f"] = bufs[1]

        t = jnp.where(accept, t_new, t)
        y = tree_where(accept, y1, y)
        f = tree_where(accept, f1, f)
        return (t, y, f, h_next, out_idx, ys, n_steps + 1, n_acc + accept,
                rec)

    init = (t0, y0, f0, h_init, jnp.asarray(1), ys, jnp.asarray(0),
            jnp.asarray(0), rec0)
    t, y, f, h, out_idx, ys, n_steps, n_acc, rec = jax.lax.while_loop(
        cond_fn, body_fn, init
    )
    ok = out_idx >= num_out

    # Failure surfacing: rows past out_idx were never written and would
    # otherwise hold stale buffer contents. Poison them with NaN so a
    # stiff-regime max_steps exhaustion is loud (NaN loss / debug_nan_mode)
    # instead of silently wrong, and print a diagnostic.
    unfilled = jnp.arange(num_out) >= out_idx

    def poison(buf):
        if not jnp.issubdtype(buf.dtype, jnp.inexact):
            return buf
        shape = (num_out,) + (1,) * (buf.ndim - 1)
        return jnp.where(unfilled.reshape(shape), jnp.nan, buf)

    ys = tree_map(poison, ys)
    # Optional loud diagnostic. Off by default: some PJRT backends (the
    # axon TPU tunnel) don't support host callbacks, so jax.debug.print
    # would crash the solve. NaN poisoning above is the always-on signal.
    if os.environ.get("ANANKE_DEBUG_ODE"):
        jax.lax.cond(
            ok,
            lambda: None,
            lambda: jax.debug.print(
                "dopri5_solve: max_steps={m} exhausted at t={t} "
                "({k}/{n} outputs filled; unfilled rows are NaN)",
                m=max_steps, t=t, k=out_idx, n=num_out,
            ),
        )
    stats = {
        "n_steps": n_steps,
        "n_accepted": n_acc,
        "ok": ok,
        # the step-size controller's next proposal — a warm-start
        # first_step for an adjacent solve of the same system (the
        # adjoint backward threads it across intervals)
        "h_next": h,
    }
    if rec is not None:
        stats.update(rec)
    return ys, stats
