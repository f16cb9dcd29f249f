"""Integrator core: the TPU-native replacement for torchdiffeq/torchsde.

Entry points:
    - :func:`odeint` — unified dispatcher over methods & gradient modes.
    - :func:`rk4_solve`, :func:`euler_solve` — fixed-step, checkpointed
      backprop-through-scan gradients.
    - :func:`dopri5_solve` — adaptive, dense output, forward-only.
    - :func:`odeint_adjoint` — adaptive with continuous-adjoint gradients.
    - :func:`odeint_discrete_adjoint` — adaptive with discrete-adjoint
      (backprop-through-the-accepted-steps) gradients.
    - :func:`euler_maruyama_solve` — diagonal-noise Itô SDE.
"""
from __future__ import annotations

import jax

from ananke_abm_tpu.ode.adjoint import odeint_adjoint
from ananke_abm_tpu.ode.discrete_adjoint import odeint_discrete_adjoint
from ananke_abm_tpu.ode.dopri5 import dopri5_solve
from ananke_abm_tpu.ode.rk4 import euler_solve, rk4_solve
from ananke_abm_tpu.ode.sde import euler_maruyama_solve


def odeint(
    rhs,
    y0,
    ts,
    args=None,
    *,
    method: str = "dopri5",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    substeps: int = 1,
    max_steps: int = 16384,
    adjoint: bool = True,
    return_stats: bool = False,
    checkpoint: bool = True,
):
    """Unified ODE solve.

    method="rk4"/"euler": fixed-step (``substeps`` per output interval),
    differentiable via checkpointed backprop; ``checkpoint=False`` keeps
    every stage value live instead of rematerializing in the backward
    pass — faster when the horizon x batch fits HBM (short horizons),
    required knob for the scan-remat trade (SURVEY.md §5).
    method="dopri5": adaptive; ``adjoint=True`` gives continuous-adjoint
    gradients, ``adjoint=False`` is forward-only (inference).

    ``return_stats=True`` returns ``(ys, stats)`` with the solver's
    ``n_steps``/``n_accepted``/``ok`` (fixed-step methods report
    trivially-ok stats). Independent of this flag, a dopri5 ``max_steps``
    exhaustion NaN-poisons the unfilled output rows and prints a
    diagnostic — stale-buffer garbage can never flow onward silently.
    """
    import jax.numpy as _jnp

    def _fixed_stats(ys):
        n = (len(ts) - 1) * substeps
        return {
            "n_steps": _jnp.asarray(n),
            "n_accepted": _jnp.asarray(n),
            "ok": _jnp.asarray(True),
        }

    if method == "rk4":
        ys = rk4_solve(rhs, y0, ts, args, substeps=substeps,
                       checkpoint=checkpoint)
        return (ys, _fixed_stats(ys)) if return_stats else ys
    if method == "euler":
        ys = euler_solve(rhs, y0, ts, args, substeps=substeps,
                         checkpoint=checkpoint)
        return (ys, _fixed_stats(ys)) if return_stats else ys
    if method == "dopri5":
        if adjoint:
            ys = odeint_adjoint(
                rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps
            )
            if not return_stats:
                return ys
            # adjoint mode has no step stats (custom_vjp forward discards
            # them); report ok from the NaN poisoning of the last row
            leaves = jax.tree_util.tree_leaves(ys)
            ok = _jnp.all(
                _jnp.stack([_jnp.isfinite(l[-1]).all() for l in leaves])
            )
            return ys, {"n_steps": None, "n_accepted": None, "ok": ok}
        ys, stats = dopri5_solve(
            rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps
        )
        return (ys, stats) if return_stats else ys
    raise ValueError(f"Unknown ODE method: {method!r}")


__all__ = [
    "odeint",
    "odeint_adjoint",
    "odeint_discrete_adjoint",
    "dopri5_solve",
    "rk4_solve",
    "euler_solve",
    "euler_maruyama_solve",
]
