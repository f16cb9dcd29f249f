"""Integrator core: the TPU-native replacement for torchdiffeq/torchsde.

Entry points:
    - :func:`odeint` — unified dispatcher over methods & gradient modes.
    - :func:`rk4_solve`, :func:`euler_solve` — fixed-step, checkpointed
      backprop-through-scan gradients.
    - :func:`dopri5_solve` — adaptive, dense output, forward-only.
    - :func:`odeint_adjoint` — adaptive with continuous-adjoint gradients.
    - :func:`euler_maruyama_solve` — diagonal-noise Itô SDE.
"""
from __future__ import annotations

from ananke_abm_tpu.ode.adjoint import odeint_adjoint
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
):
    """Unified ODE solve.

    method="rk4"/"euler": fixed-step (``substeps`` per output interval),
    differentiable via checkpointed backprop.
    method="dopri5": adaptive; ``adjoint=True`` gives continuous-adjoint
    gradients, ``adjoint=False`` is forward-only (inference).
    """
    if method == "rk4":
        return rk4_solve(rhs, y0, ts, args, substeps=substeps)
    if method == "euler":
        return euler_solve(rhs, y0, ts, args, substeps=substeps)
    if method == "dopri5":
        if adjoint:
            return odeint_adjoint(
                rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps
            )
        ys, _ = dopri5_solve(
            rhs, y0, ts, args, rtol=rtol, atol=atol, max_steps=max_steps
        )
        return ys
    raise ValueError(f"Unknown ODE method: {method!r}")


__all__ = [
    "odeint",
    "odeint_adjoint",
    "dopri5_solve",
    "rk4_solve",
    "euler_solve",
    "euler_maruyama_solve",
]
