"""Profiling + observability (SURVEY.md §5 aux subsystems).

The reference's instrumentation is wall-clock prints and a people/s
benchmark harness (latent_ode/inference/inference.py:221-270). Here:
- ``phase_timer`` context: named wall-clock spans, collected per run;
- ``trace`` context: wraps ``jax.profiler.trace`` to capture a TensorBoard
  trace of a region;
- ``throughput``: generic items/s measurement with compile/steady-state
  separation; synced by dependency-chained scalar pulls (on the remote
  axon backend ``block_until_ready`` does not reliably force execution);
- ``debug_nan_mode``: enables jax_debug_nans (the determinism/NaN-check
  flag SURVEY.md §5 calls for).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Dict, List

import jax


class PhaseTimes:
    """Collects named wall-clock spans; writes JSONL."""

    def __init__(self):
        self.records: List[Dict] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.records.append(
                {"phase": name, "seconds": time.time() - t0, "t_end": time.time()}
            )

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r["phase"]] = out.get(r["phase"], 0.0) + r["seconds"]
        return out

    def dump(self, path: str):
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "a", encoding="utf-8") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> float:
    """Force execution of ``out`` via a device->host scalar pull.

    ``block_until_ready`` can return before queued work executes on the
    remote axon backend (measured in round 3); summing a leaf and pulling
    the scalar to host provably waits for everything ``out`` depends on.
    """
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def throughput(
    fn: Callable, *args, items: int, iters: int = 10, warmup: int = 2
) -> Dict[str, float]:
    """items/s of a jitted callable, separating compile from steady state."""
    t0 = time.time()
    _sync(fn(*args))
    compile_s = time.time() - t0
    for _ in range(max(0, warmup - 1)):
        _sync(fn(*args))
    import jax.numpy as jnp

    t0 = time.time()
    acc = None
    for _ in range(iters):
        s = jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0])
        acc = s if acc is None else acc + s
    float(acc)  # chained pull: provably waits for ALL iters executions
    dt = (time.time() - t0) / iters
    return {
        "items_per_s": items / dt,
        "ms_per_call": dt * 1e3,
        "first_call_s": compile_s,
    }


@contextlib.contextmanager
def debug_nan_mode(enable: bool = True):
    """Enable jax_debug_nans within the context (NaN-check mode flag)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class JsonlLogger:
    """Structured JSONL training logger (per-loss-component rows)."""

    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)

    def log(self, record: Dict):
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
