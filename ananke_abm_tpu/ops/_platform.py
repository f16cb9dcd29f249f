"""Backend detection shared by the kernel-dispatch sites.

Kept pallas-import-free so dispatch modules (ops/segment.py) can decide
between the XLA and Pallas paths without paying the
``jax.experimental.pallas`` import unless a kernel is actually used.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. the axon
    plugin, which reports platform "tpu" on its devices)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
