"""Checkpoint save/restore.

Keeps the reference's conventions (SURVEY.md §5): a {last, best_val} pair
with ``meta`` and ``cfg`` embedded in the checkpoint object (downstream
sample/eval CLIs read meta+cfg straight out of the ckpt, reference
pipeline/sample.py:78-96). Unlike the reference (save-only,
utils/ckpt.py:4-8), checkpoints here carry ``opt_state`` and ``step`` so
training can restore-and-continue.

Format: a single pickle file holding host numpy pytrees — portable across
backends and process restarts, no torch dependency.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_checkpoint(obj: dict, path: str):
    """Save a checkpoint dict (params/opt_state/meta/cfg/step/...)."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(obj), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic — a crash never corrupts the last ckpt


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class AsyncCheckpointer:
    """Orbax-style asynchronous checkpointing (SURVEY.md §5): device->host
    transfer happens on the caller thread (cheap, and required before the
    arrays can be mutated by the next step), the disk write runs on a
    background thread so training never blocks on IO. ``wait()`` joins the
    in-flight write; a new save waits for the previous one first."""

    def __init__(self):
        self._thread = None

    def save(self, obj: dict, path: str):
        import threading

        self.wait()
        host_obj = _to_host(obj)
        self._thread = threading.Thread(
            target=save_checkpoint, args=(host_obj, path), daemon=True
        )
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
