"""Grid dataset loading + seeded splits (reference
src/ananke_abm/models/gen_schedule/dataio/splits.py:6-27).

Instead of torch Dataset/Subset objects pickled into ``_splits.pt``, the
TPU-native pipeline keeps the whole (N, T) int grid as one host array and
materializes train/val as index arrays — the train loop then device-puts
the full grid once and gathers shuffled batches on-device.
"""
from __future__ import annotations

import numpy as np


def load_grid(npz_path: str) -> np.ndarray:
    obj = np.load(npz_path)
    if "Y" not in obj:
        raise RuntimeError(f"Expected 'Y' in grid npz {npz_path}")
    return obj["Y"].astype(np.int64)


def load_splits(splits_path: str):
    obj = np.load(splits_path)
    return obj["train_idx"], obj["val_idx"]


def read_n_split_data(data_npz_path: str, val_frac: float = 0.1, seed: int = 42):
    """Load grid and produce a fresh seeded split (no splits file needed)."""
    Y = load_grid(data_npz_path)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(Y.shape[0])
    n_val = int(round(val_frac * Y.shape[0]))
    val_idx = np.sort(perm[:n_val])
    train_idx = np.sort(perm[n_val:])
    return Y[train_idx], Y[val_idx]
