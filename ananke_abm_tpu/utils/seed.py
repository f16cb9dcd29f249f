"""Seeding helpers.

JAX PRNG is explicit/functional — there is no global device RNG to seed
(unlike the reference's torch/cuda seeding at
src/ananke_abm/models/gen_schedule/utils/seed.py:5-9). We seed host-side
numpy/python for data shuffles and return a base jax key for the pipelines.
"""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    """Seed host RNGs; returns a jax.random key for device-side sampling."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
