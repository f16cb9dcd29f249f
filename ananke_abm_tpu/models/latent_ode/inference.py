"""Batched inference for the GenerativeODE.

Parity with the reference BatchedInferenceEngine
(src/ananke_abm/models/latent_ode/inference/inference.py:15-270):
- load checkpoint, batch people, one solver call per batch over shared
  times;
- ``predict_trajectories(num_samples)`` stacks stochastic rollouts into
  (people, samples, times) argmax ids (and purpose/mode ids);
- ``benchmark_performance`` measures people/s at several batch sizes and
  projects wall time for 1M people.

Here a "batch" is a vmapped sample axis fused with the person axis inside
one jit — stochastic samples come from fold_in'd keys, so throughput
scales with one compiled program instead of a Python loop over batches.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.models.latent_ode.config import GenerativeODEConfig
from ananke_abm_tpu.models.latent_ode.data import (
    get_person_sample,
    unify_and_interpolate_batch,
)
from ananke_abm_tpu.models.latent_ode.model import GenerativeODE
from ananke_abm_tpu.models.latent_ode.train import (
    batch_to_device,
    make_forward,
)
from ananke_abm_tpu.utils import load_checkpoint


# batch-dict arrays whose leading axis is the person axis (shardable over
# the mesh's agent axis); everything else (t_unified, zone tables, the
# distance matrix) stays replicated
PERSON_AXIS_KEYS = (
    "person_features", "home_zone_ids", "work_zone_ids",
    "initial_purpose_features", "initial_mode_features",
    "y_loc_dense", "y_purp_dense", "y_mode_dense",
    "y_purp_feat_dense", "y_mode_feat_dense", "loss_mask",
    "prev_real_indices", "next_real_indices", "importance_weights",
)


def _cfg_from_dict(d: dict) -> GenerativeODEConfig:
    fields = {f.name for f in dataclasses.fields(GenerativeODEConfig)}
    d = {k: v for k, v in d.items() if k in fields}
    if "purpose_groups" in d:
        d["purpose_groups"] = tuple(d["purpose_groups"])
    return GenerativeODEConfig(**d)


class BatchedInferenceEngine:
    def __init__(self, ckpt_path: str, person_ids=(1, 2), mesh=None):
        """``mesh``: optional (agents x zones) Mesh — the person axis of
        every batch array shards over the agent axis; params replicated."""
        obj = load_checkpoint(ckpt_path)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P_

            from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

            person_keys = frozenset(PERSON_AXIS_KEYS)
            sh = NamedSharding(mesh, P_(AGENT_AXIS))

            def _shard_batch(b):
                return {
                    k: (
                        jax.lax.with_sharding_constraint(v, sh)
                        if k in person_keys
                        else v
                    )
                    for k, v in b.items()
                }
        else:
            def _shard_batch(b):
                return b
        self._shard_batch = _shard_batch
        self.config = _cfg_from_dict(obj["config"])
        self.person_ids = list(person_ids)
        samples = [get_person_sample(p, self.config) for p in self.person_ids]
        self.batch = batch_to_device(
            unify_and_interpolate_batch(samples, self.config)
        )
        self.model = GenerativeODE(
            person_feat_dim=self.batch["person_features"].shape[-1],
            num_zone_features=self.batch["all_zone_features"].shape[-1],
            config=self.config,
        )
        self.params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
        self._forward = make_forward(self.model)

        import functools

        @functools.partial(jax.jit, static_argnames=("num_samples",))
        def _sample_many(params, b, key, times, num_samples):
            bb = dict(b)
            bb["t_unified"] = times
            bb = self._shard_batch(bb)

            def one(rng):
                out = self._forward(params, bb, rng)
                return (
                    jnp.argmax(out[0], -1),
                    jnp.argmax(out[2], -1),
                    jnp.argmax(out[3], -1),
                )

            keys = jax.random.split(key, num_samples)
            return jax.vmap(one)(keys)  # (S, B, T) each

        self._sample_many = _sample_many

    def predict_trajectories(
        self, num_samples: int = 3, times=None, seed: int = 0
    ):
        """Returns dict of (people, samples, times) argmax id arrays."""
        if times is None:
            times = self.batch["t_unified"]
        else:
            times = jnp.asarray(times, jnp.float32)
        loc, purp, mode = self._sample_many(
            self.params, self.batch, jax.random.PRNGKey(seed), times,
            num_samples,
        )
        out = lambda a: np.swapaxes(np.asarray(a), 0, 1)
        return {
            "zones": out(loc),
            "purposes": out(purp),
            "modes": out(mode),
            "times": np.asarray(times),
        }

    def benchmark_performance(self, batch_sizes=(1, 10, 50, 100), times=None):
        """people/s per batch size + projected 1M-person wall time."""
        if times is None:
            times = self.batch["t_unified"]
        times = jnp.asarray(times, jnp.float32)
        results = {}
        b0 = self.batch
        n0 = b0["person_features"].shape[0]

        @jax.jit
        def run(params, b, rng):
            out = self._forward(params, self._shard_batch(b), rng)
            return jnp.argmax(out[0], -1)

        for bs in batch_sizes:
            reps = int(np.ceil(bs / n0))
            b = dict(b0)
            for k in (
                "person_features", "home_zone_ids", "work_zone_ids",
                "initial_purpose_features", "initial_mode_features",
                "y_loc_dense", "y_purp_dense", "y_mode_dense",
                "y_purp_feat_dense", "y_mode_feat_dense", "loss_mask",
                "prev_real_indices", "next_real_indices",
            ):
                b[k] = jnp.concatenate([b0[k]] * reps, axis=0)[:bs]
            b["t_unified"] = times
            key = jax.random.PRNGKey(0)
            # sync via scalar pull: on remote backends block_until_ready
            # can return before queued work executes (measured in round
            # 3), which made these people/s numbers fictitious
            float(jnp.sum(run(self.params, b, key)))  # compile + warm
            t0 = time.time()
            n_iter = 5
            for i in range(n_iter):
                v = run(self.params, b, jax.random.fold_in(key, i))
            float(jnp.sum(v))  # FIFO: waits for all n_iter executions
            dt = (time.time() - t0) / n_iter
            results[bs] = {
                "people_per_s": bs / dt,
                "ms_per_person": 1e3 * dt / bs,
                "s_per_batch": dt,
            }
        best = max(r["people_per_s"] for r in results.values())
        results["projected_1M_people_hours"] = 1e6 / best / 3600.0
        return results
