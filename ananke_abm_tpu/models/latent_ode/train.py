"""latent_ode training.

Parity with the reference train loop (src/ananke_abm/models/latent_ode/
train/train.py:15-115): Adam over the composite loss on the two mock
personas' unified-timeline batch, best-by-loss checkpointing, per-component
loss history npz.

TPU-first: the unified batch is built once on the host; each iteration is a
single jitted train step over device-resident tensors, with ``steps_per_
call`` iterations fused into one program via lax.scan to amortize dispatch.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.models.latent_ode.config import GenerativeODEConfig
from ananke_abm_tpu.models.latent_ode.data import (
    get_person_sample,
    unify_and_interpolate_batch,
)
from ananke_abm_tpu.models.latent_ode.loss import calculate_composite_loss
from ananke_abm_tpu.models.latent_ode.model import GenerativeODE
from ananke_abm_tpu.utils import ensure_dir, save_checkpoint

BATCH_ARRAY_KEYS = (
    "t_unified", "y_loc_dense", "y_purp_dense", "y_mode_dense",
    "y_purp_feat_dense", "y_mode_feat_dense", "loss_mask",
    "prev_real_indices", "next_real_indices", "person_features",
    "all_zone_features", "distance_matrix",
    "initial_purpose_features", "initial_mode_features",
    "home_zone_ids", "work_zone_ids",
)


def batch_to_device(batch: dict) -> dict:
    return {k: jnp.asarray(batch[k]) for k in BATCH_ARRAY_KEYS}


def build_model_and_batch(config, person_ids=(1, 2)):
    samples = [get_person_sample(pid, config) for pid in person_ids]
    batch = unify_and_interpolate_batch(samples, config)
    model = GenerativeODE(
        person_feat_dim=batch["person_features"].shape[-1],
        num_zone_features=batch["all_zone_features"].shape[-1],
        config=config,
    )
    return model, batch_to_device(batch), batch


def make_forward(model):
    def forward(params, b, rng):
        zf = b["all_zone_features"]
        home = zf[b["home_zone_ids"]]
        work = zf[b["work_zone_ids"]]
        return model.apply(
            {"params": params},
            b["person_features"], home, work,
            b["initial_purpose_features"], b["initial_mode_features"],
            b["t_unified"], zf, rng,
        )

    return forward


def train(
    outdir: str,
    config: GenerativeODEConfig | None = None,
    num_iterations: int | None = None,
    person_ids=(1, 2),
    seed: int = 0,
    steps_per_call: int = 10,
    log_every: int = 500,
):
    config = config or GenerativeODEConfig()
    if num_iterations is not None:
        config = dataclasses.replace(config, num_iterations=num_iterations)
    ensure_dir(outdir)

    model, b, _ = build_model_and_batch(config, person_ids)
    key = jax.random.PRNGKey(seed)
    forward = make_forward(model)

    params = model.init(
        {"params": key},
        b["person_features"],
        b["all_zone_features"][b["home_zone_ids"]],
        b["all_zone_features"][b["work_zone_ids"]],
        b["initial_purpose_features"], b["initial_mode_features"],
        b["t_unified"], b["all_zone_features"], key,
    )["params"]

    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init(params)

    def loss_fn(params, rng):
        outputs = forward(params, b, rng)
        cand = model.apply(
            {"params": params}, b["all_zone_features"],
            method=GenerativeODE.encode_zones,
        )
        return calculate_composite_loss(b, outputs, cand, config)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def train_steps(params, opt_state, base, n_steps):
        def step(carry, i):
            params, opt_state = carry
            rng = jax.random.fold_in(key, base + i)
            (loss, comps), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), comps

        (params, opt_state), comps = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_steps)
        )
        return params, opt_state, comps

    best = np.inf
    history = []
    ckpt_path = os.path.join(outdir, "latent_ode_best_model.ckpt")
    t0 = time.time()
    it = 0
    while it < config.num_iterations:
        n = min(steps_per_call, config.num_iterations - it)
        params, opt_state, comps = train_steps(params, opt_state, it, n)
        comps = jax.device_get(comps)
        history.append(comps)
        it += n
        last = float(comps["total"][-1])
        if last < best:
            best = last
            save_checkpoint(
                {
                    "params": params,
                    "config": dataclasses.asdict(config),
                    "person_ids": list(person_ids),
                    "iteration": it,
                },
                ckpt_path,
            )
        if log_every and (it % log_every < steps_per_call):
            print(f"iter {it}: total={last:.4f} best={best:.4f}")

    elapsed = time.time() - t0
    hist = {
        k: np.concatenate([np.asarray(h[k]) for h in history])
        for k in history[0]
    }
    np.savez_compressed(os.path.join(outdir, "loss_history.npz"), **hist)
    print(
        f"latent_ode training: {config.num_iterations} iters in "
        f"{elapsed:.2f}s ({config.num_iterations / max(elapsed, 1e-9):.1f} it/s)"
    )
    return {"best_loss": best, "seconds": elapsed, "ckpt": ckpt_path}
