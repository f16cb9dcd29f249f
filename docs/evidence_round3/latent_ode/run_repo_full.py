"""Repo latent_ode FULL reference budget (25,000 iterations) on CPU —
feasible precisely because the fused-scan trainer is ~29x faster per
iteration than the reference's Python-loop SDE trainer on this CPU."""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
from ananke_abm_tpu.models.latent_ode.train import train
from ananke_abm_tpu.models.latent_ode.evaluate import evaluate

t0 = time.time()
train("repo_full", num_iterations=25000, steps_per_call=50)
wall = time.time() - t0
print(f"REPO TRAIN full (25000 iters) WALL {wall:.1f}s", flush=True)
m = evaluate("repo_full/latent_ode_best_model.ckpt", "repo_full/eval")
m["train_wall_s"] = round(wall, 1)
m["num_iterations"] = 25000
with open("repo_full/metrics.json", "w") as f:
    json.dump(m, f, indent=2)
print(json.dumps(m, indent=2), flush=True)
print("REPO LATENT FULL DONE", flush=True)
