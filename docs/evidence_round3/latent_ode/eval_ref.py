"""Evaluate the trained reference latent_ode model: zone/purpose accuracy
at GT event times, majority vote over 3 stochastic samples (the same
definitions as ananke_abm_tpu.models.latent_ode.evaluate)."""
import sys, json
sys.path.insert(0, "/root/repo/runs/evidence_r3/shims")
sys.path.insert(0, "/root/reference/src")
import numpy as np, torch
torch.set_num_threads(2)
torch.manual_seed(0)
from ananke_abm.models.latent_ode.inference.inference import BatchedInferenceEngine

engine = BatchedInferenceEngine(
    "saved_models/mode_generative_ode_batched/latent_ode_best_model_batched.pth",
    device="cpu",
)
times = torch.linspace(0.0, 24.0, 500)
preds = engine.predict_trajectories(
    [1, 2], times_to_predict=times, num_samples=3
)
tn = times.numpy()
metrics = {"persons": {}}
for i, pid in enumerate([1, 2]):
    s = engine.processor.get_data(pid)
    st = s["times"].cpu().numpy()
    nearest = np.searchsorted(tn, st).clip(0, len(tn) - 1)
    zones = preds["locations"][i][:, nearest]      # (S, events)
    maj = np.apply_along_axis(
        lambda x: np.bincount(x, minlength=1).argmax(), 0, zones)
    acc = float((maj == s["trajectory_y"].cpu().numpy()).mean())
    purp = preds["purposes"][i][:, nearest]
    maj_p = np.apply_along_axis(
        lambda x: np.bincount(x, minlength=1).argmax(), 0, purp)
    acc_p = float((maj_p == s["target_purpose_ids"].cpu().numpy()).mean())
    metrics["persons"][s["person_name"]] = {
        "zone_accuracy": acc, "purpose_accuracy": acc_p,
        "n_events": int(len(st)),
    }
with open("ref_metrics.json", "w") as f:
    json.dump(metrics, f, indent=2)
print(json.dumps(metrics, indent=2))
