"""Ananke ABM TPU — a TPU-native activity-based-modeling framework in JAX.

A ground-up rebuild of the capabilities of ``bobkatla/ananke_abm`` (a PyTorch
research monorepo for synthetic daily-activity-schedule generation) as an
idiomatic JAX/XLA/Pallas/pjit framework:

- ``ananke_abm_tpu.ode``        — fixed-step RK4 / adaptive dopri5 / Euler–Maruyama
                                  integrators built on ``lax.scan`` / ``lax.while_loop``
                                  with checkpointed-backprop and continuous-adjoint
                                  gradients (replaces torchdiffeq / torchsde).
- ``ananke_abm_tpu.ops``        — linear-chain CRF recursions as scans, segment
                                  ops, edge-softmax graph attention, Pallas kernels.
- ``ananke_abm_tpu.models``     — the model families: gen_schedule (schedule VAE +
                                  CRF), mode_sep (2nd-order ODE location model),
                                  latent_ode (generative latent SDE), traj_syn
                                  (trajectory embed + semi-CRF), gnn_embed (GAT-ODE).
- ``ananke_abm_tpu.dataio``     — host-side NumPy/pandas data contracts (rasterizer,
                                  CSV schemas, union-grid batching).
- ``ananke_abm_tpu.parallel``   — device mesh / sharding layer (pjit + shard_map
                                  over an (agents, zones) mesh).
- ``ananke_abm_tpu.pipeline``   — train / sample / eval / viz pipelines.
- ``ananke_abm_tpu.evals`` / ``.compare`` — metric + comparison harness with
                                  reference-compatible CSV/JSON schemas.
"""

__version__ = "0.1.0"

__all__ = ["__version__"]
