"""gnn_embed: graph-attention zone encoder + agent ODE dynamics.

The reference names this family (README package map, BASELINE.json) but the
snapshot does not contain it; per the north star it is the flagship here:
the GAT zone encoder, ODE-inspired spatio-temporal dynamics, and trajectory
rollout fuse into a single jit-compiled integrate-then-decode pipeline.
"""
