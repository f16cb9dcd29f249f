"""Fused integrate-and-decode rollout == unfused model output."""
import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
)


def test_fused_matches_unfused():
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=1, substeps=2,
    )
    d = generate_agent_population(128, num_times=10, num_zones=12, seed=0)
    model = build_model(cfg, 7, 8)
    params = init_params(model, cfg, d, 128, jax.random.PRNGKey(0))
    zf = jnp.asarray(d["zone_features"])
    adj = jnp.asarray(d["adj"])
    times = jnp.asarray(d["times"])
    pf = jnp.asarray(d["person_feats"])
    hz = jnp.asarray(d["home_zone"])

    rollout = make_decoded_rollout(model, cfg, zf, adj, times)
    fused = np.asarray(rollout(params, pf, hz))

    logits, _ = model.apply(
        {"params": params}, zf, adj, pf, hz, times,
        ode_method="rk4", substeps=2,
    )
    unfused = np.asarray(jnp.argmax(logits, -1))
    np.testing.assert_array_equal(fused, unfused)
    assert fused.shape == (128, 10)
