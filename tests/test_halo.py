"""Ring halo-exchange zone GAT == dense single-device ZoneGAT."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
)
from ananke_abm_tpu.parallel.halo import encode_zones_ring
from ananke_abm_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("zone_parallel,num_zones", [(2, 16), (4, 16), (8, 24)])
@pytest.mark.slow
def test_ring_encode_matches_dense(eight_devices, zone_parallel, num_zones):
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=2, num_blocks=1, substeps=1,
    )
    d = generate_agent_population(
        32, num_times=4, num_zones=num_zones, seed=0
    )
    model = build_model(cfg, 7, 8)
    params = init_params(model, cfg, d, 32, jax.random.PRNGKey(0))
    zf, adj = jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"])

    dense = model.apply({"params": params}, zf, adj,
                        method=model.encode_zones)
    mesh = make_mesh(8, zone_parallel=zone_parallel)
    ring = encode_zones_ring(
        params, zf, adj, mesh,
        heads=cfg.gat_heads, num_layers=cfg.gat_layers,
    )
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(dense), rtol=2e-5, atol=2e-6
    )


def test_ring_rejects_indivisible_zone_count(eight_devices):
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
    )
    d = generate_agent_population(16, num_times=4, num_zones=10, seed=0)
    model = build_model(cfg, 7, 8)
    params = init_params(model, cfg, d, 16, jax.random.PRNGKey(0))
    mesh = make_mesh(8, zone_parallel=4)
    with pytest.raises(ValueError, match="not divisible"):
        encode_zones_ring(
            params, jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
            mesh, heads=2, num_layers=1,
        )
