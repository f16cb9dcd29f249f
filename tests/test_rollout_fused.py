"""Fused integrate-and-decode rollout == unfused model output."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
)


@pytest.mark.parametrize("num_blocks", [1, 2])
def test_fused_matches_unfused(num_blocks):
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=num_blocks, substeps=2,
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


def _tiny_setup(n_agents=128, num_times=10, num_zones=12, num_blocks=1):
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=num_blocks, substeps=2,
    )
    d = generate_agent_population(
        n_agents, num_times=num_times, num_zones=num_zones, seed=0
    )
    model = build_model(cfg, 7, 8)
    params = init_params(model, cfg, d, n_agents, jax.random.PRNGKey(0))
    arrays = (
        jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
        jnp.asarray(d["times"]), jnp.asarray(d["person_feats"]),
        jnp.asarray(d["home_zone"]),
    )
    return cfg, model, params, arrays


def test_pallas_rollout_under_mesh_matches_single_device(eight_devices):
    """The fused-kernel serving path must compose with the agent mesh
    (VERDICT r1 item 2): shard_map'd Pallas decode == single-device."""
    from ananke_abm_tpu.parallel.mesh import make_mesh

    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup()
    mesh = make_mesh(8, zone_parallel=2)

    single = make_decoded_rollout(model, cfg, zf, adj, times, use_pallas=True)
    sharded = make_decoded_rollout(
        model, cfg, zf, adj, times, use_pallas=True, mesh=mesh
    )
    ref = np.asarray(single(params, pf, hz))
    got = np.asarray(sharded(params, pf, hz))
    np.testing.assert_array_equal(got, ref)


def test_xla_rollout_under_mesh_matches_single_device(eight_devices):
    from ananke_abm_tpu.parallel.mesh import make_mesh

    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup()
    mesh = make_mesh(8, zone_parallel=2)

    single = make_decoded_rollout(model, cfg, zf, adj, times, use_pallas=False)
    sharded = make_decoded_rollout(
        model, cfg, zf, adj, times, use_pallas=False, mesh=mesh
    )
    np.testing.assert_array_equal(
        np.asarray(sharded(params, pf, hz)), np.asarray(single(params, pf, hz))
    )


def test_sparse_rollout_under_mesh_matches_single_device(eight_devices):
    """Sparse edge-list serving composes with the agent mesh: the graph
    rides as a replicated jit argument (adj=None, no (Z, Z) array)."""
    from ananke_abm_tpu.ops.segment import edges_from_adj
    from ananke_abm_tpu.parallel.mesh import make_mesh

    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup()
    mesh = make_mesh(8, zone_parallel=2)
    ei_np = edges_from_adj(np.asarray(adj))
    ei = (jnp.asarray(ei_np[0]), jnp.asarray(ei_np[1]))

    single = make_decoded_rollout(model, cfg, zf, adj, times, use_pallas=False)
    sharded = make_decoded_rollout(
        model, cfg, zf, None, times, mesh=mesh, edge_index=ei
    )
    np.testing.assert_array_equal(
        np.asarray(sharded(params, pf, hz)), np.asarray(single(params, pf, hz))
    )


def test_pallas_rollout_sees_updated_params():
    """Params are jit arguments, not baked constants: updating them must
    change the output with no re-factory (regression for the id()-keyed
    cache that could serve stale weights)."""
    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup(n_agents=64)
    rollout = make_decoded_rollout(model, cfg, zf, adj, times, use_pallas=True)
    out0 = np.asarray(rollout(params, pf, hz))

    perturbed = jax.tree_util.tree_map(
        lambda x: x + 0.5 * jnp.ones_like(x), params
    )
    out1 = np.asarray(rollout(perturbed, pf, hz))
    assert (out0 != out1).any(), "updated params did not change the rollout"


def test_pack_weights_rejects_blockless_drift():
    """num_blocks=0 is a valid GATODEConfig but outside the fused-kernel
    contract: pack_weights_bf16 must fail with a clear ValueError, not an
    IndexError deep in the VJP (ADVICE r2)."""
    from ananke_abm_tpu.ops.pallas.fused_step import pack_weights_bf16

    cfg, model, params, _ = _tiny_setup(n_agents=16, num_blocks=0)
    with pytest.raises(ValueError, match="num_blocks"):
        pack_weights_bf16(params)


def test_pallas_auto_dispatch_skips_blockless_drift():
    from ananke_abm_tpu.models.gnn_embed.rollout import _pallas_eligible

    cfg = GATODEConfig(
        zone_dim=128, agent_dim=128, context_dim=8, hidden_dim=128,
        gat_heads=2, gat_layers=1, num_blocks=0, substeps=2,
    )
    assert _pallas_eligible(cfg, expected_n=1 << 20) is False


def test_pallas_auto_dispatch_caps_zone_count(monkeypatch):
    """Round-5 serving-ladder fix: the dense serving kernel holds the
    (tile, Z) scores in VMEM and Mosaic rejects it at Z=8192 — the auto
    dispatch must fall back to XLA above the measured Z=2048 cap (and
    still engage below it). TPU backend faked via monkeypatch; off-TPU
    the function is always False."""
    import ananke_abm_tpu.models.gnn_embed.rollout as ro

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(ro.jax, "devices", lambda: [_Dev()])
    cfg = GATODEConfig()  # shipping dims, num_blocks=2
    assert ro._pallas_eligible(cfg, expected_n=1 << 20,
                               num_zones=2048) is True
    assert ro._pallas_eligible(cfg, expected_n=1 << 20,
                               num_zones=8192) is False
    # without the zone count (older callers) large-N still engages
    assert ro._pallas_eligible(cfg, expected_n=1 << 20) is True


@pytest.mark.parametrize("num_blocks", [1, 2])
def test_interval_fused_decode_matches_per_step_kernel(num_blocks):
    """rk4_interval_decode_fused (substeps + decode in one kernel) must
    reproduce the per-step kernel + XLA decode path exactly."""
    from ananke_abm_tpu.ops.pallas.fused_step import make_pallas_rollout

    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup(
        n_agents=96, num_times=6, num_zones=10, num_blocks=num_blocks
    )
    r0 = make_pallas_rollout(model, zf, adj, times, substeps=2)
    r1 = make_pallas_rollout(
        model, zf, adj, times, substeps=2, fuse_decode=True
    )
    np.testing.assert_array_equal(
        np.asarray(r1(params, pf, hz)), np.asarray(r0(params, pf, hz))
    )


@pytest.mark.slow
def test_multi_tile_grid_matches_single_tile():
    """Cross-tile grid indexing: the same rollout split over several
    agent tiles (TILE_N patched small, ragged tail) must emit exactly
    the ids of the one-tile run. Guards the i-indexed BlockSpecs after
    the shipping tile default moved to 2048 (every small-N test pads to
    ONE tile, so without this the multi-tile path had CPU coverage only
    at tile-multiple N)."""
    from ananke_abm_tpu.ops.pallas import fused_step

    cfg, model, params, (zf, adj, times, pf, hz) = _tiny_setup(
        n_agents=150, num_times=5, num_zones=10, num_blocks=1
    )
    one_tile = fused_step.make_pallas_rollout(
        model, zf, adj, times, substeps=2, fuse_decode=True
    )(params, pf, hz)
    orig = fused_step.TILE_N
    try:
        fused_step.TILE_N = 64  # 150 agents -> 3 tiles, ragged tail
        multi_tile = fused_step.make_pallas_rollout(
            model, zf, adj, times, substeps=2, fuse_decode=True
        )(params, pf, hz)
    finally:
        fused_step.TILE_N = orig
    np.testing.assert_array_equal(
        np.asarray(multi_tile), np.asarray(one_tile)
    )
