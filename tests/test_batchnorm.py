"""SyncBatchNorm (cnn_norm="batch") parity with torch BatchNorm1d.

The reference encoder normalizes with BatchNorm1d
(reference encoders.py:23-26); GroupNorm stays our default (shard
invariance), and this file pins the escape hatch to the torch semantics:
train mode normalizes with biased batch variance and updates running
stats with the unbiased one; eval mode reads the running stats verbatim.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.models.gen_schedule.encoders import SyncBatchNorm


def _torch_bn(C):
    import torch

    bn = torch.nn.BatchNorm1d(C, eps=1e-5, momentum=0.1, affine=True)
    with torch.no_grad():
        bn.weight.copy_(torch.linspace(0.5, 1.5, C))
        bn.bias.copy_(torch.linspace(-0.2, 0.3, C))
    return bn


class TestTorchParity:
    def test_train_eval_semantics_match_torch(self):
        import torch

        B, T, C = 8, 12, 5
        rng = np.random.default_rng(0)
        xs = [rng.normal(size=(B, T, C)).astype(np.float32) * (k + 1)
              for k in range(3)]

        bn = _torch_bn(C)
        mod = SyncBatchNorm()
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                             use_running_average=False)
        params = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        }
        stats = variables["batch_stats"]

        bn.train()
        for x in xs:
            out_t = bn(torch.from_numpy(x).permute(0, 2, 1))
            out_j, mut = mod.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(x), use_running_average=False,
                mutable=["batch_stats"],
            )
            stats = mut["batch_stats"]
            np.testing.assert_allclose(
                np.asarray(out_j),
                out_t.detach().numpy().transpose(0, 2, 1),
                rtol=2e-5, atol=2e-5,
            )

        # running statistics track torch exactly (unbiased-var update)
        np.testing.assert_allclose(
            np.asarray(stats["mean"]), bn.running_mean.numpy(),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(stats["var"]), bn.running_var.numpy(),
            rtol=1e-5, atol=1e-6,
        )

        # eval mode reads running stats (torch model.eval())
        bn.eval()
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        out_t = bn(torch.from_numpy(x).permute(0, 2, 1))
        out_j = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), use_running_average=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_j),
            out_t.detach().numpy().transpose(0, 2, 1),
            rtol=2e-5, atol=2e-5,
        )

    def test_single_element_batch_unbiased_guard(self):
        """n==1 per (B*T) cannot happen for T>1, but the n-1 guard must not
        produce inf/nan for a (1, 1, C) input (torch emits batch var 0 ->
        running var update with n/(n-1) guarded)."""
        mod = SyncBatchNorm()
        x = jnp.ones((1, 1, 3))
        variables = mod.init(jax.random.PRNGKey(0), x,
                             use_running_average=False)
        out, mut = mod.apply(
            variables, x, use_running_average=False,
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(out)).all()
        assert np.isfinite(np.asarray(mut["batch_stats"]["var"])).all()


class TestPsumSync:
    def test_shard_map_psum_matches_global(self, eight_devices):
        """Per-shard batch stats psum'd over the mesh axis == the global
        batch computation (torch SyncBatchNorm equivalent)."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        B, T, C = 16, 6, 4
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(B, T, C)), jnp.float32
        )
        mesh = Mesh(np.array(eight_devices[:4]), ("b",))

        global_mod = SyncBatchNorm()
        variables = global_mod.init(jax.random.PRNGKey(0), x,
                                    use_running_average=False)
        ref, ref_mut = global_mod.apply(
            variables, x, use_running_average=False,
            mutable=["batch_stats"],
        )

        sync_mod = SyncBatchNorm(axis_name="b")

        def body(v, xs):
            out, mut = sync_mod.apply(
                v, xs, use_running_average=False, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]

        out, stats = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P("b", None, None)),
            out_specs=(P("b", None, None), P()),
        )(variables, x)

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stats["mean"]),
            np.asarray(ref_mut["batch_stats"]["mean"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(stats["var"]),
            np.asarray(ref_mut["batch_stats"]["var"]),
            rtol=1e-5, atol=1e-6,
        )


class TestPipelineIntegration:
    def _cfg(self, grid, **over):
        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 2, "min_epochs": 2, "patience": 0,
                "batch_size": 32, "lr": 1e-3, "weight_decay": 0.0,
                "grad_clip": 1.0, "beta_target": 1.0,
                "beta_warm_frac": 1.0, "lambda_tv": 0.0,
                "lambda_home": 0.1, "ckpt_every": 1,
            },
            "model": {
                "method": "baseline_cnn", "z_dim": 4, "emb_dim": 8,
                "cnn_channels": [8], "cnn_kernel": 3, "cnn_dropout": 0.0,
                "cnn_norm": "batch",
            },
        }
        cfg["train"].update(over)
        return cfg

    @pytest.fixture(scope="class")
    def prepared(self, tmp_path_factory):
        from ananke_abm_tpu.data_generator.population import (
            generate_population_activities,
        )
        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv

        root = tmp_path_factory.mktemp("bn_e2e")
        df = generate_population_activities(64, seed=3)
        csv = os.path.join(root, "activities.csv")
        df.to_csv(csv, index=False)
        grid = os.path.join(root, "grid.npz")
        prepare_from_csv(csv, grid, grid_min=30, val_frac=0.25, seed=5)
        return str(root), grid

    def test_batchnorm_model_trains_and_checkpoints_stats(self, prepared):
        root, grid = prepared
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
        from ananke_abm_tpu.utils import load_checkpoint

        outdir = os.path.join(root, "run_bn")
        result = train(self._cfg(grid), outdir, seed=1)
        assert result["epochs_ran"] == 2

        obj = load_checkpoint(
            os.path.join(outdir, "checkpoints", "last.ckpt")
        )
        stats = obj["batch_stats"]
        leaves = jax.tree_util.tree_leaves(stats)
        assert leaves, "batch_stats missing from checkpoint"
        # the running mean moved off its zero init -> stats were updated
        means = [leaf for path, leaf in
                 jax.tree_util.tree_flatten_with_path(stats)[0]
                 if "mean" in str(path)]
        assert any(np.abs(np.asarray(m)).max() > 0 for m in means)

        # resume restores stats and continues
        cfg3 = self._cfg(grid, epochs=3, min_epochs=3)
        result2 = train(cfg3, outdir, seed=1, resume=True)
        assert result2["epochs_ran"] == 1

    def test_batchnorm_fused_chunk_path(self, prepared):
        """epochs_per_jit > 1 threads batch_stats through the fused scan."""
        root, grid = prepared
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
        from ananke_abm_tpu.utils import load_checkpoint

        outdir = os.path.join(root, "run_bn_fused")
        result = train(
            self._cfg(grid, epochs_per_jit=2), outdir, seed=1
        )
        assert result["epochs_ran"] == 2
        obj = load_checkpoint(
            os.path.join(outdir, "checkpoints", "best_val.ckpt")
        )
        assert jax.tree_util.tree_leaves(obj["batch_stats"])
