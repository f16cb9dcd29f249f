"""Aux subsystems: profiling/logging/NaN mode, checkpoint resume, and the
explicit-params adjoint ODE block."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestProfiling:
    def test_phase_timer_and_dump(self, tmp_path):
        from ananke_abm_tpu.utils.profiling import PhaseTimes

        pt = PhaseTimes()
        with pt.phase("a"):
            pass
        with pt.phase("a"):
            pass
        with pt.phase("b"):
            pass
        s = pt.summary()
        assert set(s) == {"a", "b"}
        p = str(tmp_path / "t.jsonl")
        pt.dump(p)
        lines = open(p).read().strip().splitlines()
        assert len(lines) == 3
        assert json.loads(lines[0])["phase"] == "a"

    def test_throughput(self):
        from ananke_abm_tpu.utils.profiling import throughput

        f = jax.jit(lambda x: x * 2)
        r = throughput(f, jnp.ones((128,)), items=128, iters=3)
        assert r["items_per_s"] > 0
        assert r["first_call_s"] >= 0

    def test_debug_nan_mode(self):
        from ananke_abm_tpu.utils.profiling import debug_nan_mode

        with debug_nan_mode(True):
            with pytest.raises(FloatingPointError):
                jnp.log(jnp.zeros(()) - 1.0).block_until_ready()
        # restored afterwards
        _ = jnp.log(jnp.zeros(()) - 1.0)

    def test_jsonl_logger(self, tmp_path):
        from ananke_abm_tpu.utils.profiling import JsonlLogger

        lg = JsonlLogger(str(tmp_path / "log.jsonl"))
        lg.log({"step": 1, "loss": jnp.asarray(0.5)})
        rec = json.loads(open(str(tmp_path / "log.jsonl")).read())
        assert rec["loss"] == 0.5


class TestResume:
    @pytest.mark.slow
    def test_vae_train_resume(self, tmp_path):
        """Checkpoint carries opt_state/epoch; resume continues training."""
        from ananke_abm_tpu.data_generator.population import (
            generate_population_activities,
        )
        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
        from ananke_abm_tpu.utils import load_checkpoint

        csv = str(tmp_path / "a.csv")
        generate_population_activities(40, seed=1).to_csv(csv, index=False)
        grid = str(tmp_path / "g.npz")
        prepare_from_csv(csv, grid, grid_min=60, val_frac=0.2, seed=1)
        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 2, "min_epochs": 2, "patience": 0,
                "batch_size": 16, "lr": 1e-3, "weight_decay": 0.0,
                "grad_clip": 1.0, "beta_target": 1.0, "beta_warm_frac": 1.0,
                "lambda_tv": 0.0, "lambda_home": 0.0,
            },
            "model": {
                "method": "baseline_cnn", "z_dim": 2, "emb_dim": 8,
                "cnn_channels": [8], "cnn_kernel": 3, "cnn_dropout": 0.0,
            },
        }
        out = str(tmp_path / "run")
        train(cfg, out, seed=0)
        ck = load_checkpoint(os.path.join(out, "checkpoints", "last.ckpt"))
        assert ck["epoch"] == 2
        assert "opt_state" in ck

        cfg["train"]["epochs"] = 4
        cfg["train"]["min_epochs"] = 4
        res = train(cfg, out, seed=0, resume=True)
        ck2 = load_checkpoint(os.path.join(out, "checkpoints", "last.ckpt"))
        assert ck2["epoch"] == 4
        assert res["epochs_ran"] == 2  # only the new epochs ran


class TestODEBlock:
    def test_adjoint_gradients_flow_to_params(self):
        from ananke_abm_tpu.models.latent_ode.ode_components import (
            TimeEmbedODEFunc,
            ode_block_solve,
        )

        func = TimeEmbedODEFunc(dim=4, hidden_dim=8)
        x0 = jnp.ones((3, 4)) * 0.3
        times = jnp.linspace(0.0, 1.0, 4)
        params = func.init(jax.random.PRNGKey(0), times[0], x0, x0)["params"]

        def loss(params, x0):
            ys = ode_block_solve(func, params, x0, times)
            return jnp.sum(ys[-1] ** 2)

        g_params, g_x0 = jax.grad(loss, argnums=(0, 1))(params, x0)
        leaves = jax.tree_util.tree_leaves(g_params)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves), (
            "params must receive adjoint gradients"
        )
        assert float(jnp.abs(g_x0).max()) > 0
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


class TestAsyncCheckpointer:
    def test_async_save_and_reload(self, tmp_path):
        from ananke_abm_tpu.utils.ckpt import AsyncCheckpointer, load_checkpoint

        ck = AsyncCheckpointer()
        p = str(tmp_path / "a.ckpt")
        for step in range(3):
            ck.save({"step": step, "x": jnp.ones((4,)) * step}, p)
        ck.wait()
        obj = load_checkpoint(p)
        assert obj["step"] == 2
        np.testing.assert_array_equal(obj["x"], np.ones(4) * 2)


class TestSampleCoverage:
    def test_table_and_plot(self, tmp_path):
        """Sequence-coverage analysis (reference
        gen_schedule_check/visualize_multi_samples.ipynb workflow)."""
        import pandas as pd

        from ananke_abm_tpu.utils.sample_coverage import (
            plot_sample_coverage,
            sample_coverage_table,
            sequence_counts,
        )

        # full population: 4 persons, 3 distinct sequences (A,B shared)
        full = pd.DataFrame({
            "persid": [1, 1, 2, 2, 3, 3, 4, 4],
            "purpose": ["Home", "Work", "Home", "Work",
                        "Home", "Shop", "Home", "Edu"],
        })
        full_csv = str(tmp_path / "full.csv")
        full.to_csv(full_csv, index=False)
        # half sample keeps persons 1 and 3 -> 2 of 3 sequences,
        # covering persons 1, 2, 3 of 4 person-days
        half = full[full.persid.isin([1, 3])]
        half_csv = str(tmp_path / "half.csv")
        half.to_csv(half_csv, index=False)

        counts = sequence_counts(full)
        assert counts.sum() == 4 and len(counts) == 3

        out_csv = str(tmp_path / "coverage.csv")
        table = sample_coverage_table(
            full_csv, [(0.5, half_csv)], out_csv=out_csv
        )
        assert list(table["sample_rate"]) == [0.0, 0.5, 1.0]
        row = table[table.sample_rate == 0.5].iloc[0]
        assert row["sampled_unique_sequences"] == pytest.approx(2 / 3)
        assert row["sampled_sequence_coverage"] == pytest.approx(3 / 4)
        assert (table.iloc[-1][["sampled_unique_sequences",
                                "sampled_sequence_coverage"]] == 1.0).all()

        png = str(tmp_path / "coverage.png")
        plot_sample_coverage(table, png)
        import os

        assert os.path.getsize(png) > 0
