"""gen_schedule vertical slice: rasterizer properties, PDS stats, and the
prepare -> fit -> sample -> eval loop on a tiny synthetic population."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from ananke_abm_tpu.data_generator.population import (
    generate_population_activities,
)
from ananke_abm_tpu.dataio.rasterize import (
    build_purpose_map,
    compute_empirical_tod,
    ensure_homebound,
    prepare_from_csv,
    rasterize_frame,
)
from ananke_abm_tpu.models.gen_schedule.pds import (
    compute_pds,
    compute_presence_rate,
    compute_start_rate,
    compute_time_of_day_marginal,
)


@pytest.fixture(scope="module")
def tiny_population(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("pop")
    df = generate_population_activities(64, seed=7)
    csv = os.path.join(outdir, "activities.csv")
    df.to_csv(csv, index=False)
    return str(csv), df


class TestRasterizer:
    def test_homebound_and_shapes(self, tiny_population):
        csv, df = tiny_population
        pm = build_purpose_map(df["purpose"])
        Y, pers = rasterize_frame(df, pm, grid_min=5, horizon_min=1440)
        assert Y.shape == (64, 288)
        home = pm["Home"]
        assert (Y[:, -1] == home).all(), "must end at Home"
        assert not (Y == home).all(axis=1).any(), "no all-home days"

    def test_every_activity_gets_a_bin(self):
        """Two 1-min activities in the same bin must each get a bin."""
        df = pd.DataFrame(
            {
                "persid": [1, 1, 1],
                "stopno": [0, 1, 2],
                "purpose": ["Home", "Work", "Home"],
                "starttime": [0, 2, 4],
                "total_duration": [2, 1, 1436],
            }
        )
        pm = {"Home": 0, "Work": 1}
        Y, _ = rasterize_frame(df, pm, grid_min=5)
        # Home gets bin 0 (pushed), Work pushed to bin 1, Home resumes at 2
        assert Y[0, 0] == 0 and Y[0, 1] == 1 and Y[0, 2] == 0

    def test_monotone_push_forward(self):
        """Overlapping starts never reorder activities."""
        df = pd.DataFrame(
            {
                "persid": [1] * 4,
                "stopno": [0, 1, 2, 3],
                "purpose": ["Home", "Work", "Shopping", "Home"],
                "starttime": [0, 60, 60, 70],  # Work and Shopping collide
                "total_duration": [60, 30, 30, 1310],
            }
        )
        pm = {"Home": 0, "Shopping": 1, "Work": 2}
        Y, _ = rasterize_frame(df, pm, grid_min=5)
        w = np.nonzero(Y[0] == 2)[0]
        s = np.nonzero(Y[0] == 1)[0]
        assert w.max() < s.min(), "Work must precede Shopping"

    def test_homebound_shift(self):
        """Trailing non-home run shifts back when home run before it allows."""
        pm = {"Home": 0, "Work": 1}
        Y = np.zeros((1, 10), dtype=np.int64)
        Y[0, 7:] = 1  # ends with Work
        out = ensure_homebound(Y, 0)
        assert out[0, -1] == 0
        assert (out[0, 6:9] == 1).all(), "work run shifted back one bin"

    def test_homebound_force_when_no_home(self):
        pm = {"Home": 0, "Work": 1}
        Y = np.ones((1, 10), dtype=np.int64)
        out = ensure_homebound(Y, 0)
        assert out[0, -1] == 0

    def test_prepare_artifacts(self, tiny_population, tmp_path):
        csv, df = tiny_population
        out = str(tmp_path / "grid.npz")
        path, meta = prepare_from_csv(csv, out, grid_min=10, val_frac=0.25, seed=3)
        Y = np.load(out)["Y"]
        assert Y.shape == (64, 144)
        splits = np.load(out.replace(".npz", "_splits.npz"))
        assert len(splits["train_idx"]) + len(splits["val_idx"]) == 64
        assert set(splits["train_idx"]).isdisjoint(splits["val_idx"])
        tod = np.load(out.replace(".npz", "_tod.npy"))
        assert tod.shape == (144, len(meta["purpose_map"]))
        np.testing.assert_allclose(tod.sum(axis=1), 1.0)
        with open(out.replace(".npz", "_meta.json")) as f:
            m2 = json.load(f)
        assert m2["L"] == 144 and m2["N"] == 64


class TestPDS:
    def test_stats_match_naive(self):
        rng = np.random.default_rng(0)
        Y = rng.integers(0, 4, size=(50, 20))
        P = 4
        m = compute_time_of_day_marginal(Y, P)
        for p in range(P):
            np.testing.assert_allclose(m[p], (Y == p).mean(axis=0))
        sr = compute_start_rate(Y, P)
        for p in range(P):
            is_p = Y == p
            starts = np.zeros_like(is_p)
            starts[:, 0] = is_p[:, 0]
            starts[:, 1:] = is_p[:, 1:] & ~is_p[:, :-1]
            np.testing.assert_allclose(sr[p], starts.mean(axis=0))
        pr = compute_presence_rate(Y, P)
        for p in range(P):
            np.testing.assert_allclose(pr[p], (Y == p).any(axis=1).mean())

    def test_compute_pds_artifacts(self, tmp_path):
        Y = np.random.default_rng(1).integers(0, 3, size=(20, 12))
        grid = str(tmp_path / "g.npz")
        np.savez(grid, Y=Y)
        summary = compute_pds(grid, str(tmp_path / "out"), grid_min=10)
        npz = np.load(str(tmp_path / "out_pds.npz"), allow_pickle=True)
        assert npz["m_tod"].shape == (3, 12)
        assert npz["start_rate"].shape == (3, 12)
        assert npz["presence_rate"].shape == (3,)
        assert summary["N_persons"] == 20


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def prepared(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("e2e")
        df = generate_population_activities(96, seed=11)
        csv = os.path.join(root, "activities.csv")
        df.to_csv(csv, index=False)
        out = os.path.join(root, "grid.npz")
        prepare_from_csv(csv, out, grid_min=30, val_frac=0.2, seed=5)
        return str(root), out

    @pytest.mark.slow
    def test_fit_sample_eval(self, prepared):
        root, grid = prepared
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
        from ananke_abm_tpu.models.gen_schedule.pipeline.sample import sample
        from ananke_abm_tpu.models.gen_schedule.pipeline.eval import evaluate

        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 3,
                "min_epochs": 3,
                "patience": 0,
                "batch_size": 32,
                "lr": 1e-3,
                "weight_decay": 1e-4,
                "grad_clip": 1.0,
                "beta_target": 1.0,
                "beta_warm_frac": 0.3,
                "lambda_tv": 0.0,
                "lambda_home": 0.1,
            },
            "model": {
                "method": "baseline_cnn",
                "z_dim": 4,
                "emb_dim": 16,
                "cnn_channels": [16],
                "cnn_kernel": 3,
                "cnn_dropout": 0.1,
            },
        }
        outdir = os.path.join(root, "run")
        result = train(cfg, outdir, seed=1)
        assert result["epochs_ran"] >= 1
        assert os.path.exists(os.path.join(outdir, "checkpoints", "last.ckpt"))
        assert os.path.exists(os.path.join(outdir, "checkpoints", "best_val.ckpt"))
        assert os.path.exists(os.path.join(outdir, "training_log.csv"))

        prefix = os.path.join(root, "samples", "s")
        sample(
            os.path.join(outdir, "checkpoints", "best_val.ckpt"),
            num_samples=50,
            outprefix=prefix,
            seed=2,
            csv_max_persons=5,
            reject_all_home=True,
        )
        gen = np.load(prefix + ".npz")
        assert gen["Y_generated"].shape[0] == 50
        assert gen["U_mean_logits"].shape == (48, gen["U_mean_logits"].shape[1])
        with open(prefix + "_meta.json") as f:
            smeta = json.load(f)
        assert smeta["num_samples"] == 50
        prev = pd.read_csv(prefix + "_preview.csv")
        assert set(prev.columns) == {
            "persid", "stopno", "purpose", "starttime", "total_duration",
        }

        # rejection: no all-home rows
        with open(grid.replace(".npz", "_meta.json")) as f:
            gmeta = json.load(f)
        home = gmeta["purpose_map"]["Home"]
        assert not (gen["Y_generated"] == home).all(axis=1).any()

        report = evaluate(
            prefix + ".npz",
            prefix + "_meta.json",
            grid,
            os.path.join(root, "report.json"),
        )
        for k in (
            "minutes_share", "bigram", "tod_jsd_macro", "all_home_rate",
            "start_home_rate", "end_home_rate", "diversity_ratio",
        ):
            assert k in report

    @pytest.mark.slow
    def test_rnn_encoder_trains(self, prepared):
        root, grid = prepared
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train

        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 1, "min_epochs": 1, "patience": 0, "batch_size": 32,
                "lr": 1e-3, "weight_decay": 0.0, "grad_clip": 1.0,
                "beta_target": 1.0, "beta_warm_frac": 1.0,
                "lambda_tv": 0.01, "lambda_home": 0.1,
            },
            "model": {
                "method": "baseline_rnn", "z_dim": 4, "emb_dim": 8,
                "rnn_hidden_dim": 8,
            },
        }
        result = train(cfg, os.path.join(root, "run_rnn"), seed=1)
        assert result["epochs_ran"] == 1

    def test_rnn_lstm_cell_trains(self, prepared):
        """rnn_cell="lstm" reproduces the reference BiLSTM architecture
        (reference encoders.py:125-166)."""
        root, grid = prepared
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train

        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 1, "min_epochs": 1, "patience": 0, "batch_size": 32,
                "lr": 1e-3, "weight_decay": 0.0, "grad_clip": 1.0,
                "beta_target": 1.0, "beta_warm_frac": 1.0,
                "lambda_tv": 0.01, "lambda_home": 0.1,
            },
            "model": {
                "method": "baseline_rnn", "z_dim": 4, "emb_dim": 8,
                "rnn_hidden_dim": 8, "rnn_cell": "lstm",
            },
        }
        result = train(cfg, os.path.join(root, "run_lstm"), seed=1)
        assert result["epochs_ran"] == 1


class TestEpochFusion:
    """train.epochs_per_jit > 1 (fused multi-epoch scan) must reproduce the
    per-epoch host loop: same log rows, same early-stop point, same final
    params (up to f32 jit-boundary reassociation)."""

    def _cfg(self, grid, **train_over):
        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 6, "min_epochs": 6, "patience": 0,
                "batch_size": 32, "lr": 1e-3, "weight_decay": 1e-4,
                "grad_clip": 1.0, "beta_target": 1.0, "beta_warm_frac": 0.5,
                "lambda_tv": 0.0, "lambda_home": 0.1,
            },
            "model": {
                "method": "baseline_cnn", "z_dim": 4, "emb_dim": 16,
                "cnn_channels": [16], "cnn_kernel": 3, "cnn_dropout": 0.1,
            },
        }
        cfg["train"].update(train_over)
        return cfg

    @pytest.mark.slow
    def test_fused_matches_per_epoch(self, tmp_path):
        import pandas as pd

        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
        from ananke_abm_tpu.utils import load_checkpoint

        csv = str(tmp_path / "a.csv")
        generate_population_activities(96, seed=11).to_csv(csv, index=False)
        grid = str(tmp_path / "g.npz")
        prepare_from_csv(csv, grid, grid_min=30, val_frac=0.2, seed=5)

        r1 = train(self._cfg(grid), str(tmp_path / "seq"), seed=3)
        # chunk=4 exercises the masked tail (epochs 7, 8 of the 2nd chunk)
        r2 = train(
            self._cfg(grid, epochs_per_jit=4), str(tmp_path / "fused"),
            seed=3,
        )
        assert r1["epochs_ran"] == r2["epochs_ran"] == 6
        log1 = pd.read_csv(tmp_path / "seq" / "training_log.csv")
        log2 = pd.read_csv(tmp_path / "fused" / "training_log.csv")
        assert list(log1["epoch"]) == list(log2["epoch"])
        for col in ("train_loss", "val_loss", "train_ce", "val_kl", "beta"):
            np.testing.assert_allclose(
                log1[col], log2[col], rtol=2e-4, atol=1e-6, err_msg=col
            )
        b1 = load_checkpoint(
            os.path.join(tmp_path, "seq", "checkpoints", "best_val.ckpt")
        )
        b2 = load_checkpoint(
            os.path.join(tmp_path, "fused", "checkpoints", "best_val.ckpt")
        )
        assert b1["epoch"] == b2["epoch"]
        import jax

        for p1, p2 in zip(
            jax.tree_util.tree_leaves(b1["params"]),
            jax.tree_util.tree_leaves(b2["params"]),
        ):
            np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=1e-5)

    @pytest.mark.slow
    def test_fused_early_stop_parity(self, tmp_path):
        """lr=0 => only the first epoch improves (inf -> L); with
        min_epochs=2, patience=2 both paths must stop at epoch 3."""
        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train

        csv = str(tmp_path / "a.csv")
        generate_population_activities(64, seed=2).to_csv(csv, index=False)
        grid = str(tmp_path / "g.npz")
        prepare_from_csv(csv, grid, grid_min=60, val_frac=0.2, seed=5)

        over = dict(lr=0.0, epochs=20, min_epochs=2, patience=2)
        r1 = train(self._cfg(grid, **over), str(tmp_path / "seq"), seed=3)
        r2 = train(
            self._cfg(grid, epochs_per_jit=5, **over),
            str(tmp_path / "fused"), seed=3,
        )
        assert r1["epochs_ran"] == r2["epochs_ran"] == 3
        np.testing.assert_allclose(
            r1["best_val_loss"], r2["best_val_loss"], rtol=1e-5
        )


class TestAutoPDS:
    @pytest.mark.slow
    def test_phase2_auto_pds_end_to_end(self, tmp_path):
        """compute-pds -> fit auto_pds (with ToD/presence losses) -> sample."""
        import json

        from ananke_abm_tpu.data_generator.population import (
            generate_population_activities,
        )
        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
        from ananke_abm_tpu.models.gen_schedule.pds import compute_pds
        from ananke_abm_tpu.models.gen_schedule.pipeline.sample import sample
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train

        csv = str(tmp_path / "a.csv")
        generate_population_activities(80, seed=4).to_csv(csv, index=False)
        grid = str(tmp_path / "g.npz")
        prepare_from_csv(csv, grid, grid_min=60, val_frac=0.2, seed=1)
        compute_pds(
            grid, str(tmp_path / "p"), grid_min=60,
            purpose_json=grid.replace(".npz", "_purpose_map.json"),
        )
        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 2, "min_epochs": 2, "patience": 0,
                "batch_size": 32, "lr": 1e-3, "weight_decay": 1e-4,
                "grad_clip": 5.0, "beta_target": 1.0, "beta_warm_frac": 0.5,
                "lambda_tv": 0.02, "lambda_home": 0.2,
                "lambda_tod": 0.3, "lambda_presence": 0.3,
            },
            "model": {
                "method": "auto_pds", "z_dim": 4, "emb_dim": 16,
                "cnn_channels": [16], "cnn_kernel": 3, "cnn_dropout": 0.1,
                "pds_path": str(tmp_path / "p_pds.npz"),
            },
        }
        out = str(tmp_path / "run")
        res = train(cfg, out, seed=1)
        assert res["epochs_ran"] == 2
        import pandas as pd

        log = pd.read_csv(os.path.join(out, "training_log.csv"))
        assert (log["train_tod"] > 0).all()  # PDS losses active
        assert (log["train_presence"] > 0).all()

        prefix = str(tmp_path / "s")
        sample(
            os.path.join(out, "checkpoints", "best_val.ckpt"),
            num_samples=20, outprefix=prefix, seed=3,
        )
        with open(prefix + "_meta.json") as f:
            assert json.load(f)["pds_method"] == "auto_pds"

    def test_lambda_share_loss_active(self, tmp_path):
        """lambda_share wires the minutes-share calibration term."""
        from ananke_abm_tpu.data_generator.population import (
            generate_population_activities,
        )
        from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
        from ananke_abm_tpu.models.gen_schedule.pds import compute_pds
        from ananke_abm_tpu.models.gen_schedule.pipeline.train import train

        csv = str(tmp_path / "a.csv")
        generate_population_activities(60, seed=9).to_csv(csv, index=False)
        grid = str(tmp_path / "g.npz")
        prepare_from_csv(csv, grid, grid_min=60, val_frac=0.2, seed=1)
        compute_pds(
            grid, str(tmp_path / "p"), grid_min=60,
            purpose_json=grid.replace(".npz", "_purpose_map.json"),
        )
        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 1, "min_epochs": 1, "patience": 0,
                "batch_size": 32, "lr": 1e-3, "weight_decay": 0.0,
                "grad_clip": 1.0, "beta_target": 1.0, "beta_warm_frac": 1.0,
                "lambda_tv": 0.0, "lambda_home": 0.0,
                "lambda_tod": 0.1, "lambda_presence": 0.1,
                "lambda_share": 0.3,
            },
            "model": {
                "method": "auto_pds", "z_dim": 4, "emb_dim": 16,
                "cnn_channels": [16], "cnn_kernel": 3, "cnn_dropout": 0.0,
                "pds_path": str(tmp_path / "p_pds.npz"),
            },
        }
        train(cfg, str(tmp_path / "run"), seed=1)
        import pandas as pd

        log = pd.read_csv(str(tmp_path / "run" / "training_log.csv"))
        assert "train_share" in log.columns
        assert (log["train_share"] > 0).all()
