"""CLI surface + viz + exporter smoke tests (the acceptance checklist of
SURVEY.md §7.4: both console script groups with the documented commands)."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from ananke_abm_tpu.cli.main import main as ananke_main
from ananke_abm_tpu.cli.rgen_schedule import main as rgen_main
from ananke_abm_tpu.data_generator.population import (
    generate_population_activities,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    df = generate_population_activities(64, seed=5)
    df.to_csv(os.path.join(d, "acts.csv"), index=False)
    return d


class TestRgenScheduleCLI:
    def test_command_list(self):
        runner = CliRunner()
        res = runner.invoke(rgen_main, ["--help"])
        assert res.exit_code == 0
        for cmd in (
            "prepare", "fit", "sample-population", "eval-population",
            "viz-population", "compute-pds", "prepare-crf-data",
            "train-crf", "compare-samples", "metric-tables", "plot-overview",
        ):
            assert cmd in res.output

    @pytest.mark.slow
    def test_full_cli_workflow(self, workdir):
        runner = CliRunner()
        acts = str(workdir / "acts.csv")
        grid = str(workdir / "data" / "grid.npz")

        r = runner.invoke(rgen_main, [
            "prepare", "--activities", acts, "--grid", "30",
            "--out", grid, "--val-frac", "0.2", "--seed", "1",
        ])
        assert r.exit_code == 0, r.output

        cfg = {
            "data": {"npz": grid},
            "train": {
                "epochs": 2, "min_epochs": 2, "patience": 0,
                "batch_size": 32, "lr": 1e-3, "weight_decay": 0.0,
                "grad_clip": 1.0, "beta_target": 1.0,
                "beta_warm_frac": 0.5, "lambda_tv": 0.0, "lambda_home": 0.1,
            },
            "model": {
                "method": "baseline_cnn", "z_dim": 4, "emb_dim": 16,
                "cnn_channels": [16], "cnn_kernel": 3, "cnn_dropout": 0.1,
            },
        }
        cfg_path = str(workdir / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        rundir = str(workdir / "run")
        r = runner.invoke(rgen_main, [
            "fit", "--config", cfg_path, "--output-dir", rundir, "--seed", "1",
        ])
        assert r.exit_code == 0, r.output
        ckpt = os.path.join(rundir, "checkpoints", "best_val.ckpt")

        # compute-pds
        r = runner.invoke(rgen_main, [
            "compute-pds", "--grid", grid, "--out", str(workdir / "pds"),
            "--grid-min", "30",
            "--purpose-json", grid.replace(".npz", "_purpose_map.json"),
        ])
        assert r.exit_code == 0, r.output
        assert os.path.exists(str(workdir / "pds_pds.npz"))

        # sample
        prefix = str(workdir / "samples" / "s")
        r = runner.invoke(rgen_main, [
            "sample-population", "--ckpt", ckpt, "--num-samples", "40",
            "--outprefix", prefix, "--seed", "2", "--csv-max-persons", "5",
        ])
        assert r.exit_code == 0, r.output

        # prepare-crf-data + train-crf
        crfdir = str(workdir / "crf")
        r = runner.invoke(rgen_main, [
            "prepare-crf-data", "--vae_ckpt", ckpt,
            "--splits", grid.replace(".npz", "_splits.npz"),
            "--outdir", crfdir, "--batch_size", "32",
        ])
        assert r.exit_code == 0, r.output
        crf_cfg = {
            "crf": {
                "train_npz": os.path.join(crfdir, "crf_train.npz"),
                "val_npz": os.path.join(crfdir, "crf_val.npz"),
                "save_path": os.path.join(crfdir, "crf_linear.ckpt"),
                "meta_json": os.path.join(crfdir, "crf_meta.json"),
                "num_epochs": 2, "batch_size": 16, "lr": 1e-2,
                "weight_decay": 1e-4, "log_every": 1,
            }
        }
        crf_cfg_path = str(workdir / "crf_cfg.json")
        with open(crf_cfg_path, "w") as f:
            json.dump(crf_cfg, f)
        r = runner.invoke(rgen_main, ["train-crf", "--cfg", crf_cfg_path])
        assert r.exit_code == 0, r.output

        # CRF-decoded constrained sampling
        prefix2 = str(workdir / "samples" / "s_crf")
        r = runner.invoke(rgen_main, [
            "sample-population", "--ckpt", ckpt, "--num-samples", "30",
            "--outprefix", prefix2, "--decode-mode", "crf",
            "--crf-path", crf_cfg["crf"]["save_path"], "--enforce-nonhome",
        ])
        assert r.exit_code == 0, r.output
        Y2 = np.load(prefix2 + ".npz")["Y_generated"]
        with open(grid.replace(".npz", "_meta.json")) as f:
            home = json.load(f)["purpose_map"]["Home"]
        assert not (Y2 == home).all(axis=1).any()

        # eval + viz
        r = runner.invoke(rgen_main, [
            "eval-population", "--samples", prefix + ".npz",
            "--samples-meta", prefix + "_meta.json",
            "--reference", grid, "--out-json", str(workdir / "report.json"),
        ])
        assert r.exit_code == 0, r.output
        r = runner.invoke(rgen_main, [
            "viz-population", "--samples", prefix + ".npz",
            "--samples-meta", prefix + "_meta.json",
            "--outdir", str(workdir / "viz"), "--reference", grid,
        ])
        assert r.exit_code == 0, r.output
        assert os.path.exists(str(workdir / "viz" / "minutes_share.png"))

        # compare-samples + metric-tables + plot-overview
        r = runner.invoke(rgen_main, [
            "compare-samples", "--sample", f"argmax={prefix}",
            "--sample", f"crf={prefix2}",
            "--reference", grid, "--outdir", str(workdir / "cmp"),
        ])
        assert r.exit_code == 0, r.output
        assert os.path.exists(str(workdir / "cmp" / "comparison_aggregate.csv"))

        # metric-tables needs a compare dir with npz+meta
        cdir = workdir / "cmp_models"
        cdir.mkdir()
        import shutil

        for name, pfx in (("argmax", prefix), ("crf", prefix2)):
            Ys = np.load(pfx + ".npz")["Y_generated"][:30]
            np.savez(str(cdir / f"{name}.npz"), Y_generated=Ys)
            shutil.copy(pfx + "_meta.json", str(cdir / f"{name}_meta.json"))
        r = runner.invoke(rgen_main, [
            "metric-tables", "--ref-npz", grid,
            "--ref-meta", grid.replace(".npz", "_meta.json"),
            "--compare-dir", str(cdir), "--outdir", str(workdir / "tables"),
        ])
        assert r.exit_code == 0, r.output
        assert os.path.exists(str(workdir / "tables" / "srmse_schedule.csv"))

        r = runner.invoke(rgen_main, [
            "plot-overview", "--ref-npz", grid,
            "--ref-meta", grid.replace(".npz", "_meta.json"),
            "--compare-dir", str(cdir), "--outdir", str(workdir / "overview"),
        ])
        assert r.exit_code == 0, r.output
        assert os.path.exists(
            str(workdir / "overview" / "lorenz_gini_overview.png")
        )


class TestAnankeCLI:
    def test_command_list(self):
        runner = CliRunner()
        res = runner.invoke(ananke_main, ["--help"])
        assert res.exit_code == 0
        for cmd in ("traj-embed", "gval-traj", "visualize-combined-traj",
                    "info", "make-purposes", "gatode-train",
                    "gatode-serve"):
            assert cmd in res.output

    @pytest.mark.slow
    def test_gatode_train_serve(self, tmp_path):
        """gatode-train -> gatode-serve: the flagship family end to end
        from the CLI; the serve step regenerates the ckpt's zone world
        and writes the ids npz."""
        import numpy as np

        runner = CliRunner()
        outdir = str(tmp_path / "gatode")
        res = runner.invoke(ananke_main, [
            "gatode-train", "--outdir", outdir, "--n-agents", "96",
            "--num-times", "6", "--num-zones", "10", "--epochs", "2",
            "--batch", "96", "--num-blocks", "1", "--seed", "3",
        ])
        assert res.exit_code == 0, res.output
        ckpt = str(tmp_path / "gatode" / "gatode_best.ckpt")
        out_npz = str(tmp_path / "served.npz")
        res = runner.invoke(ananke_main, [
            "gatode-serve", "--ckpt", ckpt, "--out-npz", out_npz,
            "--n-agents", "64", "--seed", "9",
        ])
        assert res.exit_code == 0, res.output
        z = np.load(out_npz)
        assert z["zone_ids"].shape == (64, 6)
        assert z["zone_ids"].dtype == np.int32
        assert int(z["zone_ids"].max()) < 10

    @pytest.mark.slow
    def test_gatode_train_serve_sparse_world(self, tmp_path):
        import numpy as np

        runner = CliRunner()
        outdir = str(tmp_path / "gatode_sp")
        res = runner.invoke(ananke_main, [
            "gatode-train", "--outdir", outdir, "--n-agents", "96",
            "--num-times", "6", "--num-zones", "40", "--epochs", "2",
            "--batch", "96", "--num-blocks", "1", "--seed", "3",
            "--sparse-world",
        ])
        assert res.exit_code == 0, res.output
        out_npz = str(tmp_path / "served_sp.npz")
        res = runner.invoke(ananke_main, [
            "gatode-serve", "--ckpt",
            str(tmp_path / "gatode_sp" / "gatode_best.ckpt"),
            "--out-npz", out_npz, "--n-agents", "48",
        ])
        assert res.exit_code == 0, res.output
        z = np.load(out_npz)
        assert z["zone_ids"].shape == (48, 6)
        assert int(z["zone_ids"].max()) < 40

    def test_info(self):
        res = CliRunner().invoke(ananke_main, ["info"])
        assert res.exit_code == 0
        assert "ananke_abm_tpu" in res.output

    def test_visualize_combined_traj(self, workdir):
        res = CliRunner().invoke(ananke_main, [
            "visualize-combined-traj",
            "--trajectory-csv", str(workdir / "acts.csv"),
            "--outdir", str(workdir / "trajfig"), "--grid-min", "30",
        ])
        assert res.exit_code == 0, res.output
        assert os.path.exists(str(workdir / "trajfig" / "stacked_traj.png"))

    def test_make_purposes(self, workdir):
        res = CliRunner().invoke(ananke_main, [
            "make-purposes", "--activities-csv", str(workdir / "acts.csv"),
            "--out-csv", str(workdir / "purposes.csv"),
        ])
        assert res.exit_code == 0, res.output

    def test_make_purposes_case_variant_overrides(self, workdir):
        """Override rows whose raw spellings normalize to the same
        purpose ('work' + 'Work') must collapse last-writer-wins, not
        crash the reindex with duplicate labels."""
        import pandas as pd

        from ananke_abm_tpu.utils.make_purposes import (
            build_purposes_catalog,
        )

        ov_csv = workdir / "ov.csv"
        pd.DataFrame({
            "purpose": ["work", "Work"],
            "notes": ["first", "last-wins"],
        }).to_csv(ov_csv, index=False)
        out = build_purposes_catalog(
            str(workdir / "acts.csv"), override_csv=str(ov_csv)
        )
        notes = out.set_index("purpose")["notes"]
        assert notes.get("Work") == "last-wins"

    def test_unparseable_day_excluded_from_denominator(self, tmp_path):
        """Regression: a day whose rows are ALL dropped as unparseable
        (non-numeric durations) must not count toward the person-day
        participation denominator."""
        import pandas as pd

        from ananke_abm_tpu.utils.make_purposes import (
            build_purposes_catalog,
        )

        acts = tmp_path / "acts.csv"
        pd.DataFrame({
            "persid": ["p1", "p1", "p1"],
            "day": [1, 1, 2],
            "purpose": ["Work", "Home", "Work"],
            "startime": [540, 0, 540],
            "total_duration": [480, 500, "bad"],  # day 2 fully dropped
        }).to_csv(acts, index=False)
        persons = tmp_path / "persons.csv"
        pd.DataFrame({"persid": ["p1", "p2"]}).to_csv(persons, index=False)

        out = build_purposes_catalog(
            str(acts), persons_csv=str(persons), day_col="day"
        ).set_index("purpose")
        # denominator = 2 persons x 1 parseable day = 2 (NOT 4)
        assert out.loc["Work", "person_day_participation_rate"] == 0.5


class TestDataGenerator:
    def test_export_csvs_roundtrip(self, tmp_path):
        from ananke_abm_tpu.data_generator.export_csvs import (
            write_mock_world_csvs,
        )
        from ananke_abm_tpu.models.mode_sep.data import load_trajectory_csvs

        paths = write_mock_world_csvs(str(tmp_path))
        for k in ("periods.csv", "snaps.csv", "zones.csv", "dist_mat.csv",
                  "persons.csv", "segments.csv", "id_maps.json"):
            assert os.path.exists(paths[k])
        # the exported family loads through the strict validator
        people, shared = load_trajectory_csvs(
            paths["periods.csv"], paths["snaps.csv"], paths["zones.csv"],
            paths["persons.csv"], paths["dist_mat.csv"],
        )
        assert len(people) == 2
        assert shared.id_maps.Z == 8
        assert shared.zone_features is not None

    def test_analyze_transitions(self):
        from ananke_abm_tpu.data_generator.analyze_transitions import (
            analyze_transitions,
        )

        out = analyze_transitions(verbose=False)
        assert len(out["purpose_transitions"]) > 0
        assert out["forbidden"] == []

    def test_load_and_visualize(self, tmp_path):
        from ananke_abm_tpu.data_generator.data_visualization import (
            plot_persona_trajectories,
            plot_zone_graph,
        )
        from ananke_abm_tpu.data_generator.load_data import load_mock_data

        data = load_mock_data()
        assert len(data["trajectories"]) == 2
        assert data["adjacency"].shape == (8, 8)
        p = plot_zone_graph(str(tmp_path / "zones.png"))
        assert os.path.exists(p)
        outs = plot_persona_trajectories(str(tmp_path))
        assert len(outs) == 2


class TestComparisonsAndOverview:
    """pipeline/comparisons.py + compare/plot_viz.py end-to-end on tiny
    synthetic sample sets (reference pipeline/comparisons.py:16-236,
    compare/plot_viz.py:21-51)."""

    def _make_world(self, tmp_path, N=40, T=24, P=4):
        import json

        import numpy as np

        rng = np.random.default_rng(0)
        pm = {"Home": 0, "Work": 1, "Shop": 2, "Edu": 3}
        meta = {"purpose_map": pm, "grid_min": 60, "L": T}

        def grid(seed):
            r = np.random.default_rng(seed)
            Y = r.integers(0, P, size=(N, T))
            Y[:, 0] = 0
            Y[:, -1] = 0
            return Y

        ref_npz = tmp_path / "ref.npz"
        np.savez(ref_npz, Y=grid(1))
        ref_meta = tmp_path / "ref_meta.json"
        ref_meta.write_text(json.dumps(meta))

        specs = []
        for name, seed in (("modelA", 2), ("modelB", 3)):
            npz = tmp_path / f"{name}.npz"
            np.savez(npz, Y_generated=grid(seed))
            mj = tmp_path / f"{name}_meta.json"
            mj.write_text(json.dumps(meta))
            specs.append((name, str(npz), str(mj)))
        return str(ref_npz), str(ref_meta), specs

    def test_compare_samples_artifacts(self, tmp_path):
        import csv
        import json
        import os

        from ananke_abm_tpu.models.gen_schedule.pipeline.comparisons import (
            compare_samples,
        )

        ref_npz, _, specs = self._make_world(tmp_path)
        outdir = str(tmp_path / "cmp")
        reports = compare_samples(specs, ref_npz, outdir, make_plots=True)
        assert [r["model"] for r in reports] == ["modelA", "modelB"]
        for name in ("modelA", "modelB"):
            with open(os.path.join(outdir, f"report_{name}.json")) as f:
                rep = json.load(f)
            assert "bigram" in rep and "tod_jsd_macro" in rep
        with open(os.path.join(outdir, "comparison_aggregate.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert all(float(r["bigram_L1"]) >= 0 for r in rows)
        pngs = [p for p in os.listdir(outdir) if p.endswith(".png")]
        assert pngs, "comparison plots missing"

    def test_plot_overview_artifacts(self, tmp_path):
        import os

        from ananke_abm_tpu.models.gen_schedule.compare.plot_viz import (
            plot_overview,
        )

        ref_npz, ref_meta, specs = self._make_world(tmp_path)
        outdir = str(tmp_path / "viz")
        plot_overview(ref_npz, ref_meta, str(tmp_path), outdir)
        # lorenz/gini overview + tod curves + duration boxplots
        out = []
        for root, _, files in os.walk(outdir):
            out += [f for f in files if f.endswith(".png")]
        assert len(out) >= 3, out

    def test_plot_overview_threads_grid_min(self, tmp_path, monkeypatch):
        """The ToD time axis must follow the reference grid: at
        grid_min=60 a 24-bin day spans 24 h, not the 5-min default's
        2 h (regression: plot_overview dropped ref['grid_min'])."""
        import ananke_abm_tpu.models.gen_schedule.compare.plot_viz as pv

        seen = {}

        def fake_tod(ref, models, outdir, time_grid=5, **kw):
            seen["time_grid"] = time_grid

        monkeypatch.setattr(pv, "plot_tod_curves", fake_tod)
        ref_npz, ref_meta, _ = self._make_world(tmp_path)
        pv.plot_overview(ref_npz, ref_meta, str(tmp_path),
                         str(tmp_path / "viz2"))
        assert seen["time_grid"] == 60
