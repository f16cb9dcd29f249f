"""traj_syn family: purposes catalog, buffer grid, and end-to-end
train -> generate -> validate in both CRF modes."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from ananke_abm_tpu.data_generator.population import (
    generate_population_activities,
)
from ananke_abm_tpu.models.traj_syn.configs import TrajEmbedConfig
from ananke_abm_tpu.utils.make_purposes import build_purposes_catalog
from ananke_abm_tpu.utils.traj_fig.make_buffer_grid import make_buffer_grid


@pytest.fixture(scope="module")
def activities_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("ts")
    df = generate_population_activities(48, seed=3)
    p = os.path.join(d, "acts.csv")
    df.to_csv(p, index=False)
    return p


class TestPurposesCatalog:
    def test_catalog_matches_reference_schema(self, activities_csv, tmp_path):
        from ananke_abm_tpu.utils.make_purposes import LEAD_COLUMNS

        out = str(tmp_path / "purposes.csv")
        cat = build_purposes_catalog(activities_csv, out)
        assert os.path.exists(out)
        # reference lead column set, in order
        # (reference utils/make_purposes.py:22-53 output contract)
        assert list(cat.columns[: len(LEAD_COLUMNS)]) == LEAD_COLUMNS
        home = cat[cat.purpose == "Home"].iloc[0]
        assert home["person_day_participation_rate"] == 1.0
        assert home["can_open_close_day"] == 1 and home["is_primary"] == 1
        assert (cat["start_circ_var"] >= 0).all()
        assert (cat["flexibility"].between(0, 1)).all()
        assert (cat["skip_probability"].between(0, 1)).all()
        assert (cat["iqr_duration_min"] >= 0).all()
        assert (cat["std_duration_min"] >= 0).all()
        assert (cat["duration_cv"] >= 0).all()
        # sorted by participation desc
        p = cat["person_day_participation_rate"].to_numpy()
        assert (np.diff(p) <= 1e-12).all()

    def test_overrides(self, activities_csv, tmp_path):
        ov = tmp_path / "ov.yaml"
        ov.write_text(
            "Home:\n  is_primary: 'N'\n  notes: anchor activity\n"
        )
        cat = build_purposes_catalog(activities_csv, overrides=str(ov))
        home = cat[cat.purpose == "Home"].iloc[0]
        assert home["is_primary"] == 0
        assert home["notes"] == "anchor activity"

    def test_persons_csv_widens_denominator(self, activities_csv, tmp_path):
        import pandas as pd

        acts = pd.read_csv(activities_csv)
        extra = pd.DataFrame(
            {"persid": list(acts["persid"].unique()) + ["ghost1", "ghost2"]}
        )
        pcsv = tmp_path / "persons.csv"
        extra.to_csv(pcsv, index=False)
        cat = build_purposes_catalog(activities_csv, persons_csv=str(pcsv))
        home = cat[cat.purpose == "Home"].iloc[0]
        n = acts["persid"].nunique()
        assert abs(
            home["person_day_participation_rate"] - n / (n + 2)
        ) < 1e-9

    def test_configurable_columns(self, activities_csv, tmp_path):
        import pandas as pd

        df = pd.read_csv(activities_csv).rename(
            columns={"persid": "PID", "purpose": "act",
                     "starttime": "start_min", "total_duration": "dur"}
        )
        csv2 = tmp_path / "renamed.csv"
        df.to_csv(csv2, index=False)
        cat = build_purposes_catalog(str(csv2))  # alias fallbacks resolve
        assert len(cat) > 0 and "Home" in set(cat["purpose"])


class TestBufferGrid:
    def test_horizon_and_home_end(self, activities_csv):
        Y, pm, pers = make_buffer_grid(activities_csv, grid_min=10)
        assert Y.shape[1] == 180  # 1800 / 10
        assert (Y[:, -1] == pm["Home"]).all()
        assert len(pers) == 48


class TestEndToEnd:
    @pytest.mark.parametrize("crf_mode", ["linear", "semi"])
    @pytest.mark.slow
    def test_train_generate_validate(self, activities_csv, tmp_path, crf_mode):
        from ananke_abm_tpu.models.traj_syn.pipeline.train_full import (
            train_traj_embed,
        )
        from ananke_abm_tpu.models.traj_syn.pipeline.validate import (
            gen_n_val_traj,
        )

        cfg = TrajEmbedConfig(
            grid_min=60, horizon_min=1800, z_dim=4, emb_dim=16,
            cnn_channels=(16,), cnn_kernel=3,
        )
        out = str(tmp_path / f"run_{crf_mode}")
        res = train_traj_embed(
            activities_csv, None, epochs=2, batch_size=16,
            outdir=out, crf_mode=crf_mode, config=cfg,
            semi_Dmax_minutes=300,
        )
        assert os.path.exists(res["ckpt"])
        assert np.isfinite(res["best_val_loss"])

        gen_csv = str(tmp_path / f"gen_{crf_mode}.csv")
        summ_json = str(tmp_path / f"summary_{crf_mode}.json")
        summary = gen_n_val_traj(
            res["ckpt"], num_gen=20, gen_csv=gen_csv,
            val_csv=activities_csv, eval_step_minutes=60,
            summary_json=summ_json,
        )
        assert os.path.exists(gen_csv)
        df = pd.read_csv(gen_csv)
        assert set(df.columns) == {
            "persid", "stopno", "purpose", "starttime", "total_duration",
        }
        assert df["persid"].nunique() == 20
        assert "validation" in summary
        assert "generated_stats" in summary
        with open(summ_json) as f:
            loaded = json.load(f)
        assert loaded["num_gen"] == 20

        if crf_mode == "semi":
            # Dmax cap respected in generated segments (300 min at 60-min
            # grid = 5 bins) except possibly unconstrained argmax paths
            stats = summary["generated_stats"]
            assert stats["max_segment_minutes"] <= 300

    @pytest.mark.slow
    def test_vae_only_synthesize_analyze(self, activities_csv, tmp_path):
        from ananke_abm_tpu.models.traj_syn.pipeline.vae_only import (
            analyze_vae,
            synthesize_vae,
            train_vae_only,
        )

        cfg = TrajEmbedConfig(
            grid_min=60, horizon_min=1800, z_dim=4, emb_dim=16,
            cnn_channels=(16,), cnn_kernel=3,
        )
        out = str(tmp_path / "vae_only")
        res = train_vae_only(
            activities_csv, None, epochs=1, batch_size=16,
            outdir=out, config=cfg,
        )
        npz = synthesize_vae(res["ckpt"], 10, str(tmp_path / "syn.npz"))
        analysis = analyze_vae(npz, str(tmp_path / "analysis.json"))
        assert analysis["N"] == 10
        assert "minutes_share" in analysis


class TestWriteSegmentsCSV:
    def test_matches_per_person_decoder(self, tmp_path):
        """The vectorized whole-population CSV writer must emit exactly
        the rows the reference-style per-person decoder produces."""
        import pandas as pd

        from ananke_abm_tpu.models.gen_schedule.pipeline.sample import (
            decode_person_to_segments,
        )
        from ananke_abm_tpu.models.traj_syn.pipeline.validate import (
            write_segments_csv,
        )

        rng = np.random.default_rng(7)
        Y = np.repeat(rng.integers(0, 4, size=(50, 6)), 3, axis=1)
        inv_map = {0: "Home", 1: "Work", 2: "Shop", 3: "Edu"}
        path = str(tmp_path / "gen.csv")
        write_segments_csv(Y, path, grid_min=5, inv_map=inv_map)
        got = pd.read_csv(path)

        want_rows = []
        for i in range(Y.shape[0]):
            want_rows += decode_person_to_segments(
                Y[i], f"gen_{i:06d}", 5, inv_map
            )
        want = pd.DataFrame(want_rows)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
