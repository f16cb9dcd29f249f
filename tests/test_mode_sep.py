"""mode_sep family: union-grid invariants (the reference's
test_data_batching.py contract, modernized) + tiny end-to-end train/infer/eval
on the two-person CSV fixtures."""
import os

import numpy as np
import pytest

from ananke_abm_tpu.models.mode_sep.batching import (
    build_union_batch,
    insert_internal_points,
)
from ananke_abm_tpu.models.mode_sep.config import ModeSepConfig
from ananke_abm_tpu.models.mode_sep.data import load_trajectory_csvs

DATA = os.path.join(os.path.dirname(__file__), "data")
PERIODS = os.path.join(DATA, "periods_small.csv")
SNAPS = os.path.join(DATA, "snaps_small.csv")


@pytest.fixture(scope="module")
def loaded():
    return load_trajectory_csvs(PERIODS, SNAPS)


@pytest.fixture(scope="module")
def union(loaded):
    people, shared = loaded
    return build_union_batch(people, K_internal=4)


class TestLoading:
    def test_people_and_zones(self, loaded):
        people, shared = loaded
        assert len(people) == 2
        assert shared.id_maps.Z == 4  # two homes + office + campus
        p1 = people[0]
        assert p1.times_snap.shape == (6,)
        assert p1.home_zone_idx == p1.loc_ids[0]
        assert (np.diff(p1.times_snap) > 0).all()

    def test_unknown_location_raises(self, tmp_path):
        import pandas as pd

        bad = pd.read_csv(SNAPS)
        bad.loc[0, "location"] = "Atlantis"
        bp = tmp_path / "snaps.csv"
        bad.to_csv(bp, index=False)
        # Atlantis appears only in snaps, not in periods stays -> it enters
        # the derived universe; instead corrupt a period row's location
        periods = pd.read_csv(PERIODS)
        zones = sorted(
            set(periods.loc[periods["type"] == "stay", "location"])
        )
        with pytest.raises(ValueError, match="unknown period types"):
            p2 = periods.copy()
            p2.loc[1, "type"] = "teleport"
            pp = tmp_path / "periods.csv"
            p2.to_csv(pp, index=False)
            load_trajectory_csvs(str(pp), SNAPS)


class TestUnionGrid:
    def test_strictly_increasing(self, union):
        assert (np.diff(union.times_union) > 0).all()

    def test_gt_alignment(self, loaded, union):
        people, _ = loaded
        for i, p in enumerate(people):
            gt_times = union.times_union[union.is_gt[i]]
            np.testing.assert_allclose(np.sort(gt_times), np.sort(p.times_snap), atol=1e-5)
            # snap_indices round-trip to the person's own arrays
            pos = np.nonzero(union.is_gt[i])[0]
            sidx = union.snap_indices[i][pos]
            np.testing.assert_allclose(
                p.times_snap[sidx], union.times_union[pos], atol=1e-5
            )
            np.testing.assert_array_equal(
                p.loc_ids[sidx], union.y_union[i][pos]
            )

    def test_internal_point_count(self):
        t = np.array([0.0, 1.0, 2.0], dtype=np.float32)
        out = insert_internal_points(t, 3)
        # each of 2 gaps gets 3 internal points: 3 + 6 = 9
        assert out.shape == (9,)
        assert (np.diff(out) > 0).all()

    def test_stay_masks(self, loaded, union):
        people, _ = loaded
        for i, p in enumerate(people):
            inside = union.stay_mask[i]
            # every GT snap lies inside some stay for these fixtures
            assert (union.stay_loc_ids[i][inside] >= 0).all()
            assert not union.stay_non_gt[i][~inside].any()

    def test_travel_metadata(self, union):
        tm = union.travel_mask
        assert tm.any(), "fixtures contain zone changes with interior points"
        assert (union.prev_zone[tm] >= 0).all()
        assert (union.dest_zone[tm] >= 0).all()
        assert (union.prev_zone[tm] != union.dest_zone[tm]).all()
        pr = union.progress[tm]
        assert (pr > 0).all() and (pr < 1).all()

    def test_gt_interior_excludes_endpoints(self, loaded, union):
        people, _ = loaded
        for i, p in enumerate(people):
            pos = np.nonzero(union.is_gt[i])[0]
            assert not union.gt_interior[i, pos[0]]
            assert not union.gt_interior[i, pos[-1]]
            assert union.gt_interior[i, pos[1:-1]].all()


class TestEndToEnd:
    @pytest.mark.slow
    def test_train_infer_evaluate(self, tmp_path):
        from ananke_abm_tpu.models.mode_sep.train import train
        from ananke_abm_tpu.models.mode_sep.inference import run_inference
        from ananke_abm_tpu.models.mode_sep.evaluate import evaluate

        cfg = ModeSepConfig(
            emb_dim=8,
            context_dim=8,
            zone_emb_dim=4,
            hidden_dim=16,
            num_res_blocks=1,
            K_internal=2,
            rk4_substeps=1,
            max_epochs=3,
            dense_resolution=50,
        )
        out = str(tmp_path / "run")
        result = train(PERIODS, SNAPS, out, config=cfg)
        assert os.path.exists(result["ckpt"])
        assert os.path.exists(os.path.join(out, "curves.csv"))
        assert np.isfinite(result["best_loss"])

        pred_df = run_inference(result["ckpt"], PERIODS, SNAPS, str(tmp_path / "inf"))
        assert {"person_id", "time", "gt_zone", "pred_zone", "distance_km", "match"} <= set(pred_df.columns)
        assert len(pred_df) == 12  # 6 snaps x 2 persons
        assert os.path.exists(tmp_path / "inf" / "dense_rollout.npz")

        metrics = evaluate(result["ckpt"], PERIODS, SNAPS, str(tmp_path / "ev"))
        for k in (
            "snap_accuracy",
            "mean_expected_distance_km",
            "velocity_stay_travel_auc",
            "stay_detection",
        ):
            assert k in metrics

    @pytest.mark.slow
    def test_sde_path_runs(self, tmp_path):
        from ananke_abm_tpu.models.mode_sep.train import train

        cfg = ModeSepConfig(
            emb_dim=8, context_dim=8, zone_emb_dim=4, hidden_dim=16,
            num_res_blocks=1, K_internal=1, max_epochs=1,
            enable_sde=True, sde_noise_strength=0.01, sde_substeps=2,
        )
        result = train(PERIODS, SNAPS, str(tmp_path / "sde"), config=cfg)
        assert np.isfinite(result["best_loss"])


class TestGradientRobustness:
    @pytest.mark.slow
    def test_drift_grads_finite_at_rest(self, loaded):
        """The drift output layer is zero-initialized, so v == 0 exactly
        on step one; every loss term (incl. |v| penalties) must still
        have finite gradients there (regression: a bare norm() gave the
        drift NaN gradients, which the non-finite-grad guard then zeroed
        — silently freezing the drift for the entire run)."""
        import jax
        import jax.numpy as jnp

        from ananke_abm_tpu.models.mode_sep.losses import total_loss
        from ananke_abm_tpu.models.mode_sep.model import ModeSepModel
        from ananke_abm_tpu.models.mode_sep.train import union_to_device

        people, shared = loaded
        config = ModeSepConfig()
        union = build_union_batch(
            people, config.K_internal, config.time_match_tol
        )
        times, fb = union_to_device(union)
        model = ModeSepModel(Z=shared.id_maps.Z, config=config)
        key = jax.random.PRNGKey(0)
        params = model.init(
            {"params": key, "sde": key}, times,
            fb["home_idx"], fb["work_idx"], fb["traits"],
        )["params"]

        def loss(params):
            pred_emb, logits, v = model.apply(
                {"params": params}, times, fb["home_idx"], fb["work_idx"],
                fb["traits"], rngs={"sde": key},
            )
            tot, _ = total_loss(
                config, logits, pred_emb, v,
                params["class_table"], jnp.asarray(shared.dist_mat), fb,
            )
            return tot

        g = jax.grad(loss)(params)
        for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
            assert bool(jnp.isfinite(leaf).all()), (
                f"non-finite grad at {jax.tree_util.keystr(path)}"
            )
