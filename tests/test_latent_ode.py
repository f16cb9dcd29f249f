"""latent_ode family: unified-timeline collate invariants, constraint
gradient in the RHS, and a tiny end-to-end train/infer/eval loop."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.data_generator.features import (
    MODE_ID_MAP,
    PURPOSE_ID_MAP,
)
from ananke_abm_tpu.data_generator.mock_world import (
    adjacency_matrix,
    distance_matrix,
    get_persona,
    persona_timeline,
    zone_feature_matrix,
)
from ananke_abm_tpu.models.latent_ode.config import GenerativeODEConfig
from ananke_abm_tpu.models.latent_ode.data import (
    get_person_sample,
    unify_and_interpolate_batch,
)


def tiny_config(**kw):
    base = dict(
        hidden_dim=8,
        encoder_hidden_dim=16,
        ode_hidden_dim=16,
        zone_embed_dim=4,
        num_residual_blocks=1,
        enable_sde=True,
        sde_substeps=3,
        num_iterations=5,
    )
    base.update(kw)
    return GenerativeODEConfig(**base)


class TestMockWorld:
    def test_world_shapes(self):
        zf = zone_feature_matrix()
        assert zf.shape == (8, 7)
        dm = distance_matrix()
        assert dm.shape == (8, 8)
        np.testing.assert_allclose(dm, dm.T)
        assert (np.diag(dm) == 0).all()
        A = adjacency_matrix()
        np.testing.assert_array_equal(A, A.T)
        assert (np.diag(A) == 1).all()

    def test_personas(self):
        for pid in (1, 2):
            tl = persona_timeline(get_persona(pid))
            assert (np.diff(tl["times"]) > 0).all()
            assert tl["zone_ids"].min() >= 0 and tl["zone_ids"].max() < 8
            assert tl["person_attrs"].shape == (8,)
            # day starts and ends at home
            assert tl["zone_ids"][0] == tl["home_zone_id"]
            assert tl["zone_ids"][-1] == tl["home_zone_id"]

    def test_repeat_days_with_noise(self):
        tl = persona_timeline(get_persona(1), repeat_days=3, noise_std_h=0.05, seed=1)
        assert tl["times"].shape[0] == 30
        assert (np.diff(tl["times"]) >= 0).all()


class TestUnifiedTimeline:
    @pytest.fixture(scope="class")
    def batch(self):
        cfg = tiny_config()
        samples = [get_person_sample(p, cfg) for p in (1, 2)]
        return samples, unify_and_interpolate_batch(samples, cfg)

    def test_real_points_preserved(self, batch):
        samples, b = batch
        t = b["t_unified"]
        for i, s in enumerate(samples):
            pos = np.searchsorted(t, s["times"])
            np.testing.assert_array_equal(b["y_loc_dense"][i, pos], s["trajectory_y"])
            np.testing.assert_array_equal(
                b["y_purp_dense"][i, pos], s["target_purpose_ids"]
            )
            assert (b["loss_mask"][i, pos] > 0).all()

    def test_mask_zero_on_interpolated(self, batch):
        samples, b = batch
        interp = b["y_loc_dense"] < 0
        assert (b["loss_mask"][interp] == 0).all()

    def test_intelligent_fill(self, batch):
        samples, b = batch
        travel = PURPOSE_ID_MAP["travel"]
        t = b["t_unified"]
        for i, s in enumerate(samples):
            pos = np.searchsorted(t, s["times"])
            interp = np.ones(len(t), bool)
            interp[pos] = False
            # between two real points with different purposes -> travel fill
            filled = b["y_purp_dense"][i][interp]
            assert (filled >= 0).all(), "interpolated purposes are filled"
            prev_i = b["prev_real_indices"][i][interp]
            next_i = b["next_real_indices"][i][interp]
            p_prev = b["y_purp_dense"][i][prev_i]
            p_next = b["y_purp_dense"][i][next_i]
            diff = p_prev != p_next
            np.testing.assert_array_equal(
                filled[diff], np.full(diff.sum(), travel)
            )

    def test_prev_next_indices(self, batch):
        samples, b = batch
        t = b["t_unified"]
        for i, s in enumerate(samples):
            pos = np.searchsorted(t, s["times"])
            pi, ni = b["prev_real_indices"][i], b["next_real_indices"][i]
            assert (np.isin(pi, pos)).all() and (np.isin(ni, pos)).all()
            # within the person's own time range, prev <= t <= next
            inside = (t >= s["times"][0]) & (t <= s["times"][-1])
            assert (t[pi][inside] <= t[inside] + 1e-6).all()
            assert (t[ni][inside] >= t[inside] - 1e-6).all()


class TestModel:
    def test_constraint_gradient_nonzero(self):
        from ananke_abm_tpu.models.latent_ode.model import GenerativeODE

        cfg = tiny_config(enable_sde=False, ode_method="rk4", rk4_substeps=1)
        model = GenerativeODE(
            person_feat_dim=8, num_zone_features=7, config=cfg
        )
        # the potential's gradient wrt p must be finite and generally nonzero
        import jax

        key = jax.random.PRNGKey(0)
        p = jax.random.normal(key, (3, cfg.position_dim))
        pot_fn = lambda p: model._potential(p)
        g = jax.grad(pot_fn)(p)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0

    @pytest.mark.slow
    def test_forward_shapes(self):
        from ananke_abm_tpu.models.latent_ode.train import (
            build_model_and_batch,
            make_forward,
        )

        cfg = tiny_config()
        model, b, _ = build_model_and_batch(cfg)
        key = jax.random.PRNGKey(0)
        params = model.init(
            {"params": key},
            b["person_features"],
            b["all_zone_features"][b["home_zone_ids"]],
            b["all_zone_features"][b["work_zone_ids"]],
            b["initial_purpose_features"], b["initial_mode_features"],
            b["t_unified"], b["all_zone_features"], key,
        )["params"]
        fwd = make_forward(model)
        out = jax.jit(fwd)(params, b, key)
        B, T = b["y_loc_dense"].shape
        assert out[0].shape == (B, T, 8)  # loc logits over 8 zones
        assert out[2].shape == (B, T, len(cfg.purpose_groups))
        assert out[3].shape == (B, T, cfg.num_modes)
        assert np.all(np.isfinite(np.asarray(out[0])))


class TestEndToEnd:
    @pytest.mark.slow
    def test_train_infer_evaluate(self, tmp_path):
        from ananke_abm_tpu.models.latent_ode.train import train
        from ananke_abm_tpu.models.latent_ode.inference import (
            BatchedInferenceEngine,
        )
        from ananke_abm_tpu.models.latent_ode.evaluate import evaluate

        cfg = tiny_config(num_iterations=6)
        out = str(tmp_path / "run")
        res = train(out, config=cfg, steps_per_call=3, log_every=0)
        assert os.path.exists(res["ckpt"])
        assert os.path.exists(os.path.join(out, "loss_history.npz"))
        assert np.isfinite(res["best_loss"])

        engine = BatchedInferenceEngine(res["ckpt"])
        preds = engine.predict_trajectories(num_samples=2)
        assert preds["zones"].shape[0] == 2  # people
        assert preds["zones"].shape[1] == 2  # samples

        bench = engine.benchmark_performance(batch_sizes=(1, 4))
        assert bench[1]["people_per_s"] > 0
        assert "projected_1M_people_hours" in bench

        metrics = evaluate(res["ckpt"], str(tmp_path / "ev"), num_eval_points=50, make_plots=False)
        assert "persons" in metrics and len(metrics["persons"]) == 2
