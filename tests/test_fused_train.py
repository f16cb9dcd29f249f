"""Fused training kernels (ops/pallas/fused_train.py): hand-written VJP
vs jax autodiff of a pure-JAX f32 reference, and the integrated train
step vs the XLA step — at one and two residual drift blocks.

Runs in Pallas interpret mode on the CPU mesh (conftest forces cpu).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ananke_abm_tpu.ops.pallas.fused_train import rk4_day_rollout

N, Da, Dz, Z, H, Hc, T, S = 40, 8, 16, 12, 16, 8, 4, 2


def _mk_problem(n_blocks):
    key = jax.random.PRNGKey(n_blocks)
    ks = jax.random.split(key, 8 + 4 * n_blocks)
    r = lambda i, *s: 0.3 * jax.random.normal(ks[i], s, jnp.float32)
    blocks = tuple(
        (r(8 + 4 * i, H, H), r(9 + 4 * i, H), r(10 + 4 * i, H, H),
         r(11 + 4 * i, H))
        for i in range(n_blocks)
    )
    args = (
        r(0, N, Da), r(1, N, Hc), r(2, Z, Dz),
        r(3, Da + Dz + Hc + 2, H), r(4, H), r(5, Da, Dz),
        blocks, r(6, H, Da), r(7, Da),
    )
    times = jnp.linspace(0.0, 2.0, T)
    tgt = jax.random.normal(ks[6], (T, N, Da))
    return args, times, tgt


@pytest.fixture(scope="module", params=[1, 2])
def problem(request):
    return _mk_problem(request.param)


def _ref_rollout(times, x0, h, ze, W1, b1, Wq, blocks, W3, b3):
    """Plain-jnp f32 reference of the GAT-ODE day rollout."""

    def rhs(x, t):
        q = x @ Wq
        attn = jax.nn.softmax((q @ ze.T) / np.sqrt(Dz), axis=-1)
        ctx = attn @ ze
        ang = t * (2 * np.pi / 24.0)
        tf = jnp.broadcast_to(
            jnp.stack([jnp.sin(ang), jnp.cos(ang)])[None, :],
            (x.shape[0], 2),
        )
        feats = jnp.concatenate([x, ctx, h, tf], axis=-1)
        z = jnp.tanh(feats @ W1 + b1)
        for (Wr1, br1, Wr2, br2) in blocks:
            rt = jnp.tanh(z @ Wr1 + br1)
            z = jnp.tanh(z + rt @ Wr2 + br2)
        return z @ W3 + b3

    xs = [x0]
    x = x0
    for i in range(T - 1):
        t0, t1 = times[i], times[i + 1]
        dt = (t1 - t0) / S
        for s in range(S):
            t = t0 + s * dt
            k1 = rhs(x, t)
            k2 = rhs(x + dt / 2 * k1, t + dt / 2)
            k3 = rhs(x + dt / 2 * k2, t + dt / 2)
            k4 = rhs(x + dt * k3, t + dt)
            x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        xs.append(x)
    return jnp.stack(xs)


def test_forward_matches_f32_reference(problem):
    args, times, _ = problem
    xs_ref = _ref_rollout(times, *args)
    xs = rk4_day_rollout(*args, times, substeps=S, interpret=True)
    assert xs.shape == (T, N, Da)
    rel = float(jnp.max(jnp.abs(xs - xs_ref)) / jnp.max(jnp.abs(xs_ref)))
    assert rel < 1e-2, rel  # bf16 matmuls vs f32 reference


@pytest.mark.slow
def test_gradients_match_f32_reference(problem):
    args, times, tgt = problem

    def loss_ref(*a):
        return jnp.mean((_ref_rollout(times, *a) - tgt) ** 2)

    def loss_fused(*a):
        xs = rk4_day_rollout(*a, times, substeps=S, interpret=True)
        return jnp.mean((xs - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    for name, a, b in zip(
        "x0 h ze W1 b1 Wq blocks W3 b3".split(), g_ref, g_fused
    ):
        fa = jnp.concatenate([x.ravel() for x in jax.tree.leaves(a)])
        fb = jnp.concatenate([x.ravel() for x in jax.tree.leaves(b)])
        cos = float(
            fa @ fb / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb) + 1e-30)
        )
        assert cos > 0.999, (name, cos)


def test_grad_zero_on_padded_rows(problem):
    """Rows beyond N are tile padding; their grads must not leak into
    the weight grads (checked implicitly by the reference agreement) and
    x0/h grads must have the right shape."""
    args, times, tgt = problem

    def loss_fused(x0, h):
        xs = rk4_day_rollout(x0, h, *args[2:], times, substeps=S,
                             interpret=True)
        return jnp.mean((xs - tgt) ** 2)

    gx0, gh = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[1])
    assert gx0.shape == (N, Da) and gh.shape == (N, Hc)
    assert bool(jnp.all(jnp.isfinite(gx0))) and bool(
        jnp.all(jnp.isfinite(gh))
    )


class TestIntegratedStep:
    @pytest.fixture(scope="class", params=[1, 2])
    def setup(self, request):
        from ananke_abm_tpu.data_generator.agent_trajectories import (
            generate_agent_population,
        )
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            build_model,
            init_params,
            make_fused_train_step,
            make_step_fns,
        )

        config = GATODEConfig(substeps=2, num_blocks=request.param)
        data = generate_agent_population(96, num_times=5, seed=3,
                                         num_zones=16)
        model = build_model(config, 7, 8)
        params = init_params(model, config, data, 96, jax.random.PRNGKey(3))
        static = (
            jnp.asarray(data["zone_features"]), jnp.asarray(data["adj"]),
            jnp.asarray(data["times"]),
        )
        opt = optax.adamw(1e-3)
        batch = (
            jnp.asarray(data["person_feats"]),
            jnp.asarray(data["home_zone"]),
            jnp.asarray(data["zone_ids"]),
        )
        ref = make_step_fns(model, opt, config, static)
        fused = make_fused_train_step(model, opt, config, static)
        return params, opt, batch, ref, fused

    def test_loss_matches_xla_step(self, setup):
        params, _, (pf, hz, tg), (_, loss_ref), (_, loss_f) = setup
        lr, ar = loss_ref(params, pf, hz, tg)
        lf, af = loss_f(params, pf, hz, tg)
        # bf16 rounding compounds with drift depth: ~0.6% at 2 blocks
        assert abs(float(lr) - float(lf)) < 1e-2 * abs(float(lr))
        # accuracy counts flip on near-tie logits under bf16 rounding
        assert abs(float(ar) - float(af)) < 5e-3

    @pytest.mark.slow
    def test_grads_match_xla_step(self, setup):
        params, _, (pf, hz, tg), (_, loss_ref), (_, loss_f) = setup
        gr = jax.grad(lambda p: loss_ref(p, pf, hz, tg)[0])(params)
        gf = jax.grad(lambda p: loss_f(p, pf, hz, tg)[0])(params)
        fr = jnp.concatenate([x.ravel() for x in jax.tree.leaves(gr)])
        ff = jnp.concatenate([x.ravel() for x in jax.tree.leaves(gf)])
        cos = float(fr @ ff / (jnp.linalg.norm(fr) * jnp.linalg.norm(ff)))
        assert cos > 0.999, cos

    @pytest.mark.slow
    def test_two_steps_track_xla_trajectory(self, setup):
        params, opt, (pf, hz, tg), (step_ref, _), (step_f, _) = setup
        s0 = opt.init(params)
        pf1, sf1, lf1, _ = step_f(params, s0, pf, hz, tg)
        _, _, lf2, _ = step_f(pf1, sf1, pf, hz, tg)
        pr1, sr1, lr1, _ = step_ref(params, s0, pf, hz, tg)
        _, _, lr2, _ = step_ref(pr1, sr1, pf, hz, tg)
        assert abs(float(lf1) - float(lr1)) < 1e-2 * abs(float(lr1))
        assert abs(float(lf2) - float(lr2)) < 3e-2 * abs(float(lr2))

    def test_requires_rk4(self, setup):
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            make_fused_train_step,
        )

        params, opt, _, _, _ = setup
        bad = GATODEConfig(substeps=2, num_blocks=1, method="dopri5")
        with pytest.raises(ValueError):
            make_fused_train_step(None, opt, bad, (None, None, None))

    @pytest.mark.slow
    def test_fused_loss_under_epoch_scan(self, setup):
        """The fused hand-written-VJP loss scanned by make_epoch_fn (the
        path train() takes on TPU) must reproduce the per-step fused
        step sequence exactly — same custom_vjp ops in a lax.scan."""
        from ananke_abm_tpu.models.gnn_embed.train import make_epoch_fn

        params, opt, (pf, hz, tg), _, (step_f, loss_f) = setup
        batches = jnp.stack(
            [jnp.arange(48), jnp.arange(48, 96)]
        ).astype(jnp.int32)

        epoch_fn = make_epoch_fn(
            opt, lambda p, a, b, c, _g: loss_f(p, a, b, c), graph=()
        )
        p_e, _, losses, _ = epoch_fn(
            params, opt.init(params), pf, hz, tg, batches
        )

        p_s, st = params, opt.init(params)
        ref = []
        for rows in np.asarray(batches):
            p_s, st, loss, _ = step_f(p_s, st, pf[rows], hz[rows], tg[rows])
            ref.append(float(loss))
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref), rtol=1e-6
        )
        for a, b in zip(jax.tree.leaves(p_e), jax.tree.leaves(p_s)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


class TestDecodeCE:
    M, Da2, Dz2, Z2 = 50, 8, 16, 12

    @pytest.fixture(scope="class")
    def ce_problem(self):
        from ananke_abm_tpu.ops.pallas.fused_train import decode_ce

        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        rows = jax.random.normal(ks[0], (self.M, self.Da2), jnp.float32)
        Wd = 0.4 * jax.random.normal(ks[1], (self.Da2, self.Dz2))
        ze = 0.4 * jax.random.normal(ks[2], (self.Z2, self.Dz2))
        tgt = jax.random.randint(ks[3], (self.M,), 0, self.Z2, jnp.int32)
        return decode_ce, rows, Wd, ze, tgt

    @staticmethod
    def _ref(rows, tgt, Wd, ze):
        logits = (rows @ Wd) @ ze.T
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        correct = (jnp.argmax(logits, -1) == tgt).astype(jnp.int32)
        return nll, correct

    def test_forward(self, ce_problem):
        decode_ce, rows, Wd, ze, tgt = ce_problem
        nll, corr = decode_ce(rows, tgt, Wd, ze, interpret=True)
        nll_ref, corr_ref = self._ref(rows, tgt, Wd, ze)
        rel = jnp.max(jnp.abs(nll - nll_ref)) / jnp.max(jnp.abs(nll_ref))
        assert rel < 1e-2  # bf16 matmuls vs f32 reference
        assert jnp.mean((corr == corr_ref).astype(jnp.float32)) > 0.97

    def test_gradients(self, ce_problem):
        decode_ce, rows, Wd, ze, tgt = ce_problem

        def loss_f(rows, Wd, ze):
            nll, _ = decode_ce(rows, tgt, Wd, ze, interpret=True)
            return jnp.mean(nll)

        def loss_r(rows, Wd, ze):
            return jnp.mean(self._ref(rows, tgt, Wd, ze)[0])

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(rows, Wd, ze)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(rows, Wd, ze)
        for name, a, b in zip("rows Wd ze".split(), gr, gf):
            fa, fb = a.ravel(), b.ravel()
            cos = float(
                fa @ fb / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb))
            )
            assert cos > 0.999, (name, cos)


class TestShardedFusedStep:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, eight_devices):
        """shard_map'd fused train step == single-device fused step."""
        import optax

        from ananke_abm_tpu.data_generator.agent_trajectories import (
            generate_agent_population,
        )
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            build_model,
            init_params,
            make_fused_train_step,
        )
        from ananke_abm_tpu.parallel.mesh import make_mesh
        from ananke_abm_tpu.parallel.sharded import (
            make_sharded_fused_train_step,
        )

        config = GATODEConfig(substeps=2, num_blocks=1)
        data = generate_agent_population(64, num_times=4, seed=5,
                                         num_zones=8)
        model = build_model(config, 7, 8)
        params = init_params(model, config, data, 64, jax.random.PRNGKey(5))
        static = (
            jnp.asarray(data["zone_features"]), jnp.asarray(data["adj"]),
            jnp.asarray(data["times"]),
        )
        opt = optax.adamw(1e-3)
        s0 = opt.init(params)
        pf, hz, tg = (
            jnp.asarray(data["person_feats"]),
            jnp.asarray(data["home_zone"]),
            jnp.asarray(data["zone_ids"]),
        )

        step1, _ = make_fused_train_step(model, opt, config, static)
        p1, _, l1, a1 = step1(params, s0, pf, hz, tg)

        mesh = make_mesh(8, zone_parallel=2)
        step8 = make_sharded_fused_train_step(
            model, opt, config, mesh, static
        )
        p8, _, l8, a8 = step8(params, s0, pf, hz, tg)

        assert abs(float(l1) - float(l8)) < 1e-4 * max(1.0, abs(float(l1)))
        assert abs(float(a1) - float(a8)) < 1e-6
        # adamw normalizes near-zero grads by their own magnitude, so
        # bf16 reduction-order noise shows up at ~lr scale on individual
        # entries; the update DIRECTION must still agree
        f0 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(params)])
        u1 = jnp.concatenate(
            [x.ravel() for x in jax.tree.leaves(p1)]
        ) - f0
        u8 = jnp.concatenate(
            [x.ravel() for x in jax.tree.leaves(p8)]
        ) - f0
        cos = float(u1 @ u8 / (jnp.linalg.norm(u1) * jnp.linalg.norm(u8)))
        assert cos > 0.99, cos


class TestZoneGATDispatch:
    @pytest.mark.slow
    def test_flax_fallback_matches_fused_gat_path(self, monkeypatch):
        """build_fused_loss_fn with fits_vmem gating off (big-Z fallback)
        must agree with the fused-GAT dispatch — same loss, same grads."""
        from ananke_abm_tpu.data_generator.agent_trajectories import (
            generate_agent_population,
        )
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            build_fused_loss_fn,
            build_model,
            init_params,
        )
        import ananke_abm_tpu.ops.pallas.fused_gat as fg

        config = GATODEConfig(substeps=2, num_blocks=1)
        data = generate_agent_population(64, num_times=4, seed=5,
                                         num_zones=10)
        model = build_model(config, 7, 8)
        params = init_params(model, config, data, 64, jax.random.PRNGKey(5))
        static = (
            jnp.asarray(data["zone_features"]), jnp.asarray(data["adj"]),
            jnp.asarray(data["times"]),
        )
        batch = (
            jnp.asarray(data["person_feats"]),
            jnp.asarray(data["home_zone"]),
            jnp.asarray(data["zone_ids"]),
        )
        loss_fused = build_fused_loss_fn(model, config, *static)
        monkeypatch.setattr(fg, "fits_vmem", lambda *a: False)
        loss_flax = build_fused_loss_fn(model, config, *static)

        la, _ = loss_fused(params, *batch)
        lb, _ = loss_flax(params, *batch)
        # f32 op-order jitter (per-head 2D matmuls vs flax 3D einsums)
        assert abs(float(la) - float(lb)) < 1e-4 * max(abs(float(lb)), 1e-6)

        ga = jax.grad(lambda p: loss_fused(p, *batch)[0])(params)
        gb = jax.grad(lambda p: loss_flax(p, *batch)[0])(params)
        fa = jnp.concatenate([x.ravel() for x in jax.tree.leaves(ga)])
        fb = jnp.concatenate([x.ravel() for x in jax.tree.leaves(gb)])
        cos = float(fa @ fb / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
        # zone-emb f32 jitter amplifies through the bf16 rollout kernels
        assert cos > 0.9999, cos
