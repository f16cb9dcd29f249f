"""Pallas fused RHS kernel vs the flax model, and segment ops vs dense."""
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
from ananke_abm_tpu.ops.pallas.fused_rhs import (
    drift_rhs_and_vjp,
    drift_rhs_fused,
    make_fused_adjoint_rhs,
    split_drift_params,
    time_row,
)
from ananke_abm_tpu.ops.segment import (
    edge_softmax_attention,
    gat_edge_layer,
    person_zone_segment_sum,
    segment_softmax,
)


def _rhs_setup(n_agents=100, num_zones=12, num_blocks=2, seed=0):
    cfg = GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=num_blocks, substeps=1,
    )
    d = generate_agent_population(
        n_agents, num_times=6, num_zones=num_zones, seed=seed
    )
    model = build_model(cfg, 7, 8)
    params = init_params(model, cfg, d, n_agents, jax.random.PRNGKey(0))
    zone_emb = model.apply(
        {"params": params}, jnp.asarray(d["zone_features"]),
        jnp.asarray(d["adj"]), method=model.encode_zones,
    )
    x0, h = model.apply(
        {"params": params}, jnp.asarray(d["person_feats"]),
        jnp.asarray(d["home_zone"]), zone_emb,
        method=model.initial_state,
    )
    return cfg, model, params, zone_emb, x0, h


def _cos(a_tree, b_tree):
    fa = jnp.concatenate(
        [x.ravel() for x in jax.tree_util.tree_leaves(a_tree)]
    )
    fb = jnp.concatenate(
        [x.ravel() for x in jax.tree_util.tree_leaves(b_tree)]
    )
    return float(
        jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb))
    )


class TestFusedRHS:
    @pytest.mark.parametrize("num_blocks", [1, 2])
    @pytest.mark.slow
    def test_matches_model_rhs(self, num_blocks):
        cfg, model, params, zone_emb, x0, h = _rhs_setup(
            num_blocks=num_blocks
        )
        t = jnp.asarray(3.7)
        want = model.apply(
            {"params": params}, t, x0, h, zone_emb, method=model.rhs
        )
        (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = split_drift_params(
            params)
        got = drift_rhs_fused(
            x0, h, zone_emb, time_row(t, W1t, b1),
            Wq, W1xc, W1h, blocks, W3, b3, interpret=True,
        )
        # bf16 matmul kernel vs the f32 XLA path: bound the error
        # relative to the output scale (per-element relative bounds are
        # meaningless on near-zero drift components)
        a, b = np.asarray(got), np.asarray(want)
        assert np.abs(a - b).max() / np.abs(b).max() < 2e-2
        assert _cos(got, want) > 0.9995

    def test_non_tile_multiple_agents(self):
        """N not a multiple of the tile size pads and truncates correctly
        (TILE_N=1024, N=1100 spans two tiles)."""
        cfg, model, params, zone_emb, x0, h = _rhs_setup(
            n_agents=1100, num_zones=8, num_blocks=1, seed=1
        )
        t = jnp.asarray(12.0)
        want = model.apply(
            {"params": params}, t, x0, h, zone_emb, method=model.rhs
        )
        (Wq, W1xc, W1h, W1t, b1, blocks, W3, b3) = split_drift_params(
            params)
        got = drift_rhs_fused(
            x0, h, zone_emb, time_row(t, W1t, b1),
            Wq, W1xc, W1h, blocks, W3, b3, interpret=True,
        )
        assert got.shape == (1100, 8)
        a, b = np.asarray(got), np.asarray(want)
        assert np.abs(a - b).max() / np.abs(b).max() < 2e-2
        assert _cos(got, want) > 0.9995

    @pytest.mark.parametrize("num_blocks", [1, 2])
    def test_joint_vjp_matches_xla(self, num_blocks):
        """drift_rhs_and_vjp == (model.rhs, jax.vjp(model.rhs)) — values
        and every cotangent (x, h, zone_emb, and the full params tree via
        make_fused_adjoint_rhs's scatter)."""
        cfg, model, params, zone_emb, x0, h = _rhs_setup(
            n_agents=150, num_blocks=num_blocks, seed=3
        )
        t = jnp.asarray(7.3)
        a = jax.random.normal(jax.random.PRNGKey(9), x0.shape)

        def xla_rhs(x, args):
            p, hh, ze = args
            return model.apply(
                {"params": p}, t, x, hh, ze, method=model.rhs
            )

        f_want, vjp_fn = jax.vjp(xla_rhs, x0, (params, h, zone_emb))
        gx_want, (gp_want, gh_want, gze_want) = vjp_fn(a)

        _, rhs_vjp = make_fused_adjoint_rhs(params, interpret=True)
        f_got, gx_got, (gp_got, gh_got, gze_got) = rhs_vjp(
            t, x0, (params, h, zone_emb), a
        )

        fa, fb = np.asarray(f_got), np.asarray(f_want)
        assert np.abs(fa - fb).max() / np.abs(fb).max() < 2e-2
        assert _cos(f_got, f_want) > 0.9995
        assert _cos(gx_got, gx_want) > 0.999
        assert _cos(gh_got, gh_want) > 0.999
        assert _cos(gze_got, gze_want) > 0.999
        assert _cos(gp_got, gp_want) > 0.999
        # params the drift never touches must get exactly zero
        for k in ("zone_gat", "context_encoder", "init_proj",
                  "decode_proj"):
            leaves = jax.tree_util.tree_leaves(gp_got[k])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)

    def test_fused_adjoint_loss_matches_xla_path(self):
        """make_adjoint_step_fns(use_fused=True) == use_fused=False:
        loss values close, gradients cosine-aligned."""
        import optax

        from ananke_abm_tpu.models.gnn_embed.train import (
            make_adjoint_step_fns,
        )

        cfg = GATODEConfig(
            zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
            gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
            rtol=1e-5, atol=1e-7,
        )
        d = generate_agent_population(48, num_times=5, num_zones=10,
                                      seed=11)
        model = build_model(cfg, 7, 8)
        params = init_params(model, cfg, d, 48, jax.random.PRNGKey(0))
        optimizer = optax.adamw(1e-3)
        static = (
            jnp.asarray(d["zone_features"]),
            jnp.asarray(d["adj"]),
            jnp.asarray(d["times"]),
        )
        pf = jnp.asarray(d["person_feats"])
        hz = jnp.asarray(d["home_zone"])
        tg = jnp.asarray(d["zone_ids"])

        _, loss_xla = make_adjoint_step_fns(
            model, optimizer, cfg, static, use_fused=False
        )
        _, loss_fused = make_adjoint_step_fns(
            model, optimizer, cfg, static, use_fused=True
        )
        l0, _ = loss_xla(params, pf, hz, tg)
        l1, _ = loss_fused(params, pf, hz, tg)
        np.testing.assert_allclose(float(l1), float(l0), rtol=2e-3)

        g0 = jax.grad(lambda p: loss_xla(p, pf, hz, tg)[0])(params)
        g1 = jax.grad(lambda p: loss_fused(p, pf, hz, tg)[0])(params)
        assert _cos(g1, g0) > 0.999


class TestSegmentOps:
    def test_segment_softmax_sums_to_one(self):
        scores = jnp.asarray(np.random.default_rng(0).normal(size=20))
        seg = jnp.asarray(np.random.default_rng(1).integers(0, 5, 20))
        sm = segment_softmax(scores, seg, 5)
        sums = jax.ops.segment_sum(sm, seg, num_segments=5)
        present = np.unique(np.asarray(seg))
        np.testing.assert_allclose(np.asarray(sums)[present], 1.0, rtol=1e-5)

    def test_edge_softmax_attention_matches_dense(self):
        """Full bipartite edge list == dense softmax attention."""
        rng = np.random.default_rng(2)
        Nn, D = 4, 3
        values = rng.normal(size=(Nn * Nn, D)).astype(np.float32)
        scores = rng.normal(size=Nn * Nn).astype(np.float32)
        dst = np.repeat(np.arange(Nn), Nn)
        out = edge_softmax_attention(
            jnp.asarray(values), jnp.asarray(scores), jnp.asarray(dst), Nn
        )
        S = scores.reshape(Nn, Nn)
        A = np.exp(S - S.max(1, keepdims=True))
        A /= A.sum(1, keepdims=True)
        want = np.einsum("ne,ned->nd", A, values.reshape(Nn, Nn, D))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_gat_edge_layer_runs(self):
        rng = np.random.default_rng(3)
        Z, F, D = 6, 5, 4
        h = jnp.asarray(rng.normal(size=(Z, F)).astype(np.float32))
        src = jnp.asarray([0, 1, 2, 3, 4, 5, 0, 2])
        dst = jnp.asarray([1, 0, 3, 2, 5, 4, 2, 0])
        W = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
        a1 = jnp.asarray(rng.normal(size=D).astype(np.float32))
        a2 = jnp.asarray(rng.normal(size=D).astype(np.float32))
        out = gat_edge_layer(h, src, dst, W, a1, a2)
        assert out.shape == (Z, D)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_person_zone_segment_sum(self):
        vals = jnp.ones((10, 2))
        zones = jnp.asarray([0, 0, 1, 2, 2, 2, 3, 3, 3, 3])
        out = person_zone_segment_sum(vals, zones, 5)
        np.testing.assert_array_equal(
            np.asarray(out[:, 0]), [2, 1, 3, 4, 0]
        )


class TestFusedStep:
    @pytest.mark.parametrize("num_blocks", [1, 2])
    @pytest.mark.slow
    def test_full_rk4_step_matches_f32(self, num_blocks):
        """bf16 fused-step kernel == f32 RK4 step within bf16 tolerance."""
        from ananke_abm_tpu.ode.rk4 import _rk4_step
        from ananke_abm_tpu.ops.pallas.fused_step import (
            pack_weights_bf16,
            rk4_step_fused,
        )

        cfg = GATODEConfig(
            num_blocks=num_blocks, substeps=1, zone_dim=16, agent_dim=8,
            context_dim=8, hidden_dim=16, gat_heads=2, gat_layers=1,
        )
        model = build_model(cfg, 7, 8)
        d = generate_agent_population(70, num_times=4, num_zones=12, seed=0)
        params = init_params(model, cfg, d, 70, jax.random.PRNGKey(0))
        ze = model.apply(
            {"params": params}, jnp.asarray(d["zone_features"]),
            jnp.asarray(d["adj"]), method=model.encode_zones,
        )
        x0, h = model.apply(
            {"params": params}, jnp.asarray(d["person_feats"]),
            jnp.asarray(d["home_zone"]), ze, method=model.initial_state,
        )
        w = pack_weights_bf16(params)
        got = rk4_step_fused(
            x0, h, ze.astype(jnp.bfloat16), w,
            jnp.asarray(2.0), jnp.asarray(0.5), interpret=True,
        )
        want = _rk4_step(
            lambda t, y, a: model.apply(
                {"params": params}, t, y, h, ze, method=model.rhs
            ),
            jnp.asarray(2.0), jnp.asarray(0.5), x0, None,
        )
        rel = float(
            jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))
        )
        assert got.shape == (70, 8)
        assert rel < 0.05, f"bf16 deviation too large: {rel}"


class TestEdgeSegmentPallas:
    """Pallas edge-softmax + segment-sum == the XLA segment path
    (ops/segment.py) to bf16 feature precision."""

    def _random_graph(self, Z, E, D, seed=0):
        rng = np.random.default_rng(seed)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        a_d = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        return src, dst, Wh, a_s, a_d

    @pytest.mark.parametrize("Z,E,D", [(64, 500, 16), (520, 4096, 64)])
    def test_gat_edge_aggregate_matches_xla(self, Z, E, D):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        src, dst, Wh, a_s, a_d = self._random_graph(Z, E, D)
        qs, qd = Wh @ a_s, Wh @ a_d
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        want = np.asarray(
            edge_softmax_attention(Wh[src], e, dst, Z)
        )
        got = np.asarray(
            gat_edge_aggregate_pallas(Wh, qs, qd, src, dst, interpret=True)
        )
        # rows with no incoming edges are zero in both
        assert got.shape == want.shape
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    def test_segment_sum_matches_xla(self):
        from ananke_abm_tpu.ops.pallas.edge_segment import segment_sum_pallas

        rng = np.random.default_rng(1)
        vals = jnp.asarray(rng.normal(size=(3000, 32)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 100, 3000), jnp.int32)
        want = np.asarray(jax.ops.segment_sum(vals, ids, num_segments=100))
        got = np.asarray(segment_sum_pallas(vals, ids, 100, interpret=True))
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 2e-2

    def test_empty_segments_are_zero(self):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )

        Z, D = 16, 8
        src = jnp.asarray([0, 1, 2], jnp.int32)
        dst = jnp.asarray([3, 3, 4], jnp.int32)
        Wh = jnp.ones((Z, D), jnp.float32)
        qs = jnp.zeros((Z,)); qd = jnp.zeros((Z,))
        out = np.asarray(
            gat_edge_aggregate_pallas(Wh, qs, qd, src, dst, interpret=True)
        )
        np.testing.assert_allclose(out[5:], 0.0)
        np.testing.assert_allclose(out[3], 1.0, rtol=1e-6)

    def test_tile_e_adapts_to_zone_count(self):
        from ananke_abm_tpu.ops.pallas.edge_segment import _tile_e

        assert _tile_e(64) == 1024
        assert _tile_e(4096) == 1024
        assert _tile_e(8192) == 512
        assert _tile_e(16384) == 256
        assert _tile_e(32768) == 128
        with pytest.raises(ValueError, match="num_nodes"):
            _tile_e(32769)

    def test_exact_mode_refuses_past_vmem_ceiling(self):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )

        Wh = jnp.zeros((32768, 8), jnp.float32)
        q = jnp.zeros((32768,), jnp.float32)
        ids = jnp.zeros((4,), jnp.int32)
        with pytest.raises(ValueError, match="bounded"):
            gat_edge_aggregate_pallas(Wh, q, q, ids, ids,
                                      score_shift="exact", interpret=True)

    def test_grad_through_pallas_dispatch_matches_xla(self):
        """jax.grad through the Pallas path (custom_vjp) == grad through
        the XLA path — regression: the raw kernel is forward-only and
        used to crash under AD."""
        from ananke_abm_tpu.ops.segment import gat_edge_layer

        Z, E, D, F = 40, 300, 16, 12
        rng = np.random.default_rng(7)
        h = jnp.asarray(rng.normal(size=(Z, F)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        W = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32)) * 0.3
        a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        cot = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))

        def loss(W, use_pallas):
            out = gat_edge_layer(h, src, dst, W, a1, a2,
                                 use_pallas=use_pallas)
            return jnp.sum(out * cot)

        g_pallas = jax.grad(lambda W: loss(W, True))(W)
        g_xla = jax.grad(lambda W: loss(W, False))(W)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-5
        )

    def test_large_scores_match_xla(self):
        """Scores far beyond the old exp clamp (|e| ~ 300): the global
        max-shift keeps the Pallas softmax exact where the old
        min(e, 80) clamp collapsed it to uniform."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        Z, E, D = 32, 200, 8
        src, dst, Wh, a_s, a_d = self._random_graph(Z, E, D, seed=11)
        qs = (Wh @ a_s) * 150.0  # scores up to ~|300|
        qd = (Wh @ a_d) * 150.0
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        want = np.asarray(edge_softmax_attention(Wh[src], e, dst, Z))
        got = np.asarray(
            gat_edge_aggregate_pallas(Wh, qs, qd, src, dst, interpret=True)
        )
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    @pytest.mark.parametrize("score_shift", ["exact", "bounded"])
    def test_padding_edges_cannot_overflow(self, score_shift):
        """Regression: padding edges (E not a tile multiple point at
        dst=Zd with src padded to 0) gather shift 0, so exp(e) used to
        overflow to inf once qs[0] > ~88 — and 0 * inf = NaN poisoned
        every output row through the scatter matmul. The exp argument
        is now clamped on invalid rows BEFORE exponentiation."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        Z, E, D = 32, 200, 8  # E pads to tile_e -> hundreds of pad edges
        src, dst, Wh, a_s, a_d = self._random_graph(Z, E, D, seed=3)
        qs = (Wh @ a_s).at[0].set(150.0)  # exp(150) overflows f32
        qd = Wh @ a_d
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        want = np.asarray(edge_softmax_attention(Wh[src], e, dst, Z))
        got = np.asarray(gat_edge_aggregate_pallas(
            Wh, qs, qd, src, dst, score_shift=score_shift, interpret=True
        ))
        assert np.isfinite(got).all(), "padding edges poisoned the output"
        denom = np.maximum(np.abs(want).max(), 1e-6)
        if score_shift == "exact":
            rows = np.arange(Z)
        else:
            # bounded mode documents underflow-to-zero for destinations
            # far below the global max score; check the rows node 0 feeds
            rows = np.unique(np.asarray(dst)[np.asarray(src) == 0])
        assert np.abs(got[rows] - want[rows]).max() / denom < 2e-2

    def test_bounded_shift_matches_exact_at_moderate_scores(self):
        """score_shift='bounded' (single sweep, per-destination upper
        bound) == 'exact' (two-pass true max) at trained-model score
        scales."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )

        Z, E, D = 64, 600, 16
        src, dst, Wh, a_s, a_d = self._random_graph(Z, E, D, seed=21)
        qs, qd = Wh @ a_s, Wh @ a_d
        exact = np.asarray(gat_edge_aggregate_pallas(
            Wh, qs, qd, src, dst, score_shift="exact", interpret=True
        ))
        bounded = np.asarray(gat_edge_aggregate_pallas(
            Wh, qs, qd, src, dst, score_shift="bounded", interpret=True
        ))
        denom = np.maximum(np.abs(exact).max(), 1e-6)
        assert np.abs(bounded - exact).max() / denom < 5e-3

    @pytest.mark.parametrize("num_nodes_delta", [-5, 0, 10])
    def test_num_nodes_respected(self, num_nodes_delta):
        """Output rows == num_nodes and edges with dst >= num_nodes are
        dropped, matching the XLA segment_sum contract."""
        from ananke_abm_tpu.ops.segment import gat_edge_layer

        Z, E, D, F = 30, 200, 8, 6
        num_nodes = Z + num_nodes_delta
        rng = np.random.default_rng(13)
        h = jnp.asarray(rng.normal(size=(Z, F)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        W = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32)) * 0.3
        a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
        want = np.asarray(
            gat_edge_layer(h, src, dst, W, a1, a2, num_nodes=num_nodes,
                           use_pallas=False)
        )
        got = np.asarray(
            gat_edge_layer(h, src, dst, W, a1, a2, num_nodes=num_nodes,
                           use_pallas=True)
        )
        assert got.shape == (num_nodes, D) == want.shape
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    def test_gat_edge_aggregate_large_z_shrunken_tile(self):
        """Z=8192 engages the 512-row adaptive tile (the old kernel's
        (1024, Z) one-hots exceeded VMEM here)."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        Z, E, D = 8192, 1200, 8
        src, dst, Wh, a_s, a_d = self._random_graph(Z, E, D, seed=3)
        qs, qd = Wh @ a_s, Wh @ a_d
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        want = np.asarray(edge_softmax_attention(Wh[src], e, dst, Z))
        got = np.asarray(
            gat_edge_aggregate_pallas(Wh, qs, qd, src, dst, interpret=True)
        )
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2


class TestEdgeSegmentMultihead:
    """The batched all-heads kernel (gat_edge_aggregate_multihead_pallas)
    == the per-head XLA composition: one kernel launch shares the
    one-hot matrices across heads and runs the feature gather/scatter
    at full H*d width (round-3 review follow-up on the per-head
    launch)."""

    def _random_mh_graph(self, Z, E, H, d, seed=0, scale=0.3):
        rng = np.random.default_rng(seed)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))
        qs = jnp.asarray(
            rng.normal(size=(Z, H)).astype(np.float32)) * scale
        qd = jnp.asarray(
            rng.normal(size=(Z, H)).astype(np.float32)) * scale
        return src, dst, Wh, qs, qd

    def _xla_want(self, Wh, qs, qd, src, dst, num_nodes):
        from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

        # kernel scores are qs[src] + qd[dst]; the composition's
        # receiving logits ride e_recv -> qd
        return np.asarray(gat_edge_attention_multihead(
            Wh, qd, qs, src, dst, num_nodes, use_pallas=False
        ))

    @pytest.mark.parametrize("Z,E,H,d", [
        (64, 500, 4, 16),    # model-default head geometry
        (130, 1500, 2, 8),   # odd Z, tiny d
        (520, 4096, 4, 32),
    ])
    def test_matches_xla_composition(self, Z, E, H, d):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
        )

        src, dst, Wh, qs, qd = self._random_mh_graph(Z, E, H, d, seed=Z)
        want = self._xla_want(Wh, qs, qd, src, dst, Z)
        got = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, interpret=True
        ))
        assert got.shape == want.shape == (Z, H, d)
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    def test_heads_are_independent(self):
        """Head h's output must depend only on head h's scores: zeroing
        one head's qs/qd changes that head's rows only (catches
        head-column misalignment in the packed gathers / expander)."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
        )

        Z, E, H, d = 48, 400, 3, 8
        src, dst, Wh, qs, qd = self._random_mh_graph(Z, E, H, d, seed=5)
        base = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, interpret=True
        ))
        qs2 = qs.at[:, 1].set(7.5)  # perturb head 1 scores only
        out2 = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs2, qd, src, dst, interpret=True
        ))
        np.testing.assert_allclose(out2[:, 0], base[:, 0], atol=1e-6)
        np.testing.assert_allclose(out2[:, 2], base[:, 2], atol=1e-6)
        assert not np.allclose(out2[:, 1], base[:, 1])

    @pytest.mark.parametrize("num_nodes_delta", [-5, 0, 10])
    def test_num_nodes_contract(self, num_nodes_delta):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
        )

        Z, E, H, d = 30, 200, 2, 8
        num_nodes = Z + num_nodes_delta
        src, dst, Wh, qs, qd = self._random_mh_graph(Z, E, H, d, seed=13)
        want = self._xla_want(Wh, qs, qd, src, dst, num_nodes)
        got = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, num_nodes=num_nodes, interpret=True
        ))
        assert got.shape == (num_nodes, H, d) == want.shape
        denom = np.maximum(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    @pytest.mark.parametrize("score_shift", ["exact", "bounded"])
    def test_padding_edges_cannot_overflow(self, score_shift):
        """Same regression class as the single-head kernel: padding
        edges gather shift 0, so a large caller score must not poison
        the outputs through exp overflow."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
        )

        Z, E, H, d = 32, 200, 2, 8
        src, dst, Wh, qs, qd = self._random_mh_graph(Z, E, H, d, seed=3)
        qs = qs.at[0, 0].set(150.0)
        want = self._xla_want(Wh, qs, qd, src, dst, Z)
        got = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, score_shift=score_shift, interpret=True
        ))
        assert np.isfinite(got).all(), "padding edges poisoned the output"
        denom = np.maximum(np.abs(want).max(), 1e-6)
        if score_shift == "exact":
            assert np.abs(got - want).max() / denom < 2e-2
        else:
            rows = np.unique(np.asarray(dst)[np.asarray(src) == 0])
            assert np.abs(got[rows, 0] - want[rows, 0]).max() / denom < 2e-2

    @pytest.mark.parametrize("num_nodes_delta,scale", [
        (0, 0.3), (0, 60.0), (-5, 0.3), (10, 0.3),
    ])
    def test_backward_kernel_matches_xla_vjp(self, num_nodes_delta,
                                             scale):
        """The hand-written Pallas backward (interpret mode) == the XLA
        composition's VJP: dWh, dqs, dqd for arbitrary cotangents,
        including shrunken/grown num_nodes and large score scales
        (padding edges must recompute alpha = 0, not NaN)."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
            gat_edge_backward_multihead_pallas,
        )
        from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

        Z, E, H, d = 40, 300, 2, 8
        num_nodes = Z + num_nodes_delta
        src, dst, Wh, qs, qd = self._random_mh_graph(
            Z, E, H, d, seed=17, scale=scale
        )
        rng = np.random.default_rng(18)
        g = jnp.asarray(
            rng.normal(size=(num_nodes, H, d)).astype(np.float32)
        )

        out, denom, shift = gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, num_nodes=num_nodes,
            return_residuals=True, interpret=True,
        )
        dWh, dqs, dqd = gat_edge_backward_multihead_pallas(
            Wh, qs, qd, src, dst, g, out, denom, shift,
            num_nodes=num_nodes, interpret=True,
        )
        _, vjp = jax.vjp(
            lambda Wh, qs, qd: gat_edge_attention_multihead(
                Wh, qd, qs, src, dst, num_nodes, use_pallas=False
            ),
            Wh, qs, qd,
        )
        wWh, wqs, wqd = vjp(g)
        # denominator: the cotangent x feature scale, NOT the true-grad
        # max — at saturating score scales the true grads collapse to
        # ~0 while bf16 gather rounding leaves O(2^-8)-of-scale noise
        # (the documented backward precision class); an orientation or
        # indexing bug would show errors of order the full scale
        g_scale = float(np.abs(np.asarray(g)).max()
                        * np.abs(np.asarray(Wh)).max())
        for got, want, name in [
            (dWh, wWh, "dWh"), (dqs, wqs, "dqs"), (dqd, wqd, "dqd")
        ]:
            got, want = np.asarray(got), np.asarray(want)
            assert np.isfinite(got).all(), name
            assert got.shape == want.shape, name
            den = np.maximum(max(np.abs(want).max(), g_scale), 1e-6)
            assert np.abs(got - want).max() / den < 2e-2, name

    def test_single_head_routes_through_h1_backward(self):
        """The single-head custom_vjp's TPU backward is the multihead
        kernel at H=1: its grads (from the single-head forward's
        residuals) must match the single-head XLA composition's VJP."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
            gat_edge_backward_multihead_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        Z, E, D = 40, 300, 16
        rng = np.random.default_rng(23)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(Z,)).astype(np.float32)) * 0.3
        qd = jnp.asarray(rng.normal(size=(Z,)).astype(np.float32)) * 0.3
        g = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))

        out, denom, shift = gat_edge_aggregate_pallas(
            Wh, qs, qd, src, dst, return_residuals=True, interpret=True
        )
        dWh, dqs, dqd = gat_edge_backward_multihead_pallas(
            Wh[:, None, :], qs[:, None], qd[:, None], src, dst,
            g[:, None, :], out[:, None, :], denom, shift,
            num_nodes=Z, interpret=True,
        )
        _, vjp = jax.vjp(
            lambda Wh, qs, qd: edge_softmax_attention(
                Wh[src],
                jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2),
                dst, Z,
            ),
            Wh, qs, qd,
        )
        wWh, wqs, wqd = vjp(g)
        for got, want, name in [
            (dWh[:, 0, :], wWh, "dWh"), (dqs[:, 0], wqs, "dqs"),
            (dqd[:, 0], wqd, "dqd"),
        ]:
            got, want = np.asarray(got), np.asarray(want)
            den = np.maximum(np.abs(want).max(), 1e-6)
            assert np.abs(got - want).max() / den < 2e-2, name

    def test_backward_kernel_zero_edges(self):
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
            gat_edge_backward_multihead_pallas,
        )

        Z, H, d = 12, 2, 4
        src = jnp.zeros((0,), jnp.int32)
        dst = jnp.zeros((0,), jnp.int32)
        rng = np.random.default_rng(0)
        Wh = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
        qd = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
        g = jnp.ones((Z, H, d), jnp.float32)
        out, denom, shift = gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, return_residuals=True, interpret=True
        )
        dWh, dqs, dqd = gat_edge_backward_multihead_pallas(
            Wh, qs, qd, src, dst, g, out, denom, shift, interpret=True
        )
        for a in (dWh, dqs, dqd):
            np.testing.assert_allclose(np.asarray(a), 0.0)

    def test_grad_through_dispatch_matches_xla(self):
        """jax.grad through gat_edge_aggregate_multihead (custom_vjp) ==
        grad through the XLA composition."""
        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead,
        )
        from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

        Z, E, H, d = 40, 300, 2, 8
        src, dst, Wh, qs, qd = self._random_mh_graph(Z, E, H, d, seed=7)
        rng = np.random.default_rng(8)
        cot = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))

        def loss_pallas(Wh, qs, qd):
            return jnp.sum(gat_edge_aggregate_multihead(
                Wh, qs, qd, src, dst, num_nodes=Z) * cot)

        def loss_xla(Wh, qs, qd):
            return jnp.sum(gat_edge_attention_multihead(
                Wh, qd, qs, src, dst, Z, use_pallas=False) * cot)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(Wh, qs, qd)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(Wh, qs, qd)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


class TestFusedZoneGAT:
    """ops/pallas/fused_gat.py — the whole ZoneGAT encoder as one kernel
    pair; must match the flax module (values AND param grads) since the
    fused train path swaps it in transparently."""

    def _setup(self, Z=37, F=7, feat=16, heads=2, num_layers=2, seed=0):
        from ananke_abm_tpu.models.gnn_embed.gat import ZoneGAT

        rng = np.random.default_rng(seed)
        zf = jnp.asarray(rng.normal(size=(Z, F)), jnp.float32)
        adj = (rng.uniform(size=(Z, Z)) < 0.3).astype(np.float32)
        np.fill_diagonal(adj, 1.0)  # self loops, as the data layer builds
        adj = jnp.asarray(adj)
        gat = ZoneGAT(features=feat, heads=heads, num_layers=num_layers)
        params = gat.init(jax.random.PRNGKey(seed), zf, adj)["params"]
        return gat, params, zf, adj

    @pytest.mark.parametrize("num_layers", [1, 2])
    def test_forward_matches_flax(self, num_layers):
        from ananke_abm_tpu.ops.pallas.fused_gat import zone_gat_fused

        gat, params, zf, adj = self._setup(num_layers=num_layers)
        want = np.asarray(gat.apply({"params": params}, zf, adj))
        got = np.asarray(
            zone_gat_fused(zf, adj, params, heads=2,
                           num_layers=num_layers, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.slow
    def test_grads_match_flax(self):
        from ananke_abm_tpu.ops.pallas.fused_gat import zone_gat_fused

        gat, params, zf, adj = self._setup()

        def loss_flax(p):
            out = gat.apply({"params": p}, zf, adj)
            return jnp.sum(jnp.sin(out))

        def loss_fused(p):
            out = zone_gat_fused(zf, adj, p, heads=2, num_layers=2,
                                 interpret=True)
            return jnp.sum(jnp.sin(out))

        g_want = jax.grad(loss_flax)(params)
        g_got = jax.grad(loss_fused)(params)
        flat_w, _ = jax.flatten_util.ravel_pytree(g_want)
        flat_g, _ = jax.flatten_util.ravel_pytree(g_got)
        cos = jnp.dot(flat_w, flat_g) / (
            jnp.linalg.norm(flat_w) * jnp.linalg.norm(flat_g)
        )
        assert float(cos) > 1 - 1e-6
        np.testing.assert_allclose(
            np.asarray(flat_g), np.asarray(flat_w), rtol=1e-4, atol=1e-5
        )

    def test_zf_adj_cotangents_are_zero(self):
        """zone_feats/adj are data: the custom_vjp returns zero for them
        rather than silently wrong values."""
        from ananke_abm_tpu.ops.pallas.fused_gat import zone_gat_fused

        gat, params, zf, adj = self._setup(num_layers=1)
        g = jax.grad(
            lambda z: jnp.sum(
                zone_gat_fused(z, adj, params, heads=2, num_layers=1,
                               interpret=True)
            )
        )(zf)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_probe_lowering_demotes_on_kernel_failure(self, monkeypatch):
        """A backend that rejects the kernel lowering must demote the
        dispatch (probe returns False), never crash the caller."""
        import ananke_abm_tpu.ops.pallas.fused_gat as fg

        def boom(*a, **k):
            raise RuntimeError("Mosaic lowering failed (simulated)")

        monkeypatch.setattr(fg, "zone_gat_fused", boom)
        monkeypatch.setattr(fg, "_PROBE_CACHE", {})
        assert fg.probe_lowering(40, 7, 16, 2, 1) is False
        # cached: the second call must not re-raise through boom either
        assert fg.probe_lowering(40, 7, 16, 2, 1) is False

    def test_probe_lowering_ok_on_this_backend(self):
        import ananke_abm_tpu.ops.pallas.fused_gat as fg

        assert fg.probe_lowering(40, 7, 16, 2, 1) is True

    def test_probe_lowering_executes_under_jit_trace(self):
        """build_fused_loss_fn is also called inside jit/shard_map
        traces (parallel/sharded.py) — the probe must really compile
        the kernels there, not get staged into the jaxpr."""
        import ananke_abm_tpu.ops.pallas.fused_gat as fg

        fg._PROBE_CACHE.pop((16, 7, 16, 2, 1), None)
        seen = {}

        @jax.jit
        def f(x):
            seen["probe"] = fg.probe_lowering(16, 7, 16, 2, 1)
            return x + 1

        f(jnp.ones(2))
        assert seen["probe"] is True
        assert fg._PROBE_CACHE[(16, 7, 16, 2, 1)] is True


class TestFusedDopri5:
    """ops/pallas/fused_dopri5.py — whole-DOPRI5-step kernels for the
    discrete-adjoint trainer. The step kernel must match ode/dopri5._step
    on the GAT-ODE drift (bf16 matmul class), the VJP kernel must match
    the generic jax.vjp backward, and the trainer's
    adjoint_mode="discrete" must agree with "continuous"."""

    @staticmethod
    def _drift_setup(n_agents=100, num_blocks=2, seed=0):
        cfg, model, params, zone_emb, x0, h = _rhs_setup(
            n_agents=n_agents, num_blocks=num_blocks, seed=seed
        )

        def rhs(t, y, args):
            p, hh, ze = args
            return model.apply(
                {"params": p}, t, y, hh, ze, method=model.rhs
            )

        return cfg, model, params, rhs, (params, h, zone_emb), x0

    @pytest.mark.parametrize("num_blocks", [1, 2])
    def test_step_matches_xla_step(self, num_blocks):
        from ananke_abm_tpu.ode.dopri5 import _step
        from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
            make_fused_dopri5_hooks,
        )

        cfg, model, params, rhs, args, x0 = self._drift_setup(
            num_blocks=num_blocks
        )
        t0 = jnp.asarray(3.0)
        f0 = rhs(t0, x0, args)
        step_impl, _ = make_fused_dopri5_hooks(params, interpret=True)

        # small step: outputs must match; err and r5 sit at the f32
        # rounding floor here (~1e-9 / ~1e-6 — measured: both paths emit
        # uncorrelated rounding noise), so assert them ABSOLUTELY
        # against the state scale — err below a typical tolerance floor
        # in both paths (same accept decision), r5's dense-output
        # contribution negligible.
        h_step = jnp.asarray(0.125)
        y1, f1, err, interp = step_impl(t0, h_step, x0, f0, args)
        y1w, f1w, errw, interpw = _step(rhs, t0, h_step, x0, f0, args)
        for got, want, name in [(y1, y1w, "y1"), (f1, f1w, "f1")]:
            a, b = np.asarray(got), np.asarray(want)
            denom = np.maximum(np.abs(b).max(), 1e-6)
            assert np.abs(a - b).max() / denom < 2e-2, name
            assert _cos(got, want) > 0.999, name
        atol_floor = 1e-6
        assert float(jnp.abs(err).max()) < atol_floor
        assert float(jnp.abs(errw).max()) < atol_floor
        y_scale = float(jnp.abs(y1w).max())
        assert float(jnp.abs(interp.r5 - interpw.r5).max()) < 1e-5 * y_scale

        # large step: truncation error dominates the estimate, so the
        # fused err must match XLA's in direction AND magnitude (this is
        # what keeps the two controllers on the same step sequence).
        h_big = jnp.asarray(2.0)
        y1, f1, err, interp = step_impl(t0, h_big, x0, f0, args)
        y1w, f1w, errw, interpw = _step(rhs, t0, h_big, x0, f0, args)
        for got, want, name in [
            (y1, y1w, "y1"), (f1, f1w, "f1"), (err, errw, "err"),
            (interp.r5, interpw.r5, "r5"),
        ]:
            a, b = np.asarray(got), np.asarray(want)
            denom = np.maximum(np.abs(b).max(), 1e-6)
            assert np.abs(a - b).max() / denom < 2e-2, name
            assert _cos(got, want) > 0.999, name

    @pytest.mark.slow
    def test_discrete_adjoint_fused_hooks_match_xla(self):
        """odeint_discrete_adjoint with the fused (step_impl, step_vjp)
        pair == the plain-XLA discrete adjoint: solution close, grads
        cosine-aligned on y0 AND the full params tree (incl. zeros for
        params the drift never touches)."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint
        from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
            make_fused_dopri5_hooks,
        )

        cfg, model, params, rhs, args, x0 = self._drift_setup(
            n_agents=60, num_blocks=1, seed=5
        )
        ts = jnp.linspace(0.0, 4.0, 4)
        step_impl, step_vjp = make_fused_dopri5_hooks(
            params, interpret=True
        )
        cot = jax.random.normal(jax.random.PRNGKey(3),
                                (4,) + x0.shape) * 0.1

        def loss(y0, a, fused):
            hooks = (
                {"step_impl": step_impl, "step_vjp": step_vjp}
                if fused else {}
            )
            ys = odeint_discrete_adjoint(
                rhs, y0, ts, a, rtol=1e-4, atol=1e-6, max_accepted=128,
                ckpt_every=8, **hooks,
            )
            return jnp.sum(ys * cot)

        l_x = loss(x0, args, False)
        l_f = loss(x0, args, True)
        np.testing.assert_allclose(float(l_f), float(l_x), rtol=5e-3)

        gx = jax.grad(loss, argnums=(0, 1))(x0, args, False)
        gf = jax.grad(loss, argnums=(0, 1))(x0, args, True)
        assert _cos(gf[0], gx[0]) > 0.999                 # y0
        assert _cos(gf[1][0], gx[1][0]) > 0.995           # params
        assert _cos(gf[1][1], gx[1][1]) > 0.999           # h context
        assert _cos(gf[1][2], gx[1][2]) > 0.999           # zone_emb
        # params outside the drift must get exactly zero in BOTH paths
        for k in ("zone_gat", "context_encoder", "init_proj",
                  "decode_proj"):
            leaves = jax.tree_util.tree_leaves(gf[1][0][k])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)

    @pytest.mark.slow
    def test_trainer_discrete_mode_matches_continuous(self):
        """make_adjoint_step_fns(adjoint_mode="discrete") ==
        adjoint_mode="continuous": same loss, cosine-aligned grads
        (generic XLA hooks; the fused pair is covered above)."""
        import optax

        from ananke_abm_tpu.models.gnn_embed.train import (
            make_adjoint_step_fns,
        )

        cfg = GATODEConfig(
            zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
            gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
            rtol=1e-5, atol=1e-7,
        )
        d = generate_agent_population(48, num_times=5, num_zones=10,
                                      seed=11)
        model = build_model(cfg, 7, 8)
        params = init_params(model, cfg, d, 48, jax.random.PRNGKey(0))
        optimizer = optax.adamw(1e-3)
        static = (
            jnp.asarray(d["zone_features"]),
            jnp.asarray(d["adj"]),
            jnp.asarray(d["times"]),
        )
        pf = jnp.asarray(d["person_feats"])
        hz = jnp.asarray(d["home_zone"])
        tg = jnp.asarray(d["zone_ids"])

        _, loss_cont = make_adjoint_step_fns(
            model, optimizer, cfg, static, use_fused=False,
            adjoint_mode="continuous",
        )
        _, loss_disc = make_adjoint_step_fns(
            model, optimizer, cfg, static, use_fused=False,
            adjoint_mode="discrete", max_accepted=256, ckpt_every=8,
        )
        l0, _ = loss_cont(params, pf, hz, tg)
        l1, _ = loss_disc(params, pf, hz, tg)
        np.testing.assert_allclose(float(l1), float(l0), rtol=2e-4)

        g0 = jax.grad(lambda p: loss_cont(p, pf, hz, tg)[0])(params)
        g1 = jax.grad(lambda p: loss_disc(p, pf, hz, tg)[0])(params)
        assert _cos(g1, g0) > 0.999

    def test_unknown_adjoint_mode_raises(self):
        import optax

        from ananke_abm_tpu.models.gnn_embed.train import (
            make_adjoint_step_fns,
        )

        cfg = GATODEConfig(num_blocks=1, substeps=1)
        model = build_model(cfg, 7, 8)
        with pytest.raises(ValueError, match="adjoint_mode"):
            make_adjoint_step_fns(
                model, optax.adamw(1e-3), cfg, (None, None, None),
                adjoint_mode="banana",
            )

    @pytest.mark.slow
    def test_whole_backward_kernel_matches_xla_and_per_step(self):
        """ckpt_every=1 + store_f routes the discrete adjoint through
        dopri5_backward_fused (ONE launch for the whole reverse sweep,
        carries in VMEM scratch) — gradients must match both the
        plain-XLA discrete adjoint and the per-step fused kernels on
        y0, the full params tree, the h context, and zone_emb."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint
        from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
            make_fused_dopri5_hooks,
        )

        cfg, model, params, rhs, args, x0 = self._drift_setup(
            n_agents=60, num_blocks=2, seed=5
        )
        ts = jnp.linspace(0.0, 4.0, 4)
        step_impl, step_vjp = make_fused_dopri5_hooks(
            params, interpret=True
        )
        assert hasattr(step_vjp, "backward_all")
        cot = jax.random.normal(jax.random.PRNGKey(3),
                                (4,) + x0.shape) * 0.1

        def loss(y0, a, mode):
            kw = {"rtol": 1e-4, "atol": 1e-6, "max_accepted": 128}
            if mode == "xla":
                ys = odeint_discrete_adjoint(
                    rhs, y0, ts, a, ckpt_every=8, **kw
                )
            elif mode == "per_step":  # ckpt_every=2 keeps the scan path
                ys = odeint_discrete_adjoint(
                    rhs, y0, ts, a, ckpt_every=2,
                    step_impl=step_impl, step_vjp=step_vjp, **kw
                )
            else:  # whole-backward kernel
                ys = odeint_discrete_adjoint(
                    rhs, y0, ts, a, ckpt_every=1, store_f=True,
                    step_impl=step_impl, step_vjp=step_vjp, **kw
                )
            return jnp.sum(ys * cot)

        l_x = loss(x0, args, "xla")
        l_w = loss(x0, args, "whole")
        np.testing.assert_allclose(float(l_w), float(l_x), rtol=5e-3)

        gx = jax.grad(loss, argnums=(0, 1))(x0, args, "xla")
        gw = jax.grad(loss, argnums=(0, 1))(x0, args, "whole")
        gp = jax.grad(loss, argnums=(0, 1))(x0, args, "per_step")
        assert _cos(gw[0], gx[0]) > 0.999                 # y0
        assert _cos(gw[1][0], gx[1][0]) > 0.995           # params
        assert _cos(gw[1][1], gx[1][1]) > 0.999           # h context
        assert _cos(gw[1][2], gx[1][2]) > 0.999           # zone_emb
        # same kernels, different harness: whole vs per-step agree to
        # reduction-order noise
        assert _cos(gw[0], gp[0]) > 0.99999
        assert _cos(gw[1][0], gp[1][0]) > 0.9999
        # params outside the drift get exactly zero in both paths
        for k in ("zone_gat", "context_encoder", "init_proj",
                  "decode_proj"):
            leaves = jax.tree_util.tree_leaves(gw[1][0][k])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)

    def test_err_stats_in_kernel_matches_controller_norm(self):
        """err_stats=(rtol, atol): the in-kernel Hairer reduction must
        drive the controller onto the SAME accepted-step sequence (and
        solution) as the full tree_error_norm pass — including correct
        masking of the kernel's padded agent rows (n_agents is far off
        the tile multiple here, so an unmasked reduction would shift
        every norm)."""
        from ananke_abm_tpu.ode.dopri5 import ErrNormSq, dopri5_solve
        from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
            make_fused_dopri5_hooks,
        )

        cfg, model, params, rhs, args, x0 = self._drift_setup(
            n_agents=70, num_blocks=1, seed=2
        )
        ts = jnp.linspace(0.0, 4.0, 5)
        rtol, atol = 1e-4, 1e-6
        plain_impl, _ = make_fused_dopri5_hooks(params, interpret=True)
        errs_impl, _ = make_fused_dopri5_hooks(
            params, interpret=True, err_stats=(rtol, atol)
        )

        # the reduced err IS the controller norm's square
        t0 = jnp.asarray(0.5)
        f0 = rhs(t0, x0, args)
        h_step = jnp.asarray(1.5)
        from ananke_abm_tpu.ode.tree import tree_error_norm

        y1p, _, err_p, _ = plain_impl(t0, h_step, x0, f0, args)
        _, _, err_s, _ = errs_impl(t0, h_step, x0, f0, args)
        assert isinstance(err_s, ErrNormSq)
        want = float(tree_error_norm(err_p, x0, y1p, rtol, atol))
        got = float(jnp.sqrt(err_s.sq_sum / err_s.count))
        np.testing.assert_allclose(got, want, rtol=1e-5)

        # full solve: same accepted sequence, same outputs
        ys_a, st_a = dopri5_solve(
            rhs, x0, ts, args, rtol=rtol, atol=atol, step_impl=plain_impl
        )
        ys_b, st_b = dopri5_solve(
            rhs, x0, ts, args, rtol=rtol, atol=atol, step_impl=errs_impl
        )
        assert int(st_a["n_steps"]) == int(st_b["n_steps"])
        assert int(st_a["n_accepted"]) == int(st_b["n_accepted"])
        # the controller's h is continuous in the norm, so the two
        # reductions' last-digit differences compound into ~1e-6
        # absolute solution noise (measured 1.4e-6 here) — far below
        # the solve's own rtol=1e-4 accuracy target
        np.testing.assert_allclose(
            np.asarray(ys_b), np.asarray(ys_a), rtol=1e-4, atol=5e-6
        )
