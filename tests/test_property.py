"""Property-based tests (hypothesis) for the rasterizer and union-grid
builders (ROADMAP quality item): invariants must hold for arbitrary valid
inputs, not just the curated fixtures.
"""
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from ananke_abm_tpu.dataio.rasterize import (
    build_purpose_map,
    ensure_homebound,
    rasterize_frame,
)

PURPOSES = ["Home", "Work", "Education", "Shopping", "Social", "Other"]


@st.composite
def activity_frames(draw):
    """Random populations of persons with sorted activity sequences.
    Durations are positive; starts are nondecreasing per person (the
    rasterizer's documented input shape); at least one non-Home activity
    per person so the no-all-home invariant is satisfiable."""
    n_persons = draw(st.integers(1, 6))
    rows = []
    for p in range(n_persons):
        n_acts = draw(st.integers(2, 7))
        start = 0
        purposes = []
        for i in range(n_acts):
            dur = draw(st.integers(1, 400))
            # homebound input contract: day 0 starts at Home
            purpose = "Home" if i == 0 else draw(st.sampled_from(PURPOSES))
            purposes.append(purpose)
            rows.append(
                dict(persid=f"p{p:02d}", stopno=i, purpose=purpose,
                     starttime=start, total_duration=dur)
            )
            start += dur
        if all(q == "Home" for q in purposes):
            rows[-1]["purpose"] = "Work"
    return pd.DataFrame(rows)


class TestRasterizerProperties:
    @settings(max_examples=40, deadline=None)
    @given(df=activity_frames(), grid_min=st.sampled_from([5, 15, 30]))
    def test_invariants(self, df, grid_min):
        pm = build_purpose_map(df["purpose"])
        Y, persids = rasterize_frame(df, pm, grid_min=grid_min)
        L = 1440 // grid_min
        # shape + label range
        assert Y.shape == (df["persid"].nunique(), L)
        assert Y.min() >= 0 and Y.max() < len(pm)
        # home-bound invariant: every day ends at Home
        home = pm["Home"]
        assert (Y[:, -1] == home).all()
        # row order matches sorted unique persids
        assert persids == sorted(df["persid"].unique().tolist())

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_every_infield_activity_gets_a_bin(self, data):
        """Monotone push-forward: on a home-terminated day that fits the
        horizon (so the home-bound postprocess is a no-op), every
        activity occupies exactly its pushed [start, end) bin slot."""
        grid_min = 30
        rows = []
        n_persons = data.draw(st.integers(1, 4))
        for p in range(n_persons):
            n_acts = data.draw(st.integers(1, 5))
            budget = 1440 - 240  # leave room for the closing Home
            start = 0
            for i in range(n_acts):
                dur = data.draw(
                    st.integers(grid_min, max(grid_min, budget // n_acts))
                )
                purpose = "Home" if i == 0 else data.draw(
                    st.sampled_from(PURPOSES[1:])
                )
                rows.append(
                    dict(persid=f"p{p:02d}", stopno=i, purpose=purpose,
                         starttime=start, total_duration=dur)
                )
                start += dur
            rows.append(
                dict(persid=f"p{p:02d}", stopno=n_acts, purpose="Home",
                     starttime=start, total_duration=1440 - start)
            )
        df = pd.DataFrame(rows)
        pm = build_purpose_map(df["purpose"])
        Y, persids = rasterize_frame(df, pm, grid_min=grid_min)
        row_of = {p: i for i, p in enumerate(persids)}
        L = 1440 // grid_min
        for pid, g in df.groupby("persid"):
            g = g.sort_values("stopno")
            end_bin = 0  # running earliest-free-bin (push-forward)
            for _, r in g.iterrows():
                start_bin = max(int(r["starttime"]) // grid_min, end_bin)
                nbins = max(1, -(-int(r["total_duration"]) // grid_min))
                end_bin = start_bin + nbins
                lo, hi = start_bin, min(end_bin, L)
                if lo >= L:
                    continue
                seg = Y[row_of[pid], lo:hi]
                assert (seg == pm[r["purpose"]]).all(), (
                    pid, r["purpose"], lo, hi, seg
                )

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 5),
        home_prefix=st.integers(0, 5),
        tail=st.integers(0, 5),
    )
    def test_ensure_homebound(self, n, home_prefix, tail):
        """Trailing non-home runs shift to day end with Home forced at
        the final bin, whatever the run lengths."""
        L = 16
        Y = np.zeros((n, L), dtype=np.int64)
        Y[:, home_prefix: home_prefix + 3] = 2  # midday activity
        if tail:
            Y[:, L - tail:] = 1  # trailing non-home
        out = ensure_homebound(Y.copy(), home_idx=0)
        assert (out[:, -1] == 0).all()


class TestUnionGridProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        snap_lists=st.lists(
            st.lists(
                st.floats(0.0, 24.0, allow_nan=False, width=32),
                min_size=2, max_size=6, unique=True,
            ),
            min_size=1, max_size=4,
        ),
        k=st.sampled_from([2, 4, 8]),
    )
    def test_union_grid_invariants(self, snap_lists, k):
        from ananke_abm_tpu.models.mode_sep.batching import (
            build_union_batch,
            insert_internal_points,
        )
        from ananke_abm_tpu.models.mode_sep.data import PersonData

        persons = []
        for i, snaps in enumerate(snap_lists):
            t = np.sort(np.asarray(snaps, np.float64))
            # drop near-duplicate times the union tolerance would merge
            t = t[np.concatenate([[True], np.diff(t) > 1e-3])]
            if t.size < 2:
                continue
            locs = ((np.arange(t.size) // 2) % 3).astype(np.int64)
            stays = [
                (float(t[j]), float(t[j + 1]), int(locs[j]))
                for j in range(t.size - 1)
                if locs[j] == locs[j + 1]
            ]
            persons.append(
                PersonData(
                    person_id=i,
                    person_name=f"p{i}",
                    times_snap=t.astype(np.float32),
                    loc_ids=locs,
                    stay_segments=stays,
                    home_zone_idx=0,
                    work_zone_idx=1,
                    traits_raw=np.asarray([0.3, 0.5], np.float32),
                )
            )
        if not persons:
            return
        batch = build_union_batch(persons, K_internal=k)
        times = np.asarray(batch.times_union)
        # strictly increasing grid
        assert (np.diff(times) > 0).all()
        # every person's snap times appear on the grid
        for i, p in enumerate(persons):
            for t in p.times_snap:
                j = np.argmin(np.abs(times - t))
                assert abs(times[j] - t) < 1e-4
                assert batch.is_gt[i, j]
        # masks are boolean and consistent: GT points are never
        # "stay interior non-gt"
        assert not np.logical_and(
            np.asarray(batch.is_gt), np.asarray(batch.stay_non_gt)
        ).any()


class TestRunLengthSegmentation:
    """segments_run_length (numpy prefix trick) and the native C++ kernel
    must both equal the obvious per-row Python loop, for arbitrary
    label grids."""

    @staticmethod
    def _naive(Y):
        person, purpose, length = [], [], []
        for i, row in enumerate(Y):
            j = 0
            while j < len(row):
                k = j
                while k < len(row) and row[k] == row[j]:
                    k += 1
                person.append(i); purpose.append(row[j]); length.append(k - j)
                j = k
        return (np.asarray(person), np.asarray(purpose), np.asarray(length))

    @given(
        st.lists(
            st.lists(st.integers(0, 4), min_size=1, max_size=24),
            min_size=1, max_size=8,
        ).filter(lambda rows: len({len(r) for r in rows}) == 1)
    )
    @settings(max_examples=60, deadline=None)
    @pytest.mark.slow
    def test_matches_naive(self, rows):
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            segments_run_length,
            segments_run_length_fast,
        )

        Y = np.asarray(rows, dtype=np.int32)
        want = self._naive(Y)
        for impl in (segments_run_length, segments_run_length_fast):
            got = impl(Y)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(g), w)
        # segments tile each row exactly
        person, _, length = want
        for i in range(Y.shape[0]):
            assert length[person == i].sum() == Y.shape[1]


class TestSemiCRFPathScoreProperty:
    """semicrf_path_score's vectorized segment machinery (running-max
    segment ids + scatter-add lengths) vs a naive per-sample loop, for
    arbitrary label grids — including runs longer than the duration
    table (clipped to D-1 by contract)."""

    @staticmethod
    def _naive_score(u_tp, labels_t, dur_pd, A_pp):
        D = dur_pd.shape[1]
        score = float(u_tp[np.arange(len(labels_t)), labels_t].sum())
        # run-length segments
        j, prev = 0, None
        while j < len(labels_t):
            k = j
            while k < len(labels_t) and labels_t[k] == labels_t[j]:
                k += 1
            p, d = int(labels_t[j]), k - j
            score += float(dur_pd[p, min(d, D) - 1])
            if prev is not None:
                score += float(A_pp[prev, p])
            prev, j = p, k
        return score

    @given(
        st.integers(0, 10_000),
        st.integers(1, 3),
        st.integers(2, 14),
        st.integers(2, 4),
        st.integers(1, 5),
    )
    @settings(max_examples=40, deadline=None)
    @pytest.mark.slow
    def test_matches_naive(self, seed, B, T, P, D):
        import jax.numpy as jnp

        from ananke_abm_tpu.ops.semi_crf import semicrf_path_score

        rng = np.random.default_rng(seed)
        u = rng.normal(size=(B, T, P)).astype(np.float32)
        dur = rng.normal(size=(P, D)).astype(np.float32)
        A = rng.normal(size=(P, P)).astype(np.float32)
        labels = rng.integers(0, P, size=(B, T))
        got = np.asarray(
            semicrf_path_score(
                jnp.asarray(u), jnp.asarray(labels), jnp.asarray(dur),
                jnp.asarray(A),
            )
        )
        want = np.asarray(
            [self._naive_score(u[b], labels[b], dur, A) for b in range(B)]
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestEdgeKernelProperties:
    """Pallas edge-softmax aggregation (exact mode) == the XLA segment
    composition for ARBITRARY graphs: any edge count (incl. zero and
    non-tile-multiple E -> padding edges), any score scale (incl. ones
    whose exp overflows f32 without the max shift), out-of-range dst
    ids (dropped, like segment_sum)."""

    @given(
        seed=st.integers(0, 10_000),
        Z=st.integers(2, 70),
        E=st.integers(0, 500),
        D=st.sampled_from([4, 8, 16]),
        scale=st.sampled_from([0.3, 1.0, 60.0, 200.0]),
        extra_dst=st.integers(0, 3),  # ids >= Z must be dropped
    )
    @settings(max_examples=25, deadline=None)
    @pytest.mark.slow
    def test_gat_edge_aggregate_matches_xla(self, seed, Z, E, D, scale,
                                            extra_dst):
        import jax
        import jax.numpy as jnp

        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_pallas,
        )
        from ananke_abm_tpu.ops.segment import edge_softmax_attention

        rng = np.random.default_rng(seed)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z + extra_dst, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(Z,)).astype(np.float32)) * scale
        qd = jnp.asarray(rng.normal(size=(Z,)).astype(np.float32)) * scale
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        want = np.asarray(edge_softmax_attention(Wh[src], e, dst, Z))
        got = np.asarray(gat_edge_aggregate_pallas(
            Wh, qs, qd, src, dst, num_nodes=Z, interpret=True
        ))
        assert np.isfinite(got).all()
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    @given(
        seed=st.integers(0, 10_000),
        Z=st.integers(2, 70),
        E=st.integers(0, 400),
        H=st.sampled_from([1, 2, 4]),
        d=st.sampled_from([4, 8, 16]),
        scale=st.sampled_from([0.3, 1.0, 60.0]),
        extra_dst=st.integers(0, 3),
    )
    @settings(max_examples=25, deadline=None)
    @pytest.mark.slow
    def test_multihead_aggregate_matches_xla(self, seed, Z, E, H, d,
                                             scale, extra_dst):
        """The batched all-heads kernel == the XLA multihead composition
        for arbitrary graphs (same space as the single-head property:
        padding edges, big score scales, out-of-range dst)."""
        import jax.numpy as jnp

        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
        )
        from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

        rng = np.random.default_rng(seed)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z + extra_dst, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * scale
        qd = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * scale
        want = np.asarray(gat_edge_attention_multihead(
            Wh, qd, qs, src, dst, Z, use_pallas=False
        ))
        got = np.asarray(gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, num_nodes=Z, interpret=True
        ))
        assert np.isfinite(got).all()
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2

    @given(
        seed=st.integers(0, 10_000),
        Z=st.integers(2, 50),
        E=st.integers(0, 300),
        H=st.sampled_from([1, 2]),
        d=st.sampled_from([4, 8]),
        extra_dst=st.integers(0, 3),
    )
    @settings(max_examples=15, deadline=None)
    @pytest.mark.slow
    def test_multihead_backward_matches_xla_vjp(self, seed, Z, E, H, d,
                                                extra_dst):
        """The hand-written backward kernel == the XLA composition's VJP
        over arbitrary graphs (padding edges, out-of-range dst, random
        cotangents), to the documented bf16 absolute-precision class."""
        import jax
        import jax.numpy as jnp

        from ananke_abm_tpu.ops.pallas.edge_segment import (
            gat_edge_aggregate_multihead_pallas,
            gat_edge_backward_multihead_pallas,
        )
        from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

        rng = np.random.default_rng(seed)
        src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
        dst = jnp.asarray(rng.integers(0, Z + extra_dst, E), jnp.int32)
        Wh = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * 0.5
        qd = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * 0.5
        g = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))

        out, denom, shift = gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, num_nodes=Z, return_residuals=True,
            interpret=True,
        )
        got = gat_edge_backward_multihead_pallas(
            Wh, qs, qd, src, dst, g, out, denom, shift,
            num_nodes=Z, interpret=True,
        )
        _, vjp = jax.vjp(
            lambda Wh, qs, qd: gat_edge_attention_multihead(
                Wh, qd, qs, src, dst, Z, use_pallas=False
            ),
            Wh, qs, qd,
        )
        want = vjp(g)
        g_scale = float(np.abs(np.asarray(g)).max()
                        * np.abs(np.asarray(Wh)).max()) + 1e-6
        for a, b in zip(got, want):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all()
            den = max(np.abs(b).max(), g_scale)
            assert np.abs(a - b).max() / den < 2e-2

    @given(
        seed=st.integers(0, 10_000),
        Z=st.integers(1, 60),
        E=st.integers(0, 400),
        D=st.sampled_from([4, 16]),
    )
    @settings(max_examples=20, deadline=None)
    def test_segment_sum_matches_xla(self, seed, Z, E, D):
        import jax
        import jax.numpy as jnp

        from ananke_abm_tpu.ops.pallas.edge_segment import (
            segment_sum_pallas,
        )

        rng = np.random.default_rng(seed)
        vals = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
        # ids beyond Z (and at Z-1) -> out-of-range rows must be dropped
        ids = jnp.asarray(rng.integers(0, Z + 2, E), jnp.int32)
        want = np.asarray(jax.ops.segment_sum(vals, ids, num_segments=Z))
        got = np.asarray(segment_sum_pallas(vals, ids, Z, interpret=True))
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 2e-2


class TestFusedRolloutShapeSpace:
    """The serving kernels' tiling/padding arithmetic must hold at
    ARBITRARY shapes, not just the curated fixtures: odd agent counts
    (partial final tile), small/odd zone counts, any substeps/num_blocks.
    The two Pallas kernels (per-step and interval-fused decode) must
    agree EXACTLY with each other; both must track the f32 XLA model
    closely (bf16 kernel -> rare argmax flips near ties are allowed)."""

    @given(
        seed=st.integers(0, 1000),
        n_agents=st.integers(17, 150),
        num_zones=st.integers(4, 40),
        num_times=st.integers(3, 10),
        substeps=st.integers(1, 3),
        num_blocks=st.integers(1, 3),
    )
    @settings(max_examples=8, deadline=None)
    @pytest.mark.slow
    def test_kernels_agree_across_shapes(self, seed, n_agents, num_zones,
                                         num_times, substeps, num_blocks):
        import jax
        import jax.numpy as jnp

        from ananke_abm_tpu.data_generator.agent_trajectories import (
            generate_agent_population,
        )
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            build_model,
            init_params,
        )
        from ananke_abm_tpu.ops.pallas.fused_step import make_pallas_rollout

        cfg = GATODEConfig(
            zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
            gat_heads=2, gat_layers=1, num_blocks=num_blocks,
            substeps=substeps,
        )
        d = generate_agent_population(
            n_agents, num_times=num_times, num_zones=num_zones, seed=seed
        )
        model = build_model(cfg, 7, 8)
        params = init_params(model, cfg, d, n_agents, jax.random.PRNGKey(seed))
        zf, adj = jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"])
        times = jnp.asarray(d["times"])
        pf, hz = jnp.asarray(d["person_feats"]), jnp.asarray(d["home_zone"])

        per_step = make_pallas_rollout(
            model, zf, adj, times, substeps=substeps
        )(params, pf, hz)
        fused = make_pallas_rollout(
            model, zf, adj, times, substeps=substeps, fuse_decode=True
        )(params, pf, hz)
        # the two kernel variants share the bf16 math: exact agreement
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(per_step))
        assert fused.shape == (n_agents, num_times)

        logits, _ = model.apply(
            {"params": params}, zf, adj, pf, hz, times,
            ode_method="rk4", substeps=substeps,
        )
        lg = np.asarray(logits, dtype=np.float64)
        xla_ids = lg.argmax(-1)
        ids = np.asarray(fused)
        agree = (ids == xla_ids).mean()
        assert agree > 0.9, f"bf16 kernel ids diverged: {agree:.3f}"
        # every disagreement must be a bf16-scale near-tie in the f32
        # logits, not a genuinely different answer. bf16 state drift
        # compounds over RK4 stages, so the allowed margin grows with
        # rollout depth (an indexing bug would show margins of order
        # `scale`, far above this bound — capped at 0.3 to keep that
        # detection power).
        flips = np.argwhere(ids != xla_ids)
        scale = np.abs(lg).max() + 1e-9
        n_stages = (num_times - 1) * substeps * num_blocks
        tol = min(0.3, max(0.05, 0.004 * n_stages))
        for a, t in flips:
            margin = lg[a, t, xla_ids[a, t]] - lg[a, t, ids[a, t]]
            assert margin / scale < tol, (
                f"kernel picked a clearly-worse zone at ({a},{t}): "
                f"margin {margin:.4g} vs scale {scale:.4g}"
            )
