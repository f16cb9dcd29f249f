"""Large-Z gather/scatter edge kernel (ops/pallas/edge_gather.py).

The XLA segment path measures 50-227x off the HBM roofline at
Z=8192-65536 (docs/evidence_round5/edge_roofline.json); this kernel is
the TPU-native design for that band: dynamic row-gather from a
VMEM-resident source table, local one-hot scatter into per-dst-tile
blocks selected by scalar-prefetched chunk tables.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.ops.pallas.edge_gather import (
    TZ,
    build_edge_chunks,
    gat_edge_aggregate_gather_pallas,
    gat_edge_attention_gather,
)
from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead


def _rand_graph(rng, Z, E, H=4, d=16):
    Wh = jnp.asarray(rng.normal(size=(Z, H, d)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(Z, H)), jnp.float32)
    es = jnp.asarray(rng.normal(size=(Z, H)), jnp.float32)
    src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    return Wh, er, es, src, dst


class TestBuildChunks:
    def test_layout_invariants(self):
        rng = np.random.default_rng(0)
        Z, E = 1100, 4000
        src = rng.integers(0, Z, E).astype(np.int32)
        dst = rng.integers(0, 900, E).astype(np.int32)  # empty tail tile
        ch = build_edge_chunks(src, dst, Z, tile_e=512, reorder="none")
        C = ch.n_chunks
        assert ch.src_local.shape == (8 * C, 512)
        assert ch.dst_local.shape == (8 * C, 512)
        assert 0.0 < ch.fill <= 1.0
        # every dst tile appears (empty tiles get an inert chunk) and
        # each tile's first chunk is flagged exactly once
        tiles = np.asarray(ch.dst_tile)
        stiles = np.asarray(ch.src_tile)
        firsts = np.asarray(ch.first)
        n_tiles = -(-Z // TZ)
        assert set(tiles.tolist()) == set(range(n_tiles))
        for t in range(n_tiles):
            sel = tiles == t
            assert firsts[sel][0] == 1 and firsts[sel][1:].sum() == 0
        # chunks sorted by dst tile (consecutive output-block revisits)
        assert (np.diff(tiles) >= 0).all()
        # real edges survive: multiset of (src, dst) pairs is preserved
        dl = np.asarray(ch.dst_local)[::8]
        sv = np.asarray(ch.src_local)[::8]
        real = dl < TZ
        assert (sv[real] < TZ).all()  # real edges carry real src ids
        got = sorted(zip((sv + stiles[:, None] * TZ)[real].tolist(),
                         (dl + tiles[:, None] * TZ)[real].tolist()))
        want = sorted(zip(src.tolist(), dst.tolist()))
        assert got == want

    def test_rejects_bad_edges(self):
        with pytest.raises(ValueError, match="out of range"):
            build_edge_chunks(np.zeros(3, np.int32),
                              np.array([0, 5, 99], np.int32), 10)

    def test_cuthill_mckee_restores_fill_on_shuffled_band(self):
        """A banded graph under a random relabeling has no block
        locality (low fill); the CM reorder must recover it — and the
        kernel must still produce the composition's values through the
        order/rank permutation round-trip."""
        rng = np.random.default_rng(3)
        Z = 16384
        # band graph: dst i <- src in [i-4, i+4], then shuffle ids
        base_dst = np.repeat(np.arange(Z), 9)
        base_src = (base_dst + np.tile(np.arange(-4, 5), Z)) % Z
        shuf = rng.permutation(Z).astype(np.int32)
        src = shuf[base_src]
        dst = shuf[base_dst]
        ch_none = build_edge_chunks(src, dst, Z, tile_e=512,
                                    reorder="none")
        ch_cm = build_edge_chunks(src, dst, Z, tile_e=512)
        assert ch_cm.fill > 2 * ch_none.fill
        assert ch_cm.fill > 0.5

        # kernel in relabeled space == composition in original space
        Wh, er, es, _, _ = _rand_graph(rng, Z, 1)
        order = np.asarray(ch_cm.order)
        rank = np.asarray(ch_cm.rank)
        out_p = gat_edge_aggregate_gather_pallas(
            Wh[order], es[order], er[order], ch_cm, interpret=True
        )
        got = np.asarray(out_p)[rank]
        want = np.asarray(gat_edge_attention_multihead(
            Wh, er, es, jnp.asarray(src), jnp.asarray(dst),
            num_nodes=Z, use_pallas=False
        ))
        denom = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / denom < 2e-2
        cos = float(np.vdot(got, want) /
                    (np.linalg.norm(got) * np.linalg.norm(want)
                     + 1e-30))
        assert cos > 0.999


class TestGatherKernelInterpret:
    @pytest.mark.parametrize("Z,E", [(700, 3000), (513, 1), (1024, 8192)])
    def test_matches_xla_composition(self, Z, E):
        rng = np.random.default_rng(Z + E)
        Wh, er, es, src, dst = _rand_graph(rng, Z, E)
        ch = build_edge_chunks(src, dst, Z, tile_e=512,
                               reorder="none")
        got = gat_edge_aggregate_gather_pallas(
            Wh, es, er, ch, interpret=True
        )
        want = gat_edge_attention_multihead(
            Wh, er, es, src, dst, num_nodes=Z, use_pallas=False
        )
        g, w = np.asarray(got), np.asarray(want)
        denom = np.abs(w).max() + 1e-6
        assert np.abs(g - w).max() / denom < 2e-2  # bf16 feature class
        cos = float(np.vdot(g, w) /
                    (np.linalg.norm(g) * np.linalg.norm(w) + 1e-30))
        assert cos > 0.999

    def test_isolated_dst_rows_are_zero(self):
        """Nodes with no incoming edges must come back exactly zero
        (uninitialized output blocks would be garbage)."""
        rng = np.random.default_rng(7)
        Z = 1100
        Wh, er, es, src, dst = _rand_graph(rng, Z, 2000)
        dst = jnp.asarray(np.asarray(dst) % 600, jnp.int32)
        ch = build_edge_chunks(src, dst, Z, tile_e=512,
                               reorder="none")
        out = np.asarray(gat_edge_aggregate_gather_pallas(
            Wh, es, er, ch, interpret=True
        ))
        assert np.abs(out[600:]).max() == 0.0
        assert np.abs(out[:600]).sum() > 0

    def test_large_scores_exact_shift_and_bounded_finiteness(self):
        """At pathological score scales the bounded shift may underflow
        rows to zero but must stay FINITE; the exact per-dst-max shift
        (the wrapper's default precompute) must match the composition."""
        rng = np.random.default_rng(9)
        Z = 600
        Wh, er, es, src, dst = _rand_graph(rng, Z, 2400)
        er, es = er * 40.0, es * 40.0
        ch = build_edge_chunks(src, dst, Z, tile_e=512,
                               reorder="none")
        out_b = np.asarray(gat_edge_aggregate_gather_pallas(
            Wh, es, er, ch, interpret=True
        ))
        assert np.isfinite(out_b).all()

        # exact shift: true per-dst max (what _gat_gather_fwd computes)
        e = np.asarray(es)[np.asarray(src)] + np.asarray(er)[np.asarray(dst)]
        e = np.where(e >= 0, e, 0.2 * e)
        m = np.full((Z, e.shape[1]), 0.0, np.float32)
        has = np.zeros(Z, bool)
        for i, d_ in enumerate(np.asarray(dst)):
            m[d_] = np.maximum(m[d_], e[i]) if has[d_] else e[i]
            has[d_] = True
        out_e = np.asarray(gat_edge_aggregate_gather_pallas(
            Wh, es, er, ch, interpret=True, shift=jnp.asarray(m)
        ))
        want = np.asarray(gat_edge_attention_multihead(
            Wh, er, es, src, dst, num_nodes=Z, use_pallas=False
        ))
        cos = float(np.vdot(out_e, want) /
                    (np.linalg.norm(out_e) * np.linalg.norm(want)
                     + 1e-30))
        assert cos > 0.999
        denom = np.abs(want).max() + 1e-6
        assert np.abs(out_e - want).max() / denom < 2e-2


class TestModelIntegration:
    def test_encode_zones_with_chunks_matches_without(self):
        """GATLayer/ZoneGAT/encode_zones accept edge_chunks and the
        5-element graph static threads through the trainers — same
        embeddings as the plain edge-list path (off-TPU both routes
        reach the XLA composition; the kernel itself is covered
        above)."""
        import jax.numpy as jnp

        from ananke_abm_tpu.data_generator.agent_trajectories import (
            generate_agent_population,
        )
        from ananke_abm_tpu.models.gnn_embed.train import (
            GATODEConfig,
            _unpack_static,
            build_model,
            init_params,
            make_step_fns,
        )
        from ananke_abm_tpu.ops.segment import edges_from_adj

        cfg = GATODEConfig(
            zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
            gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
        )
        d = generate_agent_population(32, num_times=4, num_zones=24,
                                      seed=0)
        model = build_model(cfg, 7, 8)
        ei = edges_from_adj(np.asarray(d["adj"]))
        edge_index = (jnp.asarray(ei[0]), jnp.asarray(ei[1]))
        params = init_params(model, cfg, d, 32, jax.random.PRNGKey(0),
                             edge_index=edge_index)
        ch = build_edge_chunks(edge_index[0], edge_index[1], 24)
        zf = jnp.asarray(d["zone_features"])

        base = model.apply({"params": params}, zf, None, edge_index,
                           method=model.encode_zones)
        with_ch = model.apply({"params": params}, zf, None, edge_index,
                              ch, method=model.encode_zones)
        np.testing.assert_allclose(
            np.asarray(with_ch), np.asarray(base), rtol=1e-5, atol=1e-6
        )

        # the 5-element static threads through a train step (chunks as
        # a registered pytree riding the jitted graph argument)
        import optax

        static5 = (zf, None, jnp.asarray(d["times"]), edge_index, ch)
        assert _unpack_static(static5)[4] is ch
        step, _ = make_step_fns(model, optax.sgd(1e-2), cfg, static5)
        pf = jnp.asarray(d["person_feats"])
        hz = jnp.asarray(d["home_zone"])
        tg = jnp.asarray(d["zone_ids"])
        opt_state = optax.sgd(1e-2).init(params)
        _, _, loss, _ = step(params, opt_state, pf, hz, tg)
        assert np.isfinite(float(loss))


class TestDifferentiableWrapper:
    def test_value_and_grads_match_composition(self):
        rng = np.random.default_rng(1)
        Z, E = 700, 3000
        Wh, er, es, src, dst = _rand_graph(rng, Z, E)
        ch = build_edge_chunks(src, dst, Z, tile_e=512)

        def f(Wh, er, es):
            return jnp.sum(gat_edge_attention_gather(
                Wh, er, es, ch, src, dst, Z) ** 2)

        def fr(Wh, er, es):
            return jnp.sum(gat_edge_attention_multihead(
                Wh, er, es, src, dst, Z, use_pallas=False) ** 2)

        np.testing.assert_allclose(
            float(f(Wh, er, es)), float(fr(Wh, er, es)), rtol=1e-5
        )
        ga = jax.grad(f, argnums=(0, 1, 2))(Wh, er, es)
        gb = jax.grad(fr, argnums=(0, 1, 2))(Wh, er, es)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
