"""Semi-CRF recursions vs brute-force segmentation enumeration."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.ops.semi_crf import (
    semicrf_decode,
    semicrf_gold_log_marginal,
    semicrf_log_partition,
    semicrf_nll,
    semicrf_path_score,
)


def _enumerate_segmentations(T, P, D, allow_self=False):
    """All (purpose, duration) sequences covering T; self-repeats admitted
    only when ``allow_self``."""

    def rec(remaining, prev_p):
        if remaining == 0:
            yield []
            return
        for d in range(1, min(D, remaining) + 1):
            for p in range(P):
                if p == prev_p and not allow_self:
                    continue
                for rest in rec(remaining - d, p):
                    yield [(p, d)] + rest

    return list(rec(T, -1))


def _dense(segs):
    out = []
    for (p, d) in segs:
        out.extend([p] * d)
    return out


def _score_np(u, dur, A, segs):
    t = 0
    s = 0.0
    prev = None
    for (p, d) in segs:
        s += u[t : t + d, p].sum() + dur[p, d - 1]
        if prev is not None:
            s += A[prev, p]
        prev = p
        t += d
    return s


def _instance(key, B=2, T=5, P=3, D=3):
    k1, k2, k3 = jax.random.split(key, 3)
    u = np.array(jax.random.normal(k1, (B, T, P)))
    dur = np.array(jax.random.normal(k2, (P, D)) * 0.5)
    A = np.array(jax.random.normal(k3, (P, P)) * 0.5)
    return u, dur, A


class TestLogPartition:
    def test_matches_brute_force(self):
        u, dur, A = _instance(jax.random.PRNGKey(0))
        B, T, P = u.shape
        D = dur.shape[1]
        logZ = np.asarray(
            semicrf_log_partition(
                jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A)
            )
        )
        segs = _enumerate_segmentations(T, P, D)
        assert len(segs) > 10
        for b in range(B):
            scores = [_score_np(u[b], dur, A, s) for s in segs]
            expected = np.log(np.sum(np.exp(np.array(scores))))
            np.testing.assert_allclose(logZ[b], expected, rtol=1e-4)


class TestDecode:
    def test_matches_brute_force(self):
        u, dur, A = _instance(jax.random.PRNGKey(1), B=3, T=6, P=3, D=3)
        labels = np.asarray(
            semicrf_decode(jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A))
        )
        segs = _enumerate_segmentations(6, 3, 3)
        for b in range(3):
            best = max(segs, key=lambda s: _score_np(u[b], dur, A, s))
            dense = []
            for (p, d) in best:
                dense.extend([p] * d)
            np.testing.assert_array_equal(labels[b], dense)

    def test_duration_cap_respected(self):
        """With Dmax=2, no decoded segment may exceed 2 bins."""
        u, dur, A = _instance(jax.random.PRNGKey(2), B=4, T=8, P=3, D=2)
        u[:, :, 0] += 5.0  # strongly favor purpose 0 everywhere
        labels = np.asarray(
            semicrf_decode(jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A))
        )
        for b in range(4):
            run = 1
            for t in range(1, 8):
                if labels[b, t] == labels[b, t - 1]:
                    run += 1
                    assert run <= 2, f"segment longer than Dmax: {labels[b]}"
                else:
                    run = 1


class TestNLL:
    def test_path_score_matches_manual(self):
        u, dur, A = _instance(jax.random.PRNGKey(3), B=1, T=5, P=3, D=3)
        labels = np.array([[0, 0, 1, 1, 2]])
        got = float(
            semicrf_path_score(
                jnp.asarray(u), jnp.asarray(labels), jnp.asarray(dur),
                jnp.asarray(A),
            )[0]
        )
        want = _score_np(u[0], dur, A, [(0, 2), (1, 2), (2, 1)])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_nll_positive_and_differentiable(self):
        u, dur, A = _instance(jax.random.PRNGKey(4))
        labels = jnp.asarray(np.array([[0, 1, 1, 2, 0], [1, 1, 0, 0, 2]]))

        def loss(dur, A):
            return semicrf_nll(jnp.asarray(u), labels, dur, A)

        nll = float(loss(jnp.asarray(dur), jnp.asarray(A)))
        assert nll > 0
        g1, g2 = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(dur), jnp.asarray(A)
        )
        assert np.all(np.isfinite(np.asarray(g1)))
        assert np.all(np.isfinite(np.asarray(g2)))

    def test_masked_nll_ignores_padded_rows(self):
        u, dur, A = _instance(jax.random.PRNGKey(7), B=3, T=5, P=3, D=3)
        labels = jnp.asarray(
            np.array([[0, 1, 1, 2, 0], [1, 1, 0, 0, 2], [2, 0, 0, 1, 1]])
        )
        mask = jnp.asarray(np.array([1.0, 1.0, 0.0]))
        masked = float(
            semicrf_nll(jnp.asarray(u), labels, jnp.asarray(dur),
                        jnp.asarray(A), mask_b=mask)
        )
        first_two = float(
            semicrf_nll(jnp.asarray(u[:2]), labels[:2], jnp.asarray(dur),
                        jnp.asarray(A))
        )
        np.testing.assert_allclose(masked, first_two, rtol=1e-6)


class TestExactLongSegments:
    """Exact likelihood when gold runs exceed Dmax (VERDICT r1 item 4)."""

    def test_allow_self_log_partition_matches_brute_force(self):
        u, dur, A = _instance(jax.random.PRNGKey(5), B=2, T=5, P=2, D=2)
        logZ = np.asarray(
            semicrf_log_partition(
                jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A),
                allow_self=True,
            )
        )
        segs = _enumerate_segmentations(5, 2, 2, allow_self=True)
        for b in range(2):
            scores = [_score_np(u[b], dur, A, s) for s in segs]
            expected = np.log(np.sum(np.exp(np.array(scores))))
            np.testing.assert_allclose(logZ[b], expected, rtol=1e-4)

    def test_gold_marginal_matches_brute_force_long_run(self):
        """Gold grid with a run of 4 > Dmax=2: marginal over all consistent
        self-transiting segmentations, enumerated by hand."""
        u, dur, A = _instance(jax.random.PRNGKey(6), B=2, T=6, P=3, D=2)
        gold = np.array([[0, 0, 0, 0, 1, 2], [1, 1, 1, 1, 1, 0]])
        got = np.asarray(
            semicrf_gold_log_marginal(
                jnp.asarray(u), jnp.asarray(gold), jnp.asarray(dur),
                jnp.asarray(A),
            )
        )
        segs = _enumerate_segmentations(6, 3, 2, allow_self=True)
        for b in range(2):
            consistent = [s for s in segs if _dense(s) == list(gold[b])]
            assert len(consistent) > 1  # the long run splits several ways
            scores = [_score_np(u[b], dur, A, s) for s in consistent]
            expected = np.log(np.sum(np.exp(np.array(scores))))
            np.testing.assert_allclose(got[b], expected, rtol=1e-4)

    def test_exact_nll_is_positive_finite_differentiable_past_dmax(self):
        u, dur, A = _instance(jax.random.PRNGKey(8), B=2, T=6, P=3, D=2)
        gold = jnp.asarray(np.array([[0, 0, 0, 0, 1, 2], [1, 1, 1, 1, 1, 0]]))

        def loss(u, dur, A):
            return semicrf_nll(u, gold, dur, A, exact_long=True)

        val = float(loss(jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A)))
        assert np.isfinite(val) and val > 0
        grads = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A)
        )
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))

    def test_decode_allow_self_can_exceed_dmax(self):
        """With self-transitions cheap and one purpose dominant, the
        allow_self decode produces a run longer than Dmax."""
        u, dur, A = _instance(jax.random.PRNGKey(9), B=1, T=8, P=3, D=2)
        u[:, :, 0] += 10.0
        A = A * 0 + 1.0  # uniform transitions incl. self
        labels = np.asarray(
            semicrf_decode(
                jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A),
                allow_self=True,
            )
        )
        assert (labels[0] == 0).all()

    def test_decode_allow_self_matches_brute_force(self):
        u, dur, A = _instance(jax.random.PRNGKey(10), B=3, T=5, P=2, D=2)
        labels = np.asarray(
            semicrf_decode(
                jnp.asarray(u), jnp.asarray(dur), jnp.asarray(A),
                allow_self=True,
            )
        )
        segs = _enumerate_segmentations(5, 2, 2, allow_self=True)
        for b in range(3):
            best = max(segs, key=lambda s: _score_np(u[b], dur, A, s))
            np.testing.assert_array_equal(labels[b], _dense(best))
