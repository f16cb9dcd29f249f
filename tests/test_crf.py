"""CRF recursions vs brute-force enumeration on tiny P/T (SURVEY.md §4)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.ops.crf import (
    crf_log_partition,
    crf_marginals,
    crf_nll,
    crf_path_score,
    viterbi_decode,
    viterbi_decode_no_all_home,
)


def _brute_force_paths(T, P):
    return list(itertools.product(range(P), repeat=T))


def _path_score_np(u, A, path):
    s = sum(u[t, p] for t, p in enumerate(path))
    s += sum(A[path[t - 1], path[t]] for t in range(1, len(path)))
    return s


def _random_instance(key, B=3, T=4, P=3):
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (B, T, P))
    A = jax.random.normal(k2, (P, P)) * 0.5
    return np.array(u), np.array(A)  # writable host copies


class TestLogPartition:
    def test_matches_brute_force(self):
        u, A = _random_instance(jax.random.PRNGKey(0))
        B, T, P = u.shape
        logZ = np.asarray(crf_log_partition(jnp.asarray(u), jnp.asarray(A)))
        for b in range(B):
            scores = [
                _path_score_np(u[b], A, p) for p in _brute_force_paths(T, P)
            ]
            expected = np.log(np.sum(np.exp(scores)))
            np.testing.assert_allclose(logZ[b], expected, rtol=1e-4)

    def test_nll_positive_and_differentiable(self):
        u, A = _random_instance(jax.random.PRNGKey(1))
        labels = jnp.zeros(u.shape[:2], dtype=jnp.int32)
        nll = crf_nll(jnp.asarray(u), labels, jnp.asarray(A))
        assert float(nll) > 0.0
        g = jax.grad(lambda A: crf_nll(jnp.asarray(u), labels, A))(jnp.asarray(A))
        assert np.all(np.isfinite(np.asarray(g)))


class TestViterbi:
    def test_matches_brute_force(self):
        u, A = _random_instance(jax.random.PRNGKey(2), B=4, T=5, P=3)
        paths = np.asarray(viterbi_decode(jnp.asarray(u), jnp.asarray(A)))
        for b in range(u.shape[0]):
            best = max(
                _brute_force_paths(u.shape[1], u.shape[2]),
                key=lambda p: _path_score_np(u[b], A, p),
            )
            got = _path_score_np(u[b], A, tuple(paths[b]))
            want = _path_score_np(u[b], A, best)
            np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_constrained_no_all_home(self):
        """Constrained decode = best path among paths with >=1 non-home."""
        home = 0
        u, A = _random_instance(jax.random.PRNGKey(3), B=4, T=4, P=3)
        # strongly bias toward home so the unconstrained argmax IS all-home
        u[:, :, home] += 10.0
        paths = np.asarray(
            viterbi_decode_no_all_home(jnp.asarray(u), jnp.asarray(A), home)
        )
        for b in range(u.shape[0]):
            assert np.any(paths[b] != home), "constraint violated"
            valid = [
                p
                for p in _brute_force_paths(u.shape[1], u.shape[2])
                if any(s != home for s in p)
            ]
            best = max(valid, key=lambda p: _path_score_np(u[b], A, p))
            got = _path_score_np(u[b], A, tuple(paths[b]))
            want = _path_score_np(u[b], A, best)
            np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_constrained_matches_unconstrained_when_nonhome_wins(self):
        u, A = _random_instance(jax.random.PRNGKey(4), B=3, T=6, P=4)
        u[:, :, 1] += 5.0  # non-home state dominates
        a = np.asarray(viterbi_decode(jnp.asarray(u), jnp.asarray(A)))
        b = np.asarray(
            viterbi_decode_no_all_home(jnp.asarray(u), jnp.asarray(A), 0)
        )
        np.testing.assert_array_equal(a, b)


class TestMarginals:
    def test_sum_to_one_and_match_brute_force(self):
        u, A = _random_instance(jax.random.PRNGKey(5), B=2, T=4, P=3)
        m = np.asarray(crf_marginals(jnp.asarray(u), jnp.asarray(A)))
        np.testing.assert_allclose(m.sum(axis=-1), 1.0, rtol=1e-4)
        B, T, P = u.shape
        for b in range(B):
            scores = np.array(
                [_path_score_np(u[b], A, p) for p in _brute_force_paths(T, P)]
            )
            w = np.exp(scores - scores.max())
            w /= w.sum()
            for t in range(T):
                for p in range(P):
                    expected = sum(
                        wi
                        for wi, path in zip(w, _brute_force_paths(T, P))
                        if path[t] == p
                    )
                    np.testing.assert_allclose(m[b, t, p], expected, atol=1e-4)
