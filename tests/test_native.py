"""Native C++ host kernels vs the numpy paths."""
import numpy as np
import pytest

from ananke_abm_tpu.models.gen_schedule.compare.utils import (
    ngram_count_arrays,
    segments_run_length,
)
from ananke_abm_tpu.ops import native


@pytest.fixture(scope="module")
def Y():
    return np.random.default_rng(0).integers(0, 5, size=(200, 48)).astype(np.int64)


class TestNative:
    def test_library_builds(self):
        assert native.available(), "g++ toolchain present; native lib must build"

    @pytest.mark.parametrize("n", [1, 2, 3, 4])
    def test_count_ngrams_matches_numpy(self, Y, n):
        P = 5
        dense = native.count_ngrams_dense(Y, n, P)
        codes, vals = ngram_count_arrays(Y, n, P)
        want = np.zeros(P**n, dtype=np.int64)
        want[codes] = vals
        np.testing.assert_array_equal(dense, want)
        assert dense.sum() == Y.shape[0] * (Y.shape[1] - n + 1)

    def test_run_length_matches_numpy(self, Y):
        p1, u1, l1 = native.run_length_segments(Y)
        p2, u2, l2 = segments_run_length(Y)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(u1, u2)
        np.testing.assert_array_equal(l1, l2)

    def test_tod_counts_matches_bincount(self, Y):
        P = 5
        got = native.tod_counts(Y, P)
        T = Y.shape[1]
        flat = (np.arange(T)[None, :] * P + Y).ravel()
        want = np.bincount(flat, minlength=T * P).reshape(T, P)
        np.testing.assert_array_equal(got, want)

    def test_ngram_start_hist(self, Y):
        P, n = 5, 2
        hist = native.ngram_start_hist_dense(Y, n, P)
        assert hist.shape == (25, 47)
        # column sums = rows per start position = N
        np.testing.assert_array_equal(hist.sum(axis=0), Y.shape[0])

    @pytest.mark.slow
    def test_vista_scale_speed(self):
        """1M-row-equivalent sanity: 100k x 288 counts in bounded time.

        Guards against an accidental quadratic-in-N regression, not a
        tight perf bar — the bound is generous because the suite shares
        the box with other jobs. (The historical 12.7 s flake was NOT
        load: it was first-touch page faults on np.empty output buffers
        in run_length_segments, fixed by calloc'd np.zeros — the pair
        now runs in well under 1 s idle.)
        """
        import time

        Yb = np.random.default_rng(1).integers(0, 7, size=(100_000, 288)).astype(np.int64)
        t0 = time.time()
        native.count_ngrams_dense(Yb, 2, 7)
        native.run_length_segments(Yb)
        dt = time.time() - t0
        assert dt < 20.0, f"native counting too slow: {dt:.1f}s"

    def test_rasterize_fill_matches_numpy(self):
        """Native rasterizer == numpy prefix-recurrence path."""
        import pandas as pd

        from ananke_abm_tpu.data_generator.population import (
            generate_population_activities,
        )
        from ananke_abm_tpu.dataio.rasterize import (
            build_purpose_map,
            rasterize_frame,
        )
        from ananke_abm_tpu.ops import native as nat

        df = generate_population_activities(200, seed=6)
        pm = build_purpose_map(df["purpose"])
        Y_fast, _ = rasterize_frame(df, pm, grid_min=15)

        # force the numpy path by monkeypatching availability
        orig = nat.rasterize_fill
        try:
            nat.rasterize_fill = lambda *a, **k: None
            Y_np, _ = rasterize_frame(df, pm, grid_min=15)
        finally:
            nat.rasterize_fill = orig
        np.testing.assert_array_equal(Y_fast, Y_np)


class TestLabelBounds:
    """Out-of-range labels must raise, not write out of bounds in the C
    kernels (uniform failure mode for native and numpy paths)."""

    def test_rejects_label_ge_P(self):
        import pytest

        from ananke_abm_tpu.ops import native as nat

        Y = np.array([[0, 1, 2, 3]], dtype=np.int64)  # 3 >= P
        for fn in (
            lambda: nat.count_ngrams_dense(Y, 2, 3),
            lambda: nat.tod_counts(Y, 3),
            lambda: nat.ngram_start_hist_dense(Y, 2, 3),
        ):
            with pytest.raises(ValueError, match="labels out of range"):
                fn()

    def test_rejects_negative_label(self):
        import pytest

        from ananke_abm_tpu.ops import native as nat

        Y = np.array([[0, -1, 2]], dtype=np.int64)
        with pytest.raises(ValueError, match="labels out of range"):
            nat.count_ngrams_dense(Y, 2, 3)
