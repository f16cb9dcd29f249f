"""Compare harness: vectorized counting vs naive loops, SRMSE forms,
segmentation, and the full metric-tables run on synthetic data."""
import itertools
import json
import os

import numpy as np
import pytest

from ananke_abm_tpu.models.gen_schedule.compare.utils import (
    align_count_arrays,
    compute_basic_srmse_from_probs,
    compute_srmse_from_counts,
    compute_srmse_from_probs,
    entropy_from_count_array,
    gini_from_count_array,
    ngram_count_arrays,
    ngram_counts,
    schedule_counts,
    segments_run_length,
)


class TestCounting:
    def test_ngram_counts_match_naive(self):
        rng = np.random.default_rng(0)
        Y = rng.integers(0, 4, size=(30, 12))
        for n in (1, 2, 3, 4):
            got = ngram_counts(Y, n)
            naive = {}
            for row in Y:
                for t in range(12 - n + 1):
                    k = tuple(int(x) for x in row[t : t + n])
                    naive[k] = naive.get(k, 0) + 1
            assert got == naive

    def test_schedule_counts(self):
        Y = np.array([[0, 1], [0, 1], [1, 1]])
        c = schedule_counts(Y)
        assert c == {(0, 1): 2, (1, 1): 1}

    def test_segments_run_length(self):
        Y = np.array([[0, 0, 1, 1, 1, 0], [2, 2, 2, 2, 2, 2]])
        person, purpose, length = segments_run_length(Y)
        np.testing.assert_array_equal(person, [0, 0, 0, 1])
        np.testing.assert_array_equal(purpose, [0, 1, 0, 2])
        np.testing.assert_array_equal(length, [2, 3, 1, 6])


class TestSRMSE:
    def test_zero_for_identical(self):
        Y = np.random.default_rng(1).integers(0, 3, size=(20, 10))
        c = ngram_counts(Y, 2)
        assert compute_srmse_from_counts(c, c) == pytest.approx(0.0)

    def test_known_value(self):
        p = np.array([0.5, 0.5])
        q = np.array([1.0, 0.0])
        # Eq13: rmse = sqrt(0.25+0.25)/sqrt(2) = 0.5; mean_ref = 0.5 -> 1.0
        assert compute_srmse_from_probs(p, q) == pytest.approx(1.0)
        # scaled: sqrt(0.5 / 0.5) = 1.0
        assert compute_basic_srmse_from_probs(p, q) == pytest.approx(1.0)

    def test_align_count_arrays(self):
        keys, ca, cb = align_count_arrays(
            np.array([1, 3]), np.array([10, 5]),
            np.array([2, 3]), np.array([7, 2]),
        )
        np.testing.assert_array_equal(keys, [1, 2, 3])
        np.testing.assert_array_equal(ca, [10, 0, 5])
        np.testing.assert_array_equal(cb, [0, 7, 2])


class TestDiversityStats:
    def test_entropy_uniform(self):
        c = np.array([5, 5, 5, 5])
        assert entropy_from_count_array(c) == pytest.approx(np.log(4))

    def test_gini_extremes(self):
        assert gini_from_count_array(np.array([3, 3, 3])) == pytest.approx(0.0)
        g = gini_from_count_array(np.array([0, 0, 0, 100]))
        assert g == pytest.approx(0.75, abs=0.01)


class TestMetricTables:
    def test_full_run(self, tmp_path):
        from ananke_abm_tpu.models.gen_schedule.compare.tables import (
            metric_tables,
        )

        rng = np.random.default_rng(2)
        pm = {"Home": 0, "Shopping": 1, "Work": 2}
        T, N = 24, 60

        def make_pop(seed):
            r = np.random.default_rng(seed)
            Y = np.zeros((N, T), dtype=np.int64)
            start = r.integers(4, 8, N)
            end = r.integers(14, 20, N)
            for i in range(N):
                Y[i, start[i] : end[i]] = 2
                if r.random() < 0.4:
                    Y[i, end[i] : end[i] + 2] = 1
            return Y

        meta = {"purpose_map": pm, "grid_min": 60, "horizon_min": 1440, "L": T}
        ref_npz = str(tmp_path / "ref.npz")
        np.savez(ref_npz, Y=make_pop(0))
        with open(str(tmp_path / "ref_meta.json"), "w") as f:
            json.dump(meta, f)

        cdir = tmp_path / "models"
        cdir.mkdir()
        for name, seed in (("model_a", 1), ("model_b", 2)):
            np.savez(str(cdir / f"{name}.npz"), Y_generated=make_pop(seed))
            with open(str(cdir / f"{name}_meta.json"), "w") as f:
                json.dump(meta, f)

        outdir = str(tmp_path / "tables")
        ran = metric_tables(
            ref_npz, str(tmp_path / "ref_meta.json"), str(cdir), outdir
        )
        assert len(ran) >= 10
        expected_files = [
            "minutes_share_levels.csv", "minutes_share_abs_error.csv",
            "tod_jsd.csv", "bigram_L1.csv",
            "srmse_schedule.csv", "srmse_bigram.csv", "srmse_trigram.csv",
            "srmse_quadgram.csv",
            "tod_jsd_macro.csv", "tod_jsd_weighted.csv", "tod_jsd_detail_n1.csv",
            "duration_jsd_macro_n1.csv", "duration_jsd_n1.csv",
            "duration_jsd_macro_n2.csv",
            "diversity_schedules.csv", "diversity_ngram_n1.csv",
            "raw_cells_counts.csv", "raw_counts_schedule_confirmation.csv",
            "raw_counts_home_patterns.csv",
        ]
        for fn in expected_files:
            assert os.path.exists(os.path.join(outdir, fn)), fn

        # sanity: identical model vs itself -> srmse 0 rows exist
        import pandas as pd

        srmse = pd.read_csv(os.path.join(outdir, "srmse_schedule.csv"))
        assert (srmse[srmse.model == "ref"].srmse == 0).all()
        hp = pd.read_csv(os.path.join(outdir, "raw_counts_home_patterns.csv"))
        assert set(hp.model) == {"ref", "model_a", "model_b"}

    def test_grid_mismatch_raises(self, tmp_path):
        from ananke_abm_tpu.models.gen_schedule.compare.tables import (
            metric_tables,
        )

        pm = {"Home": 0, "Work": 1}
        np.savez(str(tmp_path / "ref.npz"), Y=np.zeros((4, 10), np.int64))
        with open(str(tmp_path / "ref_meta.json"), "w") as f:
            json.dump({"purpose_map": pm, "grid_min": 5, "L": 10}, f)
        cdir = tmp_path / "m"
        cdir.mkdir()
        np.savez(str(cdir / "x.npz"), Y_generated=np.zeros((4, 8), np.int64))
        with open(str(cdir / "x_meta.json"), "w") as f:
            json.dump({"purpose_map": pm, "grid_min": 5, "L": 8}, f)
        with pytest.raises(AssertionError, match="Temporal mismatch"):
            metric_tables(
                str(tmp_path / "ref.npz"), str(tmp_path / "ref_meta.json"),
                str(cdir), str(tmp_path / "out"),
            )

    def test_out_of_map_labels_fail_fast(self, tmp_path):
        """A model grid with labels outside the ref purpose_map range
        must abort BEFORE any CSV is written (previously the suite
        crashed mid-run: duration metrics tolerated the labels, tod/
        ngram/bigram raised, leaving partial output)."""
        from ananke_abm_tpu.models.gen_schedule.compare.tables import (
            metric_tables,
        )

        pm = {"Home": 0, "Work": 1}
        np.savez(str(tmp_path / "ref.npz"), Y=np.zeros((4, 10), np.int64))
        with open(str(tmp_path / "ref_meta.json"), "w") as f:
            json.dump({"purpose_map": pm, "grid_min": 5, "L": 10}, f)
        cdir = tmp_path / "m"
        cdir.mkdir()
        bad = np.zeros((4, 10), np.int64)
        bad[0, 0] = 7  # purpose index beyond ref's P=2
        np.savez(str(cdir / "x.npz"), Y_generated=bad)
        with open(str(cdir / "x_meta.json"), "w") as f:
            json.dump({"purpose_map": pm, "grid_min": 5, "L": 10}, f)
        outdir = tmp_path / "out"
        with pytest.raises(ValueError, match="purpose_map"):
            metric_tables(
                str(tmp_path / "ref.npz"), str(tmp_path / "ref_meta.json"),
                str(cdir), str(outdir),
            )
        assert not outdir.exists() or not any(outdir.iterdir())


class TestScheduleCountArraysHashPath:
    """compare.utils.schedule_count_arrays — the hash-grouped row unique:
    exact counts (set-equality with np.unique), collision fallback, and
    the all-unique alias shortcut."""

    @staticmethod
    def _as_dict(rows, counts):
        return {r.tobytes(): int(c) for r, c in zip(rows, counts)}

    def test_matches_np_unique_as_sets(self):
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            schedule_count_arrays,
        )

        Y = np.random.default_rng(0).integers(0, 4, size=(500, 7))
        r1, c1 = np.unique(Y, axis=0, return_counts=True)
        r2, c2 = schedule_count_arrays(Y)
        assert self._as_dict(r1, c1) == self._as_dict(r2, c2)
        assert c2.sum() == Y.shape[0]

    def test_collision_fallback_is_exact(self, monkeypatch):
        """Force every PRIMARY row hash equal (the independent second
        hash keeps discriminating): the cross-check must detect the
        collision and fall back to the exact sort path."""
        import ananke_abm_tpu.models.gen_schedule.compare.utils as cu

        Y = np.random.default_rng(1).integers(0, 3, size=(200, 5))
        r1, c1 = np.unique(Y, axis=0, return_counts=True)
        real = cu._hash_rows_u64
        monkeypatch.setattr(
            cu, "_hash_rows_u64",
            lambda p, alt=False: real(p, alt=True) if alt
            else np.zeros(p.shape[0], np.uint64),
        )
        r2, c2 = cu.schedule_count_arrays(Y)
        assert self._as_dict(r1, c1) == self._as_dict(r2, c2)

    def test_double_collision_would_merge_without_second_hash(self):
        """The two hash families must actually be independent: on a
        row set engineered to collide under neither, they agree with
        np.unique; and the alt hash differs from the primary."""
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            _hash_rows_u64,
        )

        Y = np.random.default_rng(2).integers(0, 9, size=(100, 16))
        p = np.ascontiguousarray(Y.astype(np.uint8))
        h1 = _hash_rows_u64(p)
        h2 = _hash_rows_u64(p, alt=True)
        assert not np.array_equal(h1, h2)
        assert len(np.unique(h1)) == len(np.unique(h2)) == 100

    def test_all_unique_aliases_input(self):
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            schedule_count_arrays,
        )

        Y = np.arange(60).reshape(20, 3) % 200  # all rows distinct
        rows, counts = schedule_count_arrays(Y)
        assert rows is Y  # documented no-copy shortcut
        np.testing.assert_array_equal(counts, np.ones(20, np.int64))

    def test_wide_labels_use_np_unique(self):
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            schedule_count_arrays,
        )

        Y = np.array([[300, 1], [300, 1], [2, 5]])  # labels > 255
        rows, counts = schedule_count_arrays(Y)
        assert self._as_dict(*np.unique(Y, axis=0, return_counts=True)) \
            == self._as_dict(rows, counts)

    def test_float_rows_use_exact_unique(self):
        """Non-integer dtypes must not be truncated to uint8 before
        hashing (1.2 and 1.7 are distinct rows)."""
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            schedule_count_arrays,
        )

        Y = np.array([[1.2, 2.0], [1.7, 2.0], [1.2, 2.0]])
        rows, counts = schedule_count_arrays(Y)
        assert len(counts) == 2 and sorted(counts) == [1, 2]


class TestLabelValidationUniform:
    """Out-of-range labels raise the same clear error on the native AND
    numpy branches (previously: native raised, numpy silently aliased
    base-P codes or crashed on a reshape)."""

    def test_ngram_count_arrays(self):
        from ananke_abm_tpu.models.gen_schedule.compare.utils import (
            ngram_count_arrays,
        )

        Y = np.array([[0, 5, 1]])
        with pytest.raises(ValueError, match="labels out of range"):
            ngram_count_arrays(Y, 2, P=3)

    def test_tod_marginals_and_bigram(self):
        from ananke_abm_tpu.models.gen_schedule.evals.metrics import (
            bigram_matrix,
            tod_marginals,
        )

        Y = np.array([[0, 5, 1]])
        with pytest.raises(ValueError, match="labels out of range"):
            tod_marginals(Y, P=3)
        with pytest.raises(ValueError, match="labels out of range"):
            bigram_matrix(Y, P=3)

    def test_duration_hists_out_of_range_codes_fall_back(self):
        """Codes >= P^n keep the tolerant unique path (the reference
        counted extra keys; the dense path would crash on reshape)."""
        from ananke_abm_tpu.models.gen_schedule.compare.extract_metrics.duration_jsd import (
            _duration_hists,
        )

        keys, hists = _duration_hists(
            np.array([5]), np.array([60]), grid_min=60, num_codes=4
        )
        assert list(keys) == [5] and hists.shape[1] == 1440 // 60

    def test_raw_schedules_wide_labels_compare_correctly(self, tmp_path):
        """A model grid with a label > 255 must be compared (never
        confirmed vs a uint8-packable ref), not crash the run."""
        from ananke_abm_tpu.models.gen_schedule.compare.extract_metrics.raw_counts import (
            metric_raw_schedules,
        )

        pm = {"Home": 0, "A": 1}
        ref = {"Y": np.array([[0, 1], [0, 0]]), "purpose_map": pm,
               "name": "ref"}
        syn = {"Y": np.array([[0, 1], [0, 300]]), "purpose_map": pm,
               "name": "syn"}
        metric_raw_schedules(ref, [syn], str(tmp_path))
        import csv

        with open(tmp_path / "raw_counts_schedule_confirmation.csv") as f:
            rows = {r["model"]: r for r in csv.DictReader(f)}
        assert int(rows["syn"]["confirmed_individual_count"]) == 1
        assert int(rows["syn"]["unique_confirmed_count"]) == 1

    def test_raw_schedules_float_rows_not_truncated(self, tmp_path):
        """Regression: float grids used to be keyed via astype(int64),
        so 1.2 and 1.7 collided and falsely 'confirmed' distinct rows."""
        from ananke_abm_tpu.models.gen_schedule.compare.extract_metrics.raw_counts import (
            metric_raw_schedules,
        )

        pm = {"Home": 0, "A": 1}
        ref = {"Y": np.array([[1.2, 2.0], [0.0, 0.0]]), "purpose_map": pm,
               "name": "ref"}
        syn = {"Y": np.array([[1.7, 2.0], [1.2, 2.0]]), "purpose_map": pm,
               "name": "syn"}
        metric_raw_schedules(ref, [syn], str(tmp_path))
        import csv

        with open(tmp_path / "raw_counts_schedule_confirmation.csv") as f:
            rows = {r["model"]: r for r in csv.DictReader(f)}
        # only [1.2, 2.0] matches the ref; [1.7, 2.0] must NOT
        assert int(rows["syn"]["confirmed_individual_count"]) == 1
        assert int(rows["syn"]["unique_confirmed_count"]) == 1
        # an int-valued float ref row must still match an int model row
        syn_int = {"Y": np.array([[0, 0]]), "purpose_map": pm,
                   "name": "syn_int"}
        metric_raw_schedules(ref, [syn_int], str(tmp_path))
        with open(tmp_path / "raw_counts_schedule_confirmation.csv") as f:
            rows = {r["model"]: r for r in csv.DictReader(f)}
        assert int(rows["syn_int"]["unique_confirmed_count"]) == 1
