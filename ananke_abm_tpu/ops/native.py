"""ctypes bindings for the native host-counting kernels (native/
ananke_host.cpp), with transparent numpy fallback.

The shared library is built on demand with g++ (cached beside the source);
every entry point has a pure-numpy equivalent in ``compare.utils`` so the
framework works without a toolchain. ``available()`` reports which path is
active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libananke_host.so")

_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ananke_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.count_ngrams.argtypes = [p64, i64, i64, i64, i64, p64]
    lib.count_ngrams.restype = None
    lib.run_length_segments.argtypes = [p64, i64, i64, p64, p64, p64]
    lib.run_length_segments.restype = i64
    lib.tod_counts.argtypes = [p64, i64, i64, i64, p64]
    lib.tod_counts.restype = None
    lib.ngram_start_hist.argtypes = [p64, i64, i64, i64, i64, p64]
    lib.ngram_start_hist.restype = None
    lib.rasterize_fill.argtypes = [p64, p64, p64, p64, i64, i64, p64]
    lib.rasterize_fill.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def check_labels(Y: np.ndarray, P: int) -> None:
    """Reject out-of-range labels before dispatch: the C kernels index
    dense accumulators by raw label value, so a label >= P (or negative)
    in an externally supplied grid would write out of bounds — and the
    numpy fallbacks either alias base-P codes or crash on a reshape for
    the same inputs. One uniform ValueError for both paths; the metric
    dispatchers call this too so behavior does not depend on whether
    the native lib is built."""
    if Y.size and (Y.min() < 0 or Y.max() >= P):
        raise ValueError(
            f"labels out of range: expected 0 <= Y < {P}, "
            f"got [{Y.min()}, {Y.max()}]"
        )


_check_labels = check_labels  # internal alias, kept for call sites below


def count_ngrams_dense(Y: np.ndarray, n: int, P: int) -> np.ndarray:
    """Dense (P^n,) count table of base-P n-gram codes. Native or numpy."""
    Y = np.ascontiguousarray(Y, dtype=np.int64)
    _check_labels(Y, P)
    N, T = Y.shape
    size = P**n
    lib = _load()
    if lib is not None:
        counts = np.zeros(size, dtype=np.int64)
        lib.count_ngrams(Y, N, T, n, P, counts)
        return counts
    from ananke_abm_tpu.models.gen_schedule.compare.utils import (
        ngram_count_arrays,
    )

    codes, vals = ngram_count_arrays(Y, n, P)
    counts = np.zeros(size, dtype=np.int64)
    counts[codes] = vals
    return counts


def run_length_segments(Y: np.ndarray):
    """(person, purpose, length) arrays. Native or numpy."""
    Y = np.ascontiguousarray(Y, dtype=np.int64)
    N, T = Y.shape
    lib = _load()
    if lib is not None:
        cap = N * T
        # np.zeros, NOT np.empty: the kernel first-touches up to cap
        # entries, and in sandboxed containers anonymous-page write
        # faults on malloc'd (np.empty) memory can run ~100x slower
        # than on calloc'd (np.zeros) regions (measured 12.5 s vs
        # 0.12 s per 230 MB array) — the zeroed path rides THP.
        person = np.zeros(cap, dtype=np.int64)
        purpose = np.zeros(cap, dtype=np.int64)
        length = np.zeros(cap, dtype=np.int64)
        s = lib.run_length_segments(Y, N, T, person, purpose, length)
        return person[:s], purpose[:s], length[:s]
    from ananke_abm_tpu.models.gen_schedule.compare.utils import (
        segments_run_length,
    )

    return segments_run_length(Y)


def tod_counts(Y: np.ndarray, P: int) -> np.ndarray:
    """(T, P) occupancy counts. Native or numpy bincount."""
    Y = np.ascontiguousarray(Y, dtype=np.int64)
    _check_labels(Y, P)
    N, T = Y.shape
    lib = _load()
    if lib is not None:
        counts = np.zeros(T * P, dtype=np.int64)
        lib.tod_counts(Y, N, T, P, counts)
        return counts.reshape(T, P)
    flat = (np.arange(T)[None, :] * P + Y).ravel()
    return np.bincount(flat, minlength=T * P).reshape(T, P)


def ngram_start_hist_dense(Y: np.ndarray, n: int, P: int) -> np.ndarray:
    """(P^n, T-n+1) start-time histograms of every n-gram code."""
    Y = np.ascontiguousarray(Y, dtype=np.int64)
    _check_labels(Y, P)
    N, T = Y.shape
    Tn = T - n + 1
    lib = _load()
    if lib is not None:
        hist = np.zeros(P**n * Tn, dtype=np.int64)
        lib.ngram_start_hist(Y, N, T, n, P, hist)
        return hist.reshape(P**n, Tn)
    from ananke_abm_tpu.models.gen_schedule.compare.utils import (
        ngram_code_matrix,
    )

    codes = ngram_code_matrix(Y, n, P)
    hist = np.zeros((P**n, Tn), dtype=np.int64)
    t_idx = np.tile(np.arange(Tn), N)
    np.add.at(hist, (codes.ravel(), t_idx), 1)
    return hist


def rasterize_fill(person_row, nominal, bins, pid, n_persons, L):
    """Native monotone push-forward rasterization. Returns (n_persons, L)
    int64 or None when the native lib is unavailable (caller falls back to
    the numpy prefix-recurrence path)."""
    lib = _load()
    if lib is None:
        return None
    person_row = np.ascontiguousarray(person_row, dtype=np.int64)
    nominal = np.ascontiguousarray(nominal, dtype=np.int64)
    bins = np.ascontiguousarray(bins, dtype=np.int64)
    pid = np.ascontiguousarray(pid, dtype=np.int64)
    Y = np.zeros((n_persons, L), dtype=np.int64)
    lib.rasterize_fill(
        person_row, nominal, bins, pid, person_row.shape[0], L,
        Y.reshape(-1),
    )
    return Y
