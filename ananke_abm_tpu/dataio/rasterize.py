"""Activities CSV -> (N, L) purpose-id grid. Fully vectorized host pipeline.

Behavioral contract from the reference rasterizer
(src/ananke_abm/models/gen_schedule/dataio/rasterize.py:15-196):

- purpose map = sorted unique purpose names -> contiguous ids.
- per person (activities ordered by ``stopno``): every positive-duration
  activity gets >= ceil(duration/grid) bins starting at
  ``max(starttime // grid, end of previous activity)`` (monotone
  push-forward so short activities each keep a bin), truncated at the
  horizon; unfilled bins default to purpose id 0.
- home-bound post-process: days must end at Home — shift a trailing
  non-home segment back one bin when the preceding Home run can spare it,
  else force the final bin to Home.
- hard error if any person is all-Home all day.
- artifacts: ``<out>.npz{Y}``, ``<out>_meta.json``, ``<out>_tod.npy``,
  ``<out>_purpose_map.json``, ``<out>_splits.npz{train_idx, val_idx}``.

The reference iterates pandas rows per activity (O(N·activities) Python);
here bin assignment is a closed-form prefix recurrence

    start_i = cumbins_i + running_max_j<=i (nominal_j - cumbins_j)

computed with grouped cummax + one flat scatter — O(total activities) in
C, scaling to 1M-agent populations (SURVEY.md §7.3 hard-part 7).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

PURPOSE_COL = "purpose"
HOME_NAME = "Home"


def build_purpose_map(purposes) -> dict:
    uniq = sorted(pd.unique(np.asarray(purposes)).tolist())
    return {p: i for i, p in enumerate(uniq)}


def rasterize_frame(
    df: pd.DataFrame, purpose_map: dict, grid_min: int, horizon_min: int = 1440
):
    """Vectorized rasterization of the whole activities frame.

    Args:
        df: columns persid, stopno, purpose, starttime (min), total_duration
            (min). One row per activity.
        purpose_map: {purpose_name: id}.
        grid_min: minutes per bin.
        horizon_min: day horizon in minutes.

    Returns:
        (Y, persids): Y (N, L) int64 grid, persids list of person ids in
        row order.
    """
    L = horizon_min // grid_min
    df = df.sort_values(["persid", "stopno"], kind="stable")

    dur = df["total_duration"].to_numpy()
    keep = dur > 0
    df = df.loc[keep]
    dur = dur[keep].astype(np.int64)

    persid = df["persid"].to_numpy()
    uniq_pers, person_row = np.unique(persid, return_inverse=True)
    n_persons = len(uniq_pers)

    start = np.maximum(df["starttime"].to_numpy().astype(np.int64), 0)
    nominal = start // grid_min
    bins = np.maximum(1, -(-dur // grid_min))  # ceil

    pid = df[PURPOSE_COL].map(purpose_map).to_numpy(dtype=np.int64)

    # native fast path: one linear C pass over the sorted activities
    # (numpy prefix-recurrence fallback below; outputs are identical —
    # tests cross-check the two)
    from ananke_abm_tpu.ops import native as _native

    Y_native = _native.rasterize_fill(
        person_row, nominal, bins, pid, n_persons, L
    )
    if Y_native is not None:
        home_idx = purpose_map.get(HOME_NAME, 0)
        Y_native = ensure_homebound(Y_native, home_idx, copy=False)
        return Y_native, uniq_pers.tolist()

    # prefix recurrence per person: start_i = max(nominal_i, end_{i-1})
    # end_i = start_i + bins_i (pre-clip). Closed form via grouped cummax.
    s = pd.Series(persid)
    cumbins = pd.Series(bins).groupby(s, sort=False).cumsum().to_numpy() - bins
    key = nominal - cumbins
    runmax = pd.Series(key).groupby(s, sort=False).cummax().to_numpy()
    a = cumbins + runmax
    b = a + bins

    # horizon truncation: clip; activities fully past the horizon vanish
    a_c = np.minimum(a, L)
    b_c = np.minimum(b, L)
    lengths = b_c - a_c
    valid = lengths > 0

    Y = np.zeros((n_persons, L), dtype=np.int64)
    if valid.any():
        av, lv, rows, pv = a_c[valid], lengths[valid], person_row[valid], pid[valid]
        total = int(lv.sum())
        starts_flat = rows * L + av
        offsets = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(lv)[:-1]]), lv
        )
        Y.reshape(-1)[np.repeat(starts_flat, lv) + offsets] = np.repeat(pv, lv)

    home_idx = purpose_map.get(HOME_NAME, 0)
    Y = ensure_homebound(Y, home_idx, copy=False)
    return Y, uniq_pers.tolist()


def ensure_homebound(
    Y: np.ndarray, home_idx: int, buffer_size: int = 1, copy: bool = True
):
    """Vectorized home-bound post-process (reference
    _ensure_homebound_postprocess, rasterize.py:69-135).

    For rows not ending at Home: locate the trailing non-home run; if the
    Home run immediately before it is longer than ``buffer_size``, shift
    the trailing run back by ``buffer_size`` bins and fill the end with
    Home; otherwise force the final ``buffer_size`` bins to Home.
    ``copy=False`` mutates Y in place (used on freshly built grids — at
    1M x 288 the defensive copy alone is 2+ GB of traffic).
    """
    if copy:
        Y = Y.copy()
    N, L = Y.shape
    bad = Y[:, -1] != home_idx
    if not bad.any():
        return Y

    rows = np.nonzero(bad)[0]
    sub = Y[rows]  # (M, L)
    is_home = sub == home_idx

    has_home = is_home.any(axis=1)
    # last position of home (only meaningful where has_home)
    rev_first = np.argmax(is_home[:, ::-1], axis=1)
    last_home = L - 1 - rev_first

    # length of the home run ending at last_home: scan back for non-home
    col = np.arange(L)
    before_mask = (~is_home) & (col[None, :] <= last_home[:, None])
    any_nonhome_before = before_mask.any(axis=1)
    # last non-home position at-or-before last_home
    rev_nb = np.argmax(before_mask[:, ::-1], axis=1)
    last_nonhome_before = np.where(any_nonhome_before, L - 1 - rev_nb, -1)
    homerun_len = last_home - last_nonhome_before

    shiftable = has_home & (homerun_len > buffer_size)

    # shifted variant: every col >= last_home takes the value of col+shift
    shift = buffer_size
    src = np.minimum(col[None, :] + shift, L - 1)
    taken = np.take_along_axis(sub, src, axis=1)
    shifted = np.where(col[None, :] >= last_home[:, None], taken, sub)
    shifted[:, L - buffer_size :] = home_idx

    forced = sub.copy()
    forced[:, L - buffer_size :] = home_idx

    out = np.where(shiftable[:, None], shifted, forced)
    Y[rows] = out
    return Y


def compute_empirical_tod(Y: np.ndarray, P: int) -> np.ndarray:
    """(L, P) empirical time-of-day marginal, Pr(y_t = p), via bincount."""
    N, L = Y.shape
    flat = (np.arange(L)[None, :] * P + Y).ravel()
    counts = np.bincount(flat, minlength=L * P).reshape(L, P)
    return counts.astype(np.float64) / N


def prepare_from_csv(
    csv_path: str,
    out_path: str,
    grid_min: int = 5,
    horizon_min: int = 1440,
    val_frac: float = 0.1,
    seed: int = 42,
):
    """Full prepare pipeline: CSV -> grid npz + splits + meta + tod.

    Artifact contract mirrors the reference (rasterize.py:146-196) with one
    deliberate change: splits are stored as ``<out>_splits.npz`` holding
    ``train_idx``/``val_idx`` integer arrays (torch-free) instead of
    pickled torch datasets.
    """
    df = pd.read_csv(csv_path)
    if "startime" in df.columns and "starttime" not in df.columns:
        df = df.rename(columns={"startime": "starttime"})

    purpose_map = build_purpose_map(df[PURPOSE_COL])
    inv_map = {v: k for k, v in purpose_map.items()}
    L = horizon_min // grid_min

    Y, persids = rasterize_frame(df, purpose_map, grid_min, horizon_min)

    home_idx = purpose_map.get(HOME_NAME, 0)
    all_home = (Y == home_idx).all(axis=1)
    n_all_home = int(all_home.sum())
    if n_all_home:
        raise AssertionError(
            f"{n_all_home} persons have all activities as Home"
        )

    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(out_path, Y=Y.astype(np.int64))

    # seeded split on row indices
    rng = np.random.default_rng(seed)
    perm = rng.permutation(Y.shape[0])
    n_val = int(round(val_frac * Y.shape[0]))
    val_idx = np.sort(perm[:n_val])
    train_idx = np.sort(perm[n_val:])
    np.savez(
        out_path.replace(".npz", "_splits.npz"),
        train_idx=train_idx,
        val_idx=val_idx,
    )

    meta = {
        "grid_min": grid_min,
        "horizon_min": horizon_min,
        "L": int(L),
        "purpose_map": purpose_map,
        "inv_purpose_map": inv_map,
        "N": int(Y.shape[0]),
    }
    with open(out_path.replace(".npz", "_meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)

    np.save(
        out_path.replace(".npz", "_tod.npy"),
        compute_empirical_tod(Y, P=len(purpose_map)),
    )
    with open(
        out_path.replace(".npz", "_purpose_map.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(purpose_map, f, indent=2)
    return out_path, meta
