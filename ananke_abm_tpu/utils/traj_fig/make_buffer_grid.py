"""Trajectory CSV -> person x time-bin label grid (reference
utils/traj_fig/make_buffer_grid.py:23-73): 5-min bins over a 1800-min
(30 h) allocation horizon, final bin forced to Home. Vectorized via the
shared rasterizer core."""
from __future__ import annotations

import numpy as np
import pandas as pd

from ananke_abm_tpu.dataio.rasterize import rasterize_frame

BUFFER_HORIZON_MIN = 1800  # 30 h allocation horizon
DEFAULT_GRID_MIN = 5
HOME_NAME = "Home"


def make_buffer_grid(
    activities: pd.DataFrame | str,
    grid_min: int = DEFAULT_GRID_MIN,
    horizon_min: int = BUFFER_HORIZON_MIN,
):
    """Returns (grid (N, L) int, purpose_map, persids). Final bin is Home."""
    df = (
        pd.read_csv(activities) if isinstance(activities, str) else activities
    )
    if "startime" in df.columns and "starttime" not in df.columns:
        df = df.rename(columns={"startime": "starttime"})
    purposes = sorted(pd.unique(df["purpose"]).tolist())
    if HOME_NAME not in purposes:
        purposes.append(HOME_NAME)
        purposes = sorted(purposes)
    purpose_map = {p: i for i, p in enumerate(purposes)}
    Y, persids = rasterize_frame(df, purpose_map, grid_min, horizon_min)
    Y[:, -1] = purpose_map[HOME_NAME]  # forced Home in the final bin
    return Y, purpose_map, persids
