"""Mock-data loader (reference data_generator/load_data.py:13-150): persona
timelines -> trajectories dict + people/zones DataFrames + adjacency with
self loops."""
from __future__ import annotations

import pandas as pd

from ananke_abm_tpu.data_generator.mock_world import (
    ZONES,
    adjacency_matrix,
    distance_matrix,
    get_persona,
    persona_timeline,
    zone_feature_matrix,
    zone_names,
)


def load_mock_data(person_ids=(1, 2)):
    """Returns dict with trajectories {pid: timeline}, people_df, zones_df,
    adjacency (self-looped), distance matrix, zone features."""
    trajectories = {pid: persona_timeline(get_persona(pid)) for pid in person_ids}
    people_df = pd.DataFrame(
        [
            dict(person_id=p.person_id, name=p.name, age=p.age,
                 income=p.income, home_zone=p.home_zone,
                 work_zone=p.work_zone, employment=p.employment,
                 commute_mode=p.commute_mode, flexibility=p.flexibility)
            for p in (get_persona(i) for i in person_ids)
        ]
    )
    zones_df = pd.DataFrame(
        [
            dict(zone_id=z, name=ZONES[z][0], type=ZONES[z][1],
                 population=ZONES[z][2], job_opportunities=ZONES[z][3],
                 retail_accessibility=ZONES[z][4],
                 transit_accessibility=ZONES[z][5],
                 attractiveness=ZONES[z][6],
                 x_coord=ZONES[z][7][0], y_coord=ZONES[z][7][1])
            for z in range(1, len(ZONES) + 1)
        ]
    )
    return {
        "trajectories": trajectories,
        "people": people_df,
        "zones": zones_df,
        "adjacency": adjacency_matrix(self_loops=True),
        "distance_matrix": distance_matrix(),
        "zone_features": zone_feature_matrix(),
        "zone_names": zone_names(),
    }
