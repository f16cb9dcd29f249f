"""Mock-world CSV exporter (reference data_generator/generate_mock_csvs.py:
40-352): persona schedules -> periods.csv (stay/travel runs), snaps.csv
(period endpoints, anchors first/last), segments.csv (travel legs with
origin/destination), zones.csv, dist_mat.csv, persons.csv, id_maps.json —
the trajectory-model CSV family consumed by mode_sep/latent_ode."""
from __future__ import annotations

import json
import os

import pandas as pd

from ananke_abm_tpu.data_generator.mock_world import (
    ZONES,
    Persona,
    distance_matrix,
    get_persona,
    zone_names,
)

TRAVEL_GAP_H = 0.5  # travel time inserted between consecutive stays


def build_person_periods(persona: Persona) -> pd.DataFrame:
    """Stay/travel period rows from the persona's event list."""
    names = zone_names()
    rows = []
    ev = persona.events
    for i, (t, z, purpose, mode, anchor) in enumerate(ev):
        if i + 1 < len(ev):
            t_next, z_next = ev[i + 1][0], ev[i + 1][1]
        else:
            t_next, z_next = 24.0, z
        if z_next != z:
            travel_start = max(t, t_next - TRAVEL_GAP_H)
            rows.append(
                dict(person_id=persona.person_id, start_time=t,
                     end_time=travel_start, type="stay",
                     location=names[z - 1], purpose=purpose, mode="stay")
            )
            rows.append(
                dict(person_id=persona.person_id, start_time=travel_start,
                     end_time=t_next, type="travel", location="travel",
                     purpose="travel", mode=ev[i + 1][3])
            )
        else:
            rows.append(
                dict(person_id=persona.person_id, start_time=t,
                     end_time=t_next, type="stay", location=names[z - 1],
                     purpose=purpose, mode="stay")
            )
    df = pd.DataFrame(rows)
    # merge zero/negative-length periods defensively
    return df[df.end_time > df.start_time].reset_index(drop=True)


def build_snaps_from_periods(periods: pd.DataFrame) -> pd.DataFrame:
    """Stay endpoints -> snaps with first/last marked as anchors."""
    rows = []
    for pid, g in periods[periods.type == "stay"].groupby("person_id"):
        g = g.sort_values("start_time")
        recs = []
        for r in g.itertuples():
            recs.append((r.start_time, r.location, r.purpose))
            recs.append((r.end_time, r.location, r.purpose))
        # dedupe consecutive same-time records
        seen = []
        for t, loc, purp in recs:
            if seen and abs(seen[-1][0] - t) < 1e-9 and seen[-1][1] == loc:
                continue
            seen.append((t, loc, purp))
        for i, (t, loc, purp) in enumerate(seen):
            rows.append(
                dict(person_id=pid, timestamp=t, location=loc,
                     purpose=purp, anchor=int(i == 0 or i == len(seen) - 1))
            )
    return pd.DataFrame(rows)


def build_segments_from_periods(periods: pd.DataFrame) -> pd.DataFrame:
    """Travel rows with origin/destination stay locations."""
    rows = []
    for pid, g in periods.groupby("person_id"):
        g = g.sort_values("start_time").reset_index(drop=True)
        for i, r in g.iterrows():
            if r["type"] != "travel":
                continue
            origin = g.loc[i - 1, "location"] if i > 0 else None
            dest = g.loc[i + 1, "location"] if i + 1 < len(g) else None
            rows.append(
                dict(person_id=pid, start_time=r["start_time"],
                     end_time=r["end_time"], mode=r["mode"],
                     origin=origin, destination=dest)
            )
    return pd.DataFrame(rows)


def write_mock_world_csvs(outdir: str, person_ids=(1, 2)) -> dict:
    """Write the full CSV family; returns the path dict."""
    os.makedirs(outdir, exist_ok=True)
    personas = [get_persona(p) for p in person_ids]

    periods = pd.concat(
        [build_person_periods(p) for p in personas], ignore_index=True
    )
    snaps = build_snaps_from_periods(periods)
    segments = build_segments_from_periods(periods)

    names = zone_names()
    zrows = []
    for z in range(1, len(ZONES) + 1):
        name, ztype, pop, jobs, retail, transit, attract, (x, y) = ZONES[z]
        zrows.append(
            dict(zone_id=z, name=name, type=ztype, x_coord=x, y_coord=y,
                 population=pop, job_opportunities=jobs,
                 retail_accessibility=retail,
                 transit_accessibility=transit, attractiveness=attract)
        )
    zones = pd.DataFrame(zrows)

    dm = distance_matrix()
    dist = pd.DataFrame(dm, columns=names)
    dist.insert(0, "loc_id", names)

    persons = pd.DataFrame(
        [
            dict(person_id=p.person_id, name=p.name, age=p.age,
                 income=p.income, home_zone_id=p.home_zone,
                 work_zone_id=p.work_zone)
            for p in personas
        ]
    )

    paths = {}
    for fname, df in (
        ("periods.csv", periods), ("snaps.csv", snaps),
        ("segments.csv", segments), ("zones.csv", zones),
        ("dist_mat.csv", dist), ("persons.csv", persons),
    ):
        p = os.path.join(outdir, fname)
        df.to_csv(p, index=False)
        paths[fname] = p

    id_maps = {
        "zone_name_to_index": {n: i for i, n in enumerate(names)},
        "zone_id_to_index": {str(z): z - 1 for z in range(1, len(ZONES) + 1)},
    }
    p = os.path.join(outdir, "id_maps.json")
    with open(p, "w", encoding="utf-8") as f:
        json.dump(id_maps, f, indent=2)
    paths["id_maps.json"] = p
    return paths
