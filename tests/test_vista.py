"""VISTA cleaning pipeline on a synthetic raw-survey-shaped frame.

Covers the full notebook contract (see dataio/vista.py docstring):
weight/stopno/home-bound filters, purpose grouping, day-end fill,
transit folding, duplicate merging, the 1440-minute day-sum filter,
full-day row drops, and Home-bounded sequences.
"""
import numpy as np
import pandas as pd
import pytest

from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
from ananke_abm_tpu.dataio.vista import (
    clean_vista_stops,
    filter_vista_persons,
    sample_population,
)


def _raw_stops():
    rows = []

    def person(pid, stops, weighted=True, first_stopno=1):
        for i, (purp, orig, dest, start, arr, dur, trav) in enumerate(stops):
            rows.append(
                dict(
                    persid=pid, hhid=f"H{pid}", stopno=first_stopno + i,
                    destpurp1=purp, origplace1=orig, destplace1=dest,
                    startime=start, arrtime=arr, duration=dur, travtime=trav,
                    wdstopwgt_sa3=1.0 if weighted else np.nan,
                )
            )

    # P1: good person; prepended Home [0,480) + stops tile 1440 exactly.
    person("P1", [
        ("Work Related", "Accommodation", "Workplace", 480, 510, 450, 30),
        ("Buy Something", "Workplace", "Shops", 960, 975, 45, 15),
        ("At or Go Home", "Shops", "Accommodation", 1020, 1040, np.nan, 20),
    ])
    # P2: not home-bound at end -> dropped
    person("P2", [
        ("Work Related", "Accommodation", "Workplace", 500, 530, 400, 30),
        ("Social", "Workplace", "Someplace", 960, 980, np.nan, 20),
    ])
    # P3: unweighted -> dropped
    person("P3", [
        ("At or Go Home", "Accommodation", "Accommodation", 600, 620, np.nan, 20),
    ], weighted=False)
    # P4: missing stopno 1 -> dropped
    person("P4", [
        ("At or Go Home", "Shops", "Accommodation", 700, 720, np.nan, 20),
    ], first_stopno=2)
    # P5: transit block between Work and Shopping; the two Change Mode
    # stops fold into Shopping (start moves back to 840, duration absorbs
    # the 60-minute block).
    person("P5", [
        ("Work Related", "Accommodation", "Workplace", 480, 500, 340, 20),
        ("Change Mode", "Workplace", "Stop", 840, 850, 10, 10),
        ("Change Mode", "Stop", "Stop2", 860, 870, 20, 10),
        ("Buy Something", "Stop2", "Shops", 890, 900, 50, 10),
        ("At or Go Home", "Shops", "Accommodation", 950, 970, np.nan, 20),
    ])
    # P6: consecutive Work stops merge into one activity.
    person("P6", [
        ("Work Related", "Accommodation", "Workplace", 420, 450, 270, 30),
        ("Work Related", "Workplace", "Workplace2", 720, 730, 230, 10),
        ("At or Go Home", "Workplace2", "Accommodation", 960, 980, np.nan, 20),
    ])
    # P7: durations don't tile 1440 (gap 960->1100) -> dropped
    person("P7", [
        ("Work Related", "Accommodation", "Workplace", 480, 510, 450, 30),
        ("At or Go Home", "Workplace", "Accommodation", 1100, 1120, np.nan, 20),
    ])
    # P8: single all-day Home row -> 1440-duration row dropped -> person gone
    person("P8", [
        ("Social", "Accommodation", "Someplace", 0, 0, 0, 0),
        ("At or Go Home", "Someplace", "Accommodation", 0, 0, np.nan, 0),
    ])
    return pd.DataFrame(rows)


class TestCleanVista:
    def test_filters_and_contract(self):
        out = clean_vista_stops(_raw_stops())
        assert set(out["persid"]) == {"P1", "P5", "P6"}
        assert list(out.columns) == [
            "persid", "hhid", "stopno", "purpose", "startime",
            "total_duration",
        ]
        p1 = out[out.persid == "P1"].sort_values("stopno")
        # prepended home stop covers [0, first start)
        assert p1.iloc[0]["stopno"] == 0
        assert p1.iloc[0]["purpose"] == "Home"
        assert p1.iloc[0]["startime"] == 0
        assert p1.iloc[0]["total_duration"] == 480
        # purposes grouped; Transit never survives folding
        assert set(out["purpose"]) <= {
            "Home", "Work", "Shopping", "Education", "Social",
            "Accompanying", "Other",
        }
        # last stop duration filled to day end: 1440-1040 + 20 travel
        last = p1.iloc[-1]
        assert last["purpose"] == "Home"
        assert last["total_duration"] == (1440 - 1040) + 20
        # every surviving day tiles exactly 1440 minutes
        sums = out.groupby("persid")["total_duration"].sum()
        assert (sums == 1440).all()
        # stopno contiguous from 0
        for _, g in out.groupby("persid"):
            assert list(g.sort_values("stopno")["stopno"]) == list(range(len(g)))

    def test_transit_folds_into_following_activity(self):
        out = clean_vista_stops(_raw_stops())
        p5 = out[out.persid == "P5"].sort_values("stopno").reset_index(drop=True)
        assert list(p5["purpose"]) == ["Home", "Work", "Shopping", "Home"]
        shop = p5[p5.purpose == "Shopping"].iloc[0]
        # start moved back to the first Change Mode start (840); duration
        # absorbed the 20+30 transit minutes plus its own 60
        assert shop["startime"] == 840
        assert shop["total_duration"] == 60 + 20 + 30

    def test_consecutive_duplicates_merge(self):
        out = clean_vista_stops(_raw_stops())
        p6 = out[out.persid == "P6"].sort_values("stopno").reset_index(drop=True)
        assert list(p6["purpose"]) == ["Home", "Work", "Home"]
        work = p6[p6.purpose == "Work"].iloc[0]
        assert work["startime"] == 420
        assert work["total_duration"] == 300 + 240

    def test_day_sum_filter_drops_gappy_person(self):
        out = clean_vista_stops(_raw_stops())
        assert "P7" not in set(out["persid"])

    def test_full_day_row_dropped_with_person(self):
        out = clean_vista_stops(_raw_stops())
        assert "P8" not in set(out["persid"])

    def test_persons_and_sampling(self):
        acts = clean_vista_stops(_raw_stops())
        persons = pd.DataFrame(
            {
                "persid": [f"P{i}" for i in range(1, 9)],
                "hhid": [f"H{i}" for i in range(1, 9)],
                "age": np.arange(8) + 20,
                "sex": ["F", "M"] * 4,
                "persinc": np.arange(8) * 1000,
                "extra_col": 0,
            }
        )
        sub = filter_vista_persons(persons, acts)
        assert set(sub["persid"]) == {"P1", "P5", "P6"}
        assert "extra_col" not in sub.columns
        sp, sa = sample_population(sub, acts, frac=0.5, random_state=42)
        assert set(sa["persid"]) == set(sp["persid"])
        assert len(sp) == round(0.5 * len(sub))

    def test_feeds_rasterizer(self, tmp_path):
        out = clean_vista_stops(_raw_stops())
        csv = str(tmp_path / "acts.csv")
        out.to_csv(csv, index=False)
        path, meta = prepare_from_csv(csv, str(tmp_path / "g.npz"), grid_min=30)
        assert meta["N"] == 3
        Y = np.load(str(tmp_path / "g.npz"))["Y"]
        home = meta["purpose_map"]["Home"]
        assert (Y[:, 0] == home).all() and (Y[:, -1] == home).all()
