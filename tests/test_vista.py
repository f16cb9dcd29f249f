"""VISTA cleaning pipeline on a synthetic raw-survey-shaped frame."""
import numpy as np
import pandas as pd
import pytest

from ananke_abm_tpu.dataio.rasterize import prepare_from_csv
from ananke_abm_tpu.dataio.vista import clean_vista_stops


def _raw_stops():
    rows = []

    def person(pid, stops, weighted=True, first_stopno=1):
        for i, (purp, orig, dest, start, arr, dur, trav) in enumerate(stops):
            rows.append(
                dict(
                    persid=pid, stopno=first_stopno + i, destpurp1=purp,
                    origplace1=orig, destplace1=dest, startime=start,
                    arrtime=arr, duration=dur, travtime=trav,
                    wdstopwgt_sa3=1.0 if weighted else np.nan,
                )
            )

    # good person: home-bound, 3 stops
    person("P1", [
        ("Work Related", "Accommodation", "Workplace", 480, 510, 480, 30),
        ("Buy Something", "Workplace", "Shops", 1000, 1015, 45, 15),
        ("At or Go Home", "Shops", "Accommodation", 1070, 1090, np.nan, 20),
    ])
    # not home-bound at end -> dropped
    person("P2", [
        ("Work Related", "Accommodation", "Workplace", 500, 530, 400, 30),
        ("Social", "Workplace", "Someplace", 960, 980, np.nan, 20),
    ])
    # unweighted -> dropped
    person("P3", [
        ("At or Go Home", "Accommodation", "Accommodation", 600, 620, np.nan, 20),
    ], weighted=False)
    # missing stopno 1 -> dropped
    person("P4", [
        ("At or Go Home", "Shops", "Accommodation", 700, 720, np.nan, 20),
    ], first_stopno=2)
    return pd.DataFrame(rows)


class TestCleanVista:
    def test_filters_and_contract(self):
        out = clean_vista_stops(_raw_stops())
        assert set(out["persid"]) == {"P1"}
        assert list(out.columns) == [
            "persid", "stopno", "purpose", "starttime", "total_duration",
        ]
        p1 = out[out.persid == "P1"].sort_values("stopno")
        # prepended home stop covers [0, first start)
        assert p1.iloc[0]["stopno"] == 0
        assert p1.iloc[0]["purpose"] == "Home"
        assert p1.iloc[0]["starttime"] == 0
        assert p1.iloc[0]["total_duration"] == 480
        # purposes grouped
        assert set(p1["purpose"]) <= {
            "Home", "Work", "Shopping", "Education", "Social",
            "Accompanying", "Other",
        }
        # last stop duration filled to day end: 1440-1090 + 20 travel
        last = p1.iloc[-1]
        assert last["purpose"] == "Home"
        assert last["total_duration"] == (1440 - 1090) + 20

    def test_feeds_rasterizer(self, tmp_path):
        out = clean_vista_stops(_raw_stops())
        csv = str(tmp_path / "acts.csv")
        out.to_csv(csv, index=False)
        path, meta = prepare_from_csv(csv, str(tmp_path / "g.npz"), grid_min=30)
        assert meta["N"] == 1
        Y = np.load(str(tmp_path / "g.npz"))["Y"]
        home = meta["purpose_map"]["Home"]
        assert Y[0, 0] == home and Y[0, -1] == home
