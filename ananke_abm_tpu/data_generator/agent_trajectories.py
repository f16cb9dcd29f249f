"""Synthetic agent zone-trajectory populations at scale — vectorized.

Scale-up of the two-persona mock world to N agents (BASELINE.json configs
2-5): each agent gets a home zone (residential-weighted), a work/education
anchor zone (job-weighted), profile-conditioned departure/return times, an
optional evening stop, and a (N, T) grid of zone ids over the day horizon
plus (N, F) person attributes. Pure numpy, O(N*T), generating 1M agents in
seconds for the pod-scale ladder.
"""
from __future__ import annotations

import numpy as np

from ananke_abm_tpu.data_generator.mock_world import (
    ZONES,
    adjacency_matrix,
    distance_matrix,
    zone_feature_matrix,
)


def generate_agent_population(
    n_agents: int,
    num_times: int = 48,
    seed: int = 0,
    num_zones: int | None = None,
):
    """Returns dict with times (T,), zone_ids (N, T) int32, person_feats
    (N, 8) f32, home_zone (N,), zone_features (Z, 7), adj (Z, Z),
    dist (Z, Z)."""
    rng = np.random.default_rng(seed)

    if num_zones is None or num_zones == len(ZONES):
        zf = zone_feature_matrix()
        adj = adjacency_matrix()
        dist = distance_matrix()
    else:
        zf, adj, dist = synthetic_zone_world(num_zones, seed)
    Z = zf.shape[0]

    pop_w = zf[:, 0] + 1e-3  # log-population column
    job_w = zf[:, 1] + 1e-3
    home = rng.choice(Z, size=n_agents, p=pop_w / pop_w.sum())
    work = rng.choice(Z, size=n_agents, p=job_w / job_w.sum())

    t_leave = np.clip(rng.normal(8.5, 1.2, n_agents), 5.0, 12.0)
    t_return = np.clip(rng.normal(17.5, 1.5, n_agents), 13.0, 22.0)
    t_return = np.maximum(t_return, t_leave + 1.0)

    has_evening = rng.random(n_agents) < 0.35
    evening_zone = rng.choice(Z, size=n_agents)
    t_evening_end = np.clip(
        t_return + rng.uniform(0.5, 2.5, n_agents), t_return + 0.25, 23.5
    )

    times = np.linspace(0.0, 24.0, num_times).astype(np.float32)
    tt = times[None, :]
    at_work = (tt >= t_leave[:, None]) & (tt < t_return[:, None])
    at_evening = (
        has_evening[:, None]
        & (tt >= t_return[:, None])
        & (tt < t_evening_end[:, None])
    )
    zone_ids = np.where(
        at_work,
        work[:, None],
        np.where(at_evening, evening_zone[:, None], home[:, None]),
    ).astype(np.int32)

    person_feats = np.stack(
        [
            np.clip(rng.normal(40, 12, n_agents), 18, 75) / 100.0,
            np.clip(rng.normal(55e3, 25e3, n_agents), 1e4, 2e5) / 1e5,
            rng.random(n_agents),  # flexibility
            (rng.random(n_agents) < 0.7).astype(np.float64),  # fulltime
            (rng.random(n_agents) < 0.55).astype(np.float64),  # car
            home / max(Z - 1, 1),
            work / max(Z - 1, 1),
            np.ones(n_agents),
        ],
        axis=-1,
    ).astype(np.float32)

    return {
        "times": times,
        "zone_ids": zone_ids,
        "person_feats": person_feats,
        "home_zone": home.astype(np.int32),
        "work_zone": work.astype(np.int32),
        "zone_features": zf,
        "adj": adj,
        "dist": dist,
    }


def synthetic_zone_world(num_zones: int, seed: int = 0):
    """Random spatial zone world at SA2-like scale (~500 zones): features
    (Z, 7), k-nearest-neighbour adjacency with self loops, distances."""
    rng = np.random.default_rng(seed + 1)
    coords = rng.uniform(0.0, 30.0, (num_zones, 2))
    pop = rng.lognormal(7.5, 1.0, num_zones)
    jobs = rng.lognormal(6.5, 1.5, num_zones)
    zf = np.stack(
        [
            np.log1p(pop) / 10.0,
            np.log1p(jobs) / 10.0,
            rng.random(num_zones),
            rng.random(num_zones),
            rng.random(num_zones),
            coords[:, 0] / 30.0,
            coords[:, 1] / 30.0,
        ],
        axis=-1,
    ).astype(np.float32)
    diff = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt((diff**2).sum(-1)).astype(np.float32)
    k = min(6, num_zones - 1)
    nn = np.argsort(dist, axis=1)[:, 1 : k + 1]
    adj = np.zeros((num_zones, num_zones), np.float32)
    rows = np.repeat(np.arange(num_zones), k)
    adj[rows, nn.ravel()] = 1.0
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    return zf, adj, dist
