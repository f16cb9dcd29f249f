"""Mesh construction + sharding helpers.

The scaling recipe (SURVEY.md §2.7/§5): a 2-D logical mesh
(``agents`` x ``zones``) — agents are the data axis (populations up to 1M
rows), zones the model axis (zone-embedding tables and the (N, Z)
attention/score matrices shard their Z dimension). Code states global
semantics; ``NamedSharding`` annotations + GSPMD insert the ICI
collectives (all_gather/psum/reduce_scatter) — there is no hand-written
NCCL-style communication anywhere.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AGENT_AXIS = "agents"
ZONE_AXIS = "zones"


def make_mesh(n_devices: int | None = None, zone_parallel: int | None = None) -> Mesh:
    """Build an (agents, zones) mesh over the first ``n_devices`` devices.

    ``zone_parallel`` devices go to the zone (model) axis; the rest to the
    agent (data) axis. Default: 2-way zone parallelism when >= 4 devices.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if zone_parallel is None:
        zone_parallel = 2 if n_devices >= 4 and n_devices % 2 == 0 else 1
    if n_devices % zone_parallel:
        raise ValueError(
            f"n_devices={n_devices} not divisible by zone_parallel={zone_parallel}"
        )
    grid = np.array(devices).reshape(n_devices // zone_parallel, zone_parallel)
    return Mesh(grid, (AGENT_AXIS, ZONE_AXIS))


def named_sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def shard_batch(mesh: Mesh, tree, axis_name: str = AGENT_AXIS):
    """Device-put every leaf with its leading dim sharded over ``axis_name``."""
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
