"""Device-mesh parallelism layer (pjit/GSPMD + shard_map)."""
from ananke_abm_tpu.parallel.mesh import (
    make_mesh,
    named_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "named_sharding", "shard_batch"]
