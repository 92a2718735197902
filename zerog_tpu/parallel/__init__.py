from .mesh import make_mesh, shard_axis, AXIS
from .sharded_msm import (
    sharded_msm_device, ShardedWindowTable, msm_fixed_sharded,
)
from .sharded_ntt import FourStepNtt
from .sharded_domain import ShardedDomain

__all__ = [
    "make_mesh", "shard_axis", "AXIS", "sharded_msm_device",
    "ShardedWindowTable", "msm_fixed_sharded", "FourStepNtt", "ShardedDomain",
]
