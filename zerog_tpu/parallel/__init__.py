from .mesh import make_mesh, shard_axis, AXIS
from .sharded_msm import sharded_msm_device
from .sharded_ntt import FourStepNtt

__all__ = ["make_mesh", "shard_axis", "AXIS", "sharded_msm_device", "FourStepNtt"]
