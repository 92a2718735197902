from . import bn254
from .jpoints import (
    jac_add, jac_double, jac_from_affine, jac_infinity,
    points_to_device, points_from_device,
)
from .pippenger import msm, fixed_base_expand
from .srs import Srs

__all__ = [
    "bn254", "jac_add", "jac_double", "jac_from_affine", "jac_infinity",
    "points_to_device", "points_from_device", "msm", "fixed_base_expand", "Srs",
]
