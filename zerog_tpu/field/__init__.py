from .params import FR, FQ, FieldParams, batch_inv, bit_reverse
from .jfield import JField, jfr, jfq, NLIMB, LIMB_BITS
from .limbs import (
    to_limbs, from_limbs, ints_to_mont_limbs, mont_limbs_to_ints, ship_limbs,
)

__all__ = [
    "FR", "FQ", "FieldParams", "batch_inv", "bit_reverse",
    "JField", "jfr", "jfq", "NLIMB", "LIMB_BITS",
    "to_limbs", "from_limbs", "ints_to_mont_limbs", "mont_limbs_to_ints",
    "ship_limbs",
]
