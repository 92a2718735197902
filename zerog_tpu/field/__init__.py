from .params import FR, FQ, FieldParams, batch_inv, bit_reverse
from .jfield import JField, jfr, jfq, NLIMB, LIMB_BITS, shift_fill
from .limbs import to_limbs, from_limbs, ints_to_mont_limbs, mont_limbs_to_ints

__all__ = [
    "FR", "FQ", "FieldParams", "batch_inv", "bit_reverse",
    "JField", "jfr", "jfq", "NLIMB", "LIMB_BITS", "shift_fill",
    "to_limbs", "from_limbs", "ints_to_mont_limbs", "mont_limbs_to_ints",
]
