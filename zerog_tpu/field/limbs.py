"""Host <-> device conversion between Python ints and limb arrays.

The host keeps field elements as Python ints (arbitrary precision, exact); the
device keeps them as ``uint32[..., 16]`` little-endian 16-bit limbs (see
:mod:`zerog_tpu.field.jfield`). These converters are the only place where the
two representations meet. They are vectorized with numpy object arrays so that
whole witness columns convert in one call.
"""

from __future__ import annotations

import numpy as np

from .jfield import NLIMB, LIMB_BITS, MASK
from .params import FieldParams

__all__ = ["to_limbs", "from_limbs", "ints_to_mont_limbs", "mont_limbs_to_ints"]


def to_limbs(values, params: FieldParams | None = None, mont: bool = False) -> np.ndarray:
    """Convert int / list of ints / object ndarray -> uint32[..., 16].

    If ``mont`` is set, values are converted to Montgomery form first
    (requires ``params``).
    """
    arr = np.asarray(values, dtype=object)
    if mont:
        assert params is not None
        r = params.r_mont
        p = params.p
        arr = np.asarray(np.frompyfunc(lambda v: (int(v) * r) % p, 1, 1)(arr), dtype=object)
    out = np.empty(arr.shape + (NLIMB,), dtype=np.uint32)
    flat = arr.reshape(-1)
    out_flat = out.reshape(-1, NLIMB)
    for i, v in enumerate(flat):
        v = int(v)
        for j in range(NLIMB):
            out_flat[i, j] = (v >> (LIMB_BITS * j)) & MASK
    return out


def from_limbs(limbs, params: FieldParams | None = None, mont: bool = False) -> np.ndarray:
    """Convert uint32[..., 16] -> object ndarray of Python ints (or a scalar
    int for a single element). If ``mont``, converts out of Montgomery form."""
    limbs = np.asarray(limbs)
    shape = limbs.shape[:-1]
    flat = limbs.reshape(-1, NLIMB)
    out = np.empty((flat.shape[0],), dtype=object)
    for i in range(flat.shape[0]):
        v = 0
        for j in range(NLIMB - 1, -1, -1):
            v = (v << LIMB_BITS) | int(flat[i, j])
        out[i] = v
    if mont:
        assert params is not None
        rinv = pow(params.r_mont, -1, params.p)
        p = params.p
        out = np.frompyfunc(lambda v: (v * rinv) % p, 1, 1)(out)
    if shape == ():
        return out[0]
    return out.reshape(shape)


def ints_to_mont_limbs(values, params: FieldParams) -> np.ndarray:
    return to_limbs(values, params, mont=True)


def mont_limbs_to_ints(limbs, params: FieldParams) -> np.ndarray:
    return from_limbs(limbs, params, mont=True)
