"""Host <-> device conversion between Python ints and limb arrays.

The host keeps field elements as Python ints (arbitrary precision, exact); the
device keeps them as ``uint32[..., 16]`` little-endian 16-bit limbs (see
:mod:`zerog_tpu.field.jfield`). These converters are the only place where the
two representations meet. Conversion is vectorized over whole columns: one
object-array shift/mask per limb rather than a Python loop per element.
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
        arr = (arr * r) % p
        arr = np.asarray(arr, dtype=object)
    out = np.empty(arr.shape + (NLIMB,), dtype=np.uint32)
    if arr.ndim == 0:
        v = int(arr[()])
        for j in range(NLIMB):
            out[j] = (v >> (LIMB_BITS * j)) & MASK
        return out
    cur = arr
    for j in range(NLIMB):
        out[..., j] = (cur & MASK).astype(np.uint32)
        cur = cur >> LIMB_BITS
    return out


def from_limbs(limbs, params: FieldParams | None = None, mont: bool = False):
    """Convert uint32[..., 16] -> object ndarray of Python ints (or a scalar
    int for a single element). If ``mont``, converts out of Montgomery form."""
    limbs = np.asarray(limbs)
    shape = limbs.shape[:-1]
    acc = np.zeros(shape if shape else (), dtype=object)
    for j in range(NLIMB - 1, -1, -1):
        acc = (acc << LIMB_BITS) | limbs[..., j].astype(object)
    if mont:
        assert params is not None
        rinv = pow(params.r_mont, -1, params.p)
        acc = (acc * rinv) % params.p
    if shape == ():
        return int(acc[()]) if isinstance(acc, np.ndarray) else int(acc)
    return np.asarray(acc, dtype=object)


def ints_to_mont_limbs(values, params: FieldParams) -> np.ndarray:
    return to_limbs(values, params, mont=True)


def mont_limbs_to_ints(limbs, params: FieldParams):
    return from_limbs(limbs, params, mont=True)
