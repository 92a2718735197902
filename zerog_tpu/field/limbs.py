"""Host <-> device conversion between Python ints and limb arrays.

The host keeps field elements as Python ints (arbitrary precision, exact); the
device keeps them as ``uint32[..., 16]`` little-endian 16-bit limbs (see
:mod:`zerog_tpu.field.jfield`). These converters are the only place where the
two representations meet. Conversion is vectorized over whole columns: one
object-array shift/mask per limb rather than a Python loop per element.
"""

from __future__ import annotations

import functools

import numpy as np

from .jfield import NLIMB, LIMB_BITS, MASK
from .params import FieldParams

__all__ = ["to_limbs", "from_limbs", "ints_to_mont_limbs", "mont_limbs_to_ints"]


def _native():
    from ..native import limbcodec

    return limbcodec


@functools.cache
def _mont_ctx(p: int):
    """(p_le32, -p^-1 mod 2^64, R^2 mod p) for the native REDC codec."""
    inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    r2 = pow(1 << 256, 2, p)
    return (p.to_bytes(32, "little"), inv, r2.to_bytes(32, "little"))


def to_limbs(values, params: FieldParams | None = None, mont: bool = False) -> np.ndarray:
    """Convert int / list of ints / object ndarray -> uint32[..., 16].

    If ``mont`` is set, values are converted to Montgomery form first
    (requires ``params``). Uses the native C codec (zerog_tpu.native) when
    available; falls back to the vectorized numpy-object path.
    """
    arr = np.asarray(values, dtype=object)
    native = _native()
    if native is not None and arr.ndim > 0 and arr.size:
        try:
            flat = arr.reshape(-1).tolist()
            out = np.empty((len(flat), NLIMB), dtype=np.uint32)
            ctx = _mont_ctx(params.p) if mont else None
            native.ints_to_limbs(flat, out, ctx)
            return out.reshape(arr.shape + (NLIMB,))
        except (OverflowError, TypeError, ValueError):
            pass  # negative/huge values: take the exact numpy path
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
    native = _native()
    if native is not None and shape != () and limbs.size:
        flat = np.ascontiguousarray(limbs.reshape(-1, NLIMB), dtype=np.uint32)
        ctx = _mont_ctx(params.p) if mont else None
        vals = native.limbs_to_ints(flat, flat.shape[0], ctx)
        return np.asarray(vals, dtype=object).reshape(shape)
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

