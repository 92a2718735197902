"""Vectorized prime-field arithmetic for TPU (JAX/XLA).

Replaces the role of `halo2curves`' Montgomery field backends (consumed by the
reference at src/wnn.rs:18 and throughout src/gadgets/) with a TPU-native
formulation:

- A field element is a little-endian array of 16 limbs x 16 bits, stored in a
  ``uint32[..., 16]`` array. 16-bit limbs are chosen because the TPU VPU has
  32-bit integer lanes but no 64-bit multiply: a 16x16-bit product fits in a
  single uint32 lane, and a full 16x16-limb schoolbook column sum is bounded by
  32 * (2^16 - 1) < 2^21, so accumulation never overflows.
- Multiplication is *separated Montgomery* (R = 2^256):
      T = a * b                      (512-bit product, limb convolution)
      m = (T mod R) * (-p^{-1}) mod R   (low half convolution)
      res = (T + m * p) / R          (convolution + exact shift)
  followed by one conditional subtraction. Every step is a static-shape
  vectorized op over the batch — no data-dependent control flow, so the whole
  thing fuses under ``jax.jit`` and maps onto the VPU.
- Values are kept in Montgomery form on device; conversion happens at the host
  boundary (:func:`to_limbs` / :func:`from_limbs` in
  :mod:`zerog_tpu.field.limbs`).

All functions are shape-polymorphic over leading batch dimensions and are pure
(jit/vmap/shard_map friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import FieldParams, FR, FQ

__all__ = [
    "NLIMB", "LIMB_BITS", "JField", "jfr", "jfq",
]

NLIMB = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs_np(x: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMB)], dtype=np.uint32)


def _normalize(cols, ncols: int):
    """Carry-propagate uint32 columns (each < 2^21-ish) into canonical 16-bit
    limbs. Returns (limbs uint32[..., ncols], carry).

    Implemented as a `lax.scan` over the limb axis so the HLO stays tiny —
    these kernels sit inside point-add scan bodies where unrolled carry
    chains would blow up compile time."""
    m = cols.shape[-1]
    cols_t = jnp.moveaxis(cols, -1, 0)  # [m, ...]
    if m < ncols:
        pad = jnp.zeros((ncols - m,) + cols_t.shape[1:], dtype=cols_t.dtype)
        cols_t = jnp.concatenate([cols_t, pad], axis=0)
    else:
        cols_t = cols_t[:ncols]

    def step(carry, row):
        v = row + carry
        return v >> LIMB_BITS, v & MASK

    carry, outs = jax.lax.scan(step, jnp.zeros_like(cols_t[0]), cols_t)
    return jnp.moveaxis(outs, 0, -1), carry


def _mul_wide(a, b):
    """Full 512-bit product of two 256-bit numbers in 16-bit limbs.
    a, b: uint32[..., 16] -> uint32[..., 32] canonical limbs.

    Schoolbox accumulation as a scan over `a`'s limbs with a dynamic-slice
    read-modify-write (column sums stay < 2^21, no overflow)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (NLIMB,))
    b = jnp.broadcast_to(b, shape + (NLIMB,))
    cols = jnp.zeros(shape + (2 * NLIMB + 1,), dtype=jnp.uint32)
    a_t = jnp.moveaxis(a, -1, 0)  # [16, ...]

    def step(cols, xs):
        ai, i = xs
        prod = ai[..., None] * b  # [..., 16]
        contrib = jnp.concatenate(
            [prod & MASK, jnp.zeros_like(prod[..., :1])], axis=-1
        )
        contrib = contrib.at[..., 1:].add(prod >> LIMB_BITS)  # [..., 17]
        seg = jax.lax.dynamic_slice_in_dim(cols, i, NLIMB + 1, axis=-1)
        cols = jax.lax.dynamic_update_slice_in_dim(cols, seg + contrib, i, axis=-1)
        return cols, None

    cols, _ = jax.lax.scan(step, cols, (a_t, jnp.arange(NLIMB)))
    limbs, _ = _normalize(cols, 2 * NLIMB)
    return limbs


def _mul_low(a, b_const):
    """Low 256 bits of a * b (mod 2^256). b_const: uint32[16] constant."""
    b = jnp.broadcast_to(jnp.asarray(b_const), a.shape[:-1] + (NLIMB,))
    return _mul_wide(a, b)[..., :NLIMB]


class JField:
    """Device arithmetic for one prime field, in Montgomery form."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.p_limbs = _int_to_limbs_np(params.p)
        # 2^256 - p, for complement-based subtraction
        self.negp_limbs = _int_to_limbs_np((1 << 256) - params.p)
        # -p^{-1} mod 2^256 (full width; only the low product is used)
        self.n_prime = _int_to_limbs_np((-pow(params.p, -1, 1 << 256)) % (1 << 256))
        self.r2_limbs = _int_to_limbs_np(params.to_mont(params.r_mont))  # R^2 in "plain" limbs
        self.one_mont = _int_to_limbs_np(params.r_mont)  # 1 in Montgomery form
        self.zero = _int_to_limbs_np(0)

    # -- helpers -----------------------------------------------------------
    def const(self, x: int, mont: bool = True):
        """A host int as a device constant (Montgomery form by default)."""
        v = self.params.to_mont(x % self.params.p) if mont else (x % self.params.p)
        return jnp.asarray(_int_to_limbs_np(v))

    def _cond_sub_p(self, r):
        # d = r - p via addition of the two's complement; keep r if it would
        # underflow (no carry out), else keep d.
        cols = r + self.negp_limbs[None]
        d, carry = _normalize(cols, NLIMB)
        ge_p = (carry > 0)[..., None]
        return jnp.where(ge_p, d, r)

    # -- ring ops ----------------------------------------------------------
    def add(self, a, b):
        s, _ = _normalize(a + b, NLIMB)  # a + b < 2p < 2^255: no carry out
        return self._cond_sub_p(s)

    def sub(self, a, b):
        # a - b = a + p + (2^256 - b) mod 2^256; all columns non-negative.
        notb = b ^ MASK
        cols = a + self.p_limbs[None] + notb
        cols = cols.at[..., 0].add(1)
        d, _ = _normalize(cols, NLIMB)  # drop the 2^256 carry
        return self._cond_sub_p(d)

    def neg(self, a):
        zero = jnp.zeros_like(a)
        res = self.sub(zero, a)
        # -0 must stay 0 (sub gives p - 0 -> cond_sub -> 0, so this is already
        # fine; kept explicit for clarity)
        return res

    def mul(self, a, b):
        """Montgomery product: (a * b * R^{-1}) mod p."""
        t = _mul_wide(a, b)
        m = _mul_low(t[..., :NLIMB], self.n_prime)
        mp = _mul_wide(m, self.p_limbs)
        # T + m*p: 33 columns; low 16 limbs are exactly 0 after carries.
        cols = jnp.zeros(t.shape[:-1] + (2 * NLIMB + 1,), dtype=jnp.uint32)
        cols = cols.at[..., : 2 * NLIMB].set(t + mp)
        s, _ = _normalize(cols, 2 * NLIMB + 1)
        res = s[..., NLIMB : 2 * NLIMB + 1]
        # (T + m*p)/R < 2p < 2^255, so limb 16 of the high half is 0.
        return self._cond_sub_p(res[..., :NLIMB])

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, jnp.asarray(self.r2_limbs))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    def select(self, cond_bool, a, b):
        """cond_bool: bool[...] -> limbwise select."""
        return jnp.where(cond_bool[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def pow_const(self, a, e: int):
        """a^e for a small *static* exponent, via square-and-multiply unrolled
        at trace time. Use only for tiny exponents (e.g. 3, 5)."""
        assert e >= 0
        result = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        base = a
        while e:
            if e & 1:
                result = self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result

    # -- reductions --------------------------------------------------------
    def sum(self, a, axis: int = 0):
        """Modular sum along an axis via pairwise (log-depth) reduction."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        while n > 1:
            half = n // 2
            lo = a[:half]
            hi = a[half : 2 * half]
            merged = self.add(lo, hi)
            if n % 2:
                merged = jnp.concatenate([merged, a[2 * half : n]], axis=0)
            a = merged
            n = a.shape[0]
        return a[0]


@functools.cache
def _cached(name: str) -> JField:
    return JField(FR if name == "Fr" else FQ)


def jfr() -> JField:
    return _cached("Fr")


def jfq() -> JField:
    return _cached("Fq")
