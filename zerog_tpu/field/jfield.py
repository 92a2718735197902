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
    "NLIMB", "LIMB_BITS", "JField", "jfr", "jfq", "shift_fill",
]

NLIMB = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def shift_fill(a, shift, fill=0, axis=0, backward=False):
    """Shift `a` by `shift` lanes along `axis`, filling vacated lanes.

    forward (default): out[i] = a[i-shift] for i >= shift, else fill.
    backward=True:     out[i] = a[i+shift] for i < size-shift, else fill.

    `shift` may be a traced scalar (usable inside lax.scan bodies); `fill`
    is a scalar or an array broadcastable over the trailing dims (e.g. the
    Montgomery one-limbs for multiplicative scans).

    This replaces jnp.roll in the log-depth scan kernels: XLA:TPU lowers a
    roll that feeds a fused field/point computation catastrophically
    (measured 446 ms vs 0.2 ms per step on uint32[4, 327680, 16]); a
    pad + dynamic-slice is a single fast copy, and the scans mask shifted-in
    lanes anyway, so wraparound semantics were never needed."""
    import jax
    import jax.numpy as jnp

    size = a.shape[axis]
    if np.isscalar(fill) or getattr(fill, "ndim", 1) == 0:
        pad = jnp.full_like(a, fill)
    else:
        pad = jnp.broadcast_to(jnp.asarray(fill, a.dtype), a.shape)
    if backward:
        padded = jnp.concatenate([a, pad], axis=axis)
        start = shift
    else:
        padded = jnp.concatenate([pad, a], axis=axis)
        start = size - shift
    return jax.lax.dynamic_slice_in_dim(padded, start, size, axis=axis)


def _int_to_limbs_np(x: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMB)], dtype=np.uint32)


def _int_to_limbs8_np(x: int, n: int = 32) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], dtype=np.uint32)


def _use_light() -> bool:
    """Pick the compile-light field mul when targeting XLA:CPU.

    The fully unrolled 16x16-limb schoolbook mul is the fast formulation on
    the TPU VPU (elementwise chains fuse), but its HLO is so large that
    XLA:CPU's LLVM backend takes ~2 s of compile time PER MULTIPLY — a single
    Jacobian point add costs ~50 s of compile. The light path expresses the
    limb convolutions as a few uint32 matmuls with constant 0/1 or limb
    matrices (compile-cheap on CPU, still exact). Semantics are identical.
    Override with ZEROG_FIELD_LIGHT=0/1.
    """
    import os

    forced = os.environ.get("ZEROG_FIELD_LIGHT")
    if forced is not None:
        return forced not in ("0", "false", "")
    import jax as _jax

    return _jax.default_backend() == "cpu"


def _normalize_scan(cols, ncols: int, bits: int):
    """Carry propagation via lax.scan: tiny HLO (compile-light for XLA:CPU,
    where the unrolled chain costs ~2 ms of LLVM time per op). ~70x slower
    at runtime on the TPU backend — never use there."""
    m = cols.shape[-1]
    if m < ncols:
        cols = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (ncols - m,), cols.dtype)], axis=-1
        )
    elif m > ncols:
        cols = cols[..., :ncols]
    cols_t = jnp.moveaxis(cols, -1, 0)
    mask = jnp.uint32((1 << bits) - 1)

    def step(carry, c):
        v = c + carry
        return v >> bits, v & mask

    carry, out = jax.lax.scan(step, jnp.zeros_like(cols_t[0]), cols_t)
    return jnp.moveaxis(out, 0, -1), carry


def _normalize(cols, ncols: int):
    """Carry-propagate uint32 columns (each < 2^21-ish) into canonical 16-bit
    limbs. Returns (limbs uint32[..., ncols], carry).

    Deliberately UNROLLED on TPU: the carry chain becomes a pure elementwise
    op chain that XLA fuses into a handful of kernels, so arrays never bounce
    through HBM per limb. (The lax.scan variant compiles faster but defeats
    fusion and is ~2 orders of magnitude slower at runtime — used only on
    the compile-bound CPU backend.)"""
    if _use_light():
        return _normalize_scan(cols, ncols, LIMB_BITS)
    out = []
    carry = jnp.zeros_like(cols[..., 0])
    m = cols.shape[-1]
    for j in range(ncols):
        v = (cols[..., j] if j < m else jnp.zeros_like(carry)) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _mul_wide(a, b):
    """Full 512-bit product of two 256-bit numbers in 16-bit limbs.
    a, b: uint32[..., 16] -> uint32[..., 32] canonical limbs. Unrolled
    schoolbook columns (sums stay < 2^21; no overflow)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    cols = jnp.zeros(shape + (2 * NLIMB + 1,), dtype=jnp.uint32)
    for i in range(NLIMB):
        prod = a[..., i : i + 1] * b  # uint32 products, exact (< 2^32)
        cols = cols.at[..., i : i + NLIMB].add(prod & MASK)
        cols = cols.at[..., i + 1 : i + NLIMB + 1].add(prod >> LIMB_BITS)
    limbs, _ = _normalize(cols, 2 * NLIMB)
    return limbs


def _mul_low(a, b_const):
    """Low 256 bits of a * b (mod 2^256). b_const: uint32[16] constant."""
    b_const = jnp.asarray(b_const)
    cols = jnp.zeros(a.shape, dtype=jnp.uint32)
    for i in range(NLIMB):
        hi_len = NLIMB - i - 1
        prod = a[..., i : i + 1] * b_const[None, : NLIMB - i]
        cols = cols.at[..., i:].add(prod & MASK)
        if hi_len > 0:
            cols = cols.at[..., i + 1 :].add(prod[..., :hi_len] >> LIMB_BITS)
    limbs, _ = _normalize(cols, NLIMB)
    return limbs


# ---- compile-light path (XLA:CPU): limb convolutions as constant matmuls ----
N8 = 32  # 8-bit limbs per 256-bit element


def _to8(a):
    """uint32[..., 16] 16-bit limbs -> uint32[..., 32] 8-bit limbs (LE)."""
    lo = a & 0xFF
    hi = (a >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (N8,))


def _from8(a8):
    """Canonical uint32[..., 32] 8-bit limbs -> uint32[..., 16] 16-bit limbs."""
    pairs = a8.reshape(a8.shape[:-1] + (NLIMB, 2))
    return pairs[..., 0] | (pairs[..., 1] << 8)


def _normalize8(cols, ncols: int):
    """Carry-propagate uint32 columns (< 2^22) into canonical 8-bit limbs.
    Only used on the light path, so always scan-based."""
    return _normalize_scan(cols, ncols, 8)


@functools.cache
def _conv8_matrix():
    """[N8*N8, 2*N8-1] 0/1 matrix folding an outer product into columns:
    column k collects products a_i*b_j with i+j == k."""
    m = np.zeros((N8 * N8, 2 * N8 - 1), dtype=np.uint32)
    for i in range(N8):
        for j in range(N8):
            m[i * N8 + j, i + j] = 1
    return m


def _mul_wide8(a8, b8):
    """Column sums of the 8-bit-limb schoolbook product, via one outer
    product + one constant matmul (exact: each column has <= 32 terms
    < 2^16, so sums stay < 2^21 in uint32 lanes)."""
    shape = jnp.broadcast_shapes(a8.shape[:-1], b8.shape[:-1])
    outer = (a8[..., :, None] * b8[..., None, :]).reshape(shape + (N8 * N8,))
    return outer @ jnp.asarray(_conv8_matrix())  # [..., 63]


def _const_low_matrix(c8: np.ndarray):
    """[N8, N8] matrix M with M[i, k] = c8[k-i]: a8 @ M = column sums of the
    low half of a * c (mod 2^256)."""
    m = np.zeros((N8, N8), dtype=np.uint32)
    for i in range(N8):
        m[i, i:] = c8[: N8 - i]
    return m


def _const_wide_matrix(c8: np.ndarray):
    """[N8, 2*N8-1] matrix M with M[i, k] = c8[k-i]: a8 @ M = full-width
    column sums of a * c."""
    m = np.zeros((N8, 2 * N8 - 1), dtype=np.uint32)
    for i in range(N8):
        m[i, i : i + N8] = c8
    return m


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
        self._light_mats = None  # lazy (n_prime low-mul + p wide-mul matrices)

    def _light(self):
        if self._light_mats is None:
            n8 = _int_to_limbs8_np((-pow(self.params.p, -1, 1 << 256)) % (1 << 256))
            p8 = _int_to_limbs8_np(self.params.p)
            self._light_mats = (_const_low_matrix(n8), _const_wide_matrix(p8))
        return self._light_mats

    def _mul_light(self, a, b):
        """Montgomery product via constant matmuls (see _use_light)."""
        nlow_np, pwide_np = self._light()
        nlow, pwide = jnp.asarray(nlow_np), jnp.asarray(pwide_np)
        tcols = _mul_wide8(_to8(a), _to8(b))            # [..., 63]
        t8, _ = _normalize8(tcols, 2 * N8)              # T canonical, 64 limbs
        m8, _ = _normalize8(t8[..., :N8] @ nlow, N8)    # m = T_lo * n' mod 2^256
        scols = jnp.zeros(t8.shape[:-1] + (2 * N8,), jnp.uint32)
        scols = scols.at[..., : 2 * N8 - 1].set(m8 @ pwide)
        scols = scols + t8                              # T + m*p < 2^511
        s8, _ = _normalize8(scols, 2 * N8)
        return self._cond_sub_p(_from8(s8[..., N8:]))

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
        if _use_light():
            return self._mul_light(a, b)
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
