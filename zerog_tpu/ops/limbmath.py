"""Generic fixed-width multi-limb integer arithmetic for TPU (16-bit limbs in
uint32 lanes).

Used where exact integers exceed 32 bits but full 254-bit field machinery is
overkill — e.g. the WNN MishMash hash ``(x^3 % p) % 2^l`` (reference:
src/wnn.rs:98-103) where ``x`` is up to 49 bits and ``x^3`` up to 147 bits.

All shapes are static; widths are in limbs (16 bits each). Arrays are
little-endian uint32[..., n] with each limb < 2^16.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n: int) -> np.ndarray:
    assert x >= 0 and x < (1 << (LIMB_BITS * n))
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(n)], dtype=np.uint32)


def normalize(cols, n: int):
    out = []
    carry = jnp.zeros_like(cols[..., 0])
    for j in range(n):
        v = (cols[..., j] if j < cols.shape[-1] else jnp.zeros_like(carry)) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def lmul(a, b, out_limbs: int | None = None):
    """Product of two limb arrays. a: [..., na], b: [..., nb] (or numpy const
    vector [nb]) -> [..., na+nb] (or out_limbs)."""
    na = a.shape[-1]
    b = jnp.asarray(b, dtype=jnp.uint32)
    nb = b.shape[-1]
    nout = out_limbs if out_limbs is not None else na + nb
    if b.ndim == 1:
        b = jnp.broadcast_to(b, a.shape[:-1] + (nb,))
    cols = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (nout + 1,), jnp.uint32)
    for i in range(na):
        hi = min(nb, nout - i)
        if hi <= 0:
            break
        prod = a[..., i : i + 1] * b[..., :hi]
        cols = cols.at[..., i : i + hi].add(prod & MASK)
        cols = cols.at[..., i + 1 : i + 1 + hi].add(prod >> LIMB_BITS)
    return normalize(cols, nout)


def lsub_clamped(a, b):
    """a - b assuming a >= b (exact); both [..., n]."""
    n = a.shape[-1]
    b = jnp.asarray(b, dtype=jnp.uint32)
    if b.ndim == 1:
        b = jnp.broadcast_to(b, a.shape)
    notb = b ^ MASK
    cols = a + notb
    cols = cols.at[..., 0].add(1)
    return normalize(cols, n)  # drops the 2^(16n) carry


def lge(a, b):
    """a >= b elementwise over the batch; both [..., n] (b may be numpy const)."""
    n = a.shape[-1]
    b = jnp.asarray(b, dtype=jnp.uint32)
    if b.ndim == 1:
        b = jnp.broadcast_to(b, a.shape)
    # compute borrow chain of a - b
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for i in range(n):
        d = a[..., i].astype(jnp.int32) - b[..., i].astype(jnp.int32) - borrow.astype(jnp.int32)
        borrow = (d < 0).astype(jnp.uint32)
    return borrow == 0


def barrett_mod(t, p: int, t_limbs: int):
    """t mod p for t < 2^(16*t_limbs), p a static positive int.

    Classic Barrett: q = (t * mu) >> (16 * t_limbs) with
    mu = floor(2^(16*t_limbs) / p); then r = t - q*p with at most two
    corrective subtractions.
    """
    p_limbs_n = (p.bit_length() + LIMB_BITS - 1) // LIMB_BITS
    mu = (1 << (LIMB_BITS * t_limbs)) // p
    mu_np = int_to_limbs(mu, (mu.bit_length() + LIMB_BITS - 1) // LIMB_BITS or 1)
    p_np = int_to_limbs(p, p_limbs_n)
    q_full = lmul(t, mu_np)
    q = q_full[..., t_limbs:]
    qp = lmul(q, p_np, out_limbs=t_limbs)
    r = lsub_clamped(t, qp)
    for _ in range(2):
        ge = lge(r, int_to_limbs(p, t_limbs))
        r2 = lsub_clamped(r, int_to_limbs(p, t_limbs))
        r = jnp.where(ge[..., None], r2, r)
    # result fits in p_limbs_n limbs
    return r[..., : p_limbs_n + 1]


def limbs_to_u32_pair(a):
    """Low 32 and next 32 bits of a limb array -> (lo_u32, hi_u32)."""
    lo = a[..., 0] | (a[..., 1] << 16) if a.shape[-1] > 1 else a[..., 0]
    if a.shape[-1] > 3:
        hi = a[..., 2] | (a[..., 3] << 16)
    elif a.shape[-1] > 2:
        hi = a[..., 2]
    else:
        hi = jnp.zeros_like(lo)
    return lo, hi
