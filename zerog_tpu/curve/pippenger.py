"""Pippenger multi-scalar multiplication on TPU.

Replaces the MSM inside `halo2_proofs::poly::commitment` (every commitment in
keygen/create_proof; SURVEY.md §2b "G1 group ops + Pippenger MSM"). The
formulation is chosen for TPU's execution model — no data-dependent control
flow, everything a static-shape vector op:

1. windowed digit extraction straight from scalar limbs;
2. per window: sort point indices by digit (XLA sort), then a *segmented
   Hillis-Steele scan* — log2(N) masked vectorized point-additions — to sum
   runs of equal digits (the group is abelian, so bucket accumulation is a
   segment reduction);
3. scatter segment totals into the bucket array, then compute
   sum_b b * B_b with two suffix-scan passes (log-depth, vectorized);
4. window results are folded on the host (W tiny).

All sequential structure lives in `lax.scan` bodies so the unified Jacobian
add is compiled once per scan, keeping the HLO small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, to_limbs
from .jpoints import (
    jac_add, jac_double, jac_select, jac_from_affine, jac_infinity, jac_roll,
    points_from_device, points_to_device,
)
from .bn254 import g1_add, g1_double

__all__ = ["msm", "msm_device", "fixed_base_expand"]

SCALAR_BITS = 254


def _digits(scalar_limbs, c: int, scalar_bits: int = SCALAR_BITS):
    """uint32[..., 16] canonical limbs -> int32[W, ...] window digits."""
    num_windows = (scalar_bits + c - 1) // c
    outs = []
    for w in range(num_windows):
        a = w * c
        j, r = divmod(a, 16)
        v = scalar_limbs[..., j] >> r
        if j + 1 < 16 and r + c > 16:
            v = v | (scalar_limbs[..., j + 1] << (16 - r))
        outs.append((v & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _suffix_scan(p, m: int):
    """Inclusive suffix sum of a length-m batch of points: out[i] = sum_{j>=i} p[j]."""
    idx = jnp.arange(m)
    n_steps = max(1, (m - 1).bit_length())
    shifts = jnp.asarray([1 << s for s in range(n_steps)], dtype=jnp.int32)

    def step(carry, shift):
        q = jac_roll(carry, -shift)
        ok = idx + shift < m
        return jac_select(ok, jac_add(carry, q), carry), None

    out, _ = jax.lax.scan(step, p, shifts)
    return out


def _one_window(d, px, py, pvalid, c: int):
    """Window sum  sum_i d_i * P_i  for digits d in [0, 2^c)."""
    n = d.shape[0]
    order = jnp.argsort(d)
    ds = d[order]
    x = px[order]
    y = py[order]
    val = pvalid[order] & (ds > 0)
    p = jac_from_affine(x, y, valid=val)

    # segmented inclusive scan: accumulate runs of equal digit
    idx = jnp.arange(n)
    shifts = jnp.asarray([1 << s for s in range(max(1, (n - 1).bit_length()))], jnp.int32)

    def step(carry, shift):
        q = jac_roll(carry, shift)
        same = (ds == jnp.roll(ds, shift)) & (idx >= shift)
        return jac_select(same, jac_add(carry, q), carry), None

    p, _ = jax.lax.scan(step, p, shifts)

    is_end = jnp.concatenate([ds[:-1] != ds[1:], jnp.ones((1,), bool)])
    nb = 1 << c
    bucket_idx = jnp.where(is_end & (ds > 0), ds, nb)  # nb = out-of-bounds, dropped
    buckets = tuple(
        jnp.zeros((nb, 16), jnp.uint32).at[bucket_idx].set(comp, mode="drop")
        for comp in p
    )
    # weighted sum over buckets 1..nb-1: two suffix passes
    s = tuple(comp[1:] for comp in buckets)
    s = _suffix_scan(s, nb - 1)          # s[i] = sum_{b >= i+1} B_b
    t = _suffix_scan(s, nb - 1)          # t[0] = sum_i s[i] = sum_b b*B_b
    return tuple(comp[0] for comp in t)


@functools.partial(jax.jit, static_argnames=("c",))
def _digits_device(scalar_limbs, c: int):
    return _digits(scalar_limbs, c)


@functools.partial(jax.jit, static_argnames=("c",))
def _window_device(d_w, px, py, pvalid, c: int):
    """One window's bucket sums for a batch of scalar rows: d_w int32[B, N]."""
    return jax.vmap(lambda d: _one_window(d, px, py, pvalid, c))(d_w)


def msm_device(scalar_limbs, px, py, pvalid, c: int):
    """scalar_limbs: uint32[B, N, 16] canonical; points: mont affine [N, 16].
    Returns Jacobian window sums, components shaped [B, W, 16].

    Windows are dispatched as separate device launches (a host loop) rather
    than one scanned mega-program: per-launch runtime and memory stay small,
    which matters both for latency-hiding and for runtime stability.
    """
    digits = _digits_device(scalar_limbs, c)  # [W, B, N]
    w = digits.shape[0]
    sums = [_window_device(digits[i], px, py, pvalid, c) for i in range(w)]
    return tuple(
        jnp.stack([s[comp] for s in sums], axis=1) for comp in range(3)
    )


def _fold_windows_host(window_points, c: int):
    """Horner fold of window sums (host; W is tiny)."""
    acc = None
    for pt in reversed(window_points):
        for _ in range(c):
            acc = g1_double(acc) if acc is not None else None
        acc = g1_add(acc, pt)
    return acc


BIT_CHUNK = 32


@functools.partial(jax.jit, static_argnames=())
def _bits_device(scalar_limbs):
    """uint32[B, N, 16] -> bool[256, B, N], MSB first (top 2 bits are zero
    for canonical Fr scalars; leading zeros are free in double-and-add)."""
    rows = []
    for j in range(255, -1, -1):
        rows.append(((scalar_limbs[..., j // 16] >> (j % 16)) & 1) > 0)
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=())
def _danaa_chunk(acc, bits_chunk, px, py, pvalid):
    """BIT_CHUNK double-and-add steps. acc: Jacobian [B, N]; bits_chunk:
    bool[BIT_CHUNK, B, N] (MSB first). One modest compile, reused for every
    chunk of every MSM — keeps each device program small."""
    b, n = bits_chunk.shape[1], bits_chunk.shape[2]
    base = jac_from_affine(
        jnp.broadcast_to(px, (b, n, 16)),
        jnp.broadcast_to(py, (b, n, 16)),
        jnp.broadcast_to(pvalid, (b, n)),
    )

    def step(acc, bit_row):
        acc = jac_double(acc)
        added = jac_add(acc, base)
        return jac_select(bit_row, added, acc), None

    acc, _ = jax.lax.scan(step, acc, bits_chunk)
    return acc


@functools.partial(jax.jit, static_argnames=())
def _reduce_lanes(acc):
    """Fold the N axis of Jacobian [B, N] points into [B]."""
    n = acc[0].shape[1]
    acc_t = tuple(jnp.swapaxes(comp, 0, 1) for comp in acc)  # [N, B, 16]
    total = _suffix_scan(acc_t, n)
    return tuple(comp[0] for comp in total)


def _msm_danaa_device(bits, px, py, pvalid):
    """Lane-parallel double-and-add MSM, chunk-dispatched.

    bits: bool[256, B, N] (MSB first); points: mont affine [N, 16].
    Returns Jacobian [B] points. Chosen over the sort/scatter Pippenger
    pipeline as the default: with a ~23-mul unified add the per-window
    segmented scans cost more mul-passes than one straight double-and-add,
    and this uses only runtime-stable constructs.
    """
    b, n = bits.shape[1], bits.shape[2]
    acc = jac_infinity((b, n))
    for i in range(0, 256, BIT_CHUNK):
        acc = _danaa_chunk(acc, bits[i : i + BIT_CHUNK], px, py, pvalid)
    return _reduce_lanes(acc)


def msm(scalars, points_dev, c: int | None = None, strategy: str = "danaa"):
    """Host-facing MSM.

    scalars: 2D list/array [B][N] of ints in [0, r) (or 1D for B=1);
    points_dev: (px, py, pvalid) from :func:`points_to_device`.
    Returns list of B affine points (or a single point for 1D input).

    The batch dimension is padded up to a power of two so the jitted graph is
    reused across phases instead of recompiling per B.
    """
    single = not isinstance(scalars[0], (list, tuple, np.ndarray))
    if single:
        scalars = [scalars]
    px, py, pvalid = points_dev
    n = px.shape[0]
    b_real = len(scalars)
    b_pad = 1
    while b_pad < b_real:
        b_pad *= 2
    if b_pad > b_real:
        scalars = list(scalars) + [[0] * len(scalars[0])] * (b_pad - b_real)
    sl = to_limbs(np.asarray(scalars, dtype=object) % FR.p)

    if strategy == "danaa":
        bits = _bits_device(jnp.asarray(sl))
        acc = _msm_danaa_device(bits, px, py, jnp.asarray(pvalid))
        acc = tuple(comp[:b_real] for comp in acc)
        results = points_from_device(acc)
        return results[0] if single else results

    if c is None:
        c = max(1, min(15, n.bit_length() - 2))
    sums = msm_device(jnp.asarray(sl), px, py, jnp.asarray(pvalid), c)
    sums = tuple(comp[:b_real] for comp in sums)
    b = b_real
    results = []
    w = sums[0].shape[1]
    # normalize all window sums in one host batch
    flat = tuple(comp.reshape(b * w, 16) for comp in sums)
    affine = points_from_device(flat)
    for i in range(b):
        results.append(_fold_windows_host(affine[i * w : (i + 1) * w], c))
    return results[0] if single else results


@functools.partial(jax.jit, static_argnames=())
def _expand_chunk(acc, bits, dx, dy):
    """Add BIT_CHUNK doubling-table entries (masked) into acc [N]."""
    n = bits.shape[1]

    def step(carry, xs):
        b, x, y = xs
        p = jac_from_affine(
            jnp.broadcast_to(x, (n, 16)), jnp.broadcast_to(y, (n, 16)), valid=b
        )
        return jac_add(carry, p), None

    acc, _ = jax.lax.scan(step, acc, (bits, dx, dy))
    return acc


def _expand_body(bits, dx, dy):
    n = bits.shape[1]
    acc = jac_infinity((n,))
    # pad the bit rows to a BIT_CHUNK multiple so one compiled chunk is reused
    total = bits.shape[0]
    pad = (-total) % BIT_CHUNK
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad, n), bool)], axis=0)
        dx = jnp.concatenate([dx, jnp.zeros((pad, 16), jnp.uint32)], axis=0)
        dy = jnp.concatenate([dy, jnp.zeros((pad, 16), jnp.uint32)], axis=0)
    for i in range(0, bits.shape[0], BIT_CHUNK):
        acc = _expand_chunk(acc, bits[i : i + BIT_CHUNK], dx[i : i + BIT_CHUNK],
                            dy[i : i + BIT_CHUNK])
    return acc


def fixed_base_expand(base, scalars):
    """Compute [s * base for s in scalars] on device (for SRS generation).

    base: host affine point; scalars: list of ints. Returns affine host points.
    """
    scalars = [int(s) % FR.p for s in scalars]
    n = len(scalars)
    doublings = []
    pt = base
    for _ in range(SCALAR_BITS):
        doublings.append(pt)
        pt = g1_double(pt)
    dx, dy, _ = points_to_device(doublings)
    bits = np.zeros((SCALAR_BITS, n), dtype=bool)
    for i, s in enumerate(scalars):
        for j in range(SCALAR_BITS):
            if (s >> j) & 1:
                bits[j, i] = True
    acc = _expand_body(jnp.asarray(bits), jnp.asarray(dx), jnp.asarray(dy))
    return points_from_device(acc)
