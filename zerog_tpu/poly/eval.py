"""Device polynomial evaluation algebra for the prover's opening phases.

Replaces the host-side Horner loops and synthetic division the round-1 prover
used for phases 6-7 (the `rayon`-parallel `eval_polynomial` /
`kate_division` inside halo2_proofs that SURVEY.md §3.1 lists on the
create_proof hot path). Three primitives, all built from elementwise field
kernels so XLA fuses them:

- :func:`batch_inv_device` — Montgomery batch inversion as two log-depth
  Hillis-Steele product trees plus ONE scalar inversion on the host. ~2*log2(n)
  vector muls; no 254-step Fermat chain (which would blow the per-program
  compile budget on the axon worker).
- :func:`domain_inverses` — (z - w^i)^-1 for a batch of opening points; the
  shared ingredient of barycentric evaluation and Kate division.
- :func:`barycentric_eval` — p(z) for a stack of Lagrange-form polynomials at
  a batch of points: p(z) = (z^n-1)/n * sum_i v_i * w^i / (z - w^i).
- :func:`kate_quotient_lagrange` — (p(X) - p(z))/(X - z) evaluated on the
  domain: elementwise (v_i - e) * (w^i - z)^-1. Degree drops by one, so the
  Lagrange form is exact and the witness can be committed with the Lagrange
  SRS basis — no coefficient-form round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, jfr, to_limbs, from_limbs

__all__ = [
    "batch_inv_device", "domain_inverses", "barycentric_eval",
    "kate_quotient_lagrange", "omega_powers",
]

_f = jfr()


@functools.cache
def omega_powers(k: int) -> np.ndarray:
    """[n, 16] mont limbs of w^i for the size-2^k domain (host-cached)."""
    n = 1 << k
    omega = FR.nth_root_of_unity(k)
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * omega % FR.p
    return to_limbs(pows, FR, mont=True)


@jax.jit
def _prefix_products(flat):
    """Inclusive prefix products of flat [m, 16] via Hillis-Steele doubling
    (log2(m) vector muls; shift_fill brings in multiplicative-one lanes, so
    no masking — and no jnp.roll, whose fused TPU lowering is ~1000x slower
    than the pad+slice form)."""
    from ..field import shift_fill

    m = flat.shape[0]
    steps = max(1, (m - 1).bit_length())
    shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    one = jnp.asarray(_ONE)

    def body(out, shift):
        return _f.mul(out, shift_fill(out, shift, fill=one, axis=0)), None

    out, _ = jax.lax.scan(body, flat, shifts)
    return out


_ONE = to_limbs(1, FR, mont=True)


@jax.jit
def _finish_inverses(flat, prefix, total_inv):
    """inv_i = prefix_{i-1} * suffix_inv_i where suffix_inv is reconstructed
    by a reverse prefix walk: suffix_inv_i = total_inv * prod_{j>i} a_j^-1.
    Implemented as inv_i = prefix_{i-1} * (total_inv * rev_prefix(rev a)_{i+1})
    using a second log-tree on the reversed inputs."""
    m = flat.shape[0]
    rev = jnp.flip(flat, axis=0)
    rev_pref = _prefix_products(rev)                     # prod of last j items
    suffix = jnp.flip(rev_pref, axis=0)                  # suffix[i] = prod_{j>=i}
    suffix_next = jnp.concatenate(
        [suffix[1:], jnp.broadcast_to(jnp.asarray(_ONE), (1, 16))], axis=0)
    prefix_prev = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(_ONE), (1, 16)), prefix[:-1]], axis=0)
    # inv_i = total_inv * prefix_{i-1} * suffix_{i+1}
    return _f.mul(_f.mul(prefix_prev, suffix_next),
                  jnp.broadcast_to(total_inv, flat.shape))


def batch_inv_device(vals):
    """vals: [..., 16] mont limbs, all nonzero -> elementwise inverses.
    One 32-byte device->host->device round trip for the single scalar
    inversion; everything else stays on device."""
    shape = vals.shape
    flat = vals.reshape(-1, 16)
    prefix = _prefix_products(flat)
    total = from_limbs(np.asarray(jax.device_get(prefix[-1])), FR, mont=True)
    total_inv = jnp.asarray(to_limbs(pow(int(total), -1, FR.p), FR, mont=True))
    return _finish_inverses(flat, prefix, total_inv).reshape(shape)


@jax.jit
def _sub_outer(zs, ws):
    """zs [P, 16], ws [n, 16] -> (z - w^i) as [P, n, 16]."""
    return _f.sub(zs[:, None, :], ws[None, :, :])


def domain_inverses(k: int, zs_host):
    """(z - w^i)^-1 for each opening point z. Returns ([P, n, 16], ws)."""
    ws = jnp.asarray(omega_powers(k))
    zs = jnp.asarray(to_limbs([int(z) % FR.p for z in zs_host], FR, mont=True))
    denoms = _sub_outer(zs, ws)
    return batch_inv_device(denoms), ws


@jax.jit
def _bary_weighted_sum(stack, weights):
    """stack [C, n, 16], weights [n, 16] -> [C, 16] via log-tree reduction."""
    acc = _f.mul(stack, weights[None, :, :])
    m = acc.shape[1]
    while m > 1:
        half = m // 2
        acc = _f.add(acc[:, :half], acc[:, half : 2 * half])
        m = half
    return acc[:, 0]


@jax.jit
def _bary_point(stack, dinv_row, ws, zfac):
    """One opening point: weights = zfac * w^i * (z - w^i)^-1, then the
    weighted log-tree sum. Fully jitted — an eager _f.mul here would dispatch
    ~10^3 primitive kernels per call (measured seconds per proof on the
    tunneled device)."""
    weights = _f.mul(_f.mul(dinv_row, ws), zfac)
    return _bary_weighted_sum(stack, weights)


def barycentric_eval(k: int, stack, zs_host, dinv=None):
    """Evaluate Lagrange-form polys at points: stack [C, n, 16] mont,
    zs_host list of ints -> host int matrix [P][C].

    p(z) = (z^n - 1)/n * sum_i v_i * w^i * (z - w^i)^-1

    One jitted launch per point, ONE device->host download for all points
    (each synchronous download pays a full tunnel round trip).
    """
    n = 1 << k
    p = FR.p
    if dinv is None:
        dinv, ws = domain_inverses(k, zs_host)
    else:
        ws = jnp.asarray(omega_powers(k))
    outs_dev = []
    for pi, z in enumerate(zs_host):
        zn1_over_n = (pow(int(z), n, p) - 1) * pow(n, p - 2, p) % p
        zfac = jnp.asarray(to_limbs(zn1_over_n, FR, mont=True))
        outs_dev.append(_bary_point(stack, dinv[pi], ws, zfac))
    allv = from_limbs(np.asarray(jax.device_get(jnp.stack(outs_dev))), FR,
                      mont=True)
    return [[int(v) for v in np.atleast_1d(row)] for row in allv]


@jax.jit
def _kate_kernel(vals, e_limbs, dinv_row):
    """(v_i - e) * (w^i - z)^-1 = -(v_i - e) * (z - w^i)^-1, fully fused."""
    return _f.mul(_f.sub(vals, e_limbs[None, :]), _f.neg(dinv_row))


def kate_quotient_lagrange(vals, e: int, dinv_row):
    """vals [n, 16] mont Lagrange values of p; e = p(z); dinv_row [n, 16] =
    (z - w^i)^-1. Returns Lagrange values of (p(X) - e)/(X - z)."""
    e_limbs = jnp.asarray(to_limbs(int(e) % FR.p, FR, mont=True))
    return _kate_kernel(vals, e_limbs, dinv_row)
