"""Permutation argument, prover side.

Replaces `halo2_proofs::plonk::permutation` (driven by every `copy_advice` /
`enable_equality` in the reference gadgets; SURVEY.md §2b). Columns are split
into chunks of (degree - 2) so each chunk's product constraint stays within
the circuit degree; each chunk gets its own running-product Z, chained so that
Z_i[0] = Z_{i-1}[u] (u = usable row), with Z_0[0] = 1 and Z_last[u] = 1 for a
valid witness.

Constraints (sets indexed i, global column index jg):
  1. l_0 * (1 - Z_0)
  2. l_last * (Z_last^2 - Z_last)
  3. for i>0: l_0 * (Z_i - Z_{i-1}(w^u X))        [query at Rotation(-(bf+1))]
  4. per set: active * ( Z_i(wX) prod_j (v_j + beta sigma_j + gamma)
                        - Z_i    prod_j (v_j + beta delta^jg X + gamma) )
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, jfr, to_limbs

__all__ = ["grand_products"]

_f = jfr()


@functools.partial(jax.jit, static_argnames=())
def _chunk_terms(vals, sigmas, beta_deltas, omega_pows, beta, gamma):
    """nums/dens products over one chunk's columns, all on device.

    vals/sigmas: [m, u, 16] mont limbs; beta_deltas: [m, 16] (beta * delta^jg
    per column); omega_pows: [u, 16]; beta/gamma: [16].
    nums = prod_j (v_j + beta*delta_jg*w^i + gamma)
    dens = prod_j (v_j + beta*sigma_j + gamma)
    """
    g = gamma[None, None]
    nums_t = _f.add(_f.add(vals, _f.mul(beta_deltas[:, None], omega_pows[None])), g)
    dens_t = _f.add(_f.add(vals, _f.mul(beta[None, None], sigmas)), g)
    m = nums_t.shape[0]
    nums, dens = nums_t[0], dens_t[0]
    for j in range(1, m):  # chunk_len is tiny (degree - 2); unrolled at trace
        nums = _f.mul(nums, nums_t[j])
        dens = _f.mul(dens, dens_t[j])
    return nums, dens


def grand_products(perm_values, sigma_values, beta: int, gamma: int,
                   usable: int, n: int, chunk_len: int, rng):
    """perm_values / sigma_values: lists of object arrays [n], in permutation
    column order. Returns the list of chained Z columns (object [n], blinded).

    The per-row products and the telescoping Z run on device (log-depth
    prefix-product scans; plonk/products.py) — the reference parallelizes the
    same loops via rayon inside halo2_proofs (SURVEY.md §2b)."""
    from ..poly.eval import omega_powers
    from .products import chained_product

    p = FR.p
    k = int(n).bit_length() - 1
    omega_dev = jnp.asarray(omega_powers(k)[:usable])
    beta_l = jnp.asarray(to_limbs(beta % p, FR, mont=True))
    gamma_l = jnp.asarray(to_limbs(gamma % p, FR, mont=True))

    def dev_stack(cols):
        arr = np.stack([
            to_limbs(np.asarray(c[:usable], dtype=object) % p, FR, mont=True)
            for c in cols
        ])
        return jnp.asarray(arr)

    zs = []
    m = len(perm_values)
    last_z = 1
    for start in range(0, m, chunk_len):
        cols = list(range(start, min(start + chunk_len, m)))
        vals = dev_stack([perm_values[j] for j in cols])
        sigmas = dev_stack([sigma_values[j] for j in cols])
        beta_deltas = jnp.asarray(np.stack([
            to_limbs(beta * pow(FR.delta, j, p) % p, FR, mont=True)
            for j in cols
        ]))
        nums, dens = _chunk_terms(vals, sigmas, beta_deltas, omega_dev,
                                  beta_l, gamma_l)
        body = chained_product(nums, dens, last_z)
        z = np.zeros(n, dtype=object)
        z[0] = last_z
        z[1 : usable + 1] = body
        last_z = int(z[usable])
        for i in range(usable + 1, n):
            z[i] = rng.field()
        zs.append(z)

    assert last_z == 1, "permutation grand product does not telescope (invalid witness)"
    return zs
