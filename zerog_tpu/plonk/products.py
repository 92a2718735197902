"""Device-side grand-product construction shared by the lookup and
permutation arguments.

The reference parallelizes exactly this via rayon inside halo2_proofs
(lookup permute + grand products are `par_iter`-parallel in the pinned tag;
SURVEY.md §2b "Intra-node parallelism"). Host Python loops over all usable
rows cost seconds at k=14 and minutes at k=17; here the telescoping products
run as log-depth Hillis-Steele prefix-product scans on TPU, with one scalar
inversion on the host (inside :func:`batch_inv_device`).

All arithmetic is exact mod p, so the Z columns are bit-identical to the
host-loop construction (same values, same blinding-row RNG consumption).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, jfr, to_limbs, from_limbs
from ..poly.eval import batch_inv_device, _prefix_products

__all__ = ["chained_product", "pair_terms"]

_f = jfr()


@jax.jit
def _ratio(nums, dinv, last_z):
    """last_z * prefix_products(nums * dinv) — the Z body in one program."""
    return _f.mul(_prefix_products(_f.mul(nums, dinv)),
                  jnp.broadcast_to(last_z, nums.shape))


def chained_product(nums, dens, last_z: int):
    """Z[i] = last_z * prod_{j<i} nums[j]/dens[j] for i in 1..u (inclusive).

    nums/dens: device mont limbs [u, 16] (dens all nonzero).
    Returns host object array [u] of ints: z[0] is the value at row 1.
    """
    dinv = batch_inv_device(dens)
    lz = jnp.asarray(to_limbs(int(last_z) % FR.p, FR, mont=True))
    out = _ratio(nums, dinv, lz)
    return from_limbs(np.asarray(jax.device_get(out)), FR, mont=True)


@jax.jit
def _pair_terms(a, s, beta, gamma):
    """(a + beta) * (s + gamma) elementwise over mont limb rows."""
    return _f.mul(_f.add(a, beta[None]), _f.add(s, gamma[None]))


def pair_terms(a_vals, s_vals, beta: int, gamma: int):
    """Upload two object arrays and form (a+beta)(s+gamma) on device.
    Returns device mont limbs [u, 16]."""
    a = jnp.asarray(to_limbs(np.asarray(a_vals, dtype=object) % FR.p, FR, mont=True))
    s = jnp.asarray(to_limbs(np.asarray(s_vals, dtype=object) % FR.p, FR, mont=True))
    b = jnp.asarray(to_limbs(beta % FR.p, FR, mont=True))
    g = jnp.asarray(to_limbs(gamma % FR.p, FR, mont=True))
    return _pair_terms(a, s, b, g)
