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

import numpy as np

from ..field import FR, batch_inv

__all__ = ["grand_products"]


def grand_products(perm_values, sigma_values, beta: int, gamma: int,
                   usable: int, n: int, chunk_len: int, rng):
    """perm_values / sigma_values: lists of object arrays [n], in permutation
    column order. Returns the list of chained Z columns (object [n], blinded)."""
    p = FR.p
    omega = FR.nth_root_of_unity(int(n).bit_length() - 1)
    omega_pows = np.empty(usable, dtype=object)
    cur = 1
    for i in range(usable):
        omega_pows[i] = cur
        cur = cur * omega % p

    zs = []
    m = len(perm_values)
    last_z = 1
    for start in range(0, m, chunk_len):
        cols = range(start, min(start + chunk_len, m))
        nums = np.ones(usable, dtype=object)
        dens = np.ones(usable, dtype=object)
        for j in cols:
            delta_j = pow(FR.delta, j, p)
            v = perm_values[j][:usable]
            nums = nums * ((v + beta * delta_j * omega_pows + gamma) % p) % p
            dens = dens * ((v + beta * sigma_values[j][:usable] + gamma) % p) % p
        dinv = batch_inv([int(x) for x in dens], p)
        z = np.zeros(n, dtype=object)
        z[0] = last_z
        cur = last_z
        for i in range(usable):
            cur = cur * int(nums[i]) % p * dinv[i] % p
            z[i + 1] = cur
        last_z = int(z[usable])
        for i in range(usable + 1, n):
            z[i] = rng.field()
        zs.append(z)

    assert last_z == 1, "permutation grand product does not telescope (invalid witness)"
    return zs
