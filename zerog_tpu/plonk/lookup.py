"""Lookup argument (halo2 v2023_04_20 permuted-pairs style), prover side.

Replaces `halo2_proofs::plonk::lookup` (registered by the reference's bloom
filter / byte-selector / range-check gadgets; SURVEY.md §2b). Construction is
host-side (sorting and telescoping grand products are sequential by nature);
the five quotient constraints are evaluated on TPU by the prover's extended
evaluator.

Constraint set (with A = theta-compressed inputs, S = compressed table,
A'/S' the permuted pair, active = 1 - (l_last + l_blind)):
  1. l_0 * (1 - Z)
  2. l_last * (Z^2 - Z)
  3. active * ( Z(wX) (A'+beta)(S'+gamma) - Z (A+beta)(S+gamma) )
  4. l_0 * (A' - S')
  5. active * (A' - S') * (A' - A'(w^{-1}X))
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..field import FR

__all__ = ["LookupCommitted", "commit_permuted", "grand_product"]


@dataclasses.dataclass
class LookupCommitted:
    compressed_input: np.ndarray   # object [n]
    compressed_table: np.ndarray   # object [n]
    permuted_input: np.ndarray     # object [n] (blinded)
    permuted_table: np.ndarray     # object [n] (blinded)
    z: np.ndarray | None = None    # object [n] (blinded), set later


def compress(exprs_values, theta: int):
    """theta-fold a list of object arrays: sum theta^(m-1-i) * v_i  (halo2 folds
    running: acc = acc * theta + v)."""
    acc = np.zeros_like(exprs_values[0])
    for v in exprs_values:
        acc = (acc * theta + v) % FR.p
    return acc


def commit_permuted(compressed_input, compressed_table, usable: int, rng) -> "LookupCommitted":
    """Build the permuted pair (A', S'): A' = sorted A; S'[i] = A'[i] where A'
    changes, remaining slots filled with the unused table values. Fails if
    some input value is missing from the table (invalid witness)."""
    n = len(compressed_input)
    a_usable = [int(v) for v in compressed_input[:usable]]
    s_usable = [int(v) for v in compressed_table[:usable]]

    a_sorted = sorted(a_usable)
    counts: dict[int, int] = {}
    for v in s_usable:
        counts[v] = counts.get(v, 0) + 1

    s_perm = [None] * usable
    repeat_slots = []
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            c = counts.get(v, 0)
            if c == 0:
                raise ValueError(f"lookup input {v} not present in table")
            counts[v] = c - 1
            s_perm[i] = v
        else:
            repeat_slots.append(i)
    leftovers = []
    for v, c in counts.items():
        leftovers.extend([v] * c)
    assert len(leftovers) == len(repeat_slots)
    for slot, v in zip(repeat_slots, leftovers):
        s_perm[slot] = v

    permuted_input = np.zeros(n, dtype=object)
    permuted_table = np.zeros(n, dtype=object)
    permuted_input[:usable] = a_sorted
    permuted_table[:usable] = s_perm
    for i in range(usable, n):
        permuted_input[i] = rng.field()
        permuted_table[i] = rng.field()

    return LookupCommitted(
        compressed_input=np.asarray(compressed_input, dtype=object),
        compressed_table=np.asarray(compressed_table, dtype=object),
        permuted_input=permuted_input,
        permuted_table=permuted_table,
    )


def grand_product(lc: LookupCommitted, beta: int, gamma: int, usable: int, rng) -> np.ndarray:
    """Z[0] = 1; Z[i+1] = Z[i] * (A_i+beta)(S_i+gamma) / ((A'_i+beta)(S'_i+gamma))
    over usable rows; Z[usable] telescopes to 1; blinding rows random.

    The telescoping product runs on device as a log-depth prefix-product scan
    (the reference's rayon `par_iter` equivalent; see plonk/products.py) —
    values are exactly the host-loop construction's."""
    from .products import chained_product, pair_terms

    n = len(lc.compressed_input)
    nums = pair_terms(lc.compressed_input[:usable], lc.compressed_table[:usable],
                      beta, gamma)
    dens = pair_terms(lc.permuted_input[:usable], lc.permuted_table[:usable],
                      beta, gamma)
    body = chained_product(nums, dens, 1)
    z = np.zeros(n, dtype=object)
    z[0] = 1
    z[1 : usable + 1] = body
    assert z[usable] == 1, "lookup grand product does not telescope (invalid witness)"
    for i in range(usable + 1, n):
        z[i] = rng.field()
    lc.z = z
    return z
