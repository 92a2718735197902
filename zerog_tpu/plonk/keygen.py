"""Key generation: verifying key (fixed + sigma commitments) and proving key.

TPU counterpart of `halo2_proofs::plonk::{keygen_vk, keygen_pk}` (consumed at
reference src/wnn.rs:226-228). Keys are input-independent; callers synthesize
with a dummy witness exactly like the reference does (src/wnn.rs:223-224).

The permutation sigmas use the classic cycle-merge construction: start from
the identity mapping and, for every copy constraint joining two distinct
cycles, swap the successors of the two cells (guarded by union-find so a
second constraint inside one cycle doesn't split it).
"""

from __future__ import annotations

import numpy as np

from ..field import FR
from .assignment import Assignment
from .cs import ConstraintSystem

__all__ = ["VerifyingKey", "ProvingKey", "keygen"]


class VerifyingKey:
    def __init__(self, k, cs, fixed_commitments, permutation_commitments):
        self.k = k
        self.n = 1 << k
        self.cs = cs
        self.fixed_commitments = fixed_commitments          # [num_fixed] G1
        self.permutation_commitments = permutation_commitments  # [num_perm_cols] G1
        self.transcript_repr = self._compute_repr()

    def _compute_repr(self) -> int:
        """halo2's pinned-vk digest: blake2b-512 (personal Halo2-Verify-Key)
        over the `format!("{:?}", vk.pinned())` Debug text with a u64 length
        prefix, wide-reduced into Fr — reimplemented byte-for-byte in
        plonk/pinned.py (PARITY.md #1; consumed by the reference at
        src/wnn.rs:226 via keygen_vk)."""
        from ..poly.domain import get_domain
        from .pinned import transcript_repr_from_pinned

        return transcript_repr_from_pinned(
            self, get_domain(self.k, self.cs.degree()))


class ProvingKey:
    def __init__(self, vk, fixed_values, sigma_values, assignment_template=None):
        self.vk = vk
        self.fixed_values = fixed_values  # list of object arrays [n]
        self.sigma_values = sigma_values  # list of object arrays [n], one per perm column
        # prover-filled caches
        self._cache = {}


def build_sigmas(cs: ConstraintSystem, assignment: Assignment, n: int):
    """Returns sigma value columns (list per permutation column, object [n])."""
    perm_cols = cs.permutation_columns
    col_pos = {(c.kind, c.index): j for j, c in enumerate(perm_cols)}
    m = len(perm_cols)

    # mapping as successor pointers, packed j * n + i
    mapping = np.arange(m * n, dtype=np.int64)
    parent = np.arange(m * n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def cell_index(cell):
        kind, col, row = cell
        j = col_pos.get((kind, col))
        if j is None:
            raise ValueError(
                f"copy constraint touches column ({kind}, {col}) without "
                f"equality enabled"
            )
        if row >= n:
            raise ValueError(f"copy constraint row {row} out of range")
        return j * n + row

    for a, b in assignment.copies:
        ia, ib = cell_index(a), cell_index(b)
        ra, rb = find(ia), find(ib)
        if ra == rb:
            continue
        parent[ra] = rb
        mapping[ia], mapping[ib] = mapping[ib], mapping[ia]

    # id(j, i) = delta^j * omega^i
    omega = FR.nth_root_of_unity(int(n).bit_length() - 1)
    omega_pows = np.empty(n, dtype=object)
    cur = 1
    for i in range(n):
        omega_pows[i] = cur
        cur = cur * omega % FR.p
    deltas = [pow(FR.delta, j, FR.p) for j in range(m)]

    sigmas = []
    for j in range(m):
        tgt = mapping[j * n : (j + 1) * n]
        tj = tgt // n
        ti = tgt % n
        col_vals = omega_pows[ti].copy()
        for jj in range(m):
            mask = tj == jj
            if mask.any():
                col_vals[mask] = (col_vals[mask] * deltas[jj]) % FR.p
        sigmas.append(col_vals)
    return sigmas


def keygen(circuit, k: int, srs, compress_selectors: bool = True) -> ProvingKey:
    """Generate pk (containing vk). `circuit` must carry an input-independent
    witness (e.g. the dummy zero image, as in the reference).

    `compress_selectors` packs boolean simple-selector columns into combined
    fixed columns exactly like halo2's keygen_vk does (fewer fixed
    commitments/evals, smaller proofs and verifier gas; see plonk/selectors.py)."""
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    n = 1 << k
    assignment = Assignment(cs, n)
    circuit.synthesize(config, assignment)
    assignment.finalize_tables()

    if compress_selectors:
        from .selectors import compress_selectors_pass

        compress_selectors_pass(cs, assignment)

    sigmas = build_sigmas(cs, assignment, n)

    # keygen's ~30 commitments are a one-time cost dominated by COMPILES, not
    # throughput: run them on the compile-light segscan pipeline (identical
    # points — exact group arithmetic) instead of paying the flush engine's
    # cold Pallas compile (~790 s of r4's 998.7 s keygen).
    # ZEROG_KEYGEN_MSM=flush restores the throughput engine.
    from ..curve.pippenger import msm_strategy
    import os as _os

    with msm_strategy(_os.environ.get("ZEROG_KEYGEN_MSM", "segscan")):
        fixed_commitments = (
            srs.commit_lagrange([list(col) for col in assignment.fixed])
            if cs.num_fixed
            else []
        )
        sigma_commitments = (
            srs.commit_lagrange([list(s) for s in sigmas]) if sigmas else [])

    vk = VerifyingKey(k, cs, fixed_commitments, sigma_commitments)
    return ProvingKey(vk, [col.copy() for col in assignment.fixed], sigmas)
