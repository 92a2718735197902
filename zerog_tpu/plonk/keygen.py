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

import hashlib

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
        from .expression import canonical_bytes

        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        h.update(self.k.to_bytes(4, "little"))
        h.update(self.cs.num_advice.to_bytes(4, "little"))
        h.update(self.cs.num_fixed.to_bytes(4, "little"))
        h.update(self.cs.num_instance.to_bytes(4, "little"))
        # canonical CS serialization (stable under repr/dataclass changes)
        for name, polys in self.cs.gates:
            h.update(b"G" + name.encode())
            for poly in polys:
                h.update(canonical_bytes(poly))
        for name, pairs in self.cs.lookups:
            h.update(b"L" + name.encode())
            for inp, tab in pairs:
                h.update(canonical_bytes(inp) + b"|" + canonical_bytes(tab))
        for c in self.cs.permutation_columns:
            h.update(b"M" + c.kind.encode() + str(c.index).encode())
        from ..curve.bn254 import g1_to_bytes

        for pt in self.fixed_commitments + self.permutation_commitments:
            h.update(g1_to_bytes(pt))
        return int.from_bytes(h.digest(), "little") % FR.p


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

    fixed_commitments = (
        srs.commit_lagrange([list(col) for col in assignment.fixed])
        if cs.num_fixed
        else []
    )
    sigma_commitments = srs.commit_lagrange([list(s) for s in sigmas]) if sigmas else []

    vk = VerifyingKey(k, cs, fixed_commitments, sigma_commitments)
    return ProvingKey(vk, [col.copy() for col in assignment.fixed], sigmas)
