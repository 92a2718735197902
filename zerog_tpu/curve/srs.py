"""KZG structured reference string (powers of tau), the `ParamsKZG` equivalent
(reference consumes it at src/wnn.rs:222-276, generated at src/main.rs:232,
serialized at src/io.rs:139-146).

Holds both the monomial basis {tau^i G} and the Lagrange basis {L_i(tau) G}
(as halo2's ParamsKZG does), so the prover can commit Lagrange-form
polynomials without an iNTT. Generation runs the fixed-base expansion on TPU;
tau is derived from a seed (INSECURE test setup, same trust model as
`ParamsKZG::setup` with a known RNG).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from ..field import FR, batch_inv
from .bn254 import (
    G1_GEN, G2_GEN, g2_mul, g1_to_bytes, g1_from_bytes, g2_to_bytes, g2_from_bytes,
)
from .pippenger import fixed_base_expand, msm
from .jpoints import points_to_device

__all__ = ["Srs"]

_MAGIC = b"ZGTPUSRS"


class Srs:
    def __init__(self, k: int, g, g_lagrange, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g = g                  # [n] affine host points, g[i] = tau^i * G
        self.g_lagrange = g_lagrange  # [n] affine host points, L_i(tau) * G
        self.g2 = g2
        self.s_g2 = s_g2
        self._g_dev = None
        self._lag_dev = None

    # ---- generation ------------------------------------------------------
    @classmethod
    def setup(cls, k: int, seed: bytes | int = b"zerog-tpu-test-srs", tau: int | None = None):
        n = 1 << k
        if tau is None:
            if isinstance(seed, int):
                seed = seed.to_bytes(32, "little")
            tau = int.from_bytes(hashlib.blake2b(seed, digest_size=32).digest(), "little") % FR.p
        # monomial scalars
        powers = [1] * n
        for i in range(1, n):
            powers[i] = powers[i - 1] * tau % FR.p
        g = fixed_base_expand(G1_GEN, powers)
        # lagrange scalars: L_i(tau) = w^i/n * (tau^n - 1)/(tau - w^i)
        omega = FR.nth_root_of_unity(k)
        tn1 = (pow(tau, n, FR.p) - 1) % FR.p
        if tn1 == 0:
            raise ValueError("tau in evaluation domain; pick another seed")
        wpows = [1] * n
        for i in range(1, n):
            wpows[i] = wpows[i - 1] * omega % FR.p
        denoms = [(tau - w) % FR.p for w in wpows]
        dinv = batch_inv(denoms, FR.p)
        ninv = FR.inv(n)
        lag_scalars = [w * ninv % FR.p * tn1 % FR.p * d % FR.p for w, d in zip(wpows, dinv)]
        g_lagrange = fixed_base_expand(G1_GEN, lag_scalars)
        return cls(k, g, g_lagrange, G2_GEN, g2_mul(G2_GEN, tau))

    # ---- device caches ---------------------------------------------------
    def g_dev(self):
        if self._g_dev is None:
            self._g_dev = points_to_device(self.g)
        return self._g_dev

    def g_lagrange_dev(self):
        if self._lag_dev is None:
            self._lag_dev = points_to_device(self.g_lagrange)
        return self._lag_dev

    # ---- commitments -----------------------------------------------------
    MAX_BATCH = 2  # commitments per device launch (compile + HBM bounds)

    def _msm_chunked(self, rows, pdev):
        out = []
        for i in range(0, len(rows), self.MAX_BATCH):
            out.extend(msm(rows[i : i + self.MAX_BATCH], pdev))
        return out

    def commit_lagrange(self, values):
        """values: [n] ints or [B][n] -> affine point(s). KZG ignores blinds
        (hiding comes from randomized rows, as in halo2)."""
        single = not isinstance(values[0], (list, tuple, np.ndarray))
        rows = [values] if single else list(values)
        out = self._msm_chunked(rows, self.g_lagrange_dev())
        return out[0] if single else out

    def commit(self, coeffs):
        """Commit coefficient-form poly(s) of length <= n."""
        single = not isinstance(coeffs[0], (list, tuple, np.ndarray))
        rows = [coeffs] if single else list(coeffs)
        n = self.n
        padded = [list(r) + [0] * (n - len(r)) for r in rows]
        out = self._msm_chunked(padded, self.g_dev())
        return out[0] if single else out

    # ---- serialization (k:u32 LE || g || g_lagrange || g2 || s_g2) -------
    def write(self, path):
        with open(path, "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<I", self.k))
            for pt in self.g:
                f.write(g1_to_bytes(pt))
            for pt in self.g_lagrange:
                f.write(g1_to_bytes(pt))
            f.write(g2_to_bytes(self.g2))
            f.write(g2_to_bytes(self.s_g2))

    @classmethod
    def read(cls, path):
        with open(path, "rb") as f:
            data = f.read()
        off = 0
        if data[:8] == _MAGIC:
            off = 8
        (k,) = struct.unpack_from("<I", data, off)
        off += 4
        n = 1 << k
        g = []
        for _ in range(n):
            g.append(g1_from_bytes(data[off : off + 64]))
            off += 64
        lag = []
        for _ in range(n):
            lag.append(g1_from_bytes(data[off : off + 64]))
            off += 64
        g2 = g2_from_bytes(data[off : off + 128])
        off += 128
        s_g2 = g2_from_bytes(data[off : off + 128])
        # G2 has cofactor > 1: on-curve alone does not imply r-torsion
        # membership, so check [r]P = O for both G2 points of a loaded SRS.
        for pt in (g2, s_g2):
            if g2_mul(pt, FR.p) is not None:
                raise ValueError("SRS G2 point not in the r-torsion subgroup")
        return cls(k, g, lag, g2, s_g2)
