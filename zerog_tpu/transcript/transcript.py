"""Fiat-Shamir transcripts.

Two flavors, mirroring what the reference uses (src/wnn.rs:241-260):

- :class:`KeccakTranscript` — the EVM transcript (snark-verifier's
  ``EvmTranscript`` convention): big-endian 32-byte encodings, challenge =
  keccak256(buffer) mod r, buffer reset to the digest after each squeeze, and
  a 0x01 domain byte appended when squeezing twice with no new data. Proof
  bytes are scalars/points in 32-byte BE, points uncompressed x||y. The
  reference uses this for BOTH prove and verify so proofs verify on-chain.
- :class:`Blake2bTranscript` — native-only flow (halo2's default writer).

Writer and Reader variants share absorption logic so challenges replay.
"""

from __future__ import annotations

import hashlib

from ..field import FR, FQ
from ..curve.bn254 import g1_is_on_curve
from .keccak import keccak256

__all__ = [
    "KeccakTranscriptWriter", "KeccakTranscriptReader",
    "Blake2bTranscriptWriter", "Blake2bTranscriptReader",
]


class _KeccakCore:
    def __init__(self):
        self.buf = b""

    def common_scalar(self, s: int):
        self.buf += (int(s) % FR.p).to_bytes(32, "big")

    def common_point(self, pt):
        x, y = pt if pt is not None else (0, 0)
        self.buf += int(x).to_bytes(32, "big")
        self.buf += int(y).to_bytes(32, "big")

    def squeeze_challenge(self) -> int:
        if len(self.buf) == 32:
            # consecutive squeeze with no new data: domain-separate
            self.buf += b"\x01"
        digest = keccak256(self.buf)
        self.buf = digest
        return int.from_bytes(digest, "big") % FR.p


class KeccakTranscriptWriter(_KeccakCore):
    def __init__(self):
        super().__init__()
        self.proof = bytearray()

    def write_scalar(self, s: int):
        self.common_scalar(s)
        self.proof += (int(s) % FR.p).to_bytes(32, "big")

    def write_point(self, pt):
        self.common_point(pt)
        x, y = pt if pt is not None else (0, 0)
        self.proof += int(x).to_bytes(32, "big")
        self.proof += int(y).to_bytes(32, "big")

    def finalize(self) -> bytes:
        return bytes(self.proof)


class KeccakTranscriptReader(_KeccakCore):
    def __init__(self, proof: bytes):
        super().__init__()
        self.data = proof
        self.off = 0

    def _take(self, n: int) -> bytes:
        if self.off + n > len(self.data):
            raise ValueError("proof too short")
        b = self.data[self.off : self.off + n]
        self.off += n
        return b

    def read_scalar(self) -> int:
        v = int.from_bytes(self._take(32), "big")
        if v >= FR.p:
            raise ValueError("non-canonical scalar in proof")
        self.common_scalar(v)
        return v

    def read_point(self):
        x = int.from_bytes(self._take(32), "big")
        y = int.from_bytes(self._take(32), "big")
        if x >= FQ.p or y >= FQ.p:
            raise ValueError("non-canonical point coordinate")
        pt = (x, y) if not (x == 0 and y == 0) else None
        if not g1_is_on_curve(pt):
            raise ValueError("proof point not on curve")
        self.common_point(pt)
        return pt

    def finished(self) -> bool:
        return self.off == len(self.data)


class _Blake2bCore:
    """halo2's Blake2bWrite/Blake2bRead transcript (halo2_proofs
    v2023_04_20 `transcript.rs`): domain-prefix byte before each item;
    absorption uses UNCOMPRESSED affine coordinates (x LE || y LE) while
    proof bytes use the COMPRESSED 32-byte codec; squeeze clones the state
    (prefix only — the digest is NOT absorbed back)."""

    _PREFIX_CHALLENGE = b"\x00"
    _PREFIX_POINT = b"\x01"
    _PREFIX_SCALAR = b"\x02"

    def __init__(self):
        self.state = hashlib.blake2b(person=b"Halo2-Transcript")

    def common_scalar(self, s: int):
        self.state.update(self._PREFIX_SCALAR)
        self.state.update((int(s) % FR.p).to_bytes(32, "little"))

    def common_point(self, pt):
        self.state.update(self._PREFIX_POINT)
        if pt is None:
            # halo2 errors on the identity (coordinates() is None); an
            # identity commitment cannot occur for blinded polynomials
            raise ValueError(
                "cannot absorb the identity point into a Blake2b transcript")
        x, y = pt
        self.state.update(int(x).to_bytes(32, "little"))
        self.state.update(int(y).to_bytes(32, "little"))

    def squeeze_challenge(self) -> int:
        self.state.update(self._PREFIX_CHALLENGE)
        digest = self.state.copy().digest()  # 64 bytes, wide-reduced mod r
        return int.from_bytes(digest, "little") % FR.p


class Blake2bTranscriptWriter(_Blake2bCore):
    def __init__(self):
        super().__init__()
        self.proof = bytearray()

    def write_scalar(self, s: int):
        self.common_scalar(s)
        self.proof += (int(s) % FR.p).to_bytes(32, "little")

    def write_point(self, pt):
        from ..curve.bn254 import g1_to_compressed

        self.common_point(pt)
        self.proof += g1_to_compressed(pt)

    def finalize(self) -> bytes:
        return bytes(self.proof)


class Blake2bTranscriptReader(_Blake2bCore):
    def __init__(self, proof: bytes):
        super().__init__()
        self.data = proof
        self.off = 0

    def _take(self, n: int) -> bytes:
        if self.off + n > len(self.data):
            raise ValueError("proof too short")
        b = self.data[self.off : self.off + n]
        self.off += n
        return b

    def read_scalar(self) -> int:
        v = int.from_bytes(self._take(32), "little")
        if v >= FR.p:
            raise ValueError("non-canonical scalar in proof")
        self.common_scalar(v)
        return v

    def read_point(self):
        from ..curve.bn254 import g1_from_compressed

        # g1_from_compressed rejects non-canonical x and off-curve inputs
        # (distinct byte encodings of one point would be proof malleability)
        pt = g1_from_compressed(self._take(32))
        self.common_point(pt)
        return pt

    def finished(self) -> bool:
        return self.off == len(self.data)
