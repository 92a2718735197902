"""Transcript known-answer vectors (VERDICT r02 item 7).

Pins the exact byte conventions of the EVM (Keccak) transcript — the
encoding both the prover and the generated EVM verifier rely on — so a
refactor cannot silently change proof encoding. Conventions derived from
reading snark-verifier's `EvmTranscript` (the reference consumes it at
src/wnn.rs:241-260; snark-verifier tag v2023_04_20,
`snark_verifier::system::halo2::transcript::evm`):

- scalars absorb/serialize as 32-byte BIG-endian EVM words;
- points absorb/serialize as x || y, each a 32-byte BE Fq word, identity as
  (0, 0);
- squeeze = keccak256(buffer), challenge = digest interpreted BE mod r, and
  the buffer RESETS to the digest;
- a consecutive squeeze with no intervening absorption appends a single
  0x01 domain byte before hashing (snark-verifier's "prevent challenger
  collision" byte).

The Blake2b transcript is the halo2-style native flow: 64-byte Blake2b with
personal b"Halo2-Transcript", prefix bytes 0x00/0x01/0x02 for
challenge/point/scalar, little-endian 32-byte reprs, challenge = 64-byte
digest LE mod r (halo2's Challenge255 wide reduction).

All expected values below are frozen hex of the current implementation,
cross-checked where an independent source exists (keccak256(b"") is the
canonical Ethereum empty hash).
"""

from zerog_tpu.curve.bn254 import G1_GEN
from zerog_tpu.field import FR
from zerog_tpu.transcript import (
    Blake2bTranscriptWriter, KeccakTranscriptWriter, KeccakTranscriptReader,
    keccak256,
)

# canonical Ethereum empty-input hash — independent ground truth for keccak
KECCAK_EMPTY = "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"


def test_keccak256_empty_canonical():
    assert keccak256(b"").hex() == KECCAK_EMPTY


def test_keccak_empty_squeeze_is_empty_hash_mod_r():
    t = KeccakTranscriptWriter()
    c = t.squeeze_challenge()
    assert c == int(KECCAK_EMPTY, 16) % FR.p
    assert c == 0x4410C360230A295B13D66D8D6C1A24C44311531E39C64F66C7301B49D85A46C


def test_keccak_double_squeeze_appends_0x01():
    t = KeccakTranscriptWriter()
    d0 = keccak256(b"")
    t.squeeze_challenge()
    # second squeeze with no new data: buffer is the previous digest (32
    # bytes), so the 0x01 domain byte is appended before hashing
    c1 = t.squeeze_challenge()
    assert c1 == int.from_bytes(keccak256(d0 + b"\x01"), "big") % FR.p
    assert c1 == 0xE7E3D5288737B27CE0BCEF671FEC5428BFE98CA07394A2EF526D21DB4E26195


def test_keccak_point_scalar_encoding_and_squeeze():
    t = KeccakTranscriptWriter()
    t.write_point(G1_GEN)   # (1, 2): 32-byte BE x || 32-byte BE y
    t.write_scalar(7)
    assert t.finalize().hex() == (
        "0000000000000000000000000000000000000000000000000000000000000001"
        "0000000000000000000000000000000000000000000000000000000000000002"
        "0000000000000000000000000000000000000000000000000000000000000007"
    )
    c = t.squeeze_challenge()
    assert c == 0x1FD01B194948C635358FBB51B4A5F32F8CEAB4DC4153E0230215F8AFC94EE434
    # absorption after a squeeze APPENDS to the digest-reset buffer
    expected = int.from_bytes(
        keccak256(
            (1).to_bytes(32, "big") + (2).to_bytes(32, "big")
            + (7).to_bytes(32, "big")
        ),
        "big",
    ) % FR.p
    assert c == expected


def test_keccak_reader_replays_writer():
    w = KeccakTranscriptWriter()
    w.write_point(G1_GEN)
    cw = w.squeeze_challenge()
    w.write_scalar(11)
    cw2 = w.squeeze_challenge()
    r = KeccakTranscriptReader(w.finalize())
    assert r.read_point() == G1_GEN
    assert r.squeeze_challenge() == cw
    assert r.read_scalar() == 11
    assert r.squeeze_challenge() == cw2
    assert r.finished()


def test_blake2b_vectors():
    b = Blake2bTranscriptWriter()
    assert b.squeeze_challenge() == (
        0xE89C2C9EF365F095EC7AA36500BB0BA58BF7D5E17194055AFB5A1C746F1786A
    )
    b2 = Blake2bTranscriptWriter()
    b2.write_point(G1_GEN)
    b2.write_scalar(7)
    assert b2.squeeze_challenge() == (
        0x2B8226AFAE9DEC568EC24D203B795119BCE5432B20D89C2AACA1683608DFED2D
    )
    # second consecutive squeeze: halo2 does NOT absorb the digest back, so
    # this pins the r5 removal of the extra state.update (PARITY.md #4)
    assert b2.squeeze_challenge() == (
        0x27C372F879C0C64EAE9278564AB3445DEC8F726A678E24F33CFEEFC0FB226858
    )


def test_blake2b_compressed_point_codec():
    """halo2curves-style compressed codec: x LE with y-parity in bit 255;
    identity = 32 zero bytes; proof points are 32 bytes (PARITY.md #3)."""
    from zerog_tpu.curve.bn254 import (
        g1_mul, g1_to_compressed, g1_from_compressed)

    assert g1_to_compressed(G1_GEN) == b"\x01" + b"\x00" * 31  # y=2 is even
    for s in (1, 2, 3, 12345, 98765):
        pt = g1_mul(G1_GEN, s)
        enc = g1_to_compressed(pt)
        assert len(enc) == 32 and g1_from_compressed(enc) == pt
    assert g1_from_compressed(b"\x00" * 32) is None
    b = Blake2bTranscriptWriter()
    b.write_point(G1_GEN)
    assert len(b.finalize()) == 32


def test_transcripts_domain_separated():
    """Keccak and Blake2b transcripts must never derive equal challenges for
    the same absorbed data (r01 regression: shared prefix conventions)."""
    k = KeccakTranscriptWriter()
    b = Blake2bTranscriptWriter()
    for t in (k, b):
        t.write_point(G1_GEN)
        t.write_scalar(3)
    assert k.squeeze_challenge() != b.squeeze_challenge()
