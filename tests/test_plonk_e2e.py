"""End-to-end PLONK tests: keygen -> prove -> verify, including
tamper/negative cases. This exercises the full pipeline: MSM commitments,
lookup argument, permutation argument, quotient on the extended domain, GWC
multiopen, Keccak transcript, pairing check.

The k=6 nibble-circuit e2e runs in the default suite; the larger k=9 matrix
is gated behind ZEROG_SLOW_TESTS (compile-bound on XLA:CPU)."""

import os

import pytest

from zerog_tpu.curve import Srs
from zerog_tpu.field import FR
from zerog_tpu.plonk import keygen, create_proof, verify_proof

from test_plonk_mock import MulCircuit
from test_sharded_prover import NibbleMulCircuit

K = 9


# ---- small e2e, always on ----------------------------------------------------

@pytest.fixture()
def small(k6_setup):
    return k6_setup


def test_small_prove_verify_and_tamper(small, k6_proof):
    srs, pk = small
    proof = k6_proof
    assert verify_proof(pk.vk, srs, [[15]], proof)
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[16]], proof)
    bad = bytearray(proof)
    bad[40] ^= 1
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[15]], bytes(bad))


def test_blake2b_transcript_roundtrip(small):
    """The native (non-EVM) transcript flavor proves and verifies end to end
    and is domain-separated from the Keccak flow (halo2's default Blake2b
    writer; reference src/wnn.rs uses Keccak for EVM compatibility)."""
    from zerog_tpu.transcript import (
        Blake2bTranscriptReader, Blake2bTranscriptWriter,
    )

    srs, pk = small
    proof = create_proof(pk, srs, NibbleMulCircuit(3, 5), [[15]],
                         rng_seed=b"b2b-1",
                         transcript=Blake2bTranscriptWriter())
    assert verify_proof(pk.vk, srs, [[15]], proof,
                        transcript=Blake2bTranscriptReader(proof))
    # a Blake2b proof must not verify under the Keccak transcript
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[15]], proof)


# ---- k=9 matrix, gated --------------------------------------------------------

slow = pytest.mark.skipif(
    not (os.environ.get("ZEROG_SLOW_TESTS") or os.environ.get("ZEROG_TEST_TPU")),
    reason="k=9 prove/verify e2e is compile-bound on XLA:CPU (tens of "
           "minutes on a cold cache); run with ZEROG_SLOW_TESTS=1, or on "
           "the TPU via ZEROG_TEST_TPU=1 / the verify skill's CLI pipeline",
)


@pytest.fixture(scope="module")
def srs():
    return Srs.setup(K, seed=b"e2e-test")


@pytest.fixture(scope="module")
def pk(srs):
    return keygen(MulCircuit(0, 0), K, srs)


@slow
def test_prove_verify_roundtrip(srs, pk):
    circuit = MulCircuit(3, 5)
    proof = create_proof(pk, srs, circuit, [[15]], rng_seed=b"seed-1")
    assert verify_proof(pk.vk, srs, [[15]], proof)


@slow
def test_proof_deterministic_under_seed(srs, pk):
    p1 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"seed-xyz")
    p2 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"seed-xyz")
    assert p1 == p2
    p3 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"other")
    assert p1 != p3
    assert verify_proof(pk.vk, srs, [[15]], p3)


@slow
def test_wrong_instance_rejected(srs, pk):
    proof = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"s")
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[16]], proof)


@slow
def test_tampered_proof_rejected(srs, pk):
    proof = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"s")
    bad = bytearray(proof)
    bad[40] ^= 1
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[15]], bytes(bad))


@slow
def test_lying_witness_fails_grand_product(srs, pk):
    # witness with a out of the byte table: the lookup permute must fail
    with pytest.raises(ValueError):
        create_proof(pk, srs, MulCircuit(300, 1), [[300]], rng_seed=b"s")
