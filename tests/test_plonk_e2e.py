"""End-to-end PLONK tests on a toy circuit: keygen -> prove -> verify,
including tamper/negative cases. This exercises the full pipeline: MSM
commitments, lookup argument, permutation argument, quotient on the extended
domain, GWC multiopen, Keccak transcript, pairing check."""

import os

import pytest

if not (os.environ.get("ZEROG_SLOW_TESTS") or os.environ.get("ZEROG_TEST_TPU")):
    pytest.skip(
        "full prove/verify e2e is compile-bound on XLA:CPU (tens of minutes "
        "on a cold cache); run with ZEROG_SLOW_TESTS=1, or on the TPU via "
        "ZEROG_TEST_TPU=1 / the verify skill's CLI pipeline",
        allow_module_level=True,
    )

from zerog_tpu.curve import Srs
from zerog_tpu.field import FR
from zerog_tpu.plonk import keygen, create_proof, verify_proof

from test_plonk_mock import MulCircuit

K = 9


@pytest.fixture(scope="module")
def srs():
    return Srs.setup(K, seed=b"e2e-test")


@pytest.fixture(scope="module")
def pk(srs):
    return keygen(MulCircuit(0, 0), K, srs)


def test_prove_verify_roundtrip(srs, pk):
    circuit = MulCircuit(3, 5)
    proof = create_proof(pk, srs, circuit, [[15]], rng_seed=b"seed-1")
    assert verify_proof(pk.vk, srs, [[15]], proof)


def test_proof_deterministic_under_seed(srs, pk):
    p1 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"seed-xyz")
    p2 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"seed-xyz")
    assert p1 == p2
    p3 = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"other")
    assert p1 != p3
    assert verify_proof(pk.vk, srs, [[15]], p3)


def test_wrong_instance_rejected(srs, pk):
    proof = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"s")
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[16]], proof)


def test_tampered_proof_rejected(srs, pk):
    proof = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"s")
    bad = bytearray(proof)
    bad[40] ^= 1
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [[15]], bytes(bad))


def test_lying_witness_fails_grand_product(srs, pk):
    # witness with a out of the byte table: the lookup permute must fail
    with pytest.raises(ValueError):
        create_proof(pk, srs, MulCircuit(300, 1), [[300]], rng_seed=b"s")
