"""EVM verifier e2e on the toy circuit: codegen from a real vk, local
dry-run gas, negative cases, and the full deploy/submit flow through the
JSON-RPC dev node.

Counterpart of the reference's EVM path (src/eth.rs + test_cli.sh:40-52).
Gated like test_plonk_e2e: producing the real proof is compile-bound on
XLA:CPU.
"""

import os

import pytest

if not (os.environ.get("ZEROG_SLOW_TESTS") or os.environ.get("ZEROG_TEST_TPU")):
    pytest.skip(
        "EVM verifier e2e needs a real proof (compile-bound on XLA:CPU); "
        "run with ZEROG_SLOW_TESTS=1",
        allow_module_level=True,
    )

from zerog_tpu.curve import Srs
from zerog_tpu.plonk import keygen, create_proof, verify_proof
from zerog_tpu.eth import gen_evm_verifier, dry_run_verifier, encode_calldata, Evm
from zerog_tpu.eth.client import EthClient

from test_plonk_mock import MulCircuit

K = 9


@pytest.fixture(scope="module")
def setup():
    srs = Srs.setup(K, seed=b"evm-e2e-test")
    pk = keygen(MulCircuit(0, 0), K, srs)
    proof = create_proof(pk, srs, MulCircuit(3, 5), [[15]], rng_seed=b"evm-1")
    assert verify_proof(pk.vk, srs, [[15]], proof)
    code = gen_evm_verifier(pk.vk, srs, [1])
    return srs, pk, proof, code


def test_dry_run_accepts_valid_proof(setup):
    _, _, proof, code = setup
    gas = dry_run_verifier(code, [[15]], proof)
    assert 0 < gas < 5_000_000


def test_dry_run_rejects_tampered_proof(setup):
    _, _, proof, code = setup
    for pos in (40, len(proof) // 2, len(proof) - 10):
        bad = bytearray(proof)
        bad[pos] ^= 1
        with pytest.raises(ValueError):
            dry_run_verifier(code, [[15]], bytes(bad))


def test_dry_run_rejects_wrong_instance(setup):
    _, _, proof, code = setup
    with pytest.raises(ValueError):
        dry_run_verifier(code, [[16]], proof)


def test_dry_run_rejects_truncated_calldata(setup):
    _, _, proof, code = setup
    evm = Evm()
    caller = (0xFE).to_bytes(20, "big")
    dep = evm.deploy(caller, code)
    assert dep.success
    calldata = encode_calldata([[15]], proof)
    assert not evm.call(caller, dep.address, calldata[:-32]).success
    assert not evm.call(caller, dep.address, calldata + b"\x00" * 32).success


def test_deploy_and_submit_via_rpc(setup):
    _, _, proof, code = setup
    client = EthClient("local")
    try:
        addr = client.deploy_contract(code)
        client.submit_proof(addr, proof, [[15]])  # raises on revert
        bad = bytearray(proof)
        bad[100] ^= 1
        with pytest.raises(ValueError):
            client.submit_proof(addr, bytes(bad), [[15]])
    finally:
        client.close()
