"""Unit tests for the EVM layer: assembler, executor, RLP, secp256k1, and the
JSON-RPC client against the in-process dev node. The full verifier-contract
e2e (codegen + dry run on a real proof) lives in test_evm_verifier.py since
it needs a proof."""

import pytest

from zerog_tpu.eth.evm_asm import Asm, deployment_code
from zerog_tpu.eth.evm import Evm
from zerog_tpu.eth.rlp import rlp_encode, rlp_decode
from zerog_tpu.eth.secp256k1 import sign, ecrecover, address_of_key
from zerog_tpu.transcript.keccak import keccak256

CALLER = (0xFE).to_bytes(20, "big")


def _run(asm: Asm, calldata: bytes = b""):
    evm = Evm()
    dep = evm.deploy(CALLER, deployment_code(asm.assemble()))
    assert dep.success
    return evm.call(CALLER, dep.address, calldata)


def test_deploy_returns_runtime():
    a = Asm()
    a.push(0).push(0).op("RETURN")
    rt = a.assemble()
    evm = Evm()
    dep = evm.deploy(CALLER, deployment_code(rt))
    assert dep.success and evm.code[dep.address] == rt


def test_arithmetic_and_memory():
    a = Asm()
    a.push(7).push(5).op("MUL")          # 35
    a.push(3).op("ADD")                  # 38 (ADD pops 3, 35)
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    r = _run(a)
    assert r.success and int.from_bytes(r.output, "big") == 38


def test_mulmod_addmod():
    p = 97
    a = Asm()
    a.push(p).push(50).push(60).op("MULMOD")   # 60*50 % 97 = 3000 % 97
    a.push(0).op("MSTORE")
    a.push(p).push(90).push(20).op("ADDMOD")   # 110 % 97 = 13
    a.push(32).op("MSTORE")
    a.push(64).push(0).op("RETURN")
    r = _run(a)
    assert int.from_bytes(r.output[:32], "big") == 3000 % 97
    assert int.from_bytes(r.output[32:], "big") == 13


def test_keccak_matches_host():
    a = Asm()
    a.push(int.from_bytes(b"Z" * 32, "big")).push(0).op("MSTORE")
    a.push(32).push(0).op("KECCAK256")
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    assert _run(a).output == keccak256(b"Z" * 32)


def test_calldata_ops():
    a = Asm()
    a.push(4).op("CALLDATALOAD")
    a.push(0).op("MSTORE")
    a.op("CALLDATASIZE").push(32).op("MSTORE")
    a.push(64).push(0).op("RETURN")
    data = bytes(range(1, 41))
    r = _run(a, data)
    assert r.output[:32] == data[4:36]
    assert int.from_bytes(r.output[32:], "big") == 40


def test_jumps_and_revert():
    a = Asm()
    a.push(0).op("CALLDATALOAD").jumpi("ok")
    a.push(0).push(0).op("REVERT")
    a.label("ok")
    a.push(1).push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    assert _run(a, b"\x01".rjust(32, b"\x00")).success
    assert not _run(a, b"").success


def test_ec_precompiles_match_host():
    from zerog_tpu.curve.bn254 import g1_mul, g1_add, G1_GEN

    a = Asm()
    # 7*G via ecmul into 0x80
    a.push(1).push(0).op("MSTORE")
    a.push(2).push(32).op("MSTORE")
    a.push(7).push(64).op("MSTORE")
    a.push(0x40).push(0x80).push(0x60).push(0).push(7).op("GAS", "STATICCALL", "POP")
    # (7G) + G via ecadd into 0x80 (input: 7G at 0x80.. plus G at 0xC0)
    a.push(1).push(0xC0).op("MSTORE")
    a.push(2).push(0xE0).op("MSTORE")
    a.push(0x40).push(0x80).push(0x80).push(0x80).push(6).op("GAS", "STATICCALL", "POP")
    a.push(0x40).push(0x80).op("RETURN")
    r = _run(a)
    want = g1_add(g1_mul(G1_GEN, 7), G1_GEN)
    got = (int.from_bytes(r.output[:32], "big"), int.from_bytes(r.output[32:], "big"))
    assert got == want


def test_pairing_precompile_trivial():
    # e(G1, G2) * e(-G1, G2) == 1
    from zerog_tpu.curve.bn254 import G1_GEN, G2_GEN, g1_neg

    def write_pair(a, base, g1, g2):
        x, y = g1
        (xr, xi), (yr, yi) = g2
        for i, v in enumerate((x, y, xi, xr, yi, yr)):
            a.push(v).push(base + 32 * i).op("MSTORE")

    a = Asm()
    write_pair(a, 0, G1_GEN, G2_GEN)
    write_pair(a, 192, g1_neg(G1_GEN), G2_GEN)
    a.push(0x20).push(0x180).push(0x180).push(0).push(8).op("GAS", "STATICCALL", "POP")
    a.push(0x20).push(0x180).op("RETURN")
    r = _run(a)
    assert int.from_bytes(r.output, "big") == 1


def test_modexp_precompile():
    a = Asm()
    for off, v in ((0, 32), (32, 32), (64, 32), (96, 5), (128, 3), (160, 97)):
        a.push(v).push(off).op("MSTORE")
    a.push(0x20).push(0x180).push(0xC0).push(0).push(5).op("GAS", "STATICCALL", "POP")
    a.push(0x20).push(0x180).op("RETURN")
    r = _run(a)
    assert int.from_bytes(r.output, "big") == pow(5, 3, 97)


def test_rlp_roundtrip():
    cases = [
        b"",
        b"\x00",
        b"\x7f",
        b"\x80",
        b"a" * 55,
        b"b" * 56,
        [b"\x01", [b"", b"abc"], b"x" * 60],
    ]
    for c in cases:
        assert rlp_decode(rlp_encode(c)) == c
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(127) == b"\x7f"
    assert rlp_encode(256) == b"\x82\x01\x00"


def test_rlp_rejects_noncanonical():
    with pytest.raises(ValueError):
        rlp_decode(b"\x81\x01")  # single byte < 0x80 must be encoded directly
    with pytest.raises(ValueError):
        rlp_decode(rlp_encode(b"hello") + b"\x00")  # trailing bytes


def test_secp256k1_sign_recover():
    priv = 0x1234_5678_9ABC
    msg = keccak256(b"transaction payload")
    v, r, s = sign(msg, priv)
    assert ecrecover(msg, v, r, s) == address_of_key(priv)
    assert ecrecover(keccak256(b"other"), v, r, s) != address_of_key(priv)
    # high-s is normalized
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
    assert s <= n // 2


def test_client_deploy_and_call_roundtrip():
    """Full wire path: sign tx -> RPC over HTTP -> local node -> executor."""
    from zerog_tpu.eth.client import EthClient

    # contract: returns calldata[0:32] + 1
    a = Asm()
    a.push(0).op("CALLDATALOAD").push(1).op("ADD")
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    client = EthClient("local")
    try:
        addr = client.deploy_contract(deployment_code(a.assemble()))
        assert addr.startswith("0x") and len(addr) == 42
        node = client._node
        res = node.evm.call(CALLER, bytes.fromhex(addr[2:]),
                            (41).to_bytes(32, "big"))
        assert int.from_bytes(res.output, "big") == 42
    finally:
        client.close()


def test_local_node_state_persistence(tmp_path):
    """A contract deployed by one LocalNode process is callable from a fresh
    node sharing the state file (the test_cli.sh deploy -> submit flow), and
    calls to code-less accounts are rejected rather than trivially
    succeeding."""
    import pytest

    from zerog_tpu.eth.client import DEV_PRIVATE_KEY, LocalNode
    from zerog_tpu.eth.rlp import rlp_encode
    from zerog_tpu.eth.secp256k1 import address_of_key, sign
    from zerog_tpu.transcript.keccak import keccak256

    state = str(tmp_path / "devnode.json")
    sender_key = DEV_PRIVATE_KEY
    sender = address_of_key(sender_key)

    def send(node, to, data):
        nonce = node.evm.nonces.get(sender, 0)
        fields = [nonce, 10**9, 1_000_000, to or b"", 0, data]
        sighash = keccak256(rlp_encode(fields + [node.chain_id, b"", b""]))
        parity, r, s = sign(sighash, sender_key)
        v = 35 + 2 * node.chain_id + parity
        raw = rlp_encode(fields + [v, r, s])
        txh = node._send_raw(raw)
        return node.receipts[txh]

    # initcode returning runtime 0x6001600055 (SSTORE(0, 1)) -> runtime code
    runtime = bytes.fromhex("6001600055")
    initcode = bytes.fromhex("600580600b6000396000f3") + runtime

    node1 = LocalNode(state_path=state)
    receipt = send(node1, None, initcode)
    assert receipt["status"] == "0x1"
    addr = bytes.fromhex(receipt["contractAddress"][2:])

    # fresh node, same state file: the code must be there and callable
    node2 = LocalNode(state_path=state)
    assert node2.evm.code[addr] == runtime
    receipt2 = send(node2, addr, b"")
    assert receipt2["status"] == "0x1"
    assert node2.evm.storage[addr][0] == 1

    # a call into an address with NO code must be rejected, not succeed
    with pytest.raises(ValueError, match="no contract code"):
        send(node2, b"\xaa" * 20, b"")
