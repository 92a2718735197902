"""SRS serialization: native format round-trip, halo2 ParamsKZG RawBytes
interop (reference src/io.rs:139-146), and tamper rejection."""

import pytest

from zerog_tpu.curve import Srs
from zerog_tpu.curve.bn254 import G1_GEN, G2_GEN
from zerog_tpu.curve.srs import (
    _fq_to_halo2, _fq_from_halo2, _g1_to_halo2, _g1_from_halo2,
)
from zerog_tpu.field import FQ

K = 4


@pytest.fixture(scope="module")
def srs():
    return Srs.setup(K, seed=b"srs-io-test")


def test_native_roundtrip(tmp_path, srs):
    p = tmp_path / "srs.bin"
    srs.write(p)
    got = Srs.read(p)
    assert got.k == srs.k and got.g == srs.g
    assert got.g_lagrange == srs.g_lagrange
    assert got.g2 == srs.g2 and got.s_g2 == srs.s_g2


def test_halo2_roundtrip(tmp_path, srs):
    p = tmp_path / "srs_halo2.bin"
    srs.write(p, fmt="halo2")
    got = Srs.read(p)  # autodetected
    assert got.k == srs.k and got.g == srs.g
    assert got.g_lagrange == srs.g_lagrange
    assert got.g2 == srs.g2 and got.s_g2 == srs.s_g2


def test_halo2_byte_layout(tmp_path, srs):
    """Byte-level checks against the documented halo2curves RawBytes layout:
    k as u32 LE, then g[0] = G1 generator with coordinates in Montgomery form
    (v * 2^256 mod q) little-endian."""
    p = tmp_path / "srs_halo2.bin"
    srs.write(p, fmt="halo2")
    data = p.read_bytes()
    n = 1 << K
    assert len(data) == 4 + 2 * n * 64 + 2 * 128
    assert data[:4] == K.to_bytes(4, "little")
    mont = lambda v: (v * (1 << 256) % FQ.p).to_bytes(32, "little")
    assert srs.g[0] == G1_GEN
    assert data[4:36] == mont(1)
    assert data[36:68] == mont(2)
    # g2 generator x.c0 is the first G2 coordinate
    g2_off = 4 + 2 * n * 64
    assert data[g2_off : g2_off + 32] == mont(srs.g2[0][0])
    assert srs.g2 == G2_GEN


def test_halo2_fq_codec():
    for v in (0, 1, 2, FQ.p - 1, 12345678901234567890):
        assert _fq_from_halo2(_fq_to_halo2(v)) == v
    with pytest.raises(ValueError):
        _fq_from_halo2(FQ.p.to_bytes(32, "little"))  # non-canonical raw


def test_halo2_rejects_off_curve():
    bad = _fq_to_halo2(1) + _fq_to_halo2(3)
    with pytest.raises(ValueError):
        _g1_from_halo2(bad)
    assert _g1_from_halo2(_g1_to_halo2(None)) is None


def test_read_rejects_truncated(tmp_path, srs):
    p = tmp_path / "srs.bin"
    srs.write(p)
    data = p.read_bytes()
    q = tmp_path / "short.bin"
    q.write_bytes(data[:-7])
    with pytest.raises(ValueError):
        Srs.read(q)
