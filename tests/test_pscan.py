"""Parity: the Pallas flush-scan / fold kernels must reproduce the XLA
pipeline bit for bit.

These tests need a real TPU: Pallas interpret mode on CPU evaluates the
~800-op Montgomery body per limb-row eagerly and takes tens of minutes even
for an 8-row stream, so they skip on the CPU backend. On-chip validation runs
via ``scripts/bench_pscan.py`` (asserts affine/jac scan parity AND full
fixed-base MSM parity against the XLA engine); set ZEROG_TEST_TPU=1 to run
this file on real hardware through pytest.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zerog_tpu.field import FR, FQ, to_limbs
from zerog_tpu.curve import pippenger as pp
from zerog_tpu.curve.bn254 import G1_GEN, g1_mul
from zerog_tpu.curve.jpoints import points_to_device

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas interpret mode is impractically slow on CPU; parity is "
           "asserted on-chip by scripts/bench_pscan.py",
)


def _with_engine(val):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("ZEROG_MSM_PALLAS")
            os.environ["ZEROG_MSM_PALLAS"] = val

        def __exit__(self, *a):
            if self.old is None:
                del os.environ["ZEROG_MSM_PALLAS"]
            else:
                os.environ["ZEROG_MSM_PALLAS"] = self.old

    return _Ctx()


def _toy_stream(r=64, g=2, c=8, seed=3):
    """Random affine stream with flags mimicking sorted digit runs."""
    rng = np.random.default_rng(seed)
    n = r * g * c
    pts = [g1_mul(G1_GEN, int(s)) for s in rng.integers(1, 1 << 30, n)]
    px, py, pv = points_to_device(pts)
    sx = jnp.asarray(px).reshape(r, g, c, 16)
    sy = jnp.asarray(py).reshape(r, g, c, 16)
    sv = jnp.asarray(pv).reshape(r, g, c)
    sv = sv.at[5, :, 2].set(False)
    flags = jnp.asarray(rng.random((r, g, c)) < 0.1)
    flags = flags.at[0].set(True)
    return (sx, sy, sv), flags


def test_flush_scan_pallas_matches_xla():
    stream, flags = _toy_stream()
    with _with_engine("0"):
        ref = pp._flush_scan(stream, flags, affine=True)
    with _with_engine("1"):
        got = pp._flush_scan(stream, flags, affine=True)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_flush_scan_pallas_jac_matches_xla():
    (sx, sy, sv), flags = _toy_stream(seed=9)
    one = jnp.asarray(to_limbs(FQ.r_mont))
    sz = jnp.where(sv[..., None], jnp.broadcast_to(one, sx.shape),
                   jnp.zeros_like(sx))
    with _with_engine("0"):
        ref = pp._flush_scan((sx, sy, sz), flags, affine=False)
    with _with_engine("1"):
        got = pp._flush_scan((sx, sy, sz), flags, affine=False)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_msm_fixed_pallas_engine_matches():
    rng = np.random.default_rng(11)
    n = 4096
    pts = [g1_mul(G1_GEN, int(s)) for s in rng.integers(1, 1 << 40, n)]
    pdev = points_to_device(pts)
    table = pp.build_window_table(pdev, 8)
    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(n)] for _ in range(2)]
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))
    with _with_engine("0"):
        ref = pp.msm_fixed_host(sl, table)
    with _with_engine("1"):
        got = pp.msm_fixed_host(sl, table)
    assert ref == got
