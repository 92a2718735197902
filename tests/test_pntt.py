"""Parity tests for the MXU (int8 DFT matmul) NTT engine — poly/pntt.py.

The engine must be BIT-exact against the XLA butterfly path (NttPlan): all
layers are exact mod-p arithmetic and canonical Montgomery representations
are unique, so arrays compare with array_equal. On CPU the Pallas kernels
run in interpret mode (sizes kept small); real-chip parity at production
sizes runs via scripts/bench_pntt.py.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from zerog_tpu.field import FR, to_limbs
from zerog_tpu.poly.ntt import NttPlan
from zerog_tpu.poly import pntt


def _rand_limbs(rng, n, b=None):
    shape = (n,) if b is None else (b, n)
    vals = rng.integers(1, 1 << 62, shape)
    arr = np.asarray(vals, dtype=object)
    return jnp.asarray(to_limbs(arr, FR, mont=True))


def test_factors():
    assert pntt._factors(16) == (256, 256)
    assert pntt._factors(14) == (128, 128)
    assert pntt._factors(17) == (64, 64, 32)
    assert pntt._factors(9) == (32, 16)
    assert pntt._factors(8) == (256,)


def test_host_reference_parity():
    rng = np.random.default_rng(0)
    log_n = 6
    n = 1 << log_n
    vals = [int(x) for x in rng.integers(1, 1 << 62, n)]
    plan = NttPlan(log_n)
    ref = np.asarray(plan.ntt(jnp.asarray(to_limbs(vals, FR, mont=True))))
    pp = pntt.PnttPlan(log_n, FR.nth_root_of_unity(log_n))
    mont = [v * pntt.R256 % pntt.P for v in vals]
    got = pp.ntt_ref(mont)
    from zerog_tpu.field import from_limbs

    want = [int(from_limbs(r, FR, mont=True)) * pntt.R256 % pntt.P
            for r in ref]
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("log_n,b", [(9, 1), (10, 3), (12, 2)])
def test_device_forward_parity(log_n, b):
    rng = np.random.default_rng(log_n)
    limbs = _rand_limbs(rng, 1 << log_n, None if b == 1 else b)
    plan = NttPlan(log_n)
    ref = np.asarray(plan.ntt(limbs))
    pp = pntt.get_pntt_plan(log_n, FR.nth_root_of_unity(log_n))
    got = np.asarray(pntt.pntt_transform(pp, limbs))
    assert np.array_equal(ref, got)


def test_device_inverse_parity():
    """Inverse with n^-1 folded into the last-level matrix must equal the
    XLA intt (transform + separate n^-1 multiply) bit for bit."""
    rng = np.random.default_rng(77)
    log_n = 10
    limbs = _rand_limbs(rng, 1 << log_n, 2)
    plan = NttPlan(log_n)
    ref = np.asarray(plan.intt(limbs))
    pp = pntt.get_pntt_plan(log_n, FR.inv(plan.omega), FR.inv(plan.n))
    got = np.asarray(pntt.pntt_transform(pp, limbs))
    assert np.array_equal(ref, got)


def test_roundtrip_through_nttplan_gate(monkeypatch):
    """NttPlan.ntt/intt route through the MXU engine when forced on; the
    roundtrip must reproduce the input exactly."""
    monkeypatch.setenv("ZEROG_NTT_PALLAS", "1")
    monkeypatch.setattr(NttPlan, "MXU_MIN_LOG_N", 9)
    rng = np.random.default_rng(5)
    plan = NttPlan(9)
    limbs = _rand_limbs(rng, 1 << 9, 2)
    out = plan.intt(plan.ntt(limbs))
    assert np.array_equal(np.asarray(out), np.asarray(limbs))
