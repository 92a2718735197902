"""Device opening algebra (poly/eval.py): batch inversion, barycentric
evaluation, Kate division — host-int ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from zerog_tpu.field import FR, to_limbs, from_limbs
from zerog_tpu.poly.eval import (
    batch_inv_device, barycentric_eval, domain_inverses,
    kate_quotient_lagrange, omega_powers,
)

P = FR.p
K = 6
N = 1 << K


def _horner(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % P
    return acc


@pytest.fixture(scope="module")
def polys():
    rng = np.random.default_rng(7)
    return [[int(x) % P for x in rng.integers(0, 1 << 62, N)] for _ in range(3)]


@pytest.fixture(scope="module")
def lag_stack(polys):
    omega = FR.nth_root_of_unity(K)
    lag = [[_horner(c, pow(omega, i, P)) for i in range(N)] for c in polys]
    return jnp.asarray(np.stack(
        [to_limbs(np.asarray(r, dtype=object), FR, mont=True) for r in lag]))


def test_batch_inv_device():
    rng = np.random.default_rng(3)
    vals = [int(x) % P or 1 for x in rng.integers(1, 1 << 62, 37)]
    inv = batch_inv_device(jnp.asarray(to_limbs(vals, FR, mont=True)))
    got = [int(v) for v in from_limbs(np.asarray(inv), FR, mont=True)]
    assert all(v * i % P == 1 for v, i in zip(vals, got))


def test_batch_inv_multidim():
    rng = np.random.default_rng(4)
    vals = np.asarray(
        [[int(x) % P or 1 for x in rng.integers(1, 1 << 62, 8)] for _ in range(5)],
        dtype=object)
    inv = batch_inv_device(jnp.asarray(to_limbs(vals, FR, mont=True)))
    got = from_limbs(np.asarray(inv), FR, mont=True)
    assert got.shape == (5, 8)
    assert all(int(vals[i, j]) * int(got[i, j]) % P == 1
               for i in range(5) for j in range(8))


def test_barycentric_matches_horner(polys, lag_stack):
    zs = [123456789, 987654321, FR.p - 5]
    got = barycentric_eval(K, lag_stack, zs)
    want = [[_horner(c, z) for c in polys] for z in zs]
    assert got == want


def test_kate_quotient_matches_synthetic_division(polys, lag_stack):
    omega = FR.nth_root_of_unity(K)
    z = 55555
    e = _horner(polys[0], z)
    dinv, _ = domain_inverses(K, [z])
    qlag = kate_quotient_lagrange(lag_stack[0], e, dinv[0])
    q = [0] * (N - 1)
    acc = 0
    for i in range(N - 1, 0, -1):
        acc = (acc * z + polys[0][i]) % P
        q[i - 1] = acc
    want = [_horner(q, pow(omega, i, P)) for i in range(N)]
    got = [int(v) for v in from_limbs(np.asarray(qlag), FR, mont=True)]
    assert got == want


def test_omega_powers_cached():
    w = omega_powers(K)
    omega = FR.nth_root_of_unity(K)
    vals = from_limbs(np.asarray(w), FR, mont=True)
    assert int(vals[0]) == 1 and int(vals[1]) == omega
    assert int(vals[N - 1]) == pow(omega, N - 1, P)
