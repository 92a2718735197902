"""Field arithmetic tests: device limb kernels vs exact Python-int model."""

import random

import jax
import numpy as np
import pytest

from zerog_tpu.field import (
    FR, FQ, jfr, jfq, to_limbs, from_limbs, batch_inv,
)

random.seed(1234)


@pytest.mark.parametrize("params,jf", [(FR, jfr()), (FQ, jfq())])
def test_mont_mul_random(params, jf):
    n = 257  # odd size to exercise padding-free batching
    a = [random.randrange(params.p) for _ in range(n)]
    b = [random.randrange(params.p) for _ in range(n)]
    a_l = to_limbs(a, params, mont=True)
    b_l = to_limbs(b, params, mont=True)
    out = jax.jit(jf.mul)(a_l, b_l)
    got = from_limbs(np.asarray(out), params, mont=True)
    want = [(x * y) % params.p for x, y in zip(a, b)]
    assert list(got) == want


@pytest.mark.parametrize("params,jf", [(FR, jfr()), (FQ, jfq())])
def test_add_sub_neg(params, jf):
    n = 64
    edge = [0, 1, params.p - 1, params.p - 2, params.p // 2]
    a = edge + [random.randrange(params.p) for _ in range(n - len(edge))]
    b = list(reversed(edge)) + [random.randrange(params.p) for _ in range(n - len(edge))]
    a_l = to_limbs(a, params, mont=True)
    b_l = to_limbs(b, params, mont=True)
    s = from_limbs(np.asarray(jax.jit(jf.add)(a_l, b_l)), params, mont=True)
    d = from_limbs(np.asarray(jax.jit(jf.sub)(a_l, b_l)), params, mont=True)
    m = from_limbs(np.asarray(jax.jit(jf.neg)(a_l)), params, mont=True)
    assert list(s) == [(x + y) % params.p for x, y in zip(a, b)]
    assert list(d) == [(x - y) % params.p for x, y in zip(a, b)]
    assert list(m) == [(-x) % params.p for x in a]


def test_mont_roundtrip_and_one():
    jf = jfr()
    a = [0, 1, 2, FR.p - 1, 12345678901234567890 % FR.p]
    plain = to_limbs(a)
    mont = jax.jit(jf.to_mont)(plain)
    back = jax.jit(jf.from_mont)(mont)
    assert list(from_limbs(np.asarray(back))) == a
    # multiplying by one (mont) is identity
    one = jf.const(1)
    prod = jax.jit(jf.mul)(mont, one[None, :])
    assert list(from_limbs(np.asarray(prod), FR, mont=True)) == a


def test_pow_const_and_sum():
    jf = jfr()
    a = [random.randrange(FR.p) for _ in range(33)]
    a_l = to_limbs(a, FR, mont=True)
    cubes = from_limbs(np.asarray(jax.jit(lambda x: jf.pow_const(x, 3))(a_l)), FR, mont=True)
    assert list(cubes) == [pow(x, 3, FR.p) for x in a]
    total = from_limbs(np.asarray(jax.jit(lambda x: jf.sum(x, axis=0))(a_l)), FR, mont=True)
    assert int(total) == sum(a) % FR.p


def test_batch_inv_host():
    vals = [random.randrange(1, FR.p) for _ in range(100)]
    invs = batch_inv(vals, FR.p)
    assert all(v * i % FR.p == 1 for v, i in zip(vals, invs))


def test_domain_constants():
    # root of unity has exact order 2^28
    w = FR.root_of_unity
    assert pow(w, 1 << 28, FR.p) == 1
    assert pow(w, 1 << 27, FR.p) != 1
    assert pow(FR.zeta, 3, FR.p) == 1 and FR.zeta != 1
    assert (FR.r_mont * pow(FR.r_mont, -1, FR.p)) % FR.p == 1
