"""NTT / evaluation-domain tests against naive host DFT."""

import random

import jax
import numpy as np

from zerog_tpu.field import FR, to_limbs, from_limbs
from zerog_tpu.poly import NttPlan, Domain

random.seed(42)


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


def test_ntt_matches_naive():
    log_n = 6
    plan = NttPlan(log_n)
    coeffs = [random.randrange(FR.p) for _ in range(1 << log_n)]
    cl = to_limbs(coeffs, FR, mont=True)
    evals = from_limbs(np.asarray(jax.jit(plan.ntt)(cl)), FR, mont=True)
    assert list(evals) == naive_dft(coeffs, plan.omega, FR.p)


def test_intt_roundtrip():
    log_n = 10
    plan = NttPlan(log_n)
    coeffs = [random.randrange(FR.p) for _ in range(1 << log_n)]
    cl = to_limbs(coeffs, FR, mont=True)
    back = from_limbs(np.asarray(jax.jit(lambda x: plan.intt(plan.ntt(x)))(cl)), FR, mont=True)
    assert list(back) == coeffs


def test_extended_coset_roundtrip_and_division():
    k, degree = 4, 5
    dom = Domain(k, degree)
    n = dom.n
    # random poly of degree < n in lagrange form
    values = [random.randrange(FR.p) for _ in range(n)]
    vl = to_limbs(values, FR, mont=True)

    f = jax.jit(lambda v: dom.coeff_to_extended(dom.lagrange_to_coeff(v)))
    ext = f(vl)
    ext_host = from_limbs(np.asarray(ext), FR, mont=True)

    # check a random extended point: p(zeta * w_ext^i) computed by Horner
    coeffs = from_limbs(np.asarray(jax.jit(dom.lagrange_to_coeff)(vl)), FR, mont=True)
    i = 7
    x = dom.g_coset * pow(dom.extended_omega, i, FR.p) % FR.p
    horner = 0
    for c in reversed(list(coeffs)):
        horner = (horner * x + c) % FR.p
    assert ext_host[i] == horner

    # divide (p - p) by vanishing: zero stays zero
    zero_ext = jax.jit(dom.divide_by_vanishing_poly)(
        to_limbs([0] * dom.extended_n, FR, mont=True)
    )
    assert all(v == 0 for v in from_limbs(np.asarray(zero_ext), FR, mont=True))

    # p(X) = X^n - 1 divided by Z_H is 1
    zh_coeffs = [0] * dom.extended_n
    zh_coeffs[0] = FR.p - 1
    zh_coeffs[n] = 1
    zh_ext = jax.jit(dom.coeff_to_extended)(to_limbs(zh_coeffs, FR, mont=True))
    q = jax.jit(dom.divide_by_vanishing_poly)(zh_ext)
    qh = from_limbs(np.asarray(q), FR, mont=True)
    assert all(v == 1 for v in qh)


def test_rotation_on_extended():
    k, degree = 3, 3
    dom = Domain(k, degree)
    values = [random.randrange(FR.p) for _ in range(dom.n)]
    vl = to_limbs(values, FR, mont=True)
    ext = jax.jit(lambda v: dom.coeff_to_extended(dom.lagrange_to_coeff(v)))(vl)
    rot = jax.jit(lambda e: dom.rotate_extended(e, 1))(ext)
    # rotating the extended evals by one base step = evaluating p(omega * X):
    # on the base domain that maps row i -> value at row i+1.
    back = jax.jit(
        lambda e: dom.coeff_to_lagrange(dom.extended_to_coeff(e)[..., : dom.n, :])
    )(rot)
    got = from_limbs(np.asarray(back), FR, mont=True)
    assert list(got) == values[1:] + values[:1]


def test_lagrange_basis_host():
    dom = Domain(3, 3)
    x = random.randrange(FR.p)
    lis = dom.l_i_range(x, range(dom.n))
    # sum of all lagrange basis = 1
    assert sum(lis.values()) % FR.p == 1
    # interpolation check: p(x) = sum values[i] * l_i(x)
    values = [random.randrange(FR.p) for _ in range(dom.n)]
    interp = sum(v * lis[i] for i, v in enumerate(values)) % FR.p
    vl = to_limbs(values, FR, mont=True)
    coeffs = from_limbs(np.asarray(jax.jit(dom.lagrange_to_coeff)(vl)), FR, mont=True)
    horner = 0
    for c in reversed(list(coeffs)):
        horner = (horner * x + c) % FR.p
    assert interp == horner
