"""Curve layer tests: host group law, pairing, device point ops, MSM, SRS."""

import random

import jax
import numpy as np
import pytest

from zerog_tpu.curve import bn254 as c
from zerog_tpu.curve import (
    jac_add, jac_from_affine, points_to_device, points_from_device, msm, Srs,
)

random.seed(99)


def rand_g1(n):
    return [c.g1_mul(c.G1_GEN, random.randrange(1, c.R_ORDER)) for _ in range(n)]


def test_host_group_law():
    p = c.g1_mul(c.G1_GEN, 12345)
    q = c.g1_mul(c.G1_GEN, 54321)
    assert c.g1_add(p, q) == c.g1_mul(c.G1_GEN, 12345 + 54321)
    assert c.g1_add(p, c.g1_neg(p)) is None
    assert c.g1_add(None, p) == p
    assert c.g1_is_on_curve(p)


def test_pairing_bilinear():
    a, b = 777, 888
    lhs = c.pairing(c.g1_mul(c.G1_GEN, a), c.g2_mul(c.G2_GEN, b))
    rhs = c.pairing(c.g1_mul(c.G1_GEN, a * b), c.G2_GEN)
    assert lhs == rhs
    assert lhs != c.FQ12_ONE
    assert c.pairing_product_is_one(
        [(c.g1_mul(c.G1_GEN, a * b), c.G2_GEN),
         (c.g1_neg(c.g1_mul(c.G1_GEN, a * b)), c.G2_GEN)]
    )


def test_device_add_matches_host():
    n = 8
    pts_a = rand_g1(n) + [None]
    pts_b = rand_g1(n) + [c.G1_GEN]
    # include doubling lane and inverse lane
    pts_a[0] = pts_b[0]
    pts_a[1] = c.g1_neg(pts_b[1])
    ax, ay, av = points_to_device(pts_a)
    bx, by, bv = points_to_device(pts_b)
    pa = jac_from_affine(jax.numpy.asarray(ax), jax.numpy.asarray(ay), jax.numpy.asarray(av))
    pb = jac_from_affine(jax.numpy.asarray(bx), jax.numpy.asarray(by), jax.numpy.asarray(bv))
    got = points_from_device(jax.jit(jac_add)(pa, pb))
    want = [c.g1_add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want


def test_device_mixed_add_matches_host():
    """jac_madd_incomplete: general-Z p + affine q, incl. p=inf, q invalid,
    and inverse (h=0, r!=0 -> infinity) lanes. Doubling is OUT of contract."""
    from zerog_tpu.curve.jpoints import jac_madd_incomplete

    n = 8
    pts_a = rand_g1(n) + [None, c.G1_GEN]
    pts_b = rand_g1(n) + [c.G1_GEN, None]
    pts_a[1] = c.g1_neg(pts_b[1])  # inverse lane
    ax, ay, av = points_to_device(pts_a)
    bx, by, bv = points_to_device(pts_b)
    pa = jac_from_affine(jax.numpy.asarray(ax), jax.numpy.asarray(ay),
                         jax.numpy.asarray(av))
    # give p a non-trivial Z by doubling then adding the inverse: use
    # jac_add(p, p) to scale coordinates while keeping the same point? No —
    # instead multiply coordinates through a random Z via re-embedding.
    from zerog_tpu.field import jfq, to_limbs as tl, FQ as FQP

    f = jfq()
    z = 0x1234567890ABCDEF
    zl = jax.numpy.asarray(tl([z] * (n + 2), FQP, mont=True))  # z mont
    z2 = f.mul(zl, zl)
    pa = (f.mul(pa[0], z2), f.mul(pa[1], f.mul(z2, zl)),
          f.mul(pa[2], zl))
    got = points_from_device(jax.jit(jac_madd_incomplete)(
        pa, jax.numpy.asarray(bx), jax.numpy.asarray(by),
        jax.numpy.asarray(bv)))
    want = [c.g1_add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want


def test_msm_matches_host():
    n = 64
    pts = rand_g1(n - 1) + [None]
    scalars = [random.randrange(c.R_ORDER) for _ in range(n)]
    scalars[5] = 0
    got = msm(scalars, points_to_device(pts), c=8)
    want = c.g1_msm_host(scalars, pts)
    assert got == want


def test_msm_batched():
    n = 32
    pts = rand_g1(n)
    batch = [[random.randrange(c.R_ORDER) for _ in range(n)] for _ in range(3)]
    got = msm(batch, points_to_device(pts), c=6)
    want = [c.g1_msm_host(s, pts) for s in batch]
    assert got == want


def test_srs_setup_commit_roundtrip(tmp_path):
    srs = Srs.setup(3, seed=b"test-seed")
    # g[i] should be tau^i * G: check consistency via pairing-free identity
    # e(g[1], g2)=e(g, s_g2) <=> g[1] = tau*G; check with known tau instead:
    import hashlib
    tau = int.from_bytes(hashlib.blake2b(b"test-seed", digest_size=32).digest(), "little") % c.R_ORDER
    assert srs.g[0] == c.G1_GEN
    assert srs.g[1] == c.g1_mul(c.G1_GEN, tau)
    assert srs.s_g2 == c.g2_mul(c.G2_GEN, tau)

    # commit in lagrange form == commit in coeff form after interpolation
    vals = [random.randrange(c.R_ORDER) for _ in range(srs.n)]
    com_l = srs.commit_lagrange(vals)
    # poly(tau) directly:
    # p(X) = sum vals[i] L_i(X), so commitment = p(tau)*G
    from zerog_tpu.poly import Domain
    from zerog_tpu.field import FR
    dom = Domain(3, 3)
    lis = dom.l_i_range(tau, range(srs.n))
    ptau = sum(v * lis[i] for i, v in enumerate(vals)) % FR.p
    assert com_l == c.g1_mul(c.G1_GEN, ptau)

    srs.write(tmp_path / "srs.bin")
    srs2 = Srs.read(tmp_path / "srs.bin")
    assert srs2.g == srs.g and srs2.g_lagrange == srs.g_lagrange
    assert srs2.g2 == srs.g2 and srs2.s_g2 == srs.s_g2
