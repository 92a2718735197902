"""Fixed-base merged-window Pippenger MSM (curve/pippenger.py).

The prover's bases are the fixed SRS point sets (reference hot path:
every commitment in halo2_proofs' create_proof/keygen, SURVEY.md §2b "G1 +
Pippenger MSM"), so per-window shifted tables are precomputed once and all
windows merge into a single bucket accumulation. These tests pin the table
layout and the MSM result against host ground truth, including the skewed
digit distributions that trigger the compaction round.
"""

import random

import numpy as np
import pytest

from zerog_tpu.field import FR
from zerog_tpu.curve import points_to_device, msm, Srs
from zerog_tpu.curve.bn254 import g1_add, g1_mul, G1_GEN
from zerog_tpu.curve.jpoints import jac_from_affine, points_from_device
from zerog_tpu.curve.pippenger import (
    build_window_table, default_fixed_window, fixed_base_expand,
    _window_layout,
)

random.seed(1234)
N = 64


@pytest.fixture(scope="module")
def points():
    # random-looking multiples: the incomplete-add contract forbids
    # structured sets like (i+1)*G (see msm() docstring)
    scalars = [random.getrandbits(62) | 1 for _ in range(N)]
    return fixed_base_expand(G1_GEN, scalars)


@pytest.fixture(scope="module")
def table(points):
    return build_window_table(points_to_device(points), c=5)


def ground(scalars, points):
    acc = None
    for s, p in zip(scalars, points):
        acc = g1_add(acc, g1_mul(p, s))
    return acc


def test_table_layout(points, table):
    """Entry j*N + i must be 2^{offset_j} * P_i (affine Montgomery)."""
    sizes, offsets = _window_layout(5)
    aff = points_from_device(
        jac_from_affine(table.tx, table.ty, table.tvalid))
    assert table.tx.shape[0] == len(sizes) * N
    for j in (0, 1, len(sizes) - 1):
        for i in (0, N // 2, N - 1):
            assert aff[j * N + i] == g1_mul(points[i], 1 << offsets[j])


def test_random_scalars_batched(points, table):
    rows = [[random.randrange(FR.p) for _ in range(N)] for _ in range(3)]
    got = msm(rows, table=table)
    assert got == [ground(r, points) for r in rows]


def test_skewed_scalars_compaction(points, table):
    """Witness-like rows (mostly 0/1, long equal runs) force the piece
    compaction round; result must still match."""
    rows = [[(1 if i % 3 else 0) for i in range(N)],
            [7] * N]
    got = msm(rows, table=table)
    assert got == [ground(r, points) for r in rows]


def test_edge_rows(points, table):
    got = msm([[0] * N, [1] + [0] * (N - 1)], table=table)
    assert got[0] is None
    assert got[1] == points[0]


def test_default_fixed_window():
    assert default_fixed_window(1 << 14) == 13
    assert default_fixed_window(1 << 17) == 16
    assert 4 <= default_fixed_window(64) <= 6


def test_srs_commit_via_table(monkeypatch):
    """With the threshold lowered, Srs commitments route through the table
    and must equal the per-window path bit for bit."""
    srs = Srs.setup(5, seed=b"fixed-msm-test")
    values = [[random.randrange(FR.p) for _ in range(srs.n)]
              for _ in range(2)]
    baseline = srs.commit_lagrange(values)
    baseline_mono = srs.commit(values)
    monkeypatch.setattr(Srs, "FIXED_MIN_N", 1)
    srs2 = Srs.setup(5, seed=b"fixed-msm-test")
    assert srs2.commit_lagrange(values) == baseline
    assert srs2.commit(values) == baseline_mono
    assert srs2.window_table("lagrange") is not None


def test_segscan_matches_flush_strategy(points, table, monkeypatch):
    """The log-depth segmented-scan pipeline (default) and the legacy
    flush-scan pipeline must agree exactly — including on the skewed digit
    streams where the bias-injection collision argument matters (all-empty
    bucket windows)."""
    import jax.numpy as jnp

    from zerog_tpu.field import to_limbs
    from zerog_tpu.curve.pippenger import msm_fixed_host

    cases = [
        [[random.randrange(FR.p) for _ in range(N)] for _ in range(2)],
        [[0] * (N // 2) + [7] * (N // 2), [0] * N],      # heavy skew + zero
        [[1 << 200] * N, [random.getrandbits(13) for _ in range(N)]],
    ]
    for scalars in cases:
        sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))
        seg = msm_fixed_host(sl, table)
        monkeypatch.setenv("ZEROG_MSM_STRATEGY", "flush")
        flush = msm_fixed_host(sl, table)
        monkeypatch.delenv("ZEROG_MSM_STRATEGY")
        expect = [ground([s % FR.p for s in row], points) for row in scalars]
        assert seg == flush == expect
