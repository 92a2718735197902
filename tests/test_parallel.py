"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

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
