"""Parity: Pallas plane-layout field kernels vs the XLA limb formulation.

Unlike the point-scan kernels, the single-op field kernels are cheap enough
to run in Pallas interpret mode on CPU (one grid step, [16, 2, 128] blocks),
so this parity check runs in the default suite.
"""

import numpy as np
import jax.numpy as jnp

from zerog_tpu.field import FR, jfr, to_limbs
from zerog_tpu.field.pfield import pfr, to_planes, from_planes


def test_pfield_matches_jfield():
    rng = np.random.default_rng(1)
    n = 256
    av = [int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
    bv = [int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
    a = jnp.asarray(to_limbs(av, FR, mont=True))
    b = jnp.asarray(to_limbs(bv, FR, mont=True))
    f, pf = jfr(), pfr()
    ap, bp = to_planes(a), to_planes(b)
    assert np.array_equal(np.asarray(from_planes(ap)), np.asarray(a))
    for op in ("mul", "add", "sub"):
        ref = np.asarray(getattr(f, op)(a, b))
        got = np.asarray(from_planes(getattr(pf, op)(ap, bp)))
        assert np.array_equal(ref, got), f"{op} mismatch"
