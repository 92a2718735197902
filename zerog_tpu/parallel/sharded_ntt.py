"""Multi-chip NTT: four-step (Bailey) decomposition n = n1 * n2.

Stage A: local length-n2 NTTs (input sharded over the i1 axis),
stage B: pointwise twiddle by omega_n^(i1*k2) (twiddle matrix pre-sharded),
stage C: all_to_all re-shard (the distributed transpose over ICI),
stage D: local length-n1 NTTs.

Index math: with i = i1 + n1*i2 and k = k2 + n2*k1,
  X[k2 + n2*k1] = sum_{i1} w_n^{i1*k2} w_{n1}^{i1*k1} sum_{i2} w_{n2}^{i2*k2} x[i1 + n1*i2].

The result is the natural-order NTT, returned as a flat [n] array sharded
over k2. This is SURVEY.md §2b's "butterfly stages with all_to_all exchange"
realized as one transpose instead of per-stage exchange — the
bandwidth-optimal layout for ICI.

Passing ``omega = FR.inv(nth_root)`` yields the UNSCALED inverse transform
(callers multiply by 1/n), which is how `ShardedDomain` builds the mesh
counterparts of `Domain.lagrange_to_coeff` / `extended_to_coeff`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..field import FR, jfr, to_limbs
from ..poly.ntt import NttPlan
from .mesh import AXIS

__all__ = ["FourStepNtt"]


class FourStepNtt:
    def __init__(self, log_n: int, log_n1: int | None = None,
                 omega: int | None = None):
        self.log_n = log_n
        self.n = 1 << log_n
        if log_n1 is None:
            log_n1 = log_n // 2
        self.log_n1 = log_n1
        self.log_n2 = log_n - log_n1
        self.n1 = 1 << self.log_n1
        self.n2 = 1 << self.log_n2
        omega = omega if omega is not None else FR.nth_root_of_unity(log_n)
        self.omega = omega
        # sub-transform roots MUST be w_n^(n/ni) (for the canonical root this
        # equals nth_root_of_unity(log_ni); for an inverse/coset root it
        # does not, hence the explicit powers)
        self.plan1 = NttPlan(self.log_n1, pow(omega, self.n2, FR.p))
        self.plan2 = NttPlan(self.log_n2, pow(omega, self.n1, FR.p))
        tw = np.empty((self.n1, self.n2), dtype=object)
        for i1 in range(self.n1):
            base = pow(omega, i1, FR.p)
            cur = 1
            for k2 in range(self.n2):
                tw[i1, k2] = cur
                cur = cur * base % FR.p
        self.twiddle = to_limbs(tw, FR, mont=True)  # [n1, n2, 16]
        self._fns = {}

    def _sharded_fn(self, mesh, batched: bool):
        key = (mesh, batched)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        f = jfr()

        def local(x_block, tw_block):
            # x_block: [..., n2, n1/D, 16] (i2 rows, i1 shard);
            # tw_block: [n1/D, n2, 16]
            a = jnp.swapaxes(x_block, -3, -2)      # [..., n1/D, n2, 16]
            a = self.plan2.ntt(a)                  # local length-n2 NTTs
            b = f.mul(a, tw_block)                 # twiddle
            # all_to_all: split the n2 axis, concat the i1 axis
            c = jax.lax.all_to_all(
                b, AXIS, split_axis=b.ndim - 2, concat_axis=b.ndim - 3,
                tiled=True)
            # c: [..., n1, n2/D, 16] — NTT along i1 for each k2
            d = jnp.swapaxes(c, -3, -2)            # [..., n2/D, n1, 16]
            d = self.plan1.ntt(d)                  # local length-n1 NTTs
            return jnp.swapaxes(d, -3, -2)         # [..., n1, n2/D, 16]

        lead = (None,) if batched else ()
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(*lead, None, AXIS, None), P(AXIS, None, None)),
            out_specs=P(*lead, None, AXIS, None),
            check_vma=False,
        )
        self._fns[key] = fn
        return fn

    def ntt_sharded(self, mesh, values):
        """values: mont limbs [..., n, 16] sharded or replicated (one leading
        batch axis supported). Returns the natural-order NTT as [..., n, 16],
        sharded over the mesh."""
        n1, n2 = self.n1, self.n2
        batch = values.shape[:-2]
        fn = self._sharded_fn(mesh, batched=bool(batch))
        x_mat = values.reshape(batch + (n2, n1, 16))  # x[i1 + n1*i2] at [i2, i1]
        out = fn(x_mat, jnp.asarray(self.twiddle))    # [..., n1(k1), n2(k2), 16]
        return out.reshape(batch + (self.n, 16))  # X[k2 + n2*k1] at n2*k1+k2
