"""Mesh-parallel proving: ShardedSrs routes every commitment through the
point-sharded MSM (`sharded_msm.py`), and `create_proof(..., mesh=...)`
row-shards the quotient evaluation via GSPMD sharding annotations.

The reference's parallelism is shared-memory rayon inside halo2_proofs
(SURVEY.md §2b); here the same three hot spots shard over a
`jax.sharding.Mesh`: MSM (points partitioned, all_gather + Jacobian fold),
quotient (rows partitioned, rotations become collective permutes inserted by
XLA), NTT (four-step all_to_all — `sharded_ntt.py`).

All paths are exact field arithmetic, so a mesh proof is byte-identical to
the single-chip proof under the same seed (tested in
tests/test_sharded_prover.py).
"""

from __future__ import annotations

import numpy as np

from ..curve.jpoints import points_from_device, points_to_device
from ..curve.pippenger import _fold_windows_host, default_window
from ..field import FR, jfr, to_limbs
from .mesh import AXIS, Mesh
from .sharded_msm import sharded_msm_device

__all__ = ["ShardedSrs"]


class ShardedSrs:
    """Drop-in Srs facade whose commitment MSMs shard points over a mesh.

    The window sums are produced per device shard and folded with an
    all_gather + log-depth Jacobian reduction; the final Horner fold over
    windows happens on host exactly like the single-chip 'scan' strategy, so
    commitments are identical points.
    """

    def __init__(self, srs, mesh: Mesh):
        import jax.numpy as jnp

        self.srs = srs
        self.mesh = mesh
        self.k = srs.k
        self.n = srs.n
        self.g2 = srs.g2
        self.s_g2 = srs.s_g2
        d = mesh.devices.size
        self._pad = (-srs.n) % d
        self._c = default_window(srs.n)

        def padded(points):
            px, py, pv = points_to_device(points)
            if self._pad:
                px = np.concatenate([px, np.zeros((self._pad, 16), px.dtype)])
                py = np.concatenate([py, np.zeros((self._pad, 16), py.dtype)])
                pv = np.concatenate([pv, np.zeros(self._pad, bool)])
            return jnp.asarray(px), jnp.asarray(py), jnp.asarray(pv)

        self._g_dev = padded(srs.g)
        self._lag_dev = padded(srs.g_lagrange)

    # -- core --------------------------------------------------------------
    def _msm_sharded(self, sl, pdev):
        """sl: canonical uint32[B, N, 16] device/host; returns B host points."""
        import jax.numpy as jnp

        b = int(sl.shape[0])
        if self._pad:
            sl = jnp.concatenate(
                [jnp.asarray(sl),
                 jnp.zeros((b, self._pad, 16), jnp.uint32)], axis=1)
        px, py, pv = pdev
        sums = sharded_msm_device(self.mesh, jnp.asarray(sl), px, py, pv,
                                  c=self._c)
        w = sums[0].shape[1]
        flat = tuple(comp.reshape(b * w, 16) for comp in sums)
        affine = points_from_device(flat)
        return [
            _fold_windows_host(affine[i * w : (i + 1) * w], self._c)
            for i in range(b)
        ]

    def _rows_to_limbs(self, rows):
        arr = np.asarray(
            [[int(v) % FR.p for v in r] for r in rows], dtype=object)
        return to_limbs(arr)

    # -- Srs-compatible commitment API ---------------------------------------
    def commit_lagrange(self, values):
        single = not isinstance(values[0], (list, tuple, np.ndarray))
        rows = [values] if single else list(values)
        out = self._msm_sharded(self._rows_to_limbs(rows), self._lag_dev)
        return out[0] if single else out

    def commit(self, coeffs):
        single = not isinstance(coeffs[0], (list, tuple, np.ndarray))
        rows = [coeffs] if single else list(coeffs)
        rows = [list(r) + [0] * (self.n - len(r)) for r in rows]
        out = self._msm_sharded(self._rows_to_limbs(rows), self._g_dev)
        return out[0] if single else out

    def _dev_canonical(self, stack):
        import jax.numpy as jnp

        if stack.ndim == 2:
            stack = stack[None]
        return jfr().from_mont(jnp.asarray(stack))

    def commit_lagrange_dev(self, stack):
        single = stack.ndim == 2
        out = self._msm_sharded(self._dev_canonical(stack), self._lag_dev)
        return out[0] if single else out

    def commit_dev(self, stack):
        single = stack.ndim == 2
        out = self._msm_sharded(self._dev_canonical(stack), self._g_dev)
        return out[0] if single else out
