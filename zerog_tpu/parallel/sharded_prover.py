"""Mesh-parallel proving: ShardedSrs routes every commitment through the
point-sharded merged-window fixed-base MSM (`sharded_msm.msm_fixed_sharded`
— the same production pipeline the single-chip prover uses, partitioned over
the mesh), and `create_proof(..., mesh=...)` row-shards the quotient
evaluation via GSPMD sharding annotations and runs its NTTs through the
four-step all_to_all decomposition (`sharded_domain.ShardedDomain`).

The reference's parallelism is shared-memory rayon inside halo2_proofs
(SURVEY.md §2b); here the same three hot spots shard over a
`jax.sharding.Mesh`: MSM (points partitioned, per-device bucket pipelines,
host fold of D partials), quotient (rows partitioned, rotations become
collective permutes inserted by XLA), NTT (four-step with one all_to_all
transpose).

All paths are exact field arithmetic, so a mesh proof is byte-identical to
the single-chip proof under the same seed (tested in
tests/test_sharded_prover.py, in the default suite).
"""

from __future__ import annotations

import numpy as np

from ..curve.jpoints import points_to_device
from ..curve.pippenger import build_window_table, default_fixed_window
from ..field import FR, to_limbs
from .mesh import AXIS, Mesh
from .sharded_msm import ShardedWindowTable, msm_fixed_sharded

__all__ = ["ShardedSrs"]


class ShardedSrs:
    """Drop-in Srs facade whose commitment MSMs shard points over a mesh.

    Each device runs the complete merged-window bucket pipeline over its
    point shard; the host folds the D partial sums per batch row. All group
    arithmetic is exact, so commitments are identical points to the
    single-chip `Srs.commit*` results.
    """

    def __init__(self, srs, mesh: Mesh):
        import jax.numpy as jnp

        self.srs = srs
        self.mesh = mesh
        self.k = srs.k
        self.g2 = srs.g2
        self.s_g2 = srs.s_g2
        d = mesh.devices.size
        self._pad = (-srs.n) % d
        self.n = srs.n  # logical SRS size (gwc sizes host polys from this)
        self._padded_n = srs.n + self._pad  # table point count, d-divisible
        self._c = default_fixed_window(self._padded_n)

        def padded(points):
            px, py, pv = points_to_device(points)
            if self._pad:
                px = np.concatenate([px, np.zeros((self._pad, 16), px.dtype)])
                py = np.concatenate([py, np.zeros((self._pad, 16), py.dtype)])
                pv = np.concatenate([pv, np.zeros(self._pad, bool)])
            return jnp.asarray(px), jnp.asarray(py), jnp.asarray(pv)

        self._g_dev = padded(srs.g)
        self._lag_dev = padded(srs.g_lagrange)
        self._tables: dict = {}

    # -- core --------------------------------------------------------------
    def _table(self, basis: str) -> ShardedWindowTable:
        t = self._tables.get(basis)
        if t is None:
            pdev = self._lag_dev if basis == "lagrange" else self._g_dev
            # The doubling-chain table build runs replicated; the shifted
            # rows are then re-laid out and device_put sharded. (On a real
            # multi-host pod the build itself would shard the same way — the
            # chain is elementwise per point.)
            t = ShardedWindowTable(self.mesh, build_window_table(pdev, self._c))
            self._tables[basis] = t
        return t

    # commitments per pipeline launch, keyed on the BACKEND (not on this
    # being the mesh path): virtual CPU devices in tests are memory-tight
    # (host RAM is shared by all 8), but on real TPU hardware the mesh path
    # should batch exactly like the single-chip HBM-tapered Srs.MAX_BATCH —
    # batching does not change the committed points.
    @property
    def MAX_BATCH(self) -> int:
        import jax

        if jax.default_backend() == "cpu":
            return 2
        return self.srs.MAX_BATCH

    def _msm_sharded(self, sl, basis: str):
        """sl: canonical uint32[B, N, 16] (unpadded N); returns B host points."""
        import jax.numpy as jnp

        b = int(sl.shape[0])
        sl = jnp.asarray(sl)
        if self._pad:
            sl = jnp.concatenate(
                [sl, jnp.zeros((b, self._pad, 16), jnp.uint32)], axis=1)
        table = self._table(basis)
        out = []
        for i in range(0, b, self.MAX_BATCH):
            chunk = sl[i : i + self.MAX_BATCH]
            short = self.MAX_BATCH - int(chunk.shape[0])
            if short:  # pad batch so one compiled shape serves every phase
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((short,) + chunk.shape[1:], jnp.uint32)],
                    axis=0)
            out.extend(msm_fixed_sharded(self.mesh, chunk, table)[
                : self.MAX_BATCH - short])
        return out[:b]

    def _rows_to_limbs(self, rows):
        arr = np.asarray(
            [[int(v) % FR.p for v in r] for r in rows], dtype=object)
        return to_limbs(arr)

    # -- Srs-compatible commitment API ---------------------------------------
    def commit_lagrange(self, values):
        single = not isinstance(values[0], (list, tuple, np.ndarray))
        rows = [values] if single else list(values)
        out = self._msm_sharded(self._rows_to_limbs(rows), "lagrange")
        return out[0] if single else out

    def commit(self, coeffs):
        single = not isinstance(coeffs[0], (list, tuple, np.ndarray))
        rows = [coeffs] if single else list(coeffs)
        rows = [list(r) + [0] * (self.srs.n - len(r)) for r in rows]
        out = self._msm_sharded(self._rows_to_limbs(rows), "monomial")
        return out[0] if single else out

    def _dev_canonical(self, stack):
        import jax.numpy as jnp

        from ..curve.srs import _from_mont_jit

        if stack.ndim == 2:
            stack = stack[None]
        return _from_mont_jit()(jnp.asarray(stack))

    def commit_lagrange_dev(self, stack):
        single = stack.ndim == 2
        out = self._msm_sharded(self._dev_canonical(stack), "lagrange")
        return out[0] if single else out

    def commit_dev(self, stack):
        single = stack.ndim == 2
        out = self._msm_sharded(self._dev_canonical(stack), "monomial")
        return out[0] if single else out
