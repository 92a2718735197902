"""Multi-chip Pippenger MSM: points partitioned over the mesh axis.

Each device runs the single-chip bucket pipeline over its point shard
(sort -> segmented scan -> bucket suffix reduction), producing per-window
Jacobian partial sums; partials are all-gathered over ICI and folded with a
log-depth unified point addition. The result is replicated.

This mirrors SURVEY.md §2b: "points partitioned across chips, bucket sums
reduced with collectives" — the reduction op is the elliptic group law, so
the collective is all_gather + on-device fold rather than psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..curve.jpoints import jac_add, jac_select
from ..curve.pippenger import _digits, _one_window
from .mesh import AXIS

__all__ = ["sharded_msm_device"]


def _fold_points(points, m: int):
    """Log-depth fold of a leading axis of m Jacobian points."""
    while m > 1:
        half = (m + 1) // 2
        lo = tuple(c[:half] for c in points)
        hi = tuple(c[half : 2 * half] for c in points)
        if hi[0].shape[0] < half:
            pad = half - hi[0].shape[0]
            hi = tuple(
                jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], axis=0)
                for c in hi
            )
        points = jac_add(lo, hi)
        m = half
    return points


def sharded_msm_device(mesh, scalar_limbs, px, py, pvalid, c: int):
    """scalar_limbs: uint32[B, N, 16]; points [N, 16]; N divisible by mesh
    size. Returns replicated Jacobian window sums, components [B, W, 16]."""

    def local(sl, x, y, v):
        digits = _digits(sl, c)  # [W, B, Nlocal]

        def window_body(_, d_w):
            res = jax.vmap(lambda d: _one_window(d, x, y, v, c))(d_w)
            return None, res

        _, sums = jax.lax.scan(window_body, None, digits)  # [W, B, 16] comps
        # gather partial window sums from all shards: [D, W, B, 16]
        gathered = jax.lax.all_gather(sums, AXIS)
        folded = _fold_points(gathered, gathered[0].shape[0])
        folded = tuple(comp[0] for comp in folded)  # [W, B, 16]
        return tuple(jnp.swapaxes(comp, 0, 1) for comp in folded)  # [B, W, 16]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(None), P(None), P(None)),
        check_rep=False,
    )
    return fn(scalar_limbs, px, py, pvalid)
