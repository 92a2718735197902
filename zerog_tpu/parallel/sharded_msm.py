"""Multi-chip Pippenger MSM: points partitioned over the mesh axis.

Each device runs the single-chip bucket pipeline over its point shard
(sort -> segmented scan -> bucket suffix reduction), producing per-window
Jacobian partial sums; partials are all-gathered over ICI and folded with a
log-depth unified point addition. The result is replicated.

This mirrors SURVEY.md §2b: "points partitioned across chips, bucket sums
reduced with collectives" — the reduction op is the elliptic group law, so
the collective is all_gather + on-device fold rather than psum.

Compile structure: ONE window program is compiled per (mesh, c) and reused
for every window of every MSM (a host loop dispatches windows). This keeps
each compiled program small — essential on XLA:CPU where limb-arithmetic
compiles are expensive, and it matches the chunked-launch discipline the
axon TPU worker needs anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..curve.jpoints import jac_add, jac_roll, jac_select
from ..curve.pippenger import _digits, _one_window
from .mesh import AXIS

__all__ = ["sharded_msm_device"]


def _fold_points(points, m: int):
    """Log-depth fold of a leading axis of m Jacobian points via a scan with
    a fixed shape: one jac_add compile regardless of m."""
    if m == 1:
        return points
    full = 1 << (m - 1).bit_length()
    if points[0].shape[0] < full:
        pad = full - points[0].shape[0]
        points = tuple(
            jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], axis=0)
            for c in points
        )
    idx = jnp.arange(full)
    shifts = jnp.asarray([full >> (s + 1) for s in range(full.bit_length() - 1)],
                         dtype=jnp.int32)

    def step(carry, shift):
        rolled = jac_roll(carry, -shift)
        added = jac_add(carry, rolled)
        return jac_select(idx < shift, added, carry), None

    points, _ = jax.lax.scan(step, points, shifts)
    return points


_msm_programs: dict = {}


def _msm_program(mesh, c: int):
    """Compiled all-windows kernel: per-shard bucket sums for every
    (window, batch) lane (vmapped — the window body compiles once), then ONE
    all_gather + log-depth fold. A single collective per MSM keeps the
    virtual-CPU-device rendezvous happy (a host loop of per-window launches
    floods the shared thread pool and trips the 40 s collective timeout)."""
    key = (mesh, c)
    prog = _msm_programs.get(key)
    if prog is not None:
        return prog
    n_dev = mesh.devices.size

    def local(digits, x, y, v):
        # digits: int32[W, B, Nlocal] for the local point shard
        w, b = digits.shape[0], digits.shape[1]
        flat = digits.reshape(w * b, digits.shape[2])
        sums = jax.vmap(lambda d: _one_window(d, x, y, v, c))(flat)  # [W*B, 16]
        gathered = jax.lax.all_gather(sums, AXIS)  # [D, W*B, 16]
        folded = _fold_points(gathered, n_dev)
        return tuple(comp[0].reshape(w, b, 16) for comp in folded)

    prog = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(None),) * 3,
        check_vma=False,
    ))
    _msm_programs[key] = prog
    return prog


def sharded_msm_device(mesh, scalar_limbs, px, py, pvalid, c: int,
                       scalar_bits: int = 254):
    """scalar_limbs: uint32[B, N, 16]; points [N, 16] sharded over the mesh
    axis; N divisible by mesh size. Returns replicated Jacobian window sums,
    components [B, W, 16] (W = ceil(scalar_bits / c)).

    Pass `scalar_bits` to bound the number of windows when the scalars are
    known to be small.
    """
    digits = jax.jit(_digits, static_argnames=("c", "scalar_bits"))(
        scalar_limbs, c=c, scalar_bits=scalar_bits
    )  # [W, B, N]
    prog = _msm_program(mesh, c)
    sums = prog(digits, px, py, pvalid)  # comps [W, B, 16]
    return tuple(jnp.swapaxes(comp, 0, 1) for comp in sums)
