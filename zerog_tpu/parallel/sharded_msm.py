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
from jax.sharding import NamedSharding, PartitionSpec as P

from ..curve.bn254 import g1_add, g1_mul
from ..curve.jpoints import jac_add, jac_roll, jac_select, points_from_device
from ..curve.pippenger import (
    _digits, _digits_balanced, _one_window, _pip_bias, _pip_r_rows,
    _pipeline_device, _prep_core, _use_pallas_scan, _window_layout,
    WindowTable,
)
from ..field import FQ
from .mesh import AXIS

__all__ = ["sharded_msm_device", "ShardedWindowTable", "msm_fixed_sharded"]


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


# ---- sharded merged-window fixed-base MSM (the production prover path) ------
#
# The single-chip fixed-base pipeline (pippenger.py: merged-window table,
# flush-scan bucket accumulation, marginal-split weighted fold) is linear in
# the point set, so the mesh version simply partitions the TABLE POINTS:
# device d runs the complete bucket pipeline over its point shard (all W
# windows of points i in d's block) producing per-(device, batch) weighted
# accumulators; the host sums the D partial results per batch row with ~D*B
# tiny point adds. No collectives are needed until that final host fold —
# embarrassingly parallel over ICI-free shards, realized as ONE set of GSPMD
# sharding annotations over the existing stage programs (the per-stage launch
# structure that keeps axon worker programs small is preserved verbatim).


class ShardedWindowTable:
    """A merged-window table re-laid out as [D, W*Nloc, 16] (device d's rows
    j*Nloc + i_loc hold 2^{offset_j} * P_{d*Nloc + i_loc}), sharded over the
    mesh axis. Build from a single-chip :class:`WindowTable` whose point
    count is a multiple of the mesh size."""

    __slots__ = ("mesh", "c", "n", "n_local", "d", "w", "tx", "ty", "tvalid")

    def __init__(self, mesh, table: WindowTable):
        d = mesh.devices.size
        n = table.n
        if n % d:
            raise ValueError(
                f"table point count {n} not divisible by mesh size {d}; "
                "pad the point set before building the table")
        sizes, _ = _window_layout(table.c)
        w = len(sizes)
        nloc = n // d
        self.mesh, self.c, self.n, self.n_local, self.d, self.w = (
            mesh, table.c, n, nloc, d, w)
        shard = NamedSharding(mesh, P(AXIS, None, None))

        def relay(a, trailing):
            a = jnp.asarray(a).reshape((w, d, nloc) + trailing)
            a = jnp.moveaxis(a, 1, 0).reshape((d, w * nloc) + trailing)
            return jax.device_put(a, shard)

        self.tx = relay(table.tx, (16,))
        self.ty = relay(table.ty, (16,))
        self.tvalid = jax.device_put(
            jnp.asarray(table.tvalid).reshape(w, d, nloc)
            .transpose(1, 0, 2).reshape(d, w * nloc),
            NamedSharding(mesh, P(AXIS, None)))


def _make_prep_sharded(mesh):
    group_shard = NamedSharding(mesh, P(AXIS, None))

    @functools.partial(jax.jit, static_argnames=("c", "r_rows", "d"))
    def prep(sl, tx, ty, tv, c: int, r_rows: int, d: int):
        """sl: uint32[B, N, 16] replicated scalars; t*: [D, W*Nloc(, 16)]
        sharded table. Groups are (device, batch) pairs g = dd*B + bb."""
        digits = _digits_balanced(sl, c)            # [W, B, N]
        w, b, n = digits.shape
        nloc = n // d
        ds = (digits.reshape(w, b, d, nloc)
              .transpose(2, 1, 0, 3).reshape(d * b, w * nloc))
        ds = jax.lax.with_sharding_constraint(ds, group_shard)

        def expand(a):
            out = jnp.broadcast_to(a[:, None], (d, b) + a.shape[1:])
            return out.reshape((d * b,) + a.shape[1:])

        return _prep_core(ds, expand(tx), expand(ty), expand(tv),
                          r_rows, 1 << c)

    return prep


_prep_sharded_cache: dict = {}
_pipeline_sharded_cache: dict = {}


def _pipeline_sharded(mesh, arrs, r_rows: int, c: int, pallas: bool):
    """shard_map the pure-device bucket pipeline along the group axis.

    arrs: the prep outputs minus max_run — sx/sy [R, G, C, 16],
    sval/flags/pb/pr [R, G, C], pbf/prf [G, C], with G = d*B laid out
    device-major, so sharding G over the mesh axis gives each device exactly
    its own point shard's groups. Inside the shard, the Pallas kernels see
    local shapes and run per device (the whole point of the wrapper —
    GSPMD alone would replicate their inputs). Output: jac components
    [G, 2, 16], sharded along G.
    """
    key = (mesh, r_rows, c, pallas)
    prog = _pipeline_sharded_cache.get(key)
    if prog is None:
        def local(sx, sy, sval, flags, pb, pr, pbf, prf):
            return _pipeline_device((sx, sy, sval, flags, pb, pr, pbf, prf),
                                    r_rows, c, pallas, compact=True)

        g4 = P(None, AXIS, None, None)
        g3 = P(None, AXIS, None)
        g2 = P(AXIS, None)
        prog = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(g4, g4, g3, g3, g3, g3, g2, g2),
            out_specs=(P(AXIS),) * 3,
            check_vma=False,
        ))
        _pipeline_sharded_cache[key] = prog
    return prog(*arrs)


def msm_fixed_sharded(mesh, sl, stable: ShardedWindowTable):
    """Point-sharded merged-window fixed-base MSM.

    sl: uint32[B, N, 16] canonical scalar limbs (replicated; N = table point
    count). Returns [B] affine host points, identical to the single-chip
    `msm_fixed_host` result (exact group arithmetic; tested byte-identical).

    The bucket pipeline runs under shard_map along the group axis (groups =
    (device, batch) pairs), so each device executes the complete pipeline —
    including the Pallas flush-scan/fold kernels on TPU — over its LOCAL
    point shard; only the final weighted accumulators leave the shards.
    Compaction always runs on the mesh path: the per-shard region cannot
    host-sync on max_run, and a deterministic launch structure is what the
    collective scheduler wants anyway.
    """
    b = int(sl.shape[0])
    m_local = stable.w * stable.n_local
    r_rows = _pip_r_rows(m_local)
    prep = _prep_sharded_cache.get(mesh)
    if prep is None:
        prep = _prep_sharded_cache[mesh] = _make_prep_sharded(mesh)
    out = prep(jnp.asarray(sl), stable.tx, stable.ty, stable.tvalid,
               c=stable.c, r_rows=r_rows, d=stable.d)
    acc2 = _pipeline_sharded(mesh, out[:-1], r_rows, stable.c,
                             _use_pallas_scan())
    g = int(acc2[0].shape[0])
    host = points_from_device(
        tuple(comp.reshape(g * 2, 16) for comp in acc2))
    bias_pt, _ = _pip_bias()
    neg_k = (bias_pt[0], (-bias_pt[1]) % FQ.p)
    lo_bits = stable.c // 2
    results = []
    for bb in range(b):
        acc = None
        for dd in range(stable.d):
            g = dd * b + bb
            w_hi = g1_add(host[2 * g], neg_k)
            w_lo = g1_add(host[2 * g + 1], neg_k)
            part = g1_add(g1_mul(w_hi, 1 << lo_bits), w_lo)
            acc = part if acc is None else g1_add(acc, part)
        results.append(acc)
    return results
