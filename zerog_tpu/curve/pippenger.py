"""Pippenger multi-scalar multiplication on TPU.

Replaces the MSM inside `halo2_proofs::poly::commitment` (every commitment in
keygen/create_proof; SURVEY.md §2b "G1 group ops + Pippenger MSM"). Three
strategies, all static-shape / branch-free for XLA:

- "pippenger" (default): bucketed column-scan Pippenger — sort by window
  digit, flush-scan bucket accumulation, marginal-split weighted sum. The
  flush scan and bucket folds run as Pallas kernels on TPU (curve/pscan.py,
  curve/pfold.py — 241k pts/s at 2^14xB4 vs 116k for the XLA lax.scan
  engine; ZEROG_MSM_PALLAS=0 forces XLA, which remains the CPU/test path).
  Uses the INCOMPLETE Jacobian add, so it requires
  pairwise-distinct, random-looking base points (SRS tau powers qualify: an
  internal add collision has probability ~2^-254 and would only corrupt the
  proof being built, which the verifier then rejects). Do NOT use it on
  structured point sets (e.g. small multiples of G, adversarial
  proof-supplied points) — partial sums can collide with a base point and
  silently drop to infinity; use "danaa" there.
- "danaa": lane-parallel double-and-add with the unified (complete) add.
  Correct for arbitrary points; ~2x slower at 2^14.
- "scan": legacy per-window segmented-scan pipeline (complete add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, FQ, jfq, shift_fill, to_limbs, from_limbs
from .jpoints import (
    jac_add, jac_add_incomplete, jac_madd_incomplete, jac_double, jac_select,
    jac_from_affine, jac_infinity, jac_roll, points_from_device,
    points_to_device,
)
from .bn254 import G1_GEN, g1_add, g1_double, g1_mul

__all__ = ["msm", "msm_device", "msm_pippenger_host", "msm_fixed_host",
           "fixed_base_expand", "default_window", "default_fixed_window",
           "build_window_table", "WindowTable"]


def default_window(n: int) -> int:
    """Window width heuristic shared by every MSM entry point."""
    return max(4, min(10, int(n).bit_length() - 4))

SCALAR_BITS = 254


def _digits(scalar_limbs, c: int, scalar_bits: int = SCALAR_BITS):
    """uint32[..., 16] canonical limbs -> int32[W, ...] window digits."""
    num_windows = (scalar_bits + c - 1) // c
    outs = []
    for w in range(num_windows):
        a = w * c
        j, r = divmod(a, 16)
        v = scalar_limbs[..., j] >> r
        if j + 1 < 16 and r + c > 16:
            v = v | (scalar_limbs[..., j + 1] << (16 - r))
        outs.append((v & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _suffix_scan(p, m: int):
    """Inclusive suffix sum of a length-m batch of points: out[i] = sum_{j>=i} p[j]."""
    idx = jnp.arange(m)
    n_steps = max(1, (m - 1).bit_length())
    shifts = jnp.asarray([1 << s for s in range(n_steps)], dtype=jnp.int32)

    def step(carry, shift):
        q = jac_roll(carry, -shift)
        ok = idx + shift < m
        return jac_select(ok, jac_add(carry, q), carry), None

    out, _ = jax.lax.scan(step, p, shifts)
    return out


def _one_window(d, px, py, pvalid, c: int):
    """Window sum  sum_i d_i * P_i  for digits d in [0, 2^c)."""
    n = d.shape[0]
    order = jnp.argsort(d)
    ds = d[order]
    x = px[order]
    y = py[order]
    val = pvalid[order] & (ds > 0)
    p = jac_from_affine(x, y, valid=val)

    # segmented inclusive scan: accumulate runs of equal digit
    idx = jnp.arange(n)
    shifts = jnp.asarray([1 << s for s in range(max(1, (n - 1).bit_length()))], jnp.int32)

    def step(carry, shift):
        q = jac_roll(carry, shift)
        same = (ds == jnp.roll(ds, shift)) & (idx >= shift)
        return jac_select(same, jac_add(carry, q), carry), None

    p, _ = jax.lax.scan(step, p, shifts)

    is_end = jnp.concatenate([ds[:-1] != ds[1:], jnp.ones((1,), bool)])
    nb = 1 << c
    bucket_idx = jnp.where(is_end & (ds > 0), ds, nb)  # nb = out-of-bounds, dropped
    buckets = tuple(
        jnp.zeros((nb, 16), jnp.uint32).at[bucket_idx].set(comp, mode="drop")
        for comp in p
    )
    # weighted sum over buckets 1..nb-1: two suffix passes
    s = tuple(comp[1:] for comp in buckets)
    s = _suffix_scan(s, nb - 1)          # s[i] = sum_{b >= i+1} B_b
    t = _suffix_scan(s, nb - 1)          # t[0] = sum_i s[i] = sum_b b*B_b
    return tuple(comp[0] for comp in t)


@functools.partial(jax.jit, static_argnames=("c",))
def _digits_device(scalar_limbs, c: int):
    return _digits(scalar_limbs, c)


@functools.partial(jax.jit, static_argnames=("c",))
def _window_device(d_w, px, py, pvalid, c: int):
    """One window's bucket sums for a batch of scalar rows: d_w int32[B, N]."""
    return jax.vmap(lambda d: _one_window(d, px, py, pvalid, c))(d_w)


def msm_device(scalar_limbs, px, py, pvalid, c: int):
    """scalar_limbs: uint32[B, N, 16] canonical; points: mont affine [N, 16].
    Returns Jacobian window sums, components shaped [B, W, 16].

    Windows are dispatched as separate device launches (a host loop) rather
    than one scanned mega-program: per-launch runtime and memory stay small,
    which matters both for latency-hiding and for runtime stability.
    """
    digits = _digits_device(scalar_limbs, c)  # [W, B, N]
    w = digits.shape[0]
    sums = [_window_device(digits[i], px, py, pvalid, c) for i in range(w)]
    return tuple(
        jnp.stack([s[comp] for s in sums], axis=1) for comp in range(3)
    )


# ---- bucketed Pippenger (default strategy) ---------------------------------
#
# Measured cost model on the axon v5e:
#   - program compile: ~2.7 s per field mul in the program body, per process;
#   - pure ELEMENTWISE lax.scan bodies run at ~160-250 M field-muls/s (the
#     whole body fuses; the carry stays on chip);
#   - any per-step cross-lane movement (roll/gather) drops throughput ~5x,
#     and large fused programs can crash the worker.
#
# Bucket accumulation is therefore formulated with NO cross-lane ops in the
# hot loop: sort each (window, scalar-row) digit lane ONCE, lay the sorted
# points out column-major [R rows x C columns], and scan DOWN the rows with a
# danaa-style elementwise body: each step adds one point row into a per-column
# carry, flushing the carry to the output when a new digit run starts. A run
# of equal digits is contiguous in column-major order, so a bucket's total is
# split across at most ceil(run/R)+1 flushed "pieces". When every nonzero
# run fits in one column (max_run <= R, the random-scalar case) the pieces
# scatter directly into [G, 2, 2^c] bucket slots; otherwise ONE compaction
# round (stable-sort pieces by bucket, rerun the same flush scan) reduces any
# distribution — witness columns are full of repeated values — to <= C
# pieces per bucket, which the second round's columns always absorb.
#
# Windows are BALANCED (sizes floor/ceil of 254/W) so no window has a tiny
# bit-range whose digit multiplicity would blow up max_run structurally.
#
# The weighted sum  sum_b b*B_b  uses the marginal split b = hi*2^lo + lo:
#     sum_b b*B_b = 2^lo * sum_hi hi*R_hi + sum_lo lo*C_lo,
# with R/C marginals from two more elementwise reduce scans and the two
# small weighted sums from one final scan. Total device work is about
# (N + 2*P*2^c) point-adds per (window x batch) row at the fused rate.
#
# Incomplete adds (12M+4S) are safe everywhere EXCEPT the weighted scan's
# outer accumulator, which sees structurally equal operands when marginals
# are empty — that accumulator is biased by a fixed known point K
# (subtracted on the host), which breaks the structural equality; remaining
# collisions have probability ~2^-254 and only corrupt the proof being
# built. Base points must be pairwise distinct (true for SRS powers).

_PIP_R = 128       # rows per column in the accumulation scan
_PIP_CHUNK = 64    # accumulation scan steps per device launch


def _window_layout(c: int, total_bits: int = SCALAR_BITS):
    """Balanced window sizes/offsets: W = ceil(bits/c) windows of width
    floor(bits/W) or floor(bits/W)+1 covering exactly `total_bits`."""
    w = (total_bits + c - 1) // c
    base = total_bits // w
    extra = total_bits - base * w
    sizes = [base + 1] * extra + [base] * (w - extra)
    offsets = []
    off = 0
    for s in sizes:
        offsets.append(off)
        off += s
    return tuple(sizes), tuple(offsets)


def _digits_balanced(scalar_limbs, c: int):
    """uint32[..., 16] canonical limbs -> int32[W, ...] balanced-window digits."""
    sizes, offsets = _window_layout(c)
    outs = []
    for size, off in zip(sizes, offsets):
        j, r = divmod(off, 16)
        v = scalar_limbs[..., j] >> r
        if j + 1 < 16 and r + size > 16:
            v = v | (scalar_limbs[..., j + 1] << (16 - r))
        outs.append((v & ((1 << size) - 1)).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _colmaj(a, r_rows: int):
    """[G, M, ...] -> [R, G, C, ...] with flat index = col*R + row."""
    g, m = a.shape[0], a.shape[1]
    a2 = a.reshape((g, m // r_rows, r_rows) + a.shape[2:])
    return jnp.moveaxis(a2, 2, 0)


def _stream_info(keys, r_rows: int, nb: int):
    """Bookkeeping for a grouped key stream [G, M] (equal keys contiguous;
    key == nb marks dropped entries, grouped at the tail).

    Returns (flags, pb, pr, pbf, prf, max_run): column-major [R, G, C] flush
    flags, per-flush bucket/rank (pb == nb -> dropped), final-carry
    bucket/rank, and the longest run with 0 < key < nb."""
    g, m = keys.shape
    idx = jnp.arange(m)
    new_seg = jnp.concatenate(
        [jnp.ones((g, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1
    )
    start_flat = jax.lax.cummax(jnp.where(new_seg, idx[None, :], 0), axis=1)
    run_pos = idx[None, :] - start_flat
    max_run = jnp.max(jnp.where((keys > 0) & (keys < nb), run_pos, 0)) + 1

    ksc = _colmaj(keys, r_rows)                     # [R, G, C]
    nsc = _colmaj(new_seg, r_rows)
    flags = nsc.at[0].set(True)                     # each column: fresh carry
    cdim = m // r_rows
    rank = jnp.arange(cdim)[None, None, :] - _colmaj(start_flat // r_rows, r_rows)
    valid = flags.at[0].set(False)
    pb = jnp.where(valid, jnp.roll(ksc, 1, axis=0), nb)
    pr = jnp.where(valid, jnp.roll(rank, 1, axis=0), 0)
    return flags, pb, pr, ksc[-1], rank[-1], max_run


_stream_info_jit = functools.partial(jax.jit, static_argnames=("r_rows", "nb"))(
    lambda keys, r_rows, nb: _stream_info(keys, r_rows, nb)
)


def _prep_core(ds, px, py, pvalid, r_rows: int, nb: int):
    """Shared level-1 prep from a digit matrix: mask invalid lanes to bucket
    0, pad the point axis to an r_rows multiple, sort each lane's digits,
    gather points into column-major scan order, and build the flush-scan
    bookkeeping. ds: int32[G, M] digits; points [M, 16] affine mont shared by
    every lane group, or [G, M, 16] (+ pvalid [G, M]) per-group (the
    mesh-sharded path, where each group holds a different point shard)."""
    grouped = px.ndim == 3
    m0 = ds.shape[1]
    pv_b = pvalid if grouped else pvalid[None, :]
    ds = jnp.where(pv_b, ds, 0)                     # invalid -> bucket 0
    m = ((m0 + r_rows - 1) // r_rows) * r_rows
    if m > m0:
        pad = m - m0
        ds = jnp.pad(ds, ((0, 0), (0, pad)))
        if grouped:
            pvalid = jnp.pad(pvalid, ((0, 0), (0, pad)))
            px = jnp.pad(px, ((0, 0), (0, pad), (0, 0)))
            py = jnp.pad(py, ((0, 0), (0, pad), (0, 0)))
        else:
            pvalid = jnp.pad(pvalid, (0, pad))
            px = jnp.pad(px, ((0, pad), (0, 0)))
            py = jnp.pad(py, ((0, pad), (0, 0)))
    order = jnp.argsort(ds, axis=-1)
    ds = jnp.take_along_axis(ds, order, axis=-1)
    if grouped:
        gx = jnp.take_along_axis(px, order[..., None], axis=1)
        gy = jnp.take_along_axis(py, order[..., None], axis=1)
        gv = jnp.take_along_axis(pvalid, order, axis=1)
    else:
        gx, gy, gv = px[order], py[order], pvalid[order]
    sx = _colmaj(gx, r_rows)                        # [R, G, C, 16]
    sy = _colmaj(gy, r_rows)
    sval = _colmaj(gv, r_rows)
    info = _stream_info(ds, r_rows, nb)
    return (sx, sy, sval) + info


@functools.partial(jax.jit, static_argnames=("c", "r_rows"))
def _pipv2_prep(scalar_limbs, px, py, pvalid, c: int, r_rows: int):
    """Level-1 prep: balanced-window digits, per-lane sort, point gather.
    Scalars uint32[B, N, 16]; points [N, 16] affine mont + valid [N]."""
    digits = _digits_balanced(scalar_limbs, c)      # [W, B, N]
    w, b, n0 = digits.shape
    ds = digits.reshape(w * b, n0)
    return _prep_core(ds, px, py, pvalid, r_rows, 1 << c)


@functools.partial(jax.jit, static_argnames=("c", "r_rows"))
def _pipfb_prep(scalar_limbs, tx, ty, tvalid, c: int, r_rows: int):
    """Merged-window prep for the fixed-base path: each scalar row's W digit
    vectors are concatenated window-major (index j*N + i, matching the
    shifted-table layout), so one bucket accumulation covers every window.
    Scalars uint32[B, N, 16]; table [W*N, 16] affine mont + valid [W*N]."""
    digits = _digits_balanced(scalar_limbs, c)      # [W, B, N]
    w, b, n0 = digits.shape
    ds = jnp.moveaxis(digits, 0, 1).reshape(b, w * n0)
    return _prep_core(ds, tx, ty, tvalid, r_rows, 1 << c)


@jax.jit
def _pipv2_chunk(carry, xs):
    """_PIP_CHUNK flush-scan steps over a JACOBIAN stream (round 2, where
    pieces carry arbitrary Z); xs = (x, y, z jac rows, flags)."""
    def body(carry, xs):
        x, y, z, flag = xs
        pt = (x, y, z)
        flushed = jac_select(flag, carry, (jnp.zeros_like(x),) * 3)
        carry = jac_select(flag, pt, jac_add_incomplete(carry, pt))
        return carry, flushed

    return jax.lax.scan(body, carry, xs)


@jax.jit
def _pipv2_chunk_affine(carry, xs):
    """_PIP_CHUNK flush-scan steps over an AFFINE stream (round 1: the sorted
    base points all have Z = 1), using the 8M+3S mixed add instead of the
    12M+4S general incomplete add; xs = (x, y, valid rows, flags)."""
    def body(carry, xs):
        x, y, val, flag = xs
        flushed = jac_select(flag, carry, (jnp.zeros_like(x),) * 3)
        carry = jac_select(flag, jac_from_affine(x, y, val),
                           jac_madd_incomplete(carry, x, y, val))
        return carry, flushed

    return jax.lax.scan(body, carry, xs)


def _use_pallas_scan() -> bool:
    """The Pallas flush-scan kernel is the default on TPU (the XLA lax.scan
    path costs ~0.4 ms per row — materialization-bound; see curve/pscan.py).
    CPU (tests) keeps the XLA path: Pallas interpret mode is far slower than
    XLA:CPU; other accelerators (GPU) can't lower the pltpu memory spaces.
    Override with ZEROG_MSM_PALLAS=0/1."""
    import os

    forced = os.environ.get("ZEROG_MSM_PALLAS")
    if forced is not None:
        return forced.lower() not in ("0", "false", "off", "")
    return jax.default_backend() in ("tpu", "axon")


def _flush_scan(stream, flags, affine: bool, pallas: bool | None = None):
    """Run the flush scan over a stream [R, G, C] — affine (x, y, valid) or
    jacobian (x, y, z) per `affine` — returning jac pieces [R+1, G, C]
    (row r = piece flushed at step r; row R = final carry)."""
    if pallas is None:
        pallas = _use_pallas_scan()
    if pallas:
        return _flush_scan_pallas_adapter(stream, flags, affine)
    r_total = flags.shape[0]
    g, cdim = flags.shape[1], flags.shape[2]
    carry = jac_infinity((g, cdim))
    step = min(_PIP_CHUNK, r_total)
    chunk_fn = _pipv2_chunk_affine if affine else _pipv2_chunk
    chunks = []
    for i in range(0, r_total, step):
        carry, flushed = chunk_fn(
            carry, tuple(a[i:i + step] for a in stream) + (flags[i:i + step],)
        )
        chunks.append(flushed)
    return tuple(
        jnp.concatenate([ch[comp] for ch in chunks] + [carry[comp][None]], axis=0)
        for comp in range(3)
    )


def _flush_scan_pallas_adapter(stream, flags, affine: bool):
    """[R, G, C] streams -> pscan row planes -> kernel -> [R+1, G, C] pieces.

    Identity-valued rows: padded columns carry flag=0 and valid=0 (affine) or
    Z=0 (jac), so their carries stay at infinity and their pieces are zero —
    dropped later by the scatter's bucket keys exactly like real zero rows."""
    from .pscan import (
        flush_scan_pallas, stream_to_rowplanes, pieces_from_rowplanes)

    r, g, cdim = flags.shape
    ct = max(1024, ((g * cdim + 1023) // 1024) * 1024)
    sx = stream_to_rowplanes(stream[0], ct)
    sy = stream_to_rowplanes(stream[1], ct)
    third = stream_to_rowplanes(stream[2], ct)
    fl = stream_to_rowplanes(flags, ct)
    # pad R to the kernel's chunk multiple with no-op rows (flag=0, invalid)
    from .pscan import _R_CHUNK

    rp = ((r + _R_CHUNK - 1) // _R_CHUNK) * _R_CHUNK
    if rp != r:
        pad = rp - r

        def padr(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        sx, sy, third, fl = padr(sx), padr(sy), padr(third), padr(fl)
    px, py, pz, cx, cy, cz = flush_scan_pallas(sx, sy, third, fl,
                                               affine=affine)
    px = jnp.concatenate([px[:r], cx[None]], axis=0)
    py = jnp.concatenate([py[:r], cy[None]], axis=0)
    pz = jnp.concatenate([pz[:r], cz[None]], axis=0)
    return pieces_from_rowplanes(px, py, pz, g, cdim)


@functools.partial(jax.jit, static_argnames=("r_rows",))
def _pipv2_compact(pieces, pb_all, r_rows: int):
    """Stable-sort the flat piece stream so real pieces (pb < nb) lead,
    grouped by bucket (they already are — stable sort keeps flat order),
    then re-lay column-major for a second flush scan. Any bucket has at
    most C pieces, so the second round always fits P = 2."""
    rp1, g, cdim = pb_all.shape
    m = rp1 * cdim

    def flat(a):  # [R+1, G, C, ...] -> [G, M, ...] in flat piece order
        return jnp.moveaxis(a, 0, 2).reshape((g, m) + a.shape[3:])

    keys = flat(pb_all)
    order = jnp.argsort(keys, axis=-1, stable=True)
    keys = jnp.take_along_axis(keys, order, axis=-1)
    stream = tuple(
        jnp.take_along_axis(flat(comp), order[..., None], axis=1)
        for comp in pieces
    )
    m2 = ((m + r_rows - 1) // r_rows) * r_rows
    if m2 > m:
        keys = jnp.pad(keys, ((0, 0), (0, m2 - m)),
                       constant_values=keys.dtype.type(0))
        # pad with drop-key entries (infinity points)
        keys = keys.at[:, m:].set(jnp.iinfo(jnp.int32).max)
        stream = tuple(jnp.pad(compp, ((0, 0), (0, m2 - m), (0, 0)))
                       for compp in stream)
    return tuple(_colmaj(compp, r_rows) for compp in stream), keys


@functools.partial(jax.jit, static_argnames=("p_max", "c"))
def _pipv2_scatter(pieces, pb, pr, p_max: int, c: int):
    """Pieces jac [R+1, G, C] -> bucket slots [G, p_max, 2^c]. The three
    coordinates are packed into one [..., 48] array so a single scatter op
    runs. Out-of-range rank (only weight-0 bucket 0) and pb >= 2^c drop."""
    nb = 1 << c
    g = pb.shape[1]
    packed = jnp.concatenate(pieces, axis=-1)       # [R+1, G, C, 48]
    garr = jnp.arange(g)[None, :, None]
    out = (jnp.zeros((g, p_max, nb, 48), jnp.uint32)
           .at[garr, pr, pb].set(packed, mode="drop"))
    return out[..., :16], out[..., 16:32], out[..., 32:]


@jax.jit
def _pipv2_sum_rows(xs):
    """Fold [L, G, W] jac rows into [G, W] with a linear lax.scan.

    Compile cost on the axon runtime is ~2.7 s per field-mul traced into the
    program body (measured; see ARCHITECTURE.md roofline), so a scan whose
    body is ONE incomplete add (~16 muls, ~45 s compile) beats the former
    unrolled log-depth tree (~110 traced muls, ~280 s compile per shape); at
    these lane widths ([G, W] ~ a few hundred lanes) the L sequential steps
    cost only ~ms of runtime.

    Incomplete adds are safe here: the carry after step i is the sum of rows
    < i, a bucket subset disjoint from row i; structural equality only occurs
    between two empty subsets — both infinity, which the add's identity lanes
    handle; a value collision between non-empty subsets has probability
    ~2^-254."""
    init = jac_infinity(xs[0].shape[1:3])

    def body(carry, row):
        return jac_add_incomplete(carry, row), None

    out, _ = jax.lax.scan(body, init, xs)
    return out


@jax.jit
def _pipv2_weighted(stacked, bias):
    """stacked: jac [K, G, 2] rows ordered k = K-1 .. 0. Computes
    bias + sum_k k * row_k via (acc2 += acc1; acc1 += row)."""
    acc1 = jac_infinity(stacked[0].shape[1:3])
    acc2 = tuple(jnp.broadcast_to(b, a.shape) for b, a in zip(bias, acc1))

    def body(carry, row):
        a1, a2 = carry
        a2 = jac_add_incomplete(a2, a1)
        a1 = jac_add_incomplete(a1, row)
        return (a1, a2), None

    (_, acc2), _ = jax.lax.scan(body, (acc1, acc2), stacked)
    return acc2


@functools.cache
def _pip_bias_np():
    """Fixed bias point K (known scalar) as HOST numpy limbs. Cached at the
    numpy level so a first call from inside a jit trace cannot poison the
    cache with tracers (observed: jnp.asarray inside a trace returns a
    tracer, and a functools.cache keeping it breaks every later caller)."""
    k_scalar = 0xB1A5_0FF5_E7D0_1234_5678_9ABC_DEF0_1357
    pt = g1_mul(G1_GEN, k_scalar)
    x, y, _ = points_to_device([pt])
    z = to_limbs(FQ.r_mont)  # Z = 1 in Montgomery form
    return pt, (np.asarray(x[0]), np.asarray(y[0]), np.asarray(z))


def _pip_bias():
    pt, (x, y, z) = _pip_bias_np()
    return pt, (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def _pip_r_rows(m: int) -> int:
    """r_rows >= sqrt(m) so that level-2 runs (<= C = m/r_rows pieces per
    bucket) always fit one level-2 column; capped below by _PIP_R."""
    return min(1 << max(1, (m - 1).bit_length()),
               max(_PIP_R, 1 << ((m - 1).bit_length() + 1) // 2))


def _pipeline_device(arrs, r_rows: int, c: int, pallas: bool, compact: bool):
    """PURE-DEVICE bucket pipeline: flush scan -> (optional) compaction ->
    scatter -> marginal-split weighted sum. `arrs` are the prep outputs
    minus max_run; returns the weighted accumulators, jac components
    [G, 2, 16]. Group-parallel along G, so the mesh path can shard_map it
    (sharded_msm.py) and run the Pallas kernels per point shard."""
    nb = 1 << c
    sx, sy, sval, flags, pb, pr, pbf, prf = arrs
    pieces = _flush_scan((sx, sy, sval), flags, affine=True, pallas=pallas)
    pb_all = jnp.concatenate([pb, pbf[None]], axis=0)
    pr_all = jnp.concatenate([pr, prf[None]], axis=0)
    if compact:
        # skewed digit distribution (common for witness columns): compact
        # pieces by bucket and rerun the flush scan — bounds pieces <= C
        stream2, keys2 = _pipv2_compact(pieces, pb_all, r_rows)
        flags, pb, pr, pbf, prf, _ = _stream_info_jit(keys2, r_rows, nb)
        pieces = _flush_scan(stream2, flags, affine=False, pallas=pallas)
        pb_all = jnp.concatenate([pb, pbf[None]], axis=0)
        pr_all = jnp.concatenate([pr, prf[None]], axis=0)
    buckets = _pipv2_scatter(pieces, pb_all, pr_all, p_max=2, c=c)

    g = int(pb_all.shape[1])
    lo_bits = c // 2
    hi_n, lo_n = 1 << (c - lo_bits), 1 << lo_bits
    # the Pallas fold kernels are bit-exact replacements (same add order);
    # weighted needs K % 8 == 0 (padded rows would repeat the a2 += a1 step)
    use_pallas = pallas and hi_n % 8 == 0
    if use_pallas:
        from .pfold import sum_rows_pallas, weighted_pallas

        sum_rows, weighted = sum_rows_pallas, weighted_pallas
    else:
        sum_rows, weighted = _pipv2_sum_rows, _pipv2_weighted
    r_hi = sum_rows(tuple(
        jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 3), (0, 1))
        .reshape(2 * lo_n, g, hi_n, 16)
        for comp in buckets
    ))
    c_lo = sum_rows(tuple(
        jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 2), (0, 1))
        .reshape(2 * hi_n, g, lo_n, 16)
        for comp in buckets
    ))

    _, bias_dev = _pip_bias()
    stacked = tuple(
        jnp.moveaxis(
            jnp.flip(jnp.stack(
                [rh, jnp.pad(cl, ((0, 0), (0, hi_n - lo_n), (0, 0)))], axis=2
            ), axis=1), 1, 0)                       # [K, G, 2, 16]
        for rh, cl in zip(r_hi, c_lo)
    )
    return weighted(stacked, bias_dev)


def _bucket_pipeline(prep, r_rows: int, c: int, pallas: bool | None = None,
                     max_run_bound: int | None = None):
    """Host-facing bucket stage. Returns ((w_hi, w_lo) host points per lane
    group as a flat list [2*G], neg_bias, lo_bits).

    `pallas` forces the engine (None -> backend default); `max_run_bound`
    is a STATIC upper bound on the longest digit run — when given, the
    compaction decision is made on the host without synchronizing on the
    device `max_run` value (a per-MSM host sync + data-dependent compile
    fork otherwise)."""
    if pallas is None:
        pallas = _use_pallas_scan()
    max_run = prep[-1]
    compact = (int(max_run) if max_run_bound is None else max_run_bound) \
        > r_rows
    acc2 = _pipeline_device(prep[:-1], r_rows, c, pallas, compact)
    g = int(acc2[0].shape[0])
    host = points_from_device(tuple(comp.reshape(g * 2, 16) for comp in acc2))
    bias_pt, _ = _pip_bias()
    neg_k = (bias_pt[0], (-bias_pt[1]) % FQ.p)
    return host, neg_k, c // 2


def msm_pippenger_host(sl, px, py, pvalid, c: int):
    """Column-scan Pippenger. sl: uint32[B, N, 16] canonical scalar limbs;
    points on device. Returns [B] affine host points."""
    b = int(sl.shape[0])
    r_rows = _pip_r_rows(int(px.shape[0]))
    prep = _pipv2_prep(sl, px, py, pvalid, c=c, r_rows=r_rows)
    host, neg_k, lo_bits = _bucket_pipeline(prep, r_rows, c)
    sizes, _ = _window_layout(c)
    results = []
    w = len(host) // (2 * b)
    for bi in range(b):
        window_sums = []
        for wi in range(w):
            gi = wi * b + bi
            w_hi = g1_add(host[2 * gi], neg_k)
            w_lo = g1_add(host[2 * gi + 1], neg_k)
            window_sums.append(g1_add(g1_mul(w_hi, 1 << lo_bits), w_lo))
        results.append(_fold_windows_host(window_sums, sizes))
    return results


def _fold_windows_host(window_points, c):
    """Horner fold of window sums (host; W is tiny). `c` is either a uniform
    window width or a per-window width sequence (LSB window first)."""
    sizes = [c] * len(window_points) if isinstance(c, int) else list(c)
    acc = None
    for pt, size in zip(reversed(window_points), reversed(sizes)):
        for _ in range(size):
            acc = g1_double(acc) if acc is not None else None
        acc = g1_add(acc, pt)
    return acc


# ---- fixed-base merged-window Pippenger -------------------------------------
#
# The prover's bases are FIXED (SRS monomial/Lagrange powers; every proof
# commits ~40 polynomials against the same two point sets), so we precompute
# per-window shifted copies  Q[j*N + i] = 2^{offset_j} * P_i  once and merge
# ALL windows into a single bucket accumulation over M = W*N points. Wins vs
# the per-window path:
#   - wide windows become economical: the O(2^c) bucket fold is paid once per
#     scalar row instead of once per (window x row), so c grows from ~10 to
#     13-16 and the dominant flush-scan term W*N shrinks ~1.6x;
#   - the per-window host fold (W Python point ops per row) collapses to one
#     hi*2^lo + lo combination per row.
# Table build is ~254 elementwise doubling passes over N lanes plus one
# batched affine normalization — amortized across every later commitment.
# Incomplete-add contract: table entries 2^{o_j} * P_i are pairwise distinct
# for random-looking bases (SRS powers; collision ~2^-254).

_fq = jfq()
_FQ_ONE = to_limbs(1, FQ, mont=True)


def _fq_prefix_products(flat):
    """[M, 16] FQ mont limbs -> inclusive prefix products (log-depth; the
    doubling steps run under lax.scan so only ONE field mul is traced —
    compile is ~2.7 s per traced mul on the axon runtime). Shifts use
    shift_fill with one-lanes (jnp.roll fused is ~1000x slower on TPU)."""
    m = flat.shape[0]
    steps = max(1, (m - 1).bit_length())
    one = jnp.asarray(_FQ_ONE)
    shifts = jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)

    def body(out, shift):
        return _fq.mul(out, shift_fill(out, shift, fill=one, axis=0)), None

    out, _ = jax.lax.scan(body, flat, shifts)
    return out


@jax.jit
def _fq_finish_inverses(flat, prefix, total_inv):
    """inv_i = prefix_{i-1} * total_inv * rev_prefix(rev flat)_{i+1}."""
    rev_pref = _fq_prefix_products(jnp.flip(flat, axis=0))
    suffix = jnp.flip(rev_pref, axis=0)
    one = jnp.broadcast_to(jnp.asarray(_FQ_ONE), (1, 16))
    suffix_next = jnp.concatenate([suffix[1:], one], axis=0)
    prefix_prev = jnp.concatenate([one, prefix[:-1]], axis=0)
    return _fq.mul(_fq.mul(prefix_prev, suffix_next),
                   jnp.broadcast_to(total_inv, flat.shape))


def _fq_batch_inv(vals):
    """vals [M, 16] FQ mont limbs, all nonzero -> elementwise inverses (one
    32-byte host round trip for the single total inversion)."""
    prefix = jax.jit(_fq_prefix_products)(vals)
    total = from_limbs(np.asarray(jax.device_get(prefix[-1])), FQ, mont=True)
    total_inv = jnp.asarray(to_limbs(pow(int(total), -1, FQ.p), FQ, mont=True))
    return _fq_finish_inverses(vals, prefix, total_inv)


@functools.partial(jax.jit, static_argnames=("n",))
def _double_n(p, n: int):
    """n Jacobian doublings under fori_loop (one traced double — unrolling
    n ~ 13 doublings cost ~300 s of compile at ~2.7 s per traced field-mul)."""
    return jax.lax.fori_loop(0, n, lambda _, q: jac_double(q), p)


class WindowTable:
    """Precomputed per-window shifted base points for the merged-window MSM.

    Layout: entry j*N + i is 2^{offset_j} * P_i (affine Montgomery limbs),
    offsets from the balanced window layout for width c."""

    __slots__ = ("c", "n", "tx", "ty", "tvalid")

    def __init__(self, c, n, tx, ty, tvalid):
        self.c, self.n, self.tx, self.ty, self.tvalid = c, n, tx, ty, tvalid


def default_fixed_window(n: int) -> int:
    """Width heuristic for the merged fixed-base path: cost model
    ceil(254/c)*N + ~4*2^c is minimized near log2(N) - 1."""
    return max(4, min(16, int(n).bit_length() - 2))


def build_window_table(points_dev, c: int) -> WindowTable:
    """Build the merged-window table for a fixed point set (device arrays
    from points_to_device). One doubling chain of 254 elementwise passes over
    N lanes + one batched affine normalization."""
    px, py, pvalid = (jnp.asarray(a) for a in points_dev)
    n = int(px.shape[0])
    sizes, _ = _window_layout(c)
    cur = jac_from_affine(px, py, pvalid)
    comps = ([px], [py], [jnp.where(
        pvalid[:, None], jnp.broadcast_to(jnp.asarray(_FQ_ONE), px.shape),
        jnp.zeros_like(px))])
    for size in sizes[:-1]:
        cur = _double_n(cur, size)
        for lst, comp in zip(comps, cur):
            lst.append(comp)
    jx, jy, jz = (jnp.concatenate(lst, axis=0) for lst in comps)
    tvalid = jnp.tile(pvalid, len(sizes))
    # batch-normalize to affine: x/z^2, y/z^3 (invalid lanes use z=1)
    one = jnp.broadcast_to(jnp.asarray(_FQ_ONE), jz.shape)
    z = jnp.where(tvalid[:, None], jz, one)
    zinv = _fq_batch_inv(z)
    zinv2 = jax.jit(_fq.square)(zinv)
    tx = jax.jit(_fq.mul)(jx, zinv2)
    ty = jax.jit(_fq.mul)(jy, jax.jit(_fq.mul)(zinv, zinv2))
    return WindowTable(c, n, tx, ty, tvalid)


_STRATEGY_OVERRIDE: list[str | None] = [None]


class msm_strategy:
    """Context manager forcing the fixed-base MSM strategy for a scope
    (stronger than ZEROG_MSM_STRATEGY). Used by keygen to run its one-time
    commitments on the compile-light segscan pipeline: keygen is dominated
    by cold compiles, not steady-state throughput (r4: 998.7 s of which
    ~790 s was the Pallas flush engine's cold compile)."""

    def __init__(self, strategy: str | None):
        self.strategy = strategy

    def __enter__(self):
        self.prev = _STRATEGY_OVERRIDE[0]
        _STRATEGY_OVERRIDE[0] = self.strategy
        return self

    def __exit__(self, *exc):
        _STRATEGY_OVERRIDE[0] = self.prev
        return False


def msm_fixed_host(sl, table: WindowTable):
    """Merged-window fixed-base MSM. sl: uint32[B, N, 16] canonical scalar
    limbs; table from build_window_table. Returns [B] affine host points.

    Default pipeline is the flush scan: measured 106k pts/s vs the log-depth
    segmented scan's 8.4k at 2^14xB=4 on the v5e (scripts/bench_msm_r4.py,
    r4) — segscan's 19 full-width incomplete adds are work-bound ~27x above
    the flush scan's one-pass stream, while flush's 1024 narrow steps are
    latency-bound at ~0.4 ms each and finish first. segscan compiles ~6x
    faster and remains selectable (ZEROG_MSM_STRATEGY=segscan, or the
    msm_strategy context manager) for compile-budget-bound contexts."""
    import os

    strategy = _STRATEGY_OVERRIDE[0] or os.environ.get(
        "ZEROG_MSM_STRATEGY", "flush")
    if strategy == "segscan":
        return _msm_fixed_segscan(sl, table)
    b = int(sl.shape[0])
    c = table.c
    m = int(table.tx.shape[0])
    r_rows = _pip_r_rows(m)
    prep = _pipfb_prep(sl, table.tx, table.ty, table.tvalid, c=c,
                       r_rows=r_rows)
    # ZEROG_MSM_COMPACT=always runs the compaction round unconditionally:
    # deterministic launch structure and no per-MSM host sync on max_run
    # (witness columns trigger compaction anyway; random rows pay one extra
    # piece-stream scan).
    mrb = m if os.environ.get("ZEROG_MSM_COMPACT", "auto") == "always" else None
    host, neg_k, lo_bits = _bucket_pipeline(prep, r_rows, c,
                                            max_run_bound=mrb)
    results = []
    for bi in range(b):
        w_hi = g1_add(host[2 * bi], neg_k)
        w_lo = g1_add(host[2 * bi + 1], neg_k)
        results.append(g1_add(g1_mul(w_hi, 1 << lo_bits), w_lo))
    return results


# ---- log-depth segmented-scan bucket pipeline --------------------------------
#
# ALTERNATIVE pipeline (ZEROG_MSM_STRATEGY=segscan), kept for compile-bound
# contexts: it compiles ~6x faster than the flush path (82 s vs 500 s cold)
# but runs ~13x SLOWER at 2^14xB=4 (r4 measurement, scripts/bench_msm_r4.py):
# its log2(M)=19 full-width incomplete adds cost ~19x the flush scan's
# one-pass work, which dwarfs the flush path's sequential-depth overhead
# (~1536 narrow scan steps at ~0.4 ms each). Three log-depth stages:
#
#   1. segmented inclusive scan (Hillis-Steele) over the sorted digit stream:
#      ceil(log2(max_run)) full-width steps (~6-8 for random scalars) instead
#      of R sequential rows; each step is ONE incomplete add over all M lanes
#      (safe: operands are sums of disjoint subsets of distinct table points).
#   2. one scatter of each segment's last lane into the bucket array.
#   3. weighted bucket fold sum_k k*B_k via per-bucket bias injection
#      B'_k = B_k + (k+1)*K — every partial sum carries a DISTINCT multiple
#      of the bias point K, so incomplete adds cannot collide even between
#      empty-bucket runs — then a log-depth suffix scan + log-depth tree
#      reduction, and the host subtracts the known total bias multiple.
#
# Sequential depth: ~(steps + 1 + c + log2(nb)) point adds total (~34 at
# c=13) vs ~1500+; every step is full-width VPU work.


@functools.partial(jax.jit, static_argnames=("c",))
def _segscan_prep(sl, tx, ty, tv, c: int):
    """Sort the merged digit stream and gather table points into stream
    order. Returns (ds, gx, gy, gv, seg_id, last)."""
    digits = _digits_balanced(sl, c)                # [W, B, N]
    w, b, n = digits.shape
    ds = jnp.moveaxis(digits, 0, 1).reshape(b, w * n)
    ds = jnp.where(tv[None, :], ds, 0)              # invalid lanes -> bucket 0
    order = jnp.argsort(ds, axis=-1)
    ds = jnp.take_along_axis(ds, order, axis=-1)
    gx = jnp.take_along_axis(
        jnp.broadcast_to(tx, (b,) + tx.shape), order[..., None], axis=1)
    gy = jnp.take_along_axis(
        jnp.broadcast_to(ty, (b,) + ty.shape), order[..., None], axis=1)
    gv = jnp.take_along_axis(jnp.broadcast_to(tv, (b,) + tv.shape), order,
                             axis=1)
    new_seg = jnp.concatenate(
        [jnp.ones((b, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1)
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32), axis=1)
    last = jnp.concatenate([new_seg[:, 1:], jnp.ones((b, 1), bool)], axis=1)
    return ds, gx, gy, gv, seg_id, last


@functools.partial(jax.jit, static_argnames=("steps",))
def _segscan_run(gx, gy, gv, seg_id, steps: int):
    """Hillis-Steele segmented inclusive point scan: after `steps` rounds
    each lane holds the sum of the up-to-2^steps preceding lanes of its
    segment (enough when 2^steps >= longest nonzero-bucket run).

    Lane shifts use shift_fill (pad + dynamic slice), NOT jnp.roll — the
    roll lowering costs ~450 ms/step fused on TPU vs ~0.04 ms for this form
    (the 8-step scan measured 0.3 ms total). Shifted-in point lanes are
    all-zero (Z = 0 = infinity) and shifted-in seg ids are -1 (matches no
    segment), so no wraparound masking is needed."""
    acc = jac_from_affine(gx, gy, gv)
    shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)

    def body(acc, shift):
        shifted = tuple(shift_fill(comp, shift, fill=0, axis=1)
                        for comp in acc)
        ok = seg_id == shift_fill(seg_id, shift, fill=-1, axis=1)
        summed = jac_add_incomplete(acc, shifted)
        return jac_select(ok, summed, acc), None

    acc, _ = jax.lax.scan(body, acc, shifts)
    return acc


@functools.partial(jax.jit, static_argnames=("c",))
def _segscan_buckets(acc, ds, last, c: int):
    """Scatter each segment's final lane into [B, 2^c] bucket slots (jac;
    empty slots are all-zero = infinity). Bucket 0 is dropped (weight 0)."""
    nb = 1 << c
    b = ds.shape[0]
    key = jnp.where(last & (ds > 0), ds, nb)        # nb -> dropped
    packed = jnp.concatenate(acc, axis=-1)          # [B, M, 48]
    barr = jnp.arange(b)[:, None]
    out = (jnp.zeros((b, nb, 48), jnp.uint32)
           .at[barr, key].set(packed, mode="drop"))
    return out[..., :16], out[..., 16:32], out[..., 32:]


@functools.cache
def _segscan_bias(c: int):
    """Device table of multiples (k+1)*K for k = 0..2^c-1 (built with the
    COMPLETE add — equal operands occur while doubling), plus the host total
    bias multiple M_total = sum_{j=1}^{nb-1} sum_{k=j}^{nb-1} (k+1)."""
    nb = 1 << c
    _, (kx, ky, kz) = _pip_bias()
    arr = tuple(jnp.broadcast_to(comp, (nb, 16)) for comp in (kx, ky, kz))
    shifts = jnp.asarray([1 << s for s in range(c)], jnp.int32)

    @jax.jit
    def build(arr):
        def body(arr, shift):
            shifted = tuple(shift_fill(comp, shift, fill=0, axis=0)
                            for comp in arr)
            return jac_add(arr, shifted), None

        arr, _ = jax.lax.scan(body, arr, shifts)
        return arr

    bias = build(arr)
    m_total = sum(
        (nb * (nb + 1) - j * (j + 1)) // 2 for j in range(1, nb)
    )
    return bias, m_total


@functools.partial(jax.jit, static_argnames=("c",))
def _segscan_fold(bx, by, bz, bias, c: int):
    """sum_k k*B_k via biased suffix scan: S_j = sum_{k>=j} (B_k + (k+1)K),
    then T = sum_{j>=1} S_j; the caller subtracts M_total*K. Incomplete adds
    are collision-free because every operand embeds a distinct multiple of
    K."""
    nb = 1 << c
    idx = jnp.arange(nb)[None, :]
    b = bx.shape[0]
    acc = jac_add_incomplete(
        (bx, by, bz),
        tuple(jnp.broadcast_to(comp, (b, nb, 16)) for comp in bias))
    shifts = jnp.asarray([1 << s for s in range(c)], jnp.int32)

    # backward shift_fill brings in all-zero (infinity) lanes, which the
    # incomplete add treats as identity — no edge masking needed
    def suffix(acc, shift):
        shifted = tuple(shift_fill(comp, shift, fill=0, axis=1, backward=True)
                        for comp in acc)
        return jac_add_incomplete(acc, shifted), None

    acc, _ = jax.lax.scan(suffix, acc, shifts)
    # drop S_0 (weight starts at j=1), then tree-reduce lanes 1..nb-1
    inf = jac_infinity((b, nb))
    acc = jac_select(idx == 0, inf, acc)

    acc, _ = jax.lax.scan(suffix, acc, jnp.flip(shifts))
    return tuple(comp[:, 0] for comp in acc)


def _msm_fixed_segscan(sl, table: WindowTable):
    b = int(sl.shape[0])
    c = table.c
    prep = _segscan_prep(jnp.asarray(sl), table.tx, table.ty, table.tvalid,
                         c=c)
    ds, gx, gy, gv, seg_id, last = prep
    # full log2(M) steps always: one compiled program per table size, no
    # host sync, and a shift_fill step costs ~0.04 ms — covering the worst
    # skew is cheaper than a second compile variant
    steps = max(1, int(ds.shape[1] - 1).bit_length())
    acc = _segscan_run(gx, gy, gv, seg_id, steps)
    bx, by, bz = _segscan_buckets(acc, ds, last, c=c)
    bias, m_total = _segscan_bias(c)
    tot = _segscan_fold(bx, by, bz, bias, c=c)
    host = points_from_device(tot)
    kp, _ = _pip_bias()
    neg_bias_total = g1_mul((kp[0], (-kp[1]) % FQ.p), m_total)
    return [g1_add(pt, neg_bias_total) for pt in host]


BIT_CHUNK = 32


@functools.partial(jax.jit, static_argnames=())
def _bits_device(scalar_limbs):
    """uint32[B, N, 16] -> bool[256, B, N], MSB first (top 2 bits are zero
    for canonical Fr scalars; leading zeros are free in double-and-add)."""
    rows = []
    for j in range(255, -1, -1):
        rows.append(((scalar_limbs[..., j // 16] >> (j % 16)) & 1) > 0)
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=())
def _danaa_chunk(acc, bits_chunk, px, py, pvalid):
    """BIT_CHUNK double-and-add steps. acc: Jacobian [B, N]; bits_chunk:
    bool[BIT_CHUNK, B, N] (MSB first). One modest compile, reused for every
    chunk of every MSM — keeps each device program small."""
    b, n = bits_chunk.shape[1], bits_chunk.shape[2]
    base = jac_from_affine(
        jnp.broadcast_to(px, (b, n, 16)),
        jnp.broadcast_to(py, (b, n, 16)),
        jnp.broadcast_to(pvalid, (b, n)),
    )

    def step(acc, bit_row):
        acc = jac_double(acc)
        added = jac_add(acc, base)
        return jac_select(bit_row, added, acc), None

    acc, _ = jax.lax.scan(step, acc, bits_chunk)
    return acc


@functools.partial(jax.jit, static_argnames=())
def _reduce_lanes(acc):
    """Fold the N axis of Jacobian [B, N] points into [B]."""
    n = acc[0].shape[1]
    acc_t = tuple(jnp.swapaxes(comp, 0, 1) for comp in acc)  # [N, B, 16]
    total = _suffix_scan(acc_t, n)
    return tuple(comp[0] for comp in total)


def _msm_danaa_device(bits, px, py, pvalid):
    """Lane-parallel double-and-add MSM, chunk-dispatched.

    bits: bool[256, B, N] (MSB first); points: mont affine [N, 16].
    Returns Jacobian [B] points. The complete (unified) add makes this the
    safe strategy for arbitrary/adversarial point sets; the default for the
    prover's fixed SRS bases is the bucketed pipeline (see `msm_fixed_host`).
    """
    b, n = bits.shape[1], bits.shape[2]
    acc = jac_infinity((b, n))
    for i in range(0, 256, BIT_CHUNK):
        acc = _danaa_chunk(acc, bits[i : i + BIT_CHUNK], px, py, pvalid)
    return _reduce_lanes(acc)


def msm(scalars, points_dev=None, c: int | None = None,
        strategy: str = "pippenger", table: WindowTable | None = None):
    """Host-facing MSM.

    scalars: 2D list/array [B][N] of ints in [0, r) (or 1D for B=1);
    points_dev: (px, py, pvalid) from :func:`points_to_device`, or pass
    `table` (a :class:`WindowTable`) to use the merged-window fixed-base
    path (strategy "fixed").
    Returns list of B affine points (or a single point for 1D input).

    The batch dimension is padded up to a power of two so the jitted graph is
    reused across phases instead of recompiling per B.
    """
    single = not isinstance(scalars[0], (list, tuple, np.ndarray))
    if single:
        scalars = [scalars]
    if table is not None:
        strategy = "fixed"
        n = table.n
    else:
        px, py, pvalid = points_dev
        n = px.shape[0]
    b_real = len(scalars)
    b_pad = 1
    while b_pad < b_real:
        b_pad *= 2
    if b_pad > b_real:
        scalars = list(scalars) + [[0] * len(scalars[0])] * (b_pad - b_real)
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object) % FR.p))

    if strategy == "fixed":
        if table is None:
            raise ValueError("strategy='fixed' requires a WindowTable")
        results = msm_fixed_host(sl, table)
        results = results[:b_real]
        return results[0] if single else results

    if c is None:
        c = default_window(n)
    if strategy == "pippenger":
        results = msm_pippenger_host(sl, jnp.asarray(px),
                                     jnp.asarray(py), jnp.asarray(pvalid), c)
        results = results[:b_real]
        return results[0] if single else results

    if strategy == "danaa":
        bits = _bits_device(sl)
        acc = _msm_danaa_device(bits, px, py, jnp.asarray(pvalid))
        acc = tuple(comp[:b_real] for comp in acc)
        results = points_from_device(acc)
        return results[0] if single else results

    # "scan": the legacy per-window segmented-scan pipeline
    sums = msm_device(sl, px, py, jnp.asarray(pvalid), c)
    sums = tuple(comp[:b_real] for comp in sums)
    b = b_real
    results = []
    w = sums[0].shape[1]
    # normalize all window sums in one host batch
    flat = tuple(comp.reshape(b * w, 16) for comp in sums)
    affine = points_from_device(flat)
    for i in range(b):
        results.append(_fold_windows_host(affine[i * w : (i + 1) * w], c))
    return results[0] if single else results


@functools.partial(jax.jit, static_argnames=())
def _expand_chunk(acc, bits, dx, dy):
    """Add BIT_CHUNK doubling-table entries (masked) into acc [N].

    Uses the mixed incomplete add: entries are affine (the doubling table of
    the base), and the incomplete contract's only broken case (acc == entry,
    both valid) cannot occur — after processing bits < i the accumulator is
    (k mod 2^i) * base with k mod 2^i < 2^i <= 2^253 < r, so its scalar never
    equals the entry's 2^i. The cancellation lane acc == -entry (possible at
    i = 253 since r - 2^253 < 2^253) IS handled: h = 0, r != 0 gives Z3 = 0,
    the correct identity encoding."""
    n = bits.shape[1]

    def step(carry, xs):
        b, x, y = xs
        return jac_madd_incomplete(
            carry,
            jnp.broadcast_to(x, (n, 16)),
            jnp.broadcast_to(y, (n, 16)),
            b,
        ), None

    acc, _ = jax.lax.scan(step, acc, (bits, dx, dy))
    return acc


def _expand_body(bits, dx, dy):
    n = bits.shape[1]
    acc = jac_infinity((n,))
    # pad the bit rows to a BIT_CHUNK multiple so one compiled chunk is reused
    total = bits.shape[0]
    pad = (-total) % BIT_CHUNK
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad, n), bool)], axis=0)
        dx = jnp.concatenate([dx, jnp.zeros((pad, 16), jnp.uint32)], axis=0)
        dy = jnp.concatenate([dy, jnp.zeros((pad, 16), jnp.uint32)], axis=0)
    for i in range(0, bits.shape[0], BIT_CHUNK):
        acc = _expand_chunk(acc, bits[i : i + BIT_CHUNK], dx[i : i + BIT_CHUNK],
                            dy[i : i + BIT_CHUNK])
    return acc


def fixed_base_expand(base, scalars):
    """Compute [s * base for s in scalars] on device (for SRS generation).

    base: host affine point; scalars: list of ints. Returns affine host points.
    """
    scalars = [int(s) % FR.p for s in scalars]
    n = len(scalars)
    doublings = []
    pt = base
    for _ in range(SCALAR_BITS):
        doublings.append(pt)
        pt = g1_double(pt)
    dx, dy, _ = points_to_device(doublings)
    raw = b"".join(s.to_bytes(32, "little") for s in scalars)
    bytes_arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 32)
    bits = np.unpackbits(bytes_arr, axis=1, bitorder="little")[:, :SCALAR_BITS]
    bits = np.ascontiguousarray(bits.T).astype(bool)  # [SCALAR_BITS, n]
    acc = _expand_body(jnp.asarray(bits), jnp.asarray(dx), jnp.asarray(dy))
    return points_from_device(acc)
