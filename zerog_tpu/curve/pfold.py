"""Pallas TPU kernels for the MSM bucket-fold stages.

Replaces the XLA `lax.scan` linear folds in pippenger (`_pipv2_sum_rows`,
`_pipv2_weighted`): at their [G, W] lane widths the XLA scan steps are
latency-bound (~0.4 ms per row — ~0.26 s of every MSM batch); here the L-row
fold runs inside one Pallas program with the accumulator in vector registers.

Arithmetic order is identical to the XLA fold (row 0 first), so results are
bit-exact — the MSM parity tests cover both engines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pscan import (
    _add_incomplete, _R_MONT_LIMBS, _TILE_SUB, NLIMB, _interpret,
    stream_to_rowplanes,
)

__all__ = ["sum_rows_pallas", "weighted_pallas"]

_L_CHUNK = 8


def _init_inf(cx, cy, cz):
    for i in range(NLIMB):
        one = jnp.full_like(cx[i], _R_MONT_LIMBS[i])
        cx[i] = one
        cy[i] = one
        cz[i] = jnp.zeros_like(cz[i])


@functools.cache
def _sum_rows_call(l_rows: int, mt: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert l_rows % _L_CHUNK == 0 and mt % _TILE_SUB == 0
    grid = (mt // _TILE_SUB, l_rows // _L_CHUNK)

    spec = pl.BlockSpec((_L_CHUNK, NLIMB, _TILE_SUB, 128),
                        lambda ci, ri: (ri, 0, ci, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, NLIMB, _TILE_SUB, 128),
                            lambda ci, ri: (0, 0, ci, 0),
                            memory_space=pltpu.VMEM)

    def body(x_ref, y_ref, z_ref, ox, oy, oz, cx, cy, cz):
        @pl.when(pl.program_id(1) == 0)
        def _():
            _init_inf(cx, cy, cz)

        def row(rr, carry):
            px, py, pz = carry
            qx = [x_ref[rr, i] for i in range(NLIMB)]
            qy = [y_ref[rr, i] for i in range(NLIMB)]
            qz = [z_ref[rr, i] for i in range(NLIMB)]
            return _add_incomplete(px, py, pz, qx, qy, qz)

        carry0 = ([cx[i] for i in range(NLIMB)],
                  [cy[i] for i in range(NLIMB)],
                  [cz[i] for i in range(NLIMB)])
        # fori_loop body traces ONE add instead of _L_CHUNK (same order,
        # bit-exact; ~8x smaller Mosaic compile — see pscan.py)
        px, py, pz = jax.lax.fori_loop(0, _L_CHUNK, row, carry0)
        for i in range(NLIMB):
            cx[i] = px[i]
            cy[i] = py[i]
            cz[i] = pz[i]

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            for i in range(NLIMB):
                ox[0, i] = cx[i]
                oy[0, i] = cy[i]
                oz[0, i] = cz[i]

    shape = jax.ShapeDtypeStruct((1, NLIMB, mt, 128), jnp.uint32)
    call = pl.pallas_call(
        body,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((NLIMB, _TILE_SUB, 128), jnp.uint32)
                        for _ in range(3)],
        interpret=interpret,
    )
    return call if interpret else jax.jit(call)


@functools.cache
def _weighted_call(k_rows: int, mt: int, interpret: bool):
    """Weighted fold: rows k = K-1 .. 0 (already flipped by the caller);
    per row: a2 += a1; a1 += row. Returns a2 (+ bias, provided as init)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert k_rows % _L_CHUNK == 0 and mt % _TILE_SUB == 0
    grid = (mt // _TILE_SUB, k_rows // _L_CHUNK)

    spec = pl.BlockSpec((_L_CHUNK, NLIMB, _TILE_SUB, 128),
                        lambda ci, ri: (ri, 0, ci, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, NLIMB, _TILE_SUB, 128),
                             lambda ci, ri: (0, 0, ci, 0),
                             memory_space=pltpu.VMEM)
    out_spec = bias_spec

    def body(x_ref, y_ref, z_ref, bx_ref, by_ref, bz_ref,
             ox, oy, oz, a1x, a1y, a1z, a2x, a2y, a2z):
        @pl.when(pl.program_id(1) == 0)
        def _():
            _init_inf(a1x, a1y, a1z)
            for i in range(NLIMB):
                a2x[i] = bx_ref[0, i]
                a2y[i] = by_ref[0, i]
                a2z[i] = bz_ref[0, i]

        p1 = ([a1x[i] for i in range(NLIMB)], [a1y[i] for i in range(NLIMB)],
              [a1z[i] for i in range(NLIMB)])
        p2 = ([a2x[i] for i in range(NLIMB)], [a2y[i] for i in range(NLIMB)],
              [a2z[i] for i in range(NLIMB)])

        def row(rr, carry):
            p1, p2 = carry
            qx = [x_ref[rr, i] for i in range(NLIMB)]
            qy = [y_ref[rr, i] for i in range(NLIMB)]
            qz = [z_ref[rr, i] for i in range(NLIMB)]
            p2 = _add_incomplete(*p2, *p1)
            p1 = _add_incomplete(*p1, qx, qy, qz)
            return (p1, p2)

        p1, p2 = jax.lax.fori_loop(0, _L_CHUNK, row, (p1, p2))
        for i in range(NLIMB):
            a1x[i], a1y[i], a1z[i] = p1[0][i], p1[1][i], p1[2][i]
            a2x[i], a2y[i], a2z[i] = p2[0][i], p2[1][i], p2[2][i]

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            for i in range(NLIMB):
                ox[0, i] = a2x[i]
                oy[0, i] = a2y[i]
                oz[0, i] = a2z[i]

    shape = jax.ShapeDtypeStruct((1, NLIMB, mt, 128), jnp.uint32)
    call = pl.pallas_call(
        body,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec, spec, spec, bias_spec, bias_spec, bias_spec],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((NLIMB, _TILE_SUB, 128), jnp.uint32)
                        for _ in range(6)],
        interpret=interpret,
    )
    return call if interpret else jax.jit(call)


def _pad_rows(a, chunk):
    l = a.shape[0]
    lp = ((l + chunk - 1) // chunk) * chunk
    if lp != l:
        a = jnp.pad(a, ((0, lp - l),) + ((0, 0),) * (a.ndim - 1))
    return a


def _to_planes3(comps, ct):
    """Three [L, A, B, 16] arrays -> three [L, 16, ct/128, 128] plane arrays.
    Identity-padding convention: padded lanes are all-zero, and Z = 0 encodes
    infinity, so the incomplete add treats them as the identity."""
    return tuple(stream_to_rowplanes(c, ct) for c in comps)


def _from_carry(comps, g: int, w: int):
    """Three [16, MT, 128] -> three [G, W, 16]."""
    out = []
    for a in comps:
        x = jnp.moveaxis(a, 0, 2).reshape(-1, NLIMB)
        out.append(x[: g * w].reshape(g, w, NLIMB))
    return tuple(out)


def sum_rows_pallas(xs):
    """Drop-in for pippenger._pipv2_sum_rows: fold [L, G, W] jac rows into
    [G, W] with a left-to-right incomplete-add chain."""
    l, g, w = xs[0].shape[:3]
    ct = max(1024, ((g * w + 1023) // 1024) * 1024)
    sx, sy, sz = _to_planes3(xs, ct)
    sx, sy, sz = (_pad_rows(a, _L_CHUNK) for a in (sx, sy, sz))
    ox, oy, oz = _sum_rows_call(sx.shape[0], ct // 128, _interpret())(sx, sy, sz)
    return _from_carry((ox[0], oy[0], oz[0]), g, w)


def weighted_pallas(stacked, bias):
    """Drop-in for pippenger._pipv2_weighted: stacked jac [K, G, 2] rows
    (k = K-1 .. 0); returns bias + sum_k k*row_k as [G, 2].

    K must be a multiple of _L_CHUNK: a padded zero row is NOT a no-op here
    (each row still executes a2 += a1), so silent padding would corrupt the
    weighted sum. Callers guarantee this via the hi_n % 8 == 0 gate."""
    k_rows, g, two = stacked[0].shape[:3]
    assert k_rows % _L_CHUNK == 0, (
        f"weighted_pallas requires K % {_L_CHUNK} == 0 rows, got {k_rows}")
    ct = max(1024, ((g * two + 1023) // 1024) * 1024)
    sx, sy, sz = _to_planes3(stacked, ct)
    bias_rows = tuple(
        stream_to_rowplanes(jnp.broadcast_to(b, (1, g, two, NLIMB)), ct)
        for b in bias)
    ox, oy, oz = _weighted_call(sx.shape[0], ct // 128, _interpret())(
        sx, sy, sz, *bias_rows)
    return _from_carry((ox[0], oy[0], oz[0]), g, two)
