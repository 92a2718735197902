"""Pallas TPU kernel for the MSM flush-scan bucket accumulation.

Replaces the `lax.scan` flush pipeline in :mod:`pippenger` (`_flush_scan`)
whose per-row step cost ~0.4 ms on the tunneled v5e — the XLA elementwise
point-add chain is materialization-bound (see field/pfield.py). Here the
whole R-row scan runs inside one Pallas program: the Jacobian carry lives in
VMEM scratch across grid steps, every limb op is a full (8, 128) vector op,
and HBM is touched once for the stream and once for the pieces.

Layout: a stream of R point rows over CT columns is stored as
``uint32[R, 16, CT//128, 128]`` per coordinate ("row planes"): row r, limb l,
then the column axis split into (sublane, lane). CT must be a multiple of
1024 (8 sublanes x 128 lanes per vreg tile).

Grid: ``(CT // TILE_C, R // R_CHUNK)`` — the R axis iterates fastest, so the
carry scratch persists across R-chunks of one column tile (TPU grid execution
is sequential).

Two kernels:
- affine stream (round 1: base points, Z=1 implicit, valid mask): mixed
  madd (8M+3S) per row;
- jacobian stream (round 2 after compaction): full incomplete add (12M+4S).

Both use the INCOMPLETE add contract documented in curve/jpoints.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.params import FQ
from ..field.pfield import _mul_body, _add_body, _sub_body, NLIMB

__all__ = ["flush_scan_pallas", "stream_to_rowplanes", "pieces_from_rowplanes"]

_PF_PARAMS = None


def _params():
    global _PF_PARAMS
    if _PF_PARAMS is None:
        from ..field.pfield import pfq

        pf = pfq()
        _PF_PARAMS = (pf.p_limbs, pf.nprime, pf.negp)
    return _PF_PARAMS


_R_MONT_LIMBS = [(FQ.r_mont >> (16 * i)) & 0xFFFF for i in range(NLIMB)]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---- limb-list helpers (each limb an [8, 128]-ish array) --------------------

def _mul(a, b):
    return _mul_body(a, b, _params())


def _addf(a, b):
    return _add_body(a, b, _params())


def _subf(a, b):
    return _sub_body(a, b, _params())


def _is_zero(a):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def _select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _zero_like(a):
    return [jnp.zeros_like(x) for x in a]


def _one_mont_like(a):
    return [jnp.full_like(a[i], _R_MONT_LIMBS[i]) for i in range(NLIMB)]


def _madd_incomplete(px, py, pz, qx, qy, qvalid):
    """Mixed Jacobian+affine incomplete add on limb lists (8M + 3S).
    Mirrors jpoints.jac_madd_incomplete exactly."""
    z1z1 = _mul(pz, pz)
    u2 = _mul(qx, z1z1)
    s2 = _mul(qy, _mul(pz, z1z1))
    h = _subf(u2, px)
    r = _subf(s2, py)
    hh = _mul(h, h)
    hhh = _mul(h, hh)
    v = _mul(px, hh)
    rr = _mul(r, r)
    x3 = _subf(_subf(rr, hhh), _addf(v, v))
    y3 = _subf(_mul(r, _subf(v, x3)), _mul(py, hhh))
    z3 = _mul(pz, h)
    p_inf = _is_zero(pz)
    one = _one_mont_like(qx)
    zq = _select(qvalid, one, _zero_like(qx))
    x_out = _select(p_inf, qx, x3)
    y_out = _select(p_inf, qy, y3)
    z_out = _select(p_inf, zq, z3)
    x_out = _select(qvalid, x_out, px)
    y_out = _select(qvalid, y_out, py)
    z_out = _select(qvalid, z_out, pz)
    return x_out, y_out, z_out


def _add_incomplete(px, py, pz, qx, qy, qz):
    """General Jacobian incomplete add (12M + 4S); mirrors
    jpoints.jac_add_incomplete."""
    z1z1 = _mul(pz, pz)
    z2z2 = _mul(qz, qz)
    u1 = _mul(px, z2z2)
    u2 = _mul(qx, z1z1)
    s1 = _mul(py, _mul(qz, z2z2))
    s2 = _mul(qy, _mul(pz, z1z1))
    h = _subf(u2, u1)
    r = _subf(s2, s1)
    hh = _mul(h, h)
    hhh = _mul(h, hh)
    v = _mul(u1, hh)
    rr = _mul(r, r)
    x3 = _subf(_subf(rr, hhh), _addf(v, v))
    y3 = _subf(_mul(r, _subf(v, x3)), _mul(s1, hhh))
    z3 = _mul(_mul(pz, qz), h)
    p_inf = _is_zero(pz)
    q_inf = _is_zero(qz)
    x_out = _select(p_inf, qx, x3)
    y_out = _select(p_inf, qy, y3)
    z_out = _select(p_inf, qz, z3)
    x_out = _select(q_inf, px, x_out)
    y_out = _select(q_inf, py, y_out)
    z_out = _select(q_inf, pz, z_out)
    return x_out, y_out, z_out


# ---- layout converters ------------------------------------------------------

def stream_to_rowplanes(arr, ct: int):
    """[R, G, C, 16] (or [R, G, C] for masks) -> row planes.

    Flattens (G, C) into CT columns (padded), producing
    uint32[R, 16, CT//128, 128] for limb arrays or bool[R, 1, CT//128, 128]
    for masks. Padded columns get zeros (invalid/identity lanes)."""
    r = arr.shape[0]
    gc = arr.shape[1] * arr.shape[2]
    limbed = arr.ndim == 4
    flat = arr.reshape((r, gc) + ((NLIMB,) if limbed else ()))
    if gc < ct:
        pad = [(0, 0), (0, ct - gc)] + ([(0, 0)] if limbed else [])
        flat = jnp.pad(flat, pad)
    if limbed:
        x = flat.reshape(r, ct // 128, 128, NLIMB)
        return jnp.moveaxis(x, 3, 1)             # [R, 16, ct/128, 128]
    return flat.reshape(r, 1, ct // 128, 128)


def pieces_from_rowplanes(px, py, pz, g: int, c: int):
    """Inverse: three [R, 16, CT/128, 128] -> three [R, G, C, 16] arrays."""
    r, _, mt, _ = px.shape
    ct = mt * 128

    def back(a):
        x = jnp.moveaxis(a, 1, 3).reshape(r, ct, NLIMB)
        return x[:, : g * c].reshape(r, g, c, NLIMB)

    return back(px), back(py), back(pz)


# ---- the scan kernels -------------------------------------------------------

_TILE_SUB = 8          # sublane rows per tile -> TILE_C = 1024 columns
# rows per grid step: bounds the VMEM block footprint. 8 rows keeps
# in(2x double-buffered) + out + scratch ~ 8 MB against the 16 MB scoped
# VMEM limit (64 rows OOMed: 41.56M requested).
_R_CHUNK = 8


def _scan_kernel_affine(x_ref, y_ref, v_ref, f_ref, ox_ref, oy_ref, oz_ref,
                        cx, cy, cz):
    """One (col-tile, R-chunk) grid step: scan R_CHUNK rows, carry in VMEM
    scratch (persists across the R grid axis — it iterates fastest).

    The row loop is a lax.fori_loop, not a Python unroll: the traced body is
    ONE madd instead of R_CHUNK, which cut the Mosaic cold compile ~8x (the
    r4 unrolled kernels cost 786 s of the driver's bench timebox). The
    arithmetic order is unchanged, so outputs stay bit-exact."""
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        # jac_infinity is (1, 1, 0) in Montgomery form — match the XLA
        # pipeline bytewise so pieces compare exactly in parity tests
        for i in range(NLIMB):
            one = jnp.full_like(cx[i], _R_MONT_LIMBS[i])
            cx[i] = one
            cy[i] = one
            cz[i] = jnp.zeros_like(cz[i])

    def row(rr, carry):
        px, py_, pz = carry
        qx = [x_ref[rr, i] for i in range(NLIMB)]
        qy = [y_ref[rr, i] for i in range(NLIMB)]
        qv = v_ref[rr, 0] != 0
        flag = f_ref[rr, 0] != 0
        zero = jnp.zeros_like(qx[0])
        # flushed piece: carry where flag else 0
        for i in range(NLIMB):
            ox_ref[rr, i] = jnp.where(flag, px[i], zero)
            oy_ref[rr, i] = jnp.where(flag, py_[i], zero)
            oz_ref[rr, i] = jnp.where(flag, pz[i], zero)
        ax, ay, az = _madd_incomplete(px, py_, pz, qx, qy, qv)
        one = _one_mont_like(qx)
        zq = _select(qv, one, [zero] * NLIMB)
        ncx = [jnp.where(flag, qx[i], ax[i]) for i in range(NLIMB)]
        ncy = [jnp.where(flag, qy[i], ay[i]) for i in range(NLIMB)]
        ncz = [jnp.where(flag, zq[i], az[i]) for i in range(NLIMB)]
        return (ncx, ncy, ncz)

    carry0 = ([cx[i] for i in range(NLIMB)], [cy[i] for i in range(NLIMB)],
              [cz[i] for i in range(NLIMB)])
    fx, fy, fz = jax.lax.fori_loop(0, _R_CHUNK, row, carry0)
    for i in range(NLIMB):
        cx[i] = fx[i]
        cy[i] = fy[i]
        cz[i] = fz[i]


def _scan_kernel_jac(x_ref, y_ref, z_ref, f_ref, ox_ref, oy_ref, oz_ref,
                     cx, cy, cz):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        for i in range(NLIMB):
            one = jnp.full_like(cx[i], _R_MONT_LIMBS[i])
            cx[i] = one
            cy[i] = one
            cz[i] = jnp.zeros_like(cz[i])

    def row(rr, carry):
        px, py_, pz = carry
        qx = [x_ref[rr, i] for i in range(NLIMB)]
        qy = [y_ref[rr, i] for i in range(NLIMB)]
        qz = [z_ref[rr, i] for i in range(NLIMB)]
        flag = f_ref[rr, 0] != 0
        zero = jnp.zeros_like(qx[0])
        for i in range(NLIMB):
            ox_ref[rr, i] = jnp.where(flag, px[i], zero)
            oy_ref[rr, i] = jnp.where(flag, py_[i], zero)
            oz_ref[rr, i] = jnp.where(flag, pz[i], zero)
        ax, ay, az = _add_incomplete(px, py_, pz, qx, qy, qz)
        ncx = [jnp.where(flag, qx[i], ax[i]) for i in range(NLIMB)]
        ncy = [jnp.where(flag, qy[i], ay[i]) for i in range(NLIMB)]
        ncz = [jnp.where(flag, qz[i], az[i]) for i in range(NLIMB)]
        return (ncx, ncy, ncz)

    carry0 = ([cx[i] for i in range(NLIMB)], [cy[i] for i in range(NLIMB)],
              [cz[i] for i in range(NLIMB)])
    fx, fy, fz = jax.lax.fori_loop(0, _R_CHUNK, row, carry0)
    for i in range(NLIMB):
        cx[i] = fx[i]
        cy[i] = fy[i]
        cz[i] = fz[i]


@functools.cache
def _flush_scan_call(r: int, mt: int, affine: bool, interpret: bool):
    """Build (once per shape) the jitted pallas_call for the flush scan.

    Caching the constructed callable is essential: a fresh pallas_call
    closure per invocation defeats jax's compilation cache — measured 21 s
    per warm MSM (every call re-lowered the kernel) vs ~30 ms cached."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert r % _R_CHUNK == 0, f"R={r} not a multiple of {_R_CHUNK}"
    assert mt % _TILE_SUB == 0, f"MT={mt} not a multiple of {_TILE_SUB}"

    grid = (mt // _TILE_SUB, r // _R_CHUNK)

    def spec(nlimb):
        return pl.BlockSpec(
            (_R_CHUNK, nlimb, _TILE_SUB, 128),
            lambda ci, ri: (ri, 0, ci, 0),
            memory_space=pltpu.VMEM)

    carry_spec = pl.BlockSpec(
        (1, NLIMB, _TILE_SUB, 128),
        lambda ci, ri: (0, 0, ci, 0),
        memory_space=pltpu.VMEM)

    kernel = _scan_kernel_affine if affine else _scan_kernel_jac

    def body(x_ref, y_ref, t_ref, f_ref, ox, oy, oz, ocx, ocy, ocz,
             cx, cy, cz):
        kernel(x_ref, y_ref, t_ref, f_ref, ox, oy, oz, cx, cy, cz)
        # persist the final carry on the last R step
        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            for i in range(NLIMB):
                ocx[0, i] = cx[i]
                ocy[0, i] = cy[i]
                ocz[0, i] = cz[i]

    out_shapes = (
        jax.ShapeDtypeStruct((r, NLIMB, mt, 128), jnp.uint32),
        jax.ShapeDtypeStruct((r, NLIMB, mt, 128), jnp.uint32),
        jax.ShapeDtypeStruct((r, NLIMB, mt, 128), jnp.uint32),
        jax.ShapeDtypeStruct((1, NLIMB, mt, 128), jnp.uint32),
        jax.ShapeDtypeStruct((1, NLIMB, mt, 128), jnp.uint32),
        jax.ShapeDtypeStruct((1, NLIMB, mt, 128), jnp.uint32),
    )
    third_nl = NLIMB if not affine else 1
    call = pl.pallas_call(
        body,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec(NLIMB), spec(NLIMB), spec(third_nl), spec(1)],
        out_specs=(spec(NLIMB), spec(NLIMB), spec(NLIMB),
                   carry_spec, carry_spec, carry_spec),
        scratch_shapes=[
            pltpu.VMEM((NLIMB, _TILE_SUB, 128), jnp.uint32),
            pltpu.VMEM((NLIMB, _TILE_SUB, 128), jnp.uint32),
            pltpu.VMEM((NLIMB, _TILE_SUB, 128), jnp.uint32),
        ],
        interpret=interpret,
    )
    if interpret:
        return call
    return jax.jit(call)


def flush_scan_pallas(sx, sy, sv_or_sz, flags, affine: bool = True):
    """Run the flush scan over row planes.

    sx, sy (, sz): uint32[R, 16, MT, 128]; sv/flags: [R, 1, MT, 128]
    (uint32 or bool). Returns (px, py, pz, carry_x, carry_y, carry_z):
    pieces [R, 16, MT, 128] and the final carry [16, MT, 128].
    """
    r, _, mt, _ = sx.shape
    fl = flags.astype(jnp.uint32)
    third = sv_or_sz.astype(jnp.uint32)
    call = _flush_scan_call(r, mt, bool(affine), _interpret())
    px, py, pz, ccx, ccy, ccz = call(sx, sy, third, fl)
    return px, py, pz, ccx[0], ccy[0], ccz[0]
