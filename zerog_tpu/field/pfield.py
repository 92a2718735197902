"""Pallas TPU kernels for BN254 field arithmetic (the hot-path formulation).

Why this exists (r4 measurement, scripts/bench_layout.py): the XLA elementwise
formulation in :mod:`jfield` sustains ~65 M Fr-muls/s on the v5e — it is
materialization-bound: the ~500-HLO mul chain exceeds XLA's fusion windows, so
roughly every 7th intermediate round-trips through HBM. A Pallas kernel runs
the whole separated-Montgomery pipeline out of VMEM/vector registers, paying
HBM only for kernel inputs and outputs.

Layout: field elements are stored in **plane layout** — ``uint32[16, M, 128]``
for N = M * 128 elements: limb index leads, and each limb plane [M, 128] maps
exactly onto the VPU's (sublane, lane) grid, so every limb-level op runs at
full vector width. (The jfield trailing-limb layout [N, 16] uses 16 of 128
lanes — 12.5 % — and the r4 probe showed XLA does not fix this on its own.)

Conversion helpers ``to_planes`` / ``from_planes`` bridge the two layouts on
device; sustained pipelines (NTT, MSM scan) should stay in plane layout.

Algorithm per element (identical to jfield.mul, bit for bit):
    T = a * b                      512-bit schoolbook, 16x16 16-bit limbs
    m = T_lo * (-p^-1) mod 2^256   low-half convolution
    s = (T + m * p) / 2^256        full convolution + exact shift
    out = s - p if s >= p else s
Column sums stay < 2^21 in uint32 lanes (32 products of < 2^32 split into
16-bit halves), exactly as in jfield — no overflow anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import FieldParams, FR, FQ

__all__ = [
    "to_planes", "from_planes", "PField", "pfr", "pfq", "PLANE_LANES",
]

NLIMB = 16
MASK = (1 << 16) - 1
PLANE_LANES = 128


def _interpret() -> bool:
    """Pallas kernels compile for TPU; on CPU (tests) run them interpreted."""
    return jax.default_backend() == "cpu"


def to_planes(limbs):
    """uint32[..., N, 16] trailing-limb -> plane layout uint32[..., 16, M, 128]
    (N must be a multiple of 128; pad first if needed)."""
    n = limbs.shape[-2]
    assert n % PLANE_LANES == 0, f"N={n} not a multiple of {PLANE_LANES}"
    m = n // PLANE_LANES
    batch = limbs.shape[:-2]
    x = limbs.reshape(batch + (m, PLANE_LANES, NLIMB))
    x = jnp.moveaxis(x, -1, -3)          # [..., 16, m, 128]
    return x


def from_planes(planes):
    """Inverse of :func:`to_planes`."""
    batch = planes.shape[:-3]
    m = planes.shape[-2]
    x = jnp.moveaxis(planes, -3, -1)     # [..., m, 128, 16]
    return x.reshape(batch + (m * PLANE_LANES, NLIMB))


def _mul_body(a, b, params_np):
    """Separated Montgomery product over limb-plane lists.

    a, b: lists of 16 arrays [*, 128] (uint32, canonical 16-bit limbs).
    Returns a list of 16 arrays. Pure jnp — usable inside any Pallas kernel
    body (or plain jit, for the interpret path).
    """
    p_limbs, nprime, negp = params_np

    def conv_full(x, y):
        """Full 512-bit schoolbook product -> 33 column arrays (carried)."""
        cols = [None] * (2 * NLIMB + 1)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(NLIMB):
            xi = x[i]
            for j in range(NLIMB):
                prod = xi * y[j]
                acc(i + j, prod & MASK)
                acc(i + j + 1, prod >> 16)
        return cols

    def conv_low(x, y_const):
        """Low 16 limbs of x * y (y a host limb array)."""
        cols = [None] * NLIMB

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(NLIMB):
            xi = x[i]
            for j in range(NLIMB - i):
                yv = int(y_const[j])
                if yv == 0:
                    continue
                prod = xi * jnp.uint32(yv)
                acc(i + j, prod & MASK)
                if i + j + 1 < NLIMB:
                    acc(i + j + 1, prod >> 16)
        zero = jnp.zeros_like(x[0])
        return [zero if col is None else col for col in cols]

    def conv_wide_const(x, y_const):
        cols = [None] * (2 * NLIMB + 1)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(NLIMB):
            xi = x[i]
            for j in range(NLIMB):
                yv = int(y_const[j])
                if yv == 0:
                    continue
                prod = xi * jnp.uint32(yv)
                acc(i + j, prod & MASK)
                acc(i + j + 1, prod >> 16)
        zero = jnp.zeros_like(x[0])
        return [zero if col is None else col for col in cols]

    def normalize(cols, ncols):
        """Carry-propagate columns (< 2^21) to canonical 16-bit limbs."""
        out = []
        carry = None
        for j in range(ncols):
            v = cols[j] if j < len(cols) and cols[j] is not None else None
            if carry is not None:
                v = carry if v is None else v + carry
            if v is None:
                v = jnp.zeros_like(cols[0])
            out.append(v & MASK)
            carry = v >> 16
        return out, carry

    t_cols = conv_full(a, b)
    t, _ = normalize(t_cols, 2 * NLIMB)
    m_lo, _ = normalize(conv_low(t[:NLIMB], nprime), NLIMB)
    mp_cols = conv_wide_const(m_lo, p_limbs)
    s_cols = [
        (t[k] + mp_cols[k]) if (k < 2 * NLIMB and mp_cols[k] is not None)
        else (t[k] if k < 2 * NLIMB else mp_cols[k])
        for k in range(2 * NLIMB + 1)
    ]
    s, _ = normalize(s_cols, 2 * NLIMB + 1)
    res = s[NLIMB: 2 * NLIMB]            # (T + m*p) / R < 2p, top limb 0
    return _cond_sub_p(res, negp)


def _cond_sub_p(r, negp):
    """r (16 limb planes, < 2p) -> canonical r mod p via complement add."""
    out = []
    carry = None
    for j in range(NLIMB):
        v = r[j] + jnp.uint32(int(negp[j]))
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> 16
    ge_p = carry > 0
    return [jnp.where(ge_p, d, orig) for d, orig in zip(out, r)]


def _add_body(a, b, params_np):
    p_limbs, nprime, negp = params_np
    out = []
    carry = None
    for j in range(NLIMB):
        v = a[j] + b[j]
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> 16
    return _cond_sub_p(out, negp)


def _sub_body(a, b, params_np):
    p_limbs, nprime, negp = params_np
    out = []
    carry = None
    for j in range(NLIMB):
        v = a[j] + jnp.uint32(int(p_limbs[j])) + (b[j] ^ MASK)
        if j == 0:
            v = v + 1
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> 16
    return _cond_sub_p(out, negp)


class PField:
    """Pallas plane-layout arithmetic for one prime field."""

    def __init__(self, params: FieldParams):
        self.params = params
        p = params.p
        self.p_limbs = np.array([(p >> (16 * i)) & MASK for i in range(NLIMB)],
                                dtype=np.uint32)
        self.negp = np.array(
            [(((1 << 256) - p) >> (16 * i)) & MASK for i in range(NLIMB)],
            dtype=np.uint32)
        npr = (-pow(p, -1, 1 << 256)) % (1 << 256)
        self.nprime = np.array([(npr >> (16 * i)) & MASK for i in range(NLIMB)],
                               dtype=np.uint32)
        self._np = (self.p_limbs, self.nprime, self.negp)
        self._mul_call = {}

    # -- kernel builders ----------------------------------------------------
    def _binary_kernel(self, body, rows_per_block: int = 8):
        """Build a pallas_call for an elementwise binary plane op.

        Grid over the M (sublane-row) axis; each program handles
        [16, rows_per_block, 128]."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        params_np = self._np

        def kernel(a_ref, b_ref, o_ref):
            a = [a_ref[i] for i in range(NLIMB)]
            b = [b_ref[i] for i in range(NLIMB)]
            out = body(a, b, params_np)
            for i in range(NLIMB):
                o_ref[i] = out[i]

        def call(a, b):
            m = a.shape[1]
            rb = min(rows_per_block, m)
            grid = (m // rb,) if m % rb == 0 else ((m + rb - 1) // rb,)
            # pad M to a block multiple
            mp = grid[0] * rb
            if mp != m:
                pad = mp - m
                a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
                b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
            spec = pl.BlockSpec((NLIMB, rb, PLANE_LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NLIMB, mp, PLANE_LANES),
                                               jnp.uint32),
                grid=grid,
                in_specs=[spec, spec],
                out_specs=spec,
                interpret=_interpret(),
            )(a, b)
            return out[:, :m] if mp != m else out

        return call

    def mul(self, a, b):
        """Montgomery product of plane arrays [16, M, 128]."""
        key = ("mul",)
        fn = self._mul_call.get(key)
        if fn is None:
            fn = self._mul_call[key] = jax.jit(self._binary_kernel(_mul_body))
        return fn(a, b)

    def add(self, a, b):
        key = ("add",)
        fn = self._mul_call.get(key)
        if fn is None:
            fn = self._mul_call[key] = jax.jit(self._binary_kernel(_add_body))
        return fn(a, b)

    def sub(self, a, b):
        key = ("sub",)
        fn = self._mul_call.get(key)
        if fn is None:
            fn = self._mul_call[key] = jax.jit(self._binary_kernel(_sub_body))
        return fn(a, b)


@functools.cache
def pfr() -> PField:
    return PField(FR)


@functools.cache
def pfq() -> PField:
    return PField(FQ)
