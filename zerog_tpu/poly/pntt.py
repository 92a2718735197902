"""MXU-accelerated NTT over Fr (the radix-256 DFT-matmul engine).

Replaces the hot butterflies of `best_fft` (SURVEY.md §2b NTT row) with a
formulation that puts the FLOPs on the MXU instead of the VPU: a radix-2
butterfly NTT is Montgomery-mul bound (~454M muls/s is the measured VPU int32
ceiling, field/pfield.py), but an NTT is a LINEAR map — over int8 limb
decompositions it becomes dense int8 matmuls, which the v5e MXU executes two
orders of magnitude faster than the VPU multiplies the same data.

Scheme (recursive four-step, factors <= 256):
    n = r * s,  x[i1 + r*i2]  (i1 in [r], i2 in [s])
    1. s-point sub-NTTs along i2 (batched over i1)     -> S[i1, j2]
    2. twiddle  S'[i1, j2] = omega^(i1*j2) * S[i1, j2]   (VPU, Montgomery)
    3. r-point DFT matmul along i1 (batched over j2)   -> X[s*j1 + j2]
Base case t <= 256: one dense DFT matmul.

Each t-point DFT over Fr is ONE int8 matmul: an element is 32 bytes
(little-endian canonical Montgomery repr), and multiplication by the
CONSTANT matrix entry w = omega_t^(jk) is Z-linear in the bytes:

    out_bytes[(b, j)] = sum_{k, a} byte_b(w_{jk} * R * 2^(8a) mod p) * x_bytes[(a, k)]

The R factor pre-folds one Montgomery reduction: the int32 accumulator V
satisfies V = R * y (mod p) with V < 2^286, so a single REDC(V) returns the
exact canonical Montgomery form of y — bit-identical to what the VPU
butterfly path produces (exact field math; canonical representations are
unique).

int8 offset trick: bytes and matrix entries are unsigned (0..255) but the
MXU's fast integer path is s8 x s8 -> s32. Both sides are stored shifted by
-128 and the exact correction is applied in the epilogue:

    M @ x = (M - 128)(x - 128) + 128 * colsum(x - 128)  [per output column]
          + 128 * rowsum(M - 128)                        [static per row]
          + 128 * 128 * K                                [static scalar]

Matrix rows are laid out BYTE-MAJOR (row = b*t + j) so the epilogue's
carry-propagation chain walks the leading axis of a [32, t, G] int32 tensor
with full (t, G)-wide VPU vectors; activations are element-per-LANE
([32*t rows, G lanes]) for the same reason.

CPU (tests) keeps the XLA butterfly path; kernels run under interpret mode
in the parity tests. All layers are exact mod-p arithmetic, so the engine is
bit-exact against `NttPlan` (asserted in tests/test_pntt.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..field import FR
from ..field.params import FieldParams

__all__ = ["PnttPlan", "get_pntt_plan", "pntt_enabled"]

P = FR.p
R256 = 1 << 256
R_INV = pow(R256, -1, P)
NPRIME = (-pow(P, -1, R256)) % (1 << 256)  # -p^-1 mod 2^256


def _factors(log_n: int) -> tuple[int, ...]:
    """Split log_n into ceil(log_n/8) near-equal factors (each 2^f <= 256):
    fewest levels first — the per-level REDC+twiddle VPU cost dominates."""
    levels = max(1, -(-log_n // 8))
    base, extra = divmod(log_n, levels)
    return tuple(1 << (base + (1 if i < extra else 0)) for i in range(levels))


def _byte_matrix(t: int, omega_t: int, post_scale: int = 1) -> np.ndarray:
    """Dense int16 byte matrix for the t-point DFT (values 0..255; the int8
    offset shift happens at pack time). M[(b*t + j), (a*t + k)] = byte b of
    (omega_t^(j*k) * post_scale * R * 2^(8a) mod p)."""
    # c[j, k] = omega^(jk) * post_scale * R mod p, built row-incrementally
    m = np.zeros((32 * t, 32 * t), dtype=np.int16)
    w_pows = np.empty(t, dtype=object)
    cur = 1
    for k in range(t):
        w_pows[k] = cur
        cur = cur * omega_t % P
    base = post_scale * R256 % P
    for j in range(t):
        wj = w_pows[j]
        c = base
        row_vals = np.empty(t, dtype=object)
        # c_k = omega^(j*k) * base: incremental multiply by omega^j
        for k in range(t):
            row_vals[k] = c
            c = c * wj % P
        for a in range(32):
            col = a * t
            # v_a = row_vals * 2^(8a) mod p, then its 32 bytes spread rows
            if a:
                row_vals = row_vals * 256 % P
            raw = b"".join(int(v).to_bytes(32, "little") for v in row_vals)
            bytes_jk = np.frombuffer(raw, dtype=np.uint8).reshape(t, 32)
            # rows b*t + j, column col + k  <- byte b of v_a[k]
            m[j::t, col : col + t] = bytes_jk.T[:, :]
    return m


def _ref_level(x_bytes: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Reference (numpy int64) level: x_bytes [32*t, G] uint8 -> canonical
    Montgomery bytes [32*t, G] after matmul + REDC. Ground truth for the
    Pallas kernels."""
    acc = m.astype(np.int64) @ x_bytes.astype(np.int64)  # [32t, G]
    t = m.shape[0] // 32
    g = x_bytes.shape[1]
    out = np.zeros((32 * t, g), dtype=np.uint8)
    for j in range(t):
        for col in range(g):
            v = 0
            for b in range(32):
                v += int(acc[b * t + j, col]) << (8 * b)
            y = _redc(v)
            ybytes = y.to_bytes(32, "little")
            for b in range(32):
                out[b * t + j, col] = ybytes[b]
    return out


def _redc(v: int) -> int:
    """Montgomery REDC: v < R*p -> v * R^-1 mod p, canonical."""
    mm = (v * NPRIME) % R256
    t = (v + mm * P) >> 256
    return t - P if t >= P else t


class PnttPlan:
    """Per (log_n, omega, post_scale) tables for the MXU NTT."""

    def __init__(self, log_n: int, omega: int, n_scale: int = 1):
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega
        self.n_scale = n_scale            # folded into the LAST level matrix
        self.factors = _factors(log_n)
        # matrices per level position (distinct (t, omega_t, scale) combos)
        self._mats: dict = {}
        self._twiddles: dict = {}
        self._build()

    # ---- table construction ---------------------------------------------
    def _build(self):
        # n_scale is applied exactly ONCE per element: folded into the
        # OUTERMOST level's matrix (the one applied last); inner levels get
        # scale 1.
        self._program = self._build_program(self.log_n, self.omega, True)

    def _build_program(self, log_m: int, omega_m: int, outermost: bool):
        """Returns the recursive step descriptor tree."""
        fs = _factors(log_m)
        r = fs[0]
        scale = self.n_scale if outermost else 1
        if len(fs) == 1:
            key = (r, omega_m % P, scale)
            if key not in self._mats:
                self._mats[key] = _byte_matrix(r, omega_m, scale)
            return {"kind": "base", "t": r, "mat": key}
        log_r = (r - 1).bit_length()
        s = (1 << log_m) // r
        omega_r = pow(omega_m, s, P)
        key = (r, omega_r, scale)
        if key not in self._mats:
            self._mats[key] = _byte_matrix(r, omega_r, scale)
        inner = self._build_program(log_m - log_r, pow(omega_m, r, P), False)
        return {
            "kind": "split", "r": r, "s": s, "log_m": log_m,
            "omega": omega_m % P, "mat": key, "inner": inner,
        }

    def twiddle_bytes(self, log_m: int, omega_m: int, r: int, s: int):
        """Montgomery-form twiddle planes omega_m^(i1*j2) as uint32 16-limb
        trailing arrays [r, s, 16] (host, cached)."""
        key = ("tw", log_m, omega_m, r, s)
        tw = self._twiddles.get(key)
        if tw is None:
            from ..field import to_limbs

            rows = np.empty((r, s), dtype=object)
            for i1 in range(r):
                w = pow(omega_m, i1, P)
                cur = R256 % P  # 1 in Montgomery form
                for j2 in range(s):
                    rows[i1, j2] = cur
                    cur = cur * w % P
            # to_limbs(mont=True) multiplies by R — rows are already *R
            lim = np.zeros((r, s, 16), dtype=np.uint32)
            for i1 in range(r):
                for j2 in range(s):
                    v = int(rows[i1, j2])
                    for l in range(16):
                        lim[i1, j2, l] = (v >> (16 * l)) & 0xFFFF
            tw = self._twiddles[key] = lim
        return tw

    # ---- host reference (numpy, exact) -----------------------------------
    def ntt_ref(self, values: np.ndarray) -> np.ndarray:
        """Reference transform on HOST ints: values [n] python-int Montgomery
        residues (v*R mod p) -> transformed Montgomery residues [n]. Used by
        the parity tests to pin the Pallas engine independently of NttPlan."""
        def run(prog, vec):
            m = len(vec)
            if prog["kind"] == "base":
                t = prog["t"]
                out = [0] * t
                mat_omega = None
                # direct O(t^2) DFT with the same scale folding
                key = prog["mat"]
                _, omega_t, scale = key
                for j in range(t):
                    acc = 0
                    for k in range(t):
                        acc += pow(omega_t, j * k, P) * vec[k]
                    out[j] = acc * scale % P
                return out
            r_, s_ = prog["r"], prog["s"]
            omega_m = prog["omega"]
            _, omega_r, scale = prog["mat"]
            # inner s-point transforms over i2, per i1
            cols = []
            for i1 in range(r_):
                sub = [vec[i1 + r_ * i2] for i2 in range(s_)]
                cols.append(run(prog["inner"], sub))
            out = [0] * m
            for j2 in range(s_):
                for j1 in range(r_):
                    acc = 0
                    for i1 in range(r_):
                        tw = pow(omega_m, i1 * j2, P)
                        acc += pow(omega_r, j1 * i1, P) * tw % P * cols[i1][j2]
                    out[s_ * j1 + j2] = acc * scale % P
            return out

        vec = [int(v) for v in values]
        return np.array(run(self._program, vec), dtype=object)


def pntt_enabled() -> bool:
    import jax

    forced = os.environ.get("ZEROG_NTT_PALLAS")
    if forced is not None:
        return forced.lower() not in ("0", "false", "off", "")
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Device engine: XLA int8 matmuls (MXU) + Pallas epilogue kernels (VPU).
#
# Device data layout between levels: int8 byte planes [32, m, G] storing
# byte - 128 (the s8 offset trick); element i of transform g has its 32
# little-endian bytes along axis 0. G is padded to a multiple of 128 lanes
# at the TOP level only (whole-transform batches).
# ---------------------------------------------------------------------------

_T_TILE = 8          # element rows per epilogue grid step


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"


_P_LIMBS = np.array([(P >> (16 * i)) & 0xFFFF for i in range(16)],
                    dtype=np.uint32)
_NPRIME_LIMBS = np.array([(NPRIME >> (16 * i)) & 0xFFFF for i in range(16)],
                         dtype=np.uint32)
_NEGP_LIMBS = np.array([(((1 << 256) - P) >> (16 * i)) & 0xFFFF
                        for i in range(16)], dtype=np.uint32)


def _redc_limbs(v16, c_hi):
    """Montgomery REDC on limb-plane lists: V = sum v16[j] 2^(16j) +
    c_hi * 2^256 (c_hi < 2^22, one uint32 plane) -> canonical 16 limb planes
    of V * R^-1 mod p. Mirrors pfield's column-sum conventions (all column
    sums < 2^26 in uint32)."""
    import jax.numpy as jnp

    mask = jnp.uint32(0xFFFF)

    # m = (V mod R) * nprime mod R  — low 16 columns, carried
    mcols = [None] * 16
    for i in range(16):
        xi = v16[i]
        for j in range(16 - i):
            yv = int(_NPRIME_LIMBS[j])
            if yv == 0:
                continue
            prod = xi * jnp.uint32(yv)
            lo, hi = prod & mask, prod >> 16
            mcols[i + j] = lo if mcols[i + j] is None else mcols[i + j] + lo
            if i + j + 1 < 16:
                mcols[i + j + 1] = (hi if mcols[i + j + 1] is None
                                    else mcols[i + j + 1] + hi)
    m = []
    carry = None
    for j in range(16):
        v = mcols[j] if mcols[j] is not None else jnp.zeros_like(v16[0])
        if carry is not None:
            v = v + carry
        m.append(v & mask)
        carry = v >> 16
    # s = (V + m*p) / R: full 16x16 const conv of m*p, add V's columns
    scols = [None] * 33
    for i in range(16):
        xi = m[i]
        for j in range(16):
            yv = int(_P_LIMBS[j])
            if yv == 0:
                continue
            prod = xi * jnp.uint32(yv)
            lo, hi = prod & mask, prod >> 16
            scols[i + j] = lo if scols[i + j] is None else scols[i + j] + lo
            scols[i + j + 1] = (hi if scols[i + j + 1] is None
                                else scols[i + j + 1] + hi)
    for j in range(16):
        scols[j] = scols[j] + v16[j] if scols[j] is not None else v16[j]
    scols[16] = scols[16] + (c_hi & mask)
    scols[17] = scols[17] + (c_hi >> 16)
    out = []
    carry = None
    for j in range(33):
        v = scols[j] if scols[j] is not None else jnp.zeros_like(v16[0])
        if carry is not None:
            v = v + carry
        if j >= 16:
            out.append(v & mask)
        carry = v >> 16
    res = out[:16]  # (V + mp)/R < 2p; column 32 is always zero
    # conditional subtract p via complement add
    sub = []
    carry = None
    for j in range(16):
        v = res[j] + jnp.uint32(int(_NEGP_LIMBS[j]))
        if carry is not None:
            v = v + carry
        sub.append(v & mask)
        carry = v >> 16
    ge_p = carry > 0
    import jax.numpy as _jnp

    return [_jnp.where(ge_p, a, b) for a, b in zip(sub, res)]


def _epilogue_kernel_body(acc_ref, tw_ref, out_ref, *, with_twiddle: bool,
                          out_bytes: bool):
    """One (t_tile, 128-lane) block: carry-propagate 32 int32 byte columns,
    REDC, optional twiddle Montgomery mul, emit bytes (int8, shifted) or
    16-bit limb planes (uint32)."""
    import jax.numpy as jnp

    from ..field.pfield import _mul_body

    # carry propagation: bytes canonical, final carry < 2^22. Everything
    # MUST stay uint32: an int32 chain wraps negative on the 16x16-bit limb
    # products inside REDC and the arithmetic >> corrupts the high half.
    carry = jnp.zeros(acc_ref[0].shape, jnp.uint32)
    bytes_ = []
    for b in range(32):
        v = acc_ref[b].astype(jnp.uint32) + carry
        bytes_.append(v & jnp.uint32(0xFF))
        carry = v >> 8
    v16 = [bytes_[2 * j] + (bytes_[2 * j + 1] << 8) for j in range(16)]
    res = _redc_limbs(v16, carry)
    if with_twiddle:
        tw = [tw_ref[i] for i in range(16)]
        res = _mul_body(res, tw, (_P_LIMBS, _NPRIME_LIMBS, _NEGP_LIMBS))
    if out_bytes:
        for j in range(16):
            lo = res[j] & jnp.uint32(0xFF)
            hi = res[j] >> 8
            out_ref[2 * j] = (lo.astype(jnp.int32) - 128).astype(jnp.int8)
            out_ref[2 * j + 1] = (hi.astype(jnp.int32) - 128).astype(jnp.int8)
    else:
        for j in range(16):
            out_ref[j] = res[j]


@functools.cache
def _epilogue_call(t: int, g: int, with_twiddle: bool, out_bytes: bool,
                   interpret: bool):
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    assert t % _T_TILE == 0 or t < _T_TILE
    tt = min(_T_TILE, t)
    assert g % 128 == 0
    grid = (t // tt, g // 128)

    acc_spec = pl.BlockSpec((32, tt, 128), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((16, tt, 128), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)
    out_dt = jnp.int8 if out_bytes else jnp.uint32
    out_planes = 32 if out_bytes else 16
    out_spec = pl.BlockSpec((out_planes, tt, 128), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    if with_twiddle:
        def body(acc_ref, tw_ref, out_ref):
            _epilogue_kernel_body(acc_ref, tw_ref, out_ref,
                                  with_twiddle=True, out_bytes=out_bytes)

        in_specs = [acc_spec, tw_spec]
    else:
        def body(acc_ref, out_ref):
            _epilogue_kernel_body(acc_ref, None, out_ref,
                                  with_twiddle=False, out_bytes=out_bytes)

        in_specs = [acc_spec]

    call = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((out_planes, t, g), out_dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )
    return call if interpret else jax.jit(call)


class _DevicePlan:
    """Device-side tables for one PnttPlan: int8 matrices, row-correction
    vectors, twiddle limb planes."""

    def __init__(self, plan: PnttPlan):
        import jax.numpy as jnp

        self.plan = plan
        self.mats = {}
        self.rowc = {}
        for key, m in plan._mats.items():
            m8 = (m.astype(np.int32) - 128).astype(np.int8)
            self.mats[key] = jnp.asarray(m8)
            # static correction: 128*rowsum(M') + 128*128*K per output row
            k_dim = m.shape[1]
            rc = 128 * m8.astype(np.int64).sum(axis=1) + 128 * 128 * k_dim
            self.rowc[key] = jnp.asarray(rc.astype(np.int32))
        self._tw_dev = {}

    def twiddle_planes(self, log_m, omega_m, r, s):
        """[16, s, r] uint32 twiddle planes (the COMPACT form; the per-lane
        broadcast to [16, s, r*g] happens inside the traced transform so the
        expanded tensor is a runtime temporary, never resident — at k=19 the
        expanded form is ~270 MB)."""
        import jax.numpy as jnp

        key = (log_m, omega_m, r, s)
        tw = self._tw_dev.get(key)
        if tw is None:
            host = self.plan.twiddle_bytes(log_m, omega_m, r, s)  # [r, s, 16]
            arr = jnp.asarray(host)                    # [r, s, 16]
            arr = jnp.moveaxis(arr, 2, 0)              # [16, r, s]
            tw = self._tw_dev[key] = jnp.swapaxes(arr, 1, 2)  # [16, s, r]
        return tw


_device_plans: dict = {}


def _device_plan(plan: PnttPlan) -> _DevicePlan:
    dp = _device_plans.get(id(plan))
    if dp is None:
        dp = _device_plans[id(plan)] = _DevicePlan(plan)
    return dp


def _matmul_level(dp: _DevicePlan, key, xb, twiddle=None,
                  out_bytes: bool = True):
    """One DFT level: xb int8 [32, t, G] -> epilogue output. The matmul runs
    on the MXU via XLA (s8 x s8 -> s32 dot); the epilogue (carry + REDC +
    optional twiddle) is the Pallas kernel."""
    import jax.numpy as jnp
    from jax import lax

    t = key[0]
    g = xb.shape[2]
    a = xb.reshape(32 * t, g)
    w = dp.mats[key]
    acc = lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    colsum = jnp.sum(a.astype(jnp.int32), axis=0)          # [G]
    acc = acc + 128 * colsum[None, :] + dp.rowc[key][:, None]
    acc = acc.reshape(32, t, g)
    call = _epilogue_call(t, g, twiddle is not None, out_bytes, _interpret())
    if twiddle is not None:
        return call(acc, twiddle)
    return call(acc)


def _run_device(dp: _DevicePlan, prog, xb, out_bytes: bool):
    """Recursive four-step driver on byte planes [32, m, G]."""
    if prog["kind"] == "base":
        return _matmul_level(dp, prog["mat"], xb, out_bytes=out_bytes)
    r, s = prog["r"], prog["s"]
    g = xb.shape[2]
    m = r * s
    # inner s-point transforms along i2, batched over (i1, g):
    # axis1 (i = i1 + r*i2) reshapes to [s, r] with i2 major — zero-copy
    inner_in = xb.reshape(32, s, r * g)
    inner_out = _run_device(dp, prog["inner"], inner_in, out_bytes=True)
    # twiddle omega_m^(i1*j2): a dedicated Montgomery-mul kernel pass (the
    # outer matmul contracts over i1, so its inputs must be pre-twiddled;
    # folding into an epilogue would require i1-dependent matrices)
    import jax.numpy as jnp

    twc = dp.twiddle_planes(prog["log_m"], prog["omega"], r, s)  # [16, s, r]
    tw = jnp.broadcast_to(twc[:, :, :, None],
                          (16, s, r, g)).reshape(16, s, r * g)
    xb2 = _twiddle_call(s, r * g, _interpret())(inner_out, tw)
    # regroup for the outer r-point transforms along i1, batched over (j2, g)
    xb3 = (xb2.reshape(32, s, r, g).transpose(0, 2, 1, 3)
           .reshape(32, r, s * g))
    out = _matmul_level(dp, prog["mat"], xb3, out_bytes=out_bytes)
    # output index j = s*j1 + j2: [.., r(j1), s*g] -> [.., m, g] directly
    planes = out.shape[0]
    return out.reshape(planes, r, s, g).reshape(planes, m, g)


@functools.cache
def _twiddle_call(t: int, g: int, interpret: bool):
    """Pallas kernel: bytes [32, t, G] * twiddle limb planes [16, t, G]
    (Montgomery mul) -> bytes [32, t, G]."""
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    from ..field.pfield import _mul_body

    tt = min(_T_TILE, t)
    assert t % tt == 0 and g % 128 == 0
    grid = (t // tt, g // 128)

    x_spec = pl.BlockSpec((32, tt, 128), lambda i, j: (0, i, j),
                          memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((16, tt, 128), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)

    def body(x_ref, tw_ref, out_ref):
        v16 = []
        for j in range(16):
            lo = (x_ref[2 * j].astype(jnp.int32) + 128).astype(jnp.uint32)
            hi = (x_ref[2 * j + 1].astype(jnp.int32) + 128).astype(jnp.uint32)
            v16.append(lo + (hi << 8))
        tw = [tw_ref[i] for i in range(16)]
        res = _mul_body(v16, tw, (_P_LIMBS, _NPRIME_LIMBS, _NEGP_LIMBS))
        for j in range(16):
            lo = res[j] & jnp.uint32(0xFF)
            hi = res[j] >> 8
            out_ref[2 * j] = (lo.astype(jnp.int32) - 128).astype(jnp.int8)
            out_ref[2 * j + 1] = (hi.astype(jnp.int32) - 128).astype(jnp.int8)

    call = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((32, t, g), jnp.int8),
        grid=grid,
        in_specs=[x_spec, tw_spec],
        out_specs=x_spec,
        interpret=interpret,
    )
    return call if interpret else jax.jit(call)


def limbs_to_byteplanes(x):
    """uint32 [B, n, 16] (or [n, 16]) -> int8 byte planes [32, n, B] with
    the -128 offset."""
    import jax.numpy as jnp

    if x.ndim == 2:
        x = x[None]
    x = jnp.moveaxis(x, 0, 2)                  # [n, 16, B]
    x = jnp.moveaxis(x, 1, 0)                  # [16, n, B]
    lo = (x & 0xFF).astype(jnp.int32)
    hi = (x >> 8).astype(jnp.int32)
    planes = jnp.stack([lo, hi], axis=1).reshape(32, x.shape[1], x.shape[2])
    return (planes - 128).astype(jnp.int8)


def byteplanes_from_limb_planes(planes):
    """uint32 limb planes [16, n, B] -> uint32 [B, n, 16]."""
    import jax.numpy as jnp

    return jnp.moveaxis(planes, 0, 2).swapaxes(0, 1)


_transform_jit_cache: dict = {}


def pntt_transform(plan: PnttPlan, values):
    """values: uint32 Montgomery limbs [B, n, 16] or [n, 16] -> transformed
    (natural order), same shape. Bit-exact vs NttPlan's butterfly path.

    The ENTIRE engine (layout conversion, int8 matmuls, Pallas epilogues,
    inter-level transposes) traces into ONE jitted program per (plan, shape):
    dispatched piecewise it cost ~25 eager launches — ~95 ms of tunnel
    round trips per transform on the axon runtime."""
    import jax
    import jax.numpy as jnp

    single = values.ndim == 2
    x = values if not single else values[None]
    b = x.shape[0]
    g = b
    # every kernel's lane count is (product of factors beyond the current
    # level) * B, so B only needs padding up to 128 / min_factor
    def min_factor(prog):
        if prog["kind"] == "base":
            return prog["t"]
        return min(prog["r"], min_factor(prog["inner"]))

    align = max(1, 128 // min_factor(plan._program))
    pad = (-g) % align
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], jnp.uint32)], axis=0)
        g += pad
    dp = _device_plan(plan)

    key = (id(plan), g)
    fn = _transform_jit_cache.get(key)
    if fn is None:
        def impl(arr):
            xb = limbs_to_byteplanes(arr)           # [32, n, G]
            out_planes = _run_device(dp, plan._program, xb, out_bytes=False)
            return byteplanes_from_limb_planes(out_planes)  # [G, n, 16]

        fn = _transform_jit_cache[key] = jax.jit(impl)
    out = fn(x)
    out = out[:b]
    return out[0] if single else out


@functools.cache
def get_pntt_plan(log_n: int, omega: int, n_scale: int = 1) -> PnttPlan:
    return PnttPlan(log_n, omega, n_scale)
