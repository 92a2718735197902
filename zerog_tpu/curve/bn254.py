"""Host-side BN254 ("bn256") curve arithmetic: G1/G2 group law, the Fq2/Fq12
tower, and the reduced Tate pairing.

Replaces the verifier-side role of `halo2curves::bn256` (reference consumes it
at src/wnn.rs:18 and src/eth.rs:52). Only the *verifier's* pairing check and
small host-side group algebra live here — bulk G1 work (MSM, SRS expansion)
runs on TPU via :mod:`zerog_tpu.curve.pippenger`.

Conventions match halo2curves: E: y^2 = x^3 + 3 over Fq; G1 generator (1, 2);
G2 on the D-twist y^2 = x^3 + 3/(9+u) over Fq2 = Fq[u]/(u^2+1); point at
infinity is represented as ``None``.
"""

from __future__ import annotations

from ..field.params import FQ, FR, batch_inv

P = FQ.p
R_ORDER = FR.p

B_G1 = 3

# G2 generator (standard BN254 constants)
G2_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

G1_GEN = (1, 2)


# ---------------------------------------------------------------------------
# G1 (affine over Fq, Python ints). Infinity = None.
# ---------------------------------------------------------------------------

def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B_G1) % P == 0


def g1_neg(pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % P)


def g1_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_double(a):
    return g1_add(a, a)


def g1_mul(pt, k: int):
    k %= R_ORDER
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = g1_add(acc, add)
        add = g1_add(add, add)
        k >>= 1
    return acc


def g1_msm_host(scalars, points):
    """Reference MSM on host (slow; tests / tiny inputs only)."""
    acc = None
    for s, pt in zip(scalars, points):
        acc = g1_add(acc, g1_mul(pt, s))
    return acc


def jacobian_to_affine_batch(xs, ys, zs):
    """Batch-normalize Jacobian points (ints). z==0 -> None."""
    nz = [i for i, z in enumerate(zs) if z % P != 0]
    invs = batch_inv([zs[i] % P for i in nz], P)
    out = [None] * len(xs)
    for i, zi in zip(nz, invs):
        zi2 = zi * zi % P
        out[i] = (xs[i] * zi2 % P, ys[i] * zi2 % P * zi % P)
    return out


# ---------------------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 + 1), elements as (c0, c1)
# ---------------------------------------------------------------------------

def fq2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fq2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = a0 * b0 % P
    t1 = a1 * b1 % P
    return ((t0 - t1) % P, ((a0 + a1) * (b0 + b1) - t0 - t1) % P)


def fq2_square(a):
    a0, a1 = a
    return ((a0 + a1) * (a0 - a1) % P, 2 * a0 * a1 % P)


def fq2_mul_scalar(a, s):
    return (a[0] * s % P, a[1] * s % P)


def fq2_inv(a):
    a0, a1 = a
    norm = (a0 * a0 + a1 * a1) % P
    ninv = pow(norm, -1, P)
    return (a0 * ninv % P, (-a1) * ninv % P)


FQ2_ONE = (1, 0)
FQ2_ZERO = (0, 0)
XI = (9, 1)  # twist parameter 9 + u


# ---------------------------------------------------------------------------
# G2 (affine over Fq2). Infinity = None.
# ---------------------------------------------------------------------------

B_G2 = fq2_mul(XI, fq2_inv(fq2_mul(XI, XI)))  # 3/(9+u): b' = 3 * xi^{-1}
B_G2 = fq2_mul_scalar(fq2_inv(XI), 3)


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = fq2_square(y)
    rhs = fq2_add(fq2_mul(fq2_square(x), x), B_G2)
    return lhs == rhs


def g2_neg(pt):
    if pt is None:
        return None
    return (pt[0], fq2_neg(pt[1]))


def g2_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    (x1, y1), (x2, y2) = a, b
    if x1 == x2:
        if fq2_add(y1, y2) == FQ2_ZERO:
            return None
        lam = fq2_mul(fq2_mul_scalar(fq2_square(x1), 3), fq2_inv(fq2_mul_scalar(y1, 2)))
    else:
        lam = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
    x3 = fq2_sub(fq2_sub(fq2_square(lam), x1), x2)
    y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(pt, k: int):
    k %= R_ORDER
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc


G2_GEN = (G2_X, G2_Y)


# ---------------------------------------------------------------------------
# Fq12 = Fq2[w]/(w^6 - xi), elements as tuple of 6 Fq2 coeffs (c0..c5)
# ---------------------------------------------------------------------------

FQ12_ONE = (FQ2_ONE,) + (FQ2_ZERO,) * 5
FQ12_ZERO = (FQ2_ZERO,) * 6


def fq12_mul(a, b):
    out = [FQ2_ZERO] * 6
    for i in range(6):
        if a[i] == FQ2_ZERO:
            continue
        for j in range(6):
            if b[j] == FQ2_ZERO:
                continue
            t = fq2_mul(a[i], b[j])
            k = i + j
            if k >= 6:
                t = fq2_mul(t, XI)
                k -= 6
            out[k] = fq2_add(out[k], t)
    return tuple(out)


def fq12_square(a):
    return fq12_mul(a, a)


def fq12_inv(a):
    # Inversion via the adjugate is messy for a sextic tower; use
    # exponentiation by (q^12 - 2)? Too slow. Instead: solve with linear
    # algebra is overkill — use the norm-tower approach:
    # Represent Fq12 = Fq6[w]/(w^2 - v) instead. To keep one representation,
    # convert: our a = sum_{i<6} c_i w^i; group even/odd:
    #   a = A(w^2) + w * B(w^2) with A, B in Fq6 = Fq2[v]/(v^3 - xi), v = w^2.
    A = (a[0], a[2], a[4])
    B = (a[1], a[3], a[5])
    # (A + wB)^{-1} = (A - wB) / (A^2 - w^2 B^2) and w^2 = v in Fq6.
    def fq6_mul(x, y):
        out = [FQ2_ZERO] * 3
        for i in range(3):
            for j in range(3):
                t = fq2_mul(x[i], y[j])
                k = i + j
                if k >= 3:
                    t = fq2_mul(t, XI)
                    k -= 3
                out[k] = fq2_add(out[k], t)
        return tuple(out)

    def fq6_sub(x, y):
        return tuple(fq2_sub(xi_, yi) for xi_, yi in zip(x, y))

    def fq6_mul_by_v(x):
        return (fq2_mul(x[2], XI), x[0], x[1])

    def fq6_inv(x):
        c0, c1, c2 = x
        t0 = fq2_sub(fq2_square(c0), fq2_mul(XI, fq2_mul(c1, c2)))
        t1 = fq2_sub(fq2_mul(XI, fq2_square(c2)), fq2_mul(c0, c1))
        t2 = fq2_sub(fq2_square(c1), fq2_mul(c0, c2))
        norm = fq2_add(
            fq2_mul(c0, t0),
            fq2_mul(XI, fq2_add(fq2_mul(c2, t1), fq2_mul(c1, t2))),
        )
        ninv = fq2_inv(norm)
        return (fq2_mul(t0, ninv), fq2_mul(t1, ninv), fq2_mul(t2, ninv))

    denom = fq6_sub(fq6_mul(A, A), fq6_mul_by_v(fq6_mul(B, B)))
    dinv = fq6_inv(denom)
    A2 = fq6_mul(A, dinv)
    B2 = fq6_mul(B, dinv)
    negB = tuple(fq2_neg(c) for c in B2)
    return (A2[0], negB[0], A2[1], negB[1], A2[2], negB[2])


def fq12_pow(a, e: int):
    result = FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = fq12_mul(result, base)
        base = fq12_square(base)
        e >>= 1
    return result


def untwist(q):
    """Map a G2 point into E(Fq12): (x', y') -> (x' w^2, y' w^3)."""
    if q is None:
        return None
    x, y = q
    xw = [FQ2_ZERO] * 6
    xw[2] = x
    yw = [FQ2_ZERO] * 6
    yw[3] = y
    return (tuple(xw), tuple(yw))


_FINAL_EXP = (P ** 12 - 1) // R_ORDER


def miller_loop(p_g1, q_g2):
    """f_{r,P}(Q) for P in G1, Q in G2 (Tate pairing, BKLS form).

    With even embedding degree and Q coming from the twist, every vertical
    line evaluation lies in the F_{q^6} subfield (the even-w-power
    subalgebra), which the final exponentiation kills — so verticals and
    denominators are omitted entirely (denominator elimination).
    """
    if p_g1 is None or q_g2 is None:
        return FQ12_ONE
    qx2, qy2 = q_g2  # Fq2 coordinates of the twist point

    def line_at_q(a, b):
        """l_{a,b}(Q) for a, b G1 affine points (b=None means tangent at a).

        Returns sparse Fq12: (lam*x_T - y_T) + (-lam*x')*w^2 + y'*w^3.
        Vertical lines (2T = inf or T + P = inf) return None (killed factor).
        """
        x1, y1 = a
        if b is None or a == b:
            lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
        else:
            x2, y2 = b
            if x1 == x2:
                return None  # vertical
            lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
        c0 = ((lam * x1 - y1) % P, 0)
        c2 = fq2_mul_scalar(qx2, (-lam) % P)
        return (c0, FQ2_ZERO, c2, qy2, FQ2_ZERO, FQ2_ZERO)

    f = FQ12_ONE
    t = p_g1
    for bit in bin(R_ORDER)[3:]:  # MSB-1 downwards
        f = fq12_square(f)
        if t is not None:
            if (2 * t[1]) % P == 0:
                t = None  # 2T = inf, vertical line dropped
            else:
                f = fq12_mul(f, line_at_q(t, None))
                t = g1_double(t)
        if bit == "1" and t is not None:
            line = line_at_q(t, p_g1)
            if line is None:
                t = None
            else:
                f = fq12_mul(f, line)
                t = g1_add(t, p_g1)
    return f


def pairing(p_g1, q_g2):
    """Reduced Tate pairing e(P, Q) in Fq12."""
    f = miller_loop(p_g1, q_g2)
    return fq12_pow(f, _FINAL_EXP)


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(P_i, Q_i) == 1 (single shared final exponentiation)."""
    f = FQ12_ONE
    for p_g1, q_g2 in pairs:
        f = fq12_mul(f, miller_loop(p_g1, q_g2))
    return fq12_pow(f, _FINAL_EXP) == FQ12_ONE


# ---------------------------------------------------------------------------
# Serialization (halo2curves SerdeFormat::RawBytes-compatible layout: 32-byte
# little-endian field reprs; uncompressed points are x || y; identity encodes
# as all zeros)
# ---------------------------------------------------------------------------

def g1_to_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return FQ.to_bytes(pt[0]) + FQ.to_bytes(pt[1])


def g1_from_bytes(b: bytes):
    x = FQ.from_bytes(b[:32])
    y = FQ.from_bytes(b[32:64])
    if x == 0 and y == 0:
        return None
    pt = (x, y)
    if not g1_is_on_curve(pt):
        raise ValueError("point not on curve")
    return pt


def g1_to_compressed(pt) -> bytes:
    """halo2curves 0.3.3 `G1Affine::to_bytes`: 32-byte little-endian x with
    the parity of y packed into bit 255 (top bit of byte 31 — free since
    q < 2^254); identity encodes as 32 zero bytes. This is the proof-point
    encoding of halo2's Blake2bWrite transcript (PARITY.md #3)."""
    if pt is None:
        return b"\x00" * 32
    x, y = pt
    b = bytearray(FQ.to_bytes(x))
    b[31] |= (y & 1) << 7
    return bytes(b)


def g1_from_compressed(b: bytes):
    """Inverse of :func:`g1_to_compressed`; rejects non-canonical x and
    non-residue x^3 + 3 (not a curve point)."""
    if len(b) != 32:
        raise ValueError("compressed G1 point must be 32 bytes")
    raw = bytearray(b)
    ysign = raw[31] >> 7
    raw[31] &= 0x7F
    x = int.from_bytes(bytes(raw), "little")
    if x == 0 and ysign == 0:
        return None
    if x >= FQ.p:
        raise ValueError("non-canonical compressed x coordinate")
    rhs = (x * x % FQ.p * x + B_G1) % FQ.p
    # q = 3 mod 4: sqrt via the (q+1)/4 power, then verify
    y = pow(rhs, (FQ.p + 1) // 4, FQ.p)
    if y * y % FQ.p != rhs:
        raise ValueError("compressed x not on curve")
    if (y & 1) != ysign:
        y = FQ.p - y
    return (x, y)


def g2_to_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 128
    (x0, x1), (y0, y1) = pt
    return FQ.to_bytes(x0) + FQ.to_bytes(x1) + FQ.to_bytes(y0) + FQ.to_bytes(y1)


def g2_from_bytes(b: bytes):
    x = (FQ.from_bytes(b[:32]), FQ.from_bytes(b[32:64]))
    y = (FQ.from_bytes(b[64:96]), FQ.from_bytes(b[96:128]))
    if x == (0, 0) and y == (0, 0):
        return None
    pt = (x, y)
    if not g2_is_on_curve(pt):
        raise ValueError("point not on curve")
    return pt
