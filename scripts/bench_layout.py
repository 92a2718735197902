"""Limb-layout hypothesis probe (TRUSTED timing discipline).

The whole framework stores field elements as uint32[..., 16] — 16 limbs in
the TRAILING dim, which XLA:TPU maps to the 128-wide vector lane dimension:
every elementwise limb op uses 16/128 = 12.5% of each vreg. A limb-LEADING
layout uint32[16, N] puts the wide axis in lanes (100% utilization) with
limbs in sublanes.

Timing discipline (r4 lesson: block_until_ready on the tunneled axon runtime
does not reliably wait, and identical (executable, args) rep loops can read
as ~0): every measurement is a CHAIN whose input changes each rep (output
fed back), anchored by a device_get of a small slice at the end.

Usage: python scripts/bench_layout.py [log_n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


NLIMB = 16
MASK = (1 << 16) - 1


def main():
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR, jfr, to_limbs, from_limbs

    log(f"devices: {jax.devices()}")
    f = jfr()
    rng = np.random.default_rng(5)
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n

    a_np = to_limbs([int.from_bytes(rng.bytes(31), "little") % FR.p
                     for _ in range(n)], FR, mont=True)
    b_np = to_limbs([int.from_bytes(rng.bytes(31), "little") % FR.p
                     for _ in range(n)], FR, mont=True)

    # ---- trailing-limb chain (production formulation) -----------------------
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    @jax.jit
    def chain_trailing(x, y, k=16):
        for _ in range(k):
            x = f.mul(x, y)
        return x

    out = chain_trailing(a, b)
    _ = jax.device_get(out[:1])          # real sync
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        out = chain_trailing(out, b)
    _ = jax.device_get(out[:1])
    per = (time.time() - t0) / (reps * 16)
    log(f"trailing [n={n},16] mul: {per*1e3:.3f} ms -> {n/per/1e6:.0f} M muls/s")

    # ---- limb-leading formulation -------------------------------------------
    # Same separated-Montgomery algorithm, limbs on axis 0.
    p_limbs = jnp.asarray(f.p_limbs)         # [16]
    negp = jnp.asarray(f.negp_limbs)
    nprime = jnp.asarray(f.n_prime)

    def normalize_T(cols, ncols):
        out = []
        carry = jnp.zeros_like(cols[0])
        m = cols.shape[0]
        for j in range(ncols):
            v = (cols[j] if j < m else jnp.zeros_like(carry)) + carry
            out.append(v & MASK)
            carry = v >> 16
        return jnp.stack(out, axis=0), carry

    def cond_sub_T(r):
        cols = r + negp[(slice(None),) + (None,) * (r.ndim - 1)]
        d, carry = normalize_T(cols, NLIMB)
        ge = (carry > 0)[None]
        return jnp.where(ge, d, r)

    def mul_wide_T(x, y):
        cols = jnp.zeros((2 * NLIMB + 1,) + x.shape[1:], jnp.uint32)
        for i in range(NLIMB):
            prod = x[i][None] * y        # [16, ...]
            cols = cols.at[i : i + NLIMB].add(prod & MASK)
            cols = cols.at[i + 1 : i + NLIMB + 1].add(prod >> 16)
        return normalize_T(cols, 2 * NLIMB)[0]

    def mul_low_T(x, c_host):
        cols = jnp.zeros_like(x)
        for i in range(NLIMB):
            hi_len = NLIMB - i - 1
            prod = x[i][None] * c_host[: NLIMB - i][(slice(None),) + (None,) * (x.ndim - 1)]
            cols = cols.at[i:].add(prod & MASK)
            if hi_len > 0:
                cols = cols.at[i + 1 :].add(prod[:hi_len] >> 16)
        return normalize_T(cols, NLIMB)[0]

    def mul_T(x, y):
        t = mul_wide_T(x, y)
        m = mul_low_T(t[:NLIMB], nprime)
        mp = mul_wide_T(m, p_limbs[(slice(None),) + (None,) * (x.ndim - 1)]
                        * jnp.ones_like(x[:1]))
        cols = jnp.zeros((2 * NLIMB + 1,) + x.shape[1:], jnp.uint32)
        cols = cols.at[: 2 * NLIMB].set(t + mp)
        s, _ = normalize_T(cols, 2 * NLIMB + 1)
        return cond_sub_T(s[NLIMB : 2 * NLIMB])

    aT = jnp.asarray(np.ascontiguousarray(a_np.T))   # [16, n]
    bT = jnp.asarray(np.ascontiguousarray(b_np.T))

    @jax.jit
    def chain_leading(x, y, k=16):
        for _ in range(k):
            x = mul_T(x, y)
        return x

    out_t = chain_leading(aT, bT)
    _ = jax.device_get(out_t[:, :1])
    t0 = time.time()
    for _ in range(reps):
        out_t = chain_leading(out_t, bT)
    _ = jax.device_get(out_t[:, :1])
    per_t = (time.time() - t0) / (reps * 16)
    log(f"leading  [16,n={n}] mul: {per_t*1e3:.3f} ms -> {n/per_t/1e6:.0f} M muls/s")

    # correctness: leading chain equals trailing chain
    ref = np.asarray(jax.device_get(chain_trailing(a, b)))
    got = np.asarray(jax.device_get(chain_leading(aT, bT))).T
    assert np.array_equal(ref, got), "limb-leading mul mismatch"
    log("parity OK")

    # ---- trailing with bigger trailing dim? control: [16, n] reinterpreted --
    # (same data volume, shows pure layout effect)


if __name__ == "__main__":
    main()
