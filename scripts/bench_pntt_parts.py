"""Decompose the MXU NTT's cost on the real chip: int8 matmul alone,
epilogue kernel alone, twiddle kernel alone — to find where the per-transform
time goes (scripts/bench_pntt.py measures only the fused total).

Usage: python scripts/bench_pntt_parts.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- raw s8 matmul at the level-1 shape of a 2^16 x B8 transform -------
    k_dim, g = 8192, 2048
    w = jnp.asarray(rng.integers(-128, 128, (k_dim, k_dim)).astype(np.int8))

    @jax.jit
    def mm(a):
        acc = lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        # cast back to int8 so the output can feed the next rep (chained)
        return (acc & 0x7F).astype(jnp.int8)

    a = jnp.asarray(rng.integers(-128, 128, (k_dim, g)).astype(np.int8))
    t0 = time.time()
    r = mm(a)
    _ = jax.device_get(r[:1, :1])
    log(f"matmul compile+first: {time.time()-t0:.1f}s")
    reps = 20
    t0 = time.time()
    for _i in range(reps):
        r = mm(r)
    _ = jax.device_get(r[:1, :1])
    per = (time.time() - t0) / reps
    macs = k_dim * k_dim * g
    log(f"s8 matmul [{k_dim}x{k_dim}]@[{k_dim}x{g}]: {per*1e3:.2f} ms -> "
        f"{2*macs/per/1e12:.1f} TOPS")

    # ---- epilogue kernel alone at (t=256, g=2048) ---------------------------
    from zerog_tpu.poly import pntt

    t, gg = 256, 2048
    acc = jnp.asarray(rng.integers(0, 5 * 10**8, (32, t, gg)).astype(np.int32))
    call = pntt._epilogue_call(t, gg, False, False, False)

    @jax.jit
    def ep(a):
        out = call(a)       # [16, t, g] uint32
        # chain: reinterpret limbs as new acc (value-meaningless, flow only)
        return jnp.concatenate([out, out], axis=0).astype(jnp.int32)

    r = ep(acc)
    _ = jax.device_get(r[:1, :1, :1])
    t0 = time.time()
    for _i in range(10):
        r = ep(r)
    _ = jax.device_get(r[:1, :1, :1])
    per = (time.time() - t0) / 10
    log(f"epilogue (t=256, g=2048 = 512k elements): {per*1e3:.2f} ms")

    # ---- twiddle kernel alone ----------------------------------------------
    xb = jnp.asarray(rng.integers(-128, 128, (32, t, gg)).astype(np.int8))
    tw = jnp.asarray(rng.integers(0, 1 << 16, (16, t, gg)).astype(np.uint32))
    callt = pntt._twiddle_call(t, gg, False)

    @jax.jit
    def twk(x):
        return callt(x, tw)

    r = twk(xb)
    _ = jax.device_get(r[:1, :1, :1])
    t0 = time.time()
    for _i in range(10):
        r = twk(r)
    _ = jax.device_get(r[:1, :1, :1])
    per = (time.time() - t0) / 10
    log(f"twiddle mul (512k elements): {per*1e3:.2f} ms")


if __name__ == "__main__":
    main()
