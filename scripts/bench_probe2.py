"""Second-round probes after the contradictory r4 microbenchmarks.

1. Detect result memoization on the axon runtime: argsort timed with a
   same-args rep loop vs a varying-args rep loop.
2. True throughput of the point-add body: N CHAINED (data-dependent)
   jac_add_incomplete launches at several widths -> per-lane-per-add cost.
3. Chained flush-scan chunks (the production structure) vs one standalone
   chunk call, to pin the per-step cost's origin.

Usage: python scripts/bench_probe2.py
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

    from zerog_tpu.field import FR, to_limbs
    from zerog_tpu.curve.jpoints import (
        jac_add_incomplete, jac_from_affine, jac_infinity, jac_madd_incomplete,
        jac_select,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def rand_limbs(*shape):
        flat = [int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(int(np.prod(shape)))]
        return jnp.asarray(to_limbs(flat, FR, mont=True)).reshape(*shape, 16)

    # ---- 1. memoization probe ----------------------------------------------
    m = 1 << 20
    a1 = jnp.asarray(rng.integers(0, 1 << 13, (4, m), dtype=np.int32))
    a2 = jnp.asarray(rng.integers(0, 1 << 13, (4, m), dtype=np.int32))
    srt = jax.jit(lambda a: jnp.argsort(a, axis=-1))
    jax.block_until_ready(srt(a1)); jax.block_until_ready(srt(a2))
    t0 = time.time()
    for _ in range(10):
        out = srt(a1)
    jax.block_until_ready(out)
    same = (time.time() - t0) / 10
    t0 = time.time()
    for i in range(10):
        out = srt(a1 if i % 2 else a2)
    jax.block_until_ready(out)
    vary = (time.time() - t0) / 10
    log(f"argsort [4,2^20]: same-args {same*1e3:.2f} ms vs varying-args "
        f"{vary*1e3:.2f} ms {'<-- MEMOIZED' if same < 0.5*vary else ''}")

    # ---- 2. chained wide adds ----------------------------------------------
    for width in (1 << 12, 1 << 15, 1 << 17, 1 << 19, (1 << 19) + (1 << 18)):
        x, y, z = rand_limbs(width), rand_limbs(width), rand_limbs(width)
        q = (x, y, z)

        @jax.jit
        def chain(p, q, n=8):
            for _ in range(n):
                p = jac_add_incomplete(p, q)
            return p

        p0 = (rand_limbs(width), rand_limbs(width), rand_limbs(width))
        out = chain(p0, q)
        jax.block_until_ready(out)
        t0 = time.time()
        out = chain(p0, q)
        jax.block_until_ready(out)
        per = (time.time() - t0) / 8
        log(f"chained incomplete add width={width}: {per*1e3:.2f} ms/add "
            f"({width/per/1e6:.1f} M adds/s, {per/width*1e9:.0f} ns/lane)")

    # ---- 3. chained flush chunks (production structure) ---------------------
    g, c, steps = 4, 320, 64
    xs_x, xs_y = rand_limbs(steps, g, c), rand_limbs(steps, g, c)
    xs_v = jnp.ones((steps, g, c), bool)
    flags = jnp.zeros((steps, g, c), bool).at[0].set(True)

    @jax.jit
    def chunk(carry, xs):
        def body(cr, x):
            xx, yy, vv, fl = x
            flushed = jac_select(fl, cr, (jnp.zeros_like(xx),) * 3)
            cr = jac_select(fl, jac_from_affine(xx, yy, vv),
                            jac_madd_incomplete(cr, xx, yy, vv))
            return cr, flushed
        return jax.lax.scan(body, carry, xs)

    carry = jac_infinity((g, c))
    out = chunk(carry, (xs_x, xs_y, xs_v, flags))
    jax.block_until_ready(out)
    t0 = time.time()
    cr = carry
    for _ in range(16):
        cr, fl = chunk(cr, (xs_x, xs_y, xs_v, flags))
    jax.block_until_ready(cr)
    per = (time.time() - t0) / 16
    log(f"chained flush chunks (carry-dependent): {per*1e3:.2f} ms per "
        f"64-step chunk ({per/steps*1e6:.1f} us/step)")

    t0 = time.time()
    for _ in range(16):
        out = chunk(carry, (xs_x, xs_y, xs_v, flags))
    jax.block_until_ready(out)
    per = (time.time() - t0) / 16
    log(f"independent flush chunks (same args): {per*1e3:.2f} ms per chunk")


if __name__ == "__main__":
    main()
