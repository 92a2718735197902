"""Measure the flush-scan's per-step cost structure on the real chip.

Hypothesis (r4): the bucketed MSM is bound by ~1.3k sequential lax.scan
steps whose per-step wall time (~0.4 ms) is dominated by fixed per-iteration
overhead (loop bookkeeping + kernel dispatch inside the compiled while loop),
not by the body's arithmetic on the narrow [G, C] lanes. If true,
lax.scan(unroll=K) should cut wall time nearly K-fold until the body's real
compute shows up.

Measures, on the flush scan's production shapes ([R=64 chunk, G, C]):
  1. trivial-body scan (one uint32 add)      -> pure loop overhead
  2. jac_madd_incomplete body, unroll=1,2,4,8 -> the real flush body
  3. full-width segscan step for comparison

Usage: python scripts/bench_scan_unroll.py [G] [C]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zerog_tpu.field import FR, to_limbs
    from zerog_tpu.curve.jpoints import (
        jac_add_incomplete, jac_madd_incomplete, jac_select, jac_infinity,
        jac_from_affine,
    )

    g = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    steps = 64
    print(f"devices: {jax.devices()}  shapes: [{steps}, {g}, {c}, 16]",
          file=sys.stderr)

    rng = np.random.default_rng(0)

    def rand_limbs(*shape):
        flat = [int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(int(np.prod(shape)))]
        return jnp.asarray(to_limbs(flat, FR, mont=True)).reshape(*shape, 16)

    xs_x = rand_limbs(steps, g, c)
    xs_y = rand_limbs(steps, g, c)
    xs_v = jnp.ones((steps, g, c), bool)
    flags = jnp.zeros((steps, g, c), bool).at[0].set(True)
    carry0 = jac_infinity((g, c))

    def timeit(fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    # 1. trivial body
    @jax.jit
    def trivial(xs):
        def body(cr, x):
            return cr + x[0], cr
        return jax.lax.scan(body, jnp.zeros((g, c, 16), jnp.uint32),
                            (xs[0], xs[1]))

    t = timeit(trivial, (xs_x, xs_y))
    print(f"trivial-body scan {steps} steps: {t*1e3:.2f} ms "
          f"({t/steps*1e6:.0f} us/step)")

    # 2. flush body at various unrolls
    for unroll in (1, 2, 4, 8):
        @jax.jit
        def flush(carry, xs, unroll=unroll):
            def body(cr, x):
                xx, yy, vv, fl = x
                flushed = jac_select(fl, cr, (jnp.zeros_like(xx),) * 3)
                cr = jac_select(fl, jac_from_affine(xx, yy, vv),
                                jac_madd_incomplete(cr, xx, yy, vv))
                return cr, flushed
            return jax.lax.scan(body, carry, xs, unroll=unroll)

        t0 = time.time()
        out = flush(carry0, (xs_x, xs_y, xs_v, flags))
        jax.block_until_ready(out)
        cold = time.time() - t0
        t = timeit(flush, carry0, (xs_x, xs_y, xs_v, flags))
        print(f"flush scan unroll={unroll}: compile {cold:.1f}s, "
              f"warm {t*1e3:.2f} ms ({t/steps*1e6:.0f} us/step)")

    # 3. full-width incomplete add (segscan-style step) for comparison
    m = g * c * steps  # comparable total lanes
    ax, ay, az = rand_limbs(m), rand_limbs(m), rand_limbs(m)
    bx, by, bz = rand_limbs(m), rand_limbs(m), rand_limbs(m)

    @jax.jit
    def wide(a, b):
        return jac_add_incomplete(a, b)

    t = timeit(wide, (ax, ay, az), (bx, by, bz), reps=10)
    print(f"full-width incomplete add [{m} lanes]: {t*1e3:.2f} ms "
          f"({m/t/1e6:.1f} M point-adds/s)")


if __name__ == "__main__":
    main()
