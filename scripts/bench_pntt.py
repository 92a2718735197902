"""Validate + benchmark the MXU NTT engine on the real chip.

1. Parity vs the XLA butterfly path at k=12 (quick) and k=16 (the Tiny
   extended domain — the bench shape).
2. Throughput with the r4 timing discipline (data-dependent chain, anchored
   by device_get): butterflies/s for both engines at 2^16, single and
   NTT_BATCH=8.

Usage: python scripts/bench_pntt.py [--quick]
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
    from zerog_tpu.poly.ntt import NttPlan
    from zerog_tpu.poly import pntt

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(9)
    quick = "--quick" in sys.argv

    # ---- parity -------------------------------------------------------------
    for log_n, b in ((12, 2), (14, 1)) if quick else ((12, 2), (16, 1), (16, 8)):
        n = 1 << log_n
        vals = np.asarray(rng.integers(1, 1 << 62, (b, n)), dtype=object)
        limbs = jnp.asarray(to_limbs(vals, FR, mont=True))
        if b == 1:
            limbs = limbs[0]
        plan = NttPlan(log_n)
        t0 = time.time()
        ref = np.asarray(plan._ntt_jit(limbs))
        log(f"xla ntt k={log_n} b={b}: {time.time()-t0:.1f}s (incl compile)")
        pp = pntt.get_pntt_plan(log_n, FR.nth_root_of_unity(log_n))
        t0 = time.time()
        got = np.asarray(pntt.pntt_transform(pp, limbs))
        log(f"mxu ntt k={log_n} b={b}: {time.time()-t0:.1f}s (incl compile+tables)")
        assert np.array_equal(ref, got), f"MXU NTT parity FAIL at k={log_n}"
        log(f"parity OK k={log_n} b={b}")
        # inverse parity too (n^-1 folded)
        refi = np.asarray(plan._intt_jit(limbs))
        ppi = pntt.get_pntt_plan(log_n, FR.inv(plan.omega), FR.inv(plan.n))
        goti = np.asarray(pntt.pntt_transform(ppi, limbs))
        assert np.array_equal(refi, goti), f"MXU iNTT parity FAIL k={log_n}"
        log(f"inverse parity OK k={log_n}")

    # ---- throughput (chained, device_get anchored) --------------------------
    log_n = 14 if quick else 16
    n = 1 << log_n
    bflies = (n // 2) * log_n
    plan = NttPlan(log_n)
    pp = pntt.get_pntt_plan(log_n, FR.nth_root_of_unity(log_n))
    for b in (1, 8):
        vals = np.asarray(rng.integers(1, 1 << 62, (b, n)), dtype=object)
        limbs = jnp.asarray(to_limbs(vals, FR, mont=True))
        if b == 1:
            limbs = limbs[0]
        for name, fn in (("xla", plan._ntt_jit),
                         ("mxu", lambda v: pntt.pntt_transform(pp, v))):
            r = fn(limbs)
            _ = jax.device_get(r[:1])
            reps = 5 if name == "xla" else 10
            t0 = time.time()
            for _i in range(reps):
                r = fn(r)
            _ = jax.device_get(r[:1])
            per = (time.time() - t0) / (reps * b)
            log(f"{name} k={log_n} b={b}: {per*1e3:.2f} ms/transform -> "
                f"{bflies/per:,.0f} butterflies/s")


if __name__ == "__main__":
    main()
