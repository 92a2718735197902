"""Pallas vs XLA field-mul throughput on the real chip (trusted timing:
chained ops, inputs change every rep, device_get anchor).

Usage: python scripts/bench_pallas_field.py [log_n]
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

    from zerog_tpu.field import FR, jfr, to_limbs
    from zerog_tpu.field.pfield import pfr, to_planes, from_planes

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(5)
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n

    a_np = to_limbs([int.from_bytes(rng.bytes(31), "little") % FR.p
                     for _ in range(n)], FR, mont=True)
    b_np = to_limbs([int.from_bytes(rng.bytes(31), "little") % FR.p
                     for _ in range(n)], FR, mont=True)
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    f = jfr()
    pf = pfr()

    # XLA baseline (chained, trusted)
    @jax.jit
    def chain_x(x, y, k=16):
        for _ in range(k):
            x = f.mul(x, y)
        return x

    out = chain_x(a, b)
    _ = jax.device_get(out[:1])
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        out = chain_x(out, b)
    _ = jax.device_get(out[:1])
    per = (time.time() - t0) / (reps * 16)
    log(f"XLA     mul [n={n}]: {per*1e3:.3f} ms -> {n/per/1e6:.0f} M muls/s")

    # Pallas chained: each mul is its own pallas_call (HBM between calls)
    ap, bp = to_planes(a), to_planes(b)

    def chain_p(x, y, k=16):
        for _ in range(k):
            x = pf.mul(x, y)
        return x

    t0 = time.time()
    out_p = chain_p(ap, bp)
    _ = jax.device_get(out_p[:1, :1, :1])
    log(f"pallas compile+first chain: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        out_p = chain_p(out_p, bp)
    _ = jax.device_get(out_p[:1, :1, :1])
    per_p = (time.time() - t0) / (reps * 16)
    log(f"pallas  mul [n={n}]: {per_p*1e3:.3f} ms -> {n/per_p/1e6:.0f} M muls/s "
        f"({per/per_p:.1f}x vs XLA)")

    # parity
    ref = np.asarray(jax.device_get(chain_x(a, b)))
    got = np.asarray(jax.device_get(from_planes(chain_p(ap, bp))))
    assert np.array_equal(ref, got), "pallas chain mismatch"
    log("parity OK")

    # fused-chain kernel variant: 16 muls inside ONE pallas program (measures
    # the VMEM-resident compute bound with no HBM between muls)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from zerog_tpu.field.pfield import _mul_body, NLIMB, PLANE_LANES

    params_np = (pf.p_limbs, pf.nprime, pf.negp)

    def kernel(a_ref, b_ref, o_ref):
        x = [a_ref[i] for i in range(NLIMB)]
        y = [b_ref[i] for i in range(NLIMB)]
        for _ in range(16):
            x = _mul_body(x, y, params_np)
        for i in range(NLIMB):
            o_ref[i] = x[i]

    rb = 8
    m = n // PLANE_LANES
    spec = pl.BlockSpec((NLIMB, rb, PLANE_LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def fused16(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NLIMB, m, PLANE_LANES), jnp.uint32),
            grid=(m // rb,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(x, y)

    t0 = time.time()
    out_f = fused16(ap, bp)
    _ = jax.device_get(out_f[:1, :1, :1])
    log(f"fused16 compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        out_f = fused16(out_f, bp)
    _ = jax.device_get(out_f[:1, :1, :1])
    per_f = (time.time() - t0) / (reps * 16)
    log(f"fused16 mul [n={n}]: {per_f*1e3:.3f} ms -> {n/per_f/1e6:.0f} M muls/s "
        f"(compute-bound ceiling)")
    ref16 = np.asarray(jax.device_get(from_planes(chain_p(ap, bp))))
    got16 = np.asarray(jax.device_get(from_planes(fused16(ap, bp))))
    assert np.array_equal(ref16, got16), "fused16 mismatch"
    log("fused16 parity OK")


if __name__ == "__main__":
    main()
