"""Benchmark entry point (driver contract: print ONE JSON line).

Headline metric: BN254 Pippenger MSM throughput in points/s/chip at the
MNIST-Tiny circuit size (N = 2^14, the per-commitment MSM the prover runs
~40x per proof). BASELINE.json records no published reference numbers
("published": {}), so vs_baseline is reported as 1.0.

Extra diagnostics (NTT throughput) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR, to_limbs
    from zerog_tpu.curve import bn254 as c, points_to_device, fixed_base_expand
    from zerog_tpu.curve.pippenger import msm
    from zerog_tpu.poly import NttPlan

    log_n = 14
    n = 1 << log_n
    batch = 4

    rng = np.random.default_rng(42)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    # SRS-like fixed-base points, expanded on device
    t0 = time.time()
    scalars_for_points = [int(x) for x in rng.integers(1, 1 << 62, n)]
    pts = fixed_base_expand(c.G1_GEN, scalars_for_points)
    print(f"point setup: {time.time()-t0:.1f}s", file=sys.stderr)
    pdev = points_to_device(pts)
    pdev = tuple(jnp.asarray(a) for a in pdev)

    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
               for _ in range(batch)]

    t0 = time.time()
    out = msm(scalars, pdev)
    compile_s = time.time() - t0
    print(f"msm compile+first run: {compile_s:.1f}s", file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = msm(scalars, pdev)
    per_msm = (time.time() - t0) / (reps * batch)
    pps = n / per_msm
    print(f"msm: {per_msm*1e3:.1f} ms per {n}-point MSM -> {pps:,.0f} points/s",
          file=sys.stderr)

    # NTT diagnostic
    plan = NttPlan(16)
    vals = jnp.asarray(to_limbs([int(x) for x in rng.integers(0, 1 << 62, 1 << 16)],
                                FR, mont=True))
    plan.ntt(vals).block_until_ready()
    t0 = time.time()
    for _ in range(10):
        r = plan.ntt(vals)
    r.block_until_ready()
    ntt_s = (time.time() - t0) / 10
    bflies = (1 << 15) * 16
    print(f"ntt 2^16: {ntt_s*1e3:.1f} ms -> {bflies/ntt_s:,.0f} butterflies/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "bn254_msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
