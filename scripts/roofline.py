"""Speed-of-light analysis for the two hot kernels (VERDICT r02 Weak #7).

Measures the chip's achievable Fr-multiplication throughput directly (the
primitive every kernel decomposes into), then expresses the measured MSM and
NTT rates as a fraction of that ceiling:

  peak        = field muls/s of jfr().mul on a large resident array
                (the 16x16-bit-limb Montgomery kernel: ~256 int32 MACs +
                ~16-limb REDC per mul, fully fused by XLA — this IS the
                speed of light for any Fr algorithm on this chip short of
                a different limb representation)
  NTT         : a radix-2 butterfly = 1 field mul + 1 add + 1 sub
                -> butterflies/s vs peak muls/s (adds ride along ~free)
  MSM (fixed) : the merged-window pipeline does ~W*N mixed adds
                (8M+3S = 11 muls each) + flush/fold overhead per MSM
                -> implied muls/s vs peak

Usage: PYTHONPATH=/root/repo python scripts/roofline.py  (on the TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import zerog_tpu  # noqa: F401  (compile cache config)
    from zerog_tpu.field import FR, jfr, to_limbs

    print(f"devices: {jax.devices()}", flush=True)
    f = jfr()
    rng = np.random.default_rng(11)

    # ---- peak field-mul throughput --------------------------------------
    n = 1 << 20
    a = jnp.asarray(to_limbs([int(x) for x in rng.integers(1, 1 << 62, n)],
                             FR, mont=True))
    b = jnp.asarray(to_limbs([int(x) for x in rng.integers(1, 1 << 62, n)],
                             FR, mont=True))
    # TIMING DISCIPLINE (r4): anchor every loop with a device_get — on the
    # tunneled axon runtime block_until_ready does not reliably wait, and
    # the r02/r03 numbers measured without the anchor ("22.5e9 muls/s") were
    # artifacts. Chained inputs keep each rep's args distinct.
    mul = jax.jit(f.mul)
    out = mul(a, b)
    _ = jax.device_get(out[:1])
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = mul(out, b)
    _ = jax.device_get(out[:1])
    per = (time.time() - t0) / reps
    peak = n / per
    print(f"field mul [2^20]: {per*1e3:.2f} ms -> {peak:,.0f} muls/s "
          f"(chained, device_get-anchored)", flush=True)

    # fused mul+add chain (quotient-style): muls/s when XLA can fuse
    fma = jax.jit(lambda x, y, z: f.add(f.mul(x, y), z))
    out = fma(a, b, a)
    _ = jax.device_get(out[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fma(out, b, a)
    _ = jax.device_get(out[:1])
    per_fma = (time.time() - t0) / reps
    print(f"field mul+add [2^20]: {per_fma*1e3:.2f} ms "
          f"-> {n/per_fma:,.0f} fused mul+adds/s", flush=True)

    # Pallas plane-layout mul (field/pfield.py)
    from zerog_tpu.field.pfield import pfr, to_planes

    pf = pfr()
    ap, bp = to_planes(a), to_planes(b)
    outp = pf.mul(ap, bp)
    _ = jax.device_get(outp[:1, :1, :1])
    t0 = time.time()
    for _ in range(reps):
        outp = pf.mul(outp, bp)
    _ = jax.device_get(outp[:1, :1, :1])
    per_pal = (time.time() - t0) / reps
    print(f"pallas field mul [2^20]: {per_pal*1e3:.2f} ms "
          f"-> {n/per_pal:,.0f} muls/s", flush=True)

    # ---- NTT vs peak ------------------------------------------------------
    from zerog_tpu.poly import NttPlan

    plan = NttPlan(16)
    vals = jnp.asarray(to_limbs([int(x) for x in rng.integers(0, 1 << 62, 1 << 16)],
                                FR, mont=True))
    jax.block_until_ready(plan.ntt(vals))
    t0 = time.time()
    for _ in range(10):
        r = plan.ntt(vals)
    jax.block_until_ready(r)
    ntt_s = (time.time() - t0) / 10
    bflies = (1 << 15) * 16
    eff = bflies / ntt_s / peak
    print(f"ntt 2^16: {ntt_s*1e3:.1f} ms -> {bflies/ntt_s:,.0f} butterflies/s "
          f"= {eff*100:.0f}% of mul peak (1 mul/butterfly; "
          f"gather/reshape overhead is the gap)", flush=True)

    # ---- MSM vs peak -------------------------------------------------------
    from zerog_tpu.curve import bn254 as c, points_to_device, fixed_base_expand
    from zerog_tpu.curve.pippenger import (
        build_window_table, default_fixed_window, msm_fixed_host,
        _window_layout)

    nmsm = 1 << 14
    batch = 4
    import os

    cache = os.path.expanduser("~/.cache/zerog_tpu_bench_points_2e14.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        pdev = tuple(jnp.asarray(x) for x in (d["px"], d["py"], d["pv"]))
    else:
        pts = fixed_base_expand(
            c.G1_GEN, [int(x) for x in rng.integers(1, 1 << 62, nmsm)])
        pdev = tuple(jnp.asarray(x) for x in points_to_device(pts))
    table = build_window_table(pdev, default_fixed_window(nmsm))
    sizes, _ = _window_layout(table.c)
    w = len(sizes)
    sl = jnp.asarray(to_limbs(np.asarray(
        [[int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(nmsm)]
         for _ in range(batch)], dtype=object)))
    msm_fixed_host(sl, table)  # compile
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        res = msm_fixed_host(sl, table)
    per_msm = (time.time() - t0) / (reps * batch)
    pps = nmsm / per_msm
    # mixed add = 8M+3S = 11 muls; the flush-scan touches each of the W*N
    # table rows once per MSM (sorted segments), plus ~2*2^c bucket-fold adds
    mixed_muls = 11 * (w * nmsm + 2 * (1 << table.c))
    implied = mixed_muls / per_msm
    print(f"msm 2^14 (c={table.c}, {w} windows): {per_msm*1e3:.1f} ms "
          f"-> {pps:,.0f} pts/s; implied {implied:,.0f} muls/s "
          f"= {implied/peak*100:.0f}% of mul peak "
          f"(sort+scan bookkeeping is the gap)", flush=True)


if __name__ == "__main__":
    main()
