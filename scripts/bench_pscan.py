"""Validate + benchmark the Pallas flush-scan kernel on the real chip.

1. Parity on a small random stream (XLA engine vs Pallas engine).
2. Production-shape timing: full fixed-base MSM e2e with each engine
   (trusted: ends in downloaded host points, 2^14 x batch 4).

Usage: python scripts/bench_pscan.py
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

    from zerog_tpu.field import FR, FQ, to_limbs
    from zerog_tpu.curve import pippenger as pp
    from zerog_tpu.curve.bn254 import G1_GEN, g1_mul
    from zerog_tpu.curve.jpoints import points_to_device

    log(f"devices: {jax.devices()}")

    # ---- parity, small ------------------------------------------------------
    rng = np.random.default_rng(3)
    r, g, c = 64, 2, 8
    n = r * g * c
    pts = [g1_mul(G1_GEN, int(s)) for s in rng.integers(1, 1 << 30, n)]
    px, py, pv = points_to_device(pts)
    sx = jnp.asarray(px).reshape(r, g, c, 16)
    sy = jnp.asarray(py).reshape(r, g, c, 16)
    sv = jnp.asarray(pv).reshape(r, g, c).at[5, :, 2].set(False)
    flags = jnp.asarray(rng.random((r, g, c)) < 0.1).at[0].set(True)

    os.environ["ZEROG_MSM_PALLAS"] = "0"
    ref = pp._flush_scan((sx, sy, sv), flags, affine=True)
    ref = [np.asarray(jax.device_get(x)) for x in ref]
    os.environ["ZEROG_MSM_PALLAS"] = "1"
    t0 = time.time()
    got = pp._flush_scan((sx, sy, sv), flags, affine=True)
    got = [np.asarray(jax.device_get(x)) for x in got]
    log(f"pallas small-scan compile+run: {time.time()-t0:.1f}s")
    for a, b in zip(ref, got):
        assert np.array_equal(a, b), "affine parity FAIL"
    log("affine parity OK")

    # jac variant
    one = jnp.asarray(to_limbs(FQ.r_mont))
    sz = jnp.where(sv[..., None], jnp.broadcast_to(one, sx.shape),
                   jnp.zeros_like(sx))
    os.environ["ZEROG_MSM_PALLAS"] = "0"
    refj = pp._flush_scan((sx, sy, sz), flags, affine=False)
    refj = [np.asarray(jax.device_get(x)) for x in refj]
    os.environ["ZEROG_MSM_PALLAS"] = "1"
    t0 = time.time()
    gotj = pp._flush_scan((sx, sy, sz), flags, affine=False)
    gotj = [np.asarray(jax.device_get(x)) for x in gotj]
    log(f"pallas jac small-scan compile+run: {time.time()-t0:.1f}s")
    for a, b in zip(refj, gotj):
        assert np.array_equal(a, b), "jac parity FAIL"
    log("jac parity OK")

    # ---- production shape e2e ----------------------------------------------
    # reuse bench.py's point + window-table disk caches (build if missing)
    log_n, batch = 14, 4
    n = 1 << log_n
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    pdev = bench._bench_points(n, cpu_fallback=False)
    cc = pp.default_fixed_window(n)
    tcache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_wtable_{log_n}_{cc}.npz")
    if os.path.exists(tcache):
        d = np.load(tcache)
        table = pp.WindowTable(cc, n, jnp.asarray(d["tx"]),
                               jnp.asarray(d["ty"]), jnp.asarray(d["tv"]))
    else:
        t0 = time.time()
        table = pp.build_window_table(pdev, cc)
        jax.block_until_ready((table.tx, table.ty))
        log(f"window table build: {time.time()-t0:.1f}s")
        np.savez(tcache, tx=np.asarray(table.tx), ty=np.asarray(table.ty),
                 tv=np.asarray(table.tvalid))
    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(n)] for _ in range(batch)]
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))

    for engine in ("0", "1"):
        os.environ["ZEROG_MSM_PALLAS"] = engine
        t0 = time.time()
        res = pp.msm_fixed_host(sl, table)
        cold = time.time() - t0
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            res = pp.msm_fixed_host(sl, table)
        per = (time.time() - t0) / (reps * batch)
        name = "pallas" if engine == "1" else "xla"
        log(f"{name} e2e: cold {cold:.1f}s warm {per*1e3:.1f} ms/msm -> "
            f"{n/per:,.0f} pts/s")
        if engine == "0":
            ref_pts = res
        else:
            assert res == ref_pts, "e2e parity FAIL"
            log("e2e parity OK")


if __name__ == "__main__":
    main()
