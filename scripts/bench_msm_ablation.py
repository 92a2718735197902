"""MSM parameter ablation on the real chip: window width c, batch size B,
and strategy. Run when tuning `default_window` / `_PIP_R` / `_PIP_CHUNK`.

Usage: python scripts/bench_msm_ablation.py [log_n] [reps]
Prints a table to stderr; safe to kill between launches (each cell is its
own set of device programs, compiled once per shape).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR
    from zerog_tpu.curve import points_to_device, fixed_base_expand
    from zerog_tpu.curve.bn254 import G1_GEN
    from zerog_tpu.curve.pippenger import msm

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << log_n
    rng = np.random.default_rng(11)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    pts = fixed_base_expand(G1_GEN, [int(x) for x in rng.integers(1, 1 << 62, n)])
    pdev = tuple(jnp.asarray(a) for a in points_to_device(pts))
    print(f"setup {time.time()-t0:.0f}s", file=sys.stderr)

    from zerog_tpu.curve.pippenger import build_window_table

    tables = {}
    for b in (1, 2, 4, 8):
        scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                    for _ in range(n)] for _ in range(b)]
        for c in (8, 9, 10, 11, 12):
            t0 = time.time()
            msm(scalars, pdev, c=c)
            cold = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                msm(scalars, pdev, c=c)
            per = (time.time() - t0) / (reps * b)
            print(f"B={b} c={c}: cold {cold:6.1f}s  warm {per*1e3:7.1f} ms/msm "
                  f"-> {n/per:10,.0f} pts/s", file=sys.stderr)
        # merged-window fixed-base path (what Srs.commit* uses)
        for c in (log_n - 3, log_n - 2, log_n - 1, log_n):
            if c < 4:
                continue
            if c not in tables:
                t0 = time.time()
                tables[c] = build_window_table(pdev, c)
                print(f"fixed c={c}: table build {time.time()-t0:6.1f}s",
                      file=sys.stderr)
            t0 = time.time()
            msm(scalars, table=tables[c])
            cold = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                msm(scalars, table=tables[c])
            per = (time.time() - t0) / (reps * b)
            print(f"B={b} fixed c={c}: cold {cold:6.1f}s  warm {per*1e3:7.1f} "
                  f"ms/msm -> {n/per:10,.0f} pts/s", file=sys.stderr)


if __name__ == "__main__":
    main()
