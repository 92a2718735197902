"""MSM parameter ablation on the real chip: window width c, batch size B,
and strategy. Run when tuning `default_window` / `_PIP_R` / `_PIP_CHUNK`.

Usage: python scripts/bench_msm_ablation.py [log_n] [reps]
Prints a table to stderr; safe to kill between launches (each cell is its
own set of device programs, compiled once per shape).
"""

import os
import sys
import time

import numpy as np

# allow `python scripts/bench_msm_ablation.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def stages():
    """Per-stage timings of the fixed-base pipeline (prep/sort, flush scan,
    scatter, marginal folds) at one shape: python ... stages [log_n] [c] [B].
    Run on the chip to see which stage bounds throughput."""
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR
    from zerog_tpu.curve import points_to_device, fixed_base_expand
    from zerog_tpu.curve.bn254 import G1_GEN
    from zerog_tpu.curve import pippenger as pp

    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    c = int(sys.argv[3]) if len(sys.argv) > 3 else pp.default_fixed_window(1 << log_n)
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n = 1 << log_n
    rng = np.random.default_rng(11)
    pts = fixed_base_expand(G1_GEN, [int(x) for x in rng.integers(1, 1 << 62, n)])
    pdev = tuple(jnp.asarray(a) for a in points_to_device(pts))
    table = pp.build_window_table(pdev, c)
    scal = [[int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
            for _ in range(b)]
    from zerog_tpu.field import to_limbs
    sl = jnp.asarray(to_limbs(np.asarray(scal, dtype=object)))

    r_rows = pp._pip_r_rows(int(table.tx.shape[0]))

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, x)
        return x

    for rep in range(3):
        t0 = time.time()
        prep = sync(pp._pipfb_prep(sl, table.tx, table.ty, table.tvalid,
                                   c=c, r_rows=r_rows))
        t_prep = time.time() - t0
        sx, sy, sval, flags, pb, pr, pbf, prf, max_run = prep
        t0 = time.time()
        pieces = sync(pp._flush_scan((sx, sy, sval), flags, affine=True))
        t_flush = time.time() - t0
        pb_all = jnp.concatenate([pb, pbf[None]], axis=0)
        pr_all = jnp.concatenate([pr, prf[None]], axis=0)
        t0 = time.time()
        buckets = sync(pp._pipv2_scatter(pieces, pb_all, pr_all, p_max=2, c=c))
        t_scat = time.time() - t0
        g = int(pb_all.shape[1])
        lo_bits = c // 2
        hi_n, lo_n = 1 << (c - lo_bits), 1 << lo_bits
        t0 = time.time()
        r_hi = sync(pp._pipv2_sum_rows(tuple(
            jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 3), (0, 1))
            .reshape(2 * lo_n, g, hi_n, 16) for comp in buckets)))
        c_lo = sync(pp._pipv2_sum_rows(tuple(
            jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 2), (0, 1))
            .reshape(2 * hi_n, g, lo_n, 16) for comp in buckets)))
        t_marg = time.time() - t0
        print(f"rep{rep} (max_run={int(max_run)}): prep+sort {t_prep:6.3f}s  "
              f"flush {t_flush:6.3f}s  scatter {t_scat:6.3f}s  "
              f"marginals {t_marg:6.3f}s", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stages":
        stages()
    else:
        main()
