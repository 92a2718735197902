"""Round-4 MSM strategy A/B on the real chip: segscan vs flush at the
prover's workload (fixed-base merged-window, n = 2^14, B = 4), with
per-stage timings for both pipelines.

Usage: python scripts/bench_msm_r4.py [log_n] [batch]
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
    from zerog_tpu.curve import points_to_device, fixed_base_expand
    from zerog_tpu.curve.bn254 import G1_GEN
    from zerog_tpu.curve import pippenger as pp

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log_n
    log(f"devices: {jax.devices()}")

    cache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_points_2e{log_n}.npz")
    t0 = time.time()
    if os.path.exists(cache):
        d = np.load(cache)
        pdev = tuple(jnp.asarray(a) for a in (d["px"], d["py"], d["pv"]))
        log(f"point load {time.time()-t0:.1f}s")
    else:
        rng = np.random.default_rng(42)
        scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
        pts = fixed_base_expand(G1_GEN, scalars)
        arrs = points_to_device(pts)
        np.savez(cache, px=arrs[0], py=arrs[1], pv=arrs[2])
        pdev = tuple(jnp.asarray(a) for a in arrs)
        log(f"point setup {time.time()-t0:.1f}s")

    c = pp.default_fixed_window(n)
    tcache = os.path.expanduser(f"~/.cache/zerog_tpu_r4_wtable_{log_n}_{c}.npz")
    t0 = time.time()
    if os.path.exists(tcache):
        d = np.load(tcache)
        table = pp.WindowTable(c, n, jnp.asarray(d["tx"]), jnp.asarray(d["ty"]),
                               jnp.asarray(d["tv"]))
        log(f"table load {time.time()-t0:.1f}s")
    else:
        table = pp.build_window_table(pdev, c)
        jax.block_until_ready((table.tx, table.ty))
        np.savez(tcache, tx=np.asarray(table.tx), ty=np.asarray(table.ty),
                 tv=np.asarray(table.tvalid))
        log(f"table build (c={c}) {time.time()-t0:.1f}s")

    rng = np.random.default_rng(7)
    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(n)] for _ in range(batch)]
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, x)
        return x

    # ---- segscan staged ----------------------------------------------------
    log("== segscan stages ==")
    for rep in range(3):
        t0 = time.time()
        prep = sync(pp._segscan_prep(sl, table.tx, table.ty, table.tvalid, c=c))
        t_prep = time.time() - t0
        ds, gx, gy, gv, seg_id, last = prep
        steps = max(1, int(ds.shape[1] - 1).bit_length())
        t0 = time.time()
        acc = sync(pp._segscan_run(gx, gy, gv, seg_id, steps))
        t_run = time.time() - t0
        t0 = time.time()
        bk = sync(pp._segscan_buckets(acc, ds, last, c=c))
        t_bk = time.time() - t0
        bias, m_total = pp._segscan_bias(c)
        t0 = time.time()
        tot = sync(pp._segscan_fold(*bk, bias, c=c))
        t_fold = time.time() - t0
        log(f"segscan rep{rep}: prep {t_prep:.3f}s run({steps}) {t_run:.3f}s "
            f"buckets {t_bk:.3f}s fold {t_fold:.3f}s")

    # fewer steps variants (data-appropriate for random scalars)
    for steps in (6, 8, 10):
        t0 = time.time()
        acc = sync(pp._segscan_run(gx, gy, gv, seg_id, steps))
        cold = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            acc = sync(pp._segscan_run(gx, gy, gv, seg_id, steps))
        log(f"segscan run steps={steps}: cold {cold:.2f}s warm {(time.time()-t0)/3:.3f}s")

    # ---- end-to-end timings ------------------------------------------------
    for strat in ("segscan", "flush"):
        os.environ["ZEROG_MSM_STRATEGY"] = strat
        t0 = time.time()
        res = pp.msm_fixed_host(sl, table)
        cold = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            res = pp.msm_fixed_host(sl, table)
        per = (time.time() - t0) / (reps * batch)
        log(f"{strat}: cold {cold:.1f}s warm {per*1e3:.1f} ms/msm -> "
            f"{n/per:,.0f} pts/s (counting n per msm-row)")

    # ---- flush staged --------------------------------------------------------
    log("== flush stages ==")
    r_rows = pp._pip_r_rows(int(table.tx.shape[0]))
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
        log(f"flush rep{rep} (max_run={int(max_run)}, r_rows={r_rows}): "
            f"prep {t_prep:.3f}s flush {t_flush:.3f}s scatter {t_scat:.3f}s "
            f"marginals {t_marg:.3f}s")


if __name__ == "__main__":
    main()
