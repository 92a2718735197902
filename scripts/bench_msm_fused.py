"""Prototype: the whole fixed-base bucket pipeline as ONE jitted program.

r4 staged measurements (bench_msm_r4.py) show the flush pipeline's device
compute is microseconds while the end-to-end batch costs ~565 ms — the cost
is ~80 host-dispatched ops (slices, chunked scans, stage programs) on the
tunneled axon runtime plus the mid-pipeline max_run sync. This prototype
traces prep + flush scan + scatter + marginals + weighted fold into a single
program (optionally with an UNCONDITIONAL compaction round, making it correct
for any digit distribution without the host branch), so a warm MSM batch is
one dispatch + one download.

Also times the individual data-movement primitives (argsort, gather,
scatter) to locate the remaining device cost.

Usage: python scripts/bench_msm_fused.py [log_n] [batch]
"""

import functools
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
    from zerog_tpu.curve import pippenger as pp
    from zerog_tpu.curve.bn254 import g1_add, g1_mul
    from zerog_tpu.curve.jpoints import points_from_device
    from zerog_tpu.field.params import FQ

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log_n
    log(f"devices: {jax.devices()}")

    cache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_points_2e{log_n}.npz")
    d = np.load(cache)
    pdev = tuple(jnp.asarray(a) for a in (d["px"], d["py"], d["pv"]))
    c = pp.default_fixed_window(n)
    tcache = os.path.expanduser(f"~/.cache/zerog_tpu_r4_wtable_{log_n}_{c}.npz")
    d = np.load(tcache)
    table = pp.WindowTable(c, n, jnp.asarray(d["tx"]), jnp.asarray(d["ty"]),
                           jnp.asarray(d["tv"]))
    log(f"points + table loaded (c={c})")

    rng = np.random.default_rng(7)
    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(n)] for _ in range(batch)]
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))
    r_rows = pp._pip_r_rows(int(table.tx.shape[0]))

    def timeit(fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    # ---- primitive costs ---------------------------------------------------
    w = len(pp._window_layout(c)[0])
    m = w * n
    ds_probe = jnp.asarray(
        rng.integers(0, 1 << c, (batch, m), dtype=np.int32))

    t, order = timeit(jax.jit(lambda a: jnp.argsort(a, axis=-1)), ds_probe)
    log(f"argsort [B={batch}, {m}]: {t*1e3:.1f} ms")

    gx = jnp.broadcast_to(table.tx, (batch,) + table.tx.shape)

    @jax.jit
    def gather(a, o):
        return jnp.take_along_axis(a, o[..., None], axis=1)

    t, _ = timeit(gather, gx, order)
    log(f"gather [B, {m}, 16]: {t*1e3:.1f} ms")

    # ---- fused single-program pipeline -------------------------------------
    nb = 1 << c

    @functools.partial(jax.jit, static_argnames=("cc", "rr"))
    def fused(sl, tx, ty, tv, cc: int, rr: int):
        prep = pp._prep_core(
            jnp.moveaxis(pp._digits_balanced(sl, cc), 0, 1)
            .reshape(sl.shape[0], -1),
            tx, ty, tv, rr, nb)
        sx, sy, sval, flags, pb, pr, pbf, prf, max_run = prep
        pieces = pp._flush_scan((sx, sy, sval), flags, affine=True)
        pb_all = jnp.concatenate([pb, pbf[None]], axis=0)
        pr_all = jnp.concatenate([pr, prf[None]], axis=0)
        buckets = pp._pipv2_scatter(pieces, pb_all, pr_all, p_max=2, c=cc)

        g = pb_all.shape[1]
        lo_bits = cc // 2
        hi_n, lo_n = 1 << (cc - lo_bits), 1 << lo_bits
        r_hi = pp._pipv2_sum_rows(tuple(
            jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 3), (0, 1))
            .reshape(2 * lo_n, g, hi_n, 16) for comp in buckets))
        c_lo = pp._pipv2_sum_rows(tuple(
            jnp.moveaxis(comp.reshape(g, 2, hi_n, lo_n, 16), (1, 2), (0, 1))
            .reshape(2 * hi_n, g, lo_n, 16) for comp in buckets))
        _, bias_dev = pp._pip_bias()
        stacked = tuple(
            jnp.moveaxis(
                jnp.flip(jnp.stack(
                    [rh, jnp.pad(cl, ((0, 0), (0, hi_n - lo_n), (0, 0)))],
                    axis=2), axis=1), 1, 0)
            for rh, cl in zip(r_hi, c_lo))
        acc2 = pp._pipv2_weighted(stacked, bias_dev)
        return acc2, max_run

    t0 = time.time()
    (acc2, max_run) = fused(sl, table.tx, table.ty, table.tvalid,
                            cc=c, rr=r_rows)
    jax.block_until_ready(acc2)
    log(f"fused compile+first: {time.time()-t0:.1f}s (max_run={int(max_run)})")

    t, (acc2, _) = timeit(fused, sl, table.tx, table.ty, table.tvalid,
                          cc=c, rr=r_rows)
    log(f"fused pipeline warm: {t*1e3:.1f} ms per batch-{batch} "
        f"-> {batch*n/t:,.0f} pts/s (pre-download)")

    # full e2e including download + host fold
    bias_pt, _ = pp._pip_bias()
    neg_k = (bias_pt[0], (-bias_pt[1]) % FQ.p)
    lo_bits = c // 2

    def e2e(sl_):
        acc2, mr = fused(sl_, table.tx, table.ty, table.tvalid, cc=c, rr=r_rows)
        g = acc2[0].shape[0]
        host = points_from_device(
            tuple(comp.reshape(g * 2, 16) for comp in acc2))
        out = []
        for bi in range(g):
            w_hi = g1_add(host[2 * bi], neg_k)
            w_lo = g1_add(host[2 * bi + 1], neg_k)
            out.append(g1_add(g1_mul(w_hi, 1 << lo_bits), w_lo))
        return out

    res = e2e(sl)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        res = e2e(sl)
    per = (time.time() - t0) / (reps * batch)
    log(f"fused e2e: {per*1e3:.1f} ms/msm -> {n/per:,.0f} pts/s")

    # parity vs production path
    ref = pp.msm_fixed_host(sl, table)
    assert res == ref, "fused pipeline result mismatch"
    log("parity OK vs msm_fixed_host")


if __name__ == "__main__":
    main()
