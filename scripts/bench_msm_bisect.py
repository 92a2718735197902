"""Bisect the flush-MSM device time: incrementally larger jitted prefixes of
the prep + pipeline, each timed warm. Locates which op balloons when composed
(prep alone measures 0.25 s while its primitives measure ~0.1 ms isolated).

Usage: python scripts/bench_msm_bisect.py [log_n] [batch]
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

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log_n
    log(f"devices: {jax.devices()}")

    cache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_points_2e{log_n}.npz")
    d = np.load(cache)
    c = pp.default_fixed_window(n)
    tcache = os.path.expanduser(f"~/.cache/zerog_tpu_r4_wtable_{log_n}_{c}.npz")
    d = np.load(tcache)
    table = pp.WindowTable(c, n, jnp.asarray(d["tx"]), jnp.asarray(d["ty"]),
                           jnp.asarray(d["tv"]))

    rng = np.random.default_rng(7)
    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p
                for _ in range(n)] for _ in range(batch)]
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))
    r_rows = pp._pip_r_rows(int(table.tx.shape[0]))
    nb = 1 << c

    def timeit(fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    tx, ty, tv = table.tx, table.ty, table.tvalid

    def stage_digits(sl):
        digits = pp._digits_balanced(sl, c)
        return jnp.moveaxis(digits, 0, 1).reshape(sl.shape[0], -1)

    def stage_mask_pad(sl):
        ds = stage_digits(sl)
        pv_b = tv[None, :]
        ds = jnp.where(pv_b, ds, 0)
        m0 = ds.shape[1]
        m = ((m0 + r_rows - 1) // r_rows) * r_rows
        if m > m0:
            ds = jnp.pad(ds, ((0, 0), (0, m - m0)))
        return ds

    def stage_sort(sl):
        ds = stage_mask_pad(sl)
        order = jnp.argsort(ds, axis=-1)
        ds = jnp.take_along_axis(ds, order, axis=-1)
        return ds, order

    def stage_gather(sl):
        ds, order = stage_sort(sl)
        gx = jnp.take_along_axis(
            jnp.broadcast_to(tx, (batch,) + tx.shape), order[..., None], axis=1)
        gy = jnp.take_along_axis(
            jnp.broadcast_to(ty, (batch,) + ty.shape), order[..., None], axis=1)
        gv = jnp.take_along_axis(
            jnp.broadcast_to(tv, (batch,) + tv.shape), order, axis=1)
        return ds, gx, gy, gv

    def stage_colmaj(sl):
        ds, gx, gy, gv = stage_gather(sl)
        return (pp._colmaj(gx, r_rows), pp._colmaj(gy, r_rows),
                pp._colmaj(gv, r_rows), ds)

    def stage_streaminfo(sl):
        sx, sy, sval, ds = stage_colmaj(sl)
        return (sx, sy, sval) + pp._stream_info(ds, r_rows, nb)

    def stage_flush(sl):
        prep = stage_streaminfo(sl)
        sx, sy, sval, flags = prep[0], prep[1], prep[2], prep[3]
        return pp._flush_scan((sx, sy, sval), flags, affine=True), prep[4], prep[5]

    for name, fn in [("digits", stage_digits), ("mask_pad", stage_mask_pad),
                     ("sort", stage_sort), ("gather", stage_gather),
                     ("colmaj", stage_colmaj), ("streaminfo", stage_streaminfo),
                     ("flush", stage_flush)]:
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(sl)
        jax.block_until_ready(out)
        cold = time.time() - t0
        t, _ = timeit(jfn, sl)
        log(f"prefix {name}: compile {cold:.1f}s warm {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
