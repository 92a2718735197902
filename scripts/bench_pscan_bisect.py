"""Bisect the Pallas flush-scan kernel slowdown: same grid/scratch structure,
increasingly complex bodies. Production shape: R=1024, CT=2048.

Usage: python scripts/bench_pscan_bisect.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NLIMB = 16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zerog_tpu.field.pfield import _mul_body, pfq
    from zerog_tpu.curve.pscan import _madd_incomplete, _params

    log(f"devices: {jax.devices()}")
    _params()  # warm the host cache

    r, mt = 1024, 16          # CT = 2048
    rc, ts = 8, 8
    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.integers(0, 1 << 16, (r, NLIMB, mt, 128),
                                  dtype=np.int64).astype(np.uint32))
    sy = jnp.asarray(rng.integers(0, 1 << 16, (r, NLIMB, mt, 128),
                                  dtype=np.int64).astype(np.uint32))
    fl = jnp.asarray((rng.random((r, 1, mt, 128)) < 0.1).astype(np.uint32))

    grid = (mt // ts, r // rc)

    def spec(nl):
        return pl.BlockSpec((rc, nl, ts, 128), lambda ci, ri: (ri, 0, ci, 0),
                            memory_space=pltpu.VMEM)

    out_spec = spec(NLIMB)
    scratch = [pltpu.VMEM((NLIMB, ts, 128), jnp.uint32) for _ in range(3)]

    def run(name, kernel):
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, NLIMB, mt, 128), jnp.uint32),
            grid=grid,
            in_specs=[spec(NLIMB), spec(NLIMB), spec(1)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        t0 = time.time()
        out = fn(sx, sy, fl)
        _ = jax.device_get(out[:1, :1, :1, :1])
        cold = time.time() - t0
        t0 = time.time()
        out = fn(sx, sy, fl)
        _ = jax.device_get(out[:1, :1, :1, :1])
        warm = time.time() - t0
        log(f"{name}: compile {cold:.1f}s warm {warm*1e3:.1f} ms")

    # 1. trivial body: carry += row
    def k_trivial(x_ref, y_ref, f_ref, o_ref, cx, cy, cz):
        @pl.when(pl.program_id(1) == 0)
        def _():
            for i in range(NLIMB):
                cx[i] = jnp.zeros_like(cx[i])
        for rr in range(rc):
            for i in range(NLIMB):
                v = cx[i] + x_ref[rr, i]
                cx[i] = v
                o_ref[rr, i] = v

    run("trivial carry+row", k_trivial)

    # 2. one field mul per row (carry = carry * row)
    def k_mul(x_ref, y_ref, f_ref, o_ref, cx, cy, cz):
        @pl.when(pl.program_id(1) == 0)
        def _():
            for i in range(NLIMB):
                cx[i] = x_ref[0, i]
        for rr in range(rc):
            a = [cx[i] for i in range(NLIMB)]
            b = [x_ref[rr, i] for i in range(NLIMB)]
            out = _mul_body(a, b, _params())
            for i in range(NLIMB):
                cx[i] = out[i]
                o_ref[rr, i] = out[i]

    run("1 mul/row", k_mul)

    # 3. registers-resident carry: mul chain per grid step, scratch only at
    #    step boundaries
    def k_mul_reg(x_ref, y_ref, f_ref, o_ref, cx, cy, cz):
        @pl.when(pl.program_id(1) == 0)
        def _():
            for i in range(NLIMB):
                cx[i] = x_ref[0, i]
        a = [cx[i] for i in range(NLIMB)]
        for rr in range(rc):
            b = [x_ref[rr, i] for i in range(NLIMB)]
            a = _mul_body(a, b, _params())
            for i in range(NLIMB):
                o_ref[rr, i] = a[i]
        for i in range(NLIMB):
            cx[i] = a[i]

    run("1 mul/row reg-carry", k_mul_reg)

    # 4. full madd per row, register carry
    def k_madd(x_ref, y_ref, f_ref, o_ref, cx, cy, cz):
        @pl.when(pl.program_id(1) == 0)
        def _():
            for i in range(NLIMB):
                cx[i] = x_ref[0, i]
                cy[i] = y_ref[0, i]
                cz[i] = jnp.zeros_like(cz[i])
        px = [cx[i] for i in range(NLIMB)]
        py = [cy[i] for i in range(NLIMB)]
        pz = [cz[i] for i in range(NLIMB)]
        for rr in range(rc):
            qx = [x_ref[rr, i] for i in range(NLIMB)]
            qy = [y_ref[rr, i] for i in range(NLIMB)]
            qv = f_ref[rr, 0] != 0
            px, py, pz = _madd_incomplete(px, py, pz, qx, qy, qv)
            for i in range(NLIMB):
                o_ref[rr, i] = px[i]
        for i in range(NLIMB):
            cx[i] = px[i]
            cy[i] = py[i]
            cz[i] = pz[i]

    run("madd/row reg-carry", k_madd)


if __name__ == "__main__":
    main()
