"""Pre-generate the k=17 bench SRS on the XLA:CPU backend.

Srs.setup is seed-deterministic exact field math, so the CPU result is
bit-identical to the TPU one; generating it host-side keeps the large
(k=17) bench stage from paying a fresh ~7-minute `_expand_chunk` TPU
compile (measured: k=15 SRS setup 424.7 s cold vs 41.7 s warm at k=14)
inside its timebox.

Usage: python scripts/pregen_srs17.py [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    from zerog_tpu.curve import Srs

    path = os.path.expanduser(f"~/.cache/zerog_tpu_bench_srs_{k}.bin")
    if os.path.exists(path):
        print(f"{path} already exists")
        return
    t0 = time.time()
    srs = Srs.setup(k, seed=b"bench-srs")
    print(f"setup({k}) on cpu: {time.time()-t0:.1f}s", flush=True)
    srs.write(path)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
