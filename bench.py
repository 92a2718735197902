"""Benchmark entry point (driver contract: print ONE JSON line).

Headline metric: BN254 Pippenger MSM throughput in points/s/chip at the
MNIST-Tiny circuit size (N = 2^14, batch 4 — the prover commits several
polynomials per phase, which is what amortizes launch overhead on the axon
runtime). BASELINE.json records no published reference numbers
("published": {}), so vs_baseline compares against this repo's ROUND-1
measured rate (19,626 pts/s, BENCH_r01.json) — i.e. the framework's own
progress, not a reference comparison.

Extra keys in the same JSON object carry the full-pipeline wall times
BASELINE.md names as targets (keygen/prove/verify for MNIST-Tiny at k=14 on
the real chip). Set ZEROG_BENCH_FAST=1 to skip the proof pipeline (e.g. on a
cold compile cache).
"""

import json
import os
import sys
import time

import numpy as np

ROUND1_MSM_PPS = 19626.0


def _ensure_backend():
    """If the TPU worker is unreachable (tunnel down / worker crashed), fall
    back to CPU so the bench still reports a line (flagged via `backend`).

    The probe runs in a short-timeout subprocess because a dead axon tunnel
    makes jax.devices() HANG (not raise) — observed r02: >9 min with no
    error. ZEROG_BENCH_BACKEND_OK=1 skips the probe (set for child
    processes once the parent has probed)."""
    import subprocess

    if not os.environ.get("ZEROG_BENCH_BACKEND_OK"):
        probe_s = int(os.environ.get("ZEROG_BENCH_PROBE_TIMEOUT", "240"))
        try:
            res = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                capture_output=True, timeout=probe_s, text=True)
            ok = res.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(f"TPU backend probe failed/hung (>{probe_s}s); "
                  "falling back to CPU", file=sys.stderr)
            import jax

            jax.config.update("jax_platforms", "cpu")
            jax.devices()
            os.environ["ZEROG_BENCH_FORCE_CPU"] = "1"
            return "cpu-fallback"
        os.environ["ZEROG_BENCH_BACKEND_OK"] = "1"

    import jax

    if os.environ.get("ZEROG_BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        return "cpu-fallback"
    jax.devices()
    return str(jax.default_backend())


def bench_msm(cpu_fallback: bool = False):
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR
    from zerog_tpu.curve import bn254 as c, points_to_device, fixed_base_expand
    from zerog_tpu.curve.pippenger import (
        msm, build_window_table, default_fixed_window)
    from zerog_tpu.poly import NttPlan
    from zerog_tpu.field import to_limbs

    # On the CPU fallback (TPU tunnel dead at round end) shrink the workload
    # so the headline JSON line still lands inside the driver's budget.
    log_n = 12 if cpu_fallback else 14
    n = 1 << log_n
    batch = 2 if cpu_fallback else 4

    rng = np.random.default_rng(42)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    scalars_for_points = [int(x) for x in rng.integers(1, 1 << 62, n)]
    pts = fixed_base_expand(c.G1_GEN, scalars_for_points)
    print(f"point setup: {time.time()-t0:.1f}s", file=sys.stderr)
    pdev = tuple(jnp.asarray(a) for a in points_to_device(pts))

    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
               for _ in range(batch)]

    # Headline: the merged-window fixed-base path — what Srs.commit* actually
    # runs (the bases are fixed SRS powers; the table is built once per SRS
    # and amortized over the ~40 commitments of every proof). On the CPU
    # fallback skip it (XLA:CPU handles the big bucket scatter poorly —
    # measured 35 s/MSM at 2^12 — and the fallback's one job is landing the
    # JSON line inside the driver budget) and report the generic path.
    table = None
    table_s = 0.0
    if not cpu_fallback:
        t0 = time.time()
        table = build_window_table(pdev, default_fixed_window(n))
        table_s = time.time() - t0
        print(f"window table build (c={table.c}): {table_s:.1f}s",
              file=sys.stderr)

        t0 = time.time()
        out = msm(scalars, table=table)
        print(f"msm compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = msm(scalars, table=table)
        per_msm = (time.time() - t0) / (reps * batch)
        pps = n / per_msm
        print(f"msm fixed-base: {per_msm*1e3:.1f} ms per {n}-point MSM "
              f"-> {pps:,.0f} points/s", file=sys.stderr)

    # The generic (per-window) path for arbitrary bases — the headline on
    # the CPU fallback, a diagnostic alongside the fixed path on the chip.
    t0 = time.time()
    out = msm(scalars, pdev)
    print(f"msm generic compile+first run: {time.time()-t0:.1f}s",
          file=sys.stderr)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = msm(scalars, pdev)
    per_generic = (time.time() - t0) / (reps * batch)
    print(f"msm generic: {per_generic*1e3:.1f} ms per {n}-point MSM "
          f"-> {n/per_generic:,.0f} points/s", file=sys.stderr)
    if cpu_fallback:
        pps = n / per_generic

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
    extra = {"msm_generic_points_per_s": round(n / per_generic, 1)}
    if table is not None:
        extra["msm_table_build_s"] = round(table_s, 2)
        extra["msm_window_c"] = table.c
    return pps, bflies / ntt_s, extra


_PIPELINES = {
    # tag -> (model file, k) — MNIST-Tiny and MNIST-Small per BASELINE.md
    # targets (reference registry src/lib.rs:48-50). Medium matches the
    # reference's criterion bench matrix (benches/bench.rs:47-76) and runs
    # only when ZEROG_BENCH_MEDIUM=1 (keeps the default driver run inside
    # its time budget).
    "tiny": ("model_28input_256entry_1hash_1bpi.hdf5", 14),
    "small": ("model_28input_1024entry_2hash_2bpi.hdf5", 15),
    "medium": ("model_28input_2048entry_2hash_3bpi.hdf5", 15),
}


def bench_proof_pipeline(tag: str):
    """Full keygen/prove/verify wall times for one MNIST model on the real
    backend (BASELINE.md names MNIST-Small prove wall-time as a target)."""
    import pathlib

    model_name, k = _PIPELINES[tag]
    model = pathlib.Path("/root/reference/models") / model_name
    img = pathlib.Path("/root/reference/benches/example_image_7.png")
    if not (model.exists() and img.exists()):
        print("reference artifacts missing; skipping proof bench", file=sys.stderr)
        return {}
    from zerog_tpu.curve import Srs
    from zerog_tpu.models import load_wnn, load_grayscale_image
    from zerog_tpu.plonk.verifier import verify_proof

    wnn = load_wnn(model)
    image = load_grayscale_image(img)

    t0 = time.time()
    srs = Srs.setup(k, seed=b"bench-srs")
    srs_s = time.time() - t0
    print(f"[{tag}] srs setup: {srs_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    pk = wnn.generate_proving_key(srs)
    keygen_s = time.time() - t0
    print(f"[{tag}] keygen: {keygen_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    proof, outputs = wnn.proof(pk, srs, image, rng_seed=b"bench-proof")
    first_proof_s = time.time() - t0
    print(f"[{tag}] prove (first, incl. compiles): {first_proof_s:.1f}s",
          file=sys.stderr)

    timings = {}
    t0 = time.time()
    proof, outputs = wnn.proof(pk, srs, image, rng_seed=b"bench-proof2",
                               timings=timings)
    proof_s = time.time() - t0
    print(f"[{tag}] prove (warm): {proof_s:.1f}s; phases: "
          + ", ".join(f"{k}={v:.1f}s" for k, v in timings.items()),
          file=sys.stderr)

    t0 = time.time()
    assert verify_proof(pk.vk, srs, [outputs], proof)
    verify_s = time.time() - t0
    print(f"[{tag}] verify: {verify_s:.1f}s", file=sys.stderr)

    return {
        f"{tag}_k": k,
        f"{tag}_srs_s": round(srs_s, 2),
        f"{tag}_keygen_s": round(keygen_s, 2),
        f"{tag}_proof_first_s": round(first_proof_s, 2),
        f"{tag}_proof_wall_s": round(proof_s, 2),
        f"{tag}_verify_s": round(verify_s, 2),
        f"{tag}_proof_bytes": len(proof),
    }


def main():
    t_start = time.time()
    # Global wall-clock budget: the proof pipelines are trimmed to whatever
    # remains of it so the headline JSON line always lands inside the
    # driver's bench window, even on a cold compile cache.
    total_budget = int(os.environ.get("ZEROG_BENCH_BUDGET", "2700"))
    backend = _ensure_backend()
    pps, bps, msm_extra = bench_msm(cpu_fallback=backend == "cpu-fallback")
    extra = {"backend": backend, **msm_extra}
    if backend == "cpu-fallback":
        # k=14/15 proof pipelines don't fit a CPU budget; MSM/NTT only.
        os.environ.setdefault("ZEROG_BENCH_FAST", "1")
    if not os.environ.get("ZEROG_BENCH_FAST"):
        # Each proof pipeline can hit long worker-side compiles on a cold
        # process; run them in time-boxed subprocesses (one per model, so a
        # slow Small run can't shadow the Tiny numbers) so the headline JSON
        # line always lands.
        import subprocess

        per_model_cap = int(os.environ.get("ZEROG_BENCH_PROOF_TIMEOUT", "2400"))
        tags = ("tiny", "small", "medium") if os.environ.get(
            "ZEROG_BENCH_MEDIUM") else ("tiny", "small")
        for tag in tags:
            remaining = total_budget - (time.time() - t_start)
            budget = int(min(per_model_cap, remaining))
            if budget < 120:
                print(f"bench budget exhausted ({remaining:.0f}s left); "
                      f"skipping {tag} proof pipeline", file=sys.stderr)
                continue
            try:
                res = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     f"--proof-only={tag}"],
                    capture_output=True, timeout=budget, text=True)
                sys.stderr.write(res.stderr)
                for line in res.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        extra.update(json.loads(line))
            except subprocess.TimeoutExpired:
                print(f"{tag} proof bench exceeded {budget}s; skipping",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"{tag} proof bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "bn254_msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / ROUND1_MSM_PPS, 3),
        "ntt_butterflies_per_s": round(bps, 1),
        **extra,
    }))


if __name__ == "__main__":
    tags = [a.split("=", 1)[1] if "=" in a else "tiny"
            for a in sys.argv[1:] if a.startswith("--proof-only")]
    if tags:
        _ensure_backend()
        print(json.dumps(bench_proof_pipeline(tags[0])))
    else:
        main()
