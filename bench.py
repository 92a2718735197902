"""Benchmark entry point (driver contract: print ONE JSON line).

Headline metric: BN254 Pippenger MSM throughput in points/s/chip at the
MNIST-Tiny circuit size (N = 2^14, batch 4 — the prover commits several
polynomials per phase, which is what amortizes launch overhead on the axon
runtime). BASELINE.json records no published reference numbers
("published": {}), so vs_baseline compares against this repo's ROUND-1
measured rate (19,626 pts/s, BENCH_r01.json) — i.e. the framework's own
progress, not a reference comparison.

Robustness contract (the round-2 lesson — BENCH_r02.json died rc=124 with
parsed=null): the full JSON line is RE-PRINTED after every completed stage,
so a mid-run kill still records everything measured so far; the driver reads
the last parseable line. Every stage runs in a time-boxed subprocess sized
from the remaining global budget (ZEROG_BENCH_BUDGET, default 2400 s), and
pipeline children emit partial JSON after each phase (keygen / prove /
verify) so even a timed-out child contributes its completed phases.
Stage ORDER is the round-4 lesson (BENCH_r04 recorded zero proof numbers):
Tiny/Small proof pipelines first, then the MSM/NTT microbenches (the MSM
stage downgrades to the compile-light segscan strategy when its timebox is
tight), then Medium and the synthetic k=17 Large.

Extra keys carry the full-pipeline wall times BASELINE.md names as targets
(keygen/prove/verify for MNIST-Tiny k=14 / Small k=15 / Medium k=15 on the
real chip, reference bench matrix at /root/reference/benches/bench.rs:47-76,
plus the synthetic MNIST-Large-shaped pipeline at the reference's k=17).
Set ZEROG_BENCH_FAST=1 to skip the proof pipelines.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

ROUND1_MSM_PPS = 19626.0

REPORT = {
    "metric": "bn254_msm_points_per_s_per_chip",
    "value": 0.0,
    "unit": "points/s",
    "vs_baseline": 0.0,
    "status": "starting",
}


def emit(**updates):
    """Merge updates into the report and print the full JSON line (driver
    reads the LAST parseable line, so re-printing after every stage is what
    makes a mid-run kill lossless)."""
    REPORT.update(updates)
    if REPORT["value"]:
        REPORT["vs_baseline"] = round(REPORT["value"] / ROUND1_MSM_PPS, 3)
    print(json.dumps(REPORT), flush=True)


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
        # A SIGTERM'ed device process wedges the axon worker for ~30-60 min
        # (stale pool claim); the wedge CLEARS on its own, so retry the probe
        # a few times before condemning the whole run to the CPU fallback.
        tries = int(os.environ.get("ZEROG_BENCH_PROBE_TRIES", "3"))
        ok = False
        for attempt in range(tries):
            try:
                # the probe must COMPUTE, not just enumerate: a wedged axon
                # worker still answers jax.devices() but blocks forever on
                # the first executable (observed r5: devices() fine at
                # t+0, compute wedged for >60 min from t+8 min on)
                res = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; jax.devices();"
                     "jnp.ones((8,8)).sum().block_until_ready();"
                     "print('ok', jax.default_backend())"],
                    capture_output=True, timeout=probe_s, text=True)
                ok = res.returncode == 0 and "ok" in res.stdout
            except subprocess.TimeoutExpired:
                ok = False
            if ok:
                break
            if attempt + 1 < tries:
                print(f"TPU probe failed/hung (attempt {attempt + 1}/{tries});"
                      " retrying in 120s (worker wedge clears on its own)",
                      file=sys.stderr)
                time.sleep(120)
        if not ok:
            print(f"TPU backend probe failed/hung (>{probe_s}s x{tries}); "
                  "falling back to CPU", file=sys.stderr)
            import jax

            jax.config.update("jax_platforms", "cpu")
            # don't pollute the shared TPU compile-cache dir with
            # machine-specific XLA:CPU executables (SIGILL risk elsewhere)
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/zerog_tpu_jax_cpu_fallback"))
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


def _bench_points(n: int, cpu_fallback: bool):
    """Random-looking fixed bases for the MSM microbench; cached on disk so
    later runs (and the driver's end-of-round run) skip the ~1 min setup."""
    import jax.numpy as jnp

    from zerog_tpu.curve import bn254 as c, points_to_device, fixed_base_expand

    # cache key includes the RNG seed so a change to point generation can
    # never silently reuse stale points
    seed = 42
    cache = os.path.expanduser(
        f"~/.cache/zerog_tpu_bench_points_s{seed}_2e{n.bit_length()-1}.npz")
    t0 = time.time()
    if os.path.exists(cache) and not cpu_fallback:
        d = np.load(cache)
        arrs = (d["px"], d["py"], d["pv"])
        print(f"point load: {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        rng = np.random.default_rng(42)
        scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
        pts = fixed_base_expand(c.G1_GEN, scalars)
        arrs = points_to_device(pts)
        if not cpu_fallback:
            try:
                np.savez(cache, px=arrs[0], py=arrs[1], pv=arrs[2])
            except OSError:
                pass
        print(f"point setup: {time.time()-t0:.1f}s", file=sys.stderr)
    return tuple(jnp.asarray(a) for a in arrs)


def bench_msm(cpu_fallback: bool = False):
    """Headline MSM throughput. Measures the device-resident scalar path
    (`msm_fixed_host` on pre-converted limb arrays) — exactly what the
    prover's `Srs.commit_dev` runs per commitment; host int->limb conversion
    is a separate one-time cost reported as `msm_host_convert_s`."""
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR, to_limbs
    from zerog_tpu.curve.pippenger import (
        msm_fixed_host, msm_pippenger_host, build_window_table,
        default_fixed_window, default_window)

    # On the CPU fallback (TPU tunnel dead at round end) shrink the workload
    # so the headline JSON line still lands inside the driver's budget.
    log_n = 12 if cpu_fallback else 14
    n = 1 << log_n
    batch = 2 if cpu_fallback else 4

    rng = np.random.default_rng(7)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    # compile-budget guard: the Pallas flush engine is the fastest but its
    # COLD compile ate the whole r4 timebox (786 s); if this stage's timebox
    # is tight and no warm compile cache can be assumed, fall back to the
    # compile-light segscan strategy (~82 s cold, ~13x slower steady-state).
    box = float(os.environ.get("ZEROG_STAGE_BOX", "900"))
    if box < 500 and not os.environ.get("ZEROG_MSM_STRATEGY"):
        os.environ["ZEROG_MSM_STRATEGY"] = "segscan"
        print(f"stage timebox {box:.0f}s < 500s: using segscan MSM strategy",
              file=sys.stderr)
    pdev = _bench_points(n, cpu_fallback)

    scalars = [[int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(n)]
               for _ in range(batch)]
    t0 = time.time()
    sl = jnp.asarray(to_limbs(np.asarray(scalars, dtype=object)))
    convert_s = time.time() - t0

    out = {"msm_host_convert_s": round(convert_s, 2)}
    if cpu_fallback:
        # XLA:CPU handles the big bucket scatter poorly; report the generic
        # per-window path at a reduced size so the line lands in budget.
        c = default_window(n)
        res = msm_pippenger_host(sl, *pdev, c=c)
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            res = msm_pippenger_host(sl, *pdev, c=c)
        per = (time.time() - t0) / (reps * batch)
        return n / per, out

    c = default_fixed_window(n)
    tcache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_wtable_{log_n}_{c}.npz")
    t0 = time.time()
    if os.path.exists(tcache):
        from zerog_tpu.curve.pippenger import WindowTable

        d = np.load(tcache)
        table = WindowTable(c, n, jnp.asarray(d["tx"]), jnp.asarray(d["ty"]),
                            jnp.asarray(d["tv"]))
        table_s = time.time() - t0
        print(f"window table load (c={c}): {table_s:.1f}s", file=sys.stderr)
    else:
        table = build_window_table(pdev, c)
        jax.block_until_ready((table.tx, table.ty))
        table_s = time.time() - t0
        print(f"window table build (c={table.c}): {table_s:.1f}s",
              file=sys.stderr)
        try:
            np.savez(tcache, tx=np.asarray(table.tx), ty=np.asarray(table.ty),
                     tv=np.asarray(table.tvalid))
        except OSError:
            pass
    out["msm_table_build_s"] = round(table_s, 2)
    out["msm_window_c"] = table.c

    t0 = time.time()
    res = msm_fixed_host(sl, table)
    first_s = time.time() - t0
    print(f"msm compile+first run: {first_s:.1f}s", file=sys.stderr)
    out["msm_compile_first_s"] = round(first_s, 2)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        res = msm_fixed_host(sl, table)
    per_msm = (time.time() - t0) / (reps * batch)
    pps = n / per_msm
    print(f"msm fixed-base: {per_msm*1e3:.1f} ms per {n}-point MSM "
          f"-> {pps:,.0f} points/s", file=sys.stderr)
    return pps, out


def bench_ntt():
    """NTT throughput (butterflies/s at 2^16, batch 8 — the prover's NTTs
    are batched via the NTT_BATCH shape normalization, and 2^16 is the
    extended domain of the k=14 Tiny circuit, so the program is warm after a
    Tiny proof). On TPU this exercises the MXU int8-DFT-matmul engine
    (poly/pntt.py); on the CPU fallback, the XLA butterfly path.

    Timing discipline (r4 lesson, pinned in ARCHITECTURE.md): on the
    tunneled axon runtime `block_until_ready` does NOT reliably wait, so the
    old same-input rep loop read ~20x too fast (r03 recorded 1.5e9
    butterflies/s that way). Here each rep transforms the PREVIOUS output
    (data-dependent chain) and the loop is anchored by a device_get."""
    import jax
    import jax.numpy as jnp

    from zerog_tpu.field import FR, to_limbs
    from zerog_tpu.poly import NttPlan

    rng = np.random.default_rng(3)
    plan = NttPlan(16)
    batch = 8
    vals = jnp.asarray(
        to_limbs([[int(x) for x in rng.integers(0, 1 << 62, 1 << 16)]
                  for _ in range(batch)], FR, mont=True))

    t0 = time.time()
    r = plan.ntt(vals)
    _ = jax.device_get(r[:1, :1])
    print(f"ntt compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        r = plan.ntt(r)
    _ = jax.device_get(r[:1, :1])
    ntt_s = (time.time() - t0) / reps
    bflies = batch * (1 << 15) * 16
    print(f"ntt 2^16 x B{batch}: {ntt_s*1e3:.1f} ms "
          f"-> {bflies/ntt_s:,.0f} butterflies/s", file=sys.stderr)
    return bflies / ntt_s


_PIPELINES = {
    # tag -> (model file, k) — MNIST-Tiny and MNIST-Small per BASELINE.md
    # targets (reference registry src/lib.rs:48-50). Medium matches the
    # reference's criterion bench matrix (benches/bench.rs:47-76); "large"
    # is the synthetic MNIST-Large-shaped model at the reference's k=17
    # (the real HDF5 blob is stripped from the reference checkout).
    "tiny": ("model_28input_256entry_1hash_1bpi.hdf5", 14),
    "small": ("model_28input_1024entry_2hash_2bpi.hdf5", 15),
    "medium": ("model_28input_2048entry_2hash_3bpi.hdf5", 15),
    "large": (None, 17),
}


def _load_model(tag: str):
    import pathlib

    model_name, k = _PIPELINES[tag]
    if model_name is None:
        from zerog_tpu.models.synthetic import make_synthetic_wnn, MNIST_LARGE_SHAPE

        return make_synthetic_wnn(*MNIST_LARGE_SHAPE), k
    model = pathlib.Path("/root/reference/models") / model_name
    if not model.exists():
        return None, k
    from zerog_tpu.models import load_wnn

    return load_wnn(model), k


def bench_proof_pipeline(tag: str):
    """Full keygen/prove/verify wall times for one MNIST model on the real
    backend (BASELINE.md names MNIST-Small prove wall-time as a target).
    Prints a cumulative partial JSON line after EVERY phase so the parent
    can salvage completed phases from a timed-out child.

    The proving key is disk-cached per (tag, k): keygen is deterministic
    from (model, SRS), so a rerun loads the pk and reports the ORIGINAL
    measured keygen seconds from the cache sidecar (plus the load time) —
    this is what lets the Small/Medium/Large stages fit their timeboxes on
    the driver's end-of-round run."""
    import pathlib

    wnn, k = _load_model(tag)
    img = pathlib.Path("/root/reference/benches/example_image_7.png")
    if wnn is None or not img.exists():
        print("reference artifacts missing; skipping proof bench", file=sys.stderr)
        return
    from zerog_tpu.curve import Srs
    from zerog_tpu.models import load_grayscale_image
    from zerog_tpu.plonk.verifier import verify_proof

    partial = {}

    def phase(key, value):
        partial[key] = value
        print(json.dumps(partial), flush=True)

    image = load_grayscale_image(img)

    # SRS is deterministic from the seed; cache it on disk so only the first
    # run pays the ~200 s two-basis fixed-base expansion.
    srs_cache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_srs_{k}.bin")
    t0 = time.time()
    if os.path.exists(srs_cache):
        srs = Srs.read(srs_cache)
    else:
        srs = Srs.setup(k, seed=b"bench-srs")
        try:
            srs.write(srs_cache)
        except OSError:
            pass
    srs_s = time.time() - t0
    print(f"[{tag}] srs setup: {srs_s:.1f}s", file=sys.stderr)
    phase(f"{tag}_k", k)
    phase(f"{tag}_srs_s", round(srs_s, 2))

    pk_cache = os.path.expanduser(f"~/.cache/zerog_tpu_bench_pk_{tag}_{k}.npz")
    meta_cache = pk_cache + ".json"
    if os.path.exists(pk_cache) and os.path.exists(meta_cache):
        from zerog_tpu.models.keys_io import read_pk

        t0 = time.time()
        pk = read_pk(pk_cache, wnn.get_circuit_params())
        load_s = time.time() - t0
        with open(meta_cache) as f:
            keygen_s = json.load(f)["keygen_s"]
        print(f"[{tag}] pk loaded from cache in {load_s:.1f}s "
              f"(original keygen: {keygen_s:.1f}s)", file=sys.stderr)
        phase(f"{tag}_pk_load_s", round(load_s, 2))
    else:
        t0 = time.time()
        pk = wnn.generate_proving_key(srs)
        keygen_s = time.time() - t0
        print(f"[{tag}] keygen: {keygen_s:.1f}s", file=sys.stderr)
        try:
            from zerog_tpu.models.keys_io import write_keys

            write_keys(pk, pk_cache)
            with open(meta_cache, "w") as f:
                json.dump({"keygen_s": round(keygen_s, 2)}, f)
        except OSError:
            pass
    phase(f"{tag}_keygen_s", round(keygen_s, 2))

    t0 = time.time()
    proof, outputs = wnn.proof(pk, srs, image, rng_seed=b"bench-proof")
    first_proof_s = time.time() - t0
    print(f"[{tag}] prove (first, incl. compiles): {first_proof_s:.1f}s",
          file=sys.stderr)
    phase(f"{tag}_proof_first_s", round(first_proof_s, 2))

    timings = {}
    t0 = time.time()
    proof, outputs = wnn.proof(pk, srs, image, rng_seed=b"bench-proof2",
                               timings=timings)
    proof_s = time.time() - t0
    print(f"[{tag}] prove (warm): {proof_s:.1f}s; phases: "
          + ", ".join(f"{k}={v:.1f}s" for k, v in timings.items()),
          file=sys.stderr)
    phase(f"{tag}_proof_wall_s", round(proof_s, 2))
    phase(f"{tag}_proof_bytes", len(proof))
    for pk_, pv in timings.items():
        partial[f"{tag}_phase_{pk_}_s"] = round(pv, 2)
    print(json.dumps(partial), flush=True)

    t0 = time.time()
    assert verify_proof(pk.vk, srs, [outputs], proof)
    verify_s = time.time() - t0
    print(f"[{tag}] verify: {verify_s:.1f}s", file=sys.stderr)
    phase(f"{tag}_verify_s", round(verify_s, 2))

    # EVM verifier: contract size (EIP-170-checked at codegen) + dry-run gas
    # (reference prints the same numbers per run: src/eth.rs:79-82,103 +
    # src/main.rs:269-270).
    try:
        from zerog_tpu.eth import gen_evm_verifier, dry_run_verifier

        t0 = time.time()
        bytecode = gen_evm_verifier(pk.vk, srs, [len(outputs)])
        gas = dry_run_verifier(bytecode, [outputs], proof)
        print(f"[{tag}] evm verifier: {len(bytecode)} bytes deploy, "
              f"{gas} gas ({time.time()-t0:.1f}s)", file=sys.stderr)
        phase(f"{tag}_evm_deploy_bytes", len(bytecode))
        phase(f"{tag}_evm_gas", int(gas))
    except Exception as e:  # noqa: BLE001 — record the blocker, keep the line
        print(f"[{tag}] evm verifier failed: {e}", file=sys.stderr)
        phase(f"{tag}_evm_error", str(e)[:200])


_CHIP_WEDGED = False


def _chip_healthy() -> bool:
    """Run a tiny compute op in a time-boxed subprocess. Killing a process
    mid-device-op can wedge the axon worker for many minutes (observed: a
    stale pool claim takes ~30 min to clear); after any stage timeout this
    gate decides whether later TPU stages would just block forever."""
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jnp.ones((8,8)).sum(); print('ok')"],
            capture_output=True, timeout=120, text=True)
        return "ok" in res.stdout
    except subprocess.TimeoutExpired:
        return False


def _run_stage(argv_flag: str, timeout_s: float) -> dict:
    """Run one bench stage in a time-boxed subprocess; return the merged
    key/value updates from the LAST parseable JSON line it printed (children
    print cumulative partials, so the last line carries everything)."""
    global _CHIP_WEDGED
    import subprocess

    if _CHIP_WEDGED:
        # wedges CLEAR on their own (stale pool claim, ~30-60 min); if this
        # stage's box leaves room, wait out a slice of it and re-probe
        # instead of writing the stage off immediately.
        if timeout_s > 900 and _chip_healthy():
            print("chip recovered; resuming TPU stages", file=sys.stderr)
            _CHIP_WEDGED = False
        elif timeout_s > 1500:
            print("chip wedged; waiting 600s then re-probing", file=sys.stderr)
            time.sleep(600)
            timeout_s -= 600
            if _chip_healthy():
                print("chip recovered; resuming TPU stages", file=sys.stderr)
                _CHIP_WEDGED = False
        if _CHIP_WEDGED:
            print(f"chip wedged; skipping {argv_flag}", file=sys.stderr)
            return {"skipped": argv_flag}
    if timeout_s < 60:
        print(f"budget too low ({timeout_s:.0f}s); skipping {argv_flag}",
              file=sys.stderr)
        return {"skipped": argv_flag}
    print(f"--- stage {argv_flag} (timebox {timeout_s:.0f}s)", file=sys.stderr)
    env = dict(os.environ, ZEROG_STAGE_BOX=str(int(timeout_s)))
    with tempfile.NamedTemporaryFile("w+", suffix=".out") as out:
        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), argv_flag],
                stdout=out, stderr=sys.stderr, timeout=timeout_s, text=True,
                env=env)
        except subprocess.TimeoutExpired:
            print(f"stage {argv_flag} exceeded {timeout_s:.0f}s; salvaging "
                  "partial results", file=sys.stderr)
            if not os.environ.get("ZEROG_BENCH_FORCE_CPU") and not _chip_healthy():
                print("chip unhealthy after stage kill; later TPU stages "
                      "will be skipped", file=sys.stderr)
                _CHIP_WEDGED = True
        except Exception as e:  # noqa: BLE001
            print(f"stage {argv_flag} failed: {e}", file=sys.stderr)
        out.seek(0)
        updates = {}
        for line in out.read().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    updates = json.loads(line)
                except json.JSONDecodeError:
                    pass
        return updates


def main():
    t_start = time.time()
    total_budget = int(os.environ.get("ZEROG_BENCH_BUDGET", "2400"))

    def remaining():
        return total_budget - (time.time() - t_start)

    backend = _ensure_backend()
    emit(backend=backend, status="probed")

    if backend == "cpu-fallback" or os.environ.get("ZEROG_BENCH_FAST"):
        updates = _run_stage("--msm-only", min(900, remaining() * 0.5))
        emit(status="msm done" if "value" in updates else "msm failed",
             **updates)
        emit(status="done (fast mode)" if backend != "cpu-fallback"
             else "done (cpu fallback)")
        return

    # Stage order (the r4 lesson — BENCH_r04 recorded ZERO proof numbers
    # because the MSM stage's cold Pallas compile ate the budget): the
    # BASELINE-named PROOF pipelines run FIRST, most important first, each
    # printing cumulative partial JSON per phase so a timeout still lands
    # everything measured. The MSM/NTT microbenches follow (the MSM stage
    # falls back to the compile-light segscan strategy if its box is tight),
    # then the remaining pipelines (medium, the synthetic k=17 large).
    # caps sized for a fully-cold machine (srs ~40s + keygen ~420s + first
    # prove ~600s at k=14); under the driver's default 2400s budget the
    # 0.4x-remaining term binds instead, and warm caches make that enough
    updates = _run_stage("--proof-only=tiny", min(1800, remaining() * 0.40))
    emit(status="tiny pipeline done", **updates)
    updates = _run_stage("--proof-only=small", min(1800, remaining() * 0.45))
    emit(status="small pipeline done", **updates)

    updates = _run_stage("--msm-only", min(900, remaining() * 0.45))
    if "value" in updates:
        emit(status="msm done", **updates)
    else:
        emit(status="msm failed/timed out", **updates)

    updates = _run_stage("--ntt-only", min(420, remaining() * 0.35))
    emit(status="ntt done", **updates)

    for i, tag in enumerate(["medium", "large"]):
        box = remaining() - 120 * (1 - i)   # leave room for the next stage
        updates = _run_stage(f"--proof-only={tag}", min(1800, box))
        emit(status=f"{tag} pipeline done", **updates)
    emit(status="done")


if __name__ == "__main__":
    args = sys.argv[1:]
    if any(a.startswith("--proof-only") for a in args):
        tag = [a.split("=", 1)[1] if "=" in a else "tiny"
               for a in args if a.startswith("--proof-only")][0]
        _ensure_backend()
        bench_proof_pipeline(tag)
    elif "--msm-only" in args:
        backend = _ensure_backend()
        pps, extra = bench_msm(cpu_fallback=backend == "cpu-fallback")
        extra["value"] = round(pps, 1)
        extra["backend"] = backend
        print(json.dumps(extra), flush=True)
    elif "--ntt-only" in args:
        _ensure_backend()
        print(json.dumps({"ntt_butterflies_per_s": round(bench_ntt(), 1)}),
              flush=True)
    else:
        main()
