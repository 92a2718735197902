"""zerog_tpu — a TPU-native Halo2-style (PLONKish + KZG/BN254) proving framework
for BTHOWeN weightless-neural-network proof-of-inference.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust
reference `zkp-gravity/0g-halo2` (`zero_g`): see SURVEY.md at the repo root for
the component map. The compute hot paths (MSM, NTT, quotient evaluation) run
on TPU; sequential bookkeeping (transcripts, layout, sorting) stays on host.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache: the limb-arithmetic graphs are large
    and recompiling them per process would dominate wall time."""
    if _os.environ.get("ZEROG_NO_COMPILE_CACHE"):
        return
    import hashlib

    import jax

    # CPU-backend runs (tests, the driver's virtual-device dryrun) key the
    # cache by host CPU fingerprint: XLA:CPU AOT artifacts embed machine
    # features and loading them on a different host can SIGILL/segfault.
    # TPU executables are serialized device programs — host-independent — so
    # they share ONE directory; fingerprint-splitting them cost the r4 driver
    # run a 786 s Pallas recompile on a different build machine.
    env_plat = _os.environ.get("JAX_PLATFORMS", "")
    cpu_run = env_plat.strip().lower() == "cpu" or (
        "host_platform_device_count" in _os.environ.get("XLA_FLAGS", ""))
    if cpu_run:
        try:
            with open("/proc/cpuinfo") as f:
                info = [l for l in f if l.startswith(("model name", "flags"))]
            fp = hashlib.blake2b("".join(info[:2]).encode(),
                                 digest_size=6).hexdigest()
        except OSError:
            fp = "generic"
        suffix = f"cpu_{fp}"
    else:
        suffix = "tpu"
    cache_dir = _os.environ.get(
        "ZEROG_COMPILE_CACHE",
        _os.path.expanduser(f"~/.cache/zerog_tpu_jax_{suffix}"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # XLA-level AOT/autotune sub-caches embed machine features and can
        # SIGILL when the sandbox migrates hosts; cache only JAX executables.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


_enable_compile_cache()
