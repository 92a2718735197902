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
    import jax

    cache_dir = _os.environ.get(
        "ZEROG_COMPILE_CACHE", _os.path.expanduser("~/.cache/zerog_tpu_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()
