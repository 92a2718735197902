import os

# Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the sharded
# path; benches run on the real chip). Set ZEROG_TEST_TPU=1 to run tests on
# whatever real backend is available instead.
if not os.environ.get("ZEROG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon plugin force-sets jax_platforms to "axon,cpu" on import,
    # ignoring the env var — override it back via the config API.
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_path(rel: str) -> pathlib.Path:
    """Path into the read-only reference checkout (models / test image)."""
    return REFERENCE_ROOT / rel
