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

# XLA:CPU's JIT allocates a mapping per compiled code section; the default
# vm.max_map_count (65530) is exhausted by this suite's many large unrolled
# field kernels, surfacing as "LLVM compilation error: Cannot allocate
# memory" then SIGSEGV. Raise it best-effort (privileged sandboxes only).
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_000_000:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def k6_setup():
    """Shared k=6 SRS + proving key over the NibbleMulCircuit — the setup is
    compile-bound on XLA:CPU (~1 min cold), so e2e modules share one."""
    from zerog_tpu.curve import Srs
    from zerog_tpu.plonk import keygen
    from test_sharded_prover import NibbleMulCircuit

    srs = Srs.setup(6, seed=b"k6-shared")
    pk = keygen(NibbleMulCircuit(0, 0), 6, srs)
    return srs, pk


@pytest.fixture(scope="session")
def k6_proof(k6_setup):
    """Single-chip proof bytes over the shared k=6 setup under a fixed seed —
    the e2e tamper tests verify it, and the mesh prover's default-suite
    byte-identity test compares against it (proving it once amortizes the
    XLA:CPU prove across modules)."""
    from zerog_tpu.plonk import create_proof
    from test_sharded_prover import NibbleMulCircuit

    srs, pk = k6_setup
    return create_proof(pk, srs, NibbleMulCircuit(3, 5), [[15]],
                        rng_seed=b"k6-shared-proof")


def reference_path(rel: str) -> pathlib.Path:
    """Path into the read-only reference checkout (models / test image)."""
    return REFERENCE_ROOT / rel
