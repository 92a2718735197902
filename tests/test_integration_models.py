"""Real-model integration tests: mock-prove every checked-in MNIST model at
its registered k (the reference does exactly this for all four models —
reference: tests/integration_test.rs:6-62; registry src/lib.rs:44-52).

MockProver is host-side whole-column numpy (no XLA compile cost), so these
run in the DEFAULT suite (~1 s per model measured). MNIST-Large is absent:
its HDF5 is a stripped placeholder blob in the reference checkout
(`/root/reference/.MISSING_LARGE_BLOBS`); the synthetic-shape k=17 rehearsal
in test_large_rehearsal.py covers that circuit geometry instead.
"""

import numpy as np
import pytest

from conftest import reference_path
from zerog_tpu.models import load_wnn, load_grayscale_image

TEST_IMG = reference_path("benches/example_image_7.png")

# (model file, registered k) — reference src/lib.rs:47-50
MODELS = [
    ("models/model_28input_256entry_1hash_1bpi.hdf5", 14),   # MNIST-Tiny
    ("models/model_28input_1024entry_2hash_2bpi.hdf5", 15),  # MNIST-Small
    ("models/model_28input_2048entry_2hash_3bpi.hdf5", 15),  # MNIST-Medium
]


def _available():
    return [(m, k) for m, k in MODELS if reference_path(m).exists()]


@pytest.mark.parametrize("model_rel,k", _available())
def test_mock_proof_real_model(model_rel, k):
    """reference tests/integration_test.rs:6-11,22-28,39-45 — mock_proof of
    the real checked-in model on the checked-in image at its registered k."""
    wnn = load_wnn(reference_path(model_rel))
    img = load_grayscale_image(TEST_IMG)
    wnn.mock_proof(img, k)  # raises on any constraint failure


def test_mock_proof_rejects_tampered_instance():
    """A wrong claimed score vector must fail constraint checking (the
    instance column is copy-constrained to the accumulated responses)."""
    from zerog_tpu.plonk.mock import MockProver

    model_rel, k = MODELS[0]
    if not reference_path(model_rel).exists():
        pytest.skip("reference models not mounted")
    wnn = load_wnn(reference_path(model_rel))
    img = load_grayscale_image(TEST_IMG)
    outputs = [int(v) for v in wnn.predict(img)]
    outputs[3] += 1  # tamper one class score
    prover = MockProver.run(wnn.get_circuit(img), [outputs], k=k)
    with pytest.raises(AssertionError):
        prover.assert_satisfied()
