"""WNN inference parity tests against the reference's pinned snapshots
(reference: tests/integration_test.rs:14-71, BASELINE.md)."""

import jax
import numpy as np
import pytest

from conftest import reference_path
from zerog_tpu.models import load_wnn, load_grayscale_image

TEST_IMG = reference_path("benches/example_image_7.png")

SNAPSHOTS = {
    "models/model_28input_256entry_1hash_1bpi.hdf5": [9, 6, 13, 10, 17, 10, 9, 26, 11, 16],
    "models/model_28input_1024entry_2hash_2bpi.hdf5": [17, 13, 25, 27, 29, 21, 15, 55, 27, 32],
    "models/model_28input_2048entry_2hash_3bpi.hdf5": [29, 21, 40, 47, 45, 41, 28, 82, 35, 66],
}


def _models():
    return [m for m in SNAPSHOTS if reference_path(m).exists()]


@pytest.mark.parametrize("model_rel", _models())
def test_predict_exact_snapshot(model_rel):
    wnn = load_wnn(reference_path(model_rel))
    img = load_grayscale_image(TEST_IMG)
    scores = wnn.predict(img)
    assert list(scores) == SNAPSHOTS[model_rel]


@pytest.mark.parametrize("model_rel", _models())
def test_predict_jax_matches(model_rel):
    wnn = load_wnn(reference_path(model_rel))
    img = load_grayscale_image(TEST_IMG)
    fwd = jax.jit(wnn.predict_fn())
    scores = np.asarray(fwd(img))
    assert list(scores) == SNAPSHOTS[model_rel]


def test_hash_semantics():
    wnn = load_wnn(reference_path(_models()[0]))
    # MishMash worked example from the reference circuit test
    # (reference: src/gadgets/wnn.rs:449-455): p=2097143, l=20
    assert (2237 ** 3) % 2097143 % (1 << 20) == 825286
    assert (3788 ** 3) % 2097143 % (1 << 20) == 47598
    # model-level hash agrees with the generic formula
    e, h = wnn.num_filter_entries, wnn.num_filter_hashes
    assert wnn.mish_mash_hash(12345) == (12345 ** 3) % wnn.p % (e ** h)


def test_compute_accuracy_cli(tmp_path, capsys):
    """Exercises the compute-accuracy CLI end to end (reference
    src/main.rs:186-214). The full MNIST test set is unavailable in this
    environment (no network egress, no local copy — the documented
    83.06/92.81/93.95/95.10% figures from models/readme.md are therefore
    not reproducible here), so the directory holds the one checked-in image:
    example_image_7.png is class 7 and MNIST-Tiny predicts 7, so accuracy
    must be exactly 1.0; a wrongly-labeled copy must drop it to 0.5."""
    import shutil

    from zerog_tpu.cli import main

    src = reference_path("benches/example_image_7.png")
    shutil.copy(src, tmp_path / "0000_7.png")
    model = str(reference_path(
        "models/model_28input_256entry_1hash_1bpi.hdf5"))
    main(["compute-accuracy", model, str(tmp_path)])
    out = capsys.readouterr().out
    assert "Accuracy: 1/1 = 1.0000" in out

    shutil.copy(src, tmp_path / "0001_3.png")  # mislabeled on purpose
    main(["compute-accuracy", model, str(tmp_path)])
    out = capsys.readouterr().out
    assert "Accuracy: 1/2 = 0.5000" in out
