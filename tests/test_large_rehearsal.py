"""MNIST-Large-scale rehearsal (k=17): the reference strips the model blob
(src/lib.rs:51 keeps only the path and k), so a synthesized model with the
exact Large shape (49-bit filter inputs, 8192-entry arrays, 4 hashes, 6 bpi,
l=52) exercises the k=17 scale: circuit construction, MockProver, and —
gated — keygen/prove sizing.
"""

import os

import numpy as np
import pytest

from zerog_tpu.models.synthetic import make_synthetic_wnn, MNIST_LARGE_SHAPE

slow = pytest.mark.skipif(
    not (os.environ.get("ZEROG_SLOW_TESTS") or os.environ.get("ZEROG_TEST_TPU")),
    reason="k=17 MockProver run takes minutes; ZEROG_SLOW_TESTS=1",
)


def test_large_shape_params():
    wnn = make_synthetic_wnn(*MNIST_LARGE_SHAPE)
    assert wnn.l == 52
    assert wnn.p == 9007199254740881          # largest prime < 2^53
    assert wnn.bloom_filters.shape == (10, 96, 8192)
    # the word-packed bloom table must fit k=17 rows
    from zerog_tpu.gadgets.bloom_filter.array_lookup import array_lookup_params

    p = array_lookup_params(4, 13)
    table_rows = 10 * 96 * (1 << p.word_index_bits)
    assert table_rows < (1 << 17)
    # inference runs and is deterministic
    img = np.zeros((28, 28), dtype=np.uint8)
    s1 = wnn.predict(img)
    s2 = wnn.predict(img)
    assert (np.asarray(s1) == np.asarray(s2)).all()


@slow
def test_large_mock_proof_k17():
    wnn = make_synthetic_wnn(*MNIST_LARGE_SHAPE)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (28, 28)).astype(np.uint8)
    wnn.mock_proof(img, 17)
