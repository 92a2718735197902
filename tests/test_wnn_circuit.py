"""WNN circuit tests using the reference's worked toy example
(reference src/gadgets/wnn.rs:409-488): a 4x3 image, 2 thresholds/pixel,
2 classes, expected scores [1, 2]."""

import numpy as np
import pytest

from zerog_tpu.gadgets import WnnCircuit, WnnCircuitParams
from zerog_tpu.plonk import MockProver

PARAMS = WnnCircuitParams(
    p=2097143, l=20, n_hashes=2, bits_per_hash=10, bits_per_filter=12, n_classes=2
)


def make_test_circuit():
    image = np.array([[70, 100, 150], [20, 110, 200], [27, 50, 211], [200, 100, 3]],
                     dtype=np.uint8)
    thresholds = np.array(
        [
            [[50, 150], [0, 50], [200, 256]],
            [[10, 80], [100, 200], [50, 150]],
            [[0, 100], [100, 200], [0, 100]],
            [[0, 100], [100, 200], [0, 100]],
        ],
        dtype=np.uint16,
    )
    permutation = np.array(
        [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23,
         0, 1, 2, 3, 4, 5], dtype=np.int64
    )
    # filter indices 2237, 3788; hashes -> (966, 805) and (494, 46)
    bloom = np.zeros((2, 2, 1024), dtype=bool)
    bloom[0, 0, 966] = True
    bloom[0, 0, 805] = True
    bloom[0, 1, 494] = True
    bloom[1, 0, 966] = True
    bloom[1, 0, 805] = True
    bloom[1, 1, 494] = True
    bloom[1, 1, 46] = True
    return WnnCircuit(image, bloom, thresholds, permutation, PARAMS)


def test_worked_example_hashes():
    # sanity on the reference's comment math
    assert (2237 ** 3) % 2097143 % (1 << 20) == 825286
    assert 825286 % 1024 == 966 and 825286 // 1024 == 805
    assert (3788 ** 3) % 2097143 % (1 << 20) == 47598
    assert 47598 % 1024 == 494 and 47598 // 1024 == 46


def test_mock_satisfied():
    circuit = make_test_circuit()
    prover = MockProver.run(circuit, [[1, 2]], k=13)
    prover.assert_satisfied()


def test_mock_wrong_scores():
    circuit = make_test_circuit()
    prover = MockProver.run(circuit, [[1, 3]], k=13)
    errs = prover.verify()
    assert any("copy constraint" in e for e in errs)


def test_mock_tampered_witness():
    circuit = make_test_circuit()
    prover = MockProver.run(circuit, [[1, 2]], k=13)
    # flip one advice cell in the hash region: constraints must break
    asn = prover.a
    # find a row where the hash selector fires and corrupt the quotient col
    qhash_col = None
    for name, polys in asn.cs.gates:
        if name == "hash":
            break
    # corrupt first nonzero entry of advice column 1 (quotient column)
    col = asn.advice[1]
    for i in range(len(col)):
        if col[i] != 0:
            col[i] = int(col[i]) + 1
            break
    errs = prover.verify()
    assert errs
