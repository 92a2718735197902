"""Per-gadget unit tests with hand-computed vectors and negative cases,
mirroring the reference's gadget test matrix:

- greater_than: reference src/gadgets/greater_than.rs:262-330 (incl. the
  negative x=256 case at :319-330)
- range_check: src/gadgets/range_check.rs:229-264 (negative at :254-264),
  plus a regression for the s>0 terminal-limb wraparound exploit
- bits2num: src/gadgets/bits2num.rs:231-265
- hash: src/gadgets/hash.rs:322-372 ((x^3 % 11) % 8 vectors)
- bloom sub-gadgets: array_lookup.rs:624-694, byte_selector.rs:476-516,
  bit_selector.rs:254-291, and_bits.rs tests
- response_accumulator, encode_image: in-module tests of those files

Each test builds a minimal ad-hoc circuit around one chip and runs the
MockProver analogue; negatives assert that verify() reports errors.
All host-side (pure Python/numpy), no device work.
"""

import numpy as np
import pytest

from zerog_tpu.field import FR
from zerog_tpu.plonk import MockProver
from zerog_tpu.gadgets.range_check import RangeCheckChip
from zerog_tpu.gadgets.greater_than import GreaterThanChip
from zerog_tpu.gadgets.bits2num import Bits2NumChip
from zerog_tpu.gadgets.hash import HashChip, HashFunctionConfig
from zerog_tpu.gadgets.encode_image import EncodeImageChip
from zerog_tpu.gadgets.response_accumulator import ResponseAccumulatorChip
from zerog_tpu.gadgets.bloom_filter.array_lookup import (
    ArrayLookupChip, array_lookup_params,
)
from zerog_tpu.gadgets.bloom_filter.byte_selector import ByteSelectorChip
from zerog_tpu.gadgets.bloom_filter.bit_selector import BitSelectorChip
from zerog_tpu.gadgets.bloom_filter.and_bits import AndBitsChip


class _Circuit:
    def __init__(self, configure, synthesize):
        self._configure, self._synthesize = configure, synthesize

    def configure(self, cs):
        return self._configure(cs)

    def synthesize(self, config, asn):
        return self._synthesize(config, asn)


def run_circuit(configure, synthesize, k=10, instance=()):
    return MockProver.run(_Circuit(configure, synthesize), list(instance), k=k)


def witness_cell(asn, col, value):
    """A free advice cell (stand-in for 'witnessed elsewhere')."""
    row = asn.region([col], 1)
    (cell,) = asn.assign_advice(col, row, int(value))
    return cell


def load_byte_table(asn, tbl):
    asn.assign_table([tbl], [list(range(256))])


def rc_configure(cs):
    advice = [cs.advice_column() for _ in range(6)]
    for a in advice:
        cs.enable_equality(a)
    const = cs.fixed_column()
    cs.enable_constant(const)
    tbl = cs.lookup_table_column()
    rc = RangeCheckChip.configure(cs, advice[5], tbl)
    return dict(advice=advice, rc=rc, tbl=tbl)


# ---------------------------------------------------------------- range_check

@pytest.mark.parametrize("value,n_bits", [
    (0, 1), (1, 1), (0, 8), (255, 8), (256, 9), (511, 9),
    (4095, 12), (65535, 16), ((1 << 21) - 1, 21),
])
def test_range_check_ok(value, n_bits):
    def synth(cfg, asn):
        chip = RangeCheckChip(cfg["rc"])
        cell = witness_cell(asn, cfg["advice"][0], value)
        chip.range_check(asn, cell, value, n_bits)
        load_byte_table(asn, cfg["tbl"])

    run_circuit(rc_configure, synth).assert_satisfied()


@pytest.mark.parametrize("value,n_bits", [
    (2, 1), (256, 8), (512, 9), (1 << 12, 12), (1 << 16, 16),
])
def test_range_check_too_big(value, n_bits):
    def synth(cfg, asn):
        chip = RangeCheckChip(cfg["rc"])
        cell = witness_cell(asn, cfg["advice"][0], value)
        chip.range_check(asn, cell, value, n_bits)
        load_byte_table(asn, cfg["tbl"])

    assert run_circuit(rc_configure, synth).verify()


def test_range_check_wraparound_exploit_regression():
    """Regression: z_w = 1/2 mod r satisfies the SHIFTED byte check alone
    ((1/2)*2^7 mod r = 64), so the terminal limb itself must also be
    byte-checked. Pre-fix this passed with zero errors."""
    half = pow(2, -1, FR.p)

    def synth(cfg, asn):
        chip = RangeCheckChip(cfg["rc"])
        cell = witness_cell(asn, cfg["advice"][0], half)
        chip.range_check(asn, cell, half, 1)
        load_byte_table(asn, cfg["tbl"])

    errs = run_circuit(rc_configure, synth).verify()
    assert any("range_check_bytes" in e for e in errs)


def test_le_constant_ok():
    def synth(cfg, asn):
        chip = RangeCheckChip(cfg["rc"])
        for v, y in [(0, 5), (5, 5), (3, 5), (508, 508), (100, 2 ** 20)]:
            cell = witness_cell(asn, cfg["advice"][0], v)
            chip.le_constant(asn, cell, v, y)
        load_byte_table(asn, cfg["tbl"])

    run_circuit(rc_configure, synth).assert_satisfied()


def test_le_constant_forged_wraparound_diff():
    """Adversarial witness: value = 7 > y = 5 fits bitlen(y) bits, with
    diff = y - value wrapping to r - 2 so the gate x + diff = y holds mod r.
    The range check on diff must reject it."""
    v, y = 7, 5
    diff = (y - v) % FR.p

    def synth(cfg, asn):
        chip = RangeCheckChip(cfg["rc"])
        rc = cfg["rc"]
        start = asn.region([rc.z, rc.q_le], 3)
        cells = asn.assign_advice(rc.z, [start, start + 1, start + 2], [v, y, diff])
        asn.copy(cells[1], asn.constant_cell(y))
        asn.enable_selector(rc.q_le, start + 1)
        chip.range_check(asn, cells[0], v, y.bit_length())
        chip.range_check(asn, cells[2], diff, y.bit_length())
        load_byte_table(asn, cfg["tbl"])

    assert run_circuit(rc_configure, synth).verify()


# ---------------------------------------------------------------- greater_than

def gt_configure(cs):
    cfg = rc_configure(cs)
    a = cfg["advice"]
    cfg["gt"] = GreaterThanChip.configure(cs, a[0], a[1], a[2], a[3], cfg["rc"])
    return cfg


@pytest.mark.parametrize("x,y,expected", [
    (0, 0, 0), (5, 5, 0), (6, 5, 1), (255, 0, 1), (0, 255, 0),
    (255, 254, 1), (254, 255, 0), (128, 127, 1),
])
def test_greater_than(x, y, expected):
    def synth(cfg, asn):
        chip = GreaterThanChip(cfg["gt"])
        _, gt_cell = chip.greater_than_witness(asn, x, y)
        got = asn.cell_value(gt_cell)
        assert got == expected
        load_byte_table(asn, cfg["tbl"])

    run_circuit(gt_configure, synth).assert_satisfied()


def test_greater_than_x_out_of_range():
    # reference negative test: x = 256 must not satisfy (greater_than.rs:319-330)
    def synth(cfg, asn):
        chip = GreaterThanChip(cfg["gt"])
        chip.greater_than_witness(asn, 256, 0)
        load_byte_table(asn, cfg["tbl"])

    assert run_circuit(gt_configure, synth).verify()


def test_greater_than_copy_variant():
    def synth(cfg, asn):
        chip = GreaterThanChip(cfg["gt"])
        x_cell, gt_cell = chip.greater_than_witness(asn, 100, 50)
        assert asn.cell_value(gt_cell) == 1
        gt2 = chip.greater_than_copy(asn, x_cell, 100, 200)
        assert asn.cell_value(gt2) == 0
        load_byte_table(asn, cfg["tbl"])

    run_circuit(gt_configure, synth).assert_satisfied()


# ------------------------------------------------------------------- bits2num

def b2n_configure(cs):
    a = [cs.advice_column() for _ in range(2)]
    for c in a:
        cs.enable_equality(c)
    const = cs.fixed_column()
    cs.enable_constant(const)
    return dict(advice=a, b2n=Bits2NumChip.configure(cs, a[0], a[1]))


@pytest.mark.parametrize("bits,expected_be,expected_le", [
    ([1, 0, 1, 1], 0b1011, 0b1101),
    ([0, 0, 0, 1], 1, 8),
    ([1, 1, 1, 1, 1, 1, 1, 1], 255, 255),
    ([0], 0, 0),
    ([1], 1, 1),
])
def test_bits2num(bits, expected_be, expected_le):
    def synth(cfg, asn):
        chip = Bits2NumChip(cfg["b2n"])
        cells = [witness_cell(asn, cfg["advice"][0], b) for b in bits]
        _, val_be = chip.convert_be(asn, cells, bits)
        assert val_be == expected_be
        cells2 = [witness_cell(asn, cfg["advice"][0], b) for b in bits]
        _, val_le = chip.convert_le(asn, cells2, bits)
        assert val_le == expected_le

    run_circuit(b2n_configure, synth).assert_satisfied()


def test_bits2num_tampered_accumulator():
    def synth(cfg, asn):
        chip = Bits2NumChip(cfg["b2n"])
        bits = [1, 0, 1]
        cells = [witness_cell(asn, cfg["advice"][0], b) for b in bits]
        chip.convert_be(asn, cells, bits)

    prover = run_circuit(b2n_configure, synth)
    # corrupt the final accumulator value
    acc_col = prover.a.advice[1]
    nz = np.nonzero(acc_col)[0]
    acc_col[nz[-1]] = int(acc_col[nz[-1]]) + 1
    assert prover.verify()


# ----------------------------------------------------------------------- hash

def hash_configure_factory(p, l, n_bits):
    def configure(cs):
        cfg = rc_configure(cs)
        a = cfg["advice"]
        cfg["hash"] = HashChip.configure(
            cs, a[0], a[1], a[2], a[3], a[4], cfg["rc"],
            HashFunctionConfig(p=p, l=l, n_bits=n_bits),
        )
        return cfg
    return configure


@pytest.mark.parametrize("x", [2, 4, 42, 255])
def test_hash_mod11_mod8(x):
    # reference vectors: (x^3 % 11) % 8 (src/gadgets/hash.rs:322-372)
    def synth(cfg, asn):
        chip = HashChip(cfg["hash"])
        cell = witness_cell(asn, cfg["advice"][0], x)
        _, h = chip.hash(asn, cell, x)
        assert h == (x ** 3 % 11) % 8
        load_byte_table(asn, cfg["tbl"])

    run_circuit(hash_configure_factory(11, 3, 8), synth).assert_satisfied()


def test_hash_mnist_small_params():
    # MNIST-Small parameters: p=2097143, l=20, 28-bit inputs
    x = 2237

    def synth(cfg, asn):
        chip = HashChip(cfg["hash"])
        cell = witness_cell(asn, cfg["advice"][0], x)
        _, h = chip.hash(asn, cell, x)
        assert h == (x ** 3 % 2097143) % (1 << 20) == 825286

    def configure(cs):
        return hash_configure_factory(2097143, 20, 28)(cs)

    def synth_with_table(cfg, asn):
        synth(cfg, asn)
        load_byte_table(asn, cfg["tbl"])

    run_circuit(configure, synth_with_table).assert_satisfied()


def test_hash_tampered_quotient():
    def synth(cfg, asn):
        chip = HashChip(cfg["hash"])
        cell = witness_cell(asn, cfg["advice"][0], 42)
        chip.hash(asn, cell, 42)
        load_byte_table(asn, cfg["tbl"])

    prover = run_circuit(hash_configure_factory(11, 3, 8), synth)
    qcol = prover.a.advice[1]
    nz = np.nonzero(qcol)[0]
    qcol[nz[0]] = int(qcol[nz[0]]) + 1
    assert prover.verify()


# --------------------------------------------------------------- array_lookup

def al_configure_factory(params):
    def configure(cs):
        a = [cs.advice_column() for _ in range(6)]
        for c in a:
            cs.enable_equality(c)
        const = cs.fixed_column()
        cs.enable_constant(const)
        cfg = ArrayLookupChip.configure(cs, a[0], a[1], a[2], a[3], a[4], params)
        return dict(advice=a, al=cfg)
    return configure


def make_bloom(n_arrays, bits_per_hash, set_bits):
    arr = np.zeros((n_arrays, 1 << bits_per_hash), dtype=bool)
    for a, b in set_bits:
        arr[a, b] = True
    return arr


def test_array_lookup_indices():
    # n_hashes=2, bits_per_hash=10: word_index_bits=5, 32-bit words,
    # byte_index in [0,4), bit_index in [0,8)
    params = array_lookup_params(2, 10)
    assert params.word_index_bits == 5
    bloom = make_bloom(2, 10, [(0, 966), (1, 494)])
    h = 494 + (966 << 10)  # LE digit order: digit0=494, digit1=966

    def synth(cfg, asn):
        chip = ArrayLookupChip(cfg["al"], bloom)
        chip.load(asn)
        cell = witness_cell(asn, cfg["advice"][5], h)
        res = chip.array_lookup(asn, cell, h, 0)
        assert len(res) == 2
        # results come back big-endian: res[0] is digit1=966, res[1] is digit0=494
        d1, d0 = 966, 494
        assert res[0]["byte_index_val"] == (d1 & 31) >> 3
        assert res[0]["bit_index_val"] == d1 & 7
        assert res[1]["byte_index_val"] == (d0 & 31) >> 3
        assert res[1]["bit_index_val"] == d0 & 7
        # word values hold the packed bloom words
        word_len = 32
        assert (res[0]["word_val"] >> (word_len - 1 - (d1 & 31))) & 1 == 1

    run_circuit(al_configure_factory(params), synth, k=11).assert_satisfied()


def test_array_lookup_tampered_word():
    params = array_lookup_params(2, 10)
    bloom = make_bloom(2, 10, [(0, 966)])
    h = 966 + (3 << 10)

    def synth(cfg, asn):
        chip = ArrayLookupChip(cfg["al"], bloom)
        chip.load(asn)
        cell = witness_cell(asn, cfg["advice"][5], h)
        chip.array_lookup(asn, cell, h, 0)

    prover = run_circuit(al_configure_factory(params), synth, k=11)
    # corrupt a looked-up word value: (bloom_index, word_index, word) no longer in table
    wcol = prover.a.advice[4]
    nz = np.nonzero(wcol)[0]
    if len(nz) == 0:  # all words zero: set one instead
        wcol[0] = 12345
    else:
        wcol[nz[0]] = int(wcol[nz[0]]) + 1
    errs = prover.verify()
    assert any("bloom_filter" in e for e in errs)


def test_array_lookup_hash_too_wide():
    # decomposition must reject a hash wider than n_hashes * bits_per_hash
    params = array_lookup_params(2, 10)
    bloom = make_bloom(2, 10, [])
    h = 1 << 20  # 21 bits

    def synth(cfg, asn):
        chip = ArrayLookupChip(cfg["al"], bloom)
        chip.load(asn)
        cell = witness_cell(asn, cfg["advice"][5], h)
        chip.array_lookup(asn, cell, h, 0)

    with pytest.raises(AssertionError):
        run_circuit(al_configure_factory(params), synth, k=11)


# -------------------------------------------------------------- byte_selector

def bs_configure(cs):
    a = [cs.advice_column() for _ in range(6)]
    for c in a:
        cs.enable_equality(c)
    const = cs.fixed_column()
    cs.enable_constant(const)
    tbl = cs.lookup_table_column()
    cfg = ByteSelectorChip.configure(cs, a[0], a[1], a[2], a[3], a[4], a[5], tbl)
    return dict(advice=a, bs=cfg, tbl=tbl)


@pytest.mark.parametrize("index", [0, 1, 2, 3])
def test_byte_selector(index):
    word = 0xDEADBEEF
    expected = [0xDE, 0xAD, 0xBE, 0xEF][index]

    def synth(cfg, asn):
        chip = ByteSelectorChip(cfg["bs"])
        w_cell = witness_cell(asn, cfg["advice"][0], word)
        i_cell = witness_cell(asn, cfg["advice"][1], index)
        _, byte = chip.select_byte(asn, w_cell, word, i_cell, index, 4)
        assert byte == expected
        load_byte_table(asn, cfg["tbl"])

    run_circuit(bs_configure, synth).assert_satisfied()


def test_byte_selector_forged_empty_selector():
    # forge: zero out the one-hot selector column ("select nothing") — the
    # selector-accumulates-to-1 gate must reject it
    def synth(cfg, asn):
        chip = ByteSelectorChip(cfg["bs"])
        w_cell = witness_cell(asn, cfg["advice"][0], 0xDEADBEEF)
        i_cell = witness_cell(asn, cfg["advice"][1], 2)
        chip.select_byte(asn, w_cell, 0xDEADBEEF, i_cell, 2, 4)
        load_byte_table(asn, cfg["tbl"])

    prover = run_circuit(bs_configure, synth)
    sel_col = prover.a.advice[3]
    sel_col[np.nonzero(sel_col)[0]] = 0
    assert prover.verify()


# --------------------------------------------------------------- bit_selector

def bit_configure(cs):
    a = [cs.advice_column() for _ in range(3)]
    for c in a:
        cs.enable_equality(c)
    const = cs.fixed_column()
    cs.enable_constant(const)
    return dict(advice=a, bit=BitSelectorChip.configure(cs, a[0], a[1], a[2]))


def test_bit_selector_all_indices():
    byte = 0b10110010

    def synth(cfg, asn):
        chip = BitSelectorChip(cfg["bit"])
        chip.load(asn)
        for index in range(8):
            b_cell = witness_cell(asn, cfg["advice"][0], byte)
            i_cell = witness_cell(asn, cfg["advice"][1], index)
            _, bit = chip.select_bit(asn, b_cell, byte, i_cell, index)
            assert bit == (byte >> (7 - index)) & 1

    run_circuit(bit_configure, synth, k=12).assert_satisfied()


def test_bit_selector_tampered_bit():
    def synth(cfg, asn):
        chip = BitSelectorChip(cfg["bit"])
        chip.load(asn)
        b_cell = witness_cell(asn, cfg["advice"][0], 0xFF)
        i_cell = witness_cell(asn, cfg["advice"][1], 3)
        chip.select_bit(asn, b_cell, 0xFF, i_cell, 3)

    prover = run_circuit(bit_configure, synth, k=12)
    # flip the selected bit: (255, 3, 0) is not a table row
    bit_col = prover.a.advice[2]
    nz = np.nonzero(bit_col)[0]
    bit_col[nz[0]] = 0
    errs = prover.verify()
    assert any("bit_lookup" in e for e in errs)


# ------------------------------------------------------------------- and_bits

def and_configure(cs):
    a = [cs.advice_column() for _ in range(2)]
    for c in a:
        cs.enable_equality(c)
    const = cs.fixed_column()
    cs.enable_constant(const)
    return dict(advice=a, andb=AndBitsChip.configure(cs, a[0], a[1]))


@pytest.mark.parametrize("bits,expected", [
    ([1, 1, 1], 1), ([1, 0, 1], 0), ([0, 0], 0), ([1], 1), ([1, 1, 1, 1], 1),
])
def test_and_bits(bits, expected):
    def synth(cfg, asn):
        chip = AndBitsChip(cfg["andb"])
        cells = [witness_cell(asn, cfg["advice"][0], b) for b in bits]
        _, val = chip.and_bits(asn, cells, bits)
        assert val == expected

    run_circuit(and_configure, synth).assert_satisfied()


def test_and_bits_tampered_result():
    def synth(cfg, asn):
        chip = AndBitsChip(cfg["andb"])
        bits = [1, 0, 1]
        cells = [witness_cell(asn, cfg["advice"][0], b) for b in bits]
        chip.and_bits(asn, cells, bits)

    prover = run_circuit(and_configure, synth)
    # claim the AND was 1 even though a bit is 0: find the row where the
    # accumulator transitions 1 -> 0 and forge the 0 into a 1
    acc_col = prover.a.advice[1]
    changed = False
    for r in range(prover.a.n - 1):
        if acc_col[r] == 1 and acc_col[r + 1] == 0:
            acc_col[r + 1] = 1
            changed = True
            break
    assert changed
    assert prover.verify()


# ------------------------------------------------------- response_accumulator

def acc_configure(cs):
    a = [cs.advice_column() for _ in range(5)]
    for c in a:
        cs.enable_equality(c)
    const = cs.fixed_column()
    cs.enable_constant(const)
    return dict(advice=a, acc=ResponseAccumulatorChip.configure(cs, a))


@pytest.mark.parametrize("values", [
    [1, 0, 1, 1], [1] * 7, [0] * 4, [1, 2, 3, 4, 5], [1], [1] * 13,
])
def test_response_accumulator(values):
    def synth(cfg, asn):
        chip = ResponseAccumulatorChip(cfg["acc"])
        cells = [witness_cell(asn, cfg["advice"][0], v) for v in values]
        _, total = chip.accumulate(asn, cells, values)
        assert total == sum(values)

    run_circuit(acc_configure, synth).assert_satisfied()


def test_response_accumulator_tampered_sum():
    values = [1, 1, 1, 1, 1]

    def synth(cfg, asn):
        chip = ResponseAccumulatorChip(cfg["acc"])
        cells = [witness_cell(asn, cfg["advice"][0], v) for v in values]
        cell, total = chip.accumulate(asn, cells, values)
        synth.final_cell = cell

    prover = run_circuit(acc_configure, synth)
    kind, col, row = synth.final_cell
    prover.a.advice[col][row] = int(prover.a.advice[col][row]) + 1
    assert prover.verify()


# --------------------------------------------------------------- encode_image

def enc_configure(cs):
    cfg = rc_configure(cs)
    a = cfg["advice"]
    cfg["enc"] = EncodeImageChip.configure(cs, a[0], a[1], a[2], a[3], cfg["rc"])
    return cfg


def test_encode_image_bits():
    image = np.array([[10, 200], [255, 0]], dtype=np.uint8)
    # thresholds per (row, col, plane); 0 => constant 1; 256 => unreachable
    thresholds = np.array(
        [[[0, 50], [100, 256]],
         [[255, 256], [1, 2]]], dtype=np.uint16)
    expected = (np.asarray(image, dtype=np.uint16)[:, :, None] >=
                thresholds).astype(int)
    expected[thresholds == 0] = 1
    expected[thresholds == 256] = 0

    def synth(cfg, asn):
        chip = EncodeImageChip(cfg["enc"], thresholds)
        cells = chip.encode_image(asn, image)
        # cells in (plane, row, col) order
        got = np.array([asn.cell_value(c) for c in cells]).reshape(2, 2, 2)
        want = expected.transpose(2, 0, 1)
        assert (got == want).all()
        load_byte_table(asn, cfg["tbl"])

    run_circuit(enc_configure, synth).assert_satisfied()


def test_encode_image_tampered_bit():
    image = np.array([[10]], dtype=np.uint8)
    thresholds = np.array([[[50]]], dtype=np.uint16)

    def synth(cfg, asn):
        chip = EncodeImageChip(cfg["enc"], thresholds)
        (cell,) = chip.encode_image(asn, image)
        synth.cell = cell
        load_byte_table(asn, cfg["tbl"])

    prover = run_circuit(enc_configure, synth)
    kind, col, row = synth.cell
    prover.a.advice[col][row] = 1 - int(prover.a.advice[col][row])
    assert prover.verify()
