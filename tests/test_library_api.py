"""Using zerog_tpu as a library: rebuild a WNN-style circuit from public API
items only — counterpart of reference tests/using_zero_g_as_a_library.rs
("it just has to compile"; here: configure + synthesize must run)."""

import numpy as np

from zerog_tpu.plonk import ConstraintSystem, Assignment, MockProver
from zerog_tpu.gadgets import (
    BloomFilterChip, BloomFilterConfig, RangeCheckChip, EncodeImageChip,
    HashChip, HashFunctionConfig, ResponseAccumulatorChip, Bits2NumChip,
    WnnCircuitParams,
)


class MyCircuit:
    """A library user's custom circuit embedding the WNN chips."""

    PARAMS = WnnCircuitParams(p=2097143, l=20, n_hashes=2, bits_per_hash=10,
                              bits_per_filter=12, n_classes=2)

    def configure(self, cs: ConstraintSystem):
        params = self.PARAMS
        instance = cs.instance_column()
        advice = [cs.advice_column() for _ in range(6)]
        for col in advice:
            cs.enable_equality(col)
        cs.enable_equality(instance)
        constants = cs.fixed_column()
        cs.enable_constant(constants)
        bloom = BloomFilterChip.configure(
            cs, advice, BloomFilterConfig(params.n_hashes, params.bits_per_hash))
        rc = RangeCheckChip.configure(cs, advice[5], bloom.bit_selector.byte_table)
        encode = EncodeImageChip.configure(cs, advice[0], advice[1], advice[2],
                                           advice[3], rc)
        hcfg = HashChip.configure(
            cs, advice[0], advice[1], advice[2], advice[3], advice[4], rc,
            HashFunctionConfig(p=params.p, l=params.l, n_bits=params.bits_per_filter))
        acc = ResponseAccumulatorChip.configure(cs, advice[:5])
        b2n = Bits2NumChip.configure(cs, advice[3], advice[4])
        return dict(instance=instance, bloom=bloom, rc=rc, encode=encode,
                    hash=hcfg, acc=acc, b2n=b2n)

    def synthesize(self, config, asn: Assignment):
        # minimal: load tables and hash one packed input
        bloom_chip = BloomFilterChip(config["bloom"], np.zeros((4, 1024), bool))
        bloom_chip.load(asn)
        h = HashChip(config["hash"])
        row = asn.region([config["hash"].input], 1)
        (cell,) = asn.assign_advice(config["hash"].input, row, 1234)
        h_cell, h_val = h.hash(asn, cell, 1234)
        b_cell, b_val = bloom_chip.bloom_lookup(asn, h_cell, h_val, 2)
        asn.constrain_instance(b_cell, config["instance"], 0)


def test_library_circuit_runs():
    prover = MockProver.run(MyCircuit(), [[0]], k=13)
    prover.assert_satisfied()
