"""Selector compression (halo2 `compress_selectors`; SURVEY.md:130,
plonk/selectors.py): packing disjoint boolean selectors into combined fixed
columns must shrink the vk and keep proofs verifying; lookup (complex)
selectors must stay plain columns."""

import numpy as np
import pytest

from conftest import reference_path
from zerog_tpu.field import FR
from zerog_tpu.plonk import (
    Assignment, ConstraintSystem, MockProver, create_proof, keygen,
    verify_proof,
)
from zerog_tpu.plonk.selectors import (
    SelectorCompression, apply_layout_to_cs, apply_to_fixed,
    compress_selectors_pass,
)

K = 6


class ThreeGateCircuit:
    """Three simple selectors on disjoint rows (compressible into one
    column) plus a lookup selector (must stay a plain column)."""

    def __init__(self, x=3):
        self.x = x

    def configure(self, cs: ConstraintSystem):
        a = cs.advice_column()
        b = cs.advice_column()
        s_sq = cs.selector()     # a^2 = b
        s_cube = cs.selector()   # a^3 = b
        s_add = cs.selector()    # a + 7 = b
        q_look = cs.complex_selector()
        table = cs.lookup_table_column()
        instance = cs.instance_column()
        cs.enable_equality(b)
        cs.enable_equality(instance)
        cs.create_gate("sq", [s_sq.expr() * (a.cur() * a.cur() - b.cur())])
        cs.create_gate("cube", [
            s_cube.expr() * (a.cur() * a.cur() * a.cur() - b.cur())])
        cs.create_gate("add7", [s_add.expr() * (a.cur() + 7 - b.cur())])
        cs.lookup("a_nib", [(q_look.expr() * a.cur(), table)])
        return dict(a=a, b=b, s_sq=s_sq, s_cube=s_cube, s_add=s_add,
                    q_look=q_look, table=table, instance=instance)

    def synthesize(self, cfg, asn: Assignment):
        asn.assign_table([cfg["table"]], [list(range(16))])
        x = self.x
        rows = [
            (cfg["s_sq"], x, x * x % FR.p),
            (cfg["s_cube"], x, pow(x, 3, FR.p)),
            (cfg["s_add"], x, x + 7),
        ]
        cells = []
        for sel, av, bv in rows:
            r = asn.region([cfg["a"], cfg["b"], cfg["s_sq"], cfg["s_cube"],
                            cfg["s_add"], cfg["q_look"]], 1)
            asn.assign_advice(cfg["a"], r, av)
            (cb,) = asn.assign_advice(cfg["b"], r, bv)
            asn.enable_selector(sel, r)
            asn.enable_selector(cfg["q_look"], r)
            cells.append(cb)
        for i, cell in enumerate(cells):
            asn.constrain_instance(cell, cfg["instance"], i)

    def instance(self):
        x = self.x
        return [x * x % FR.p, pow(x, 3, FR.p), x + 7]


def _uncompressed(circuit, n=1 << K):
    cs = ConstraintSystem()
    cfg = circuit.configure(cs)
    asn = Assignment(cs, n)
    circuit.synthesize(cfg, asn)
    asn.finalize_tables()
    return cs, asn


def test_layout_choice():
    circuit = ThreeGateCircuit()
    cs, asn = _uncompressed(circuit)
    n_fixed_before = cs.num_fixed
    deg_before = cs.degree()
    compress_selectors_pass(cs, asn)
    info = cs.compression
    assert isinstance(info, SelectorCompression)
    # the three simple selectors sit on disjoint rows -> at most 2 combined
    # columns (degree cap limits combo size), never 3 plain ones
    assert cs.num_fixed < n_fixed_before
    assert len(asn.fixed) == cs.num_fixed
    assert cs.degree() <= deg_before  # compression must not raise the degree
    combined = {c for combo in info.combos for c in combo}
    assert len(combined) >= 2  # at least two selectors actually combined
    # the lookup selector's original column must NOT be combined: its query
    # still appears as a plain FixedQuery in the lookup input expression
    from zerog_tpu.plonk.expression import collect_queries

    lk_cols = set()
    for _, pairs in cs.lookups:
        for inp, tab in pairs:
            for kind, col, _ in collect_queries(inp) | collect_queries(tab):
                if kind == "fixed":
                    lk_cols.add(col)
    assert all(col < len(info.keep) for col in lk_cols)


def test_combined_column_values():
    circuit = ThreeGateCircuit()
    cs, asn = _uncompressed(circuit)
    fixed_before = [col.copy() for col in asn.fixed]
    compress_selectors_pass(cs, asn)
    info = cs.compression
    # prover-side transform reproduces the keygen assignment exactly
    redo = apply_to_fixed(info, fixed_before, asn.n)
    assert len(redo) == len(asn.fixed)
    for a, b in zip(redo, asn.fixed):
        assert list(a) == list(b)
    # combined column holds value q+1 exactly on selector q's rows
    for j, combo in enumerate(info.combos):
        col = asn.fixed[len(info.keep) + j]
        for q, orig in enumerate(combo):
            rows = np.nonzero(np.asarray([int(v) for v in fixed_before[orig]]))[0]
            assert all(int(col[r]) == q + 1 for r in rows)


def test_prove_verify_with_compression(k6_setup_cache):
    """End-to-end: compressed keys prove + verify; vk has fewer fixed
    commitments than uncompressed keygen."""
    srs = k6_setup_cache
    circuit = ThreeGateCircuit()
    pk_plain = keygen(ThreeGateCircuit(), K, srs, compress_selectors=False)
    pk = keygen(ThreeGateCircuit(), K, srs)
    saved = len(pk_plain.vk.fixed_commitments) - len(pk.vk.fixed_commitments)
    assert saved >= 1
    proof = create_proof(pk, srs, circuit, [circuit.instance()],
                         rng_seed=b"sel-comp")
    assert verify_proof(pk.vk, srs, [circuit.instance()], proof)
    # tampered instance must fail (verify_proof raises on a bad pairing)
    bad = list(circuit.instance())
    bad[0] = (bad[0] + 1) % FR.p
    with pytest.raises(ValueError):
        verify_proof(pk.vk, srs, [bad], proof)


def test_mock_prover_unaffected():
    circuit = ThreeGateCircuit()
    MockProver.run(circuit, [circuit.instance()], k=K).assert_satisfied()


@pytest.fixture(scope="module")
def k6_setup_cache():
    from zerog_tpu.curve import Srs

    return Srs.setup(K, seed=b"sel-comp-srs")
