"""Toy-circuit tests for the constraint system + MockProver analogue."""

import pytest

from zerog_tpu.field import FR
from zerog_tpu.plonk import ConstraintSystem, Assignment, MockProver


class MulCircuit:
    """Proves knowledge of a, b with a*b = c (c public), plus a byte-range
    lookup on a and a copy constraint — exercises every constraint kind."""

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def configure(self, cs: ConstraintSystem):
        col_a = cs.advice_column()
        col_b = cs.advice_column()
        col_c = cs.advice_column()
        sel = cs.selector()
        table = cs.lookup_table_column()
        q_look = cs.selector()
        instance = cs.instance_column()
        constants = cs.fixed_column()
        cs.enable_constant(constants)
        for c in (col_a, col_b, col_c, instance):
            cs.enable_equality(c)
        cs.create_gate("mul", [sel.expr() * (col_a.cur() * col_b.cur() - col_c.cur())])
        cs.lookup("a_byte", [(q_look.expr() * col_a.cur(), table)])
        return dict(a=col_a, b=col_b, c=col_c, sel=sel, table=table,
                    q_look=q_look, instance=instance)

    def synthesize(self, cfg, asn: Assignment):
        asn.assign_table([cfg["table"]], [list(range(256))])
        row = asn.region([cfg["a"], cfg["b"], cfg["c"], cfg["sel"], cfg["q_look"]], 1)
        (ca,) = asn.assign_advice(cfg["a"], row, self.a % FR.p)
        asn.assign_advice(cfg["b"], row, self.b % FR.p)
        (cc,) = asn.assign_advice(cfg["c"], row, self.a * self.b % FR.p)
        asn.enable_selector(cfg["sel"], row)
        asn.enable_selector(cfg["q_look"], row)
        # copy: a duplicated into b-column next region, constrained equal
        row2 = asn.region([cfg["b"]], 1)
        (cb2,) = asn.assign_advice(cfg["b"], row2, self.a % FR.p)
        asn.copy(ca, cb2)
        # public: c
        asn.constrain_instance(cc, cfg["instance"], 0)
        # constant: b - not constrained, but exercise constant cells
        asn.assign_constant(cfg["c"], row2, 7)


def test_mock_satisfied():
    prover = MockProver.run(MulCircuit(3, 5), [[15]], k=9)
    prover.assert_satisfied()


def test_mock_gate_violation():
    prover = MockProver.run(MulCircuit(3, 5), [[15]], k=9)
    prover.a.advice[2][0] = 16  # corrupt c
    errs = prover.verify()
    assert any("gate 'mul'" in e for e in errs)
    assert any("copy constraint" in e for e in errs)  # instance copy now wrong


def test_mock_lookup_violation():
    prover = MockProver.run(MulCircuit(300, 1), [[300]], k=9)
    errs = prover.verify()
    assert any("lookup 'a_byte'" in e for e in errs)
    assert not any("gate" in e for e in errs)


def test_mock_bad_instance():
    prover = MockProver.run(MulCircuit(3, 5), [[16]], k=9)
    errs = prover.verify()
    assert any("copy constraint" in e for e in errs)


def test_degree_and_blinding():
    cs = ConstraintSystem()
    MulCircuit(1, 1).configure(cs)
    assert cs.degree() == 5  # lookup: active * Z * (q*a) * table
    assert cs.blinding_factors() == 5
    assert cs.usable_rows(512) == 506
