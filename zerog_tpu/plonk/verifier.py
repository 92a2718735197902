"""Proof verification — counterpart of `halo2_proofs::plonk::verify_proof`
with `VerifierGWC` + `SingleStrategy` (reference src/wnn.rs:265-280).

Pure host work (transcript replay, evaluation algebra, two pairings); the
instance polynomial evaluations are computed by the verifier from the public
values via the Lagrange basis (KZG flow: instances are absorbed, never
committed)."""

from __future__ import annotations

import numpy as np

from ..field import FR
from ..poly.domain import get_domain
from ..transcript import KeccakTranscriptReader
from .expression import evaluate
from .gwc import VerifierQuery, multiopen_verify
from .keygen import VerifyingKey

__all__ = ["verify_proof"]


class _EvalOps:
    """Expression evaluation at the point x, given transcript evals."""

    def __init__(self, advice_evals, fixed_evals, instance_evals,
                 advice_idx, fixed_idx, instance_idx):
        self.advice_evals = advice_evals
        self.fixed_evals = fixed_evals
        self.instance_evals = instance_evals
        self.advice_idx = advice_idx
        self.fixed_idx = fixed_idx
        self.instance_idx = instance_idx
        self.p = FR.p

    def constant(self, c):
        return c % self.p

    def fixed(self, col, rot):
        return self.fixed_evals[self.fixed_idx[(col, rot)]]

    def advice(self, col, rot):
        return self.advice_evals[self.advice_idx[(col, rot)]]

    def instance(self, col, rot):
        return self.instance_evals[self.instance_idx[(col, rot)]]

    def add(self, a, b):
        return (a + b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def scale(self, a, s):
        return a * (s % self.p) % self.p


def verify_proof(vk: VerifyingKey, srs, instances, proof: bytes,
                 transcript=None) -> bool:
    cs = vk.cs
    k = vk.k
    n = 1 << k
    p = FR.p
    domain = get_domain(k, cs.degree())
    bf = cs.blinding_factors()
    u = cs.usable_rows(n)
    tr = transcript if transcript is not None else KeccakTranscriptReader(proof)

    for col_vals in instances:
        if len(col_vals) > u:
            raise ValueError("instance too long")
    tr.common_scalar(vk.transcript_repr)
    for col_vals in instances:
        for v in col_vals:
            tr.common_scalar(int(v) % p)

    advice_coms = [tr.read_point() for _ in range(cs.num_advice)]
    theta = tr.squeeze_challenge()

    lookup_perm_coms = []
    for _ in cs.lookups:
        a_com = tr.read_point()
        s_com = tr.read_point()
        lookup_perm_coms.append((a_com, s_com))

    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()

    num_chunks = cs.num_permutation_chunks() if cs.permutation_columns else 0
    perm_z_coms = [tr.read_point() for _ in range(num_chunks)]
    lookup_z_coms = [tr.read_point() for _ in cs.lookups]

    random_com = tr.read_point()
    y = tr.squeeze_challenge()

    h_coms = [tr.read_point() for _ in range(domain.quotient_poly_degree)]
    x = tr.squeeze_challenge()

    advice_queries = cs.advice_queries()
    fixed_queries = cs.fixed_queries()
    instance_queries = cs.instance_queries()

    advice_evals = [tr.read_scalar() for _ in advice_queries]
    fixed_evals = [tr.read_scalar() for _ in fixed_queries]
    random_eval = tr.read_scalar()
    sigma_evals = [tr.read_scalar() for _ in cs.permutation_columns]
    perm_z_evals = []
    for _ in range(num_chunks):
        z_x = tr.read_scalar()
        z_xn = tr.read_scalar()
        perm_z_evals.append([z_x, z_xn, None])
    for i in range(num_chunks - 2, -1, -1):
        perm_z_evals[i][2] = tr.read_scalar()
    lookup_evals = []
    for _ in cs.lookups:
        lookup_evals.append(dict(
            z=tr.read_scalar(), z_next=tr.read_scalar(),
            a_perm=tr.read_scalar(), a_perm_prev=tr.read_scalar(),
            s_perm=tr.read_scalar(),
        ))

    # ---- instance evaluations (computed, not read) -----------------------
    instance_evals = []
    for col, rot in instance_queries:
        pt = domain.rotate_point(x, rot)
        vals = instances[col] if col < len(instances) else []
        lis = domain.l_i_range(pt, range(len(vals))) if len(vals) else {}
        acc = 0
        for i, v in enumerate(vals):
            acc = (acc + int(v) * lis[i]) % p
        instance_evals.append(acc)

    advice_idx = {q: i for i, q in enumerate(advice_queries)}
    fixed_idx = {q: i for i, q in enumerate(fixed_queries)}
    instance_idx = {q: i for i, q in enumerate(instance_queries)}
    ops = _EvalOps(advice_evals, fixed_evals, instance_evals,
                   advice_idx, fixed_idx, instance_idx)

    # lagrange helpers at x
    lis = domain.l_i_range(x, [0, u] + list(range(u + 1, n)))
    l0 = lis[0]
    l_last = lis[u]
    l_blind = sum(lis[i] for i in range(u + 1, n)) % p
    l_active = (1 - l_last - l_blind) % p

    # ---- fold constraint terms with y (same order as prover) -------------
    terms = []
    for _, polys in cs.gates:
        for poly in polys:
            terms.append(evaluate(poly, ops))

    def column_eval(col):
        if col.kind == "advice":
            return advice_evals[advice_idx[(col.index, 0)]]
        if col.kind == "fixed":
            return fixed_evals[fixed_idx[(col.index, 0)]]
        return instance_evals[instance_idx[(col.index, 0)]]

    if cs.permutation_columns:
        chunk = cs.permutation_chunk_len()
        terms.append(l0 * (1 - perm_z_evals[0][0]) % p)
        zl = perm_z_evals[-1][0]
        terms.append(l_last * (zl * zl - zl) % p)
        for i in range(1, num_chunks):
            terms.append(l0 * (perm_z_evals[i][0] - perm_z_evals[i - 1][2]) % p)
        for si, start in enumerate(range(0, len(cs.permutation_columns), chunk)):
            cols = cs.permutation_columns[start : start + chunk]
            left = perm_z_evals[si][1]
            right = perm_z_evals[si][0]
            for j, col in enumerate(cols, start=start):
                ve = column_eval(col)
                left = left * ((ve + beta * sigma_evals[j] + gamma) % p) % p
                right = right * ((ve + beta * pow(FR.delta, j, p) % p * x + gamma) % p) % p
            terms.append(l_active * (left - right) % p)

    for li, (_, pairs) in enumerate(cs.lookups):
        ev = lookup_evals[li]
        a_comp = 0
        for i_expr, _ in pairs:
            a_comp = (a_comp * theta + evaluate(i_expr, ops)) % p
        s_comp = 0
        for _, t_expr in pairs:
            s_comp = (s_comp * theta + evaluate(t_expr, ops)) % p
        terms.append(l0 * (1 - ev["z"]) % p)
        terms.append(l_last * (ev["z"] * ev["z"] - ev["z"]) % p)
        lhs = ev["z_next"] * ((ev["a_perm"] + beta) % p) % p * ((ev["s_perm"] + gamma) % p) % p
        rhs = ev["z"] * ((a_comp + beta) % p) % p * ((s_comp + gamma) % p) % p
        terms.append(l_active * (lhs - rhs) % p)
        terms.append(l0 * (ev["a_perm"] - ev["s_perm"]) % p)
        terms.append(
            l_active * ((ev["a_perm"] - ev["s_perm"]) % p) % p
            * ((ev["a_perm"] - ev["a_perm_prev"]) % p) % p
        )

    folded = 0
    for t in terms:
        folded = (folded * y + t) % p
    xn = pow(x, n, p)
    vanishing_eval = (xn - 1) % p
    h_eval = folded * pow(vanishing_eval, -1, p) % p

    # ---- multiopen queries (same order as prover) ------------------------
    queries = []
    for qi, (col, rot) in enumerate(advice_queries):
        queries.append(VerifierQuery(advice_coms[col], rot, advice_evals[qi]))
    for i in range(num_chunks):
        queries.append(VerifierQuery(perm_z_coms[i], 0, perm_z_evals[i][0]))
        queries.append(VerifierQuery(perm_z_coms[i], 1, perm_z_evals[i][1]))
    for i in range(num_chunks - 2, -1, -1):
        queries.append(VerifierQuery(perm_z_coms[i], -(bf + 1), perm_z_evals[i][2]))
    for i in range(len(cs.lookups)):
        ev = lookup_evals[i]
        a_com, s_com = lookup_perm_coms[i]
        queries.append(VerifierQuery(lookup_z_coms[i], 0, ev["z"]))
        queries.append(VerifierQuery(a_com, 0, ev["a_perm"]))
        queries.append(VerifierQuery(s_com, 0, ev["s_perm"]))
        queries.append(VerifierQuery(a_com, -1, ev["a_perm_prev"]))
        queries.append(VerifierQuery(lookup_z_coms[i], 1, ev["z_next"]))
    for qi, (col, rot) in enumerate(fixed_queries):
        queries.append(VerifierQuery(vk.fixed_commitments[col], rot, fixed_evals[qi]))
    for j in range(len(cs.permutation_columns)):
        queries.append(VerifierQuery(vk.permutation_commitments[j], 0, sigma_evals[j]))
    h_combined = [(h_coms[i], pow(xn, i, p)) for i in range(len(h_coms))]
    queries.append(VerifierQuery(h_combined, 0, h_eval))
    queries.append(VerifierQuery(random_com, 0, random_eval))

    ok = multiopen_verify(queries, x, domain, srs.g2, srs.s_g2, tr)
    if not ok:
        raise ValueError("proof verification failed: pairing check")
    if not tr.finished():
        raise ValueError("trailing bytes in proof")
    return True
