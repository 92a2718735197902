"""Proof creation — the TPU counterpart of `halo2_proofs::plonk::create_proof`
(consumed at reference src/wnn.rs:242-259; phase structure in SURVEY.md §3.1).

Host/device split mirrors where the reference spends its compute (rayon inside
halo2): commitments (MSM), NTTs and the quotient evaluation run on TPU;
transcripts, sorting and telescoping products stay on host.

Phases:
  1. absorb vk digest + public instance values
  2. synthesize witness, randomize blinding rows, commit advice       [MSM]
  3. theta; lookup permuted pairs, commit                             [MSM]
  4. beta, gamma; permutation + lookup grand products, commit         [MSM]
  5. random poly commit; y
  6. quotient h on the extended coset domain                          [NTT+eval]
     split and commit pieces                                          [MSM]
  7. x; write all evaluations
  8. GWC multiopen                                                    [MSM]
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, jfr, to_limbs, from_limbs
from ..poly.domain import Domain
from ..transcript import KeccakTranscriptWriter
from .assignment import Assignment
from .cs import ConstraintSystem
from .expression import evaluate
from .gwc import ProverQuery, multiopen_prove
from .keygen import ProvingKey
from .lookup import compress, commit_permuted, grand_product
from .mock import _make_ops
from .permutation import grand_products

__all__ = ["Drbg", "create_proof"]


class Drbg:
    """Deterministic blinding RNG (blake2b counter mode). Seed None -> OS
    entropy; a fixed seed gives bit-reproducible proofs (the halo2 API is
    generic over RngCore for the same reason; see BASELINE.md)."""

    def __init__(self, seed: bytes | None = None):
        self.seed = seed if seed is not None else os.urandom(32)
        self.counter = 0

    def field(self) -> int:
        while True:
            h = hashlib.blake2b(
                self.seed + self.counter.to_bytes(8, "little"), digest_size=32
            ).digest()
            self.counter += 1
            v = int.from_bytes(h, "little")
            if v >> 254 == 0 and v % FR.p == v:
                return v


def _to_dev_lagrange(columns):
    """list of object arrays [n] -> device mont limbs [C, n, 16]."""
    arr = np.stack([to_limbs(np.asarray(c, dtype=object) % FR.p, FR, mont=True) for c in columns])
    return jnp.asarray(arr)


class _Ext:
    """Extended-domain forms of all columns + the quotient evaluator."""

    def __init__(self, domain: Domain, cs: ConstraintSystem):
        self.domain = domain
        self.cs = cs
        f = jfr()
        self.f = f
        self.mul = jax.jit(f.mul)
        self.add = jax.jit(f.add)
        self.sub = jax.jit(f.sub)
        n, n_ext = domain.n, domain.extended_n
        u = cs.usable_rows(n)
        self.u = u
        # lagrange selector polys on extended domain
        l0 = np.zeros(n, dtype=object); l0[0] = 1
        llast = np.zeros(n, dtype=object); llast[u] = 1
        lblind = np.zeros(n, dtype=object); lblind[u + 1 :] = 1
        self.l0, self.l_last, self.l_blind = (
            self.lagrange_to_ext(np.stack([to_limbs(v, FR, mont=True) for v in (l0, llast, lblind)]))
        )
        self.l_active = self.sub(self.sub(self._one_ext(), self.l_last), self.l_blind)
        # X values on the extended coset
        xs = []
        cur = domain.g_coset
        for _ in range(n_ext):
            xs.append(cur)
            cur = cur * domain.extended_omega % FR.p
        self.x_ext = jnp.asarray(to_limbs(xs, FR, mont=True))

    def _one_ext(self):
        one = to_limbs([1] * self.domain.extended_n, FR, mont=True)
        return jnp.asarray(one)

    def lagrange_to_ext(self, dev_lagrange):
        coeffs = self.domain.lagrange_to_coeff(dev_lagrange)
        return self.domain.coeff_to_extended(coeffs)

    def const(self, c: int):
        return jnp.asarray(to_limbs(c % FR.p, FR, mont=True))

    def rot(self, arr, rotation: int):
        if rotation == 0:
            return arr
        return self.domain.rotate_extended(arr, rotation)


class _ExtOps:
    """Expression evaluation ops over extended-domain device arrays."""

    def __init__(self, ext: _Ext, adv_ext, fix_ext, inst_ext):
        self.e = ext
        self.adv = adv_ext
        self.fix = fix_ext
        self.inst = inst_ext

    def constant(self, c):
        return self.e.const(c)

    def fixed(self, col, rot):
        return self.e.rot(self.fix[col], rot)

    def advice(self, col, rot):
        return self.e.rot(self.adv[col], rot)

    def instance(self, col, rot):
        return self.e.rot(self.inst[col], rot)

    def add(self, a, b):
        return self.e.add(a, b)

    def mul(self, a, b):
        return self.e.mul(a, b)

    def scale(self, a, s):
        return self.e.mul(a, self.e.const(s))


def create_proof(pk: ProvingKey, srs, circuit, instances, rng_seed=None,
                 transcript=None, debug=None):
    """instances: list of per-column public value lists. Returns proof bytes."""
    vk = pk.vk
    cs = vk.cs
    k = vk.k
    n = 1 << k
    domain = Domain(k, cs.degree())
    usable = cs.usable_rows(n)
    bf = cs.blinding_factors()
    rng = Drbg(rng_seed)
    transcript = transcript if transcript is not None else KeccakTranscriptWriter()
    p = FR.p

    # ---- phase 0: bind vk + instances ------------------------------------
    transcript.common_scalar(vk.transcript_repr)
    for col_vals in instances:
        for v in col_vals:
            transcript.common_scalar(int(v) % p)

    inst_padded = [
        np.asarray(list(col) + [0] * (n - len(col)), dtype=object) for col in instances
    ]
    while len(inst_padded) < cs.num_instance:
        inst_padded.append(np.zeros(n, dtype=object))

    # ---- phase 1: witness + advice commitments ---------------------------
    cs2 = ConstraintSystem()
    config = circuit.configure(cs2)
    assert cs2.num_advice == cs.num_advice and cs2.num_fixed == cs.num_fixed
    asn = Assignment(cs2, n)
    circuit.synthesize(config, asn)
    asn.finalize_tables()
    advice = asn.advice
    for col in advice:
        for i in range(usable, n):
            col[i] = rng.field()

    advice_coms = srs.commit_lagrange([list(c) for c in advice])
    for com in advice_coms:
        transcript.write_point(com)

    theta = transcript.squeeze_challenge()

    # ---- phase 2: lookup permuted pairs ----------------------------------
    host_ops = _make_ops(asn, inst_padded)

    def full_col(v):
        v = np.asarray(v, dtype=object)
        if v.ndim == 0:
            return np.full(n, v[()], dtype=object)
        return v

    lookups = []
    for name, pairs in cs.lookups:
        a = compress([full_col(evaluate(i, host_ops)) for i, _ in pairs], theta)
        s = compress([full_col(evaluate(t, host_ops)) for _, t in pairs], theta)
        lc = commit_permuted(a, s, usable, rng)
        lookups.append(lc)
    if lookups:
        coms = srs.commit_lagrange(
            [list(lc.permuted_input) for lc in lookups]
            + [list(lc.permuted_table) for lc in lookups]
        )
        for i, lc in enumerate(lookups):
            transcript.write_point(coms[i])                 # A'
            transcript.write_point(coms[len(lookups) + i])  # S'

    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # ---- phase 3: grand products -----------------------------------------
    def column_values(col):
        if col.kind == "advice":
            return advice[col.index]
        if col.kind == "fixed":
            return asn.fixed[col.index]
        return inst_padded[col.index]

    perm_vals = [column_values(c) for c in cs.permutation_columns]
    perm_zs = grand_products(
        perm_vals, pk.sigma_values, beta, gamma, usable, n,
        cs.permutation_chunk_len(), rng,
    )
    lookup_zs = [grand_product(lc, beta, gamma, usable, rng) for lc in lookups]

    z_coms = srs.commit_lagrange(
        [list(z) for z in perm_zs] + [list(z) for z in lookup_zs]
    ) if (perm_zs or lookup_zs) else []
    for com in z_coms[: len(perm_zs)]:
        transcript.write_point(com)
    for com in z_coms[len(perm_zs) :]:
        transcript.write_point(com)

    # ---- phase 4: vanishing random poly ----------------------------------
    random_poly = np.asarray([rng.field() for _ in range(n)], dtype=object)
    transcript.write_point(srs.commit(list(random_poly)))

    y = transcript.squeeze_challenge()

    # ---- phase 5: quotient on extended domain (TPU) ----------------------
    ext = _Ext(domain, cs)

    adv_lag = _to_dev_lagrange(advice) if advice else None
    fix_lag = _to_dev_lagrange(asn.fixed) if asn.fixed else None
    inst_lag = _to_dev_lagrange(inst_padded) if inst_padded else None

    adv_coeff = domain.lagrange_to_coeff(adv_lag) if advice else None
    fix_coeff = domain.lagrange_to_coeff(fix_lag) if asn.fixed else None
    inst_coeff = domain.lagrange_to_coeff(inst_lag) if inst_padded else None

    adv_ext = domain.coeff_to_extended(adv_coeff) if advice else None
    fix_ext = domain.coeff_to_extended(fix_coeff) if asn.fixed else None
    inst_ext = domain.coeff_to_extended(inst_coeff) if inst_padded else None

    ops = _ExtOps(ext, adv_ext, fix_ext, inst_ext)

    sigma_lag = _to_dev_lagrange(pk.sigma_values) if pk.sigma_values else None
    sigma_coeff = domain.lagrange_to_coeff(sigma_lag) if pk.sigma_values else None
    sigma_ext = domain.coeff_to_extended(sigma_coeff) if pk.sigma_values else None

    def col_ext(col):
        if col.kind == "advice":
            return adv_ext[col.index]
        if col.kind == "fixed":
            return fix_ext[col.index]
        return inst_ext[col.index]

    zs_all = list(perm_zs) + list(lookup_zs)
    lk_polys = []
    for lc in lookups:
        lk_polys.extend([lc.permuted_input, lc.permuted_table])
    aux_lag = _to_dev_lagrange(zs_all + lk_polys) if (zs_all or lk_polys) else None
    aux_coeff = domain.lagrange_to_coeff(aux_lag) if aux_lag is not None else None
    aux_ext = domain.coeff_to_extended(aux_coeff) if aux_lag is not None else None

    perm_z_ext = [aux_ext[i] for i in range(len(perm_zs))]
    lookup_z_ext = [aux_ext[len(perm_zs) + i] for i in range(len(lookup_zs))]
    base = len(zs_all)

    def _theta_fold_ext(exprs, theta_c):
        # acc = acc * theta + expr(X), evaluated via the column cosets — the
        # verifier folds expression *evals* the same way, so the quotient must
        # use the expression composition, not the interpolated value column.
        acc = None
        for e in exprs:
            v = evaluate(e, ops)
            if v.ndim == 1:
                v = jnp.broadcast_to(v, (domain.extended_n, 16))
            acc = v if acc is None else ext.add(ext.mul(acc, theta_c), v)
        return acc

    theta_c = ext.const(theta)
    lookup_aux_ext = [
        dict(
            a_perm=aux_ext[base + 2 * i],
            s_perm=aux_ext[base + 2 * i + 1],
            a_comp=_theta_fold_ext([e for e, _ in cs.lookups[i][1]], theta_c),
            s_comp=_theta_fold_ext([t for _, t in cs.lookups[i][1]], theta_c),
        )
        for i in range(len(lookups))
    ]

    # term list, order mirrored by the verifier
    beta_c = ext.const(beta)
    gamma_c = ext.const(gamma)
    one_c = ext.const(1)

    terms = []
    term_names = []
    for gname, polys in cs.gates:
        for pi, poly in enumerate(polys):
            terms.append(evaluate(poly, ops))
            term_names.append(f"gate {gname}/{pi}")

    if cs.permutation_columns:
        chunk = cs.permutation_chunk_len()
        sets = [perm_z_ext[i] for i in range(len(perm_zs))]
        # 1. l_0 (1 - z_0)
        terms.append(ext.mul(ext.l0, ext.sub(one_c, sets[0])))
        term_names.append("perm l0")
        # 2. l_last (z_l^2 - z_l)
        zl = sets[-1]
        terms.append(ext.mul(ext.l_last, ext.sub(ext.mul(zl, zl), zl)))
        term_names.append("perm l_last")
        # 3. l_0 (z_i - z_{i-1}(w^u X))
        for i in range(1, len(sets)):
            prev_rot = ext.rot(sets[i - 1], -(bf + 1))
            terms.append(ext.mul(ext.l0, ext.sub(sets[i], prev_rot)))
            term_names.append(f"perm chain {i}")
        # 4. product rule per set
        for si, start in enumerate(range(0, len(cs.permutation_columns), chunk)):
            cols = cs.permutation_columns[start : start + chunk]
            z = sets[si]
            z_next = ext.rot(z, 1)
            left = z_next
            right = z
            for j, col in enumerate(cols, start=start):
                ve = col_ext(col)
                sig = sigma_ext[j]
                left = ext.mul(left, ext.add(ext.add(ve, ext.mul(beta_c, sig)), gamma_c))
                delta_j = ext.const(pow(FR.delta, j, p) * beta % p)
                right = ext.mul(right, ext.add(ext.add(ve, ext.mul(delta_j, ext.x_ext)), gamma_c))
            terms.append(ext.mul(ext.l_active, ext.sub(left, right)))
            term_names.append(f"perm prod {si}")

    for li in range(len(lookups)):
        z = lookup_z_ext[li]
        aux = lookup_aux_ext[li]
        z_next = ext.rot(z, 1)
        a_perm, s_perm = aux["a_perm"], aux["s_perm"]
        a_comp, s_comp = aux["a_comp"], aux["s_comp"]
        # 1. l_0 (1 - z)
        terms.append(ext.mul(ext.l0, ext.sub(one_c, z)))
        term_names.append(f"lk{li} l0")
        # 2. l_last (z^2 - z)
        terms.append(ext.mul(ext.l_last, ext.sub(ext.mul(z, z), z)))
        term_names.append(f"lk{li} l_last")
        # 3. active (z' (A'+b)(S'+g) - z (A+b)(S+g))
        lhs = ext.mul(z_next, ext.mul(ext.add(a_perm, beta_c), ext.add(s_perm, gamma_c)))
        rhs = ext.mul(z, ext.mul(ext.add(a_comp, beta_c), ext.add(s_comp, gamma_c)))
        terms.append(ext.mul(ext.l_active, ext.sub(lhs, rhs)))
        term_names.append(f"lk{li} prod")
        # 4. l_0 (A' - S')
        terms.append(ext.mul(ext.l0, ext.sub(a_perm, s_perm)))
        term_names.append(f"lk{li} l0 A'S'")
        # 5. active (A'-S')(A'-A'(w^-1 X))
        a_prev = ext.rot(a_perm, -1)
        terms.append(
            ext.mul(ext.l_active, ext.mul(ext.sub(a_perm, s_perm), ext.sub(a_perm, a_prev)))
        )
        term_names.append(f"lk{li} dedup")

    y_c = ext.const(y)
    h_ext = None
    for t in terms:
        if h_ext is None:
            h_ext = t
        else:
            h_ext = ext.add(ext.mul(h_ext, y_c), t)
    h_ext = domain.divide_by_vanishing_poly(h_ext)
    h_coeff_dev = domain.extended_to_coeff(h_ext)
    h_coeff = from_limbs(np.asarray(h_coeff_dev), FR, mont=True)
    num_pieces = domain.quotient_poly_degree
    h_coeff = h_coeff[: num_pieces * n]
    h_pieces = [h_coeff[i * n : (i + 1) * n] for i in range(num_pieces)]
    h_coms = srs.commit([list(hp) for hp in h_pieces])
    for com in h_coms:
        transcript.write_point(com)

    x = transcript.squeeze_challenge()

    # ---- phase 6: evaluations --------------------------------------------
    adv_coeff_h = [from_limbs(np.asarray(adv_coeff[i]), FR, mont=True) for i in range(cs.num_advice)]
    fix_coeff_h = [from_limbs(np.asarray(fix_coeff[i]), FR, mont=True) for i in range(cs.num_fixed)]
    sigma_coeff_h = (
        [from_limbs(np.asarray(sigma_coeff[i]), FR, mont=True) for i in range(len(pk.sigma_values))]
        if pk.sigma_values else []
    )
    aux_coeff_h = (
        [from_limbs(np.asarray(aux_coeff[i]), FR, mont=True) for i in range(aux_coeff.shape[0])]
        if aux_coeff is not None else []
    )
    perm_z_coeff = aux_coeff_h[: len(perm_zs)]
    lookup_z_coeff = aux_coeff_h[len(perm_zs) : len(zs_all)]
    lk_coeffs_pairs = aux_coeff_h[len(zs_all) :]
    # [A'_i, S'_i] interleaved per lookup; keep 4-stride layout for callers
    lk_coeffs = []
    for i in range(len(lookups)):
        lk_coeffs.extend([lk_coeffs_pairs[2 * i], lk_coeffs_pairs[2 * i + 1], None, None])

    def horner(coeffs, pt):
        acc = 0
        for c in reversed(list(coeffs)):
            acc = (acc * pt + int(c)) % p
        return acc

    x_next = domain.rotate_point(x, 1)
    x_prev = domain.rotate_point(x, -1)
    x_last = domain.rotate_point(x, -(bf + 1))

    for col, rot in cs.advice_queries():
        transcript.write_scalar(horner(adv_coeff_h[col], domain.rotate_point(x, rot)))
    for col, rot in cs.fixed_queries():
        transcript.write_scalar(horner(fix_coeff_h[col], domain.rotate_point(x, rot)))
    # random poly eval
    transcript.write_scalar(horner(random_poly, x))
    # sigma evals
    for sc in sigma_coeff_h:
        transcript.write_scalar(horner(sc, x))
    # permutation z evals
    for i, zc in enumerate(perm_z_coeff):
        transcript.write_scalar(horner(zc, x))
        transcript.write_scalar(horner(zc, x_next))
    for i in range(len(perm_z_coeff) - 2, -1, -1):
        transcript.write_scalar(horner(perm_z_coeff[i], x_last))
    # lookup evals: z(x), z(x_next), A'(x), A'(x_prev), S'(x)
    for i in range(len(lookups)):
        zc = lookup_z_coeff[i]
        a_perm_c = lk_coeffs[4 * i]
        s_perm_c = lk_coeffs[4 * i + 1]
        transcript.write_scalar(horner(zc, x))
        transcript.write_scalar(horner(zc, x_next))
        transcript.write_scalar(horner(a_perm_c, x))
        transcript.write_scalar(horner(a_perm_c, x_prev))
        transcript.write_scalar(horner(s_perm_c, x))

    # ---- phase 7: multiopen ----------------------------------------------
    xn = pow(x, n, p)
    h_combined = np.zeros(n, dtype=object)
    for hp in reversed(h_pieces):
        h_combined = (h_combined * xn) % p
        h_combined[: len(hp)] = (h_combined[: len(hp)] + hp) % p

    queries = []
    for col, rot in cs.advice_queries():
        queries.append(ProverQuery(adv_coeff_h[col], rot))
    for i, zc in enumerate(perm_z_coeff):
        queries.append(ProverQuery(zc, 0))
        queries.append(ProverQuery(zc, 1))
    for i in range(len(perm_z_coeff) - 2, -1, -1):
        queries.append(ProverQuery(perm_z_coeff[i], -(bf + 1)))
    for i in range(len(lookups)):
        queries.append(ProverQuery(lookup_z_coeff[i], 0))
        queries.append(ProverQuery(lk_coeffs[4 * i], 0))       # A'
        queries.append(ProverQuery(lk_coeffs[4 * i + 1], 0))   # S'
        queries.append(ProverQuery(lk_coeffs[4 * i], -1))
        queries.append(ProverQuery(lookup_z_coeff[i], 1))
    for col, rot in cs.fixed_queries():
        queries.append(ProverQuery(fix_coeff_h[col], rot))
    for sc in sigma_coeff_h:
        queries.append(ProverQuery(sc, 0))
    queries.append(ProverQuery(h_combined, 0))
    queries.append(ProverQuery(random_poly, 0))

    if debug is not None:
        debug["terms_ext"] = terms
        debug["term_names"] = term_names
        debug["ext_helper"] = ext
        debug.update(dict(
            advice=advice, fixed=asn.fixed, inst=inst_padded, lookups=lookups,
            perm_zs=perm_zs, lookup_zs=lookup_zs, random_poly=random_poly,
            h_pieces=h_pieces, theta=theta, beta=beta, gamma=gamma, y=y, x=x,
            domain=domain, cs=cs, usable=usable, bf=bf,
            sigma_values=pk.sigma_values,
            adv_coeff_h=adv_coeff_h, fix_coeff_h=fix_coeff_h,
            sigma_coeff_h=sigma_coeff_h, perm_z_coeff=perm_z_coeff,
            lookup_z_coeff=lookup_z_coeff, lk_coeffs=lk_coeffs,
        ))

    multiopen_prove(queries, x, domain, srs, transcript)

    return transcript.finalize()
