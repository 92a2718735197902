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

import functools
import hashlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, jfr, to_limbs, from_limbs
from ..poly.domain import Domain, get_domain
from ..transcript import KeccakTranscriptWriter
from .assignment import Assignment
from .cs import ConstraintSystem
from .expression import evaluate
from .gwc import ProverQuery, multiopen_prove  # noqa: F401 (host path API)
from .keygen import ProvingKey
from .lookup import compress, commit_permuted, grand_product
from .mock import _make_ops
from .permutation import grand_products

__all__ = ["Drbg", "create_proof"]


@jax.jit
def _hc_fold(h_stack, xn_limbs):
    """Horner fold of the quotient pieces: sum_i xn^i * h_i."""
    f = jfr()
    acc = h_stack[-1]
    for i in range(h_stack.shape[0] - 2, -1, -1):
        acc = f.add(f.mul(acc, xn_limbs), h_stack[i])
    return acc


def _mesh_key(mesh):
    """Hashable identity of a mesh: axis layout + concrete device set."""
    return (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))


_SHARDED_DOMAINS: dict = {}


def _sharded_domain(domain, mesh):
    key = (domain.k, domain.extended_k, _mesh_key(mesh))
    sd = _SHARDED_DOMAINS.get(key)
    if sd is None:
        from ..parallel.sharded_domain import ShardedDomain

        sd = _SHARDED_DOMAINS[key] = ShardedDomain(domain, mesh)
    return sd


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


def _count_nodes(e):
    from .expression import Sum, Product, Scaled

    if isinstance(e, (Sum, Product)):
        return 1 + _count_nodes(e.a) + _count_nodes(e.b)
    if isinstance(e, Scaled):
        return 1 + _count_nodes(e.a)
    return 1


class _EnvOps:
    """Expression ops over the env pytree, inlined (raw field ops) so whole
    term chunks trace into single jitted programs."""

    def __init__(self, env, domain):
        self.env = env
        self.domain = domain
        self.f = jfr()

    def rot(self, arr, rotation):
        if rotation == 0:
            return arr
        return self.domain.rotate_extended(arr, rotation)

    def constant(self, c):
        return jnp.asarray(to_limbs(c % FR.p, FR, mont=True))

    def fixed(self, col, rot):
        return self.rot(self.env["fix"][col], rot)

    def advice(self, col, rot):
        return self.rot(self.env["adv"][col], rot)

    def instance(self, col, rot):
        return self.rot(self.env["inst"][col], rot)

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mul(a, b)

    def scale(self, a, s):
        return self.f.mul(a, self.constant(s))

    def col(self, column):
        if column.kind == "advice":
            return self.env["adv"][column.index]
        if column.kind == "fixed":
            return self.env["fix"][column.index]
        return self.env["inst"][column.index]


class _VmPrims:
    """Shape-generic jitted primitives for the expression-VM quotient path:
    ~6 one-field-op programs reused for EVERY circuit, domain size and term,
    so quotient compile cost is circuit-independent (the traced-chunk path
    costs ~2.7 s of axon compile per field-mul traced, which at MNIST scale
    means tens of minutes of per-model compiles)."""

    def __init__(self):
        f = jfr()
        self.mul = jax.jit(f.mul)
        self.add = jax.jit(f.add)
        self.sub = jax.jit(f.sub)
        # h*y + t — the per-term fold, fused
        self.fold = jax.jit(lambda h, y, t: f.add(f.mul(h, y), t))
        self._rolls: dict[int, object] = {}

    def roll_static(self, shift: int):
        """Left-rotation by a STATIC shift as a two-slice concatenate —
        jnp.roll lowers to ~450 ms/step in fused TPU contexts (r4
        measurement, purged from every scan via shift_fill) whereas this is
        a plain copy. One tiny program per distinct rotation (~3 per CS)."""
        fn = self._rolls.get(shift)
        if fn is None:
            import jax as _jax

            def f(a, s=shift):
                return jnp.concatenate([a[..., s:, :], a[..., :s, :]],
                                       axis=-2)

            fn = self._rolls[shift] = _jax.jit(f)
        return fn


@functools.cache
def _vm_prims() -> _VmPrims:
    return _VmPrims()


class _VmEnvOps(_EnvOps):
    """_EnvOps variant dispatching every field op through the jitted VM
    primitives (op-by-op device launches instead of traced mega-programs)."""

    def __init__(self, env, domain):
        super().__init__(env, domain)
        self.prims = _vm_prims()
        self._scale = domain.extended_n // domain.n
        self._consts: dict[int, jnp.ndarray] = {}

    def rot(self, arr, rotation):
        if rotation == 0:
            return arr
        n_ext = self.domain.extended_n
        return self.prims.roll_static((rotation * self._scale) % n_ext)(arr)

    def constant(self, c):
        v = self._consts.get(c)
        if v is None:
            v = self._consts[c] = jnp.asarray(to_limbs(c % FR.p, FR, mont=True))
        return v

    def add(self, a, b):
        return self.prims.add(a, b)

    def sub(self, a, b):
        return self.prims.sub(a, b)

    def mul(self, a, b):
        return self.prims.mul(a, b)

    def scale(self, a, s):
        return self.prims.mul(a, self.constant(s))


def _quotient_mode() -> str:
    """Quotient evaluation strategy:

    - "vm" (default): dispatch each field op through ~6 shape-generic jitted
      primitives. Compile cost is circuit-INDEPENDENT (~30 s total, paid once
      per domain shape); each op is one device launch.
    - "chunk": trace whole term groups into fused jitted programs. Minimal
      launch count and HBM traffic, but compile cost scales with circuit
      size (~2.7 s per traced field-mul on the axon runtime — tens of
      minutes for the MNIST circuits, per model, per process cache miss).
    """
    return os.environ.get("ZEROG_QUOTIENT_MODE", "vm")


def _quotient_budget() -> int:
    """Per-chunk term budget for "chunk" mode (1 unit ~= one 600-HLO field
    mul). Large chunks amortize dispatch latency on TPU; XLA:CPU's LLVM
    backend aborts on jumbo fused programs, so tests/CPU use small ones."""
    if os.environ.get("ZEROG_QUOTIENT_BUDGET"):
        return int(os.environ["ZEROG_QUOTIENT_BUDGET"])
    return 80 if jax.default_backend() != "cpu" else 12


def _build_quotient_builders(cs, bf):
    """(cost, fn(ops, env) -> term array | list of terms) for every quotient
    constraint term, in exact verifier order. All field math goes through
    `ops` so the same builders serve both the traced-chunk and the VM path."""
    builders = []  # (cost_estimate, fn)

    for gname, polys in cs.gates:
        for poly in polys:
            builders.append(
                (_count_nodes(poly), lambda ops, env, poly=poly: evaluate(poly, ops))
            )

    one_limbs = to_limbs(1, FR, mont=True)

    if cs.permutation_columns:
        chunk = cs.permutation_chunk_len()
        num_sets = cs.num_permutation_chunks()

        def perm_l0(ops, env):
            one = jnp.asarray(one_limbs)
            return ops.mul(env["l0"], ops.sub(one, env["perm_z"][0]))

        builders.append((3, perm_l0))

        def perm_llast(ops, env):
            zl = env["perm_z"][num_sets - 1]
            return ops.mul(env["l_last"], ops.sub(ops.mul(zl, zl), zl))

        builders.append((3, perm_llast))

        for i in range(1, num_sets):
            def perm_chain(ops, env, i=i):
                prev = ops.rot(env["perm_z"][i - 1], -(bf + 1))
                return ops.mul(env["l0"], ops.sub(env["perm_z"][i], prev))

            builders.append((3, perm_chain))

        for si, start in enumerate(range(0, len(cs.permutation_columns), chunk)):
            cols = cs.permutation_columns[start : start + chunk]

            def perm_prod(ops, env, si=si, cols=cols, start=start):
                z = env["perm_z"][si]
                left = ops.rot(z, 1)
                right = z
                for j, col in enumerate(cols, start=start):
                    ve = ops.col(col)
                    sig = env["sigma"][j]
                    left = ops.mul(
                        left,
                        ops.add(ops.add(ve, ops.mul(env["beta"], sig)),
                                env["gamma"]))
                    right = ops.mul(
                        right,
                        ops.add(ops.add(ve, ops.mul(env["beta_delta"][j],
                                                    env["x_ext"])),
                                env["gamma"]),
                    )
                return ops.mul(env["l_active"], ops.sub(left, right))

            builders.append((4 + 4 * len(cols), perm_prod))

    for li, (lname, pairs) in enumerate(cs.lookups):
        cost = 14 + 2 * sum(_count_nodes(e) for e, _ in pairs) \
                  + 2 * sum(_count_nodes(t) for _, t in pairs)

        def lookup_terms(ops, env, li=li, pairs=pairs):
            # returns the 5 terms of this lookup, in verifier order
            one = jnp.asarray(one_limbs)
            z = env["lookup_z"][li]
            z_next = ops.rot(z, 1)
            a_perm = env["lk_aux"][2 * li]
            s_perm = env["lk_aux"][2 * li + 1]

            def fold(exprs):
                acc = None
                for e in exprs:
                    v = evaluate(e, ops)
                    if v.ndim == 1:
                        v = jnp.broadcast_to(v, a_perm.shape)
                    acc = v if acc is None else ops.add(ops.mul(acc, env["theta"]), v)
                return acc

            a_comp = fold([e for e, _ in pairs])
            s_comp = fold([t for _, t in pairs])
            t1 = ops.mul(env["l0"], ops.sub(one, z))
            t2 = ops.mul(env["l_last"], ops.sub(ops.mul(z, z), z))
            lhs = ops.mul(z_next, ops.mul(ops.add(a_perm, env["beta"]),
                                          ops.add(s_perm, env["gamma"])))
            rhs = ops.mul(z, ops.mul(ops.add(a_comp, env["beta"]),
                                     ops.add(s_comp, env["gamma"])))
            t3 = ops.mul(env["l_active"], ops.sub(lhs, rhs))
            t4 = ops.mul(env["l0"], ops.sub(a_perm, s_perm))
            a_prev = ops.rot(a_perm, -1)
            t5 = ops.mul(env["l_active"],
                         ops.mul(ops.sub(a_perm, s_perm),
                                 ops.sub(a_perm, a_prev)))
            return [t1, t2, t3, t4, t5]

        builders.append((cost, lookup_terms))

    return builders


def _build_quotient_chunk_fns(cs, domain, bf, budget: int | None = None):
    """Quotient evaluators: a list of callables (env, h) -> h, dispatched in
    order. "vm" mode returns ONE callable running op-by-op through the shared
    jitted primitives; "chunk" mode greedily packs terms into fused jitted
    programs under the compile budget. Both produce identical values (term
    order mirrors the verifier exactly)."""
    if _quotient_mode() == "vm":
        builders = _build_quotient_builders(cs, bf)

        def run_vm(env, h):
            ops = _VmEnvOps(env, domain)
            prims = ops.prims
            for _, fn in builders:
                out = fn(ops, env)
                terms = out if isinstance(out, list) else [out]
                for t in terms:
                    if t.ndim == 1:
                        t = jnp.broadcast_to(t, h.shape)
                    h = prims.fold(h, env["y"], t)
            return h

        return [run_vm]

    if budget is None:
        budget = _quotient_budget()
    builders = _build_quotient_builders(cs, bf)
    f = jfr()

    # greedy pack into chunks
    groups = []
    cur, cur_cost = [], 0
    for cost, fn in builders:
        if cur and cur_cost + cost > budget:
            groups.append(cur)
            cur, cur_cost = [], 0
        cur.append(fn)
        cur_cost += cost
    if cur:
        groups.append(cur)

    chunk_fns = []
    for group in groups:
        def chunk_fn(env, h, group=group):
            ops = _EnvOps(env, domain)
            for fn in group:
                out = fn(ops, env)
                terms = out if isinstance(out, list) else [out]
                for t in terms:
                    if t.ndim == 1:
                        t = jnp.broadcast_to(t, h.shape)
                    h = f.add(f.mul(h, env["y"]), t)
            return h

        chunk_fns.append(jax.jit(chunk_fn))
    return chunk_fns


def create_proof(pk: ProvingKey, srs, circuit, instances, rng_seed=None,
                 transcript=None, debug=None, timings=None, mesh=None):
    """instances: list of per-column public value lists. Returns proof bytes.

    `timings`: optional dict filled with per-phase wall times (the framework's
    tracing hook; SURVEY.md §5 lists the reference as having none built in).

    `mesh`: optional jax.sharding.Mesh. Commitment MSMs shard points over the
    mesh (all_gather + Jacobian fold) and the quotient evaluation row-shards
    the extended domain (XLA turns the rotation rolls into collective
    permutes). All arithmetic is exact, so the proof bytes are identical to
    the single-chip path under the same seed.
    """
    if mesh is not None:
        from ..parallel.sharded_prover import ShardedSrs

        if not isinstance(srs, ShardedSrs):
            srs = ShardedSrs(srs, mesh)
    _t0 = time.time()
    _last = [_t0]

    def _mark(name):
        now = time.time()
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + (now - _last[0])
        if os.environ.get("ZEROG_TRACE"):
            import sys

            print(f"[prover] {name}: {now - _last[0]:.1f}s", file=sys.stderr,
                  flush=True)
        _last[0] = now

    vk = pk.vk
    cs = vk.cs
    k = vk.k
    n = 1 << k
    domain = get_domain(k, cs.degree())
    if mesh is not None:
        # route the quotient phase's NTTs through the four-step all_to_all
        # decomposition (pointwise steps keep their row sharding); cached per
        # (domain, mesh) so FourStepNtt plans + shard_map programs persist
        # across proofs (the host twiddle build is O(extended_n) bigints)
        domain = _sharded_domain(domain, mesh)
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
    assert cs2.num_advice == cs.num_advice
    asn = Assignment(cs2, n)
    circuit.synthesize(config, asn)
    asn.finalize_tables()
    if cs.compression is not None:
        # re-apply the keygen-recorded selector compression to the freshly
        # synthesized fixed columns so they match vk.cs's layout
        from .selectors import apply_to_fixed

        asn.fixed = apply_to_fixed(cs.compression, asn.fixed, n)
    assert len(asn.fixed) == cs.num_fixed
    advice = asn.advice
    for col in advice:
        for i in range(usable, n):
            col[i] = rng.field()

    _mark("synthesize")
    advice_coms = srs.commit_lagrange([list(c) for c in advice])
    for com in advice_coms:
        transcript.write_point(com)

    _mark("commit_advice")
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

    _mark("lookup_permute_commit")
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
    _mark("grand_products_commit")
    random_poly = np.asarray([rng.field() for _ in range(n)], dtype=object)
    transcript.write_point(srs.commit(list(random_poly)))

    _mark("random_poly_commit")
    y = transcript.squeeze_challenge()

    # ---- phase 5: quotient on extended domain (TPU) ----------------------
    # The extended-domain environment (_Ext: l0/l_last/l_active/x_ext) and
    # the fixed/sigma column forms are witness-INDEPENDENT, so they are
    # computed once per pk and cached: on the tunneled axon device the
    # dominant cost of this phase is HOST->DEVICE transfer + per-proof NTT
    # relaunch, not the math (measured: 148 s of a 277 s warm MNIST-Medium
    # prove before this cache).
    # keyed on the mesh identity: the same pk proving on two different meshes
    # in one process must not reuse arrays sharded for the first mesh
    static_key = ("ext_static", None if mesh is None else _mesh_key(mesh))
    static = pk._cache.get(static_key)
    if static is None:
        ext = _Ext(domain, cs)
        fix_lag = _to_dev_lagrange(asn.fixed) if asn.fixed else None
        fix_ext = (domain.coeff_to_extended(domain.lagrange_to_coeff(fix_lag))
                   if asn.fixed else None)
        sigma_lag = (_to_dev_lagrange(pk.sigma_values)
                     if pk.sigma_values else None)
        sigma_ext = (
            domain.coeff_to_extended(domain.lagrange_to_coeff(sigma_lag))
            if pk.sigma_values else None)
        static = (ext, fix_lag, fix_ext, sigma_lag, sigma_ext)
        pk._cache[static_key] = static
    ext, fix_lag, fix_ext, sigma_lag, sigma_ext = static

    adv_lag = _to_dev_lagrange(advice) if advice else None
    inst_lag = _to_dev_lagrange(inst_padded) if inst_padded else None
    _mark("quotient_host_to_limbs")

    adv_coeff = domain.lagrange_to_coeff(adv_lag) if advice else None
    inst_coeff = domain.lagrange_to_coeff(inst_lag) if inst_padded else None

    adv_ext = domain.coeff_to_extended(adv_coeff) if advice else None
    inst_ext = domain.coeff_to_extended(inst_coeff) if inst_padded else None

    ops = _ExtOps(ext, adv_ext, fix_ext, inst_ext)

    jax.block_until_ready([x for x in (adv_ext, fix_ext, inst_ext)
                           if x is not None])
    _mark("quotient_ntts_adv_fix")

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
    _mark("quotient_aux_to_limbs")
    aux_coeff = domain.lagrange_to_coeff(aux_lag) if aux_lag is not None else None
    aux_ext = domain.coeff_to_extended(aux_coeff) if aux_lag is not None else None
    if aux_ext is not None:
        jax.block_until_ready(aux_ext)

    perm_z_ext = [aux_ext[i] for i in range(len(perm_zs))]
    lookup_z_ext = [aux_ext[len(perm_zs) + i] for i in range(len(lookup_zs))]
    base = len(zs_all)

    env = dict(
        adv=adv_ext, fix=fix_ext, inst=inst_ext,
        sigma=sigma_ext,
        perm_z=jnp.stack(perm_z_ext) if perm_z_ext else None,
        lookup_z=jnp.stack(lookup_z_ext) if lookup_z_ext else None,
        lk_aux=aux_ext[base:] if len(lookups) else None,  # [2*L, n_ext, 16]
        l0=ext.l0, l_last=ext.l_last, l_active=ext.l_active, x_ext=ext.x_ext,
        theta=ext.const(theta), beta=ext.const(beta), gamma=ext.const(gamma),
        y=ext.const(y),
        # beta * delta^j, per global permutation column index
        beta_delta=jnp.stack([
            ext.const(pow(FR.delta, j, p) * beta % p)
            for j in range(len(cs.permutation_columns))
        ]) if cs.permutation_columns else None,
    )

    if mesh is not None:
        # row-shard the extended domain: XLA partitions the chunk programs
        # and inserts collective permutes for the rotation rolls
        from ..parallel.mesh import shard_axis

        def _shard_rows(x):
            if (x is not None and hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[-2] == domain.extended_n):
                return jax.device_put(x, shard_axis(mesh, x.ndim - 2, x.ndim))
            return x

        env = {key: _shard_rows(val) for key, val in env.items()}

    _mark("quotient_ntts")
    chunk_key = ("quotient_chunks", None if mesh is None else _mesh_key(mesh))
    chunk_fns = pk._cache.get(chunk_key)
    if chunk_fns is None:
        chunk_fns = _build_quotient_chunk_fns(cs, domain, bf)
        pk._cache[chunk_key] = chunk_fns

    h_ext = jnp.zeros((domain.extended_n, 16), dtype=jnp.uint32)
    if mesh is not None:
        from ..parallel.mesh import shard_axis

        h_ext = jax.device_put(h_ext, shard_axis(mesh, 0, 2))
    for fn in chunk_fns:
        h_ext = fn(env, h_ext)
    jax.block_until_ready(h_ext)
    _mark("quotient_eval")
    h_ext = domain.divide_by_vanishing_poly(h_ext)
    if debug is not None:
        debug["h_ext"] = h_ext
    h_coeff_dev = domain.extended_to_coeff(h_ext)
    num_pieces = domain.quotient_poly_degree
    h_stack = h_coeff_dev[: num_pieces * n].reshape(num_pieces, n, 16)
    h_coms = srs.commit_dev(h_stack)
    for com in h_coms:
        transcript.write_point(com)

    _mark("quotient")
    x = transcript.squeeze_challenge()

    # ---- phase 6: evaluations (device barycentric) ------------------------
    # One Lagrange-form stack holds every queried polynomial; all openings
    # are batched barycentric evaluations sharing one batch inversion.
    from ..poly.eval import barycentric_eval, domain_inverses

    xn = pow(x, n, p)
    f = jfr()
    # h_combined = sum xn^i h_i, folded on device in coefficient form (one
    # jitted program — eager field ops dispatch ~10^3 kernels per op)
    xn_limbs = jnp.asarray(to_limbs(xn, FR, mont=True))
    hc_coeff = _hc_fold(h_stack, xn_limbs)
    random_coeff_dev = jnp.asarray(
        to_limbs(np.asarray(random_poly, dtype=object), FR, mont=True))
    tail_lag = domain.coeff_to_lagrange(
        jnp.stack([random_coeff_dev, hc_coeff]))

    parts = []
    base = 0

    def push(arr):
        nonlocal base
        parts.append(arr)
        b = base
        base += arr.shape[0]
        return b

    adv_base = push(adv_lag) if advice else 0
    fix_base = push(fix_lag) if asn.fixed else 0
    sigma_base = push(sigma_lag) if pk.sigma_values else 0
    aux_base = push(aux_lag) if aux_lag is not None else 0
    lk_base = aux_base + len(zs_all)
    random_row = push(tail_lag[:1])
    hc_row = push(tail_lag[1:])
    lag_stack = jnp.concatenate(parts, axis=0)

    # (row, rotation) for every transcript eval, in write order
    eval_specs = []
    for col, rot in cs.advice_queries():
        eval_specs.append((adv_base + col, rot))
    for col, rot in cs.fixed_queries():
        eval_specs.append((fix_base + col, rot))
    eval_specs.append((random_row, 0))
    for j in range(len(pk.sigma_values or [])):
        eval_specs.append((sigma_base + j, 0))
    for i in range(len(perm_zs)):
        eval_specs.append((aux_base + i, 0))
        eval_specs.append((aux_base + i, 1))
    for i in range(len(perm_zs) - 2, -1, -1):
        eval_specs.append((aux_base + i, -(bf + 1)))
    for i in range(len(lookups)):
        zrow = aux_base + len(perm_zs) + i
        arow = lk_base + 2 * i
        srow = lk_base + 2 * i + 1
        eval_specs.extend([
            (zrow, 0), (zrow, 1), (arow, 0), (arow, -1), (srow, 0),
        ])

    rot_order = []
    for _, rot in eval_specs:
        if rot not in rot_order:
            rot_order.append(rot)
    zs = [domain.rotate_point(x, rot) for rot in rot_order]
    dinv, _ = domain_inverses(domain.k, zs)
    _mark("evals_dinv")
    evals_by_point = barycentric_eval(domain.k, lag_stack, zs, dinv)
    _mark("evals_bary")
    rot_idx = {rot: i for i, rot in enumerate(rot_order)}
    eval_of = {}
    for row, rot in eval_specs:
        eval_of[(row, rot)] = evals_by_point[rot_idx[rot]][row]
        transcript.write_scalar(eval_of[(row, rot)])

    # ---- phase 7: multiopen (device Kate division) -------------------------
    from .gwc import DeviceQuery, multiopen_prove_device

    def dq(row, rot):
        return DeviceQuery(row, rot, eval_of[(row, rot)])

    # h_combined's eval is derived, not independently written
    hc_eval = 0
    queries = []
    for col, rot in cs.advice_queries():
        queries.append(dq(adv_base + col, rot))
    for i in range(len(perm_zs)):
        queries.append(dq(aux_base + i, 0))
        queries.append(dq(aux_base + i, 1))
    for i in range(len(perm_zs) - 2, -1, -1):
        queries.append(dq(aux_base + i, -(bf + 1)))
    for i in range(len(lookups)):
        zrow = aux_base + len(perm_zs) + i
        arow = lk_base + 2 * i
        srow = lk_base + 2 * i + 1
        queries.append(dq(zrow, 0))
        queries.append(dq(arow, 0))
        queries.append(dq(srow, 0))
        queries.append(dq(arow, -1))
        queries.append(dq(zrow, 1))
    for col, rot in cs.fixed_queries():
        queries.append(dq(fix_base + col, rot))
    for j in range(len(pk.sigma_values or [])):
        queries.append(dq(sigma_base + j, 0))
    hc_eval = _bary_single(domain, lag_stack[hc_row], x, dinv[rot_idx[0]])
    queries.append(DeviceQuery(hc_row, 0, hc_eval))
    queries.append(dq(random_row, 0))

    if debug is not None:
        debug["ext_helper"] = ext
        debug.update(dict(
            advice=advice, fixed=asn.fixed, inst=inst_padded, lookups=lookups,
            perm_zs=perm_zs, lookup_zs=lookup_zs, random_poly=random_poly,
            theta=theta, beta=beta, gamma=gamma, y=y, x=x,
            domain=domain, cs=cs, usable=usable, bf=bf,
            sigma_values=pk.sigma_values, lag_stack=lag_stack,
            eval_of=eval_of,
        ))

    _mark("evals")
    multiopen_prove_device(queries, lag_stack, x, domain, srs, transcript)

    _mark("multiopen")
    return transcript.finalize()


def _bary_single(domain, row, z: int, dinv_row):
    """Barycentric evaluation of one Lagrange row at z (shares the batched
    domain inverses)."""
    from ..poly.eval import barycentric_eval

    return barycentric_eval(domain.k, row[None], [z], dinv_row[None])[0][0]
