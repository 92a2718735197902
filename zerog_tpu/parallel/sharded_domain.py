"""Mesh evaluation domain: Domain's four big device NTTs routed through the
four-step all_to_all decomposition (`sharded_ntt.FourStepNtt`).

`create_proof(..., mesh=...)` swaps its Domain for this wrapper so that the
lagrange->coeff, coeff->extended-coset, extended->coeff and coeff->lagrange
transforms of the quotient phase run sharded over the mesh (SURVEY.md §2b
"NTT sharding — butterfly stages with all_to_all exchange"); the pointwise
steps (zeta coset scaling, vanishing division) and host algebra delegate to
the wrapped Domain. All arithmetic is exact, so proofs stay byte-identical
to the single-chip path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import FR, jfr, to_limbs
from ..poly.domain import Domain, batched_transform
from .sharded_ntt import FourStepNtt

__all__ = ["ShardedDomain"]


class ShardedDomain:
    def __init__(self, domain: Domain, mesh):
        self._domain = domain
        self.mesh = mesh
        d = mesh.devices.size
        log_d = max(1, (d - 1).bit_length())
        self._f = jfr()
        self._mul = jax.jit(self._f.mul)

        def mk(log_n, omega):
            # both n1 (shard axis) and n2 (all_to_all split axis) must be
            # divisible by the mesh size
            if log_n < 2 * log_d:
                return None  # domain smaller than mesh^2: keep local NTTs
            log_n1 = max(log_d, log_n // 2)
            return FourStepNtt(log_n, log_n1=log_n1, omega=omega)

        self._base_fwd = mk(domain.k, domain.omega)
        self._base_inv = mk(domain.k, domain.omega_inv)
        self._ext_fwd = mk(domain.extended_k, domain.extended_omega)
        self._ext_inv = mk(domain.extended_k, domain.extended_omega_inv)
        self._n_inv = jnp.asarray(to_limbs(FR.inv(domain.n), FR, mont=True))
        self._ext_n_inv = jnp.asarray(
            to_limbs(FR.inv(domain.extended_n), FR, mont=True))

    def __getattr__(self, name):
        return getattr(self._domain, name)

    # ---- device transforms (mesh four-step) ------------------------------
    # Batched entry points are shape-normalized (poly.domain.batched_transform)
    # so the shard_map programs compile once per (transform, domain), exactly
    # like the single-chip path.
    def lagrange_to_coeff(self, values):
        if self._base_inv is None:
            return self._domain.lagrange_to_coeff(values)

        def run(v):
            out = self._base_inv.ntt_sharded(self.mesh, v)
            return self._mul(out, self._n_inv)

        return batched_transform(run, values)

    def coeff_to_lagrange(self, coeffs):
        if self._base_fwd is None:
            return self._domain.coeff_to_lagrange(coeffs)
        return batched_transform(
            lambda v: self._base_fwd.ntt_sharded(self.mesh, v), coeffs)

    def coeff_to_extended(self, coeffs):
        if self._ext_fwd is None:
            return self._domain.coeff_to_extended(coeffs)
        dom = self._domain

        def run(c):
            pad = dom.extended_n - c.shape[-2]
            if pad:
                pad_block = jnp.zeros(c.shape[:-2] + (pad, 16), jnp.uint32)
                c = jnp.concatenate([c, pad_block], axis=-2)
            scaled = self._mul(c, jnp.asarray(dom._zeta_pows))
            return self._ext_fwd.ntt_sharded(self.mesh, scaled)

        return batched_transform(run, coeffs)

    def extended_to_coeff(self, evals):
        if self._ext_inv is None:
            return self._domain.extended_to_coeff(evals)
        dom = self._domain
        coeffs = self._ext_inv.ntt_sharded(self.mesh, evals)
        coeffs = self._mul(coeffs, self._ext_n_inv)
        return self._mul(coeffs, jnp.asarray(dom._zeta_inv_pows))
