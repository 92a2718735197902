"""Evaluation domain over Fr: base domain (circuit rows) + extended coset
domain (quotient computation).

TPU counterpart of `halo2_proofs::poly::EvaluationDomain` (consumed by keygen
and create_proof; SURVEY.md §2b). The extended domain points are zeta *
omega_ext^i with zeta of order 3, so the coset power-distribution is periodic
with period 3 — a cheap masked multiply on device.

Host methods (Python ints) cover the verifier-side algebra: vanishing-poly
evaluation, Lagrange basis at an arbitrary point, barycentric interpolation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field import FR, jfr, to_limbs, batch_inv
from .ntt import NttPlan

__all__ = ["Domain"]


def _log2_ceil(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


#: fixed compiled batch width for the prover-facing transforms. The prover
#: calls lagrange_to_coeff / coeff_to_extended with half a dozen different
#: leading batch sizes (n_advice, n_fixed, n_instance, n_sigma, n_aux, ...);
#: jitting per shape recompiles the full butterfly program for each (~35 s
#: per compile on the axon TPU runtime at k=14 — the dominant cold-prove
#: cost). Padding every call to one bucket width makes the compile cost per
#: (transform, domain) constant; the padded lanes are zeros (NTT of 0 is 0)
#: and their compute is microseconds against a 35 s compile.
NTT_BATCH = 8


def batched_transform(fn, arr, bucket: int = NTT_BATCH):
    """Run `fn` (expecting [bucket, n, 16]) over `arr` ([B, n, 16] or
    [n, 16]), zero-padding the batch axis to a multiple of `bucket` so only
    ONE compiled shape per transform ever exists."""
    single = arr.ndim == 2
    if single:
        arr = arr[None]
    b = int(arr.shape[0])
    outs = []
    for i in range(0, b, bucket):
        chunk = arr[i : i + bucket]
        short = bucket - int(chunk.shape[0])
        if short:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((short,) + chunk.shape[1:], jnp.uint32)],
                axis=0)
        out = fn(chunk)
        outs.append(out[: bucket - short] if short else out)
    res = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return res[0] if single else res


class Domain:
    """n = 2^k rows; extended domain of size 2^extended_k for degree-(d) gates.

    ``degree`` is the max constraint degree d; the quotient polynomial has
    degree (d-1)*n - n, committed in (d-1) chunks of size n.
    """

    def __init__(self, k: int, degree: int):
        self.k = k
        self.n = 1 << k
        self.degree = degree
        self.quotient_poly_degree = degree - 1
        self.extended_k = k + _log2_ceil(self.quotient_poly_degree)
        self.extended_n = 1 << self.extended_k

        self.omega = FR.nth_root_of_unity(k)
        self.omega_inv = FR.inv(self.omega)
        self.extended_omega = FR.nth_root_of_unity(self.extended_k)
        self.extended_omega_inv = FR.inv(self.extended_omega)
        self.g_coset = FR.zeta            # order 3
        self.g_coset_inv = FR.mul(FR.zeta, FR.zeta)

        self.plan = NttPlan(k, self.omega)
        self.plan_ext = NttPlan(self.extended_k, self.extended_omega)

        # zeta^i (period 3) over extended length, device constant (mont limbs)
        zp = [1, self.g_coset, self.g_coset_inv]
        self._zeta_pows = to_limbs(
            [zp[i % 3] for i in range(self.extended_n)], FR, mont=True
        )
        self._zeta_inv_pows = to_limbs(
            [zp[(-i) % 3] for i in range(self.extended_n)], FR, mont=True
        )

        # 1 / Z_H(zeta * w_ext^i) with Z_H(X) = X^n - 1; periodic in i with
        # period 2^(extended_k - k).
        period = self.extended_n // self.n
        zeta_n = pow(self.g_coset, self.n, FR.p)
        w_n = pow(self.extended_omega, self.n, FR.p)
        t_vals = []
        cur = zeta_n
        for _ in range(period):
            t_vals.append((cur - 1) % FR.p)
            cur = cur * w_n % FR.p
        t_inv = batch_inv(t_vals, FR.p)
        tiled = [t_inv[i % period] for i in range(self.extended_n)]
        self._t_inv = to_limbs(tiled, FR, mont=True)
        self._c2e_jit = None
        self._e2c_jit = None
        self._divz_jit = None

    # ---- device transforms ----------------------------------------------
    # All batched entry points are shape-normalized through batched_transform
    # so each (transform, domain) pair compiles exactly once per process.
    def lagrange_to_coeff(self, values):
        return batched_transform(self.plan.intt, values)

    def coeff_to_lagrange(self, coeffs):
        return batched_transform(self.plan.ntt, coeffs)

    def _coeff_to_extended_impl(self, coeffs):
        """coeffs [..., n or extended_n, 16] -> evals of p(zeta*X) on the
        extended domain."""
        f = jfr()
        pad = self.extended_n - coeffs.shape[-2]
        if pad:
            pad_block = jnp.zeros(coeffs.shape[:-2] + (pad, 16), dtype=jnp.uint32)
            coeffs = jnp.concatenate([coeffs, pad_block], axis=-2)
        scaled = f.mul(coeffs, jnp.asarray(self._zeta_pows))
        return self.plan_ext._transform(scaled, self.plan_ext._fwd_tw)

    def _extended_to_coeff_impl(self, evals):
        f = jfr()
        coeffs = self.plan_ext._intt_impl(evals)
        return f.mul(coeffs, jnp.asarray(self._zeta_inv_pows))

    def _scale_zeta(self, coeffs):
        """Jitted pad-to-extended + zeta coset scaling (the pointwise half of
        coeff_to_extended, split out so the MXU NTT engine can follow it)."""
        if getattr(self, "_scale_zeta_jit", None) is None:
            import jax

            f = jfr()

            def impl(c):
                pad = self.extended_n - c.shape[-2]
                if pad:
                    blk = jnp.zeros(c.shape[:-2] + (pad, 16), jnp.uint32)
                    c = jnp.concatenate([c, blk], axis=-2)
                return f.mul(c, jnp.asarray(self._zeta_pows))

            self._scale_zeta_jit = jax.jit(impl)
        return self._scale_zeta_jit(coeffs)

    def coeff_to_extended(self, coeffs):
        if self.plan_ext._use_mxu():
            return batched_transform(
                lambda c: self.plan_ext.ntt(self._scale_zeta(c)), coeffs)
        if self._c2e_jit is None:
            import jax

            self._c2e_jit = jax.jit(self._coeff_to_extended_impl)
        return batched_transform(self._c2e_jit, coeffs)

    def extended_to_coeff(self, evals):
        """Inverse of coeff_to_extended; returns extended_n coefficients."""
        if self.plan_ext._use_mxu():
            if getattr(self, "_unzeta_jit", None) is None:
                import jax

                f = jfr()
                self._unzeta_jit = jax.jit(
                    lambda c: f.mul(c, jnp.asarray(self._zeta_inv_pows)))
            return self._unzeta_jit(self.plan_ext.intt(evals))
        if self._e2c_jit is None:
            import jax

            self._e2c_jit = jax.jit(self._extended_to_coeff_impl)
        return self._e2c_jit(evals)

    def divide_by_vanishing_poly(self, evals):
        """Pointwise multiply extended evals by 1/Z_H (jitted: an eager field
        mul dispatches ~10^3 primitive kernels)."""
        if self._divz_jit is None:
            import jax

            f = jfr()
            self._divz_jit = jax.jit(
                lambda e, t: f.mul(e, t))
        return self._divz_jit(evals, jnp.asarray(self._t_inv))

    def rotate_extended(self, evals, rotation: int):
        """Rotation by `rotation` base-domain steps on extended evals.

        Implemented as a two-slice concatenate with a STATIC shift, not
        jnp.roll: the roll lowering measured ~450 ms/step in fused TPU
        contexts (the same op purged from every scan via shift_fill); the
        slice form is a plain copy. Distinct rotations are few (~3 per CS),
        so the per-shift specialization cost is negligible."""
        scale = self.extended_n // self.n
        s = (rotation * scale) % self.extended_n
        if s == 0:
            return evals
        return jnp.concatenate(
            [evals[..., s:, :], evals[..., :s, :]], axis=-2)

    # ---- host algebra ----------------------------------------------------
    def omega_pow(self, i: int) -> int:
        return pow(self.omega, i % self.n, FR.p)

    def eval_vanishing(self, x: int) -> int:
        return (pow(x, self.n, FR.p) - 1) % FR.p

    def l_i_range(self, x: int, rotations) -> dict[int, int]:
        """l_{i}(x) for i in `rotations` (may be negative, mod n).

        l_i(x) = omega^i/n * (x^n - 1)/(x - omega^i).
        """
        xn1 = self.eval_vanishing(x)
        idxs = [r % self.n for r in rotations]
        denoms = [(x - pow(self.omega, i, FR.p)) % FR.p for i in idxs]
        dinv = batch_inv(denoms, FR.p)
        n_inv = FR.inv(self.n)
        out = {}
        for r, i, d in zip(rotations, idxs, dinv):
            out[r] = pow(self.omega, i, FR.p) * n_inv % FR.p * xn1 % FR.p * d % FR.p
        return out

    def rotate_point(self, x: int, rotation: int) -> int:
        if rotation >= 0:
            return x * pow(self.omega, rotation, FR.p) % FR.p
        return x * pow(self.omega_inv, -rotation, FR.p) % FR.p


@functools.cache
def get_domain(k: int, degree: int) -> Domain:
    return Domain(k, degree)
