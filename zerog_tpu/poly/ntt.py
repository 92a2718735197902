"""Radix-2 NTT over Fr for TPU.

Replaces `halo2_proofs`' ``best_fft`` (consumed inside keygen and
``create_proof``; see SURVEY.md §2b). Decimation-in-time with a bit-reversal
pre-permutation: every stage is a full-width vectorized butterfly
(one Montgomery mul + modular add/sub over the whole array), so the work maps
onto the VPU with no data-dependent control flow. Stages are unrolled at trace
time (k <= ~20).

Twiddle tables are host-precomputed per domain (Montgomery form) and closed
over as device constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field import FR, jfr, to_limbs
from ..field.params import bit_reverse

__all__ = ["NttPlan"]


class NttPlan:
    """Precomputed tables for forward/inverse NTT of size 2^log_n over Fr."""

    def __init__(self, log_n: int, omega: int | None = None):
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega if omega is not None else FR.nth_root_of_unity(log_n)
        self.omega_inv = FR.inv(self.omega)
        self.n_inv = FR.inv(self.n)
        self.bitrev = np.array(
            [bit_reverse(i, log_n) for i in range(self.n)], dtype=np.int32
        )
        self._fwd_tw = self._twiddles(self.omega)
        self._inv_tw = self._twiddles(self.omega_inv)
        self._n_inv_limbs = to_limbs(self.n_inv, FR, mont=True)
        import jax

        self._ntt_jit = jax.jit(lambda v: self._transform(v, self._fwd_tw))
        self._intt_jit = jax.jit(self._intt_impl)
        self._mxu_fwd = None
        self._mxu_inv = None

    # threshold below which the MXU engine's fixed overheads beat nothing
    MXU_MIN_LOG_N = 12

    def _mxu(self, inverse: bool):
        """Lazily built MXU (int8 DFT matmul) engine plans — the TPU hot
        path (poly/pntt.py); bit-exact vs the butterfly path. The inverse
        plan folds n^-1 into its last-level matrix."""
        from .pntt import get_pntt_plan

        if inverse:
            if self._mxu_inv is None:
                self._mxu_inv = get_pntt_plan(self.log_n, self.omega_inv,
                                              self.n_inv)
            return self._mxu_inv
        if self._mxu_fwd is None:
            self._mxu_fwd = get_pntt_plan(self.log_n, self.omega, 1)
        return self._mxu_fwd

    def _use_mxu(self) -> bool:
        from .pntt import pntt_enabled

        return self.log_n >= self.MXU_MIN_LOG_N and pntt_enabled()

    def _twiddles(self, omega: int):
        tables = []
        for s in range(self.log_n):
            m = 1 << (s + 1)
            w_m = pow(omega, self.n // m, FR.p)
            ws = []
            w = 1
            for _ in range(m // 2):
                ws.append(w)
                w = w * w_m % FR.p
            tables.append(to_limbs(ws, FR, mont=True))
        return tables

    def _transform(self, values, tables):
        """values: mont limbs [..., n, 16] -> same shape."""
        f = jfr()
        x = jnp.take(values, jnp.asarray(self.bitrev), axis=-2)
        batch = x.shape[:-2]
        for s in range(self.log_n):
            m = 1 << (s + 1)
            x = x.reshape(batch + (self.n // m, m, 16))
            lo = x[..., : m // 2, :]
            hi = x[..., m // 2 :, :]
            w = jnp.asarray(tables[s])  # [m//2, 16]
            t = f.mul(hi, w)
            x = jnp.concatenate([f.add(lo, t), f.sub(lo, t)], axis=-2)
        return x.reshape(batch + (self.n, 16))

    def _intt_impl(self, evals):
        f = jfr()
        out = self._transform(evals, self._inv_tw)
        return f.mul(out, jnp.asarray(self._n_inv_limbs))

    def ntt(self, coeffs):
        """Coefficients -> evaluations at [omega^0, omega^1, ...]."""
        if self._use_mxu():
            from .pntt import pntt_transform

            return pntt_transform(self._mxu(False), coeffs)
        return self._ntt_jit(coeffs)

    def intt(self, evals):
        """Evaluations -> coefficients."""
        if self._use_mxu():
            from .pntt import pntt_transform

            return pntt_transform(self._mxu(True), evals)
        return self._intt_jit(evals)


@functools.cache
def get_plan(log_n: int) -> NttPlan:
    return NttPlan(log_n)
