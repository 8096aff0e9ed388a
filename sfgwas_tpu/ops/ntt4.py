"""Four-step negacyclic NTT as MXU matmuls (TPU speed-of-light path).

The butterfly NTT (ops/rns.py) is shuffle-bound on TPU (~230 us for
9x2^13).  This module reformulates the transform as two modular matrix
products, which map onto the MXU systolic array:

    X[k] = x(psi^(2k+1)) = DFT_N(x[j] * psi^j),   omega = psi^2
    N = N2 * N1 (N1 = 128 lanes), j = j1 + N1*j2, k = k2 + N2*k1:
      A[k2, j1] = sum_j2 (omega2^(j2 k2) psi^(N1 j2)) x2d[j2, j1]   (matmul 1)
      B[k2, j1] = A[k2, j1] * omega^(j1 k2) * psi^(j1)              (twiddle)
      X2d[k2, k1] = sum_j1 B[k2, j1] omega1^(j1 k1)                 (matmul 2)
      out = gather(X2d^T flattened, pi)  -- pi matches ops.rns.ntt's
            bit-reversed output order, so ntt4 is an exact drop-in.

Exact arithmetic on the MXU: operands (< 2^25) are decomposed into four
7-bit digit planes packed as int8; one batched int8 x int8 -> int32
dot_general computes all 16 digit-pair products at once (contraction
length <= 128 keeps partial sums < 2^21); planes with equal digit-weight
are summed and Barrett-folded with 2^(7s) mod q constants.

This is the TPU-native equivalent of the reference's hot NTT/Montgomery
loops (gwas/matmult.go:247-324 via lattigo's ring package).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rns

_DIG = 4  # 7-bit digit planes
_DB = 7


def _digits_np(a: np.ndarray) -> np.ndarray:
    """[...,] uint32 -> [D, ...] int8 (7-bit non-negative digits)."""
    out = np.zeros((_DIG,) + a.shape, np.int8)
    v = a.astype(np.uint32).copy()
    for d in range(_DIG):
        out[d] = (v & 0x7F).astype(np.int8)
        v >>= _DB
    return out


def _digits_jnp(a):
    return jnp.stack(
        [((a >> (_DB * d)) & 0x7F).astype(jnp.int8) for d in range(_DIG)]
    )


class Ntt4Plan:
    """Per-(basis, rows) precomputation for the four-step transform."""

    def __init__(self, basis: rns.RnsBasis, rows: Tuple[int, ...]):
        n = basis.n
        logn = basis.logn
        N1 = min(128, n)
        N2 = n // N1
        self.n, self.N1, self.N2 = n, N1, N2
        primes = [basis.primes[r] for r in rows]
        L = len(primes)

        F2 = np.zeros((L, N2, N2), np.uint32)   # includes the psi^(N1 j2) twist
        F1 = np.zeros((L, N1, N1), np.uint32)
        T = np.zeros((L, N2, N1), np.uint32)    # omega^(j1 k2) * psi^(j1)
        iF2 = np.zeros((L, N2, N2), np.uint32)  # inverse: untwist + idft + 1/N2
        iF1 = np.zeros((L, N1, N1), np.uint32)  # inverse dft + 1/N1
        iT = np.zeros((L, N2, N1), np.uint32)
        for i, q in enumerate(primes):
            psi = rns._find_psi(q, 2 * n)
            w = psi * psi % q
            w1 = pow(w, N2, q)   # N1-th root
            w2 = pow(w, N1, q)   # N2-th root
            iw, iw1, iw2 = (pow(v, -1, q) for v in (w, w1, w2))
            ipsi = pow(psi, -1, q)
            in1, in2 = pow(N1, -1, q), pow(N2, -1, q)
            j2v = np.arange(N2)
            j1v = np.arange(N1)
            pw = lambda b, e: np.array(
                [pow(b, int(x), q) for x in np.asarray(e).reshape(-1)], np.uint64
            ).reshape(np.shape(e))
            F2[i] = (
                pw(w2, np.outer(j2v, j2v)) * pw(psi, N1 * j2v)[None, :] % q
            ).astype(np.uint32)
            F1[i] = pw(w1, np.outer(j1v, j1v)).astype(np.uint32)
            T[i] = (pw(w, np.outer(j2v, j1v)) * pw(psi, j1v)[None, :] % q).astype(
                np.uint32
            )
            iF2[i] = (
                (pw(ipsi, N1 * j2v)[:, None] * pw(iw2, np.outer(j2v, j2v)) % q)
                * in2
                % q
            ).astype(np.uint32)
            iF1[i] = (pw(iw1, np.outer(j1v, j1v)) * in1 % q).astype(np.uint32)
            iT[i] = (
                pw(iw, np.outer(j2v, j1v)) * pw(ipsi, j1v)[None, :] % q
            ).astype(np.uint32)

        # digit planes, packed for ONE batched matmul per step:
        #   F-planes [L, D*rows, cols];  shift-fold constants [2D-1, L]
        self.F2d = jnp.asarray(_digits_np(F2).transpose(1, 0, 2, 3).reshape(L, _DIG * N2, N2))
        self.F1d = jnp.asarray(_digits_np(F1).transpose(1, 0, 2, 3).reshape(L, _DIG * N1, N1))
        self.iF2d = jnp.asarray(_digits_np(iF2).transpose(1, 0, 2, 3).reshape(L, _DIG * N2, N2))
        self.iF1d = jnp.asarray(_digits_np(iF1).transpose(1, 0, 2, 3).reshape(L, _DIG * N1, N1))
        q64 = np.array(primes, np.uint64)
        self.T = jnp.asarray(T)
        self.Ts = jnp.asarray(rns.shoup(T, q64[:, None, None]))
        self.iT = jnp.asarray(iT)
        self.iTs = jnp.asarray(rns.shoup(iT, q64[:, None, None]))
        shifts = np.zeros((2 * _DIG - 1, L), np.uint32)
        for s in range(2 * _DIG - 1):
            shifts[s] = (np.uint64(1 << (_DB * s)) % q64).astype(np.uint32)
        self.shifts = jnp.asarray(shifts)
        self.q = jnp.asarray(np.array(primes, np.uint32))[:, None, None]
        self.mu = jnp.asarray(
            np.array([(1 << 52) // int(p) for p in primes], np.uint64).astype(
                np.uint32
            )
        )[:, None, None]

        # output permutation matching rns.ntt's order (evaluation multiset is
        # identical; recover the index map empirically and verify)
        t = rns._sel(basis, rows)
        rng = np.random.default_rng(12345)
        x = np.stack(
            [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(L)]
        ).astype(np.uint32)
        ref = np.asarray(rns.ntt(jnp.asarray(x), basis, rows))
        raw = np.asarray(self._raw_fwd(jnp.asarray(x)))
        pi = np.zeros(n, np.int64)
        # match on two residue rows jointly: single-row matching collides at
        # n^2/(2q) ~ a few entries for n=2^14, q~2^25 (birthday bound)
        r2 = raw[1] if L > 1 else np.zeros(n, np.uint32)
        f2 = ref[1] if L > 1 else np.zeros(n, np.uint32)
        lut = {(int(a), int(b)): k for k, (a, b) in enumerate(zip(raw[0], r2))}
        for i, (a, b) in enumerate(zip(ref[0], f2)):
            pi[i] = lut[(int(a), int(b))]
        assert np.array_equal(raw[:, pi], ref), "four-step/butterfly order mismatch"
        self.pi = jnp.asarray(pi)
        self.ipi = jnp.asarray(np.argsort(pi))

    # -- exact modular matmul: rows of digit-planed M times x (both < 2^25)
    def _modmatmul(self, Md, x, contract):
        """Md: [L, D*out, c]; x: [L, c, m] uint32 -> [L, out, m] uint32."""
        L = x.shape[0]
        out = Md.shape[1] // _DIG
        m = x.shape[2]
        xd = _digits_jnp(x).transpose(1, 2, 0, 3).reshape(L, contract, _DIG * m)
        # [L, D*out, c] x [L, c, D*m] -> [L, D*out, D*m] int32 on the MXU
        P = jax.lax.dot_general(
            Md,
            xd,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        P = P.reshape(L, _DIG, out, _DIG, m)
        acc = None
        for s in range(2 * _DIG - 1):
            Ps = None
            for da in range(_DIG):
                dx = s - da
                if 0 <= dx < _DIG:
                    term = P[:, da, :, dx, :]
                    Ps = term if Ps is None else Ps + term
            r = rns.mul_mod_barrett(
                Ps.astype(jnp.uint32), self.shifts[s][:, None, None], self.q, self.mu
            )
            acc = r if acc is None else acc + r
        # acc < 7q < 2^28: conditional subtracts
        q = self.q
        for _ in range(7):
            acc = jnp.where(acc >= q, acc - q, acc)
        return acc

    def _raw_fwd(self, x):
        L = x.shape[0]
        x2d = x.reshape(L, self.N2, self.N1)
        A = self._modmatmul(self.F2d, x2d, self.N2)
        B = rns.mul_mod_shoup(A, self.T, self.Ts, self.q)
        # contract over j1: transpose to [L, N1, N2] then matmul F1 rows
        X2 = self._modmatmul(self.F1d, B.transpose(0, 2, 1), self.N1)
        # X2[k1? ...] -- F1 rows index k1, columns j1; result [L, N1=k1, N2]
        return X2.reshape(L, self.n)

    def _raw_inv(self, y):
        L = y.shape[0]
        y2d = y.reshape(L, self.N1, self.N2)  # [k1, k2]
        B = self._modmatmul(self.iF1d, y2d, self.N1)  # over k1 -> [j1, k2]
        B = rns.mul_mod_shoup(
            B.transpose(0, 2, 1), self.iT, self.iTs, self.q
        )  # [k2, j1]
        x2d = self._modmatmul(self.iF2d, B, self.N2)  # over k2 -> [j2, j1]
        return x2d.reshape(L, self.n)


_PLANS = {}


def get_plan(basis: rns.RnsBasis, rows: Tuple[int, ...]) -> Ntt4Plan:
    key = (id(basis), rows)
    if key not in _PLANS:
        _PLANS[key] = Ntt4Plan(basis, rows)
    return _PLANS[key]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt4_jit(x, plan: Ntt4Plan, inverse: bool):
    if not inverse:
        return plan._raw_fwd(x)[:, plan.pi]
    return plan._raw_inv(x[:, plan.ipi])


def ntt4(x, basis: rns.RnsBasis, rows, inverse: bool = False):
    """Drop-in replacement for rns.ntt built on MXU matmuls.  The plan is
    built eagerly (host precompute + an empirical order-matching pass), so
    first use of a (basis, rows) pair must happen OUTSIDE any jit trace —
    call get_plan() up front when embedding in a larger jitted function."""
    plan = get_plan(basis, rows)
    return _ntt4_jit(x, plan, inverse)
