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
7-bit digit planes packed as int8.  The 16 digit-pair products are grouped
by total digit weight s = da+dx into 2*4-1 = 7 matmuls whose contraction
axis concatenates the contributing digit planes, so the per-weight partial
sums come straight out of int8 x int8 -> int32 dot_generals (contraction
<= 4*128 keeps partial sums < 2^23) and are Barrett-folded with
2^(7s) mod q constants.  No [D*out, D*m] intermediate is materialized,
which keeps the batched transform (ntt4_b) linear in batch size.

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

        # per-weight concatenated digit planes: for weight s the contraction
        # axis stacks M's digit da over the valid (da, dx=s-da) pairs, in
        # ascending-da order (matched by the x-plane concat in _modmatmul)
        def weight_planes(M):
            d = _digits_np(M)  # [D, L, out, c]
            return [
                jnp.asarray(
                    np.concatenate(
                        [d[da] for da in range(_DIG) if 0 <= s - da < _DIG],
                        axis=2,
                    )
                )
                for s in range(2 * _DIG - 1)
            ]

        self.F2w = weight_planes(F2)
        self.F1w = weight_planes(F1)
        self.iF2w = weight_planes(iF2)
        self.iF1w = weight_planes(iF1)
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
        # identical; recover the index map empirically and verify).  Plans can
        # be built lazily while an outer jit is tracing: ensure_compile_time_eval
        # makes these concrete-input computations execute eagerly even then.
        rng = np.random.default_rng(12345)
        x = np.stack(
            [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(L)]
        ).astype(np.uint32)
        with jax.ensure_compile_time_eval():
            ref = np.asarray(rns._ntt_butterfly(jnp.asarray(x), basis, rows))
            raw = np.asarray(self._raw_fwd(jnp.asarray(x)[:, None, :])[:, 0, :])
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
    def _modmatmul(self, Mw, x):
        """Mw: per-weight [L, out, pairs*c]; x: [L, c, m] uint32 ->
        [L, out, m] uint32.  One int8 dot_general per digit weight."""
        xd = _digits_jnp(x)  # [D, L, c, m] int8
        acc = None
        for s in range(2 * _DIG - 1):
            xcat = jnp.concatenate(
                [xd[s - da] for da in range(_DIG) if 0 <= s - da < _DIG],
                axis=1,
            )
            P = jax.lax.dot_general(
                Mw[s],
                xcat,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [L, out, m] < 4*c*2^14 < 2^23
            r = rns.mul_mod_barrett(
                P.astype(jnp.uint32), self.shifts[s][:, None, None], self.q, self.mu
            )
            acc = r if acc is None else acc + r
        # acc < 7q < 2^28: conditional subtracts
        q = self.q
        for _ in range(7):
            acc = jnp.where(acc >= q, acc - q, acc)
        return acc

    def _raw_fwd(self, x):
        """x: [L, B, n] -> raw-order transform [L, B, n]."""
        L, Bn = x.shape[0], x.shape[1]
        N1, N2 = self.N1, self.N2
        x2d = (
            x.reshape(L, Bn, N2, N1)
            .transpose(0, 2, 1, 3)
            .reshape(L, N2, Bn * N1)
        )
        A = self._modmatmul(self.F2w, x2d)  # [L, N2(k2), B*N1]
        Bt = rns.mul_mod_shoup(
            A.reshape(L, N2, Bn, N1),
            self.T[:, :, None, :],
            self.Ts[:, :, None, :],
            self.q[..., None],
        )
        # contract over j1: arrange [L, N1(j1), B*N2]
        Bt = Bt.transpose(0, 3, 2, 1).reshape(L, N1, Bn * N2)
        X2 = self._modmatmul(self.F1w, Bt)  # [L, N1(k1), B*N2]
        return (
            X2.reshape(L, N1, Bn, N2).transpose(0, 2, 1, 3).reshape(L, Bn, self.n)
        )

    def _raw_inv(self, y):
        """y: [L, B, n] raw order -> coefficients [L, B, n]."""
        L, Bn = y.shape[0], y.shape[1]
        N1, N2 = self.N1, self.N2
        y2d = (
            y.reshape(L, Bn, N1, N2)  # [k1, k2]
            .transpose(0, 2, 1, 3)
            .reshape(L, N1, Bn * N2)
        )
        B = self._modmatmul(self.iF1w, y2d)  # over k1 -> [L, N1(j1), B*N2]
        B = rns.mul_mod_shoup(
            B.reshape(L, N1, Bn, N2).transpose(0, 3, 2, 1),  # [L, N2(k2), B, N1]
            self.iT[:, :, None, :],
            self.iTs[:, :, None, :],
            self.q[..., None],
        ).reshape(L, N2, Bn * N1)
        x2d = self._modmatmul(self.iF2w, B)  # over k2 -> [L, N2(j2), B*N1]
        return (
            x2d.reshape(L, N2, Bn, N1).transpose(0, 2, 1, 3).reshape(L, Bn, self.n)
        )


_PLANS = {}


def get_plan(basis: rns.RnsBasis, rows: Tuple[int, ...]) -> Ntt4Plan:
    key = (id(basis), rows)
    if key not in _PLANS:
        # plans may be built lazily while an outer jit is tracing; keep every
        # device constant concrete (a tracer captured here would poison all
        # later uses of the cached plan)
        with jax.ensure_compile_time_eval():
            _PLANS[key] = Ntt4Plan(basis, rows)
    return _PLANS[key]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt4_jit(x, plan: Ntt4Plan, inverse: bool):
    if not inverse:
        return plan._raw_fwd(x[:, None, :])[:, 0, plan.pi]
    return plan._raw_inv(x[:, None, plan.ipi])[:, 0, :]


_CHUNK = int(__import__("os").environ.get("SFGWAS_NTT4_CHUNK", "32"))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt4_b_jit(x, plan: Ntt4Plan, inverse: bool):
    L, Bn, n = x.shape
    if _CHUNK <= 0 or Bn <= _CHUNK:
        if not inverse:
            return plan._raw_fwd(x)[..., plan.pi]
        return plan._raw_inv(x[..., plan.ipi])
    # chunk the batch through lax.map: the digit-plane matmuls materialize
    # [L, 4*128, Bn*128]-int8 operands and [L, 128, Bn*128]-int32 products —
    # at Bn in the hundreds (the fused keyswitch epilogues) several ~1.7 GB
    # temps coexist and the compiler's remat OOMs the chip (BENCH_r04).
    # Per-chunk temps are Bn/G of that; MXU efficiency is kept by
    # m = CHUNK*128 >= 4096 columns.
    pad = (-Bn) % _CHUNK
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((L, pad, n), x.dtype)], axis=1
        )
    g = (Bn + pad) // _CHUNK
    xc = jnp.swapaxes(x.reshape(L, g, _CHUNK, n), 0, 1)  # [G, L, CH, n]

    if not inverse:
        out = jax.lax.map(lambda c: plan._raw_fwd(c)[..., plan.pi], xc)
    else:
        out = jax.lax.map(lambda c: plan._raw_inv(c[..., plan.ipi]), xc)
    out = jnp.swapaxes(out, 0, 1).reshape(L, Bn + pad, n)
    return out[:, :Bn]


def ntt4(x, basis: rns.RnsBasis, rows, inverse: bool = False):
    """Drop-in replacement for rns.ntt built on MXU matmuls.  The plan build
    (host precompute + an empirical order-matching pass) runs eagerly on
    first use of a (basis, rows) pair; concrete-array eager execution is
    legal inside an outer trace, but pre-warming via get_plan() avoids
    re-tracing churn when embedding in a larger jitted function."""
    plan = get_plan(basis, rows)
    return _ntt4_jit(x, plan, inverse)


def ntt4_b(x, basis: rns.RnsBasis, rows, inverse: bool = False):
    """Batched four-step NTT: x [L, B, N] (rns.ntt_b layout)."""
    plan = get_plan(basis, rows)
    return _ntt4_b_jit(x, plan, inverse)
