"""RNS modular arithmetic for CKKS polynomial rings on TPU.

Replaces the Lattigo ring package the reference depends on (SURVEY.md §2.10).
TPUs have no 64-bit integer multiplier, so:

* RNS primes are ~25 bits (q = 1 mod 2N, NTT-friendly), residues live in
  uint32 arrays [nprimes, N];
* data*data modular products use Barrett reduction with 13-bit digit
  splitting (all partials < 2^31);
* data*constant products (twiddles, precomputed tables) use Shoup
  multiplication: one 32-bit mulhi (via 16-bit digits) + two wrapping
  multiplies.

This is the TPU equivalent of the reference's uint128 lazy-accumulation
kernels (gwas/matmult.go:247-324): instead of 64x64->128 MACs with deferred
reduction, everything is expressed in int32/uint32 lanes that vectorize on
the VPU and tile onto the MXU.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def is_prime(n: int) -> bool:
    if n < 4:
        return n in (2, 3)
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def gen_primes(count: int, logn: int, prime_bits: int = 25) -> List[int]:
    """NTT-friendly primes q = 1 mod 2N, alternating around 2^prime_bits so
    running products stay close to powers of the nominal scale."""
    two_n = 1 << (logn + 1)
    center = 1 << prime_bits
    lo = center - (center % two_n) + 1
    hi = lo + two_n
    out: List[int] = []
    while len(out) < count:
        for cand in (hi, lo):
            if len(out) >= count:
                break
            if cand.bit_length() <= 32 and cand > two_n and is_prime(cand) and cand not in out:
                out.append(cand)
        lo -= two_n
        hi += two_n
        if lo < (1 << (prime_bits - 2)):
            raise RuntimeError("not enough NTT primes")
    return out


def _find_psi(q: int, two_n: int) -> int:
    """Primitive 2N-th root of unity mod q."""
    assert (q - 1) % two_n == 0
    for g in range(2, 10000):
        psi = pow(g, (q - 1) // two_n, q)
        if pow(psi, two_n // 2, q) != 1:  # order exactly 2N
            return psi
    raise RuntimeError("no 2N-th root found")


def _bitrev(i: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (i & 1)
        i >>= 1
    return out


def shoup(c: np.ndarray, q: np.ndarray) -> np.ndarray:
    """floor(c * 2^32 / q) companion table (host).  c < 2^26 so the shifted
    numerator fits uint64 exactly (no object-array path)."""
    return (
        (c.astype(np.uint64) << np.uint64(32)) // q.astype(np.uint64)
    ).astype(np.uint32)


class RnsBasis:
    """Prime chain + NTT tables for R_Q = Z_Q[X]/(X^N + 1).

    All per-prime tables are stacked device arrays [nprimes, ...]; level
    changes slice the leading axis.
    """

    def __init__(self, primes: Sequence[int], logn: int):
        self.primes = list(primes)
        self.logn = logn
        self.n = 1 << logn
        L = len(self.primes)
        n = self.n
        q = np.array(self.primes, dtype=np.uint64)

        self.q = jnp.asarray(q.astype(np.uint32))[:, None]  # [L, 1]
        self.q2 = jnp.asarray((2 * q).astype(np.uint32))[:, None]
        # Barrett mu = floor(2^52 / q) for 13-bit-digit reduction (q < 2^26)
        self.bar_shift = 52
        mu = ((1 << self.bar_shift)) // q.astype(object)
        self.mu = jnp.asarray(np.array(mu, dtype=np.uint64).astype(np.uint32))[:, None]

        # NTT twiddles, bit-reversed layout (Longa–Naehrig).  Vectorized
        # square-and-multiply ladder: 26-bit operands, so uint64 products
        # are exact (the per-element python pow() loop took ~minutes per
        # process at logn=14 x 18 primes).
        rev = np.zeros(n, dtype=np.uint64)
        for j in range(n):
            rev[j] = _bitrev(j, logn)
        psi_rev = np.zeros((L, n), dtype=np.uint32)
        ipsi_rev = np.zeros((L, n), dtype=np.uint32)
        ninv = np.zeros((L,), dtype=np.uint32)

        def powmod_vec(base: int, e: np.ndarray, qi: int) -> np.ndarray:
            out = np.ones(n, dtype=np.uint64)
            b = np.uint64(base)
            qv = np.uint64(qi)
            for bit in range(int(e.max()).bit_length()):
                sel = (e >> np.uint64(bit)) & np.uint64(1)
                out = np.where(sel == 1, (out * b) % qv, out)
                b = (b * b) % qv
            return out

        for i, qi in enumerate(self.primes):
            psi = _find_psi(qi, 2 * n)
            ipsi = pow(psi, -1, qi)
            psi_rev[i] = powmod_vec(psi, rev, qi).astype(np.uint32)
            ipsi_rev[i] = powmod_vec(ipsi, rev, qi).astype(np.uint32)
            ninv[i] = pow(n, -1, qi)
        qcol = q.astype(np.uint32)[:, None]
        psi_s_np = shoup(psi_rev, np.broadcast_to(qcol, psi_rev.shape))
        ipsi_s_np = shoup(ipsi_rev, np.broadcast_to(qcol, ipsi_rev.shape))
        ninv_s_np = shoup(ninv[:, None], qcol)
        self.psi_rev = jnp.asarray(psi_rev)
        self.psi_rev_s = jnp.asarray(psi_s_np)
        self.ipsi_rev = jnp.asarray(ipsi_rev)
        self.ipsi_rev_s = jnp.asarray(ipsi_s_np)
        self.ninv = jnp.asarray(ninv)[:, None]
        self.ninv_s = jnp.asarray(ninv_s_np)

        # q_l mod q_i table for base extension / rescale: [L, L]
        qmod = np.zeros((L, L), dtype=np.uint32)
        qinv = np.zeros((L, L), dtype=np.uint32)  # q_l^{-1} mod q_i
        for l_ in range(L):
            for i in range(L):
                qmod[l_, i] = self.primes[l_] % self.primes[i]
                if i != l_:
                    qinv[l_, i] = pow(self.primes[l_], -1, self.primes[i])
        self.qmod = qmod  # host
        self.qinv = qinv  # host
        # host copies for safe (outside-trace) row selection in _sel --
        # built from the numpy ORIGINALS (never np.asarray of a device
        # array: readback through the accelerator tunnel is ~8 MB/s)
        self._np = dict(
            q=q.astype(np.uint32)[:, None],
            mu=np.array(mu, dtype=np.uint64).astype(np.uint32)[:, None],
            psi=psi_rev,
            psi_s=psi_s_np,
            ipsi=ipsi_rev,
            ipsi_s=ipsi_s_np,
            ninv=ninv[:, None],
            ninv_s=ninv_s_np,
        )
        self._cache = {}

    def __hash__(self):
        return hash((tuple(self.primes), self.logn))

    def __eq__(self, other):
        return (
            isinstance(other, RnsBasis)
            and other.primes == self.primes
            and other.logn == self.logn
        )


# ---------------------------------------------------------------------------
# device kernels (all operate on uint32 arrays with leading prime axis)


def _csub(x, q):
    return jnp.where(x >= q, x - q, x)


def add_mod(a, b, q):
    return _csub(a + b, q)


def sub_mod(a, b, q):
    return _csub(a + q - b, q)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def _mulhi32(a, b):
    """High 32 bits of a 32x32 product; exact for a*b < 2^56 (our domain)."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def mul_mod_shoup(a, w, w_shoup, q):
    """a * w mod q with precomputed w_shoup = floor(w*2^32/q).
    Requires a < 2q, w < q < 2^26."""
    hi = _mulhi32(a, w_shoup)
    r = a * w - hi * q  # wrapping uint32 arithmetic; r < 2q
    return _csub(r, q)


def mul_mod_barrett(a, b, q, mu, bar_shift=52):
    """a * b mod q for a, b < q < 2^26 via 13-bit digits + Barrett."""
    a0 = a & 0x1FFF
    a1 = a >> 13
    b0 = b & 0x1FFF
    b1 = b >> 13
    ll = a0 * b0  # < 2^26
    mid = a1 * b0 + a0 * b1  # < 2^27
    hh = a1 * b1  # < 2^26
    # x = hh*2^26 + mid*2^13 + ll < 2^52
    xhi = hh + ((mid + (ll >> 13)) >> 13)  # floor(x / 2^26) < 2^26
    # qhat = floor(xhi * mu / 2^26), mu = floor(2^52/q) < 2^27
    qhat = _mulhi_shift26(xhi, mu)
    x_low = ll + (mid << 13) + (hh << 26)  # mod 2^32 (wrapping)
    r = x_low - qhat * q  # wrapping uint32; true remainder < ~3q < 2^28
    r = _csub(r, q)
    r = _csub(r, q)
    return _csub(r, q)


def _mulhi_shift26(a, b):
    """floor(a * b / 2^26) for a < 2^26, b < 2^27 (product < 2^53)."""
    a0 = a & 0x1FFF
    a1 = a >> 13
    b0 = b & 0x1FFF
    b1 = b >> 13  # < 2^14
    ll = a0 * b0
    mid = a1 * b0 + a0 * b1  # < 2^28
    hh = a1 * b1  # < 2^27
    return hh + ((mid + (ll >> 13)) >> 13)


def _sel(basis: "RnsBasis", rows):
    """Cached per-row-subset tables.  Built from host numpy copies so the
    cache never captures jit tracers (safe to call inside a trace: the
    selected tables become compile-time constants)."""
    key = ("sel", tuple(rows))
    if key not in basis._cache:
        idx = np.asarray(rows, dtype=np.int64)
        # plain numpy: auto-promoted to constants wherever used, never a tracer
        basis._cache[key] = {k: v[idx] for k, v in basis._np.items()}
    return basis._cache[key]


# SFGWAS_NTT4: "1"/"0" forces the four-step MXU NTT (ops/ntt4.py) on/off;
# unset = auto (on for accelerator backends, off for CPU, where the
# butterfly's shuffle passes beat int8-matmul emulation).  Resolved lazily
# so importing this module never initializes a jax backend.
_NTT4: Optional[bool] = None


def _use_ntt4(n: int) -> bool:
    global _NTT4
    if _NTT4 is None:
        env = os.environ.get("SFGWAS_NTT4")
        if env is not None:
            _NTT4 = env not in ("0", "")
        else:
            _NTT4 = jax.default_backend() != "cpu"
    return _NTT4 and n >= 256


def ntt(x, basis: RnsBasis, rows, inverse: bool = False):
    """Negacyclic NTT over the given (static tuple of) prime rows.
    x: [len(rows), N] uint32; standard order in -> bit-reversed out
    (forward); inverse undoes it.  Dispatches to the four-step MXU
    formulation (ops/ntt4.py, bit-exact drop-in) on accelerator backends."""
    if _use_ntt4(basis.n):
        from . import ntt4 as _n4

        return _n4.ntt4(x, basis, tuple(rows), inverse)
    return _ntt_butterfly(x, basis, rows, inverse)


_PALLAS_NTT: Optional[bool] = None


def _use_pallas_ntt(n: int) -> bool:
    """SFGWAS_PALLAS_NTT=1: fused-VMEM Pallas butterfly for batched NTTs on
    accelerator backends (one HBM round trip instead of log2 N staged
    passes).  Off by default until benched per deployment."""
    global _PALLAS_NTT
    if _PALLAS_NTT is None:
        _PALLAS_NTT = (
            os.environ.get("SFGWAS_PALLAS_NTT", "") not in ("", "0")
            and jax.default_backend() != "cpu"
        )
    return _PALLAS_NTT and n >= 256


def ntt_b(x, basis: RnsBasis, rows, inverse: bool = False):
    """Batched negacyclic NTT: x [L, B, N] with len(rows) == L; the batch
    axis shares each row's twiddles.  Same layout conventions as ntt()."""
    if _use_pallas_ntt(basis.n):
        from . import pallas_ntt as _pn

        return _pn.ntt_pallas_b(x, basis, tuple(rows), inverse)
    if _use_ntt4(basis.n):
        from . import ntt4 as _n4

        return _n4.ntt4_b(x, basis, tuple(rows), inverse)
    return _ntt_b_butterfly(x, basis, rows, inverse)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _ntt_butterfly(x, basis: RnsBasis, rows, inverse: bool = False):
    """Butterfly negacyclic NTT (see ntt() for layout conventions)."""
    n = basis.n
    t = _sel(basis, rows)
    L = x.shape[0]
    q = t["q"][:, :, None]
    if not inverse:
        tw, tws = t["psi"], t["psi_s"]
        m = 1
        while m < n:
            half = n // (2 * m)
            xv = x.reshape(L, m, 2, half)
            S = tw[:, m : 2 * m, None]
            Ss = tws[:, m : 2 * m, None]
            U = xv[:, :, 0, :]
            V = mul_mod_shoup(xv[:, :, 1, :], S, Ss, q)
            x = jnp.stack(
                [add_mod(U, V, q), sub_mod(U, V, q)], axis=2
            ).reshape(L, n)
            m *= 2
        return x
    tw, tws = t["ipsi"], t["ipsi_s"]
    m = n
    while m > 1:
        h = m // 2
        half = n // m
        xv = x.reshape(L, h, 2, half)
        S = tw[:, h : 2 * h, None]
        Ss = tws[:, h : 2 * h, None]
        U = xv[:, :, 0, :]
        V = xv[:, :, 1, :]
        lo = add_mod(U, V, q)
        hi = mul_mod_shoup(sub_mod(U, V, q), S, Ss, q)
        x = jnp.stack([lo, hi], axis=2).reshape(L, n)
        m = h
    return mul_mod_shoup(x, t["ninv"], t["ninv_s"], t["q"])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _ntt_b_butterfly(x, basis: RnsBasis, rows, inverse: bool = False):
    """Batched butterfly NTT (see ntt_b() for layout conventions)."""
    n = basis.n
    t = _sel(basis, rows)
    L, Bdim = x.shape[0], x.shape[1]
    q = t["q"][:, None, :, None]
    if not inverse:
        tw, tws = t["psi"], t["psi_s"]
        m = 1
        while m < n:
            half = n // (2 * m)
            xv = x.reshape(L, Bdim, m, 2, half)
            S = tw[:, None, m : 2 * m, None]
            Ss = tws[:, None, m : 2 * m, None]
            U = xv[:, :, :, 0, :]
            V = mul_mod_shoup(xv[:, :, :, 1, :], S, Ss, q)
            x = jnp.stack(
                [add_mod(U, V, q), sub_mod(U, V, q)], axis=3
            ).reshape(L, Bdim, n)
            m *= 2
        return x
    tw, tws = t["ipsi"], t["ipsi_s"]
    m = n
    while m > 1:
        h = m // 2
        half = n // m
        xv = x.reshape(L, Bdim, h, 2, half)
        S = tw[:, None, h : 2 * h, None]
        Ss = tws[:, None, h : 2 * h, None]
        U = xv[:, :, :, 0, :]
        V = xv[:, :, :, 1, :]
        lo = add_mod(U, V, q)
        hi = mul_mod_shoup(sub_mod(U, V, q), S, Ss, q)
        x = jnp.stack([lo, hi], axis=3).reshape(L, Bdim, n)
        m = h
    return mul_mod_shoup(x, t["ninv"][:, None], t["ninv_s"][:, None], t["q"][:, None])


def poly_mul_pointwise(a, b, basis: RnsBasis, rows=None):
    if rows is None:
        L = a.shape[0]
        return mul_mod_barrett(a, b, basis.q[:L], basis.mu[:L])
    t = _sel(basis, rows)
    return mul_mod_barrett(a, b, t["q"], t["mu"])


def poly_add(a, b, basis: RnsBasis, rows=None):
    q = basis.q[: a.shape[0]] if rows is None else _sel(basis, rows)["q"]
    return add_mod(a, b, q)


def poly_sub(a, b, basis: RnsBasis, rows=None):
    q = basis.q[: a.shape[0]] if rows is None else _sel(basis, rows)["q"]
    return sub_mod(a, b, q)


def poly_neg(a, basis: RnsBasis, rows=None):
    q = basis.q[: a.shape[0]] if rows is None else _sel(basis, rows)["q"]
    return neg_mod(a, q)


# ---------------------------------------------------------------------------
# host <-> device conversions


def ints_to_rns(coeffs, primes) -> np.ndarray:
    """Host: array of python ints [N] -> residues [L, N] uint32."""
    out = np.zeros((len(primes), len(coeffs)), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[i] = np.array([int(c) % q for c in coeffs], dtype=np.uint64).astype(
            np.uint32
        )
    return out


def rns_to_ints(res, primes) -> np.ndarray:
    """Host: residues [L, N] -> centered python ints via CRT."""
    res = np.asarray(res)
    L = res.shape[0]
    Q = 1
    for q in primes[:L]:
        Q *= q
    out = np.zeros(res.shape[1], dtype=object)
    for i in range(L):
        qi = primes[i]
        Qi = Q // qi
        inv = pow(Qi % qi, -1, qi)
        out = (out + res[i].astype(object) * ((Qi * inv) % Q)) % Q
    half = Q >> 1
    for j in range(len(out)):
        if out[j] > half:
            out[j] -= Q
    return out


# ---------------------------------------------------------------------------
# Exact vectorized CRT lift (host, int64 word arithmetic)
#
# Used by the collective bootstrap: the masked decryption is an exact integer
# poly mod Q_l that must be re-expressed mod the full modulus
# (the reference relies on lattigo's PolyToBigint big-int path;
# here: word-decomposed CRT, fully vectorized in numpy int64).

_WB = 24  # word bits; products q_i(25b) * word(24b) < 2^49, sums of ~20 fit


def _int_to_words(v: int, nwords: int) -> np.ndarray:
    return np.array(
        [(v >> (_WB * k)) & ((1 << _WB) - 1) for k in range(nwords)], dtype=np.int64
    )


def crt_lift_centered(res: np.ndarray, primes_src, dst_primes) -> np.ndarray:
    """res: [l, N] residues mod primes_src -> centered value v (|v| < Q/2)
    re-reduced mod each of dst_primes: returns [len(dst), N] uint32.

    Exact: v = sum_i res_i * T_i mod Q computed in 24-bit words with
    conditional big-subtractions of Q, then centered and folded mod the
    destination primes."""
    res = np.asarray(res, dtype=np.int64)
    l, n = res.shape
    Q = 1
    for q in primes_src[:l]:
        Q *= q
    # v = sum_i res_i * T_i can reach (sum_i q_i) * Q ~ 2^26 * l * Q, so the
    # word array and the shifted-subtract ladder must cover that headroom
    slack = max(p.bit_length() for p in primes_src[:l]) + l.bit_length() + 2
    nwords = (Q.bit_length() + slack + _WB) // _WB + 1
    Tw = np.zeros((l, nwords), dtype=np.int64)
    for i in range(l):
        qi = primes_src[i]
        Ti = (Q // qi) * pow(Q // qi, -1, qi) % Q
        Tw[i] = _int_to_words(Ti, nwords)
    # v_words[k, j] = sum_i res[i, j] * Tw[i, k]   (< l * 2^25 * 2^24 < 2^54)
    vw = np.einsum("ij,ik->kj", res, Tw)  # [nwords, N] int64
    vw = _word_carry(vw)
    # binary shifted-subtract ladder: v < 2^slack * Q -> v mod Q
    Qw = _int_to_words(Q, nwords)
    for s in range(slack, -1, -1):
        vw = _cond_sub_words(vw, _int_to_words(Q << s, nwords))
    # centered: if v >= Q/2: v -= Q
    half_w = _int_to_words(Q // 2, nwords)
    ge = _ge_words(vw, half_w)
    vw2 = _sub_words(vw, Qw)  # may go negative; tracked in signed words
    vw = np.where(ge[None, :], vw2, vw)
    # fold words into each destination prime
    out = np.zeros((len(dst_primes), n), dtype=np.uint32)
    for d, qd in enumerate(dst_primes):
        pw = np.array(
            [pow(1 << (_WB * k), 1, qd) for k in range(nwords)], dtype=np.int64
        )
        acc = (vw * pw[:, None]) % qd  # signed ok: python-like? no: numpy %
        s = np.sum(acc, axis=0) % qd
        out[d] = s.astype(np.uint32)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def crt_lift_centered_dev(x, basis, src_rows, dst_rows):
    """Device-side centered CRT basis extension for PROTOCOL-BOUNDED values.

    x: [l, M] uint32 residues mod the src_rows primes of a centered value v
    with |v| < Q_src/4 (the collective-bootstrap mask bound is Q_l/8-ish,
    mhe.collective_bootstrap_many).  Returns [len(dst_rows), M] residues of
    the SAME centered value mod the dst_rows primes.

    Fast basis extension (Halevi-Polyakov-Shoup): y_i = x_i*(Q/q_i)^-1 mod
    q_i; v = sum_i y_i*(Q/q_i) - k*Q with k = round(sum_i y_i/q_i).  The
    rounding is computed in f32: its error (< l * 2^-23) is far inside the
    1/4 margin the boundedness guarantees, so the result is EXACT — unlike
    the general-input case, where frac ~ uniform and float rounding would
    misclassify near half-integers.  Replaces the host big-int lift + the
    device->host readback (~2.5 MB/s through the axon tunnel; the round-5
    cholQR profile spent 26 s/iteration in bs_crt_pull + bs_crt_lift)."""
    l = len(src_rows)
    primes = [int(basis.primes[r]) for r in src_rows]
    Q = 1
    for q in primes:
        Q *= q
    t_src = _sel(basis, tuple(src_rows))
    w = np.array(
        [pow(Q // q, -1, q) for q in primes], dtype=np.uint32
    )[:, None]
    y = mul_mod_barrett(x, jnp.asarray(w), t_src["q"], t_src["mu"])  # [l, M]
    inv_q = jnp.asarray(np.array([1.0 / q for q in primes], np.float32))
    k = jnp.round(jnp.sum(y.astype(jnp.float32) * inv_q[:, None], axis=0))
    k = k.astype(jnp.uint32)  # in [0, l]

    outs = []
    for r in dst_rows:
        p = int(basis.primes[r])
        qd = jnp.asarray(np.uint32(p))[None]
        mud = jnp.asarray(
            np.uint32((1 << 52) // p)
        )[None]
        qi_mod = np.array([(Q // q) % p for q in primes], np.uint32)[:, None]
        terms = mul_mod_barrett(y, jnp.asarray(qi_mod), qd, mud)  # [l, M] < p
        acc = jnp.sum(terms, axis=0) % qd  # l*p < 2^31: single u32 sum
        kq = mul_mod_barrett(k[None], jnp.asarray(np.uint32(Q % p))[None], qd, mud)
        outs.append(sub_mod(acc[None], kq, qd)[0])
    return jnp.stack(outs)


def _word_carry(vw: np.ndarray) -> np.ndarray:
    mask = (1 << _WB) - 1
    for k in range(vw.shape[0] - 1):
        c = vw[k] >> _WB
        vw[k] &= mask
        vw[k + 1] += c
    return vw


def _cond_sub_words(vw: np.ndarray, Qw: np.ndarray) -> np.ndarray:
    y = vw - Qw[:, None]
    # exact borrow propagation
    mask = (1 << _WB) - 1
    borrow = np.zeros(vw.shape[1], dtype=np.int64)
    out = np.empty_like(y)
    for k in range(vw.shape[0]):
        t = y[k] + borrow
        borrow = t >> _WB
        out[k] = t - (borrow << _WB)
    ge = borrow == 0  # no final borrow -> v >= Q
    return np.where(ge[None, :], out, vw)


def _sub_words(vw: np.ndarray, Qw: np.ndarray) -> np.ndarray:
    y = vw - Qw[:, None]
    borrow = np.zeros(vw.shape[1], dtype=np.int64)
    out = np.empty_like(y)
    for k in range(vw.shape[0]):
        t = y[k] + borrow
        borrow = t >> _WB
        out[k] = t - (borrow << _WB)
    # leave the (negative) top borrow in the top word (signed representation)
    out[-1] += borrow << _WB
    return out


def _ge_words(vw: np.ndarray, bw: np.ndarray) -> np.ndarray:
    y = vw - bw[:, None]
    borrow = np.zeros(vw.shape[1], dtype=np.int64)
    for k in range(vw.shape[0]):
        t = y[k] + borrow
        borrow = t >> _WB
    return borrow == 0


def words_sample_centered(rng, bound_bits: int, n: int):
    """Sample n uniform ints in [-2^(b-1), 2^(b-1)) as word arrays
    [nwords, n] (signed, last word carries the sign after centering)."""
    nwords = (bound_bits + _WB - 1) // _WB
    top_bits = bound_bits - _WB * (nwords - 1)
    w = rng.integers(0, 1 << _WB, size=(nwords, n), dtype=np.int64)
    w[-1] &= (1 << top_bits) - 1
    # subtract 2^(b-1): flip the top bit region
    w[-1] -= 1 << (top_bits - 1)
    return w


def words_mod_prime(w: np.ndarray, q: int) -> np.ndarray:
    """Signed word array [nwords, n] -> residues mod q (uint32)."""
    nwords = w.shape[0]
    pw = np.array([pow(1 << (_WB * k), 1, q) for k in range(nwords)], dtype=np.int64)
    acc = (w * pw[:, None]) % q
    return (np.sum(acc, axis=0) % q).astype(np.uint32)
