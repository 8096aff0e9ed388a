"""Limb-based modular ring arithmetic for the MPC secret-sharing domain.

TPU-native replacement for mpc-core's ``RElem/RVec/RMat`` generic ring types
(the reference registers LElem256/LElem128/LElem2N/SElemDS/SElemC/BElem at
mpc/mpc.go:64-71 and selects the field at gwas/gwas.go:191-199).

TPUs have no 64x64->128 multiplier (the reference's hot loop,
gwas/matmult.go:247-324, is a Go uint128 lazy accumulator), so ring elements
here are little-endian base-2^8 digit vectors stored in int32 arrays of shape
``[..., nlimb]``:

* digit products fit in 16 bits, length-32 convolutions stay < 2^21, and the
  modular fold (2^256 = 189 mod p256) stays < 2^30 -- everything fits int32
  lanes and vectorizes on the VPU / tiles onto the MXU for matmuls;
* carries use arithmetic right shifts (floor division), which remain correct
  for the signed intermediates produced by subtraction;
* moduli are "delta below a power of two": p256 = 2^256 - 189 and
  p128 = 2^127 - 1.  This is what makes the prime->power-of-two share
  conversion trick of the binary comparison protocols work
  (reference mpc/mpc.go:1690-1708): shares mod p, re-read mod 2^b, differ
  from the true value only by a small multiple of delta.

Element layouts:
  scalar  -> [nlimb]
  RVec    -> [n, nlimb]
  RMat    -> [r, c, nlimb]

All device functions take and return *canonical* digit arrays (each digit in
[0, 255] and the value in [0, modulus)) unless noted.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

DIGIT_BITS = 8
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def aset(arr, idx, val):
    """Functional indexed set that works for host numpy and jax arrays
    (numpy: copy-on-write to preserve the .at[].set() semantics)."""
    if isinstance(arr, jnp.ndarray):
        return arr.at[idx].set(val)
    out = np.array(arr)
    out[idx] = np.asarray(val)
    return out


def aadd(arr, idx, val):
    """Functional indexed add (scatter-add for repeated indices, matching
    jax's .at[].add())."""
    if isinstance(arr, jnp.ndarray):
        return arr.at[idx].add(val)
    out = np.array(arr)
    np.add.at(out, idx, np.asarray(val))
    return out


def _jitmethod(fn):
    """jit with `self` (a hashable Ring) as a static argument."""
    return functools.partial(jax.jit, static_argnums=0)(fn)


def _jitmethod2(fn):
    """jit with `self` and the scalar parameter static."""
    return functools.partial(jax.jit, static_argnums=(0, 2))(fn)


class Ring:
    """Z_p (kind='prime') or Z_{2^bits} (kind='pow2') digit arithmetic."""

    has_limbs = True
    host = True  # the SS protocol layer keeps ring tensors in host numpy

    def __init__(self, modulus: int, kind: str, name: str = ""):
        assert kind in ("prime", "pow2")
        self.kind = kind
        self.modulus = modulus
        self.name = name or f"{kind}{modulus.bit_length()}"
        self.bits = modulus.bit_length() if kind == "prime" else modulus.bit_length() - 1
        # Number of 8-bit digits needed to cover [0, modulus)
        self.nlimb = -(-self.bits // DIGIT_BITS)
        cap = 1 << (DIGIT_BITS * self.nlimb)  # capacity of the digit array
        if kind == "prime":
            assert modulus < cap
            self.fold_c = cap % modulus  # 2^(8*nlimb) mod p; must be small
            assert self.fold_c < (1 << 9), "prime must be just below a power of two"
            self.top_mask = DIGIT_MASK
        else:
            assert modulus <= cap
            self.fold_c = 0
            # bits of modulus inside the top digit (e.g. 2^127 with 16 digits)
            top_bits = self.bits - DIGIT_BITS * (self.nlimb - 1)
            self.top_mask = (1 << top_bits) - 1
        self._p_digits = None
        if kind == "prime":
            self._p_digits = tuple(
                (modulus >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(self.nlimb)
            )
        self._cache = {}
        # native C++ limb engine (ops/native_ring.py); id if supported
        from . import native_ring as _nr

        self._nid = _nr.ring_id(modulus, kind)
        self._nlib = _nr.lib() if self._nid is not None else None

    # Rings are compared by identity for jit static-arg hashing.
    def __hash__(self):
        return hash((self.kind, self.modulus))

    def __eq__(self, other):
        return isinstance(other, Ring) and (self.kind, self.modulus) == (
            other.kind,
            other.modulus,
        )

    def __repr__(self):
        return f"Ring({self.name})"

    # ------------------------------------------------------------------ host

    def _int_to_digit_list(self, v: int) -> list:
        v %= self.modulus
        return [(v >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(self.nlimb)]

    def from_ints(self, vals) -> np.ndarray:
        """Host: array of python ints (any shape, any sign) -> digit array."""
        arr = np.asarray(vals, dtype=object)
        out = np.empty(arr.shape + (self.nlimb,), dtype=np.int32)
        flat = arr.reshape(-1)
        oflat = out.reshape(-1, self.nlimb)
        for i, v in enumerate(flat):
            oflat[i] = self._int_to_digit_list(int(v))
        return out

    def to_ints(self, digits) -> np.ndarray:
        """Host: canonical digit array -> array of python ints (object dtype)."""
        d = np.asarray(digits)
        shape = d.shape[:-1]
        flat = d.reshape(-1, self.nlimb)
        out = np.empty(len(flat), dtype=object)
        for i in range(len(flat)):
            v = 0
            for j in range(self.nlimb - 1, -1, -1):
                v = (v << DIGIT_BITS) | int(flat[i, j])
            out[i] = v
        return out.reshape(shape) if shape else out[0]

    def from_float(self, vals, frac_bits: int) -> np.ndarray:
        """Host: fixed-point encode floats (round(v * 2^frac)) mod modulus."""
        arr = np.asarray(vals, dtype=np.float64)
        ints = np.empty(arr.shape, dtype=object)
        it = np.nditer(arr, flags=["multi_index", "refs_ok"])
        for x in it:
            ints[it.multi_index] = int(round(float(x) * (1 << frac_bits)))
        return self.from_ints(ints)

    def to_float(self, digits, frac_bits: int) -> np.ndarray:
        """Host: centered decode: values > modulus/2 are negative.

        Vectorized digit-domain path: sign by lexicographic compare against
        modulus/2, magnitude via exact borrow-propagated M - v, then a
        uint64 fold of the low 8 digits (fixed-point protocol values are
        < 2^64 in magnitude; anything larger falls back to the exact
        per-element bignum loop)."""
        d = np.asarray(digits, dtype=np.int64)
        scalar = d.ndim == 1
        d2 = d.reshape(-1, self.nlimb)
        neg = self._is_negative_digits(d2)
        mag = np.where(neg[..., None], self._neg_digits(d2), d2)
        if self.nlimb > 8 and mag[..., 8:].any():
            return self._to_float_exact(digits, frac_bits)
        k = min(8, self.nlimb)
        w = (np.uint64(1) << (np.uint64(DIGIT_BITS) * np.arange(k, dtype=np.uint64)))
        lo = (mag[..., :k].astype(np.uint64) * w).sum(-1, dtype=np.uint64)
        out = lo.astype(np.float64) / float(1 << frac_bits)
        out = np.where(neg, -out, out)
        return out[0] if scalar else out.reshape(d.shape[:-1])

    def _is_negative_digits(self, d2: np.ndarray) -> np.ndarray:
        """Lexicographic v > modulus/2 on canonical digit rows [n, L]."""
        half = np.asarray(
            self._int_to_digit_list(self.modulus >> 1), dtype=np.int64
        )
        diff = d2 - half
        nz = diff != 0
        # index of the most significant differing digit (0 if none differ)
        idx = self.nlimb - 1 - np.argmax(nz[..., ::-1], axis=-1)
        top = np.take_along_axis(diff, idx[..., None], axis=-1)[..., 0]
        return top > 0

    def _neg_digits(self, d2: np.ndarray) -> np.ndarray:
        """Exact (modulus - v) in digit form, vectorized borrow scan."""
        if self.kind == "prime":
            r = np.asarray(self._p_digits, dtype=np.int64) - d2
        else:
            r = -d2.astype(np.int64)
        out = np.empty_like(r)
        borrow = np.zeros(r.shape[:-1], dtype=np.int64)
        for j in range(self.nlimb):
            t = r[..., j] + borrow
            borrow = t >> DIGIT_BITS
            out[..., j] = t - (borrow << DIGIT_BITS)
        if self.kind != "prime":
            # 2^{8L} - v folds onto 2^bits - v under the canonical top mask
            out[..., -1] &= self.top_mask
        return out

    def _to_float_exact(self, digits, frac_bits: int) -> np.ndarray:
        ints = self.to_ints(digits)
        half = self.modulus >> 1
        flat = np.atleast_1d(ints).reshape(-1)
        out = np.empty(len(flat), dtype=np.float64)
        for i, v in enumerate(flat):
            v = int(v)
            if v > half:
                v -= self.modulus
            out[i] = v / float(1 << frac_bits)
        shape = np.asarray(ints).shape
        return out.reshape(shape) if shape else out[0]

    def centered_ints(self, digits) -> np.ndarray:
        ints = np.atleast_1d(self.to_ints(digits))
        half = self.modulus >> 1
        out = np.empty(ints.shape, dtype=object)
        flat_in = ints.reshape(-1)
        flat_out = out.reshape(-1)
        for i, v in enumerate(flat_in):
            v = int(v)
            flat_out[i] = v - self.modulus if v > half else v
        return out

    def inv_int(self, v: int) -> int:
        """Host: modular inverse (modulus must be prime or v odd-coprime)."""
        return pow(int(v) % self.modulus, -1, self.modulus)

    def const(self, v: int) -> jnp.ndarray:
        """Cached device digits for a python int constant."""
        v = int(v) % self.modulus
        key = ("const", v)
        if key not in self._cache:
            self._cache[key] = jnp.asarray(self._int_to_digit_list(v), dtype=jnp.int32)
        return self._cache[key]

    # -------------------------------------------------- execution dispatch
    #
    # Every elementwise/matmul op has a HOST (numpy int64) and a DEVICE
    # (jax int32) implementation with identical semantics.  Host arrays in,
    # host array out; any jax input routes to the jitted device path.  The
    # SS protocol layer lives on the host (tiny round-lockstep tensors where
    # per-op device dispatch costs orders of magnitude more than the digit
    # arithmetic -- and on TPU every dispatch is a tunnel roundtrip); wide
    # data-parallel protocol calls can stage jnp arrays to get the device
    # path.

    @staticmethod
    def _on_host(*xs) -> bool:
        return all(not isinstance(x, jnp.ndarray) for x in xs)

    # ---------------------------------------------------------------- device

    def zeros(self, shape: Sequence[int]) -> np.ndarray:
        return np.zeros(tuple(shape) + (self.nlimb,), dtype=np.int32)

    def ones(self, shape: Sequence[int]) -> np.ndarray:
        return np.broadcast_to(
            np.asarray(self._int_to_digit_list(1), np.int32),
            tuple(shape) + (self.nlimb,),
        )

    def from_i32(self, vals):
        """int32 array of small nonneg values -> canonical digits."""
        if self._on_host(vals):
            v = np.asarray(vals, dtype=np.int64)
            x = np.stack(
                [(v >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(4)], axis=-1
            )
            pad = [(0, 0)] * (x.ndim - 1) + [(0, self.nlimb - 4)]
            return self.np_reduce(np.pad(x, pad))
        v = jnp.asarray(vals, dtype=jnp.int32)
        digits = [(v >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(4)]
        x = jnp.stack(digits, axis=-1)
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.nlimb - 4)]
        return self._reduce_dev(jnp.pad(x, pad))

    # ------------------------------------------------------------ host path

    def _np_exact_carry(self, x):
        """Numpy exact carry over the digit axis (int64); returns
        (digits in [0,255], carry_out).

        Carries shrink by 2^8 per pass (|q| <= (|x|+255)/256), so a few
        whole-array shift passes replace the sequential per-digit loop --
        the loop's ~W numpy dispatches per call dominated the host SS
        engine at 100k-SNP protocol scale (QC profile: 60% of wall)."""
        x = np.asarray(x, dtype=np.int64)
        out = x.copy()
        carry_out = np.zeros(x.shape[:-1], dtype=np.int64)
        while True:
            q = out >> DIGIT_BITS
            if not q.any():
                return out, carry_out
            out -= q << DIGIT_BITS
            out[..., 1:] += q[..., :-1]
            carry_out += q[..., -1]

    def np_reduce(self, x) -> np.ndarray:
        """Host mirror of reduce(): any signed digit array -> canonical."""
        x = np.asarray(x, dtype=np.int64)
        L = self.nlimb
        if self._nlib is not None and 1 <= x.shape[-1] <= 2 * L - 1:
            nd = x.shape[-1]
            flat = np.ascontiguousarray(x.reshape(-1, nd))
            out = np.empty((flat.shape[0], L), np.int32)
            self._nlib.sfg_ring_reduce64(self._nid, flat, flat.shape[0], nd, out)
            return out.reshape(x.shape[:-1] + (L,))
        if x.shape[-1] < L:
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, L - x.shape[-1])])
        x, c_out = self._np_exact_carry(x)
        if x.shape[-1] > L:
            lo, hi = x[..., :L], x[..., L:]
            nh = hi.shape[-1]
            assert nh < L, "input too wide; reduce in chunks"
            if self.kind == "prime":
                contrib = np.pad(
                    hi * self.fold_c, [(0, 0)] * (x.ndim - 1) + [(0, L - nh)]
                )
                x = lo + contrib
                x[..., nh] += c_out * self.fold_c
            else:
                x = lo.copy()
        else:
            x = x.copy()
            if self.kind == "prime":
                x[..., 0] += c_out * self.fold_c
        for _ in range(2):
            x, c_out = self._np_exact_carry(x)
            if self.kind == "prime":
                x[..., 0] += c_out * self.fold_c
        x, _ = self._np_exact_carry(x)
        if self.kind == "prime":
            p = np.array(self._p_digits, dtype=np.int64)
            for _ in range((1 << (DIGIT_BITS * L)) // self.modulus):
                y = x - p
                y, borrow = self._np_exact_carry(y)
                x = np.where((borrow == 0)[..., None], y, x)
        else:
            x[..., -1] &= self.top_mask
        return x.astype(np.int32)

    def _np_conv(self, a, b) -> np.ndarray:
        """Digit convolution of canonical arrays -> [..., 2L-1] int64."""
        L = self.nlimb
        shape = np.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = np.broadcast_to(a, shape + (L,)).astype(np.int64)
        b = np.broadcast_to(b, shape + (L,)).astype(np.int64)
        conv = np.zeros(shape + (2 * L - 1,), dtype=np.int64)
        for i in range(L):
            conv[..., i : i + L] += a[..., i : i + 1] * b
        return conv

    def _exact_carry(self, x):
        """Sequential exact carry over the digit axis; returns (digits, carry_out).

        Output digits are in [0, 255]; carry_out = floor(value / 2^{8*D}),
        which is negative for negative values."""
        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, d):
            t = d + carry
            c = t >> DIGIT_BITS
            return c, t - (c << DIGIT_BITS)

        carry_out, ys = jax.lax.scan(step, jnp.zeros(x.shape[:-1], jnp.int32), xs)
        return jnp.moveaxis(ys, 0, -1), carry_out

    def reduce(self, x):
        if self._on_host(x):
            return self.np_reduce(x)
        return self._reduce_dev(x)

    @_jitmethod
    def _reduce_dev(self, x):
        """Reduce any signed digit array (any digit count >= 1; |digit| and
        all scan intermediates must fit int32) to canonical form in
        [0, modulus).

        Steps: exact carry over the (possibly extended) digit array; fold
        extra digits via 2^{8L} = fold_c (prime) or drop them (pow2); then
        scan/fold twice more to absorb the bounded residuals; finally a
        conditional subtract of p (prime) or top-bit mask (pow2)."""
        L = self.nlimb
        if x.shape[-1] < L:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, L - x.shape[-1])])
        # 1) exact carry on the full array -> digits in [0,255], small carry_out
        x, c_out = self._exact_carry(x)
        # 2) fold extra digits: digit L+i has weight 2^{8i} * 2^{8L}
        if x.shape[-1] > L:
            lo, hi = x[..., :L], x[..., L:]
            nh = hi.shape[-1]
            assert nh < L, "input too wide; reduce in chunks"
            if self.kind == "prime":
                contrib = jnp.pad(
                    hi * self.fold_c, [(0, 0)] * (x.ndim - 1) + [(0, L - nh)]
                )
                x = lo + contrib
                # carry_out has weight 2^{8*(L+nh)} = 2^{8*nh} * fold_c
                x = x.at[..., nh].add(c_out * self.fold_c)
            else:
                x = lo
        else:
            if self.kind == "prime":
                x = x.at[..., 0].add(c_out * self.fold_c)
        # 3) two more scan+fold rounds absorb the bounded residuals exactly
        for _ in range(2):
            x, c_out = self._exact_carry(x)
            if self.kind == "prime":
                x = x.at[..., 0].add(c_out * self.fold_c)
        x, _ = self._exact_carry(x)
        if self.kind == "prime":
            # value < 2^{8L}; subtract p enough times to reach [0, p)
            for _ in range((1 << (DIGIT_BITS * L)) // self.modulus):
                x = self._cond_sub_p(x)
        else:
            x = x.at[..., -1].set(x[..., -1] & self.top_mask)
        return x

    @_jitmethod
    def _cond_sub_p(self, x):
        """x in [0, 2^{8L}) -> subtract p if x >= p (one borrow scan)."""
        p = jnp.asarray(self._p_digits, dtype=jnp.int32)
        y = x - p
        y, borrow = self._exact_carry(y)
        ge = borrow == 0  # no final borrow => x >= p
        return jnp.where(ge[..., None], y, x)

    def _native_canon2(self, op, a, b):
        """Native elementwise op on two canonical int32 digit arrays, or
        None when the fast path doesn't apply.  Canonical inputs are int32
        by construction (every host producer canonicalizes); non-canonical
        intermediates are int64 and take the reduce path."""
        if (
            self._nlib is None
            or not isinstance(a, np.ndarray)
            or not isinstance(b, np.ndarray)
            or a.dtype != np.int32
            or b.dtype != np.int32
            or a.shape[-1] != self.nlimb
            or b.shape[-1] != self.nlimb
        ):
            return None
        shape = np.broadcast_shapes(a.shape, b.shape)
        af = np.ascontiguousarray(np.broadcast_to(a, shape)).reshape(-1, self.nlimb)
        bf = np.ascontiguousarray(np.broadcast_to(b, shape)).reshape(-1, self.nlimb)
        out = np.empty_like(af)
        op(self._nid, af, bf, af.shape[0], out)
        return out.reshape(shape)

    def add(self, a, b):
        if self._on_host(a, b):
            if self._nlib:
                out = self._native_canon2(self._nlib.sfg_ring_add, a, b)
                if out is not None:
                    return out
            return self.np_reduce(np.asarray(a, np.int64) + b)
        return self._add_dev(a, b)

    @_jitmethod
    def _add_dev(self, a, b):
        return self.reduce(a + b)

    def sub(self, a, b):
        if self._on_host(a, b):
            if self._nlib:
                out = self._native_canon2(self._nlib.sfg_ring_sub, a, b)
                if out is not None:
                    return out
            return self.np_reduce(np.asarray(a, np.int64) - b)
        return self._sub_dev(a, b)

    @_jitmethod
    def _sub_dev(self, a, b):
        return self.reduce(a - b)

    def neg(self, a):
        if self._on_host(a):
            if (
                self._nlib
                and isinstance(a, np.ndarray)
                and a.dtype == np.int32
                and a.shape[-1] == self.nlimb
            ):
                af = np.ascontiguousarray(a).reshape(-1, self.nlimb)
                out = np.empty_like(af)
                self._nlib.sfg_ring_neg(self._nid, af, af.shape[0], out)
                return out.reshape(a.shape)
            return self.np_reduce(-np.asarray(a, np.int64))
        return self._neg_dev(a)

    @_jitmethod
    def _neg_dev(self, a):
        return self.reduce(-a)

    def mul(self, a, b):
        if self._on_host(a, b):
            a = np.asarray(a)
            b = np.asarray(b)
            if self._nlib:
                out = self._native_canon2(self._nlib.sfg_ring_mul, a, b)
                if out is not None:
                    return out
            return self.np_reduce(self._np_conv(a, b))
        return self._mul_dev(a, b)

    @_jitmethod
    def _mul_dev(self, a, b):
        """Elementwise product of canonical digit arrays.

        Digit convolution out[d] = sum_{i+j=d} a_i*b_j (|.| < 2^21) as one
        gather + one contraction: a banded embed of b is gathered with a
        static index map, then contracted against a — far cheaper than a
        scatter-add loop over limbs (which cost ~5 ms/call on CPU)."""
        L = self.nlimb
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (L,))
        b = jnp.broadcast_to(b, shape + (L,))
        pad = [(0, 0)] * len(shape) + [(L - 1, L - 1)]
        bp = jnp.pad(b, pad)  # [..., 3L-2]
        idx = (jnp.arange(2 * L - 1)[None, :] - jnp.arange(L)[:, None]) + (L - 1)
        Bm = bp[..., idx]  # [..., L, 2L-1]
        out = jnp.einsum("...j,...jd->...d", a, Bm)
        return self.reduce(out)

    def mul_const(self, a, c_digits):
        if self._on_host(a, c_digits):
            return self.mul(a, np.broadcast_to(np.asarray(c_digits), a.shape))
        return self._mul_const_dev(a, c_digits)

    @_jitmethod
    def _mul_const_dev(self, a, c_digits):
        return self.mul(a, jnp.broadcast_to(c_digits, a.shape))

    def mul_int(self, a, v: int):
        """Multiply by a python int constant (fast path for small |v|)."""
        v = int(v)
        if -(1 << 9) < v < (1 << 9):
            if self._on_host(a):
                return self.np_reduce(np.asarray(a, np.int64) * v)
            return self.reduce(a * v)
        return self.mul(a, self.const_np(v) if self._on_host(a) else self.const(v))

    def matmul(self, A, B):
        if self._on_host(A, B):
            return self._np_matmul(np.asarray(A), np.asarray(B))
        return self._matmul_dev(A, B)

    def _np_matmul(self, A, B) -> np.ndarray:
        """Host [r, k, L] x [k, c, L] -> [r, c, L]; k chunked like the
        device path so digit-pair sums stay within the reduce headroom."""
        L = self.nlimb
        r, k, _ = A.shape
        k2, c, _ = B.shape
        assert k == k2
        if self._nlib and A.dtype == np.int32 and B.dtype == np.int32:
            Af = np.ascontiguousarray(A)
            Bf = np.ascontiguousarray(B)
            out = np.empty((r, c, L), np.int32)
            self._nlib.sfg_ring_matmul(self._nid, Af, Bf, r, k, c, out)
            return out
        max_k = 896
        out = None
        for k0 in range(0, k, max_k):
            Ak = A[:, k0 : k0 + max_k, :].astype(np.int64)
            Bk = B[k0 : k0 + max_k, :, :].astype(np.int64)
            M = np.einsum("ika,kjb->ijab", Ak, Bk)  # [r, c, L, L]
            conv = np.zeros((r, c, 2 * L - 1), dtype=np.int64)
            for i in range(L):
                conv[:, :, i : i + L] += M[:, :, i, :]
            part = self.np_reduce(conv)
            out = part if out is None else self.add(out, part)
        return out

    @_jitmethod
    def _matmul_dev(self, A, B):
        """[r, k, L] x [k, c, L] -> [r, c, L] modular matrix product."""
        L = self.nlimb
        r, k, _ = A.shape
        k2, c, _ = B.shape
        assert k == k2
        # Sum over k first per digit pair: M[d1,d2] = A[:,:,d1] @ B[:,:,d2]
        # then combine along the convolution diagonal.  K must satisfy
        # K * 255^2 * L < 2^31 (with margin for carries); chunk K otherwise.
        max_k = 896
        out = None
        for k0 in range(0, k, max_k):
            Ak = A[:, k0 : k0 + max_k, :]
            Bk = B[k0 : k0 + max_k, :, :]
            M = jnp.einsum("ika,kjb->ijab", Ak, Bk)  # [r, c, L, L] int32
            # banded-gather convolution (see mul): conv[d] = sum_j M[j, d-j]
            Mp = jnp.pad(M, [(0, 0), (0, 0), (0, 0), (L - 1, L - 1)])
            idx = (
                jnp.arange(2 * L - 1)[None, :] - jnp.arange(L)[:, None]
            ) + (L - 1)
            conv = jnp.take_along_axis(
                Mp, jnp.broadcast_to(idx, (r, c, L, 2 * L - 1)), axis=-1
            ).sum(axis=-2)
            part = self.reduce(conv)
            out = part if out is None else self.add(out, part)
        return out

    def dot_coeffs(self, a, coeffs):
        """sum_k a[..., k, :] * coeffs[k, :] as ONE contraction.

        The naive mul-then-sum materializes the banded convolution of the
        big operand ([..., k, L, 2L-1] — 30 GB at 100k-SNP protocol scale);
        here only the k small constants are band-embedded ([k, L, 2L-1])
        and the digit convolution + k-sum fuse into a single matmul-shaped
        einsum with an output-sized intermediate."""
        k, L = coeffs.shape
        assert L == self.nlimb and a.shape[-1] == L and a.shape[-2] == k
        if self._on_host(a, coeffs):
            a = np.asarray(a)
            c32 = np.asarray(coeffs)
            if self._nlib and a.dtype == np.int32 and c32.dtype == np.int32:
                # native path accumulates in 64-bit limbs: no k bound
                af = np.ascontiguousarray(a).reshape(-1, k, L)
                cf = np.ascontiguousarray(c32)
                out = np.empty((af.shape[0], L), np.int32)
                self._nlib.sfg_ring_dot(self._nid, af, cf, af.shape[0], k, out)
                return out.reshape(a.shape[:-2] + (L,))
            c = np.asarray(coeffs, np.int64)
            band = np.zeros((k, L, 2 * L - 1), np.int64)
            for i in range(L):
                band[:, i, i : i + L] = c
            conv = np.einsum(
                "...ki,kid->...d", np.asarray(a, np.int64), band
            )
            return self.np_reduce(conv)
        # device path: per-term products <= 255^2; k*L of them plus the
        # int32 carry-scan residual (up to ~1/255 of the digit) must stay
        # inside int32 (ADVICE r2: leave carry headroom, or chunk k)
        assert k * L * 255 * 255 < (1 << 31) * 255 // 256, \
            "chunk k: int32 overflow on device"
        return self._dot_coeffs_dev(a, jnp.asarray(coeffs))

    @_jitmethod
    def _dot_coeffs_dev(self, a, coeffs):
        k, L = coeffs.shape
        # band[k, i, d] = coeffs[k, d-i] (same banded embed as _mul_dev)
        cp = jnp.pad(coeffs, [(0, 0), (L - 1, L - 1)])
        idx = (jnp.arange(2 * L - 1)[None, :] - jnp.arange(L)[:, None]) + (L - 1)
        band = cp[:, idx]  # [k, L, 2L-1]
        return self.reduce(jnp.einsum("...ki,kid->...d", a, band))

    def sum(self, a, axis: int = 0):
        """Sum of canonical elements along a batch axis."""
        n = a.shape[axis]
        # canonical digits <= 255; summing n of them needs n * 255 < 2^31
        assert n < (1 << 22)
        if self._on_host(a):
            return self.np_reduce(np.sum(np.asarray(a, np.int64), axis=axis))
        return self._sum_dev(a, axis)

    @_jitmethod2
    def _sum_dev(self, a, axis: int = 0):
        return self.reduce(jnp.sum(a, axis=axis))

    # -------------------------------------------------------------- bit ops

    def get_bit(self, a, bit_index: int):
        """Bit of the canonical value (int32 0/1)."""
        d = bit_index // DIGIT_BITS
        r = bit_index % DIGIT_BITS
        return (a[..., d] >> r) & 1

    def bits_msb_first(self, a, nbits: int):
        """[..., nbits] bits of the canonical value, MSB first
        (matches reference numToBits, mpc/mpc.go:566)."""
        xp = np if self._on_host(a) else jnp
        outs = [self.get_bit(a, nbits - 1 - j) for j in range(nbits)]
        return xp.stack(outs, axis=-1)

    def trunc_low(self, a, m: int):
        """Keep the low m bits of the canonical value (RVec.Trunc)."""
        if self._on_host(a):
            d, r = m // DIGIT_BITS, m % DIGIT_BITS
            L = self.nlimb
            out = np.asarray(a).copy()
            out[..., d + (1 if r > 0 else 0):] = 0
            if r > 0 and d < L:
                out[..., d] &= (1 << r) - 1
            return out
        return self._trunc_low_dev(a, m)

    @_jitmethod2
    def _trunc_low_dev(self, a, m: int):
        d, r = m // DIGIT_BITS, m % DIGIT_BITS
        L = self.nlimb
        idx = jnp.arange(L)
        keep_full = idx < d
        part_mask = (1 << r) - 1
        out = jnp.where(keep_full, a, 0)
        if r > 0 and d < L:
            out = out.at[..., d].set(a[..., d] & part_mask)
        return out

    def const_np(self, v: int) -> np.ndarray:
        """Cached host digits for a python int constant."""
        v = int(v) % self.modulus
        key = ("const_np", v)
        if key not in self._cache:
            self._cache[key] = np.asarray(self._int_to_digit_list(v), dtype=np.int32)
        return self._cache[key]

    def pow2_digits(self, e: int) -> jnp.ndarray:
        return self.const(pow(2, e, self.modulus))

    def inv_pow2_np(self, m: int) -> np.ndarray:
        """Host digits of 2^{-m} mod p (prime only)."""
        assert self.kind == "prime"
        return self.const_np(pow((self.modulus + 1) // 2, m, self.modulus))

    def inv_pow2_digits(self, m: int) -> jnp.ndarray:
        """Digits of 2^{-m} mod p (prime only); cached like invPowCache."""
        assert self.kind == "prime"
        key = ("inv2", m)
        if key not in self._cache:
            inv2 = pow((self.modulus + 1) // 2, m, self.modulus)
            self._cache[key] = jnp.asarray(
                self._int_to_digit_list(inv2), dtype=jnp.int32
            )
        return self._cache[key]

    # ------------------------------------------------------------- sampling

    def rand(self, rng: np.random.Generator, shape) -> np.ndarray:
        """Host: uniform elements (negligible bias for p close to 2^{8L}).

        Uniform byte digits are already in canonical digit range, so only the
        final conditional subtract of p is needed (one borrow scan instead of
        _host_canon's four carry passes -- this is the Beaver-mask hot path)."""
        shape = tuple(shape)
        count = int(np.prod(shape, dtype=np.int64)) * self.nlimb if shape else self.nlimb
        raw8 = np.frombuffer(rng.bytes(count), np.uint8).reshape(
            shape + (self.nlimb,)
        )
        if self.kind != "prime":
            raw = raw8.astype(np.int32)
            raw[..., -1] &= self.top_mask
            return raw
        if (1 << (8 * self.nlimb)) - self.modulus < (1 << 32):
            # p = 2^{8L} - delta with tiny delta (p256 = 2^256 - 189): a raw
            # byte draw lands in [p, 2^{8L}) with probability delta/2^{8L}
            # ~ 2^-248 — statistically unreachable, so skip the
            # canonicalizing subtract (this is the Beaver-mask hot path:
            # the int64 widen + reduce tripled its memory traffic)
            return raw8.astype(np.int32)
        raw = raw8.astype(np.int64)
        if self._nlib is not None:
            # raw < 2^{8L} < 2p: reduce == the single conditional subtract
            return self.np_reduce(raw)
        p = np.array(self._p_digits, dtype=np.int64)
        y = raw - p
        borrow = np.zeros(raw.shape[:-1], dtype=np.int64)
        for j in range(self.nlimb):
            t = y[..., j] + borrow
            borrow = t >> DIGIT_BITS
            y[..., j] = t - (borrow << DIGIT_BITS)
        ge = borrow == 0
        return np.where(ge[..., None], y, raw).astype(np.int32)

    def rand_bits(self, rng: np.random.Generator, shape, nbits: int) -> np.ndarray:
        """Host: uniform in [0, 2^nbits)."""
        shape = tuple(shape)
        count = int(np.prod(shape, dtype=np.int64)) * self.nlimb if shape else self.nlimb
        raw = (
            np.frombuffer(rng.bytes(count), np.uint8)
            .reshape(shape + (self.nlimb,))
            .astype(np.int64)
        )
        d, r = nbits // DIGIT_BITS, nbits % DIGIT_BITS
        mask = np.zeros(self.nlimb, dtype=np.int64)
        mask[:d] = DIGIT_MASK
        if r > 0 and d < self.nlimb:
            mask[d] = (1 << r) - 1
        return (raw & mask).astype(np.int32)

    def _host_canon(self, x: np.ndarray) -> np.ndarray:
        """Host-side canonicalization (numpy int64, exact)."""
        L = self.nlimb
        x = x.astype(np.int64)
        for _ in range(2):
            c = x >> DIGIT_BITS
            x = x - (c << DIGIT_BITS)
            x[..., 1:] += c[..., :-1]
            if self.kind == "prime":
                x[..., 0] += c[..., -1] * self.fold_c
            # pow2: drop
        # exact pass
        carry = np.zeros(x.shape[:-1], dtype=np.int64)
        for j in range(L):
            t = x[..., j] + carry
            carry = t >> DIGIT_BITS
            x[..., j] = t - (carry << DIGIT_BITS)
        if self.kind == "prime":
            x[..., 0] += carry * self.fold_c
            carry = np.zeros(x.shape[:-1], dtype=np.int64)
            for j in range(L):
                t = x[..., j] + carry
                carry = t >> DIGIT_BITS
                x[..., j] = t - (carry << DIGIT_BITS)
            # conditional subtract p
            p = np.array(self._p_digits, dtype=np.int64)
            y = x - p
            borrow = np.zeros(x.shape[:-1], dtype=np.int64)
            for j in range(L):
                t = y[..., j] + borrow
                borrow = t >> DIGIT_BITS
                y[..., j] = t - (borrow << DIGIT_BITS)
            ge = borrow == 0
            x = np.where(ge[..., None], y, x)
        else:
            x[..., -1] &= self.top_mask
        return x.astype(np.int32)


# ---------------------------------------------------------------------------
# Shared ring instances

P256 = (1 << 256) - 189  # largest prime below 2^256
P127 = (1 << 127) - 1  # Mersenne prime

LElem256 = Ring(P256, "prime", "LElem256")
LElem128 = Ring(P127, "prime", "LElem128")
LElem2N256 = Ring(1 << 256, "pow2", "LElem2N256")
LElem2N127 = Ring(1 << 127, "pow2", "LElem2N127")


def field_for_size(field_size: int) -> Ring:
    """Map config mpc_field_size to a prime field (gwas/gwas.go:192-199)."""
    if field_size == 256:
        return LElem256
    if field_size == 128:
        return LElem128
    raise ValueError(f"unsupported mpc_field_size {field_size}")


def pow2_ring_for(field: Ring) -> Ring:
    """The power-of-two companion ring used by the binary-share comparison
    protocols (reference mpc/mpc.go:1682-1688)."""
    if field is LElem256:
        return LElem2N256
    if field is LElem128:
        return LElem2N127
    raise ValueError("no pow2 companion for ring")


class SmallField:
    """Small prime field for bit-share protocols (SElemDS/SElemC analogue).

    p = 46337 is the largest prime with p^2 < 2^31, so products of canonical
    elements fit int32 and we reduce after every multiply.  Host numpy, like
    GF2Ring: tiny round-lockstep tensors."""

    has_limbs = False
    host = True

    def __init__(self, p: int = 46337):
        self.modulus = p

    def __hash__(self):
        return hash(("small", self.modulus))

    def __eq__(self, other):
        return isinstance(other, SmallField) and other.modulus == self.modulus

    def zeros(self, shape):
        return np.zeros(shape, dtype=np.int32)

    def add(self, a, b):
        return (np.asarray(a) + np.asarray(b)) % self.modulus

    def sub(self, a, b):
        return (np.asarray(a) - np.asarray(b)) % self.modulus

    def neg(self, a):
        return (-np.asarray(a)) % self.modulus

    def mul(self, a, b):
        return (np.asarray(a) * np.asarray(b)) % self.modulus

    def matmul(self, A, B):
        """int64 accumulate then one mod (n * p^2 fits int64)."""
        out = np.asarray(A, np.int64) @ np.asarray(B, np.int64)
        return (out % self.modulus).astype(np.int32)

    def inv_int(self, v: int) -> int:
        return pow(int(v) % self.modulus, -1, self.modulus)

    def rand(self, rng: np.random.Generator, shape) -> np.ndarray:
        return rng.integers(0, self.modulus, size=shape, dtype=np.int64).astype(
            np.int32
        )


SElem = SmallField()


class GF2Ring:
    """GF(2) bit shares, unpacked: int8 arrays of 0/1 (BElem analogue).

    The reference packs 64 bits per uint64 word and manipulates them with
    shift tricks on the CPU (mpc/mpc.go:1161-1671); here bits are unpacked
    int8 lanes operated on HOST numpy.  The comparison networks are pure
    protocol glue -- tiny arrays, one op per network step -- where per-op
    device dispatch costs orders of magnitude more than the xor itself, so
    the host VPU is the right execution engine (the wide-data FLOPs all live
    in the HE/jax path)."""

    has_limbs = False
    modulus = 2
    host = True  # protocol helpers keep GF(2) arrays in numpy

    def __hash__(self):
        return hash("gf2")

    def __eq__(self, other):
        return isinstance(other, GF2Ring)

    def zeros(self, shape):
        return np.zeros(shape, dtype=np.int8)

    def add(self, a, b):
        return np.bitwise_xor(np.asarray(a), np.asarray(b))

    sub = add

    def neg(self, a):
        return a

    def mul(self, a, b):
        return np.bitwise_and(np.asarray(a), np.asarray(b))

    def rand(self, rng: np.random.Generator, shape) -> np.ndarray:
        shape = tuple(shape)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        raw = np.frombuffer(rng.bytes((n + 7) // 8), np.uint8)
        return np.unpackbits(raw)[:n].reshape(shape).astype(np.int8)


GF2 = GF2Ring()
