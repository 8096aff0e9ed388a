"""CKKS encode/decode: canonical embedding on the host.

Fast path: float64 numpy FFT (plain data, |values| * scale within float64
precision).  Exact path for big masked values (the SS<->HE conversions,
replacing the lattigo fork's EncodeRVecNew/DecodeRVec, mpc/ss.go:125,260):
double-double FFT in utils/ddfloat.py via encode_big/decode_big.

Slot layout: slots = N/2, slot j lives at the primitive 2N-th root of unity
with exponent 5^j mod 2N (the standard CKKS rotation group), conjugate pairs
filled automatically for real vectors.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..ops import rns
from .params import CkksParams


class Encoder:
    def __init__(self, params: CkksParams):
        self.params = params
        n = params.n
        self.n = n
        self.slots = params.slots
        two_n = 2 * n
        # rotation group exponents and positions: A_k holds exponent 2k+1
        rot = np.zeros(self.slots, dtype=np.int64)
        g = 1
        for j in range(self.slots):
            rot[j] = g
            g = (g * 5) % two_n
        self.rot = rot
        self.pos = ((rot - 1) // 2).astype(np.int64)  # position of slot j
        conj = (two_n - rot) % two_n
        self.pos_conj = ((conj - 1) // 2).astype(np.int64)
        self.psi = np.exp(1j * np.pi * np.arange(n) / n)
        self.psi_inv = np.conj(self.psi)
        # folded real/imag twiddles for the batched encode:
        # real(fft(A)/n * psi_inv) = re(fft)*re(psi_inv)/n - im(fft)*im(psi_inv)/n
        self.psi_inv_re_over_n = np.real(self.psi_inv) / n
        self.psi_inv_im_over_n = -np.imag(self.psi_inv) / n

    # ------------------------------------------------------------- float path

    def embed_inv(self, z: np.ndarray) -> np.ndarray:
        """slots (complex) -> real coefficient vector (float64, unrounded)."""
        A = np.zeros(self.n, dtype=np.complex128)
        A[self.pos] = z
        A[self.pos_conj] = np.conj(z)
        # a_i psi^i = (1/N) sum_k A_k e^{-2pi i ik/N} = fft(A)/N
        a = np.fft.fft(A) / self.n * self.psi_inv
        return np.real(a)

    def embed(self, coeffs: np.ndarray) -> np.ndarray:
        """real coefficients -> slot values (complex)."""
        # need A_k = sum_i a_i psi^i e^{+2pi i ik/N}; np.fft.fft uses e^{-...}
        A = np.conj(np.fft.fft(np.conj(np.asarray(coeffs, np.complex128) * self.psi)))
        return A[self.pos]

    def encode(self, values, scale: float, nmod: int) -> np.ndarray:
        """Real vector (len <= slots) -> RNS poly [nmod, N] (coeff domain)."""
        z = np.zeros(self.slots, dtype=np.complex128)
        v = np.asarray(values, dtype=np.float64)
        z[: len(v)] = v
        a = self.embed_inv(z) * scale
        coeffs = np.round(a)
        amax = float(np.abs(coeffs).max()) if coeffs.size else 0.0
        if amax < float(1 << 62):
            # vectorized residue path (the per-coefficient python-int loop
            # this replaces was ~1 s per vector at PN14): split each
            # coefficient as hi*2^31 + lo with 0 <= lo < 2^31, reduce both
            # halves per prime in uint64 (numpy int64 % follows floored
            # python semantics, so hi % q lands in [0, q))
            hi_f = np.floor(coeffs * (1.0 / (1 << 31)))
            lo = (coeffs - hi_f * float(1 << 31)).astype(np.uint64)
            hi = hi_f.astype(np.int64)
            qs = np.asarray(self.params.q_primes[:nmod], dtype=np.int64)
            him = (hi[None, :] % qs[:, None]).astype(np.uint64)
            qu = qs.astype(np.uint64)[:, None]
            r31 = (np.uint64(1 << 31) % qu).astype(np.uint64)
            res = (him * r31 % qu + lo[None, :] % qu) % qu
            return res.astype(np.uint32)
        ints = coeffs.astype(object)
        ints = [int(x) for x in ints]
        return rns.ints_to_rns(ints, self.params.q_primes[:nmod])

    def decode(self, poly_coeff, nmod: int, scale: float) -> np.ndarray:
        """RNS poly [nmod, N] (coeff domain) -> real slot values."""
        ints = rns.rns_to_ints(np.asarray(poly_coeff), self.params.q_primes[:nmod])
        a = np.array([float(x) for x in ints]) / scale
        return np.real(self.embed(a))

    # -------------------------------------------------------------- big path

    def encode_big(self, int_values: List[int], scale: float, nmod: int) -> np.ndarray:
        """Exact-ish encode of large integers (up to ~2^100) into slots at the
        given scale; used by the SS->HE conversion."""
        from ..utils.ddfloat import dd_embed_inv

        z = [0] * self.slots
        for i, v in enumerate(int_values):
            z[i] = int(v)
        coeff_ints = dd_embed_inv(self, z, scale)
        return rns.ints_to_rns(coeff_ints, self.params.q_primes[:nmod])

    def decode_big(self, poly_coeff, nmod: int, scale: float) -> List[int]:
        """Decode to (rounded) big integers; absolute error stays O(1) even
        for ~2^100-magnitude slot values."""
        from ..utils.ddfloat import dd_embed

        ints = rns.rns_to_ints(np.asarray(poly_coeff), self.params.q_primes[:nmod])
        return dd_embed(self, [int(x) for x in ints], scale)
