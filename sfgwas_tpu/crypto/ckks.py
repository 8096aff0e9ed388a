"""RNS-CKKS scheme on TPU: encrypt/decrypt, add, mult+relin, rescale,
rotate/conjugate via hybrid key switching.

Replaces the reference's Lattigo dependency (crypto/crypto.go, crypto/basics.go
wrap it; SURVEY.md §2.10).  Everything on-device is uint32 RNS arrays
[nprimes, N] in the (bit-reversed) NTT domain; the special prime is the last
row of the full basis.

Key switching: alpha = 1 hybrid gadget.  With per-prime digits the gadget
integer G_j = P*(Q/q_j)*((Q/q_j)^{-1} mod q_j) has residues [P mod q_j at row
j, 0 elsewhere], so switching keys are
    ksk[j] = (-a_j s + e_j + (P mod q_j) * s_src * 1_{row j},  a_j)
over the full basis, valid at every level (each digit term is = d or 0 mod
each active prime)."""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rns
from ..ops.rns import (
    add_mod,
    mul_mod_barrett,
    mul_mod_shoup,
    neg_mod,
    ntt,
    ntt_b,
    sub_mod,
    _mulhi32,
    _sel,
)
from .encoding import Encoder
from .params import CkksParams


@dataclass
class Plaintext:
    poly: jnp.ndarray  # [nmod, N], NTT domain
    nmod: int
    scale: float


@dataclass
class Ciphertext:
    c0: jnp.ndarray  # [nmod, N], NTT domain
    c1: jnp.ndarray
    nmod: int
    scale: float

    def copy(self) -> "Ciphertext":
        return Ciphertext(self.c0, self.c1, self.nmod, self.scale)


@dataclass
class SecretKey:
    s: jnp.ndarray  # [nq+1, N] NTT domain (full basis)


@dataclass
class PublicKey:
    p0: jnp.ndarray  # [nq+1, N]
    p1: jnp.ndarray


@dataclass
class KSwitchKey:
    """d0/d1: [beta, nq+1, N]; digit j covers prime j."""

    d0: jnp.ndarray
    d1: jnp.ndarray


GALOIS_CONJ = -1  # sentinel for complex conjugation


def _modsum_u32(x, q):
    """Modular sum over the leading axis of x [B, ..., N] (entries < q <
    2^26): chunked uint32 partial sums (32 x 2^26 < 2^32) with a remainder
    after each stage.  B <= 1024."""
    b = x.shape[0]
    assert b <= 1024, b
    pad = (-b) % 32
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    x = jnp.sum(x.reshape((-1, 32) + x.shape[1:]), axis=1) % q
    return jnp.sum(x, axis=0) % q


def _ctxjit(*static_extra):
    """jit with `self` (a CkksContext, hashed by identity) static, plus the
    given extra static argnums.  Fuses each compound CKKS op (rescale,
    modup/moddown, keyswitch, rotation) into ONE compiled kernel -- the
    unfused versions issued hundreds of small dispatches per op, which
    dominated protocol wall-clock (and on TPU each dispatch is a host
    roundtrip)."""

    def deco(fn):
        return functools.partial(jax.jit, static_argnums=(0,) + static_extra)(fn)

    return deco


class CkksContext:
    def __init__(self, params: CkksParams):
        self.params = params
        self.basis = params.basis
        self.encoder = Encoder(params)
        self.n = params.n
        self.nq = params.nq
        self.sp_row = params.sp_row
        self.full_rows = tuple(range(self.nq + 1))
        # m32 = floor(2^32 / q) for u32 Barrett of lazy sums
        q = np.array(self.basis.primes, dtype=np.uint64)
        self.m32 = jnp.asarray(((1 << 32) // q).astype(np.uint32))[:, None]
        # p_special^{-1} mod q_i (+ shoup)
        psp = self.params.special
        pinv = np.array(
            [pow(psp, -1, qi) for qi in self.params.q_primes], dtype=np.uint64
        )
        self.pinv = jnp.asarray(pinv.astype(np.uint32))[:, None]
        self.pinv_s = jnp.asarray(
            rns.shoup(pinv.astype(np.uint32)[:, None], q[: self.nq].astype(np.uint32)[:, None])
        )
        # q_top^{-1} mod q_i for rescale: host table [nq, nq]
        self._qinv = self.basis.qinv
        self._qmod = self.basis.qmod
        self._exps = None  # automorphism exponent table (lazy)
        self._perm_cache: Dict[int, jnp.ndarray] = {}
        self._const_cache: Dict = {}
        # tolerance-accepted scale drift on adds with no level left
        # (surfaced, never silent -- VERDICT r2 weak #8)
        self.scale_drift_accepts = 0
        self.scale_drift_max = 0.0

    # ------------------------------------------------------------- sampling

    def sample_ternary(self, rng: np.random.Generator) -> np.ndarray:
        """Ternary secret/encryption randomness in {-1,0,1}, p=1/3 each
        (coeff-domain small poly)."""
        return rng.integers(-1, 2, size=self.n, dtype=np.int64)

    def sample_gauss(self, rng: np.random.Generator, sigma: float = 3.19) -> np.ndarray:
        e = np.round(rng.normal(0, sigma, size=self.n)).astype(np.int64)
        return np.clip(e, -19, 19)

    def small_to_rns(self, small: np.ndarray, rows: Tuple[int, ...]) -> jnp.ndarray:
        """Coeff-domain small signed ints -> NTT-domain residues on rows."""
        out = np.zeros((len(rows), self.n), dtype=np.uint32)
        for k, r in enumerate(rows):
            qi = self.basis.primes[r]
            out[k] = np.mod(small, qi).astype(np.uint32)
        return ntt(jnp.asarray(out), self.basis, rows)

    def sample_uniform(self, rng: np.random.Generator, rows: Tuple[int, ...]) -> jnp.ndarray:
        """Uniform poly on rows (already valid in any domain; used as NTT)."""
        return self.sample_uniform_b(rng, rows, 1)[0]

    def sample_uniform_b(self, rng: np.random.Generator, rows, batch: int) -> jnp.ndarray:
        """Batched uniform residues [batch, len(rows), N]: one 64-bit draw
        folded per prime (statistical distance < 2^-38 from uniform), instead
        of per-row bounded-integer loops -- the keygen hot path.  Raw
        bit-generator output: Generator.integers' full-span path is ~80x
        slower (masked-rejection loop) than random_raw."""
        q = np.array([self.basis.primes[r] for r in rows], np.uint64)[None, :, None]
        raw = np.asarray(
            rng.bit_generator.random_raw(batch * len(rows) * self.n),
            dtype=np.uint64,
        ).reshape(batch, len(rows), self.n)
        return jnp.asarray((raw % q).astype(np.uint32))

    def small_to_rns_b(self, smalls: np.ndarray, rows) -> jnp.ndarray:
        """Batched small_to_rns: [B, N] coeff-domain signed smalls ->
        [B, len(rows), N] NTT-domain residues.  Residues computed on device
        (|small| << q, so mod q is one conditional add -- the host int64
        modulo loop this replaces dominated batched keygen)."""
        out = _small_to_rns_b_dev(
            jnp.asarray(np.ascontiguousarray(smalls, np.int32)),
            self.basis,
            tuple(rows),
        )
        return jnp.swapaxes(out, 0, 1)

    # -------------------------------------------------------------- keygen

    def gen_secret_key(self, rng: np.random.Generator) -> SecretKey:
        return SecretKey(self.small_to_rns(self.sample_ternary(rng), self.full_rows))

    def gen_public_key(self, sk: SecretKey, rng: np.random.Generator) -> PublicKey:
        rows = self.full_rows
        a = self.sample_uniform(rng, rows)
        e = self.small_to_rns(self.sample_gauss(rng), rows)
        t = _sel(self.basis, rows)
        p0 = add_mod(
            neg_mod(mul_mod_barrett(a, sk.s, t["q"], t["mu"]), t["q"]), e, t["q"]
        )
        return PublicKey(p0, a)

    def _gadget_terms(self, s_src: jnp.ndarray) -> jnp.ndarray:
        """(P mod q_j) * s_src[j] per digit row j: [nq, N]."""
        psp = self.params.special
        qv = np.array(self.params.q_primes, np.uint64)
        pj = np.array([psp % qj for qj in self.params.q_primes], np.uint64)
        pj_dev = jnp.asarray(pj.astype(np.uint32))[:, None]
        pj_sh = jnp.asarray(((pj << np.uint64(32)) // qv).astype(np.uint32))[:, None]
        t = _sel(self.basis, self.full_rows)
        return mul_mod_shoup(s_src[: self.nq], pj_dev, pj_sh, t["q"][: self.nq])

    def kswitch_share(
        self, s_tgt: jnp.ndarray, s_diag: Optional[jnp.ndarray],
        a: jnp.ndarray, e: jnp.ndarray,
    ) -> jnp.ndarray:
        """Batched switching-key share for all digits at once:
        share[j] = -a[j]*s_tgt + e[j] (+ (P mod q_j)*s_diag[j] at row j).
        a, e: [nq, nq+1, N]; returns [nq, nq+1, N]."""
        t = _sel(self.basis, self.full_rows)
        q, mu = t["q"][None], t["mu"][None]
        k0 = add_mod(
            neg_mod(mul_mod_barrett(a, s_tgt[None], q, mu), q), e, q
        )
        if s_diag is not None:
            terms = self._gadget_terms(s_diag)
            diag = jnp.arange(self.nq)
            k0 = k0.at[diag, diag].set(
                add_mod(k0[diag, diag], terms, t["q"][: self.nq])
            )
        return k0

    @_ctxjit()
    def kswitch_share_many(self, s_tgt, s_diag_b, a, e):
        """kswitch_share for B keys in ONE fused kernel (the RTG chunk path):
        s_diag_b [B, nq+1, N]; a, e [B, nq, nq+1, N] -> [B, nq, nq+1, N]."""
        t = _sel(self.basis, self.full_rows)
        q, mu = t["q"][None, None], t["mu"][None, None]
        k0 = add_mod(
            neg_mod(mul_mod_barrett(a, s_tgt[None, None], q, mu), q), e, q
        )
        terms = self._gadget_terms_b(s_diag_b)  # [B, nq, N]
        diag = jnp.arange(self.nq)
        return k0.at[:, diag, diag].set(
            add_mod(k0[:, diag, diag], terms, t["q"][None, : self.nq])
        )

    def _gadget_terms_b(self, s_src_b: jnp.ndarray) -> jnp.ndarray:
        """(P mod q_j) * s_src_b[:, j] per digit row j: [B, nq, N]."""
        psp = self.params.special
        qv = np.array(self.params.q_primes, np.uint64)
        pj = np.array([psp % qj for qj in self.params.q_primes], np.uint64)
        pj_dev = pj.astype(np.uint32)[None, :, None]
        pj_sh = ((pj << np.uint64(32)) // qv).astype(np.uint32)[None, :, None]
        t = _sel(self.basis, self.full_rows)
        return mul_mod_shoup(
            s_src_b[:, : self.nq], pj_dev, pj_sh, t["q"][None, : self.nq]
        )

    def automorphism_many(self, poly, gs) -> jnp.ndarray:
        """sigma_g(poly) for many Galois elements: [B, ...poly shape]."""
        perms = self.perms_for(gs)  # [B, N]
        extra = (1,) * (np.ndim(poly) - 1)
        return jnp.take_along_axis(
            jnp.broadcast_to(poly[None], (len(gs),) + poly.shape),
            perms.reshape((len(gs),) + extra + (-1,)),
            axis=-1,
        )

    def gen_kswitch_key(
        self, s_src: jnp.ndarray, sk: SecretKey, rng: np.random.Generator
    ) -> KSwitchKey:
        """Key switching s_src -> sk (both [nq+1, N] NTT); all digits
        generated in one batched pass."""
        a = self.sample_uniform_b(rng, self.full_rows, self.nq)
        e = self.small_to_rns_b(
            np.stack([self.sample_gauss(rng) for _ in range(self.nq)]),
            self.full_rows,
        )
        return KSwitchKey(self.kswitch_share(sk.s, s_src, a, e), a)

    def gen_relin_key(self, sk: SecretKey, rng: np.random.Generator) -> KSwitchKey:
        rows = self.full_rows
        t = _sel(self.basis, rows)
        s2 = mul_mod_barrett(sk.s, sk.s, t["q"], t["mu"])
        return self.gen_kswitch_key(s2, sk, rng)

    def gen_rot_key(self, sk: SecretKey, g: int, rng: np.random.Generator) -> KSwitchKey:
        s_g = self.automorphism(sk.s, g)
        return self.gen_kswitch_key(s_g, sk, rng)

    def kswitch_share_many_sliced(self, s_tgt, s_diag_b, a, e, key_nmod: int):
        """kswitch_share_many restricted to the first key_nmod digits and
        rows (0..key_nmod-1, special).  Rotations only ever run at the
        matmult working band, so keys need no more (and the device->host
        readback a full key set would cost is ~100x slower than this
        compute).  a, e: [B, key_nmod, key_nmod+1, N]."""
        rows = tuple(range(key_nmod)) + (self.sp_row,)
        t = _sel(self.basis, rows)
        q, mu = t["q"][None, None], t["mu"][None, None]
        st = s_tgt[jnp.asarray(rows)]
        k0 = add_mod(
            neg_mod(mul_mod_barrett(a, st[None, None], q, mu), q), e, q
        )
        terms = self._gadget_terms_b(s_diag_b)[:, :key_nmod]  # [B, kn, N]
        diag = jnp.arange(key_nmod)
        return k0.at[:, diag, diag].set(
            add_mod(k0[:, diag, diag], terms, t["q"][None, :key_nmod])
        )

    def gen_rot_keys_batched(
        self,
        sk: SecretKey,
        gels,
        rng: np.random.Generator,
        key_nmod: Optional[int] = None,
        chunk: int = 16,
    ) -> Dict[int, KSwitchKey]:
        """Local (non-collective) rotation keygen for many Galois elements:
        device-side uniform sampling, one fused share kernel per chunk,
        keys kept DEVICE-resident sliced to key_nmod digits/rows."""
        key_nmod = min(key_nmod or self.nq, self.nq)
        rows = tuple(range(key_nmod)) + (self.sp_row,)
        nr = len(rows)
        seed = (
            np.uint32(rng.integers(0, 1 << 32, dtype=np.uint64)),
            np.uint32(rng.integers(0, 1 << 32, dtype=np.uint64)),
        )
        out: Dict[int, KSwitchKey] = {}
        for c0 in range(0, len(gels), chunk):
            gs = list(gels[c0 : c0 + chunk])
            B = len(gs)
            a = device_uniform_b(
                self, rows, B * key_nmod, seed, np.uint32(c0)
            ).reshape(B, key_nmod, nr, self.n)
            e = self.small_to_rns_b(
                np.stack(
                    [self.sample_gauss(rng) for _ in range(B * key_nmod)]
                ),
                rows,
            ).reshape(B, key_nmod, nr, self.n)
            s_g = self.automorphism_many(sk.s, gs)
            sh = self.kswitch_share_many_sliced(sk.s, s_g, a, e, key_nmod)
            for i, g in enumerate(gs):
                out[g] = KSwitchKey(sh[i], a[i])
        return out

    # ---------------------------------------------------------- encode path

    def encode(self, values, nmod: int, scale: Optional[float] = None) -> Plaintext:
        scale = scale or self.params.scale
        poly = self.encoder.encode(values, scale, nmod)
        rows = tuple(range(nmod))
        return Plaintext(ntt(jnp.asarray(poly), self.basis, rows), nmod, scale)

    def decode(self, pt: Plaintext) -> np.ndarray:
        rows = tuple(range(pt.nmod))
        coeff = ntt(pt.poly, self.basis, rows, inverse=True)
        return self.encoder.decode(np.asarray(coeff), pt.nmod, pt.scale)

    # --------------------------------------------------------- encrypt path

    def encrypt(self, pt: Plaintext, pk: PublicKey, rng: np.random.Generator) -> Ciphertext:
        nmod = pt.nmod
        rows = tuple(range(nmod))
        t = _sel(self.basis, rows)
        v = self.small_to_rns(self.sample_ternary(rng), rows)
        e0 = self.small_to_rns(self.sample_gauss(rng), rows)
        e1 = self.small_to_rns(self.sample_gauss(rng), rows)
        c0 = add_mod(
            add_mod(mul_mod_barrett(v, pk.p0[:nmod], t["q"], t["mu"]), e0, t["q"]),
            pt.poly,
            t["q"],
        )
        c1 = add_mod(mul_mod_barrett(v, pk.p1[:nmod], t["q"], t["mu"]), e1, t["q"])
        return Ciphertext(c0, c1, nmod, pt.scale)

    def decrypt(self, ct: Ciphertext, sk: SecretKey) -> Plaintext:
        rows = tuple(range(ct.nmod))
        t = _sel(self.basis, rows)
        m = add_mod(
            ct.c0, mul_mod_barrett(ct.c1, sk.s[: ct.nmod], t["q"], t["mu"]), t["q"]
        )
        return Plaintext(m, ct.nmod, ct.scale)

    # ------------------------------------------------------------- levels

    def drop_to(self, ct: Ciphertext, nmod: int) -> Ciphertext:
        """Drop moduli without rescaling (level alignment)."""
        assert nmod <= ct.nmod
        return Ciphertext(ct.c0[:nmod], ct.c1[:nmod], nmod, ct.scale)

    def _match(self, a: Ciphertext, b: Ciphertext):
        nmod = min(a.nmod, b.nmod)
        return self.drop_to(a, nmod), self.drop_to(b, nmod), tuple(range(nmod))

    # ---------------------------------------------------------- arithmetic

    # paired-prime rescaling leaves scales drifting off the preset scale by
    # the pair-product/Delta ratio -- MEASURED 0.5-1.9% per pair on the
    # PN14 chain (pair(10,9)=1.0110x, pair(8,7)=1.0135x), NOT the 2e-4 a
    # sign-balanced pairing would give; two rescales compound to ~2.5%.
    # Scales within _SCALE_EQ are absorbed by keeping the first operand's
    # scale (value error = the mismatch, under the fixed-point noise
    # floor).  Past it, add/sub -- AND add_plain -- EXACTLY align the
    # operands by folding the ratio into a scale-targeted constant
    # multiply (SetScale); the collective bootstrap's sub-top reset is the
    # other hard realignment point.
    _SCALE_EQ = 5e-4
    # fallback when no level is left to align with: tolerate only drift-
    # sized mismatch (paired primes keep per-level drift ~1e-3)
    _SCALE_TOL = 2.5e-2
    # SFGWAS_STRICT_SCALE=1 (debug builds): the counted tolerance
    # acceptances above _SCALE_EQ become hard failures, so a NEW drifted
    # path fails loudly at its first add instead of shifting statistics by
    # ~maf (the round-4 ynew DC-bias class, DESIGN.md case study)
    _STRICT = bool(os.environ.get("SFGWAS_STRICT_SCALE"))

    def _align_scales(self, a: Ciphertext, b: Ciphertext):
        """Bring two ciphertexts to exactly equal scales.  Unequal-depth
        chains legitimately diverge (pair products are not identical); the
        lower-scale operand is multiplied by a constant-one plaintext whose
        encoding scale retargets it to the other's scale (costs one level +
        negligible noise)."""
        if abs(a.scale / b.scale - 1) < self._SCALE_EQ:
            return a, b
        if min(a.nmod, b.nmod) < self.params.base_nmod + 2:
            # no level to burn: paired primes bound the resulting value
            # error to the drift size.  Counted and surfaced (never silent):
            # a hot path hitting this repeatedly is a level-budget bug.
            tol = self._SCALE_EQ if self._STRICT else self._SCALE_TOL
            assert abs(a.scale / b.scale - 1) < tol, (
                a.scale,
                b.scale,
            )
            self.scale_drift_accepts += 1
            drift = abs(a.scale / b.scale - 1)
            if drift > self.scale_drift_max:
                self.scale_drift_max = drift
            if self.scale_drift_accepts in (1, 10, 100, 1000, 10000):
                from ..utils.log import log

                log(
                    f"ckks: tolerance-aligned add #{self.scale_drift_accepts} "
                    f"(rel drift {drift:.2e}, max {self.scale_drift_max:.2e})"
                )
            return a, b
        import os as _os
        if _os.environ.get("SFGWAS_TRACE_ALIGN"):
            import traceback
            st = [l for l in traceback.format_stack()[-8:-2]]
            print(f"ALIGN {a.scale:.6e} vs {b.scale:.6e} nmod {a.nmod},{b.nmod}\n" + "".join(st[-3:]), flush=True)
        if a.scale < b.scale:
            a = self.rescale(self.mul_const_to(a, 1.0, b.scale))
        else:
            b = self.rescale(self.mul_const_to(b, 1.0, a.scale))
        return a, b

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._align_scales(a, b)
        a, b, rows = self._match(a, b)
        t = _sel(self.basis, rows)
        return Ciphertext(
            add_mod(a.c0, b.c0, t["q"]), add_mod(a.c1, b.c1, t["q"]), a.nmod, a.scale
        )

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._align_scales(a, b)
        a, b, rows = self._match(a, b)
        t = _sel(self.basis, rows)
        return Ciphertext(
            sub_mod(a.c0, b.c0, t["q"]), sub_mod(a.c1, b.c1, t["q"]), a.nmod, a.scale
        )

    def neg(self, a: Ciphertext) -> Ciphertext:
        t = _sel(self.basis, tuple(range(a.nmod)))
        return Ciphertext(neg_mod(a.c0, t["q"]), neg_mod(a.c1, t["q"]), a.nmod, a.scale)

    def add_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        # Scale alignment is as mandatory here as in ct+ct adds: a raw poly
        # add of a plaintext encoded at the preset scale onto a ciphertext
        # whose scale has drifted through paired-prime rescales misdecodes
        # the PLAINTEXT by the full ratio.  PN14's pairs sit up to 1.9%
        # above the preset scale, so two rescales put a ct ~2.5% below it
        # -- exactly the DC bias that corrupted the round-4 ynew
        # (y*(scale_pt/scale_ct) - Qproj instead of y - Qproj).  When the
        # ciphertext has a level to burn, retarget it EXACTLY onto the
        # plaintext's scale (SetScale); at the floor, fall back to the
        # counted drift tolerance like _align_scales.
        if abs(a.scale / pt.scale - 1) >= self._SCALE_EQ:
            if min(a.nmod, pt.nmod) >= self.params.base_nmod + 2:
                a = self.rescale(self.mul_const_to(a, 1.0, pt.scale))
            else:
                tol = self._SCALE_EQ if self._STRICT else self._SCALE_TOL
                assert abs(a.scale / pt.scale - 1) < tol, (
                    a.scale,
                    pt.scale,
                )
                self.scale_drift_accepts += 1
                drift = abs(a.scale / pt.scale - 1)
                if drift > self.scale_drift_max:
                    self.scale_drift_max = drift
        nmod = min(a.nmod, pt.nmod)
        t = _sel(self.basis, tuple(range(nmod)))
        return Ciphertext(
            add_mod(a.c0[:nmod], pt.poly[:nmod], t["q"]), a.c1[:nmod], nmod, a.scale
        )

    def mul_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        nmod = min(a.nmod, pt.nmod)
        c0, c1 = self._mul_pair(a.c0[:nmod], a.c1[:nmod], pt.poly[:nmod], nmod)
        return Ciphertext(c0, c1, nmod, a.scale * pt.scale)

    @_ctxjit(4)
    def _mul_pair(self, c0, c1, p, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        return (
            mul_mod_barrett(c0, p, t["q"], t["mu"]),
            mul_mod_barrett(c1, p, t["q"], t["mu"]),
        )

    @_ctxjit(4)
    def mul_plain_many_b(self, c0, c1, pts, nmod: int):
        """ONE ciphertext x B stacked plaintexts [B, nmod, N] -> B
        unrescaled product pairs ([B, nmod, N] x2) in one kernel (the
        batched mask path: 100+ one-hot masks per cholQR/Gram pass)."""
        t = _sel(self.basis, tuple(range(nmod)))
        q, mu = t["q"], t["mu"]
        return (
            mul_mod_barrett(c0[None], pts, q, mu),
            mul_mod_barrett(c1[None], pts, q, mu),
        )

    @_ctxjit(4)
    def mul_plain_pairs_sum(self, c0s, c1s, pts, nmod: int):
        """sum_b ct_b * pt_b over B (ciphertext, plaintext) pairs in ONE
        kernel: the batched mask-scatter-accumulate (replaces B mask calls
        + B-1 adds).  Returns the unrescaled (c0, c1) sum mod q."""
        t = _sel(self.basis, tuple(range(nmod)))
        q, mu = t["q"], t["mu"]
        p0 = mul_mod_barrett(c0s, pts, q, mu)
        p1 = mul_mod_barrett(c1s, pts, q, mu)
        return _modsum_u32(p0, q), _modsum_u32(p1, q)

    def mul_relin(self, a: Ciphertext, b: Ciphertext, rlk: KSwitchKey) -> Ciphertext:
        a, b, rows = self._match(a, b)
        c0, c1 = self._mul_relin_core(
            a.c0, a.c1, b.c0, b.c1, rlk.d0, rlk.d1, a.nmod
        )
        return Ciphertext(c0, c1, a.nmod, a.scale * b.scale)

    @_ctxjit(7)
    def _mul_relin_core(self, ac0, ac1, bc0, bc1, kd0, kd1, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        d0 = mul_mod_barrett(ac0, bc0, t["q"], t["mu"])
        d1 = add_mod(
            mul_mod_barrett(ac0, bc1, t["q"], t["mu"]),
            mul_mod_barrett(ac1, bc0, t["q"], t["mu"]),
            t["q"],
        )
        d2 = mul_mod_barrett(ac1, bc1, t["q"], t["mu"])
        k0, k1 = self._keyswitch_decomposed_arr(
            self.decompose_ntt(d2, nmod), kd0, kd1, nmod
        )
        return add_mod(d0, k0, t["q"]), add_mod(d1, k1, t["q"])

    def mul_relin_many(self, a: Ciphertext, bs, rlk: KSwitchKey):
        """a * b_j for a list of ciphertexts b_j sharing a's level and a
        common scale: ONE fused kernel (products + batched relinearization
        under the shared key) instead of len(bs) separate keyswitches."""
        nmod = min([a.nmod] + [b.nmod for b in bs])
        aa = self.drop_to(a, nmod)
        bsd = [self.drop_to(b, nmod) for b in bs]
        bc0 = jnp.stack([b.c0 for b in bsd])
        bc1 = jnp.stack([b.c1 for b in bsd])
        c0, c1 = self._mul_relin_many_core(
            aa.c0, aa.c1, bc0, bc1, rlk.d0, rlk.d1, nmod
        )
        return [
            Ciphertext(c0[j], c1[j], nmod, aa.scale * b.scale)
            for j, b in enumerate(bsd)
        ]

    def mul_relin_pairs(self, xs, ys, rlk: KSwitchKey):
        """x_e * y_e elementwise over two equal-length ciphertext lists at a
        common level: ONE fused kernel for all B pairwise products + batched
        relinearization.  The cholQR/Gram hot path calls this once per pass
        instead of ncols mul_relin_many calls of DIFFERENT batch sizes
        (which forced ncols separate compiles, the round-4 PCA stall)."""
        assert len(xs) == len(ys)
        nmod = min(min(x.nmod for x in xs), min(y.nmod for y in ys))
        xsd = [self.drop_to(x, nmod) for x in xs]
        ysd = [self.drop_to(y, nmod) for y in ys]
        ac0 = jnp.stack([x.c0 for x in xsd])
        ac1 = jnp.stack([x.c1 for x in xsd])
        bc0 = jnp.stack([y.c0 for y in ysd])
        bc1 = jnp.stack([y.c1 for y in ysd])
        c0, c1 = self._mul_relin_pairs_core(
            ac0, ac1, bc0, bc1, rlk.d0, rlk.d1, nmod
        )
        return [
            Ciphertext(c0[j], c1[j], nmod, xsd[j].scale * ysd[j].scale)
            for j in range(len(xsd))
        ]

    @_ctxjit(7)
    def _mul_relin_pairs_core(self, ac0s, ac1s, bc0s, bc1s, kd0, kd1, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        q, mu = t["q"], t["mu"]
        d0 = mul_mod_barrett(ac0s, bc0s, q, mu)
        d1 = add_mod(
            mul_mod_barrett(ac0s, bc1s, q, mu),
            mul_mod_barrett(ac1s, bc0s, q, mu),
            q,
        )
        d2 = mul_mod_barrett(ac1s, bc1s, q, mu)
        ext = self.decompose_ntt_b(d2, nmod)  # [B, nmod, next, N]
        ridx = jnp.asarray(tuple(range(nmod)) + (self.sp_row,))
        k0 = kd0[:nmod][:, ridx][None]
        k1 = kd1[:nmod][:, ridx][None]
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        te = _sel(self.basis, ext_rows)
        qe, me = te["q"][None, None], te["mu"][None, None]
        p0 = jnp.sum(
            mul_mod_barrett(ext, k0, qe, me), axis=1, dtype=jnp.uint32
        )
        p1 = jnp.sum(
            mul_mod_barrett(ext, k1, qe, me), axis=1, dtype=jnp.uint32
        )
        k0s = self._moddown_b(self._reduce_u32(p0, ext_rows), nmod)
        k1s = self._moddown_b(self._reduce_u32(p1, ext_rows), nmod)
        return add_mod(d0, k0s, q), add_mod(d1, k1s, q)

    @_ctxjit(7)
    def _mul_relin_many_core(self, ac0, ac1, bc0s, bc1s, kd0, kd1, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        q, mu = t["q"], t["mu"]
        d0 = mul_mod_barrett(ac0[None], bc0s, q, mu)
        d1 = add_mod(
            mul_mod_barrett(ac0[None], bc1s, q, mu),
            mul_mod_barrett(ac1[None], bc0s, q, mu),
            q,
        )
        d2 = mul_mod_barrett(ac1[None], bc1s, q, mu)
        ext = self.decompose_ntt_b(d2, nmod)  # [B, nmod, next, N]
        ridx = jnp.asarray(tuple(range(nmod)) + (self.sp_row,))
        k0 = kd0[:nmod][:, ridx][None]
        k1 = kd1[:nmod][:, ridx][None]
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        te = _sel(self.basis, ext_rows)
        qe, me = te["q"][None, None], te["mu"][None, None]
        p0 = jnp.sum(
            mul_mod_barrett(ext, k0, qe, me), axis=1, dtype=jnp.uint32
        )
        p1 = jnp.sum(
            mul_mod_barrett(ext, k1, qe, me), axis=1, dtype=jnp.uint32
        )
        k0s = self._moddown_b(self._reduce_u32(p0, ext_rows), nmod)
        k1s = self._moddown_b(self._reduce_u32(p1, ext_rows), nmod)
        return add_mod(d0, k0s, q), add_mod(d1, k1s, q)

    # ------------------------------------------------------------ rescale

    def rescale_one(self, ct: Ciphertext) -> Ciphertext:
        """Drop the top active prime, dividing the message by it."""
        nmod = ct.nmod
        assert nmod > self.params.base_nmod, (
            f"level underflow: rescale at nmod={nmod} "
            f"(base={self.params.base_nmod}); bootstrap first"
        )
        src = nmod - 1
        c0, c1 = self._rescale_pair(ct.c0, ct.c1, src)
        return Ciphertext(c0, c1, src, ct.scale / self.basis.primes[src])

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        """One logical level = two primes (scale ~2^50); both prime drops
        and both components fused in one kernel."""
        nmod = ct.nmod
        assert nmod - 1 > self.params.base_nmod, (
            f"level underflow: rescale at nmod={nmod} "
            f"(base={self.params.base_nmod}); bootstrap first"
        )
        c0, c1 = self._rescale2_pair(ct.c0, ct.c1, nmod - 1)
        return Ciphertext(
            c0,
            c1,
            nmod - 2,
            ct.scale / self.basis.primes[nmod - 1] / self.basis.primes[nmod - 2],
        )

    @_ctxjit(3)
    def _rescale_pair(self, c0, c1, src: int):
        c = jnp.stack([c0, c1])  # [2, src+1, N]
        out = self._rescale_poly_b(c, src)
        return out[0], out[1]

    @_ctxjit(3)
    def _rescale2_pair(self, c0, c1, src: int):
        c = jnp.stack([c0, c1])
        c = self._rescale_poly_b(c, src)
        c = self._rescale_poly_b(c, src - 1)
        return c[0], c[1]

    @_ctxjit(2)
    def rescale2_many(self, c, src: int):
        """Batched double-prime rescale: c [B, src+1, N] -> [B, src-1, N]
        (one program for a whole matmult output row set)."""
        c = self._rescale_poly_b(c, src)
        return self._rescale_poly_b(c, src - 1)

    def _rescale_poly_b(self, c, src: int):
        """c: [B, src+1, N] NTT -> [B, src, N] divided by q_src (traced)."""
        dst = tuple(range(src))
        top = ntt_b(c[:, src][None], self.basis, (src,), True)[0]  # [B, N]
        ext = self._extend(top, src, dst)  # [len(dst), B, N] coeff
        ext = jnp.swapaxes(ntt_b(ext, self.basis, dst), 0, 1)  # [B, dst, N]
        t = _sel(self.basis, dst)
        diff = sub_mod(c[:, : len(dst)], ext, t["q"])
        qinv, qinv_s = self._rescale_tables(src, dst)
        return mul_mod_shoup(diff, qinv, qinv_s, t["q"])

    def _rescale_poly(self, c, src: int, dst: Tuple[int, ...]):
        assert dst == tuple(range(src))
        return self._rescale_poly_b(c[None], src)[0]

    def _rescale_tables(self, src: int, dst: Tuple[int, ...]):
        key = ("rsc", src, tuple(dst))
        if key not in self._const_cache:
            qinv = np.array([self._qinv[src, d] for d in dst], dtype=np.uint32)
            qinv_s = np.array(
                [
                    (int(self._qinv[src, d]) << 32) // self.basis.primes[d]
                    for d in dst
                ],
                dtype=np.uint32,
            )
            self._const_cache[key] = (qinv[:, None], qinv_s[:, None])
        return self._const_cache[key]

    def _ext_tables(self, srcs: Tuple[int, ...], dst: Tuple[int, ...]):
        """Host tables for centered base extension srcs -> dst."""
        key = ("ext", tuple(srcs), tuple(dst))
        if key not in self._const_cache:
            qs = np.array([self.basis.primes[s] for s in srcs], np.uint64)
            qd = np.array([self.basis.primes[d] for d in dst], np.uint64)
            self._const_cache[key] = (
                (qs // 2).astype(np.uint32),  # [S]
                qd.astype(np.uint32),  # [D]
                (qs[:, None] % qd[None, :]).astype(np.uint32),  # [S, D]
            )
        return self._const_cache[key]

    def _extend(self, v, src: int, dst: Tuple[int, ...]):
        """Centered base extension of coeff-domain residues v (prime src)
        to the dst primes.  [..., N] -> [len(dst), ..., N]."""
        half, qd, corr = self._ext_tables((src,), dst)
        D = len(dst)
        ex = (1,) * (v.ndim - 1)
        qdv = qd.reshape((D,) + ex + (1,))
        corrv = corr[0].reshape((D,) + ex + (1,))
        sign = v > jnp.uint32(int(half[0]))
        r = jnp.broadcast_to(v[None], (D,) + v.shape)
        r = jnp.where(r >= qdv, r - qdv, r)
        r = jnp.where(r >= qdv, r - qdv, r)
        r_neg = jnp.where(r >= corrv, r - corrv, r + qdv - corrv)
        return jnp.where(sign[None], r_neg, r)

    def _extend_multi(self, v, srcs: Tuple[int, ...], dst: Tuple[int, ...]):
        """Per-row centered base extension: v [S, ..., N] with source prime
        srcs[i] for row i -> [S, len(dst), ..., N].  One fused op replacing
        the per-source loop in the keyswitch ModUp."""
        half, qd, corr = self._ext_tables(srcs, dst)
        S, D = len(srcs), len(dst)
        ex = (1,) * (v.ndim - 2)
        qdv = qd.reshape((1, D) + ex + (1,))
        corrv = corr.reshape((S, D) + ex + (1,))
        halfv = half.reshape((S,) + ex + (1,))
        sign = v > halfv  # [S, ..., N]
        r = jnp.broadcast_to(v[:, None], (S, D) + v.shape[1:])
        r = jnp.where(r >= qdv, r - qdv, r)
        r = jnp.where(r >= qdv, r - qdv, r)
        r_neg = jnp.where(r >= corrv, r - corrv, r + qdv - corrv)
        return jnp.where(sign[:, None], r_neg, r)

    # ---------------------------------------------------------- keyswitch

    @_ctxjit(2)
    def decompose_ntt(self, d, nmod: int):
        """ModUp: NTT poly d [nmod, N] -> per-digit extensions
        [nmod, nmod+1, N] over (active primes + special), NTT domain.
        This is the expensive half of a key switch; hoisted rotations reuse
        it across many Galois elements."""
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        d_coeff = ntt(d, self.basis, tuple(range(nmod)), inverse=True)
        ext = self._extend_multi(d_coeff, tuple(range(nmod)), ext_rows)
        # batched NTT sharing twiddles per prime row (the digit axis is the
        # batch): constants stay [len(ext_rows), N] instead of the row-
        # replicated [nmod*len(ext_rows), N] tables
        return ntt_b(ext.transpose(1, 0, 2), self.basis, ext_rows).transpose(
            1, 0, 2
        )

    def keyswitch_decomposed(self, ext_ntt, ksk: KSwitchKey, nmod: int):
        return self._keyswitch_decomposed_arr(ext_ntt, ksk.d0, ksk.d1, nmod)

    @_ctxjit(4)
    def _keyswitch_decomposed_arr(self, ext_ntt, d0, d1, nmod: int):
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        idx = jnp.asarray(ext_rows)
        k0 = d0[:nmod][:, idx, :]
        k1 = d1[:nmod][:, idx, :]
        t = _sel(self.basis, ext_rows)
        p0 = mul_mod_barrett(ext_ntt, k0, t["q"][None], t["mu"][None])
        p1 = mul_mod_barrett(ext_ntt, k1, t["q"][None], t["mu"][None])
        # lazy sum over digits then u32 Barrett (nmod * q < 2^31)
        acc0 = self._reduce_u32(jnp.sum(p0, axis=0, dtype=jnp.uint32), ext_rows)
        acc1 = self._reduce_u32(jnp.sum(p1, axis=0, dtype=jnp.uint32), ext_rows)
        return self._moddown(acc0, nmod), self._moddown(acc1, nmod)

    def keyswitch_core(self, d, ksk: KSwitchKey, nmod: int):
        """Switch NTT-domain poly d [nmod, N] (a c1-part under s_src) to the
        target key; returns (k0, k1) each [nmod, N] mod the active primes."""
        return self._keyswitch_core_arr(d, ksk.d0, ksk.d1, nmod)

    @_ctxjit(4)
    def _keyswitch_core_arr(self, d, d0, d1, nmod: int):
        return self._keyswitch_decomposed_arr(
            self.decompose_ntt(d, nmod), d0, d1, nmod
        )

    # ------------------------------------------------- batched keyswitching
    #
    # The production BSGS matmult (gwas/matmult.py) batches every keyswitch:
    # baby-step hoisted rotations share one decomposition applied under many
    # Galois permutations at once, and giant-step rotations stack G
    # ciphertexts through one fused decompose->mult->moddown chain.  These
    # replace the reference's per-rotation evaluator calls
    # (gwas/matmult.go:853-881) with [B, ...] tensor ops.

    @_ctxjit(2)
    def decompose_ntt_b(self, d, nmod: int):
        """Batched ModUp: d [B, nmod, N] NTT-domain -> [B, nmod, next, N]."""
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        next_ = len(ext_rows)
        bsz = d.shape[0]
        d_coeff = rns.ntt_b(
            jnp.swapaxes(d, 0, 1), self.basis, tuple(range(nmod)), True
        )  # [nmod, B, N]
        ext = self._extend_multi(
            d_coeff, tuple(range(nmod)), ext_rows
        )  # [nmod, next, B, N] coeff domain
        # prime rows lead so twiddle constants stay [next, N] (not the
        # digit-replicated [nmod*next, N] tables)
        ext = rns.ntt_b(
            jnp.transpose(ext, (1, 0, 2, 3)).reshape(next_, nmod * bsz, self.n),
            self.basis,
            ext_rows,
        ).reshape(next_, nmod, bsz, self.n)
        return jnp.transpose(ext, (2, 1, 0, 3))

    @_ctxjit(4)
    def keyswitch_decomposed_b(self, ext, k0, k1, nmod: int):
        """ext/k0/k1: [B, nmod, next, N] -> (p0, p1) each [B, nmod(active), N]
        after the external product, digit-sum and ModDown."""
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        t = _sel(self.basis, ext_rows)
        q = t["q"][None, None]
        mu = t["mu"][None, None]
        p0 = mul_mod_barrett(ext, k0, q, mu)
        p1 = mul_mod_barrett(ext, k1, q, mu)
        acc0 = self._reduce_u32(jnp.sum(p0, axis=1, dtype=jnp.uint32), ext_rows)
        acc1 = self._reduce_u32(jnp.sum(p1, axis=1, dtype=jnp.uint32), ext_rows)
        return self._moddown_b(acc0, nmod), self._moddown_b(acc1, nmod)

    @_ctxjit(2)
    def _moddown_b(self, x, nmod: int):
        """x: [B, nmod+1, N] over active+special (NTT) -> [B, nmod, N]."""
        dst = tuple(range(nmod))
        sp = rns.ntt_b(x[:, nmod][None], self.basis, (self.sp_row,), True)[0]
        ext = self._extend(sp, self.sp_row, dst)  # [nmod, B, N]
        ext = jnp.swapaxes(rns.ntt_b(ext, self.basis, dst), 0, 1)
        t = _sel(self.basis, dst)
        diff = sub_mod(x[:, :nmod], ext, t["q"])
        return mul_mod_shoup(diff, self.pinv[:nmod], self.pinv_s[:nmod], t["q"])

    def perms_for(self, gs) -> jnp.ndarray:
        return jnp.stack([self._perm_for(g) for g in gs])

    def rotate_batch(self, c0s, c1s, gs, k0s, k1s, nmod: int):
        """Rotate B stacked ciphertexts ([B, nmod, N] components), each by
        its own Galois element gs[b] with stacked keys k0s/k1s
        [B, nmod, next, N].  Returns (r0, r1) [B, nmod, N]."""
        return self._rotate_batch_core(
            c0s, c1s, self.perms_for(gs), k0s, k1s, nmod
        )

    @_ctxjit(6)
    def _rotate_batch_core(self, c0s, c1s, perms, k0s, k1s, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        ext = self.decompose_ntt_b(c1s, nmod)
        ext_g = jnp.take_along_axis(ext, perms[:, None, None, :], axis=-1)
        c0g = jnp.take_along_axis(c0s, perms[:, None, :], axis=-1)
        k0, k1 = self.keyswitch_decomposed_b(ext_g, k0s, k1s, nmod)
        return add_mod(c0g, k0, t["q"]), k1

    def hoisted_rotations_b(self, ct: Ciphertext, shifts, k0s, k1s):
        """Batched hoisted rotations: ONE decomposition of c1, applied under
        every shift's Galois permutation with stacked keys k0s/k1s
        [B, nmod, next, N] (B = number of nonzero shifts, in the order of
        `shifts` with zeros removed).  Returns (R0, R1) [len(shifts), nmod, N]
        where zero shifts hold the input ciphertext."""
        nmod = ct.nmod
        nz = [k % self.params.slots for k in shifts]
        gs = [self.galois_for_rotation(k) for k in nz if k != 0]
        if not gs:
            return ct.c0[None], ct.c1[None]
        r0, k1 = self._hoisted_core(
            ct.c0, ct.c1, self.perms_for(gs), k0s, k1s, nmod
        )
        if all(k != 0 for k in nz):
            return r0, k1
        # interleave the zero-shift rows back in
        out0, out1, j = [], [], 0
        for k in nz:
            if k == 0:
                out0.append(ct.c0)
                out1.append(ct.c1)
            else:
                out0.append(r0[j])
                out1.append(k1[j])
                j += 1
        return jnp.stack(out0), jnp.stack(out1)

    @_ctxjit(6)
    def _hoisted_core(self, c0, c1, perms, k0s, k1s, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        ext = self.decompose_ntt(c1, nmod)
        ext_g = jnp.take_along_axis(ext[None], perms[:, None, None, :], axis=-1)
        c0g = jnp.take_along_axis(c0[None], perms[:, None, :], axis=-1)
        k0, k1 = self.keyswitch_decomposed_b(ext_g, k0s, k1s, nmod)
        return add_mod(c0g, k0, t["q"]), k1

    def galois_inverse(self, g: int) -> int:
        """g^{-1} mod 2N: sigma_g^{-1} = sigma_{g^{-1}} (g is odd)."""
        return pow(int(g), -1, 2 * self.n)

    def _iperm_for(self, g: int) -> jnp.ndarray:
        """Permutation of sigma_g^{-1} in the NTT slot order."""
        return self._perm_for(self.galois_inverse(g))

    def iperms_for(self, gs) -> jnp.ndarray:
        return jnp.stack([self._iperm_for(g) for g in gs])

    def hoisted_rotations_all(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        if os.environ.get("SFGWAS_SPLIT_BIG_KERNELS"):
            return self._hoisted_rotations_all_body(
                c0s, c1s, perms, ik0s, ik1s, nmod
            )
        return self._hoisted_rotations_all_jit(
            c0s, c1s, perms, ik0s, ik1s, nmod
        )

    @_ctxjit(6)
    def _hoisted_rotations_all_jit(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        return self._hoisted_rotations_all_body(c0s, c1s, perms, ik0s, ik1s, nmod)

    def _hoisted_rotations_all_body(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        """Hoisted rotations batched over BOTH ciphertext rows and shifts:
        c0s/c1s [s, nmod, N]; perms [B, N] Galois permutations; ik0s/ik1s
        [B, nmod, next, N] stacked keys pre-permuted by sigma_b^{-1}
        (CryptoParams.stacked_keys_inv).  Returns (R0, R1) [B, s, nmod, N].

        Identity: sigma_b(ext_j) * k_bj = sigma_b(ext_j * sigma_b^{-1} k_bj),
        so ONE decomposition of all s ciphertexts multiplies un-permuted
        against inverse-permuted keys; only the digit-summed ModDown'ed
        result is permuted.  The [B, s, nmod, next, N] permuted-extension
        tensor of the per-row path never materializes, and the whole
        matmult row loop collapses into this single device program."""
        s = c0s.shape[0]
        Bn = perms.shape[0]
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        t = _sel(self.basis, ext_rows)
        q3 = t["q"][None, None]
        mu3 = t["mu"][None, None]
        ext = self.decompose_ntt_b(c1s, nmod)  # [s, nmod, next, N]
        # contract the digit axis with a scan (lazy u32 sums: nmod*q < 2^32
        # for every preset): per-step working set is one [s,B,x,N] product,
        # never the [s,B,j,x,N] tensor a broadcast contraction materializes
        def dig(carry, j):
            a0, a1 = carry
            ej = jax.lax.dynamic_index_in_dim(ext, j, 1, keepdims=False)
            k0j = jax.lax.dynamic_index_in_dim(ik0s, j, 1, keepdims=False)
            k1j = jax.lax.dynamic_index_in_dim(ik1s, j, 1, keepdims=False)
            a0 = a0 + mul_mod_barrett(ej[:, None], k0j[None], q3, mu3)
            a1 = a1 + mul_mod_barrett(ej[:, None], k1j[None], q3, mu3)
            return (a0, a1), None

        z = jnp.zeros((s, Bn, nmod + 1, self.n), jnp.uint32)
        (p0, p1), _ = jax.lax.scan(dig, (z, z), jnp.arange(nmod))
        acc0 = self._reduce_u32(p0, ext_rows)  # [s, B, x, N]
        acc1 = self._reduce_u32(p1, ext_rows)
        k0 = self._moddown_b(acc0.reshape(s * Bn, nmod + 1, self.n), nmod)
        k1 = self._moddown_b(acc1.reshape(s * Bn, nmod + 1, self.n), nmod)
        k0 = k0.reshape(s, Bn, nmod, self.n)
        k1 = k1.reshape(s, Bn, nmod, self.n)
        pg = perms[None, :, None, :]
        k0 = jnp.take_along_axis(k0, pg, axis=-1)
        k1 = jnp.take_along_axis(k1, pg, axis=-1)
        c0g = jnp.take_along_axis(
            jnp.broadcast_to(c0s[:, None], k0.shape), pg, axis=-1
        )
        tq = _sel(self.basis, tuple(range(nmod)))["q"]
        R0 = add_mod(c0g, k0, tq)
        return jnp.swapaxes(R0, 0, 1), jnp.swapaxes(k1, 0, 1)

    def rotate_grouped_b(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        """Giant-step epilogue rotations batched over rows: c0s/c1s
        [R, s, nmod, N] (R rotation groups x s ciphertext rows), perms
        [R, N], ik0s/ik1s [R, nmod, next, N] inverse-permuted keys shared
        by the s rows of each group.  Returns (r0, r1) [R, s, nmod, N].

        SFGWAS_SPLIT_BIG_KERNELS=1 runs the body unjitted: the fused
        program embeds the NTT twiddle tables several times (~15 MB of
        MLIR), which the axon remote compiler's AOT-helper path rejects
        when it is degraded; split, the constituent kernels stay under the
        size threshold (and mostly hit the compile cache)."""
        if os.environ.get("SFGWAS_SPLIT_BIG_KERNELS"):
            return self._rotate_grouped_b_body(
                c0s, c1s, perms, ik0s, ik1s, nmod
            )
        return self._rotate_grouped_b_jit(c0s, c1s, perms, ik0s, ik1s, nmod)

    @_ctxjit(6)
    def _rotate_grouped_b_jit(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        return self._rotate_grouped_b_body(c0s, c1s, perms, ik0s, ik1s, nmod)

    def _rotate_grouped_b_body(self, c0s, c1s, perms, ik0s, ik1s, nmod: int):
        R, s = c0s.shape[0], c0s.shape[1]
        ext_rows = tuple(range(nmod)) + (self.sp_row,)
        t = _sel(self.basis, ext_rows)
        q3 = t["q"][None, None]
        mu3 = t["mu"][None, None]
        ext = self.decompose_ntt_b(
            c1s.reshape(R * s, nmod, self.n), nmod
        ).reshape(R, s, nmod, nmod + 1, self.n)
        def dig(carry, j):
            a0, a1 = carry
            ej = jax.lax.dynamic_index_in_dim(ext, j, 2, keepdims=False)
            k0j = jax.lax.dynamic_index_in_dim(ik0s, j, 1, keepdims=False)
            k1j = jax.lax.dynamic_index_in_dim(ik1s, j, 1, keepdims=False)
            a0 = a0 + mul_mod_barrett(ej, k0j[:, None], q3, mu3)
            a1 = a1 + mul_mod_barrett(ej, k1j[:, None], q3, mu3)
            return (a0, a1), None

        z = jnp.zeros((R, s, nmod + 1, self.n), jnp.uint32)
        (p0, p1), _ = jax.lax.scan(dig, (z, z), jnp.arange(nmod))
        acc0 = self._reduce_u32(p0, ext_rows)
        acc1 = self._reduce_u32(p1, ext_rows)
        k0 = self._moddown_b(acc0.reshape(R * s, nmod + 1, self.n), nmod)
        k1 = self._moddown_b(acc1.reshape(R * s, nmod + 1, self.n), nmod)
        k0 = k0.reshape(R, s, nmod, self.n)
        k1 = k1.reshape(R, s, nmod, self.n)
        pg = perms[:, None, None, :]
        k0 = jnp.take_along_axis(k0, pg, axis=-1)
        k1 = jnp.take_along_axis(k1, pg, axis=-1)
        c0g = jnp.take_along_axis(c0s, pg, axis=-1)
        tq = _sel(self.basis, tuple(range(nmod)))["q"]
        return add_mod(c0g, k0, tq), k1

    def hoisted_rotations(self, ct: Ciphertext, shifts, rot_keys):
        """Rotate one ciphertext by many shifts, decomposing c1 only once
        (automorphisms commute with the per-digit lifting, so sigma_g of the
        decomposition equals the decomposition of sigma_g(c1)).  Returns
        {shift: Ciphertext}."""
        nmod = ct.nmod
        rows = tuple(range(nmod))
        t = _sel(self.basis, rows)
        ext = self.decompose_ntt(ct.c1, nmod)
        out = {}
        for k in shifts:
            k = k % self.params.slots
            if k == 0:
                out[0] = ct.copy()
                continue
            g = self.galois_for_rotation(k)
            perm = self._perm_for(g)
            ext_g = ext[..., perm]
            c0g = self.automorphism(ct.c0, g)
            k0, k1 = self.keyswitch_decomposed(ext_g, rot_keys[g], nmod)
            out[k] = Ciphertext(add_mod(c0g, k0, t["q"]), k1, nmod, ct.scale)
        return out

    def _reduce_u32(self, x, rows: Tuple[int, ...]):
        m32 = self.m32[jnp.asarray(rows)]
        q = _sel(self.basis, rows)["q"]
        qhat = _mulhi32(x, m32)
        r = x - qhat * q
        r = jnp.where(r >= q, r - q, r)
        return jnp.where(r >= q, r - q, r)

    @_ctxjit(2)
    def _moddown(self, x, nmod: int):
        """x: [nmod+1, N] over active+special (NTT) -> [nmod, N] = x/P."""
        dst = tuple(range(nmod))
        sp = ntt(x[nmod : nmod + 1], self.basis, (self.sp_row,), inverse=True)
        ext = ntt(self._extend(sp[0], self.sp_row, dst), self.basis, dst)
        t = _sel(self.basis, dst)
        diff = sub_mod(x[:nmod], ext, t["q"])
        return mul_mod_shoup(diff, self.pinv[:nmod], self.pinv_s[:nmod], t["q"])

    # -------------------------------------------------------- automorphism

    def _exps_table(self):
        """Exponent e(k) with NTT output slot k holding a(psi^{e(k)})."""
        if self._exps is not None:
            return self._exps
        q = self.basis.primes[0]
        n = self.n
        psi = rns._find_psi(q, 2 * n)
        # host NTT of X^1 on prime 0 (same butterfly as device ntt)
        x = np.zeros(n, dtype=object)
        x[1] = 1
        psi_rev = self.basis._np["psi"][0].astype(object)
        m = 1
        x = x.copy()
        while m < n:
            half = n // (2 * m)
            xv = x.reshape(m, 2, half)
            S = psi_rev[m : 2 * m]
            U = xv[:, 0, :].copy()
            V = (xv[:, 1, :] * S[:, None]) % q
            x = np.stack([(U + V) % q, (U - V) % q], axis=1).reshape(n)
            m *= 2
        dlog = {}
        cur = 1
        for e in range(2 * n):
            dlog[cur] = e
            cur = (cur * psi) % q
        exps = np.array([dlog[int(v)] for v in x], dtype=np.int64)
        self._exps = exps
        return exps

    def _perm_for(self, g: int) -> jnp.ndarray:
        if g in self._perm_cache:
            return self._perm_cache[g]
        exps = self._exps_table()
        two_n = 2 * self.n
        inv = getattr(self, "_exp_pos", None)
        if inv is None:
            inv = np.zeros(two_n, np.int32)
            inv[np.asarray(exps, np.int64)] = np.arange(self.n, dtype=np.int32)
            self._exp_pos = inv
        perm = inv[(np.asarray(exps, np.int64) * g) % two_n]
        out = jnp.asarray(perm)
        self._perm_cache[g] = out
        return out

    def automorphism(self, poly, g: int):
        """sigma_g in the NTT domain: gather along the slot axis."""
        perm = self._perm_for(g)
        return poly[..., perm]

    def galois_for_rotation(self, k: int) -> int:
        """Galois element for a left rotation by k slots."""
        two_n = 2 * self.n
        return pow(5, k % self.params.slots, two_n)

    def galois_conjugate(self) -> int:
        return 2 * self.n - 1

    def rotate(self, ct: Ciphertext, k: int, rot_keys: Dict[int, KSwitchKey]) -> Ciphertext:
        if k % self.params.slots == 0:
            return ct.copy()
        g = self.galois_for_rotation(k)
        return self.apply_galois(ct, g, rot_keys[g])

    def conjugate(self, ct: Ciphertext, rot_keys: Dict[int, KSwitchKey]) -> Ciphertext:
        g = self.galois_conjugate()
        return self.apply_galois(ct, g, rot_keys[g])

    def apply_galois(self, ct: Ciphertext, g: int, key: KSwitchKey) -> Ciphertext:
        c0, c1 = self._apply_galois_core(
            ct.c0, ct.c1, self._perm_for(g), key.d0, key.d1, ct.nmod
        )
        return Ciphertext(c0, c1, ct.nmod, ct.scale)

    @_ctxjit(6)
    def _apply_galois_core(self, c0, c1, perm, kd0, kd1, nmod: int):
        t = _sel(self.basis, tuple(range(nmod)))
        c0g = c0[..., perm]
        c1g = c1[..., perm]
        k0, k1 = self._keyswitch_core_arr(c1g, kd0, kd1, nmod)
        return add_mod(c0g, k0, t["q"]), k1

    # ------------------------------------------------------------- consts

    def const_poly(self, value: float, nmod: int, scale: float) -> jnp.ndarray:
        """Residues of round(value*scale) as [nmod, 1] (constant poly is the
        same in coeff and NTT domain only for degree-0 ... it is: NTT of a
        constant c is c in every slot)."""
        c = int(round(value * scale))
        res = np.array(
            [c % self.basis.primes[i] for i in range(nmod)], dtype=np.uint64
        ).astype(np.uint32)
        return jnp.asarray(res)[:, None]

    def mul_const(self, ct: Ciphertext, value: float, scale: Optional[float] = None):
        """Multiply by a scalar constant encoded at `scale` (default: the
        level-pair scale); caller rescales."""
        sc = scale or self.params.scale
        res = self.const_poly(value, ct.nmod, sc)
        c0, c1 = self._mul_pair(ct.c0, ct.c1, res, ct.nmod)
        return Ciphertext(c0, c1, ct.nmod, ct.scale * sc)

    def mul_const_to(self, ct: Ciphertext, value: float, target: float):
        """Multiply by a scalar, choosing the constant's encoding scale so
        the result lands EXACTLY at `target` after rescale() — the SetScale
        technique that keeps long add-chains (e.g. Chebyshev accumulation)
        scale-exact despite paired-prime drift."""
        pair = float(self.basis.primes[ct.nmod - 1]) * float(
            self.basis.primes[ct.nmod - 2]
        )
        cs = target * pair / ct.scale
        return self.mul_const(ct, value, cs)

    def mul_const_int(self, ct: Ciphertext, value: int):
        """Multiply by a small integer without scale change."""
        res = np.array(
            [value % self.basis.primes[i] for i in range(ct.nmod)], dtype=np.uint64
        ).astype(np.uint32)
        c0, c1 = self._mul_pair(ct.c0, ct.c1, jnp.asarray(res)[:, None], ct.nmod)
        return Ciphertext(c0, c1, ct.nmod, ct.scale)

    def add_const(self, ct: Ciphertext, value: float) -> Ciphertext:
        rows = tuple(range(ct.nmod))
        t = _sel(self.basis, rows)
        res = self.const_poly(value, ct.nmod, ct.scale)
        return Ciphertext(add_mod(ct.c0, res, t["q"]), ct.c1, ct.nmod, ct.scale)

    def zero_ct(self, nmod: Optional[int] = None) -> Ciphertext:
        nmod = nmod or self.nq
        z = jnp.zeros((nmod, self.n), jnp.uint32)
        return Ciphertext(z, z, nmod, self.params.scale)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def device_uniform_b(ctx: CkksContext, rows, batch: int, seed, idx):
    """Counter-based uniform residues on device: threefry bits + 64->q fold
    entirely in uint32 kernels (no host uint64 loop).  seed/idx are traced
    so successive draws reuse one compiled kernel.  Deterministic per
    (seed, idx, rows, batch): parties sharing a seed derive identical
    values on any backend (the CRP property)."""
    t = _sel(ctx.basis, rows)
    q, mu = t["q"][None], t["mu"][None]
    seed_lo, seed_hi = seed
    k = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed_lo), seed_hi), idx
    )
    bits = jax.random.bits(k, (2, batch, len(rows), ctx.n), dtype=jnp.uint32)
    hi, lo = bits[0], bits[1]
    p32 = jnp.asarray(
        np.array([(1 << 32) % ctx.basis.primes[r] for r in rows], np.uint32)
    )[None, :, None]
    return add_mod(mul_mod_barrett(hi % q, p32, q, mu), lo % q, q)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _small_to_rns_b_dev(smalls, basis, rows):
    """[B, N] int32 smalls (|v| < q for every row prime) -> [L, B, N] uint32
    NTT-domain residues."""
    t = _sel(basis, rows)
    q = t["q"][:, :, None].astype(jnp.int32)  # [L, 1, 1]
    v = smalls[None]  # [1, B, N]
    res = jnp.where(v < 0, v + q, v).astype(jnp.uint32)
    res = jnp.broadcast_to(res, (len(rows),) + smalls.shape)
    return ntt_b(res, basis, rows)
