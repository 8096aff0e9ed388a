"""Collective CKKS protocol tests: keygen, decrypt, bootstrap, SS<->HE."""

import numpy as np
import pytest

from sfgwas_tpu.crypto import basics as B
from sfgwas_tpu.mpc import mhe, ss_he
from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.parallel.simulate import make_shares, reveal_ints, run_parties

F = 30
PRESET = "TEST8"
SHIFTS = [1, 2, 4, 8, 16, 32, 64, 127, 126, 124, 120, 112, 96]


def _init(mpc):
    return mhe.collective_init(mpc.net, PRESET, shifts_override=SHIFTS)


def test_collective_encrypt_decrypt_and_mult():
    rng = np.random.default_rng(5)
    slots = 128
    v1 = rng.normal(size=slots)
    v2 = rng.normal(size=slots)

    def fn(mpc):
        cps = _init(mpc)
        if mpc.pid == 0:
            # party 0 never holds ciphertexts; just stay in sync for ss tests
            return None
        # party 1 encrypts; everyone gets the same ciphertexts
        if mpc.pid == 1:
            c1 = B.encrypt_float_vector(cps, v1)
            c2 = B.encrypt_float_vector(cps, v2)
        else:
            c1 = c2 = [None]
        c1 = [mhe.broadcast_ciphertext(mpc.net, cps, c1[0], 1)]
        c2 = [mhe.broadcast_ciphertext(mpc.net, cps, c2[0], 1)]
        # add + mult with collective keys
        cs = B.cadd(cps, c1, c2)
        cm = B.cmult(cps, c1, c2)
        cr = [B.rotate_left(cps, c1[0], 4)]
        outs = []
        for cv in (cs, cm, cr):
            pt = mhe.collective_decrypt(mpc.net, cps, cv[0], -1)
            outs.append(cps.ctx.decode(pt))
        return outs

    res = run_parties(3, fn)
    for pid in (1, 2):
        s, m, r = res[pid]
        assert np.allclose(s, v1 + v2, atol=1e-3)
        assert np.allclose(m, v1 * v2, atol=1e-3), np.abs(m - v1 * v2).max()
        assert np.allclose(r, np.roll(v1, -4), atol=1e-3)


def test_aggregate_and_bootstrap():
    rng = np.random.default_rng(6)
    slots = 128
    vals = {1: rng.normal(size=slots), 2: rng.normal(size=slots)}

    def fn(mpc):
        cps = _init(mpc)
        if mpc.pid == 0:
            return None
        cv = B.encrypt_float_vector(cps, vals[mpc.pid])
        agg = mhe.aggregate_cvec(mpc.net, cps, cv)
        # burn levels then refresh
        ct = agg[0]
        for _ in range(2):
            ct = cps.ctx.rescale(cps.ctx.mul_const(ct, 1.0))
        low_nmod = ct.nmod
        ct = mhe.collective_bootstrap(mpc.net, cps, ct, -1)
        pt = mhe.collective_decrypt(mpc.net, cps, ct, -1)
        return cps.ctx.decode(pt), low_nmod, ct.nmod

    res = run_parties(3, fn)
    want = vals[1] + vals[2]
    for pid in (1, 2):
        got, low, high = res[pid]
        assert high == cps_nq()
        assert low < high
        assert np.allclose(got, want, atol=1e-3), np.abs(got - want).max()


def cps_nq():
    from sfgwas_tpu.crypto.params import get_params

    return get_params(PRESET).nq


def test_bootstrap_band_target_resets_scale_exactly():
    """Band-targeted refresh is a hard scale-reset point (the reference's
    Recode(ct, params.Scale()), mpc/mhe.go:327-329): two ciphertexts whose
    scales have drifted apart through different rescale chains come out of
    the bootstrap at EXACTLY the preset scale, so downstream accumulations
    at the modulus floor add with equal scales (the r3 phase-3 crash class,
    crypto/ckks.py:415)."""
    from sfgwas_tpu.crypto.params import get_params

    rng = np.random.default_rng(7)
    slots = 128
    v = rng.normal(size=slots)
    params = get_params(PRESET)
    band = params.mm_nmod

    def fn(mpc):
        cps = _init(mpc)
        if mpc.pid == 0:
            return None
        ct = B.encrypt_float_vector(cps, v)[0] if mpc.pid == 1 else None
        ct = mhe.broadcast_ciphertext(mpc.net, cps, ct, 1)
        # two different depth-1 chains: scales drift apart by the
        # pair-product mismatch
        a = cps.ctx.rescale(cps.ctx.mul_const(ct, 1.0))
        bct = cps.ctx.rescale(
            cps.ctx.mul_const(cps.ctx.drop_to(ct, ct.nmod - 2), 1.0)
        )
        assert a.scale != bct.scale
        ra, rb = mhe.collective_bootstrap_many(
            mpc.net, cps, [a, bct], -1, target_nmod=band
        )
        pa = mhe.collective_decrypt(mpc.net, cps, ra, -1)
        pb = mhe.collective_decrypt(mpc.net, cps, rb, -1)
        return (
            ra.scale, rb.scale, ra.nmod, rb.nmod,
            cps.ctx.decode(pa), cps.ctx.decode(pb),
        )

    res = run_parties(3, fn)
    for pid in (1, 2):
        sa, sb, na, nb, da, db = res[pid]
        assert sa == params.scale and sb == params.scale
        assert na == band and nb == band
        assert np.allclose(da, v, atol=1e-3), np.abs(da - v).max()
        assert np.allclose(db, v, atol=1e-3), np.abs(db - v).max()


def test_ss_to_he_to_ss_roundtrip():
    vals = [1.5, -2.25, 3.0, 0.125, 100.5]
    enc = [int(round(v * (1 << F))) % R.P256 for v in vals]

    def fn(mpc):
        cps = _init(mpc)
        sh = make_shares(mpc, enc)[None]  # [1, n, L]
        cm = ss_he.ss_to_cmat(mpc, cps, sh)
        dec = None
        if mpc.pid > 0:
            pt = mhe.collective_decrypt(mpc.net, cps, cm[0][0], -1)
            dec = cps.ctx.decode(pt)[: len(vals)]
        back = ss_he.cmat_to_ss(mpc, cps, cm, -1, len(vals))
        rev = reveal_ints(mpc, back[0])
        return dec, rev

    res = run_parties(3, fn)
    for pid in (1, 2):
        dec, rev = res[pid]
        assert np.allclose(dec, vals, atol=1e-4), dec
        got = []
        for v in rev:
            v = int(v)
            if v > R.P256 // 2:
                v -= R.P256
            got.append(v / (1 << F))
        assert np.allclose(got, vals, atol=1e-3), got


def test_cmat_to_ss_low_level_self_heals():
    """HE->SS at a ciphertext level below the masked-decode headroom must
    collectively refresh first instead of tripping the q_prod assert (the
    r4 flagship crash: assoc varx arrived at nmod=3 < the 121-bit need,
    gwas/assoc.py compute_std_inv -> mpc/ss_he.py)."""
    vals = [2.5, -1.25, 4.0, 0.5]
    enc = [int(round(v * (1 << F))) % R.P256 for v in vals]

    def fn(mpc):
        cps = _init(mpc)
        cm = ss_he.ss_to_cmat(mpc, cps, make_shares(mpc, enc)[None])
        if mpc.pid > 0:
            # force the ct below the conversion floor (25-bit primes:
            # nmod=4 -> 100 bits <= need 121)
            cm = [[cps.ctx.drop_to(ct, 4) for ct in row] for row in cm]
        back = ss_he.cmat_to_ss(mpc, cps, cm, -1, len(vals))
        return reveal_ints(mpc, back[0])

    res = run_parties(3, fn)
    for pid in (1, 2):
        got = []
        for v in res[pid]:
            v = int(v)
            if v > R.P256 // 2:
                v -= R.P256
            got.append(v / (1 << F))
        assert np.allclose(got, vals, atol=1e-3), got


def test_net_cholqr_enc_orthonormalizes():
    """CholeskyQR2 over the full HE+SS stack vs the numpy contract:
    Q^T Q = N*I, triangular relation to A (leading-column spans preserved),
    robust to disparate column scales."""
    rng = np.random.default_rng(12)
    nrows_all = [0, 12, 10]
    ncols = 3
    Afull = rng.normal(size=(22, ncols)) * np.array([1.0, 20.0, 0.1])
    Afull[:, 0] = 1.0
    parts = {1: Afull[:12], 2: Afull[12:]}

    def fn(mpc):
        cps = _init(mpc)
        from sfgwas_tpu.gwas.qrfact import net_cholqr_enc

        if mpc.pid > 0:
            loc = parts[mpc.pid]
            A = [B.encrypt_float_vector(cps, loc[:, j]) for j in range(ncols)]
        else:
            A = [None] * ncols
        Q = net_cholqr_enc(cps, mpc, A, nrows_all, passes=2)
        if mpc.pid == 0:
            return None
        blocks = []
        for p in (1, 2):
            rows = []
            for c in range(ncols):
                ct = Q[c][0] if mpc.pid == p else None
                pt = mhe.collective_decrypt(mpc.net, cps, ct, p)
                rows.append(cps.ctx.decode(pt)[: nrows_all[p]])
            blocks.append(np.stack(rows, axis=1))
        return np.concatenate(blocks, axis=0)

    res = run_parties(3, fn)
    n = sum(nrows_all)
    for pid in (1, 2):
        Q = res[pid] / np.sqrt(n)  # net QR convention: scaled by sqrt(N)
        gram = Q.T @ Q
        assert np.allclose(gram, np.eye(ncols), atol=2e-2), gram
        # triangular relation: column j of Q lies in span(A[:, :j+1])
        for j in range(ncols):
            Aj = Afull[:, : j + 1]
            proj = Aj @ np.linalg.lstsq(Aj, Q[:, j], rcond=None)[0]
            assert np.linalg.norm(Q[:, j] - proj) < 2e-2, j


def test_combined_q_uniform_scale_and_level():
    """REGRESSION (r3 phase-3 crash): after the ones-column replacement,
    every ciphertext across every column of the combined covariate basis
    must sit at the SAME (level, scale) -- the fresh ones column used to
    ride a different rescale chain, and the per-column scale split
    accumulated into a modulus-floor assertion in the ynew projection
    (crypto/ckks.py _align_scales via gwas/matmult.py dc_matmul_aat_b)."""
    rng = np.random.default_rng(21)
    nrows_all = [0, 12, 10]
    covs = {
        1: rng.normal(size=(12, 2)) * np.array([50.0, 0.3]),
        2: rng.normal(size=(10, 2)) * np.array([50.0, 0.3]),
    }

    def fn(mpc):
        cps = _init(mpc)
        from sfgwas_tpu.gwas.assoc import compute_combined_q

        cov = covs[mpc.pid] if mpc.pid > 0 else 2
        Q, _ = compute_combined_q(mpc, cps, cov, None, nrows_all, False)
        if mpc.pid == 0:
            return None
        return [(ct.nmod, ct.scale) for col in Q for ct in col]

    res = run_parties(3, fn)
    for pid in (1, 2):
        assert len(set(res[pid])) == 1, res[pid]
