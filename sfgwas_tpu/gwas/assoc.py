"""Phase 3: association tests.

Re-implementation of gwas/assoc.go:

* combined covariate basis: joint QR of [1 | covariates | PCs] with the
  first column replaced by the normalized all-ones vector
  (computeCombinedQV2, gwas/assoc.go:69-126);
* linear (Pearson/CQF) statistics: project y onto the complement of Q,
  compute sx/sxx/sxy/sy/syy via one concatenated matmult [Q | (1-u) | y~] x G
  per genotype block, variance -> stdinv in secret shares, and
  stat = stdinvx * stdinvy * (sxy - sx sy / n)
  (GetAssociationStats, gwas/assoc.go:443-884);
* logistic regression: covariate-only Newton iterations with an encrypted
  sigmoid (Chebyshev) and an SS inverse-sqrt Hessian, then per-SNP score
  tests (LrNewtonBasedCovOnly / gWY, gwas/assoc.go:955-1476).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..crypto import basics as B
from ..mpc import linalg, mhe, ss_he
from ..ops import ring as R
from ..mpc.mhe import CryptoParams
from ..mpc.mpc import MPC
from . import filestream as fs
from . import matmult as MM
from ..utils.log import log
from .qrfact import net_qr


def compute_combined_q(
    mpc: MPC,
    cps: CryptoParams,
    cov: Optional[np.ndarray],  # local covariates [n_local, ncov] (float)
    Qpc: Optional[B.CipherMatrix],
    nrows_all: List[int],
    cov_all_ones: bool,
    qr_method: str = "cholqr2",
) -> Tuple[B.CipherMatrix, int]:
    """computeCombinedQV2 (gwas/assoc.go:69-126): QR of
    [all-ones | covariates | PCs], first column then replaced with the
    normalized all-ones vector.  Returns (Q, ncols)."""
    pid = mpc.pid
    slots = cps.slots if cps else 0
    npc = len(Qpc) if Qpc and Qpc[0] is not None else (len(Qpc) if Qpc else 0)

    if pid > 0:
        cols = []
        if not cov_all_ones:
            cols.append(np.ones(nrows_all[pid]))
        for j in range(cov.shape[1]):
            cols.append(cov[:, j])
        comb = [B.encrypt_float_vector(cps, c) for c in cols]
        if Qpc:
            comb = comb + [q for q in Qpc]
        ncols = len(comb)
    else:
        ncov = cov  # party 0 receives the count via cov argument (int)
        ncols = int(ncov) + (0 if cov_all_ones else 1) + (len(Qpc) if Qpc else 0)
        comb = [None] * ncols

    Q = net_qr(cps, mpc, comb, nrows_all, method=qr_method)

    if pid > 0:
        # replace first column with normalized all-ones (gwas/assoc.go:104-120)
        ones = B.cadd_const(cps, B.czeros(cps, len(Q[0])), 1.0)
        nloc = nrows_all[pid]
        qfirst = []
        for i in range(len(Q[0])):
            nk = slots if i < len(Q[0]) - 1 else nloc - (len(Q[0]) - 1) * slots
            qfirst.append(B.mask_trunc(cps, ones[i], nk))
        Q[0] = qfirst
        Q, _ = B.flatten_levels(cps, Q)
        # the fresh ones column rides a different rescale chain than the QR
        # outputs: flatten aligns LEVELS but not SCALES, and that per-column
        # scale split is exactly what accumulated into the r3 phase-3 crash
        # at the modulus floor (ckks _align_scales, ynew projection).  The
        # band-targeted refresh is a hard scale-reset point (mhe.go:327-329
        # semantics), so every downstream product chain over Q's columns
        # adds with EXACTLY equal scales.
        qr_band = min(cps.ctx.nq, cps.rot_nmod + 2)
        Q = mhe.bootstrap_mat_all(mpc.net, cps, Q, target_nmod=qr_band)
    return Q, ncols


def get_association_stats(
    mpc: MPC,
    cps: CryptoParams,
    geno_blocks: Optional[List[np.ndarray]],  # local int8 blocks; None at pid0
    pheno: Optional[np.ndarray],
    cov: Optional[np.ndarray],
    Qpc: Optional[B.CipherMatrix],
    nrows_all: List[int],
    cov_all_ones: bool = False,
    cache_prefix: Optional[str] = None,
    use_cached_combined_q: bool = False,
    qr_method: str = "cholqr2",
    num_blocks_parallel: int = 1,
    debug: bool = False,
):
    """Linear association statistics (gwas/assoc.go:443-884).  Returns
    (stats CipherVector, filter) at data parties; (None, None) at party 0."""
    ring = mpc.ring
    pid = mpc.pid
    slots = cps.slots if cps else 0
    tot_n = sum(nrows_all[1:])
    inv_n = 1.0 / tot_n
    sqrt_inv_n = math.sqrt(inv_n)

    # party 0 passes the covariate COUNT (it holds no data but must run the
    # dealer side of every QR column, so the column count must match).
    # Qcomb ciphertext cache (use_cached_combined_q, gwas/assoc.go:501-514).
    import os as _os

    from . import utilities as U

    # ciphertext caches are decryptable only when the collective key bundle
    # survived from the run that wrote them (use_cached_keys restore); a
    # fresh keygen silently invalidates every stored ciphertext
    ct_cache_ok = bool(cps and cps.keys_from_cache)
    # cache names carry the combined-Q column count: a skip-PCA run after a
    # full-PCA run (or vice versa) in the same cache dir must MISS, not load
    # products built against a different covariate basis (the per-block
    # `out` rows are indexed by Q column position below)
    ncov_n = cov.shape[1] if pid > 0 else int(cov)
    qexp = ncov_n + (0 if cov_all_ones else 1) + (len(Qpc) if Qpc else 0)
    qcomb_cache = (
        f"{cache_prefix}_Qcomb.q{qexp}.npz" if cache_prefix else None
    )
    # the combined-QR skip involves party 0's dealer rounds, so ALL parties
    # must take the same branch: hub ANDs the data parties' readiness bits
    # and broadcasts the decision (the reference reaches the same consensus
    # implicitly through its shared config flags, gwas/assoc.go:501-514)
    want = int(
        use_cached_combined_q
        and ct_cache_ok
        and qcomb_cache is not None
        and _os.path.exists(qcomb_cache)
    )
    nparty = mpc.net.nparty
    if pid == mpc.hub_pid:
        bits = [want] + [
            mpc.net.recv_int(p)
            for p in range(1, nparty)
            if p != mpc.hub_pid
        ]
        decision = int(all(bits))
        for p in range(nparty):
            if p != mpc.hub_pid:
                mpc.net.send_int(decision, p)
    elif pid > 0:
        mpc.net.send_int(want, mpc.hub_pid)
        decision = mpc.net.recv_int(mpc.hub_pid)
    else:
        decision = mpc.net.recv_int(mpc.hub_pid)

    if decision:
        if pid > 0:
            Q = U.load_cipher_matrix(cps, qcomb_cache)
        else:
            Q = None
    else:
        Q, ncols = compute_combined_q(
            mpc, cps, cov, Qpc, nrows_all, cov_all_ones, qr_method=qr_method
        )
        if pid > 0 and qcomb_cache:
            U.save_cipher_matrix(cps, Q, qcomb_cache)

    num_blocks = len(geno_blocks) if pid > 0 else 0
    if pid == mpc.hub_pid:
        mpc.net.send_int(num_blocks, 0)
    elif pid == 0:
        num_blocks = mpc.net.recv_int(mpc.hub_pid)

    if pid > 0:
        # ynew = (I - QQ^T) y  (gwas/assoc.go:624-646)
        y_pt = B.encode_float_vector(cps, pheno.reshape(-1))

        def mmplainfn(cp, a, Bm, j):
            return B.cpmult(cp, a, Bm[j])

        ynew = MM.dc_matmul_aat_b(cps, mpc, Q, [y_pt], nrows_all, 1, mmplainfn)
        ynew0 = B.cmult_const(cps, ynew[0], inv_n, rescale=True)
        # refresh two primes below the top: the exact scale reset applies,
        # so the cpadd below adds y at EXACTLY the projection's scale.  At
        # the top there is no reset headroom and the projection's two
        # rescales leave it ~2.5% below the preset scale on PN14's pairs --
        # the round-4 DC bias (y*1.0247 - Qproj) that shifted every stat by
        # ~maf (oracle corr 0.966 instead of >0.999).
        ynew0 = mhe.bootstrap_mat_all(
            mpc.net, cps, [ynew0], target_nmod=cps.ctx.nq - 2
        )[0]
        ynew0 = [cps.ctx.mul_const_int(ct, -1) for ct in ynew0]
        ynew0 = B.cpadd(cps, ynew0, y_pt)
        if debug and cache_prefix:
            # decrypt-dump the phase-3 intermediates under debug, the
            # reference's main diagnosis tool (gwas/assoc.go:490-499):
            # ynew is row-partitioned, so dump each party's slice
            for p in range(1, mpc.net.nparty):
                U.save_matrix_collective(
                    mpc.net, cps, [ynew0], nrows_all[p], p,
                    f"{cache_prefix}_dbg_ynew.party{p}.txt",
                )

        # concat = [Q | y~]; after the combined QR the first column is the
        # normalized all-ones vector, so sx = sy = 0 (gwas/assoc.go:697-704)
        concat = [q for q in Q]
        concat.append(ynew0)

        # host-encode/device-MAC pipeline over the blocks (the reference's
        # worker pool, gwas/assoc.go:354-419, assoc_num_blocks_parallel):
        # one prefetch thread loads + FFT-folds block b+k (pure host work,
        # k bounded by num_blocks_parallel) while the device multiplies
        # block b.  Cache hits are known up front and never prefetched.
        from concurrent.futures import ThreadPoolExecutor

        nb = len(geno_blocks)
        nahead = max(1, int(num_blocks_parallel))
        cache_files = [
            f"{cache_prefix}_assoc_q{qexp}_{b}.npz" if cache_prefix else None
            for b in range(nb)
        ]
        hit = [
            cf is not None and ct_cache_ok and _os.path.exists(cf)
            for cf in cache_files
        ]

        def host_prep(b):
            G = fs.load_block(geno_blocks[b])
            pre = MM.preprocess_matrix_host(cps, G)
            dsum = G.astype(np.float64).sum(axis=0)
            dsq = (G.astype(np.float64) ** 2).sum(axis=0)
            return pre, dsum, dsq, G.shape[1]

        pool = ThreadPoolExecutor(1, thread_name_prefix="assoc-prefetch")
        futures = {}
        next_pf = 0

        def schedule(upto_exclusive_depth):
            nonlocal next_pf
            while len(futures) < upto_exclusive_depth and next_pf < nb:
                if not hit[next_pf]:
                    futures[next_pf] = pool.submit(host_prep, next_pf)
                next_pf += 1

        schedule(nahead)
        sxx_blocks, sxy_blocks, filters = [], [], []
        for b, blk in enumerate(geno_blocks):
            log(f"pid{pid} assoc block {b + 1}/{nb}")
            # per-block RESULT cache (ciphertexts + dosage sums, the
            # reference's GenoBlockMult caches, gwas/assoc.go:317-334);
            # diagonal encodings are NOT cached here -- each assoc block is
            # multiplied once, and its encodings are ~GBs at biobank scale
            cache_file = cache_files[b]
            if hit[b]:
                # party-local decision is safe here: a cache hit replaces
                # only local compute; the aggregate/bootstrap message
                # pattern below is identical either way
                z = np.load(cache_file)
                out = U.load_cipher_matrix(cps, cache_file)
                dsum, dsq = z["dsum"], z["dsq"]
                msnp = blk.shape[1]
            else:
                pre, dsum, dsq, msnp = futures.pop(b).result()
                schedule(nahead)
                out, _, _ = MM.mat_mult_stream(
                    cps, [c for c in concat], None, host_pre=pre
                )
                del pre
                if cache_file:
                    U.save_cipher_matrix(
                        cps, out, cache_file, extra={"dsum": dsum, "dsq": dsq}
                    )
            out = mhe.aggregate_cmat(mpc.net, cps, out)
            out = mhe.bootstrap_mat(mpc.net, cps, out, -1)

            nq_cols = len(Q)
            # B = Q^T G / sqrt(n), skipping the all-ones column whose
            # contribution is handled by the dosage sums (gwas/assoc.go:728-768)
            Bmat = [
                B.cmult_const(cps, out[i + 1], sqrt_inv_n, rescale=True)
                for i in range(nq_cols - 1)
            ]
            sxy_blocks.append(out[nq_cols])

            sx2 = mhe.aggregate_cvec(
                mpc.net, cps, B.encrypt_float_vector(cps, dsum)
            )
            sx2 = B.cmult_const(cps, sx2, sqrt_inv_n, rescale=True)
            # encode the fresh dsq at EXACTLY the squared-term chain's scale
            # (s^2 / top prime pair): the full-PCA chain runs ~3% off the
            # preset, and the sub below requires equal scales — every party
            # derives the same s_tt, so the aggregate also adds losslessly
            terms = Bmat + [sx2]
            p_ = cps.ctx.basis.primes

            def _sq_scale(t):
                return t.scale * t.scale / p_[t.nmod - 1] / p_[t.nmod - 2]

            s_tt = _sq_scale(terms[0][0])
            sxx = B.encrypt_float_vector(cps, dsq, scale=s_tt)
            if pid == mpc.hub_pid:
                for term_vec in terms:
                    tt = B.cmult(cps, term_vec, term_vec)
                    if abs(tt[0].scale / s_tt - 1) > 1e-9:
                        # off-chain term (should not happen: all terms ride
                        # the same bootstrap-reset level): exact retarget
                        tt = [
                            B.mask_trunc(
                                cps, t, cps.slots, target_scale=s_tt
                            )
                            for t in tt
                        ]
                    nm = min(sxx[0].nmod, tt[0].nmod)
                    sxx = [
                        cps.ctx.sub(cps.ctx.drop_to(a_, nm), cps.ctx.drop_to(b_, nm))
                        for a_, b_ in zip(sxx, tt)
                    ]
            sxx = mhe.aggregate_cvec(mpc.net, cps, sxx)
            sxx_blocks.append(sxx)

            nct = 1 + (msnp - 1) // slots
            fl = np.zeros(nct * slots, dtype=bool)
            fl[:msnp] = True
            filters.append(fl)
        pool.shutdown(wait=False)

        sxy = [ct for blk in sxy_blocks for ct in blk]
        varx = [ct for blk in sxx_blocks for ct in blk]
        out_filter = np.concatenate(filters)
        nsnps = int(out_filter.sum())
        num_ctx = len(varx)
        if pid == mpc.hub_pid:
            mpc.net.send_int(num_ctx, 0)
            mpc.net.send_int(nsnps, 0)

        if debug and cache_prefix:
            # aggregated cross-party quantities: identical everywhere
            # (gwas/assoc.go:846-855 sxy/sxx dumps)
            nfilt = int(out_filter.sum())
            U.save_matrix_collective(
                mpc.net, cps, [sxy], nfilt, -1,
                f"{cache_prefix}_dbg_sxy.txt",
            )
            U.save_matrix_collective(
                mpc.net, cps, [varx], nfilt, -1,
                f"{cache_prefix}_dbg_varx.txt",
            )

        # vary = syy (sy = 0 with the all-ones covariate in Q)
        ysq = B.cmult(cps, ynew0, ynew0)
        syy_loc = B.inner_sum_all(cps, ysq)
        syy = mhe.aggregate_ct(mpc.net, cps, syy_loc)
        vary = mhe.collective_bootstrap(mpc.net, cps, syy, -1)
    else:
        num_ctx = mpc.net.recv_int(mpc.hub_pid)
        nsnps = mpc.net.recv_int(mpc.hub_pid)
        varx = [None] * num_ctx
        vary = None
        sxy = None
        out_filter = None

    mpc.assert_sync()
    stdinvx, stdinvy = compute_std_inv(mpc, cps, varx, vary, nsnps, out_filter)

    if pid > 0:
        if debug and cache_prefix:
            U.save_matrix_collective(
                mpc.net, cps, [stdinvx], int(out_filter.sum()), -1,
                f"{cache_prefix}_dbg_stdinvx.txt",
            )
        stats = B.cmult(cps, sxy, stdinvx)
        stats = B.cmult_scalar(cps, stats, stdinvy)
        return stats, out_filter
    return None, None


def compute_std_inv(mpc, cps, varx, vary, nsnps, filt):
    """varx/vary -> 1/sqrt via SS (computeStdInv, gwas/assoc.go:887-953)."""
    ring = mpc.ring
    pid = mpc.pid
    slots = cps.slots if cps else 1
    varx_ss = ss_he.cvec_to_ss(mpc, cps, varx, -1, slots * len(varx))
    vary_ss = ss_he.ciphertext_to_ss(mpc, cps, vary, -1, 1)

    n_all = varx_ss.shape[0]
    var_ss = ring.zeros((nsnps + 1,))
    if pid > 0:
        idx = np.where(filt)[0][:nsnps]
        var_ss = R.aset(var_ss, slice(None, nsnps), np.asarray(varx_ss)[idx])
    var_ss = R.aset(var_ss, nsnps, np.asarray(vary_ss)[0])

    stdinv_ss = mpc.sqrt_and_sqrt_inverse(var_ss)[1]

    stdinvx_ss = ring.zeros((n_all,))
    if pid > 0:
        idx = np.where(filt)[0][:nsnps]
        stdinvx_ss = R.aset(stdinvx_ss, idx, np.asarray(stdinv_ss)[:nsnps])

    stdinvx_cv = ss_he.ss_to_cmat(mpc, cps, stdinvx_ss[None])
    stdinvy_ct = ss_he.ss_to_ciphertext(mpc, cps, stdinv_ss[nsnps : nsnps + 1][None])
    if pid > 0:
        stdinvy_ct = B.rotate_and_add(cps, stdinvy_ct, cps.slots)
        return stdinvx_cv[0], stdinvy_ct
    return None, None


# ---------------------------------------------------------------------------
# Logistic regression (gwas/assoc.go:955-1476)


def _sigmoid_coeffs(a: float, b: float, degree: int):
    return B.chebyshev_coeffs(lambda x: 1.0 / (1.0 + math.exp(-x)), a, b, degree)


def compute_grad_and_inv_hessian(
    mpc,
    cps,
    Cm,
    C_scaled_up,
    y: np.ndarray,
    weights,
    approx,
    nrows_all,
    skip_intercept: bool,
    compute_grad: bool,
    inverse_mat_scale: float,
):
    """One Newton step's ingredients (gwas/assoc.go:992-1171).
    Returns (grad, ZTwZInv, BT, Wz, yTilde, w).  At party 0 pass the
    covariate COUNT as Cm (the dealer engages only in the SS segment:
    Hessian inversion via eigendecomposition, reference assoc.go:529-574)."""
    from ..mpc import linalg as linalg_mod

    ctx = cps.ctx
    tot_n = sum(nrows_all[1:])
    if mpc.pid == 0:
        ncov = int(Cm)
        ztwz_ss = ss_he.cmat_to_ss(mpc, cps, [None] * ncov, -1, ncov)
        b_ss = linalg_mod.matrix_inverse_sqrt_svd(mpc, ztwz_ss)
        ss_he.ss_to_cmat(mpc, cps, np.swapaxes(np.asarray(b_ss), 0, 1))
        return None, None, None, None, None, None
    n_local = len(y)
    ncov = len(Cm)

    # u / pHat: sigmoid(C w)
    if skip_intercept:
        cov_intercept = B.encrypt_float_vector(cps, np.zeros(n_local))
    else:
        cov_intercept = MM.cmult_mat_col_times_col_to_col(
            cps, Cm, weights, len(Cm[0])
        )
    a_lo, b_hi, degree = approx
    coeffs = _sigmoid_coeffs(a_lo, b_hi, degree)

    def _refresh_local(net, cps_, ct, _src):
        # the sigmoid operand is party-local (each party's own rows), so the
        # in-recurrence refresh must take per-source turns, not the shared-ct
        # collective path
        return mhe.bootstrap_mat_all(net, cps_, [[ct]])[0][0]

    p_hat = B.evaluate_chebyshev_bsgs(
        mpc.net, cps, cov_intercept, coeffs, a_lo, b_hi, _refresh_local
    )
    # sub-top refresh = exact scale reset, so y adds at exactly p_hat's
    # scale (same DC-bias class as the linear ynew, see
    # get_association_stats)
    p_hat = mhe.bootstrap_mat_all(
        mpc.net, cps, [p_hat], target_nmod=ctx.nq - 2
    )[0]

    y_pt = B.encode_float_vector(cps, y)
    y_tilde = [ctx.mul_const_int(ct, -1) for ct in p_hat]
    y_tilde = B.cpadd(cps, y_tilde, y_pt)

    grad = None
    if compute_grad:
        grad = MM.cmult_mat_inner_prod_vector(cps, Cm, y_tilde)
        grad = mhe.aggregate_cvec(mpc.net, cps, grad)

    # w = pHat (1 - pHat)
    p_sq = B.cmult(cps, p_hat, p_hat)
    nm = min(p_hat[0].nmod, p_sq[0].nmod)
    w_vec = [
        ctx.sub(ctx.drop_to(a_, nm), ctx.drop_to(b_, nm))
        for a_, b_ in zip(p_hat, p_sq)
    ]
    w_vec = mhe.bootstrap_mat_all(mpc.net, cps, [w_vec])[0]

    # V = w o C_scaled_up
    Wz = [B.cmult(cps, w_vec, C_scaled_up[i]) for i in range(ncov)]
    # downstream consumers (Z^T W Z here; WzBT / Wz(Z^TWZ)^-1 in the score
    # test) each need 2 more mult levels off Wz
    Wz = mhe.bootstrap_mat_all(mpc.net, cps, Wz)

    # W = C^T Wz, inverted via SS eigendecomposition
    ZTwZ = MM.cmult_mat_inner_prod(cps, Cm, Wz)
    ZTwZ = mhe.aggregate_cmat(mpc.net, cps, ZTwZ)
    ZTwZ = mhe.bootstrap_mat(mpc.net, cps, ZTwZ, -1)
    ZTwZ = [
        B.cmult_const(cps, row, 1.0 / (tot_n / inverse_mat_scale), rescale=True)
        for row in ZTwZ
    ]

    ztwz_ss = ss_he.cmat_to_ss(mpc, cps, ZTwZ, -1, ncov)
    b_ss = linalg_mod.matrix_inverse_sqrt_svd(mpc, ztwz_ss)
    bt_cm = ss_he.ss_to_cmat(mpc, cps, np.swapaxes(np.asarray(b_ss), 0, 1))
    if mpc.pid == 0:
        return None, None, None, None, None, None
    scale_back = math.sqrt((inverse_mat_scale * 2) / math.sqrt(tot_n))
    BT = [B.cmult_const(cps, row, scale_back, rescale=True) for row in bt_cm]
    ZTwZInv = MM.cmult_mat_inner_prod(cps, BT, [row for row in BT])
    # ZTwZInv lands at the base level; refresh so the Newton step /
    # score-test outer products have headroom (identical across parties)
    ZTwZInv = mhe.bootstrap_mat(mpc.net, cps, ZTwZInv, -1)
    return grad, ZTwZInv, BT, Wz, y_tilde, w_vec


def lr_newton_cov_only(
    mpc, cps, Cm, y, epochs, nrows_all, approx, inverse_mat_scale
):
    """Covariate-only Newton iterations (LrNewtonBasedCovOnly,
    gwas/assoc.go:955-990).  Cm is the combined basis scaled by 1/sqrt(n);
    at party 0 pass the covariate COUNT as Cm."""
    ctx = cps.ctx
    tot_n = sum(nrows_all[1:])
    if mpc.pid == 0:
        for i in range(epochs):
            compute_grad_and_inv_hessian(
                mpc, cps, Cm, None, np.zeros(0), None, approx, nrows_all,
                i == 0, True, inverse_mat_scale,
            )
        return None
    C_scaled = B.cmult_const_mat(cps, Cm, math.sqrt(tot_n), rescale=True)
    weights = B.encrypt_float_vector(cps, np.zeros(cps.slots))
    for i in range(epochs):
        grad, inv_hess, _, _, _, _ = compute_grad_and_inv_hessian(
            mpc, cps, Cm, C_scaled, y, weights, approx, nrows_all,
            i == 0, True, inverse_mat_scale,
        )
        grad = mhe.bootstrap_mat(mpc.net, cps, [grad], -1)[0]
        step = MM.cmult_mat_col_times_col_to_col(cps, inv_hess, grad, len(weights))
        nm = min(weights[0].nmod, step[0].nmod)
        weights = [
            ctx.add(ctx.drop_to(a_, nm), ctx.drop_to(b_, nm))
            for a_, b_ in zip(weights, step[: len(weights)])
        ]
        weights = mhe.bootstrap_mat_all(mpc.net, cps, [weights])[0]
    return weights


def gwy_score_test(
    mpc, cps, Cm, geno_blocks, y, weights, approx, nrows_all,
    inverse_mat_scale, cache_prefix=None,
):
    """Per-SNP logistic score test (gWY, gwas/assoc.go:1174-1476):
    t = g~^T y~ / sqrt(g~^T W g~ - correction)."""
    ctx = cps.ctx
    ring = mpc.ring
    slots = cps.slots if cps else 1
    tot_n = sum(nrows_all[1:])
    pid = mpc.pid

    if pid > 0:
        C_scaled = B.cmult_const_mat(cps, Cm, math.sqrt(tot_n), rescale=True)
        _, ZTwZInv, BT, Wz, y_tilde, w_vec = compute_grad_and_inv_hessian(
            mpc, cps, Cm, C_scaled, y, weights, approx, nrows_all,
            False, False, inverse_mat_scale,
        )
        ncov = len(Cm)
        n_local = len(y)
        WzZTwZInv = MM.cmult_mat_col_times_row_to_col(cps, Wz, ZTwZInv, ncov)
        WzZTwZInv = mhe.bootstrap_mat_all(mpc.net, cps, WzZTwZInv)
        WzBT = MM.cmult_mat_col_times_row_to_col(cps, Wz, BT, ncov)
        WzBT = mhe.bootstrap_mat_all(mpc.net, cps, WzBT)

        # o = Wz (Z^T W Z)^{-1} Z^T y~
        y_tilde = mhe.bootstrap_mat_all(mpc.net, cps, [y_tilde])[0]
        ZTy = MM.cmult_mat_inner_prod_vector(cps, C_scaled, y_tilde)
        ZTy = mhe.aggregate_cvec(mpc.net, cps, ZTy)
        ZTy = mhe.bootstrap_mat(mpc.net, cps, [ZTy], -1)[0]
        o_vec = MM.cmult_mat_col_times_col_to_col(cps, WzZTwZInv, ZTy, len(Wz[0]))
        o_vec = B.cmult_const(cps, o_vec, 1.0 / tot_n, rescale=True)
        o_vec = mhe.bootstrap_mat_all(mpc.net, cps, [o_vec])[0]
    else:
        # Cm carries the covariate count at party 0
        compute_grad_and_inv_hessian(
            mpc, cps, Cm, None, np.zeros(0), None, approx, nrows_all,
            False, False, inverse_mat_scale,
        )

    results, out_filt = [], []
    nblocks = len(geno_blocks) if pid > 0 else mpc.net.recv_int(mpc.hub_pid)
    if pid == mpc.hub_pid:
        mpc.net.send_int(nblocks, 0)
    for blk in range(nblocks):
        if pid > 0:
            G = fs.load_block(geno_blocks[blk])  # streamed: one block resident
            msnp = G.shape[1]
            nsnp_ct = 1 + (msnp - 1) // slots
            if pid == mpc.hub_pid:
                mpc.net.send_int(msnp, 0)
            # one diagonal encoding serves the three unsquared multiplies of
            # this block (g^T WzBT / g^T y~ / g^T o); only g^2 needs its own
            nmod_mm = MM.mm_nmod(cps)
            g_cache = MM.preprocess_matrix(cps, G, nmod_mm)
            # b-part: (g^T W z BT)^2 summed over covariates
            ztwbt_g = MM.mat_mult_cached(cps, WzBT, g_cache)
            ztwbt_g = mhe.aggregate_cmat(mpc.net, cps, ztwbt_g)
            ztwbt_g = mhe.bootstrap_mat(mpc.net, cps, ztwbt_g, -1)
            gTW2g = None
            for i in range(len(ztwbt_g)):
                sq = B.cmult(cps, ztwbt_g[i], ztwbt_g[i])
                if gTW2g is None:
                    gTW2g = sq
                    continue
                nm = min(gTW2g[0].nmod, sq[0].nmod)
                gTW2g = [
                    ctx.add(ctx.drop_to(a_, nm), ctx.drop_to(b_, nm))
                    for a_, b_ in zip(gTW2g, sq)
                ]
            gTW2g = B.cmult_const(cps, gTW2g, 1.0 / tot_n, rescale=True)

            # x-part: g^T W g with squared genotypes
            gTWg, _, _ = MM.mat_mult_stream(cps, [w_vec], G, square=True)
            gTWg = mhe.aggregate_cmat(mpc.net, cps, gTWg)
            nm = min(gTWg[0][0].nmod, gTW2g[0].nmod)
            denom = [
                ctx.sub(ctx.drop_to(a_, nm), ctx.drop_to(b_, nm))
                for a_, b_ in zip(gTWg[0], gTW2g)
            ]
            denom = mhe.bootstrap_mat(mpc.net, cps, [denom], -1)[0]

            # numerator: g^T y~ - g^T o
            gTy = MM.mat_mult_cached(cps, [y_tilde], g_cache)
            gTo = MM.mat_mult_cached(cps, [o_vec], g_cache)
            MM.release_plan(g_cache)
            del g_cache, G
            nm = min(gTy[0][0].nmod, gTo[0][0].nmod)
            numer = [
                ctx.sub(ctx.drop_to(a_, nm), ctx.drop_to(b_, nm))
                for a_, b_ in zip(gTy[0], gTo[0])
            ]
            numer = mhe.aggregate_cvec(mpc.net, cps, numer)
            numer = mhe.bootstrap_mat(mpc.net, cps, [numer], -1)[0]
        else:
            msnp = mpc.net.recv_int(mpc.hub_pid)
            nsnp_ct = 1 + (msnp - 1) // slots
            denom = [None] * nsnp_ct
            numer = [None] * nsnp_ct

        numer_ss = ss_he.cvec_to_ss(mpc, cps, numer, -1, slots * nsnp_ct)
        denom_ss = ss_he.cvec_to_ss(mpc, cps, denom, -1, slots * nsnp_ct)
        _, inv_sqrt = mpc.sqrt_and_sqrt_inverse(denom_ss, True)
        t_stat = mpc.ss_mult_elem(numer_ss, inv_sqrt)
        t_stat = mpc.trunc(t_stat)
        out = ss_he.ss_to_cmat(mpc, cps, t_stat[None])
        if pid > 0:
            results.extend(out[0])
            fl = np.zeros(nsnp_ct * slots, bool)
            fl[:msnp] = True
            out_filt.append(fl)
    if pid > 0:
        return results, np.concatenate(out_filt)
    return None, None
