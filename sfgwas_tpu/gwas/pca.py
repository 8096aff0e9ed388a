"""Phase 2: distributed PCA (randomized sketch + power iteration).

Re-implementation of gwas/pca.go:49-495:

* count-sketch of local individuals into kp buckets with random signs
  (gwas/pca.go:123-165), aggregated across parties in HE;
* mean/variance/stdinv of each SNP in secret shares with the near-zero
  variance guard (gwas/pca.go:193-236), converted to HE;
* lazily-normalized power iterations Q <- QR(Q X^T X) using the BSGS
  matmult caches (gwas/pca.go:339-371) with the same 1/sqrt(n), 1/sqrt(m)
  rescalings;
* Gram matrix Q Q^T via encrypted inner products, eigendecomposition +
  oblivious sort in secret shares, PC subspace extraction V * Q
  (gwas/pca.go:399-489)."""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..crypto import basics as B
from ..mpc import linalg, mhe, ss_he
from ..mpc.mhe import CryptoParams
from ..mpc.mpc import MPC
from ..ops import ring as R
from ..utils.log import log
from . import matmult as MM


def distributed_pca(
    mpc: MPC,
    cps: CryptoParams,
    X: Optional[np.ndarray],  # local individuals x PCA SNPs (int8); None at pid 0
    nsnp: int,
    nrows_all: List[int],
    npc: int,
    num_oversample: int,
    num_power_iters: int,
    cache_prefix: Optional[str] = None,
    restart_iter: int = 0,
    skip_power_iter: bool = False,
    debug: bool = False,
    iter_per_eigenval: int = 5,
    qr_method: str = "cholqr2",
) -> B.CipherMatrix:
    ring = mpc.ring
    pid = mpc.pid
    fb, kb = mpc.frac_bits, mpc.data_bits
    slots = cps.slots if cps else 0
    kp = npc + num_oversample
    tot_ind = sum(nrows_all[1:])
    nind = X.shape[0] if X is not None else 0
    inv_sqrt_m = 1.0 / math.sqrt(nsnp)
    inv_sqrt_n = 1.0 / math.sqrt(tot_ind)

    # Preprocess diagonal caches for X (ind x snp) and X^T (snp x ind).
    # Residency is sized to the device: when both caches' NTT polys would
    # exceed the HBM budget (PN14 example scale: ~9 GB for 10k LD-pruned
    # SNPs), they stay host-resident as pre-NTT chunks and stream to the
    # device per scan group (the reference's DiagCacheStream discipline,
    # gwas/filestream.go:19-282).
    x_cache = xt_cache = None
    if pid > 0:
        import os as _os

        S = cps.slots
        nmod_mm = MM.mm_nmod(cps)

        def _dev_bytes(n_r, n_c):
            tot = 0
            for bi in range(0, n_r, S):
                r = min(S, n_r - bi)
                for bj in range(0, n_c, S):
                    c = min(S, n_c - bj)
                    ndiag = r + (c - 1 if c > 1 else 0)
                    ndiag = min(ndiag, S)
                    tot += ndiag * nmod_mm * cps.ctx.n * 4
            return tot

        budget = int(
            _os.environ.get("SFGWAS_PCA_DEVICE_CACHE_BYTES", 6 << 30)
        )
        host_res = 2 * _dev_bytes(X.shape[0], X.shape[1]) > budget
        if host_res:
            log(
                f"pid{pid} pca: diag caches host-streamed "
                f"({2 * _dev_bytes(X.shape[0], X.shape[1]) / 1e9:.1f} GB of "
                f"device polys > {budget / 1e9:.1f} GB budget)"
            )
        x_cache = MM.preprocess_matrix(
            cps, X,
            cache_file=f"{cache_prefix}_x.npz" if cache_prefix else None,
            host_resident=host_res,
        )
        xt_cache = MM.preprocess_matrix(
            cps,
            np.ascontiguousarray(X.T),
            cache_file=f"{cache_prefix}_xt.npz" if cache_prefix else None,
            host_resident=host_res,
        )

    # ---- sketch + first/second moments (gwas/pca.go:122-191)
    Q = None
    bucket_count = np.zeros(kp, dtype=np.int64)
    xsum = np.zeros(nsnp, dtype=np.int64)
    x2sum = np.zeros(nsnp, dtype=np.int64)
    if pid > 0:
        g = mpc.rand.table[mpc.pid]  # local (private) PRG, gwas/pca.go:130
        bucket = g.integers(0, kp, size=nind)
        sgn = g.integers(0, 2, size=nind) * 2 - 1
        pos_count = np.zeros(kp, dtype=np.int64)
        local_sketch = np.zeros((kp, nsnp))
        Xf = X.astype(np.float64)
        for b in range(kp):
            sel = bucket == b
            bucket_count[b] = sel.sum()
            pos_count[b] = (sgn[sel] > 0).sum()
            if sel.any():
                local_sketch[b] = (sgn[sel][:, None] * Xf[sel]).sum(axis=0)
        xsum = X.astype(np.int64).sum(axis=0)
        x2sum = (X.astype(np.int64) ** 2).sum(axis=0)

        Qloc = B.encrypt_float_matrix(cps, local_sketch)
        Q = mhe.aggregate_cmat(mpc.net, cps, Qloc)
        bucket_count = mhe.aggregate_int_vec(mpc.net, bucket_count)
        pos_count = mhe.aggregate_int_vec(mpc.net, pos_count)
        if _os.environ.get("SFGWAS_PCA_PROBE"):
            vals = mhe.collective_decrypt_many(mpc.net, cps, Q[0], -1)
            g = np.concatenate([np.asarray(cps.ctx.decode(p)) for p in vals])
            log(
                f"pid{pid} PROBE Q_agg[0]: |max|={np.abs(g).max():.3e} "
                f"nmod={Q[0][0].nmod}"
            )

    # mean / var / stdinv in SS (local counts are shares)
    inv_n = 1.0 / tot_ind
    if pid > 0:
        sx = ring.from_i32(np.asarray(xsum, np.int32))
        sx2_counts = ring.from_i32(np.asarray(x2sum, np.int32))
        scale_c = ring.const_np(int(round(inv_n * (1 << (2 * fb)))))
        sx = ring.mul(sx, np.broadcast_to(scale_c, sx.shape))
        sx2 = ring.mul(sx2_counts, np.broadcast_to(scale_c, sx2_counts.shape))
    else:
        sx = ring.zeros((nsnp,))
        sx2 = ring.zeros((nsnp,))

    x_mean_ss = mpc.trunc(sx, kb, fb)
    x_mean_sq = mpc.ss_square_elem(x_mean_ss)
    sx2 = ring.sub(sx2, x_mean_sq)
    x_var_ss = mpc.trunc(sx2, kb, fb)

    # near-zero variance -> 1.0 (gwas/pca.go:213-216)
    zero_thres = ring.const_np(max(1, int(round(1e-8 * (1 << fb)))))
    zero_filt = mpc.flip_bit(mpc.not_less_than_public(x_var_ss, zero_thres))
    one_fb = ring.const_np(1 << fb)
    x_var_ss = ring.add(
        x_var_ss, ring.mul(zero_filt, np.broadcast_to(one_fb, zero_filt.shape))
    )

    _, x_stdinv_ss = mpc.sqrt_and_sqrt_inverse(x_var_ss)

    padded = slots * (1 + (nsnp - 1) // slots) if pid > 0 else nsnp
    stats = ring.zeros((3, padded))
    if pid > 0:
        stats = R.aset(stats, (0, slice(None, nsnp)), x_stdinv_ss)
        stats = R.aset(stats, (1, slice(None, nsnp)), x_mean_ss)
        stats = R.aset(stats, (2, slice(None, nsnp)), x_var_ss)
    out_cm = ss_he.ss_to_cmat(mpc, cps, stats)
    x_stdinv = x_mean = None
    if pid > 0:
        x_stdinv, x_mean = out_cm[0], out_cm[1]

    # ---- initial Q scaling (gwas/pca.go:248-284)
    if pid > 0:
        _pp = _os.environ.get("SFGWAS_PCA_PROBE")

        def _pstep(tag, cv):
            if not _pp:
                return
            vals = mhe.collective_decrypt_many(mpc.net, cps, cv, -1)
            g = np.concatenate([np.asarray(cps.ctx.decode(p)) for p in vals])
            log(f"pid{pid} PROBE {tag}: |max|={np.abs(g).max():.3e}")

        for b in range(kp):
            inv_cnt = 1.0 / math.sqrt(max(bucket_count[b], 1))
            mean_weight = int(2 * pos_count[b] - bucket_count[b])
            mw = B.cmult_const(cps, x_mean, -float(mean_weight), rescale=True)
            if b == 0:
                log(f"pid{pid} PROBE consts: mw={mean_weight} cnt={bucket_count[b]}")
                _pstep("b0 mw", mw)
            Q[b] = [
                cps.ctx.add(
                    cps.ctx.drop_to(q, min(q.nmod, m.nmod)),
                    cps.ctx.drop_to(m, min(q.nmod, m.nmod)),
                )
                for q, m in zip(Q[b], mw)
            ]
            if b == 0:
                _pstep("b0 after add", Q[b])
                if _pp and pid == 1 and cache_prefix:
                    np.savez(
                        f"{cache_prefix}_probe_addct.npz",
                        c0=np.asarray(Q[b][0].c0),
                        c1=np.asarray(Q[b][0].c1),
                        nmod=Q[b][0].nmod,
                        scale=Q[b][0].scale,
                        inv_cnt=inv_cnt,
                    )
            Q[b] = B.cmult_const(cps, Q[b], inv_cnt, rescale=True)
            if b == 0:
                _pstep("b0 after inv_cnt", Q[b])
            Q[b] = B.cmult(cps, Q[b], x_stdinv)
            if b == 0:
                _pstep("b0 after cmult stdinv", Q[b])
        Q = mhe.bootstrap_mat(mpc.net, cps, Q, -1)

    from .qrfact import net_qr
    from . import utilities as U

    # SFGWAS_PCA_PROBE=1: joint-decrypt magnitude probes at phase-2 stage
    # boundaries (identical-across-parties cts only) — the in-vivo bisect
    # tool for value-level corruption that standalone component probes miss
    import os as _os

    _probe_on = bool(_os.environ.get("SFGWAS_PCA_PROBE")) and pid > 0

    def _probe(tag, cv):
        if not _probe_on or cv is None or cv[0] is None:
            return
        vals = mhe.collective_decrypt_many(mpc.net, cps, cv, -1)
        g = np.concatenate([np.asarray(cps.ctx.decode(p)) for p in vals])
        log(
            f"pid{pid} PROBE {tag}: |max|={np.abs(g).max():.3e} "
            f"nmod={cv[0].nmod} scale=2^{math.log2(cv[0].scale):.2f}"
        )

    _probe("x_stdinv", x_stdinv)
    _probe("x_mean", x_mean)
    if pid > 0:
        _probe("Q_sketch[0]", Q[0])

    # restart / skip support (restart_pca_from_iter, skip_power_iter,
    # gwas/pca.go:244-331, 382-394): per-iteration decrypted dumps are the
    # resume artifacts (the reference's QmulB_%d.txt; TODO acknowledged there
    # that these leak -- same trade-off here, gated on debug)
    import os as _os

    def _iter_cache(it):
        return f"{cache_prefix}_QmulB_{it}.txt" if cache_prefix else None

    it_start = 0
    if skip_power_iter or restart_iter > 0:
        it = num_power_iters - 1 if skip_power_iter else restart_iter
        f = _iter_cache(it)
        if f and _os.path.exists(f):
            if pid > 0:
                mat = U.load_matrix_float(f)
                Qloc = [B.encrypt_float_vector(cps, row) for row in mat]
            else:
                Qloc = [None] * kp
            if it == num_power_iters - 1:
                Q = Qloc
            else:
                Q = net_qr(cps, mpc, Qloc, nrows_all, method=qr_method)
            it_start = it + 1
        else:
            restart_iter = 0

    if it_start == 0:
        # initial projection to individual space + QR
        if pid > 0:
            Qloc = MM.qx_lazy_norm_stream(
                cps, mpc, Q, xt_cache, x_mean, x_stdinv, nind, post_scale=inv_sqrt_m
            )
        else:
            Qloc = [None] * kp
        if _probe_on and pid > 0:
            for p in range(1, mpc.nparty):
                U.save_matrix_collective(
                    mpc.net, cps, Qloc, nrows_all[p], p,
                    f"{cache_prefix}_probe_qloc_init.txt",
                )
        Q = net_qr(cps, mpc, Qloc, nrows_all, method=qr_method)
        if _probe_on and pid > 0:
            for p in range(1, mpc.nparty):
                U.save_matrix_collective(
                    mpc.net, cps, Q, nrows_all[p], p,
                    f"{cache_prefix}_probe_q_postqr.txt",
                )

    # ---- power iterations (gwas/pca.go:339-371)
    for it in range(it_start, num_power_iters):
        # lockstep barrier (gwas/pca.go:121 AssertSync): the dealer's ops in
        # an iteration are send-only, so without this pid0 races arbitrarily
        # far ahead, queueing unbounded correlated-randomness traffic (r4:
        # 148k messages / 161 MB backlog) and desynchronizing phase logs
        mpc.assert_sync()
        log(f"pid{pid} PCA power iter {it + 1}/{num_power_iters}")
        if pid > 0:
            Qs = MM.qxt_lazy_norm_stream(
                cps, mpc, Q, x_cache, x_mean, x_stdinv, post_scale=inv_sqrt_n
            )
            Qsnp = mhe.aggregate_cmat(mpc.net, cps, Qs)
            Qsnp = mhe.bootstrap_mat(mpc.net, cps, Qsnp, -1)
            Qloc = MM.qx_lazy_norm_stream(
                cps, mpc, Qsnp, xt_cache, x_mean, x_stdinv, nind,
                post_scale=inv_sqrt_m,
            )
        else:
            Qloc = [None] * kp
        if debug and pid > 0 and cache_prefix:
            for p in range(1, mpc.nparty):
                U.save_matrix_collective(
                    mpc.net, cps, Qloc, nrows_all[p], p, _iter_cache(it)
                )
        if it == num_power_iters - 1:
            Q = Qloc
        else:
            Q = net_qr(cps, mpc, Qloc, nrows_all, method=qr_method)

    # ---- Gram matrix Z = Q Q^T (gwas/pca.go:399-442)
    if pid > 0:
        nct = ((kp * kp) - 1) // slots + 1
        # ONE batched relin-mult for all kp(kp+1)/2 pairs + one shared
        # rotation ladder + one fused mask-scatter per packed output ct
        # (fixed batch shapes: one compile, not kp)
        gpairs = [(i, j) for i in range(kp) for j in range(i, kp)]
        prods = None
        for t in range(len(Q[0])):
            row = B.cmult_pairs(
                cps,
                [Q[i][t] for (i, j) in gpairs],
                [Q[j][t] for (i, j) in gpairs],
            )
            prods = (
                row
                if prods is None
                else [cps.ctx.add(a_, b_) for a_, b_ in zip(prods, row)]
            )
        sums = B.rotate_and_add_many(cps, prods, slots)
        slot_lists = [
            [i * kp + j] if i == j else [i * kp + j, j * kp + i]
            for (i, j) in gpairs
        ]
        zloc = B.mask_scatter_sum(
            cps, sums, slot_lists, nct, value=inv_n,
            cache_key=("pca_gram", kp),
        )
        z = mhe.aggregate_cvec(mpc.net, cps, zloc)
        z = mhe.bootstrap_vec(mpc.net, cps, z, -1)
    else:
        z = None

    zss = ss_he.cvec_to_ss(mpc, cps, z, -1, kp * kp)
    zmat = zss.reshape(kp, kp, ring.nlimb)

    # ---- eigendecomposition in SS (gwas/pca.go:444-461)
    V, L = linalg.eigen_decomp(mpc, zmat, iter_per_eval=iter_per_eigenval)
    V, L = linalg.sort_rows_descend(mpc, V, L)
    V = V[:npc]

    v_cm = ss_he.ss_to_cmat(mpc, cps, V)

    # ---- PC subspace: Qpc[r] = sum_c V[r, c] * Q[c] (gwas/pca.go:467-489)
    if pid == 0:
        return [None] * npc
    n_ct_ind = len(Q[0])
    s_ref = max(Q[c][0].scale for c in range(kp))
    Qpc = []
    for r in range(npc):
        # batched: one one-hot multiply + shared rotation ladder expands all
        # kp eigenvector entries (with per-column drift compensation folded
        # into the one-hot values); one pairwise mult + segment-sum per row
        elems = []
        for tcid, vct in enumerate(v_cm[r]):
            lo = tcid * slots
            n_here = min(slots, kp - lo)
            elems.extend(
                B.expand_slots_many(
                    cps, vct, list(range(n_here)),
                    cache_key=("pca_v", kp, tcid),
                    value_scales=[
                        s_ref / Q[lo + c][0].scale for c in range(n_here)
                    ],
                )
            )
        row = []
        for t in range(n_ct_ind):
            col = B.cmult_pairs(
                cps, [Q[c][t] for c in range(kp)], elems
            )
            out_scale = col[0].scale * s_ref / Q[0][t].scale
            row.append(
                B.add_group_mod(cps, col, [0] * kp, 1, out_scale=out_scale)[0]
            )
        Qpc.append(row)
    return Qpc
