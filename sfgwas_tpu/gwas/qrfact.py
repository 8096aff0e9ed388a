"""Distributed QR factorization over encrypted, row-partitioned matrices.

Re-implementation of gwas/qrfact.go:

* NetDQRenc (gwas/qrfact.go:47-316): column-by-column Householder where the
  squared column norm is aggregated across parties in HE, the sqrt/sign
  arithmetic runs in secret shares, the rank-1 update uses DCMatMulAAtB, and
  unit vectors are kept scaled by sqrt(N) for precision;
* NetDQRplain (gwas/qrfact.go:319-384): local plaintext QR per party, then
  NetDQRenc on the stacked R blocks and recombination Qloc * Qp.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp
import numpy as np

from ..crypto import basics as B
from ..crypto import ckks as C
from ..mpc import linalg, mhe, ss_he
from ..mpc.mhe import CryptoParams
from ..mpc.mpc import MPC
from ..utils.log import log
from ..utils import prof
from .matmult import dc_matmul_aat_b


def net_dqr_enc(
    cps: CryptoParams, mpc: MPC, A: B.CipherMatrix, nrows_all: List[int]
) -> B.CipherMatrix:
    """Orthonormalize the columns of the row-partitioned encrypted matrix A
    (each A[c] a CipherVector of this party's rows).  Returns Q scaled by
    sqrt(N) (gwas/qrfact.go:46)."""
    ring = mpc.ring
    pid = mpc.pid
    fb, kb = mpc.frac_bits, mpc.data_bits
    slots = cps.slots
    nparty = mpc.nparty
    ncols = len(A)
    tot_n = sum(nrows_all[1:])
    sqrt_n = math.sqrt(tot_n)
    inv_n = 1.0 / tot_n
    inv_sqrt_n = 1.0 / sqrt_n

    v_list: List[B.CipherVector] = [None] * ncols

    # the whole QR lives in the working band: every column re-bootstraps A
    # anyway, so refreshing to the top just makes every product ~2.5x more
    # expensive.  band+2 keeps the HE->SS conversions above their headroom
    # floor (~130 bits).
    qr_band = min(cps.ctx.nq, cps.rot_nmod + 2)
    if pid > 0:
        # see net_cholqr_enc: band-clamp first so the refresh target stays
        # at qr_band and its scale reset applies to every column
        A = [[cps.ctx.drop_to(ct, qr_band) for ct in col] for col in A]
        A = mhe.bootstrap_mat_all(mpc.net, cps, A, target_nmod=qr_band)

    for col in range(ncols):
        prof.dump(f"qr pid{pid} col{col}")
        prof.reset()
        log(f"pid{pid} DQR forward col {col+1}/{ncols}")
        ncol_curr = ncols - col
        upid, ctid, slotid = (
            B.global_to_party_index(cps, nrows_all, col, nparty)
            if pid > 0
            else (1, 0, 0)
        )

        # z = sum over parties of ||A[0]||^2 (one ciphertext)
        if pid > 0:
            with prof.span("qr_sqsum"):
                zloc = B.sq_sum(cps, A[0])
                uvec = B.copy_vec(A[0])
            with prof.span("qr_aggz"):
                z = mhe.aggregate_ct(mpc.net, cps, zloc)
            log(
                f"pid{pid} DQR col{col}: A nmod={A[0][0].nmod} "
                f"z nmod={z.nmod} band={qr_band}"
            )
        else:
            z = None

        z_ss = ss_he.ciphertext_to_ss(mpc, cps, z, -1, 1)
        z_sqrt_ss, _ = mpc.sqrt_and_sqrt_inverse(z_ss)

        ss_in = uvec[ctid] if (pid > 0 and upid == pid) else None
        x_full = ss_he.ciphertext_to_ss(mpc, cps, ss_in, upid, slots)
        x_ss = x_full[slotid : slotid + 1]

        with prof.span("qr_ispos"):
            sgn = mpc.is_positive(x_ss)
        sgn = mpc.ring.mul_int(sgn, 2)
        if pid == mpc.hub_pid:
            sgn = ring.sub(sgn, np.broadcast_to(ring.const_np(1), sgn.shape))

        alpha_ss = mpc.ss_mult_elem(z_sqrt_ss, sgn)

        apx = ring.add(alpha_ss, x_ss)
        concat = np.concatenate([np.asarray(apx), np.asarray(x_ss)], axis=0)
        concat_sq = mpc.ss_mult_elem(concat, concat)
        z_update = mpc.trunc(
            ring.sub(concat_sq[0:1], concat_sq[1:2]), kb, fb
        )

        _, z_new_sqrt_inv = mpc.sqrt_and_sqrt_inverse(
            ring.add(z_ss, z_update), False
        )
        scalar = ring.const_np(int(round(sqrt_n * (1 << fb))))
        z_new_sqrt_inv = ring.mul(
            z_new_sqrt_inv, np.broadcast_to(scalar, z_new_sqrt_inv.shape)
        )
        z_new_sqrt_inv = mpc.trunc(z_new_sqrt_inv, kb, fb)

        alpha_scaled = mpc.ss_mult_elem(alpha_ss, z_new_sqrt_inv)
        alpha_scaled = mpc.trunc(alpha_scaled, kb, fb)

        with prof.span("qr_ss2he"):
            alpha_ct = ss_he.ss_to_ciphertext(mpc, cps, alpha_scaled[None])
            z_inv_ct = ss_he.ss_to_ciphertext(mpc, cps, z_new_sqrt_inv[None])
        if pid > 0:
            # spread the scalar (slot 0) to every slot: single-nonzero-slot
            # sum equals the value itself (rebalance without the 1/slots)
            alpha_ct = B.rotate_and_add(cps, alpha_ct, slots)
            z_inv_ct = B.rotate_and_add(cps, z_inv_ct, slots)

        if pid > 0:
            # v = A[0] * (sqrt(N)/||v||) (+ alpha at the pivot slot)
            with prof.span("qr_uvec_mul"):
                uvec = B.cmult_scalar(cps, uvec, z_inv_ct)
            if pid == upid:
                amask = B.mask(cps, alpha_ct, slotid, False)
                uvec[ctid] = cps.ctx.add(
                    cps.ctx.drop_to(uvec[ctid], min(uvec[ctid].nmod, amask.nmod)),
                    cps.ctx.drop_to(amask, min(uvec[ctid].nmod, amask.nmod)),
                )
            # the rank-1 update needs 2 mult levels on v (inner product +
            # outer product); refresh to the top unconditionally — levels
            # diverge across parties here (only the pivot party's block was
            # masked), so a level-conditional bootstrap would desync.  The
            # reference bootstraps around the rank-1 updates too
            # (gwas/qrfact.go:201).
            uvec = mhe.bootstrap_mat_all(
                mpc.net, cps, [uvec], target_nmod=qr_band
            )[0]
            v_list[col] = uvec

            # A <- (I - 2 v v^T / N) A (batched ct-ct inner products)
            with prof.span("qr_dcmm"):
                vvta = dc_matmul_aat_b(
                    cps, mpc, [uvec], A, nrows_all, ncol_curr, None,
                    bs_target=qr_band,
                )
            newA = []
            for c in range(len(A)):
                terms = B.cmult_const(cps, vvta[c], -2 * inv_n, rescale=True)
                newA.append(
                    [
                        cps.ctx.add(
                            cps.ctx.drop_to(a, min(a.nmod, t.nmod)),
                            cps.ctx.drop_to(t, min(a.nmod, t.nmod)),
                        )
                        for a, t in zip(A[c], terms)
                    ]
                )
            A = mhe.bootstrap_mat_all(mpc.net, cps, newA, target_nmod=qr_band)
            # drop first column; mask out the pivot row.  EVERY ct at EVERY
            # party passes through the same mask-rescale: a pivot-only mask
            # leaves levels and scales diverged across the mesh, and the
            # scale-alignment multiply that forces inside the next column's
            # z-aggregate burns the working band down to the base (observed
            # as an HE->SS headroom failure on the PN14 example run)
            A = A[1:]
            if A:
                for c in range(len(A)):
                    for ti in range(len(A[c])):
                        if upid == pid and ti == ctid:
                            A[c][ti] = B.mask(cps, A[c][ti], slotid, True)
                        else:
                            A[c][ti] = B.ones_rescale(cps, A[c][ti])
                A, _ = B.flatten_levels(cps, A)
        # party 0 participates in the aggregated/SS ops only; it has no
        # ciphertext columns to update here

    # Backward pass: reconstruct Q from the Householder vectors
    if pid == 0:
        return [None] * ncols

    nrows = nrows_all[pid]
    nct = ((nrows - 1) // slots) + 1
    Q: B.CipherMatrix = []
    for c in range(ncols):
        colvec = np.zeros(nrows)
        upid, ctid, slotid = B.global_to_party_index(cps, nrows_all, c, nparty)
        if upid == pid:
            colvec[ctid * slots + slotid] = sqrt_n
        Q.append(B.encrypt_float_vector(cps, colvec))

    for j in range(ncols - 1, -1, -1):
        log(f"pid{pid} DQR backward col {j+1}/{ncols}")
        upid, ctid, slotid = B.global_to_party_index(cps, nrows_all, j, nparty)
        ncol_curr = ncols - j
        qslice = Q[j:]
        vmat = [v_list[j]]

        def fn(cp, a, Bm, jj):
            if jj == 0:
                # every party shapes a mask-result ct (scale/level identical
                # across parties by symmetry); non-pivot parties zero it so
                # the cross-party aggregate has consistent scale bookkeeping
                m = B.mask(cp, a[ctid] if upid == pid else a[0], slotid, False)
                if upid != pid:
                    m = C.Ciphertext(
                        jnp.zeros_like(m.c0), jnp.zeros_like(m.c1), m.nmod, m.scale
                    )
                return [m]
            return B.cmult(cp, a, Bm[jj])

        vvtq = dc_matmul_aat_b(
            cps, mpc, vmat, qslice, nrows_all, ncol_curr, fn, bs_target=qr_band
        )

        for c in range(ncol_curr):
            scalar = inv_sqrt_n if c == 0 else inv_n
            terms = B.cmult_const(cps, vvtq[c], -2 * scalar, rescale=True)
            Q[j + c] = [
                cps.ctx.add(
                    cps.ctx.drop_to(q, min(q.nmod, t.nmod)),
                    cps.ctx.drop_to(t, min(q.nmod, t.nmod)),
                )
                for q, t in zip(Q[j + c], terms)
            ]
        refreshed = mhe.bootstrap_mat_all(
            mpc.net, cps, Q[j : j + ncol_curr], target_nmod=qr_band
        )
        for c in range(ncol_curr):
            Q[j + c] = refreshed[c]

    # mask trailing slots
    for i in range(len(Q)):
        for j2 in range(len(Q[i])):
            nk = slots if j2 < len(Q[i]) - 1 else ((nrows - 1) % slots) + 1
            Q[i][j2] = B.mask_trunc(cps, Q[i][j2], nk)
    return Q


def net_cholqr_enc(
    cps: CryptoParams,
    mpc: MPC,
    A: B.CipherMatrix,
    nrows_all: List[int],
    passes: int = 2,
) -> B.CipherMatrix:
    """CholeskyQR2 orthonormalization of the row-partitioned encrypted
    matrix A — the TPU-era replacement for the per-column Householder DQR
    (gwas/qrfact.go:47-316).  Same contract as net_dqr_enc: returns Q
    scaled by sqrt(N), upper-triangular relation to A (span of the first j
    output columns = span of the first j input columns), trailing slots
    masked.

    Per pass: G = A^T A / N via batched HE inner products (ONE aggregation
    round for all k(k+1)/2 entries), HE->SS, the whole factorization in
    secret shares (mpc/linalg.py chol_whiten: correlation rescale +
    fixed-point Cholesky + triangular inverse), SS->HE of the k(k+1)/2
    whitener entries, and Q = A W as batched scalar products.  ~5
    collective rounds per pass versus ~6 per COLUMN for Householder; two
    passes (CholeskyQR2) push orthogonality error from kappa^2*eps down to
    eps.  The correlation rescale inside chol_whiten keeps pass 1 stable
    for raw covariate blocks with wildly different column scales."""
    ring = mpc.ring
    pid = mpc.pid
    slots = cps.slots if pid > 0 else 0
    nparty = mpc.nparty
    ncols = len(A)
    tot_n = sum(nrows_all[1:])
    inv_n = 1.0 / tot_n
    qr_band = min(cps.ctx.nq, cps.rot_nmod + 2) if cps else 0
    pairs = [(i, j) for i in range(ncols) for j in range(i, ncols)]

    # clamp inputs into the band FIRST (level drops are lossless): fresh
    # encryptions arrive at the chain top, and a top-level ct in the batch
    # pushes the refresh target to nq where there is no reset headroom —
    # drifted companion columns (the PCA extraction chain runs ~10% off
    # preset) would then enter the Gram unreset (r5 full-PCA phase-3 crash)
    if pid > 0:
        # clamp DOWN only: columns already below the band (e.g. Qpc from the
        # PCA extraction chain) stay put — the in-band refresh below raises
        # them; drop_to cannot (full-PCA phase-3 regression, r5 run 5)
        A = [
            [cps.ctx.drop_to(ct, min(qr_band, ct.nmod)) for ct in col]
            for col in A
        ]

    for p in range(passes):
        log(f"pid{pid} cholQR pass {p + 1}/{passes} ({ncols} cols)")
        if pid > 0:
            with prof.span("cholqr_gram"):
                A = mhe.bootstrap_mat_all(mpc.net, cps, A, target_nmod=qr_band)
                nct_g = (ncols * ncols - 1) // slots + 1
                # ONE batched relin-mult for ALL k(k+1)/2 pairs + one shared
                # rotation ladder + one fused mask-scatter per packed output
                # ct.  The per-column variant compiled a fresh kernel for
                # every batch size ncols-i and dispatched ~3k small mask ops
                # per pass — the round-4 full-PCA compile/dispatch stall.
                prods = None
                for t in range(len(A[0])):
                    row = B.cmult_pairs(
                        cps,
                        [A[i][t] for (i, j) in pairs],
                        [A[j][t] for (i, j) in pairs],
                    )
                    prods = (
                        row
                        if prods is None
                        else [cps.ctx.add(a_, b_) for a_, b_ in zip(prods, row)]
                    )
                sums = B.rotate_and_add_many(cps, prods, slots)
                slot_lists = [
                    [i * ncols + j] if i == j else [i * ncols + j, j * ncols + i]
                    for (i, j) in pairs
                ]
                zloc = B.mask_scatter_sum(
                    cps, sums, slot_lists, nct_g, value=inv_n,
                    cache_key=("cholqr_gram", ncols),
                )
                z = mhe.aggregate_cvec(mpc.net, cps, zloc)
                z = mhe.bootstrap_vec(mpc.net, cps, z, -1)
        else:
            z = None

        zss = ss_he.cvec_to_ss(mpc, cps, z, -1, ncols * ncols)
        G = zss.reshape(ncols, ncols, ring.nlimb)
        with prof.span("cholqr_ss"):
            W = linalg.chol_whiten(mpc, G)

        # SS->HE: ONE packed ciphertext carries all k(k+1)/2 whitener
        # entries (one host encode instead of one per entry); a batched
        # one-hot multiply + shared rotation ladder replicates each entry
        # across slots for the scalar products below
        if pid > 0:
            ent = np.stack([np.asarray(W[i, j]) for (i, j) in pairs])[None]
        else:
            ent = ring.zeros((1, len(pairs)))
        w_cm = ss_he.ss_to_cmat(mpc, cps, ent)

        if pid > 0:
            with prof.span("cholqr_recombine"):
                # drift compensation: column scales can differ by a few
                # permille when the band sits at the top (no bootstrap reset
                # headroom).  Fold s_ref/s_i into pair (i, j)'s expanded
                # whitener entry so every product lands on s_ref exactly.
                s_ref = max(A[i][0].scale for i in range(ncols))
                w_list = []
                for tcid, wct in enumerate(w_cm[0]):
                    lo = tcid * slots
                    n_here = min(slots, len(pairs) - lo)
                    w_list.extend(
                        B.expand_slots_many(
                            cps,
                            wct,
                            list(range(n_here)),
                            cache_key=("cholqr_w", len(pairs), tcid),
                            value_scales=[
                                s_ref / A[pairs[lo + e][0]][0].scale
                                for e in range(n_here)
                            ],
                        )
                    )
                # cmult_pairs min-aligns levels (the expanded w sits one
                # mask level below the top; A re-bootstraps next pass)
                w_ct = {pr: w_list[e] for e, pr in enumerate(pairs)}
                newA = [None] * ncols
                for t in range(len(A[0])):
                    col = B.cmult_pairs(
                        cps,
                        [A[i][t] for (i, j) in pairs],
                        [w_ct[(i, j)] for (i, j) in pairs],
                    )
                    out_scale = col[0].scale * s_ref / A[pairs[0][0]][t].scale
                    summed = B.add_group_mod(
                        cps, col, [j for (i, j) in pairs], ncols,
                        out_scale=out_scale,
                    )
                    for j in range(ncols):
                        if newA[j] is None:
                            newA[j] = [None] * len(A[0])
                        newA[j][t] = summed[j]
                A = newA

    if pid == 0:
        return [None] * ncols
    A = mhe.bootstrap_mat_all(mpc.net, cps, A, target_nmod=qr_band)
    nrows = nrows_all[pid]
    for i in range(len(A)):
        for j2 in range(len(A[i])):
            nk = slots if j2 < len(A[i]) - 1 else ((nrows - 1) % slots) + 1
            # retarget every column to EXACTLY the fresh-encode chain's
            # scale (Delta^2 / top pair): downstream code mixes QR outputs
            # with freshly encoded columns (the combined-Q ones column),
            # and when the band has no bootstrap-reset headroom the
            # recombine chain's drift would otherwise split the scales
            ct = A[i][j2]
            tgt = (
                cps.ctx.params.scale ** 2
                / cps.ctx.basis.primes[ct.nmod - 1]
                / cps.ctx.basis.primes[ct.nmod - 2]
            )
            A[i][j2] = B.mask_trunc(cps, ct, nk, target_scale=tgt)
    return A


def net_qr(
    cps: CryptoParams,
    mpc: MPC,
    A: B.CipherMatrix,
    nrows_all: List[int],
    method: str = "cholqr2",
) -> B.CipherMatrix:
    """QR method dispatch: 'cholqr2' (default, CholeskyQR2 — see
    net_cholqr_enc) or 'householder' (column-by-column Householder,
    the reference's NetDQRenc structure)."""
    if method == "householder":
        return net_dqr_enc(cps, mpc, A, nrows_all)
    if method == "cholqr3":
        return net_cholqr_enc(cps, mpc, A, nrows_all, passes=3)
    assert method == "cholqr2", f"unknown qr_method {method!r}"
    return net_cholqr_enc(cps, mpc, A, nrows_all, passes=2)


def net_dqr_enc_party0(cps, mpc, ncols: int, nrows_all: List[int]):
    """Party 0's matching side of net_dqr_enc: it engages only in the
    SS/aggregation sub-protocols.  The reference shares one code path with
    pid guards; here the same function works for party 0 because every
    network/SS call is pid-guarded internally."""
    return net_dqr_enc(cps, mpc, [None] * ncols, nrows_all)


def net_dqr_plain(
    cps: CryptoParams, mpc: MPC, A_local: np.ndarray, nrows_all: List[int]
) -> B.CipherMatrix:
    """DASH-style distributed QR (NetDQRplain, gwas/qrfact.go:319-384):
    each party QR-factorizes its local plaintext block, the stacked R blocks
    go through the encrypted QR, and Q = Qloc * Qp is recombined
    homomorphically.  Noted by the reference as less accurate than the fully
    encrypted path (gwas/assoc.go:158-159)."""
    pid = mpc.pid
    slots = cps.slots if cps else 0
    ncols = A_local.shape[1] if pid > 0 else 0
    if pid == mpc.hub_pid:
        mpc.net.send_int(ncols, 0)
    elif pid == 0:
        ncols = mpc.net.recv_int(mpc.hub_pid)
    nrows_total = sum(nrows_all[1:])
    scaling = 1.0 / math.sqrt(ncols * (mpc.nparty - 1)) if ncols else 0.0

    if pid > 0:
        q_loc, r_loc = np.linalg.qr(A_local)
        q_loc = q_loc * math.sqrt(nrows_total)
        r_enc = [
            B.encrypt_float_vector(cps, r_loc[:, j]) for j in range(ncols)
        ]
    else:
        r_enc = [None] * ncols

    ncol_arr = [0] + [ncols] * (mpc.nparty - 1)
    Qp = net_dqr_enc(cps, mpc, r_enc, ncol_arr)

    if pid == 0:
        return [None] * ncols

    nrows = nrows_all[pid]
    nct = ((nrows - 1) // slots) + 1
    Q: B.CipherMatrix = []
    for c in range(ncols):
        acc = None
        for j in range(ncols):
            ctid, slotid = j // slots, j % slots
            elem = B.mask(cps, Qp[c][ctid], slotid, False)
            elem = B.rotate_and_add(cps, elem, slots)
            col_pt = B.encode_float_vector(cps, q_loc[:, j])
            col = [
                cps.ctx.rescale(cps.ctx.mul_plain(elem, p)) for p in col_pt
            ]
            if acc is None:
                acc = col
            else:
                nm = min(acc[0].nmod, col[0].nmod)
                acc = [
                    cps.ctx.add(cps.ctx.drop_to(a_, nm), cps.ctx.drop_to(b_, nm))
                    for a_, b_ in zip(acc, col)
                ]
        Q.append(B.cmult_const(cps, acc, scaling, rescale=True))
    return Q
