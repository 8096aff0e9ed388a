"""Secure matrix multiplication: ciphertext row-vectors times plaintext int8
genotype blocks via BSGS generalized diagonals.

TPU-native re-implementation of gwas/matmult.go:

* the reference's uint128 lazy-accumulate inner loop
  (MulCoeffsAndAdd128/CPMultAccWithoutMRedV2, gwas/matmult.go:247-440)
  becomes batched uint32 Barrett products with one deferred reduction per
  giant group;
* baby-step rotations of A use *hoisted* key switching (one decomposition
  per ciphertext reused across all baby shifts) instead of the reference's
  per-rotation evaluator calls (gwas/matmult.go:853-881);
* the per-block-row diagonal disk cache (MatMult4StreamPreprocess +
  DiagCacheStream, gwas/matmult.go:914-1041) becomes an .npz of NTT-domain
  plaintext polys, encoded with one batched host FFT;
* the goroutine dispatcher/worker pipeline (gwas/matmult.go:1238-1505) is
  replaced by vectorized device ops (XLA fuses the mult-accumulate chain).

Also provides the distributed A*A^T*B building block (DCMatMulAAtB,
gwas/matmult.go:121-194) and the lazily-normalized QX / QX^T products
(gwas/matmult.go:27-116) used by the PCA power iteration.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..crypto import basics as B
from ..crypto import ckks as C
from ..mpc import mhe
from ..mpc.mhe import CryptoParams
from ..ops.rns import _sel, add_mod, mul_mod_barrett, ntt, sub_mod

# matmult working level: base + 2 levels (the analogue of the reference's
# hardcoded maxLevel=5 at gwas/pca.go:112 and gwas/assoc.go:395)
MM_LEVELS = 2


def mm_nmod(cps: CryptoParams) -> int:
    return cps.params.base_nmod + 2 * MM_LEVELS


class DiagBlock:
    """Encoded diagonals of one slots x slots block of the plaintext matrix:
    stacked NTT polys with (giant, baby) indices."""

    def __init__(self, giants, babies, polys, d):
        self.giants = np.asarray(giants, np.int32)  # [K]
        self.babies = np.asarray(babies, np.int32)  # [K]
        self.polys = polys  # [K, nmod, N] uint32 (NTT domain)
        self.d = d


def _encode_diag_batch(cps: CryptoParams, vecs: np.ndarray, nmod: int) -> np.ndarray:
    """Batched encode of float diagonal vectors [K, slots] -> NTT polys
    [K, nmod, N] uint32."""
    ctx = cps.ctx
    enc = ctx.encoder
    n = ctx.n
    K = vecs.shape[0]
    scale = ctx.params.scale
    A = np.zeros((K, n), dtype=np.complex128)
    A[:, enc.pos] = vecs
    A[:, enc.pos_conj] = vecs  # real data: conjugate = itself
    a = np.fft.fft(A, axis=1) / n * enc.psi_inv[None, :]
    coeffs = np.round(np.real(a) * scale).astype(np.int64)
    out = np.zeros((K, nmod, n), dtype=np.uint32)
    for i in range(nmod):
        q = ctx.params.q_primes[i]
        out[:, i, :] = np.mod(coeffs, q).astype(np.uint32)
    rows = tuple(range(nmod)) * K
    polys = ntt(
        jnp.asarray(out.reshape(K * nmod, n)), ctx.basis, rows
    ).reshape(K, nmod, n)
    return polys


def encode_block_diagonals(
    cps: CryptoParams, block: np.ndarray, nmod: int
) -> DiagBlock:
    """Extract + encode all nonzero generalized diagonals of one block
    (gwas/matmult.go:636-709 semantics): diag for shift s is
    d_s[j] = X[(j+s) mod S, j], pre-rotated right by d*giant."""
    S = cps.slots
    d = int(math.ceil(math.sqrt(S)))
    r, c = block.shape
    assert r <= S and c <= S
    Xf = block.astype(np.float64)
    giants, babies, vecs = [], [], []
    j_idx = np.arange(c)
    for s in range(S):
        rows_idx = (j_idx + s) % S
        valid = rows_idx < r
        if not valid.any():
            continue
        diag = np.zeros(S)
        jv = j_idx[valid]
        diag[jv] = Xf[rows_idx[valid], jv]
        if not np.any(diag):
            continue
        giant, baby = s // d, s % d
        # pre-rotate right by giant*d (gwas/matmult.go:855 nrot)
        diag = np.roll(diag, giant * d)
        giants.append(giant)
        babies.append(baby)
        vecs.append(diag)
    if not vecs:
        return DiagBlock([], [], None, d)
    polys = _encode_diag_batch(cps, np.stack(vecs), nmod)
    return DiagBlock(giants, babies, polys, d)


def preprocess_matrix(
    cps: CryptoParams,
    mat: np.ndarray,
    nmod: Optional[int] = None,
    cache_file: Optional[str] = None,
) -> List[List[DiagBlock]]:
    """Encode diagonals for every (block-row, block-col) of the plaintext
    matrix (MatMult4StreamPreprocess, gwas/matmult.go:914-1041).  Cached to
    an .npz when cache_file is given."""
    nmod = nmod or mm_nmod(cps)
    S = cps.slots
    if cache_file and os.path.exists(cache_file):
        return _load_diag_cache(cache_file)
    n, m = mat.shape
    out = []
    for bi in range(0, n, S):
        row = []
        for bj in range(0, m, S):
            row.append(
                encode_block_diagonals(cps, mat[bi : bi + S, bj : bj + S], nmod)
            )
        out.append(row)
    if cache_file:
        _save_diag_cache(cache_file, out)
    return out


def _save_diag_cache(path: str, cache):
    data = {"nbr": len(cache), "nbc": len(cache[0])}
    for i, row in enumerate(cache):
        for j, blk in enumerate(row):
            data[f"g_{i}_{j}"] = blk.giants
            data[f"b_{i}_{j}"] = blk.babies
            data[f"p_{i}_{j}"] = (
                np.asarray(blk.polys) if blk.polys is not None else np.zeros(0)
            )
            data[f"d_{i}_{j}"] = blk.d
    np.savez_compressed(path, **data)


def _load_diag_cache(path: str):
    z = np.load(path)
    nbr, nbc = int(z["nbr"]), int(z["nbc"])
    out = []
    for i in range(nbr):
        row = []
        for j in range(nbc):
            p = z[f"p_{i}_{j}"]
            row.append(
                DiagBlock(
                    z[f"g_{i}_{j}"],
                    z[f"b_{i}_{j}"],
                    jnp.asarray(p) if p.size else None,
                    int(z[f"d_{i}_{j}"]),
                )
            )
        out.append(row)
    return out


def mat_mult_cached(
    cps: CryptoParams, A: B.CipherMatrix, cache: List[List[DiagBlock]]
) -> B.CipherMatrix:
    """A (s rows x nBlockRows cts) times the preprocessed matrix ->
    s x nBlockCols cts (CPMatMult4CachedB / MatMult4StreamCompute).

    Per (row, block-row): hoisted baby rotations; per giant group: lazy
    uint32 accumulation of diag products with a single deferred reduction
    (the reference's uint128 accumulator analogue); giant rotation applied
    after reduction; one rescale at the end."""
    ctx = cps.ctx
    nbr = len(cache)
    nbc = len(cache[0])
    s = len(A)
    nmod = cache[0][0].polys.shape[1] if cache[0][0].polys is not None else mm_nmod(cps)
    rows = tuple(range(nmod))
    t = _sel(ctx.basis, rows)
    d = cache[0][0].d

    out: B.CipherMatrix = []
    for i in range(s):
        # accumulators per (block-col, giant): lazy uint32 sums
        acc0: Dict[Tuple[int, int], jnp.ndarray] = {}
        acc1: Dict[Tuple[int, int], jnp.ndarray] = {}
        for bi in range(nbr):
            ct = ctx.drop_to(A[i][bi], nmod)
            needed_babies = sorted(
                {int(b) for bj in range(nbc) for b in cache[bi][bj].babies}
            )
            rots = ctx.hoisted_rotations(ct, needed_babies, cps.rot_keys)
            for bj in range(nbc):
                blk = cache[bi][bj]
                if blk.polys is None:
                    continue
                for k in range(len(blk.giants)):
                    g, b = int(blk.giants[k]), int(blk.babies[k])
                    rct = rots[b]
                    p = blk.polys[k]
                    m0 = mul_mod_barrett(rct.c0, p, t["q"], t["mu"])
                    m1 = mul_mod_barrett(rct.c1, p, t["q"], t["mu"])
                    key = (bj, g)
                    if key in acc0:
                        # lazy add: values < q < 2^26; up to ~64 adds fit u32
                        acc0[key] = acc0[key] + m0
                        acc1[key] = acc1[key] + m1
                    else:
                        acc0[key] = m0
                        acc1[key] = m1
                    if (k + 1) % 48 == 0:  # keep lazy sums below 2^32
                        acc0[key] = ctx._reduce_u32(acc0[key], rows)
                        acc1[key] = ctx._reduce_u32(acc1[key], rows)
        row_out = []
        in_scale = A[i][0].scale * ctx.params.scale
        for bj in range(nbc):
            total: Optional[C.Ciphertext] = None
            for g in sorted({g for (bjj, g) in acc0 if bjj == bj}):
                c0 = ctx._reduce_u32(acc0[(bj, g)], rows)
                c1 = ctx._reduce_u32(acc1[(bj, g)], rows)
                ct_g = C.Ciphertext(c0, c1, nmod, in_scale)
                if g > 0:
                    ct_g = B.rotate_left(cps, ct_g, g * d)
                total = ct_g if total is None else ctx.add(total, ct_g)
            if total is None:
                total = ctx.zero_ct(nmod)
            row_out.append(ctx.rescale(total))
        out.append(row_out)
    return out


def mat_mult_cheat(cps: CryptoParams, mpc, A: B.CipherMatrix, mat: np.ndarray):
    """Debug ground-truth kernel (CPMatMult0, gwas/matmult.go:442-459):
    collectively decrypt A, multiply in the clear, re-encrypt.  For
    validating the BSGS variants on shared (identical-across-parties)
    inputs; NEVER part of the secure pipeline."""
    slots = cps.slots
    if mpc.pid == 0:
        return None
    rows = []
    for cv in A:
        vals = []
        for ct in cv:
            pt = mhe.collective_decrypt(mpc.net, cps, ct, -1)
            vals.append(np.asarray(cps.ctx.decode(pt)))
        rows.append(np.concatenate(vals)[: mat.shape[0]])
    prod = np.stack(rows) @ mat.astype(np.float64)  # [s, m]
    out = []
    for i in range(len(A)):
        row = []
        for b0 in range(0, mat.shape[1], slots):
            row.append(B.encrypt_float_vector(cps, prod[i, b0 : b0 + slots])[0])
        out.append(row)
    return out


def mat_mult_sharded(
    cps: CryptoParams,
    A: B.CipherMatrix,
    cache: List[List[DiagBlock]],
    devices=None,
) -> B.CipherMatrix:
    """mat_mult_cached with the SNP (block-column) axis distributed over a
    party's local chips (SURVEY.md §2.9: within-party chip sharding).

    Output block-columns are independent, so tiles round-robin across
    devices with no collectives: each device holds its tiles' diagonal
    polys + a replica of the hoisted baby rotations, and XLA dispatches the
    per-device accumulation chains concurrently.  Numerically identical to
    mat_mult_cached (same op order per tile)."""
    import jax

    if not devices:
        devices = jax.local_devices()
    if len(devices) == 1:
        return mat_mult_cached(cps, A, cache)

    ctx = cps.ctx
    nbr = len(cache)
    nbc = len(cache[0])
    s = len(A)
    nmod = (
        cache[0][0].polys.shape[1] if cache[0][0].polys is not None else mm_nmod(cps)
    )
    rows = tuple(range(nmod))
    t = _sel(ctx.basis, rows)
    d = cache[0][0].d
    dev_of = {bj: devices[bj % len(devices)] for bj in range(nbc)}

    # stage each tile's polys on its device once
    polys_dev: Dict[Tuple[int, int], jnp.ndarray] = {}
    for bi in range(nbr):
        for bj in range(nbc):
            blk = cache[bi][bj]
            if blk.polys is not None:
                polys_dev[(bi, bj)] = jax.device_put(blk.polys, dev_of[bj])

    out: B.CipherMatrix = []
    for i in range(s):
        acc0: Dict[Tuple[int, int], jnp.ndarray] = {}
        acc1: Dict[Tuple[int, int], jnp.ndarray] = {}
        for bi in range(nbr):
            ct = ctx.drop_to(A[i][bi], nmod)
            needed = sorted({int(b) for bj in range(nbc) for b in cache[bi][bj].babies})
            rots = ctx.hoisted_rotations(ct, needed, cps.rot_keys)
            # replicate the rotated cts onto every participating device
            rep = {
                dv: {
                    b: (
                        jax.device_put(rc.c0, dv),
                        jax.device_put(rc.c1, dv),
                    )
                    for b, rc in rots.items()
                }
                for dv in set(dev_of.values())
            }
            qd = {dv: jax.device_put(t["q"], dv) for dv in rep}
            mud = {dv: jax.device_put(t["mu"], dv) for dv in rep}
            for bj in range(nbc):
                blk = cache[bi][bj]
                if blk.polys is None:
                    continue
                dv = dev_of[bj]
                P = polys_dev[(bi, bj)]
                for k in range(len(blk.giants)):
                    g, b = int(blk.giants[k]), int(blk.babies[k])
                    rc0, rc1 = rep[dv][b]
                    m0 = mul_mod_barrett(rc0, P[k], qd[dv], mud[dv])
                    m1 = mul_mod_barrett(rc1, P[k], qd[dv], mud[dv])
                    key = (bj, g)
                    if key in acc0:
                        acc0[key] = acc0[key] + m0
                        acc1[key] = acc1[key] + m1
                    else:
                        acc0[key] = m0
                        acc1[key] = m1
                    if (k + 1) % 48 == 0:
                        acc0[key] = ctx._reduce_u32(acc0[key], rows)
                        acc1[key] = ctx._reduce_u32(acc1[key], rows)
        row_out = []
        in_scale = A[i][0].scale * ctx.params.scale
        for bj in range(nbc):
            total: Optional[C.Ciphertext] = None
            for g in sorted({g for (bjj, g) in acc0 if bjj == bj}):
                # pull partial sums back to the default device for the
                # rotation/keyswitch epilogue (keys live there)
                c0 = ctx._reduce_u32(jax.device_put(acc0[(bj, g)], devices[0]), rows)
                c1 = ctx._reduce_u32(jax.device_put(acc1[(bj, g)], devices[0]), rows)
                ct_g = C.Ciphertext(c0, c1, nmod, in_scale)
                if g > 0:
                    ct_g = B.rotate_left(cps, ct_g, g * d)
                total = ct_g if total is None else ctx.add(total, ct_g)
            if total is None:
                total = ctx.zero_ct(nmod)
            row_out.append(ctx.rescale(total))
        out.append(row_out)
    return out


def mat_mult_stream(
    cps: CryptoParams,
    A: B.CipherMatrix,
    geno: np.ndarray,
    compute_sums: bool = False,
    square: bool = False,
    cache_file: Optional[str] = None,
):
    """MatMult4Stream (gwas/matmult.go:1238-1505): multiply the CipherMatrix
    with a genotype block, optionally squaring the block elementwise and
    returning plaintext dosage sums/square-sums per column."""
    mat = np.asarray(geno)
    if square:
        mat = mat * mat
    cache = preprocess_matrix(cps, mat, mm_nmod(cps), cache_file)
    out = mat_mult_cached(cps, A, cache)
    dosage_sum = dosage_sq_sum = None
    if compute_sums:
        dosage_sum = geno.astype(np.float64).sum(axis=0)
        dosage_sq_sum = (geno.astype(np.float64) ** 2).sum(axis=0)
    return out, dosage_sum, dosage_sq_sum


# ---------------------------------------------------------------------------
# Distributed A A^T B (gwas/matmult.go:121-194)


def dc_matmul_aat_b(
    cps: CryptoParams,
    mpc,
    A: B.CipherMatrix,
    Bmat,
    nrows_all: List[int],
    ncol_out: int,
    inner_fn: Callable,
) -> B.CipherMatrix:
    """For row-partitioned A across parties: out = A (A^T B) computed per
    column of A via aggregated inner products.  The aggregated cross terms
    are refreshed to the top level before the outer product so the chain
    fits shallow modulus budgets (the reference bootstraps right after the
    rank-1 updates instead, gwas/qrfact.go:201)."""
    slots = cps.slots
    pid = mpc.pid
    n_ct = ((nrows_all[pid] - 1) // slots) + 1 if pid > 0 else 1
    # accumulate with first-term adoption (a czeros init would impose the
    # preset scale on products whose scale has drifted from rescaling)
    out = [None] * ncol_out
    for c in range(len(A)):
        ctq_loc = []
        for j in range(ncol_out):
            prod = inner_fn(cps, A[c], Bmat, j)
            ctq_loc.append(B.inner_sum_all(cps, prod))
        ctq = mhe.aggregate_cvec(mpc.net, cps, ctq_loc)
        ctq = [mhe.collective_bootstrap(mpc.net, cps, ct, -1) for ct in ctq]
        for j in range(ncol_out):
            cc = B.cmult_scalar(cps, A[c], ctq[j])
            out[j] = cc if out[j] is None else B.cadd(
                cps, _match_vec(cps, out[j], cc), cc
            )
    return out


def _match_vec(cps, X, ref):
    return [cps.ctx.drop_to(x, min(x.nmod, r.nmod)) for x, r in zip(X, ref)]


# ---------------------------------------------------------------------------
# Lazily normalized QX / QX^T (gwas/matmult.go:27-116)


def qx_lazy_norm_stream(
    cps: CryptoParams,
    mpc,
    Q: B.CipherMatrix,
    xt_cache: List[List[DiagBlock]],
    x_mean: B.CipherVector,
    x_stdinv: B.CipherVector,
    num_ind: int,
    post_scale: float = 1.0,
) -> B.CipherMatrix:
    """Q (kp x nsnp) times X (nsnp x nind) with lazy normalization:
    [(Q*S)*X - ((Q*S)*m) 1^T] * post_scale  (gwas/matmult.go:27-77).
    The constant rides in the trailing-slot mask and the whole result is
    refreshed once at the end (the reference bootstraps twice)."""
    if mpc.pid == 0:
        return None
    slots = cps.slots
    QS = [B.cmult(cps, Q[i], x_stdinv) for i in range(len(Q))]
    out = mat_mult_cached(cps, QS, xt_cache)
    for i in range(len(QS)):
        qsm = B.inner_prod(cps, QS[i], x_mean)  # value in all slots
        nm = min(out[i][0].nmod, qsm.nmod)
        out[i] = [
            cps.ctx.sub(cps.ctx.drop_to(ct, nm), cps.ctx.drop_to(qsm, nm))
            for ct in out[i]
        ]
        for j in range(len(out[i])):
            n_keep = slots if j < len(out[i]) - 1 else ((num_ind - 1) % slots) + 1
            out[i][j] = B.mask_trunc(cps, out[i][j], n_keep, post_scale)
    return mhe.bootstrap_mat_all(mpc.net, cps, out)


def qxt_lazy_norm_stream(
    cps: CryptoParams,
    mpc,
    Q: B.CipherMatrix,
    x_cache: List[List[DiagBlock]],
    x_mean: B.CipherVector,
    x_stdinv: B.CipherVector,
    post_scale: float = 1.0,
) -> B.CipherMatrix:
    """Q (kp x nind) times X^T (nind x nsnp) with lazy normalization:
    ((Q X^T) - (Q 1) m^T) * S * post_scale  (gwas/matmult.go:83-116).
    Bootstraps once after the mean correction; the stdinv multiply and the
    constant share a fused double-rescale."""
    if mpc.pid == 0:
        return None
    out = mat_mult_cached(cps, Q, x_cache)
    for i in range(len(out)):
        row_sum = B.inner_sum_all(cps, Q[i])
        q1m = B.cmult_scalar(cps, x_mean, row_sum)
        nm = min(out[i][0].nmod, q1m[0].nmod)
        out[i] = [
            cps.ctx.sub(cps.ctx.drop_to(o, nm), cps.ctx.drop_to(m, nm))
            for o, m in zip(out[i], q1m)
        ]
    out = mhe.bootstrap_mat_all(mpc.net, cps, out)
    for i in range(len(out)):
        out[i] = B.cmult_with_const(cps, out[i], x_stdinv, post_scale)
    return out


# ---------------------------------------------------------------------------
# Cipher-cipher matmult helpers for the logistic path
# (gwas/matmult.go:1915-2066)


def cmult_mat_inner_prod(cps, Cm, Wz):
    """Row-packed C^T Wz: out[i] has <C[i], Wz[j]> in slot j
    (CMultMatInnerProd)."""
    ncols = len(Wz)
    out = []
    for i in range(len(Cm)):
        acc = None
        for j in range(ncols):
            ip = B.inner_prod(cps, Cm[i], Wz[j])  # value in all slots
            m = B.mask(cps, ip, j, False)
            acc = m if acc is None else cps.ctx.add(
                cps.ctx.drop_to(acc, min(acc.nmod, m.nmod)),
                cps.ctx.drop_to(m, min(acc.nmod, m.nmod)),
            )
        out.append([acc])
    return out


def cmult_mat_inner_prod_vector(cps, Cm, yv):
    """Packed C^T y: slot i holds <C[i], y> (CMultMatInnerProdVector)."""
    acc = None
    for i in range(len(Cm)):
        ip = B.inner_prod(cps, Cm[i], yv)
        m = B.mask(cps, ip, i, False)
        acc = m if acc is None else cps.ctx.add(
            cps.ctx.drop_to(acc, min(acc.nmod, m.nmod)),
            cps.ctx.drop_to(m, min(acc.nmod, m.nmod)),
        )
    return [acc]


def cmult_mat_col_times_col_to_col(cps, Cm, packed, n_ct):
    """sum_i C[i] * packed[slot i] -> column vector
    (CMultMatColTimesColToCol)."""
    out = None
    for i in range(len(Cm)):
        w_i = B.mask(cps, packed[0], i, False)
        w_i = B.rotate_and_add(cps, w_i, cps.slots)
        term = B.cmult_scalar(cps, Cm[i], w_i)
        if out is None:
            out = term
        else:
            nm = min(out[0].nmod, term[0].nmod)
            out = [
                cps.ctx.add(cps.ctx.drop_to(a, nm), cps.ctx.drop_to(b_, nm))
                for a, b_ in zip(out, term)
            ]
    return out


def cmult_mat_col_times_row_to_col(cps, Wz, M, ncols):
    """Column-encrypted Wz (n x c) times row-packed M (c x c) -> column-
    encrypted (n x c) (CMultMatColTimesRowToCol)."""
    out = []
    for k in range(ncols):
        acc = None
        for j in range(len(Wz)):
            mjk = B.mask(cps, M[j][0], k, False)
            mjk = B.rotate_and_add(cps, mjk, cps.slots)
            term = B.cmult_scalar(cps, Wz[j], mjk)
            if acc is None:
                acc = term
            else:
                nm = min(acc[0].nmod, term[0].nmod)
                acc = [
                    cps.ctx.add(cps.ctx.drop_to(a, nm), cps.ctx.drop_to(b_, nm))
                    for a, b_ in zip(acc, term)
                ]
        out.append(acc)
    return out
