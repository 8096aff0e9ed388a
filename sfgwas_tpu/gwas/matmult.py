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

import functools
import math
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import basics as B
from ..crypto import ckks as C
from ..mpc import mhe
from ..mpc.mhe import CryptoParams
from ..ops.rns import _mulhi32, _sel, add_mod, mul_mod_barrett, ntt_b, sub_mod

# matmult working level: base + 2 levels (the analogue of the reference's
# hardcoded maxLevel=5 at gwas/pca.go:112 and gwas/assoc.go:395); the
# single source is crypto/params.py, which also sizes the rotation keys
from ..crypto.params import MM_LEVELS

# per-chunk device budget for the fused MAC kernel (bytes of diagonal polys
# staged per call); one chunk is a run of whole giant groups of one block
MM_CHUNK_BYTES = int(os.environ.get("SFGWAS_MM_CHUNK_BYTES", 256 * 1024 * 1024))


def _mm_dense() -> bool:
    """Giant-aligned MAC chunks: one (block-col, giant) segment per chunk, so
    the per-giant reduction is a plain lazy-u32 sum instead of a segment_sum
    (XLA's sorted segment_sum measures 4.4 ms per [91, 8, 7, 16384] call at
    PN14 -- essentially the MAC stage's whole budget, BASELINE.md roofline)."""
    return os.environ.get("SFGWAS_MM_DENSE", "1") == "1"

# pipeline-wide device set for within-party chip sharding: when set (config
# shard_matmult=true at protocol init), EVERY mat_mult_cached call without an
# explicit devices= routes its MAC chunks over these chips (SURVEY.md §2.9)
_pipeline_devices: Optional[list] = None


def set_pipeline_devices(devices) -> None:
    global _pipeline_devices
    _pipeline_devices = list(devices) if devices and len(devices) > 1 else None


def mm_nmod(cps: CryptoParams) -> int:
    return cps.params.base_nmod + 2 * MM_LEVELS


class DiagBlock:
    """Encoded diagonals of one slots x slots block of the plaintext matrix:
    stacked NTT polys with (giant, baby) indices.

    Two residency modes:
    * device: `polys` holds the [K, nmod, N] uint32 NTT stack (fast reuse;
      O(matrix) HBM);
    * host-streaming: `chunks` holds the pre-NTT integer coefficients from
      the host encode ([<=1024, N] hi/lo pairs); the matmult materializes
      just the poly rows each scan group needs, bounded by a byte budget
      (the reference's DiagCacheStream discipline, gwas/filestream.go:19-282
      -- bounded working set over an arbitrarily long SNP axis)."""

    def __init__(self, giants, babies, polys, d, chunks=None):
        self.giants = np.asarray(giants, np.int32)  # [K]
        self.babies = np.asarray(babies, np.int32)  # [K]
        self.polys = polys  # [K, nmod, N] uint32 (NTT domain) or None
        self.d = d
        self.chunks = chunks  # host [(hi, lo, kc)] or None

    @property
    def empty(self) -> bool:
        return self.polys is None and self.chunks is None

    @property
    def num_diags(self) -> int:
        return len(self.giants)

    def materialize_rows(self, cps, nmod: int, a: int, b: int):
        """Device polys for diagonal rows [a, b) (host-streaming mode)."""
        assert self.chunks is not None
        step = 1024
        c0, c1 = a // step, (b + step - 1) // step
        sub = self.chunks[c0:c1]
        polys = _encode_diag_device(cps, sub, nmod)
        return polys[a - c0 * step : b - c0 * step]


try:  # multithreaded host FFT when torch is available (numpy's is 1-thread)
    import torch as _torch

    _torch.set_num_threads(max(1, os.cpu_count() or 1))
except Exception:  # pragma: no cover
    _torch = None

_enc_scratch = __import__("threading").local()


def _scratch(key, shape, dtype) -> np.ndarray:
    """Reusable host buffers: avoids re-faulting fresh pages per block.
    Thread-local -- party threads in local-sim encode concurrently."""
    d = getattr(_enc_scratch, "d", None)
    if d is None:
        d = _enc_scratch.d = {}
    buf = d.get(key)
    if buf is None or buf.shape != shape or buf.dtype != dtype:
        buf = np.zeros(shape, dtype)
        d[key] = buf
    return buf


@functools.partial(jax.jit, static_argnames=("basis", "rows"))
def _mod_ntt_b(hi, lo, basis, rows):
    """Device half of the plaintext encode: integer coefficients arrive as
    hi*2^31 + lo (hi int32 signed with |hi| < q, lo uint32 < 2^31); reduce
    per prime row and NTT.  hi/lo: [B, N] -> [nrows, B, N] uint32 polys.
    No integer division anywhere: TPU int remainder lowers to a long
    division sequence; u32 Barrett + conditional adds replace it."""
    t = _sel(basis, rows)
    q = t["q"][:, :, None]  # [L, 1, 1]
    mu = t["mu"][:, :, None]
    qs = np.asarray(t["q"][:, 0])
    r31 = jnp.asarray(
        [(1 << 31) % int(v) for v in qs], jnp.uint32
    )[:, None, None]
    m32 = jnp.asarray(
        [(1 << 32) // int(v) for v in qs], jnp.uint32
    )[:, None, None]
    # |hi| < q: one conditional add
    hb = hi[None]
    hi_m = jnp.where(hb < 0, hb + q.astype(jnp.int32), hb).astype(jnp.uint32)
    # lo < 2^31: u32 Barrett, result < 3q -> two conditional subtracts
    x = lo[None]
    qhat = _mulhi32(x, m32)
    r = x - qhat * q
    r = jnp.where(r >= q, r - q, r)
    lo_m = jnp.where(r >= q, r - q, r)
    v = add_mod(mul_mod_barrett(hi_m, r31, q, mu), lo_m, q)
    return ntt_b(v, basis, rows)


def _encode_diag_host(cps: CryptoParams, vecs: np.ndarray):
    """Host half of the diagonal encode: canonical-embedding FFT + twiddle
    fold -> integer coefficients as (hi, lo, kc) chunks.  Pure numpy/torch:
    safe to run on a prefetch thread while the device MACs the previous
    block (no jax calls, thread-local scratch)."""
    enc = cps.ctx.encoder
    n = cps.ctx.n
    K = vecs.shape[0]
    scale = cps.ctx.params.scale
    step = 1024
    A = _scratch(("encA", n), (step, n), np.float64)
    chunks = []
    use_torch = _torch is not None
    if use_torch:
        tw_re = _torch.from_numpy(enc.psi_inv_re_over_n * scale)
        tw_im = _torch.from_numpy(enc.psi_inv_im_over_n * scale)
    for k0 in range(0, K, step):
        kc = min(step, K - k0)
        A[:] = 0
        A[:kc, enc.pos] = vecs[k0 : k0 + kc]
        A[:kc, enc.pos_conj] = vecs[k0 : k0 + kc]  # real data: conj = itself
        if use_torch:
            # A is real-valued: fft of real input, multithreaded host fold
            a = _torch.fft.fft(_torch.from_numpy(A), dim=1)
            coeffs = a.real * tw_re
            coeffs += a.imag * tw_im
            coeffs = _torch.round_(coeffs)
            hi_t = _torch.floor(coeffs * (1.0 / (1 << 31)))
            lo = (coeffs - hi_t * float(1 << 31)).to(_torch.int64).numpy()
            lo = lo.astype(np.uint32)
            hi = hi_t.to(_torch.int32).numpy()
        else:
            a = np.fft.fft(A, axis=1)
            coeffs = np.real(a)
            coeffs *= enc.psi_inv_re_over_n * scale
            coeffs += np.imag(a) * (enc.psi_inv_im_over_n * scale)
            np.round(coeffs, out=coeffs)
            hi_f = np.floor(coeffs * (1.0 / (1 << 31)))
            lo = (coeffs - hi_f * float(1 << 31)).astype(np.uint32)
            hi = hi_f.astype(np.int32)
        chunks.append((hi.copy() if kc < step else hi, lo, kc))
    return chunks


def _encode_diag_device(cps: CryptoParams, chunks, nmod: int):
    """Device half: per-prime modular reduction + NTT of the host chunks."""
    ctx = cps.ctx
    rows = tuple(range(nmod))
    outs = []
    for hi, lo, kc in chunks:
        poly = _mod_ntt_b(
            jnp.asarray(hi), jnp.asarray(lo), ctx.basis, rows
        )  # [nmod, step, n]
        outs.append(poly[:, :kc] if kc < poly.shape[1] else poly)
    return jnp.concatenate(outs, axis=1).transpose(1, 0, 2)  # [K, nmod, n]


def _encode_diag_batch(cps: CryptoParams, vecs: np.ndarray, nmod: int):
    """Batched encode of float diagonal vectors [K, slots] -> NTT polys
    [K, nmod, N] uint32, DEVICE-resident.

    Split host/device: the canonical-embedding FFT runs on the host (f64
    precision XLA lacks), the per-prime modular reduction + NTT on the
    device; only int32 coefficient pairs cross host->device (the tunnel's
    fast direction -- device->host readback is ~100x slower, so encoded
    polys never come back)."""
    return _encode_diag_device(cps, _encode_diag_host(cps, vecs), nmod)


def encode_block_diagonals_host(cps: CryptoParams, block: np.ndarray):
    """Host stage of encode_block_diagonals: diagonal scatter + FFT fold.
    Returns (giants, babies, d, host_chunks); finish_block_diagonals turns
    it into a DiagBlock on the device."""
    S = cps.slots
    d = int(math.ceil(math.sqrt(S)))
    r, c = block.shape
    assert r <= S and c <= S
    # structural shift set: s = (i-j) mod S for i<r, j<c is exactly
    # [0, r) union [S-c+1, S); all-zero diagonals among them are kept (one
    # wasted poly row each -- rare for genotype data and harmless)
    shifts = np.concatenate(
        [np.arange(r), np.arange(max(S - c + 1, r), S)]
    ).astype(np.int64)
    rank = np.zeros(S, np.int64)
    rank[shifts] = np.arange(len(shifts))
    i_idx = np.arange(r, dtype=np.int64)[:, None]
    j_idx = np.arange(c, dtype=np.int64)[None, :]
    s_idx = (i_idx - j_idx) % S  # [r, c] diagonal shift per entry
    col = (j_idx + (s_idx // d) * d) % S  # pre-rotated slot position
    vecs = _scratch(("diagvecs", S, len(shifts)), (len(shifts), S), np.float64)
    vecs[:] = 0.0
    vecs[rank[s_idx], col] = block  # (s, col) pairs are unique per (i, j)
    return shifts // d, shifts % d, d, _encode_diag_host(cps, vecs)


def finish_block_diagonals(cps: CryptoParams, host_blk, nmod: int) -> DiagBlock:
    giants, babies, d, chunks = host_blk
    return DiagBlock(giants, babies, _encode_diag_device(cps, chunks, nmod), d)


def host_block_diagonals(
    cps: CryptoParams, block: np.ndarray, spill: Optional[str] = None
) -> DiagBlock:
    """Host-streaming DiagBlock: integer coefficient chunks only; the
    matmult NTTs just the rows each scan group touches.  With `spill`, the
    chunks are written once to disk and mmap'd back, so host RSS stays
    bounded by the touched pages (reclaimable) instead of the whole SNP
    axis -- the reference's per-block DiagCacheStream files
    (gwas/filestream.go:19-282), which also make the cache restartable."""
    if spill and os.path.exists(spill + ".meta.npz"):
        return _load_host_block(spill)
    giants, babies, d, chunks = encode_block_diagonals_host(cps, block)
    blk = DiagBlock(giants, babies, None, d, chunks=chunks)
    if spill:
        _spill_host_block(blk, spill)
        return _load_host_block(spill)
    return blk


def _spill_host_block(blk: DiagBlock, path: str) -> None:
    hi = np.concatenate([c[0][: c[2]] for c in blk.chunks])
    lo = np.concatenate([c[1][: c[2]] for c in blk.chunks])
    np.save(path + ".hi.npy", hi)
    np.save(path + ".lo.npy", lo)
    np.savez(
        path + ".meta.npz", giants=blk.giants, babies=blk.babies, d=blk.d
    )


def _load_host_block(path: str) -> DiagBlock:
    z = np.load(path + ".meta.npz")
    hi = np.load(path + ".hi.npy", mmap_mode="r")
    lo = np.load(path + ".lo.npy", mmap_mode="r")
    K = hi.shape[0]
    step = 1024
    chunks = [
        (hi[k0 : k0 + step], lo[k0 : k0 + step], min(step, K - k0))
        for k0 in range(0, K, step)
    ]
    return DiagBlock(
        z["giants"], z["babies"], None, int(z["d"]), chunks=chunks
    )


def encode_block_diagonals(
    cps: CryptoParams, block: np.ndarray, nmod: int
) -> DiagBlock:
    """Extract + encode all nonzero generalized diagonals of one block
    (gwas/matmult.go:636-709 semantics): diag for shift s is
    d_s[j] = X[(j+s) mod S, j], pre-rotated right by d*giant.

    Vectorized: entry (i, j) lands on diagonal s = (i-j) mod S at final slot
    (j + (s//d)*d) mod S; one scatter builds every pre-rotated diagonal."""
    return finish_block_diagonals(
        cps, encode_block_diagonals_host(cps, block), nmod
    )


def preprocess_matrix(
    cps: CryptoParams,
    mat: np.ndarray,
    nmod: Optional[int] = None,
    cache_file: Optional[str] = None,
    host_resident: bool = False,
) -> List[List[DiagBlock]]:
    """Encode diagonals for every (block-row, block-col) of the plaintext
    matrix (MatMult4StreamPreprocess, gwas/matmult.go:914-1041).  Cached to
    an .npz when cache_file is given.  host_resident keeps the encodings as
    pre-NTT host chunks (streamed to the device per scan group, bounded
    HBM -- for matrices whose device polys would not fit)."""
    nmod = nmod or mm_nmod(cps)
    S = cps.slots
    if cache_file and os.path.exists(cache_file) and not host_resident:
        return _load_diag_cache(cache_file)
    n, m = mat.shape
    out = []
    for bi in range(0, n, S):
        row = []
        for bj in range(0, m, S):
            blk = mat[bi : bi + S, bj : bj + S]
            if host_resident:
                spill = (
                    f"{cache_file}.w{bi}_{bj}" if cache_file else None
                )
                row.append(host_block_diagonals(cps, blk, spill=spill))
            else:
                row.append(encode_block_diagonals(cps, blk, nmod))
        out.append(row)
    if cache_file and os.environ.get("SFGWAS_DIAG_DISK_CACHE") and not host_resident:
        # disk spill is opt-in: it exists for PCA restarts (the reference's
        # DiagCacheStream), but writing it costs a device->host pull of the
        # whole cache (~8 MB/s through the tunnel); within-run reuse is
        # served by the device-resident polys instead
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
                    np.asarray(p) if p.size else None,
                    int(z[f"d_{i}_{j}"]),
                )
            )
        out.append(row)
    return out


@functools.partial(
    jax.jit, static_argnames=("nseg", "nsub"), donate_argnums=(0, 1)
)
def _mac_scan(ACC0, ACC1, R0, R1, polys, idxm, bidxm, seg2m, sgm, q, mu, m32,
              nseg, nsub):
    """Fused BSGS MAC for a WHOLE block row as one device program: a
    lax.scan over group-aligned chunks gathers the hoisted baby rotations
    per diagonal, Barrett-multiplies against the encoded diagonal polys,
    lazily segment-sums per giant group with one deferred reduction (the
    reference's uint128 loop, gwas/matmult.go:247-324), and scatters each
    chunk's reduced groups into the global accumulators.

    One executable per block shape: the per-chunk dispatch this replaces
    cost ~0.5 s of executable staging per distinct op/shape through the
    asymmetric device tunnel (hundreds per block).

    ACC*: [nseg_tot+1, nmod, N] donated accumulators (last row is the dump
    that absorbs padding scatters); R*: [nB, nmod, N] hoisted rotations;
    polys: [K_tot, nmod, N]; idxm/bidxm/seg2m: [nchunks, k_pad];
    sgm: [nchunks, nseg]."""

    def red(x):
        qhat = _mulhi32(x, m32)
        r = x - qhat * q
        r = jnp.where(r >= q, r - q, r)
        return jnp.where(r >= q, r - q, r)

    def body(carry, x):
        A0, A1 = carry
        idx, bidx, seg2, sg = x
        P = polys[idx]

        def one(R):
            p = mul_mod_barrett(R[bidx], P, q, mu)
            # padding entries carry seg2 = nseg*nsub: the dropped segment
            a = jax.ops.segment_sum(
                p, seg2, num_segments=nseg * nsub + 1,
                indices_are_sorted=True,
            )[:-1]
            a = red(a)
            if nsub > 1:
                a = jnp.sum(
                    a.reshape(nseg, nsub, *a.shape[1:]), axis=1,
                    dtype=jnp.uint32,
                )
                a = red(a)
            return a

        a0, a1 = one(R0), one(R1)
        # sg padding points at the ACC dump row (never read back)
        A0 = A0.at[sg].set(add_mod(A0[sg], a0, q))
        A1 = A1.at[sg].set(add_mod(A1[sg], a1, q))
        return (A0, A1), None

    (ACC0, ACC1), _ = jax.lax.scan(
        body, (ACC0, ACC1), (idxm, bidxm, seg2m, sgm)
    )
    return ACC0, ACC1


@functools.partial(
    jax.jit, static_argnames=("nseg", "nsub"), donate_argnums=(0, 1)
)
def _mac_scan_b(ACC0, ACC1, R0, R1, polys, idxm, bidxm, seg2m, sgm, q, mu,
                m32, nseg, nsub):
    """_mac_scan batched over ciphertext rows: R*: [nB, s, nmod, N] hoisted
    rotations for ALL s rows of A; ACC*: [nseg_tot+1, s, nmod, N] donated.
    The row axis rides along every gather/segment op (indices are shared),
    so the whole A x block product is ONE scanned device program."""

    def red(x):
        qhat = _mulhi32(x, m32)
        r = x - qhat * q
        r = jnp.where(r >= q, r - q, r)
        return jnp.where(r >= q, r - q, r)

    def body(carry, x):
        A0, A1 = carry
        idx, bidx, seg2, sg = x
        P = polys[idx][:, None]  # [K, 1, nmod, N] broadcast over rows

        def one(R):
            p = mul_mod_barrett(R[bidx], P, q, mu)
            a = jax.ops.segment_sum(
                p, seg2, num_segments=nseg * nsub + 1,
                indices_are_sorted=True,
            )[:-1]
            a = red(a)
            if nsub > 1:
                a = jnp.sum(
                    a.reshape(nseg, nsub, *a.shape[1:]), axis=1,
                    dtype=jnp.uint32,
                )
                a = red(a)
            return a

        a0, a1 = one(R0), one(R1)
        A0 = A0.at[sg].set(add_mod(A0[sg], a0, q))
        A1 = A1.at[sg].set(add_mod(A1[sg], a1, q))
        return (A0, A1), None

    (ACC0, ACC1), _ = jax.lax.scan(
        body, (ACC0, ACC1), (idxm, bidxm, seg2m, sgm)
    )
    return ACC0, ACC1


@functools.partial(
    jax.jit, static_argnames=("nsub",), donate_argnums=(0, 1)
)
def _mac_scan_dense_b(ACC0, ACC1, R0, R1, polys, idxm, bidxm, sgv, q, mu,
                      m32, nsub):
    """Dense variant of _mac_scan_b: every chunk covers exactly ONE
    (block-col, giant) segment, so the per-giant reduction is a plain
    lazy-u32 sum over the chunk axis (sub-split by nsub to stay under the
    max_lazy exactness bound) and the scatter is one dynamic-index
    accumulate per chunk.  XLA's sorted segment_sum -- the reduction this
    replaces -- measured 4.4 ms per [91, 8, 7, 16384] call at PN14, ~40x
    the cost of the same-shape add (BASELINE.md roofline); this path keeps
    only adds.  Padding entries index the all-zero hoisted-rotation row
    R[nb_pad], so their products vanish without a dump segment."""

    def red(x):
        qhat = _mulhi32(x, m32)
        r = x - qhat * q
        r = jnp.where(r >= q, r - q, r)
        return jnp.where(r >= q, r - q, r)

    def body(carry, x):
        A0, A1 = carry
        idx, bidx, sg = x
        P = polys[idx][:, None]  # [K, 1, nmod, N] broadcast over rows

        def one(R):
            p = mul_mod_barrett(R[bidx], P, q, mu)
            if nsub > 1:
                a = jnp.sum(
                    p.reshape(nsub, -1, *p.shape[1:]), axis=1,
                    dtype=jnp.uint32,
                )
                a = red(a)
                a = jnp.sum(a, axis=0, dtype=jnp.uint32)
            else:
                a = jnp.sum(p, axis=0, dtype=jnp.uint32)
            return red(a)

        a0, a1 = one(R0), one(R1)
        A0 = A0.at[sg].set(add_mod(A0[sg], a0, q))
        A1 = A1.at[sg].set(add_mod(A1[sg], a1, q))
        return (A0, A1), None

    (ACC0, ACC1), _ = jax.lax.scan(
        body, (ACC0, ACC1), (idxm, bidxm, sgv)
    )
    return ACC0, ACC1


@functools.partial(jax.jit, static_argnames=("nbc",))
def _combine_rotated(r0, r1, bj_ids, q, m32, nbc):
    """Sum the rotated giant-group ciphertexts per output block column:
    lazy u32 segment sum + one Barrett reduce."""

    def red(x):
        qhat = _mulhi32(x, m32)
        r = x - qhat * q
        r = jnp.where(r >= q, r - q, r)
        return jnp.where(r >= q, r - q, r)

    if nbc == 1:  # single block column (the PN14 production shape): the
        # grouped sum is a plain lazy-u32 reduction, no scatter
        return (
            red(jnp.sum(r0, axis=0, dtype=jnp.uint32))[None],
            red(jnp.sum(r1, axis=0, dtype=jnp.uint32))[None],
        )
    return (
        red(jax.ops.segment_sum(r0, bj_ids, num_segments=nbc)),
        red(jax.ops.segment_sum(r1, bj_ids, num_segments=nbc)),
    )


class _MatmulPlan:
    """Static index plan for one preprocessed matrix: global segment list
    (block-col, giant), per-block-row baby unions, and group-aligned chunks
    stacked into per-device scan groups feeding _mac_scan."""

    def __init__(self, cps: CryptoParams, cache, nmod: int, row_batch: int = 1,
                 dense: bool = False):
        self.nmod = nmod
        self.row_batch = row_batch
        self.dense = dense
        self.d = cache[0][0].d
        nbr, nbc = len(cache), len(cache[0])
        self.nbr, self.nbc = nbr, nbc
        self.n = cps.ctx.n
        self._cps = cps
        # host-streaming mode: any block kept as pre-NTT host chunks makes
        # every scan group materialize lazily under a byte budget
        self.stream = any(
            cache[bi][bj].chunks is not None
            for bi in range(nbr)
            for bj in range(nbc)
        )
        qmax = max(cps.params.q_primes[:nmod])
        # derived lazy-accumulation bound: products are < q each; a u32 sum
        # of t terms is exact iff t*(q-1) <= 2^32-1
        self.max_lazy = (2**32 - 1) // (qmax - 1)
        assert self.max_lazy >= 2, "primes too large for lazy u32 accumulation"
        # global segments: (bj, giant) sorted
        seg_index: Dict[Tuple[int, int], int] = {}
        for bj in range(nbc):
            giants = sorted(
                {
                    int(g)
                    for bi in range(nbr)
                    if not cache[bi][bj].empty
                    for g in cache[bi][bj].giants
                }
            )
            for g in giants:
                seg_index[(bj, g)] = len(seg_index)
        self.segments = sorted(seg_index, key=seg_index.get)
        self.seg_index = seg_index
        # per block row: sorted baby union + chunks
        self.babies: List[List[int]] = []
        self.chunks: List[List[dict]] = []
        max_group = 1
        for bi in range(nbr):
            bs = sorted(
                {
                    int(b)
                    for bj in range(nbc)
                    if not cache[bi][bj].empty
                    for b in cache[bi][bj].babies
                }
            )
            self.babies.append(bs)
            bpos = {b: k for k, b in enumerate(bs)}
            row_chunks: List[dict] = []
            for bj in range(nbc):
                blk = cache[bi][bj]
                if blk.empty:
                    continue
                K = len(blk.giants)
                # group boundaries (giants are stored sorted)
                bounds = [0] + [
                    k
                    for k in range(1, K)
                    if blk.giants[k] != blk.giants[k - 1]
                ] + [K]
                max_group = max(
                    max_group,
                    max(bounds[x + 1] - bounds[x] for x in range(len(bounds) - 1)),
                )
                # the batched-row kernel materializes [K, row_batch,
                # nmod, N] products per scan step: scale the chunk budget
                # down so the working set stays constant
                budget = max(
                    1,
                    MM_CHUNK_BYTES
                    // (nmod * self.n * 4 * row_batch),
                )
                if dense:
                    # one chunk per giant group (budget-split WITHIN a group
                    # when needed): every chunk covers exactly one segment,
                    # so _mac_scan_dense_b replaces the segment_sum with a
                    # plain lazy sum
                    for x in range(len(bounds) - 1):
                        g0, g1 = bounds[x], bounds[x + 1]
                        for k0 in range(g0, g1, budget):
                            row_chunks.append(
                                self._chunk(blk, bj, k0, min(k0 + budget, g1), bpos)
                            )
                    continue
                start = 0
                for x in range(len(bounds) - 1):
                    if (
                        bounds[x + 1] - bounds[start] > budget
                        and bounds[x] > bounds[start]
                    ):
                        row_chunks.append(self._chunk(blk, bj, bounds[start], bounds[x], bpos))
                        start = x
                row_chunks.append(self._chunk(blk, bj, bounds[start], K, bpos))
            self.chunks.append(row_chunks)
        self.nsub = -(-max_group // self.max_lazy)
        assert self.nsub * self.max_lazy >= max_group
        # pad every chunk to common (K, nseg) so _mac_scan compiles once
        # per workload; padding entries point at the dump segment / dump
        # accumulator row (segmentation isolates them -- their poly values
        # never reach a live segment)
        all_chunks = [c for row in self.chunks for c in row]
        self.k_pad = max(len(c["bidx"]) for c in all_chunks)
        self.nseg_pad = max(c["nseg"] for c in all_chunks)
        self.nb_pad = max((len(b) for b in self.babies if b), default=1)
        if dense:
            # chunks are single-segment by construction; lazy-sum sub-split
            # over the (padded-to-multiple) k axis replaces seg2 bucketing.
            # Padding entries index the all-zero hoisted-rotation row nb_pad
            # (mat_mult_cached pads R to nb_pad+1 rows in dense mode).
            self.nsub = -(-self.k_pad // self.max_lazy)
            self.k_pad = self.nsub * (-(-self.k_pad // self.nsub))
            for c in all_chunks:
                assert c["nseg"] == 1, "dense chunk spans segments"
                c.pop("pos_in_group")
                c.pop("seg_local")
                K = len(c["bidx"])
                bidx = np.asarray(c["bidx"], np.int64)
                if self.k_pad - K:
                    bidx = np.concatenate(
                        [bidx, np.full(self.k_pad - K, self.nb_pad, np.int64)]
                    )
                c["bidx"] = bidx.astype(np.int32)
                c["seg2"] = None
                c["sg_one"] = int(np.asarray(c.pop("seg_gidx"))[0])
            self._groups = {}
            return
        for c in all_chunks:
            K = len(c["bidx"])
            pos = c.pop("pos_in_group")
            seg2 = c.pop("seg_local") * self.nsub + pos // self.max_lazy
            pad = self.k_pad - K
            if pad:
                seg2 = np.concatenate(
                    [seg2, np.full(pad, self.nseg_pad * self.nsub, np.int64)]
                )
                c["bidx"] = np.concatenate([c["bidx"], np.zeros(pad, np.int64)])
            # chunks enumerate diagonals in ascending (giant, position)
            # order, so the segment ids are non-decreasing — the MAC scan's
            # segment_sum declares indices_are_sorted, which XLA lowers
            # without the scatter path (measured 4.4 ms/call -> the MAC
            # stage's whole budget at PN14)
            assert (np.diff(seg2) >= 0).all(), "seg2 not sorted"
            c["seg2"] = seg2.astype(np.int32)
            c["bidx"] = np.asarray(c["bidx"], np.int32)
            gidx = np.asarray(c.pop("seg_gidx"))
            c["seg_gidx"] = np.concatenate(
                [gidx, np.full(self.nseg_pad - len(gidx), len(self.segments))]
            ).astype(np.int32)
            c["nseg"] = self.nseg_pad
        # per-(block row, device) scan groups built lazily
        self._groups: Dict[Optional[tuple], list] = {}

    # streamed-group budget: max bytes of materialized diagonal polys alive
    # per scan group (the bounded working set of the streaming mode)
    STREAM_GROUP_BYTES = int(
        os.environ.get("SFGWAS_STREAM_GROUP_BYTES", 1 << 30)
    )

    def _build_group(self, cs, dv):
        """One scan group from a chunk list: stacked index arrays plus the
        diagonal polys the chunks touch.  In streaming mode the polys slot
        is a zero-arg closure that NTTs just the needed row ranges from the
        host chunks at consumption time (freed with the group)."""
        # per-blk row range used by this group (chunks are ascending in k)
        lo: Dict[int, int] = {}
        hi: Dict[int, int] = {}
        blks: List[DiagBlock] = []
        for c in cs:
            bid = id(c["blk"])
            if bid not in lo:
                lo[bid] = c["k0"]
                hi[bid] = c["k1"]
                blks.append(c["blk"])
            else:
                lo[bid] = min(lo[bid], c["k0"])
                hi[bid] = max(hi[bid], c["k1"])
        offs: Dict[int, int] = {}
        tot = 0
        for b in blks:
            bid = id(b)
            if self.stream:
                offs[bid] = tot - lo[bid]  # idx = offs + k, k in [lo, hi)
                tot += hi[bid] - lo[bid]
            else:
                offs[bid] = tot
                tot += b.num_diags
        nchunks = len(cs)
        idxm = np.zeros((nchunks, self.k_pad), np.int32)
        bidxm = np.zeros((nchunks, self.k_pad), np.int32)
        if self.dense:
            seg2m = np.zeros((nchunks, 1), np.int32)  # unused in dense mode
            sgm = np.zeros((nchunks,), np.int32)
        else:
            seg2m = np.zeros((nchunks, self.k_pad), np.int32)
            sgm = np.zeros((nchunks, self.nseg_pad), np.int32)
        for r, c in enumerate(cs):
            k0, k1 = c["k0"], c["k1"]
            idxm[r, : k1 - k0] = offs[id(c["blk"])] + np.arange(
                k0, k1, dtype=np.int32
            )
            bidxm[r] = c["bidx"]
            if self.dense:
                sgm[r] = c["sg_one"]
            else:
                seg2m[r] = c["seg2"]
                sgm[r] = c["seg_gidx"]

        if self.stream:
            cps, nmod = self._cps, self.nmod
            ranges = [(b, lo[id(b)], hi[id(b)]) for b in blks]

            def polys():
                parts = [
                    b.materialize_rows(cps, nmod, a, z)
                    if b.chunks is not None
                    else jnp.asarray(b.polys)[a:z]
                    for b, a, z in ranges
                ]
                return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        elif len(blks) == 1:
            polys = jnp.asarray(blks[0].polys)
        else:
            polys = jnp.concatenate([jnp.asarray(b.polys) for b in blks])
        if dv is not None and not callable(polys):
            polys = jax.device_put(polys, dv)
        return {
            "dev": dv,
            "polys": polys,
            "idx": jnp.asarray(idxm) if dv is None else jax.device_put(idxm, dv),
            "bidx": jnp.asarray(bidxm)
            if dv is None
            else jax.device_put(bidxm, dv),
            "seg2": jnp.asarray(seg2m)
            if dv is None
            else jax.device_put(seg2m, dv),
            "sg": jnp.asarray(sgm) if dv is None else jax.device_put(sgm, dv),
        }

    def scan_groups(self, devices) -> list:
        """Per block row, the chunk list regrouped for the scan kernel: one
        group per executing device (all chunks on the default device when
        devices is None), each with stacked index arrays and the row's
        diagonal polys concatenated in block order.  Streaming plans split
        each device's chunk run into sub-groups bounded by
        STREAM_GROUP_BYTES of materialized polys."""
        key = tuple(id(d) for d in devices) if devices else None
        cached = self._groups.get(key)
        if cached is not None:
            return cached
        budget_rows = max(
            1, self.STREAM_GROUP_BYTES // (self.nmod * self.n * 4)
        )
        groups = []
        for bi in range(self.nbr):
            row = []
            by_dev: Dict[Optional[int], list] = {}
            order: List[Optional[int]] = []
            for c in self.chunks[bi]:
                dv = devices[c["bj"] % len(devices)] if devices else None
                if dv not in by_dev:
                    by_dev[dv] = []
                    order.append(dv)
                by_dev[dv].append(c)
            for dv in order:
                cs = by_dev[dv]
                if not self.stream:
                    row.append(self._build_group(cs, dv))
                    continue
                # bounded sub-groups (consecutive chunks; a chunk never
                # exceeds the budget because plan chunks are budget-split)
                sub, rows_used = [], 0
                for c in cs:
                    kr = c["k1"] - c["k0"]
                    if sub and rows_used + kr > budget_rows:
                        row.append(self._build_group(sub, dv))
                        sub, rows_used = [], 0
                    sub.append(c)
                    rows_used += kr
                if sub:
                    row.append(self._build_group(sub, dv))
            groups.append(row)
        self._groups[key] = groups
        return groups

    def _chunk(self, blk: DiagBlock, bj: int, k0: int, k1: int, bpos) -> dict:
        giants = blk.giants[k0:k1]
        segs = sorted({int(g) for g in giants})
        seg_of = {g: x for x, g in enumerate(segs)}
        seg_local = np.array([seg_of[int(g)] for g in giants], dtype=np.int64)
        pos = np.zeros(len(giants), dtype=np.int64)
        run: Dict[int, int] = {}
        for x, g in enumerate(giants):
            g = int(g)
            pos[x] = run.get(g, 0)
            run[g] = pos[x] + 1
        return {
            "blk": blk,
            "k0": k0,
            "k1": k1,
            "bidx": np.array([bpos[int(b)] for b in blk.babies[k0:k1]]),
            "seg_local": seg_local,
            "pos_in_group": pos,
            "nseg": len(segs),
            "bj": bj,
            # global accumulator slots of this chunk's segments (NOT
            # necessarily contiguous: other block rows may contribute
            # giants this one lacks)
            "seg_gidx": np.asarray(
                [self.seg_index[(bj, g)] for g in segs], dtype=np.int32
            ),
        }


_plan_cache: Dict[int, _MatmulPlan] = {}


def _plan_for(cps, cache, nmod, row_batch: int = 1, dense: bool = False) -> _MatmulPlan:
    key = id(cache)
    plan = _plan_cache.get(key)
    if (
        plan is None
        or plan.nmod != nmod
        or plan.row_batch != row_batch
        or plan.dense != dense
    ):
        plan = _MatmulPlan(cps, cache, nmod, row_batch, dense=dense)
        _plan_cache.clear()  # hold at most a few plans
        _plan_cache[key] = plan
    return plan


def release_plan(cache) -> None:
    """Drop the staged plan of a one-shot diagonal cache so its device
    buffers (GBs of encoded polys per block at PN14) free as soon as the
    block is consumed, instead of surviving until the next plan build."""
    _plan_cache.pop(id(cache), None)


def mat_mult_cached(
    cps: CryptoParams,
    A: B.CipherMatrix,
    cache: List[List[DiagBlock]],
    devices=None,
) -> B.CipherMatrix:
    """A (s rows x nBlockRows cts) times the preprocessed matrix ->
    s x nBlockCols cts (CPMatMult4CachedB / MatMult4StreamCompute,
    gwas/matmult.go:1043-1236).

    Fully batched: per (row, block-row) ONE hoisted-keyswitch batch rotates
    the ciphertext by every needed baby shift; the diagonal MACs of the
    whole block row run as ONE scanned device program (_mac_scan); the
    giant-step rotations of all accumulated groups run as ONE batched
    keyswitch; per block column a final segment-sum + rescale.  With
    `devices`, MAC scan groups round-robin over the local chips by block
    column (bit-identical: exact modular arithmetic is
    associativity-safe)."""
    ctx = cps.ctx
    if devices is None:
        devices = _pipeline_devices
    nbr, nbc = len(cache), len(cache[0])
    s = len(A)
    some = next(
        (cache[bi][bj] for bi in range(nbr) for bj in range(nbc)
         if not cache[bi][bj].empty),
        None,
    )
    if some is None:
        return [[ctx.zero_ct(mm_nmod(cps)) for _ in range(nbc)] for _ in range(s)]
    nmod = some.polys.shape[1] if some.polys is not None else mm_nmod(cps)
    rows = tuple(range(nmod))
    t = _sel(ctx.basis, rows)
    q, mu = t["q"], t["mu"]
    m32 = ctx.m32[jnp.asarray(rows)]
    d = some.d
    multi = devices is not None and len(devices) > 1
    plan = _plan_for(
        cps, cache, nmod, row_batch=(1 if multi else s),
        dense=(_mm_dense() and not multi),
    )
    nseg_tot = len(plan.segments)
    groups = plan.scan_groups(devices if multi else None)

    # batched giant-rotation keys (epilogue)
    rot_segs = [si for si, (bj, g) in enumerate(plan.segments) if g > 0]
    gels = [ctx.galois_for_rotation((g * d) % cps.slots) for (bj, g) in
            (plan.segments[si] for si in rot_segs)]
    uniq_gels = sorted(set(gels))
    if uniq_gels:
        gk0, gk1 = cps.stacked_keys(uniq_gels, nmod)
        gel_pos = {g: x for x, g in enumerate(uniq_gels)}
        gsel = jnp.asarray([gel_pos[g] for g in gels], dtype=jnp.int32)

    timing = os.environ.get("SFGWAS_MM_TIMING")
    if timing:
        import time as _time

        _tlog = []
        _t0 = _time.time()

        def _tick(tag, sync=None):
            if sync is not None:
                jax.block_until_ready(sync)
            nonlocal _t0
            now = _time.time()
            _tlog.append((tag, now - _t0))
            _t0 = now

    if not multi:
        # ---- batched-row path: every A row rides one hoisted-keyswitch,
        # one scanned MAC and one grouped giant keyswitch (per-row loops
        # cost ~10x the kernel time in per-dispatch tunnel latency)
        ACC0 = jnp.zeros((nseg_tot + 1, s, nmod, ctx.n), jnp.uint32)
        ACC1 = jnp.zeros((nseg_tot + 1, s, nmod, ctx.n), jnp.uint32)
        for bi in range(nbr):
            babies = plan.babies[bi]
            if not babies:
                continue
            cts = [ctx.drop_to(A[i][bi], nmod) for i in range(s)]
            C0s = jnp.stack([c.c0 for c in cts])
            C1s = jnp.stack([c.c1 for c in cts])
            nz = [b for b in babies if b % cps.slots != 0]
            if nz:
                gl = [ctx.galois_for_rotation(b) for b in nz]
                ik0, ik1 = cps.stacked_keys_inv(gl, nmod)
                R0nz, R1nz = ctx.hoisted_rotations_all(
                    C0s, C1s, ctx.perms_for(gl), ik0, ik1, nmod
                )
            if len(nz) != len(babies):
                rows0, rows1, j = [], [], 0
                for b0 in babies:
                    if b0 % cps.slots == 0:
                        rows0.append(C0s)
                        rows1.append(C1s)
                    else:
                        rows0.append(R0nz[j])
                        rows1.append(R1nz[j])
                        j += 1
                R0 = jnp.stack(rows0)
                R1 = jnp.stack(rows1)
            else:
                R0, R1 = R0nz, R1nz
            if nz:
                del R0nz, R1nz
            if timing:
                _tick(f"hoisted_all[{bi}]", R0)
            # dense mode appends one all-zero row at index nb_pad: padding
            # entries of every chunk point there, so their MACs vanish
            pad_to = plan.nb_pad + (1 if plan.dense else 0)
            if R0.shape[0] < pad_to:
                padr = jnp.zeros(
                    (pad_to - R0.shape[0], s, nmod, ctx.n), jnp.uint32
                )
                R0 = jnp.concatenate([R0, padr])
                R1 = jnp.concatenate([R1, padr])
            del cts, C0s, C1s
            for g in groups[bi]:
                gp = g["polys"]() if callable(g["polys"]) else g["polys"]
                if plan.dense:
                    ACC0, ACC1 = _mac_scan_dense_b(
                        ACC0, ACC1, R0, R1, gp, g["idx"], g["bidx"],
                        g["sg"], q, mu, m32, nsub=plan.nsub,
                    )
                else:
                    ACC0, ACC1 = _mac_scan_b(
                        ACC0, ACC1, R0, R1, gp, g["idx"], g["bidx"],
                        g["seg2"], g["sg"], q, mu, m32,
                        nseg=plan.nseg_pad, nsub=plan.nsub,
                    )
                del gp  # streamed polys free before the next group builds
            del R0, R1
            if timing:
                _tick(f"mac_scan_b[{bi}]", ACC0)

        in_scale = A[0][0].scale * ctx.params.scale
        if rot_segs:
            idx = jnp.asarray(rot_segs, dtype=jnp.int32)
            ig0, ig1 = cps.stacked_keys_inv(uniq_gels, nmod)
            r0, r1 = ctx.rotate_grouped_b(
                ACC0[idx], ACC1[idx], ctx.perms_for(gels),
                ig0[gsel], ig1[gsel], nmod,
            )
            bj_ids = jnp.asarray(
                [plan.segments[si][0] for si in rot_segs], dtype=jnp.int32
            )
            # lazy-u32 combine bound: giants per block column < max_lazy
            assert max(
                sum(1 for si in rot_segs if plan.segments[si][0] == bj)
                for bj in range(nbc)
            ) <= plan.max_lazy
            s0, s1 = _combine_rotated(r0, r1, bj_ids, q, m32, nbc=nbc)
        else:
            s0 = s1 = jnp.zeros((nbc, s, nmod, ctx.n), jnp.uint32)
        c0f, c1f = s0, s1
        zsegs = [
            (bj, plan.seg_index[(bj, 0)])
            for bj in range(nbc)
            if (bj, 0) in plan.seg_index
        ]
        if zsegs:
            bjz = jnp.asarray([z[0] for z in zsegs], dtype=jnp.int32)
            siz = jnp.asarray([z[1] for z in zsegs], dtype=jnp.int32)
            c0f = c0f.at[bjz].set(add_mod(c0f[bjz], ACC0[siz], q))
            c1f = c1f.at[bjz].set(add_mod(c1f[bjz], ACC1[siz], q))
        # batched double rescale of all (bj, i) outputs at once
        stack = jnp.concatenate(
            [c0f.reshape(nbc * s, nmod, ctx.n), c1f.reshape(nbc * s, nmod, ctx.n)]
        )
        res = ctx.rescale2_many(stack, nmod - 1)
        out_scale = (
            in_scale / ctx.basis.primes[nmod - 1] / ctx.basis.primes[nmod - 2]
        )
        r0f = res[: nbc * s].reshape(nbc, s, nmod - 2, ctx.n)
        r1f = res[nbc * s :].reshape(nbc, s, nmod - 2, ctx.n)
        if timing:
            _tick("epilogue_b", r0f)
            for tag, dt in _tlog:
                if dt > 0.05:
                    print(f"  [mm-timing] {tag}: {dt:.2f}s", flush=True)
        return [
            [
                C.Ciphertext(r0f[bj, i], r1f[bj, i], nmod - 2, out_scale)
                for bj in range(nbc)
            ]
            for i in range(s)
        ]

    out: B.CipherMatrix = []
    for i in range(s):
        # one extra dump row absorbs padded-segment scatters
        ACC0 = jnp.zeros((nseg_tot + 1, nmod, ctx.n), jnp.uint32)
        ACC1 = jnp.zeros((nseg_tot + 1, nmod, ctx.n), jnp.uint32)
        for bi in range(nbr):
            babies = plan.babies[bi]
            if not babies:
                continue
            ct = ctx.drop_to(A[i][bi], nmod)
            nz = [b for b in babies if b % cps.slots != 0]
            if nz:
                bk0, bk1 = cps.stacked_keys(
                    [ctx.galois_for_rotation(b) for b in nz], nmod
                )
            else:
                bk0 = bk1 = None
            if timing:
                _tick(f"stacked_keys[{i},{bi}]", bk0)
            R0, R1 = ctx.hoisted_rotations_b(ct, babies, bk0, bk1)
            if timing:
                _tick(f"hoisted[{i},{bi}]", R0)
            if R0.shape[0] < plan.nb_pad:
                padr = jnp.zeros(
                    (plan.nb_pad - R0.shape[0], nmod, ctx.n), jnp.uint32
                )
                R0 = jnp.concatenate([R0, padr])
                R1 = jnp.concatenate([R1, padr])
            for g in groups[bi]:
                dv = g["dev"]
                gp = g["polys"]() if callable(g["polys"]) else g["polys"]
                if dv is None:
                    ACC0, ACC1 = _mac_scan(
                        ACC0, ACC1, R0, R1, gp, g["idx"], g["bidx"],
                        g["seg2"], g["sg"], q, mu, m32,
                        nseg=plan.nseg_pad, nsub=plan.nsub,
                    )
                else:
                    # two distinct zero buffers: both are donated, and
                    # device_put of an already-placed array would alias them
                    z0 = jax.device_put(
                        jnp.zeros((nseg_tot + 1, nmod, ctx.n), jnp.uint32), dv
                    )
                    z1 = jax.device_put(
                        jnp.zeros((nseg_tot + 1, nmod, ctx.n), jnp.uint32), dv
                    )
                    p0, p1 = _mac_scan(
                        z0, z1,
                        jax.device_put(R0, dv), jax.device_put(R1, dv),
                        jax.device_put(gp, dv) if callable(g["polys"]) else gp,
                        g["idx"], g["bidx"], g["seg2"], g["sg"],
                        jax.device_put(q, dv), jax.device_put(mu, dv),
                        jax.device_put(m32, dv),
                        nseg=plan.nseg_pad, nsub=plan.nsub,
                    )
                    ACC0 = add_mod(ACC0, jax.device_put(p0, devices[0]), q)
                    ACC1 = add_mod(ACC1, jax.device_put(p1, devices[0]), q)
                del gp
            if timing:
                _tick(f"mac_scan[{i},{bi}]", ACC0)

        in_scale = A[i][0].scale * ctx.params.scale
        # batched giant rotations of every (bj, g>0) segment
        if rot_segs:
            idx = jnp.asarray(rot_segs, dtype=jnp.int32)
            r0, r1 = ctx.rotate_batch(
                ACC0[idx], ACC1[idx], gels, gk0[gsel], gk1[gsel], nmod
            )
            assert len(rot_segs) <= plan.max_lazy * plan.nsub
            bj_ids = jnp.asarray(
                [plan.segments[si][0] for si in rot_segs], dtype=jnp.int32
            )
            # lazy-sum bound for the per-bj combine: giants per block < d
            assert max(
                sum(1 for si in rot_segs if plan.segments[si][0] == bj)
                for bj in range(nbc)
            ) <= plan.max_lazy
            s0, s1 = _combine_rotated(r0, r1, bj_ids, q, m32, nbc=nbc)
        else:
            s0 = s1 = jnp.zeros((nbc, nmod, ctx.n), jnp.uint32)
        row_out = []
        for bj in range(nbc):
            c0, c1 = s0[bj], s1[bj]
            if (bj, 0) in plan.seg_index:
                si = plan.seg_index[(bj, 0)]
                c0 = add_mod(c0, ACC0[si], q)
                c1 = add_mod(c1, ACC1[si], q)
            row_out.append(
                ctx.rescale(C.Ciphertext(c0, c1, nmod, in_scale))
            )
        if timing:
            _tick(f"epilogue[{i}]", row_out[0].c0)
        out.append(row_out)
    if timing:
        for tag, dt in _tlog:
            if dt > 0.05:
                print(f"  [mm-timing] {tag}: {dt:.2f}s", flush=True)
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
        pts = mhe.collective_decrypt_many(mpc.net, cps, cv, -1)
        vals = [np.asarray(cps.ctx.decode(pt)) for pt in pts]
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
    party's local chips (SURVEY.md §2.9 within-party chip sharding): MAC
    chunks run on the chip owning their block column while the hoisted
    rotations + giant epilogue stay on the default chip.  All arithmetic is
    exact modular, so the result is bit-identical to single-device."""
    if not devices:
        devices = jax.local_devices()
    if len(devices) == 1:
        return mat_mult_cached(cps, A, cache)
    return mat_mult_cached(cps, A, cache, devices=devices)


def preprocess_matrix_host(cps: CryptoParams, mat: np.ndarray):
    """Host stage of preprocess_matrix for every block of `mat`: pure
    numpy/torch (FFT fold to integer coefficient chunks), so a prefetch
    thread can encode block b+1 while the device MACs block b (the
    reference's worker pool over assoc blocks, gwas/assoc.go:354-419)."""
    S = cps.slots
    n, m = mat.shape
    return [
        [
            encode_block_diagonals_host(cps, mat[bi : bi + S, bj : bj + S])
            for bj in range(0, m, S)
        ]
        for bi in range(0, n, S)
    ]


def finish_preprocess_matrix(cps: CryptoParams, host_rows, nmod: int):
    """Device stage: modular reduce + NTT of a preprocess_matrix_host
    result."""
    return [
        [finish_block_diagonals(cps, hb, nmod) for hb in row]
        for row in host_rows
    ]


def mat_mult_stream(
    cps: CryptoParams,
    A: B.CipherMatrix,
    geno: np.ndarray,
    compute_sums: bool = False,
    square: bool = False,
    cache_file: Optional[str] = None,
    host_pre=None,
):
    """MatMult4Stream (gwas/matmult.go:1238-1505): multiply the CipherMatrix
    with a genotype block, optionally squaring the block elementwise and
    returning plaintext dosage sums/square-sums per column.  host_pre (a
    preprocess_matrix_host result for this block) skips the host encode --
    the prefetched-pipeline path."""
    if host_pre is not None:
        assert not compute_sums and not square, (
            "prefetched path: sums/squaring happen on the prefetch thread"
        )
        cache = finish_preprocess_matrix(cps, host_pre, mm_nmod(cps))
    else:
        mat = np.asarray(geno)
        if square:
            mat = mat * mat
        cache = preprocess_matrix(cps, mat, mm_nmod(cps), cache_file)
    out = mat_mult_cached(cps, A, cache)
    # streamed blocks are multiplied once; free the plan's device buffers now
    release_plan(cache)
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
    bs_target: Optional[int] = None,
) -> B.CipherMatrix:
    """For row-partitioned A across parties: out = A (A^T B) computed per
    column of A via aggregated inner products.  The aggregated cross terms
    are refreshed to the top level before the outer product so the chain
    fits shallow modulus budgets (the reference bootstraps right after the
    rank-1 updates instead, gwas/qrfact.go:201)."""
    slots = cps.slots
    pid = mpc.pid
    ctx = cps.ctx
    n_ct = ((nrows_all[pid] - 1) // slots) + 1 if pid > 0 else 1
    if bs_target is None:
        # a refresh AT the top of the chain has no headroom for the exact
        # scale reset (mhe.collective_bootstrap_many); two primes below the
        # top it does, and nothing in this chain needs them -- so the
        # aggregated cross terms come back at EXACTLY the preset scale and
        # the per-column outer products accumulate with equal scales.
        bs_target = ctx.nq - 2
    batched = inner_fn is None  # default ct-ct inner product, batched over j
    # accumulate with first-term adoption (a czeros init would impose the
    # preset scale on products whose scale has drifted from rescaling)
    out = [None] * ncol_out
    for c in range(len(A)):
        if batched:
            # one fused relin-mult + one grouped rotation ladder covers all
            # ncol_out inner products (the per-j loop cost ~40 s/column in
            # per-dispatch tunnel latency on the PN14 DQR)
            prods = None
            for t in range(n_ct):
                row = B.cmult_one_to_many(
                    cps, A[c][t], [Bmat[j][t] for j in range(ncol_out)]
                )
                if prods is None:
                    prods = row
                else:
                    prods = [
                        ctx.add(p, r) for p, r in zip(prods, row)
                    ]
            ctq_loc = B.rotate_and_add_many(cps, prods, slots)
        else:
            ctq_loc = []
            for j in range(ncol_out):
                prod = inner_fn(cps, A[c], Bmat, j)
                ctq_loc.append(B.inner_sum_all(cps, prod))
        ctq = mhe.aggregate_cvec(mpc.net, cps, ctq_loc)
        ctq = mhe.bootstrap_vec(mpc.net, cps, ctq, -1, target_nmod=bs_target)
        if batched:
            for t in range(n_ct):
                col = B.cmult_one_to_many(cps, A[c][t], ctq)
                for j in range(ncol_out):
                    if out[j] is None:
                        out[j] = [None] * n_ct
                    prev = out[j][t]
                    out[j][t] = col[j] if prev is None else ctx.add(
                        ctx.drop_to(prev, min(prev.nmod, col[j].nmod)),
                        ctx.drop_to(col[j], min(prev.nmod, col[j].nmod)),
                    )
        else:
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
    # the matmult band leaves no level for the trailing-slot mask: refresh
    # first (level-subtract above is drop-only), mask at the top -- same
    # single collective round, moved before the masking (the qxt variant
    # already orders its chain this way)
    out = mhe.bootstrap_mat_all(mpc.net, cps, out)
    for i in range(len(out)):
        for j in range(len(out[i])):
            n_keep = slots if j < len(out[i]) - 1 else ((num_ind - 1) % slots) + 1
            out[i][j] = B.mask_trunc(cps, out[i][j], n_keep, post_scale)
    return out


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
