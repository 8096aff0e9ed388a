"""Pallas TPU kernel: fused negacyclic NTT.

The jnp NTT (ops/rns.py) materializes [L, N] arrays between each of the
log2(N) butterfly stages (~14 HBM round trips per transform).  This kernel
keeps the whole residue matrix + twiddle tables resident in VMEM and runs
all stages in a single pass: one HBM read + one write per poly.  For the
production shapes (L<=25 primes, N<=2^14) the working set is ~4 MB, well
inside a TPU core's VMEM.

Values are uint32 (< 2^26); the Shoup multiply uses wrapping 32-bit
arithmetic exactly as in ops/rns.py (TPU-native replacement for the
reference's uint128 Montgomery loops, gwas/matmult.go:247-324).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rns


def _mulhi32(a, b):
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


def _mul_shoup(a, w, ws, q):
    hi = _mulhi32(a, ws)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _fwd_kernel(n: int, x_ref, tw_ref, tws_ref, q_ref, out_ref):
    L = x_ref.shape[0]
    q = q_ref[:, :]  # [L, 1]
    x = x_ref[:, :]  # [L, n]
    m = 1
    while m < n:
        half = n // (2 * m)
        xv = x.reshape(L, m, 2, half)
        # twiddle rows m..2m-1, one per butterfly group (static slices)
        S = tw_ref[:, m : 2 * m].reshape(L, m, 1)
        Ss = tws_ref[:, m : 2 * m].reshape(L, m, 1)
        qb = q.reshape(L, 1, 1)
        u = xv[:, :, 0, :]
        v = _mul_shoup(xv[:, :, 1, :], S, Ss, qb)
        s = u + v
        lo = jnp.where(s >= qb, s - qb, s)
        hi = jnp.where(u >= v, u - v, u + qb - v)
        x = jnp.stack([lo, hi], axis=2).reshape(L, n)
        m *= 2
    out_ref[:, :] = x


def _inv_kernel(n: int, x_ref, tw_ref, tws_ref, q_ref, ninv_ref, ninvs_ref, out_ref):
    L = x_ref.shape[0]
    q = q_ref[:, :]
    x = x_ref[:, :]
    m = n
    while m > 1:
        h = m // 2
        xv = x.reshape(L, h, 2, n // m)
        S = tw_ref[:, h : 2 * h].reshape(L, h, 1)
        Ss = tws_ref[:, h : 2 * h].reshape(L, h, 1)
        qb = q.reshape(L, 1, 1)
        u = xv[:, :, 0, :]
        v = xv[:, :, 1, :]
        s = u + v
        lo = jnp.where(s >= qb, s - qb, s)
        diff = jnp.where(u >= v, u - v, u + qb - v)
        hi = _mul_shoup(diff, S, Ss, qb)
        x = jnp.stack([lo, hi], axis=2).reshape(L, n)
        m = h
    out_ref[:, :] = _mul_shoup(x, ninv_ref[:, :], ninvs_ref[:, :], q)


def _fwd_kernel_b(n: int, x_ref, tw_ref, tws_ref, q_ref, out_ref):
    """Batched forward kernel: x_ref [1, Bc, n] rows sharing ONE prime row's
    twiddles (tw_ref [1, n]).  All log2(n) stages run VMEM-resident: one HBM
    read + one write per poly, vs ~14 round trips for the staged jnp path
    (2.2 Gcoeff/s measured at the PN14 moddown batch, BASELINE.md)."""
    x = x_ref[0]
    q = q_ref[0, 0]
    Bc = x.shape[0]
    m = 1
    while m < n:
        half = n // (2 * m)
        xv = x.reshape(Bc, m, 2, half)
        S = tw_ref[0, m : 2 * m].reshape(1, m, 1)
        Ss = tws_ref[0, m : 2 * m].reshape(1, m, 1)
        u = xv[:, :, 0, :]
        v = _mul_shoup(xv[:, :, 1, :], S, Ss, q)
        s = u + v
        lo = jnp.where(s >= q, s - q, s)
        hi = jnp.where(u >= v, u - v, u + q - v)
        x = jnp.stack([lo, hi], axis=2).reshape(Bc, n)
        m *= 2
    out_ref[0] = x


def _inv_kernel_b(n: int, x_ref, tw_ref, tws_ref, q_ref, ninv_ref, ninvs_ref, out_ref):
    x = x_ref[0]
    q = q_ref[0, 0]
    Bc = x.shape[0]
    m = n
    while m > 1:
        h = m // 2
        xv = x.reshape(Bc, h, 2, n // m)
        S = tw_ref[0, h : 2 * h].reshape(1, h, 1)
        Ss = tws_ref[0, h : 2 * h].reshape(1, h, 1)
        u = xv[:, :, 0, :]
        v = xv[:, :, 1, :]
        s = u + v
        lo = jnp.where(s >= q, s - q, s)
        diff = jnp.where(u >= v, u - v, u + q - v)
        hi = _mul_shoup(diff, S, Ss, q)
        x = jnp.stack([lo, hi], axis=2).reshape(Bc, n)
        m = h
    out_ref[0] = _mul_shoup(x, ninv_ref[0, 0], ninvs_ref[0, 0], q)


_BLOCK_B = int(__import__("os").environ.get("SFGWAS_PALLAS_NTT_BLOCK", "16"))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ntt_pallas_b(x, basis: "rns.RnsBasis", rows, inverse: bool = False,
                 interpret: bool = False):
    """Batched fused-VMEM NTT: x [L, B, n] (rns.ntt_b layout), grid over
    (prime row, batch blocks); each grid cell transforms SFGWAS_PALLAS_NTT_BLOCK
    polys against its row's twiddle tables."""
    n = basis.n
    L, Bn, _ = x.shape
    t = rns._sel(basis, rows)
    q = jnp.asarray(t["q"])  # [L, 1]
    bb = max(1, min(_BLOCK_B, Bn))
    pad = (-Bn) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((L, pad, n), x.dtype)], axis=1)
    grid = (L, (Bn + pad) // bb)
    xspec = pl.BlockSpec((1, bb, n), lambda l, b: (l, b, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, n), lambda l, b: (l, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1), lambda l, b: (l, 0), memory_space=pltpu.VMEM)
    if not inverse:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_b, n),
            out_shape=jax.ShapeDtypeStruct((L, Bn + pad, n), jnp.uint32),
            grid=grid,
            in_specs=[xspec, tspec, tspec, cspec],
            out_specs=xspec,
            interpret=interpret,
        )(x, jnp.asarray(t["psi"]), jnp.asarray(t["psi_s"]), q)
    else:
        out = pl.pallas_call(
            functools.partial(_inv_kernel_b, n),
            out_shape=jax.ShapeDtypeStruct((L, Bn + pad, n), jnp.uint32),
            grid=grid,
            in_specs=[xspec, tspec, tspec, cspec, cspec, cspec],
            out_specs=xspec,
            interpret=interpret,
        )(
            x,
            jnp.asarray(t["ipsi"]),
            jnp.asarray(t["ipsi_s"]),
            q,
            jnp.asarray(t["ninv"]),
            jnp.asarray(t["ninv_s"]),
        )
    return out[:, :Bn] if pad else out


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ntt_pallas(x, basis: "rns.RnsBasis", rows, inverse: bool = False, interpret: bool = False):
    """Drop-in for rns.ntt using the fused Pallas kernel.  The whole [L, n]
    residue matrix is one VMEM-resident block (TPU tiling requires the
    trailing dims be full-array or (8,128)-aligned)."""
    n = basis.n
    L = x.shape[0]
    t = rns._sel(basis, rows)
    q = jnp.asarray(t["q"])  # [L, 1]
    full = lambda: pl.BlockSpec((L, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    col = lambda: pl.BlockSpec((L, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    if not inverse:
        tw = jnp.asarray(t["psi"])
        tws = jnp.asarray(t["psi_s"])
        return pl.pallas_call(
            functools.partial(_fwd_kernel, n),
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            in_specs=[full(), full(), full(), col()],
            out_specs=full(),
            interpret=interpret,
        )(x, tw, tws, q)
    tw = jnp.asarray(t["ipsi"])
    tws = jnp.asarray(t["ipsi_s"])
    ninv = jnp.asarray(t["ninv"])
    ninvs = jnp.asarray(t["ninv_s"])
    return pl.pallas_call(
        functools.partial(_inv_kernel, n),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        in_specs=[full(), full(), full(), col(), col(), col()],
        out_specs=full(),
        interpret=interpret,
    )(x, tw, tws, q, ninv, ninvs)
