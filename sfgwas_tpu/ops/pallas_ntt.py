"""Pallas TPU kernel: fused negacyclic NTT.

The jnp NTT (ops/rns.py) materializes [L, N] arrays between each of the
log2(N) butterfly stages (~14 HBM round trips per transform).  This kernel
keeps one prime's whole polynomial + twiddle tables resident in VMEM and
runs all stages in a single pass: one HBM read + one write per poly.

Grid: one program per prime row.  Values are uint32 (< 2^26); the Shoup
multiply uses wrapping 32-bit arithmetic exactly as in ops/rns.py.
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
    q = q_ref[0, 0]
    x = x_ref[0, :]
    tw = tw_ref[0, :]
    tws = tws_ref[0, :]
    m = 1
    while m < n:
        half = n // (2 * m)
        xv = x.reshape(m, 2, half)
        # static slice bounds per unrolled stage
        S = tw[m : 2 * m][:, None]
        Ss = tws[m : 2 * m][:, None]
        u = xv[:, 0, :]
        v = _mul_shoup(xv[:, 1, :], S, Ss, q)
        lo = jnp.where(u + v >= q, u + v - q, u + v)
        hi = jnp.where(u >= v, u - v, u + q - v)
        x = jnp.stack([lo, hi], axis=1).reshape(n)
        m *= 2
    out_ref[0, :] = x


def _inv_kernel(n: int, x_ref, tw_ref, tws_ref, q_ref, ninv_ref, ninvs_ref, out_ref):
    q = q_ref[0, 0]
    x = x_ref[0, :]
    tw = tw_ref[0, :]
    tws = tws_ref[0, :]
    m = n
    while m > 1:
        h = m // 2
        half = n // m
        xv = x.reshape(h, 2, half)
        S = tw[h : 2 * h][:, None]
        Ss = tws[h : 2 * h][:, None]
        u = xv[:, 0, :]
        v = xv[:, 1, :]
        lo = jnp.where(u + v >= q, u + v - q, u + v)
        diff = jnp.where(u >= v, u - v, u + q - v)
        hi = _mul_shoup(diff, S, Ss, q)
        x = jnp.stack([lo, hi], axis=1).reshape(n)
        m = h
    out_ref[0, :] = _mul_shoup(x, ninv_ref[0, 0], ninvs_ref[0, 0], q)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ntt_pallas(x, basis: "rns.RnsBasis", rows, inverse: bool = False, interpret: bool = False):
    """Drop-in for rns.ntt using the fused Pallas kernel."""
    import numpy as np

    n = basis.n
    L = x.shape[0]
    idx = np.asarray(rows, dtype=np.int64)
    t = rns._sel(basis, rows)
    q = jnp.asarray(t["q"])  # [L, 1]
    if not inverse:
        tw = jnp.asarray(t["psi"])
        tws = jnp.asarray(t["psi_s"])
        kernel = functools.partial(_fwd_kernel, n)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(L,),
            in_specs=[
                pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw, tws, q)
    tw = jnp.asarray(t["ipsi"])
    tws = jnp.asarray(t["ipsi_s"])
    ninv = jnp.asarray(t["ninv"])
    ninvs = jnp.asarray(t["ninv_s"])
    kernel = functools.partial(_inv_kernel, n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, tw, tws, q, ninv, ninvs)
