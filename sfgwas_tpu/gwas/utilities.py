"""GWAS file utilities: collective decrypt-and-save, cache IO.

Re-implementation of gwas/utilities.go + the decrypt/save helpers of
mpc/mhe.go:554-606 (SaveMatrixToFileWithPrint).  The reference's resume
artifacts are *decrypted* intermediates (acknowledged TODO at
gwas/gwas.go:337); this build keeps the same file formats so caches
interoperate conceptually, plus an encrypted cache format for ciphertext
matrices (SaveCipherMatrixToFile, crypto/utilities.go:82-146)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..crypto import basics as B
from ..mpc import mhe


def save_matrix_collective(
    net, cps, cm: B.CipherMatrix, n_cols: int, source_pid: int, filename: str
):
    """Collectively decrypt and save a CipherMatrix as CSV rows
    (SaveMatrixToFileWithPrint semantics)."""
    if net.pid == 0:
        return None
    # dims can differ per party (row-partitioned matrices); the source
    # announces its shape (mpc/mhe.go:116-130)
    if source_pid > 0:
        if net.pid == source_pid:
            for p in range(1, net.nparty):
                if p != net.pid:
                    net.send((len(cm), len(cm[0])), p)
            nr, nc = len(cm), len(cm[0])
        else:
            nr, nc = net.recv(source_pid)
            cm = [[None] * nc for _ in range(nr)]
    else:
        nr, nc = len(cm), len(cm[0])
    rows = []
    for cv in cm:
        pts = mhe.collective_decrypt_many(net, cps, cv, source_pid)
        vals = [cps.ctx.decode(pt) for pt in pts]
        rows.append(np.concatenate(vals)[:n_cols])
    M = np.stack(rows)
    if source_pid < 0 or net.pid == source_pid:
        np.savetxt(filename, M, delimiter=",", fmt="%.6e")
    return M


def load_matrix_float(filename: str) -> np.ndarray:
    return np.loadtxt(filename, delimiter=",", ndmin=2)


def save_cipher_matrix(cps, cm: B.CipherMatrix, filename: str, extra=None):
    """Encrypted cache (the reference marshals lattigo ciphertexts;
    here: npz of RNS arrays).  `extra` adds plaintext side arrays (e.g. the
    dosage sums the reference stores beside its block caches,
    gwas/assoc.go:317-334)."""
    data = {"rows": len(cm), "cols": len(cm[0])}
    for i, cv in enumerate(cm):
        for j, ct in enumerate(cv):
            data[f"c0_{i}_{j}"] = np.asarray(ct.c0)
            data[f"c1_{i}_{j}"] = np.asarray(ct.c1)
            data[f"m_{i}_{j}"] = np.array([ct.nmod, ct.scale])
    if extra:
        data.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez_compressed(filename, **data)


def load_cipher_matrix(cps, filename: str) -> B.CipherMatrix:
    import jax.numpy as jnp

    from ..crypto import ckks as C

    z = np.load(filename)
    out = []
    for i in range(int(z["rows"])):
        row = []
        for j in range(int(z["cols"])):
            meta = z[f"m_{i}_{j}"]
            row.append(
                C.Ciphertext(
                    jnp.asarray(z[f"c0_{i}_{j}"]),
                    jnp.asarray(z[f"c1_{i}_{j}"]),
                    int(meta[0]),
                    float(meta[1]),
                )
            )
        out.append(row)
    return out


def write_filter(filename: str, filt: np.ndarray):
    np.savetxt(filename, np.asarray(filt).astype(int), fmt="%d")


def read_filter(filename: str, n: int) -> np.ndarray:
    out = np.loadtxt(filename).astype(bool)
    assert len(out) == n
    return out
