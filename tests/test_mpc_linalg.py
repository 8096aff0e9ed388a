"""Secret-shared linear algebra vs numpy oracles."""

import numpy as np
import pytest

from sfgwas_tpu.mpc import linalg
from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.parallel.simulate import make_shares, reveal_ints, run_parties

F = 30


def fxp(v):
    return int(round(v * (1 << F))) % R.P256


def tofloat_arr(ints):
    p = R.P256
    out = []
    for x in np.asarray(ints).reshape(-1):
        x = int(x)
        if x > p // 2:
            x -= p
        out.append(x / (1 << F))
    return np.array(out)


def test_householder_and_qr():
    A = np.array([[1.2, 0.4, -0.3], [0.4, 0.9, 0.2], [-0.3, 0.2, 1.1]])

    def fn(mpc):
        sh = make_shares(mpc, [fxp(v) for v in A.reshape(-1)]).reshape(3, 3, -1)
        Q, Rm = linalg.qr_fact_square(mpc, sh)
        return reveal_ints(mpc, Q.reshape(9, -1)), reveal_ints(mpc, Rm.reshape(9, -1))

    res = run_parties(3, fn)
    Q = tofloat_arr(res[1][0]).reshape(3, 3)
    Rm = tofloat_arr(res[1][1]).reshape(3, 3)
    # The reference QRFactSquare reflects matrix *rows* (mpc/mpc.go:2344-2396),
    # yielding an LQ-style factorization: A = R_stored * Q with R_stored
    # lower-triangular and Q orthonormal.
    assert np.allclose(Q @ Q.T, np.eye(3), atol=2e-2)
    recon = Rm @ Q
    assert np.allclose(recon, A, atol=2e-2), recon


def test_eigen_decomp():
    rng = np.random.default_rng(7)
    M = rng.normal(size=(4, 4)) * 0.4
    A = M @ M.T / 4 + 0.5 * np.eye(4)  # SPD, eigenvalues O(1)

    def fn(mpc):
        sh = make_shares(mpc, [fxp(v) for v in A.reshape(-1)]).reshape(4, 4, -1)
        V, L = linalg.eigen_decomp(mpc, sh)
        Vs, Ls = linalg.sort_rows_descend(mpc, V, L)
        return reveal_ints(mpc, Vs.reshape(16, -1)), reveal_ints(mpc, Ls)

    res = run_parties(3, fn)
    V = tofloat_arr(res[1][0]).reshape(4, 4)
    L = tofloat_arr(res[1][1])
    w, U = np.linalg.eigh(A)
    w = w[::-1]  # descending
    assert np.allclose(sorted(L, reverse=True), L, atol=1e-9)  # sorted
    assert np.allclose(L, w, atol=3e-2), (L, w)
    # eigenvector property: A v ~ lambda v for each row of V
    for i in range(4):
        err = A @ V[i] - L[i] * V[i]
        assert np.linalg.norm(err) < 5e-2, (i, err)


def test_matrix_inverse_sqrt_svd():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(3, 3)) * 0.3
    A = M @ M.T / 3 + 0.6 * np.eye(3)

    def fn(mpc):
        # matrix_inverse_sqrt_svd symmetrizes (A + A^T)
        sh = make_shares(mpc, [fxp(v) for v in (A / 2).reshape(-1)]).reshape(3, 3, -1)
        B = linalg.matrix_inverse_sqrt_svd(mpc, sh)
        return reveal_ints(mpc, B.reshape(9, -1))

    res = run_parties(3, fn)
    B = tofloat_arr(res[1]).reshape(3, 3)
    assert np.allclose(B.T @ B, np.linalg.inv(A), atol=5e-2), B.T @ B


def test_chol_whiten():
    """chol_whiten: W upper-triangular with W^T G W = I, stable across
    wildly different column scales (correlation rescale)."""
    rng = np.random.default_rng(11)
    Bm = rng.normal(size=(40, 4)) * np.array([1.0, 30.0, 0.05, 3.0])
    Bm[:, 0] = 1.0  # ones column, like the combined covariate basis
    G = Bm.T @ Bm / 40

    def fn(mpc):
        sh = make_shares(mpc, [fxp(v) for v in G.reshape(-1)]).reshape(4, 4, -1)
        W = linalg.chol_whiten(mpc, sh)
        return reveal_ints(mpc, W.reshape(16, -1))

    res = run_parties(3, fn)
    W = tofloat_arr(res[1]).reshape(4, 4)
    assert np.allclose(W, np.triu(W), atol=1e-6), W
    M = W.T @ G @ W
    assert np.allclose(M, np.eye(4), atol=2e-2), M


def test_matrix_inverse_svd():
    """General (non-symmetric) inverse via the Gram eigendecomposition
    (MatrixInverseSVD, mpc/mpc.go:2795-2838)."""
    rng = np.random.default_rng(7)
    A = np.eye(3) * 1.1 + rng.normal(size=(3, 3)) * 0.25

    def fn(mpc):
        sh = make_shares(mpc, [fxp(v) for v in A.reshape(-1)]).reshape(3, 3, -1)
        Ainv = linalg.matrix_inverse_svd(mpc, sh)
        return reveal_ints(mpc, Ainv.reshape(9, -1))

    res = run_parties(3, fn)
    got = tofloat_arr(res[1]).reshape(3, 3)
    want = np.linalg.inv(A)
    assert np.abs(got - want).max() < 0.05, got - want
