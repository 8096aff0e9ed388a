"""BSGS Chebyshev evaluation: degree-62 sigmoid at reference depth.

The reference evaluates its degree-62 logistic sigmoid non-interactively via
lattigo's baby-step/giant-step Chebyshev evaluator (mpc/mhe.go:617-673);
this exercises the TPU-native equivalent (crypto/basics.py
evaluate_chebyshev_bsgs) against the exact sigmoid on the full interval.
"""

import math

import numpy as np

from sfgwas_tpu.crypto import basics as B
from sfgwas_tpu.mpc import mhe
from sfgwas_tpu.parallel.simulate import run_parties

PRESET = "TEST10"


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_bsgs_recursion_matches_chebval():
    """Pure-polynomial check of the quotient/remainder split across degrees
    (plaintext mirror of the ciphertext recursion)."""
    rng = np.random.default_rng(0)
    xs = np.linspace(-1, 1, 257)
    for deg in [1, 2, 3, 4, 7, 8, 15, 16, 31, 62, 63]:
        c = rng.normal(size=deg + 1)
        ref = np.polynomial.chebyshev.chebval(xs, c)
        got = _plain_bsgs(c, xs)
        assert np.abs(got - ref).max() < 1e-9, deg


def _plain_bsgs(coeffs, xs):
    deg = len(coeffs) - 1
    T = {1: xs}

    def getT(k):
        if k in T:
            return T[k]
        i, j = k // 2, k - k // 2
        res = 2.0 * getT(i) * getT(j) - (1.0 if i == j else getT(j - i))
        T[k] = res
        return res

    m = max(1, math.ceil(math.log2(deg + 1)))
    nb = max(2, 1 << (m // 2))

    def rec(c):
        d = len(c) - 1
        while d > 0 and abs(c[d]) < 1e-12:
            d -= 1
        c = c[: d + 1]
        if d == 0:
            return ("const", float(c[0]))
        if d < nb:
            acc = None
            for j in range(d, 0, -1):
                if abs(c[j]) < 1e-12:
                    continue
                term = getT(j) * float(c[j])
                acc = term if acc is None else acc + term
            return acc + float(c[0])
        p = 1 << (d.bit_length() - 1)
        if p == d:
            p >>= 1
        q = np.zeros(d - p + 1)
        q[0] = c[p]
        q[1 : d - p + 1] = 2.0 * c[p + 1 : d + 1]
        r = np.zeros(p)
        r[:p] = c[:p]
        for j in range(p + 1, d + 1):
            r[2 * p - j] -= c[j]
        qc = rec(q)
        prod = getT(p) * qc[1] if isinstance(qc, tuple) else rec_mul(qc, getT(p))
        rc = rec(r)
        return prod + (rc[1] if isinstance(rc, tuple) else rc)

    def rec_mul(a, b):
        return a * b

    out = rec(np.asarray(coeffs, float))
    return np.full_like(xs, out[1]) if isinstance(out, tuple) else out


def test_sigmoid_degree62_encrypted():
    """Degree-62 Chebyshev sigmoid on [-10, 10] under encryption, evaluated
    BSGS-style with collective refresh; must match the exact sigmoid to
    <1e-4 (reference fidelity: mpc/mhe.go:617-673, intv=10 deg=63)."""
    a, b = -10.0, 10.0
    coeffs = B.chebyshev_coeffs(lambda x: 1.0 / (1.0 + math.exp(-x)), a, b, 62)
    rng = np.random.default_rng(11)
    slots = 512
    xs = rng.uniform(a + 0.5, b - 0.5, size=slots)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=[])
        if mpc.pid == 0:
            return None
        if mpc.pid == 1:
            cv = B.encrypt_float_vector(cps, xs)
        else:
            cv = [None]
        cv = [mhe.broadcast_ciphertext(mpc.net, cps, cv[0], 1)]

        def refresh(net, cps_, ct, src):
            return mhe.collective_bootstrap(net, cps_, ct, src)

        out = B.evaluate_chebyshev_bsgs(mpc.net, cps, cv, coeffs, a, b, refresh)
        pt = mhe.collective_decrypt(mpc.net, cps, out[0], -1)
        return cps.ctx.decode(pt)[:slots]

    res = run_parties(3, fn)
    want = _sigmoid(xs)
    for pid in (1, 2):
        err = np.abs(res[pid] - want).max()
        assert err < 1e-4, err
