"""Multi-party tests of the core MPC primitives against plaintext oracles.
3 parties: dealer (pid 0) + 2 data parties, mirroring the reference example
(run_example.sh)."""

import math

import numpy as np
import pytest

from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.parallel.simulate import make_shares, reveal_ints, run_parties

F = 30  # frac bits
K = 60  # data bits


def fxp(v):
    return int(round(v * (1 << F)))


def tofloat(x, p):
    x = int(x)
    if x > p // 2:
        x -= p
    return x / (1 << F)


def _run(fn, **kw):
    return run_parties(3, fn, **kw)


def test_share_reveal():
    vals = [0, 1, 123456789, R.P256 - 5]

    def fn(mpc):
        sh = make_shares(mpc, vals)
        return reveal_ints(mpc, sh)

    res = _run(fn)
    for pid in (1, 2):
        assert [int(v) for v in res[pid]] == vals


def test_beaver_mult_and_matmul():
    a = [3, 10**12, R.P256 - 7]  # includes a negative (-7)
    b = [5, 999, 12]

    def fn(mpc):
        sa = make_shares(mpc, a)
        sb = make_shares(mpc, b)
        prod = mpc.ss_mult_elem(sa, sb)
        sq = mpc.ss_square_elem(sa)
        A = make_shares(mpc, [1, 2, 3, 4]).reshape(2, 2, -1)
        B = make_shares(mpc, [5, 6, 7, 8]).reshape(2, 2, -1)
        M = mpc.ss_mult_mat(A, B)
        return (
            reveal_ints(mpc, prod),
            reveal_ints(mpc, sq),
            reveal_ints(mpc, M.reshape(4, -1)),
        )

    res = _run(fn)
    prod, sq, M = res[1]
    p = R.P256
    assert [int(v) for v in prod] == [(x * y) % p for x, y in zip(a, b)]
    assert [int(v) for v in sq] == [(x * x) % p for x in a]
    assert [int(v) for v in M] == [19, 22, 43, 50]


def test_trunc():
    vals = [fxp(2.5), fxp(1000.125), fxp(-3.75), fxp(-0.001)]
    # multiply up by 2^F so trunc brings them back
    scaled = [(v << F) % R.P256 for v in vals]

    def fn(mpc):
        sh = make_shares(mpc, scaled)
        t = mpc.trunc(sh, K, F)
        return reveal_ints(mpc, t)

    res = _run(fn)
    for got, want in zip(res[1], vals):
        gotc = int(got) if int(got) < R.P256 // 2 else int(got) - R.P256
        wantc = want if want >= 0 else want
        assert abs(gotc - want) <= 1


@pytest.mark.parametrize("binary", [True, False])
def test_is_positive(binary):
    vals = [1, fxp(0.5), fxp(123.0), -1, fxp(-7.5), -(10**10), 10**10]
    enc = [v % R.P256 for v in vals]

    def fn(mpc):
        sh = make_shares(mpc, enc)
        pos = mpc.is_positive(sh, binary)
        return reveal_ints(mpc, pos)

    res = _run(fn)
    want = [1 if v > 0 else 0 for v in vals]
    assert [int(v) for v in res[1]] == want


@pytest.mark.parametrize("binary", [True, False])
def test_normalizer_even_exp(binary):
    vals = [3, 255, fxp(1.0), fxp(900.0), 1 << 55]

    def fn(mpc):
        sh = make_shares(mpc, vals)
        s, s_sqrt = mpc.normalizer_even_exp(sh, K, binary)
        return reveal_ints(mpc, s), reveal_ints(mpc, s_sqrt)

    res = _run(fn)
    s, ssqrt = res[1]
    for v, si, sq in zip(vals, s, ssqrt):
        si, sq = int(si), int(sq)
        prod = v * si
        # The binary version computes the normalizer for the 2^15-shifted
        # value carrying small share-conversion noise (mpc/mpc.go:912-914),
        # so a value sitting exactly on a power-of-4 boundary may normalize
        # one notch high.  The Newton iterations downstream tolerate this.
        hi_slack = 4 if binary else 1
        assert (1 << (K - 2)) <= prod <= hi_slack * (1 << K), (v, si)
        assert sq * sq == si


@pytest.mark.parametrize("binary", [True, False])
def test_sqrt_and_inverse(binary):
    vals = [2.0, 0.25, 9.0, 10000.0, 123.456]
    enc = [fxp(v) for v in vals]

    def fn(mpc):
        sh = make_shares(mpc, enc)
        b, binv = mpc.sqrt_and_sqrt_inverse(sh, binary)
        return reveal_ints(mpc, b), reveal_ints(mpc, binv)

    res = _run(fn)
    b, binv = res[1]
    for v, s, si in zip(vals, b, binv):
        assert abs(tofloat(s, R.P256) - math.sqrt(v)) < 1e-4 * max(1, math.sqrt(v))
        assert abs(tofloat(si, R.P256) - 1 / math.sqrt(v)) < 1e-4 * max(
            1, 1 / math.sqrt(v)
        )


@pytest.mark.parametrize("binary", [True, False])
def test_divide(binary):
    pairs = [(1.0, 3.0), (10.0, 4.0), (0.5, 2.0), (1234.5, 0.75)]

    def fn(mpc):
        sa = make_shares(mpc, [fxp(a) for a, _ in pairs])
        sb = make_shares(mpc, [fxp(b) for _, b in pairs])
        d = mpc.divide(sa, sb, binary)
        return reveal_ints(mpc, d)

    res = _run(fn)
    for (a, b), got in zip(pairs, res[1]):
        assert abs(tofloat(got, R.P256) - a / b) < 1e-4 * max(1, a / b)


def test_less_than_family():
    a = [fxp(1.0), fxp(5.0), fxp(-2.0)]
    b = [fxp(2.0), fxp(3.0), fxp(-1.0)]

    def fn(mpc):
        sa = make_shares(mpc, [v % R.P256 for v in a])
        sb = make_shares(mpc, [v % R.P256 for v in b])
        lt = mpc.less_than(sa, sb)
        nlt_pub = mpc.not_less_than_public(sa, mpc.ring.const(fxp(1.5)))
        return reveal_ints(mpc, lt), reveal_ints(mpc, nlt_pub)

    res = _run(fn)
    lt, nlt = res[1]
    assert [int(v) for v in lt] == [1, 0, 1]
    assert [int(v) for v in nlt] == [0, 1, 0]


def test_powers_and_poly():
    vals = [2, 3, 5]

    def fn(mpc):
        sh = make_shares(mpc, vals)
        pw = mpc.powers(sh, 4)
        return reveal_ints(mpc, pw.reshape(5 * 3, -1))

    res = _run(fn)
    got = np.array([int(v) for v in res[1]]).reshape(5, 3)
    for p in range(5):
        for i, v in enumerate(vals):
            assert got[p, i] == pow(v, p, R.P256)


def test_prefix_or_small_field():
    rows = [
        [0, 0, 1, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 1],
    ]

    def fn(mpc):
        Fd = R.SElem
        flat = [b for row in rows for b in row]
        sh = make_shares(mpc, flat, Fd).reshape(len(rows), len(rows[0]))
        out = mpc.prefix_or(sh)
        return reveal_ints(mpc, out, Fd)

    res = _run(fn)
    got = np.asarray(res[1]).reshape(len(rows), -1)
    for i, row in enumerate(rows):
        acc = 0
        for j, b in enumerate(row):
            acc = acc | b
            assert got[i][j] == acc
