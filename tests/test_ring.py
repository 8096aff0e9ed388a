"""Oracle tests for the limb ring arithmetic (sfgwas_tpu/ops/ring.py)
against exact python integers."""

import numpy as np
import pytest

from sfgwas_tpu.ops import ring as R


def miller_rabin(n: int) -> bool:
    if n < 4:
        return n in (2, 3)
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def test_moduli_are_prime():
    assert miller_rabin(R.P256)
    assert miller_rabin(R.P127)
    assert miller_rabin(R.SElem.modulus)


RINGS = [R.LElem256, R.LElem128, R.LElem2N256, R.LElem2N127]


def _rand_ints(rng, ring, n):
    return [int(rng.integers(0, 2**63)) ** 4 % ring.modulus for _ in range(n)]


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_roundtrip(ring, rng):
    vals = _rand_ints(rng, ring, 20) + [0, 1, ring.modulus - 1]
    digits = ring.from_ints(vals)
    back = ring.to_ints(digits)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_add_sub_neg_mul(ring, rng):
    n = 33
    a = _rand_ints(rng, ring, n)
    b = _rand_ints(rng, ring, n)
    da, db = ring.from_ints(a), ring.from_ints(b)
    m = ring.modulus

    got = ring.to_ints(ring.add(da, db))
    assert [int(x) for x in got] == [(x + y) % m for x, y in zip(a, b)]

    got = ring.to_ints(ring.sub(da, db))
    assert [int(x) for x in got] == [(x - y) % m for x, y in zip(a, b)]

    got = ring.to_ints(ring.neg(da))
    assert [int(x) for x in got] == [(-x) % m for x in a]

    got = ring.to_ints(ring.mul(da, db))
    assert [int(x) for x in got] == [(x * y) % m for x, y in zip(a, b)]


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_mul_int_and_const(ring, rng):
    a = _rand_ints(rng, ring, 9)
    da = ring.from_ints(a)
    m = ring.modulus
    for s in [0, 1, 2, 255, -3, 511, 123456789123456789 % m]:
        got = ring.to_ints(ring.mul_int(da, s))
        assert [int(x) for x in got] == [(x * s) % m for x in a]


@pytest.mark.parametrize("ring", [R.LElem256, R.LElem128], ids=lambda r: r.name)
def test_matmul(ring, rng):
    r, k, c = 3, 5, 4
    A = [[int(rng.integers(0, 2**62)) ** 4 % ring.modulus for _ in range(k)] for _ in range(r)]
    B = [[int(rng.integers(0, 2**62)) ** 4 % ring.modulus for _ in range(c)] for _ in range(k)]
    dA = ring.from_ints(A)
    dB = ring.from_ints(B)
    got = ring.to_ints(ring.matmul(dA, dB))
    for i in range(r):
        for j in range(c):
            want = sum(A[i][t] * B[t][j] for t in range(k)) % ring.modulus
            assert int(got[i][j]) == want


def test_matmul_large_k(rng):
    ring = R.LElem128
    r, k, c = 2, 2000, 2  # exceeds the int32 chunk, exercises chunking
    A = [[int(rng.integers(0, 2**62)) ** 2 % ring.modulus for _ in range(k)] for _ in range(r)]
    B = [[int(rng.integers(0, 2**62)) ** 2 % ring.modulus for _ in range(c)] for _ in range(k)]
    got = ring.to_ints(ring.matmul(ring.from_ints(A), ring.from_ints(B)))
    for i in range(r):
        for j in range(c):
            want = sum(A[i][t] * B[t][j] for t in range(k)) % ring.modulus
            assert int(got[i][j]) == want


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_sum(ring, rng):
    n = 50
    a = _rand_ints(rng, ring, n)
    got = ring.to_ints(ring.sum(ring.from_ints(a), axis=0))
    assert int(got) == sum(a) % ring.modulus


def test_bits_and_trunc(rng):
    ring = R.LElem2N256
    vals = [int(rng.integers(0, 2**63)) ** 4 % ring.modulus for _ in range(7)]
    d = ring.from_ints(vals)
    nbits = 256
    bits = np.asarray(ring.bits_msb_first(d, nbits))
    for i, v in enumerate(vals):
        want = [(v >> (nbits - 1 - j)) & 1 for j in range(nbits)]
        assert list(bits[i]) == want
    for m in (1, 8, 30, 61, 255):
        got = ring.to_ints(ring.trunc_low(d, m))
        assert [int(x) for x in got] == [v % (1 << m) for v in vals]


def test_fixed_point():
    ring = R.LElem256
    f = 30
    vals = [1.5, -2.25, 0.0, 1e-9, 123456.789, -0.5]
    d = ring.from_float(vals, f)
    back = ring.to_float(d, f)
    assert np.allclose(back, vals, atol=2.0 ** (-f + 1))


def test_inv_pow2():
    ring = R.LElem256
    x = ring.from_ints([12345])
    y = ring.mul(ring.mul_int(x, 1 << 20), ring.inv_pow2_digits(20))
    assert int(ring.to_ints(y)[0]) == 12345


def test_host_rand_canonical(rng):
    for ring in RINGS:
        x = ring.rand(rng, (100,))
        assert x.dtype == np.int32
        assert (x >= 0).all() and (x <= 255).all()
        vals = ring.to_ints(x)
        assert all(0 <= int(v) < ring.modulus for v in vals)
        xb = ring.rand_bits(rng, (50,), 40)
        vb = ring.to_ints(xb)
        assert all(0 <= int(v) < 2**40 for v in vb)


def test_small_field(rng):
    F = R.SElem
    p = F.modulus
    a = F.rand(rng, (20,))
    b = F.rand(rng, (20,))
    assert (np.asarray(F.mul(a, b)) == (a.astype(np.int64) * b) % p).all()
    A = F.rand(rng, (3, 4))
    B = F.rand(rng, (4, 5))
    got = np.asarray(F.matmul(A, B))
    want = (A.astype(np.int64) @ B.astype(np.int64)) % p
    assert (got == want).all()
