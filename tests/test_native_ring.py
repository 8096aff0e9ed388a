"""Native C++ limb engine (native/ring.cpp) vs the numpy digit oracle.

The native kernels must be bit-identical to the host numpy path of
ops/ring.py for every ring and operation: the protocol layer treats them as
interchangeable implementations of the same canonical digit format
(reference semantics: mpc-core RElem/RVec arithmetic used by mpc/mpc.go)."""

import numpy as np
import pytest

from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.ops import native_ring

RINGS = [R.LElem256, R.LElem128, R.LElem2N256, R.LElem2N127]

pytestmark = pytest.mark.skipif(
    native_ring.lib() is None, reason="native ring library unavailable"
)


def _oracle(ring, fn, *args):
    """Run fn with the native library masked off."""
    saved = ring._nlib
    ring._nlib = None
    try:
        return fn(*args)
    finally:
        ring._nlib = saved


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_elementwise_matches_numpy(ring):
    rng = np.random.default_rng(7)
    a = ring.rand(rng, (257,))
    b = ring.rand(rng, (257,))
    # force edge values
    a[0] = ring.const_np(0)
    b[0] = ring.const_np(0)
    a[1] = ring.from_ints([ring.modulus - 1])[0]
    b[1] = ring.from_ints([ring.modulus - 1])[0]
    for name in ("add", "sub", "mul"):
        got = getattr(ring, name)(a, b)
        exp = _oracle(ring, getattr(ring, name), a, b)
        np.testing.assert_array_equal(got, exp, err_msg=f"{ring.name}.{name}")
    np.testing.assert_array_equal(ring.neg(a), _oracle(ring, ring.neg, a))


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_reduce64_matches_numpy(ring):
    rng = np.random.default_rng(8)
    L = ring.nlimb
    for nd in (1, 3, L, 2 * L - 1):
        x = rng.integers(-(2**60), 2**60, size=(64, nd))
        got = ring.np_reduce(x)
        exp = _oracle(ring, ring.np_reduce, x)
        np.testing.assert_array_equal(got, exp, err_msg=f"{ring.name} nd={nd}")


@pytest.mark.parametrize("ring", RINGS, ids=lambda r: r.name)
def test_dot_and_matmul_match_numpy(ring):
    rng = np.random.default_rng(9)
    k = 33
    A = ring.rand(rng, (21, k))
    C = ring.rand(rng, (k,))
    got = ring.dot_coeffs(A, C)
    exp = _oracle(ring, ring.dot_coeffs, A, C)
    np.testing.assert_array_equal(got, exp)

    Am = ring.rand(rng, (9, 17))
    Bm = ring.rand(rng, (17, 5))
    got = ring.matmul(Am, Bm)
    exp = _oracle(ring, ring.matmul, Am, Bm)
    np.testing.assert_array_equal(got, exp)


def test_rand_stream_unchanged():
    """ring.rand must consume the PRG stream exactly as the numpy path
    (mask reproducibility across dealer and parties depends on it)."""
    for ring in RINGS:
        g1 = np.random.default_rng(123)
        g2 = np.random.default_rng(123)
        got = ring.rand(g1, (50,))
        exp = _oracle(ring, ring.rand, g2, (50,))
        np.testing.assert_array_equal(got, exp, err_msg=ring.name)
        # stream positions advanced identically
        assert g1.integers(0, 2**63) == g2.integers(0, 2**63)
