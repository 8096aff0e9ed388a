"""Four-step MXU NTT: bit-exact equivalence with the butterfly NTT."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfgwas_tpu.ops import rns
from sfgwas_tpu.ops.ntt4 import ntt4


@pytest.mark.parametrize("logn,nmod", [(8, 5), (12, 6), (13, 4)])
def test_ntt4_matches_butterfly(logn, nmod, rng):
    primes = rns.gen_primes(nmod, logn, 25)
    basis = rns.RnsBasis(primes, logn)
    n = 1 << logn
    rows = tuple(range(nmod))
    x = jnp.asarray(
        np.stack(
            [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(nmod)]
        ).astype(np.uint32)
    )
    ref = np.asarray(rns.ntt(x, basis, rows))
    got = np.asarray(ntt4(x, basis, rows))
    assert np.array_equal(ref, got)
    back = np.asarray(ntt4(jnp.asarray(ref), basis, rows, inverse=True))
    assert np.array_equal(back, np.asarray(x))


def test_ntt4_pointwise_convolution(rng):
    """fwd -> pointwise -> inv equals negacyclic polynomial product."""
    logn, nmod = 8, 3
    primes = rns.gen_primes(nmod, logn, 25)
    basis = rns.RnsBasis(primes, logn)
    n = 1 << logn
    rows = tuple(range(nmod))
    t = rns._sel(basis, rows)
    a = np.stack(
        [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(nmod)]
    ).astype(np.uint32)
    b = np.stack(
        [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(nmod)]
    ).astype(np.uint32)
    fa = ntt4(jnp.asarray(a), basis, rows)
    fb = ntt4(jnp.asarray(b), basis, rows)
    prod = rns.mul_mod_barrett(fa, fb, jnp.asarray(t["q"]), jnp.asarray(t["mu"]))
    got = np.asarray(ntt4(prod, basis, rows, inverse=True))
    # negacyclic schoolbook oracle
    for i, q in enumerate(primes):
        ref = np.zeros(n, dtype=object)
        av, bv = a[i].astype(object), b[i].astype(object)
        for j in range(n):
            for k in range(n):
                idx = (j + k) % n
                s = av[j] * bv[k]
                ref[idx] = (ref[idx] + (s if j + k < n else -s)) % q
        assert np.array_equal(got[i].astype(object), ref % q)


def test_ntt4_b_matches_butterfly_batched(rng):
    """Batched four-step vs batched butterfly, fwd and inv (dispatch layer)."""
    logn, nmod, B = 9, 4, 5
    primes = rns.gen_primes(nmod, logn, 25)
    basis = rns.RnsBasis(primes, logn)
    n = 1 << logn
    rows = tuple(range(nmod))
    x = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.integers(0, primes[i], n, dtype=np.int64)
                        for _ in range(B)
                    ]
                )
                for i in range(nmod)
            ]
        ).astype(np.uint32)
    )
    from sfgwas_tpu.ops.ntt4 import ntt4_b

    ref = np.asarray(rns._ntt_b_butterfly(x, basis, rows))
    got = np.asarray(ntt4_b(x, basis, rows))
    assert np.array_equal(ref, got)
    back = np.asarray(ntt4_b(jnp.asarray(ref), basis, rows, inverse=True))
    assert np.array_equal(back, np.asarray(x))


def test_ntt_dispatch_flag(monkeypatch):
    """SFGWAS_NTT4=1 routes rns.ntt/ntt_b through the four-step path with
    bit-identical results; n < 256 always stays on the butterfly."""
    rng = np.random.default_rng(7)
    logn, nmod = 9, 3
    primes = rns.gen_primes(nmod, logn, 25)
    basis = rns.RnsBasis(primes, logn)
    n = 1 << logn
    rows = tuple(range(nmod))
    x = jnp.asarray(
        np.stack(
            [rng.integers(0, primes[i], n, dtype=np.int64) for i in range(nmod)]
        ).astype(np.uint32)
    )
    ref = np.asarray(rns._ntt_butterfly(x, basis, rows))
    monkeypatch.setattr(rns, "_NTT4", True)
    got = np.asarray(rns.ntt(x, basis, rows))
    assert np.array_equal(ref, got)
    gotb = np.asarray(rns.ntt_b(x[:, None, :], basis, rows))[:, 0]
    assert np.array_equal(ref, gotb)
    monkeypatch.setattr(rns, "_NTT4", False)
    got_off = np.asarray(rns.ntt(x, basis, rows))
    assert np.array_equal(ref, got_off)
