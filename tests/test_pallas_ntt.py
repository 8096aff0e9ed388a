"""Pallas fused NTT vs the jnp reference implementation (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from sfgwas_tpu.ops import rns
from sfgwas_tpu.ops.pallas_ntt import ntt_pallas


def test_pallas_ntt_matches_reference(rng):
    import jax.numpy as jnp

    primes = rns.gen_primes(4, 8, 25)
    basis = rns.RnsBasis(primes, 8)
    rows = (0, 2, 3)
    x = np.stack(
        [rng.integers(0, basis.primes[r], size=basis.n, dtype=np.int64) for r in rows]
    ).astype(np.uint32)
    xj = jnp.asarray(x)
    want_f = np.asarray(rns.ntt(xj, basis, rows))
    got_f = np.asarray(ntt_pallas(xj, basis, rows, False, True))
    assert (want_f == got_f).all()
    want_i = np.asarray(rns.ntt(jnp.asarray(want_f), basis, rows, inverse=True))
    got_i = np.asarray(ntt_pallas(jnp.asarray(got_f), basis, rows, True, True))
    assert (want_i == got_i).all()
    assert (got_i == x).all()


def test_pallas_ntt_batched_roundtrip_interpret():
    import jax.numpy as jnp

    from sfgwas_tpu.ops.pallas_ntt import ntt_pallas_b

    primes = rns.gen_primes(4, 8, 25)
    basis = rns.RnsBasis(primes, 8)
    rows = (0, 1, 2)
    rng = np.random.default_rng(5)
    x = np.stack([
        rng.integers(0, basis.primes[r], size=(5, basis.n), dtype=np.int64)
        for r in rows
    ]).astype(np.uint32)
    xj = jnp.asarray(x)
    got_f = np.asarray(ntt_pallas_b(xj, basis, rows, False, True))
    want_f = np.asarray(rns._ntt_b_butterfly(xj, basis, rows, False))
    assert np.array_equal(got_f, want_f)
    back = np.asarray(ntt_pallas_b(jnp.asarray(got_f), basis, rows, True, True))
    assert np.array_equal(back, x)
