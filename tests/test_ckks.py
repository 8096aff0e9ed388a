"""CKKS scheme tests against plaintext oracles (small insecure preset)."""

import numpy as np
import pytest

from sfgwas_tpu.crypto import ckks as C
from sfgwas_tpu.crypto.params import get_params
from sfgwas_tpu.ops import rns


@pytest.fixture(scope="module")
def ctx():
    return C.CkksContext(get_params("TEST8"))


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(42)
    sk = ctx.gen_secret_key(rng)
    pk = ctx.gen_public_key(sk, rng)
    rlk = ctx.gen_relin_key(sk, rng)
    rot = {}
    for k in (1, 2, ctx.params.slots - 1):
        g = ctx.galois_for_rotation(k)
        rot[g] = ctx.gen_rot_key(sk, g, rng)
    gconj = ctx.galois_conjugate()
    rot[gconj] = ctx.gen_rot_key(sk, gconj, rng)
    return sk, pk, rlk, rot


def test_ntt_roundtrip_and_conv(rng):
    basis = get_params("TEST8").basis
    n = basis.n
    rows = (0, 1, 4)
    x = np.stack(
        [rng.integers(0, basis.primes[r], size=n, dtype=np.int64) for r in rows]
    ).astype(np.uint32)
    import jax.numpy as jnp

    xj = jnp.asarray(x)
    y = rns.ntt(xj, basis, rows)
    back = rns.ntt(y, basis, rows, inverse=True)
    assert (np.asarray(back) == x).all()

    # negacyclic convolution via pointwise NTT product vs schoolbook
    a = rng.integers(0, 100, size=n, dtype=np.int64)
    b = rng.integers(0, 100, size=n, dtype=np.int64)
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                want[k] += int(a[i]) * int(b[j])
            else:
                want[k - n] -= int(a[i]) * int(b[j])
    for ri, r in enumerate(rows):
        q = basis.primes[r]
        na = rns.ntt(jnp.asarray(np.mod(a, q).astype(np.uint32))[None], basis, (r,))
        nb = rns.ntt(jnp.asarray(np.mod(b, q).astype(np.uint32))[None], basis, (r,))
        prod = rns.mul_mod_barrett(na, nb, basis.q[r : r + 1], basis.mu[r : r + 1])
        got = np.asarray(rns.ntt(prod, basis, (r,), inverse=True))[0]
        assert (got == np.array([int(w) % q for w in want], dtype=np.uint32)).all()


def test_encoder_roundtrip(ctx, rng):
    slots = ctx.params.slots
    v = rng.normal(size=slots)
    pt = ctx.encode(v, ctx.params.base_nmod + 2)
    got = ctx.decode(pt)
    assert np.allclose(got[:slots], v, atol=1e-8)


def test_encrypt_decrypt(ctx, keys, rng):
    sk, pk, rlk, rot = keys
    v = rng.normal(size=ctx.params.slots)
    ct = ctx.encrypt(ctx.encode(v, ctx.nq), pk, rng)
    got = ctx.decode(ctx.decrypt(ct, sk))
    assert np.allclose(got, v, atol=1e-5)


def test_add_sub_mul(ctx, keys, rng):
    sk, pk, rlk, rot = keys
    a = rng.normal(size=ctx.params.slots)
    b = rng.normal(size=ctx.params.slots)
    ca = ctx.encrypt(ctx.encode(a, ctx.nq), pk, rng)
    cb = ctx.encrypt(ctx.encode(b, ctx.nq), pk, rng)
    assert np.allclose(ctx.decode(ctx.decrypt(ctx.add(ca, cb), sk)), a + b, atol=1e-5)
    assert np.allclose(ctx.decode(ctx.decrypt(ctx.sub(ca, cb), sk)), a - b, atol=1e-5)

    prod = ctx.mul_relin(ca, cb, rlk)
    prod = ctx.rescale(prod)
    got = ctx.decode(ctx.decrypt(prod, sk))
    assert np.allclose(got, a * b, atol=1e-4), np.abs(got - a * b).max()

    # plaintext mult
    pb = ctx.encode(b, ctx.nq)
    prod2 = ctx.rescale(ctx.mul_plain(ca, pb))
    got2 = ctx.decode(ctx.decrypt(prod2, sk))
    assert np.allclose(got2, a * b, atol=1e-4)


def test_mul_const_and_add_const(ctx, keys, rng):
    sk, pk, rlk, rot = keys
    a = rng.normal(size=ctx.params.slots)
    ca = ctx.encrypt(ctx.encode(a, ctx.nq), pk, rng)
    got = ctx.decode(ctx.decrypt(ctx.rescale(ctx.mul_const(ca, 2.5)), sk))
    assert np.allclose(got, 2.5 * a, atol=1e-4)
    got = ctx.decode(ctx.decrypt(ctx.add_const(ca, 1.25), sk))
    assert np.allclose(got, a + 1.25, atol=1e-5)
    got = ctx.decode(ctx.decrypt(ctx.mul_const_int(ca, -3), sk))
    assert np.allclose(got, -3 * a, atol=1e-4)


def test_rotation_and_conjugate(ctx, keys, rng):
    sk, pk, rlk, rot = keys
    slots = ctx.params.slots
    a = rng.normal(size=slots)
    ca = ctx.encrypt(ctx.encode(a, ctx.nq), pk, rng)
    for k in (1, 2, slots - 1):
        got = ctx.decode(ctx.decrypt(ctx.rotate(ca, k, rot), sk))
        want = np.roll(a, -k)  # left rotation by k
        assert np.allclose(got, want, atol=1e-4), k
    got = ctx.decode(ctx.decrypt(ctx.conjugate(ca, rot), sk))
    assert np.allclose(got, a, atol=1e-4)  # real data: conj is identity


def test_depth_chain(ctx, keys, rng):
    """Multiply down several levels; error stays small."""
    sk, pk, rlk, rot = keys
    a = rng.uniform(0.5, 1.5, size=ctx.params.slots)
    ct = ctx.encrypt(ctx.encode(a, ctx.nq), pk, rng)
    want = a.copy()
    for _ in range(ctx.params.max_level() - 1):
        ct = ctx.rescale(ctx.mul_relin(ct, ct, rlk))
        want = want * want
        got = ctx.decode(ctx.decrypt(ct, sk))
        assert np.allclose(got, want, rtol=1e-3), np.abs(got - want).max()


def test_add_plain_aligns_drifted_scale(ctx, keys, rng):
    """add_plain must align scales like ct+ct adds do: a ciphertext whose
    scale drifted through a rescale (TEST8 pairs sit ~0.5% off the preset
    scale; PN14's up to 1.9%) plus a preset-scale plaintext must decode to
    a+b, not a + b*(preset/drifted) -- the round-4 ynew DC-bias regression
    (y entered the statistic multiplied by ~1.0247)."""
    sk, pk, rlk, rot = keys
    a = rng.normal(size=ctx.params.slots)
    b = rng.normal(size=ctx.params.slots)
    ca = ctx.encrypt(ctx.encode(a, ctx.nq), pk, rng)
    # force a PN14-sized drift: encode the 1.0 multiplier 2% off the
    # preset scale, rescale -- ca's (exactly tracked) scale is now ~2%
    # below the preset, like the ynew projection after two PN14 rescales
    ca = ctx.rescale(ctx.mul_const(ca, 1.0, ctx.params.scale * 1.02))
    drift = abs(ca.scale / ctx.params.scale - 1)
    assert drift > ctx._SCALE_EQ, (
        f"fixture no longer drifts (drift={drift:.2e}); pick another chain"
    )
    pb = ctx.encode(b, ctx.nq, ctx.params.scale)
    got = ctx.decode(ctx.decrypt(ctx.add_plain(ca, pb), sk))
    err = np.abs(got - (a + b)).max()
    assert err < 1e-4, (
        f"add_plain misdecoded the plaintext by the scale ratio "
        f"(drift {drift:.2e}, err {err:.2e})"
    )


def test_crt_lift_centered_dev_matches_host(rng):
    """Device float-assisted basis extension vs the host big-int lift, on
    protocol-bounded inputs (|v| < Q/8, the collective-bootstrap mask
    bound).  Boundedness is what makes the f32 rounding exact."""
    import jax.numpy as jnp

    basis = get_params("TEST8").basis
    l, tgt = 4, 7
    primes = [int(basis.primes[r]) for r in range(l)]
    Q = 1
    for p in primes:
        Q *= p
    M = 1000
    vals = [int(rng.integers(0, 1 << 62)) % (Q // 4) - Q // 8 for _ in range(M)]
    x = np.stack([np.array([v % p for v in vals], np.uint32) for p in primes])
    want = rns.crt_lift_centered(
        x.astype(np.int64), primes, [int(basis.primes[r]) for r in range(tgt)]
    )
    got = np.asarray(
        rns.crt_lift_centered_dev(
            jnp.asarray(x), basis, tuple(range(l)), tuple(range(tgt))
        )
    )
    assert np.array_equal(want, got)
