"""Batched mask/mult kernels vs their per-ciphertext equivalents.

These ops are the round-5 cholQR/Gram hot path (one fused kernel per pass
instead of per-column shape-churning dispatches); each must agree with the
unbatched primitives it replaces."""

import numpy as np
import pytest

from sfgwas_tpu.crypto import basics as B
from sfgwas_tpu.crypto import ckks as C
from sfgwas_tpu.crypto.params import get_params
from sfgwas_tpu.mpc.mhe import CryptoParams

SLOTS = 128


@pytest.fixture(scope="module")
def cps():
    params = get_params("TEST8")
    ctx = C.CkksContext(params)
    rng = np.random.default_rng(7)
    sk = ctx.gen_secret_key(rng)
    pk = ctx.gen_public_key(sk, rng)
    rlk = ctx.gen_relin_key(sk, rng)
    cps = CryptoParams(ctx, sk, pk, rlk, {}, rng)
    gels = set()
    p = 1
    while p < SLOTS:
        gels.add(ctx.galois_for_rotation(p))
        p *= 2
    cps.rot_keys.update(ctx.gen_rot_keys_batched(sk, sorted(gels), rng))
    cps._test_sk = sk
    return cps


def _dec(cps, ct):
    pt = cps.ctx.decrypt(ct, cps._test_sk)
    return np.real(cps.ctx.decode(pt))[: cps.slots]


def test_cmult_pairs_matches_single(cps):
    rng = np.random.default_rng(1)
    xs_v = [rng.normal(size=SLOTS) for _ in range(4)]
    ys_v = [rng.normal(size=SLOTS) for _ in range(4)]
    xs = [B.encrypt_float_vector(cps, v)[0] for v in xs_v]
    ys = [B.encrypt_float_vector(cps, v)[0] for v in ys_v]
    got = B.cmult_pairs(cps, xs, ys)
    for e in range(4):
        single = cps.ctx.rescale(cps.ctx.mul_relin(xs[e], ys[e], cps.rlk))
        assert got[e].nmod == single.nmod
        assert abs(got[e].scale / single.scale - 1) < 1e-12
        assert np.allclose(_dec(cps, got[e]), _dec(cps, single), atol=1e-3)
        assert np.allclose(_dec(cps, got[e]), xs_v[e] * ys_v[e], atol=1e-2)


def test_expand_slots_many(cps):
    rng = np.random.default_rng(2)
    v = rng.normal(size=SLOTS)
    ct = B.encrypt_float_vector(cps, v)[0]
    idxs = [0, 3, 17, 101]
    outs = B.expand_slots_many(cps, ct, idxs)
    for e, idx in enumerate(idxs):
        dec = _dec(cps, outs[e])
        assert np.allclose(dec, v[idx], atol=1e-2), (idx, dec[:4], v[idx])


def test_mask_scatter_sum(cps):
    rng = np.random.default_rng(3)
    vals = rng.normal(size=5)
    cts = [
        B.encrypt_float_vector(cps, np.full(SLOTS, val))[0] for val in vals
    ]
    # entries 0..4 land at slots [e] and [e+37]; value folds a 0.5 scalar
    slot_lists = [[e, e + 37] for e in range(5)]
    (out,) = B.mask_scatter_sum(cps, cts, slot_lists, 1, value=0.5)
    dec = _dec(cps, out)
    want = np.zeros(SLOTS)
    for e in range(5):
        want[e] += 0.5 * vals[e]
        want[e + 37] += 0.5 * vals[e]
    assert np.allclose(dec, want, atol=1e-2)


def test_mask_scatter_sum_multi_ct_out(cps):
    rng = np.random.default_rng(4)
    vals = rng.normal(size=3)
    cts = [
        B.encrypt_float_vector(cps, np.full(SLOTS, val))[0] for val in vals
    ]
    # scatter across TWO packed output cts
    slot_lists = [[0], [SLOTS + 5], [3, SLOTS + 9]]
    o0, o1 = B.mask_scatter_sum(cps, cts, slot_lists, 2)
    d0, d1 = _dec(cps, o0), _dec(cps, o1)
    assert np.allclose(d0[0], vals[0], atol=1e-2)
    assert np.allclose(d0[3], vals[2], atol=1e-2)
    assert np.allclose(d1[5], vals[1], atol=1e-2)
    assert np.allclose(d1[9], vals[2], atol=1e-2)
    assert abs(d0[1]) < 1e-2 and abs(d1[0]) < 1e-2


def test_add_group_mod(cps):
    rng = np.random.default_rng(5)
    vs = [rng.normal(size=SLOTS) for _ in range(6)]
    cts = [B.encrypt_float_vector(cps, v)[0] for v in vs]
    groups = [0, 1, 0, 2, 1, 0]
    outs = B.add_group_mod(cps, cts, groups, 3)
    for g in range(3):
        want = sum(v for v, gg in zip(vs, groups) if gg == g)
        assert np.allclose(_dec(cps, outs[g]), want, atol=1e-2)
