"""Double-double embedding exactness + PRG determinism."""

import numpy as np

from sfgwas_tpu.crypto.encoding import Encoder
from sfgwas_tpu.crypto.params import get_params
from sfgwas_tpu.mpc.prg import Random
from sfgwas_tpu.utils import ddfloat as DD


def test_dd_embed_roundtrip_big_values(rng):
    params = get_params("TEST8")
    enc = Encoder(params)
    slots = params.slots
    # values up to ~2^95 (the SS<->HE conversion mask range)
    vals = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**32)) for _ in range(slots)]
    vals = [v - 2**94 for v in vals]
    scale = float(params.scale) / (1 << 30)
    coeffs = DD.dd_embed_inv(enc, vals, scale)
    back = DD.dd_embed(enc, coeffs, scale)
    err = max(abs(a - b) for a, b in zip(back, vals))
    assert err <= 2, err  # sub-fixed-point-unit exactness


def test_dd_linear_homomorphism(rng):
    params = get_params("TEST8")
    enc = Encoder(params)
    slots = params.slots
    a = [int(rng.integers(0, 2**60)) * int(rng.integers(1, 2**20)) for _ in range(slots)]
    b = [int(rng.integers(0, 2**60)) * int(rng.integers(1, 2**20)) for _ in range(slots)]
    scale = float(params.scale)
    ca = DD.dd_embed_inv(enc, a, scale)
    cb = DD.dd_embed_inv(enc, b, scale)
    csum = [x + y for x, y in zip(ca, cb)]
    back = DD.dd_embed(enc, csum, scale)
    err = max(abs(g - (x + y)) for g, x, y in zip(back, a, b))
    assert err <= 2, err


def test_prg_pairwise_determinism():
    r1 = Random(1, 3)
    r2 = Random(2, 3)
    with r1.using(2) as g1, r2.using(1) as g2:
        a = g1.integers(0, 2**62, size=16)
        b = g2.integers(0, 2**62, size=16)
    assert (a == b).all()
    # global stream identical across all parties
    r0 = Random(0, 3)
    draws = []
    for r in (r0, r1, r2):
        with r.using(-1) as g:
            draws.append(g.integers(0, 2**62, size=8))
    assert (draws[0] == draws[1]).all() and (draws[1] == draws[2]).all()
    # forked tables stay in lockstep
    f1 = r1.fork(5)
    f2 = r2.fork(5)
    with f1.using(2) as g1, f2.using(1) as g2:
        assert (g1.integers(0, 100, 8) == g2.integers(0, 100, 8)).all()
