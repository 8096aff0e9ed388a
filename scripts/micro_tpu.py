"""Microbenchmark the BSGS matmult's primitive ops on the chip.

Attributes the fused-stage time (hoisted 0.7s / mac 0.6s / epilogue 0.6s at
PN14, round-5 measurement) to: u32 Barrett multiply, dynamic-index gather
(Galois permutation), static-constant gather, segment_sum scatter, and the
butterfly NTT — so optimization effort lands on the real bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=10, warm=2):
    import jax

    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from sfgwas_tpu.crypto.params import get_params
    from sfgwas_tpu.ops import rns

    params = get_params("PN14QP438")
    basis = params.basis
    n = params.n
    nmod = 7
    rows = tuple(range(nmod))
    t = rns._sel(basis, rows)
    q, mu = t["q"], t["mu"]
    rng = np.random.default_rng(0)

    s, B = 8, 91
    X = jnp.asarray(
        rng.integers(0, 1 << 25, size=(B, s, nmod, n), dtype=np.int64).astype(
            np.uint32
        )
    )
    Y = jnp.asarray(
        rng.integers(0, 1 << 25, size=(B, 1, nmod, n), dtype=np.int64).astype(
            np.uint32
        )
    )
    gb = 4 * X.size / 1e9

    f = jax.jit(lambda a, b: rns.mul_mod_barrett(a, b, q, mu))
    dt = bench(f, X, Y)
    print(f"barrett_mul [{B},{s},{nmod},{n}]: {dt*1e3:.1f} ms "
          f"({X.size/dt/1e9:.1f} Gmul/s, {3*gb/dt:.0f} GB/s eff)")

    f2 = jax.jit(lambda a, b: (a * b) % q)
    dt = bench(f2, X, Y)
    print(f"naive u32 mul+mod: {dt*1e3:.1f} ms ({X.size/dt/1e9:.1f} Gmul/s)")

    f3 = jax.jit(lambda a, b: a * b)
    dt = bench(f3, X, Y)
    print(f"u32 mul only: {dt*1e3:.1f} ms ({X.size/dt/1e9:.1f} Gmul/s)")

    f3f = jax.jit(lambda a, b: a.astype(jnp.float32) * b.astype(jnp.float32))
    dt = bench(f3f, X, Y)
    print(f"f32 mul (w/ casts): {dt*1e3:.1f} ms ({X.size/dt/1e9:.1f} Gmul/s)")

    f4 = jax.jit(lambda a, b: a + b)
    dt = bench(f4, X, Y)
    print(f"u32 add only: {dt*1e3:.1f} ms ({X.size/dt/1e9:.1f} Gmul/s, "
          f"{3*gb/dt:.0f} GB/s)")

    # dynamic-index gather (Galois permutation as a traced array)
    perms = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(B)]).astype(np.int32)
    )
    C = jnp.asarray(
        rng.integers(0, 1 << 25, size=(s, nmod, n), dtype=np.int64).astype(
            np.uint32
        )
    )

    @jax.jit
    def gather_dyn(c, p):
        return jnp.take_along_axis(
            jnp.broadcast_to(c[None], (B,) + c.shape), p[:, None, None, :], axis=-1
        )

    dt = bench(gather_dyn, C, perms)
    out_gb = 4 * B * s * nmod * n / 1e9
    print(f"perm gather dynamic [{B}x{s}x{nmod}x{n}]: {dt*1e3:.1f} ms "
          f"({out_gb/dt:.0f} GB/s out)")

    # same gather with the permutation baked in as a compile-time constant
    perms_const = np.asarray(perms)

    @jax.jit
    def gather_const(c):
        p = jnp.asarray(perms_const)  # constant-folded
        return jnp.take_along_axis(
            jnp.broadcast_to(c[None], (B,) + c.shape), p[:, None, None, :], axis=-1
        )

    dt = bench(gather_const, C)
    print(f"perm gather const: {dt*1e3:.1f} ms ({out_gb/dt:.0f} GB/s out)")

    # segment_sum over the diagonal axis (MAC scatter)
    seg = jnp.asarray(np.sort(rng.integers(0, 62, size=B)).astype(np.int32))

    @jax.jit
    def segsum(x):
        return jax.ops.segment_sum(x, seg, num_segments=62)

    dt = bench(segsum, X)
    print(f"segment_sum [{B}->62]: {dt*1e3:.1f} ms ({gb/dt:.0f} GB/s in)")

    # butterfly NTT throughput at the keyswitch batch size
    P = jnp.asarray(
        rng.integers(0, 1 << 25, size=(s * (nmod + 1), n), dtype=np.int64).astype(
            np.uint32
        )
    )
    rows8 = tuple(range(nmod)) + (params.nq,)

    f5 = jax.jit(lambda x: rns.ntt_b(x.reshape(s, nmod + 1, n), basis, rows8))
    dt = bench(f5, P)
    print(f"ntt_b [{s},{nmod+1},{n}]: {dt*1e3:.1f} ms "
          f"({s*(nmod+1)*n/dt/1e6:.0f} Mcoeff/s)")


if __name__ == "__main__":
    main()
