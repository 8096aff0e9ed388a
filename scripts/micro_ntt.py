"""Microbench: batched NTT variants at the PN14 moddown batch shape.

Compares the staged jnp butterfly (rns._ntt_b_butterfly), the chunked
four-step MXU formulation (ntt4.ntt4_b) and the fused-VMEM Pallas kernel
(pallas_ntt.ntt_pallas_b) on the current backend, at the shape that
dominates the production matmult's keyswitch ladders
([next=8, B=728, N=16384]; BASELINE.md roofline).

Usage: python scripts/micro_ntt.py [B]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from sfgwas_tpu.crypto.params import get_params  # noqa: E402
from sfgwas_tpu.ops import rns  # noqa: E402


def bench(tag, fn, x, iters=5):
    try:
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        coeffs = x.size
        print(f"{tag}: {dt*1e3:.2f} ms  ({coeffs/dt/1e9:.2f} Gcoeff/s)")
        return np.asarray(out)
    except Exception as e:  # noqa
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 728
    params = get_params("PN14QP438")
    basis = rns.RnsBasis(params.q_primes, params.logn)
    L = 8
    rows = tuple(range(L))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.stack(
            [
                rng.integers(0, basis.primes[r], size=(B, basis.n), dtype=np.int64)
                for r in rows
            ]
        ).astype(np.uint32)
    )
    print(f"backend={jax.default_backend()} shape=[{L}, {B}, {basis.n}]")

    ref = bench(
        "butterfly (jnp staged)",
        lambda v: rns._ntt_b_butterfly(v, basis, rows, False),
        x,
    )

    from sfgwas_tpu.ops import ntt4

    out4 = bench(
        "four-step MXU (chunked)",
        lambda v: ntt4.ntt4_b(v, basis, rows, False),
        x,
    )
    if ref is not None and out4 is not None:
        print("  four-step bit-exact:", np.array_equal(ref, out4))

    from sfgwas_tpu.ops import pallas_ntt

    outp = bench(
        "pallas fused-VMEM",
        lambda v: pallas_ntt.ntt_pallas_b(v, basis, rows, False),
        x,
    )
    if ref is not None and outp is not None:
        print("  pallas bit-exact:", np.array_equal(ref, outp))

    # inverse direction (the moddown's first step)
    bench(
        "butterfly inverse",
        lambda v: rns._ntt_b_butterfly(v, basis, rows, True),
        x,
    )
    bench(
        "pallas inverse",
        lambda v: pallas_ntt.ntt_pallas_b(v, basis, rows, True),
        x,
    )


if __name__ == "__main__":
    main()
