"""Benchmark: the encrypted-matmult inner kernel on the real TPU chip.

Headline metric: modular coefficient multiply-accumulate throughput of the
BSGS cipher x plaintext accumulation loop (NTT-domain Barrett products +
lazy-sum reduction) -- the direct analogue of the reference's hot loop
(MulCoeffsAndAdd128, gwas/matmult.go:247-324).

Baseline: the same operation's CPU-host throughput measured with numpy
uint64 lazy MACs, standing in for the reference's 8-way-unrolled Go uint128
kernel (the Go toolchain + module cache are unavailable in this image; numpy
vectorized uint64 is, if anything, a *generous* stand-in for the Go loop --
see BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def tpu_mac_throughput():
    import jax
    import jax.numpy as jnp

    from sfgwas_tpu.ops import rns

    logn, nmod, K = 14, 17, 91  # PN14-equivalent level count, one giant group
    primes = rns.gen_primes(nmod, logn, 25)
    basis = rns.RnsBasis(primes, logn)
    n = 1 << logn
    rows = tuple(range(nmod))
    t = rns._sel(basis, rows)
    rng = np.random.default_rng(0)

    def rand(shape):
        out = np.zeros(shape + (n,), dtype=np.uint32)
        flat = out.reshape(-1, n)
        for i in range(flat.shape[0]):
            flat[i] = rng.integers(0, primes[i % nmod], size=n, dtype=np.int64)
        return out

    a = jnp.asarray(rand((2, nmod)))  # ciphertext (c0, c1)
    diags = jnp.asarray(rand((K, nmod)))
    q = jnp.asarray(t["q"])
    mu = jnp.asarray(t["mu"])
    m32 = jnp.asarray(
        np.array([(1 << 32) // p for p in primes], dtype=np.uint32)
    )[:, None]

    @jax.jit
    def kernel(a, diags):
        # both ciphertext components against every diagonal + lazy reduce
        prod = rns.mul_mod_barrett(a[:, None], diags[None], q[None, None], mu[None, None])
        acc = jnp.sum(prod, axis=1, dtype=jnp.uint32)

        def red(x):
            qhat = rns._mulhi32(x, m32)
            r = x - qhat * q
            r = jnp.where(r >= q, r - q, r)
            return jnp.where(r >= q, r - q, r)

        return red(acc)

    out = kernel(a, diags)
    out.block_until_ready()
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = kernel(a, diags)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    macs = 2 * K * nmod * n  # modular multiply-accumulates per call
    return macs / dt


def cpu_baseline_throughput():
    """Reference-equivalent lazy-accumulate MACs on the host CPU: uint64
    products accumulated without modular reduction (the Go kernel's
    structure, vectorized by numpy)."""
    n = 1 << 14
    nmod, K = 17, 91
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 25, size=(2, nmod, n), dtype=np.uint64)
    d = rng.integers(0, 1 << 25, size=(K, nmod, n), dtype=np.uint64)
    acc = np.zeros((2, nmod, n), dtype=np.uint64)
    t0 = time.time()
    reps = 2
    for _ in range(reps):
        for k in range(K):
            acc += a * d[k]
    dt = (time.time() - t0) / reps
    macs = 2 * K * nmod * n
    return macs / dt


def main():
    tpu_rate = tpu_mac_throughput()
    cpu_rate = cpu_baseline_throughput()
    print(
        json.dumps(
            {
                "metric": "bsgs_modmac_throughput",
                "value": round(tpu_rate / 1e9, 3),
                "unit": "GMAC/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
