"""Benchmark: the PRODUCTION encrypted matmult path on the real TPU chip.

Headline metric: modular multiply-accumulate throughput of
`gwas.matmult.mat_mult_cached` — the exact code path phase 2/3 executes
(hoisted baby rotations + fused Barrett-MAC chunks + batched giant-step
keyswitch) — on a PN14QP438-shaped workload: an 8-column encrypted Q
(1000 individuals) times a 1000 x 4546 int8 genotype block, the reference
example_data per-chromosome shape (config/configGlobal.toml:19-21).

Baseline: the reference-equivalent lazy-accumulate MAC loop on the host CPU
with numpy uint64 vectorized arithmetic (standing in for the Go uint128
kernel, gwas/matmult.go:247-324; Go toolchain unavailable — BASELINE.md).

Robustness (round-5 redesign): each measurement attempt runs in a FRESH
subprocess.  A failed attempt (device OOM, degraded remote compiler
rejecting big fused programs) cannot poison the retry — the round-4
in-process fallback OOM'd because the first attempt's device buffers were
still resident.  Attempt ladder:
  1. full fused kernels (fast path);
  2. split kernels + butterfly NTT (degraded-compiler mode);
  3. same, CPU backend (prints a number even with no usable chip).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def production_matmult_throughput():
    import jax

    from sfgwas_tpu.crypto import basics as B
    from sfgwas_tpu.crypto import ckks as C
    from sfgwas_tpu.crypto.params import get_params
    from sfgwas_tpu.gwas import matmult as MM
    from sfgwas_tpu.mpc.mhe import CryptoParams

    params = get_params("PN14QP438")
    ctx = C.CkksContext(params)
    rng = np.random.default_rng(0)
    sk = ctx.gen_secret_key(rng)
    pk = ctx.gen_public_key(sk, rng)
    cps = CryptoParams(ctx, sk, pk, None, {}, rng)

    # genotype block: one chromosome of the reference example workload
    n_ind, n_snp = 1000, 4546
    geno = rng.integers(0, 3, size=(n_ind, n_snp), dtype=np.int8)
    nmod = MM.mm_nmod(cps)
    cache = MM.preprocess_matrix(cps, geno, nmod)

    # rotation keys for exactly the shifts the plan needs (local batched
    # keygen, sliced to the matmult band and device-resident — the
    # collective protocol produces the same key shapes)
    d = cache[0][0].d
    shifts = set()
    for row in cache:
        for blk in row:
            if blk.polys is None:
                continue
            shifts.update(int(b) for b in blk.babies)
            shifts.update((int(g) * d) % params.slots for g in blk.giants)
    shifts.discard(0)
    gels = sorted({ctx.galois_for_rotation(s) for s in shifts})
    cps.rot_keys.update(
        ctx.gen_rot_keys_batched(sk, gels, rng, key_nmod=params.mm_nmod)
    )

    ncols = 8  # [1s | 5 covs | +2] combined-Q column count
    Q = [
        B.encrypt_float_vector(cps, rng.normal(size=n_ind))
        for _ in range(ncols)
    ]
    Q = [[ctx.drop_to(cv[0], nmod)] for cv in Q]

    out = MM.mat_mult_cached(cps, Q, cache)  # compile + stage
    jax.block_until_ready(out[0][0].c0)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = MM.mat_mult_cached(cps, Q, cache)
    jax.block_until_ready(out[0][0].c0)
    dt = (time.time() - t0) / iters

    k_total = sum(
        len(blk.giants) for row in cache for blk in row if blk.polys is not None
    )
    macs = 2 * ncols * k_total * nmod * ctx.n  # c0+c1 per column per diagonal
    return macs / dt, k_total, dt


def cpu_baseline_throughput(k_total, nmod, n):
    """Reference-equivalent lazy-accumulate MACs on the host CPU: uint64
    products accumulated without modular reduction (the Go kernel's
    structure, vectorized by numpy), same diagonal count as the production
    workload."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 25, size=(2, nmod, n), dtype=np.uint64)
    k_slice = min(k_total, 256)  # subsample diagonals; scale the time
    dmat = rng.integers(0, 1 << 25, size=(k_slice, nmod, n), dtype=np.uint64)
    acc = np.zeros((2, nmod, n), dtype=np.uint64)
    t0 = time.time()
    for k in range(k_slice):
        acc += a * dmat[k]
    dt = (time.time() - t0) * (k_total / k_slice)
    macs = 2 * k_total * nmod * n
    return macs / dt


def measure_and_print():
    """Child-process entry: one measurement attempt, one JSON line."""
    tpu_rate, k_total, dt = production_matmult_throughput()
    cpu_rate = cpu_baseline_throughput(k_total, 7, 1 << 14)
    print(
        json.dumps(
            {
                "metric": "production_bsgs_matmult_throughput",
                "value": round(tpu_rate / 1e9, 3),
                "unit": "GMAC/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
                "detail": {
                    "block": "1000x4546 int8, 8 enc columns, PN14QP438",
                    "diagonals": k_total,
                    "secs_per_block_mult": round(dt, 3),
                },
            }
        ),
        flush=True,
    )


_ATTEMPTS = [
    # (mode label, extra env) — ordered by measured round-5 throughput
    # fused rotation kernels + butterfly NTT: 6.016 GMAC/s (r5, = best r3)
    ("fused_bfly", {"SFGWAS_NTT4": "0"}),
    # fused + chunked four-step MXU NTT: 5.63 GMAC/s.  Unchunked, the MXU
    # NTT materialized [nmod*giants, 128, 128]-factored ~1.7 GB temps in
    # the fused epilogue and the compiler's remat OOM'd (BENCH_r04)
    ("fused", {}),
    # degraded remote compiler (axon AOT helper rejecting big fused
    # programs, round 4): split rotation kernels + butterfly NTT stay
    # under the compiler's size threshold (dispatch-bound: ~4.1 GMAC/s)
    ("degraded", {"SFGWAS_NTT4": "0", "SFGWAS_SPLIT_BIG_KERNELS": "1"}),
    # last resort: measure on the CPU backend so a number always prints
    (
        "cpu",
        {
            "SFGWAS_NTT4": "0",
            "SFGWAS_SPLIT_BIG_KERNELS": "1",
            "JAX_PLATFORMS": "cpu",
        },
    ),
]


def main():
    if "--measure" in sys.argv:
        measure_and_print()
        return

    last_err = ""
    for mode, extra in _ATTEMPTS:
        env = dict(os.environ, **extra)
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                capture_output=True,
                text=True,
                timeout=1800,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            last_err = f"{mode}: timeout"
            continue
        line = next(
            (
                ln
                for ln in reversed(res.stdout.splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if res.returncode == 0 and line:
            rec = json.loads(line)
            rec.setdefault("detail", {})["mode"] = mode
            rec["detail"]["degraded_compiler_fallback"] = mode != "fused"
            print(json.dumps(rec))
            return
        last_err = f"{mode}: rc={res.returncode} {res.stderr.strip()[-400:]}"

    print(
        json.dumps(
            {
                "metric": "production_bsgs_matmult_throughput",
                "value": 0.0,
                "unit": "GMAC/s",
                "vs_baseline": 0.0,
                "detail": {"error": last_err[:500]},
            }
        )
    )


if __name__ == "__main__":
    main()
