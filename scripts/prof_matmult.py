"""Chip-side timing breakdown of the production BSGS matmult (VERDICT #3).

Runs bench.py's workload with SFGWAS_MM_TIMING=1 and prints per-stage
times, plus a roofline estimate (HBM bytes touched vs measured time).

Usage: SFGWAS_NTT4=0 SFGWAS_SPLIT_BIG_KERNELS=1 python scripts/prof_matmult.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SFGWAS_MM_TIMING", "1")

import numpy as np


def main():
    import jax

    import bench

    tpu_rate, k_total, dt = bench.production_matmult_throughput()
    print(f"[prof_matmult] {tpu_rate/1e9:.2f} GMAC/s, {dt:.3f}s per mult")

    # roofline: bytes the mult must touch at least once
    from sfgwas_tpu.crypto.params import get_params

    params = get_params("PN14QP438")
    n = 1 << params.logn
    nmod = params.mm_nmod
    ncols = 8
    diag_bytes = k_total * nmod * n * 4       # encoded diagonals (read)
    acc_bytes = 62 * ncols * nmod * n * 4 * 2  # segment accumulators (rw)
    key_bytes = (91 + 61) * nmod * (nmod + 1) * n * 4 * 2
    total = diag_bytes + acc_bytes + key_bytes
    bw = 819e9  # v5e HBM
    print(
        f"[roofline] diag={diag_bytes/1e9:.2f}GB acc~{acc_bytes/1e9:.2f}GB "
        f"keys={key_bytes/1e9:.2f}GB total~{total/1e9:.2f}GB "
        f"-> min {total/bw*1e3:.1f} ms at {bw/1e9:.0f} GB/s; "
        f"measured {dt*1e3:.0f} ms = {total/bw/dt*100:.1f}% of roofline"
    )


if __name__ == "__main__":
    main()
