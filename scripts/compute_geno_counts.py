#!/usr/bin/env python
"""Offline preprocessing: compute the per-SNP genotype-count stats file from
'blocks'-format int8 genotype matrices.

Port of the reference's plink2-based preprocessing
(scripts/preprocessing/computeGenoCounts.py + gwas/utilities.go:32-69 format):
6 x m uint32 little-endian vectors: hom-ref GC, het GC, hom-alt GC, two
(recomputed) allele-count slots, missing count.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geno-prefix", required=True, help="<prefix>.<i>.bin")
    ap.add_argument("--block-sizes", required=True)
    ap.add_argument("--num-inds", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sizes = [int(x) for x in open(args.block_sizes).read().split()]
    cols = []
    for i, m in enumerate(sizes):
        g = np.fromfile(
            f"{args.geno_prefix}.{i}.bin", dtype=np.int8, count=args.num_inds * m
        ).reshape(args.num_inds, m)
        cols.append(g)
    G = np.concatenate(cols, axis=1)
    m = G.shape[1]
    out = np.zeros((6, m), dtype="<u4")
    for v in range(3):
        out[v] = (G == v).sum(axis=0)
    out[3] = out[1] + 2 * out[0]
    out[4] = out[1] + 2 * out[2]
    out[5] = (G < 0).sum(axis=0)
    out.tofile(args.out)
    print(f"wrote {args.out}: {m} SNPs")


if __name__ == "__main__":
    main()
