#!/usr/bin/env python
"""Offline conversion of PGEN genotype files to the 'blocks' int8 format.

The reference shells out to plink2 at runtime (gwas/utilities.go:141-200,
scripts/filterMatrixPgen.sh); this build keeps the runtime pure and expects
this conversion (or any equivalent) to run offline.  Requires plink2 on PATH
when converting real PGEN data; for .raw/.traw exports no external tool is
needed."""

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pgen-prefix", required=True, help="%d placeholder for chrom")
    ap.add_argument("--num-blocks", type=int, required=True)
    ap.add_argument("--out-prefix", required=True)
    ap.add_argument("--sample-keep", default=None)
    args = ap.parse_args()

    if shutil.which("plink2") is None:
        sys.exit("plink2 not found on PATH; run this step on a host that has it")

    sizes = []
    for b in range(args.num_blocks):
        prefix = args.pgen_prefix % (b + 1)
        cmd = [
            "plink2", "--pfile", prefix, "--export", "A", "--out",
            f"{args.out_prefix}.tmp{b}",
        ]
        if args.sample_keep:
            cmd += ["--keep", args.sample_keep]
        subprocess.run(cmd, check=True)
        raw = np.loadtxt(
            f"{args.out_prefix}.tmp{b}.raw", skiprows=1, dtype=str
        )
        g = raw[:, 6:]
        mat = np.where(g == "NA", -1, g).astype(np.int8)
        mat.tofile(f"{args.out_prefix}.{b}.bin")
        sizes.append(mat.shape[1])
        os.remove(f"{args.out_prefix}.tmp{b}.raw")
    with open(f"{args.out_prefix}.blocksizes.txt", "w") as f:
        f.write("\n".join(str(s) for s in sizes) + "\n")
    print("done:", sizes)


if __name__ == "__main__":
    main()
