#!/usr/bin/env python
"""Manhattan plot of assoc.txt output.

Port of scripts/visualization/manhattanPlot.py: converts the Pearson r
statistics to chi-square p-values using the sample/covariate counts and
plots -log10(p) by position."""

import argparse

import numpy as np


def r_to_neglog10p(r, num_inds, num_cov):
    from scipy import stats  # optional dependency; fall back to approx

    dof = num_inds - num_cov - 2
    chi2 = dof * r * r / np.maximum(1 - r * r, 1e-12)
    return -np.log10(np.maximum(stats.chi2.sf(chi2, 1), 1e-300))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assoc", required=True)
    ap.add_argument("--pos", required=True)
    ap.add_argument("--num-inds", type=int, required=True)
    ap.add_argument("--num-cov", type=int, required=True)
    ap.add_argument("--out", default="manhattan.png")
    args = ap.parse_args()

    r = np.loadtxt(args.assoc)
    pos = np.loadtxt(args.pos)[: len(r)]
    y = r_to_neglog10p(r, args.num_inds, args.num_cov)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 4))
    plt.scatter(pos, y, s=4)
    plt.axhline(-np.log10(5e-8), color="r", ls="--", lw=1)
    plt.xlabel("position")
    plt.ylabel("-log10(p)")
    plt.tight_layout()
    plt.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
