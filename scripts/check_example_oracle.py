"""Validate an example_data run against a centrally-computed plaintext oracle.

Mirrors the reference's validation strategy (SURVEY.md §4: SF-GWAS statistics
were checked against a central PLINK2 workflow, scripts/analysis/run_gwas_ukb.sh).
Here the oracle is the same pipeline computed in numpy on the pooled data:
QC filter from the protocol's own gkeep.txt, combined covariate basis
[1 | covs (| PCs)] via QR, Pearson statistic sxy/sqrt(sxx)/sqrt(syy)
(gwas/assoc.go:688-875 math).

Usage:
    python scripts/check_example_oracle.py [--data example_data] \
        [--out out/party1/assoc.txt] [--gkeep cache/party1/gkeep.txt] \
        [--qpc cache/party1/Qpc.txt]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sfgwas_tpu.gwas.pgen import read_pgen_blocks  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="example_data")
    ap.add_argument("--out", default="out/party1/assoc.txt")
    ap.add_argument("--gkeep", default="cache/party1/gkeep.txt")
    ap.add_argument("--qpc", default=None,
                    help="decrypted PC columns (cache/party1/Qpc.txt); "
                         "oracle then residualizes on them too")
    ap.add_argument("--nchrom", type=int, default=22)
    ap.add_argument("--logistic", action="store_true",
                    help="oracle = exact-Newton logistic score test "
                         "(gwas/assoc.go:955-1476 gWY math) instead of the "
                         "linear Pearson statistic")
    args = ap.parse_args()

    Gs, ys, Cs = [], [], []
    for pid in (1, 2):
        d = os.path.join(args.data, f"party{pid}")
        G = read_pgen_blocks(
            os.path.join(d, "geno"), list(range(1, args.nchrom + 1))
        )
        yp = np.loadtxt(os.path.join(d, "pheno.txt"))
        Cp = np.loadtxt(os.path.join(d, "cov.txt"))
        # individual QC filter: the protocol drops samples via ikeep.txt
        # (protocol.py individual_miss_het_filters) before association
        ik_path = os.path.join(
            os.path.dirname(os.path.dirname(args.gkeep)), f"party{pid}", "ikeep.txt"
        )
        if os.path.exists(ik_path):
            ik = np.loadtxt(ik_path).astype(bool)
            G, yp, Cp = G[ik], yp[ik], Cp[ik]
            print(f"party{pid}: ikeep keeps {ik.sum()}/{ik.size} individuals")
        Gs.append(G)
        ys.append(yp)
        Cs.append(Cp)
    G = np.concatenate(Gs, axis=0).astype(np.float64)
    y = np.concatenate(ys)
    C = np.concatenate(Cs, axis=0)
    # missing genotypes (-1 in the reader) -> 0, as the protocol's streams do
    G[G < 0] = 0.0

    gk = np.loadtxt(args.gkeep).astype(bool)
    print(f"pooled G {G.shape}, QC keeps {gk.sum()}/{gk.size} SNPs")
    G = G[:, gk]

    n = G.shape[0]
    cols = [np.ones(n)] + [C[:, j] for j in range(C.shape[1])]
    if args.qpc and os.path.exists(args.qpc):
        # per-party Qpc caches: cache/partyP/Qpc.txt holds [npc, n_party_P]
        # CSV rows (save_matrix_collective writes each party's own slice);
        # stack the parties' individual axes in pid order
        parts = []
        d1 = os.path.dirname(args.qpc)
        base = os.path.dirname(d1)
        name = os.path.basename(args.qpc)
        for pid in (1, 2):
            f = os.path.join(base, f"party{pid}", name)
            parts.append(np.loadtxt(f, delimiter=",", ndmin=2))
        Qpc = np.concatenate(parts, axis=1).T  # [n_pooled, npc]
        assert Qpc.shape[0] == n, (Qpc.shape, n)
        cols += [Qpc[:, j] for j in range(Qpc.shape[1])]
        print(f"including {Qpc.shape[1]} PC columns from {base}/party*/{name}")
    Q, _ = np.linalg.qr(np.stack(cols, axis=1))

    if args.logistic:
        # exact-Newton covariate-only logistic + per-SNP score test
        # (the protocol's useLogistic path, gwas/assoc.go:955-1476)
        Z = np.stack(cols, axis=1)
        beta = np.zeros(Z.shape[1])
        for _ in range(50):
            p = 1 / (1 + np.exp(-Z @ beta))
            w = p * (1 - p)
            H = Z.T @ (Z * w[:, None])
            beta = beta + np.linalg.solve(H, Z.T @ (y - p))
        p = 1 / (1 + np.exp(-Z @ beta))
        w = p * (1 - p)
        yt = y - p
        ZW = Z * w[:, None]
        Hinv = np.linalg.inv(Z.T @ ZW)
        num = G.T @ yt
        gzw = G.T @ ZW
        den = (w[:, None] * G * G).sum(axis=0) - np.einsum(
            "ij,jk,ik->i", gzw, Hinv, gzw
        )
        want = num / np.sqrt(den)
    else:
        yt = y - Q @ (Q.T @ y)
        sxy = yt @ G
        Gt = G - Q @ (Q.T @ G)
        sxx = (Gt * Gt).sum(axis=0)
        syy = yt @ yt
        want = sxy / np.sqrt(sxx) / np.sqrt(syy)

    got = np.loadtxt(args.out)
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want)
    corr = np.corrcoef(got, want)[0, 1]
    print(f"n={len(got)} stats: max|err|={err.max():.3e} "
          f"mean|err|={err.mean():.3e} corr={corr:.9f}")
    if args.logistic:
        # the protocol's sigmoid is a bounded-interval Chebyshev and its
        # Newton runs a fixed epoch budget: correlation is the contract
        ok = corr > 0.99
    else:
        ok = corr > 0.999 and err.max() < 2e-2
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
