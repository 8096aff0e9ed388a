"""3-data-party (nparty=4) end-to-end GWAS vs the plaintext oracle.

Every prior e2e ran dealer + 2 data parties; N-party generality (hub
trees over 3 peers, QR across 3 row partitions, dealer bookkeeping) is
implied by the reference's config (config/configGlobal.toml num_main_parties)
but was unexercised (VERDICT r4 missing #5)."""

import os
import threading

import numpy as np

from sfgwas_tpu.gwas.protocol import ProtocolInfo
from sfgwas_tpu.parallel.transport import LocalCluster
from sfgwas_tpu.utils import devlock
from sfgwas_tpu.utils.config import Config

NPARTY = 4  # dealer + 3 data parties
N_PER = [0, 16, 14, 12]
M = 40
NCOV = 2


def make_data(tmpdir, rng):
    data = {}
    maf = rng.uniform(0.25, 0.5, size=M)
    for pid in range(1, NPARTY):
        n = N_PER[pid]
        g = (rng.uniform(size=(n, M)) < maf).astype(np.int8) + (
            rng.uniform(size=(n, M)) < maf
        ).astype(np.int8)
        pheno = rng.normal(size=n) + 0.4 * g[:, 0] + 0.3 * g[:, 5]
        cov = rng.normal(size=(n, NCOV))
        d = os.path.join(tmpdir, f"party{pid}")
        os.makedirs(d, exist_ok=True)
        half = M // 2
        g[:, :half].tofile(os.path.join(d, "geno.0.bin"))
        g[:, half:].tofile(os.path.join(d, "geno.1.bin"))
        with open(os.path.join(d, "blocksizes.txt"), "w") as f:
            f.write(f"{half}\n{M - half}\n")
        np.savetxt(os.path.join(d, "pheno.txt"), pheno)
        np.savetxt(os.path.join(d, "cov.txt"), cov)
        np.savetxt(os.path.join(d, "pos.txt"), np.arange(M) * 1000, fmt="%d")
        data[pid] = (g, pheno, cov)
    return data


def make_config(tmpdir, pid):
    cfg = Config()
    cfg.num_main_parties = 3
    cfg.ckks_params = "TEST8"
    cfg.num_inds = N_PER
    cfg.num_snps = M
    cfg.num_covs = NCOV
    cfg.gmiss = 0.2
    cfg.maf_lb = 0.05
    cfg.hwe_ub = 1000.0
    cfg.imiss_ub = 1.0
    cfg.het_lb = 0.0
    cfg.het_ub = 1.0
    cfg.skip_pca = True
    cfg.num_pcs_to_remove = 2
    cfg.num_oversampling = 2
    cfg.num_power_iters = 2
    cfg.snp_dist_thres = 1
    d = os.path.join(tmpdir, f"party{pid}")
    cfg.geno_binary_file_prefix = os.path.join(d, "geno")
    cfg.geno_block_size_file = os.path.join(d, "blocksizes.txt")
    cfg.pheno_file = os.path.join(d, "pheno.txt")
    cfg.covar_file = os.path.join(d, "cov.txt")
    cfg.snp_position_file = os.path.join(d, "pos.txt")
    cfg.cache_dir = os.path.join(d, "cache")
    cfg.output_dir = os.path.join(d, "out")
    return cfg


def oracle_stats(data, snp_filt):
    G = np.concatenate([data[p][0] for p in range(1, NPARTY)], 0).astype(float)
    y = np.concatenate([data[p][1] for p in range(1, NPARTY)])
    C = np.concatenate([data[p][2] for p in range(1, NPARTY)], 0)
    G[G < 0] = 0.0
    G = G[:, snp_filt]
    n = G.shape[0]
    Cfull = np.stack([np.ones(n), *[C[:, j] for j in range(NCOV)]], axis=1)
    Qm, _ = np.linalg.qr(Cfull)
    yt = y - Qm @ (Qm.T @ y)
    Gt = G - Qm @ (Qm.T @ G)
    sxy = yt @ G
    sxx = (Gt * Gt).sum(axis=0)
    syy = yt @ yt
    return sxy / np.sqrt(sxx) / np.sqrt(syy)


def test_e2e_3party_linear(tmp_path):
    rng = np.random.default_rng(123)
    data = make_data(str(tmp_path), rng)

    cluster = LocalCluster(NPARTY)
    outs = [None] * NPARTY
    errs = [None] * NPARTY
    devlock.enable()

    def work(pid):
        devlock.acquire()
        try:
            cfg = make_config(str(tmp_path), pid if pid > 0 else 1)
            if pid == 0:
                cfg.pheno_file = cfg.covar_file = cfg.snp_position_file = ""
                cfg.cache_dir = os.path.join(str(tmp_path), "party0", "cache")
                cfg.output_dir = os.path.join(str(tmp_path), "party0", "out")
            prot = ProtocolInfo(cfg, pid, transport=cluster.transport(pid))
            outs[pid] = prot.gwas()
        except BaseException as e:  # noqa
            import traceback

            traceback.print_exc()
            errs[pid] = e
        finally:
            devlock.release()

    ts = [
        threading.Thread(target=work, args=(p,), daemon=True)
        for p in range(NPARTY)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=3600)
    for e in errs:
        if e:
            raise e

    got = outs[1]
    assert got is not None
    gk_path = os.path.join(str(tmp_path), "party1", "cache", "gkeep.txt")
    gk = np.loadtxt(gk_path).astype(bool)
    want = oracle_stats(data, gk)
    assert got.shape == want.shape, (got.shape, want.shape)
    # all data parties must agree
    assert np.allclose(outs[1], outs[2], atol=1e-6)
    assert np.allclose(outs[1], outs[3], atol=1e-6)
    err = np.abs(got - want).max()
    assert err < 2e-2, (err, got[:5], want[:5])
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.999, corr
