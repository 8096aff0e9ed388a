"""Native PGEN reader vs plink2's own --geno-counts output on example_data."""

import os

import numpy as np
import pytest

from sfgwas_tpu.gwas.pgen import PgenReader

DATA = "/root/reference/example_data"


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
def test_pgen_chr1_matches_gcount_oracle():
    gc = np.fromfile(f"{DATA}/party1/all.gcount.transpose.bin", dtype="<u4").reshape(
        6, -1
    )
    r = PgenReader(f"{DATA}/party1/geno/chr1.pgen")
    g = r.read_all()  # [samples, variants], -1 = missing
    m = r.variant_ct
    assert g.shape == (1000, m)
    assert ((g == 0).sum(0) == gc[0, :m]).all()
    assert ((g == 1).sum(0) == gc[1, :m]).all()
    assert ((g == 2).sum(0) == gc[2, :m]).all()
    assert ((g == -1).sum(0) == gc[5, :m]).all()


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
def test_protocol_loads_pgen_inputs(tmp_path):
    """ProtocolInfo geno_file_format='pgen': native decode + blocks cache."""
    import threading

    from sfgwas_tpu.gwas.protocol import ProtocolInfo
    from sfgwas_tpu.parallel.transport import LocalCluster
    from sfgwas_tpu.utils.config import Config

    cluster = LocalCluster(2)
    out = {}

    from sfgwas_tpu.gwas.pgen import PgenReader

    m2 = PgenReader(f"{DATA}/party1/geno/chr2.pgen").variant_ct

    def work_fixed(pid):
        cfg = Config()
        cfg.num_main_parties = 1
        cfg.num_inds = [0, 1000]
        cfg.num_snps = 4546 + m2
        cfg.geno_file_format = "pgen"
        cfg.geno_num_blocks = 2
        cfg.geno_binary_file_prefix = f"{DATA}/party1/geno"
        cfg.pheno_file = f"{DATA}/party1/pheno.txt"
        cfg.covar_file = f"{DATA}/party1/cov.txt"
        cfg.cache_dir = str(tmp_path / f"cache{pid}")
        cfg.output_dir = str(tmp_path / f"out{pid}")
        prot = ProtocolInfo(cfg, pid, transport=cluster.transport(pid), mpc_only=True)
        if pid == 1:
            out["sizes"] = prot.geno_block_sizes
            out["stats"] = prot.geno_blocks[0].column_stats()

    ts = [threading.Thread(target=work_fixed, args=(p,)) for p in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert out["sizes"][0] == 4546
    gc = np.fromfile(f"{DATA}/party1/all.gcount.transpose.bin", dtype="<u4").reshape(
        6, -1
    )
    # dosage sum over non-missing = het + 2*homalt
    want = gc[1, :4546] + 2 * gc[2, :4546]
    assert (out["stats"]["xsum"] == want).all()


@pytest.mark.skipif(
    not (os.path.isdir(DATA) and os.environ.get("SFGWAS_FULL_E2E")),
    reason="all-chromosome sweep is slow; set SFGWAS_FULL_E2E=1",
)
def test_pgen_all_chromosomes_both_parties():
    for party in (1, 2):
        gc = np.fromfile(
            f"{DATA}/party{party}/all.gcount.transpose.bin", dtype="<u4"
        ).reshape(6, -1)
        col = 0
        for c in range(1, 23):
            r = PgenReader(f"{DATA}/party{party}/geno/chr{c}.pgen")
            g = r.read_all()
            m = r.variant_ct
            sl = slice(col, col + m)
            assert ((g == 0).sum(0) == gc[0, sl]).all(), (party, c)
            assert ((g == 1).sum(0) == gc[1, sl]).all(), (party, c)
            assert ((g == 2).sum(0) == gc[2, sl]).all(), (party, c)
            assert ((g == -1).sum(0) == gc[5, sl]).all(), (party, c)
            col += m
        assert col == gc.shape[1]
