"""Bounded-RSS proof for the SNP-axis QC windowing (SURVEY §5 long-axis
scaling; reference windows QC at 10M SNPs/batch, gwas/qualcontrol.go:92-126).

Runs the precomputed-stats QC over 3 forced windows and asserts the peak
RSS growth is proportional to ONE window, not the whole SNP axis.  Slow
(minutes): gate behind SFGWAS_SLOW=1; BASELINE.md records the measured
numbers."""

import os
import resource
import threading

import numpy as np
import pytest

from sfgwas_tpu.gwas import qc as qc_mod
from sfgwas_tpu.gwas.params import FilterParams
from sfgwas_tpu.mpc.mpc import MPC
from sfgwas_tpu.mpc.prg import Random
from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.parallel.transport import LocalCluster, Network

NP_ = 3
M = 150_000
WINDOW = 50_000


def _rss() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


@pytest.mark.skipif(
    not os.environ.get("SFGWAS_SLOW"),
    reason="several minutes of host SS; set SFGWAS_SLOW=1",
)
def test_qc_windowed_rss(monkeypatch):
    monkeypatch.setattr(qc_mod, "MAX_WINDOW", WINDOW)
    cluster = LocalCluster(NP_)
    fp = FilterParams(0.1, 28.374, 0.1, 0.05, 0.2, 0.5)
    outs = [None] * NP_
    errs = [None] * NP_

    def work(pid):
        try:
            rand = Random(pid, NP_, None)
            net = Network(cluster.transport(pid), pid, NP_, 1, rand)
            ring = R.field_for_size(256)
            mpc = MPC(net, ring, 60, 30, True, 1_000_000)
            rng = np.random.default_rng(pid)
            if pid > 0:
                n = 1000
                miss = rng.integers(0, 5, M).astype(np.int64)
                ac1 = rng.integers(0, 2 * n, M)
                ac = np.stack([2 * (n - miss) - ac1, ac1])
                g2 = np.minimum(ac1 // 2, n - miss)
                g1 = ac1 - 2 * g2
                gc = np.stack([n - miss - g1 - g2, g1, g2])
            else:
                n = 0
                miss = np.zeros(M, np.int64)
                ac = np.zeros((2, M), np.int64)
                gc = np.zeros((3, M), np.int64)
            outs[pid] = qc_mod.snp_filter_with_precomputed_stats(
                mpc, ac, gc, miss, n, 2000, fp
            )
        except BaseException as e:  # noqa
            import traceback

            traceback.print_exc()
            errs[pid] = e

    rss0 = _rss()
    ts = [threading.Thread(target=work, args=(p,)) for p in range(NP_)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=3600)
    for e in errs:
        if e:
            raise e
    peak_delta = _rss() - rss0
    assert outs[1] is not None and len(outs[1]) == M

    # measured (round 3): the boolean comparison ladder holds ~270
    # [WINDOW, 32]-int32-equivalent arrays per party at its high-water mark
    # (10.25 GB for WINDOW=100k x 3 parties, incl. malloc retention).
    # Budget 350 such arrays per party: scales with WINDOW, not M -- an
    # unwindowed ladder over all M SNPs blows through it at 3x the width.
    window_bytes = WINDOW * 32 * 4
    budget = 350 * NP_ * window_bytes
    print(
        f"peak RSS delta {peak_delta/1e9:.2f} GB over {M//WINDOW} windows "
        f"(budget {budget/1e9:.2f} GB)"
    )
    assert peak_delta < budget, (peak_delta, budget)


def test_qc_per_window_caches(monkeypatch, tmp_path):
    """Per-window cache files (gwas/qualcontrol.go:92-126): a rerun with
    identical stats + thresholds must reproduce the mask from the caches
    alone (no fresh window MPC work), while changed thresholds or changed
    input stats must MISS the caches and recompute (ADVICE r4: un-keyed
    window caches silently survived threshold/data changes)."""
    monkeypatch.setattr(qc_mod, "MAX_WINDOW", 40)
    M_ = 100
    fp = FilterParams(0.2, 28.374, 0.1, 1.0, 0.0, 1.0)

    fresh_windows = [0]  # windows computed via MPC (not loaded from cache)
    real_miss_filter = qc_mod.snp_miss_filter

    def counting_miss_filter(mpc, *a, **k):
        if mpc.pid == 1:
            fresh_windows[0] += 1
        return real_miss_filter(mpc, *a, **k)

    monkeypatch.setattr(qc_mod, "snp_miss_filter", counting_miss_filter)

    def run(use_zeros, fp=fp):
        cluster = LocalCluster(NP_)
        outs = [None] * NP_
        errs = [None] * NP_

        def work(pid):
            try:
                rand = Random(pid, NP_, None)
                net = Network(cluster.transport(pid), pid, NP_, 1, rand)
                ring = R.field_for_size(256)
                mpc = MPC(net, ring, 60, 30, True, 1_000_000)
                rng = np.random.default_rng(100 + pid)
                if pid > 0 and not use_zeros:
                    n = 50
                    miss = rng.integers(0, 8, M_).astype(np.int64)
                    # HWE-consistent genotype draws (binomial(2, p) per SNP)
                    p = rng.uniform(0.1, 0.9, M_)
                    gmat = rng.binomial(2, p[None, :], (n, M_))
                    mmask = np.zeros((n, M_), bool)
                    for j in range(M_):
                        mmask[rng.choice(n, miss[j], replace=False), j] = True
                    gmat = np.where(mmask, -1, gmat)
                    gc = np.stack(
                        [(gmat == k).sum(0).astype(np.int64) for k in range(3)]
                    )
                    ac1 = gc[1] + 2 * gc[2]
                    ac = np.stack([2 * (n - miss) - ac1, ac1])
                else:
                    n = 50 if pid > 0 else 0
                    miss = np.zeros(M_, np.int64)
                    ac = np.zeros((2, M_), np.int64)
                    gc = np.zeros((3, M_), np.int64)
                outs[pid] = qc_mod.snp_filter_with_precomputed_stats(
                    mpc, ac, gc, miss, n, 100, fp,
                    cache_prefix=str(tmp_path / f"party{pid}"),
                )
            except BaseException as e:  # noqa
                import traceback

                traceback.print_exc()
                errs[pid] = e

        ts = [threading.Thread(target=work, args=(p,)) for p in range(NP_)]
        [t.start() for t in ts]
        [t.join(timeout=600) for t in ts]
        for e in errs:
            if e:
                raise e
        return outs

    first = run(use_zeros=False)
    caches = sorted(tmp_path.glob("party1_qcwin_*.npy"))
    assert len(caches) == 3, caches  # 100 SNPs / 40-window
    assert fresh_windows[0] == 3
    assert first[1].sum() > 0

    # resume with IDENTICAL stats: caches hit, zero fresh window compute
    fresh_windows[0] = 0
    second = run(use_zeros=False)
    assert fresh_windows[0] == 0
    assert (first[1] == second[1]).all()

    # changed thresholds: the content-keyed cache names miss -> recompute
    fresh_windows[0] = 0
    fp2 = FilterParams(0.4, 28.374, 0.1, 1.0, 0.0, 1.0)
    run(use_zeros=False, fp=fp2)
    assert fresh_windows[0] == 3

    # changed input stats (zeros): also a miss -> recompute, instead of
    # silently returning the stale filters for different data
    fresh_windows[0] = 0
    run(use_zeros=True)
    assert fresh_windows[0] == 3
