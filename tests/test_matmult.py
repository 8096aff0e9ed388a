"""BSGS cipher x plain matmult vs numpy oracle."""

import math

import numpy as np

from sfgwas_tpu.crypto import basics as B
from sfgwas_tpu.gwas import matmult as MM
from sfgwas_tpu.mpc import mhe
from sfgwas_tpu.parallel.simulate import run_parties

PRESET = "TEST8"
SLOTS = 128


def _shifts():
    d = int(math.ceil(math.sqrt(SLOTS)))
    sh = set(range(1, d))
    for g in range(1, (SLOTS - 1) // d + 1):
        sh.add((g * d) % SLOTS)
    p = 1
    while p < SLOTS:
        sh.add(p)
        p *= 2
    return sorted(sh)


def test_mat_mult_multiblock():
    rng = np.random.default_rng(11)
    s = 2
    n, m = 200, 150  # 2 block rows, 2 block cols at 128 slots
    Q = rng.normal(size=(s, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        if mpc.pid == 1:
            A = []
            for i in range(s):
                row = []
                for b0 in range(0, n, SLOTS):
                    row.append(B.encrypt_float_vector(cps, Q[i, b0 : b0 + SLOTS])[0])
                A.append(row)
        else:
            A = [[None] * (2) for _ in range(s)]
        A = [
            [mhe.broadcast_ciphertext(mpc.net, cps, A[i][j], 1) for j in range(2)]
            for i in range(s)
        ]
        out, dsum, dsq = MM.mat_mult_stream(cps, A, X, compute_sums=True)
        res = []
        for i in range(s):
            vals = []
            for ct in out[i]:
                pt = mhe.collective_decrypt(mpc.net, cps, ct, -1)
                vals.append(cps.ctx.decode(pt))
            res.append(np.concatenate(vals))
        return res, dsum, dsq

    res = run_parties(3, fn)
    want = Q @ X.astype(np.float64)
    got, dsum, dsq = res[1]
    for i in range(s):
        err = np.abs(got[i][:m] - want[i]).max()
        assert err < 1e-2, (i, err)
    assert np.allclose(dsum, X.astype(np.float64).sum(axis=0))
    assert np.allclose(dsq, (X.astype(np.float64) ** 2).sum(axis=0))


def test_mat_mult_sharded_matches_single_device():
    """Per-party chip sharding of the BSGS matmult (SURVEY.md §2.9): tiles
    round-robined over the 8 virtual devices must be bit-identical to the
    single-device path."""
    import jax

    rng = np.random.default_rng(13)
    s = 1
    n, m = 120, 300  # 1 block row x 3 block cols -> tiles span devices
    Q = rng.normal(size=(s, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        if mpc.pid == 1:
            A = [[B.encrypt_float_vector(cps, Q[0])[0]]]
        else:
            A = [[None]]
        A = [[mhe.broadcast_ciphertext(mpc.net, cps, A[0][0], 1)]]
        cache = MM.preprocess_matrix(cps, X.astype(np.float64))
        ref = MM.mat_mult_cached(cps, A, cache)
        shd = MM.mat_mult_sharded(cps, A, cache, devices=jax.local_devices())
        same = all(
            np.array_equal(np.asarray(a.c0), np.asarray(b.c0))
            and np.array_equal(np.asarray(a.c1), np.asarray(b.c1))
            for ra, rb in zip(ref, shd)
            for a, b in zip(ra, rb)
        )
        vals = []
        for ct in shd[0]:
            pt = mhe.collective_decrypt(mpc.net, cps, ct, -1)
            vals.append(cps.ctx.decode(pt))
        return same, np.concatenate(vals)

    res = run_parties(3, fn)
    same, got = res[1]
    assert same, "sharded result differs from single-device"
    want = (Q @ X.astype(np.float64))[0]
    assert np.abs(got[:m] - want).max() < 1e-2

def test_pipeline_device_routing():
    """config.shard_matmult wiring: set_pipeline_devices makes the default
    (devices=None) mat_mult_cached path route over the local mesh,
    bit-identical to single-device; clearing it restores the default."""
    import jax

    rng = np.random.default_rng(17)
    n, m = 100, 260
    Q = rng.normal(size=(1, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        if mpc.pid == 1:
            A = [[B.encrypt_float_vector(cps, Q[0])[0]]]
        else:
            A = [[None]]
        A = [[mhe.broadcast_ciphertext(mpc.net, cps, A[0][0], 1)]]
        cache = MM.preprocess_matrix(cps, X.astype(np.float64))
        ref = MM.mat_mult_cached(cps, A, cache)
        if mpc.pid == 1:
            # module-global routing (protocol init does this for every party
            # in-process; setting it once here exercises the same path)
            MM.set_pipeline_devices(jax.local_devices())
        try:
            routed = MM.mat_mult_cached(cps, A, cache)
        finally:
            MM.set_pipeline_devices(None)
        return all(
            np.array_equal(np.asarray(a.c0), np.asarray(b.c0))
            and np.array_equal(np.asarray(a.c1), np.asarray(b.c1))
            for ra, rb in zip(ref, routed)
            for a, b in zip(ra, rb)
        )

    res = run_parties(3, fn)
    assert res[1] and res[2]


def test_mat_mult_host_streaming_bit_identical(monkeypatch):
    """Host-streaming diagonal cache (reference DiagCacheStream,
    gwas/filestream.go:19-282): pre-NTT host chunks materialized per scan
    group under a byte budget must be BIT-identical to the device-resident
    path (same integers through the same kernels)."""
    rng = np.random.default_rng(17)
    s = 2
    n, m = 200, 300  # 2 block rows x 3 block cols at 128 slots
    Q = rng.normal(size=(s, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)
    # tiny budget: forces several streamed sub-groups per block row
    monkeypatch.setattr(MM._MatmulPlan, "STREAM_GROUP_BYTES", 1 << 22)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        nbr = (n + SLOTS - 1) // SLOTS
        if mpc.pid == 1:
            A = []
            for i in range(s):
                A.append([
                    B.encrypt_float_vector(cps, Q[i, b0 : b0 + SLOTS])[0]
                    for b0 in range(0, n, SLOTS)
                ])
        else:
            A = [[None] * nbr for _ in range(s)]
        A = [
            [mhe.broadcast_ciphertext(mpc.net, cps, A[i][j], 1)
             for j in range(nbr)]
            for i in range(s)
        ]
        dev_cache = MM.preprocess_matrix(cps, X)
        host_cache = MM.preprocess_matrix(cps, X, host_resident=True)
        out_dev = MM.mat_mult_cached(cps, A, dev_cache)
        out_host = MM.mat_mult_cached(cps, A, host_cache)
        same = all(
            (np.asarray(cd.c0) == np.asarray(ch.c0)).all()
            and (np.asarray(cd.c1) == np.asarray(ch.c1)).all()
            and cd.nmod == ch.nmod
            and cd.scale == ch.scale
            for rd, rh in zip(out_dev, out_host)
            for cd, ch in zip(rd, rh)
        )
        # decode one output to pin correctness, not just identity
        pt = mhe.collective_decrypt(mpc.net, cps, out_host[0][0], -1)
        return same, np.asarray(cps.ctx.decode(pt))

    res = run_parties(3, fn)
    same, got = res[1]
    assert same, "streamed path diverged from device-resident path"
    want = (Q @ X.astype(np.float64))[0]
    assert np.abs(got[: min(SLOTS, m)] - want[:SLOTS]).max() < 1e-2


def test_mat_mult_host_streaming_disk_spill(monkeypatch, tmp_path):
    """Disk-spilled host chunks (per-block DiagCacheStream files,
    gwas/filestream.go:19-282): spill + mmap reload must produce the same
    ciphertexts as the in-RAM host chunks, and a second preprocess call
    must restart from the files."""
    rng = np.random.default_rng(23)
    n, m = 150, 280
    Q = rng.normal(size=(1, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        nbr = (n + SLOTS - 1) // SLOTS
        if mpc.pid == 1:
            A = [[
                B.encrypt_float_vector(cps, Q[0, b0 : b0 + SLOTS])[0]
                for b0 in range(0, n, SLOTS)
            ]]
        else:
            A = [[None] * nbr]
        A = [[mhe.broadcast_ciphertext(mpc.net, cps, A[0][j], 1)
              for j in range(nbr)]]
        prefix = str(tmp_path / f"spill_p{mpc.pid}")
        ram = MM.preprocess_matrix(cps, X, host_resident=True)
        disk = MM.preprocess_matrix(
            cps, X, cache_file=prefix, host_resident=True
        )
        # restart: reload from the files with a zeroed matrix
        disk2 = MM.preprocess_matrix(
            cps, np.zeros_like(X), cache_file=prefix, host_resident=True
        )
        outs = [
            MM.mat_mult_cached(cps, A, c) for c in (ram, disk, disk2)
        ]
        ref = outs[0]
        same = all(
            (np.asarray(a.c0) == np.asarray(b.c0)).all()
            and (np.asarray(a.c1) == np.asarray(b.c1)).all()
            for o in outs[1:]
            for ra, rb in zip(ref, o)
            for a, b in zip(ra, rb)
        )
        return same

    res = run_parties(3, fn)
    assert res[1] is True


def test_streaming_matmult_rss_bounded_1m_snps(tmp_path):
    """Long-SNP-axis boundedness (SURVEY §5; VERDICT r4 #7): the
    disk-spilled streaming preprocess of a synthetic 1M-SNP matrix must
    keep host RSS bounded by ONE block's working set, not the SNP axis
    (in-RAM host chunks for 1M SNPs would be ~4 GB at this geometry;
    device-resident polys ~20 GB).  The matmult working set is bounded
    separately by the stream-group budget (bit-identity tests above); its
    index plan is O(nbc * nseg) ≈ 160 MB at PN14 geometry for 1M SNPs.
    Slow (minutes of host FFT): gated behind SFGWAS_SLOW."""
    import os as _os
    import resource

    import pytest as _pytest

    if not _os.environ.get("SFGWAS_SLOW"):
        _pytest.skip("minutes of host FFT; set SFGWAS_SLOW=1")

    rng = np.random.default_rng(29)
    n, m = 128, 1_000_000
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        if mpc.pid != 1:
            return True  # single-party measurement; others idle in sync
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        cache = MM.preprocess_matrix(
            cps, X, cache_file=str(tmp_path / "mm1m"), host_resident=True
        )
        assert len(cache[0]) == (m + SLOTS - 1) // SLOTS
        # every block is spilled + mmap'd, none holds polys in RAM
        assert all(b.polys is None for row in cache for b in row)
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        return peak - rss0

    res = run_parties(3, fn)
    delta = res[1]
    # bounded by scratch buffers + transient per-block chunks + the mmap
    # page-cache high-water (reclaimable), NOT the 4 GB of chunk data
    budget = 3 << 30
    print(f"1M-SNP streaming preprocess RSS delta: {delta/1e9:.2f} GB")
    assert delta < budget, delta


def test_mac_dense_matches_segment_kernel(monkeypatch):
    """The dense (giant-aligned, lazy-sum) MAC scan must be BIT-identical
    to the segment_sum kernel it replaces: exact modular arithmetic, only
    the reduction order within a giant group changes (associativity-safe)."""
    rng = np.random.default_rng(29)
    s = 2
    n, m = 200, 300
    Q = rng.normal(size=(s, n)) * 0.5
    X = rng.integers(0, 3, size=(n, m)).astype(np.int8)

    def fn(mpc):
        cps = mhe.collective_init(mpc.net, PRESET, shifts_override=_shifts())
        if mpc.pid == 0:
            return None
        nbr = (n + SLOTS - 1) // SLOTS
        if mpc.pid == 1:
            A = [[
                B.encrypt_float_vector(cps, Q[i, b0 : b0 + SLOTS])[0]
                for b0 in range(0, n, SLOTS)
            ] for i in range(s)]
        else:
            A = [[None] * nbr for _ in range(s)]
        A = [[mhe.broadcast_ciphertext(mpc.net, cps, A[i][j], 1)
              for j in range(nbr)] for i in range(s)]
        cache = MM.preprocess_matrix(cps, X)
        monkeypatch.setenv("SFGWAS_MM_DENSE", "1")
        dense = MM.mat_mult_cached(cps, A, cache)
        monkeypatch.setenv("SFGWAS_MM_DENSE", "0")
        seg = MM.mat_mult_cached(cps, A, cache)
        return all(
            np.array_equal(np.asarray(a.c0), np.asarray(b.c0))
            and np.array_equal(np.asarray(a.c1), np.asarray(b.c1))
            for ra, rb in zip(dense, seg)
            for a, b in zip(ra, rb)
        )

    res = run_parties(3, fn)
    assert res[1] is True and res[2] is True
