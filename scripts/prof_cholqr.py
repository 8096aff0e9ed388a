"""Profile net_cholqr_enc at PN14 example geometry (round-5 VERDICT #1).

3-party local-sim (dealer + 2 data parties x 1000 individuals, kp=15
columns) using the cached PN14QP438 key bundles.  Times two cold+warm QR
calls and prints the SFGWAS_PROF spans, isolating where the 120 s/pass of
the round-4 full-PCA stall goes (compile? host SS? devlock wait?).

Usage:  SFGWAS_PROF=1 python scripts/prof_cholqr.py [ncols] [iters]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NCOLS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NPARTY = 3
NROWS = [0, 1000, 1000]


def main():
    from sfgwas_tpu.crypto import basics as B
    from sfgwas_tpu.gwas.qrfact import net_cholqr_enc
    from sfgwas_tpu.mpc import mhe
    from sfgwas_tpu.mpc.mpc import MPC
    from sfgwas_tpu.mpc.prg import Random
    from sfgwas_tpu.ops import ring as R
    from sfgwas_tpu.parallel.transport import LocalCluster, Network
    from sfgwas_tpu.utils import devlock, prof

    cluster = LocalCluster(NPARTY)
    devlock.enable()
    ring = R.field_for_size(256)

    def work(pid):
        devlock.acquire()
        try:
            rand = Random(pid, NPARTY, None)
            net = Network(cluster.transport(pid), pid, NPARTY, 1, rand)
            mpc = MPC(net, ring, 60, 30, True, 1000000)
            cps = mhe.collective_init(
                net, "PN14QP438",
                key_cache=f"cache/party{pid}/keys.npz",
            )
            rng = np.random.default_rng(pid)
            if pid > 0:
                A = [
                    B.encrypt_float_vector(cps, rng.normal(size=NROWS[pid]))
                    for _ in range(NCOLS)
                ]
            else:
                A = [None] * NCOLS
            for it in range(ITERS):
                t0 = time.time()
                Q = net_cholqr_enc(cps, mpc, A, NROWS)
                if pid > 0:
                    import jax

                    jax.block_until_ready(Q[0][0].c0)
                print(
                    f"[prof_cholqr] pid{pid} iter{it} "
                    f"{time.time() - t0:.1f}s",
                    flush=True,
                )
                prof.dump(f"pid{pid} iter{it}")
                prof.reset()
                if pid > 0:
                    A = Q  # keep levels realistic for the warm iterations
        finally:
            devlock.release()

    ts = [threading.Thread(target=work, args=(p,)) for p in range(NPARTY)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    print(f"[prof_cholqr] total {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
