"""Profile the SS sqrt-inverse ladder at example scale (VERDICT r5 #6).

stdinv over n=99337 variances is the reference's per-SNP hot loop
(gwas/assoc.go:887-953 -> mpc/mpc.go:1991-2080); round-4 measured 65-190 s
on the host.  cProfile party 1 to find where it goes.

Usage: python scripts/prof_stdinv.py [n]
"""

import cProfile
import io
import os
import pstats
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 99337
NPARTY = 3


def main():
    from sfgwas_tpu.mpc.mpc import MPC
    from sfgwas_tpu.mpc.prg import Random
    from sfgwas_tpu.ops import ring as R
    from sfgwas_tpu.parallel.transport import LocalCluster, Network
    from sfgwas_tpu.utils import devlock

    cluster = LocalCluster(NPARTY)
    devlock.enable()
    ring = R.field_for_size(256)
    fb = 30

    def work(pid):
        devlock.acquire()
        try:
            rand = Random(pid, NPARTY, None)
            net = Network(cluster.transport(pid), pid, NPARTY, 1, rand)
            mpc = MPC(net, ring, 60, 30, True, 1_000_000)
            rng = np.random.default_rng(pid)
            if pid == 1:
                # variance-like fixed-point values, shared as hub + zeros
                vals = rng.uniform(0.05, 2.0, N)
                x = ring.from_ints(
                    [int(v * (1 << fb)) for v in vals]
                )
            else:
                x = ring.zeros((N,))
            t0 = time.time()
            if pid == 1:
                pr = cProfile.Profile()
                pr.enable()
            s, si = mpc.sqrt_and_sqrt_inverse(x)
            if pid == 1:
                pr.disable()
                dt = time.time() - t0
                print(f"[prof_stdinv] pid1 n={N} {dt:.1f}s", flush=True)
                out = io.StringIO()
                ps = pstats.Stats(pr, stream=out)
                ps.sort_stats("cumulative").print_stats(35)
                print(out.getvalue())
            else:
                print(
                    f"[prof_stdinv] pid{pid} {time.time()-t0:.1f}s", flush=True
                )
        finally:
            devlock.release()

    ts = [threading.Thread(target=work, args=(p,)) for p in range(NPARTY)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()


if __name__ == "__main__":
    main()
