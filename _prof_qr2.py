import time, numpy as np, jax, threading
import sfgwas_tpu
from sfgwas_tpu.parallel.transport import LocalCluster, Network
from sfgwas_tpu.mpc.prg import Random
from sfgwas_tpu.mpc.mpc import MPC
from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.mpc import mhe
from sfgwas_tpu.crypto import basics as B
from sfgwas_tpu.gwas.qrfact import net_dqr_enc

NP = 3
cluster = LocalCluster(NP)

def work(pid):
    rand = Random(pid, NP)
    net = Network(cluster.transport(pid), pid, NP, 1, rand)
    mpc = MPC(net, R.LElem256, 60, 30, True, 1000000)
    cps = mhe.collective_init(net, "PN14QP438")
    rng = np.random.default_rng(pid)
    nrows_all = [0, 1000, 1000]
    if pid > 0:
        comb = [B.encrypt_float_vector(cps, rng.normal(size=1000)) for _ in range(6)]
    else:
        comb = [None]*6
    t0 = time.time()
    Q = net_dqr_enc(cps, mpc, comb, nrows_all)
    if pid == 1:
        print(f"net_dqr_enc 6 cols x 1000 rows: {time.time()-t0:.1f}s", flush=True)

ts=[threading.Thread(target=work, args=(p,)) for p in range(NP)]
[t.start() for t in ts]; [t.join(timeout=1700) for t in ts]
