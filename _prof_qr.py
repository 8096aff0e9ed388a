import time, numpy as np, jax
import sfgwas_tpu
from sfgwas_tpu.parallel.transport import LocalCluster, Network
from sfgwas_tpu.mpc.prg import Random
from sfgwas_tpu.mpc.mpc import MPC
from sfgwas_tpu.ops import ring as R
from sfgwas_tpu.mpc import mhe, ss_he
from sfgwas_tpu.crypto import basics as B
import threading

NP = 3
cluster = LocalCluster(NP)
results = [None]*NP

def work(pid):
    rand = Random(pid, NP)
    net = Network(cluster.transport(pid), pid, NP, 1, rand)
    mpc = MPC(net, R.LElem256, 60, 30, True, 1000000)
    cps = mhe.collective_init(net, "PN14QP438", shifts_override=[1,2,4,8,16,32,64,128,256,512,1024,2048,4096])
    rng = np.random.default_rng(pid)
    def lap(m, t0):
        t=time.time()
        if pid==1: print(f"{m}: {t-t0:.2f}s", flush=True)
        return t
    if pid > 0:
        cv = [B.encrypt_float_vector(cps, rng.normal(size=1000))[0] for _ in range(6)]
    t0=time.time()
    # 1. bootstrap_mat_all of a 6-ct matrix (per-party in turn)
    if pid>0:
        m=[[c for c in cv]]
        m = mhe.bootstrap_mat_all(net, cps, m)
    else:
        for source in range(1, NP):
            shape = net.recv(source)
            mhe.collective_bootstrap_many(net, cps, [None]*sum(shape), source)
    t0=lap("bootstrap_mat_all 6ct COLD", t0)
    if pid>0:
        m = mhe.bootstrap_mat_all(net, cps, m)
    else:
        for source in range(1, NP):
            shape = net.recv(source)
            mhe.collective_bootstrap_many(net, cps, [None]*sum(shape), source)
    t0=lap("bootstrap_mat_all 6ct WARM", t0)
    # 2. inner_sum_all
    if pid>0:
        x = B.inner_sum_all(cps, [m[0][0]])
        jax.block_until_ready(x.c0)
        t0=lap("inner_sum_all COLD", t0)
        for _ in range(3):
            x = B.inner_sum_all(cps, [m[0][0]])
        jax.block_until_ready(x.c0)
        t0=lap("inner_sum_all 3x WARM", t0)
        # 3. cmult
        y = B.cmult(cps, [m[0][0]], [m[0][1]])
        jax.block_until_ready(y[0].c0)
        t0=lap("cmult COLD", t0)
        for _ in range(3):
            y = B.cmult(cps, [m[0][0]], [m[0][1]])
        jax.block_until_ready(y[0].c0)
        t0=lap("cmult 3x WARM", t0)
    else:
        t0=time.time()
    # 4. HE->SS and SS->HE (1 slot)
    net_barrier = net.aggregate(np.zeros(1), lambda a,b: a+b)
    t0=time.time()
    z = m[0][0] if pid>0 else None
    z_ss = ss_he.ciphertext_to_ss(mpc, cps, z, -1, 1)
    t0=lap("ciphertext_to_ss COLD", t0)
    z_ss = ss_he.ciphertext_to_ss(mpc, cps, z, -1, 1)
    t0=lap("ciphertext_to_ss WARM", t0)
    ct = ss_he.ss_to_ciphertext(mpc, cps, z_ss[None])
    t0=lap("ss_to_ciphertext COLD", t0)
    ct = ss_he.ss_to_ciphertext(mpc, cps, z_ss[None])
    t0=lap("ss_to_ciphertext WARM", t0)
    # 5. sqrt on 1 elem
    s, si = mpc.sqrt_and_sqrt_inverse(z_ss)
    t0=lap("sqrt_and_sqrt_inverse COLD", t0)
    s, si = mpc.sqrt_and_sqrt_inverse(z_ss)
    t0=lap("sqrt_and_sqrt_inverse WARM", t0)

ts=[threading.Thread(target=work, args=(p,)) for p in range(NP)]
[t.start() for t in ts]; [t.join(timeout=1700) for t in ts]
