"""Device-lock discipline for local-sim party threads (utils/devlock.py).

The lock serializes device access across in-process parties; transport
receives release it so blocked readers never starve the computing party."""

import threading
import time

import numpy as np

from sfgwas_tpu.parallel.transport import LocalCluster
from sfgwas_tpu.utils import devlock


def test_yielding_releases_during_recv():
    devlock.enable()
    try:
        cluster = LocalCluster(2)
        t0 = cluster.transport(0)
        t1 = cluster.transport(1)
        order = []

        def party0():
            devlock.acquire()
            try:
                # blocking recv must release the lock so party 1 can compute
                got = t0.recv_obj(1, timeout=30.0)
                order.append(("p0-got", got))
            finally:
                devlock.release()

        def party1():
            time.sleep(0.1)
            devlock.acquire()  # must succeed while p0 is blocked in recv
            try:
                order.append(("p1-acquired", None))
                t1.send_obj(0, np.int64(7))
            finally:
                devlock.release()

        ths = [threading.Thread(target=party0), threading.Thread(target=party1)]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=30)
        assert not any(t.is_alive() for t in ths)
        assert order[0][0] == "p1-acquired"
        assert order[1] == ("p0-got", 7)
    finally:
        # reset for other tests in this process
        devlock._enabled = False


def test_noop_when_disabled():
    assert not devlock.enabled()
    devlock.acquire()
    devlock.release()
    with devlock.yielding():
        pass
