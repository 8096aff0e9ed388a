"""Transport backends: codec roundtrip, local mesh, native TCP framing."""

import threading

import numpy as np

from sfgwas_tpu.parallel import transport as T


def test_codec_roundtrip():
    obj = {
        "a": 1,
        "b": [1.5, "x", None, True],
        "arr": np.arange(12, dtype=np.uint32).reshape(3, 4),
        "nested": (b"bytes", {"k": np.float64(2.5)}),
    }
    back = T.decode(T.encode(obj))
    assert back["a"] == 1
    assert back["b"] == [1.5, "x", None, True]
    assert (back["arr"] == obj["arr"]).all()
    assert back["nested"][0] == b"bytes"


def test_local_mesh_exchange():
    cluster = T.LocalCluster(3)
    out = {}

    def work(pid):
        net = T.Network(cluster.transport(pid), pid, 3, 1, None)
        if pid > 0:
            got = net.exchange(np.full(4, pid), 3 - pid)
            out[pid] = got

    ts = [threading.Thread(target=work, args=(p,)) for p in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert (out[1] == 2).all() and (out[2] == 1).all()


def test_native_tcp():
    from sfgwas_tpu.parallel.native_transport import NativeTCPTransport

    servers = {0: {"ip": "127.0.0.1", "ports": {1: 29301}}, 1: {"ip": "127.0.0.1", "ports": {}}}
    res = {}

    def party(pid):
        t = NativeTCPTransport(pid, 2, servers, 0, "127.0.0.1", retries=30, retry_delay_ms=100)
        if pid == 0:
            t.send_bytes(1, b"hello" * 1000)
            res[0] = t.recv_bytes(1)
        else:
            res[1] = t.recv_bytes(0)
            t.send_bytes(0, b"world")
        t.close()

    ts = [threading.Thread(target=party, args=(p,)) for p in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert res[1] == b"hello" * 1000
    assert res[0] == b"world"
