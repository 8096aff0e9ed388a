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


def test_striped_transport_roundtrip():
    """(pair x channel) mesh: large frames stripe across 3 connections and
    reassemble in order; small frames ride channel 0 (StripedTransport wire
    discipline; reference mesh mpc/netconnect.go:191-216)."""
    from sfgwas_tpu.parallel.transport import make_tcp_transport

    servers = {
        0: {"ip": "127.0.0.1", "ports": {1: 29420}},
        1: {"ip": "127.0.0.1", "ports": {}},
    }
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, size=5_000_000, dtype=np.uint8).tobytes()
    small = b"ping"
    res = {}

    def party(pid):
        t = make_tcp_transport(pid, 2, servers, nchannel=3)
        if pid == 0:
            t.send_bytes(1, big)
            t.send_bytes(1, small)
            res["echo"] = t.recv_bytes(1)
        else:
            got_big = t.recv_bytes(0)
            got_small = t.recv_bytes(0)
            res["ok"] = got_big == big and got_small == small
            t.send_bytes(0, got_small + b"!")
        t.close()

    ts = [threading.Thread(target=party, args=(p,)) for p in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert res.get("ok") is True
    assert res.get("echo") == b"ping!"


def test_striped_transport_network_mpc_roundtrip():
    """Typed Network messages (arrays, nested objects) over the striped
    transport: the exact send/recv surface the MPC layer uses."""
    from sfgwas_tpu.parallel.transport import Network, make_tcp_transport

    servers = {
        0: {"ip": "127.0.0.1", "ports": {1: 29440}},
        1: {"ip": "127.0.0.1", "ports": {}},
    }
    arr = np.arange(600_000, dtype=np.uint64).reshape(3, -1)
    res = {}

    def party(pid):
        t = make_tcp_transport(pid, 2, servers, nchannel=2)
        net = Network(t, pid, 2, 1, None)
        if pid == 0:
            net.send({"arr": arr, "tag": "x"}, 1)
            res[0] = net.recv(1)
        else:
            got = net.recv(0)
            res["match"] = (got["arr"] == arr).all() and got["tag"] == "x"
            net.send([got["arr"].sum(), None, True], 0)
        net.close()

    ts = [threading.Thread(target=party, args=(p,)) for p in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert res.get("match")
    assert res[0][0] == arr.sum()
