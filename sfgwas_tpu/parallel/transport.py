"""Party-to-party communication backend.

TPU-native replacement for the reference's TCP socket mesh
(mpc/netconnect.go, mpc/sendrecieve.go, mpc/marshal.go):

* full mesh, one logical channel per (party pair, protocol thread);
* blocking, length-prefixed, typed binary messages;
* pid-ordered symmetric exchange to avoid deadlocks
  (mpc/sendrecieve.go:434-449);
* per-peer sent/received byte + message counters with enable/disable and
  reset/print, the reference's main observability feature
  (mpc/netconnect.go:36-122).

Backends:
  LocalCluster  -- in-process thread mesh over queues (the `run_example.sh`
                   single-machine simulation, without processes);
  TCP sockets   -- lower pid listens; port = configured base + channel id
                   (mpc/netconnect.go:191-216), with connect retries.

The wire codec handles ints, floats, bytes, strings, numpy arrays and nested
lists/tuples/dicts; ciphertexts and ring shares travel as numpy arrays.
"""

from __future__ import annotations

import io
import os
import queue
import socket
import struct
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..utils import devlock

# ---------------------------------------------------------------------------
# Codec


def _enc(obj, out: io.BytesIO):
    if obj is None:
        out.write(b"N")
    elif isinstance(obj, bool):
        out.write(b"b" + (b"\x01" if obj else b"\x00"))
    elif isinstance(obj, (int, np.integer)):
        out.write(b"I" + struct.pack("<q", int(obj)))
    elif isinstance(obj, float):
        out.write(b"F" + struct.pack("<d", obj))
    elif isinstance(obj, bytes):
        out.write(b"B" + struct.pack("<q", len(obj)) + obj)
    elif isinstance(obj, str):
        e = obj.encode()
        out.write(b"S" + struct.pack("<q", len(e)) + e)
    elif isinstance(obj, np.ndarray):
        a = np.ascontiguousarray(obj)
        dt = a.dtype.str.encode()
        out.write(b"A" + struct.pack("<B", len(dt)) + dt)
        out.write(struct.pack("<B", a.ndim))
        out.write(struct.pack(f"<{a.ndim}q", *a.shape))
        out.write(a.tobytes())
    elif isinstance(obj, (list, tuple)):
        tag = b"L" if isinstance(obj, list) else b"T"
        out.write(tag + struct.pack("<q", len(obj)))
        for it in obj:
            _enc(it, out)
    elif isinstance(obj, dict):
        out.write(b"D" + struct.pack("<q", len(obj)))
        for k, v in obj.items():
            _enc(k, out)
            _enc(v, out)
    else:
        # jax arrays and other array-likes
        arr = np.asarray(obj)
        if arr.dtype == object:
            raise TypeError(f"cannot serialize {type(obj)}")
        _enc(arr, out)


def _dec(buf: io.BytesIO):
    tag = buf.read(1)
    if tag == b"N":
        return None
    if tag == b"b":
        return buf.read(1) == b"\x01"
    if tag == b"I":
        return struct.unpack("<q", buf.read(8))[0]
    if tag == b"F":
        return struct.unpack("<d", buf.read(8))[0]
    if tag == b"B":
        (n,) = struct.unpack("<q", buf.read(8))
        return buf.read(n)
    if tag == b"S":
        (n,) = struct.unpack("<q", buf.read(8))
        return buf.read(n).decode()
    if tag == b"A":
        (dl,) = struct.unpack("<B", buf.read(1))
        dt = np.dtype(buf.read(dl).decode())
        (nd,) = struct.unpack("<B", buf.read(1))
        shape = struct.unpack(f"<{nd}q", buf.read(8 * nd)) if nd else ()
        count = int(np.prod(shape)) if shape else 1
        data = buf.read(count * dt.itemsize)
        return np.frombuffer(data, dtype=dt).reshape(shape).copy()
    if tag in (b"L", b"T"):
        (n,) = struct.unpack("<q", buf.read(8))
        items = [_dec(buf) for _ in range(n)]
        return items if tag == b"L" else tuple(items)
    if tag == b"D":
        (n,) = struct.unpack("<q", buf.read(8))
        return {_dec(buf): _dec(buf) for _ in range(n)}
    raise ValueError(f"bad tag {tag!r}")


def encode(obj) -> bytes:
    out = io.BytesIO()
    _enc(obj, out)
    return out.getvalue()


def decode(data: bytes):
    return _dec(io.BytesIO(data))


# ---------------------------------------------------------------------------
# Transports


class LocalCluster:
    """In-process mesh: queues per (src, dst, channel)."""

    def __init__(self, nparty: int, nchannel: int = 1):
        self.nparty = nparty
        self.nchannel = nchannel
        self.queues: Dict[tuple, queue.Queue] = {}
        for s in range(nparty):
            for d in range(nparty):
                for c in range(nchannel):
                    if s != d:
                        self.queues[(s, d, c)] = queue.Queue()

    def transport(self, pid: int, channel: int = 0) -> "LocalTransport":
        return LocalTransport(self, pid, channel)


def _to_host(obj):
    """Normalize a message for zero-copy local delivery: device arrays
    become host views, numpy arrays are frozen (writeable=False) so neither
    side can mutate the now-shared buffer.  Matches the codec's contract
    (receivers always see numpy arrays) without the serialize+copy."""
    if isinstance(obj, np.ndarray):
        try:
            obj.flags.writeable = False
        except ValueError:
            pass
        return obj
    if isinstance(obj, (type(None), bool, int, float, bytes, str, np.integer)):
        return obj
    if isinstance(obj, list):
        return [_to_host(x) for x in obj]
    if isinstance(obj, tuple):
        return tuple(_to_host(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, jax.Array):
        # device arrays pass by reference: immutable, and device->host
        # readback through the accelerator tunnel is ~100x slower than
        # host->device -- collective protocol shares must stay on-device
        return obj
    arr = np.asarray(obj)
    if arr.dtype == object:
        raise TypeError(f"cannot send {type(obj)}")
    return _to_host(arr)


def _approx_size(obj) -> int:
    """Logical wire size for the byte counters (zero-copy path)."""
    if isinstance(obj, (np.ndarray, jax.Array)):
        return obj.nbytes + 16
    if isinstance(obj, (list, tuple)):
        return 9 + sum(_approx_size(x) for x in obj)
    if isinstance(obj, dict):
        return 9 + sum(_approx_size(k) + _approx_size(v) for k, v in obj.items())
    if isinstance(obj, (bytes, str)):
        return len(obj) + 9
    return 9


class LocalTransport:
    """In-process transport: messages pass as Python object references
    (zero-copy).  On this image fresh memory faults in at ~10 MB/s
    (lazily-backed VM pages), so the serialize+copy of the byte codec --
    and every duplicated buffer -- costs ~100 ms per MB of NEW footprint;
    sharing one frozen buffer across party threads sidesteps both."""

    zero_copy = True

    def __init__(self, cluster: LocalCluster, pid: int, channel: int):
        self.cluster = cluster
        self.pid = pid
        self.channel = channel

    def send_obj(self, to: int, obj):
        self.cluster.queues[(self.pid, to, self.channel)].put(obj)

    def recv_obj(self, frm: int, timeout: Optional[float] = 3600.0):
        with devlock.yielding():
            return self.cluster.queues[(frm, self.pid, self.channel)].get(
                timeout=timeout
            )

    def send_bytes(self, to: int, data: bytes):
        self.cluster.queues[(self.pid, to, self.channel)].put(data)

    def recv_bytes(self, frm: int, timeout: Optional[float] = 3600.0) -> bytes:
        with devlock.yielding():
            return self.cluster.queues[(frm, self.pid, self.channel)].get(
                timeout=timeout
            )

    def close(self):
        pass


class TCPTransport:
    """Socket per peer; lower pid listens (mpc/netconnect.go:185-216)."""

    def __init__(
        self,
        pid: int,
        nparty: int,
        servers: Dict[int, Dict[str, Any]],
        channel: int = 0,
        binding_ip: str = "0.0.0.0",
        retries: int = 100,
        retry_delay: float = 1.0,
    ):
        # servers[pid] = {"ip": str, "ports": {other_pid: base_port}}
        self.pid = pid
        self.socks: Dict[int, socket.socket] = {}
        self.lock: Dict[int, threading.Lock] = {}

        listen_socks = {}
        for other in range(nparty):
            if other == pid:
                continue
            a, b = min(pid, other), max(pid, other)
            base_port = int(servers[a]["ports"][b])
            port = base_port + channel
            if pid == a:  # listen
                srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                srv.bind((binding_ip, port))
                srv.listen(1)
                listen_socks[other] = srv

        for other in range(nparty):
            if other == pid:
                continue
            a, b = min(pid, other), max(pid, other)
            port = int(servers[a]["ports"][b]) + channel
            if pid == a:
                conn, _ = listen_socks[other].accept()
                # handshake: peer announces pid
                peer = struct.unpack("<i", self._recvn(conn, 4))[0]
                assert peer == other
                self.socks[other] = conn
                listen_socks[other].close()
            else:
                ip = servers[a]["ip"]
                for attempt in range(retries):
                    try:
                        s = socket.create_connection((ip, port), timeout=10)
                        break
                    except OSError:
                        time.sleep(retry_delay)
                else:
                    raise ConnectionError(f"cannot reach party {other} at {ip}:{port}")
                s.sendall(struct.pack("<i", pid))
                self.socks[other] = s
            self.socks[other].setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.lock[other] = threading.Lock()

    @staticmethod
    def _recvn(sock, n: int) -> bytes:
        chunks = []
        while n > 0:
            b = sock.recv(min(n, 1 << 20))
            if not b:
                raise ConnectionError("peer closed")
            chunks.append(b)
            n -= len(b)
        return b"".join(chunks)

    def send_bytes(self, to: int, data: bytes):
        with self.lock[to]:
            self.socks[to].sendall(struct.pack("<q", len(data)) + data)

    def recv_bytes(self, frm: int, timeout: Optional[float] = None) -> bytes:
        (n,) = struct.unpack("<q", self._recvn(self.socks[frm], 8))
        return self._recvn(self.socks[frm], n)

    def close(self):
        for s in self.socks.values():
            try:
                s.close()
            except OSError:
                pass


class StripedTransport:
    """(pair x channel) socket mesh (mpc/netconnect.go:126-233): K parallel
    TCP connections per party pair, port = base + channel.  The reference
    dedicates one channel to each MPC worker thread; here the SS/HE engines
    are vectorized (one protocol thread), so the channels are used to STRIPE
    each large frame instead -- the stripes move concurrently through
    GIL-released sendall/recv syscalls, which multiplies per-pair throughput
    on links where a single TCP stream can't fill the pipe (the same reason
    the reference fans its connections out).

    Wire discipline per logical message:
      channel 0 frame:  1-byte tag (0 = whole payload inline; 1 = striped)
                        + inline payload, or, when striped, <q total_len>
                        + stripe 0.
      channel c frame:  stripe c (c = 1..K-1), only when striped.
    FIFO order per pair is defined entirely by channel-0 frames, so the
    blocking recv discipline of the single-channel transports is preserved.
    """

    # frames below this ride channel 0 whole (env override for tests)
    STRIPE_MIN = int(os.environ.get("SFGWAS_STRIPE_MIN", 1 << 20))

    def __init__(self, make_channel, nchannel: int):
        # make_channel(c) -> single-channel transport (TCPTransport or
        # NativeTCPTransport) listening/connecting on port base + c
        assert nchannel >= 1
        self.chans = [make_channel(c) for c in range(nchannel)]
        self.nchannel = nchannel
        self._broken = False
        self._pool = (
            ThreadPoolExecutor(max_workers=nchannel - 1, thread_name_prefix="stripe")
            if nchannel > 1
            else None
        )

    def send_bytes(self, to: int, data: bytes):
        k = self.nchannel
        if k == 1 or len(data) < self.STRIPE_MIN:
            self.chans[0].send_bytes(to, b"\x00" + data)
            return
        step = (len(data) + k - 1) // k
        stripes = [data[i * step : (i + 1) * step] for i in range(k)]
        futs = [
            self._pool.submit(self.chans[c].send_bytes, to, stripes[c])
            for c in range(1, k)
        ]
        self.chans[0].send_bytes(
            to, b"\x01" + struct.pack("<q", len(data)) + stripes[0]
        )
        for f in futs:
            f.result()

    def recv_bytes(self, frm: int, timeout: Optional[float] = None) -> bytes:
        if self._broken:
            raise ConnectionError("striped transport broken by earlier failure")
        head = self.chans[0].recv_bytes(frm, timeout)
        tag = head[:1]
        if tag == b"\x00":
            return head[1:]
        (total,) = struct.unpack("<q", head[1:9])
        k = self.nchannel
        futs = [
            self._pool.submit(self.chans[c].recv_bytes, frm, timeout)
            for c in range(1, k)
        ]
        try:
            parts = [head[9:]] + [f.result() for f in futs]
        except Exception:
            # the channel-0 header and some stripes were consumed: the
            # per-pair streams are desynchronized beyond repair — fail the
            # whole mesh fast rather than decode garbage on the next frame
            self._broken = True
            self.close()
            raise
        out = b"".join(parts)
        assert len(out) == total, (len(out), total)
        return out

    def close(self):
        for ch in self.chans:
            ch.close()
        if self._pool:
            self._pool.shutdown(wait=False)


def make_tcp_transport(
    pid: int,
    nparty: int,
    servers: Dict[int, Dict[str, Any]],
    nchannel: int = 1,
    binding_ip: str = "0.0.0.0",
):
    """The production transport factory: native framed TCP when the C lib
    builds, pure-Python sockets otherwise; striped across `nchannel`
    connections per pair when nchannel > 1 (the reference's
    (pair x thread) mesh, mpc/netconnect.go:191-216)."""

    if nchannel > 1:
        # base ports must be >= nchannel apart or pair (a,b) channel k
        # collides with pair (a,c) channel 0 (the reference's config layout
        # spaces them by 100 for the same reason)
        bases = sorted(
            int(port)
            for a in range(nparty)
            for port in servers.get(a, {}).get("ports", {}).values()
        )
        for lo, hi in zip(bases, bases[1:]):
            if hi - lo < nchannel:
                raise ValueError(
                    f"pair base ports {lo} and {hi} are closer than "
                    f"mpc_num_threads={nchannel}; striped channels would "
                    f"collide — space the ports.party* bases further apart"
                )

    def make_channel(c: int):
        try:
            from .native_transport import NativeTCPTransport

            return NativeTCPTransport(pid, nparty, servers, c, binding_ip)
        except ConnectionError:
            raise
        except Exception:
            return TCPTransport(pid, nparty, servers, c, binding_ip)

    if nchannel <= 1:
        return make_channel(0)
    return StripedTransport(make_channel, nchannel)


# ---------------------------------------------------------------------------
# Network: typed messaging + counters + hub helpers


class Network:
    def __init__(self, transport, pid: int, nparty: int, hub_pid: int = 1, rand=None):
        self.t = transport
        self.pid = pid
        self.nparty = nparty
        self.hub_pid = hub_pid
        self.rand = rand
        self.log_enabled = True
        self.reset_log()

    # -- counters (mpc/netconnect.go:36-122) --------------------------------

    def reset_log(self):
        self.sent_bytes = {p: 0 for p in range(self.nparty)}
        self.recv_bytes = {p: 0 for p in range(self.nparty)}
        self.sent_msgs = {p: 0 for p in range(self.nparty)}
        self.recv_msgs = {p: 0 for p in range(self.nparty)}

    def enable_logging(self):
        self.log_enabled = True

    def disable_logging(self):
        self.log_enabled = False

    def print_log(self):
        for p in range(self.nparty):
            if p == self.pid:
                continue
            print(
                f"[net pid={self.pid}] peer {p}: sent {self.sent_bytes[p]} B "
                f"({self.sent_msgs[p]} msgs), recv {self.recv_bytes[p]} B "
                f"({self.recv_msgs[p]} msgs)"
            )

    # -- typed send/recv ----------------------------------------------------

    def send(self, obj, to: int):
        if getattr(self.t, "zero_copy", False):
            obj = _to_host(obj)
            if self.log_enabled:
                self.sent_bytes[to] += _approx_size(obj)
                self.sent_msgs[to] += 1
            self.t.send_obj(to, obj)
            return
        data = encode(obj)
        if self.log_enabled:
            self.sent_bytes[to] += len(data)
            self.sent_msgs[to] += 1
        self.t.send_bytes(to, data)

    def recv(self, frm: int):
        if getattr(self.t, "zero_copy", False):
            obj = self.t.recv_obj(frm)
            if self.log_enabled:
                self.recv_bytes[frm] += _approx_size(obj)
                self.recv_msgs[frm] += 1
            return obj
        data = self.t.recv_bytes(frm)
        if self.log_enabled:
            self.recv_bytes[frm] += len(data)
            self.recv_msgs[frm] += 1
        return decode(data)

    def send_int(self, v: int, to: int):
        self.send(int(v), to)

    def recv_int(self, frm: int) -> int:
        v = self.recv(frm)
        assert isinstance(v, int)
        return v

    def exchange(self, obj, other: int):
        """Symmetric exchange, ordered by pid (mpc/sendrecieve.go:434-449)."""
        if self.pid < other:
            self.send(obj, other)
            return self.recv(other)
        got = self.recv(other)
        self.send(obj, other)
        return got

    # -- hub aggregation trees (mpc/aggregate.go:466-500) -------------------

    def hub_gather_sum(self, x, add_fn, include_zero: bool = False):
        """Data parties send to hub; hub returns the sum (only at hub).
        Parties below `first` (the dealer, unless include_zero) do not
        participate and get their input back (mpc/aggregate.go pid>0
        guards)."""
        first = 0 if include_zero else 1
        if self.pid < first:
            return x
        if self.pid == self.hub_pid:
            acc = x
            for p in range(first, self.nparty):
                if p == self.pid:
                    continue
                acc = add_fn(acc, self.recv(p))
            return acc
        self.send(x, self.hub_pid)
        return None

    def hub_broadcast(self, x, include_zero: bool = False):
        first = 0 if include_zero else 1
        if self.pid < first:
            return x
        if self.pid == self.hub_pid:
            for p in range(first, self.nparty):
                if p != self.pid:
                    self.send(x, p)
            return x
        return self.recv(self.hub_pid)

    def aggregate(self, x, add_fn, include_zero: bool = False):
        """Gather-add at hub then broadcast back (participating parties all
        get the sum; the dealer gets its input back)."""
        s = self.hub_gather_sum(x, add_fn, include_zero)
        return self.hub_broadcast(s, include_zero)

    def close(self):
        self.t.close()
