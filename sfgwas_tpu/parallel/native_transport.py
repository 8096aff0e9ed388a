"""ctypes bindings for the native TCP transport (native/transport.cpp).

Drop-in replacement for the pure-Python TCPTransport: blocking framed sends
and receives run in C with the GIL released, so the per-(pair, thread)
channel mesh moves ciphertext/share buffers concurrently (the reference's
Go runtime does the same with goroutine-blocking syscalls,
mpc/netconnect.go + mpc/sendrecieve.go)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Dict

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        here = os.path.join(os.path.dirname(__file__), "..", "native")
        so = os.path.join(here, "libsfgtransport.so")
        if not os.path.exists(so):
            subprocess.run(["sh", os.path.join(here, "build.sh")], check=True)
        lib = ctypes.CDLL(so)
        lib.sfg_listen.restype = ctypes.c_int
        lib.sfg_listen.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.sfg_accept.restype = ctypes.c_int
        lib.sfg_accept.argtypes = [ctypes.c_int]
        lib.sfg_connect.restype = ctypes.c_int
        lib.sfg_connect.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sfg_send_frame.restype = ctypes.c_int
        lib.sfg_send_frame.argtypes = [
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.sfg_recv_frame_len.restype = ctypes.c_int64
        lib.sfg_recv_frame_len.argtypes = [ctypes.c_int]
        lib.sfg_recv_frame_body.restype = ctypes.c_int
        lib.sfg_recv_frame_body.argtypes = [
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.sfg_close.argtypes = [ctypes.c_int]
        _LIB = lib
    return _LIB


class NativeTCPTransport:
    """Same wire format and connection discipline as TCPTransport (lower pid
    listens, port = base + channel; 8-byte little-endian length prefix)."""

    def __init__(
        self,
        pid: int,
        nparty: int,
        servers: Dict[int, Dict[str, Any]],
        channel: int = 0,
        binding_ip: str = "0.0.0.0",
        retries: int = 100,
        retry_delay_ms: int = 1000,
    ):
        lib = _lib()
        self.pid = pid
        self.fds: Dict[int, int] = {}

        listen_fds = {}
        for other in range(nparty):
            if other == pid:
                continue
            a, b = min(pid, other), max(pid, other)
            port = int(servers[a]["ports"][b]) + channel
            if pid == a:
                fd = lib.sfg_listen(port, binding_ip.encode())
                assert fd >= 0, f"listen failed on {port}"
                listen_fds[other] = fd

        for other in range(nparty):
            if other == pid:
                continue
            a, b = min(pid, other), max(pid, other)
            port = int(servers[a]["ports"][b]) + channel
            if pid == a:
                fd = lib.sfg_accept(listen_fds[other])
                assert fd >= 0
                # handshake: peer announces its pid in the first frame
                n = lib.sfg_recv_frame_len(fd)
                buf = ctypes.create_string_buffer(int(n))
                lib.sfg_recv_frame_body(fd, buf, n)
                assert int.from_bytes(buf.raw, "little") == other
                self.fds[other] = fd
                lib.sfg_close(listen_fds[other])
            else:
                ip = servers[a]["ip"]
                fd = lib.sfg_connect(ip.encode(), port, retries, retry_delay_ms)
                assert fd >= 0, f"cannot reach party {other} at {ip}:{port}"
                pid_bytes = pid.to_bytes(4, "little")
                lib.sfg_send_frame(fd, pid_bytes, len(pid_bytes))
                self.fds[other] = fd

    def send_bytes(self, to: int, data: bytes):
        rc = _lib().sfg_send_frame(self.fds[to], data, len(data))
        if rc != 0:
            raise ConnectionError(f"send to {to} failed")

    def recv_bytes(self, frm: int, timeout=None) -> bytes:
        lib = _lib()
        n = lib.sfg_recv_frame_len(self.fds[frm])
        if n < 0:
            raise ConnectionError(f"recv from {frm} failed")
        buf = ctypes.create_string_buffer(int(n))
        if lib.sfg_recv_frame_body(self.fds[frm], buf, n) != 0:
            raise ConnectionError(f"recv body from {frm} failed")
        return buf.raw

    def close(self):
        for fd in self.fds.values():
            _lib().sfg_close(fd)
