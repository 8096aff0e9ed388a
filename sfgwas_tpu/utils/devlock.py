"""A 'device GIL' for local-sim: one thread on the accelerator tunnel.

The TPU on this platform attaches through a single-client tunnel; a
compile RPC in flight while any other thread executes, reads back, or
compiles deadlocks the stream (measured: compile-vs-execute and
compile-vs-readback both hang; execute-vs-readback is fine).  A real
deployment gives every party its own process and chip (reference
run_example.sh: one process per party, mpc/netconnect.go mesh), but
local-sim runs all parties as threads of ONE process sharing ONE chip.

The fix is structural, not per-call: each party thread owns this global
lock for its entire compute span and releases it only while blocked in a
transport receive.  At any instant at most one thread talks to jax, so
no compile can overlap another thread's traffic; progress is guaranteed
because every inter-party dependency passes through a (lock-releasing)
receive.  Disabled (zero overhead) outside local-sim.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_tl = threading.local()
_enabled = False


def enable():
    global _enabled
    _enabled = True


def enabled() -> bool:
    return _enabled


def acquire():
    if not _enabled:
        return
    if getattr(_tl, "owner", False):
        return
    _lock.acquire()
    _tl.owner = True


def release():
    if not _enabled:
        return
    if getattr(_tl, "owner", False):
        _tl.owner = False
        _lock.release()


class yielding:
    """Release the device lock (if held) for the duration of a blocking
    wait -- transport receives wrap their queue/socket reads in this."""

    def __enter__(self):
        self._had = _enabled and getattr(_tl, "owner", False)
        if self._had:
            release()
        return self

    def __exit__(self, *exc):
        if self._had:
            acquire()
        return False
