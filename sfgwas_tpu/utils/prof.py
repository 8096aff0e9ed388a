"""Opt-in wall-clock attribution for protocol hot spots.

Enable with SFGWAS_PROF=1: `span("name")` contexts accumulate per-thread
wall time; dump() prints totals.  Zero overhead when disabled."""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager, nullcontext

ENABLED = bool(os.environ.get("SFGWAS_PROF"))
_local = threading.local()


def _acc():
    d = getattr(_local, "d", None)
    if d is None:
        d = _local.d = defaultdict(lambda: [0.0, 0])
    return d


@contextmanager
def _span(name: str):
    d = _acc()
    t0 = time.time()
    try:
        yield
    finally:
        e = d[name]
        e[0] += time.time() - t0
        e[1] += 1


def span(name: str):
    return _span(name) if ENABLED else nullcontext()


def dump(tag: str = ""):
    if not ENABLED:
        return
    d = _acc()
    items = sorted(d.items(), key=lambda kv: -kv[1][0])
    print(
        f"[prof {tag}] "
        + "  ".join(f"{k}={v[0]:.1f}s/{v[1]}" for k, v in items[:12]),
        flush=True,
    )


def reset():
    if ENABLED:
        _acc().clear()
