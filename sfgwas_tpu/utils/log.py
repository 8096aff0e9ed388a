"""Timestamped progress logging (reference: onet/log LLvl1 with RFC3339
timestamps everywhere).  Enabled by default; silence with SFGWAS_QUIET=1."""

import os
import sys
import time

_QUIET = bool(os.environ.get("SFGWAS_QUIET"))
_T0 = time.time()


def log(*args):
    if not _QUIET:
        print(f"[{time.time() - _T0:9.2f}s]", *args, file=sys.stderr, flush=True)
