"""CLI entry point (reference sfgwas.go:17-74).

Usage (one process per party, like run_example.sh):
    PID=0 python -m sfgwas_tpu.cli --config-global config/configGlobal.toml \
        --config-local config/configLocal.Party0.toml

The PID environment variable selects the party; the two-level TOML config
matches the reference schema.  Use --local-sim N to run all parties in one
process over the in-process mesh instead of TCP.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    # force the CPU/TPU platform decision before heavy imports
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-global", required=True)
    ap.add_argument("--config-local", default=None)
    ap.add_argument("--local-sim", type=int, default=0,
                    help="run all N+1 parties in-process (testing)")
    ap.add_argument("--platform", default=None, help="jax platform override")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # SFGWAS_STACKDUMP=<secs>: periodically dump all thread stacks to stderr
    # (watchdog-style liveness signal for long runs, reference sfgwas.go:64)
    dump_every = int(os.environ.get("SFGWAS_STACKDUMP", "0"))
    if dump_every > 0:
        import faulthandler

        faulthandler.dump_traceback_later(dump_every, repeat=True)

    from .utils.config import load_config

    if args.local_sim:
        from .parallel.transport import LocalCluster
        from .gwas.protocol import ProtocolInfo
        import threading

        nparty = args.local_sim
        cluster = LocalCluster(nparty)
        outs = [None] * nparty

        from .utils import devlock

        # all parties share one process and one accelerator tunnel: serialize
        # device access (see utils/devlock.py for the deadlock this prevents)
        devlock.enable()

        def work(pid):
            from .utils.log import log

            log(f"pid{pid} worker starting")
            devlock.acquire()
            cfg = load_config(args.config_global, args.config_local)
            # local-sim runs every party from one config: path fields may use
            # a literal {pid} placeholder for per-party data directories
            for fld in (
                "geno_binary_file_prefix", "geno_block_size_file", "pheno_file",
                "covar_file", "snp_position_file", "geno_count_file",
                "sample_keep_file", "snp_ids_file", "cache_dir", "output_dir",
            ):
                v = getattr(cfg, fld)
                if v:
                    setattr(cfg, fld, v.replace("{pid}", str(pid if pid else 1)))
            cfg.cache_dir = os.path.join(cfg.cache_dir, f"party{pid}")
            cfg.output_dir = os.path.join(cfg.output_dir, f"party{pid}")
            if pid == 0:
                # one watchdog for the whole local-sim process (sfgwas.go:64)
                from .utils.watchdog import MemoryWatchdog

                MemoryWatchdog(cfg.memory_limit).start()
            try:
                prot = ProtocolInfo(cfg, pid, transport=cluster.transport(pid))
                outs[pid] = prot.gwas()
                prot.sync_and_terminate()
            finally:
                devlock.release()

        ts = [threading.Thread(target=work, args=(p,)) for p in range(nparty)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return 0

    pid = int(os.environ.get("PID", "0"))
    cfg = load_config(args.config_global, args.config_local)
    from .gwas.protocol import ProtocolInfo
    from .utils.watchdog import MemoryWatchdog

    MemoryWatchdog(cfg.memory_limit).start()
    prot = ProtocolInfo(cfg, pid)
    prot.gwas()
    prot.sync_and_terminate()
    return 0


if __name__ == "__main__":
    sys.exit(main())
