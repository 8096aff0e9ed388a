#!/bin/sh
# Launch one process per party against config/ (reference run_example.sh).
for PID in 0 1 2; do
  PID=$PID python -m sfgwas_tpu.cli \
      --config-global config/configGlobal.toml \
      --config-local config/configLocal.Party$PID.toml \
      > stdout_party$PID.txt 2>&1 &
done
wait
