#!/usr/bin/env bash
# Benchmark WITHOUT the sbt lock: runs graft.Bench from the already-
# compiled classes. Env knobs are the same as `runMain graft.Bench`:
#   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#   SPARK_GRAFT_CPUS / SPARK_GRAFT_SCALE_{LO,HI,REPS,PAGES} / SPARK_GRAFT_BATTERY_REPS
set -euo pipefail
. "$(dirname "$0")/graft-env.sh"
graft_ensure_compiled
graft_java graft.Bench "$@"
