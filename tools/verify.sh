#!/usr/bin/env bash
# Correctness dump WITHOUT the sbt lock: runs graft.Verify from the
# already-compiled classes (compiles once via sbt only if stale).
#
#   tools/verify.sh <sfDir> <outDir>     e.g.
#   tools/verify.sh /root/testdata/sf0.01 /tmp/verify_out
#
# Then compare against DuckDB exactly like the driver:
#   python3 tools/check_oracle.py <sfDir> <outDir>
set -euo pipefail
. "$(dirname "$0")/graft-env.sh"
graft_ensure_compiled
graft_java graft.Verify "${1:-/root/testdata/sf0.01}" "${2:-/tmp/verify_out}"
