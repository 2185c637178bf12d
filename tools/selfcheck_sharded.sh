#!/bin/bash
# Run tools/selfcheck.py over all queries() keys in N parallel shards
# (each its own Spark session) — same checks as the monolithic sweep,
# ~Nx the throughput on a driver-bound tiny-SF workload.
# Usage: tools/selfcheck_sharded.sh [sf_dir] [n_shards] [out_prefix]
set -u
SF=${1:-/root/testdata/sf0.01}
N=${2:-3}
PFX=${3:-/tmp/selfcheck_shard}
cd "$(dirname "$0")/.."
python - "$N" <<'EOF' > /tmp/_shard_keys
import sys
sys.path.insert(0, ".")
import __spark_entry__ as e
keys = list(e.queries())
n = int(sys.argv[1])
for i in range(n):
    print(" ".join(keys[i::n]))
EOF
i=0
pids=()
while IFS= read -r line; do
  SELFCHECK_JSON="${PFX}_${i}.json" SPARK_GRAFT_CPUS=12 \
    python tools/selfcheck.py "$SF" $line > "${PFX}_${i}.log" 2>&1 &
  pids+=($!)
  i=$((i+1))
done < /tmp/_shard_keys
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done
grep -h "failures /" ${PFX}_*.log
exit $rc
