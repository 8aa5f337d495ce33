#!/usr/bin/env bash
# Standalone-cluster benchmark driver (north rule: "run via spark-submit on
# a multi-executor cluster at two cluster sizes").
#
# Topology: one standalone master + K separate worker JVMs on this box,
# 4 cores + 9g per worker, one 4-core/8g executor per worker. Two sizes:
# K=2 (N) and K=8 (4N) — resources scale with executor count, per-executor
# shape fixed, exactly the real-cluster scaling experiment. Each run goes
# through spark-submit with the application jar, so task serialization,
# executor classloading, the inter-JVM shuffle transport, and the
# distributed commit protocol are all the real thing.
#
# Usage: scripts/cluster_bench.sh [sfDir]   (default /root/testdata/sf0.1)
# Writes CLUSTER_BENCH.json to the repo root and prints a summary.
set -euo pipefail

SF_DIR="${1:-/root/testdata/sf0.1}"
REPO=/root/repo
SPARK=/opt/spark
MASTER_URL="spark://127.0.0.1:7077"
export SPARK_LOG_DIR=/tmp/spark-logs
export SPARK_PID_DIR=/tmp/spark-pids
export SPARK_LOCAL_IP=127.0.0.1
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR"

JAR=$(ls -t "$REPO"/target/scala-2.13/*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then
  echo "no application jar — run: sbt -batch package" >&2
  exit 1
fi

WORKER_PIDS=()

cleanup() {
  for p in "${WORKER_PIDS[@]:-}"; do kill "$p" 2>/dev/null || true; done
  "$SPARK/sbin/stop-master.sh" >/dev/null 2>&1 || true
  pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null || true
}
trap cleanup EXIT

start_workers() {
  local k=$1
  for i in $(seq 1 "$k"); do
    SPARK_WORKER_DIR=/tmp/spark-work-$i \
      "$SPARK/bin/spark-class" org.apache.spark.deploy.worker.Worker \
      --cores 4 --memory 13g --port 0 --webui-port 0 "$MASTER_URL" \
      > "$SPARK_LOG_DIR/worker-$i.log" 2>&1 &
    WORKER_PIDS+=($!)
  done
}

stop_workers() {
  for p in "${WORKER_PIDS[@]:-}"; do kill "$p" 2>/dev/null || true; done
  WORKER_PIDS=()
  sleep 2
}

run_level() {
  local k=$1
  start_workers "$k"
  sleep 5
  local out
  out=$("$SPARK/bin/spark-submit" \
    --master "$MASTER_URL" \
    --class graft.ClusterBench \
    --driver-memory 6g \
    --conf spark.executor.cores=4 \
    --conf spark.executor.memory=12g \
    --conf spark.cores.max=$((4 * k)) \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    "$JAR" "$SF_DIR" 2>"$SPARK_LOG_DIR/submit-$k.log" | grep GRAFT_CLUSTER_RESULT)
  stop_workers
  echo "$out"
}

echo "== starting standalone master"
"$SPARK/sbin/stop-master.sh" >/dev/null 2>&1 || true
SPARK_MASTER_HOST=127.0.0.1 "$SPARK/sbin/start-master.sh" >/dev/null
sleep 3

echo "== level N: 2 workers x (4 cores, 8g executor)"
R2=$(run_level 2)
echo "$R2"
echo "== level 4N: 8 workers x (4 cores, 8g executor)"
R8=$(run_level 8)
echo "$R8"

python3 - "$R2" "$R8" "$SF_DIR" <<'EOF'
import json, sys
def parse(line):
    p = line.split()
    return {"executors": int(p[1]), "cores": int(p[2]), "n_pages": int(p[3]),
            "agg_sec": float(p[4]), "write_sec": float(p[5]), "shuffle_sec": float(p[6]),
            "cached_sec": float(p[7]), "agg_band": [float(p[8]), float(p[9])],
            "cached_band": [float(p[10]), float(p[11])]}
n, n4 = parse(sys.argv[1]), parse(sys.argv[2])
out = {
    "topology": "standalone master + separate worker JVMs via spark-submit",
    "per_executor": "4 cores, 12g heap, one executor per worker",
    "sf": sys.argv[3],
    "N": n, "4N": n4,
    "pages_per_sec_N": round(n["n_pages"] / n["agg_sec"], 1),
    "pages_per_sec_4N": round(n4["n_pages"] / n4["agg_sec"], 1),
    "scaling_efficiency_agg": round(n["agg_sec"] / n4["agg_sec"] / 4.0, 3),
    "scaling_efficiency_write": round(n["write_sec"] / n4["write_sec"] / 4.0, 3),
    "scaling_efficiency_shuffle": round(n["shuffle_sec"] / n4["shuffle_sec"] / 4.0, 3),
    "scaling_efficiency_cached": round(n["cached_sec"] / n4["cached_sec"] / 4.0, 3),
}
with open("/root/repo/CLUSTER_BENCH.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
EOF
