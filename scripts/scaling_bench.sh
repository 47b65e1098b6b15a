#!/bin/bash
# Interleaved N vs 4N scaling measurement (north rule: efficiency >= 0.8
# between N and 4N executors, evidenced here as local[8] vs local[32]).
#
# Methodology notes (this sandbox is a shared Firecracker VM with
# minute-scale co-tenant noise that swings identical runs ~2x):
#  - 8 and 32-core runs INTERLEAVE so time-varying load hits both levels
#  - each invocation runs the pipeline SPARK_GRAFT_REPEAT times and
#    reports the min; across rounds we take the per-level min again
#  - resources scale proportionally, as executors would on a real
#    cluster: heap 0.5 GB/core, ParallelGC threads = cores
#  - shuffle + sinks on tmpfs (the sandbox disk ~380 MB/s would
#    otherwise serialize every exchange and measure the disk)
#
# Usage: scaling_bench.sh [rounds] [convs]
set -u
ROUNDS=${1:-4}
CONVS=${2:-2000000}
JAR=/root/repo/target/scala-2.13/llmlogparserspark_2.13-0.1.0.jar
OUT=${SCALING_OUT:-/tmp/scaling_results.jsonl}
mkdir -p /dev/shm/graft-shuffle
: > "$OUT"
run_level() {
  local c=$1 mem=$2 xmn=$3
  LANG=C.UTF-8 LC_ALL=C.UTF-8 \
  SPARK_GRAFT_CPUS=$c SPARK_GRAFT_CONVS=$CONVS \
  SPARK_GRAFT_STAGE_BREAKDOWN=1 \
  SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SKIP_GENERIC=1 SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_SALT=0 \
  /opt/spark/bin/spark-submit --master "local[$c]" \
    --driver-memory "$mem" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=$c \
    --conf spark.local.dir=/dev/shm/graft-shuffle \
    --conf spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2 \
    --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads=$c -Xms$mem -Xmn$xmn" \
    --class graft.Bench "$JAR" 2>/dev/null | grep -o '"pipeline":{[^}]*}'
}
for r in $(seq 1 "$ROUNDS"); do
  for lvl in "8 4g 2500m" "32 16g 10g"; do
    set -- $lvl
    line=$(run_level "$1" "$2" "$3")
    echo "{\"round\":$r,$(echo "$line" | sed 's/^"pipeline"://; s/^{//')" >> "$OUT"
    echo "round=$r cpus=$1 -> $line"
  done
done
python3 - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
best = {}
for r in rows:
    c = r["cpus"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
t8, t32 = best[8]["turns_per_sec"], best[32]["turns_per_sec"]
print(f"BEST  8 cores: {t8:.0f} turns/s ({best[8]['sec']:.1f}s)")
print(f"BEST 32 cores: {t32:.0f} turns/s ({best[32]['sec']:.1f}s)")
print(f"SPEEDUP {t32/t8:.2f}x  EFFICIENCY {(t32/t8)/4:.2f}")
EOF
