#!/bin/bash
# Interleaved N vs 4N scaling measurement (north rule: efficiency >= 0.8).
# The sandbox VM has heavy co-tenant noise, so single-shot A-then-B runs
# confound time-varying load with parallelism. This interleaves
# 8,32,8,32,... and reports the per-level MIN across rounds.
# Usage: scaling_bench.sh [rounds] [convs]
set -u
ROUNDS=${1:-3}
CONVS=${2:-240000}
JAR=/root/repo/target/scala-2.13/llmlogparserspark_2.13-0.1.0.jar
OUT=${SCALING_OUT:-/tmp/scaling_results.jsonl}
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  for c in 8 32; do
    line=$(LANG=C.UTF-8 LC_ALL=C.UTF-8 \
      SPARK_GRAFT_CPUS=$c SPARK_GRAFT_CONVS=$CONVS \
      SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_REPEAT=2 \
      /opt/spark/bin/spark-submit --master "local[$c]" \
        --driver-memory 48g \
        --conf spark.ui.enabled=false \
        --conf spark.sql.shuffle.partitions=$c \
        --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC -Xms48g -Dspark.sql.session.timeZone=UTC" \
        --class graft.Bench "$JAR" 2>/dev/null | grep -o '"pipeline":{[^}]*}')
    echo "{\"round\":$r,$(echo "$line" | sed 's/^"pipeline"://; s/^{//')" >> "$OUT"
    echo "round=$r cpus=$c -> $line"
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
if "8" in {str(k) for k in best} or 8 in best:
    t8, t32 = best[8]["turns_per_sec"], best[32]["turns_per_sec"]
    print(f"BEST  8 cores: {t8:.0f} turns/s ({best[8]['sec']:.1f}s)")
    print(f"BEST 32 cores: {t32:.0f} turns/s ({best[32]['sec']:.1f}s)")
    print(f"SPEEDUP {t32/t8:.2f}x  EFFICIENCY {(t32/t8)/4:.2f}")
EOF
