#!/bin/bash
set -u
JAR=/root/repo/target/scala-2.13/llmlogparserspark_2.13-0.1.0.jar
OUT=${SCALING_OUT:-/tmp/scaling28.jsonl}
: > "$OUT"
for r in 1 2 3 4; do
  for lvl in "2 1g 600m" "8 4g 2500m"; do
    set -- $lvl
    line=$(LANG=C.UTF-8 LC_ALL=C.UTF-8 \
      SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_CONVS=1000000 \
      SPARK_GRAFT_STAGE_BREAKDOWN=1 \
      SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SKIP_GENERIC=1 SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_SALT=0 \
      /opt/spark/bin/spark-submit --master "local[$1]" \
        --driver-memory "$2" \
        --conf spark.ui.enabled=false \
        --conf spark.sql.shuffle.partitions=$1 \
        --conf spark.local.dir=/dev/shm/graft-shuffle \
        --conf spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2 \
        --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads=$1 -Xms$2 -Xmn$3" \
        --class graft.Bench "$JAR" 2>/dev/null | grep -o '"pipeline":{[^}]*}')
    echo "{\"round\":$r,$(echo "$line" | sed 's/^"pipeline"://; s/^{//')" >> "$OUT"
    echo "round=$r cpus=$1 -> $line"
  done
done
python3 - "$OUT" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
best = {}
for r in rows:
    c = r["cpus"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
t2, t8 = best[2]["turns_per_sec"], best[8]["turns_per_sec"]
print(f"BEST 2 cores: {t2:.0f} turns/s ({best[2]['sec']:.1f}s)")
print(f"BEST 8 cores: {t8:.0f} turns/s ({best[8]['sec']:.1f}s)")
print(f"SPEEDUP {t8/t2:.2f}x  EFFICIENCY {(t8/t2)/4:.2f}")
PYEOF
