#!/bin/bash
# Drive bench_r5_sf1_wave10.scala: the three wave-10 heavies at sf0.1 vs a
# deterministic 10x sf1, interleaved rounds in one warm local[32] JVM,
# then reduce per-query repeat-mins to wall-time slopes vs linear.
set -eu
JAR=/root/repo/target/scala-2.13/llmlogparserspark_2.13-0.1.0.jar
OUT=${GRAFT_SF1_OUT:-/tmp/bench_r5_sf1_wave10.jsonl}
SUMMARY=${GRAFT_SF1_SUMMARY:-/root/repo/scripts/bench_r5_sf1_wave10.json}
mkdir -p /dev/shm/graft-shuffle
GRAFT_SF1_OUT="$OUT" LANG=C.UTF-8 LC_ALL=C.UTF-8 \
/opt/spark/bin/spark-shell --master "local[32]" \
  --driver-memory 24g \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads=32" \
  --jars "$JAR" -I /root/repo/scripts/bench_r5_sf1_wave10.scala \
  2>/dev/null | grep -E '"round"|generated|DONE'
python3 - "$OUT" "$SUMMARY" <<'EOF'
import json, sys, collections
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
mins = collections.defaultdict(lambda: float("inf"))
runs = collections.defaultdict(int)
for r in rows:
    k = (r["query"], r["sf"])
    mins[k] = min(mins[k], r["sec"]); runs[k] += 1
queries = sorted(set(q for q, _ in mins))
out = {"scale_ratio": 10, "rounds": max(r["round"] for r in rows),
       "queries": {}}
for q in queries:
    a, b = mins[(q, "sf0.1")], mins[(q, "sf1")]
    out["queries"][q] = {
        "sf0.1_min_sec": round(a, 3), "sf1_min_sec": round(b, 3),
        "ratio": round(b / a, 2), "slope_vs_linear": round(b / a / 10, 2)}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print(json.dumps(out["queries"], indent=1))
EOF
