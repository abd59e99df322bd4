#!/bin/bash
# Two-cluster-size scaling via the actual spark-submit entrypoint — the
# north rule's criterion run as literally as this sandbox allows: the
# packaged app jar is submitted to Spark's local-cluster master at
# 1 executor x 2 cores, then 4 executors x 2 cores (real separate
# executor JVMs launched by the distribution, jar shipped over the
# file server, shuffle/broadcast fully serialized across processes).
# Legs are interleaved A,B,A,B so co-tenant noise hits both cluster
# sizes alike; best-of-rounds per leg; work efficiency from summed
# executor CPU (BASELINE.md noise rules).
#
# Usage: scripts/submit_scaling.sh [nBases] [rounds]
# Writes SUBMIT_SCALING.json in the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

NBASES=${1:-10000}
ROUNDS=${2:-2}
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/destorspark_2.13-*.jar | grep -v -- '-tests' | head -1)

submit_leg() { # $1=workers $2=cores
  "$SPARK_HOME/bin/spark-submit" \
    --master "local-cluster[$1,$2,6144]" \
    --class graft.SubmitLeg \
    --conf spark.sql.shuffle.partitions=$(($1 * $2)) \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --conf spark.executor.memory=5g \
    --conf spark.sql.files.maxPartitionBytes=8388608 \
    --driver-memory 8g \
    "$JAR" "$NBASES" 2>>/tmp/submit_scaling.stderr | grep '^{"metric"'
}

: > /tmp/submit_legs.jsonl
for r in $(seq 1 "$ROUNDS"); do
  echo "[submit] round $r: local-cluster[1,2] ..." >&2
  submit_leg 1 2 | sed 's/$/ A/' >> /tmp/submit_legs.jsonl
  echo "[submit] round $r: local-cluster[4,2] ..." >&2
  submit_leg 4 2 | sed 's/$/ B/' >> /tmp/submit_legs.jsonl
done

python3 - <<'EOF'
import json
a, b = [], []
for line in open('/tmp/submit_legs.jsonl'):
    payload, leg = line.rsplit(' ', 1)
    (a if leg.strip() == 'A' else b).append(json.loads(payload))
ba = min(a, key=lambda r: r['sec']); bb = min(b, key=lambda r: r['sec'])
assert ba['files'] == bb['files']
thr_a = ba['files'] / ba['sec']; thr_b = bb['files'] / bb['sec']
out = {
    'metric': 'spark_submit_scaling_efficiency',
    'value': round(thr_b / (4 * thr_a), 4),
    'files': ba['files'],
    'executorsA': 1, 'executorsB': 4, 'coresPerExecutor': 2,
    'secA': ba['sec'], 'secB': bb['sec'],
    'filesPerSecA': round(thr_a, 1), 'filesPerSecB': round(thr_b, 1),
    'execCpuSecA': ba['execCpuSec'], 'execCpuSecB': bb['execCpuSec'],
    'workEfficiency': round(ba['execCpuSec'] / bb['execCpuSec'], 4),
    'submittedVia': 'spark-submit --master local-cluster',
}
line = json.dumps(out)
print(line)
open('SUBMIT_SCALING.json', 'w').write(line + '\n')
EOF
