#!/bin/bash
# Interleaved cross-jar A/B of the dedup_pipeline bench leg (round-4
# verdict item 2): BENCH_r04 showed 7.64->10.45 s wall (+37%) against
# +2.6% process CPU for the pipeline leg vs round 3. Per the BASELINE.md
# noise rules only interleaved best-of-K comparisons are valid on this
# host, so this script packages the round-3 commit's engine in a git
# worktree (with graft.PipeOnce copied in — the measurement main, added
# in round 5, calls only Bench.runPipeline, which is byte-identical at
# both commits), then alternates spark-submit runs R3,HEAD,R3,HEAD,...
# of the same local[32] pipeline leg on the same /tmp corpus and
# compares per-side minima of wall and process CPU.
#
# Usage: scripts/pipe_ab.sh [r3ref=5528dcc] [nBases=20000] [rounds=3]
# Writes PIPE_AB.json in the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

R3REF=${1:-5528dcc}
NBASES=${2:-20000}
ROUNDS=${3:-3}
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13

sbt -batch package >/dev/null
HEADJAR=$(readlink -f "$(ls target/scala-2.13/destorspark_2.13-*.jar | grep -v -- '-tests' | head -1)")

WT=/tmp/graft_r3_ab
# cache key includes the baseline ref: a rerun with a different ref must
# rebuild, or the jar under test silently stays the previous baseline's
if [ "$(cat "$WT/.built" 2>/dev/null)" != "$R3REF" ]; then
  git worktree remove --force "$WT" 2>/dev/null || true
  git worktree add --detach "$WT" "$R3REF" >/dev/null
  cp src/main/scala/graft/PipeOnce.scala "$WT/src/main/scala/graft/PipeOnce.scala"
  (cd "$WT" && sbt -batch package >/dev/null && echo "$R3REF" > .built)
fi
R3JAR=$(readlink -f "$(ls "$WT"/target/scala-2.13/destorspark_2.13-*.jar | grep -v -- '-tests' | head -1)")

run_leg() { # $1=jar $2=tag — same memory/conf as the sbt bench (Xmx48g)
  "$SPARK_HOME/bin/spark-submit" \
    --master "local[32]" \
    --class graft.PipeOnce \
    --conf spark.ui.enabled=false \
    --driver-memory 48g \
    "$1" "$NBASES" 32 2 "$2" 2>>/tmp/pipe_ab.stderr | grep '^{"tag"'
}

: > /tmp/pipe_ab.jsonl
# ABBA palindrome order: a linearly ramping co-tenant storm hits both
# sides with the same average position, unlike a fixed A,B,A,B order
# that always flatters whichever side runs first on a rising ramp.
for r in $(seq 1 "$ROUNDS"); do
  if [ $((r % 2)) -eq 1 ]; then
    echo "[pipe_ab] round $r: r3 then head ..." >&2
    run_leg "$R3JAR" r3 >> /tmp/pipe_ab.jsonl
    run_leg "$HEADJAR" head >> /tmp/pipe_ab.jsonl
  else
    echo "[pipe_ab] round $r: head then r3 ..." >&2
    run_leg "$HEADJAR" head >> /tmp/pipe_ab.jsonl
    run_leg "$R3JAR" r3 >> /tmp/pipe_ab.jsonl
  fi
done

python3 - "$NBASES" "$ROUNDS" "$R3REF" <<'EOF'
import json, sys
r3, head = [], []
for line in open('/tmp/pipe_ab.jsonl'):
    d = json.loads(line)
    (r3 if d['tag'] == 'r3' else head).append(d)
assert r3[0]['files'] == head[0]['files']
out = {
    'metric': 'pipeline_ab_r3_vs_head',
    'nBases': int(sys.argv[1]), 'rounds': int(sys.argv[2]),
    'r3ref': sys.argv[3], 'files': r3[0]['files'],
    'r3_wall': min(d['wall'] for d in r3),
    'head_wall': min(d['wall'] for d in head),
    'r3_cpu': min(d['cpu'] for d in r3),
    'head_cpu': min(d['cpu'] for d in head),
    'r3_walls': [d['wall'] for d in r3],
    'head_walls': [d['wall'] for d in head],
    'r3_cpus': [d['cpu'] for d in r3],
    'head_cpus': [d['cpu'] for d in head],
}
out['wall_ratio_head_over_r3'] = round(out['head_wall'] / out['r3_wall'], 4)
out['cpu_ratio_head_over_r3'] = round(out['head_cpu'] / out['r3_cpu'], 4)
line = json.dumps(out)
print(line)
open('PIPE_AB.json', 'w').write(line + '\n')
EOF
