#!/bin/bash
# Run graft.Bench from a FROZEN copy of the compiled classes, so later
# sbt compiles in the repo cannot poison the running fork (JVMs load
# classes lazily — the round-14/16 classfile-poisoning lesson).
# Usage: bench_frozen.sh <sfDir> <frozen-cp-dir> [reps]
set -u
SF_DIR="$1"; CP_DIR="$2"; REPS="${3:-1}"
MEM="${SPARK_DRIVER_MEM:-24g}"
# Pre-run sweep of ORPHANED Spark scratch (the r17 lesson: OOM-killed
# JVMs left 51 GiB of blockmgr-* spill debris that disk-filled a later
# batch). Age-gated like the Pin reliable-checkpoint TTL — only dirs
# untouched for SWEEP_AGE_MIN minutes (default 180, longer than any
# single suite pass) are swept, so a concurrently running JVM's live
# scratch is never touched. Override/disable via SPARK_SWEEP_AGE_MIN
# (<=0 disables).
SWEEP_AGE_MIN="${SPARK_SWEEP_AGE_MIN:-180}"
if [ "$SWEEP_AGE_MIN" -gt 0 ] 2>/dev/null; then
  for pat in 'blockmgr-*' 'spark-*' 'graft_bench_wh*' 'graft_runone_wh*' \
             'graft_verify_wh*'; do
    find "${TMPDIR:-/tmp}" -maxdepth 1 -name "$pat" -type d \
      -mmin +"$SWEEP_AGE_MIN" -exec rm -rf {} + 2>/dev/null
  done
  df -h "${TMPDIR:-/tmp}" | tail -1 >&2
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
export SPARK_GRAFT_SF_DIR="$SF_DIR"
export SPARK_GRAFT_BENCH_REPS="$REPS"
exec java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP_DIR:/opt/spark/jars/*" \
  graft.Bench
