#!/bin/bash
# RunOne from a frozen classpath (same rationale as bench_frozen.sh:
# later sbt compiles cannot poison the running fork). Usage:
#   runone_frozen.sh <query[,query...]> <sfDir> <frozen-cp-dir>
# Env: REPS (default 3), EXPLAIN=1 to print the formatted plan.
set -u
NAME="$1"; SF_DIR="$2"; CP_DIR="$3"
MEM="${SPARK_DRIVER_MEM:-24g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
exec java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP_DIR:/opt/spark/jars/*" \
  graft.RunOne "$NAME" "$SF_DIR"
