#!/bin/bash
# In-engine self-consistency correctness gate at sf10 (100x): alternate
# formulations the repo proves equal at small sf, hash-compared inside
# Spark where single-node DuckDB cannot follow. Writes
# CORRECTNESS_SF10_self.json (see graft.tools.SelfCheck).
set -x
# refuse to race a live data regeneration (round-9 post-mortem: a bench
# started during GenScale rewrite recorded every query as failed)
if pgrep -f "graft.tools.GenScale" > /dev/null; then
  echo "GenScale is running — refusing to bench against a moving sf dir" >&2
  exit 1
fi
cd /root/repo
SNAP=$(mktemp -d /tmp/graft_classes_sc10_XXXX)
cp -r target/scala-2.13/classes/* "$SNAP/"
JAVA_FLAGS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
java $JAVA_FLAGS -Xmx64g -Dspark.ui.enabled=false -Dspark.sql.files.maxPartitionBytes=2097152 \
  -Dspark.sql.session.timeZone=UTC -cp "$SNAP:/opt/spark/jars/*" \
  graft.tools.SelfCheck /root/repo/bench-data/sf10 \
  /root/repo/CORRECTNESS_SF10_self.json > /tmp/selfcheck_sf10.log 2>&1
tail -5 /tmp/selfcheck_sf10.log
