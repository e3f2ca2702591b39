#!/bin/bash
# Round-13 single-commit artifact refresh: PLANS.md, BENCH_SELF (sf0.1 with
# the DuckDB oracle leg), sf1 pipeline, sf10 full bench, sf10 self-check —
# run in sequence on an otherwise idle box.
set -x
cd /root/repo
if pgrep -f "graft.tools.GenScale" > /dev/null; then
  echo "GenScale running — abort" >&2; exit 1
fi
JAVA_FLAGS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
SNAP=$(mktemp -d /tmp/graft_r13_classes_XXXX)
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

echo "=== 0. PLANS.md (sf0.01) ==="
java $JAVA_FLAGS -Xmx16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.PlanAudit /root/testdata/sf0.01 \
  > /root/repo/PLANS.md 2>/tmp/r13_plans.log || { echo "PLANS FAILED"; }

echo "=== 1. BENCH_SELF at sf0.1 (with DuckDB oracle leg) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_SELF.json \
java $JAVA_FLAGS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.files.maxPartitionBytes=2097152 \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
  > /tmp/r13_self_bench.log 2>&1
tail -2 /tmp/r13_self_bench.log

echo "=== 2. sf1 pipeline ==="
bash tools/run_sf1.sh

echo "=== 3. sf10 full bench ==="
bash tools/run_sf10_full.sh

echo "=== 4. sf10 self-check (17 pairs) ==="
bash tools/run_selfcheck_sf10.sh

echo "=== r13 artifact chain done ==="
