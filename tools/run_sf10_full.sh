#!/bin/bash
# sf10 (100x, ~60M lineitem / 500k docs) FULL-surface spark-side bench.
# No DuckDB leg — the artifact is Spark-side scaling across every query.
#
# Skip list = the pair-output dedup queries whose OUTPUT grows
# quadratically BY CONSTRUCTION of the generator (GenScale clones each
# document 1000x at sf10, so clone-group pair counts grow ~100x beyond
# linear — generator artifact, not operator cost; measured and explained
# at sf1 in BENCH_NOTES_r08.md). Everything else runs.
set -x
cd /root/repo
SNAP=$(mktemp -d /tmp/graft_classes_sf10f_XXXX)
cp -r target/scala-2.13/classes/* "$SNAP/"
JAVA_FLAGS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JAVA_FLAGS="$JAVA_FLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
SKIP=dedup_segment_near,dedup_ngram_jaccard,dedup_minhash_lsh
SKIP=$SKIP,dedup_simhash,dedup_semantic,dedup_embedding_cosine
SKIP=$SKIP,dedup_span_detect,corpus_decontaminate
SPARK_GRAFT_SF_DIR=/root/repo/bench-data/sf10 \
SPARK_GRAFT_ORACLE_WALL=0 \
SPARK_GRAFT_SKIP=$SKIP \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_SF10_spark.json \
java $JAVA_FLAGS -Xmx80g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$SNAP:/opt/spark/jars/*" \
  graft.Bench > /tmp/sf10_bench.log 2>&1
tail -3 /tmp/sf10_bench.log
