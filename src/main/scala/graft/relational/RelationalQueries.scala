package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.cdc.model.Changelog._

/** The general-relational operators SURVEY.md §2 marks "absent in the
  * reference, free from Spark" (J3 as-of join, W3 window functions, O4 set
  * ops, A7 rollup/cube) — implemented so a reference user gets the full
  * query surface from one library.
  */
object RelationalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J3 — as-of join: for each change event, the latest order (by
    // o_orderdate, ties by o_orderkey) of that user at or before the event
    // time. Equi-join on the key + max_by aggregation: shuffles once by
    // join key, partial-aggregates map-side — the scalable as-of shape
    // (no window sort over the fact table).
    "asof_join_last_event" -> ((s, dir) => {
      val ev = changelog(s, dir).select(col("offset"), col("pk"), col("ts_ms"))
      // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast to
      // TIMESTAMP is an identity relabel. Order dates have no sub-second
      // component, so pack (epoch-seconds, orderkey) into one bigint:
      // seconds (~1e9) * 1e9 + orderkey (< 1e9) stays under Long.MaxValue
      // at any realistic SF, unlike a millis*1e5 packing which overflows
      // its key slot once o_orderkey passes 100k.
      val odSec = expr("unix_millis(cast(o_orderdate as timestamp)) div 1000")
      // the 1e9 key slot holds TPC-H orderkeys up to ~SF 40; beyond that the
      // packing would silently collide, so the validator hook (P9) turns a
      // quiet corruption into a loud job failure
      val ord = graft.cdc.merge.ChangelogOps.validated(
          table(s, dir, "orders"),
          col("o_orderkey") < 1000000000L && col("o_orderkey") >= 0L,
          "asof_join_last_event: o_orderkey exceeds the 1e9 packing slot")
        .select(
          col("o_custkey"),
          (odSec * 1000000000L + col("o_orderkey")).as("od_key"),
          (odSec * 1000).as("od_ms")
        )
      ev.join(ord, col("pk") === col("o_custkey") && col("od_ms") <= col("ts_ms"))
        .groupBy(col("offset"), col("pk"))
        .agg(max(col("od_key")).as("m"))
        .select(col("offset"), col("pk"),
          expr("m % 1000000000").as("o_orderkey"),
          expr("(m div 1000000000) * 1000").as("o_orderdate_ms"))
    }),

    // J3 — interval (time-range) self-join: pairs of events by the same
    // user within one hour. Candidates come from same-or-adjacent hour
    // buckets (equi-join keys), not a cross join — the standard scalable
    // range-join formulation; the exact |Δt| predicate filters after.
    "interval_join" -> ((s, dir) => {
      val ev = changelog(s, dir).select(col("offset"), col("pk"), col("ts_ms"))
      val bucketed = ev.withColumn("bucket", expr("ts_ms div 3600000"))
      val left = bucketed.select(col("offset").as("l_off"), col("pk"),
        col("ts_ms").as("l_ts"), col("bucket"))
      val right = bucketed.select(col("offset").as("r_off"), col("pk"),
        col("ts_ms").as("r_ts"), explode(array(col("bucket"), col("bucket") + 1,
          col("bucket") - 1)).as("bucket"))
      left.join(right, Seq("pk", "bucket"))
        .where(col("l_off") < col("r_off") &&
          abs(col("l_ts") - col("r_ts")) <= 3600000L)
        .select(col("pk"), col("l_off"), col("r_off"))
        .distinct()
    }),

    // J3 — the aggregate-over-join form of the interval join: per-user
    // within-hour pair COUNTS. Same bucketed range-join (no cross join),
    // but the output is bounded by user cardinality instead of pair
    // cardinality — the form a scale bench should time, since the
    // row-emitting twin's output grows super-linearly whenever the
    // generator packs more events into a fixed time window (the sf10
    // artifact BENCH_NOTES_r08.md measured). The row-emitting form above
    // stays oracled for the pair semantics.
    "interval_join_agg" -> ((s, dir) => {
      val ev = changelog(s, dir).select(col("offset"), col("pk"), col("ts_ms"))
      val bucketed = ev.withColumn("bucket", expr("ts_ms div 3600000"))
      val left = bucketed.select(col("offset").as("l_off"), col("pk"),
        col("ts_ms").as("l_ts"), col("bucket"))
      val right = bucketed.select(col("offset").as("r_off"), col("pk"),
        col("ts_ms").as("r_ts"), explode(array(col("bucket"), col("bucket") + 1,
          col("bucket") - 1)).as("bucket"))
      left.join(right, Seq("pk", "bucket"))
        .where(col("l_off") < col("r_off") &&
          abs(col("l_ts") - col("r_ts")) <= 3600000L)
        .select(col("pk"), col("l_off"), col("r_off"))
        .distinct()
        .groupBy(col("pk")).agg(count(lit(1)).as("n_pairs"))
    }),

    // T4-adjacent — session windows: gap > 30 min starts a new session per
    // user; output one row per session with bounds and event count. The
    // lag/cumulative-sum formulation shuffles once by user.
    // T4 — event-time tumbling windows: the SAME window() operator the
    // streaming path uses under a watermark (StreamingSpec T4 test), here in
    // its batch form so the gate hash-checks the window algebra; min/max are
    // selections (bit-exact doubles), never float sums
    "event_time_windows" -> ((s, dir) =>
      changelog(s, dir)
        .groupBy(window(timestamp_millis(col("ts_ms")), "1 hour").as("win"))
        .agg(count(lit(1)).as("n_events"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .select(unix_millis(col("win.start")).as("win_start_ms"),
          unix_millis(col("win.end")).as("win_end_ms"),
          col("n_events"), col("min_val"), col("max_val"))),

    "session_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("pk")).orderBy(col("ts_ms"), col("offset"))
      changelog(s, dir)
        .withColumn("new_sess",
          when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > 1800000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("pk"), col("sess_id"))
        .agg(min(col("ts_ms")).as("sess_start"), max(col("ts_ms")).as("sess_end"),
          count(lit(1)).as("n_events"))
    }),

    // W3 — rank/dense_rank/lag frame over orders per customer. The lag
    // value is computed as an exact decimal but RENDERED as a string:
    // the driver gate round-trips DuckDB results through pandas, which
    // turns DECIMAL into float64 while Spark parquet keeps Decimal —
    // a string render is the only typed-stable comparison channel.
    "window_functions" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        lag(col("o_totalprice").cast("decimal(18,2)"), 1).over(w)
          .cast("string").as("prev_price")
      )
    }),

    // O4 — intersect/except: customers below 100 with vs without orders
    "set_ops" -> ((s, dir) => {
      val c = table(s, dir, "customer").where(col("c_custkey") < 100)
        .select(col("c_custkey").as("k"))
      val o = table(s, dir, "orders").select(col("o_custkey").as("k"))
      c.intersect(o).withColumn("tag", lit("both"))
        .unionByName(c.except(o).withColumn("tag", lit("cust_only")))
    }),

    // A7 — rollup aggregation with decimal-exact sums (string-rendered:
    // see window_functions note on the gate's DECIMAL→float64 pitfall)
    "rollup_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("string").as("sum_qty"),
          count(lit(1)).as("cnt")
        )),

    // A7 — cube over both grouping dimensions
    "cube_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("string").as("sum_qty"),
          count(lit(1)).as("cnt")
        )),

    // A7 — distinct aggregation (partial-aggregatable two-phase distinct)
    "distinct_agg" -> ((s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders")
        )),

    // T5 — dropDuplicates-style changelog normalization: first event per
    // (pk, op) by offset
    "changelog_dedup_events" -> ((s, dir) =>
      changelog(s, dir)
        .groupBy(col("pk"), col("op"))
        .agg(min(col("offset")).as("first_offset"), count(lit(1)).as("n")))
  )

  def oracles: Map[String, String] = Map(
    "asof_join_last_event" ->
      s"""$changelogSql
         |SELECT c."offset", c.pk,
         |       max((epoch_ms(o.o_orderdate) // 1000) * 1000000000 + o.o_orderkey)
         |         % 1000000000 AS o_orderkey,
         |       (max((epoch_ms(o.o_orderdate) // 1000) * 1000000000 + o.o_orderkey)
         |         // 1000000000) * 1000 AS o_orderdate_ms
         |FROM changelog c JOIN orders o
         |  ON c.pk = o.o_custkey AND epoch_ms(o.o_orderdate) <= c.ts_ms
         |GROUP BY c."offset", c.pk""".stripMargin,

    "interval_join" ->
      s"""$changelogSql
         |SELECT DISTINCT a.pk, a."offset" AS l_off, b."offset" AS r_off
         |FROM changelog a JOIN changelog b
         |  ON a.pk = b.pk AND a."offset" < b."offset"
         | AND abs(a.ts_ms - b.ts_ms) <= 3600000""".stripMargin,

    "interval_join_agg" ->
      s"""$changelogSql,
         |p AS (SELECT DISTINCT a.pk, a."offset" AS l_off, b."offset" AS r_off
         |      FROM changelog a JOIN changelog b
         |        ON a.pk = b.pk AND a."offset" < b."offset"
         |       AND abs(a.ts_ms - b.ts_ms) <= 3600000)
         |SELECT pk, count(*) AS n_pairs FROM p GROUP BY pk""".stripMargin,

    "event_time_windows" ->
      s"""$changelogSql
         |SELECT bucket * 3600000 AS win_start_ms,
         |       bucket * 3600000 + 3600000 AS win_end_ms,
         |       count(*) AS n_events, min(val) AS min_val, max(val) AS max_val
         |FROM (SELECT ts_ms // 3600000 AS bucket, val FROM changelog)
         |GROUP BY bucket""".stripMargin,

    "session_windows" ->
      s"""$changelogSql,
         |l AS (SELECT pk, ts_ms, "offset",
         |             CASE WHEN ts_ms - lag(ts_ms) OVER
         |               (PARTITION BY pk ORDER BY ts_ms, "offset") > 1800000
         |               THEN 1 ELSE 0 END AS new_sess
         |      FROM changelog),
         |s AS (SELECT pk, ts_ms,
         |             CAST(sum(new_sess) OVER (PARTITION BY pk
         |               ORDER BY ts_ms, "offset"
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
         |      FROM l)
         |SELECT pk, sess_id, min(ts_ms) AS sess_start, max(ts_ms) AS sess_end,
         |       count(*) AS n_events
         |FROM s GROUP BY pk, sess_id""".stripMargin,

    "window_functions" ->
      """SELECT o_orderkey, o_custkey,
        |       rank() OVER w AS rnk,
        |       dense_rank() OVER w AS drnk,
        |       CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS VARCHAR)
        |         AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,

    "set_ops" ->
      """SELECT k, 'both' AS tag FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 100
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders)
        |UNION ALL
        |SELECT k, 'cust_only' AS tag FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 100
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "distinct_agg" ->
      """SELECT o_orderstatus,
        |       count(DISTINCT o_custkey) AS n_cust,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "changelog_dedup_events" ->
      s"""$changelogSql
         |SELECT pk, op, min("offset") AS first_offset, count(*) AS n
         |FROM changelog GROUP BY pk, op""".stripMargin
  )
}
