package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup filtering: documents arrive as a stream, and each LSH
  * band bucket remembers its first claimant in the state store. A document
  * is a duplicate CANDIDATE iff any of its band signatures was already
  * claimed by an earlier document — the streaming face of
  * [[Dedup.minhashLsh]] (same signatures, same buckets, incremental
  * arrival).
  *
  * Scale design: state is partitioned by (band_id, sig) across the state
  * store — the same key the batch form shuffles on — and holds one long per
  * bucket. At 100 TB you bound it with a state TTL (stale buckets age out
  * after the dedup horizon); the claim semantics are unaffected because a
  * claim only ever moves to an older document.
  */
object StreamingDedup {

  /** One band claim: did `doc_id` claim this bucket first? */
  case class BandClaim(doc_id: Long, band_id: Int, first: Boolean)

  /** Per-batch claims for each (doc, band). Within a micro-batch, ties go
    * to the smallest doc_id — the same "earlier doc wins" rule the batch
    * pairing's `doc_a < doc_b` ordering encodes.
    *
    * `stateTtl` bounds the state store for long-running streams: buckets
    * untouched for the TTL age out (processing-time timeout), narrowing the
    * dedup horizon to the TTL window but capping state at the number of
    * buckets seen within it. None = claims are remembered forever.
    */
  def bandClaims(
      docs: DataFrame,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      stateTtl: Option[java.time.Duration] = None
  ): Dataset[BandClaim] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = Dedup.bandSignatures(docs, numHashes, rowsPerBand)
      .select(col("doc_id"),
        concat_ws(":", col("band_id"),
          concat_ws(",", col("sig"))).as("bucket"),
        col("band_id"))
      .as[(Long, String, Int)]
    val timeoutConf = stateTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    bands
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: String, rows: Iterator[(Long, String, Int)], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_._1)
            val claimant =
              if (state.exists) state.get
              else { state.update(sorted.head._1); sorted.head._1 }
            stateTtl.foreach(ttl => state.setTimeoutDuration(ttl.toMillis))
            sorted.iterator.map { case (id, _, bid) =>
              BandClaim(id, bid, first = id == claimant)
            }
          }
        })
  }

  /** Batch reduction of claims to the kept set: a doc survives iff it
    * claimed EVERY one of its bands first (no bucket collision with any
    * earlier doc). Usable inside foreachBatch or on a collected claim log.
    */
  def keptDocs(claims: DataFrame): DataFrame =
    claims.groupBy(col("doc_id"))
      .agg(min(when(col("first"), 1).otherwise(0)).as("kept"))
      .where(col("kept") === 1)
      .select(col("doc_id"))
}
