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
    */
  def bandClaims(
      docs: DataFrame,
      numHashes: Int = 32,
      rowsPerBand: Int = 4
  ): Dataset[BandClaim] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = Dedup.bandSignatures(docs, numHashes, rowsPerBand)
      .select(col("doc_id"),
        concat_ws(":", col("band_id"),
          concat_ws(",", col("sig"))).as("bucket"),
        col("band_id"))
      .as[(Long, String, Int)]
    bands
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String, Int)], state: GroupState[Long]) => {
          val sorted = rows.toSeq.sortBy(_._1)
          val claimant =
            if (state.exists) state.get
            else { state.update(sorted.head._1); sorted.head._1 }
          sorted.iterator.map { case (id, _, bid) =>
            BandClaim(id, bid, first = id == claimant)
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
