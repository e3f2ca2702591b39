package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the continuous form of
  * [[Curation.packSequences]] for a pipeline that emits training sequences
  * as documents arrive instead of re-packing the corpus per epoch.
  *
  * The global token axis of the batch form cannot exist under streaming
  * (it would serialize every document through one cursor), so the
  * streaming form shards first: each document hashes to one of `nShards`
  * independent token axes (shard = writer), and each shard's packing
  * cursor — (open sequence id, offset within it) — is one tiny row of
  * state-store state. That IS the production layout: a shard per output
  * writer, state partitioned by shard key, arbitrarily many shards for
  * arbitrarily many writers.
  *
  * Within a micro-batch a shard's documents pack in doc_id order, so the
  * emitted manifest is deterministic per batch split; a shard's spans are
  * IDENTICAL to running the batch span arithmetic over that shard's
  * documents in arrival order (spec-verified across batch splits).
  */
object StreamingPack {

  /** One manifest span: tokens [doc_tok_start, doc_tok_start + span_toks)
    * of doc_id land at seq_tok_start of the shard-local sequence seq_id.
    */
  case class PackSpan(
      shard: Long,
      doc_id: Long,
      seq_id: Long,
      doc_tok_start: Long,
      seq_tok_start: Long,
      span_toks: Long)

  /** The per-shard cursor: next open sequence + its fill offset. */
  case class PackCursor(seq: Long, off: Long)

  def packStream(
      docs: DataFrame,
      seqLen: Long,
      nShards: Int,
      seed: Long = 0L
  ): Dataset[PackSpan] = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.cdc.types.GraftFunctions.register(spark)
    val keyed = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"),
      pmod(call_function("graft_mix64", col("doc_id"), lit(seed)),
        lit(nShards.toLong)).as("shard"))
      .as[(Long, Long, Long)]
    keyed
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[PackCursor]) => {
          var cur = state.getOption.getOrElse(PackCursor(0L, 0L))
          val out = Seq.newBuilder[PackSpan]
          for ((id, toks, _) <- rows.toSeq.sortBy(_._1)) {
            var remaining = toks
            var docOff = 0L
            while (remaining > 0L) {
              val take = math.min(seqLen - cur.off, remaining)
              out += PackSpan(shard, id, cur.seq, docOff, cur.off, take)
              docOff += take
              remaining -= take
              cur =
                if (cur.off + take == seqLen) PackCursor(cur.seq + 1L, 0L)
                else PackCursor(cur.seq, cur.off + take)
            }
          }
          state.update(cur)
          out.result().iterator
        })
  }
}
