package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, plus frame sampling and feature extraction.
  *
  * The real decode step (JPEG/PCM/H.264) needs native libraries that are not
  * in this container — per the build contract it is STUBBED with a
  * deterministic fake (xxhash64 of the frame bytes plays the "feature
  * vector"), while the Spark-side plumbing — schema, binary slicing,
  * per-frame explosion, partitioning — is real and tested.
  */
object Multimodal {

  /** Wrap documents as binary payloads + typed metadata, the schema a real
    * image/audio table would carry.
    */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("text").cast("binary")).as("nbytes"),
        col("source").as("origin")
      ).as("meta")
    )

  /** One decoded payload: id + stub feature vector. */
  case class Decoded(doc_id: Long, feature: Array[Long], nbytes: Int)

  /** Batched decode over partitions — the Scala analog of a Pandas-UDF
    * `mapInPandas` pipeline: each executor task pulls its partition in
    * `batchSize` groups and hands the whole batch to the decoder at once
    * (real image/audio decoders amortize model/codec setup per batch).
    *
    * STUB: the per-batch "decoder" derives a deterministic 4-long feature
    * from the payload bytes (`???`-grade stand-in — the native codec isn't
    * in this container); the batching, schema, and partition plumbing are
    * real.
    */
  def decodeBatched(binDocs: DataFrame, batchSize: Int): Dataset[Decoded] = {
    val spark = binDocs.sparkSession
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch-level decode: one "codec init" per batch, then per-item
          // features. Salt is the configured batch size, NOT batch.size —
          // trailing batches are smaller and batch composition depends on
          // partitioning, which would make features non-deterministic.
          val codecSalt = batchSize.toLong
          batch.map { case (id, payload) =>
            val h = payload.foldLeft(codecSalt)((a, b) => a * 31 + (b & 0xff))
            Decoded(id, Array(h, h ^ id, payload.length.toLong, codecSalt), payload.length)
          }
        }
      }
  }

  /** Frame-sample the payload into fixed-size chunks (plays video frame
    * extraction): one output row per frame. Narrow per-row transform —
    * sequence+transform+posexplode, no shuffle, fully distributed.
    *
    * STUB: `feature` = graft_fnv64(frame bytes) stands in for the decoded
    * feature vector — FNV-1a so the stub is engine-replicable and the whole
    * frame pipeline keeps a DuckDB oracle.
    */
  def frames(binDocs: DataFrame, frameSize: Int): DataFrame = {
    graft.cdc.types.GraftFunctions.register(binDocs.sparkSession)
    val nFrames = ceil(col("meta.nbytes").cast("double") / frameSize).cast("int")
    binDocs
      // empty payloads produce zero frames — without this guard
      // sequence(0, -1) would step DOWNWARD and emit frame_idx 0 and -1
      .where(col("meta.nbytes") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .select(
        col("doc_id"),
        col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)").as("frame")
      )
      .select(
        col("doc_id"),
        col("frame_idx"),
        octet_length(col("frame")).as("frame_len"),
        call_function("graft_fnv64", col("frame")).as("feature")
      )
  }
}
