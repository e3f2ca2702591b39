package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, plus frame sampling and feature extraction.
  *
  * The image decode path is REAL: payloads are PNG byte streams decoded with
  * `javax.imageio` (pure-JVM, on every classpath) inside a batched
  * `mapPartitions` — codec acquired once per batch, pixels read from the
  * raster, features = dimensions + channel statistics. Video/audio codecs
  * (H.264/PCM) aren't in this container; those payloads go through
  * [[frames]]' opaque byte-slicing path instead.
  */
object Multimodal {

  /** The single (mime, nbytes, origin) metadata constructor — both payload
    * paths build their `meta` struct here so the mime labels cannot drift
    * from the schema shape.
    */
  private def metaStruct(mime: String, payload: Column, origin: Column): Column =
    struct(
      lit(mime).as("mime"),
      octet_length(payload).as("nbytes"),
      origin.as("origin"))

  /** Wrap documents as binary payloads + typed metadata, the schema a real
    * image/audio table would carry.
    */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      metaStruct("application/octet-stream",
        col("text").cast("binary"), col("source")).as("meta")
    )

  /** Image width of the synthetic PNG fixture: one grayscale pixel per text
    * byte, [[PngWidth]] pixels per row, zero-padded final row.
    */
  val PngWidth = 16

  /** Deterministic PNG fixture generation — REAL `ImageIO` encoding of each
    * document's bytes as a grayscale image (the external image corpus
    * stand-in, since no image files ship with the testdata). Pixel layout is
    * analytically known, so decode results have an exact engine-independent
    * oracle: px_sum == sum of the text's byte values.
    */
  def encodePng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, pngBytes(text)) })
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        metaStruct("image/png", col("payload"), lit("synthetic")).as("meta"))
  }

  private[ext] def pngBytes(text: String): Array[Byte] = {
    val w = PngWidth
    val len = text.length
    val h = math.max(1, (len + w - 1) / w)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var i = 0
    while (i < w * h) {
      val v = if (i < len) text.charAt(i).toInt & 0xff else 0
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One decoded image: dimensions + channel statistics. The mean is a
    * single int/int double division — exact, engine-replicable.
    */
  case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, px_sum: Long, mean_lum: Double)

  /** Batched REAL image decode over partitions — the Scala analog of a
    * Pandas-UDF `mapInPandas` pipeline: each executor task pulls its
    * partition in `batchSize` groups and amortizes codec setup per batch
    * (one `ImageReader` instance per batch — acquisition is the expensive,
    * non-thread-safe step real decoders pay). Features come from the decoded
    * raster: width × height plus the sum/mean of the luminance band.
    */
  def decodeBatched(binImgs: DataFrame, batchSize: Int): Dataset[ImageFeatures] = {
    val spark = binImgs.sparkSession
    import spark.implicits._
    binImgs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("png").next()
          try {
            batch.map { case (id, bytes) =>
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              reader.setInput(iis)
              val img = try reader.read(0) finally iis.close()
              val w = img.getWidth
              val h = img.getHeight
              // r == g == b in the fixture; band 0 is the luminance
              val samples = img.getRaster.getSamples(0, 0, w, h, 0,
                null.asInstanceOf[Array[Int]])
              var s = 0L
              var j = 0
              while (j < samples.length) { s += samples(j); j += 1 }
              ImageFeatures(id, w, h, s, s.toDouble / (w * h))
            }
          } finally reader.dispose()
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

  /** Frame-level exact dedup across documents — the multimodal analogue of
    * `dedup_exact_hash`: identical payload windows (re-encoded thumbnails,
    * repeated intro/outro frames, boilerplate headers) collapse to one
    * keeper per digest group. The dedup key is [[frames]]'s (feature,
    * frame_len) digest pair, so only 12-byte scalars cross the one
    * shuffle — frame bytes never leave their scan. Keeper = the
    * lexicographically first (doc_id, frame_idx), a deterministic
    * min(struct) with map-side partial aggregation.
    */
  def frameDedup(binDocs: DataFrame, frameSize: Int): DataFrame =
    frames(binDocs, frameSize)
      .groupBy(col("feature"), col("frame_len"))
      .agg(
        count(lit(1)).as("dup_cnt"),
        min(struct(col("doc_id"), col("frame_idx"))).as("keep"))
      .select(col("feature"), col("frame_len"), col("dup_cnt"),
        col("keep.doc_id").as("keep_doc"), col("keep.frame_idx").as("keep_idx"))

  /** Caption-image alignment filtering (the LAION/DataComp CLIP-score gate):
    * each caption (documents row) pairs with its media embedding
    * (embeddings row, vec_id == doc_id) and the pair is kept iff the
    * cosine between a text-side embedding and the stored media embedding
    * clears `threshold`. The text encoder here is the deterministic
    * stand-in a sandbox allows — a hashed bag-of-words projected into the
    * embedding space (bucket = fnv64(word) mod dim) — while the Spark-side
    * plumbing is the real thing: an equi-join keyed by id (media embeddings
    * shuffle once by key, captions likewise; at 100 TB both sides are
    * id-bucketed and the join is shuffle-free), cosine entirely inside
    * codegen, and the gate a narrow filter.
    *
    * Every arithmetic step is a fixed-order fold (graft_dot walks indices
    * 0..dim-1), so the DuckDB oracle replays bit-for-bit. The count vector
    * materializes per row (dim * words compiled ops — fine at the fixture's
    * dim; a production-dim encoder would run the sorted-run fold instead).
    */
  def captionAlign(docs: DataFrame, emb: DataFrame, dim: Int,
      threshold: Double): DataFrame = {
    require(dim >= 1 && (dim & (dim - 1)) == 0,
      s"dim must be a positive power of two (bucket = unsigned mod), got $dim")
    graft.cdc.types.GraftFunctions.register(docs.sparkSession)
    // NULL captions carry no alignment signal — filter them out (same
    // contract as spanCorruption/fimTransform) so the hash/norm lambdas
    // never see a NULL word array
    val text = docs
      .where(col("text").isNotNull)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("buckets", expr(s"transform(ws, w -> pmod(graft_fnv64(w), ${dim}L))"))
      .select(col("doc_id"),
        expr(s"""transform(sequence(0, $dim - 1),
                 |  b -> cast(size(filter(buckets, x -> x = b)) as double))"""
          .stripMargin).as("tv"))
      .withColumn("tnrm", Similarity.norm(col("tv")))
    val media = emb.select(col("vec_id").as("doc_id"),
        Similarity.toDouble("embedding").as("vd"))
      .withColumn("vnrm", Similarity.norm(col("vd")))
    text.join(media, Seq("doc_id"))
      .select(col("doc_id"),
        (Similarity.dot(col("tv"), col("vd")) / (col("tnrm") * col("vnrm")))
          .as("align_score"))
      .withColumn("kept", col("align_score") >= threshold)
  }
}
