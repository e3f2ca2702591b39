package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up stress: generates data far beyond the bench SF in
  * memory (spark.range, no files) and times the shuffle-heavy operators.
  * Reproducible source of README's stress table. Run:
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.StressMain"
  *
  * Optional args: nEvents nDocs (defaults 20M / 200k).
  */
object StressMain {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.types.GraftFunctions.register(spark)

    // ---- changelog path: 20M events over 100k keys -------------------
    // cache + force every synthetic input BEFORE timing: the generator
    // expressions would otherwise be inlined into the operator under test
    // (worst case re-evaluated per lambda element) and the timings would
    // measure data synthesis, not the operator
    val events = spark.range(nEvents).select(
      col("id").as("offset"),
      pmod(call_function("graft_mix64", col("id"), lit(1L)), lit(100000L)).as("pk"),
      when(pmod(col("id"), lit(10)) === 0, "d")
        .when(pmod(col("id"), lit(10)) === 1, "c")
        .otherwise("u").as("op"),
      (col("id") * 1000L).as("ts_ms"),
      (pmod(col("id"), lit(1000L)) * 1.0).as("val"),
      lit(null).cast("string").as("props")).cache()
    events.count()
    val snapshot = spark.range(100000L).select(
      lit(-1L).as("offset"), col("id").as("pk"), lit("r").as("op"),
      lit(0L).as("ts_ms"), lit(0.0).as("val"),
      lit(null).cast("string").as("props"))

    val m = time(s"upsertMaterialize ${nEvents / 1000000}M events + 100k snapshot") {
      graft.cdc.model.Changelog.upsertMaterialize(snapshot, events).count()
    }
    val ms = time("saltedUpsertMaterialize(16) same input") {
      graft.cdc.merge.Skew.saltedUpsertMaterialize(snapshot, events, 16).count()
    }
    require(m == ms, s"salted merge diverged: $m vs $ms")
    val x = time("extractRows row-kind expansion") {
      graft.cdc.merge.ChangelogOps.extractRows(events).count()
    }
    println(s"STRESS-OUT materialized=$m rowKinds=$x")

    // ---- documents path: 200k synthetic docs, 5k vocab ---------------
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr(
        "transform(sequence(0, 39), i -> concat('w', pmod(graft_mix64(id, CAST(i AS BIGINT)), 5000)))"
      )).as("text"),
      lit("en").as("lang"), lit("synth").as("source"),
      lit(240L).as("n_chars")).cache()
    docs.count()

    val mh = time(s"minhashLsh(32,4) ${nDocs / 1000}k docs") {
      graft.ext.Dedup.minhashLsh(docs, 32, 4).count()
    }
    val sh = time(s"simhashPairs(<=8) ${nDocs / 1000}k docs") {
      graft.ext.Dedup.simhashPairs(docs, 8).count()
    }
    println(s"STRESS-OUT minhashPairs=$mh simhashPairs=$sh")

    // ---- generic envelope path: 10M wire frames, composite keys ------
    // wire JSON synthesized directly in the frame (to_json of the wire
    // struct — same shape a Debezium topic delivers), cached before timing
    val nFrames = 10000000L
    val genT = graft.cdc.model.RowImage.DeclaredTable(
      "stress",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k1", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k2", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v_dec", org.apache.spark.sql.types.DecimalType(12, 2)),
        org.apache.spark.sql.types.StructField("v_str", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v_ts", org.apache.spark.sql.types.TimestampType))),
      pkCols = Seq("k1", "k2"))
    val env = spark.range(nFrames).select(
      col("id").as("offset"),
      when(pmod(col("id"), lit(10)) === 0, "d").otherwise("u").as("op"),
      (col("id") * 1000L).as("ts_ms"),
      expr("""to_json(named_struct(
        'k1', pmod(graft_mix64(id, 7L), 1000L),
        'k2', pmod(graft_mix64(id, 11L), 500L),
        'v_dec', cast(pmod(id, 1000000) as string),
        'v_str', concat('s', pmod(id, 97)),
        'v_ts', id * 1000000L))""").as("before"),
      when(pmod(col("id"), lit(10)) =!= 0, expr("""to_json(named_struct(
        'k1', pmod(graft_mix64(id, 7L), 1000L),
        'k2', pmod(graft_mix64(id, 11L), 500L),
        'v_dec', cast(pmod(id, 1000000) + 1 as string),
        'v_str', concat('t', pmod(id, 97)),
        'v_ts', id * 1000000L))""")).as("after")).cache()
    env.count()
    // toRdd.count forces the FULL plan — winner decode included, which a
    // bare count() would prune away
    val em = time(s"upsertMaterializeEnvelope ${nFrames / 1000000}M frames, 500k composite keys") {
      graft.cdc.model.RowImage.upsertMaterializeEnvelope(env, genT)
        .queryExecution.toRdd.count()
    }
    val ems = time("upsertMaterializeEnvelopeSalted(16) same input") {
      graft.cdc.model.RowImage.upsertMaterializeEnvelopeSalted(env, genT, 16)
        .queryExecution.toRdd.count()
    }
    require(em == ems, s"salted envelope merge diverged: $em vs $ems")
    println(s"STRESS-OUT envelopeMaterialized=$em")

    // ---- curation path over the synthetic docs -----------------------
    val rep = time(s"repetitionStats ${nDocs / 1000}k docs") {
      graft.ext.Curation.repetitionStats(docs).queryExecution.toRdd.count()
    }
    val dec = time(s"decontaminate ${nDocs / 1000}k docs vs 1% benchmark") {
      graft.ext.Curation.decontaminate(
        docs.where(pmod(col("doc_id"), lit(100)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(100)) === 0)).count()
    }
    println(s"STRESS-OUT repetitionRows=$rep contaminated=$dec")

    // ---- embeddings path: 2M vectors x 64 dims -----------------------
    val nVecs = 2000000L
    val emb = spark.range(nVecs).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> CAST(pmod(graft_mix64(id, CAST(i AS BIGINT)), 1000) - 500 AS FLOAT))")
        .as("embedding"),
      pmod(col("id"), lit(100)).cast("int").as("label")).cache()
    emb.count()
    val bf = time(s"bruteForceTopK(10 queries, k=5) over ${nVecs / 1000000}M vectors") {
      graft.ext.Similarity.bruteForceTopK(emb, 10, 5).count()
    }
    println(s"STRESS-OUT bfTopK=$bf")

    // ---- SemDeDup at stress scale: 200k vectors, 1024 cells ----------
    // assignment = 200k x 1024 codegen'd dots (the kmeans-assign cost),
    // then ~1024 cells of ~195 rows -> ~19M within-cell pair dots
    val semVecs = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    val sem = time("semanticDedup 200k vectors, 1024 cells") {
      graft.ext.Dedup.semanticDedup(semVecs, nCells = 1024, threshold = 0.35)
        .count()
    }

    // ---- segment dedup + classifier + sampling over the stress docs --
    val sd = time(s"segmentDedup ${nDocs / 1000}k docs, span 10") {
      graft.ext.Curation.segmentDedup(docs, span = 10)
        .queryExecution.toRdd.count()
    }
    val wts = spark.range(1 << 16).select(
      col("id").as("bucket"),
      (pmod(call_function("graft_mix64", col("id"), lit(7L)), lit(2001L)) - 1000L)
        .as("w"))
    val cls = time(s"hashedLinearScore ${nDocs / 1000}k docs, 64k buckets") {
      graft.ext.Curation.hashedLinearScore(docs, wts, dim = 1 << 16).count()
    }
    val rates = spark.range(32).select(
      concat(lit("s"), col("id")).as("source"),
      pmod(col("id") * 61803L, lit(1000000L)).as("keep_ppm"))
    val docsSrc = docs.withColumn("source",
      concat(lit("s"), pmod(col("doc_id"), lit(32))))
    val smp = time(s"stratifiedSample ${nDocs / 1000}k docs, 32 strata") {
      graft.ext.Curation.stratifiedSample(docsSrc, rates, seed = 42L).count()
    }
    println(s"STRESS-OUT semanticPairs=$sem segmentRows=$sd classified=$cls sampled=$smp")

    // ---- layout family: Z-order rewrite shape over the 20M events ----
    // (one range exchange + sorted partitions — the 100 TB rewrite job)
    val zin = events.select(col("offset"), col("pk"), col("ts_ms"))
    val zc = time(s"clusterByZOrder ${nEvents / 1000000}M rows, 2 dims, 64 parts") {
      graft.ext.Layout.clusterByZOrder(zin, Seq("pk", "ts_ms"), bits = 24,
        numPartitions = 64).queryExecution.toRdd.count()
    }
    println(s"STRESS-OUT zClustered=$zc")

    // ---- sequence packing: distributed prefix sum over the stress docs
    val pk = time(s"packSequences ${nDocs / 1000}k docs, 2048-token seqs") {
      graft.ext.Curation.packSequences(docs, seqLen = 2048L)
        .queryExecution.toRdd.count()
    }
    val vc = time(s"vocabCoverage ${nDocs / 1000}k docs, top-32k vocab") {
      graft.ext.Curation.vocabCoverage(docs, vocabSize = 1 << 15)
        .queryExecution.toRdd.count()
    }
    println(s"STRESS-OUT packedSpans=$pk coveredDocs=$vc")

    // ---- PQ over the 200k-vector slice: fit + encode + ADC + re-rank -
    // semVecs ids are multiples of 10, so nQueries = 100 -> 10 query rows
    val pq = time("pqSearchTopK 200k vectors, m=8 k=64 sl=200") {
      val books = graft.ext.Similarity.pqCodebooks(semVecs, m = 8, k = 64, iters = 2)
      graft.ext.Similarity.pqSearchTopK(semVecs, books, m = 8,
        nQueries = 100, k = 5, shortlist = 200).count()
    }
    val ivfpq = time("ivfPqTopK 200k vectors, 256 cells nProbe=16") {
      graft.ext.Similarity.ivfPqTopK(semVecs, nCells = 256, nProbe = 16,
        m = 8, kCodes = 64, iters = 1, nQueries = 100, k = 5, shortlist = 200).count()
    }
    println(s"STRESS-OUT pqTopK=$pq ivfpqTopK=$ivfpq")

    // ---- BPE learning over the stress docs ---------------------------
    val bpe = time(s"bpeLearn(50 merges) ${nDocs / 1000}k docs") {
      graft.ext.Bpe.learnMerges(docs, nMerges = 50).count()
    }
    println(s"STRESS-OUT bpeMerges=$bpe")

    // ---- retrieval + LM scoring + span dedup over the stress docs ----
    val queriesDf = {
      import spark.implicits._
      (1L to 100L).flatMap(q => (1 to 3).map(p =>
        (q, p, s"w${(q * 37 + p * 11) % 5000}"))).toDF("qid", "pos", "term")
    }
    val bm = time(s"bm25TopK(100 queries, k=10) ${nDocs / 1000}k docs") {
      graft.ext.TextAnalysis.bm25TopK(docs, queriesDf, k = 10).count()
    }
    val lm = time(s"ngramLmScore ${nDocs / 1000}k docs") {
      graft.ext.Curation.ngramLmScore(docs).count()
    }
    val spans = time(s"dupSpans(n=8) ${nDocs / 1000}k docs") {
      graft.ext.Dedup.dupSpans(docs, n = 8).count()
    }
    val tmx = time(s"temperatureMix ${nDocs / 1000}k docs") {
      graft.ext.Curation.temperatureMix(docs, seed = 42L, targetFraction = 0.3).count()
    }
    println(s"STRESS-OUT bm25=$bm lmScored=$lm dupSpanRows=$spans tempKept=$tmx")

    // ---- canonicalize -> select -> split over the stress docs --------
    val nz = time(s"nfcClean ${nDocs / 1000}k docs") {
      docs.select(call_function("graft_nfc_clean", col("text")).as("t"))
        .queryExecution.toRdd.count()
    }
    val ds = time(s"dsirSelect ${nDocs / 1000}k docs, dim 64k, k 10k") {
      graft.ext.Curation.dsirSelect(docsSrc, targetSource = "s0",
        dim = 1 << 16, k = 10000).count()
    }
    val hs = time(s"holdoutSplit ${nDocs / 1000}k docs") {
      graft.ext.Curation.holdoutSplit(docs, "_s7")
        .queryExecution.toRdd.count()
    }
    val budgets = spark.range(32).select(
      concat(lit("s"), col("id")).as("source"),
      (lit(50000L) + col("id") * 3000L).as("budget_tokens"))
    val tb = time(s"tokenBudgetMix ${nDocs / 1000}k docs, 32 sources") {
      graft.ext.Curation.tokenBudgetMix(docsSrc, budgets, length(col("text"))).count()
    }
    println(s"STRESS-OUT nfcRows=$nz dsirSelected=$ds splitRows=$hs budgetKept=$tb")

    spark.stop()
  }
}
