package graft.examples

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** The full training-data pipeline in one runnable flow — what a user of
  * this engine runs against a raw document corpus at 100 TB:
  *   quality gate → exact dedup → MinHash-LSH near-dedup → text stats →
  *   ANN neighbor audit on the embedding table.
  * Every stage is one of the engine's first-class operators; the whole
  * thing is a handful of shuffles, all key-bounded.
  */
object DataPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    println(s"[pipeline] corpus: ${docs.count()} docs")

    // 0. benchmark decontamination: drop training docs sharing verbatim
    // 8-grams with the held-out eval slice (broadcast eval grams, corpus
    // side map-only)
    val isEval = col("source").isin("src0", "src1")
    val train = graft.operators.Decontaminate.clean(
      docs.filter(!isEval), docs.filter(isEval), "doc_id", "text", n = 8, minShared = 3)
    println(s"[pipeline] after decontamination: ${train.count()}")

    // 1. quality gate: codegen'd text stats, keep prose-like documents;
    // then the repetition gate (map-only native counters — duplicate-word
    // fraction and top-bigram mass, the Gopher repetition rule family)
    val scored = TextFunctions.withTextStats(train)
    val quality = scored.filter(col("quality") >= 0.3 && col("n_tokens") >= 10)
    println(s"[pipeline] after quality gate: ${quality.count()}")
    val rep = quality.withColumn("__r",
      graft.plans.NativeExpressions.repetitionStats(TextFunctions.tokens(col("text"))))
    val unrepetitious = rep.filter(
      col("__r.n_tokens") < 2 ||
        (lit(1.0) - col("__r.n_distinct") / col("__r.n_tokens") <= 0.72 &&
          col("__r.top_bigram") / (col("__r.n_tokens") - lit(1.0)) <= 0.06))
      .drop("__r")
    println(s"[pipeline] after repetition gate: ${unrepetitious.count()}")

    // 2. exact dedup (min-id survivor per identical text). Persist here:
    // everything downstream (pair generation, survivor filter, report,
    // TFRecord write) consumes this frontier — without it each action
    // re-runs the stats+gate+dedup lineage over the full corpus
    val exact = Dedup.exact(unrepetitious, Seq("text"), "doc_id").persist()
    println(s"[pipeline] after exact dedup: ${exact.count()}")

    // 3. MinHash-LSH near-dedup (capped candidate generation)
    val pairs = Dedup.minHashLshPairs(exact, "doc_id", "text",
      shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.6)
    // persist: this frontier feeds both the span-dedup lineage AND the
    // survivor join below — without it the LSH pair pipeline re-runs per
    // consumer (the anti-pattern the step-2 comment warns about)
    val nearDeduped = Dedup.keepMinIdSurvivors(exact, "doc_id", pairs).persist()
    println(s"[pipeline] near-dup pairs: ${pairs.count()}")

    // 3.5 substring-level span dedup: doc-level passes leave verbatim
    // boilerplate spans shared across otherwise-distinct docs; remove
    // every token covered by a corpus-duplicated 8-gram and drop docs that
    // lose (almost) everything. MASKED docs carry the rebuilt
    // token-normalized text (lowercased, single-spaced — inherent to
    // token-level masking); CLEAN docs keep their original text verbatim.
    // n_tokens is recomputed from the masker's tokenization for both, so
    // the shard budgets below stay consistent with one tokenizer.
    val masked = Dedup.maskDuplicatedSpans(nearDeduped, "doc_id", "text", n = 8)
      .persist()
    val survivors = nearDeduped.drop("n_tokens")
      .join(masked.filter(col("n_tokens") - col("n_masked") >= 10)
        .select(col("doc_id"), col("text_deduped"), col("n_masked"),
          (col("n_tokens") - col("n_masked")).as("n_tokens")), "doc_id")
      .withColumn("text",
        when(col("n_masked") === 0, col("text")).otherwise(col("text_deduped")))
      .drop("text_deduped", "n_masked")
      .persist()
    val maskedTokens =
      masked.agg(coalesce(sum(col("n_masked")), lit(0L))).first().getLong(0)
    println(s"[pipeline] span-masked tokens: $maskedTokens; survivors: ${survivors.count()}")

    // 4. per-language yield report
    survivors.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("lang"))
      .show(10, false)

    // 5. embedding-space audit: nearest neighbors of the first few vectors
    val emb = Tables.embeddings(spark, sfDir)
    val neighbors = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("q"), col("embedding").as("qv")),
      "q", "qv", k = 3)
    neighbors.show(9, false)

    // 6. shard manifest: pack the cleaned corpus into ~512-token training
    // shards (contiguous per source, deterministic across re-runs)
    val packed = graft.operators.ScaleOps.packSequences(
      survivors, "source", "doc_id",
      TextFunctions.tokenCount(col("text")).cast("long"), budget = 512,
      tokenOutCol = "pack_tokens") // survivors already carries n_tokens
    val shards = packed.groupBy(col("source"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pack_tokens")).as("shard_tokens"))
    println(s"[pipeline] training shards: ${shards.count()}")

    // 7. context-window chunking for the embedding/indexing side
    val chunks = survivors.select(col("doc_id"),
      posexplode(TextFunctions.tokenChunks(col("text"), chunkSize = 64, overlap = 16)))
    println(s"[pipeline] chunks: ${chunks.count()}")

    // 8. materialize the cleaned corpus as TFRecord-of-Example — the
    // training-side handoff (file per partition, CRC-framed)
    val outDir = java.nio.file.Files.createTempDirectory("graft-pipeline-tfr").toString
    val sp = spark; import sp.implicits._
    val payloads = survivors
      .select(col("doc_id").cast("long"), col("text"), col("n_tokens").cast("long"))
      .as[(Long, String, Long)]
      .map { case (id, text, nTokens) =>
        graft.sources.TFExample.encode(Map(
          "doc_id" -> graft.sources.TFExample.Int64List(Seq(id)),
          "text" -> graft.sources.TFExample.BytesList(Seq(text.getBytes("UTF-8"))),
          "n_tokens" -> graft.sources.TFExample.Int64List(Seq(nTokens))))
      }
    graft.sources.TFRecordIO.write(payloads, outDir)
    val readBack = graft.sources.TFRecordIO.read(spark, outDir).count()
    println(s"[pipeline] wrote $readBack training records to $outDir")

    // 9. the evaluation-side handoff goes out as compressed Avro (the
    // row format every downstream JVM/Python stack reads natively) —
    // schema carried in the container, deflate block compression (the
    // spec-required codec: any bare avro-core consumer decodes it)
    val avroDir = java.nio.file.Files.createTempDirectory("graft-pipeline-avro").toString
    graft.sources.AvroIO.write(
      survivors.select(col("doc_id"), col("lang"), col("text")), avroDir)
    val avroBack = graft.sources.AvroIO.read(spark, avroDir).count()
    println(s"[pipeline] wrote $avroBack eval records (avro/deflate) to $avroDir")

    // 10. tokenizer vocabulary: train BPE merges on the CLEANED corpus
    // (one corpus shuffle, merge loop on the vocabulary-sized word table),
    // then segment with the learned table and report the token budget the
    // shards above will actually pay under this tokenizer
    val bpe = graft.operators.Features.bpeTrain(survivors, "text",
      nMerges = 12)
    val merges = bpe.orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    println(s"[pipeline] BPE merges: " +
      merges.map { case (a, b) => s"$a+$b" }.mkString(", "))
    val segmented = graft.operators.Features.bpeSegment(
      survivors, "text", merges)
    val bpeTokens = segmented
      .agg(coalesce(sum(col("cnt") * col("n_tokens")), lit(0L)))
      .first().getLong(0)
    println(s"[pipeline] corpus BPE tokens: $bpeTokens")

    // 11. near-dup cluster audit: the distributed fixpoint components over
    // the LSH pair graph — cluster-size census for the curation report
    val clusters = graft.operators.GraphOps.connectedComponents(
      pairs.select(col("id1").as("a"), col("id2").as("b")))
    val clusterCensus = clusters.groupBy(col("n_nodes"))
      .agg(count(lit(1)).as("n_clusters")).orderBy(col("n_nodes"))
    clusterCensus.show(5, false)

    // 12. telemetry side-channel: the user-activity profile that ships
    // with the corpus goes through the k-anonymity gate first — balance
    // sign generalizes, then suppresses, so no released quasi tuple
    // identifies fewer than 5 users
    val profile = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
    val anonymized = graft.operators.Privacy.kAnonymize(
      profile, Seq("user_id"),
      Seq(
        Seq("activity" -> when(col("n_events") >= 60, lit("high"))
          .otherwise(lit("low")),
          "breadth" -> col("n_types")),
        Seq("activity" -> when(col("n_events") >= 60, lit("high"))
          .otherwise(lit("low")),
          "breadth" -> lit("*"))),
      k = 5)
    val suppressed = anonymized.filter(col("level") === 2).count()
    println(s"[pipeline] anonymized profile: ${anonymized.count()} rows, " +
      s"$suppressed suppressed")

    survivors.unpersist(); masked.unpersist(); nearDeduped.unpersist()
    exact.unpersist()
    spark.stop()
  }
}
