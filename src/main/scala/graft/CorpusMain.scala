package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point for the FULL corpus pipeline — the two halves
  * of this library composed into one runnable artifact: extraction
  * (registry dispatch → boilerplate classify → ordered spans) feeding
  * corpus preparation (reassemble → redact → filter → dedup → resolve →
  * mix → pack) and writing a training-ready shard table plus a per-domain
  * profile. What a user of the reference would actually run to turn a
  * crawl into training data.
  *
  * Usage: graft.CorpusMain <outDir> [nDocs]
  */
object CorpusMain {

  /** Stage counts keyed by stage name, in pipeline order. */
  def run(spark: SparkSession, nDocs: Long, outDir: String,
          parallelism: Int): Seq[(String, Long)] = {
    import spark.implicits._
    val raw = DocGen.generate(spark, nDocs, parallelism)

    // 1. extraction: the native extract_spans expression (the fast path;
    //    span-for-span equal to the typed engine — SpanEqualitySpec)
    val extracted = plans.GraftFunctions.extractColumnar(raw.toDF())

    // 2. reassemble document text from kept non-media spans, offset order
    val texts = extracted.select($"doc_id", $"domain",
        array_join(expr(
          "transform(array_sort(filter(spans, s -> s.kind <> 'media'), " +
            "(a, b) -> a.offset - b.offset), s -> s.text)"), " ").as("text"))
      .where(length($"text") > 0)
      .localCheckpoint()

    // 3. clean: PII scrub, then minimum size + Gopher repetition gate
    val cleaned0 = texts
      .withColumn("text", ops.Cleaning.redactPii($"text"))
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      // capped form: the mode scan is O(distinct·n) per row, and a crawl
      // can contain pathological 100k-word pages — Gopher gates run on the
      // length-capped document (identical to uncapped for docs under the cap)
      .where(size($"w") >= 8 && ops.Cleaning.topWordFracQ4Capped($"w", 2000) <= 3000)
      .drop("w")
      .localCheckpoint()

    // 3b. language gate — the BULK realization (explode trigrams →
    //     broadcast profile join → partial-agg argmax), the shape that
    //     stays linear at corpus scale where the per-row probe loop does
    //     not; docs with no profile evidence default to 'en' (kept)
    val cleaned = cleaned0.join(
        ops.TextStats.langIdBulk(cleaned0, "doc_id", "text")
          .where($"pred" === "en").select($"doc_id"),
        "doc_id")
      .localCheckpoint()

    // 4. dedup: exact keep-first, then LSH near-dup cluster resolution
    val exact = ops.Dedup.exactDedup(cleaned, "doc_id", "text").localCheckpoint()
    val pairs = ops.Dedup.nearDupPairs(exact, "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").localCheckpoint()
    val deduped = ops.Dedup.dedupCorpus(exact, "doc_id", pairs).localCheckpoint()

    // 5. train the tokenizer ON the deduped corpus (batched trainer: each
    //    Spark round selects up to `batch` disjoint merges — the round
    //    count, the trainer's scale limit, drops batch-fold) and account
    //    shards in REAL BPE tokens: the packer's budget and the trained
    //    tokenizer finally meet (packing on whitespace tokens under- or
    //    over-fills shards by the merge compression ratio)
    //    train on a deterministic 10% hash-sample (the standard tokenizer
    //    practice — merge ranks stabilize long before the full corpus is
    //    seen, and the sample keeps the per-round pair aggregation small)
    val merges = ops.Bpe.learnMergesBatched(
      deduped.where(ops.Sampling.hashBp(concat($"doc_id", lit("bpe"))) < 1000),
      "text", nMerges = 96, minCount = 2L, batch = 32)

    // 6. mix by domain and pack into BPE-token-budget shards
    val mixed = ops.Sampling.mixtureSample(deduped, "doc_id", "domain",
      Map.empty, defaultBp = 10000)
    val packed = ops.Sampling.packShards(mixed, "doc_id", "domain",
      ops.Bpe.bpeTokenCount($"text", merges).cast("bigint"), budget = 2048)

    packed.write.mode("overwrite").parquet(s"$outDir/shards")
    // ONE scan of the written shards feeds the profile and both stage
    // counts; countDistinct(shard) is exact even when an over-budget doc
    // makes shard ids skip (max(shard)+1 would overcount there)
    val profile = spark.read.parquet(s"$outDir/shards")
      .groupBy($"domain")
      .agg(count(lit(1)).as("docs"), sum($"tokens").as("tokens"),
        countDistinct($"shard").as("shards"))
      .localCheckpoint()
    profile.write.mode("overwrite").parquet(s"$outDir/profile")

    val totals = profile.agg(sum($"docs"), sum($"shards")).head()
    Seq(
      "raw" -> nDocs,
      "with_text" -> texts.count(),
      "cleaned" -> cleaned0.count(),
      "lang_en" -> cleaned.count(),
      "exact_deduped" -> exact.count(),
      "near_deduped" -> deduped.count(),
      "bpe_merges" -> merges.length.toLong,
      "admitted" -> totals.getLong(0),
      "shards" -> totals.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: graft.CorpusMain <outDir> [nDocs]"))
    val nDocs = args.lift(1).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", s"local[$cpus]"))
      .appName("graft-corpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stages = run(spark, nDocs, outDir, cpus.toInt * 2)
    val secs = (System.nanoTime() - t0) / 1e9
    println(stages.map { case (k, v) => s""""$k":$v""" }
      .mkString("""{"metric":"corpus_pipeline",""", ",", f""","wall_sec":$secs%.1f}"""))
    spark.stop()
  }
}
