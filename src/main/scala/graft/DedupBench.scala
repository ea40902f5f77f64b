package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-bucket-guard micro-bench (BENCH/BASELINE.md "hot-bucket guard"):
  * quantifies the quadratic blow-up an exact-dup cluster causes in LSH
  * candidate generation, and what the guard saves. A web-crawl corpus
  * routinely contains 10⁵–10⁶-member exact-dup clusters; every member
  * shares every band bucket, so the unguarded self-join emits |cluster|²/2
  * pairs before distinct().
  *
  * Usage: graft.DedupBench [nDistinct] [clusterSize]
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val nDistinct = args.headOption.map(_.toInt).getOrElse(200000)
    val cluster = args.lift(1).map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // distinct docs: unique shingles per doc; dup cluster: one shared text
    val distinctDocs = spark.range(nDistinct).select($"id".as("doc_id"),
      concat_ws(" ", lit("alpha"), $"id", lit("beta"), $"id", lit("gamma"), $"id", lit("delta")).as("text"))
    val dupDocs = spark.range(cluster).select(($"id" + 10000000L).as("doc_id"),
      lit("same words in every single copy of this crawl page").as("text"))
    val sigs = ops.Dedup.minhashSignatures(distinctDocs.union(dupDocs), "text", 8)
      .select($"doc_id", $"sig").cache()
    sigs.count() // materialize signatures outside the timed region

    def timed(maxBucket: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = ops.Dedup.lshCandidatePairs(sigs, "doc_id", 4, maxBucket).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nG, tG) = timed(4096)
    val (nU, tU) = timed(0)
    // exact dedup over the same corpus: the dup cluster shares ONE content
    // hash, so a window-based dedup would sort the whole cluster in one
    // task; the partial-agg shape collapses it map-side (no straggler).
    val corpus = distinctDocs.union(dupDocs)
    val tE0 = System.nanoTime()
    val nKept = ops.Dedup.exactDedup(corpus, "doc_id", "text").count()
    val tE = (System.nanoTime() - tE0) / 1e9
    println(f"""{"metric":"lsh_hot_bucket_guard","n_distinct":$nDistinct,"cluster":$cluster,""" +
      f""""guarded_pairs":$nG,"guarded_sec":$tG%.2f,"unguarded_pairs":$nU,"unguarded_sec":$tU%.2f,""" +
      f""""exact_dedup_kept":$nKept,"exact_dedup_sec":$tE%.2f}""")
    spark.stop()
  }
}
