package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-dedup scale evidence (BENCH/BASELINE.md "incremental
  * admission"): one day's crawl increment against a large immutable
  * corpus. The delta is a realistic mix — fresh docs, exact re-crawls of
  * corpus pages, near-dup re-crawls (one word appended), and within-delta
  * duplicate pairs — so every stage of the admission chain does real work.
  * The headline is per-increment wall; running two corpus widths at the
  * same delta splits it into the corpus term (ONE hash + signature/banding
  * pass, linear in corpus width — removed entirely by persisting those two
  * indexes next to the corpus, as the operator doc advises) and the
  * delta-driven remainder.
  *
  * Usage: graft.IncrBench [corpusDocs] [deltaDocs]
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toInt).getOrElse(2000000)
    val nDelta = args.lift(1).map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 12 id-derived words per doc — distinct docs share NO words (a
    // boilerplate-free corpus; the hot-line/boilerplate regime is
    // CleanBench's subject), so near-dup structure is exactly the planted
    // one and the LSH buckets stay sparse
    def docText(idc: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 12).map(j => concat(lit("w"), idc, lit(s"t$j"))): _*)

    val corpus = spark.range(nCorpus)
      .select($"id".as("doc_id"), docText($"id").as("text")).cache()
    // delta quarters: fresh | exact re-crawl | near-dup re-crawl | internal pairs
    // id/text offsets far above any plausible corpus width — a corpus of
    // 10M+ docs must NOT collide with the "fresh" quarter's ids or texts
    // (a collision silently turns fresh docs into exact re-crawls and
    // corrupts the corpus-width comparison this bench exists to make)
    require(nCorpus < 1000000000, "corpus width would collide with delta id space")
    val q = nDelta / 4
    val delta = spark.range(q)
      .select(($"id" + 1000000000L).as("doc_id"), docText($"id" + 1000000000L).as("text"))
      .union(spark.range(q).select(($"id" + 2000000000L).as("doc_id"), docText($"id").as("text")))
      .union(spark.range(q).select(($"id" + 3000000000L).as("doc_id"),
        concat(docText($"id" + q), lit(" extra")).as("text")))
      .union(spark.range(q / 2).flatMap { i =>
        val base = (0 until 12).map(j => s"p${i}t$j").mkString(" ")
        Seq((4000000000L + i, base), (5000000000L + i, base + " tail"))
      }.toDF("doc_id", "text"))
      .cache()
    corpus.count(); delta.count() // materialize outside the timed region

    // warmup + median of 3 (same protocol as CleanBench)
    def timed[A](f: => A): (A, Double) = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }
    val (admitted, sec) = timed {
      ops.Dedup.incrementalDedup(delta, corpus, "doc_id", "text").count()
    }
    println(f"""{"metric":"incremental_dedup","corpus":$nCorpus,"delta":$nDelta,""" +
      f""""admitted":$admitted,"sec":$sec%.2f,"delta_docs_per_sec":${(nDelta / sec).toLong}}""")

    // index path: the one-time buildIndex cost, then the per-increment
    // wall with the index AT REST (parquet round trip — the persistence
    // contract) — this is the row that must stay FLAT in corpus width
    val ixDir = java.nio.file.Files.createTempDirectory("incr_index_").toString
    val tIx0 = System.nanoTime()
    ops.Dedup.buildIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(ixDir)
    val ixSec = (System.nanoTime() - tIx0) / 1e9
    val index = spark.read.parquet(ixDir)
    val (admittedIx, secIx) = timed {
      ops.Dedup.incrementalDedupIndexed(delta, corpus, index, "doc_id", "text").count()
    }
    require(admittedIx == admitted,
      s"index path admitted $admittedIx != corpus path $admitted")
    println(f"""{"metric":"incremental_dedup_indexed","corpus":$nCorpus,"delta":$nDelta,""" +
      f""""admitted":$admittedIx,"build_index_sec":$ixSec%.2f,"sec":$secIx%.2f,""" +
      f""""delta_docs_per_sec":${(nDelta / secIx).toLong}}""")
    spark.stop()
  }
}
