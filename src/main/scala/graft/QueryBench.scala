package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Interleaved per-query re-measure tool: the single-shot driver bench on
  * this host lies under CPU-steal episodes (BENCH/BASELINE.md), so a
  * suspected regression is confirmed or cleared HERE — the named
  * SparkEntry queries are warmed once each, then timed round-robin for
  * `GRAFT_QB_ROUNDS` rounds (default 5) so any steal episode hits all of
  * them equally; medians (plus min/max spread) print as one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... graft.QueryBench q_a q_b ...
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_ngram_jaccard", "q_source_jsonl")
    val rounds = sys.env.getOrElse("GRAFT_QB_ROUNDS", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = names.map(n => n -> SparkEntry.queries(n))
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() } // warm-up
    val times = mutable.Map.empty[String, mutable.ArrayBuffer[Double]]
    (0 until rounds).foreach { _ =>
      fns.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        times.getOrElseUpdate(n, mutable.ArrayBuffer.empty) +=
          (System.nanoTime() - t0) / 1e9
      }
    }
    val med = names.map { n =>
      val s = times(n).sorted
      f""""$n":{"median":${s(s.length / 2)}%.3f,"min":${s.head}%.3f,"max":${s.last}%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"query_bench","rounds":$rounds,"cpus":$cpus,"sf":"$sfDir",$med}""")
    spark.stop()
  }
}
