package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, size, sum}

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * plus the headline extraction throughput (BASELINE.json::metric) through
  * the native extract_spans path. Prints ONE JSON line; the driver's
  * required keys (metric/value/unit/queries/sf) are preserved, extra keys
  * carry the extraction numbers. Deep scaling study: BENCH/BASELINE.md
  * (graft.ExtractBench). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so the alphabetically-first query does not absorb
    // the JVM's cold-start cost in its reported time
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count().collect()
    catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0

    // headline extraction throughput at this core count (columnar path):
    // 1M generated docs staged to parquet once, one warm-up, one timed run.
    val (docsPerSec, spansPerSec) = try {
      val stage = "/tmp/graft_bench_stage/docs_1000000"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stage/_SUCCESS")))
        DocGen.generate(spark, 1000000L, cpus.toInt * 4).toDF()
          .write.mode("overwrite").partitionBy("bucket").parquet(stage)
      def run(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val r = plans.GraftFunctions.extractColumnar(spark.read.parquet(stage))
          .agg(count("*"), sum(size(col("spans")))).collect()(0)
        (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
      }
      run() // warm-up
      // best-of-3: the sandbox host preempts wide vCPU gangs in episodes
      // (see BENCH/BASELINE.md); noise is additive so min is the estimate
      val runs = (1 to 3).map(_ => run())
      val best = runs.minBy(_._3)
      (best._1 / best._3, best._2 / best._3)
    } catch { case _: Throwable => (-1.0, -1.0) }

    println(f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      f""""extract_docs_per_sec":$docsPerSec%.0f,"extract_spans_per_sec":$spansPerSec%.0f,""" +
      f""""extract_cores":$cpus}""")
    spark.stop()
  }
}
