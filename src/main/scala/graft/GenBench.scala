package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Corpus-generation throughput probe: times `DocGen.generate` alone
  * (count + span-sum action, no write) so end-to-end regressions can be
  * attributed between generation, extraction and I/O.
  *
  * Usage: graft.GenBench [nDocs] [rounds]
  */
object GenBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val extract = args.lift(2).contains("--extract")
    val times = (1 to rounds).map { _ =>
      val t0 = System.nanoTime()
      val base = DocGen.generate(spark, n).toDF()
      val df = if (extract) plans.GraftFunctions.extractColumnar(base) else base
      val r = df.agg(F.count("*"), F.sum(F.size(F.col("spans")))).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[genbench] extract=$extract $dt%.1f s  docs=${r.getLong(0)} spans=${r.getLong(1)}")
      dt
    }
    println(f"""{"metric":"gen_throughput","n_docs":$n,"best_sec":${times.min}%.1f,"docs_per_sec":${n / times.min}%.0f}""")
    spark.stop()
  }
}
