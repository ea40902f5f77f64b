package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch instrumentation (guide §1): print every Spark job's callsite and
  * duration while one named query runs — identifies which operator phase
  * owns the job count. Not part of the driver bench contract. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        t0.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(s => s.name.take(60)).mkString(" | ")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, cs) = t0.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%4d ${(System.nanoTime() - s) / 1e3}%10.0f us  $cs")
      }
    })
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count().collect()
    catch { case _: Throwable => }
    val name = args.headOption.getOrElse("q_reshard_corpus")
    Thread.sleep(300)
    println(s"=== $name ===")
    val t = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    println(f"WALL ${(System.nanoTime() - t) / 1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
