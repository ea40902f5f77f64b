package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round instrumentation (guide §1: measure first) — NOT part
  * of the driver bench contract. Runs a selected subset of SparkEntry
  * queries (args, or all when empty) with a SparkListener and prints, per
  * query: wall seconds, Spark job count, stage count, task count and summed
  * task time. High job/stage counts with low task time indicate
  * scheduling/latency-bound queries (too many sequential actions); high
  * task time indicates compute-bound stages. The timed action is the same
  * `.count()` the frozen Bench uses so the shapes match what the driver
  * measures. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })

    // warm-up, as in Bench
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count().collect()
    catch { case _: Throwable => }

    val sel = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
              else args.toSeq

    // plan-dump mode (deliverable evidence): write .explain("formatted") of
    // each selected query to $GRAFT_PLANS_DIR/<query>_<suffix>.txt instead
    // of timing. The query fn still runs its fixture side effects once.
    sys.env.get("GRAFT_PLANS_DIR").foreach { plansDir =>
      val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "before")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))
      sel.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$plansDir/${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"dumped $name")
          } catch { case e: Throwable => println(s"$name FAILED: $e") }
        }
      }
      spark.stop()
      return
    }

    // GRAFT_NOOP=1: time via the no-op sink (guide §1.4) — eagerly computes
    // EVERY column of every row and discards it, so the number excludes any
    // count-side column pruning. Default stays .count() to match what the
    // frozen driver bench measures.
    val useNoop = sys.env.get("GRAFT_NOOP").contains("1")
    println(f"${"query"}%-24s ${"wall_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"task_s"}%8s" +
      (if (useNoop) "  (noop sink)" else "  (count)"))
    sel.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: unknown query")
        case Some(fn) =>
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
          spark.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            if (useNoop) df.write.format("noop").mode("overwrite").save()
            else df.count()
          }
          catch { case e: Throwable => println(s"$name FAILED: $e") }
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150) // let the listener bus drain (counts are advisory)
          println(f"$name%-24s $wall%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${taskMs.get / 1e3}%8.2f")
      }
    }
    spark.stop()
  }
}
