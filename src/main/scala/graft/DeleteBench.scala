package graft

import org.apache.spark.sql.SparkSession

/** Copy-on-write delete scale evidence (BENCH/BASELINE.md "maintenance
  * plane"): a takedown request names k documents; the cost that matters
  * at 100 TB is how much of the TABLE the delete touches. The
  * file-granular path plans candidate files from the manifest's zone
  * maps, locates actual hits with a per-file count over candidates only,
  * and rewrites just the containing files — so the wall should be ~flat
  * in table width at fixed k, and files_rewritten should track k, not
  * the hit buckets' file population.
  *
  * Protocol: build a real extraction table (ExtractJob.run — the same
  * writer production uses, so zone maps come from actual parquet
  * footers) at each width, then time 3 deletes of DISJOINT 8-id key sets
  * (a delete mutates the table; repeating one key set would no-op) and
  * report the median wall plus the blast-radius accounting read back
  * from the committed snapshots.
  *
  * Usage: graft.DeleteBench [docsSmall] [docsLarge] [partitions]
  */
object DeleteBench {
  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toInt).getOrElse(200000)
    val nLarge = args.lift(1).map(_.toInt).getOrElse(800000)
    val parts = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(n: Int): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"del_bench_$n").toString
      ExtractJob.run(spark, DocGen.generate(spark, n, parts), dir, "base",
        resume = false, numPartitions = parts)
      val m = new Manifest(dir, spark.sessionState.newHadoopConf())
      // 3 disjoint 8-id takedowns spread across the id space
      val keyRounds = (0 until 3).map(r =>
        (0 until 8).map(i => f"d${(n.toLong * (8 * r + i + 1)) / 25}%010d"))
      val walls = keyRounds.map { keys =>
        val pre = m.head().get
        val t0 = System.nanoTime()
        val post = ExtractJob.deleteByKey(spark, dir, keys.toDF("doc_id"), "doc_id")
        val sec = (System.nanoTime() - t0) / 1e9
        val f0 = pre.buckets.map(b => b.bucket -> b.files.toSet).toMap
        val hitB = post.buckets.filter(b => b.files.toSet != f0(b.bucket))
        val rewritten = hitB.map(b => (f0(b.bucket) -- b.files.toSet).size).sum
        val hitBucketFiles = hitB.map(b => f0(b.bucket).size).sum
        (sec, rewritten, hitBucketFiles, pre.buckets.map(_.files.size).sum)
      }
      // the blast-radius counts come from the MEDIAN round — the same
      // delete whose wall is reported (rounds can hit different files)
      val w = walls.sortBy(_._1).apply(1)
      println(f"""{"metric":"delete_cow","corpus":$n,"keys":8,""" +
        f""""files_total":${w._4},"files_hit_buckets":${w._3},""" +
        f""""files_rewritten":${w._2},"sec_median":${w._1}%.2f}""")
    }
    run(nSmall)
    run(nLarge)
    spark.stop()
  }
}
