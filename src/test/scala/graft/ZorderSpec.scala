package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered layout (ops.Zorder): key math vs a plain-Scala
  * reference interleave, clustering as a pure layout change, and the
  * MEASURED data-skipping evidence — file counts a range predicate must
  * touch under the z layout vs a single-column sort layout.
  */
class ZorderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave, written independently of the column
    * algebra: bit i of dimension j lands at position i*k + j. */
  private def morton(bits: Int, vals: Seq[Long]): Long = {
    val k = vals.size
    val hi = (1L << bits) - 1
    val clamped = vals.map(v => math.min(math.max(v, 0L), hi))
    (for {
      (v, j) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield ((v >> i) & 1L) << (i * k + j)).sum
  }

  test("zorderKey matches the reference interleave; clamps range and nulls") {
    val rows = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L), (17L, 42L), (5L, 60L),
      (99L, -7L)) // out of range both sides -> clamped to (63, 0)
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ops.Zorder.zorderKey(6, $"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == morton(6, Seq(a, b)), s"($a, $b)")
    }
    // interleave sanity at the bit level: (1,0) -> bit 0, (0,1) -> bit 1
    assert(morton(6, Seq(1L, 0L)) == 1L && morton(6, Seq(0L, 1L)) == 2L)
    // NULL clamps to the smallest cell, deterministically
    val zNull = Seq((Option.empty[Long], Some(5L))).toDF("a", "b")
      .select(ops.Zorder.zorderKey(6, $"a", $"b")).as[Long].head()
    assert(zNull == morton(6, Seq(0L, 5L)))
    // three dimensions: positions stride by k=3
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ops.Zorder.zorderKey(4, $"a", $"b", $"c")).as[Long].head()
    assert(z3 == 7L)
  }

  test("zorderSql replays zorderKey exactly (same recipe, Spark SQL engine)") {
    val sql = ops.Zorder.zorderSql(5, Seq("(id % 32)", "(id % 27)"))
    val viaSql = spark.range(200).selectExpr("id", s"$sql AS z")
    val viaCol = spark.range(200).select($"id",
      ops.Zorder.zorderKey(5, $"id" % 32, $"id" % 27).as("z"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("clusterBy fails fast on a temp-key column collision instead of destroying the column") {
    val df = spark.range(4).select($"id".as("x"),
      lit(1L).as("__graft_zorder_key"))
    val e = intercept[IllegalArgumentException](
      ops.Zorder.clusterBy(df, 2, 4, col("x")))
    assert(e.getMessage.contains("__graft_zorder_key"))
  }

  test("clusterBy is a pure layout change and prunes files on BOTH dims") {
    // 64x64 grid, one row per cell, payload = cell id
    val n = 64 * 64
    val df = spark.range(n).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("bigint").as("y"),
      $"id".as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zpath = s"$dir/z"
    val spath = s"$dir/s"
    ops.Zorder.clusterBy(df, 16, 6, col("x"), col("y"))
      .write.parquet(zpath)
    // the layout it replaces: single-column range sort
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(spath)

    // pure layout change: read-back multiset identical
    val back = spark.read.parquet(zpath).select($"payload").as[Long]
      .collect().sorted.toSeq
    assert(back == (0L until n.toLong))

    // files a range predicate lo<=c<=hi must touch, per parquet min/max
    def touched(path: String, c: String, lo: Long, hi: Long): Long =
      ops.Zorder.fileEnvelopes(spark, path, Seq("x", "y"))
        .where(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
        .count()

    val total = ops.Zorder.fileEnvelopes(spark, spath, Seq("x", "y")).count()
    assert(total == 16)
    // single-column layout: perfect on x, NO pruning on y — every file's
    // y range spans the whole domain
    assert(touched(spath, "x", 10, 13) <= 3)
    assert(touched(spath, "y", 10, 13) == 16)
    // z layout: a 4-wide band on EITHER dim touches a strict minority of
    // files (16 z-contiguous files over a 64x64 grid ~ 16x16 tiles, so a
    // 4-wide band overlaps ~1 tile-row = ~4 files + ragged range edges)
    assert(touched(zpath, "x", 10, 13) <= 8)
    assert(touched(zpath, "y", 10, 13) <= 8)
    // and skipping is SOUND: rows outside touched files never match
    assert(spark.read.parquet(zpath).where($"y" >= 10 && $"y" <= 13).count()
      == df.where($"y" >= 10 && $"y" <= 13).count())
  }
}
