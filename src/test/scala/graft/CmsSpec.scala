package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch suite: one-sided error (never undercounts), exactness
  * when collisions lose the min, cell-wise mergeability (the property that
  * lets per-batch sketches accumulate), bounded state, null skipping. */
class CmsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish: key k appears 2^(10-k) times for k in 0..9 — a hot head
  private val keys = (0 until 10).flatMap(k =>
    Seq.fill(1 << (10 - k))(s"key$k"))
  private val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def estimates(depth: Int, width: Int): Map[String, Long] = {
    val df = keys.toDF("key")
    val sk = ops.Cms.build(df, "key", depth, width)
    ops.Cms.estimate(df.distinct(), "key", sk, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, even at a collision-heavy width") {
    val est = estimates(depth = 2, width = 4) // 10 keys into 4 cells: collisions certain
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < exact $n")
    }
  }

  test("a wide-enough sketch is exact (min kills per-row collisions)") {
    val est = estimates(depth = 4, width = 4096)
    exact.foreach { case (k, n) => assert(est(k) == n, s"$k: ${est(k)} vs $n") }
  }

  test("merge(build(A), build(B)) == build(A ++ B) cell for cell") {
    val (a, b) = keys.splitAt(700)
    val merged = ops.Cms.merge(
        ops.Cms.build(a.toDF("key"), "key", 3, 32),
        ops.Cms.build(b.toDF("key"), "key", 3, 32))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = ops.Cms.build(keys.toDF("key"), "key", 3, 32)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("sketch state is bounded by depth*width regardless of input size") {
    val n = ops.Cms.build(keys.toDF("key"), "key", 2, 4).count()
    assert(n <= 8, s"2x4 sketch must hold <= 8 cells, got $n")
  }

  test("null keys are skipped in the build") {
    val df = (keys.map(Option(_)) :+ None :+ None).toDF("key")
    val withNulls = ops.Cms.build(df, "key", 3, 32)
      .agg(sum($"n")).head().getLong(0)
    // every non-null row contributes exactly `depth` increments
    assert(withNulls == keys.size.toLong * 3)
  }
}
