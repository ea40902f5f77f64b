package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch (Cormode & Muthukrishnan 2005) as a RELATION —
  * approximate per-key frequencies in constant state, built and probed in
  * pure column algebra.
  *
  * Why it exists: [[Skew.detectHotKeys]] answers "which keys are hot" with
  * an exact partial-agg pass (or a sampled one) over the CURRENT frame —
  * the right tool inside one job. But a streaming ingest that wants a
  * RUNNING frequency view across micro-batches (hot domains, repeated
  * boilerplate hashes, URL frontier heat) cannot afford a rescan per
  * batch, and an exact running (key, count) table grows with the key
  * universe. A Count-Min sketch caps the state at depth×width cells
  * REGARDLESS of key count, is MERGEABLE by cell-wise sum (batch sketches
  * add; shard sketches add — the same property the manifest's metrics
  * tables rely on), and errs one-sidedly: estimates never undercount,
  * and overcount by more than εN with probability ≤ δ at width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Portability contract (same reason [[Bloom]] is hand-rolled): cell
  * positions derive from the repo's shared 60-bit md5 recipe
  * ([[Sampling.hash60]]), so the DuckDB oracle replays every cell and
  * every min — collisions included — digit for digit.
  *
  * Representation: sparse (r, c, n) rows, absent cells zero — at most
  * depth×width rows regardless of input (5×4096 ≈ 20k rows ≈ KBs), always
  * broadcastable. Scale shape: the build is a narrow explode (depth rows
  * per input row) into a partial-agg groupBy over a BOUNDED key space —
  * the reduce side is at most depth×width groups, so there is no hot-key
  * straggler by construction; the probe is a broadcast equi-join. */
object Cms {

  /** Cell of hash row `j` for a key: the portable 60-bit md5 integer of
    * `key || ':' || j`, mod `width` — [[Bloom.position]]'s recipe with the
    * sketch width as the modulus. Matches [[cellSql]]. */
  def cell(keyCol: Column, j: Int, width: Int): Column =
    (Sampling.hash60(concat(keyCol.cast("string"), lit(":"), lit(j.toString)))
      % width).cast("int")

  /** DuckDB replay of [[cell]] via the same shared recipe. */
  def cellSql(key: String, j: Int, width: Int): String =
    s"CAST(${Sampling.hash60Sql(s"$key || ':' || '$j'")} % $width AS INT)"

  /** Build the sketch over `df(keyCol)` (one increment per row; NULL keys
    * are skipped): sparse (r, c, n) cell counts, ≤ depth×width rows. */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    df.where(col(keyCol).isNotNull)
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("r"), cell(col(keyCol), j, width).as("c"))): _*))
        .as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge sketches built with the SAME (depth, width): cell-wise sum.
    * merge(build(A), build(B)) == build(A ∪ B) exactly — the property that
    * lets per-batch / per-shard sketches accumulate without a rescan. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c")).agg(sum(col("n")).as("n"))

  /** Point estimates for `probes(keyCol)`: adds `est` = min over the
    * depth rows of the key's cell count (absent cells are 0). Never
    * undercounts a key that fed [[build]]; overcounts only by collision
    * mass. The sketch side is ≤ depth×width rows and is broadcast. */
  def estimate(probes: DataFrame, keyCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val cells = probes
      .select(col(keyCol), explode(array((0 until depth).map(j =>
        struct(lit(j).as("r"), cell(col(keyCol), j, width).as("c"))): _*))
        .as("cell"))
      .select(col(keyCol), col("cell.r").as("r"), col("cell.c").as("c"))
    cells.join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  /** DuckDB twin of [[build]]: cell counts over `srcSql`'s `key` column. */
  def buildSql(srcSql: String, depth: Int, width: Int): String =
    (0 until depth).map { j =>
      s"""SELECT $j AS r, ${cellSql("key", j, width)} AS c
         |  FROM ($srcSql) WHERE key IS NOT NULL""".stripMargin
    }.mkString("SELECT r, c, count(*) AS n FROM (",
      " UNION ALL ", ") GROUP BY r, c")

  /** DuckDB twin of [[estimate]] over a cell CTE named `cmsTable(r,c,n)`
    * and a probe CTE `probesSql` with a `key` column. */
  def estimateSql(probesSql: String, cmsTable: String,
      depth: Int, width: Int): String =
    (0 until depth).map { j =>
      s"""SELECT key, $j AS r, ${cellSql("key", j, width)} AS c
         |  FROM ($probesSql)""".stripMargin
    }.mkString(
      s"SELECT key, min(coalesce(t.n, 0)) AS est FROM (",
      " UNION ALL ",
      s") p LEFT JOIN $cmsTable t USING (r, c) GROUP BY key")
}
