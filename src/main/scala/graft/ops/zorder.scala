package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered data layout — multi-dimensional data
  * skipping for tables queried on MORE THAN ONE column.
  *
  * A table sorted on one column prunes files perfectly on that column and
  * not at all on any other: every file's min/max range on the second
  * column spans the whole domain. Interleaving the bits of k columns into
  * one sort key (Morton order — the standard space-filling-curve layout,
  * cf. Delta/Iceberg OPTIMIZE ZORDER) makes file boundaries axis-aligned
  * hyper-rectangles, so parquet min/max footer stats bound EVERY clustered
  * dimension per file and a predicate on any one of them skips most files.
  * At 100 TB this is the difference between "point lookups on (domain,
  * fetch_date) read ~1/√files of the table" and "every query on the
  * non-sort column is a full scan".
  *
  * Everything here is pure column bit algebra (shift/and/or — whole-stage
  * codegen, no UDF), replayable verbatim in any engine with integer bit
  * ops; [[zorderSql]] emits the DuckDB form from the same recipe, and the
  * q_zorder oracle pins cross-engine equality.
  */
object Zorder {

  /** Morton key of k integer columns at `bits` bits each: bit i of column
    * j lands at interleaved position `i * k + j`, so the key is
    * `k * bits` bits wide (must fit a signed 64-bit long: k·bits ≤ 63).
    * Values are CLAMPED to [0, 2^bits): callers quantize each dimension
    * to the grid first (e.g. `ntile`/`floor(col / step)` — clamping, not
    * wrapping, keeps out-of-range stragglers at the curve's edge instead
    * of teleporting them across it, which would silently destroy the
    * locality the layout exists for). NULLs clamp to 0 (they sort with
    * the smallest cell, deterministically). The bit terms are disjoint,
    * so the fold is a plain sum — Catalyst folds it into one codegen'd
    * expression. */
  def zorderKey(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    val k = cols.size
    require(k * bits <= 63,
      s"key would need ${k * bits} bits — must fit a signed long (<= 63)")
    val hi = (1L << bits) - 1
    val clamped = cols.map(c =>
      least(greatest(coalesce(c.cast("bigint"), lit(0L)), lit(0L)), lit(hi)))
    val terms = for {
      (c, j) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** SQL replay of [[zorderKey]] over column expressions `cols` —
    * generated from the same recipe so the Spark key and the oracle key
    * cannot drift. */
  def zorderSql(bits: Int, cols: Seq[String]): String = {
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 63)
    val k = cols.size
    val hi = (1L << bits) - 1
    val clamped = cols.map(c =>
      s"least(greatest(CAST(coalesce($c, 0) AS BIGINT), 0), $hi)")
    (for {
      (c, j) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield s"((($c >> $i) & 1) << ${i * k + j})").mkString("(", " + ", ")")
  }

  /** Cluster a frame for a multi-dimension-skipping write: range-partition
    * on the Morton key into `nFiles` output tasks and sort within each, so
    * a straight `.write.parquet` emits one z-contiguous file per task —
    * each file covers an axis-aligned rectangle of the (col₁, …, col_k)
    * space and its parquet min/max stats are tight on EVERY clustered
    * column. The key is computed, used for the exchange/sort, and dropped;
    * row content is untouched (clustering is a pure layout change —
    * ZorderSpec asserts the read-back multiset is identical).
    *
    * Scale shape: one range exchange (sampled boundaries, AQE-friendly) +
    * per-partition sort — exactly the cost of the single-column
    * `ORDER BY` layout it replaces, the skipping just works on k columns
    * instead of 1. */
  def clusterBy(df: DataFrame, nFiles: Int, bits: Int, cols: Column*): DataFrame =
    clusterByLeading(df, nFiles, bits, Nil, cols)

  /** Temp column carrying the Morton key through the exchange/sort. */
  private val ZKey = "__graft_zorder_key"

  /** [[clusterBy]] with `leading` exchange/sort columns AHEAD of the
    * Morton key — the form a PARTITIONED write needs (lead with the
    * partition column so the dynamic-partition writer's required ordering
    * is already satisfied, no second sort runs, and the z order inside
    * each written file survives; [[graft.ExtractJob.compact]] is the
    * caller). The key lives in a collision-guarded temp column: silently
    * REPLACING a caller's same-named data column and then dropping it
    * would destroy that column in the rewrite, so a clash fails fast. */
  def clusterByLeading(df: DataFrame, nParts: Int, bits: Int,
      leading: Seq[Column], cols: Seq[Column]): DataFrame = {
    require(nParts >= 1, s"nParts must be >= 1, got $nParts")
    require(!df.columns.contains(ZKey),
      s"input already has a column named $ZKey — rename it before clustering")
    val keys = leading :+ col(ZKey)
    df.withColumn(ZKey, zorderKey(bits, cols: _*))
      .repartitionByRange(nParts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop(ZKey)
  }

  /** Per-file min/max envelope of `cols` for a parquet table at `path` —
    * the data-skipping audit surface: a file must be read by a predicate
    * on column c iff its [min_c, max_c] overlaps the predicate's range, so
    * `SUM(overlaps)` over this table IS the file count the scan touches.
    * One narrow scan of only the audited columns, partial-agg per file. */
  def fileEnvelopes(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
