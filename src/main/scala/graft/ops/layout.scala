package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout reconstruction — the PDF/layout-parse analog of the north rule
  * (BASELINE.json: "HTML boilerplate strip, PDF/layout parse, DOM
  * heuristics"; the extraction pipeline covers the first and third, this
  * stage the second).
  *
  * A PDF text stream arrives in EMISSION order, which for multi-column
  * pages interleaves the columns line by line; reading-order recovery and
  * region grouping are the classic deterministic layout passes over the
  * positioned blocks:
  *
  *  1. column detection: a block belongs to the left column iff its x
  *     midpoint falls left of pageWidth/2 (the standard two-column split;
  *     generalize by clustering x starts for k columns);
  *  2. reading order: column-major — sort (column, y, x) and number
  *     densely per document;
  *  3. region grouping: within a column, a vertical gap greater than
  *     `gapThreshold` starts a new region (paragraph/section block);
  *     regions are numbered densely in reading order.
  *
  * All decisions are integer comparisons (determinism contract of
  * SURVEY.md §7.5-1). Scale shape: every window partitions by the document
  * (± column) — the same per-document parallelism as extraction, bounded
  * buffers (a page's blocks), no cross-document shuffle beyond the
  * doc-keyed exchange.
  */
object Layout {

  /** Recover reading order + regions from positioned blocks.
    *
    * Input: `blocks` with (docCol, x: int, y: int, ...payload columns).
    * Output: input columns + (col_id, region_id, reading_pos), where
    * reading_pos is the dense 0-based column-major reading order and
    * region_id numbers gap-separated regions densely in reading order. */
  def readingOrder(blocks: DataFrame, docCol: String,
      pageWidth: Int, gapThreshold: Int): DataFrame = {
    require(pageWidth > 0 && gapThreshold >= 0)
    val byColY = Window.partitionBy(col(docCol), col("col_id"))
      .orderBy(col("y").asc, col("x").asc)
    val reading = Window.partitionBy(col(docCol))
      .orderBy(col("col_id").asc, col("y").asc, col("x").asc)
    val regionOrder = Window.partitionBy(col(docCol))
      .orderBy(col("col_id").asc, col("__ric").asc)
    blocks
      .withColumn("col_id", when(col("x") * 2 < pageWidth, 0).otherwise(1))
      .withColumn("__gap",
        when(lag(col("y"), 1).over(byColY).isNull ||
          col("y") - lag(col("y"), 1).over(byColY) > gapThreshold, 1)
          .otherwise(0))
      .withColumn("__ric", sum(col("__gap"))
        .over(byColY.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("reading_pos", row_number().over(reading) - 1)
      .withColumn("region_id", dense_rank().over(regionOrder) - 1)
      .drop("__gap", "__ric")
  }
}
