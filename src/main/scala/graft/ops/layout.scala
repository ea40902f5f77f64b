package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *  1. column detection — two forms:
  *     - [[readingOrder]]: fixed two-column split on the block-START x
  *       (a block is left iff x·2 < pageWidth — the x start is the
  *       decision input, block width is not consulted);
  *     - [[readingOrderK]]: k columns detected per document by clustering
  *       the distinct block-start x values — the k−1 LARGEST gaps in the
  *       sorted x sequence become column boundaries (the classic 1-D
  *       largest-gap split; deterministic ties: larger gap first, then
  *       smaller x);
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
  * doc-keyed exchange; the k-column boundary detection adds one
  * per-document distinct + top-(k−1) pass over x values (bounded by the
  * page's distinct x starts) and joins back one boundary ARRAY row per
  * document (never a row fan-out).
  */
object Layout {

  /** The shared tail of both reading-order forms: blocks already carrying
    * `col_id` get gap flags, dense reading positions, and dense region ids
    * (column-major, per document). */
  private def orderAndRegion(blocks: DataFrame, docCol: String,
      gapThreshold: Int): DataFrame = {
    val byColY = Window.partitionBy(col(docCol), col("col_id"))
      .orderBy(col("y").asc, col("x").asc)
    val reading = Window.partitionBy(col(docCol))
      .orderBy(col("col_id").asc, col("y").asc, col("x").asc)
    val regionOrder = Window.partitionBy(col(docCol))
      .orderBy(col("col_id").asc, col("__ric").asc)
    blocks
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

  /** Recover reading order + regions from positioned blocks with the fixed
    * TWO-column midline split: a block belongs to the left column iff its
    * START x falls left of pageWidth/2 (x·2 < pageWidth — the x start
    * decides; no width column is consulted). For pages that are not
    * two-equal-column, or when column count varies per document, use
    * [[readingOrderK]].
    *
    * Input: `blocks` with (docCol, x: int, y: int, ...payload columns).
    * Output: input columns + (col_id, region_id, reading_pos), where
    * reading_pos is the dense 0-based column-major reading order and
    * region_id numbers gap-separated regions densely in reading order. */
  def readingOrder(blocks: DataFrame, docCol: String,
      pageWidth: Int, gapThreshold: Int): DataFrame = {
    require(pageWidth > 0 && gapThreshold >= 0)
    orderAndRegion(
      blocks.withColumn("col_id", when(col("x") * 2 < pageWidth, 0).otherwise(1)),
      docCol, gapThreshold)
  }

  /** [[readingOrder]] generalized to k columns detected PER DOCUMENT from
    * the data: the distinct block-start x values are sorted and the k−1
    * largest inter-value gaps EXCEEDING `minGap` become column boundaries
    * (ties: the larger gap wins, then the smaller boundary x — fully
    * deterministic integer ordering); col_id = number of boundaries ≤ the
    * block's x. A document with fewer than k real columns yields fewer —
    * `minGap` is what makes k an UPPER bound rather than an exact count:
    * set it between the largest within-column x spacing and the smallest
    * inter-column gutter, and a 1-column page through a k-column page all
    * resolve correctly under one k (minGap = 0 keeps the raw top-(k−1)
    * behavior, correct only when every document has exactly k columns).
    *
    * Same input/output contract as [[readingOrder]]. The boundary table is
    * one ARRAY row per document (≤ k−1 ints), joined back per document —
    * per-document work is bounded by the page, never cross-document. */
  def readingOrderK(blocks: DataFrame, docCol: String, k: Int,
      gapThreshold: Int, minGap: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(gapThreshold >= 0 && minGap >= 0)
    val withCols =
      if (k == 1) blocks.withColumn("col_id", lit(0))
      else {
        val wx = Window.partitionBy(col(docCol)).orderBy(col("x").asc)
        val wg = Window.partitionBy(col(docCol))
          .orderBy(col("__gap").desc, col("x").asc)
        val bounds = blocks.select(col(docCol), col("x")).distinct()
          .withColumn("__gap", col("x") - lag(col("x"), 1).over(wx))
          .where(col("__gap").isNotNull && col("__gap") > minGap)
          .withColumn("__r", row_number().over(wg))
          .where(col("__r") <= k - 1)
          .groupBy(col(docCol))
          .agg(sort_array(collect_list(col("x"))).as("__bxs"))
        blocks.join(bounds, Seq(docCol), "left")
          .withColumn("col_id",
            coalesce(size(filter(col("__bxs"), b => b <= col("x"))), lit(0)))
          .drop("__bxs")
      }
    orderAndRegion(withCols, docCol, gapThreshold)
  }

  /** Typeset an extracted span stream into positioned blocks — the adapter
    * between the extraction pipeline (ordered (kind, text, media_ref)
    * spans per document) and the layout passes above. The demo geometry is
    * synthetic but the FLOW is the real typesetting rule: each span starts
    * where the previous one ended (running character offset = cumulative
    * span length + 1 separator, in span order), lines break every
    * `charsPerLine` characters, columns break every `linesPerCol` lines:
    *
    *   flow  = Σ (length(text)+1) over prior spans      (window cumsum)
    *   line  = flow div charsPerLine
    *   col   = line div linesPerCol                      (unbounded — the
    *           canvas extends rightward; pass a k to [[readingOrderK]]
    *           that covers the widest document)
    *   x     = col · colWidth + flow mod charsPerLine
    *   y     = (line mod linesPerCol) · lineHeight
    *
    * Round-trip contract (LayoutSpec): readingOrderK over these blocks
    * recovers reading_pos == the original span pos, because y,x ascend
    * with flow inside a column and columns ascend left-to-right. Input:
    * exploded spans (docCol, posCol, textCol, payload...); output: input
    * columns + (x, y). Pure window-cumsum + integer algebra per document.
    */
  def blocksFromSpans(spans: DataFrame, docCol: String, posCol: String,
      textCol: String, charsPerLine: Int, linesPerCol: Int,
      colWidth: Int, lineHeight: Int): DataFrame = {
    require(charsPerLine >= 1 && linesPerCol >= 1 && colWidth > charsPerLine &&
      lineHeight >= 1)
    val w = Window.partitionBy(col(docCol)).orderBy(col(posCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    spans
      .withColumn("__flow",
        coalesce(sum(length(col(textCol)) + 1).over(w), lit(0L)))
      // `div` = integer division (never a float detour — the determinism
      // contract is integer math end to end)
      .withColumn("__line", expr(s"__flow div $charsPerLine"))
      .withColumn("x",
        (expr(s"__line div $linesPerCol") * colWidth +
          col("__flow") % charsPerLine).cast("int"))
      .withColumn("y",
        ((col("__line") % linesPerCol) * lineHeight).cast("int"))
      .drop("__flow", "__line")
  }
}
