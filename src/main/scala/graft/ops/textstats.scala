package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column algebra
  * (codegen-friendly, no UDFs); the same formulas surface in
  * [[graft.Queries]] with DuckDB oracle twins. */
object TextStats {

  /** Marker-word profiles for the n-gram/stopword language-ID heuristic. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "db" -> Seq("table", "scan", "join", "merge", "hash"),
    "st" -> Seq("stream", "batch", "window", "row", "group"))

  private def markerCount(textCol: Column, markers: Seq[String]): Column =
    expr(s"size(filter(split(${textCol.toString()}, ' '), " +
      s"w -> w in (${markers.map("'" + _ + "'").mkString(",")})))")

  /** Predicted language: ordered argmax over profile scores (first profile
    * wins ties — deterministic). */
  def langId(textCol: Column): Column = {
    val scores = profiles.map { case (name, ms) => name -> markerCount(textCol, ms) }
    scores.dropRight(1).zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((name, score), i), els) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.map(score >= _).reduce(_ && _), name).otherwise(els)
    }
  }

  /** Integer quality score: 4·words + 3·stopwords (the boilerplate
    * classifier's text-density formula, graft.Classify.textScore). */
  def qualityScore(textCol: Column): Column = {
    val stops = graft.Classify.Stopwords.toSeq.sorted.map("'" + _ + "'").mkString(",")
    (lit(4) * size(split(textCol, " ")) +
      lit(3) * expr(s"size(filter(split(${textCol.toString()}, ' '), w -> w in ($stops)))"))
      .cast("int")
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, " "))

  /** BPE-ish subword count estimate: tokens plus one extra per 6 chars of
    * long words (cheap deterministic proxy for a real tokenizer). */
  def subwordEstimate(textCol: Column): Column =
    expr(s"aggregate(split(${textCol.toString()}, ' '), 0, " +
      "(acc, w) -> acc + 1 + int(length(w) / 6))")

  /** Order-insensitive bag-of-words fingerprint. */
  def fingerprint(textCol: Column): Column =
    md5(array_join(array_sort(split(textCol, " ")), " "))
}
