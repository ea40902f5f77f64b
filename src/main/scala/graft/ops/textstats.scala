package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column algebra
  * (codegen-friendly, no UDFs); the same formulas surface in
  * [[graft.Queries]] with DuckDB oracle twins. */
object TextStats {

  /** Characteristic word lists per language class — the seed material the
    * character-trigram profiles are built from (the standard n-gram-profile
    * language-ID construction, Cavnar–Trenkle style, reduced to a fixed
    * deterministic profile table so the score is an exact integer in every
    * engine). */
  val profileWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "that", "this", "from", "with", "is", "at"),
    "db" -> Seq("table", "scan", "join", "merge", "hash", "query", "filter", "sort"),
    "st" -> Seq("stream", "batch", "window", "group", "frame", "row", "value"))

  /** Trigram profile per language: every padded character trigram of the
    * profile words (" th", "the", "he " for "the"), distinct and sorted —
    * a fixed table, identical in the Spark expression and the SQL oracle. */
  val trigramProfiles: Seq[(String, Seq[String])] = profileWords.map { case (l, ws) =>
    l -> ws.flatMap { w =>
      val p = s" $w "
      (0 to p.length - 3).map(i => p.substring(i, i + 3))
    }.distinct.sorted
  }

  /** Count of the text's padded character trigrams that appear in the
    * profile (with multiplicity) — pure integer column algebra. */
  def trigramScore(textCol: Column, profile: Seq[String]): Column = {
    val lits = profile.map("'" + _ + "'").mkString(",")
    val pad = s"concat(' ', ${textCol.toString()}, ' ')"
    expr(s"""IF(length($pad) < 3, 0,
            |  size(filter(transform(sequence(1, length($pad) - 2),
            |    i -> substring($pad, i, 3)), t -> t in ($lits))))""".stripMargin)
  }

  /** Predicted language: ordered argmax over the trigram-profile scores
    * (first profile wins ties — deterministic). */
  def langId(textCol: Column): Column = {
    val scores = trigramProfiles.map { case (name, p) => name -> trigramScore(textCol, p) }
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

  /** BPE-style pre-tokenizer pattern (GPT-2's pre-tokenization regex
    * reduced to its engine-portable core): a token is an optionally
    * space-prefixed letter run, digit run, or single other symbol. Ordered
    * alternation behaves identically under Java regex (Spark) and RE2
    * (DuckDB) for these disjoint branches. */
  val PreTokenPattern: String = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]"

  /** All pre-tokens of a string column (array<string>). Column-native
    * (no SQL-string interpolation — a derived or backtick-needing column
    * would not round-trip through toString). */
  def preTokens(textCol: Column): Column =
    regexp_extract_all(textCol, lit(PreTokenPattern), lit(0))

  /** BPE-ish subword count estimate: tokens plus one extra per 6 chars of
    * long words (cheap deterministic proxy for a real tokenizer). */
  def subwordEstimate(textCol: Column): Column =
    expr(s"aggregate(split(${textCol.toString()}, ' '), 0, " +
      "(acc, w) -> acc + 1 + int(length(w) / 6))")

  /** Order-insensitive bag-of-words fingerprint. */
  def fingerprint(textCol: Column): Column =
    md5(array_join(array_sort(split(textCol, " ")), " "))
}
