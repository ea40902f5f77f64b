package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text featurization: the hashing-trick document embedding
  * (feature hashing à la Weinberger et al. — each word hashes to a bucket
  * in [0, dims) with a ±1 sign; the doc vector is the signed bucket count
  * sum). This closes the text → embedding gap so a corpus can flow
  * text → hashEmbed → SRP-LSH / IVF / PQ entirely inside this library,
  * with no external model.
  *
  * The hash is the portable 60-bit md5 recipe ([[Sampling.hashBp]]), so
  * the embedding is bit-identical across engines and runs: integer
  * vectors for oracle exactness, with [[normalized]] providing the
  * unit-length double view the cosine ANN operators expect. Pure per-row
  * column algebra — no shuffle, no UDF, no driver state. */
object Embed {

  /** Adds `vec` — the integer hashed embedding (array<int>, length `dims`)
    * of whitespace words in `textCol`. Cost is O(dims · words) per row
    * after a single md5 per word (the (bucket, sign) pairs are
    * materialized once in `__bs`). */
  def hashEmbed(df: DataFrame, textCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val bs = s"""transform(split($textCol, ' '), x -> named_struct(
                |  'b', CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % $dims,
                |  'sg', IF(CAST(conv(substring(md5(x), 16, 1), 16, 10) AS INT) % 2 = 0, 1, -1)))"""
      .stripMargin
    df.withColumn("__bs", expr(bs))
      .withColumn("vec", expr(
        s"transform(sequence(0, ${dims - 1}), d -> aggregate(__bs, 0, (acc, e) -> acc + IF(e.b = d, e.sg, 0)))"))
      .drop("__bs")
  }

  /** SQL fragments computing the same embedding in DuckDB — kept beside
    * the Spark definition so the two can never drift. `bsSql` builds the
    * per-word (bucket, sign) list; `vecSql` folds it into the vector. */
  def bsSql(text: String, dims: Int): String =
    s"""list_transform(string_split($text, ' '), x -> {
       |  'b': ('0x' || substr(md5(x), 1, 15))::BIGINT % $dims,
       |  'sg': CASE WHEN ('0x' || substr(md5(x), 16, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END})"""
      .stripMargin
  def vecSql(bs: String, dims: Int): String =
    s"""list_transform(range(0, $dims), d ->
       |  CAST(coalesce(list_sum(list_transform($bs, e -> CASE WHEN e.b = d THEN e.sg ELSE 0 END)), 0) AS INT))"""
      .stripMargin

  /** Unit-L2-normalized double view of an integer embedding (what the
    * cosine ANN operators consume); the zero vector stays zero. */
  def normalized(vecCol: Column): Column = {
    val nrm = sqrt(expr(s"aggregate(${vecCol.toString()}, 0.0D, (a, v) -> a + CAST(v AS DOUBLE) * v)"))
    when(nrm === 0.0, expr(s"transform(${vecCol.toString()}, v -> 0.0D)"))
      .otherwise(transform(vecCol, v => v.cast("double") / nrm))
  }
}
