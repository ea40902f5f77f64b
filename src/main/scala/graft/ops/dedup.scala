package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * All operators are pure column algebra (higher-order array functions, no
  * UDFs) so Catalyst can prune/push down around them, and all hashing is
  * md5-based so results are portable and deterministic across engines and
  * runs (no seed-dependent native hash).
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash-LSH is
  * signature (narrow map) → band explode (bands rows/doc) → bucket groupBy →
  * within-bucket pairs — never an O(n²) cross join. SimHash is a narrow
  * explode+agg per doc.
  */
object Dedup {

  /** Keep-first exact dedup on a content column: one row per distinct
    * content hash, earliest `idCol` wins (deterministic). */
  def exactDedup(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(contentCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature: k salted min-md5 values over word 3-gram shingles.
    * Adds `sig` (array<string>, length k). Docs with fewer than 3 words get
    * an empty signature (they never spuriously collide). */
  def minhashSignatures(df: DataFrame, textCol: String, k: Int = 8): DataFrame = {
    val sigs = (0 until k).map(i =>
      expr(s"array_min(transform(__shingles, s -> md5(concat('$i:', s))))"))
    df.withColumn("__ws", split(col(textCol), " "))
      .withColumn("__shingles",
        when(size(col("__ws")) >= 3,
          expr("""transform(sequence(0, size(__ws) - 3),
                 |  i -> concat_ws(' ', element_at(__ws, i + 1),
                 |                      element_at(__ws, i + 2),
                 |                      element_at(__ws, i + 3)))""".stripMargin))
          .otherwise(array()))
      .withColumn("sig",
        when(size(col("__shingles")) > 0, array(sigs: _*))
          .otherwise(array().cast("array<string>")))
      .drop("__ws", "__shingles")
  }

  /** LSH candidate pairs from MinHash signatures: split the k-value
    * signature into `bands` bands, hash each band, self-join on
    * (band index, band hash) — docs sharing any band bucket become
    * candidates. Returns distinct (id_a, id_b) with id_a < id_b. Scale
    * path: shuffle O(docs × bands); pair blow-up only within buckets. */
  def lshCandidatePairs(sigDf: DataFrame, idCol: String, bands: Int): DataFrame = {
    val banded = sigDf
      .where(size(col("sig")) > 0)
      .select(col(idCol).as("__id"),
        posexplode(expr(
          s"""transform(sequence(0, $bands - 1),
             |  b -> md5(concat_ws('|',
             |    slice(sig, b * (size(sig) div $bands) + 1, size(sig) div $bands))))"""
            .stripMargin))
          .as(Seq("band", "bandhash")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bandhash") === col("y.bandhash") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
  }

  /** Exact word-set Jaccard for candidate pairs — the verify stage after
    * LSH banding. `pairs` has (id_a, id_b); returns pairs + jaccard ≥
    * threshold. */
  def jaccardVerify(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, threshold: Double): DataFrame = {
    val words = docs.select(col(idCol).as("__id"),
      array_distinct(split(col(textCol), " ")).as("__wset"))
    pairs
      .join(words.as("wa"), col("id_a") === col("wa.__id"))
      .join(words.as("wb"), col("id_b") === col("wb.__id"))
      .withColumn("inter", size(array_intersect(col("wa.__wset"), col("wb.__wset"))))
      .withColumn("uni", size(array_union(col("wa.__wset"), col("wb.__wset"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, k).select(col(idCol), col("sig"))
    val cands = lshCandidatePairs(sigs, idCol, bands)
    jaccardVerify(docs, idCol, textCol, cands, threshold)
  }

  /** 60-bit SimHash per row: explode words, md5→60-bit int, per-bit signed
    * vote. Returns df with (idCol, simhash: bigint). Narrow + one groupBy. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hv = conv(substring(md5(col("__w")), 1, 15), 16, 10).cast("bigint")
    val bits = (0 until 60).map { i =>
      when(sum(when(shiftright(col("__hv"), i).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .withColumn("__hv", hv)
      .groupBy(col(idCol))
      .agg(bits.as("simhash"))
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = expr(s"bit_count(${a.toString} ^ ${b.toString})")
}
