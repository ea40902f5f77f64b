package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document ingestion sources (SURVEY.md §2B "Scans / sources / sinks").
  *
  * Reference analog: qetch's extractors consume JSON API payloads
  * (qetch/fourchan.py::handle_thread parses `a.4cdn.org/...thread.json`;
  * gfycat.py parses `api.gfycat.com` JSON) — the engine-side equivalent is
  * ingesting JSON-lines document dumps into the canonical
  * `(doc_id, spans[], domain, bucket)` table. The schema is DECLARED, never
  * inferred (schema inference is a full extra pass over 100 TB).
  *
  * Bucketing at ingest uses a portable md5-derived bucket (identical in
  * any engine, incl. the DuckDB oracle) rather than an engine-native hash:
  * bucket = int(md5(doc_id)[0:6] as hex) mod NumBuckets.
  */
object Sources {

  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  /** Declared JSONL schema: {"doc_id":…, "domain":…, "spans":[{kind,text,media_ref,offset}…]} */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("domain", StringType, nullable = false),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false)))

  /** Portable ingest-side bucket (same value in Spark and DuckDB). */
  def md5Bucket(c: org.apache.spark.sql.Column, buckets: Int = DocGen.NumBuckets) =
    pmod(conv(substring(md5(c), 1, 6), 16, 10).cast("int"), lit(buckets))

  /** Ingest a JSON-lines dump into the canonical document table. One
    * narrow scan: JSON parse + bucket column, no shuffle (the write side
    * decides layout). Corrupt lines fail fast (FAILFAST), and so do
    * WELL-FORMED lines missing a required field — FAILFAST alone lets
    * `{"doc_id":"d1"}` through as nulls, and that corruption would only
    * surface deep inside a downstream task. At ingest time silent nulls
    * are data loss. */
  def fromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "FAILFAST")
      .json(path)
      .filter(
        when(col("doc_id").isNull || col("domain").isNull || col("spans").isNull,
          raise_error(concat(lit("fromJsonl: missing required field on line with doc_id="),
            coalesce(col("doc_id"), lit("<null>")))))
          .otherwise(lit(true)))
      .withColumn("bucket", md5Bucket(col("doc_id")))

  /** PERMISSIVE ingest with an explicit QUARANTINE side-channel — the
    * robustness counterpart of [[fromJsonl]]: a crawl dump at 100 TB WILL
    * contain malformed lines, and FAILFAST turns one bad byte into a dead
    * job. Reads the dump as raw text ONCE and parses in-plan
    * (`from_json`), so the quarantined row keeps the ORIGINAL line
    * verbatim (a corrupt-record column reconstructed from parsed fields
    * would not round-trip). Returns (good, quarantine):
    *  - good: the canonical bucketed table, exactly [[fromJsonl]]'s rows
    *    on a clean dump;
    *  - quarantine: (raw, reason) with reason ∈ {corrupt, missing_field} —
    *    the re-drive surface (fix upstream, re-ingest just these lines).
    * Both sides derive from one scan; materialize the parent if computing
    * both (each action re-scans otherwise). */
  def fromJsonlQuarantine(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // PERMISSIVE from_json PARTIALLY parses malformed lines (a truncated
    // array still yields doc_id/domain), so "did it parse to null" cannot
    // detect corruption — the corrupt-record column inside the parse
    // schema is the reliable signal (set on any parse error, even when
    // partial fields survive).
    val parseSchema = docSchema.add(StructField("_corrupt", StringType, nullable = true))
    val parsed = spark.read.text(path)
      .withColumn("__p", from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
    val bad = col("__p").isNull || col("__p._corrupt").isNotNull ||
      col("__p.doc_id").isNull || col("__p.domain").isNull || col("__p.spans").isNull
    val good = parsed.where(!bad)
      .select(col("__p.doc_id").as("doc_id"), col("__p.domain").as("domain"),
        col("__p.spans").as("spans"))
      .withColumn("bucket", md5Bucket(col("doc_id")))
    val quarantine = parsed.where(bad)
      .select(col("value").as("raw"),
        when(col("__p").isNull || col("__p._corrupt").isNotNull, lit("corrupt"))
          .otherwise(lit("missing_field")).as("reason"))
    (good, quarantine)
  }

  /** Dump a document table as JSONL (the inverse, for interchange). */
  def toJsonl(docs: DataFrame, path: String): Unit =
    docs.select(to_json(struct(col("doc_id"), col("domain"), col("spans"))).as("value"))
      .write.mode("overwrite").text(path)
}
