package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.CollectionAccumulator
import scala.collection.mutable

/** The distributed extraction core (SURVEY.md §3.4, §7.3 M1).
  *
  * One typed `mapPartitions` stage sandwiched between column-algebra
  * DataFrame stages: the registry (config, not data) is shipped once per
  * task closure and compiled once per partition; each document flows
  * through dispatch → classify → media-link exactly as in qetch's
  * `extract()` (qetch/extractors/_common.py::BaseExtractor.extract), but
  * over partitions of a Dataset instead of one URL at a time.
  *
  * Scale design:
  *  - `repartitionByRange(buckets, $"bucket", $"doc_id")` is the single
  *    Exchange; bucket is the checkpoint/lineage unit (SURVEY.md §2C) and
  *    doc_id range-ordering keeps partitions balanced (doc_ids are uniform;
  *    domain skew never reaches this shuffle key).
  *  - per-partition metrics are accumulated inline (one histogram + counters
  *    per bucket seen) and surfaced through a CollectionAccumulator — no
  *    second pass over the data for the metrics side table.
  *  - the iterator is fully streaming: no per-partition buffering beyond the
  *    current document (spill-safety at 100 TB, SURVEY.md §4.2).
  */
object ExtractJob {

  /** Pure transform: raw docs → extracted docs, metrics flowing to `acc`.
    * `runId` stamps the metrics rows for lineage. */
  def transform(
      docs: Dataset[RawDoc],
      acc: CollectionAccumulator[PartitionMetrics],
      runId: String,
      numPartitions: Int = DocGen.NumBuckets): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    docs
      .repartitionByRange(numPartitions, $"bucket", $"doc_id")
      .mapPartitions { it =>
        val registry = CompiledRegistry.default
        val t0 = System.nanoTime()
        // per-bucket counters within this partition
        final class C { var docs = 0L; var spansIn = 0L; var spansOut = 0L
          val hist = new Array[Long](10) }
        val perBucket = mutable.LinkedHashMap.empty[Int, C]
        new Iterator[ExtractedDoc] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && perBucket.nonEmpty) { // partition drained → emit metrics
              val wall = System.nanoTime() - t0
              perBucket.foreach { case (b, c) =>
                acc.add(PartitionMetrics(runId, b, c.docs, c.spansIn,
                  c.spansOut, wall, c.hist.toVector))
              }
              perBucket.clear()
            }
            h
          }
          def next(): ExtractedDoc = {
            val doc = it.next()
            val out = Classify.extractDoc(doc, registry)
            val c = perBucket.getOrElseUpdate(doc.bucket, new C)
            c.docs += 1
            c.spansIn += doc.spans.length
            c.spansOut += out.spans.length
            c.hist(Classify.confBucket(out.confidence)) += 1
            out
          }
        }
      }
  }

  /** [[transform]] without a metrics accumulator (tests/ad-hoc use). */
  def transformNoMetrics(docs: Dataset[RawDoc], numPartitions: Int): Dataset[ExtractedDoc] = {
    val acc = new CollectionAccumulator[PartitionMetrics]
    docs.sparkSession.sparkContext.register(acc)
    transform(docs, acc, "nometrics", numPartitions)
  }

  /** Full job: extract `docs` restricted to `pendingBuckets`, write each
    * bucket idempotently (dynamic partition overwrite), write metrics, and
    * commit a new snapshot to the manifest. Returns the snapshot id.
    *
    * Idempotence: rerunning a bucket overwrites exactly that bucket's
    * directory, so a crash between write and commit is safe — the manifest
    * is the source of truth (SURVEY.md §7.4, §7.5-2).
    *
    * `native = true` routes extraction through the `extract_spans` Catalyst
    * expression (plans.ExtractExpression — the fast path, ~1.7×); metrics
    * then come from one cheap scan of the committed output instead of the
    * in-flight accumulator (wall_ns=0 and spans_in=-1 in that mode —
    * re-reading the whole input just for spans_in would double the scan at
    * 100 TB; input-side counts belong to ingest metrics). Both engines are
    * span-for-span identical (SpanEqualitySpec).
    */
  def run(
      spark: SparkSession,
      docs: Dataset[RawDoc],
      tableDir: String,
      runId: String,
      resume: Boolean = true,
      native: Boolean = false): Manifest.Snapshot = {
    import spark.implicits._
    val table = new Manifest(tableDir)
    val completed = if (resume) table.completedBuckets() else Set.empty[Int]
    val allBuckets = (0 until DocGen.NumBuckets).toSet
    val pending = (allBuckets -- completed).toSeq.sorted

    if (pending.isEmpty) return table.head().get

    val acc = new CollectionAccumulator[PartitionMetrics]
    spark.sparkContext.register(acc, s"graft.metrics.$runId")

    // partition-pruning filter: with a parquet source partitioned by bucket
    // this prunes directories; with a generated Dataset it's a cheap filter.
    val pendingDocs = docs.where($"bucket".isin(pending: _*)).as[RawDoc]
    val extracted =
      if (native) plans.GraftFunctions.extractColumnar(pendingDocs.toDF())
      else transform(pendingDocs, acc, runId, numPartitions = pending.length).toDF()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    extracted
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(s"$tableDir/data")

    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val metrics =
      if (native) {
        // metrics from data at rest (one cheap scan of the committed output)
        spark.read.parquet(s"$tableDir/data")
          .where($"bucket".isin(pending: _*))
          .groupBy($"bucket")
          .agg(count("*").as("docs"),
            sum(size($"spans")).as("spans_out"),
            array((0 until 10).map(i =>
              sum(when(least(floor($"confidence" * 10).cast("int"), lit(9)) === i, 1L)
                .otherwise(0L))): _*).as("hist"))
          .collect().map { r =>
            PartitionMetrics(runId, r.getInt(0), r.getLong(1), -1L,
              r.getLong(2), 0L, r.getSeq[Long](3))
          }.toSeq
      } else acc.value.asScala.toSeq
    if (metrics.nonEmpty)
      spark.createDataset(metrics).write.mode("append")
        .parquet(s"$tableDir/metrics")

    // watermark per bucket = max doc_id actually written (recomputed from
    // the committed files — lineage reflects data at rest, not in flight)
    val wm = spark.read.parquet(s"$tableDir/data")
      .where($"bucket".isin(pending: _*))
      .groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.max($"doc_id").as("wm"),
        org.apache.spark.sql.functions.count("*").as("rows"))
      .collect()
      .map(r => Manifest.BucketState(r.getInt(0), r.getLong(2), Option(r.getString(1)).getOrElse("")))
      .toSeq

    table.commit(runId, wm)
  }
}
