package graft

/** Canonical data model (SURVEY.md §1.2, BASELINE.json input_hint).
  *
  * Reference analog: qetch/content.py::Content (attrs record with ordered
  * `fragments`) generalized to the north-rule span shape. Ordering is
  * data-borne via `offset` — never row order — so span sequences survive
  * shuffle/Parquet round-trips (SURVEY.md §7.5-1).
  */

/** One span of an interleaved text+media document (input side).
  * Matches input_hint: spans:array<struct<kind,text,media_ref,offset:int32>>. */
case class RawSpan(kind: String, text: String, media_ref: String, offset: Int)

/** One raw document. `domain` (skew axis, qetch BaseExtractor.domains analog)
  * and `bucket` (range bucket of doc_id — unit of checkpointing) are
  * synthesis-side partitioning columns, not part of the per-row invariant. */
case class RawDoc(doc_id: String, spans: Seq[RawSpan], domain: String, bucket: Int)

/** One span of an extracted document (output side). Same struct shape: the
  * per-row invariant is span-sequence equality on (kind, text, media_ref, order). */
case class OutSpan(kind: String, text: String, media_ref: String, offset: Int)

/** Extraction result for one document.
  * `extractor` = which registry rule matched (qetch get_extractor analog);
  * `confidence` = classifier confidence (qetch Content.quality analog);
  * `spans_in` = raw input span count — carried so input-side metrics are
  * derivable from data at rest (accumulator-free, retry-safe). */
case class ExtractedDoc(
    doc_id: String,
    spans: Seq[OutSpan],
    extractor: String,
    confidence: Double,
    domain: String,
    bucket: Int,
    spans_in: Int)

/** Per-partition extraction metrics row (north rule: metrics side table).
  * conf_histogram has 10 buckets: floor(confidence*10) clamped to [0,9].
  * `wall_ns` is the WHOLE-JOB wall duration of the run that committed this
  * bucket, duplicated onto every bucket row of that run (per-bucket wall
  * time is not observable from data at rest) — do NOT sum it across rows;
  * aggregate with max/any_value per run_id instead. */
case class PartitionMetrics(
    run_id: String,
    bucket: Int,
    docs: Long,
    spans_in: Long,
    spans_out: Long,
    wall_ns: Long,
    conf_histogram: Seq[Long])
