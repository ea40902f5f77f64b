package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixing / packing operators for training-data
  * preparation: per-source mixture weighting (the "data mixture" step that
  * up/down-samples each corpus source to its training proportion),
  * reproducible train/held-out splits, and token-budget shard packing
  * (grouping documents into fixed-budget training shards).
  *
  * Everything is HASH-deterministic — no RNG, no row-order dependence — so
  * a resumed or re-run job samples the exact same rows (the property random
  * `sample()` cannot give), results are partition-invariant, and the DuckDB
  * oracle twins in [[graft.Queries]] reproduce every decision exactly. */
object Sampling {

  /** Portable uniform hash of a key into [0, 10000) basis points: the
    * first 15 hex chars of md5 (60 bits, sign-safe in an int64) mod 10⁴.
    * Spark `conv(hex,16,10)` and DuckDB `('0x'||hex)::bigint` agree
    * digit-for-digit (same recipe as the corpus bucketing in
    * [[graft.Sources]]). */
  def hashBp(keyCol: Column): Column = (hash60(keyCol) % 10000).cast("int")

  /** Portable 60-bit md5 integer of a key — the ONE copy of the
    * cross-engine recipe: [[hashBp]], [[packShardsBucketed]] and
    * [[graft.ops.Bloom]] all build on it ([[hash60Sql]] twins it in
    * DuckDB; a second hand-copied instance is exactly how the two
    * engines' hashes drift apart). */
  private[ops] def hash60(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** DuckDB twin of [[hash60]] — the other half of the one-copy rule. */
  private[ops] def hash60Sql(key: String): String =
    s"(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15))::BIGINT)"

  /** SQL fragment computing [[hashBp]] in DuckDB — kept beside the Spark
    * definition so the two can never drift. */
  def hashBpSql(key: String): String =
    s"CAST(${hash60Sql(key)} % 10000 AS INT)"

  /** Above this many strata the rate table joins as a broadcast DataFrame
    * instead of a CASE cascade — a 10k-entry when-chain is a plan-size /
    * codegen blowup (the same hazard class as a literal IVF codebook). */
  val RatesLiteralMax = 64

  /** Resolve a per-stratum basis-point table to a Column: small maps
    * compile to a pure map-side CASE (shuffle-free); maps above
    * [[RatesLiteralMax]] reach executors as a BROADCAST rate-table join —
    * still map-side, never a plan literal (a 10k-entry when-chain is a
    * codegen blowup). Returns (joined frame, bp column, columns the
    * caller must drop). Shared by [[mixtureSample]] and
    * [[mixtureEpochs]] so the two can never drift. */
  private def resolveBp(df: DataFrame, stratumCol: String,
      bpMap: Map[String, Int], defaultBp: Int): (DataFrame, Column, Seq[String]) =
    if (bpMap.size <= RatesLiteralMax) {
      val bp = bpMap.toSeq.sortBy(_._1).foldRight(lit(defaultBp)) {
        case ((s, v), els) => when(col(stratumCol) === s, v).otherwise(els)
      }
      (df, bp, Nil)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val rates = bpMap.toSeq.toDF("__stratum", "__bp")
      (df.join(broadcast(rates), col(stratumCol) === col("__stratum"), "left"),
        coalesce(col("__bp"), lit(defaultBp)), Seq("__stratum", "__bp"))
    }

  /** Mixture sampling: keep each row iff hashBp(id) < rate(stratum), with
    * per-stratum rates in basis points (10000 = keep all). Rows of strata
    * absent from `ratesBp` keep `defaultBp`. Plan shape per [[resolveBp]]:
    * map-side CASE or broadcast rate join, never a shuffle. At 100 TB
    * this composes with predicate pushdown (the md5 filter itself cannot
    * push into parquet, but stratum pruning can). */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val (d, bp, drops) = resolveBp(df, stratumCol, ratesBp, defaultBp)
    d.where(hashBp(col(idCol)) < bp).drop(drops: _*)
  }

  /** Fractional-EPOCH mixture — the UPSAMPLING half of a data recipe
    * ([[mixtureSample]] can only keep or drop): each row is emitted
    * ⌊e⌋ times plus one more iff hashBp(id ++ salt) < frac(e)·10⁴, where
    * e = epochsBp(stratum)/10⁴ (34000 = 3.4 epochs of that source —
    * every doc 3 times, a deterministic 40% of docs a 4th time). Each
    * copy carries a 0-based `epoch` column so downstream splits and
    * shuffles can decorrelate copies.
    *
    * The fractional draw is SALTED by default for the same reason
    * [[splitLabel]]'s is: unsalted, it would be fully correlated with
    * any [[mixtureSample]] run on the same ids (survivors of a 25% keep
    * all have hashBp(id) < 2500, so at 3.4 epochs EVERY survivor would
    * take the 4th copy — effective 4.0 epochs, a silent 17%
    * over-sample). Pass `salt = ""` when sub-epoch rates must reduce
    * EXACTLY to [[mixtureSample]]'s kept set (same hash, same
    * threshold, epoch ≡ 0) — and only compose that form with samplers
    * using a different salt.
    *
    * Scale shape: per-row CASE/broadcast bp resolution ([[resolveBp]]),
    * then `explode(sequence(...))` — map-side fan-out bounded by
    * ⌈max epochs⌉ per row, no shuffle; the output inherits the input's
    * partitioning with skew bounded by the epoch factor (cap epochsBp —
    * real recipes stay under ~10 epochs — rather than relying on AQE to
    * split a pathological 1000× stratum). */
  def mixtureEpochs(df: DataFrame, idCol: String, stratumCol: String,
                    epochsBp: Map[String, Int], defaultBp: Int,
                    salt: String = "epoch"): DataFrame = {
    require(epochsBp.values.forall(_ >= 0) && defaultBp >= 0,
      "epoch basis points must be >= 0")
    val (d, bp, drops) = resolveBp(df, stratumCol, epochsBp, defaultBp)
    epochFanOut(d.withColumn("__bp", bp), idCol, salt, drops)
  }

  /** The ⌊e⌋ + salted-fractional-draw copy fan-out shared by
    * [[mixtureEpochs]] and [[temperatureEpochs]]: expects epoch basis
    * points in `__bp`, emits one row per copy with a 0-based `epoch`. */
  private def epochFanOut(d: DataFrame, idCol: String, salt: String,
      extraDrops: Seq[String]): DataFrame = {
    val fracHash =
      if (salt.isEmpty) hashBp(col(idCol))
      else hashBp(concat(col(idCol).cast("string"), lit(salt)))
    d.withColumn("__copies",
        expr("__bp div 10000").cast("int") +
          when(fracHash < col("__bp") % 10000, 1).otherwise(0))
      .where(col("__copies") > 0)
      .withColumn("epoch", explode(expr("sequence(0, __copies - 1)")))
      .drop((extraDrops :+ "__bp" :+ "__copies"): _*)
  }

  /** Temperature-scaled mixture — the multilingual-pretraining recipe
    * (exponential smoothing of source proportions, mBERT/XLM-R style):
    * sampling probability q_i ∝ p_i^α where p_i is stratum i's natural
    * share, which at a fixed budget means per-stratum epochs ∝ c_i^(α−1).
    * [[mixtureSample]]/[[mixtureEpochs]] take rates as INPUT; this
    * operator DERIVES them from the corpus itself. Epochs are anchored to
    * the LARGEST stratum at exactly one pass — epochs_i = (c_max/c_i)^(1−α)
    * — so α=1 is natural proportions (everything one epoch), α=0
    * equalizes effective sizes (stratum i upsampled c_max/c_i×), and the
    * usual pretraining settings α∈[0.2, 0.7] land in between; no stratum
    * is ever downsampled, matching the published recipe's "temperature
    * reweights, a separate quality gate drops".
    *
    * Cross-engine exactness: for α ∈ {0, 0.5, 1} the derived basis points
    * are bit-identical in ANY IEEE-754 engine — integer counts convert
    * exactly, division and sqrt are correctly rounded by the standard, and
    * round-half-up of their result is deterministic ([[powPortable]]
    * routes α=0.5 through sqrt because `pow(x, 0.5)` carries no such
    * guarantee). Other α go through `pow`, whose last ULP is
    * engine-dependent — fine for training, not for a hash-equality oracle.
    *
    * Scale shape: per-stratum counts are one partial-agg pass, the bp
    * relation is stratum-sized (× a broadcast 1-row max), the rate join
    * broadcasts, and the copy fan-out is map-side — the only data-scale
    * shuffle is the count. Skew bound = c_max/c_min^(1−α); cap α away
    * from 0 when strata sizes span many orders of magnitude. */
  def temperatureEpochs(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double, salt: String = "temp"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
    val mx = counts.agg(max(col("__c")).as("__m"))
    val bp = counts.crossJoin(broadcast(mx))
      .withColumn("__bp",
        floor(powPortable(col("__m").cast("double") / col("__c").cast("double"),
          1.0 - alpha) * 10000d + 0.5d).cast("int"))
      .select(col(stratumCol).as("__stratum"), col("__bp"))
    // null-safe: a NULL stratum is a real count group (counts keeps it),
    // so its rows must reach the fan-out too, not vanish in the join
    val joined = df.join(broadcast(bp), col(stratumCol) <=> col("__stratum"))
      .drop("__stratum")
    epochFanOut(joined, idCol, salt, Nil)
  }

  /** x^e with the IEEE-correctly-rounded path taken where one exists:
    * e ∈ {0, 1} are exact identities, e = 0.5 is `sqrt` (correctly
    * rounded by IEEE 754, unlike `pow(x, 0.5)`), anything else falls
    * back to `pow`. */
  private def powPortable(x: Column, e: Double): Column =
    if (e == 0.0) lit(1.0)
    else if (e == 0.5) sqrt(x)
    else if (e == 1.0) x
    else pow(x, e)

  /** Deterministic split label: "test" for the `testBp`/10⁴ fraction of
    * ids, "train" otherwise. Salting the key decorrelates the split from
    * any mixture sampling done with the same id. */
  def splitLabel(idCol: Column, testBp: Int, salt: String = "split"): Column =
    when(hashBp(concat(idCol.cast("string"), lit(salt))) < testBp, "test")
      .otherwise("train")

  /** Token-budget shard packing: within each stratum, documents (in id
    * order — the deterministic analog of arrival order) accumulate their
    * token counts; a document starts shard ⌊exclusive-cumsum / budget⌋.
    * First-fit-sequential: a shard may overflow by at most one document.
    *
    * Scale shape: one window cumsum per stratum — the window SORTS the
    * whole stratum in one task, so this form is for bounded strata
    * (sources, shards of a previous pass). For an unbounded stratum use
    * [[packShardsBucketed]], which bounds every task by the hash bucket. */
  def packShards(df: DataFrame, idCol: String, stratumCol: String,
                 tokensCol: Column, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("tokens", tokensCol)
      .withColumn("cum0", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("shard", expr(s"CAST(cum0 div $budget AS INT)"))
      .drop("cum0")
  }

  /** [[packShards]] with bounded task size: documents sub-partition into
    * `buckets` deterministic hash buckets per stratum and pack within
    * (stratum, bucket) — no window task ever sorts more than a bucket (the
    * same bounded-buffer discipline as the exact-dedup partial-agg shape).
    * Shards are identified by (`pack_bucket`, `shard`); the budget
    * invariant (≤ one overflow doc per shard) holds per shard exactly as
    * in the flat form. */
  def packShardsBucketed(df: DataFrame, idCol: String, stratumCol: String,
                         tokensCol: Column, budget: Int, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bucketed = df.withColumn("pack_bucket",
      (hash60(col(idCol)) % buckets).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    bucketed.withColumn("tokens", tokensCol)
      .withColumn("cum0", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("shard", expr(s"CAST(cum0 div $budget AS INT)"))
      .drop("cum0")
  }

  /** Interleaved text+media token stream of one document's ordered span
    * array — the MULTIMODAL training-data shape (interleaved image-text
    * corpora à la Flamingo/MM1): text spans tokenize with `tokenize`,
    * each media span contributes ONE `mediaTok` placeholder token, and
    * the returned struct's `refs` array aligns 1:1 with `toks` (refs(i)
    * = the media_ref behind token i's placeholder, NULL at text
    * positions). Spans order by their `offset` field (input_hint's span
    * order), so the stream preserves the document's text/media
    * interleaving exactly; a NULL text span tokenizes to the empty array
    * rather than nulling the document (the hidden-cut guard stance of
    * [[packSequences]]). Feed the two result arrays straight into
    * [[packSequencesInterleaved]] — built together here, they cannot
    * desynchronize. Pure column algebra over the span array — narrow,
    * codegen-friendly, no UDF; `tokenize` is applied once per span. */
  def interleavedStream(spans: Column, tokenize: Column => Column,
      mediaTok: String = "<|media|>"): Column = {
    val sorted = array_sort(spans, (a, b) =>
      when(a("offset") < b("offset"), -1)
        .when(a("offset") > b("offset"), 1).otherwise(0))
    val perSpan = transform(sorted, s => struct(
      (s("kind") === "media").as("m"), s("media_ref").as("r"),
      when(s("kind") === "media", array(lit(mediaTok)))
        .otherwise(coalesce(tokenize(s("text")),
          array().cast("array<string>"))).as("t")))
    // perSpan feeds BOTH result arrays; bindOnce-bound so the sort and the
    // per-span tokenize run once per row, not once per output field
    // (Catalyst does no cross-expression CSE over these HOF trees)
    Cleaning.bindOnce(perSpan) { p =>
      struct(
        flatten(transform(p, x => x("t"))).as("toks"),
        flatten(transform(p, x =>
          when(x("m"), array(x("r"))).otherwise(
            array_repeat(lit(null).cast("string"), size(x("t")))))).as("refs"))
    }
  }

  /** SEQUENCE packing — the step after [[packShards]]: concatenate each
    * shard's documents (in id order) into one token stream and cut it
    * into fixed-`seqLen` training rows, sequences crossing document
    * boundaries exactly as a GPT-style pretraining loader does. Returns
    * one row per sequence: the `shardCols` + `(seq, toks, n_toks)`; the
    * final ragged tail is EMITTED with `n_toks < seqLen` (callers pad or
    * drop — silently discarding it here would be a hidden data cut).
    *
    * Scale shape: one grouped row per shard briefly holds that shard's
    * whole token stream, so per-task memory is bounded by the PACKING
    * BUDGET (the [[packShards]] contract: a shard never exceeds budget +
    * one document) — never by the corpus. Size the budget for executor
    * memory (a 1M-token budget ≈ 10s of MB of strings) and the rest is
    * pure column algebra: array_sort by (id) inside the aggregate makes
    * the concatenation order deterministic under any partitioning, and
    * the slicing is a per-row transform + posexplode, no second shuffle. */
  def packSequences(df: DataFrame, idCol: String, shardCols: Seq[String],
                    toksCol: Column, seqLen: Int): DataFrame =
    packedSequences(df, idCol, shardCols, toksCol, seqLen, withBounds = false)

  /** [[packSequences]] that additionally carries DOCUMENT BOUNDARIES: each
    * output sequence gets a `doc_ids` array aligned 1:1 with `toks`
    * (doc_ids(i) = the id of the document token i came from). A training
    * loader needs this to build the cross-document attention mask — a
    * packed sequence without boundaries silently lets documents attend to
    * each other. Same shapes and preconditions as [[packSequences]] (one
    * shared implementation; the id flat is `array_repeat` over the same
    * ordered+filtered aggregate as the token flat, so the two cannot
    * desynchronize). */
  def packSequencesWithBounds(df: DataFrame, idCol: String,
      shardCols: Seq[String], toksCol: Column, seqLen: Int): DataFrame =
    packedSequences(df, idCol, shardCols, toksCol, seqLen, withBounds = true)

  /** INTERLEAVED (multimodal) sequence packing — [[packSequencesWithBounds]]
    * for documents whose token stream carries media placeholders: `refsCol`
    * is an array aligned 1:1 with `toksCol` (refs(i) = the media_ref behind
    * token i, NULL at text positions — the shape [[interleavedStream]]
    * emits). Output sequences carry `toks`, `doc_ids` AND `media_refs`
    * sliced by the SAME arithmetic, plus `n_media` (non-null refs in the
    * sequence) — what an interleaved-pretraining loader (image-text
    * interleaved corpora) needs to fetch each sequence's media alongside
    * its tokens. A NULL refs array is normalized to all-NULL refs of the
    * token length (text-only doc in a multimodal corpus); a refs array of
    * a DIFFERENT length than its toks is a caller bug this operator does
    * not detect — build both sides with [[interleavedStream]] and they
    * cannot desynchronize. Same scale shape as [[packSequences]]: per-task
    * memory bounded by the packing budget, one shuffle, no UDF. */
  def packSequencesInterleaved(df: DataFrame, idCol: String,
      shardCols: Seq[String], toksCol: Column, refsCol: Column,
      seqLen: Int): DataFrame =
    packedSequences(df, idCol, shardCols, toksCol, seqLen,
      withBounds = true, refsCol = Some(refsCol))

  /** Shared implementation of [[packSequences]] /
    * [[packSequencesWithBounds]] / [[packSequencesInterleaved]] — the
    * load-bearing invariants (null-toks filter INSIDE the aggregate,
    * array_sort ordering, ragged-tail emission, slice arithmetic) live
    * exactly once. */
  private def packedSequences(df: DataFrame, idCol: String,
      shardCols: Seq[String], toksCol: Column, seqLen: Int,
      withBounds: Boolean, refsCol: Option[Column] = None): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(shardCols.nonEmpty, "shardCols must name at least one column")
    // the interleaved form aggregates a third aligned array per document;
    // NULL refs (text-only doc) normalize to all-NULL of the token length
    // BEFORE the aggregate so one such doc cannot null its shard's flatten
    val docFields = Seq(col(idCol).as("__pid"), toksCol.as("__toks")) ++
      refsCol.map(r => coalesce(r,
        array_repeat(lit(null).cast("string"), size(toksCol))).as("__refs"))
    val structFields =
      if (refsCol.isDefined) "struct(__pid, __toks, __refs)"
      else "struct(__pid, __toks)"
    val flat = df
      .select(shardCols.map(col) ++ docFields: _*)
      .groupBy(shardCols.map(col): _*)
      // null-toks docs contribute nothing (filtered INSIDE the aggregate
      // expression): flatten() returns NULL when ANY nested array is null,
      // so without the filter one null row would silently drop its whole
      // shard — the exact hidden-cut failure mode this operator avoids
      .agg(expr(s"filter(array_sort(collect_list($structFields)), " +
          "s -> s.__toks IS NOT NULL)").as("__docs"))
      .withColumn("__flat", expr("flatten(transform(__docs, s -> s.__toks))"))
      .where(size(col("__flat")) > 0)
    if (refsCol.isDefined)
      flat
        .withColumn("__ids", expr(
          "flatten(transform(__docs, s -> array_repeat(s.__pid, size(s.__toks))))"))
        .withColumn("__mrefs", expr("flatten(transform(__docs, s -> s.__refs))"))
        .withColumn("__seqs", expr(
          s"transform(sequence(0, (size(__flat) - 1) div $seqLen), " +
            s"i -> named_struct('t', slice(__flat, i * $seqLen + 1, $seqLen), " +
            s"'d', slice(__ids, i * $seqLen + 1, $seqLen), " +
            s"'m', slice(__mrefs, i * $seqLen + 1, $seqLen)))"))
        .select(shardCols.map(col) :+ posexplode(col("__seqs")).as(Seq("seq", "__s")): _*)
        .select(col("*"), col("__s.t").as("toks"), col("__s.d").as("doc_ids"),
          col("__s.m").as("media_refs"))
        .drop("__s")
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_media",
          size(expr("filter(media_refs, x -> x IS NOT NULL)")))
    else if (!withBounds)
      flat
        .withColumn("__seqs", expr(
          s"transform(sequence(0, (size(__flat) - 1) div $seqLen), " +
            s"i -> slice(__flat, i * $seqLen + 1, $seqLen))"))
        .select(shardCols.map(col) :+ posexplode(col("__seqs")).as(Seq("seq", "toks")): _*)
        .withColumn("n_toks", size(col("toks")))
    else
      flat
        .withColumn("__ids", expr(
          "flatten(transform(__docs, s -> array_repeat(s.__pid, size(s.__toks))))"))
        .withColumn("__seqs", expr(
          s"transform(sequence(0, (size(__flat) - 1) div $seqLen), " +
            s"i -> named_struct('t', slice(__flat, i * $seqLen + 1, $seqLen), " +
            s"'d', slice(__ids, i * $seqLen + 1, $seqLen)))"))
        .select(shardCols.map(col) :+ posexplode(col("__seqs")).as(Seq("seq", "__s")): _*)
        .select(col("*"), col("__s.t").as("toks"), col("__s.d").as("doc_ids"))
        .drop("__s")
        .withColumn("n_toks", size(col("toks")))
  }

  /** Leakage-safe train/eval split: near-duplicate documents must land in
    * the SAME split — splitting doc-by-doc leaks test content into train
    * through its near-dup mirrors (the canonical eval-contamination
    * pitfall; the n-gram/semantic decontaminate operators catch leaks
    * against an EXTERNAL benchmark, this prevents manufacturing them when
    * carving the eval set out of the corpus itself). `pairs` is any
    * near-dup pair relation (LSH, SimHash, semantic); members of a
    * connected component inherit their component MINIMUM's deterministic
    * draw ([[hashBp]] of the representative + salt), so the whole cluster
    * lands together. Unpaired docs draw on their own id. Output: `docs`
    * plus a `split` column ('test' iff the draw < testBp).
    *
    * Scale shape: [[graft.ops.Dedup.resolveClusters]] over the pairs
    * (pairs-sized, small-star/large-star), then ONE equi-join of the
    * cluster relation onto the corpus — the cluster side is bounded by
    * the paired docs, not the corpus. */
  def splitByCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
      testBp: Int, salt: String = "split", idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 50): DataFrame = {
    require(testBp >= 0 && testBp <= 10000,
      s"testBp must be in [0, 10000], got $testBp")
    val clusters = graft.ops.Dedup.resolveClusters(pairs, idA, idB, maxIters)
      .select(col("id").as(idCol), col("cluster_id").as("__rep0"))
    docs.join(clusters, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("__rep0"), col(idCol)))
      .withColumn("split",
        when(hashBp(concat(col("__rep").cast("string"), lit(salt))) < testBp,
          lit("test")).otherwise(lit("train")))
      .drop("__rep0", "__rep")
  }

  /** Deterministic TRAINING-ORDER shuffle: every training run reads its
    * sequences in an order decorrelated from the corpus layout (shard
    * packing clusters by domain; feeding that order would feed the model
    * hours of one domain at a time), and the order must be REPLAYABLE —
    * resuming a crashed training job mid-epoch needs byte-identical
    * ordering, which `rand()` or a cluster-dependent exchange cannot give.
    *
    * Each row gets a portable 60-bit key ([[hash60]] of its identity
    * columns + `salt`), and the frame is range-exchanged and sorted on it
    * — a TOTAL order with no global window: every output file holds a
    * disjoint sorted key range, so a loader reading files in key order
    * streams the corpus in shuffled order, any contiguous key slice is an
    * unbiased sample (the restart-mid-epoch property), and a new epoch is
    * just a new salt — a full reshuffle for the cost of one exchange (the
    * same exchange ANY layout pass pays). Identity columns also break
    * key-collision ties in the sort, so the order is deterministic even
    * across the ~2⁻³⁰-probability 60-bit collisions a trillion-row corpus
    * will contain. Emits `outCol` so the order is auditable at rest
    * ([[graft.ops.Zorder.fileEnvelopes]] on it shows the disjoint
    * per-file ranges).
    *
    * NULL identity values render as a chr(2) sentinel BEFORE joining —
    * bare `concat_ws` silently SKIPS null parts (so ("a", NULL) and
    * (NULL, "a") would collapse to one key) while the SQL twin's `||`
    * propagates NULL into a NULL key: the sentinel keeps every row's key
    * total, distinct per null position, and engine-identical. (A non-null
    * identity value equal to the control character itself would collide
    * with the sentinel — deterministically, on both engines.) */
  def shuffleOrder(df: DataFrame, idCols: Seq[Column], salt: String,
      nParts: Int, outCol: String = "shuffle_key"): DataFrame = {
    require(idCols.nonEmpty, "shuffleOrder needs at least one identity column")
    require(nParts >= 1, s"nParts must be >= 1, got $nParts")
    df.withColumn(outCol,
        hash60(concat_ws("\u0001", (idCols :+ lit(salt))
          .map(c => coalesce(c.cast("string"), lit("\u0002"))): _*)))
      .repartitionByRange(nParts, col(outCol))
      .sortWithinPartitions(col(outCol) +: idCols: _*)
  }

  /** DuckDB twin of [[shuffleOrder]]'s key: [[hash60Sql]] over the same
    * chr(1)-joined identity with the same chr(2) NULL sentinel — kept
    * beside the Spark definition so the two engines' shuffle orders can
    * never drift. */
  def shuffleKeySql(idExprs: Seq[String], salt: String): String =
    hash60Sql(idExprs.map(e => s"coalesce(CAST($e AS VARCHAR), chr(2))")
      .mkString("", " || chr(1) || ", s" || chr(1) || '$salt'"))

  // ------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  // select pretraining documents whose distribution matches a small
  // high-quality target corpus by resampling with probability ∝ the
  // importance ratio p_target(doc)/p_raw(doc) under two cheap n-gram
  // models. The paper's hashed-bigram features are realized here by two
  // [[Lm.trainBigramLm]] models (target sample vs raw-corpus sample).
  // ------------------------------------------------------------------

  /** Per-document importance weight in integer MICRO-NATS:
    * log p_target(doc) − log p_raw(doc) — the difference of two
    * [[Lm.lmScore]] sums, so weights inherit the LM's bit-reproducibility
    * (pure integer arithmetic at scoring time). Two narrow corpus scans
    * (one per model); each is the broadcast-join/partial-agg lmScore
    * shape. Docs with NULL text are absent, matching lmScore. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetModel: DataFrame, rawModel: DataFrame): DataFrame = {
    val t = Lm.lmScore(docs, idCol, textCol, targetModel)
      .select(col(idCol), col("logp_sum_q").as("__t"))
    val r = Lm.lmScore(docs, idCol, textCol, rawModel)
      .select(col(idCol), col("logp_sum_q").as("__r"))
    t.join(r, idCol)
      .select(col(idCol), (col("__t") - col("__r")).as("weight_q"))
  }

  /** Deterministic Gumbel(0,1) noise in micro-nats from a 52-bit md5
    * hash: g = −ln(−ln(u)) with u = (h + 0.5)/2⁵², quantized
    * floor(g·10⁶). 52 bits (13 hex chars), NOT 60, so h + 0.5 is exactly
    * representable in a double (53-bit significand) and u is STRICTLY
    * inside (0, 1) — max u = 1 − 2⁻⁵³; a 60-bit h within 128 of 2⁶⁰
    * would round u to exactly 1.0 and poison the row with a NULL key.
    * A pure per-row function of (key, salt) — partition-invariant and
    * identical on every rerun (the pinned random draw importance
    * RESAMPLING needs; `rand()` would untie selection from the data).
    * The ln runs per row but its value is pinned by the hash, so reruns
    * and resumes select identical rows. */
  def gumbelQ(keyCol: Column, salt: String = "dsir"): Column = {
    val h = conv(substring(md5(concat(keyCol.cast("string"), lit(salt))), 1, 13),
      16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(math.pow(2.0, 52))
    floor(-log(-log(u)) * lit(1e6)).cast("bigint")
  }

  /** Gumbel-top-k importance resampling: the k largest
    * (weight_q + gumbel_q) keys are exactly a sample WITHOUT replacement
    * with inclusion probability ∝ exp(weight) (the Gumbel-max trick;
    * Vieira 2014, Kool et al. 2019) — DSIR's sampling step with no
    * sequential draw loop. Returns the selected rows with `gumbel_q` and
    * `key_q` attached. Plan shape: top-k is TakeOrderedAndProject —
    * per-partition k-heaps merged on the driver, never a global sort —
    * so k is driver-bounded (select shards in rounds if k must exceed
    * driver memory). */
  def dsirSample(weighted: DataFrame, idCol: String, k: Int,
      salt: String = "dsir"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weighted
      .withColumn("gumbel_q", gumbelQ(col(idCol), salt))
      .withColumn("key_q", col("weight_q") + col("gumbel_q"))
      .orderBy(col("key_q").desc, col(idCol).asc)
      .limit(k)
  }
}
