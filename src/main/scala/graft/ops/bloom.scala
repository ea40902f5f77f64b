package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership sketch, built and probed entirely in
  * column algebra — the CONSTANT-SIZE broadcast alternative to shipping a
  * raw key set to every executor.
  *
  * Why it exists: the broadcast anti-join pattern ([[Cleaning.decontaminate]],
  * [[Cleaning.dropBlockedDomains]]) ships the distinct key set itself, which
  * is perfect while that set is MBs. But a serious decontamination registry
  * (every benchmark suite ever published, deduped URL seen-sets, multi-TB
  * blocklists) can reach GBs of distinct shingles — past broadcastability.
  * A Bloom filter caps the shipped state at `mBits/8` bytes REGARDLESS of
  * key count, trading exactness for a one-sided false-POSITIVE rate: a
  * present key always hits (no false negatives — the safe direction for
  * decontamination, where a miss means eval leakage), an absent key hits
  * with p ≈ (1 − e^(−kn/m))^k.
  *
  * Portability contract (the reason this is hand-rolled rather than
  * `DataFrameStatFunctions.bloomFilter`): every bit position derives from
  * the repo's 60-bit md5 recipe — `conv(substr(md5(key||':'||j),1,15),16,10)
  * % mBits` — which Spark and DuckDB compute digit-for-digit identically
  * (same recipe as [[Sampling.hashBp]]), so the DuckDB oracle replays
  * membership EXACTLY, false positives included. Spark's built-in sketch
  * is a JVM object with engine-private hashing: unverifiable by the
  * cross-engine gate and unusable without a UDF probe.
  *
  * Representation: one row, one `bm: array<bigint>` column, 32 bits packed
  * per element (low half only). 32, not 64, keeps every element and every
  * intermediate nonneg and < 2^32, so the probe can extract bits with
  * `floor(elem / 2^off) % 2` — exact in IEEE double (operands < 2^53) and
  * identical in both engines, with no reliance on either engine's signed
  * shift semantics. A 2^20-bit filter is 32k longs ≈ 256 KB.
  *
  * Scale shape: the build is explode → distinct → partial-agg pack (the
  * key set never collects); the probe side crossJoins the ONE-row bitmap
  * frame as a broadcast — each probe row reads `nHashes` array elements,
  * all inside whole-stage codegen. At 100 TB the probe is a narrow
  * map-side pass; the only wide op the caller adds is its own rollup. */
object Bloom {

  /** Bits per packed array element — see the representation note above. */
  val PackBits = 32

  /** Bit position of hash `j` of a key: the portable 60-bit md5 integer
    * ([[Sampling.hash60]] — the shared single copy of the cross-engine
    * recipe) of `key || ':' || j`, mod `mBits`. Matches [[positionSql]]. */
  def position(keyCol: Column, j: Int, mBits: Int): Column =
    (Sampling.hash60(concat(keyCol.cast("string"), lit(":"), lit(j.toString)))
      % mBits).cast("int")

  /** DuckDB replay of [[position]] via the same shared recipe. */
  def positionSql(key: String, j: Int, mBits: Int): String =
    s"CAST(${Sampling.hash60Sql(s"$key || ':' || '$j'")} % $mBits AS INT)"

  /** Build the filter over the distinct values of `keys(keyCol)`: returns a
    * ONE-row frame `(bm: array<bigint>)` of ceil(mBits/32) packed elements.
    * Dense by construction (absent elements are zero), assembled
    * executor-side from a sparse idx→value map — no driver collect at any
    * key-set size. */
  def build(keys: DataFrame, keyCol: String, mBits: Int, nHashes: Int): DataFrame = {
    require(mBits > 0 && nHashes > 0, "mBits and nHashes must be positive")
    val nElems = (mBits + PackBits - 1) / PackBits
    val pos = explode(array((0 until nHashes).map(j =>
      position(col(keyCol), j, mBits)): _*)).as("pos")
    keys.select(pos).distinct() // pos ↔ (idx, off) bijection: one row per set bit
      .select((col("pos") / PackBits).cast("int").as("idx"),
        (col("pos") % PackBits).as("off"))
      .groupBy(col("idx"))
      .agg(sum(pow(lit(2.0), col("off")).cast("bigint")).as("v"))
      .agg(map_from_arrays(collect_list(col("idx")), collect_list(col("v"))).as("m"))
      .select(transform(sequence(lit(0), lit(nElems - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bm"))
  }

  /** Probe: true iff every one of the key's `nHashes` bits is set in `bm`
    * (an `mBits`/`nHashes` pair MUST match the build's). NULL keys probe
    * to NULL — callers gate nullable columns themselves. */
  def mightContain(bmCol: Column, keyCol: Column, mBits: Int, nHashes: Int): Column =
    (0 until nHashes).map { j =>
      val p = position(keyCol, j, mBits)
      val elem = element_at(bmCol, (p / PackBits).cast("int") + 1)
      (floor(elem / pow(lit(2.0), p % PackBits)).cast("bigint") % 2) === 1
    }.reduce(_ && _)

  /** DuckDB replay of one probe's ∀-bits test, phrased relationally (the
    * oracle never materializes the packed array): key present iff each of
    * its `nHashes` positions appears in the build side's distinct-position
    * set — bit-for-bit the same predicate [[mightContain]] evaluates.
    * `posTable` must hold the build keys' positions in a column `pos`
    * (see [[positionsSql]]). */
  def containsSql(key: String, posTable: String, mBits: Int, nHashes: Int): String =
    (0 until nHashes).map { j =>
      s"EXISTS (SELECT 1 FROM $posTable WHERE pos = ${positionSql(key, j, mBits)})"
    }.mkString("(", " AND ", ")")

  /** DuckDB SELECT emitting every position of every key in `keysSql`'s
    * `key` column — the oracle-side twin of the [[build]] explode. */
  def positionsSql(keysSql: String, mBits: Int, nHashes: Int): String =
    (0 until nHashes).map { j =>
      s"SELECT DISTINCT ${positionSql("key", j, mBits)} AS pos FROM ($keysSql)"
    }.mkString(" UNION ")
}
