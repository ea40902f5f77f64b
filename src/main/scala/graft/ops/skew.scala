package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins (SURVEY.md §2C — the join-side
  * companion to the salted two-phase aggregation in `q_salted_agg`).
  *
  * A shuffle join on a zipf-skewed key sends every row of the hot key to
  * ONE reducer; AQE's skew-join split only rescues sort-merge joins after
  * the fact and never helps custom downstream stages. The classic explicit
  * fix: salt the SKEWED (big) side with `pmod(hash(row), k)` and replicate
  * the other side k× with every salt value — the join key becomes
  * (key, salt), splitting each hot key across k reducers. Result-identical
  * to the plain join; only the partitioning changes.
  *
  * Cost model: replicating the small side k× is cheap when it is dimension-
  * sized (the usual case: docs ⋈ per-domain config). Never salt both sides.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `key`, with the big side salted `k` ways
    * and the small side replicated once per salt. Output columns = the
    * plain join's columns (salt is internal). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, k: Int): DataFrame = {
    require(k >= 1, "salt factor must be >= 1")
    val saltedBig = big.withColumn("__salt", pmod(hash(struct(big.columns.map(col): _*)), lit(k)))
    val replicatedSmall = small.withColumn("__salt", explode(expr(s"sequence(0, ${k - 1})")))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
