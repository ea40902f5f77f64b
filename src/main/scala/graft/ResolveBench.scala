package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for [[ops.Dedup.resolveClusters]] (BENCH/BASELINE.md
  * "cluster resolution"): the small-star/large-star loop must converge in
  * O(log diameter) rounds with no driver-side state, so the adversarial
  * inputs are the two extremes a near-dup pair graph produces at crawl
  * scale —
  *  - LONG CHAINS (a→b, b→c, …): maximum diameter per edge; a naive
  *    propagate-one-hop loop needs `len` rounds, small-star/large-star
  *    needs ~log(len);
  *  - a GIANT STAR (one hub paired with everything in its cluster): the
  *    hot-key case — every round funnels the hub's edges through one key.
  *
  * The planted structure makes the correct answer exact (one cluster per
  * chain + one for the star, keeper = min id), so the bench doubles as a
  * correctness check at a scale the unit tests don't reach.
  *
  * Usage: graft.ResolveBench [nChains] [chainLen] [starSize]
  */
object ResolveBench {
  def main(args: Array[String]): Unit = {
    val nChains = args.headOption.map(_.toInt).getOrElse(100000)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(10)
    val starSize = args.lift(2).map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // chain c occupies ids [c*chainLen, (c+1)*chainLen); edges link
    // consecutive ids. One extra LONG chain (len = starSize) stresses
    // diameter; the star pairs one hub with starSize members.
    val base = nChains.toLong * chainLen
    val chainEdges = spark.range(base)
      .where($"id" % chainLen =!= (chainLen - 1))
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val longChain = spark.range(starSize - 1)
      .select(($"id" + base).as("id_a"), ($"id" + base + 1).as("id_b"))
    val starBase = base + starSize
    val star = spark.range(starSize)
      .select(lit(starBase).as("id_a"), ($"id" + starBase + 1).as("id_b"))
    val pairs = chainEdges.union(longChain).union(star)

    val t0 = System.nanoTime()
    val resolved = ops.Dedup.resolveClusters(pairs, "id_a", "id_b")
    val r = resolved.agg(
      count(lit(1)).as("nodes"),
      countDistinct($"cluster_id").as("clusters"),
      sum(when($"keep", 1L).otherwise(0L)).as("keepers"),
      // every keeper must be its chain's minimum id ⇒ cluster_id ≡ 0 mod
      // chainLen for the regular chains; the two giants root at base/starBase
      sum(when($"cluster_id" < base && $"cluster_id" % chainLen =!= 0, 1L)
        .otherwise(0L)).as("bad_roots")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val nEdges = pairs.count()
    val expected = nChains + 2L
    val ok = r.getLong(1) == expected && r.getLong(2) == expected && r.getLong(3) == 0L
    if (!ok) sys.error(s"resolve wrong: $r expected $expected clusters")
    println(f"""{"metric":"resolve_clusters","edges":$nEdges,"nodes":${r.getLong(0)},""" +
      f""""clusters":${r.getLong(1)},"chain_len":$chainLen,"long_chain":$starSize,""" +
      f""""star":$starSize,"sec":$sec%.2f}""")
    spark.stop()
  }
}
