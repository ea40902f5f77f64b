package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling / mixing / packing (ops.Sampling). */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def documents =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashBp is uniform-ish, stable, and in [0, 10000)") {
    val h = documents.select(ops.Sampling.hashBp($"doc_id").as("h"))
    val stats = h.agg(min($"h"), max($"h"), countDistinct($"h")).collect().head
    assert(stats.getInt(0) >= 0 && stats.getInt(1) < 10000)
    assert(stats.getLong(2) > 400) // 500 ids → near-no collisions
    // rerun must produce the identical hash per id
    assert(h.collect().toSeq == documents
      .select(ops.Sampling.hashBp($"doc_id").as("h")).collect().toSeq)
  }

  test("mixtureSample keeps ~rate per stratum and lower rates are nested subsets") {
    val docs = documents.select($"doc_id", $"source")
    def ids(bp: Int) = ops.Sampling.mixtureSample(docs, "doc_id", "source",
      Map.empty, bp).select("doc_id").as[Long].collect().toSet
    val (q1, q2) = (ids(2500), ids(5000))
    assert(q1.subsetOf(q2)) // h < 2500 ⊆ h < 5000
    assert(math.abs(q1.size - 125) < 50 && math.abs(q2.size - 250) < 60)
    // per-stratum override: rate 0 drops the stratum entirely
    val none = ops.Sampling.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 0), 10000)
    assert(none.where($"source" === "src0").count() == 0)
    assert(none.where($"source" =!= "src0").count() ==
      docs.where($"source" =!= "src0").count())
  }

  test("splitLabel is deterministic and decorrelated from the sample hash") {
    val lab = documents.select($"doc_id",
      ops.Sampling.splitLabel($"doc_id", 2000).as("split"),
      ops.Sampling.hashBp($"doc_id").as("h"))
    val nTest = lab.where($"split" === "test").count()
    assert(math.abs(nTest - 100) < 50)
    // the split must not systematically align with the unsalted hash:
    // among low-hash rows the test fraction stays near 20%
    val lowTest = lab.where($"h" < 5000 && $"split" === "test").count()
    val low = lab.where($"h" < 5000).count()
    assert(math.abs(lowTest.toDouble / low - 0.2) < 0.1)
  }

  test("mixtureSample: broadcast rate-table path (big maps) == literal CASE path") {
    val docs = documents.select($"doc_id", $"source")
    val small = ops.Sampling.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 2000, "src1" -> 8000), 6000)
      .select("doc_id").as[Long].collect().toSet
    // pad the map past RatesLiteralMax with strata that don't occur —
    // forces the broadcast-join path with identical effective rates
    val big = Map("src0" -> 2000, "src1" -> 8000) ++
      (0 until ops.Sampling.RatesLiteralMax + 10).map(i => s"zz$i" -> 1)
    assert(big.size > ops.Sampling.RatesLiteralMax)
    val joined = ops.Sampling.mixtureSample(docs, "doc_id", "source", big, 6000)
    assert(joined.select("doc_id").as[Long].collect().toSet == small)
    assert(joined.columns.sameElements(docs.columns)) // helper cols dropped
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("mixtureEpochs replicates by floor(e), hash-selects the fraction, and reduces to mixtureSample below 1 epoch") {
    val docs = documents.select($"doc_id", $"source")
    val epochs = Map("src0" -> 34000, "src1" -> 2500, "src2" -> 0)
    val out = ops.Sampling.mixtureEpochs(docs, "doc_id", "source", epochs, 10000)
    assert(out.columns.toSeq == Seq("doc_id", "source", "epoch"))
    val byId = out.groupBy($"doc_id").agg(
        count(lit(1)).as("n"), max($"epoch").as("mx"), min($"epoch").as("mn"))
      .join(docs, "doc_id")
      .select($"doc_id", $"source", $"n", $"mx", $"mn")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toMap
    val h = docs.select($"doc_id",
        ops.Sampling.hashBp(concat($"doc_id".cast("string"), lit("epoch"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // src0 at 3.4 epochs: 3 copies + a 4th iff the SALTED hash < 4000
    docs.where($"source" === "src0").select($"doc_id").as[Long].collect().foreach { id =>
      val want = 3 + (if (h(id) < 4000) 1 else 0)
      val (_, n, mx, mn) = byId(id)
      assert(n == want && mn == 0 && mx == want - 1, s"doc $id")
    }
    // src2 at 0 epochs vanishes entirely
    assert(!byId.values.exists(_._1 == "src2"))
    // with salt="" the sub-epoch kept set equals mixtureSample EXACTLY
    val sampled = ops.Sampling.mixtureSample(docs.where($"source" === "src1"),
      "doc_id", "source", Map("src1" -> 2500), 10000)
      .select($"doc_id").as[Long].collect().toSet
    val unsalted = ops.Sampling.mixtureEpochs(docs.where($"source" === "src1"),
        "doc_id", "source", Map("src1" -> 2500), 10000, salt = "")
      .select($"doc_id").as[Long].collect().toSet
    assert(unsalted == sampled)
    // the default salt decorrelates: composing a 25% mixtureSample with
    // 3.4 epochs must NOT hand every survivor the fractional 4th copy
    val survivors = ops.Sampling.mixtureSample(docs, "doc_id", "source",
      Map.empty, 2500)
    val comp = ops.Sampling.mixtureEpochs(survivors, "doc_id", "source",
        Map.empty[String, Int], 34000)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect()
    val frac4 = comp.count(_ == 4).toDouble / comp.length
    assert(frac4 > 0.2 && frac4 < 0.6, s"fourth-copy fraction $frac4 not ~0.4")
    // absent strata run defaultBp epochs (here exactly one)
    assert(byId.collect { case (id, ("src5", n, _, _)) => n }.forall(_ == 1L))
    // partition-invariant
    val again = ops.Sampling.mixtureEpochs(docs.repartition(13), "doc_id",
        "source", epochs, 10000)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byId.map { case (id, (_, n, _, _)) => id -> n })
    // broadcast rate-table path (big maps) matches the literal CASE path,
    // including the __bp self-replacement on the joined frame
    val big = epochs ++
      (0 until ops.Sampling.RatesLiteralMax + 10).map(i => s"zz$i" -> 1)
    val viaJoin = ops.Sampling.mixtureEpochs(docs, "doc_id", "source", big, 10000)
    assert(viaJoin.columns.toSeq == Seq("doc_id", "source", "epoch"))
    val joinCounts = viaJoin.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(joinCounts == byId.map { case (id, (_, n, _, _)) => id -> n })
  }

  test("temperatureEpochs derives the p^alpha recipe: alpha=1 natural, alpha=0 equalized, alpha=0.5 sqrt-anchored") {
    val docs = documents.select($"doc_id", $"source")
    // alpha=1: natural proportions — exactly the input corpus, one epoch each
    val nat = ops.Sampling.temperatureEpochs(docs, "doc_id", "source", 1.0)
    assert(nat.columns.toSeq == Seq("doc_id", "source", "epoch"))
    assert(nat.where($"epoch" =!= 0).count() == 0)
    assert(nat.select($"doc_id").as[Long].collect().sorted.toSeq ==
      docs.select($"doc_id").as[Long].collect().sorted.toSeq)

    // alpha=0 equalizes effective sizes EXACTLY when sizes divide: strata
    // of 40/20/10 docs run 1/2/4 epochs — every effective size is 40
    val crafted = (0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 120).map(i => (i.toLong, "b")) ++
      (200 until 210).map(i => (i.toLong, "c")) ++
      (300 until 310).map(i => (i.toLong, null: String)) // NULL is a stratum
    val eq = ops.Sampling.temperatureEpochs(
        crafted.toDF("doc_id", "source"), "doc_id", "source", 0.0)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1))
      .toMap
    assert(eq == Map("a" -> 40L, "b" -> 40L, "c" -> 40L, "∅" -> 40L))

    // alpha=0.5: bp_i = round(sqrt(cmax/ci)·10⁴), re-derived independently
    // per doc against the salted fractional hash; the largest stratum is
    // anchored at exactly one pass
    val out = ops.Sampling.temperatureEpochs(docs, "doc_id", "source", 0.5)
    val counts = docs.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cmax = counts.values.max
    val bp = counts.map { case (src, c) =>
      src -> math.floor(math.sqrt(cmax.toDouble / c.toDouble) * 10000 + 0.5).toInt
    }
    assert(bp(counts.maxBy(_._2)._1) == 10000)
    assert(bp.values.forall(_ >= 10000)) // temperature never downsamples
    val h = docs.select($"doc_id",
        ops.Sampling.hashBp(concat($"doc_id".cast("string"), lit("temp"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = out.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .join(docs, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("n"))).toMap
    docs.collect().foreach { r =>
      val (id, src) = (r.getLong(0), r.getString(1))
      val b = bp(src)
      val want = (b / 10000 + (if (h(id) < b % 10000) 1 else 0)).toLong
      assert(got(id) == (src, want), s"doc $id")
    }
    // partition-invariant
    val again = ops.Sampling.temperatureEpochs(docs.repartition(13),
        "doc_id", "source", 0.5)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got.map { case (id, (_, n)) => id -> n })
  }

  test("packShardsBucketed: per-bucket packing equals flat packing of that bucket") {
    val docs = documents.select($"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("n"))
    val bucketed = ops.Sampling.packShardsBucketed(docs, "doc_id", "source",
      col("n"), 300, buckets = 3)
    val got = bucketed.select($"doc_id", $"pack_bucket", $"shard")
      .as[(Long, Int, Int)].collect()
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(0, 1, 2))
    // within every (stratum, bucket), the flat packer on that subset agrees
    got.groupBy(_._2).foreach { case (b, rows) =>
      val subset = bucketed.where($"pack_bucket" === b)
        .select($"doc_id", $"source", $"n")
      val flat = ops.Sampling.packShards(subset, "doc_id", "source", col("n"), 300)
        .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
      rows.foreach { case (id, _, shard) => assert(flat(id) == shard, s"doc $id") }
    }
  }

  test("packShards fills budget sequentially and overflows by at most one doc") {
    val docs = Seq(
      (1L, "a", 200L), (2L, "a", 200L), (3L, "a", 200L), (4L, "a", 400L),
      (10L, "b", 600L), (11L, "b", 100L))
      .toDF("doc_id", "source", "n")
    val out = ops.Sampling.packShards(docs, "doc_id", "source", col("n"), 500)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    // stratum a: cum0 = 0, 200, 400, 600 → shards 0, 0, 0, 1
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 0 && out(4L) == 1)
    // stratum b: cum0 = 0, 600 → shards 0, 1
    assert(out(10L) == 0 && out(11L) == 1)
  }

  test("packSequences cuts fixed-length sequences across doc boundaries, emits the ragged tail") {
    // one shard holds docs 1..3 (tokens a1..a5, b1..b3, c1..c2 = 10 toks);
    // seqLen 4 → [a1..a4], [a5 b1 b2 b3], [c1 c2] (tail of 2)
    val docs = Seq(
      (1L, "s", Seq("a1", "a2", "a3", "a4", "a5")),
      (2L, "s", Seq("b1", "b2", "b3")),
      (3L, "s", Seq("c1", "c2")))
      .toDF("doc_id", "shard", "toks")
    val out = ops.Sampling.packSequences(docs, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq")
      .select($"seq", $"toks", $"n_toks")
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getInt(2)))
    assert(out.toList == List(
      (0, List("a1", "a2", "a3", "a4"), 4),
      (1, List("a5", "b1", "b2", "b3"), 4),
      (2, List("c1", "c2"), 2)))
    // concatenation order is id order regardless of input row order, and
    // the output is partition-invariant
    val shuffled = docs.orderBy(rand(7)).repartition(5)
    val again = ops.Sampling.packSequences(shuffled, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq")
      .select($"seq", $"toks", $"n_toks")
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getInt(2)))
    assert(again.toList == out.toList)
    // exact multiple → no ragged tail
    val exact = Seq((1L, "s", Seq("a", "b", "c", "d"))).toDF("doc_id", "shard", "toks")
    val eo = ops.Sampling.packSequences(exact, "doc_id", Seq("shard"), $"toks", 2)
      .select($"n_toks").as[Int].collect().toList
    assert(eo == List(2, 2))
    // a null-toks doc contributes nothing but must NOT nuke its shard
    // (flatten() is null-poisoning without the in-aggregate filter)
    val withNull = docs.union(
      Seq((0L, "s", null: Seq[String])).toDF("doc_id", "shard", "toks"))
    val nn = ops.Sampling.packSequences(withNull, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq")
      .select($"seq", $"toks", $"n_toks")
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getInt(2)))
    assert(nn.toList == out.toList)
  }

  test("packSequencesWithBounds: doc_ids align 1:1 with tokens and mark the cross-boundary cut") {
    val docs = Seq(
      (1L, "s", Seq("a1", "a2", "a3", "a4", "a5")),
      (2L, "s", Seq("b1", "b2", "b3")),
      (3L, "s", Seq("c1", "c2")))
      .toDF("doc_id", "shard", "toks")
    val out = ops.Sampling.packSequencesWithBounds(
        docs, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq")
      .select($"seq", $"toks", $"doc_ids", $"n_toks")
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toList,
        r.getSeq[Long](2).toList, r.getInt(3)))
    assert(out.toList == List(
      (0, List("a1", "a2", "a3", "a4"), List(1L, 1L, 1L, 1L), 4),
      (1, List("a5", "b1", "b2", "b3"), List(1L, 2L, 2L, 2L), 4),
      (2, List("c1", "c2"), List(3L, 3L), 2)),
      "every token must carry the id of the document it came from")
    // the token stream is identical to packSequences' — bounds are a
    // strict addition, never a re-ordering
    val plain = ops.Sampling.packSequences(docs, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq").select($"toks")
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out.map(_._2).toList == plain)
    // null-toks docs contribute nothing to EITHER flat
    val withNull = docs.union(
      Seq((0L, "s", null: Seq[String])).toDF("doc_id", "shard", "toks"))
    val nn = ops.Sampling.packSequencesWithBounds(
        withNull, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq").select($"doc_ids")
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(nn == out.map(_._3).toList)
  }

  test("interleavedStream: offset-ordered tokens with refs aligned 1:1, media placeholders in place") {
    // spans deliberately OUT of offset order; doc interleaves text/media
    val docs = Seq(
      (1L, Seq(
        RawSpan("media", "", "https://m.test/x.mp4", 1),
        RawSpan("text", "hello brave world", "", 0),
        RawSpan("text", "the end", "", 3),
        RawSpan("media", "", "https://m.test/y.png", 2))))
      .toDF("doc_id", "spans")
    val st = ops.Sampling.interleavedStream($"spans", t => split(t, " "))
    val r = docs.select(st.getField("toks").as("t"), st.getField("refs").as("r"))
      .head()
    val toks = r.getSeq[String](0).toList
    val refs = r.getSeq[String](1).toList
    assert(toks == List("hello", "brave", "world", "<|media|>",
      "<|media|>", "the", "end"),
      "stream must follow span OFFSET order with one placeholder per media span")
    assert(refs == List(null, null, null, "https://m.test/x.mp4",
      "https://m.test/y.png", null, null),
      "refs must align 1:1 with toks — the media_ref exactly under its placeholder")
    assert(toks.length == refs.length)
    // a NULL text span contributes nothing (never nulls the doc stream)
    val withNull = Seq((1L, Seq(
      RawSpan("text", null, "", 0), RawSpan("media", "", "ref1", 1))))
      .toDF("doc_id", "spans")
    val n = withNull.select(st.getField("toks").as("t"), st.getField("refs").as("r")).head()
    assert(n.getSeq[String](0).toList == List("<|media|>") &&
      n.getSeq[String](1).toList == List("ref1"))
  }

  test("packSequencesInterleaved: media_refs slice with the tokens; text-only docs normalize") {
    // doc 1 text-heavy with one media token; doc 2 text-only (NULL refs —
    // a plain-text doc entering a multimodal corpus); doc 3 media-only
    val docs = Seq(
      (1L, "s", Seq("a1", "<|media|>", "a3"), Seq(null, "m1", null)),
      (2L, "s", Seq("b1", "b2", "b3"), null: Seq[String]),
      (3L, "s", Seq("<|media|>"), Seq("m2")))
      .toDF("doc_id", "shard", "toks", "refs")
    val out = ops.Sampling.packSequencesInterleaved(
        docs, "doc_id", Seq("shard"), $"toks", $"refs", 4)
      .orderBy($"seq")
      .select($"seq", $"toks", $"doc_ids", $"media_refs", $"n_toks", $"n_media")
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toList,
        r.getSeq[Long](2).toList, r.getSeq[String](3).toList,
        r.getInt(4), r.getInt(5)))
    assert(out.toList == List(
      (0, List("a1", "<|media|>", "a3", "b1"), List(1L, 1L, 1L, 2L),
        List(null, "m1", null, null), 4, 1),
      (1, List("b2", "b3", "<|media|>"), List(2L, 2L, 3L),
        List(null, null, "m2"), 3, 1)),
      "media_refs must ride the same slice arithmetic as toks and doc_ids")
    // token/doc_id streams identical to packSequencesWithBounds — refs are
    // a strict addition, never a re-ordering
    val plain = ops.Sampling.packSequencesWithBounds(
        docs, "doc_id", Seq("shard"), $"toks", 4)
      .orderBy($"seq").select($"toks", $"doc_ids")
      .collect().map(r => (r.getSeq[String](0).toList, r.getSeq[Long](1).toList)).toList
    assert(out.map(o => (o._2, o._3)).toList == plain)
    // media accounting is conserved across the cut
    assert(out.map(_._6).sum == 2, "every media span appears in exactly one sequence")
  }

  test("splitByCluster: near-dup components co-locate; singletons draw on their own id") {
    val docs = (0L until 60L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    // chains {i, i+20, i+40} for i < 10, deliberately two-hop
    val pairs = (0L until 10L).map(i => (i, i + 20))
      .union((0L until 10L).map(i => (i + 20, i + 40)))
      .toDF("id_a", "id_b")
    val got = ops.Sampling.splitByCluster(docs, pairs, "doc_id", testBp = 3000)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 60)
    // every chain member shares the REPRESENTATIVE's (min id) split
    (0L until 10L).foreach { i =>
      assert(got(i) == got(i + 20) && got(i) == got(i + 40),
        s"chain $i split apart: ${got(i)}/${got(i + 20)}/${got(i + 40)}")
    }
    // unpaired docs (10..19, 50..59) draw on their own id — replay the hash
    val draws = docs.where($"doc_id" >= 10 && $"doc_id" < 20)
      .select($"doc_id", ops.Sampling.hashBp(
        concat($"doc_id".cast("string"), lit("split"))).as("bp"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    draws.foreach { case (id, bp) =>
      assert(got(id) == (if (bp < 3000) "test" else "train"))
    }
    // boundary rates: 0 → all train, 10000 → all test
    assert(ops.Sampling.splitByCluster(docs, pairs, "doc_id", 0)
      .where($"split" === "test").count() == 0)
    assert(ops.Sampling.splitByCluster(docs, pairs, "doc_id", 10000)
      .where($"split" === "train").count() == 0)
  }

  // ---- DSIR importance resampling ----

  test("shuffleOrder: partition-invariant keys, sorted disjoint ranges at rest, epoch salt reshuffles") {
    val docs = (0L until 500L).map(i => (i, s"src${i % 5}"))
      .toDF("doc_id", "source")
    val a = ops.Sampling.shuffleOrder(docs, Seq($"doc_id"), "epoch0", 8)
    // key assignment is a pure function of (identity, salt): input
    // partitioning and nParts change the LAYOUT, never a key
    val b = ops.Sampling.shuffleOrder(docs.repartition(13), Seq($"doc_id"),
      "epoch0", 3)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"shuffle_key").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keys(a) == keys(b))
    // at-rest contract: collected per-partition runs are key-sorted and
    // ascending partitions hold disjoint ascending ranges — reading
    // files in key order IS the global shuffled order
    val runs = a.select(spark_partition_id().as("p"), $"shuffle_key")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    runs.groupBy(_._1).values.foreach { part =>
      val ks = part.map(_._2).toSeq
      assert(ks == ks.sorted, "within-partition order must be key-sorted")
    }
    val ranges = runs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, v) => (v.map(_._2).min, v.map(_._2).max) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, "ranges must be disjoint")
      case _ =>
    }
    // the order is a real shuffle: a key-ordered prefix mixes sources
    // (the packer's domain-clustered order would not)
    val prefixSources = a.orderBy($"shuffle_key").limit(50)
      .select($"source").distinct().count()
    assert(prefixSources == 5, s"prefix must mix all sources, got $prefixSources")
    // a new epoch is a new permutation
    val c = keys(ops.Sampling.shuffleOrder(docs, Seq($"doc_id"), "epoch1", 8))
    assert(keys(a).count { case (id, k) => c(id) == k } < 5,
      "epoch salt must reshuffle")
  }

  test("shuffleOrder: NULL identity values keep total, position-distinct keys (the chr(2) sentinel)") {
    // ("a", NULL) vs (NULL, "a"): bare concat_ws would collapse both to
    // the key of "a"; the sentinel keeps them distinct AND non-null
    val rows = Seq(("a", null), (null, "a"), ("a", "a"))
      .toDF("x", "y").withColumn("rid", monotonically_increasing_id())
    val keyed = ops.Sampling.shuffleOrder(rows, Seq($"x", $"y"), "s", 1)
      .select($"rid", $"shuffle_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed.size == 3 && keyed.values.toSet.size == 3,
      s"null-position rows must get distinct keys, got $keyed")
    // pin the exact rendering the SQL twin re-emits (chr(1) joiner,
    // chr(2) null sentinel): independent plain-Scala md5 of the joined
    // string must reproduce every key
    def k60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = Map(
      0L -> k60("a\u0001\u0002\u0001s"),
      1L -> k60("\u0002\u0001a\u0001s"),
      2L -> k60("a\u0001a\u0001s"))
    assert(keyed == want, s"sentinel recipe drifted: $keyed vs $want")
  }

  test("gumbelQ is deterministic, salted, and Gumbel-shaped (mean near Euler–Mascheroni)") {
    val ids = (1L to 1000L).toDF("id")
    val g = ids.select(ops.Sampling.gumbelQ($"id").as("g"))
    assert(g.collect().toSeq ==
      ids.select(ops.Sampling.gumbelQ($"id").as("g")).collect().toSeq)
    // a different salt decorrelates the draw
    val g2 = ids.select(ops.Sampling.gumbelQ($"id", "other").as("g"))
    assert(g.collect().map(_.getLong(0)).toSeq !=
      g2.collect().map(_.getLong(0)).toSeq)
    // Gumbel(0,1) mean γ ≈ 0.5772, sd ≈ 1.2825 → se(1000) ≈ 0.04
    val mean = g.agg(avg($"g")).head().getDouble(0) / 1e6
    assert(mean > 0.45 && mean < 0.71, s"gumbel mean $mean outside band")
  }

  test("dsirSample: separated weights select exactly the heavy set; selection keys dominate") {
    val weighted = ((1L to 10L).map(i => (i, 10000000L)) ++
      (11L to 100L).map(i => (i, -10000000L))).toDF("doc_id", "weight_q")
    val sel = ops.Sampling.dsirSample(weighted, "doc_id", k = 10)
    assert(sel.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      (1L to 10L).toSet)
    // invariant on any input: min selected key ≥ max unselected key
    val keys = weighted
      .withColumn("g", ops.Sampling.gumbelQ($"doc_id"))
      .select($"doc_id", ($"weight_q" + $"g").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val selIds = sel.collect().map(_.getLong(0)).toSet
    val minSel = selIds.map(keys).min
    val maxUnsel = (keys.keySet -- selIds).map(keys).max
    assert(minSel >= maxUnsel)
    // the attached key column matches weight + gumbel recomputed
    sel.collect().foreach { r =>
      assert(r.getAs[Long]("key_q") == keys(r.getAs[Long]("doc_id")))
    }
  }

  test("importanceWeights: natural text outweighs reversed text under a natural-target / reversed-raw pair") {
    val ref = documents.where($"doc_id" < 100)
    val target = ops.Lm.trainBigramLm(ref.select($"text"), "text")
    val raw = ops.Lm.trainBigramLm(
      ref.select(array_join(reverse(split($"text", " ")), " ").as("text")), "text")
    // probe IN-SAMPLE docs (their bigrams are known to both models, so the
    // per-doc ratio is sharp; held-out docs still separate on AVERAGE but
    // individual short docs can flip — the documented DSIR behavior)
    val probe = documents.where($"doc_id" < 40).select($"doc_id", $"text")
    val noise = probe.select(($"doc_id" + 5000).as("doc_id"),
      array_join(reverse(split($"text", " ")), " ").as("text"))
    val w = ops.Sampling.importanceWeights(probe.union(noise), "doc_id", "text",
      target, raw)
    val natural = w.where($"doc_id" < 5000).agg(avg($"weight_q")).head().getDouble(0)
    val reversed = w.where($"doc_id" >= 5000).agg(avg($"weight_q")).head().getDouble(0)
    assert(natural > 0 && reversed < 0,
      s"importance ratio must separate natural ($natural) from reversed ($reversed)")
    // and Gumbel-top-k then prefers the natural docs
    val sel = ops.Sampling.dsirSample(w, "doc_id", k = 20)
      .collect().map(_.getLong(0))
    assert(sel.count(_ < 5000) >= 18,
      s"selection should be dominated by natural docs: ${sel.toSeq}")
  }
}
