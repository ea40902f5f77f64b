package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data ops suites: dedup (exact / MinHash-LSH / SimHash),
  * similarity search (brute force vs LSH), media plumbing, text stats. */
class OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def documents = spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  // ---- dedup ----

  test("exactDedup keeps exactly one row per distinct text, earliest id") {
    // duplicate the corpus with shifted ids: every text now appears twice
    val dup = documents.select($"doc_id", $"text")
      .union(documents.select($"doc_id" + 10000, $"text"))
    val out = ops.Dedup.exactDedup(dup, "doc_id", "text")
    assert(out.count() == documents.select("text").distinct().count())
    // earliest id wins → all kept ids are original ones
    assert(out.where($"doc_id" >= 10000).count() == 0)
  }

  test("minhash-LSH finds planted near-duplicates and skips unrelated docs") {
    val base = documents.select($"doc_id", $"text").where($"doc_id" < 50)
    // plant near-dups: copy with one word appended (high jaccard)
    val nearDups = base.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" extra")).as("text"))
    val corpus = base.union(nearDups)
    val verified = ops.Dedup.nearDupPairs(corpus, "doc_id", "text",
      k = 8, bands = 4, threshold = 0.6).collect()
    val pairs = verified.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair must be found
    val missing = (0L until 50L).filterNot(i => pairs.contains((i, i + 1000)))
    assert(missing.isEmpty, s"planted near-dups not found: $missing")
    // jaccard values are sane
    assert(verified.forall(r => r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0))
  }

  test("simhash: near-identical texts have small hamming distance, unrelated texts large") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (3L, "completely different words about spark shuffle partitions and catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val sh = ops.Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < 12, s"near dup hamming ${ham(sh(1L), sh(2L))}")
    assert(ham(sh(1L), sh(3L)) > 15, s"unrelated hamming ${ham(sh(1L), sh(3L))}")
  }

  test("simhash is deterministic across partitionings") {
    val docs = documents.select($"doc_id", $"text").where($"doc_id" < 100)
    val a = ops.Dedup.simhash(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ops.Dedup.simhash(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("simhashPairs (pigeonhole banded equi-join) finds EXACTLY the brute-force hamming pairs") {
    val docs = documents.select($"doc_id", $"text").where($"doc_id" < 60)
    val sh = ops.Dedup.simhash(docs, "doc_id", "text")
    val vals = sh.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- vals; (ib, sb) <- vals
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (ia, ib)).toSet
    val banded = ops.Dedup.simhashPairs(sh, "doc_id", "simhash", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, s"banded recall/precision mismatch: ${banded.size} vs ${brute.size}")
  }

  test("simhashPairs plans an equi-join, never a cartesian product") {
    val sh = ops.Dedup.simhash(
      documents.select($"doc_id", $"text").where($"doc_id" < 30), "doc_id", "text")
    val p = ops.Dedup.simhashPairs(sh, "doc_id", "simhash", 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  test("simhashPairs == brute force on random full-width longs (sign-extension safe)") {
    // negative longs exercise arithmetic-shift sign extension in the band
    // extraction; generated doc hashes are 60-bit non-negative and miss it
    val rnd = new scala.util.Random(20260816L)
    Seq(3, 8).foreach { k =>
      val vals = Seq.fill(80)(rnd.nextLong())
        // plant near pairs so the assertion is not vacuous
        .flatMap(v => Seq(v, v ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64))))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vals.toDF("id", "sh")
      val brute = (for {
        (ia, sa) <- vals; (ib, sb) <- vals
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= k
      } yield (ia, ib)).toSet
      assert(brute.nonEmpty, s"vacuous test at k=$k")
      val banded = ops.Dedup.simhashPairs(df, "id", "sh", maxHamming = k, bits = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"k=$k: banded=${banded.size} brute=${brute.size}")
    }
  }

  test("bandLayout rejects a 64-bit band (mask overflow would collapse all buckets)") {
    intercept[IllegalArgumentException] {
      ops.Dedup.bandLayout(bits = 64, maxHamming = 0)
    }
    // 64 bits with maxHamming >= 1 stays fine (widest band = 32)
    assert(ops.Dedup.bandLayout(64, 1).map(_._3).sum == 64)
  }

  test("hamming is pure Column API (works on names needing backticks)") {
    val df = Seq((1L, 5L, 6L)).toDF("id", "sig a", "sig b")
    val d = df.select(ops.Dedup.hamming(col("sig a"), col("sig b")).as("d"))
      .head().get(0).asInstanceOf[Number].intValue()
    assert(d == 2) // 5 ^ 6 = 3 → two bits
  }

  test("lshCandidatePairs hot-bucket guard bounds exact-dup cluster blowup") {
    // 1000 identical docs (the common web-crawl case) + 30 distinct docs:
    // without a guard the cluster self-joins to ~500k pairs in one task
    val dupes = spark.range(1000).select(($"id" + 100000L).as("doc_id"),
      lit("same words the and of to in every copy here").as("text"))
    val corpus = documents.select($"doc_id", $"text").where($"doc_id" < 30)
      .unionByName(dupes)
    val sigs = ops.Dedup.minhashSignatures(corpus, "text", 8).select($"doc_id", $"sig")
    val capped = ops.Dedup.lshCandidatePairs(sigs, "doc_id", 4, maxBucket = 100)
    assert(capped.where($"id_a" >= 100000L).count() == 0,
      "oversize exact-dup bucket must be dropped by the guard")
    // and the drop is observable, not silent
    val dropped = ops.Dedup.lshOversizeBuckets(sigs, "doc_id", 4, 100).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) == 1000L))
  }

  test("final LSH band absorbs the signature remainder (no silently dropped values)") {
    // bands=3 over k=8 → widths 2,2,4: the last band covers positions 5..8
    val sigs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (2L, Seq("x", "y", "z", "w", "e", "f", "G", "H")) // equal ONLY at 5,6
    ).toDF("doc_id", "sig")
    // a 2-wide final band (old behavior: values 7,8 dropped) would falsely pair them
    assert(ops.Dedup.lshCandidatePairs(sigs, "doc_id", 3).count() == 0)
    val sigs2 = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (2L, Seq("x", "y", "z", "w", "e", "f", "g", "h")) // equal at 5..8
    ).toDF("doc_id", "sig")
    assert(ops.Dedup.lshCandidatePairs(sigs2, "doc_id", 3).count() == 1)
  }

  test("resolveClusters: transitive chain a-b, b-c collapses to one cluster") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = ops.Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, false) && out(3L) == (1L, false))
    assert(out(10L) == (10L, true) && out(11L) == (10L, false))
  }

  test("resolveClusters converges on a worst-case path graph within the log bound") {
    // 64-node path: the adversarial case for label propagation (diameter
    // 63); small-star/large-star must converge in O(log² n) rounds
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = ops.Dedup.resolveClusters(path, maxIters = 15).collect()
    assert(out.length == 64)
    assert(out.forall(_.getLong(1) == 0L), "single component rooted at 0")
    assert(out.count(_.getBoolean(2)) == 1)
  }

  test("resolveClusters throws when the iteration bound is exhausted") {
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      ops.Dedup.resolveClusters(path, maxIters = 1)
    }
  }

  test("resolveClusters short-circuits on an already-star pair graph (no fixpoint rounds)") {
    // 100 isolated near-dup pairs — the common LSH output shape. Already a
    // star forest, so the direct fixpoint test must skip the loop: the
    // call runs only the init distinct + one convergence check, never a
    // large-star/small-star round (each round adds several jobs).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val pairs = (0L until 100L).map(i => (2 * i, 2 * i + 1)).toDF("id_a", "id_b")
    spark.sparkContext.addSparkListener(l)
    try {
      val resolved = ops.Dedup.resolveClusters(pairs)
      Thread.sleep(500) // let the listener bus drain
      val loopJobs = jobs.get
      val out = resolved.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(out.size == 200)
      (0L until 100L).foreach { i =>
        assert(out(2 * i) == (2 * i, true))
        assert(out(2 * i + 1) == (2 * i, false))
      }
      // init materialization + star test: a handful of jobs; one fixpoint
      // round would add at least four more
      assert(loopJobs <= 6, s"expected the star-forest short-circuit, ran $loopJobs jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("resolveClusters handles duplicate and reversed pairs, self-loops, empty input") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("id_a", "id_b")
    val out = ops.Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, false))
    assert(out(3L) == (3L, true), "self-loop-only node is its own keeper")
    val empty = ops.Dedup.resolveClusters(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.count() == 0)
  }

  test("dedupCorpus keeps one doc per cluster and passes unpaired docs through") {
    val docs = (0L until 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = ops.Dedup.dedupCorpus(docs, "doc_id", pairs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 8L, 9L))
  }

  test("dedupCorpusCapped keeps the m smallest ids per cluster; m = 1 equals dedupCorpus") {
    val docs = (0L until 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters: {1, 5, 7} (chain) and {2, 3}; 0/4/6/8/9 unpaired
    val pairs = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    def kept(m: Int) = ops.Dedup.dedupCorpusCapped(docs, "doc_id", pairs, m)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // m = 2: {1, 5} survive of the 3-chain, {2, 3} fully, all unpaired
    assert(kept(2) == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L))
    // m = 3 retains everything here; m = 1 reduces to the single keeper
    assert(kept(3) == (0L until 10L).toSet)
    assert(kept(1) == ops.Dedup.dedupCorpus(docs, "doc_id", pairs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("dedupCorpusBest keeps the highest-scoring cluster member, ties to the smaller id") {
    // clusters: {1, 5, 7} with scores 3/9/9 → 5 wins (9 ties to smaller
    // id); {2, 3} with scores 4/8 → 3 wins over the SMALLER id 2 (argmax,
    // not min-id); 0/4 unpaired pass
    val docs = Seq((0L, 1), (1L, 3), (2L, 4), (3L, 8), (4L, 2), (5L, 9), (7L, 9))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 5L), (5L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = ops.Dedup.dedupCorpusBest(docs, "doc_id", "score", pairs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L, 5L))
    // a constant score degrades exactly to min-id retention == dedupCorpus
    val const = docs.withColumn("score", lit(1))
    assert(ops.Dedup.dedupCorpusBest(const, "doc_id", "score", pairs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet ==
      ops.Dedup.dedupCorpus(docs, "doc_id", pairs)
        .select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("normalizedDedup collapses case/punct/whitespace variants; byte-exact dedup keeps them") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),          // same key as 1 → dropped (1 is smaller)
      (3L, "HELLO\tWORLD"),         // same key → dropped
      (4L, "héllo world"),          // accent folds → same key → dropped
      (5L, "hello worlds")          // different key → kept
    ).toDF("doc_id", "text")
    val kept = ops.Dedup.normalizedDedup(docs, "doc_id", "text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
    assert(ops.Dedup.exactDedup(docs, "doc_id", "text").count() == 5)
  }

  test("full pipeline: nearDupPairs → dedupCorpus removes exactly the planted dups") {
    val base = documents.select($"doc_id", $"text").where($"doc_id" < 30)
    val planted = base.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" extra")).as("text"))
    val corpus = base.union(planted)
    val pairs = ops.Dedup.nearDupPairs(corpus, "doc_id", "text",
      k = 8, bands = 4, threshold = 0.6)
    val kept = ops.Dedup.dedupCorpus(corpus, "doc_id", pairs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // planted dups always pair with their smaller original → never kept
    (0L until 30L).foreach(i =>
      assert(!kept.contains(i + 1000), s"planted dup ${i + 1000} must be removed"))
    // exact keep-set: test-local union-find over the found pairs (originals
    // may legitimately near-dup EACH OTHER — only cluster minima survive)
    val edges = pairs.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = corpus.select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = all.filter(id => find(id) == id)
    assert(kept == expected,
      s"missing=${(expected -- kept).take(5)} extra=${(kept -- expected).take(5)}")
  }

  // ---- similarity ----

  test("multiprobe lshTopK candidates are a strict superset of single-bucket candidates") {
    val probes = embeddings.where($"vec_id" < 10)
    def cands(mp: Boolean) = ops.Similarity.lshTopK(embeddings, probes,
        "vec_id", "embedding", k = 1000, nPlanes = 4, dims = 64, multiprobe = mp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = cands(false)
    val multi = cands(true)
    assert(single.subsetOf(multi))
    assert(multi.size > single.size, "multiprobe should recover extra candidates")
  }

  test("brute-force cosine top-k: self-similar planted vector ranks first") {
    val probes = embeddings.where($"vec_id" < 5)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val topk = ops.Similarity.bruteForceTopK(
      embeddings, probes, "vec_id", "embedding", k = 3).collect()
    // each probe is a copy of corpus vec (id-100000) → that vec must be rank 1 with cosine ~1
    (0L until 5L).foreach { i =>
      val r1 = topk.find(r => r.getLong(0) == i + 100000 && r.getInt(3) == 1).get
      assert(r1.getLong(1) == i, s"probe ${i + 100000} rank1 = ${r1.getLong(1)}")
      assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("LSH top-k returns a subset of brute-force candidates with matching cosines") {
    val probes = embeddings.where($"vec_id" < 10)
    val brute = ops.Similarity.bruteForceTopK(embeddings, probes, "vec_id", "embedding", 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = ops.Similarity.lshTopK(embeddings, probes, "vec_id", "embedding",
      k = 5, nPlanes = 4, dims = 64).collect()
    assert(lsh.nonEmpty, "LSH buckets should not be empty with 4 planes over 500 vecs")
    // cosines agree with brute force where pairs overlap
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { bc =>
        assert(math.abs(bc - r.getDouble(2)) < 1e-9)
      }
    }
  }

  test("cosineNearDupPairs finds planted duplicate embeddings via the bucket equi-join") {
    val corpus = embeddings.select($"vec_id", $"embedding")
      .union(embeddings.select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
    val pairs = ops.Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9999, nPlanes = 4, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = embeddings.count()
    (0L until n).foreach(i =>
      assert(pairs.contains((i, i + 100000L)), s"missing planted pair $i"))
  }

  test("srp bucketing is deterministic and balanced-ish") {
    val b1 = ops.Similarity.srpBucket(embeddings.select($"vec_id", $"embedding".as("v")), "v", 4, 64)
      .select($"vec_id", $"bucket").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b2 = ops.Similarity.srpBucket(embeddings.repartition(5).select($"vec_id", $"embedding".as("v")), "v", 4, 64)
      .select($"vec_id", $"bucket").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(b1 == b2)
    val sizes = b1.values.groupBy(identity).map(_._2.size)
    assert(sizes.max < b1.size, "all vectors in one bucket = useless hash")
  }

  test("cellRanks broadcast-codebook path matches brute-force nearest-centroid ranking") {
    // a codebook above CodebookLiteralMax forces the broadcast-join path;
    // its (cell, rank) output must equal the locally computed argsort
    val vecs = embeddings.where($"vec_id" < 40).select($"vec_id", $"embedding")
    val cents = ops.Similarity.seedCentroids(embeddings, "vec_id", "embedding",
      ops.Similarity.CodebookLiteralMax + 6)
    val out = ops.Similarity.cellRanks(vecs, "vec_id", "embedding", cents, 2)
      .select($"vec_id", $"__cell", $"__rk").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getInt(1)).toMap
    val local = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    local.foreach { case (id, v) =>
      val ranked = cents.zipWithIndex.map { case (c, i) =>
        val d = c.zip(v).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + (a - b.toDouble) * (a - b.toDouble) }
        (d, i)
      }.sorted.take(2).map(_._2)
      assert(out((id, 1)) == ranked(0), s"vec $id rank1")
      assert(out((id, 2)) == ranked(1), s"vec $id rank2")
    }
  }

  test("IVF top-k: planted self-probes are found through their cell; search is cell-pruned") {
    val probes = embeddings.where($"vec_id" < 5)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val topk = ops.Similarity.ivfTopK(embeddings, probes, "vec_id", "embedding",
      k = 3, nCentroids = 8, nProbe = 2, lloydIters = 1).collect()
    (0L until 5L).foreach { i =>
      val r1 = topk.find(r => r.getLong(0) == i + 100000 && r.getInt(3) == 1).get
      assert(r1.getLong(1) == i, s"probe ${i + 100000} rank1 = ${r1.getLong(1)}")
      assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
    }
    // pruning: with nProbe=2 of 8 cells, candidates per probe ≪ corpus
    val cands = ops.Similarity.ivfTopK(embeddings, probes, "vec_id", "embedding",
      k = 100000, nCentroids = 8, nProbe = 2, lloydIters = 1).count()
    val corpusN = embeddings.count()
    assert(cands > 0 && cands < 5 * corpusN,
      s"expected cell-pruned candidates, got $cands of ${5 * corpusN}")
  }

  // ---- media ----

  test("media decode plumbing: schema, determinism, frame sampling") {
    val withPayload = ops.Media.withPayload(
      documents.where($"doc_id" < 50).select($"doc_id", $"text"), "text")
    val meta = ops.Media.decodeMeta(spark, withPayload)
    val rows = meta.collect()
    assert(rows.length == 50)
    assert(rows.forall(m => m.n_bytes > 0 && m.width >= 32 && m.checksum.length == 32))
    // deterministic
    val again = ops.Media.decodeMeta(spark, withPayload).collect()
    assert(rows.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
    // frame sampling explodes video rows
    val frames = ops.Media.sampleFrames(meta.toDF(), stride = 2)
    assert(frames.count() >= rows.length)
  }

  test("magic-number sniffing: real formats detected, PNG/GIF dims parsed from header bytes") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val crafted = Seq(
      1L -> "89504E470D0A1A0A0000000D494844520000004000000030080600000011223344", // PNG 64×48
      2L -> "FFD8FFE000104A4649460001",           // JPEG
      3L -> "4749463839614001C800F7000000",       // GIF 320×200 little-endian
      4L -> "52494646240800005741564520666D7420", // WAV
      5L -> "52494646C8000000415649204C495354",   // AVI
      6L -> "255044462D312E340A25E2E3CFD3",       // PDF
      7L -> "504B03041400000008",                 // ZIP
      8L -> "524946460000000058595A20",           // RIFF unknown subtype
      9L -> "0102030405"                          // no magic → fallback (b0=1 → aud)
    ).map { case (id, h) => (id, hx(h)) }.toDF("doc_id", "payload")
    val m = ops.Media.decodeMeta(spark, crafted).collect().map(x => x.doc_id -> x).toMap
    assert(m(1L).format == "png" && m(1L).width == 64 && m(1L).height == 48)
    assert(m(2L).format == "jpeg")
    assert(m(3L).format == "gif" && m(3L).width == 320 && m(3L).height == 200)
    assert(m(4L).format == "wav" && m(5L).format == "avi")
    assert(m(6L).format == "pdf" && m(7L).format == "zip")
    assert(m(8L).format == "riff")
    assert(m(9L).format == "aud", "unknown header falls back to the triage stub")
    // a PNG prefix too short for IHDR must NOT sniff as png
    val shortPng = Seq((10L, hx("89504E470D0A1A0A00000000"))).toDF("doc_id", "payload")
    assert(ops.Media.decodeMeta(spark, shortPng).collect().head.format != "png")
    // full JPEG chain (SOI + APP0 + SOF0): REAL dims from the marker walk;
    // the truncated JPEG above (id 2) has no SOF → falls back to fake dims
    val sofJpeg = Seq((11L, hx("FFD8" +
      "FFE000104A46494600010100000100010000" +
      "FFC000110800F0014003012200021101031101"))).toDF("doc_id", "payload")
    val j = ops.Media.decodeMeta(spark, sofJpeg).collect().head
    assert(j.format == "jpeg" && j.width == 320 && j.height == 240, j.toString)
    assert(m(2L).width == 32 + 12 % 64, "SOF-less JPEG keeps fake dims")
    // 0xFF fill padding before the marker (spec B.1.1.2) must be skipped,
    // not read as a marker with a bogus length field
    val fillJpeg = Seq((12L, hx("FFD8" + "FFFF" +
      "FFC0001108006400C803012200021101031101"))).toDF("doc_id", "payload")
    val f = ops.Media.decodeMeta(spark, fillJpeg).collect().head
    assert(f.format == "jpeg" && f.width == 200 && f.height == 100, f.toString)
  }

  test("byte features: histogram sums to n_bytes, entropy bounded, zero runs counted") {
    val meta = ops.Media.extractFeatures(spark, ops.Media.withPayload(
      documents.where($"doc_id" < 50).select($"doc_id", $"text"), "text")).collect()
    assert(meta.length == 50)
    meta.foreach { f =>
      assert(f.hist.sum == f.n_bytes)
      assert(f.entropy_m3 >= 0 && f.entropy_m3 <= 4000) // ≤ log2(16) bits
      assert(f.zero_runs == 0) // text payloads contain no NULs
    }
    // crafted payload: runs of 0x00 counted, all-same byte → entropy 0
    val crafted = Seq(
      (1L, Array[Byte](1, 0, 0, 2, 0)),
      (2L, Array.fill[Byte](32)(7))).toDF("doc_id", "payload")
    val byId = ops.Media.extractFeatures(spark, crafted).collect()
      .map(f => f.doc_id -> f).toMap
    assert(byId(1L).zero_runs == 2)
    assert(byId(2L).entropy_m3 == 0L && byId(2L).hist(0) == 32)
    // resize stub: deterministic geometry + checksum per (payload, w, h)
    val rz = ops.Media.resizeStub(crafted, 128, 64).collect()
    assert(rz.forall(r => r.getInt(1) == 128 && r.getInt(2) == 64 &&
      r.getString(3).length == 32))
  }

  // ---- layout ----

  test("layout readingOrder: interleaved two-column stream → column-major order + gap regions") {
    // emission order interleaves columns (the PDF text-stream case);
    // L3 sits below a 180px vertical gap → its own region
    val blocks = Seq(
      ("d1", 50, 0, "L1"), ("d1", 400, 0, "R1"),
      ("d1", 50, 20, "L2"), ("d1", 400, 20, "R2"),
      ("d1", 50, 200, "L3")
    ).toDF("doc_id", "x", "y", "word")
    val out = ops.Layout.readingOrder(blocks, "doc_id", pageWidth = 700, gapThreshold = 50)
      .orderBy($"reading_pos").collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Int]("col_id"),
        r.getAs[Int]("region_id"), r.getAs[Int]("reading_pos")))
    assert(out.map(_._1).toSeq == Seq("L1", "L2", "L3", "R1", "R2"),
      s"reading order wrong: ${out.toSeq}")
    assert(out.map(_._2).toSeq == Seq(0, 0, 0, 1, 1))
    assert(out.map(_._3).toSeq == Seq(0, 0, 1, 2, 2),
      "gap must split region; regions dense in reading order")
    assert(out.map(_._4).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("layout readingOrder is deterministic across partitionings and per-doc independent") {
    val blocks = documents.where($"doc_id" < 20)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
      .select($"doc_id", $"word",
        (lit(50) + ($"pos" % 2) * 300).as("x"), (expr("pos div 2") * 20).as("y"))
    def run(df: org.apache.spark.sql.DataFrame) =
      ops.Layout.readingOrder(df, "doc_id", 700, 50)
        .select($"doc_id", $"reading_pos", $"word").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(run(blocks.repartition(1)) == run(blocks.repartition(13)))
  }

  test("layout readingOrderK: 3-column interleaved stream recovered; k=2 matches fixed split") {
    // three columns at x∈{50,60}, {400,410}, {760}: the two largest gaps
    // in the distinct-x sequence (340, 350) are the column boundaries
    val blocks = Seq(
      ("d1", 50, 0, "A1"), ("d1", 400, 0, "B1"), ("d1", 760, 0, "C1"),
      ("d1", 60, 20, "A2"), ("d1", 410, 20, "B2"), ("d1", 760, 20, "C2"),
      ("d1", 50, 200, "A3")
    ).toDF("doc_id", "x", "y", "word")
    val out = ops.Layout.readingOrderK(blocks, "doc_id", k = 3, gapThreshold = 50)
      .orderBy($"reading_pos").collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Int]("col_id"), r.getAs[Int]("region_id")))
    assert(out.map(_._1).toSeq == Seq("A1", "A2", "A3", "B1", "B2", "C1", "C2"), out.toSeq.toString)
    assert(out.map(_._2).toSeq == Seq(0, 0, 0, 1, 1, 2, 2))
    assert(out.map(_._3).toSeq == Seq(0, 0, 1, 2, 2, 3, 3))
    // k=2 gap clustering agrees with the fixed midline split when the
    // largest gap IS the midline
    val two = Seq(
      ("d2", 50, 0, "L1"), ("d2", 400, 0, "R1"),
      ("d2", 60, 20, "L2"), ("d2", 410, 20, "R2")
    ).toDF("doc_id", "x", "y", "word")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"word", $"col_id", $"reading_pos").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(norm(ops.Layout.readingOrderK(two, "doc_id", 2, 50)) ==
      norm(ops.Layout.readingOrder(two, "doc_id", 700, 50)))
    // degenerate: fewer distinct x than k → single shared column, no error
    val one = Seq(("d3", 10, 0, "w0"), ("d3", 10, 20, "w1")).toDF("doc_id", "x", "y", "word")
    assert(ops.Layout.readingOrderK(one, "doc_id", 3, 50)
      .select("col_id").collect().map(_.getInt(0)).toSet == Set(0))
  }

  test("layout blocksFromSpans: extraction spans typeset → readingOrderK round-trips span order") {
    val spans = documents.where($"doc_id" < 40)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "text")))
    val blocks = ops.Layout.blocksFromSpans(spans, "doc_id", "pos", "text",
      charsPerLine = 40, linesPerCol = 4, colWidth = 200, lineHeight = 20)
    // within-column x spacing < charsPerLine (40) < minGap (100) <
    // inter-column gutter (colWidth - charsPerLine = 160): one k upper
    // bound serves documents of any real column count
    val recovered = ops.Layout.readingOrderK(blocks, "doc_id", k = 12,
      gapThreshold = 25, minGap = 100)
    assert(recovered.where($"reading_pos" =!= $"pos").count() == 0,
      "column-major reading order must reproduce the original span order")
  }

  // ---- text stats ----

  test("langIdBulk (broadcast-join argmax) == per-row langId on organic docs and planted fixtures") {
    val organic = documents.where($"doc_id" < 200).select($"doc_id", $"text")
    def perRow(df: org.apache.spark.sql.DataFrame, id: String) = df
      .select(col(id).cast("string").as("k"), ops.TextStats.langId($"text").as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def bulk(df: org.apache.spark.sql.DataFrame, id: String) =
      ops.TextStats.langIdBulk(df, id, "text")
        .select(col(id).cast("string").as("k"), $"pred")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bulk(organic, "doc_id") == perRow(organic, "doc_id"))
    val planted = ops.TextStats.plantedFixtures.toDF("fid", "lang", "text")
    assert(bulk(planted, "fid") == perRow(planted, "fid"))
    // zero-hit rows take the deterministic default (first profile)
    val none = Seq((1L, "zzz qqq"), (2L, "")).toDF("doc_id", "text")
    assert(bulk(none, "doc_id").values.toSet == Set("en"))
    // NULL text predicts null in BOTH forms (the per-row scores propagate
    // null; the bulk form must not default it to 'en')
    val withNull = Seq((1L, "the cat"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bulkNull = ops.TextStats.langIdBulk(withNull, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val rowNull = withNull
      .select($"doc_id", ops.TextStats.langId($"text").as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bulkNull == rowNull && bulkNull(2L).isEmpty, s"$bulkNull vs $rowNull")
  }

  test("ivfTopK works above CodebookLiteralMax centroids (broadcast path); exact at nProbe == nCells") {
    // 65 centroids forces the broadcast-join assign — the regime that
    // crashed on the __cv name collision; nProbe == nCentroids makes IVF
    // an exact search, so it must reproduce brute-force top-k
    val emb = embeddings.where($"vec_id" < 200)
      .select($"vec_id", $"embedding")
    val probes = emb.where($"vec_id" < 2)
    val n = 65
    val ivf = ops.Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
        k = 5, nCentroids = n, nProbe = n, lloydIters = 1)
      .select($"probe_id", $"cand_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val brute = ops.Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .select($"probe_id", $"cand_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(ivf == brute, s"exact IVF must equal brute force")
  }

  test("binaryNearDupPairs finds planted truncated payload copies and skips unrelated payloads") {
    val base = documents.where($"doc_id" < 30).select($"doc_id", $"text")
    // planted near-dups: the 60-byte prefix of each 64-byte payload —
    // byte-shingle sets are nested, Jaccard ≈ 57/61
    val corpus = base
      .select($"doc_id", encode(substring($"text", 1, 64), "utf-8").as("payload"))
      .union(base.select(($"doc_id" + 1000).as("doc_id"),
        encode(substring($"text", 1, 60), "utf-8").as("payload")))
    val pairs = ops.Media.binaryNearDupPairs(corpus, "doc_id", "payload",
        n = 4, k = 8, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val missing = (0L until 30L).filterNot(i => pairs.contains((i, i + 1000)))
    assert(missing.isEmpty, s"planted binary near-dups not found: $missing")
    pairs.foreach { case (p, j) => assert(j >= 0.5 && j <= 1.0, s"$p -> $j") }
    // payloads shorter than the shingle width never collide
    val tiny = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](1, 2)))
      .toDF("doc_id", "payload")
    assert(ops.Media.binaryNearDupPairs(tiny, "doc_id", "payload",
      n = 4, k = 8, bands = 4, threshold = 0.0).count() == 0,
      "sub-shingle payloads must get empty signatures, not constant collisions")
  }

  test("captionCandidates: adjacency after-preference, length bounds, array ends, offset sorting, null-text neighbors") {
    def sp(kind: String, text: String, ref: String, off: Int) =
      RawSpan(kind, text, ref, off)
    val docs = Seq(
      // both neighbors qualify → the FOLLOWING span wins
      ("d1", Seq(sp("text", "before text ok", null, 0),
        sp("media", null, "m://1", 1), sp("text", "after text ok", null, 2))),
      // following span too long → falls back to the preceding one
      ("d2", Seq(sp("text", "short ok", null, 0),
        sp("media", null, "m://2", 1), sp("text", "x" * 500, null, 2))),
      // NULL-text / media / too-short neighbors all disqualify → no caption
      ("d3", Seq(sp("text", null, null, 0), sp("media", null, "m://3a", 1),
        sp("media", null, "m://3b", 2), sp("text", "ab", null, 3))),
      // media at array start pairs forward; at array end pairs backward
      ("d4", Seq(sp("media", null, "m://4a", 0),
        sp("text", "middle caption", null, 1), sp("media", null, "m://4b", 2))),
      // adjacency is by OFFSET order, not input array order
      ("d5", Seq(sp("text", "tail text here", null, 2),
        sp("media", null, "m://5", 1), sp("text", "head text here", null, 0)))
    ).toDF("doc_id", "spans")
    val c = docs.select(explode(
        ops.Media.captionCandidates($"spans", minChars = 5, maxChars = 100)).as("c"))
      .select($"c.media_ref", $"c.pos", $"c.caption", $"c.side")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(c("m://1") == ((1, Some("after text ok"), Some("after"))))
    assert(c("m://2") == ((1, Some("short ok"), Some("before"))))
    assert(c("m://3a") == ((1, None, None)))
    assert(c("m://3b") == ((2, None, None)))
    assert(c("m://4a") == ((0, Some("middle caption"), Some("after"))))
    assert(c("m://4b") == ((2, Some("middle caption"), Some("before"))))
    assert(c("m://5") == ((1, Some("tail text here"), Some("after"))))
    assert(c.size == 7, "one candidate row per media span, captioned or not")
    // the pair TABLE keeps only captioned media and the callers' id columns
    val pairs = ops.Media.mediaTextPairs(docs, Seq("doc_id"), $"spans",
      minChars = 5, maxChars = 100)
    assert(pairs.columns.toSeq ==
      Seq("doc_id", "media_ref", "pos", "caption", "side"))
    assert(pairs.count() == 5 && pairs.where($"caption".isNull).count() == 0)
  }

  test("at-rest IVF index: append assigns with the stored codebook; nProbe == nCells over the appended index equals brute force") {
    val emb = embeddings.where($"vec_id" < 120).select($"vec_id", $"embedding")
    val a = emb.where($"vec_id" < 90)
    val b = emb.where($"vec_id" >= 90)
    val ixDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    ops.Similarity.buildIvfIndex(a, "vec_id", "embedding",
      nCentroids = 4, lloydIters = 1, path = ixDir)
    ops.Similarity.ivfIndexAppend(b, "vec_id", "embedding", ixDir)
    // every row (built + appended) lands in the partitioned cells table
    val stored = spark.read.parquet(s"$ixDir/cells")
    assert(stored.count() == emb.count() &&
      stored.where($"vec_id" >= 90).count() == b.count(),
      "append must land every new row in the cells table")
    // probing ALL cells makes the indexed search exact, so it must equal
    // brute force over the union — which only holds if the appended rows
    // were assigned with the SAME codebook geometry as the built ones
    val probes = emb.where($"vec_id" < 2)
    val viaIndex = ops.Similarity.ivfTopKIndexed(spark, ixDir, probes,
        "vec_id", "embedding", k = 5, nProbe = 4)
      .select($"probe_id", $"cand_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val brute = ops.Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .select($"probe_id", $"cand_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(viaIndex == brute,
      "nProbe == nCells over the at-rest index must equal brute force")
  }

  test("tokenizerStats: fertility >= 1 token/word by construction; ratios and totals replay exactly") {
    val df = documents.where($"doc_id" < 100).select($"source", $"text")
    val st = ops.Bpe.tokenizerStats(df, "source", "text", ops.Bpe.DemoMerges)
      .collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val (tok, w, ch) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getInt(5) >= 10000, s"fertility ${r.getInt(5)} < 1 tok/word")
      assert(r.getInt(5) == tok * 10000 / w && r.getInt(6) == ch * 10000 / tok,
        "ratios must be the integer floor divisions of the totals")
    }
    val perRow = df.select(sum(
      ops.Bpe.bpeTokenCount($"text", ops.Bpe.DemoMerges).cast("bigint")))
      .head().getLong(0)
    assert(st.map(_.getLong(2)).sum == perRow,
      "stratum totals must sum to the per-row token count")
    // empty / whitespace-only docs contribute 0 words AND 0 tokens, so
    // they cannot break the fertility bound; an all-degenerate stratum
    // yields NULL ratios rather than a bogus sub-10000 fertility
    val messy = Seq(("s", ""), ("s", "  "), ("s", "ab ab"), ("t", ""))
      .toDF("source", "text")
    val ms = ops.Bpe.tokenizerStats(messy, "source", "text",
      ops.Bpe.DemoMerges).orderBy($"source").collect()
    assert(ms(0).getLong(3) == 2L, "only non-empty words counted")
    assert(ms(0).getInt(5) >= 10000,
      "degenerate docs must not break the fertility bound")
    assert(ms(1).isNullAt(5) && ms(1).isNullAt(6),
      "all-degenerate stratum must yield NULL ratios")
  }

  test("trainProfiles: derived profiles recover every fixture the hand-authored ones do; continuous CJK detected") {
    val labeled = ops.TextStats.plantedFixtures.toDF("fid", "lang", "text")
    val trained = ops.TextStats.trainProfiles(labeled, "lang", "text", topN = 40)
    assert(trained.map(_._1).toSet == ops.TextStats.profileWords.map(_._1).toSet,
      "one trained profile per labeled language")
    trained.foreach { case (l, p) =>
      assert(p.nonEmpty && p.size <= 40 && p.distinct.size == p.size, s"profile $l") }
    assert(trained.map(_._1) == trained.map(_._1).sorted, "deterministic lang order")
    val handOk = labeled
      .select($"fid", $"lang", ops.TextStats.langId($"text").as("p")).collect()
      .filter(r => r.getString(2) == r.getString(1)).map(_.getString(0)).toSet
    val byTrained = labeled
      .select($"fid", $"lang", ops.TextStats.langIdWith($"text", trained).as("p"))
      .collect()
    byTrained.foreach { r =>
      if (handOk(r.getString(0)))
        assert(r.getString(2) == r.getString(1),
          s"trained profiles must recover ${r.getString(0)}") }
    // the bulk (broadcast-join) form is prediction-identical on the
    // trained table, exactly as it is on the hand-authored one
    val bulk = ops.TextStats.langIdBulkWith(labeled, "fid", "text", trained)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    byTrained.foreach(r => assert(bulk(r.getString(0)) == r.getString(2)))
    // continuous (unsegmented) CJK — the case the multi-char zh seeds
    // exist for: a space-free run still hits the inner space-free trigrams
    val cont = Seq(("zc", ops.TextStats.profileWords.toMap.apply("zh").mkString("")))
      .toDF("fid", "text")
    assert(cont.select(ops.TextStats.langId($"text")).head().getString(0) == "zh")
    assert(cont.select(ops.TextStats.langIdWith($"text", trained)).head().getString(0) == "zh")
  }

  test("langId recovers every planted language fixture (accuracy floor)") {
    val planted = ops.TextStats.plantedFixtures.toDF("fid", "lang", "text")
      .withColumn("pred", ops.TextStats.langId($"text"))
    val wrong = planted.where($"pred" =!= $"lang").collect()
    assert(wrong.isEmpty, s"mispredicted: ${wrong.mkString(", ")}")
  }

  test("text stats columns: langId deterministic argmax, quality formula, fingerprint order-insensitive") {
    val df = documents.select($"doc_id", $"text")
      .withColumn("lang", ops.TextStats.langId($"text"))
      .withColumn("q", ops.TextStats.qualityScore($"text"))
      .withColumn("fp", ops.TextStats.fingerprint($"text"))
    val rows = df.collect()
    val names = ops.TextStats.trigramProfiles.map(_._1).toSet
    assert(rows.forall(r => names.contains(r.getAs[String]("lang"))))
    assert(rows.forall(_.getAs[Int]("q") >= 0))
    // fingerprint ignores word order
    val shuffled = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta")).toDF("doc_id", "text")
      .withColumn("fp", ops.TextStats.fingerprint($"text"))
      .select("fp").collect().map(_.getString(0))
    assert(shuffled.distinct.length == 1)
  }

  // ---- product quantization ----

  test("PQ lossless codebook: ADC distances equal exact squared L2") {
    // vectors built from a known per-subspace alphabet -> encoding is
    // lossless, so the ADC lookup distance must EQUAL the true distance
    val alphabet = Seq(Seq(0.0, 0.0), Seq(1.0, 2.0), Seq(3.0, 1.0)) // k=3, subdim=2
    val cb: ops.Pq.Codebook = Seq(alphabet, alphabet)               // m=2 -> dims=4
    val combos = for (a <- alphabet; b <- alphabet) yield a ++ b
    val corpus = combos.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val codes = ops.Pq.encode(corpus, "vec_id", "embedding", cb)
    assert(codes.count() == combos.size)
    codes.collect().foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 2 && cs.forall(c => c >= 0 && c < 3), cs.toString)
    }
    val got = ops.Pq.adcTopK(codes, corpus.where($"vec_id" < 2), "vec_id", "embedding", cb, combos.size)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (p <- 0 until 2; c <- combos.indices if c != p) {
      val exact = combos(p).zip(combos(c)).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(got((p.toLong, c.toLong)) - exact) < 1e-12,
        s"probe $p cand $c: adc ${got((p.toLong, c.toLong))} != exact $exact")
    }
  }

  test("PQ rejects ragged vectors loudly instead of encoding garbage codes") {
    val alphabet = Seq(Seq(0.0, 0.0), Seq(1.0, 2.0))
    val cb: ops.Pq.Codebook = Seq(alphabet, alphabet) // expects dims = 4
    val ragged = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      ops.Pq.encode(ragged, "vec_id", "embedding", cb).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: all(t.getCause)
    assert(all(ex).exists(_.contains("vector length")), ex.toString)
    val probeEx = intercept[IllegalArgumentException] {
      ops.Pq.adcTopK(
        Seq((2L, Seq(0, 0))).toDF("vec_id", "codes"), ragged, "vec_id", "embedding", cb, 1)
    }
    assert(probeEx.getMessage.contains("dims"), probeEx.getMessage)
  }

  test("PQ training: quantization error is non-increasing and beats the seed") {
    val corpus = embeddings.where($"vec_id" < 200).select($"vec_id", $"embedding")
    val seed = ops.Pq.seedCodebook(corpus, "vec_id", "embedding", m = 4, k = 8)
    assert(seed.length == 4 && seed.head.length == 8 && seed.head.head.length == 16)
    val e0 = ops.Pq.quantizationError(corpus, "embedding", seed)
    val cb1 = ops.Pq.trainPq(corpus, "embedding", seed, iters = 1)
    val e1 = ops.Pq.quantizationError(corpus, "embedding", cb1)
    val cb2 = ops.Pq.trainPq(corpus, "embedding", cb1, iters = 1)
    val e2 = ops.Pq.quantizationError(corpus, "embedding", cb2)
    assert(e1 <= e0 + 1e-9 && e2 <= e1 + 1e-9, s"lloyd must not diverge: $e0 -> $e1 -> $e2")
    assert(e1 < e0, s"one round must improve the md5 seed on real data: $e0 -> $e1")
  }

  test("PQ ADC ranking tracks exact ranking on a planted near-duplicate") {
    // plant an exact duplicate of probe 0 at id 9000: the duplicate encodes
    // to the same codes as the probe itself, so its ADC distance is the
    // MINIMUM any candidate can reach — the probe's own reconstruction
    // error (ADC is asymmetric: raw probe vs candidate reconstruction, so
    // it is NOT 0) — and it must rank 1
    val base = embeddings.where($"vec_id" < 150).select($"vec_id", $"embedding")
    val probe = base.where($"vec_id" === 0)
    val corpus = base.union(probe.select(lit(9000L).as("vec_id"), $"embedding"))
    val cb = ops.Pq.trainPq(corpus, "embedding",
      ops.Pq.seedCodebook(corpus, "vec_id", "embedding", m = 4, k = 8), iters = 1)
    val codes = ops.Pq.encode(corpus, "vec_id", "embedding", cb)
    val top = ops.Pq.adcTopK(codes, probe, "vec_id", "embedding", cb, 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 9000L, top.mkString(","))
    // expected ADC: per subspace, min squared distance probe↔centroid
    val pv = probe.select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val expect = (0 until 4).map { sub =>
      val pSub = pv.slice(sub * 16, (sub + 1) * 16)
      cb(sub).map(c => c.zip(pSub).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum
    assert(math.abs(top(0).getDouble(2) - expect) < 1e-9,
      s"adc ${top(0).getDouble(2)} != probe reconstruction error $expect")
  }

  test("IVFADC: planted duplicate ranks 1; index carries cell + m codes; rerank is exact") {
    val base = embeddings.where($"vec_id" < 150).select($"vec_id", $"embedding")
    val probe = base.where($"vec_id" === 0)
    val corpus = base.union(probe.select(lit(9000L).as("vec_id"), $"embedding"))
    val (index, model) = ops.Pq.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 8, m = 4, k = 8, lloydIters = 1, pqIters = 1)
    val rows = index.collect()
    assert(rows.length == 151)
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 8), cs.toString)
      assert(r.getInt(2) >= 0 && r.getInt(2) < 8, "cell in range")
    }
    // the duplicate shares probe 0's cell AND codes -> minimal ADC -> rank 1
    val top = ops.Pq.ivfPqTopK(index, model, probe, "vec_id", "embedding",
      k = 5, nProbe = 2).localCheckpoint()
    assert(top.where($"rn" === 1).head.getLong(1) == 9000L, top.collect().mkString(","))
    // exact re-rank of the shortlist: the duplicate's exact distance is 0
    val rr = ops.Pq.rerankExact(top, corpus, probe, "vec_id", "embedding", 1).head
    assert(rr.getLong(1) == 9000L && rr.getDouble(2) == 0.0, rr.toString)
  }

  test("IVFADC residual training beats flat PQ quantization error at equal code budget") {
    // residuals concentrate near 0, so the same (m, k) budget spent on
    // residuals must reconstruct better than spent on raw vectors
    val corpus = embeddings.where($"vec_id" < 300).select($"vec_id", $"embedding")
    val flat = ops.Pq.trainPq(corpus, "embedding",
      ops.Pq.seedCodebook(corpus, "vec_id", "embedding", m = 4, k = 8), iters = 2)
    val eFlat = ops.Pq.quantizationError(corpus, "embedding", flat)
    val (_, model) = ops.Pq.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 16, m = 4, k = 8, lloydIters = 2, pqIters = 2)
    // rebuild the residual relation the index was trained on
    val resid = graft.ops.Similarity.cellRanks(
        corpus.select($"vec_id", $"embedding"), "vec_id", "embedding",
        model.cents, maxRank = 1)
      .withColumn("__cent", {
        val m2 = map(model.cents.zipWithIndex.flatMap { case (c, i) =>
          Seq(lit(i), typedLit(c)) }: _*)
        element_at(m2, $"__cell")
      })
      .withColumn("__resid",
        expr("zip_with(embedding, __cent, (x, c) -> cast(x as double) - c)"))
    val eResid = ops.Pq.quantizationError(resid, "__resid", model.cb)
    assert(eResid < eFlat, s"residual error $eResid must beat flat $eFlat")
  }

  // ---- BPE subword tokenizer ----

  /** Plain-Scala reference of the ordered-merge BPE spec (independent of
    * the Spark column implementation — String.replace semantics). */
  private def refBpeTokens(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val sym = text.replace(" ", "\u0001").flatMap(c => s" $c")
    val merged = merges.foldLeft(sym: String) { case (acc, (l, r)) =>
      acc.replace(s" $l $r", s" $l$r")
    }
    merged.trim.split(" ").toSeq.filter(t => t.nonEmpty && t != "\u0001")
  }

  /** Plain-Scala reference trainer: weighted vocab, argmax adjacent pair
    * (count desc, then lexicographic), ordered replace, stop under 2. */
  private def refLearn(words: Seq[String], n: Int): Seq[(String, String)] = {
    var vocab: Map[String, Long] =
      words.groupBy(identity).map { case (w, ws) =>
        w.flatMap(c => s" $c").toString -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, cnt) <- vocab) {
        val syms = sym.trim.split(" ")
        for (i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      }
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((l, r))
          vocab = vocab.map { case (sym, cnt) =>
            sym.replace(s" $l $r", s" $l$r") -> cnt
          }
        case _ => done = true
      }
    }
    out.toSeq
  }

  test("BPE applier: merges chain in rank order, never cross word boundaries, refs agree") {
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "t")
    // "the" chains t+h then th+e; "cat hat" must NOT merge t+h across the
    // boundary between "cat" and "hat"
    // doc 5 carries a carriage return: the symbolizer's [\s\S] class must
    // treat it as an ordinary char in BOTH engines (Java '.' and RE2 '.'
    // exclude different line terminators — the class sidesteps the dot)
    val df = Seq((1L, "the theory"), (2L, "cat hat"), (3L, "at the mat"), (4L, ""),
        (5L, "a\rb c"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        ops.Bpe.bpeTokens($"text", merges).as("toks"),
        ops.Bpe.bpeTokenCount($"text", merges).as("cnt"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(got(1L)._1 == Seq("the", "the", "o", "r", "y"))
    assert(got(2L)._1 == Seq("c", "at", "h", "at"), "t+h must not merge across words")
    assert(got(3L)._1 == Seq("at", "the", "m", "at"))
    assert(got(4L)._1.isEmpty && got(4L)._2 == 0)
    // length-algebra count == array size; both match the plain-Scala ref
    for ((id, text) <- Seq(1L -> "the theory", 2L -> "cat hat", 3L -> "at the mat",
        5L -> "a\rb c")) {
      assert(got(id)._1 == refBpeTokens(text, merges), s"doc $id tokens")
      assert(got(id)._2 == got(id)._1.size, s"doc $id count algebra")
    }
  }

  test("BPE applier matches the plain-Scala reference on real corpus text") {
    val rows = documents.where($"doc_id" < 40)
      .select($"doc_id", $"text",
        ops.Bpe.bpeTokens($"text", ops.Bpe.DemoMerges).as("toks"),
        ops.Bpe.bpeTokenCount($"text", ops.Bpe.DemoMerges).as("cnt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = refBpeTokens(r.getString(1), ops.Bpe.DemoMerges)
      assert(r.getSeq[String](2) == expect, s"doc ${r.getLong(0)}")
      assert(r.getInt(3) == expect.size, s"doc ${r.getLong(0)} count")
    }
  }

  test("BPE trainer: Spark learnMerges == plain-Scala reference; merges reduce token count") {
    val words = Seq("the", "the", "the", "then", "there", "that", "this",
      "other", "rather", "in", "inner", "thin", "thin")
    val corpus = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = ops.Bpe.learnMerges(corpus, "text", 6)
    val expect = refLearn(words, 6)
    assert(got == expect, s"got $got expected $expect")
    assert(got.nonEmpty && got.head == ("t" -> "h"), "t+h dominates this corpus")
    // applying the learned table shortens every word containing a merge
    val before = corpus.select(sum(ops.Bpe.bpeTokenCount($"text", Nil))).head.getLong(0)
    val after = corpus.select(sum(ops.Bpe.bpeTokenCount($"text", got))).head.getLong(0)
    assert(after < before, s"merges must reduce tokens: $before -> $after")
  }

  test("bpeTokensLarge (mapPartitions applier) == column applier, incl. a learned 100+-rank table") {
    val docs = documents.where($"doc_id" < 60).select($"doc_id", $"text")
    def viaColumn(d: org.apache.spark.sql.DataFrame, m: Seq[(String, String)]) = d
      .select($"doc_id".cast("string").as("id"), ops.Bpe.bpeTokens($"text", m).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def viaLarge(d: org.apache.spark.sql.DataFrame, m: Seq[(String, String)]) =
      ops.Bpe.bpeTokensLarge(d, "doc_id", "text", m)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaLarge(docs, ops.Bpe.DemoMerges) == viaColumn(docs, ops.Bpe.DemoMerges))
    // a big LEARNED table — the regime the mapPartitions form exists for
    // (the column fold's expression depth grows with every rank)
    val train = documents.where($"doc_id" < 200).select($"doc_id", $"text")
    val big = ops.Bpe.learnMergesBatched(train, "text", 300, batch = 64)
    assert(big.length > 60, s"corpus yielded only ${big.length} merges")
    assert(viaLarge(docs, big) == viaColumn(docs, big))
    // empty / multi-space / edge-whitespace rows agree too
    val edge = Seq((1L, ""), (2L, "a  b"), (3L, " the ")).toDF("doc_id", "text")
    assert(viaLarge(edge, ops.Bpe.DemoMerges) == viaColumn(edge, ops.Bpe.DemoMerges))
    // NULL text: both appliers propagate null (swappable on nullable cols)
    val withNull = Seq((1L, Some("the cat")), (2L, None))
      .toDF("doc_id", "text")
    def nullsOf(rows: Map[String, Seq[String]]) = rows.filter(_._2 == null).keySet
    val lc = viaLarge(withNull, ops.Bpe.DemoMerges)
    val cc = viaColumn(withNull, ops.Bpe.DemoMerges)
    assert(lc == cc && nullsOf(lc) == Set("2"), s"null parity: $lc vs $cc")
  }

  test("BPE token ids: exact round trip, contiguous lexicographic vocab, OOV surfaced not dropped") {
    val docs = Seq(
      (1L, Some("the theory of that")),
      (2L, Some("a  b")),   // consecutive spaces survive the round trip
      (3L, Some(" the ")),  // edge whitespace survives too
      (4L, Some("")),       // empty text → empty ids → empty decode
      (5L, Some("a\rb c")), // control chars are ordinary symbols
      (6L, None)            // NULL text → NULL ids → NULL decode
    ).toDF("doc_id", "text")
    val vocab = ops.Bpe.buildVocab(docs, "text", ops.Bpe.DemoMerges)
    val v = vocab.collect().map(r => r.getInt(0) -> r.getString(1)).sortBy(_._1)
    // ids contiguous from 0, tokens in lexicographic order, boundary present
    assert(v.map(_._1).toSeq == v.indices.toSeq, "ids must be contiguous from 0")
    assert(v.map(_._2).toSeq == v.map(_._2).toSeq.sorted, "lexicographic id order")
    assert(v.exists(_._2 == ops.Bpe.Boundary), "boundary symbol must be in vocab")
    assert(v.exists(_._2 == "the"), "merged symbol must be in vocab")

    val enc = ops.Bpe.encodeIds(docs, "doc_id", "text", ops.Bpe.DemoMerges, vocab)
    val dec = ops.Bpe.decodeIds(enc, "ids", vocab)
      .join(docs, Seq("doc_id"))
      .select($"doc_id", $"decoded", $"text")
      .collect()
    assert(dec.length == 6)
    dec.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)} round trip: '${r.getString(1)}' vs '${r.getString(2)}'"))
    val byId = enc.collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    assert(byId(4L).get.isEmpty, "empty text encodes to zero ids")
    assert(byId(6L).isEmpty, "null text encodes to null ids")

    // cross-corpus encode against this vocab: unseen chars map to unkId,
    // and unknown ids decode to the replacement char — never dropped
    val foreign = Seq((9L, "zzz the")).toDF("doc_id", "text")
    val fenc = ops.Bpe.encodeIds(foreign, "doc_id", "text", ops.Bpe.DemoMerges, vocab)
    val fids = fenc.head.getSeq[Int](1)
    assert(fids.take(3).forall(_ == -1), s"z is OOV, got $fids")
    assert(fids.drop(3).forall(_ >= 0), "in-vocab suffix must resolve")
    val fdec = ops.Bpe.decodeIds(fenc, "ids", vocab).head.getAs[String]("decoded")
    assert(fdec == "��� the", s"got '$fdec'")
  }

  test("oovStats: frozen vocab applied to new text counts OOV exactly; null text is zero tokens") {
    // vocab from "the cat" under DemoMerges: {the, <B>, c, at}
    val a = Seq((1L, "the cat")).toDF("doc_id", "text")
    val vocab = ops.Bpe.buildVocab(a, "text", ops.Bpe.DemoMerges)
    val b = Seq(
      ("src1", Some("the dog")),  // [the, <B>, d, o, g] → 3 of 5 OOV
      ("src2", Some("the cat")),  // fully in-vocab
      ("src3", None: Option[String]) // NULL text → zero tokens, NULL rate
    ).toDF("source", "text")
    val got = ops.Bpe.oovStats(b, "source", "text", ops.Bpe.DemoMerges, vocab)
      .orderBy($"source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Int])))
      .toSeq
    assert(got == Seq(
      ("src1", 5L, 3L, Some(6000)),
      ("src2", 4L, 0L, Some(0)),
      ("src3", 0L, 0L, None)), got.toString)
  }

  test("BPE batched trainer: batch=1 == sequential; disjoint-pair rounds equal sequential; deterministic") {
    // chaining corpus (th → the): batch=1 must reduce EXACTLY to the
    // sequential trainer — the delegation identity
    val chain = Seq("the", "the", "the", "then", "there", "that", "this",
      "other", "rather", "in", "inner", "thin", "thin")
    val chainDf = chain.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    assert(ops.Bpe.learnMergesBatched(chainDf, "text", 8, batch = 1) == refLearn(chain, 8))
    // corpus whose top merges are naturally DISJOINT: one batched round
    // equals three sequential rounds verbatim
    val disj = Seq("ab", "ab", "ab", "ab", "cd", "cd", "cd", "ef", "ef")
    val disjDf = disj.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val batched = ops.Bpe.learnMergesBatched(disjDf, "text", 3, batch = 3)
    assert(batched == refLearn(disj, 3), s"got $batched")
    // larger batches on the chaining corpus: deterministic across runs,
    // within-round selections symbol-disjoint by construction, and the
    // learned table still compresses
    val b4a = ops.Bpe.learnMergesBatched(chainDf, "text", 8, batch = 4)
    val b4b = ops.Bpe.learnMergesBatched(chainDf, "text", 8, batch = 4)
    assert(b4a == b4b)
    val before = chainDf.select(sum(ops.Bpe.bpeTokenCount($"text", Nil))).head.getLong(0)
    val after = chainDf.select(sum(ops.Bpe.bpeTokenCount($"text", b4a))).head.getLong(0)
    assert(after < before)
  }

  test("BPE trainer: minCount prunes the hapax tail; early stop when nothing repeats") {
    val corpus = Seq((1L, "aa aa aa zq"), (2L, "aa bb")).toDF("doc_id", "text")
    // with minCount=2 the hapax words (zq, bb) never enter the vocab
    val merges = ops.Bpe.learnMerges(corpus, "text", 4, minCount = 2L)
    assert(merges.contains("a" -> "a"))
    assert(!merges.exists { case (l, r) => (l + r).contains("z") || (l + r).contains("b") })
    // a corpus of unique single chars has no repeatable pair -> early stop
    val empty = ops.Bpe.learnMerges(Seq((1L, "x y")).toDF("doc_id", "text"), "text", 4)
    assert(empty.isEmpty)
  }

  // ---- incremental dedup ----

  test("incrementalDedup admits exactly what a full re-run over corpus ∪ delta would keep") {
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    val T = words("t", 40)
    val corpus = Seq((1L, T), (2L, words("u", 40)), (3L, words("v", 40)))
      .toDF("doc_id", "text")
    val delta = Seq(
      101L -> T,                                        // exact copy of corpus → drop
      102L -> s"$T x1",                                 // near-dup of corpus (j=40/41) → drop
      103L -> words("f", 20),                           // fresh → admit
      104L -> (words("t", 34) + " x1 " + words("z", 5)), // j vs T=34/46 < 0.75, j vs 102=35/46... 0.761 ≥ 0.75:
                                                        // transitively dup of corpus THROUGH 102 → drop
      105L -> words("g", 40),                           // fresh pair keeper → admit
      106L -> (words("g", 40) + " x2"),                 // within-delta near-dup of 105 → drop
      107L -> words("f", 20))                           // within-delta exact dup of 103 → drop
      .toDF("doc_id", "text")
    val admitted = ops.Dedup.incrementalDedup(delta, corpus, "doc_id", "text",
        threshold = 0.75)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(103L, 105L), s"got $admitted")

    // equivalence: a full re-run over corpus ∪ delta (corpus ids smaller,
    // so corpus rows always win keeper selection) must admit the same set
    val union = corpus.union(delta)
    val fullExact = ops.Dedup.exactDedup(union, "doc_id", "text")
    val fullPairs = ops.Dedup.nearDupPairs(fullExact, "doc_id", "text",
        threshold = 0.75).select($"id_a", $"id_b")
    val fullKept = ops.Dedup.dedupCorpus(fullExact, "doc_id", fullPairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(fullKept.filter(_ > 100L) == admitted)
  }

  test("incrementalDedupIndexed over a PERSISTED index admits exactly what the corpus path admits") {
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    val T = words("t", 40)
    val corpus = Seq((1L, T), (2L, words("u", 40)), (3L, words("v", 40)),
      (4L, "a b"))                                       // short doc: hash-only index row
      .toDF("doc_id", "text")
    val delta = Seq(
      101L -> T,                                         // exact copy → drop
      102L -> s"$T x1",                                  // near-dup of corpus → drop
      103L -> words("f", 20),                            // fresh → admit
      104L -> (words("t", 34) + " x1 " + words("z", 5)), // transitively poisoned → drop
      105L -> words("g", 40),                            // fresh keeper → admit
      106L -> (words("g", 40) + " x2"),                  // within-delta near-dup → drop
      107L -> words("f", 20),                            // within-delta exact dup → drop
      108L -> "a b")                                     // exact copy of the SHORT doc → drop
      .toDF("doc_id", "text")
    // write the index to parquet and read it back — the at-rest round trip
    // IS the persistence contract
    val dir = java.nio.file.Files.createTempDirectory("dedup_index").toString
    ops.Dedup.buildIndex(corpus, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val viaIndex = ops.Dedup.incrementalDedupIndexed(delta, corpus, index,
        "doc_id", "text", threshold = 0.75)
      .select($"doc_id").as[Long].collect().toSet
    val viaCorpus = ops.Dedup.incrementalDedup(delta, corpus, "doc_id", "text",
        threshold = 0.75)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaIndex == Set(103L, 105L), s"got $viaIndex")
    assert(viaIndex == viaCorpus)
    // the short corpus doc contributed its hash (108 dropped) but no bands
    assert(index.where($"band" === -1).count() == 1)
    assert(index.where($"doc_id" === 4L && $"band" >= 0).count() == 0)
  }

  test("lshOversizeBucketsUnion flags buckets only the COMBINED sides overflow") {
    val txt = "same words in every copy of this page body here"
    val d = spark.range(50).select(($"id" + 10000).as("doc_id"), lit(txt).as("text"))
    val c = spark.range(60).select($"id".as("doc_id"), lit(txt).as("text"))
    val dS = ops.Dedup.minhashSignatures(d, "text", 8).select($"doc_id", $"sig")
    val cS = ops.Dedup.minhashSignatures(c, "text", 8).select($"doc_id", $"sig")
    // per-side populations (50, 60) are both under 100; the UNION bucket
    // (110) is what a full re-run over corpus ∪ delta would see — flagged
    val over = ops.Dedup.lshOversizeBucketsUnion(dS, cS, "doc_id", 4, 100)
    assert(over.count() == 4) // one bucket per band
    assert(over.agg(max($"members")).head().getLong(0) == 110)
    // and at a permissive threshold nothing is flagged
    assert(ops.Dedup.lshOversizeBucketsUnion(dS, cS, "doc_id", 4, 4096).count() == 0)
  }

  // ---- hashing-trick embeddings ----

  test("semanticDedup: within-cell pairs == brute-force ground truth; one keeper per planted family") {
    // integer-quantized corpus + planted semantic families: exact vector
    // copies (cos = 1) and one-component perturbations (cos ≈ 1)
    val base = embeddings.where($"vec_id" < 120)
      .select($"vec_id",
        expr("transform(embedding, x -> cast(floor(cast(x as double)*1000) as bigint))").as("qv"))
    val corpus = base
      .union(base.where($"vec_id" < 10).select(($"vec_id" + 1000).as("vec_id"), $"qv"))
      .union(base.where($"vec_id" < 5).select(($"vec_id" + 2000).as("vec_id"),
        expr("concat(array(qv[0] + 100L), slice(qv, 2, size(qv) - 1))").as("qv")))
      .localCheckpoint()
    val t = 0.99
    val pairs = ops.Similarity.semanticNearDupPairs(corpus, "vec_id", "qv",
        threshold = t, nCentroids = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    // ground truth: brute-force cosine over pairs sharing the SAME cell
    // (recall is defined within-cell — the documented SemDeDup trade)
    val rows = corpus.select($"vec_id", $"qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val cents = ops.Similarity.seedCentroids(corpus, "vec_id", "qv", 4)
    def cellOf(v: Array[Long]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, i) }.min._2
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => (x * y).toDouble }.sum
      dot / (math.sqrt(a.map(x => (x * x).toDouble).sum) *
        math.sqrt(b.map(x => (x * x).toDouble).sum))
    }
    val byCell = rows.toSeq.groupBy { case (_, v) => cellOf(v) }
    val expected: Set[(Long, Long)] = byCell.values.flatMap { members =>
      for {
        (ia, va) <- members; (ib, vb) <- members
        if ia < ib && cos(va, vb) >= t
      } yield (ia, ib)
    }.toSet
    assert(pairs == expected, s"pairs diff: ${pairs.diff(expected)} / ${expected.diff(pairs)}")
    // planted exact copies MUST pair (identical vector → same cell, cos 1)
    (0L until 10L).foreach(i => assert(pairs.contains((i, i + 1000)), s"exact family $i"))

    // the dedup keeps exactly one id per component, the minimum
    val kept = ops.Dedup.semanticDedup(corpus, "vec_id", "qv",
        threshold = t, nCentroids = 4)
      .select($"vec_id").as[Long].collect().toSet
    (0L until 10L).foreach(i => assert(!kept.contains(i + 1000), s"copy $i+1000 must drop"))
    // keeper rule spot check via resolveClusters
    val res = ops.Dedup.resolveClusters(
        pairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    res.foreach { case (id, cl, keep) => assert(keep == (id == cl)) }
    assert(kept.size == corpus.count() - res.count(!_._3))
  }

  test("semanticNearDupPairs: hot-cell guard drops oversize cells; audit surface reports them") {
    val base = embeddings.where($"vec_id" < 60)
      .select($"vec_id",
        expr("transform(embedding, x -> cast(floor(cast(x as double)*1000) as bigint))").as("qv"))
    // 40 copies of one vector → its cell exceeds maxCell = 32
    val hot = base.where($"vec_id" === 0)
    val flood = (1 to 40).map(i => hot.select(($"vec_id" + 5000 + i).as("vec_id"), $"qv"))
      .reduce(_ union _)
    val corpus = base.union(flood).localCheckpoint()
    val audited = ops.Similarity.semanticOversizeCells(
      corpus, "vec_id", "qv", nCentroids = 4, lloydIters = 0, maxCell = 32)
    assert(audited.count() >= 1, "flooded cell must be reported")
    val guarded = ops.Similarity.semanticNearDupPairs(corpus, "vec_id", "qv",
      threshold = 0.99, nCentroids = 4, maxCell = 32)
    // no pair from the flooded cell survives the guard; audit names it
    val floodIds = (1 to 40).map(i => 5000L + i).toSet + 0L
    assert(guarded.where($"id_a".isin(floodIds.toSeq: _*) ||
      $"id_b".isin(floodIds.toSeq: _*)).count() == 0)
  }

  test("semanticCrossHits == probed-cell brute-force ground truth; planted bench copies all hit") {
    val e = embeddings.select($"vec_id",
      expr("transform(embedding, x -> cast(floor(cast(x as double)*1000) as bigint))").as("qv"))
    val bench = e.where($"vec_id" < 8).localCheckpoint()
    val corpus = e.where($"vec_id" >= 100 && $"vec_id" < 160)
      .union(bench.where($"vec_id" < 4).select(($"vec_id" + 2000).as("vec_id"), $"qv"))
      .union(bench.where($"vec_id" < 2).select(($"vec_id" + 3000).as("vec_id"),
        expr("concat(array(qv[0] + 100L), slice(qv, 2, size(qv) - 1))").as("qv")))
      .localCheckpoint()
    val t = 0.99
    val got = ops.Similarity.semanticCrossHits(corpus, bench, "vec_id", "qv",
        threshold = t, nCentroids = 4, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // ground truth: bench-seeded centroids, bench in its nearest cell,
    // corpus probing its 2 nearest — a hit iff the bench cell is among the
    // corpus row's probed cells and exact cosine clears the threshold
    val cents = ops.Similarity.seedCentroids(bench, "vec_id", "qv", 4)
    def sqd(c: Seq[Double], v: Array[Long]) =
      c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
    def probed(v: Array[Long], k: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) => (sqd(c, v), i) }.sorted.take(k).map(_._2)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => (x * y).toDouble }.sum
      dot / (math.sqrt(a.map(x => (x * x).toDouble).sum) *
        math.sqrt(b.map(x => (x * x).toDouble).sum))
    }
    val benchRows = bench.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val corpusRows = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val expected = corpusRows.map { case (cid, cv) =>
      val cells = probed(cv, 2).toSet
      cid -> benchRows.count { case (_, bv) =>
        cells.contains(probed(bv, 1).head) && cos(cv, bv) >= t }
    }.filter(_._2 > 0).toMap
    assert(got == expected, s"diff: ${got.toSet.diff(expected.toSet)} / ${expected.toSet.diff(got.toSet)}")
    // every planted exact copy sits in its bench twin's cell → must hit
    (0L until 4L).foreach(i => assert(got.getOrElse(i + 2000, 0) >= 1, s"exact copy $i"))

    // the decontamination wrapper: one row per corpus doc, keep == (hits == 0)
    val keep = ops.Cleaning.semanticDecontaminate(corpus, bench, "vec_id", "qv",
        threshold = t, nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(keep.length == corpusRows.length)
    keep.foreach { case (id, n, k) =>
      assert(n == expected.getOrElse(id, 0) && k == (if (n > 0) 0 else 1), s"row $id") }
  }

  test("hashEmbed: word-order invariant, duplicate docs identical, L1 bounded by word count") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // permutation → same bag → same vec
      (3L, "alpha beta gamma delta"), // exact dup
      (4L, "totally different words here"))
      .toDF("doc_id", "text")
    val vecs = ops.Embed.hashEmbed(df, "text", 16)
      .select($"doc_id", $"vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(vecs(1L) == vecs(2L) && vecs(1L) == vecs(3L))
    assert(vecs(1L) != vecs(4L))
    assert(vecs.values.forall(_.map(math.abs).sum <= 4))
    assert(vecs.values.forall(_.length == 16))
  }

  test("hashEmbed + normalized feeds the cosine ANN path: planted dup ranks first") {
    val corpus = documents.select($"doc_id", $"text").where($"doc_id" < 60)
    val emb = ops.Embed.hashEmbed(corpus, "text", 32)
      .select($"doc_id".as("vec_id"), ops.Embed.normalized($"vec").as("embedding"))
    // probe = doc 7's exact text under a new id: cosine 1.0 with doc 7
    val probe = ops.Embed.hashEmbed(
        corpus.where($"doc_id" === 7).select(lit(999L).as("doc_id"), $"text"),
        "text", 32)
      .select($"doc_id".as("vec_id"), ops.Embed.normalized($"vec").as("embedding"))
    val top = ops.Similarity.bruteForceTopK(emb, probe, "vec_id", "embedding", k = 3)
      .where($"rn" === 1).collect().head
    assert(top.getAs[Long]("cand_id") == 7L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  // ---- exact substring dedup (Lee et al.) ----

  test("exactSubstringDedup: cross-doc run cut from the later doc, within-doc repeat cut once, short docs untouched") {
    val docs = Seq(
      (1L, "a b c d e f"),          // first occurrence of the shared run
      (2L, "x y a b c d q"),        // shares 4-token run "a b c d" with doc 1
      (3L, "m n o p m n o p z"),    // within-doc repeat of "m n o p"
      (4L, "short text")            // < k tokens: untouched
    ).toDF("doc_id", "text")
    val out = ops.Dedup.exactSubstringDedup(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((6, 0, "a b c d e f")), "globally-first occurrence keeps everything")
    // doc 2: duplicated 3-gram starts p=2 ("a b c"), p=3 ("b c d") →
    // removed positions 2..5, text rebuilt without the shared run
    assert(out(2L) == ((7, 4, "x y q")))
    // doc 3: second "m n o p" (starts p=4, p=5) cut; first kept
    assert(out(3L) == ((9, 4, "m n o p z")))
    assert(out(4L) == ((2, 0, "short text")))
  }

  test("exactSubstringDedup: planted 20-token copies lose exactly the copied head, originals unchanged") {
    val k = 15
    val base = documents.select($"doc_id", $"text").where($"doc_id" < 40)
    val planted = base.where($"doc_id" < 10 && size(split($"text", " ")) >= 20)
      .select(($"doc_id" + 9000).as("doc_id"),
        concat(array_join(slice(split($"text", " "), 1, 20), " "),
          lit(" planted"), $"doc_id".cast("string"), lit(" tail")).as("text"))
    val nPlanted = planted.count()
    assert(nPlanted > 0, "fixture must plant at least one copy")
    val out = ops.Dedup.exactSubstringDedup(base.union(planted), "doc_id", "text", k)
    // duplicated 15-gram starts inside the copied 20-token head are p=0..5
    // → removed positions 0..19: the entire head, and nothing else
    val plantedOut = out.where($"doc_id" >= 9000).collect()
    assert(plantedOut.length == nPlanted)
    plantedOut.foreach { r =>
      assert(r.getInt(2) == 20, s"planted ${r.getLong(0)}: removed ${r.getInt(2)}")
      assert(r.getString(3) == s"planted${r.getLong(0) - 9000} tail")
    }
    // originals hold the first occurrences, so adding the planted copies
    // changes NOTHING for them: per-doc removals identical to a run over
    // the base slice alone (organic duplicates inside the slice — e.g. an
    // exact-dup pair — are cut identically in both runs)
    def rmMap(df: org.apache.spark.sql.DataFrame) =
      df.where($"doc_id" < 40).collect()
        .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(rmMap(out) == rmMap(ops.Dedup.exactSubstringDedup(base, "doc_id", "text", k)))
  }

  test("exactSubstringDedup: NULL text passes through as (0, 0, NULL), never a rebuilt row") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d q"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = ops.Dedup.exactSubstringDedup(docs, "doc_id", "text", k = 3)
    val r = out.where($"doc_id" === 3L).collect()
    assert(r.length == 1, "null-text doc must stay one output row")
    assert(r.head.getInt(1) == 0 && r.head.getInt(2) == 0 && r.head.isNullAt(3),
      s"null text must pass through, got ${r.head}")
    // and its presence changes nothing for the real docs
    assert(out.where($"doc_id" === 2L).head().getString(3) == "x y q")
  }

  // ---- URL canonicalization ----

  test("canonicalize: case, default ports, fragments, tracking params, param order, trailing slashes") {
    val cases = Seq(
      ("HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#f", "http://example.com/a?a=1&b=2"),
      ("https://H.com:443/", "https://h.com/"),
      ("https://h.com:8443/x/", "https://h.com:8443/x"),   // non-default port kept
      ("http://h.com", "http://h.com/"),                   // empty path → root
      ("http://h.com/x//y///", "http://h.com/x//y"),       // only TRAILING slashes stripped
      ("ftp://H.com:80/x", "ftp://h.com:80/x"),            // :80 only default for http
      ("http://h.com/p?gclid=1&fbclid=2&ref=3&msclkid=4", "http://h.com/p"),
      ("http://h.com/p?ref=3&real=1", "http://h.com/p?real=1"),
      ("not a url", "not a url"),                          // unparseable passes through
      ("/relative/path?a=1", "/relative/path?a=1"))
    val out = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("id", "url")
      .withColumn("canon", ops.Urls.canonicalize($"url"))
      .orderBy($"id").collect().map(_.getString(2))
    cases.zip(out).foreach { case ((in, want), got) =>
      assert(got == want, s"canonicalize($in)") }
  }

  test("dedupByUrl: case/tracking/slash variants collapse, earliest id wins") {
    val urls = Seq(
      (1L, "http://A.com/x?utm_source=t"),
      (2L, "HTTP://a.COM:80/x/"),
      (3L, "http://a.com/x#frag"),
      (4L, "http://a.com/y"),
      (5L, "http://a.com/y?b=1")).toDF("doc_id", "url")
    val kept = ops.Urls.dedupByUrl(urls, "doc_id", "url")
      .select($"doc_id", $"canonical_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 4L, 5L), s"got $kept")
    assert(kept(1L) == "http://a.com/x")
    assert(kept(5L) == "http://a.com/y?b=1")
  }

  // ---- bigram LM quality scoring (CCNet-style) ----

  test("bigramCounts/trainBigramLm: hand-checked add-one model over a two-doc reference") {
    val ref = Seq("a b a", "a b").toDF("text")
    val counts = ops.Lm.bigramCounts(ref, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // bigrams: (^,a)×2, (a,b)×2, (b,a)×1 ; totals ^:2 a:2 b:1
    assert(counts == Map(
      ("^", "a") -> ((2L, 2L)), ("a", "b") -> ((2L, 2L)), ("b", "a") -> ((1L, 1L))))
    val model = ops.Lm.trainBigramLm(ref, "text").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap
    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    // V = |{a, b}| = 2 ; seen p = (cnt+1)/(tot+V)
    assert(model((Some("^"), Some("a"))) == q(3.0 / 4))
    assert(model((Some("a"), Some("b"))) == q(3.0 / 4))
    assert(model((Some("b"), Some("a"))) == q(2.0 / 3))
    // per-prev unseen mass 1/(tot+V), global fallback 1/V
    assert(model((Some("^"), None)) == q(1.0 / 4))
    assert(model((Some("b"), None)) == q(1.0 / 3))
    assert(model((None, None)) == q(1.0 / 2))
  }

  test("lmScore: seen/unseen-word/unseen-prev fallbacks resolve exactly, reference-like text outranks noise") {
    val ref = Seq("a b a", "a b").toDF("text")
    val model = ops.Lm.trainBigramLm(ref, "text")
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "z z")).toDF("doc_id", "text")
    val out = ops.Lm.lmScore(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val in = q(3.0 / 4)
    // doc 1: (^,a) + (a,b), both seen
    assert(out(1L)._1 == 2L && out(1L)._2 == in + in)
    // doc 2: (^,a) seen + (a,c) → prev 'a' unseen-word mass 1/(2+2)
    assert(out(2L)._2 == in + q(1.0 / 4))
    // doc 3: (^,z) → '^' unseen mass; (z,z) → prev unseen → global 1/V
    assert(out(3L)._2 == q(1.0 / 4) + q(1.0 / 2))
    // score_q = floor(sum / n)
    assert(out(2L)._3 == math.floorDiv(out(2L)._2, 2))
    // the CCNet ranking: reference-like text above noise
    assert(out(1L)._3 > out(3L)._3)
  }

  test("lmScore over the documents corpus: reference slice outscores shuffled-vocabulary noise docs") {
    val ref = documents.where($"doc_id" < 100).select($"text")
    val model = ops.Lm.trainBigramLm(ref, "text")
    // noise: reverse each doc's tokens — same unigrams, broken bigrams
    val probe = documents.where($"doc_id" >= 100 && $"doc_id" < 140)
      .select($"doc_id", $"text")
    val noise = probe.select(($"doc_id" + 5000).as("doc_id"),
      array_join(reverse(split($"text", " ")), " ").as("text"))
    val out = ops.Lm.lmScore(probe.union(noise), "doc_id", "text", model)
    val real = out.where($"doc_id" < 5000).agg(avg($"score_q")).head().getDouble(0)
    val rev = out.where($"doc_id" >= 5000).agg(avg($"score_q")).head().getDouble(0)
    assert(real > rev,
      s"reference-like avg $real must beat reversed-text avg $rev")
  }

  test("lmBuckets: rank-exact head/middle/tail sizes; threshold form agrees on tie-free scores") {
    // 19 tie-free scores, higher for smaller id → descending rank == id.
    // n=19, fractions 0.3/0.3: head = ceil(5.7) = ranks 1..6, middle =
    // ranks 7..ceil(11.4)=12, tail = 13..19.
    val scored = (1L to 19L).map(i => (i, -100000L * i)).toDF("doc_id", "score_q")
    val ranked = ops.Lm.lmBucketsRanked(scored, "doc_id", headFrac = 0.3, midFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 6L).forall(ranked(_) == "head"))
    assert((7L to 12L).forall(ranked(_) == "middle"))
    assert((13L to 19L).forall(ranked(_) == "tail"))
    // production map-side form from one percentile scan: same assignment
    val (hMin, mMin) = ops.Lm.lmBucketThresholds(scored, "score_q", 0.3, 0.3)
    val byT = ops.Lm.lmBucketsByThreshold(scored, "score_q", hMin, mMin)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byT == ranked,
      s"threshold split (h>=$hMin, m>=$mMin) diverged from rank split")
  }

  // ---- Stupid Backoff n-gram LM (Brants et al. 2007) ----

  test("backoffCounts/trainStupidBackoff: hand-checked per-order counts and scores over a two-doc reference") {
    val ref = Seq("a b a b", "a c").toDF("text")
    val counts = ops.Lm.backoffCounts(ref, "text", n = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // order 1 (ctx ''): a:3 b:2 c:1 over N=6
    assert(counts((1, "", "a")) == ((3L, 6L)))
    assert(counts((1, "", "b")) == ((2L, 6L)))
    assert(counts((1, "", "c")) == ((1L, 6L)))
    // order 2: (^,a)×2 (a,b)×2 (b,a)×1 (a,c)×1 ; tots ^:2 a:3 b:1
    assert(counts((2, "^", "a")) == ((2L, 2L)))
    assert(counts((2, "a", "b")) == ((2L, 3L)))
    assert(counts((2, "b", "a")) == ((1L, 1L)))
    assert(counts((2, "a", "c")) == ((1L, 3L)))
    // order 3: doc starts pad to '^ ^'
    assert(counts((3, "^ ^", "a")) == ((2L, 2L)))
    assert(counts((3, "^ a", "b")) == ((1L, 2L)))
    assert(counts((3, "^ a", "c")) == ((1L, 2L)))
    assert(counts((3, "a b", "a")) == ((1L, 1L)))
    assert(counts((3, "b a", "b")) == ((1L, 1L)))
    assert(counts.size == 12)

    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val model = ops.Lm.trainStupidBackoff(ref, "text", n = 3).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)))
        -> r.getLong(3)).toMap
    assert(model((3, Some("^ a"), Some("b"))) == q(1.0 / 2))
    assert(model((1, Some(""), Some("a"))) == q(3.0 / 6))
    assert(model((0, None, None)) == q(1.0 / 6), "OOV base = 1/N")
    // the penalty constant is the quantized ln(0.4) — pinned literal
    assert(ops.Lm.BackoffPenaltyQ == math.floor(math.log(0.4) * 1e6).toLong)
  }

  test("stupidBackoffScore: highest seen order wins, each backoff level adds exactly one penalty") {
    val ref = Seq("a b a b", "a c").toDF("text")
    val model = ops.Lm.trainStupidBackoff(ref, "text", n = 3)
    val docs = Seq((1L, "a b z"), (2L, "a b a")).toDF("doc_id", "text")
    val out = ops.Lm.stupidBackoffScore(docs, "doc_id", "text", model, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val B = ops.Lm.BackoffPenaltyQ
    // doc 1: (^ ^, a) seen ln(2/2)=0 ; (^ a, b) seen ln(1/2) ;
    //        z: unseen at every order → OOV base + 2 penalties
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == q(1.0) + q(1.0 / 2) + (q(1.0 / 6) + 2 * B))
    // doc 2: third token 'a' has SEEN trigram (a b, a) → full ln(1/1)=0,
    //        no penalty even though lower orders also know 'a'
    assert(out(2L)._2 == q(1.0) + q(1.0 / 2) + q(1.0))
    assert(out(2L)._3 == math.floorDiv(out(2L)._2, 3))
    assert(out(2L)._3 > out(1L)._3, "in-reference continuation outranks OOV")
  }

  test("stupidBackoffScore over the documents corpus: reference slice outscores reversed noise, and the trigram gate separates harder than the bigram gate") {
    val ref = documents.where($"doc_id" < 100).select($"text")
    val model = ops.Lm.trainStupidBackoff(ref, "text", n = 3)
    val probe = documents.where($"doc_id" >= 100 && $"doc_id" < 140)
      .select($"doc_id", $"text")
    val noise = probe.select(($"doc_id" + 5000).as("doc_id"),
      array_join(reverse(split($"text", " ")), " ").as("text"))
    val out = ops.Lm.stupidBackoffScore(
      probe.union(noise), "doc_id", "text", model, n = 3)
    val real = out.where($"doc_id" < 5000).agg(avg($"score_q")).head().getDouble(0)
    val rev = out.where($"doc_id" >= 5000).agg(avg($"score_q")).head().getDouble(0)
    assert(real > rev,
      s"reference-like avg $real must beat reversed-text avg $rev")
  }

  // ---- multinomial Naive Bayes classifier ----

  test("nbCounts/trainNb: hand-checked add-one model over a two-label sample") {
    val labeled = Seq(("x", "a b a"), ("y", "c c")).toDF("lang", "text")
    val counts = ops.NaiveBayes.nbCounts(labeled, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(counts == Map(
      ("x", "a") -> ((2L, 3L)), ("x", "b") -> ((1L, 3L)), ("y", "c") -> ((2L, 2L))))
    val model = ops.NaiveBayes.trainNb(labeled, "text", "lang").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2)) ->
        r.getLong(3)).toMap
    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    // V = |{a, b, c}| = 3 ; feat p = (cnt+1)/(tot+V)
    assert(model(("x", Some("a"), "feat")) == q(3.0 / 6))
    assert(model(("x", Some("b"), "feat")) == q(2.0 / 6))
    assert(model(("y", Some("c"), "feat")) == q(3.0 / 5))
    // per-label unseen mass 1/(tot+V); priors 1/2 each
    assert(model(("x", None, "unseen")) == q(1.0 / 6))
    assert(model(("y", None, "unseen")) == q(1.0 / 5))
    assert(model(("x", None, "prior")) == q(1.0 / 2))
    assert(model(("y", None, "prior")) == q(1.0 / 2))
  }

  test("nbScores decomposition is exact; nbClassify breaks exact ties label-ascending") {
    // mirrored sample: equal totals, equal priors, equal unseen masses
    val labeled = Seq(("x", "a a"), ("y", "b b")).toDF("lang", "text")
    val model = ops.NaiveBayes.trainNb(labeled, "text", "lang")
    def q(p: Double) = math.floor(math.log(p) * 1e6).toLong
    val docs = Seq((1L, "a"), (2L, "b b"), (3L, "z")).toDF("doc_id", "text")
    val scores = ops.NaiveBayes.nbScores(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    // V = 2; doc 1 under x: prior + seen(a|x) = q(1/2) + q(3/4)
    assert(scores((1L, "x")) == q(1.0 / 2) + q(3.0 / 4))
    //        under y: prior + unseen = q(1/2) + q(1/4)
    assert(scores((1L, "y")) == q(1.0 / 2) + q(1.0 / 4))
    val preds = ops.NaiveBayes.nbClassify(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(preds(1L)._1 == "x")
    assert(preds(2L)._1 == "y")
    // doc 3: 'z' unseen for both, symmetric model → exact tie → 'x'
    assert(scores((3L, "x")) == scores((3L, "y")))
    assert(preds(3L)._1 == "x")
    assert(preds(1L)._2 == scores((1L, "x")))
  }

  test("nbClassify separates planted vocabularies with held-out accuracy 1.0; null text absent") {
    val sport = Seq("ball game team win score", "team game ball score match",
      "win match team ball play", "score play game win ball")
    val code = Seq("function variable compile bug loop", "loop bug function stack trace",
      "compile stack variable loop bug", "trace function bug compile stack")
    val labeled = (sport.map("sport" -> _) ++ code.map("code" -> _))
      .toDF("lang", "text")
    val model = ops.NaiveBayes.trainNb(labeled, "text", "lang")
    val held = Seq(
      (1L, "ball team win"), (2L, "game score play match"),
      (3L, "bug loop compile"), (4L, "stack trace variable function"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val preds = ops.NaiveBayes.nbClassify(held, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "sport", 2L -> "sport", 3L -> "code", 4L -> "code"),
      s"held-out predictions wrong or null-text doc not dropped: $preds")
  }

  // ---- BM25 lexical retrieval ----

  test("Bm25: hand-checked postings, dictionary, and scores against a plain-Scala reference") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c c c")).toDF("doc_id", "text")
    val post = ops.Bm25.postings(docs, "doc_id", "text")
    val p = post.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(p == Map(
      (1L, "a") -> ((2L, 3L)), (1L, "b") -> ((1L, 3L)),
      (2L, "a") -> ((1L, 2L)), (2L, "c") -> ((1L, 2L)),
      (3L, "c") -> ((4L, 4L))))
    val dict = ops.Bm25.dictionary(post, "doc_id")
    val d = dict.collect().map(r =>
      Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    def idfQ(n: Long, df: Long) =
      math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6).toLong
    // N = 3 docs, Σdl = 9; df: a=2, b=1, c=2
    assert(d(None) == ((3L, 9L)))
    assert(d(Some("a")) == ((2L, idfQ(3, 2))))
    assert(d(Some("b")) == ((1L, idfQ(3, 1))))
    assert(d(Some("c")) == ((2L, idfQ(3, 2))))
    // plain-Scala score reference with the same double arithmetic
    val avgdl = 9.0 / 3
    def s(idf: Long, tf: Long, dl: Long) = math.floor(
      idf.toDouble * (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * dl.toDouble / avgdl))).toLong
    val top = ops.Bm25.bm25TopK(post, dict, "doc_id", Seq("a", "c"), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ia = idfQ(3, 2)
    assert(top(1L) == ((1L, s(ia, 2, 3))))
    assert(top(2L) == ((2L, s(ia, 1, 2) + s(ia, 1, 2))))
    assert(top(3L) == ((1L, s(ia, 4, 4))))
  }

  test("Bm25 ranking: higher tf wins at equal length; longer doc is penalized at equal tf") {
    val docs = Seq(
      (1L, "q q filler filler"), (2L, "q filler filler filler"),
      (3L, "q x1 x2 x3"), (4L, "q y1 y2 y3 y4 y5 y6 y7")).toDF("doc_id", "text")
    val post = ops.Bm25.postings(docs, "doc_id", "text")
    val dict = ops.Bm25.dictionary(post, "doc_id")
    val ranked = ops.Bm25.bm25TopK(post, dict, "doc_id", Seq("q"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ranked(1L) > ranked(2L), "tf 2 must outscore tf 1 at dl 4")
    assert(ranked(3L) > ranked(4L), "dl 4 must outscore dl 8 at tf 1")
    // duplicate query terms count once; unknown terms contribute nothing
    val dup = ops.Bm25.bm25TopK(post, dict, "doc_id", Seq("q", "q", "zzz"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dup == ranked)
  }

  test("rrfFuse: exact integer arithmetic, both-lists beats one-list, tie to smaller doc, k cut") {
    def c(r: Int) = 1000000000L / (60 + r)
    // doc 10 in both lists (ranks 1, 3); 11/12 in one each at rank 1;
    // 13/14 tie (same single-list rank 2) → smaller doc first
    val la = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 13L, 3))
      .toDF("q", "doc", "rn")
    val lb = Seq((1L, 10L, 3), (1L, 12L, 1), (1L, 14L, 3))
      .toDF("q", "doc", "rn")
    val got = ops.Bm25.rrfFuse(Seq(la, lb), "q", "doc", "rn", k = 4)
      .orderBy($"rn").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (10L, c(1) + c(3), 2L, 1), // both lists dominate
      (12L, c(1), 1L, 2),        // then singles by their own rank
      (11L, c(2), 1L, 3),
      (13L, c(3), 1L, 4)),       // tie with 14 → smaller doc wins
      s"got: ${got.toSeq}")
    assert(got.head._2 == 16393442L + 15873015L,
      "fused score must be the exact integer floor sum")
    // k cut dropped doc 14 (tied with 13, larger id loses the tie first,
    // then the cut removes it)
    assert(!got.map(_._1).contains(14L))
  }

  test("rrfFuse hybrid: BM25 + brute-force-cosine lists fuse over the real corpus") {
    import org.apache.spark.sql.expressions.Window
    val docs = documents.where($"doc_id" < 200 && $"text".isNotNull)
      .select($"doc_id", $"text")
    val k = 10
    // lexical list: BM25 top-k for the query, ranked 1..k
    val post = ops.Bm25.postings(docs, "doc_id", "text")
    val dict = ops.Bm25.dictionary(post, "doc_id")
    val terms = Seq("the", "data", "of")
    val lex = ops.Bm25.bm25TopK(post, dict, "doc_id", terms, k)
      .withColumn("rn", row_number().over(
        Window.orderBy($"score_q".desc, $"doc_id".asc)))
      .withColumn("q", lit(0L)).select($"q", $"doc_id", $"rn")
    // vector list: brute-force cosine top-k over hashing-trick embeddings,
    // probe = doc 0's own vector (rn from bruteForceTopK is the rank)
    val emb = ops.Embed.hashEmbed(docs, "text", dims = 64)
      .select($"doc_id", $"vec".cast("array<double>").as("vec"))
    val vec = ops.Similarity.bruteForceTopK(emb,
        emb.where($"doc_id" === 0), "doc_id", "vec", k)
      .select(lit(0L).as("q"), $"cand_id".as("doc_id"), $"rn")
    val fused = ops.Bm25.rrfFuse(Seq(lex, vec), "q", "doc_id", "rn", k)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val lexRanks = lex.collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val vecRanks = vec.collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(fused.length == k)
    fused.foreach { case (doc, score, hit) =>
      val expect = lexRanks.get(doc).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        vecRanks.get(doc).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      assert(score == expect && hit == (lexRanks.contains(doc).compare(false) +
        vecRanks.contains(doc).compare(false)).toLong,
        s"doc $doc: fused $score != $expect from ranks " +
          s"${lexRanks.get(doc)}/${vecRanks.get(doc)}")
    }
    // every fused doc came from one of the lists, and any doc on BOTH
    // lists outranks every doc its component ranks dominate
    assert(fused.map(_._1).toSet.subsetOf(lexRanks.keySet ++ vecRanks.keySet))
  }

  test("prototypePrune matches an independent plain-Scala implementation of the full spec") {
    // integer vectors, two loose blobs + a stray, ids 0..29
    val vecs: Map[Long, Seq[Long]] = (0L until 30L).map { i =>
      val base = if (i % 3 == 0) Seq(1000L, 10L * i, 0L, 0L)
      else if (i % 3 == 1) Seq(0L, 1000L, 10L * i, 0L)
      else Seq(7L * i, 0L, 0L, 1000L)
      i -> base
    }.toMap
    val df = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "qv")
      .repartition(5)
    val dropBp = 3000
    val got = ops.Similarity.prototypePrune(df, "vec_id", "qv",
        nCentroids = 3, dropBp = dropBp)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    // independent replay: md5-ordered seeds, L2 argmin (tie: lower cid),
    // cosine to own centroid, per-cell (proto desc, id) rank, integer cut
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = vecs.keys.toSeq.sortBy(i => md5hex(i.toString)).take(3)
      .map(vecs(_).map(_.toDouble))
    def sqd(a: Seq[Long], c: Seq[Double]) =
      a.zip(c).map { case (x, y) => (y - x) * (y - x) }.sum
    def cos(a: Seq[Long], c: Seq[Double]) = {
      val d = a.zip(c).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nc = math.sqrt(c.map(y => y * y).sum)
      d / (na * nc)
    }
    val assigned = vecs.toSeq.map { case (i, v) =>
      val cell = seeds.indices.minBy(c => (sqd(v, seeds(c)), c))
      (i, cell, cos(v, seeds(cell)))
    }
    val want = assigned.groupBy(_._2).flatMap { case (cell, rows) =>
      val sorted = rows.sortBy { case (i, _, p) => (-p, i) }
      val cut = rows.size * dropBp / 10000
      sorted.drop(cut).map { case (i, _, _) => (i, cell) }
    }.toSet
    assert(got == want, s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}")

    // boundary budgets: 0 bp keeps everything, 10000 bp drops everything
    assert(ops.Similarity.prototypePrune(df, "vec_id", "qv", 3, 0)
      .count() == 30)
    assert(ops.Similarity.prototypePrune(df, "vec_id", "qv", 3, 10000)
      .count() == 0)

    // partition-count invariance: the decision is a pure function of data
    val got1 = ops.Similarity.prototypePrune(df.repartition(1), "vec_id",
        "qv", 3, dropBp)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got1 == got)
  }

  test("prototypePrune: zero-norm vectors score the -2.0 sentinel, rank last, and never NaN-poison the cut") {
    // md5 order of "0".."3" seeds the single centroid from vec 1 (non-zero);
    // vec 0 is all-zero — unguarded, 0/0 = NaN sorts FIRST under Spark's
    // desc ordering and the row would be silently always-pruned
    val df = Seq(
      (0L, Seq(0L, 0L, 0L, 0L)),
      (1L, Seq(1000L, 0L, 0L, 0L)),
      (2L, Seq(990L, 10L, 0L, 0L)),
      (3L, Seq(900L, 100L, 0L, 0L))
    ).toDF("vec_id", "qv")
    val kept = ops.Similarity.prototypePrune(df, "vec_id", "qv",
        nCentroids = 1, dropBp = 5000)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // cut = 4*5000/10000 = 2: the two MOST prototypical (vecs 1, 2) drop;
    // the zero vector survives with the sentinel score
    assert(kept.keySet == Set(0L, 3L), s"kept=$kept")
    assert(kept(0L) == -2.0)
    assert(!kept.values.exists(_.isNaN))
  }
}
