package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-cleaning scale evidence (BENCH/BASELINE.md "cleaning at scale"):
  * the three shapes that decide whether the cleaning stages survive a
  * web-crawl corpus —
  *
  *  1. repeated-line pruning with a SITE-WIDE boilerplate line: the hot
  *     line appears in 30% of all documents. The partial-agg count
  *     collapses it to one row map-side and the anti-join broadcasts the
  *     hot set, so cost stays linear in corpus size (no straggler task
  *     owning millions of identical join keys);
  *  2. benchmark decontamination of the full corpus against a benchmark
  *     set: the benchmark shingle set broadcasts, the corpus is one
  *     narrow map-side pass + a partial-agg hit count;
  *  3. mixture sampling + shard packing: pure map-side filter plus one
  *     window per source stratum.
  *
  * Usage: graft.CleanBench [nDocs] [benchDocs]
  */
object CleanBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000000)
    val benchDocs = args.lift(1).map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val boiler = ops.Cleaning.BoilerLine
    // ~14-22-word docs; 30% carry the boilerplate line first, all share a
    // static 6-word tail line (a SECOND site-wide hot line), 0.1% carry
    // the benchmark probe 5-gram
    val docs = spark.range(nDocs).select($"id".as("doc_id"),
      concat(
        when($"id" % 10 < 3, lit(s"$boiler ")).otherwise(lit("")),
        lit("alpha "), $"id", lit(" beta "), $"id",
        lit(" gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        when($"id" % 1000 === 0, lit(" bq1 bq2 bq3 bq4 bq5")).otherwise(lit("")))
        .as("text"),
      concat(lit("src"), ($"id" % 8).cast("string")).as("source"))
      .cache()
    docs.count() // materialize outside timed regions

    // one warmup (JIT/codegen) + median of 3 — the sandbox host steals
    // CPU in episodes, single shots mislead (BENCH/BASELINE.md method)
    def timed[A](f: => A): (A, Double) = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    // 1. hot-line pruning: ~0.3·nDocs copies of one line through the
    //    count agg + broadcast anti-join
    val (prunedKept, tPrune) = timed {
      ops.Cleaning.pruneRepeatedLines(docs, "doc_id", "text", 8, 5)
        .agg(sum($"n_kept")).head().getLong(0)
    }

    // 2. decontamination: benchmark = `benchDocs` synthetic eval docs; the
    //    shared [bq1..bq5] shingle marks 0.1% of the corpus contaminated
    val bench = spark.range(benchDocs).select(
      concat(lit("bq1 bq2 bq3 bq4 bq5 extra "), $"id").as("text"))
    val (contaminated, tDecon) = timed {
      ops.Cleaning.decontaminate(docs, bench, "doc_id", "text", 5)
        .where($"keep" === 0).count()
    }

    // 3. mixture + packing over the full corpus
    val (shards, tMix) = timed {
      val mixed = ops.Sampling.mixtureSample(docs, "doc_id", "source",
        Map("src0" -> 2500, "src1" -> 5000), 10000)
      ops.Sampling.packShards(mixed, "doc_id", "source",
          size(split($"text", " ")).cast("bigint"), budget = 4096)
        .agg(countDistinct($"source", $"shard")).head().getLong(0)
    }

    // 4. exact substring scrub (Lee et al., k=12): 20% of docs embed one
    //    of 200 shared 16-word boilerplate runs (each run recurs in
    //    nDocs/1000 documents — a HOT duplicated substring whose gram
    //    hashes collapse in the partial agg), every doc keeps a unique
    //    12-word body. Correct outcome: each run survives only in its
    //    globally-first doc — removed mass ≈ 16 · (0.2·nDocs − 200).
    // run index = (id/5) % 200: only ids divisible by 5 embed a run, so
    // keying on id % 200 would visit just the 40 multiples of 5 — (id/5)
    // walks all 200 run identities at the documented n/1000 recurrence
    val runTail = concat_ws(" ",
      (0 until 16).map(j => concat(lit("r"), (($"id" / 5) % 200).cast("long"), lit(s"w$j"))): _*)
    val body = concat_ws(" ",
      (0 until 12).map(j => concat(lit("u"), $"id", lit(s"b$j"))): _*)
    val sdocs = spark.range(nDocs).select($"id".as("doc_id"),
        when($"id" % 5 === 0, concat(body, lit(" "), runTail))
          .otherwise(body).as("text"))
      .cache()
    sdocs.count()
    val (removedTokens, tSubstr) = timed {
      ops.Dedup.exactSubstringDedup(sdocs, "doc_id", "text", k = 12)
        .agg(sum($"n_removed".cast("bigint"))).head().getLong(0)
    }

    // 5. CCNet LM gate: train the bigram model on a 1% hash-sample
    //    (unique id-words make most sampled bigrams singletons — a
    //    realistically heavy model, broadcast), then score the FULL
    //    corpus through the seen/unseen-word/unseen-prev join cascade
    val (scoreSum, tLm) = timed {
      val model = ops.Lm.trainBigramLm(
        docs.where(ops.Sampling.hashBp($"doc_id".cast("string")) < 100), "text")
      ops.Lm.lmScore(docs, "doc_id", "text", model)
        .agg(sum($"score_q")).head().getLong(0)
    }

    // 6. Stupid Backoff trigram gate over the same corpus/sample split —
    //    the 3-join cascade's cost relative to the bigram gate's 2-join
    //    one (position explode is identical; the extra width is the
    //    per-position context strings and one more broadcast probe)
    val (sbSum, tSb) = timed {
      val model = ops.Lm.trainStupidBackoff(
        docs.where(ops.Sampling.hashBp($"doc_id".cast("string")) < 100),
        "text", n = 3)
      ops.Lm.stupidBackoffScore(docs, "doc_id", "text", model, n = 3)
        .agg(sum($"score_q")).head().getLong(0)
    }

    // 7. C4 line + page rules over a multi-line corpus: every doc carries
    //    a 3-sentence keeper line, a short dropped line, 30% a javascript
    //    line (dropped) and 10% a brace line (drops the PAGE). Pure
    //    map-side — the cost is the line/word splitting itself.
    val cdocs = spark.range(nDocs).select($"id".as("doc_id"),
        concat(
          lit("alpha "), $"id", lit(" beta one. gamma delta two! epsilon zeta three?"),
          lit("\nshort line"),
          when($"id" % 10 < 3, lit("\nplease enable javascript now thanks."))
            .otherwise(lit("")),
          when($"id" % 10 === 4, lit("\nif (x) { return y; }"))
            .otherwise(lit(""))).as("text"))
      .cache()
    cdocs.count()
    val (c4Kept, tC4) = timed {
      cdocs.where(ops.Cleaning.c4Gate($"text"))
        .select(ops.Cleaning.c4CleanLines($"text").as("c"))
        .agg(count(lit(1))).head().getLong(0)
    }

    // 8. Naive Bayes: train on a 1% hash-sample labeled by source (8
    //    labels), classify the FULL corpus — the broadcast feature join +
    //    label fan-out + per-(doc,label) combine at corpus width
    val (nbPreds, tNb) = timed {
      val model = ops.NaiveBayes.trainNb(
        docs.where(ops.Sampling.hashBp($"doc_id".cast("string")) < 100),
        "text", "source")
      ops.NaiveBayes.nbClassify(docs, "doc_id", "text", model)
        .agg(count(lit(1))).head().getLong(0)
    }

    // 9. DSIR: target LM on a 1% natural sample, raw LM on the same sample
    //    reversed, importance weights over the FULL corpus (two scoring
    //    cascades), Gumbel-top-k select 10k — TakeOrdered, no global sort
    val (dsirSel, tDsir) = timed {
      val sample = docs.where(ops.Sampling.hashBp($"doc_id".cast("string")) < 100)
      val target = ops.Lm.trainBigramLm(sample, "text")
      val raw = ops.Lm.trainBigramLm(
        sample.select(array_join(reverse(split($"text", " ")), " ").as("text")), "text")
      val w = ops.Sampling.importanceWeights(docs, "doc_id", "text", target, raw)
      ops.Sampling.dsirSample(w, "doc_id", k = 10000)
        .agg(count(lit(1))).head().getLong(0)
    }

    // 10. normalized dedup at width: every odd doc is an UPPERCASED
    //     "!!"-suffixed mirror of the even doc below it — the whole
    //     normalization chain (lower/translate/regex×3) runs map-side
    //     inside the partial agg and exactly half the corpus survives
    val ndocs = spark.range(nDocs).select($"id".as("doc_id"),
        when($"id" % 2 === 0,
          concat(lit("alpha "), ($"id" / 2).cast("long"), lit(" beta gamma delta")))
        .otherwise(
          concat(lit("ALPHA "), ($"id" / 2).cast("long"), lit(" BETA GAMMA DELTA !!")))
        .as("text"))
      .cache()
    ndocs.count()
    val (normKept, tNorm) = timed {
      ops.Dedup.normalizedDedup(ndocs, "doc_id", "text").count()
    }

    // 11. DOMAIN-scoped line pruning over the same corpus as stage 1
    //     (source = 8 domains): the boilerplate line is hot WITHIN every
    //     domain (~0.3·n/8 docs each ≫ 5), so the outcome matches the
    //     global rule here — the measured delta is the per-domain key
    //     (domain, lh) shuffle replacing the broadcast hot set
    val (domKept, tDom) = timed {
      ops.Cleaning.pruneRepeatedLinesByDomain(
          docs.withColumnRenamed("source", "domain"),
          "doc_id", "domain", "text", 8, 5)
        .agg(sum($"n_kept")).head().getLong(0)
    }

    // 12. semantic decontamination at width: 16-dim xxhash64-derived
    //     integer vectors (signed, so random cosines center on 0), bench
    //     = 1000 exact copies sampled every n/1000 ids — each must hit
    //     its corpus twin (and the twin itself) through the 256-cell /
    //     2-probe search; at 256 > CodebookLiteralMax centroids the
    //     corpus-side assign is the broadcast-codebook path (one per-id
    //     hash-agg exchange — the 36 s plan, vs 159 s for the window
    //     form it replaced), then the cell match is a broadcast join
    val dim = 16
    val vec = array((0 until dim).map(j =>
      xxhash64($"doc_id", lit(j)) % 1000): _*)
    val edocs = spark.range(nDocs).select($"id".as("doc_id"))
      .withColumn("v", vec).cache()
    edocs.count()
    val ebench = edocs.where($"doc_id" % (nDocs / 1000) === 0)
      .select(($"doc_id" + 1000000000L).as("doc_id"), $"v").cache()
    ebench.count()
    val (semContam, tSem) = timed {
      ops.Cleaning.semanticDecontaminate(edocs, ebench, "doc_id", "v",
          threshold = 0.999, nCentroids = 256, nProbe = 2)
        .where($"keep" === 0).count()
    }

    // 13. INTRA-doc line dedup over the same multi-line corpus as stage 7:
    //     pure per-row array algebra (split once via bindOnce, O(L²)
    //     first-occurrence filter in the small per-page line count) —
    //     must scale like the map-side C4 stage, no shuffle at all
    val (docLineKept, tDocLine) = timed {
      cdocs.select(ops.Cleaning.dedupLinesWithinDoc($"text").as("c"))
        .agg(sum(size(split($"c", "\n")))).head().getLong(0)
    }

    // 14. binary near-dup at width (nDocs/4 payloads, 1% planted
    //     truncated twins): byte-shingle MinHash is 8 salted mins over
    //     ~61 shingles per 64-byte payload — the signature map is the
    //     new cost; banding/verify reuse the text machinery benched in
    //     DedupBench. Expected pairs ≥ planted twins.
    val bdocs = docs.where($"doc_id" < nDocs / 4)
      .select($"doc_id", encode(substring($"text", 1, 64), "utf-8").as("payload"))
    val btwins = bdocs.where($"doc_id" % 100 === 0)
      .select(($"doc_id" + nDocs.toLong).as("doc_id"),
        encode(substring(decode($"payload", "utf-8"), 1, 56), "utf-8").as("payload"))
    val bcorpus = bdocs.union(btwins).cache()
    bcorpus.count()
    val (binPairs, tBin) = timed {
      ops.Media.binaryNearDupPairs(bcorpus, "doc_id", "payload",
        n = 4, k = 8, bands = 4, threshold = 0.5).count()
    }

    println(f"""{"metric":"cleaning_scale","n_docs":$nDocs,"bench_docs":$benchDocs,""" +
      f""""prune_kept_lines":$prunedKept,"prune_sec":$tPrune%.2f,""" +
      f""""contaminated":$contaminated,"decon_sec":$tDecon%.2f,""" +
      f""""shards":$shards,"mix_pack_sec":$tMix%.2f,""" +
      f""""substr_removed_tokens":$removedTokens,"substr_sec":$tSubstr%.2f,""" +
      f""""lm_score_sum":$scoreSum,"lm_sec":$tLm%.2f,""" +
      f""""sb_score_sum":$sbSum,"sb_sec":$tSb%.2f,""" +
      f""""c4_kept":$c4Kept,"c4_sec":$tC4%.2f,""" +
      f""""nb_preds":$nbPreds,"nb_sec":$tNb%.2f,""" +
      f""""dsir_selected":$dsirSel,"dsir_sec":$tDsir%.2f,""" +
      f""""norm_kept":$normKept,"norm_sec":$tNorm%.2f,""" +
      f""""dom_kept_lines":$domKept,"dom_sec":$tDom%.2f,""" +
      f""""sem_contaminated":$semContam,"sem_sec":$tSem%.2f,""" +
      f""""docline_kept":$docLineKept,"docline_sec":$tDocLine%.2f,""" +
      f""""bin_pairs":$binPairs,"bin_sec":$tBin%.2f}""")
    spark.stop()
  }
}
