package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The daily-increment corpus pipeline (IncrementalCorpus): base build →
  * bootstrap → increments admitted through the persisted index with the
  * batch pipeline's own gates → frozen-tokenizer packing, with the
  * packer consuming the corpus table incrementally (readAppended +
  * consumed-snapshot watermark) so every hop is exactly-once. */
class IncrementalPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("doc_id").cast("string")).as[String].collect().toSet

  test("ordering guard: an increment before bootstrap refuses loudly") {
    val out = Files.createTempDirectory("graft_incguard_").toString
    val delta = DocGen.generate(spark, 10, 2).as[RawDoc]
    // admitting first would mute the future seed batch (stream watermark
    // passes batch 0) — must refuse, not silently create the table
    val ex = intercept[IllegalArgumentException] {
      IncrementalCorpus.admitIncrement(spark, delta, out, 1L)
    }
    assert(ex.getMessage.contains("bootstrap first"))
    assert(new Manifest(IncrementalCorpus.corpusTableDir(out),
      spark.sessionState.newHadoopConf()).head().isEmpty)
  }

  test("increments: batch-identical gates, indexed admission, frozen-tokenizer pack, exactly-once consumption") {
    val out = Files.createTempDirectory("graft_incpipe_").toString
    CorpusMain.run(spark, 2000, out, 4)
    IncrementalCorpus.bootstrap(spark, out, corpusBuckets = 4)
    val ctbl = IncrementalCorpus.corpusTableDir(out)
    def corpus() = streaming.EventStream.readCorpus(spark, ctbl, 4)

    // window 1: the bootstrapped base corpus packs once, then caught-up
    val n0 = IncrementalCorpus.packIncrements(spark, out)
    assert(n0 == corpus().count() && n0 > 0)
    assert(IncrementalCorpus.packIncrements(spark, out) == 0L)

    // increment 1: fresh docs + re-crawls (base content under new ids,
    // exact dups of whatever of it survived the base funnel)
    val fresh = DocGen.generate(spark, 2100, 4)
      .where($"doc_id" >= "d0000002000").as[RawDoc]
    val recrawl = DocGen.generate(spark, 50, 4).as[RawDoc]
      .map(d => d.copy(doc_id = "r" + d.doc_id))
    val delta = fresh.union(recrawl)
    val before = corpus().select($"doc_id", $"text").localCheckpoint()
    IncrementalCorpus.admitIncrement(spark, delta, out, 1L)

    // the increment's admissions are EXACTLY what the batch operators
    // say: CorpusPrep gates (shared definition) then incremental dedup
    // against the pre-increment corpus
    val holdout = CorpusMain.readStage(spark, out, "eval_holdout")
    val cleanedDelta = CorpusPrep.langGateEn(CorpusPrep.cleanGate(
        CorpusPrep.textsOf(plans.GraftFunctions.extractColumnar(delta.toDF())
          .select($"doc_id", $"domain", $"spans"))))
      .select($"doc_id", $"text")
    val deconDelta = cleanedDelta.join(
      ops.Cleaning.decontaminate(cleanedDelta, holdout, "doc_id", "text",
          IncrementalCorpus.HoldoutDeconK)
        .where($"keep" === 1).select($"doc_id"), "doc_id")
    val expAdm = ids(ops.Dedup.incrementalDedup(
      deconDelta, before, "doc_id", "text"))
    assert(ids(corpus()) -- ids(before) == expAdm)
    assert(expAdm.nonEmpty, "some fresh docs must survive the gates")
    // re-crawls of content PRESENT in the corpus drop; re-crawls of base
    // docs the base funnel itself discarded are legitimately fresh. So:
    // (a) at least one re-crawl was dropped, (b) no admitted doc's text
    // already existed in the corpus
    val gatedRecrawls = ids(cleanedDelta).count(_.startsWith("r"))
    assert(gatedRecrawls > expAdm.count(_.startsWith("r")),
      "at least one re-crawl of surviving base content must be dropped")
    val beforeTexts = before.select(md5($"text")).as[String].collect().toSet
    val admTexts = corpus().where($"doc_id".isin(expAdm.toSeq: _*))
      .select(md5($"text")).as[String].collect().toSet
    assert((admTexts & beforeTexts).isEmpty,
      "no admitted text may already exist in the corpus")
    // the gate actually engaged: not every delta doc reached admission
    assert(cleanedDelta.count() < delta.count())

    // window 2: exactly the admitted increment packs, keyed by window
    val n1 = IncrementalCorpus.packIncrements(spark, out)
    assert(n1 == expAdm.size.toLong)
    val shards = IncrementalCorpus.readTrain(spark, out,
      IncrementalCorpus.ShardsBucket).localCheckpoint()
    assert(shards.count() == n0 + n1)
    val w2 = shards.agg(max($"pack_window")).head().getInt(0)
    assert(ids(shards.where($"pack_window" === w2)) == expAdm)

    // funnel invariant per window: the sequences' non-boundary token
    // count equals the packer's accounting (frozen tokenizer on BOTH
    // sides), and doc_ids align 1:1 with toks
    val seqs = IncrementalCorpus.readTrain(spark, out,
      IncrementalCorpus.SequencesBucket).localCheckpoint()
    assert(seqs.where($"pack_window" === w2)
        .agg(sum(size(filter($"toks", t => t =!= lit(ops.Bpe.Boundary)))))
        .head().getLong(0) ==
      shards.where($"pack_window" === w2)
        .agg(sum($"tokens")).head().getLong(0))
    assert(seqs.where(size($"doc_ids") =!= $"n_toks").count() == 0)
    // OOV drift audit rides along per window
    assert(IncrementalCorpus.readTrain(spark, out, IncrementalCorpus.OovBucket)
      .where($"pack_window" === w2).count() > 0)

    // re-delivered admission batch no-ops end to end
    IncrementalCorpus.admitIncrement(spark, delta, out, 1L)
    assert(ids(corpus()) -- ids(before) == expAdm)
    assert(IncrementalCorpus.packIncrements(spark, out) == 0L)

    // crash window between corpus commit and pack: increment 2 admitted,
    // "crash", restart packs exactly that window. The increment also
    // carries PLANTED HOLDOUT LEAKS — re-crawls of eval-holdout docs
    // under new ids. The holdout is deliberately absent from the corpus,
    // so the dedup index sees them as FRESH; only the decontamination
    // gate stands between them and the training set
    val holdoutIds = holdout.select($"doc_id".cast("string"))
      .as[String].collect().toSet
    assert(holdoutIds.nonEmpty)
    val leaks = DocGen.generate(spark, 2000, 4).as[RawDoc]
      .filter(d => holdoutIds.contains(d.doc_id))
      .map(d => d.copy(doc_id = "h" + d.doc_id))
    val delta2 = DocGen.generate(spark, 2200, 4)
      .where($"doc_id" >= "d0000002100").as[RawDoc].union(leaks)
    val before2 = ids(corpus())
    IncrementalCorpus.admitIncrement(spark, delta2, out, 2L)
    val adm2 = ids(corpus()) -- before2
    assert(adm2.nonEmpty)
    assert(!adm2.exists(_.startsWith("h")),
      "a re-crawled holdout doc must never reach the training corpus")
    // non-vacuity: the leaks PASS the ordinary quality gates (they are
    // re-crawls of docs the base funnel kept) — only the decon gate
    // stopped them
    val cleaned2 = CorpusPrep.langGateEn(CorpusPrep.cleanGate(
      CorpusPrep.textsOf(plans.GraftFunctions.extractColumnar(delta2.toDF())
        .select($"doc_id", $"domain", $"spans"))))
    assert(ids(cleaned2).exists(_.startsWith("h")),
      "planted leaks must survive the quality gates to test the decon gate")
    val n2 = IncrementalCorpus.packIncrements(spark, out)
    assert(n2 == adm2.size.toLong)
    val shards2 = IncrementalCorpus.readTrain(spark, out,
      IncrementalCorpus.ShardsBucket)
    val w3 = shards2.agg(max($"pack_window")).head().getInt(0)
    assert(w3 > w2 && ids(shards2.where($"pack_window" === w3)) == adm2)

    // a training loader consumes the train table incrementally too:
    // the window since the pre-increment-2 snapshot is exactly window 3
    val tm = new Manifest(IncrementalCorpus.trainTableDir(out),
      spark.sessionState.newHadoopConf())
    val seqTail = tm.readAppended(spark,
        fromId = tm.head().get.id - 1,
        buckets = Some(Set(IncrementalCorpus.SequencesBucket)))
    assert(seqTail.select($"pack_window").distinct()
      .as[Int].collect().toSeq == Seq(w3))
  }
}
