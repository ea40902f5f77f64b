package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-cleaning ops (ops.Cleaning): Gopher repetition stats, PII
  * redaction, benchmark decontamination, cross-doc repeated-line pruning. */
class CleaningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def textDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- repetition stats ----

  test("topWordFracQ4: all-same-word doc scores 10000, distinct words score evenly") {
    val df = textDf(1L -> "a a a a", 2L -> "a b c d")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.topWordFracQ4($"w").as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == 10000)
    assert(m(2L) == 2500)
  }

  test("topWordFracQ4Capped: statistic computed over exactly the first maxWords words") {
    // 4 words: "a a b c" — uncapped mode frac = 2/4; capped at 2 words the
    // prefix is "a a" → 2/2; capped at the boundary (4) equals uncapped;
    // capped beyond the length (10) also equals uncapped
    val df = Seq((1L, "a a b c")).toDF("doc_id", "text")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select(
        ops.Cleaning.topWordFracQ4($"w").as("full"),
        ops.Cleaning.topWordFracQ4Capped($"w", 2).as("cap2"),
        ops.Cleaning.topWordFracQ4Capped($"w", 4).as("cap4"),
        ops.Cleaning.topWordFracQ4Capped($"w", 10).as("cap10"))
    val r = df.head()
    assert(r.getAs[Int]("full") == 5000)
    assert(r.getAs[Int]("cap2") == 10000)
    assert(r.getAs[Int]("cap4") == 5000)
    assert(r.getAs[Int]("cap10") == 5000)
  }

  test("topBigramFracQ4: repeated bigram dominates; single-word doc scores 0") {
    val df = textDf(1L -> "a a a a", 2L -> "solo", 3L -> "a b c d e")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.topBigramFracQ4($"w").as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == 10000) // "a a" is all 3 bigrams
    assert(m(2L) == 0)     // no bigrams
    assert(m(3L) == 2500)  // 4 distinct bigrams, top count 1
  }

  test("dupLineFracQ4: doc of two identical 8-word lines scores 5000") {
    val line = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = textDf(1L -> s"$line $line", 2L -> line)
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.dupLineFracQ4($"w", 8).as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == 5000) // 2 lines, 1 duplicate
    assert(m(2L) == 0)
  }

  test("topNgramCharFracQ4: repeated trigram dominates in chars; longest wins ties; short doc scores 0") {
    // doc 1: "a b a b a b" n=2 — grams [a b, b a, a b, b a, a b]; best =
    //   ("a b", cnt 3, len 3); denom = len("a b a b a b") = 11 →
    //   floor(9/11·10000) = 8181
    // doc 2: "x x x x" n=2 — cnt 3 · len 3 = 9 > denom 7 → capped 10000
    // doc 3: "a b ccc" n=2 — all cnt 1, tie broken by LONGEST gram
    //   ("b ccc", len 5); denom 7 → floor(5/7·10000) = 7142
    // doc 4: one word, n=2 → 0
    val df = textDf(1L -> "a b a b a b", 2L -> "x x x x",
        3L -> "a b ccc", 4L -> "solo")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.topNgramCharFracQ4($"w", 2).as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == 8181)
    assert(m(2L) == 10000)
    assert(m(3L) == 7142)
    assert(m(4L) == 0)
  }

  test("dupNgramCharFracQ4: covered positions counted once; overlapping dups union; no dups / short doc score 0") {
    // doc 1: "a b c d e x a b c d e" n=5 — the 5-gram "a b c d e" occurs at
    //   starts 1 and 7; covered token positions = {1..5} ∪ {7..11} = 10 of
    //   11 one-char tokens → floor(10/11·10000) = 9090
    // doc 2: "a a a a a a" n=5 — starts 1,2 overlap; union covers all 6
    //   positions exactly once → 10000 (double-counting would exceed it)
    // doc 3: distinct words, no duplicated 5-gram → 0
    // doc 4: 3 words < n → 0
    val df = textDf(1L -> "a b c d e x a b c d e", 2L -> "a a a a a a",
        3L -> "p q r s t u v", 4L -> "a b c")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.dupNgramCharFracQ4($"w", 5).as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == 9090)
    assert(m(2L) == 10000)
    assert(m(3L) == 0)
    assert(m(4L) == 0)
  }

  // ---- Gopher quality rules (the non-repetition §A1.1 half) ----

  test("Gopher quality stats: exact values on crafted docs") {
    val df = textDf(
        // 4 words, lengths 3+5+2+6=16 → mean 4.00 → 400; no symbols/lines
        1L -> "the spark of stream",
        // 6 words (lengths 1+2+1+5+1+3=13 → 216); three '#' → 5000 bp;
        // two '...' → 3333; the single line ends '...' → 10000; two words
        // contain a letter → 3333
        2L -> "# ab # cd... # ...",
        // space-split keeps newlines inside words: 6 words, lengths
        // 1+4+5+4+9+7=30 → 500; one '...' → 1666; 3 lines, two bullets
        // ('- ', '* ') → 6666, one ends '...' → 3333; '-' has no letter
        // → 5/6 = 8333
        3L -> "- item one\n* item two\nplain tail...",
        // 4 words (3+3+2+3=11 → 275), 2 non-alpha → 5000; hits: the+of = 2
        4L -> "the 123 of 456")
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id",
        ops.Cleaning.meanWordLenQ2($"w").as("mwl"),
        ops.Cleaning.symbolWordFracQ4($"text", $"w", "#").as("hash"),
        ops.Cleaning.symbolWordFracQ4($"text", $"w", "...").as("ell"),
        ops.Cleaning.bulletLineFracQ4($"text").as("bul"),
        ops.Cleaning.ellipsisLineFracQ4($"text").as("ell_ln"),
        ops.Cleaning.alphaWordFracQ4($"w").as("alpha"),
        ops.Cleaning.stopwordHits($"w").as("stops"))
    val m = df.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(7))).toMap
    assert(m(1L) == ((400, 0, 0, 0, 0, 10000, 2)))    // the, of
    assert(m(2L) == ((216, 5000, 3333, 0, 10000, 3333, 0)))
    assert(m(3L) == ((500, 0, 1666, 6666, 3333, 8333, 0)))
    assert(m(4L) == ((275, 0, 0, 0, 0, 5000, 2)))
  }

  test("gopherQualityGate: each rule independently rejects; a clean doc passes") {
    val good = "the data table holds rows and that scan must have been fast with care"
    val df = textDf(
        1L -> good,                                        // passes all
        2L -> "the of and",                                // < minWords
        3L -> ("# " * 20 + good),                          // hash ratio
        4L -> (Seq.fill(12)("12345").mkString(" ") + " " + good), // alpha frac
        5L -> "a b c d e f g h i j k l m n o p")           // stopwords < 2, mean len < 3
      .select($"doc_id",
        ops.Cleaning.gopherQualityGate($"text",
          ops.Cleaning.wordsOf($"text"), minWords = 5).as("g"))
    val m = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
  }

  test("C4 line rules: terminal punctuation, 5-word floor, javascript drop; order preserved") {
    val df = textDf(
        // keeper (ends '.'), short line dropped, no-punct line dropped,
        // javascript line dropped despite punctuation, quote-ended keeper
        1L -> ("alpha beta gamma delta epsilon.\nshort one.\n" +
          "no terminal punctuation in this line\n" +
          "please enable JavaScript to continue reading.\n" +
          "she said it was \"perfectly fine today\""),
        2L -> "word")
      .select($"doc_id", ops.Cleaning.c4CleanLines($"text").as("c"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) ==
      "alpha beta gamma delta epsilon.\nshe said it was \"perfectly fine today\"")
    assert(m(2L) == "")
  }

  test("C4 page gate: sentence floor, lorem ipsum, curly brace each reject; clean page passes") {
    val good = "one two three four five. six seven eight nine ten! is it fine today?"
    val df = textDf(
        1L -> good,                                          // 3 sentences → pass
        2L -> "only one sentence lives here.",               // sentence floor
        3L -> (good + "\nfiller Lorem Ipsum dolor sit."),    // lorem (case-insensitive)
        4L -> (good + "\nif (x) { return y; }"))             // brace (page-level)
      .select($"doc_id", ops.Cleaning.c4Gate($"text").as("g"))
    val m = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("C4 sentenceCount counts terminal marks only in the filtered text") {
    val t = "good line one two three.\nbad marks!!!"
    val df = Seq((1L, t)).toDF("doc_id", "text")
      .select(
        ops.Cleaning.sentenceCount($"text").as("raw"),
        ops.Cleaning.sentenceCount(ops.Cleaning.c4CleanLines($"text")).as("kept"))
    val r = df.head()
    assert(r.getAs[Int]("raw") == 4)
    assert(r.getAs[Int]("kept") == 1)
  }

  test("chunkWindows: stride-with-overlap split, consecutive full chunks share the overlap") {
    val words = (1 to 20).map("w" + _)
    val df = textDf(1L -> words.mkString(" "))
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select(explode(ops.Cleaning.chunkWindows($"w", 8, 3)).as("c"))
      .select($"c.idx", $"c.chunk")
    val chunks = df.collect().map(r => r.getInt(0) -> r.getString(1).split(" ").toSeq).toMap
    // step = 5: starts 0, 5, 10, 15
    assert(chunks.keySet == Set(0, 1, 2, 3))
    assert(chunks(0) == words.slice(0, 8))
    assert(chunks(1) == words.slice(5, 13))
    assert(chunks(3) == words.slice(15, 20)) // final window short
    // full consecutive windows overlap by exactly 3 words
    assert(chunks(0).takeRight(3) == chunks(1).take(3))
  }

  test("chunkWindowsCol == chunkWindows on word arrays; works on DERIVED arrays; boundary cases") {
    val words = (1 to 20).map("w" + _)
    val base = textDf(1L -> words.mkString(" "))
      .withColumn("w", ops.Cleaning.wordsOf($"text"))
    def viaCol(max: Int, ov: Int) = base
      .select(explode(ops.Cleaning.chunkWindowsCol($"w", max, ov)).as("c"))
      .select($"c.idx", $"c.toks")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSeq).toMap
    // identical windows to the string-chunk form
    val viaStr = base
      .select(explode(ops.Cleaning.chunkWindows($"w", 8, 3)).as("c"))
      .collect().map(r => r.getStruct(0).getInt(0) ->
        r.getStruct(0).getString(1).split(" ").toSeq).toMap
    assert(viaCol(8, 3) == viaStr)
    // boundary: array shorter than the window → exactly one (short) chunk
    val short = textDf(1L -> "a b c")
      .select(explode(ops.Cleaning.chunkWindowsCol(
        ops.Cleaning.wordsOf($"text"), 8, 3)).as("c"))
      .collect()
    assert(short.length == 1 &&
      short.head.getStruct(0).getSeq[String](1) == Seq("a", "b", "c"))
    // boundary: exact multiple of the stride — final window not contained
    val exact = viaCol(5, 0)
    assert(exact.keySet == Set(0, 1, 2, 3) && exact(3) == words.slice(15, 20))
    // DERIVED array (the thing chunkWindows cannot take): BPE token chunks
    val bpe = textDf(1L -> "the cat and the hat and the rat and the bat sat")
      .select(explode(ops.Cleaning.chunkBpeWindows(
        $"text", ops.Bpe.DemoMerges, 6, 2)).as("c"))
      .select($"c.idx", $"c.toks")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSeq).toMap
    // reference: tokens via the column applier, windowed in plain Scala
    val toks = textDf(1L -> "the cat and the hat and the rat and the bat sat")
      .select(ops.Bpe.bpeTokens($"text", ops.Bpe.DemoMerges).as("t"))
      .collect().head.getSeq[String](0).toSeq
    val step = 4
    val nWin = math.max(0, (toks.length - 6 + step - 1) / step) + 1
    val ref = (0 until nWin).map(i => i -> toks.slice(i * step, i * step + 6)).toMap
    assert(bpe == ref, s"bpe chunks $bpe vs $ref")
    // chunk budget == packer budget: every full window counts exactly
    // maxTokens BPE tokens (the unit bpeTokenCount packs in)
    bpe.toSeq.sortBy(_._1).init.foreach { case (_, c) => assert(c.length == 6) }
  }

  // ---- PII redaction ----

  test("redactPii scrubs email, ipv4, and long digit runs in order") {
    val df = textDf(1L -> "mail bob.smith+x@corp.example.org or 192.168.0.1 card 4111222233334444 ok")
      .select(ops.Cleaning.redactPii($"text").as("r"),
        ops.Cleaning.piiCount($"text", ops.Cleaning.EmailRe).as("ne"),
        ops.Cleaning.piiCount($"text", ops.Cleaning.Ipv4Re).as("ni"),
        ops.Cleaning.piiCount($"text", ops.Cleaning.LongNumRe).as("nn"))
    val r = df.collect().head
    assert(r.getString(0) == "mail <EMAIL> or <IP> card <NUM> ok")
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 1)))
  }

  test("redactPii leaves short digit runs and plain text alone") {
    val df = textDf(1L -> "order 12345678901 of 7 items at 3.14 rate")
      .select(ops.Cleaning.redactPii($"text").as("r"))
    // 11 digits < 12 → kept; "3.14" is not a dotted quad
    assert(df.collect().head.getString(0) == "order 12345678901 of 7 items at 3.14 rate")
  }

  // ---- blocklists ----

  test("domain blocklist: literal and broadcast-relation overloads agree; blockword gate is exact") {
    val df = Seq((1L, "good.com", "fine text here"),
      (2L, "bad.com", "fine text here"),
      (3L, "good.com", "spam spam ok ok")).toDF("doc_id", "domain", "text")
    val lit1 = ops.Cleaning.filterBlockedDomains(df, "domain", Seq("bad.com"))
      .select($"doc_id").as[Long].collect().toSet
    val rel = ops.Cleaning.filterBlockedDomains(df, "domain",
      Seq("bad.com").toDF("d")).select($"doc_id").as[Long].collect().toSet
    assert(lit1 == Set(1L, 3L) && rel == lit1)
    val bw = df.withColumn("w", ops.Cleaning.wordsOf($"text"))
      .select($"doc_id", ops.Cleaning.blockwordFracQ4($"w", Seq("spam")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bw(1L) == 0 && bw(3L) == 5000) // 2 of 4 words
  }

  // ---- decontamination ----

  test("decontaminate drops docs sharing a 5-gram with the benchmark, keeps the rest") {
    val bench = textDf(100L -> "q1 q2 q3 q4 q5 q6")
    val corpus = textDf(
      1L -> "x1 x2 q2 q3 q4 q5 q6 x3", // shares shingles q2..q6
      2L -> "y1 y2 y3 y4 y5 y6 y7",    // clean
      3L -> "q1 q2 q3 q4")             // 4-word overlap only — too short, clean
    val out = ops.Cleaning.decontaminate(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((1, 0))) // exactly the shared [q2 q3 q4 q5 q6] shingle
    assert(out(2L) == ((0, 1)))
    assert(out(3L) == ((0, 1)))
  }

  test("decontaminateBloom: no false negatives vs exact; generous filter is exact; tiny filter only over-drops") {
    val bench = textDf(100L -> "q1 q2 q3 q4 q5 q6")
    val corpus = textDf(
      (1L -> "x1 x2 q2 q3 q4 q5 q6 x3") +:   // true hit
      (2L -> "q1 q2 q3 q4") +:               // too short — clean
      (3L until 60L).map(i => i -> s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f c${i}g"): _*)
    val exact = ops.Cleaning.decontaminate(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // Generous sizing (2^16 bits for 2 bench shingles): FP rate ~0 → the
    // bloom form reproduces the exact decision set on this fixture.
    val big = ops.Cleaning.decontaminateBloom(corpus, bench, "doc_id", "text", 5,
      mBits = 1 << 16, nHashes = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(big == exact)
    // Starved sizing (4 bits, 3 hashes — 2 bench shingles nearly saturate
    // the bitmap): collisions guaranteed. One-sided contract: every exact
    // keep=0 stays keep=0 (no false negatives); any divergence is keep
    // 1→0 (over-drop), never 0→1.
    val tiny = ops.Cleaning.decontaminateBloom(corpus, bench, "doc_id", "text", 5,
      mBits = 4, nHashes = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    exact.foreach { case (id, k) => if (k == 0) assert(tiny(id) == 0, s"false negative on $id") }
    assert(tiny.count(_._2 == 0) > exact.count(_._2 == 0),
      "starved filter should produce at least one false-positive drop")
  }

  test("Bloom.build packs the same bit set the probe reads back") {
    val keys = Seq("alpha", "beta", "gamma").toDF("key")
    val bm = ops.Bloom.build(keys, "key", mBits = 256, nHashes = 3)
    val probes = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta").toDF("k")
      .crossJoin(broadcast(bm))
      .select($"k", ops.Bloom.mightContain($"bm", $"k", 256, 3).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // all built keys hit (no false negatives, ever)
    assert(probes("alpha") && probes("beta") && probes("gamma"))
    // the bitmap is dense-length and bounded: ceil(256/32) = 8 elements, each < 2^32
    val arr = bm.head().getSeq[Long](0)
    assert(arr.length == 8 && arr.forall(v => v >= 0L && v < (1L << 32)))
  }

  // ---- repeated-line pruning ----

  test("pruneRepeatedLines removes the cross-doc hot line and preserves order") {
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    val docs = (0L until 6L).map(i => i -> s"$hot u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h") ++
      Seq(10L -> hot) // all-boilerplate doc
    val out = ops.Cleaning.pruneRepeatedLines(textDf(docs: _*), "doc_id", "text", 8, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toList
    out.foreach { case (id, nLines, nKept, txt) =>
      if (id == 10L) { assert(nLines == 1 && nKept == 0 && txt == "") }
      else {
        assert(nLines == 2 && nKept == 1)
        assert(txt == s"u${id}a u${id}b u${id}c u${id}d u${id}e u${id}f u${id}g u${id}h")
      }
    }
  }

  test("CorpusMain.run: raw docs → extracted → cleaned → deduped → packed shards + profile") {
    val out = java.nio.file.Files.createTempDirectory("graft_cmain_").toString
    val stages = graft.CorpusMain.run(spark, 2000, out, 4).toMap
    // the funnel only narrows, and every stage emits something
    val order = Seq("raw", "with_text", "cleaned", "exact_deduped", "near_deduped",
      "substr", "lm_kept", "split_train", "mixed", "admitted")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stages(a) >= stages(b), s"$a=${stages(a)} < $b=${stages(b)}")
    }
    assert(stages("admitted") > 0 && stages("shards") > 0)
    // the multimodal side output rides the same committed extraction pass:
    // every pair is captioned, and its media_ref really is a media span of
    // the extracted table's corresponding document
    val pairsTbl = graft.CorpusMain.readStage(spark, out, "pairs")
    assert(pairsTbl.count() == stages("caption_pairs") && stages("caption_pairs") > 0)
    assert(pairsTbl.where($"caption".isNull || $"media_ref".isNull).count() == 0)
    val extractedTbl = graft.CorpusMain.readStage(spark, out, "extracted")
    assert(stages("extracted") >= stages("with_text"))
    val mediaRefs = extractedTbl.select($"doc_id",
        explode(expr("filter(spans, s -> s.kind = 'media')")).as("s"))
      .select($"doc_id", $"s.media_ref".as("media_ref"))
    assert(pairsTbl.join(mediaRefs, Seq("doc_id", "media_ref"), "left_anti")
      .count() == 0, "every pair's media_ref must exist as a media span of its doc")
    val shards = graft.CorpusMain.readStage(spark, out, "shards")
    assert(shards.count() == stages("admitted"))
    assert(shards.columns.toSet.intersect(Set("doc_id", "text", "tokens", "shard")).size == 4)
    // profile accounts for every admitted doc
    val prof = graft.CorpusMain.readStage(spark, out, "profile")
    assert(prof.agg(sum($"docs")).head().getLong(0) == stages("admitted"))
    // tokenizer diagnostics ride the profile: fertility ≥ 1 tok/word by
    // construction, compression positive for non-empty domains
    assert(prof.where($"fertility_bp" < 10000 || $"compression_bp" <= 0)
      .count() == 0, "per-domain tokenizer stats must be well-formed")
    // training sequences are cut from the boundary-RETAINING token stream
    // (ids must detokenize exactly), while shards are budgeted in
    // NON-boundary tokens (whitespace is never charged) — so the funnel
    // invariant is: the sequences' non-boundary token count equals the
    // packer's accounting, and every sequence's doc_ids align 1:1 with toks
    val seqRows = graft.CorpusMain.readStage(spark, out, "sequences")
    assert(seqRows.count() == stages("train_sequences"))
    assert(seqRows.agg(sum(size(filter($"toks",
        t => t =!= lit(graft.ops.Bpe.Boundary))))).head().getLong(0) ==
      shards.agg(sum($"tokens")).head().getLong(0),
      "sequence non-boundary tokens must sum to the packer's accounting")
    assert(seqRows.where(size($"doc_ids") =!= $"n_toks").count() == 0)
    // the shipped ids are EXACTLY detokenizable: decoding every sequence's
    // ids against the committed vocab reproduces its token stream's text
    val seqVocab = graft.CorpusMain.readStage(spark, out, "vocab")
    assert(graft.ops.Bpe.decodeIds(seqRows, "ids", seqVocab)
      .where($"decoded" =!= graft.ops.Bpe.bpeDecode($"toks")).count() == 0,
      "sequence ids must decode to the sequence's exact text slice")
    // the LM gate drops at most a decile (threshold = exact P10)
    assert(stages("lm_kept") >= (stages("substr") * 0.88).toLong)
    // CCNet tiers partition the kept mass (P30/P30 cuts) and flow through
    // to the profile's per-domain tier counts
    val kept = graft.CorpusMain.readStage(spark, out, "lm_kept")
    val tiers = kept.groupBy($"lm_bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiers.keySet == Set("head", "middle", "tail"), s"tiers: $tiers")
    assert(tiers.values.sum == stages("lm_kept"))
    assert(prof.agg(sum($"head_docs" + $"middle_docs" + $"tail_docs")).head().getLong(0)
      == stages("admitted"))
    // the eval carve partitions the gated corpus: test + train == lm_kept,
    // the committed holdout IS the test side, and NO near-dup pair (at the
    // carve's looser threshold) crosses the boundary — the leakage
    // guarantee run in anger, not just in SamplingSpec
    val splitTbl = graft.CorpusMain.readStage(spark, out, "split")
    assert(stages("split_test") + stages("split_train") == stages("lm_kept"))
    val holdout = graft.CorpusMain.readStage(spark, out, "eval_holdout")
    assert(holdout.count() == stages("split_test") && stages("split_test") > 0)
    assert(splitTbl.where($"split" === "test").count() == stages("split_test"))
    val sides = splitTbl.select($"doc_id", $"split")
    val crossSplit = graft.CorpusMain.readStage(spark, out, "split_pairs")
      .join(sides.toDF("id_a", "sa"), "id_a")
      .join(sides.toDF("id_b", "sb"), "id_b")
      .where($"sa" =!= $"sb").count()
    assert(crossSplit == 0, "no near-dup pair may cross the train/eval boundary")
    val trainIds = splitTbl.where($"split" === "train")
      .select($"doc_id".cast("string")).as[String].collect().toSet
    // the auto-salted config join changed partitioning, never content:
    // mixed == the TRAIN side ⋈ cfg filtered by the per-domain rate,
    // with the rates read from the COMMITTED link-graph-derived config
    // (the policy is pageRank-driven now; the invariant under test is
    // join identity, not the rate policy)
    val deduped = graft.CorpusMain.readStage(spark, out, "lm_kept")
    val cfgTbl = graft.CorpusMain.readStage(spark, out, "domain_cfg")
    // the authority prior is genuinely data-driven on this corpus: both
    // rates occur (cdn.<domain>.test in-link mass differs by zipf weight)
    assert(cfgTbl.select($"rate_bp").distinct().count() == 2,
      "link-graph prior must split domains across both rates")
    val expectMixed = deduped.join(cfgTbl, "domain")
      .where(ops.Sampling.hashBp($"doc_id") < $"rate_bp")
      .select($"doc_id".cast("string")).as[String].collect().toSet
      .intersect(trainIds)
    val gotMixed = graft.CorpusMain.readStage(spark, out, "mixed")
      .select($"doc_id".cast("string")).as[String].collect().toSet
    assert(gotMixed == expectMixed, "salted config join must be result-identical")
    // holdout never enters shards/sequences
    assert(shards.join(holdout.select($"doc_id"), Seq("doc_id"), "inner")
      .count() == 0, "a holdout doc leaked into the training shards")
  }

  test("pruneRepeatedLines keeps lines under the doc-count threshold") {
    val line = "l1 l2 l3 l4 l5 l6 l7 l8"
    val docs = (0L until 3L).map(i => i -> s"$line only$i b c d e f g h")
    val out = ops.Cleaning.pruneRepeatedLines(textDf(docs: _*), "doc_id", "text", 8, 5)
    // line repeats in 3 docs < threshold 5 → nothing pruned
    assert(out.where($"n_kept" =!= $"n_lines").count() == 0)
  }

  test("pruneRepeatedLinesByDomain prunes per-site boilerplate only on its own domain") {
    val foot = "f1 f2 f3 f4 f5 f6 f7 f8"
    // domain a: the footer repeats across 5 docs (>= maxDocs) → pruned
    // domain b: the SAME footer appears in 1 doc → kept there
    val docs = (0L until 5L).map(i =>
        (i, "a.test", s"$foot u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")) ++
      Seq((10L, "b.test", s"$foot v1 v2 v3 v4 v5 v6 v7 v8"))
    val out = ops.Cleaning.pruneRepeatedLinesByDomain(
        docs.toDF("doc_id", "domain", "text"), "doc_id", "domain", "text", 8, 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    (0L until 5L).foreach { i =>
      val (dom, nLines, nKept, txt) = out(i)
      assert(dom == "a.test" && nLines == 2 && nKept == 1)
      assert(txt == s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
    }
    val (_, nl10, nk10, txt10) = out(10L)
    assert(nl10 == 2 && nk10 == 2, "footer under threshold on b.test must survive")
    assert(txt10.startsWith(foot))
  }

  // ---- text normalization ----

  test("dedupLinesWithinDoc keeps the first occurrence of each line, order-preserving") {
    val df = textDf(
      (1L, "nav bar\nreal content\nnav bar\nmore text\nreal content"),
      (2L, "a\nb\nc"),           // no repeats → unchanged
      (3L, "x\nx\nx"),           // all same → one line
      (4L, "p\n\nq\n\np"))       // repeated EMPTY lines dedup too
    val out = df.select($"doc_id",
        ops.Cleaning.dedupLinesWithinDoc($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "nav bar\nreal content\nmore text")
    assert(out(2L) == "a\nb\nc")
    assert(out(3L) == "x")
    assert(out(4L) == "p\n\nq")
  }

  test("normalizeText: case, accents, control chars, runs; dedupKey strips punctuation") {
    val r = Seq((1L, "  FoO\tBÀR  \nÉlan… don't!  ")).toDF("doc_id", "text")
      .select(ops.Cleaning.normalizeText($"text").as("n"),
        ops.Cleaning.dedupKey($"text").as("k"))
      .head()
    assert(r.getString(0) == "foo bar elan… don't!")
    assert(r.getString(1) == "foo bar elan dont")
    // NULL propagates through both forms
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(ops.Cleaning.normalizeText($"text").as("n"),
        ops.Cleaning.dedupKey($"text").as("k")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}
