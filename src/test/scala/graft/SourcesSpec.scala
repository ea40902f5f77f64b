package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion sources: JSONL round-trip must preserve doc ids and exact
  * span sequences under the declared (never inferred) schema. */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL round-trip preserves doc_id and span sequences; portable bucket in range") {
    val docs = spark.createDataset((0L until 100L).map(DocGen.docFor)).toDF()
    val dir = Files.createTempDirectory("graft_jsonl_").toString
    Sources.toJsonl(docs, dir)
    val back = Sources.fromJsonl(spark, dir)
    assert(back.count() == 100)
    val a = docs.as[RawDoc].collect().map(d => d.doc_id -> d.spans.toList).toMap
    val b = back.select($"doc_id", $"spans").as[(String, Seq[RawSpan])]
      .collect().map { case (id, ss) => id -> ss.toList }.toMap
    (0L until 100L).foreach { i =>
      val id = DocGen.docId(i)
      assert(a(id) == b(id), s"span mismatch after JSONL round-trip for $id")
    }
    assert(back.where($"bucket" < 0 || $"bucket" >= DocGen.NumBuckets).count() == 0)
  }

  test("well-formed lines missing a required field fail fast (no silent nulls)") {
    val dir = Files.createTempDirectory("graft_jsonl_null_").toString
    Files.writeString(java.nio.file.Path.of(dir, "part-0.txt"),
      """{"doc_id":"d1","domain":"src0"}""" + "\n") // no spans — parses fine
    val ex = intercept[Exception] {
      Sources.fromJsonl(spark, dir).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: all(t.getCause)
    assert(all(ex).exists(_.contains("missing required field")), ex.toString)
  }

  test("FAILFAST ingest rejects corrupt lines instead of dropping them") {
    val dir = Files.createTempDirectory("graft_jsonl_bad_").toString
    Files.writeString(java.nio.file.Path.of(dir, "part-0.txt"),
      """{"doc_id":"d1","domain":"src0","spans":[]}""" + "\n" + "{not json}\n")
    val ex = intercept[Exception] {
      Sources.fromJsonl(spark, dir).collect()
    }
    assert(ex.toString.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.toString.toLowerCase.contains("malformed")) ||
      ex.toString.contains("FAILFAST") || ex.getMessage.contains("Malformed"))
  }

  test("quarantine ingest: good rows match FAILFAST exactly; bad lines surface verbatim with reasons") {
    val docs = spark.createDataset((0L until 50L).map(DocGen.docFor)).toDF()
    val dir = Files.createTempDirectory("graft_jsonl_quar_").toString
    Sources.toJsonl(docs, dir)
    val bad = Seq(
      """{"doc_id": "b1", "domain": "x", "spans": [""" -> "corrupt",
      "garbage line" -> "corrupt",
      """{"doc_id":"b2","domain":"x"}""" -> "missing_field",
      """{"domain":"y","spans":[]}""" -> "missing_field")
    Files.writeString(java.nio.file.Path.of(dir, "bad.txt"),
      bad.map(_._1).mkString("\n"))
    val (good, quarantine) = Sources.fromJsonlQuarantine(spark, dir)
    // good side == the FAILFAST path on the clean part files only
    val clean = Files.createTempDirectory("graft_jsonl_quar_clean_").toString
    Sources.toJsonl(docs, clean)
    val expect = Sources.fromJsonl(spark, clean)
      .select($"doc_id", $"bucket").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val got = good.select($"doc_id", $"bucket").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == expect, s"good side diverged: ${got.size} vs ${expect.size}")
    // quarantine: exact raw lines, correct reasons
    val q = quarantine.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q.size == bad.size, q.toString)
    bad.foreach { case (line, reason) =>
      assert(q.get(line).contains(reason), s"line [$line]: got ${q.get(line)}")
    }
  }
}
