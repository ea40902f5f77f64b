package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Streaming suite: the incremental extraction path must produce exactly
  * the batch pipeline's output, and resume from its checkpoint across
  * restarts without reprocessing (streaming analog of ResumeSpec). */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("AvailableNow extraction stream == batch extraction, and checkpoint-resumes") {
    val in = Files.createTempDirectory("graft_stream_in_").toString
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    val schemaFrom = spark.createDataset(Seq(DocGen.docFor(0L))).toDF()

    // batch 1: docs 0..199
    spark.createDataset((0L until 200L).map(DocGen.docFor)).toDF()
      .write.mode("append").parquet(in)
    val q1 = streaming.EventStream.runExtractAvailableNow(spark, in, out, ckpt, schemaFrom)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 200)

    // batch 2: docs 200..299 arrive; restart from checkpoint
    spark.createDataset((200L until 300L).map(DocGen.docFor)).toDF()
      .write.mode("append").parquet(in)
    val q2 = streaming.EventStream.runExtractAvailableNow(spark, in, out, ckpt, schemaFrom)
    q2.awaitTermination()

    val streamed = spark.read.parquet(out).as[ExtractedDoc].collect()
    assert(streamed.length == 300, "resume must process only the new files, once")

    // span-for-span equality with the batch oracle
    val byId = streamed.map(d => d.doc_id -> d).toMap
    (0L until 300L).map(DocGen.docFor).foreach { d =>
      val exp = ReferenceOracle.extract(d)
      val act = byId(d.doc_id)
      assert(act.spans.map(s => (s.kind, s.text, s.media_ref)) ==
        exp.spans.map(s => (s.kind, s.text, s.media_ref)), s"mismatch ${d.doc_id}")
    }
  }

  test("watermarked tumbling-window aggregation plan builds and runs on a batch frame") {
    // eventCounts is a pure plan builder; exercise it on a static frame
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val res = streaming.EventStream.eventCounts(events).collect()
    assert(res.nonEmpty)
  }
}
