package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming vector-index ingest/probe scale bench
  * ([[graft.streaming.VectorIndexStream]]).
  *
  * The claim under test: per-batch INGEST cost is flat in the table's
  * accumulated ROW count (the codebook never re-fits, assignment touches
  * only the batch, the commit is metadata), and a PROBE batch's candidate
  * scan reads only its probed cells' committed files no matter how many
  * batches were ingested. The honest caveat is printed with the numbers:
  * commit/listing metadata grows with the table's FILE count (one snapshot
  * JSON entry per file), which is what compaction exists to bound — the
  * data plane, not the metadata plane, is the flat one.
  *
  * Usage: runMain graft.VixBench [nBatches] [batchRows] [dims] [nCells]
  * Prints one JSON line. */
object VixBench {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(10)
    require(nBatches >= 2,
      "VixBench needs >= 2 batches: batch 0 pays the Lloyd bootstrap, so " +
        "the flatness comparison is batch 1 vs the last batch")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(100000)
    val dims = args.lift(2).map(_.toInt).getOrElse(32)
    val nCells = args.lift(3).map(_.toInt).getOrElse(32)
    // optional 5th arg: a cosine threshold turns the semantic admission
    // gate on for every batch — measures the gate's join overhead on a
    // near-orthogonal corpus (no drops, pure cost) as the table grows
    val gate = args.lift(4).map(_.toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_vixbench_")
      .toString
    val tbl = s"$root/t"
    val streamId = "vixbench-stream"

    // deterministic id-derived vectors (integer-valued doubles) — the bench
    // measures plan cost, not recall (AnnBench owns recall)
    def wave(b: Int) = spark.range(b.toLong * batchRows,
        (b + 1).toLong * batchRows)
      .select($"id".as("vec_id"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "j -> cast(pmod(xxhash64(id, j), 1000) as double))").as("embedding"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    var tFirst = 0.0; var tLast = 0.0
    for (b <- 0 until nBatches) {
      val (_, t) = timed {
        streaming.VectorIndexStream.indexBatch(wave(b), b.toLong, tbl,
          streamId, "vec_id", "embedding", nCells, lloydIters = 1,
          nearDupCosine = gate)
      }
      if (b == 1) tFirst = t // first post-bootstrap batch (no Lloyd cost)
      if (b == nBatches - 1) tLast = t
    }

    val m = new Manifest(tbl, spark.sessionState.newHadoopConf())
    val head = m.head().get
    val totalFiles = head.buckets.filter(_.bucket < nCells)
      .map(_.files.length).sum
    val totalRows = head.buckets.filter(_.bucket < nCells).map(_.rows).sum

    // probe at full width: the scan's file list must be the probed cells'
    // files only, a fixed FRACTION of the table (nProbe/nCells of cells
    // for a single probe; a spread probe batch unions its cells)
    val probes = wave(0).where($"vec_id" < 1)
    val nProbe = math.max(1, nCells / 8)
    def probe() = timed {
      val r = streaming.VectorIndexStream.topKSnapshot(spark, tbl, probes,
        "vec_id", "embedding", k = 10, nProbe = nProbe, nCells = nCells)
      r.count() // materialize
      r.inputFiles.length
    }
    val (probedFrag, tProbeFrag) = probe()

    // compaction bounds the metadata plane: same probe, ≤ nProbe files
    val (_, tCompact) = timed {
      ExtractJob.compact(spark, tbl, only = Some((0 until nCells).toSet))
    }
    val compactFiles = m.head().get.buckets.filter(_.bucket < nCells)
      .map(_.files.length).sum
    val (probedComp, tProbeComp) = probe()

    val gateStr = gate.map(g => f""","gate_cosine":$g%.4f""").getOrElse("")
    println(f"""{"metric":"vix_ingest","n_batches":$nBatches,""" +
      f""""batch_rows":$batchRows,"dims":$dims,"n_cells":$nCells,""" +
      f""""total_rows":$totalRows,"total_files":$totalFiles,""" +
      f""""batch1_sec":$tFirst%.2f,"batch${nBatches - 1}%d_sec":$tLast%.2f,""" +
      f""""n_probe":$nProbe,""" +
      f""""probe_files_scanned":$probedFrag,"probe_sec":$tProbeFrag%.2f,""" +
      f""""compact_sec":$tCompact%.2f,"files_after_compact":$compactFiles,""" +
      f""""probe_files_scanned_compacted":$probedComp,""" +
      f""""probe_sec_compacted":$tProbeComp%.2f$gateStr}""")
    spark.stop()
  }
}
