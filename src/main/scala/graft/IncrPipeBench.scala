package graft

import org.apache.spark.sql.SparkSession

/** Daily-increment pipeline scale evidence (BENCH/BASELINE.md): the
  * number a pipeline operator watches is the PER-INCREMENT wall as the
  * accumulated corpus grows — if admitting day N costs more than day 1,
  * the pipeline has an O(corpus) term and dies at scale. This bench
  * builds a base corpus, then admits K equal-sized increments of fresh
  * docs back to back, timing each admit+pack round separately; the
  * headline is the LAST round's wall vs the FIRST's (ratio ≈ 1 = flat),
  * with the corpus size at each round reported alongside.
  *
  * Usage: graft.IncrPipeBench [baseDocs] [incDocs] [rounds]
  */
object IncrPipeBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val nInc = args.lift(1).map(_.toInt).getOrElse(20000)
    val rounds = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("incrpipe_").toString
    CorpusMain.run(spark, nBase, out, cpus.toInt)
    IncrementalCorpus.bootstrap(spark, out, corpusBuckets = 16)
    IncrementalCorpus.packIncrements(spark, out)

    val walls = (1 to rounds).map { r =>
      // fresh, disjoint doc range per round (all pass dedup as new)
      val lo = f"d${nBase.toLong + (r - 1).toLong * nInc}%010d"
      val hi = f"d${nBase.toLong + r.toLong * nInc}%010d"
      val delta = DocGen.generate(spark, nBase.toLong + r.toLong * nInc, cpus.toInt)
        .where($"doc_id" >= lo && $"doc_id" < hi).as[RawDoc]
        .localCheckpoint()
      delta.count() // materialize the input outside the timed region
      val t0 = System.nanoTime()
      IncrementalCorpus.admitIncrement(spark, delta, out, r.toLong)
      val packed = IncrementalCorpus.packIncrements(spark, out)
      val sec = (System.nanoTime() - t0) / 1e9
      val corpusRows = new Manifest(IncrementalCorpus.corpusTableDir(out),
          spark.sessionState.newHadoopConf())
        .head().get.buckets.filter(_.bucket < 16).map(_.rows).sum
      println(f"""{"metric":"incr_pipeline_round","round":$r,"inc_docs":$nInc,""" +
        f""""packed":$packed,"corpus_rows":$corpusRows,"sec":$sec%.2f}""")
      sec
    }
    println(f"""{"metric":"incr_pipeline","base":$nBase,"inc":$nInc,"rounds":$rounds,""" +
      f""""first_sec":${walls.head}%.2f,"last_sec":${walls.last}%.2f,""" +
      f""""last_over_first":${walls.last / walls.head}%.2f}""")
    spark.stop()
  }
}
