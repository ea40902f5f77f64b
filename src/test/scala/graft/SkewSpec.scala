package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew suite (SURVEY.md §5.2-5): domains are zipf-skewed (src0 hot by
  * construction); explicit salting must (a) not change results and (b)
  * bound per-reducer key cardinality. */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = DocGen.generate(spark, 4000, 8).cache()

  test("generator produces the intended zipf skew (src0 is hot)") {
    val counts = docs.groupBy($"domain").count().as[(String, Long)].collect().toMap
    assert(counts("src0") > counts.values.sum / 8,
      s"src0 should dominate, got $counts")
    assert(counts.size >= 15) // long tail present
  }

  test("salted two-phase aggregation equals plain aggregation") {
    val plain = docs.groupBy($"domain")
      .agg(count("*").as("n"), sum(expr("size(spans)")).as("spans"))
      .as[(String, Long, Long)].collect().toSet
    val salted = docs
      .withColumn("salt", pmod(hash($"doc_id"), lit(16)))
      .groupBy($"domain", $"salt")
      .agg(count("*").as("pn"), sum(expr("size(spans)")).as("ps"))
      .groupBy($"domain")
      .agg(sum($"pn").as("n"), sum($"ps").as("spans"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salting bounds the max partial-group size") {
    val saltK = 16
    val maxPlain = docs.groupBy($"domain").count()
      .agg(max($"count")).as[Long].head()
    val maxSalted = docs
      .withColumn("salt", pmod(hash($"doc_id"), lit(saltK)))
      .groupBy($"domain", $"salt").count()
      .agg(max($"count")).as[Long].head()
    // hot key split ~saltK ways; allow 2x slack for hash imbalance
    assert(maxSalted <= maxPlain / saltK * 2 + 16,
      s"maxSalted=$maxSalted maxPlain=$maxPlain")
  }

  test("salted join equals plain join and splits the hot key across reducers") {
    // big side: zipf-skewed domains (src0 hot); small side: per-domain config
    val big = docs.select($"doc_id", $"domain")
    val dims = docs.select($"domain").distinct()
      .withColumn("policy", concat(lit("p_"), $"domain"))
    val plain = big.join(dims, Seq("domain"))
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    val salted = ops.Skew.saltedJoin(big, dims, "domain", k = 16)
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    assert(salted == plain)
    // the hot key's rows now spread over k (domain, salt) groups
    val spread = big
      .withColumn("__salt", pmod(hash(struct(big.columns.map(col): _*)), lit(16)))
      .where($"domain" === "src0")
      .select($"__salt").distinct().count()
    assert(spread >= 12, s"hot key should hit most of the 16 salt groups, got $spread")
  }

  test("detector-chosen salting bounds per-task group size on the zipf fixture without manual k") {
    val big = docs.select($"doc_id", $"domain")
    val dims = docs.select($"domain").distinct()
      .withColumn("policy", concat(lit("p_"), $"domain"))
    val target = 100L
    // detector: exact counts via partial agg; salts only where needed
    val hot = ops.Skew.detectHotKeys(big, "domain", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(hot.nonEmpty && hot.exists(_._1 == "src0"), hot.mkString(","))
    hot.foreach { case (k, n, s) =>
      assert(n > target && s == ((n + target - 1) / target).toInt, s"($k,$n,$s)") }
    // auto-salted join: result identical to the plain join
    val plain = big.join(dims, Seq("domain"))
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    val auto = ops.Skew.saltedJoinAuto(big, dims, "domain", target)
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    assert(auto == plain)
    // per-(key, salt) group size is bounded by ~targetRows (hash slack)
    val saltMap = hot.map(h => h._1 -> h._3).toMap
    val maxGroup = big
      .withColumn("__k", coalesce(
        typedLit(saltMap).getItem($"domain"), lit(1)))
      .withColumn("__salt", pmod(hash(struct(big.columns.map(col): _*)), $"__k"))
      .groupBy($"domain", $"__salt").count()
      .agg(max($"count")).as[Long].head()
    assert(maxGroup <= target * 2,
      s"detector salting must bound group size: max=$maxGroup target=$target")
    // sampled estimation finds the same hot head (magnitude, not equality)
    val sampled = ops.Skew.detectHotKeys(big, "domain", target, sampleBp = 2500)
      .collect().map(r => r.getString(0)).toSet
    assert(sampled.contains("src0"))
  }

  test("sampleCol-keyed sampling finds the hot head reading ONLY two columns of a wide table") {
    // a WIDE table (key + unique id + fat payload columns): the default
    // full-row sample hash forces the scan to read every column; keying
    // the sample on the row-unique id keeps the scan at (key, id)
    val dir = java.nio.file.Files.createTempDirectory("skew_wide_").toString
    docs.select($"doc_id", $"domain",
        expr("transform(spans, s -> s.text)").as("fat1"),
        expr("transform(spans, s -> s.media_ref)").as("fat2"))
      .write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    val target = 100L
    val byId = ops.Skew.detectHotKeys(wide, "domain", target,
      sampleBp = 2500, sampleCol = Some("doc_id"))
    assert(byId.collect().map(_.getString(0)).toSet.contains("src0"))
    // plan: the scan of the sampleCol-keyed detector reads exactly
    // (domain, doc_id) — column pruning survives the sample predicate
    val p = byId.queryExecution.executedPlan.toString
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("domain") &&
      !readSchema.contains("fat1") && !readSchema.contains("fat2"),
      s"sampleCol detector must not read payload columns: $readSchema")
    // the full-row default, by contrast, drags the payload into the scan
    val pFull = ops.Skew.detectHotKeys(wide, "domain", target, sampleBp = 2500)
      .queryExecution.executedPlan.toString
    val fullSchema = pFull.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(fullSchema.contains("fat1"),
      s"control: full-row hash reads the payload: $fullSchema")
    // saltedJoinAuto passes the knob through — results stay identical to
    // the plain join (salting never changes semantics)
    val dims = wide.select($"domain").distinct()
      .withColumn("policy", concat(lit("p_"), $"domain"))
    val plain = wide.join(dims, Seq("domain"))
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    val auto = ops.Skew.saltedJoinAuto(wide, dims, "domain", target,
        sampleBp = 2500, sampleCol = Some("doc_id"))
      .select($"doc_id", $"policy").as[(String, String)].collect().toSet
    assert(auto == plain)
  }

  test("extraction output is identical with and without domain skew in the input order") {
    // shuffle input rows (skewed domains clumped vs spread) — output set invariant
    val base = ExtractJob.transform(docs.as[RawDoc], 8)
      .collect().map(d => (d.doc_id, d.spans)).toSet
    val reshuffled = ExtractJob.transform(
      docs.orderBy($"domain").as[RawDoc], 8)
      .collect().map(d => (d.doc_id, d.spans)).toSet
    assert(base == reshuffled)
  }
}
