package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic synthetic-corpus generator (SURVEY.md §7.3 M0, FIXTURES.md §4).
  *
  * The north rule's input is an Iceberg table of interleaved text+media
  * documents; no such table exists in the sandbox, so we synthesize it —
  * deterministically (seed = 42 + doc index, independent of partitioning and
  * generation order) and distributed (spark.range → map, so generation
  * itself scales to any doc count without a driver bottleneck).
  *
  * Documents mimic what qetch consumed: pages from skewed "domains" holding
  * ordered runs of title/text/boilerplate spans interleaved with media spans,
  * where media items appear as quality-variant runs (qetch gfycat url-key
  * map analog) against the two registered synthetic hosts.
  */
object DocGen {

  val Seed = 42L
  val NumBuckets = 16

  /** Fixed 64-word vocabulary (FIXTURES.md §4); includes stopwords so the
    * text-density classifier has real signal. */
  val Vocab: Vector[String] = Vector(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "this", "that", "be",
    "spark", "query", "row", "data", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "order", "sort", "key", "fast",
    "slow", "filter", "customer", "line", "batch", "value", "group",
    "stream", "column", "vector", "agg", "page", "media", "frame",
    "shard", "bucket", "span", "text", "title", "anchor", "quality",
    "variant", "offset", "domain", "lineage", "snapshot", "metric", "graft")

  /** Zipf(s=1.2) weights over domains src0..src19 — src0 intentionally hot
    * (skew axis for salting tests, FIXTURES.md §4). */
  val Domains: Vector[String] = (0 until 20).map(i => s"src$i").toVector
  private val zipfCum: Array[Double] = {
    val w = (1 to Domains.length).map(r => 1.0 / math.pow(r, 1.2)).toArray
    val tot = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / tot)
  }

  private val MediaExts = Vector("mp4", "webm", "gif")
  private val Boards = Vector("g", "tv", "sci", "diy")

  /** FNV-1a 64-bit — deterministic bucket hash, no Spark dependency so the
    * single-threaded oracle and fixtures can compute it too. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def bucketOf(docId: String): Int = {
    val m = fnv64(docId) % NumBuckets
    (if (m < 0) m + NumBuckets else m).toInt
  }

  def docId(idx: Long): String = f"d$idx%010d"

  private def words(rnd: Random, n: Int): String =
    Seq.fill(n)(Vocab(rnd.nextInt(Vocab.length))).mkString(" ")

  private def pickDomain(rnd: Random): String = {
    val x = rnd.nextDouble()
    var i = 0
    while (i < zipfCum.length - 1 && x > zipfCum(i)) i += 1
    Domains(i)
  }

  /** splitmix64 finalizer — java.util.Random's first draws are nearly
    * constant across sequential seeds (LCG seed correlation), so the raw
    * `Seed + idx` must be bit-mixed before seeding. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pure function: doc index → document. Everything below depends only on
    * `idx`, never on task/partition identity. */
  def docFor(idx: Long): RawDoc = {
    val rnd = new Random(mix64(Seed + idx))
    val id = docId(idx)
    val domain = pickDomain(rnd)
    val nSpans = 5 + rnd.nextInt(28) // 5..32
    val spans = new ArrayBuffer[RawSpan](nSpans + 2)
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = {
      spans += RawSpan(kind, text, ref, off); off += 1
    }
    // leading nav boilerplate ~60%
    if (rnd.nextInt(10) < 6) add("nav", words(rnd, 1 + rnd.nextInt(3)), "")
    // title ~80%
    if (rnd.nextInt(10) < 8) add("title", words(rnd, 2 + rnd.nextInt(5)), "")
    while (off < nSpans) {
      rnd.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // main text, varying length
          add("text", words(rnd, 1 + rnd.nextInt(12)), "")
        case 4 => // ad boilerplate
          add("ad", words(rnd, 1 + rnd.nextInt(4)), "")
        case 5 => // link (short anchors mostly, occasionally long)
          add("link", words(rnd, 1 + rnd.nextInt(if (rnd.nextInt(5) == 0) 12 else 4)), "")
        case 6 => // gfyclip media: variant run of 1..3 exts, same id
          val mid = "Clip" + java.lang.Long.toString(math.abs(Seed + idx * 131 + off), 36)
          val k = 1 + rnd.nextInt(3)
          val exts = rnd.shuffle(MediaExts).take(k)
          exts.foreach(e => add("media", "", s"https://media.gfyclip.test/$mid.$e"))
        case 7 => // chanboard media: single variant
          val board = Boards(rnd.nextInt(Boards.length))
          val tim = 1400000000L + (math.abs(fnv64(id)) % 100000000L) + off
          val ext = Vector("jpg", "png", "gif")(rnd.nextInt(3))
          add("media", "", s"https://img.chanboard.test/$board/$tim.$ext")
        case 8 => // unregistered media host (generic passthrough)
          add("media", "", s"https://cdn.$domain.test/file${rnd.nextInt(1000)}.bin")
        case 9 => // footer boilerplate
          add("footer", words(rnd, 1 + rnd.nextInt(3)), "")
        case 10 => // albumhost media: multi-item album — 2..3 logical items
          // in page order, each a variant run of 1..2 exts (D2 two-level
          // ordering: items ordered, variants collapsed per item)
          val album = "alb" + java.lang.Long.toString(math.abs(Seed + idx * 257 + off), 36)
          val items = 2 + rnd.nextInt(2)
          (0 until items).foreach { it =>
            val k = 1 + rnd.nextInt(2)
            val exts = rnd.shuffle(Vector("mp4", "webm", "jpg")).take(k)
            exts.foreach(e => add("media", "", s"https://i.albumhost.test/$album/${100 + it}.$e"))
          }
      }
    }
    RawDoc(id, spans.toVector, domain, bucketOf(id))
  }

  /** Distributed generation: spark.range parallelizes; each task computes
    * its docs from the index alone. */
  def generate(spark: SparkSession, nDocs: Long, partitions: Int = 0): Dataset[RawDoc] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, nDocs, 1, partitions) else spark.range(nDocs)
    base.map(i => docFor(i))
  }

  /** Hand-written unit fixtures (FIXTURES.md §4): every kind combination,
    * empty doc, all-boilerplate, media-only, duplicate text, single span,
    * variant runs incl. interleaved groups. */
  def fixtures: Seq[RawDoc] = {
    def d(id: String, dom: String, ss: (String, String, String)*): RawDoc =
      RawDoc(id, ss.zipWithIndex.map { case ((k, t, r), i) => RawSpan(k, t, r, i) }.toVector,
        dom, bucketOf(id))
    Seq(
      d("f0000000000", "src0"), // empty doc
      d("f0000000001", "src0", ("nav", "home about", ""), ("ad", "buy now", ""), ("footer", "contact", "")), // all boilerplate
      d("f0000000002", "src1", ("title", "spark query engine", "")),
      d("f0000000003", "src1", ("text", "the quick brown fox jumps over dog", "")), // 7 words → kept
      d("f0000000004", "src2", ("text", "tiny", "")), // 1 word → dropped
      d("f0000000005", "src2", ("text", "in the span", "")), // 3 words, 2 stop → kept
      d("f0000000006", "src3",
        ("title", "big media page", ""),
        ("text", "short one", ""), // 2 words adjacent to title → kept
        ("media", "", "https://media.gfyclip.test/AbcDef.gif"),
        ("media", "", "https://media.gfyclip.test/AbcDef.mp4"),
        ("media", "", "https://media.gfyclip.test/AbcDef.webm")), // one group → mp4 canonical
      d("f0000000007", "src3",
        ("media", "", "https://media.gfyclip.test/One.webm"),
        ("media", "", "https://media.gfyclip.test/Two.gif")), // two groups, adjacent
      d("f0000000008", "src4",
        ("media", "", "https://img.chanboard.test/g/1400000001.jpg"),
        ("text", "a reply with the usual words here", ""),
        ("media", "", "https://img.chanboard.test/g/1400000002.png")),
      d("f0000000009", "src4",
        ("media", "", "https://cdn.src4.test/file1.bin")), // generic media only
      d("f0000000010", "src5",
        ("link", "click", ""), // short anchor → dropped
        ("link", "a very long anchor text with many words inside it", "")), // 10 words → kept
      d("f0000000011", "src5",
        ("text", "dup span of the data", ""),
        ("text", "dup span of the data", "")), // duplicate text spans both kept
      d("f0000000012", "src0",
        ("nav", "x", ""), ("title", "mixed doc", ""),
        ("text", "the table scan joins the fast row", ""),
        ("ad", "ad words", ""),
        ("media", "", "https://media.gfyclip.test/Zed.gif"),
        ("media", "", "https://img.chanboard.test/tv/1400000003.gif"), // breaks the Zed group
        ("footer", "fin", "")),
      d("f0000000013", "src6",
        ("media", "", "https://unknown.host.test/x.mp4"),
        ("media", "", "https://img.chanboard.test/sci/1400000004.jpg")), // dispatch: chanboard wins? no: registry order — gfyclip no match, chanboard matches → chanboard
      d("f0000000014", "src7",
        ("media", "", "https://img.chanboard.test/diy/1400000005.png"),
        ("media", "", "https://media.gfyclip.test/Late.mp4")), // gfyclip registered first → wins despite later position
      d("f0000000015", "src8", ("title", "t", ""), ("title", "second title words", "")),
      d("f0000000016", "src9", ("unknownkind", "whatever text", "")), // unknown kind dropped
      d("f0000000017", "src0",
        ("text", "offsets arrive shuffled", ""),
        ("title", "order check", "")).copy(spans = Vector(
        RawSpan("text", "offsets arrive shuffled beyond the usual count", "", 5),
        RawSpan("title", "order check", "", 2))), // non-dense, out-of-order offsets
      d("f0000000018", "src1",
        ("media", "", ""), // media with empty ref → dropped
        ("text", "the span with a stop word", "")),
      d("f0000000019", "src2", (("text", words(new Random(7), 40), ""))), // long text
      d("f0000000020", "src3",
        ("media", "", "https://media.gfyclip.test/Tie.gif"),
        ("media", "", "https://media.gfyclip.test/Tie.gif")), // identical variants — tie, earliest kept
      d("f0000000021", "src4",
        ("text", "is on at", "")), // 3 words all stopwords → kept (stops>=1)
      d("f0000000022", "src5",
        ("text", "alpha beta gamma", "")), // 3 words 0 stop, not adjacent title → dropped
      d("f0000000023", "src6",
        ("title", "adjacency after", ""),
        ("text", "two words", "")), // adjacent (after title) → kept
      d("f0000000024", "src7", // multi-item album: two items, each a variant
        // run → TWO media spans in item order, best variant each (mp4 > jpg)
        ("media", "", "https://i.albumhost.test/alb1/100.jpg"),
        ("media", "", "https://i.albumhost.test/alb1/100.mp4"),
        ("media", "", "https://i.albumhost.test/alb1/101.webm"),
        ("media", "", "https://i.albumhost.test/alb1/101.jpg")),
      d("f0000000025", "src8", // same item resumed AFTER text → two groups
        ("media", "", "https://i.albumhost.test/alb2/100.webm"),
        ("text", "the words between the album items here", ""),
        ("media", "", "https://i.albumhost.test/alb2/100.mp4")),
      d("f0000000026", "src9", // dispatch priority: chanboard (rule 1) beats
        // albumhost (rule 2) even though the album ref comes first
        ("media", "", "https://i.albumhost.test/alb3/100.jpg"),
        ("media", "", "https://img.chanboard.test/g/1400000006.png")),
      d("f0000000027", "src0", // album interleaved with gfyclip: group run
        // breaks at the rule boundary; gfyclip (rule 0) wins dispatch
        ("media", "", "https://i.albumhost.test/alb4/100.mp4"),
        ("media", "", "https://media.gfyclip.test/Mid.gif"),
        ("media", "", "https://i.albumhost.test/alb4/101.mp4"))
    )
  }
}
