package graft

import java.util.regex.{Matcher, Pattern}

/** Extractor registry: ordered first-match URL-pattern dispatch.
  *
  * Reference analog: qetch/__init__.py::get_extractor +
  * qetch/extractors/_common.py::BaseExtractor.{handles,can_handle,get_handle}
  * (SURVEY.md §2A O1–O3). qetch keeps a module-level list of extractor
  * classes and returns the FIRST whose regex handles match the URL; dispatch
  * is ordered and deterministic. Here the registry is a small immutable
  * `Seq[ExtractorRule]` built on the driver and broadcast (it is config, not
  * data); patterns are compiled once per partition via [[CompiledRegistry]].
  *
  * Patterns use named groups exactly like qetch's handles
  * (e.g. `(?P<id>...)` → Java `(?<id>...)`).
  */
final case class ExtractorRule(
    name: String,
    /** Java regex with named groups; matched against span media_refs. */
    pattern: String,
    /** Canonical-ref template: `${g}` substituted with named group `g`. */
    canonical: String)

object Registry {

  /** The built-in rule set, in dispatch order (first match wins).
    * gfyclip ~ qetch/extractors/gfycat.py::GfycatExtractor.handles
    * (quality-variant url-key map, raw→basic normalization);
    * chanboard ~ qetch/extractors/fourchan.py::FourChanExtractor.handles
    * (board/tim/ext capture). Both hosts are synthetic (.test TLD). */
  val rules: Seq[ExtractorRule] = Seq(
    ExtractorRule(
      name = "gfyclip",
      pattern = """https?://media\.gfyclip\.test/(?<id>[A-Za-z][A-Za-z0-9]*)\.(?<ext>mp4|webm|gif)""",
      canonical = "https://gfyclip.test/${id}"),
    ExtractorRule(
      name = "chanboard",
      pattern = """https?://img\.chanboard\.test/(?<board>[a-z]+)/(?<tim>\d+)\.(?<ext>[a-z0-9]+)""",
      canonical = "https://chanboard.test/${board}/${tim}.${ext}")
  )

  /** Fallback extractor names (no registered pattern matched). */
  val GenericExtractor = "generic"   // doc has media but no rule matched
  val TextOnlyExtractor = "textonly" // doc has no media at all

  /** Per-source auth policy — the qetch AuthRegistry analog
    * (qetch/auth.py::AuthRegistry, ::AuthTypes BASIC|OAUTH|NONE; Borg-pattern
    * global → immutable broadcast config, SURVEY.md §1.2 D5). Sources absent
    * from the map require no auth. */
  val sourcePolicy: Map[String, String] = Map(
    "src13" -> "basic", "src17" -> "oauth")

  /** Quality ranking of media variants, qetch gfycat url-key→quality map
    * analog (mp4Url→1.0, webmUrl→0.5, gif lower). Integer scores keep
    * classification deterministic (SURVEY.md §7.5-1). Unknown ext → 10. */
  val qualityOf: Map[String, Int] = Map(
    "mp4" -> 100, "webm" -> 60, "m4v" -> 55, "jpg" -> 50,
    "jpeg" -> 50, "png" -> 45, "gif" -> 30)

  def quality(ext: String): Int = qualityOf.getOrElse(ext, 10)
}

/** Per-partition compiled form of the registry: patterns compiled once,
  * reused across every doc in the partition (qetch compiles handles at class
  * definition time; our unit of reuse is the Spark partition). */
final class CompiledRegistry(rules: Seq[ExtractorRule]) extends Serializable {

  @transient private lazy val compiled: Seq[(ExtractorRule, Pattern)] =
    rules.map(r => (r, Pattern.compile(r.pattern)))

  /** First rule (in registry order) matching the ref, with its Matcher —
    * qetch get_handle analog. */
  def dispatch(ref: String): Option[(ExtractorRule, Matcher)] =
    compiled.iterator
      .map { case (r, p) => (r, p.matcher(ref)) }
      .find(_._2.matches())

  /** Rewrite a matched ref to its canonical form by substituting named
    * groups into the rule's template (qetch handle_raw→handle_basic
    * normalization, gfycat.py, SURVEY.md §2A O7). */
  def canonicalize(rule: ExtractorRule, m: Matcher): String = {
    val sub = "\\$\\{([a-zA-Z]+)\\}".r
    sub.replaceAllIn(rule.canonical, g => Matcher.quoteReplacement(m.group(g.group(1))))
  }

  /** Variant-group key for a matched media ref: same (rule, identity) ⇒
    * quality variants of the same logical item (qetch content-list grouping,
    * SURVEY.md §2A D2). Identity = all named groups except `ext`. */
  def groupKey(rule: ExtractorRule, m: Matcher): String = rule.name + ":" + {
    rule.name match {
      case "gfyclip"   => m.group("id")
      case "chanboard" => m.group("board") + "/" + m.group("tim")
      case _           => m.group(0)
    }
  }

  /** Extension of a matched ref (for quality ranking); "" if none. */
  def extOf(rule: ExtractorRule, m: Matcher): String =
    try Option(m.group("ext")).getOrElse("") catch { case _: Exception => "" }
}

object CompiledRegistry {
  def default: CompiledRegistry = new CompiledRegistry(Registry.rules)
}
