package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Snapshot manifest — the Iceberg-emulation layer (SURVEY.md §7.4).
  *
  * No Iceberg runtime jar exists in the sandbox (SURVEY.md §0.3), so the
  * subset the north rule actually exercises — snapshot + per-partition
  * watermark + lineage for mid-run resume — is implemented directly:
  *
  * {{{
  * <tableDir>/data/bucket=K/part-*.parquet   // dynamic-overwrite per bucket
  * <tableDir>/metrics/...parquet             // metrics side table
  * <tableDir>/meta/snap-<n>.json             // snapshot: parent + completed buckets
  * <tableDir>/meta/HEAD                      // atomic pointer to current snap
  * }}}
  *
  * Commit protocol: write `snap-<n+1>.json`, then atomically move a temp
  * HEAD over HEAD (`ATOMIC_MOVE`). A crash before the move leaves the old
  * snapshot current; bucket data writes are idempotent overwrites, so
  * re-running pending buckets after any crash converges to the same table.
  * Swapping in real Iceberg is a sink change only.
  *
  * Reference analog: qetch has NO resume (it re-downloads from scratch,
  * SURVEY.md §2A O15) — this is a north-rule addition.
  */
object Manifest {
  /** Lineage record for one completed bucket. */
  final case class BucketState(bucket: Int, rows: Long, watermarkDocId: String)
  /** One committed snapshot. */
  final case class Snapshot(id: Int, parent: Int, runId: String, buckets: Seq[BucketState])
}

final class Manifest(tableDir: String) {
  import Manifest._
  private val meta: Path = Paths.get(tableDir, "meta")
  private val mapper = new ObjectMapper()

  private def headPath = meta.resolve("HEAD")

  /** Current snapshot, if any. */
  def head(): Option[Snapshot] =
    if (!Files.exists(headPath)) None
    else {
      val snapName = Files.readString(headPath).trim
      if (snapName.isEmpty) None else Some(readSnap(meta.resolve(snapName)))
    }

  private def readSnap(p: Path): Snapshot = {
    val node = mapper.readTree(Files.readString(p))
    val buckets = node.get("buckets").elements().asScala.map { b =>
      BucketState(b.get("bucket").asInt(), b.get("rows").asLong(),
        b.get("watermark_doc_id").asText())
    }.toSeq
    Snapshot(node.get("id").asInt(), node.get("parent").asInt(),
      node.get("run_id").asText(), buckets)
  }

  /** Buckets already completed per the current snapshot (resume set). */
  def completedBuckets(): Set[Int] = head().map(_.buckets.map(_.bucket).toSet).getOrElse(Set.empty)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Commit: union the parent's completed buckets with `newBuckets` (new
    * state wins on conflict), write snap-(n+1), atomically advance HEAD. */
  def commit(runId: String, newBuckets: Seq[BucketState]): Snapshot = {
    Files.createDirectories(meta)
    val parent = head()
    val parentId = parent.map(_.id).getOrElse(-1)
    val merged = (parent.map(_.buckets).getOrElse(Seq.empty)
      .filterNot(b => newBuckets.exists(_.bucket == b.bucket)) ++ newBuckets)
      .sortBy(_.bucket)
    val id = parentId + 1
    val snap = Snapshot(id, parentId, runId, merged)
    val body = {
      val bs = merged.map(b =>
        s"""{"bucket":${b.bucket},"rows":${b.rows},"watermark_doc_id":${jstr(b.watermarkDocId)}}""")
        .mkString("[", ",", "]")
      s"""{"id":$id,"parent":$parentId,"run_id":${jstr(runId)},"buckets":$bs}"""
    }
    val snapFile = meta.resolve(s"snap-$id.json")
    Files.writeString(snapFile, body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val tmp = meta.resolve(s".HEAD.tmp.$id")
    Files.writeString(tmp, s"snap-$id.json",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, headPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }
}
