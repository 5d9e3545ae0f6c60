package graft.endpoint

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Filesystem-backed trace store under `data_dir` (reference
  * rulemorph_trace/src/trace_store.rs): traces are JSON files in
  * `data_dir/traces/`, indexed by their `trace_id` field (file stem when
  * absent); `data_dir/rules/` holds imported rule files. `list` re-scans
  * on every call (the reference's refresh_index), newest first;
  * `importBundle` copies a bundle's `traces/` and `rules/` trees in. */
final class FileTraceStore(val dataDir: Path) {

  private val mapper = new ObjectMapper()

  Files.createDirectories(tracesDir)
  Files.createDirectories(rulesDir)

  def tracesDir: Path = dataDir.resolve("traces")
  def rulesDir: Path = dataDir.resolve("rules")

  /** Files under `dir`, with the walk stream closed eagerly (Files.walk
    * holds directory handles until closed). */
  private def walkFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val stream = Files.walk(dir)
      try stream.iterator().asScala.filter(Files.isRegularFile(_)).toVector
      finally stream.close()
    }

  final case class Meta(traceId: String, status: String, timestamp: Option[String],
      durationUs: Option[Long], rule: Option[JsonNode], summary: Option[JsonNode],
      path: Path) {
    def toJson: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("trace_id", traceId)
      o.put("status", status)
      timestamp match { case Some(t) => o.put("timestamp", t); case None => o.putNull("timestamp") }
      durationUs match { case Some(d) => o.put("duration_us", d); case None => o.putNull("duration_us") }
      rule match { case Some(r) => o.set[JsonNode]("rule", r); case None => o.putNull("rule") }
      summary match { case Some(s) => o.set[JsonNode]("summary", s); case None => o.putNull("summary") }
      o.put("path", path.toString)
      o
    }
  }

  private def parseMeta(p: Path): Option[Meta] =
    try {
      val v = mapper.readTree(Files.readString(p))
      if (!v.isObject) return None
      def strField(k: String): Option[String] =
        Option(v.get(k)).filter(_.isTextual).map(_.asText)
      val stem = p.getFileName.toString.stripSuffix(".json")
      Some(Meta(
        traceId = strField("trace_id").getOrElse(stem),
        status = strField("status").getOrElse("unknown"),
        timestamp = strField("timestamp"),
        durationUs = Option(v.get("duration_us")).filter(_.isNumber).map(_.asLong),
        rule = Option(v.get("rule")).filter(_.isObject),
        summary = Option(v.get("summary")).filter(_.isObject),
        path = p))
    } catch { case NonFatal(_) => None }

  private def scan(): Seq[Meta] =
    walkFiles(tracesDir).filter(_.toString.endsWith(".json")).flatMap(parseMeta)

  /** All trace metas, newest timestamp first (None timestamps last). */
  def list(): Seq[Meta] =
    scan().sortBy(m => m.timestamp.getOrElse(""))(Ordering[String].reverse)

  /** The full trace document by id: `<id>.json` directly when the file is
    * named after its trace_id (the engine's persisted traces are), else a
    * lazy scan that stops at the first id match — never a full-store
    * parse per lookup. */
  def get(traceId: String): Option[JsonNode] = {
    val direct = tracesDir.resolve(s"$traceId.json").normalize()
    if (direct.startsWith(tracesDir.normalize()) && Files.isRegularFile(direct)) {
      val doc = mapper.readTree(Files.readString(direct))
      val idField = Option(doc.get("trace_id")).filter(_.isTextual).map(_.asText)
      if (idField.forall(_ == traceId)) return Some(doc)
    }
    walkFiles(tracesDir).iterator
      .filter(_.toString.endsWith(".json"))
      .flatMap(p => parseMeta(p).filter(_.traceId == traceId))
      .nextOption()
      .map(m => mapper.readTree(Files.readString(m.path)))
  }

  /** Copy the bundle's traces and rules trees into the data dir.
    * Returns (imported trace count, their ids, rule files imported). */
  def importBundle(bundlePath: Path): (Int, Seq[String], Int) = {
    def copyTree(src: Path, dest: Path): Seq[Path] =
      walkFiles(src).map { p =>
        val target = dest.resolve(src.relativize(p))
        Files.createDirectories(target.getParent)
        Files.copy(p, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        target
      }
    val traceFiles = copyTree(bundlePath.resolve("traces"), tracesDir)
    val imported = traceFiles.filter(_.toString.endsWith(".json")).flatMap(parseMeta)
    val ruleFiles = copyTree(bundlePath.resolve("rules"), rulesDir)
    (imported.size, imported.map(_.traceId), ruleFiles.size)
  }

  /** A change stamp for the SSE watcher: (max mtime, file count) folded
    * into one value, so deletions and multiple writes within one mtime
    * granule still move the stamp. */
  def changeStamp(): Long = {
    val files = walkFiles(tracesDir)
    val maxMtime = files
      .map(p => Files.getLastModifiedTime(p).toMillis)
      .foldLeft(0L)(math.max)
    maxMtime * 31L + files.size
  }

  def listJson: String = {
    val arr: ArrayNode = mapper.createArrayNode()
    list().foreach(m => arr.add(m.toJson))
    val root = mapper.createObjectNode()
    root.set[JsonNode]("traces", arr)
    mapper.writeValueAsString(root)
  }
}
