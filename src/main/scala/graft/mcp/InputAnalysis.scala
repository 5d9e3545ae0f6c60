package graft.mcp

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.rules.PathParser

/** Input-sample analysis backing the MCP `analyze_input` and
  * `generate_rules_*` tools (reference rulemorph_mcp/src/main.rs:2090-2473):
  * records are flattened to dot-paths with per-path type counts and example
  * values; rule targets are matched to input paths by exact source, leaf
  * name, then token-set similarity, with a small boost when the declared
  * cast type agrees with the observed value types. */
object InputAnalysis {

  private val mapper = new ObjectMapper()

  // -- records ------------------------------------------------------------

  /** "json" or "csv" from an explicit override or sniffed from the text. */
  def normalizeFormat(format: Option[String], text: String): String =
    format.map(_.toLowerCase) match {
      case Some("csv") => "csv"
      case Some(_) => "json"
      case None => text.dropWhile(_.isWhitespace).headOption match {
        case Some('{') | Some('[') => "json"
        case _ => "csv"
      }
    }

  /** JSON value → record list: descend records_path, then array = records,
    * single object = one record. */
  def jsonRecords(value: JsonNode, recordsPath: Option[String]): Either[String, Seq[JsonNode]] = {
    val target = recordsPath match {
      case Some(p) =>
        var cur: JsonNode = value
        for (tok <- PathParser.parseTokens(p)) tok match {
          case PathParser.PKey(k) =>
            cur = if (cur != null && cur.isObject) cur.get(k) else null
          case PathParser.PIdx(i) =>
            cur = if (cur != null && cur.isArray) cur.get(i) else null
        }
        if (cur == null) return Left("records_path did not match any value")
        cur
      case None => value
    }
    if (target.isArray) Right(target.elements.asScala.toSeq)
    else if (target.isObject) Right(Seq(target))
    else Left("records_path must resolve to an object or array")
  }

  /** Header-row CSV → records with sniffed cell types (parse_csv_records +
    * csv_cell_to_value). Quoted cells with embedded commas/quotes handled. */
  def csvRecords(text: String): Seq[JsonNode] = {
    val rows = parseCsv(text)
    if (rows.isEmpty) return Nil
    val headers = rows.head.zipWithIndex.map { case (h, i) =>
      if (h.trim.isEmpty) s"column_${i + 1}" else h.trim
    }
    rows.tail.map { cells =>
      val obj = mapper.createObjectNode()
      cells.zipWithIndex.foreach { case (cell, i) =>
        if (i < headers.size) obj.set[JsonNode](headers(i), cellValue(cell))
      }
      obj
    }
  }

  private def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = mutable.ArrayBuffer.empty[Seq[String]]
    val row = mutable.ArrayBuffer.empty[String]
    val cell = new StringBuilder
    var inQuotes = false
    var i = 0
    def endCell(): Unit = { row += cell.toString; cell.clear() }
    def endRow(): Unit = {
      endCell()
      if (row.exists(_.nonEmpty) || row.size > 1) rows += row.toSeq
      row.clear()
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') { cell += '"'; i += 1 }
        else if (c == '"') inQuotes = false
        else cell += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => endCell()
        case '\r' => ()
        case '\n' => endRow()
        case other => cell += other
      }
      i += 1
    }
    if (cell.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }

  private def cellValue(raw: String): JsonNode = {
    val t = raw.trim
    if (t.isEmpty) mapper.nullNode()
    else if (t.equalsIgnoreCase("true")) mapper.getNodeFactory.booleanNode(true)
    else if (t.equalsIgnoreCase("false")) mapper.getNodeFactory.booleanNode(false)
    else t.toLongOption.map(l => mapper.getNodeFactory.numberNode(l): JsonNode)
      .orElse(t.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
        .map(d => mapper.getNodeFactory.numberNode(d): JsonNode))
      .getOrElse(mapper.getNodeFactory.textNode(t))
  }

  // -- path stats ---------------------------------------------------------

  final class PathStats {
    var count: Int = 0
    val typeCounts: mutable.LinkedHashMap[String, Int] = mutable.LinkedHashMap.empty
    val examples: mutable.ArrayBuffer[JsonNode] = mutable.ArrayBuffer.empty
  }

  def typeName(v: JsonNode): String =
    if (v == null || v.isNull) "null"
    else if (v.isBoolean) "bool"
    else if (v.isNumber) "number"
    else if (v.isTextual) "string"
    else if (v.isArray) "array"
    else "object"

  /** Flatten every record to leaf dot-paths (arrays and empty objects stop
    * descent), accumulating counts, per-type counts, and up to 3 examples. */
  def analyzeRecords(records: Seq[JsonNode], maxPaths: Option[Int])
      : mutable.LinkedHashMap[String, PathStats] = {
    val stats = mutable.LinkedHashMap.empty[String, PathStats]
    def record(path: String, v: JsonNode): Unit = {
      val key = if (path.isEmpty) "$" else path
      if (!stats.contains(key) && maxPaths.exists(stats.size >= _)) return
      val s = stats.getOrElseUpdate(key, new PathStats)
      s.count += 1
      val t = typeName(v)
      s.typeCounts(t) = s.typeCounts.getOrElse(t, 0) + 1
      val primitive = v == null || v.isNull || v.isBoolean || v.isNumber || v.isTextual
      if (s.examples.size < 3 && primitive && !s.examples.contains(v))
        s.examples += v
    }
    def walk(v: JsonNode, prefix: String): Unit =
      if (v != null && v.isObject && v.size > 0)
        v.properties.asScala.foreach(e => walk(e.getValue, appendPath(prefix, e.getKey)))
      else record(prefix, v)
    records.foreach(walk(_, ""))
    stats
  }

  /** Dot-path append with bracket-quoting for keys holding path syntax. */
  def appendPath(prefix: String, key: String): String = {
    val needsQuote = key.exists(c => c == '.' || c == '[' || c == ']' || c == '"' || c == '\'' || c == '\\')
    val segment =
      if (needsQuote) "[\"" + key.replace("\\", "\\\\").replace("\"", "\\\"") + "\"]"
      else key
    if (prefix.isEmpty) segment
    else if (segment.startsWith("[")) prefix + segment
    else s"$prefix.$segment"
  }

  def statsToJson(stats: mutable.LinkedHashMap[String, PathStats]): ArrayNode = {
    val arr = mapper.createArrayNode()
    stats.toSeq.sortBy(_._1).foreach { case (path, s) =>
      val obj = mapper.createObjectNode()
      obj.put("path", path)
      obj.put("count", s.count)
      val types = mapper.createObjectNode()
      s.typeCounts.toSeq.sortBy(_._1).foreach { case (t, n) => types.put(t, n) }
      obj.set[JsonNode]("types", types)
      if (s.examples.nonEmpty) {
        val ex = mapper.createArrayNode()
        s.examples.foreach(ex.add)
        obj.set[JsonNode]("examples", ex)
      }
      arr.add(obj)
    }
    arr
  }

  // -- candidate selection ------------------------------------------------

  final case class InputPath(path: String, leaf: String, tokens: Seq[String],
      typeCounts: Map[String, Int])

  final case class Candidate(source: String, score: Double, reason: String,
      confidence: String)

  def buildInputPaths(stats: mutable.LinkedHashMap[String, PathStats]): Seq[InputPath] =
    stats.toSeq.collect { case (path, s) if path != "$" =>
      val leaf = leafFromPath(path).getOrElse(path)
      InputPath(path, leaf, splitTokens(leaf), s.typeCounts.toMap)
    }

  def leafFromPath(path: String): Option[String] =
    try PathParser.parseTokens(path).reverseIterator.collectFirst {
      case PathParser.PKey(k) => k
    }
    catch { case _: PathParser.PathError => Some(path) }

  def splitTokens(value: String): Seq[String] = {
    val tokens = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    for (c <- value) {
      if (c.isLetterOrDigit && c < 128) cur += c.toLower
      else if (cur.nonEmpty) { tokens += cur.toString; cur.clear() }
    }
    if (cur.nonEmpty) tokens += cur.toString
    tokens.toSeq
  }

  def tokenSimilarity(a: Seq[String], b: Seq[String]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet; val sb = b.toSet
    val denom = math.max(sa.size, sb.size).toDouble
    if (denom == 0.0) 0.0 else sa.intersect(sb).size / denom
  }

  /** Score each input path against one rule target: exact source (1.0) >
    * leaf equality (0.8 target / 0.75 source hint) > token overlap (0.6·J),
    * +0.1 when the declared cast type appears among the observed types. */
  def selectCandidates(targetLeaf: String, sourceHint: Option[String],
      valueType: Option[String], inputPaths: Seq[InputPath],
      maxCandidates: Int): Seq[Candidate] = {
    val targetTokens = splitTokens(targetLeaf)
    val sourceLeaf = sourceHint.flatMap(leafFromPath)
    val sourceTokens = sourceLeaf.map(splitTokens).getOrElse(Nil)
    val out = inputPaths.flatMap { in =>
      val (score0, reason) =
        if (sourceHint.contains(in.path)) (1.0, Some("exact_source"))
        else if (targetLeaf.nonEmpty && in.leaf.equalsIgnoreCase(targetLeaf))
          (0.8, Some("leaf_match"))
        else if (sourceLeaf.exists(in.leaf.equalsIgnoreCase))
          (0.75, Some("leaf_match"))
        else {
          var sim = tokenSimilarity(targetTokens, in.tokens)
          if (sourceTokens.nonEmpty)
            sim = math.max(sim, tokenSimilarity(sourceTokens, in.tokens))
          if (sim > 0.0) (0.6 * sim, Some("token_match")) else (0.0, None)
        }
      reason.map { r =>
        val score = score0 + typeBoost(in.typeCounts, valueType)
        Candidate(in.path, score, r, confidence(score))
      }
    }
    out.sortBy(c => (-c.score, c.source)).take(maxCandidates)
  }

  private def typeBoost(typeCounts: Map[String, Int], valueType: Option[String]): Double =
    valueType.flatMap {
      case "string" => Some("string")
      case "int" | "float" => Some("number")
      case "bool" => Some("bool")
      case _ => None
    }.filter(typeCounts.contains).map(_ => 0.1).getOrElse(0.0)

  private def confidence(score: Double): String =
    if (score >= 0.9) "high" else if (score >= 0.7) "medium" else "low"
}
