package graft.mcp

import scala.collection.mutable

/** Parses DTO source text in the seven languages [[graft.rules.DtoGenerator]]
  * emits back into a field schema, for the MCP `generate_rules_from_dto`
  * tool (reference rulemorph_mcp/src/main.rs:2475-4114). Line-oriented and
  * intentionally forgiving: it reads the declaration shapes of each
  * language's idiomatic DTOs (and exactly what the generator produces),
  * skipping anything it does not recognize.
  */
object DtoSchemaParser {

  sealed trait FieldType
  case class Primitive(valueType: String) extends FieldType // string|int|float|bool
  case class Ref(typeName: String) extends FieldType
  case object Unknown extends FieldType

  final case class Field(jsonKey: String, tpe: FieldType, optional: Boolean)
  final case class DtoType(fields: mutable.ArrayBuffer[Field] = mutable.ArrayBuffer.empty)
  final case class Schema(root: String, types: Map[String, DtoType])

  final case class GeneratedMapping(target: String, valueType: Option[String], required: Boolean)

  def parse(text: String, language: String): Either[String, Schema] = {
    val parsed = language.toLowerCase match {
      case "typescript" => Right(parseTypeScript(text))
      case "rust" => Right(parseRust(text))
      case "python" => Right(parsePython(text))
      case "go" => Right(parseGo(text))
      case "java" => Right(parseJava(text))
      case "kotlin" => Right(parseKotlin(text))
      case "swift" => Right(parseSwift(text))
      case _ => Left("dto_language must be rust, typescript, python, go, java, kotlin, or swift")
    }
    parsed.flatMap { case (types, order) =>
      val root = if (types.contains("Record")) "Record"
        else order.headOption.getOrElse(return Left("no dto types found"))
      Right(Schema(root, types.toMap))
    }
  }

  /** Schema → ordered mapping list: leaves become targets at their nested
    * dot-path; a field is required unless it (or an enclosing object) is
    * optional (generate_mappings_from_schema, main.rs:4114-4171). */
  def generateMappings(schema: Schema): Either[String, Seq[GeneratedMapping]] = {
    val out = mutable.ArrayBuffer.empty[GeneratedMapping]
    val visiting = mutable.Set.empty[String]
    def build(typeName: String, prefix: String, parentOptional: Boolean): Either[String, Unit] = {
      if (!visiting.add(typeName)) return Right(())
      val t = schema.types.getOrElse(typeName, return Left(s"unknown dto type: $typeName"))
      for (f <- t.fields) {
        val target = InputAnalysis.appendPath(prefix, f.jsonKey)
        val optional = parentOptional || f.optional
        f.tpe match {
          case Primitive(vt) => out += GeneratedMapping(target, Some(vt), !optional)
          case Unknown => out += GeneratedMapping(target, None, !optional)
          case Ref(child) =>
            if (schema.types.contains(child))
              build(child, target, optional) match {
                case l @ Left(_) => return l
                case _ => ()
              }
            else out += GeneratedMapping(target, None, !optional)
        }
      }
      visiting.remove(typeName)
      Right(())
    }
    build(schema.root, "", parentOptional = false).map(_ => out.toSeq)
  }

  // -- shared helpers -----------------------------------------------------

  private type Types = (mutable.LinkedHashMap[String, DtoType], mutable.ArrayBuffer[String])

  private def newTypes: Types =
    (mutable.LinkedHashMap.empty[String, DtoType], mutable.ArrayBuffer.empty[String])

  private def openType(ts: Types, name: String): DtoType = {
    val (types, order) = ts
    order += name
    types.getOrElseUpdate(name, DtoType())
  }

  /** `/** json: "key" */` or `# json: "key"` rename comments. */
  private val jsonComment = """(?:/\*\*|#|//)\s*json:\s*"([^"]+)"""".r

  private def primitive(token: String, table: Map[String, String]): Option[FieldType] =
    table.get(token).map(Primitive)

  private def refOrUnknown(token: String): FieldType =
    if (token.isEmpty || token.exists(c => c == '[' || c == '<' || c == ']'))
      Unknown
    else if (token.headOption.exists(_.isUpper)) Ref(token)
    else Unknown

  // -- TypeScript ---------------------------------------------------------

  private val tsPrims = Map("string" -> "string", "number" -> "float", "boolean" -> "bool")

  private def parseTypeScript(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    var pendingKey: Option[String] = None
    for (raw <- text.linesIterator) {
      var line = raw.trim
      if (line.startsWith("export interface ") || line.startsWith("interface ")) {
        val name = line.stripPrefix("export ").stripPrefix("interface ")
          .takeWhile(c => !c.isWhitespace && c != '{')
        if (name.nonEmpty) { current = Some(openType(ts, name)); pendingKey = None }
      } else if (line.startsWith("}")) { current = None; pendingKey = None }
      else current.foreach { t =>
        jsonComment.findFirstMatchIn(line).foreach { m =>
          pendingKey = Some(m.group(1))
          line = line.substring(0, m.start).trim + line.substring(m.end).stripSuffix("*/").trim
        }
        if (line.contains(":")) {
          val Array(namePart, typePart) = line.stripSuffix(";").split(":", 2).map(_.trim)
          if (namePart.nonEmpty && typePart.nonEmpty) {
            val optional = namePart.endsWith("?")
            val fieldName = namePart.stripSuffix("?").trim
            val token = typePart.split("[|&]")(0).trim.stripSuffix(";")
            val tpe = primitive(token, tsPrims).getOrElse(
              if (token == "unknown" || token == "any") Unknown else refOrUnknown(token))
            t.fields += Field(pendingKey.getOrElse(fieldName), tpe, optional)
            pendingKey = None
          }
        }
      }
    }
    ts
  }

  // -- Rust ---------------------------------------------------------------

  private val rustPrims = Map("String" -> "string", "i64" -> "int", "i32" -> "int",
    "u64" -> "int", "u32" -> "int", "f64" -> "float", "f32" -> "float", "bool" -> "bool")

  private def parseRust(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    var pendingRename: Option[String] = None
    var pendingOptional = false
    val structRe = """(?:pub\s+)?struct\s+(\w+)""".r
    val fieldRe = """(?:pub\s+)?(r#)?(\w+)\s*:\s*(.+?),?\s*$""".r
    val renameRe = """rename\s*=\s*"([^"]+)"""".r
    for (raw <- text.linesIterator) {
      val line = raw.trim
      if (line.startsWith("#[serde(")) {
        renameRe.findFirstMatchIn(line).foreach(m => pendingRename = Some(m.group(1)))
        if (line.contains("skip_serializing_if") || line.contains("default"))
          pendingOptional = true
      } else structRe.findFirstMatchIn(line) match {
        case Some(m) if line.contains("struct") =>
          current = Some(openType(ts, m.group(1))); pendingRename = None; pendingOptional = false
        case _ if line.startsWith("}") =>
          current = None; pendingRename = None; pendingOptional = false
        case _ => current.foreach { t =>
          fieldRe.findFirstMatchIn(line).foreach { m =>
            val name = m.group(2)
            var token = m.group(3).trim
            var optional = pendingOptional
            if (token.startsWith("Option<") && token.endsWith(">")) {
              optional = true
              token = token.stripPrefix("Option<").stripSuffix(">").trim
            }
            val tpe = primitive(token, rustPrims).getOrElse(
              if (token == "Value" || token == "serde_json::Value") Unknown
              else refOrUnknown(token))
            t.fields += Field(pendingRename.getOrElse(name.stripSuffix("_")), tpe, optional)
            pendingRename = None; pendingOptional = false
          }
        }
      }
    }
    ts
  }

  // -- Python -------------------------------------------------------------

  private val pyPrims = Map("str" -> "string", "int" -> "int", "float" -> "float",
    "bool" -> "bool")

  private def parsePython(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    var pendingKey: Option[String] = None
    val classRe = """class\s+(\w+)\s*[:(]""".r
    val metaRe = """json_key"\s*:\s*"([^"]+)"""".r
    for (raw <- text.linesIterator) {
      val line = raw.trim
      classRe.findFirstMatchIn(line) match {
        case Some(m) => current = Some(openType(ts, m.group(1))); pendingKey = None
        case None =>
          jsonComment.findFirstMatchIn(line) match {
            case Some(m) if line.startsWith("#") => pendingKey = Some(m.group(1))
            case _ => current.foreach { t =>
              if (line.contains(":") && !line.startsWith("@") && !line.startsWith("#")
                  && !line.startsWith("from ") && !line.startsWith("import ")) {
                val Array(namePart, rest) = line.split(":", 2).map(_.trim)
                if (namePart.nonEmpty && namePart.forall(c => c.isLetterOrDigit || c == '_')) {
                  var token = rest.split("=")(0).trim
                  var optional = rest.contains("=")
                  if (token.startsWith("Optional[") && token.endsWith("]")) {
                    optional = true
                    token = token.stripPrefix("Optional[").stripSuffix("]").trim
                  }
                  val key = metaRe.findFirstMatchIn(rest).map(_.group(1))
                    .orElse(pendingKey).getOrElse(namePart.stripSuffix("_"))
                  val tpe = primitive(token, pyPrims).getOrElse(
                    if (token == "Any") Unknown else refOrUnknown(token))
                  t.fields += Field(key, tpe, optional)
                  pendingKey = None
                }
              }
            }
          }
      }
    }
    ts
  }

  // -- Go -----------------------------------------------------------------

  private val goPrims = Map("string" -> "string", "int64" -> "int", "int" -> "int",
    "int32" -> "int", "float64" -> "float", "float32" -> "float", "bool" -> "bool")

  private def parseGo(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    val typeRe = """type\s+(\w+)\s+struct\s*\{""".r
    val fieldRe = """(\w+)\s+(\S+)(?:\s+`([^`]*)`)?""".r
    val tagRe = """json:"([^",]+)(,[^"]*)?"""".r
    for (raw <- text.linesIterator) {
      val line = raw.trim
      typeRe.findFirstMatchIn(line) match {
        case Some(m) => current = Some(openType(ts, m.group(1)))
        case None if line.startsWith("}") => current = None
        case None => current.foreach { t =>
          fieldRe.findFirstMatchIn(line).foreach { m =>
            val name = m.group(1)
            var token = m.group(2)
            var optional = false
            if (token.startsWith("*")) { optional = true; token = token.drop(1) }
            val tag = Option(m.group(3)).getOrElse("")
            val key = tagRe.findFirstMatchIn(tag).map(_.group(1)).getOrElse(name)
            if (tag.contains("omitempty")) optional = true
            val tpe = primitive(token, goPrims).getOrElse(
              if (token == "json.RawMessage" || token.startsWith("map[") ||
                  token.startsWith("[]") || token == "interface{}" || token == "any") Unknown
              else refOrUnknown(token))
            t.fields += Field(key, tpe, optional)
          }
        }
      }
    }
    ts
  }

  // -- Java ---------------------------------------------------------------

  private val javaPrims = Map("String" -> "string", "Long" -> "int", "Integer" -> "int",
    "long" -> "int", "int" -> "int", "Double" -> "float", "double" -> "float",
    "Float" -> "float", "float" -> "float", "Boolean" -> "bool", "boolean" -> "bool")

  private def parseJava(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    var pendingKey: Option[String] = None
    val classRe = """(?:public\s+)?class\s+(\w+)""".r
    val propRe = """@JsonProperty\("([^"]+)"\)""".r
    val fieldRe = """(?:public\s+|private\s+|protected\s+)?([\w.<>\[\]]+)\s+(\w+)\s*;""".r
    for (raw <- text.linesIterator) {
      val line = raw.trim
      propRe.findFirstMatchIn(line) match {
        case Some(m) => pendingKey = Some(m.group(1))
        case None => classRe.findFirstMatchIn(line) match {
          case Some(m) if line.contains("class ") =>
            current = Some(openType(ts, m.group(1))); pendingKey = None
          case _ if line.startsWith("}") => current = None
          case _ => current.foreach { t =>
            fieldRe.findFirstMatchIn(line).foreach { m =>
              var token = m.group(1)
              val name = m.group(2)
              var optional = false
              if (token.startsWith("Optional<") && token.endsWith(">")) {
                optional = true
                token = token.stripPrefix("Optional<").stripSuffix(">")
              }
              val tpe = primitive(token, javaPrims).getOrElse(
                if (token == "JsonNode" || token == "Object") Unknown else refOrUnknown(token))
              t.fields += Field(pendingKey.getOrElse(name.stripSuffix("_")), tpe, optional)
              pendingKey = None
            }
          }
        }
      }
    }
    ts
  }

  // -- Kotlin -------------------------------------------------------------

  private val kotlinPrims = Map("String" -> "string", "Long" -> "int", "Int" -> "int",
    "Double" -> "float", "Float" -> "float", "Boolean" -> "bool")

  private def parseKotlin(text: String): Types = {
    val ts = newTypes
    var current: Option[DtoType] = None
    var pendingKey: Option[String] = None
    val classRe = """data\s+class\s+(\w+)\s*\(""".r
    val propRe = """@JsonProperty\("([^"]+)"\)""".r
    val fieldRe = """va[lr]\s+(\w+)\s*:\s*([\w.<>?]+),?""".r
    for (raw <- text.linesIterator) {
      val line = raw.trim
      propRe.findFirstMatchIn(line) match {
        case Some(m) => pendingKey = Some(m.group(1))
        case None => classRe.findFirstMatchIn(line) match {
          case Some(m) => current = Some(openType(ts, m.group(1))); pendingKey = None
          case None if line.startsWith(")") => current = None
          case None => current.foreach { t =>
            fieldRe.findFirstMatchIn(line).foreach { m =>
              val name = m.group(1)
              var token = m.group(2)
              var optional = false
              if (token.endsWith("?")) { optional = true; token = token.stripSuffix("?") }
              val tpe = primitive(token, kotlinPrims).getOrElse(
                if (token == "JsonNode" || token == "Any") Unknown else refOrUnknown(token))
              t.fields += Field(pendingKey.getOrElse(name.stripSuffix("_")), tpe, optional)
              pendingKey = None
            }
          }
        }
      }
    }
    ts
  }

  // -- Swift --------------------------------------------------------------

  private val swiftPrims = Map("String" -> "string", "Int" -> "int", "Int64" -> "int",
    "Double" -> "float", "Float" -> "float", "Bool" -> "bool")

  private def parseSwift(text: String): Types = {
    val ts = newTypes
    var current: Option[String] = None
    var inCodingKeys = false
    val structRe = """struct\s+(\w+)\s*:\s*Codable""".r
    val fieldRe = """let\s+(\w+)\s*:\s*([\w?\[\]:]+)""".r
    val caseRe = """case\s+(\w+)\s*=\s*"([^"]+)"""".r
    val renames = mutable.Map.empty[(String, String), String]
    // first pass: CodingKeys renames per struct
    var cur = ""
    for (raw <- text.linesIterator) {
      val line = raw.trim
      structRe.findFirstMatchIn(line).foreach(m => cur = m.group(1))
      if (line.startsWith("enum CodingKeys")) inCodingKeys = true
      else if (inCodingKeys && line.startsWith("}")) inCodingKeys = false
      else if (inCodingKeys)
        caseRe.findFirstMatchIn(line).foreach(m => renames((cur, m.group(1))) = m.group(2))
    }
    inCodingKeys = false
    for (raw <- text.linesIterator) {
      val line = raw.trim
      structRe.findFirstMatchIn(line) match {
        case Some(m) if m.group(1) != "CodingKeys" =>
          current = Some(m.group(1)); openType(ts, m.group(1))
        case _ =>
          if (line.startsWith("enum CodingKeys")) inCodingKeys = true
          else if (inCodingKeys) { if (line.startsWith("}")) inCodingKeys = false }
          else if (line.startsWith("}")) current = None
          else current.foreach { name =>
            fieldRe.findFirstMatchIn(line).foreach { m =>
              val fieldName = m.group(1)
              var token = m.group(2)
              var optional = false
              if (token.endsWith("?")) { optional = true; token = token.stripSuffix("?") }
              val tpe = primitive(token, swiftPrims).getOrElse(
                if (token == "JSONValue" || token.startsWith("[")) Unknown
                else refOrUnknown(token))
              val key = renames.getOrElse((name, fieldName), fieldName.stripSuffix("_"))
              ts._1(name).fields += Field(key, tpe, optional)
            }
          }
      }
    }
    ts
  }
}
