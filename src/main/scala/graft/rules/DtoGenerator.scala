package graft.rules

import scala.collection.mutable

import Model._

/** DTO (typed record) generator for the rule's OUTPUT schema, in seven
  * target languages, with the reference generator's exact output grammar
  * (crates/rulemorph/src/dto.rs:39-139 and each render_* function) — the
  * dto01/dto02 golden fixtures compare generated text verbatim.
  *
  * Schema derivation (build_schema, dto.rs:86-139): every mapping target
  * (top-level `mappings` plus all step mappings) inserts a field at its
  * dot-path; `type:` picks the primitive, no type means a free JSON value;
  * a field is optional unless required / literal `value:` / `default:`,
  * and any non-trivial `when:` gate forces optional.
  */
object DtoGenerator {

  sealed trait Language
  case object Rust extends Language
  case object TypeScript extends Language
  case object Python extends Language
  case object Go extends Language
  case object Java extends Language
  case object Kotlin extends Language
  case object Swift extends Language

  /** CLI language names (incl. the `ts` alias, main.rs DtoLanguageArg). */
  def language(name: String): Option[Language] = name.toLowerCase match {
    case "rust" => Some(Rust)
    case "typescript" | "ts" => Some(TypeScript)
    case "python" => Some(Python)
    case "go" => Some(Go)
    case "java" => Some(Java)
    case "kotlin" => Some(Kotlin)
    case "swift" => Some(Swift)
    case _ => None
  }

  final case class DtoError(message: String) extends RuntimeException(message)

  // -- schema -------------------------------------------------------------

  private sealed trait FieldType
  private case class Primitive(name: String) extends FieldType // string|int|float|bool
  private case class Obj(node: Node) extends FieldType
  private case object JsonValue extends FieldType

  private case class Field(key: String, var tpe: FieldType, optional: Boolean)
  private class Node { val fields = mutable.ArrayBuffer.empty[Field] }

  private def buildSchema(rule: RuleFile): Node = {
    val root = new Node
    val all = rule.mappings ++ rule.steps.collect { case StepMappings(ms) => ms }.flatten
    for (m <- all) {
      val keys = m.target
      if (keys.isEmpty) throw DtoError("target path is invalid")
      val fieldType = m.castTo match {
        case Some(t @ ("string" | "int" | "float" | "bool")) => Primitive(t)
        case Some(_) => throw DtoError("unsupported type in mapping")
        case None => JsonValue
      }
      val conditional = m.when match {
        case None => false
        case Some(CExpr(ELit(JBool(true)))) => false
        case Some(_) => true
      }
      val isValue = m.expr.isInstanceOf[ELit]
      val optional = conditional || !(m.required || isValue || m.default.isDefined)
      insertField(root, keys, fieldType, optional)
    }
    root
  }

  private def insertField(node: Node, keys: Seq[String], tpe: FieldType,
      optional: Boolean): Unit = {
    val key = keys.head
    if (keys.size == 1) {
      if (node.fields.exists(_.key == key)) throw DtoError("duplicate target in dto")
      node.fields += Field(key, tpe, optional)
    } else node.fields.find(_.key == key) match {
      case Some(f) => f.tpe match {
        case Obj(child) => insertField(child, keys.tail, tpe, optional)
        case _ => throw DtoError("target conflicts with non-object")
      }
      case None =>
        val child = new Node
        insertField(child, keys.tail, tpe, optional)
        node.fields += Field(key, Obj(child), optional = false)
    }
  }

  private def nodeHasRequired(node: Node): Boolean = node.fields.exists { f =>
    f.tpe match {
      case Obj(child) => nodeHasRequired(child)
      case _ => !f.optional
    }
  }

  private def nodeUsesJson(node: Node): Boolean = node.fields.exists { f =>
    f.tpe match {
      case JsonValue => true
      case Obj(child) => nodeUsesJson(child)
      case _ => false
    }
  }

  private def schemaHasOptional(node: Node): Boolean = node.fields.exists { f =>
    f.tpe match {
      case Obj(child) => !nodeHasRequired(child) || schemaHasOptional(child)
      case _ => f.optional
    }
  }

  private def schemaHasRename(node: Node, lang: Language): Boolean = {
    val used = mutable.Map.empty[String, Int]
    node.fields.exists { f =>
      fieldIdentifier(lang, f.key, used) != f.key || (f.tpe match {
        case Obj(child) => schemaHasRename(child, lang)
        case _ => false
      })
    }
  }

  // -- naming (dto.rs:283-372) --------------------------------------------

  private class NameRegistry(base: String) {
    private val used = mutable.Set.empty[String]
    private val names = mutable.Map.empty[Seq[String], String]
    def typeNameForPath(path: Seq[String]): String = names.getOrElseUpdate(path, {
      var name = base + path.map(seg => pascalCase(wordsFromKey(seg))).mkString
      if (name.isEmpty) name = "Record"
      var unique = name
      var suffix = 2
      while (used.contains(unique)) { unique = s"${name}_$suffix"; suffix += 1 }
      used += unique
      unique
    })
    def get(path: Seq[String]): Option[String] = names.get(path)
  }

  private case class TypeDef(name: String, node: Node, path: Seq[String])

  private def collectTypes(node: Node, path: Seq[String], registry: NameRegistry,
      out: mutable.ArrayBuffer[TypeDef]): Unit = {
    for (f <- node.fields) f.tpe match {
      case Obj(child) =>
        val childPath = path :+ f.key
        registry.typeNameForPath(childPath)
        collectTypes(child, childPath, registry, out)
      case _ => ()
    }
    out += TypeDef(registry.typeNameForPath(path), node, path)
  }

  private def wordsFromKey(key: String): Seq[String] = {
    val words = mutable.ArrayBuffer.empty[String]
    val current = new StringBuilder
    for (ch <- key) {
      if (ch.isLetterOrDigit && ch < 128) current.append(ch)
      else if (current.nonEmpty) { words += current.toString; current.clear() }
    }
    if (current.nonEmpty) words += current.toString
    if (words.isEmpty) words += "field"
    words.toSeq
  }

  private def capitalize(s: String): String =
    if (s.isEmpty) "" else s.head.toUpper.toString + s.tail.toLowerCase

  private def pascalCase(words: Seq[String]): String = words.map(capitalize).mkString
  private def snakeCase(words: Seq[String]): String = words.map(_.toLowerCase).mkString("_")
  private def lowerCamel(words: Seq[String]): String =
    if (words.isEmpty) "" else words.head.toLowerCase + words.tail.map(capitalize).mkString

  private def fieldIdentifier(lang: Language, key: String,
      used: mutable.Map[String, Int]): String = {
    val base = lang match {
      case Rust | Python => snakeCase(wordsFromKey(key))
      case TypeScript | Java | Kotlin | Swift => lowerCamel(wordsFromKey(key))
      case Go => pascalCase(wordsFromKey(key))
    }
    var ident = if (base.isEmpty) (if (lang == Go) "Field" else "field") else base
    if (ident.headOption.forall(_.isDigit)) {
      ident = lang match {
        case Go => s"Field$ident"
        case Java | Kotlin | Swift => s"field${capitalize(ident)}"
        case _ => s"_$ident"
      }
    }
    if (isReserved(lang, ident)) {
      ident = if (lang == Go) s"${ident}Field" else s"${ident}_"
    }
    val n = used.getOrElse(ident, 0)
    if (n > 0) { used(ident) = n + 1; s"${ident}_${n + 1}" }
    else { used(ident) = 1; ident }
  }

  private val reservedRust = Set("as", "break", "const", "continue", "crate", "else",
    "enum", "extern", "false", "fn", "for", "if", "impl", "in", "let", "loop", "match",
    "mod", "move", "mut", "pub", "ref", "return", "self", "Self", "static", "struct",
    "super", "trait", "true", "type", "unsafe", "use", "where", "while")
  private val reservedTs = Set("break", "case", "catch", "class", "const", "continue",
    "debugger", "default", "delete", "do", "else", "enum", "export", "extends", "false",
    "finally", "for", "function", "if", "import", "in", "instanceof", "new", "null",
    "return", "super", "switch", "this", "throw", "true", "try", "typeof", "var",
    "void", "while", "with", "as", "implements", "interface", "let", "package",
    "private", "protected", "public", "static", "yield", "any", "boolean", "number",
    "string", "symbol", "type", "from", "of")
  private val reservedPython = Set("False", "None", "True", "and", "as", "assert",
    "async", "await", "break", "class", "continue", "def", "del", "elif", "else",
    "except", "finally", "for", "from", "global", "if", "import", "in", "is", "lambda",
    "nonlocal", "not", "or", "pass", "raise", "return", "try", "while", "with", "yield")
  private val reservedGo = Set("break", "default", "func", "interface", "select",
    "case", "defer", "go", "map", "struct", "chan", "else", "goto", "package",
    "switch", "const", "fallthrough", "if", "range", "type", "continue", "for",
    "import", "return", "var")
  private val reservedJava = Set("abstract", "assert", "boolean", "break", "byte",
    "case", "catch", "char", "class", "const", "continue", "default", "do", "double",
    "else", "enum", "extends", "final", "finally", "float", "for", "goto", "if",
    "implements", "import", "instanceof", "int", "interface", "long", "native", "new",
    "package", "private", "protected", "public", "return", "short", "static",
    "strictfp", "super", "switch", "synchronized", "this", "throw", "throws",
    "transient", "try", "void", "volatile", "while")
  private val reservedKotlin = Set("as", "break", "class", "continue", "do", "else",
    "false", "for", "fun", "if", "in", "interface", "is", "null", "object", "package",
    "return", "super", "this", "throw", "true", "try", "typealias", "val", "var",
    "when", "while")
  private val reservedSwift = Set("class", "deinit", "enum", "extension", "func",
    "import", "init", "let", "protocol", "static", "struct", "subscript", "typealias",
    "var", "break", "case", "continue", "default", "defer", "do", "else",
    "fallthrough", "for", "guard", "if", "in", "repeat", "return", "switch", "where",
    "while", "as", "Any", "catch", "false", "is", "nil", "rethrows", "super", "self",
    "Self", "throw", "throws", "true", "try")

  private def isReserved(lang: Language, ident: String): Boolean = lang match {
    case Rust => reservedRust(ident)
    case TypeScript => reservedTs(ident)
    case Python => reservedPython(ident)
    case Go => reservedGo(ident)
    case Java => reservedJava(ident)
    case Kotlin => reservedKotlin(ident)
    case Swift => reservedSwift(ident)
  }

  // -- generation ---------------------------------------------------------

  def generate(rule: RuleFile, lang: Language, name: Option[String] = None): String = {
    val base = name.getOrElse("Record")
    val schema = buildSchema(rule)
    lang match {
      case Rust => renderRust(schema, base)
      case TypeScript => renderTypeScript(schema, base)
      case Python => renderPython(schema, base)
      case Go => renderGo(schema, base)
      case Java => renderJava(schema, base)
      case Kotlin => renderKotlin(schema, base)
      case Swift => renderSwift(schema, base)
    }
  }

  private def defs(schema: Node, base: String): (NameRegistry, Seq[TypeDef]) = {
    val registry = new NameRegistry(base)
    val out = mutable.ArrayBuffer.empty[TypeDef]
    collectTypes(schema, Nil, registry, out)
    (registry, out.toSeq)
  }

  private def typeName(f: Field, parentPath: Seq[String], registry: NameRegistry,
      prim: String => String, json: String): String = f.tpe match {
    case Primitive(p) => prim(p)
    case JsonValue => json
    case Obj(_) => registry.get(parentPath :+ f.key).getOrElse("Record")
  }

  private def fieldOptional(f: Field): Boolean = f.tpe match {
    case Obj(child) => !nodeHasRequired(child)
    case _ => f.optional
  }

  private def renderRust(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val out = new StringBuilder
    out ++= "use serde::{Deserialize, Serialize};\n"
    if (nodeUsesJson(schema)) out ++= "use serde_json::Value;\n"
    out += '\n'
    for (d <- ds) {
      out ++= "#[derive(Debug, Clone, Serialize, Deserialize)]\n"
      out ++= s"pub struct ${d.name} {\n"
      val used = mutable.Map.empty[String, Int]
      for (f <- d.node.fields) {
        val ident = fieldIdentifier(Rust, f.key, used)
        val optional = fieldOptional(f)
        val t = typeName(f, d.path, registry, {
          case "string" => "String"; case "int" => "i64"
          case "float" => "f64"; case _ => "bool"
        }, "Value")
        val attrs = mutable.ArrayBuffer.empty[String]
        if (optional) { attrs += "default"; attrs += "skip_serializing_if = \"Option::is_none\"" }
        if (ident != f.key) attrs += s"""rename = "${f.key}""""
        if (attrs.nonEmpty) out ++= s"    #[serde(${attrs.mkString(", ")})]\n"
        val finalType = if (optional) s"Option<$t>" else t
        out ++= s"    pub $ident: $finalType,\n"
      }
      out ++= "}\n\n"
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderTypeScript(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val out = new StringBuilder
    for (d <- ds) {
      out ++= s"export interface ${d.name} {\n"
      val used = mutable.Map.empty[String, Int]
      for (f <- d.node.fields) {
        val ident = fieldIdentifier(TypeScript, f.key, used)
        val optional = fieldOptional(f)
        val t = typeName(f, d.path, registry, {
          case "string" => "string"; case "int" | "float" => "number"; case _ => "boolean"
        }, "unknown")
        if (ident != f.key) out ++= s"""  /** json: "${f.key}" */\n"""
        out ++= s"  $ident${if (optional) "?" else ""}: $t;\n"
      }
      out ++= "}\n\n"
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderPython(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val usesJson = nodeUsesJson(schema)
    val usesOptional = schemaHasOptional(schema)
    val usesRename = schemaHasRename(schema, Python)
    val out = new StringBuilder
    out ++= "from dataclasses import dataclass"
    if (usesRename) out ++= ", field"
    out += '\n'
    if (usesJson || usesOptional) {
      val parts = (if (usesOptional) Seq("Optional") else Nil) ++
        (if (usesJson) Seq("Any") else Nil)
      out ++= s"from typing import ${parts.mkString(", ")}\n"
    }
    out += '\n'
    for (d <- ds) {
      out ++= "@dataclass\n"
      out ++= s"class ${d.name}:\n"
      if (d.node.fields.isEmpty) { out ++= "    pass\n\n" }
      else {
        case class RF(key: String, ident: String, tpe: String, optional: Boolean, rename: Boolean)
        val used = mutable.Map.empty[String, Int]
        val fields = d.node.fields.map { f =>
          val ident = fieldIdentifier(Python, f.key, used)
          val optional = fieldOptional(f)
          val bare = typeName(f, d.path, registry, {
            case "string" => "str"; case "int" => "int"
            case "float" => "float"; case _ => "bool"
          }, "Any")
          val t = if (optional) s"Optional[$bare]" else bare
          RF(f.key, ident, t, optional, ident != f.key)
        }
        // dataclass rules: defaulted (optional) fields must follow required ones
        for (f <- fields.filter(!_.optional) ++ fields.filter(_.optional)) {
          if (f.rename) out ++= s"""    # json: "${f.key}"\n"""
          if (f.rename && f.optional)
            out ++= s"""    ${f.ident}: ${f.tpe} = field(default=None, metadata={"json_key": "${f.key}"})\n"""
          else if (f.rename)
            out ++= s"""    ${f.ident}: ${f.tpe} = field(metadata={"json_key": "${f.key}"})\n"""
          else if (f.optional)
            out ++= s"    ${f.ident}: ${f.tpe} = None\n"
          else
            out ++= s"    ${f.ident}: ${f.tpe}\n"
        }
        out += '\n'
      }
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderGo(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val out = new StringBuilder
    out ++= "package dto\n\n"
    if (nodeUsesJson(schema)) out ++= "import \"encoding/json\"\n\n"
    for (d <- ds) {
      out ++= s"type ${d.name} struct {\n"
      val used = mutable.Map.empty[String, Int]
      for (f <- d.node.fields) {
        val ident = fieldIdentifier(Go, f.key, used)
        val optional = fieldOptional(f)
        val bare = typeName(f, d.path, registry, {
          case "string" => "string"; case "int" => "int64"
          case "float" => "float64"; case _ => "bool"
        }, "json.RawMessage")
        val t = if (optional) s"*$bare" else bare
        val tag = if (optional) s"""`json:"${f.key},omitempty"`""" else s"""`json:"${f.key}"`"""
        out ++= s"    $ident $t $tag\n"
      }
      out ++= "}\n\n"
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderJava(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val usesJson = nodeUsesJson(schema)
    val usesOptional = schemaHasOptional(schema)
    val usesRename = schemaHasRename(schema, Java)
    val out = new StringBuilder
    if (usesRename) out ++= "import com.fasterxml.jackson.annotation.JsonProperty;\n"
    if (usesJson) out ++= "import com.fasterxml.jackson.databind.JsonNode;\n"
    if (usesOptional) out ++= "import java.util.Optional;\n"
    if (usesRename || usesJson || usesOptional) out += '\n'
    for (d <- ds) {
      val visibility = if (d.path.isEmpty) "public " else ""
      out ++= s"${visibility}class ${d.name} {\n"
      val used = mutable.Map.empty[String, Int]
      for (f <- d.node.fields) {
        val ident = fieldIdentifier(Java, f.key, used)
        val optional = fieldOptional(f)
        val bare = typeName(f, d.path, registry, {
          case "string" => "String"; case "int" => "Long"
          case "float" => "Double"; case _ => "Boolean"
        }, "JsonNode")
        val t = if (optional) s"Optional<$bare>" else bare
        if (ident != f.key) out ++= s"""    @JsonProperty("${f.key}")\n"""
        out ++= s"    public $t $ident;\n"
      }
      out ++= "}\n\n"
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderKotlin(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val usesJson = nodeUsesJson(schema)
    val usesRename = schemaHasRename(schema, Kotlin)
    val out = new StringBuilder
    if (usesRename) out ++= "import com.fasterxml.jackson.annotation.JsonProperty\n"
    if (usesJson) out ++= "import com.fasterxml.jackson.databind.JsonNode\n"
    if (usesRename || usesJson) out += '\n'
    for (d <- ds) {
      out ++= s"data class ${d.name}(\n"
      val used = mutable.Map.empty[String, Int]
      for ((f, idx) <- d.node.fields.zipWithIndex) {
        val ident = fieldIdentifier(Kotlin, f.key, used)
        val optional = fieldOptional(f)
        val bare = typeName(f, d.path, registry, {
          case "string" => "String"; case "int" => "Long"
          case "float" => "Double"; case _ => "Boolean"
        }, "JsonNode")
        val t = if (optional) s"$bare?" else bare
        if (ident != f.key) out ++= s"""    @JsonProperty("${f.key}")\n"""
        val suffix = if (idx + 1 == d.node.fields.size) "" else ","
        out ++= s"    val $ident: $t$suffix\n"
      }
      out ++= ")\n\n"
    }
    out.toString.replaceAll("\\s+$", "")
  }

  private def renderSwift(schema: Node, base: String): String = {
    val (registry, ds) = defs(schema, base)
    val out = new StringBuilder
    for (d <- ds) {
      out ++= s"struct ${d.name}: Codable {\n"
      val used = mutable.Map.empty[String, Int]
      val codingKeys = mutable.ArrayBuffer.empty[String]
      for (f <- d.node.fields) {
        val ident = fieldIdentifier(Swift, f.key, used)
        val optional = fieldOptional(f)
        val bare = typeName(f, d.path, registry, {
          case "string" => "String"; case "int" => "Int"
          case "float" => "Double"; case _ => "Bool"
        }, "JSONValue")
        val t = if (optional) s"$bare?" else bare
        out ++= s"    let $ident: $t\n"
        if (ident != f.key) codingKeys += s"""        case $ident = "${f.key}""""
      }
      if (codingKeys.nonEmpty) {
        out += '\n'
        out ++= "    enum CodingKeys: String, CodingKey {\n"
        codingKeys.foreach(l => out ++= s"$l\n")
        out ++= "    }\n"
      }
      out ++= "}\n\n"
    }
    if (nodeUsesJson(schema)) {
      out ++= swiftJsonValue
      out += '\n'
    }
    out.toString.replaceAll("\\s+$", "")
  }

  /** The Codable JSON catch-all emitted when a Swift DTO has untyped fields
    * (SWIFT_JSON_VALUE, dto.rs:1282). */
  private val swiftJsonValue: String =
    """enum JSONValue: Codable {
      |    case string(String)
      |    case number(Double)
      |    case bool(Bool)
      |    case object([String: JSONValue])
      |    case array([JSONValue])
      |    case null
      |
      |    init(from decoder: Decoder) throws {
      |        let container = try decoder.singleValueContainer()
      |        if container.decodeNil() {
      |            self = .null
      |        } else if let value = try? container.decode(Bool.self) {
      |            self = .bool(value)
      |        } else if let value = try? container.decode(Double.self) {
      |            self = .number(value)
      |        } else if let value = try? container.decode(String.self) {
      |            self = .string(value)
      |        } else if let value = try? container.decode([String: JSONValue].self) {
      |            self = .object(value)
      |        } else if let value = try? container.decode([JSONValue].self) {
      |            self = .array(value)
      |        } else {
      |            throw DecodingError.typeMismatch(JSONValue.self, DecodingError.Context(codingPath: decoder.codingPath, debugDescription: "Unsupported JSON value"))
      |        }
      |    }
      |
      |    func encode(to encoder: Encoder) throws {
      |        var container = encoder.singleValueContainer()
      |        switch self {
      |        case .string(let value):
      |            try container.encode(value)
      |        case .number(let value):
      |            try container.encode(value)
      |        case .bool(let value):
      |            try container.encode(value)
      |        case .object(let value):
      |            try container.encode(value)
      |        case .array(let value):
      |            try container.encode(value)
      |        case .null:
      |            try container.encodeNil()
      |        }
      |    }
      |}
      |""".stripMargin
}
