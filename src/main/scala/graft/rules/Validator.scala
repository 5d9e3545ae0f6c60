package graft.rules

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Static rule validation with the reference's error codes and paths
  * (reference validator.rs:14-37, v2_validator.rs): structural checks run
  * over the raw YAML tree BEFORE compilation, so errors carry rule-file
  * paths (`mappings[1].target`) rather than Spark analysis messages.
  */
object Validator {

  case class ValidationError(code: String, path: String)

  /** Ops the engine compiles (ExprCompiler) — the unknown-op check. */
  val knownOps: Set[String] = Set(
    "concat", "to_string", "trim", "lowercase", "uppercase", "replace",
    "split", "pad_start", "pad_end",
    "add", "+", "subtract", "-", "multiply", "*", "divide", "/", "round", "to_base",
    "and", "or", "not", "==", "!=", "<", "<=", ">", ">=", "~=",
    "string", "int", "float", "bool", "coalesce", "get", "len",
    "map", "filter", "flat_map", "flatten", "take", "drop", "slice", "chunk",
    "first", "last", "find", "find_index", "contains", "index_of", "unique",
    "partition", "unzip", "zip", "zip_with",
    "sum", "avg", "min", "max", "reduce", "fold", "sort_by",
    "lookup", "lookup_all", "lookup_first",
    "merge", "deep_merge", "pick", "omit", "keys", "values", "entries",
    "from_entries", "object_flatten", "object_unflatten",
    "group_by", "key_by", "distinct_by",
    "date_format", "to_unixtime")

  private val refNamespaces = Set("input", "context", "out", "item", "acc")
  /** ops that bind @item / @acc scopes for their lambda argument */
  private val scopeOps = Set("map", "filter", "flat_map", "find", "find_index",
    "sort_by", "zip_with", "reduce", "fold", "group_by", "key_by", "distinct_by",
    "partition")

  def validate(yamlText: String): Seq[ValidationError] = {
    val root = new Yaml().load[Any](yamlText) match {
      case m: java.util.Map[_, _] => mapOf(m)
      case _ => return Seq(ValidationError("InvalidRuleFile", ""))
    }
    val errors = Seq.newBuilder[ValidationError]

    // input.csv.delimiter must be a single character (transform.rs:813-820)
    for {
      in <- root.get("input").collect { case m: java.util.Map[_, _] => mapOf(m) }
      csv <- in.get("csv").collect { case m: java.util.Map[_, _] => mapOf(m) }
      d <- csv.get("delimiter")
      if d.toString.length != 1
    } errors += ValidationError("InvalidDelimiterLength", "input.csv.delimiter")

    // record_when must be a condition/expr object, not a bare scalar
    root.get("record_when").foreach {
      case _: java.util.Map[_, _] | _: java.util.List[_] => ()
      case _ => errors += ValidationError("InvalidWhenType", "record_when")
    }

    val mappings = root.get("mappings").collect {
      case l: java.util.List[_] => l.asScala.toSeq
    }.getOrElse(Nil)

    var seenTargets = Set.empty[String]
    var definedOut = Set.empty[String]
    mappings.zipWithIndex.foreach {
      case (m: java.util.Map[_, _], i) =>
        val mm = mapOf(m)
        val base = s"mappings[$i]"

        // exactly one of source/value/expr (validator.rs duplicate/exclusive)
        val has = Seq("source", "value", "expr").count(mm.contains)
        if (has == 0) errors += ValidationError("MissingMappingValue", base)

        // target path validity + duplicates; targets are objects-only dot
        // paths — array indexes are invalid (set_path, transform.rs:6075)
        mm.get("target").map(_.toString) match {
          case Some(t) =>
            val parsed = try Some(PathParser.parse(t)) catch { case _: Exception => None }
            parsed match {
              case None => errors += ValidationError("InvalidPath", s"$base.target")
              case Some(segs) if segs.exists(_.forall(_.isDigit)) && t.contains("[") =>
                errors += ValidationError("InvalidPath", s"$base.target")
              case Some(_) =>
                if (seenTargets.contains(t))
                  errors += ValidationError("DuplicateTarget", s"$base.target")
                seenTargets += t
            }
          case None => errors += ValidationError("InvalidPath", s"$base.target")
        }

        // when must be an expression object
        mm.get("when").foreach {
          case _: java.util.Map[_, _] | _: java.util.List[_] => ()
          case _ => errors += ValidationError("InvalidWhenType", s"$base.when")
        }

        // expr tree checks: ref namespaces, item-scope, forward @out refs,
        // unknown ops, lookup arg shapes
        mm.get("expr").foreach(e =>
          checkExpr(e, s"$base.expr", inItemScope = false, definedOut, errors))

        mm.get("target").map(_.toString).foreach { t =>
          definedOut += PathParser.parse(t).headOption.getOrElse(t)
        }
      case _ => ()
    }
    errors.result()
  }

  private def checkExpr(e: Any, path: String, inItemScope: Boolean,
      definedOut: Set[String],
      errors: scala.collection.mutable.Builder[ValidationError, Seq[ValidationError]]): Unit =
    e match {
      case m: java.util.Map[_, _] =>
        val mm = mapOf(m)
        if (mm.contains("ref")) {
          val tokens = try PathParser.parse(mm("ref").toString) catch {
            case _: Exception => Nil
          }
          tokens.headOption match {
            case Some(ns) if !refNamespaces.contains(ns) =>
              errors += ValidationError("InvalidRefNamespace", path)
            case Some("item") | Some("acc") if !inItemScope =>
              // @item/@acc only valid inside map/filter/reduce scopes
              // (v2_validator.rs:958-area; reference reports the same
              // namespace code, fixture v11)
              errors += ValidationError("InvalidRefNamespace", path)
            case Some("out") =>
              if (tokens.size > 1 && !definedOut.contains(tokens(1)))
                errors += ValidationError("ForwardOutReference", path)
            case _ => ()
          }
        } else if (mm.contains("op")) {
          val op = mm("op").toString
          if (!knownOps.contains(op))
            errors += ValidationError("UnknownOp", s"$path.op")
          val args = mm.get("args").collect {
            case l: java.util.List[_] => l.asScala.toSeq
          }.getOrElse(Nil)
          // lookup/lookup_first: key path (arg 1) must be a literal string
          // (get_op_arg_range / arg-shape table, v2_validator.rs:812-862)
          if ((op == "lookup" || op == "lookup_first") && args.size >= 2 &&
              !args(1).isInstanceOf[String])
            errors += ValidationError("InvalidArgs", s"$path.args[1]")
          val scoped = inItemScope || scopeOps.contains(op)
          args.zipWithIndex.foreach { case (a, j) =>
            checkExpr(a, s"$path.args[$j]", scoped, definedOut, errors)
          }
        } else if (mm.contains("chain")) {
          mm("chain") match {
            case l: java.util.List[_] =>
              l.asScala.toSeq.zipWithIndex.foreach { case (a, j) =>
                checkExpr(a, s"$path.chain[$j]", inItemScope, definedOut, errors)
              }
            case _ => ()
          }
        }
      case l: java.util.List[_] =>
        // v2 pipes: ref strings + op-step maps
        l.asScala.toSeq.zipWithIndex.foreach { case (item, j) =>
          checkExpr(item, s"$path[$j]", inItemScope, definedOut, errors)
        }
      case s: String if s.startsWith("@") =>
        val tokens = try PathParser.parse(s.stripPrefix("@")) catch {
          case _: Exception => Nil
        }
        tokens.headOption match {
          case Some("out") if tokens.size > 1 && !definedOut.contains(tokens(1)) =>
            errors += ValidationError("ForwardOutReference", path)
          case Some("item") | Some("acc") if !inItemScope =>
            errors += ValidationError("InvalidRefNamespace", path)
          case _ => ()
        }
      case _ => ()
    }

  private def mapOf(m: java.util.Map[_, _]): Map[String, Any] =
    m.asScala.map { case (k, v) => k.toString -> v }.toMap
}
