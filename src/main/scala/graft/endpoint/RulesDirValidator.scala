package graft.endpoint

import java.nio.file.{Files, Path}

import scala.util.control.NonFatal

import graft.rules.Validator
import EndpointModel._

/** Whole-rules-directory validation (reference `validate_rules_dir`,
  * endpoint_engine.rs:151-240): the directory's `endpoint.yaml` must parse
  * and compile, every rule file it references (step rules, step catches,
  * endpoint catches, and transitively the body_rule / catch targets of
  * network rules) must exist and validate, and catch targets must be
  * normal rules. Errors carry the reference's `E <code> file=... msg=...`
  * identity. */
object RulesDirValidator {

  final case class RulesDirError(code: String, file: String,
      path: Option[String], message: String) {
    def render: String = {
      val p = path.map(p => s" path=$p").getOrElse("")
      s"""E $code file=$file$p msg="$message""""
    }
  }

  def validate(rulesDir: Path): Seq[RulesDirError] = {
    val errors = Seq.newBuilder[RulesDirError]
    val endpointPath = rulesDir.resolve("endpoint.yaml")
    val source =
      try Files.readString(endpointPath)
      catch {
        case NonFatal(e) =>
          return Seq(RulesDirError("FileReadFailed", endpointPath.toString, None,
            s"failed to read: ${e.getMessage}"))
      }
    val spec =
      try EndpointModel.parseRuleKind(source) match {
        case EndpointRule(spec) => spec
        case _ =>
          return Seq(RulesDirError("InvalidRuleType", endpointPath.toString,
            Some("type"), "endpoint rule type must be endpoint"))
      }
      catch {
        case NonFatal(e) =>
          return Seq(RulesDirError("EndpointCompileFailed", endpointPath.toString,
            None, e.getMessage))
      }

    // referenced rules: step targets, step catches, endpoint catches
    val stepRefs = spec.endpoints.flatMap(_.steps.map(_.rulePath))
    val catchRefs = spec.endpoints.flatMap(e =>
      e.catchSpec.values ++ e.steps.flatMap(_.catchSpec.values))
    val visited = scala.collection.mutable.Set.empty[Path]

    def validateRef(ref: String, asCatch: Boolean): Unit = {
      val resolved = rulesDir.resolve(ref).normalize()
      if (!visited.add(resolved)) return
      val text =
        try Files.readString(resolved)
        catch {
          case NonFatal(e) =>
            errors += RulesDirError("FileReadFailed", resolved.toString, None,
              s"failed to read: ${e.getMessage}")
            return
        }
      try EndpointModel.parseRuleKind(text) match {
        case NormalRule(_) =>
          Validator.validate(text).foreach { ve =>
            errors += RulesDirError(ve.code, resolved.toString,
              Some(ve.path).filter(_.nonEmpty), ve.text)
          }
        case NetworkRule(net) =>
          if (asCatch)
            errors += RulesDirError("InvalidCatchRule", resolved.toString, None,
              "catch rule must be normal")
          // transitively validate the network rule's own references
          net.bodyRule.foreach(validateRef(_, asCatch = false))
          net.catchSpec.values.foreach(validateRef(_, asCatch = true))
        case EndpointRule(_) =>
          errors += RulesDirError("InvalidRuleType", resolved.toString,
            Some("type"), "step rule must be normal or network")
      } catch {
        case NonFatal(e) =>
          errors += RulesDirError("RuleParseFailed", resolved.toString, None,
            e.getMessage)
      }
    }

    stepRefs.foreach(validateRef(_, asCatch = false))
    catchRefs.foreach(validateRef(_, asCatch = true))
    errors.result()
  }
}
