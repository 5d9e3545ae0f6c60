package graft.rules

/** Rule-file IR, modeled on the reference's data model (reference:
  * crates/rulemorph/src/model.rs:6-188) but independent of its serde shapes.
  *
  * A rule file declares: input format, an optional per-record `record_when`
  * filter, an ordered list of `mappings` (each writing one dot-path target),
  * optional staged `steps`, and a `finalize` block applied to the whole
  * output set (filter/sort/offset/limit/wrap).
  */
object Model {

  /** JSON-ish literal values carried by rules (defaults, literal mappings,
    * op arguments). */
  sealed trait JValue
  case object JNull extends JValue
  case class JBool(v: Boolean) extends JValue
  case class JLong(v: Long) extends JValue
  case class JDouble(v: Double) extends JValue
  case class JString(v: String) extends JValue
  case class JArray(items: Seq[JValue]) extends JValue
  case class JObject(fields: Seq[(String, JValue)]) extends JValue

  /** Unified expression IR covering both reference dialects: v1 object
    * syntax ({op,args} / {ref} / {chain}) and v2 pipes ([start, step...])
    * (reference: model.rs:160-188, v2_model.rs). Both parse into this one
    * tree; the compiler doesn't care which dialect produced it. */
  sealed trait Expr
  /** Literal value. */
  case class ELit(v: JValue) extends Expr
  /** `@scope.path` reference: scope ∈ input|context|out|item|acc|var:<name>,
    * plus `$` (current pipe value). */
  case class ERef(scope: RefScope, path: Seq[String]) extends Expr
  /** Operator application; for v2 op-steps the incoming pipe value is
    * args.head (the reference injects it the same way). */
  case class EOp(op: String, args: Seq[Expr]) extends Expr
  /** v2 pipe: start value flows through steps left→right. */
  case class EPipe(start: Expr, steps: Seq[PipeStep]) extends Expr
  /** v2 condition tree (strict equality regime — distinct from the op-level
    * string-coerced `==`; reference v2_eval.rs:1140-1179). */
  case class ECond(cond: Cond) extends Expr

  sealed trait RefScope
  case object RInput extends RefScope
  case object RContext extends RefScope
  case object ROut extends RefScope
  case object RItem extends RefScope
  case object RItemIndex extends RefScope
  case object RAcc extends RefScope
  case object RPipe extends RefScope // `$`
  case class RVar(name: String) extends RefScope

  sealed trait PipeStep
  /** op step: `{op: [args...]}` — pipe value becomes implicit first arg. */
  case class SOp(op: String, args: Seq[Expr]) extends PipeStep
  /** `{let: {name: pipe...}}` — bind vars, pipe value unchanged. */
  case class SLet(bindings: Seq[(String, Expr)]) extends PipeStep
  /** `{if: cond, then: pipe, else: pipe}` — else omitted = pass-through. */
  case class SIf(cond: Cond, thenPipe: Option[Expr], elsePipe: Option[Expr]) extends PipeStep
  /** `{map: [steps...]}` — per-element sub-pipeline with @item. */
  case class SMap(body: Expr) extends PipeStep
  /** a bare ref/literal mid-pipe replaces the current value (e.g. the
    * trailing `"@doubled"` after a let step). */
  case class SValue(e: Expr) extends PipeStep

  sealed trait Cond
  case class CAll(conds: Seq[Cond]) extends Cond
  case class CAny(conds: Seq[Cond]) extends Cond
  case class CNot(cond: Cond) extends Cond
  case class CEq(l: Expr, r: Expr) extends Cond
  case class CNe(l: Expr, r: Expr) extends Cond
  case class CGt(l: Expr, r: Expr) extends Cond
  case class CGte(l: Expr, r: Expr) extends Cond
  case class CLt(l: Expr, r: Expr) extends Cond
  case class CLte(l: Expr, r: Expr) extends Cond
  case class CMatch(l: Expr, pattern: String) extends Cond
  case class CExpr(e: Expr) extends Cond // bare boolean expression

  /** One mapping: write `expr` (or source ref / literal value) to the
    * dot-path `target`, optionally gated by `when`, cast by `castTo`, with
    * required/default missing handling (reference transform.rs:953-1039). */
  case class Mapping(
      target: Seq[String],
      expr: Expr,
      when: Option[Cond] = None,
      castTo: Option[String] = None,
      required: Boolean = false,
      default: Option[JValue] = None)

  sealed trait Step
  case class StepMappings(mappings: Seq[Mapping]) extends Step
  case class StepRecordWhen(cond: Cond) extends Step
  /** One assert: failing `when` raises AssertionFailed with the code/message. */
  case class AssertSpec(when: Cond, code: String, message: String)
  case class StepAsserts(asserts: Seq[AssertSpec]) extends Step
  /** branch to other rule FILES: condition routes each record to then/else;
    * return=true ⇒ sub-rule output REPLACES the record's output and later
    * steps are skipped; return=false ⇒ deep-merge into @out
    * (transform.rs:491-564). */
  case class StepBranch(when: Cond, thenPath: String, elsePath: Option[String],
      ret: Boolean) extends Step

  case class SortSpec(by: Seq[String], descending: Boolean)

  /** finalize.wrap values: leaf exprs (with @out = the whole output array)
    * or nested objects of them. */
  sealed trait WrapValue
  case class WExpr(e: Expr) extends WrapValue
  case class WObject(fields: Seq[(String, WrapValue)]) extends WrapValue

  case class Finalize(
      filter: Option[Cond] = None,
      sort: Option[SortSpec] = None,
      offset: Option[Int] = None,
      limit: Option[Int] = None,
      wrap: Seq[(String, WrapValue)] = Nil)

  case class InputSpec(
      format: String = "json", // csv | json | table
      recordsPath: Seq[String] = Nil,
      hasHeader: Boolean = true,
      delimiter: String = ",",
      columns: Seq[String] = Nil)

  case class RuleFile(
      version: Int = 2,
      input: InputSpec = InputSpec(),
      recordWhen: Option[Cond] = None,
      mappings: Seq[Mapping] = Nil,
      steps: Seq[Step] = Nil,
      finalizeSpec: Option[Finalize] = None) // named to avoid Object.finalize
}
