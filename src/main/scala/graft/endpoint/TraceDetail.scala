package graft.endpoint

import java.nio.file.Path

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rules.{Engine, Model}
import graft.rules.Model._

/** Reference-shaped rich trace capture for the endpoint engine (reference
  * `endpoint_engine.rs`: build_rule_nodes_from_rule:2355, the per-mapping
  * op capture build_mapping_ops_with_values:2975 and build_pipe_steps:3160):
  * per-step nodes with record_when/asserts_ok/branch_taken meta, a
  * recursive `child_trace` for branch targets, and per-mapping op children
  * carrying `input` / `pipe_value` / `args` / `output` plus the per-stage
  * `pipe_steps` transition the UI's OP-result view renders.
  *
  * Everything here is BEST-EFFORT observation: probes re-evaluate rule
  * prefixes against one-row DataFrames through the same compiled plans the
  * real execution used, and any probe failure degrades to an absent field,
  * never to a failed request — and never to an affirmative wrong claim
  * (an unresolved probe omits its meta rather than defaulting it). All
  * pipe prefixes of one mapping evaluate in a single job
  * ([[Engine.evalExprsJsonTrace]]), so an n-step pipe costs one collect,
  * not n.
  *
  * Cost: like the reference (whose build_rule_nodes_from_rule re-runs
  * rule prefixes per request), capture is O(steps²) rule re-executions
  * plus one probe job per mapping/condition — debugging-surface pricing,
  * not data-path pricing. Latency-sensitive serving sets
  * `traceDetail = false` on [[EndpointEngine]] and keeps the flat
  * steps[] traces. */
private[endpoint] final class TraceDetail(
    spark: SparkSession,
    parseNormalRule: Path => Option[RuleFile]) {

  private val mapper = new ObjectMapper()
  private val traceSeq = new java.util.concurrent.atomic.AtomicLong()

  // -- entry points --------------------------------------------------------

  /** The `child_trace` document of one normal-rule execution: rule header,
    * a single record with per-step nodes, and the reference's summary
    * block. `fullOutput` = the real execution's result when the caller
    * already has it (saves re-running the rule for the record output). */
  def ruleTrace(name: String, refPath: String, rule: RuleFile, input: JsonNode,
      context: JValue, ruleBaseDir: Path,
      fullOutput: Option[JsonNode]): ObjectNode = {
    val (nodes, status, lastOut) = ruleNodes(rule, input, context, ruleBaseDir)
    val durationUs = sumNodeDurations(nodes)
    val record = mapper.createObjectNode()
    record.put("index", 0)
    record.put("status", status)
    record.put("duration_us", durationUs)
    record.set[JsonNode]("input", input.deepCopy[JsonNode]())
    record.set[JsonNode]("output",
      fullOutput.orElse(lastOut).map(_.deepCopy[JsonNode]())
        .getOrElse(mapper.nullNode()))
    record.set[JsonNode]("nodes", nodes)
    val t = mapper.createObjectNode()
    t.put("trace_id", s"child-${traceSeq.incrementAndGet()}")
    val ruleObj = mapper.createObjectNode()
    ruleObj.put("type", "normal")
    ruleObj.put("name", name)
    ruleObj.put("path", refPath)
    ruleObj.put("version", rule.version)
    t.set[JsonNode]("rule", ruleObj)
    val records = mapper.createArrayNode(); records.add(record)
    t.set[JsonNode]("records", records)
    val summary = mapper.createObjectNode()
    summary.put("record_total", 1)
    summary.put("record_success", if (status == "ok") 1 else 0)
    summary.put("record_failed", if (status == "ok") 0 else 1)
    summary.put("duration_us", durationUs)
    t.set[JsonNode]("summary", summary)
    t
  }

  /** Per-step nodes of one rule execution over one record, mirroring the
    * reference's prefix-execution protocol: step i's cumulative output is
    * the rule truncated to steps[0..i] (finalize off) re-run through the
    * batch engine, so a skip/halt/error lands on exactly the step that
    * caused it. Returns (nodes, overall status, last cumulative output). */
  def ruleNodes(rule: RuleFile, input: JsonNode, context: JValue,
      ruleBaseDir: Path): (ArrayNode, String, Option[JsonNode]) = {
    val nodes = mapper.createArrayNode()
    var overall = "ok"
    var lastOut: Option[JsonNode] = None
    if (rule.steps.nonEmpty) {
      // the engine applies TOP-LEVEL mappings before steps, so step 0's
      // @out scope (and its displayed input) is the mappings' output, not
      // {} — probe it with the zero-step prefix and surface it as its own
      // node, mirroring the no-steps branch. If the PROBE fails, emit
      // nothing and suppress step-0's condition meta too: an unknown base
      // scope must degrade to absent fields, never to conditions probed
      // against the wrong record state.
      var prevOutput: JsonNode = mapper.createObjectNode()
      var baseKnown = rule.mappings.isEmpty
      if (rule.mappings.nonEmpty) {
        val started = System.nanoTime()
        runPrefix(rule.copy(steps = Nil), -1, input, context, ruleBaseDir) match {
          case Right(Some(out)) =>
            prevOutput = out; lastOut = Some(out); baseKnown = true
          case _ => ()
        }
        if (baseKnown) {
          // op ids use one-past-the-last step index — unique against every
          // real step's "op-<step>-<i>" children in the same record tree
          val ops = mappingOps(rule.mappings, input,
            mapper.createObjectNode(), context, rule.steps.length)
          val node = mapper.createObjectNode()
          node.put("id", "mappings")
          node.put("kind", "mapping")
          node.put("label", "mappings")
          node.put("status", "ok")
          node.set[JsonNode]("input", input.deepCopy[JsonNode]())
          node.set[JsonNode]("output", prevOutput.deepCopy[JsonNode]())
          node.put("duration_us", (System.nanoTime() - started) / 1000)
          if (ops.size() > 0) node.set[JsonNode]("children", ops)
          nodes.add(node)
        }
      }
      var halted = false
      rule.steps.zipWithIndex.foreach { case (step, i) =>
        val started = System.nanoTime()
        val stepInput = prevOutput
        var status = "ok"
        var error: Option[String] = None
        var output: Option[JsonNode] = None
        if (halted) status = "skipped"
        else runPrefix(rule, i, input, context, ruleBaseDir) match {
          case Right(Some(out)) => prevOutput = out; output = Some(out); lastOut = Some(out)
          case Right(None) => status = "skipped"; halted = true
          case Left(msg) =>
            status = "error"; error = Some(msg); halted = true; overall = "error"
        }
        val durationUs = (System.nanoTime() - started) / 1000
        val kind = step match {
          case _: StepBranch => "branch"
          case _: StepRecordWhen => "record_when"
          case _: StepAsserts => "asserts"
          case _: StepMappings => "mappings"
        }
        val node = mapper.createObjectNode()
        node.put("id", s"step-$i")
        node.put("kind", kind)
        node.put("label", s"step-${i + 1}")
        node.put("status", status)
        node.set[JsonNode]("input", stepInput.deepCopy[JsonNode]())
        node.set[JsonNode]("output",
          output.map(_.deepCopy[JsonNode]()).getOrElse(mapper.nullNode()))
        node.put("duration_us", durationUs)
        error.foreach { msg =>
          val e = mapper.createObjectNode()
          e.put("message", msg)
          node.set[JsonNode]("error", e)
        }
        val meta = mapper.createObjectNode()
        // step 0's cond probes need the top-level-mappings base scope; if
        // that probe failed, omit them (i > 0 inputs are self-contained)
        val probeable = status != "skipped" && (i > 0 || baseKnown)
        step match {
          case StepRecordWhen(cond) if probeable =>
            condProbe(cond, input, stepInput, context)
              .foreach(f => meta.put("record_when", f))
          case StepAsserts(asserts) if probeable =>
            val flags = asserts.map(a => condProbe(a.when, input, stepInput, context))
            // a failed PROBE must degrade to an absent field, never to a
            // false red: only report asserts_ok when every probe resolved
            if (flags.forall(_.isDefined))
              meta.put("asserts_ok", flags.forall(_.contains(true)))
          case StepBranch(when, thenPath, elsePath, _) if probeable =>
            val probed = condProbe(when, input, stepInput, context)
            val taken = probed.map {
              case true => "then"
              case false => if (elsePath.isDefined) "else" else "none"
            }
            // probe failure (None) omits branch_taken entirely — "none"
            // would affirmatively claim an untaken branch
            taken.foreach(t => meta.put("branch_taken", t))
            val refs = mapper.createArrayNode()
            refs.add(thenPath); elsePath.foreach(refs.add)
            meta.set[JsonNode]("rule_refs", refs)
            val labels = mapper.createArrayNode()
            labels.add("branch: then"); elsePath.foreach(_ => labels.add("branch: else"))
            meta.set[JsonNode]("rule_ref_labels", labels)
            val takenPath = taken match {
              case Some("then") => Some(thenPath)
              case Some("else") => elsePath
              case _ => None
            }
            takenPath.foreach { p =>
              meta.put("rule_ref", p)
              meta.put("rule_ref_label", s"branch: ${taken.getOrElse("")}")
              try {
                val resolved = ruleBaseDir.resolve(p).normalize()
                parseNormalRule(resolved).foreach { child =>
                  val childBase =
                    Option(resolved.getParent).getOrElse(ruleBaseDir)
                  node.set[JsonNode]("child_trace",
                    ruleTrace(resolved.getFileName.toString, p, child,
                      stepInput, context, childBase, None))
                }
              } catch { case NonFatal(_) => () }
            }
          case _ => ()
        }
        if (meta.size() > 0) node.set[JsonNode]("meta", meta)
        step match {
          case StepMappings(mappings) if status == "ok" =>
            // the out scope a step's mappings see starts from the step
            // input (reference: mapping_out = step_input.clone())
            val outStart = stepInput match {
              case o: ObjectNode => o.deepCopy[ObjectNode]()
              case _ => mapper.createObjectNode()
            }
            val ops = mappingOps(mappings, input, outStart, context, i)
            if (ops.size() > 0) node.set[JsonNode]("children", ops)
          case _ => ()
        }
        nodes.add(node)
      }
    } else {
      val started = System.nanoTime()
      val out = mapper.createObjectNode()
      val ops = mappingOps(rule.mappings, input, out, context, 0)
      val durationUs = (System.nanoTime() - started) / 1000
      val node = mapper.createObjectNode()
      node.put("id", "step-0")
      node.put("kind", "mapping")
      node.put("label", "mappings")
      node.put("status", "ok")
      node.set[JsonNode]("input", input.deepCopy[JsonNode]())
      node.set[JsonNode]("output", out)
      node.put("duration_us", durationUs)
      if (ops.size() > 0) node.set[JsonNode]("children", ops)
      nodes.add(node)
      lastOut = Some(out)
    }
    rule.finalizeSpec.foreach { fin =>
      val node = mapper.createObjectNode()
      node.put("id", "finalize")
      node.put("kind", "finalize")
      node.put("label", "finalize")
      node.put("status", "ok")
      val ops = mapper.createArrayNode()
      def finOp(id: String, label: String, args: ObjectNode): Unit = {
        val op = mapper.createObjectNode()
        op.put("id", id); op.put("kind", "op"); op.put("label", label)
        op.put("status", "ok")
        val meta = mapper.createObjectNode(); meta.put("op", label)
        op.set[JsonNode]("meta", meta)
        op.set[JsonNode]("args", args)
        ops.add(op)
      }
      fin.filter.foreach { c =>
        val a = mapper.createObjectNode()
        a.set[JsonNode]("expr", renderCond(c)); finOp("op-filter", "filter", a)
      }
      fin.sort.foreach { s =>
        val a = mapper.createObjectNode()
        val by = mapper.createArrayNode(); s.by.foreach(by.add)
        a.set[JsonNode]("by", by)
        a.put("order", if (s.descending) "desc" else "asc")
        finOp("op-sort", "sort", a)
      }
      fin.offset.foreach { o =>
        val a = mapper.createObjectNode(); a.put("offset", o)
        finOp("op-offset", "offset", a)
      }
      fin.limit.foreach { l =>
        val a = mapper.createObjectNode(); a.put("limit", l)
        finOp("op-limit", "limit", a)
      }
      if (fin.wrap.nonEmpty) {
        val a = mapper.createObjectNode()
        val keys = mapper.createArrayNode(); fin.wrap.foreach(w => keys.add(w._1))
        a.set[JsonNode]("keys", keys)
        finOp("op-wrap", "wrap", a)
      }
      if (ops.size() > 0) node.set[JsonNode]("children", ops)
      nodes.add(node)
    }
    (nodes, overall, lastOut)
  }

  /** Per-mapping op nodes (reference build_mapping_ops_with_values): each
    * op carries its evaluated `input` (pipe start), full `output`, the
    * rendered `pipe_value`/`args`, and the per-stage `pipe_steps`
    * transition; outputs accumulate into `out` so later mappings see the
    * `@out` state the real execution gave them. */
  def mappingOps(mappings: Seq[Mapping], record: JsonNode, out: ObjectNode,
      context: JValue, stepIndex: Int): ArrayNode = {
    val ops = mapper.createArrayNode()
    mappings.zipWithIndex.foreach { case (m, i) =>
      val started = System.nanoTime()
      val op = mapper.createObjectNode()
      op.put("id", s"op-$stepIndex-$i")
      op.put("kind", "op")
      op.put("label", m.target.mkString("."))
      op.put("status", "ok")
      val args = mapper.createObjectNode()
      args.put("target", m.target.mkString("."))
      args.set[JsonNode]("expr", renderExpr(m.expr))
      m.when.foreach(c => args.set[JsonNode]("when", renderCond(c)))
      m.castTo.foreach(t => args.put("type", t))
      if (m.required) args.put("required", true)
      m.default.foreach(d => args.set[JsonNode]("default", jvalueToNode(d)))
      op.set[JsonNode]("args", args)
      // pipe prefixes: start, start|s1, ..., full — ONE evaluation job
      val (prefixes, labels) = m.expr match {
        case EPipe(start, steps) =>
          val ps = start +: steps.indices.map(k => EPipe(start, steps.take(k + 1)))
          (ps, startLabel(start) +: steps.map(stepLabel))
        case e => (Seq(e), Seq(soloLabel(e)))
      }
      // a FAILED probe run (collect threw) must not be conflated with a
      // genuinely missing value: missing triggers the default-write below,
      // failure must degrade to absent fields only
      var probeRan = true
      val evals =
        try Engine.evalExprsJsonTrace(prefixes, traceRow(record, out), context)
        catch { case NonFatal(_) =>
          probeRan = false; Vector.fill(prefixes.size)(None) }
      def parsed(i: Int): Option[JsonNode] =
        evals.lift(i).flatten.flatMap { s =>
          try Some(mapper.readTree(s)) catch { case NonFatal(_) => None }
        }
      m.expr match {
        case EPipe(_, _) => op.set[JsonNode]("pipe_value", renderExpr(m.expr)); ()
        case _ => ()
      }
      op.set[JsonNode]("input", parsed(0).getOrElse(mapper.nullNode()))
      val full = parsed(prefixes.size - 1)
      op.set[JsonNode]("output", full.getOrElse(mapper.nullNode()))
      val pipeSteps = mapper.createArrayNode()
      labels.zipWithIndex.foreach { case (label, k) =>
        val ps = mapper.createObjectNode()
        ps.put("index", k)
        ps.put("label", label)
        ps.set[JsonNode]("input",
          (if (k == 0) None else parsed(k - 1)).getOrElse(mapper.nullNode()))
        ps.set[JsonNode]("output", parsed(k).getOrElse(mapper.nullNode()))
        pipeSteps.add(ps)
      }
      op.set[JsonNode]("pipe_steps", pipeSteps)
      op.put("duration_us", (System.nanoTime() - started) / 1000)
      val meta = mapper.createObjectNode(); meta.put("op", "mapping")
      // mirror the engine's write semantics so LATER op probes see the
      // same @out the real execution gave them: a false `when` skips the
      // write (and the op reports when=false with a null output — the
      // value was never produced), a missing expr falls to `default`.
      // A FAILED when-probe (None) skips the write conservatively but
      // reports nothing — never an affirmative claim.
      val whenProbe = m.when.map(c =>
        try Engine.evalCondTrace(c, traceRow(record, out), context)
        catch { case NonFatal(_) => None })
      whenProbe.flatten.foreach(f => meta.put("when", f))
      op.set[JsonNode]("meta", meta)
      // three when states, three renderings: Some(Some(true)) opens the
      // gate; Some(Some(false)) CLOSED it — output null, the value was
      // never produced; Some(None) means the PROBE failed — the real
      // execution may well have written the value, so the op keeps the
      // probed full output (or null if that probe failed too) and simply
      // skips the @out write: degradation is absent fields, never the
      // affirmative output:null a closed gate renders
      val gateOpen = whenProbe.forall(_.contains(true))
      val gateClosed = whenProbe.exists(_.contains(false))
      if (gateOpen && probeRan) {
        // default applies only to a PROBED missing value — after a probe
        // failure the real value is unknown, so nothing is written or
        // claimed (the best-effort contract)
        val written = full.orElse(m.default.map(jvalueToNode))
        written.foreach(v => setPath(out, m.target, v))
        if (full.isEmpty)
          op.set[JsonNode]("output",
            written.map(_.deepCopy[JsonNode]()).getOrElse(mapper.nullNode()))
      } else if (gateClosed)
        op.set[JsonNode]("output", mapper.nullNode())
      ops.add(op)
    }
    ops
  }

  /** The `child_trace` of a NETWORK rule step (reference
    * build_network_nodes_with_timing: endpoint_engine.rs:2870): one
    * "network" node whose op children describe the declared call —
    * request (method/url/headers), body expr or body_map ops or
    * body_rule ref, select path, retry policy. These are the RULE's
    * declared shapes, not live wire captures — the reference renders the
    * same static view. */
  def networkTrace(name: String, refPath: String,
      spec: EndpointModel.NetworkSpec, input: JsonNode,
      output: Option[JsonNode], context: JValue,
      durationUs: Long): ObjectNode = {
    val children = mapper.createArrayNode()
    def op(id: String, label: String)(fill: ObjectNode => Unit): Unit = {
      val o = mapper.createObjectNode()
      o.put("id", id); o.put("kind", "op"); o.put("label", label)
      o.put("status", "ok")
      val meta = mapper.createObjectNode(); meta.put("op", label)
      o.set[JsonNode]("meta", meta)
      fill(o)
      children.add(o)
    }
    op("op-request", "request") { o =>
      val args = mapper.createObjectNode()
      args.put("method", spec.method)
      args.set[JsonNode]("url", renderExpr(spec.url))
      if (spec.headers.nonEmpty) {
        val hs = mapper.createObjectNode()
        spec.headers.foreach { case (k, v) => hs.put(k, v) }
        args.set[JsonNode]("headers", hs)
      }
      o.set[JsonNode]("args", args)
      ()
    }
    spec.body.foreach { b =>
      op("op-body", "body") { o =>
        val args = mapper.createObjectNode()
        args.set[JsonNode]("expr", renderExpr(b))
        o.set[JsonNode]("args", args)
        ()
      }
    }
    if (spec.bodyMap.nonEmpty)
      mappingOps(spec.bodyMap, input, mapper.createObjectNode(), context, 0)
        .forEach(n => { children.add(n); () })
    spec.bodyRule.foreach(_ => op("op-body-rule", "body_rule")(_ => ()))
    spec.select.foreach { tokens =>
      op("op-select", "select") { o =>
        val args = mapper.createObjectNode()
        args.put("path", tokens.map {
          case graft.rules.PathParser.PKey(k) => k
          case graft.rules.PathParser.PIdx(i) => i.toString
        }.mkString("."))
        o.set[JsonNode]("args", args)
        ()
      }
    }
    spec.retry.foreach { r =>
      op("op-retry", "retry") { o =>
        val args = mapper.createObjectNode()
        args.put("max", r.max)
        args.put("backoff", r.backoff)
        args.put("initial_delay_ms", r.initialDelayMs)
        o.set[JsonNode]("args", args)
        ()
      }
    }
    val node = mapper.createObjectNode()
    node.put("id", "step-0")
    node.put("kind", "network")
    node.put("label", "request")
    node.put("status", "ok")
    node.put("duration_us", durationUs)
    spec.bodyRule.foreach { rp =>
      val meta = mapper.createObjectNode()
      meta.put("rule_ref", rp)
      meta.put("rule_ref_label", "body_rule")
      node.set[JsonNode]("meta", meta)
    }
    node.set[JsonNode]("children", children)
    val record = mapper.createObjectNode()
    record.put("index", 0)
    record.put("status", "ok")
    record.put("duration_us", durationUs)
    record.set[JsonNode]("input", input.deepCopy[JsonNode]())
    record.set[JsonNode]("output",
      output.map(_.deepCopy[JsonNode]()).getOrElse(mapper.nullNode()))
    val nodes = mapper.createArrayNode(); nodes.add(node)
    record.set[JsonNode]("nodes", nodes)
    val t = mapper.createObjectNode()
    t.put("trace_id", s"child-${traceSeq.incrementAndGet()}")
    val ruleObj = mapper.createObjectNode()
    ruleObj.put("type", "network")
    ruleObj.put("name", name)
    ruleObj.put("path", refPath)
    ruleObj.put("version", 2)
    t.set[JsonNode]("rule", ruleObj)
    val records = mapper.createArrayNode(); records.add(record)
    t.set[JsonNode]("records", records)
    val summary = mapper.createObjectNode()
    summary.put("record_total", 1)
    summary.put("record_success", 1)
    summary.put("record_failed", 0)
    summary.put("duration_us", durationUs)
    t.set[JsonNode]("summary", summary)
    t
  }

  // -- evaluation plumbing -------------------------------------------------

  /** `{__rec, __out}` one-row frame for [[Engine.evalExprsJsonTrace]]. */
  private def traceRow(record: JsonNode, out: JsonNode): DataFrame = {
    val obj = mapper.createObjectNode()
    obj.set[JsonNode]("__rec", record)
    obj.set[JsonNode]("__out", out)
    graft.sources.Sources.jsonNode(spark, obj, Nil)
  }

  private def condProbe(c: Cond, record: JsonNode, stepInput: JsonNode,
      context: JValue): Option[Boolean] =
    try Engine.evalCondTrace(c, traceRow(record, stepInput), context)
    catch { case NonFatal(_) => None }

  /** Run the rule truncated to steps[0..i] (finalize off) over the record:
    * Right(Some(out)) = cumulative output, Right(None) = record dropped
    * (skip), Left(message) = step error. */
  private def runPrefix(rule: RuleFile, i: Int, input: JsonNode,
      context: JValue, ruleBaseDir: Path): Either[String, Option[JsonNode]] =
    try {
      val partial = rule.copy(steps = rule.steps.take(i + 1), finalizeSpec = None)
      val rows = Engine.toJsonRecords(partial,
          graft.sources.Sources.jsonNode(spark, input, Nil), context,
          nullAsMissing = true, Engine.fileLoader(ruleBaseDir.toString))
        .collect()
      if (rows.isEmpty) Right(None)
      else Right(Some(mapper.readTree(rows(0).getString(0))))
    } catch { case NonFatal(e) =>
      Left(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)) }

  private def sumNodeDurations(nodes: ArrayNode): Long = {
    var total = 0L
    nodes.forEach { n =>
      val d = n.path("duration_us")
      if (d.isNumber) total += d.asLong()
    }
    total
  }

  /** Write `value` at the dot-path `target` inside `out`, creating
    * intermediate objects (the trace-side mirror of the engine's nest). */
  private def setPath(out: ObjectNode, target: Seq[String], value: JsonNode): Unit = {
    var cur = out
    target.dropRight(1).foreach { seg =>
      cur = cur.get(seg) match {
        case o: ObjectNode => o
        case _ =>
          val next = mapper.createObjectNode()
          cur.set[JsonNode](seg, next)
          next
      }
    }
    target.lastOption.foreach(seg => cur.set[JsonNode](seg, value.deepCopy[JsonNode]()))
  }

  // -- expr rendering (trace display form, v2-flavored) --------------------

  private def scopeName(s: RefScope): String = s match {
    case RInput => "@input"
    case RContext => "@context"
    case ROut => "@out"
    case RItem => "@item"
    case RItemIndex => "@item.index"
    case RAcc => "@acc"
    case RPipe => "$"
    case RVar(name) => s"@$name"
  }

  private def refString(scope: RefScope, path: Seq[String]): String =
    if (path.isEmpty) scopeName(scope)
    else s"${scopeName(scope)}.${path.mkString(".")}"

  def renderExpr(e: Expr): JsonNode = e match {
    case ELit(v) => jvalueToNode(v)
    case ERef(scope, path) => mapper.getNodeFactory.textNode(refString(scope, path))
    case EOp(op, args) =>
      val o = mapper.createObjectNode()
      val arr = mapper.createArrayNode()
      args.foreach(a => arr.add(renderExpr(a)))
      o.set[JsonNode](op, arr)
      o
    case EPipe(start, steps) =>
      val arr = mapper.createArrayNode()
      arr.add(renderExpr(start))
      steps.foreach(s => arr.add(renderStep(s)))
      arr
    case ECond(c) => renderCond(c)
  }

  private def renderStep(s: PipeStep): JsonNode = s match {
    case SOp(op, args) =>
      if (args.isEmpty) mapper.getNodeFactory.textNode(op)
      else {
        val o = mapper.createObjectNode()
        val arr = mapper.createArrayNode()
        args.foreach(a => arr.add(renderExpr(a)))
        o.set[JsonNode](op, arr)
        o
      }
    case SLet(bindings) =>
      val o = mapper.createObjectNode()
      val b = mapper.createObjectNode()
      bindings.foreach { case (n, e) => b.set[JsonNode](n, renderExpr(e)) }
      o.set[JsonNode]("let", b)
      o
    case SIf(cond, thenPipe, elsePipe) =>
      val o = mapper.createObjectNode()
      o.set[JsonNode]("if", renderCond(cond))
      thenPipe.foreach(t => o.set[JsonNode]("then", renderExpr(t)))
      elsePipe.foreach(t => o.set[JsonNode]("else", renderExpr(t)))
      o
    case SMap(body) =>
      val o = mapper.createObjectNode()
      o.set[JsonNode]("map", renderExpr(body))
      o
    case SValue(e) => renderExpr(e)
  }

  def renderCond(c: Cond): JsonNode = c match {
    case CAll(cs) => condList("all", cs)
    case CAny(cs) => condList("any", cs)
    case CNot(c0) =>
      val o = mapper.createObjectNode(); o.set[JsonNode]("not", renderCond(c0)); o
    case CEq(l, r) => condPair("eq", l, r)
    case CNe(l, r) => condPair("ne", l, r)
    case CGt(l, r) => condPair("gt", l, r)
    case CGte(l, r) => condPair("gte", l, r)
    case CLt(l, r) => condPair("lt", l, r)
    case CLte(l, r) => condPair("lte", l, r)
    case CMatch(l, pattern) =>
      val o = mapper.createObjectNode()
      val arr = mapper.createArrayNode()
      arr.add(renderExpr(l)); arr.add(pattern)
      o.set[JsonNode]("match", arr)
      o
    case CExpr(e) => renderExpr(e)
  }

  private def condList(name: String, cs: Seq[Cond]): JsonNode = {
    val o = mapper.createObjectNode()
    val arr = mapper.createArrayNode()
    cs.foreach(c => arr.add(renderCond(c)))
    o.set[JsonNode](name, arr)
    o
  }

  private def condPair(name: String, l: Expr, r: Expr): JsonNode = {
    val o = mapper.createObjectNode()
    val arr = mapper.createArrayNode()
    arr.add(renderExpr(l)); arr.add(renderExpr(r))
    o.set[JsonNode](name, arr)
    o
  }

  def jvalueToNode(v: JValue): JsonNode = v match {
    case JNull => mapper.nullNode()
    case JBool(b) => mapper.getNodeFactory.booleanNode(b)
    case JLong(n) => mapper.getNodeFactory.numberNode(n)
    case JDouble(n) => mapper.getNodeFactory.numberNode(n)
    case JString(s) => mapper.getNodeFactory.textNode(s)
    case JArray(items) =>
      val arr = mapper.createArrayNode()
      items.foreach(i => arr.add(jvalueToNode(i)))
      arr
    case JObject(fields) =>
      val o = mapper.createObjectNode()
      fields.foreach { case (k, fv) => o.set[JsonNode](k, jvalueToNode(fv)) }
      o
  }

  private def startLabel(e: Expr): String = e match {
    case ERef(scope, path) => refString(scope, path)
    case ELit(_) => "value"
    case EOp(op, _) => op
    case EPipe(_, _) => "pipe"
    case ECond(_) => "cond"
  }

  private def stepLabel(s: PipeStep): String = s match {
    case SOp(op, _) => op
    case SLet(_) => "let"
    case SIf(_, _, _) => "if"
    case SMap(_) => "map"
    case SValue(ERef(scope, path)) => refString(scope, path)
    case SValue(_) => "value"
  }

  private def soloLabel(e: Expr): String = e match {
    case ERef(_, _) => "source"
    case ELit(_) => "value"
    case _ => "expr"
  }
}
