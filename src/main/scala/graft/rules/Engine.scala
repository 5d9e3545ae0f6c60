package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Model._
import ExprCompiler._

/** The rule engine: RuleFile + input DataFrame + context value → output
  * DataFrame. The whole rule compiles to ONE declarative Spark plan —
  * filter → projection chain → (finalize sort/offset/limit) — so Catalyst
  * gets full visibility: record_when predicates push into the scan, unused
  * input columns prune away, and the mapping chain collapses into a single
  * whole-stage-codegen projection.
  *
  * Reference lifecycle being reproduced (transform.rs:412-531):
  * record_when → ordered mappings (later mappings see earlier @out values)
  * → per-mapping when/default/required/cast → finalize filter/sort/
  * offset/limit.
  */
object Engine {

  final case class EngineError(message: String) extends RuntimeException(message)

  /** The reference's TransformWarning (error.rs:127): a non-fatal,
    * per-record diagnostic produced when a `when` / `record_when`
    * condition errors at eval time — the mapping or record is skipped and
    * the run continues (transform.rs:1041-1091). */
  final case class Warning(kind: String, path: String, message: String)

  /** Loads branch sub-rule files by the path string written in the rule. */
  type RuleLoader = String => RuleFile
  val noLoader: RuleLoader =
    p => throw EngineError(s"no rule loader configured (branch path: $p)")

  /** Filesystem loader resolving branch paths against a base directory. */
  def fileLoader(baseDir: String): RuleLoader = { p =>
    val path = java.nio.file.Paths.get(baseDir).resolve(p)
    YamlParser.parse(java.nio.file.Files.readString(path))
  }

  /** Compiled rule: the filtered input (with a stable __order column), the
    * ordered map of top-level output fields as (value, missing) pairs, and
    * — in warnings mode — the per-row keep predicate (record-level drops
    * are NOT filtered out of `df` so dropped records' warnings survive)
    * plus the per-row warning struct columns in reference emission order. */
  private case class Compiled(df: DataFrame,
      out: scala.collection.immutable.ListMap[String, CE], env: Env,
      keep: Column = lit(true), warns: Seq[Column] = Nil)

  private def compilePlan(rule: RuleFile, input: DataFrame, context: JValue,
      nullAsMissing: Boolean, ruleLoader: RuleLoader,
      collectWarnings: Boolean = false): Compiled = {
    // stable input order for finalize's stable sort: monotonically
    // increasing id encodes (partition, offset) = scan order, captured
    // before any shuffle. Only attached when a finalize sort will consume
    // it — it is unsupported on streaming inputs and dead weight otherwise.
    // __order also serializes warning emission (batch only — streams
    // cannot host monotonically_increasing_id, and the streaming warnings
    // shape is per-row anyway, no cross-row ordering needed)
    val needsOrder = (rule.finalizeSpec.exists(_.sort.isDefined) ||
      collectWarnings) && !input.isStreaming
    val ordered = input.withColumn("__order",
      if (needsOrder) monotonically_increasing_id() else lit(0L))
    val baseResolver = resolveFromSchema(
      input.schema.fields.map(f => f.name -> f.dataType).toSeq, col(_))
    // Spark's JSON reader conflates absent fields with explicit nulls; for
    // such sources the faithful reading of a null input ref is MISSING
    // (the reference's JSON ingest distinguishes them, transform.rs:902-941)
    val inputResolver: Seq[String] => CE =
      if (nullAsMissing) baseResolver.andThen(ce =>
        // identity of the static-missing CE is preserved (ops test it);
        // variant fields already distinguish absent (SQL null) from
        // explicit JSON null (variant null), so they pass through
        if ((ce eq CE.missing) || ce.tpe == org.apache.spark.sql.types.VariantType) ce
        else CE(ce.value, ce.missing || ce.value.isNull, ce.tpe))
      else baseResolver
    var env = Env(input = inputResolver, context = context)

    var df = ordered
    // record-level keep state: in warnings mode, record drops accumulate
    // here instead of filtering `df`, so a dropped record's earlier
    // warnings still reach the side channel (the reference extends the
    // warning vec even when apply_rule_to_record returns None)
    var keepCol: Column = lit(true)
    val warns = scala.collection.mutable.ArrayBuffer.empty[Column]

    /** Apply a record-level keep predicate. A predicate that can raise is
      * wrapped in [[CaughtCond]] so an eval error drops the record (plus a
      * warning in warnings mode) instead of aborting the job —
      * eval_record_when semantics (transform.rs:1065-1091). Pure
      * predicates keep their plain, pushdown-friendly filter form —
      * even in warnings mode, as long as no warning site precedes the
      * drop: a record dropped by a pure predicate carries no warning of
      * its own, so filtering it away is only wrong if it might already
      * hold earlier warnings (then the drop must become keep-state so
      * those warnings still reach the side channel). */
    def applyRecordPred(raw: Column, path: String): Unit =
      if (CaughtCond.canRaise(raw)) {
        val cc = CaughtCond(raw, path)
        if (collectWarnings) {
          warns += when(keepCol && cc.getField("kind").isNotNull,
            struct(cc.getField("kind").as("kind"), cc.getField("path").as("path"),
              cc.getField("message").as("message")))
          keepCol = keepCol && cc.getField("ok")
        } else df = df.filter(cc.getField("ok"))
      } else {
        if (collectWarnings && warns.nonEmpty)
          keepCol = keepCol && coalesce(raw, lit(false))
        else df = df.filter(raw) // filter drops null = false; no coalesce (it blocks pushdown)
      }

    // record_when: false or error ⇒ record dropped (transform.rs:1065-1091)
    rule.recordWhen.foreach { cond =>
      val c = compileCond(cond, env.copy(errPath = "record_when"))
      applyRecordPred(c.value && !c.missing, "record_when")
    }

    // ordered mappings + steps IN ORDER: later steps see @out as built so
    // far (mappings after a branch read the branch's merged fields —
    // transform.rs:431-531). No per-record interpretation anywhere.
    // pathPrefix threads the reference's error-path identity
    // (mappings[i] / steps[i].mappings[j]) into raised errors.
    var out = scala.collection.immutable.ListMap.empty[String, CE]
    def applyMappings(ms: Seq[Mapping], pathPrefix: String): Unit = {
      // snapshot: a mapping's when-warning only fires on records still
      // alive when the mapping runs (dropped records never evaluate it)
      val alive = keepCol
      for ((m, mi) <- ms.zipWithIndex) {
        val onWarn: Column => Unit =
          if (collectWarnings) w => warns += when(alive, w) else _ => ()
        val mapped = compileMapping(m, env.copy(out = out), s"$pathPrefix[$mi]", onWarn)
        val key = m.target.head
        val merged = if (m.target.size == 1) mapped
          else nest(out.get(key), m.target.tail, mapped)
        out = out + (key -> merged)
      }
    }
    applyMappings(rule.mappings, "mappings")

    var replaced = false // branch return:true ends step processing
    for ((s, si) <- rule.steps.zipWithIndex if !replaced) s match {
      case StepMappings(ms) => applyMappings(ms, s"steps[$si].mappings")
      case StepRecordWhen(cond) =>
        val c = compileCond(cond,
          env.copy(out = out, errPath = s"steps[$si].record_when"))
        applyRecordPred(c.value && !c.missing, s"steps[$si].record_when")
      case StepAsserts(asserts) =>
        // asserts are hard errors (AssertionFailed aborts the transform),
        // but only for records still alive — in warnings mode dead rows
        // ride along in df, so the raise must be gated on the keep state
        val alive = keepCol
        for ((a, ai) <- asserts.zipWithIndex) {
          val c = compileCond(a.when, env.copy(out = out))
          df = df.filter(
            when(alive && !coalesce(c.value, lit(false)),
              RmError.raiseCol("AssertionFailed", s"steps[$si].asserts[$ai]",
                s"${a.code}: ${a.message}").cast(BooleanType))
              .otherwise(lit(true)))
        }
      case StepBranch(cond, thenPath, elsePath, ret) =>
        val c = compileCond(cond, env.copy(out = out, errPath = s"steps[$si].when"))
        val rawKeep = coalesce(c.value, lit(false)) && !c.missing
        // a branch condition that errors routes to the else side plus a
        // warning, like any other when (eval_when, transform.rs:1041-1063)
        val keep =
          if (CaughtCond.canRaise(rawKeep)) {
            val cc = CaughtCond(rawKeep, s"steps[$si].when")
            if (collectWarnings) {
              val alive = keepCol
              warns += when(alive && cc.getField("kind").isNotNull,
                struct(cc.getField("kind").as("kind"), cc.getField("path").as("path"),
                  cc.getField("message").as("message")))
            }
            cc.getField("ok")
          } else rawKeep
        val alive = keepCol
        val onThenWarn: Column => Unit =
          if (collectWarnings) w => warns += when(alive && keep, w) else _ => ()
        val onElseWarn: Column => Unit =
          if (collectWarnings) w => warns += when(alive && !keep, w) else _ => ()
        val thenC = compileSubRule(ruleLoader(thenPath), out, env, onThenWarn)
        val elseC = elsePath.map(p => compileSubRule(ruleLoader(p), out, env, onElseWarn))
        // sub-rule record_when / per-record finalize drops apply only to
        // the records routed to that side
        val rowKeep = when(keep, thenC.keep.getOrElse(lit(true)))
          .otherwise(elseC.flatMap(_.keep).getOrElse(lit(true)))
        // same pure-drop rule as applyRecordPred: only records that might
        // already carry warnings must survive their drop
        if (collectWarnings && warns.nonEmpty)
          keepCol = keepCol && coalesce(rowKeep, lit(false))
        else df = df.filter(rowKeep)
        val branchOut = mergeBranchOutputs(keep, thenC.out,
          elseC.map(_.out).getOrElse(scala.collection.immutable.ListMap.empty[String, CE]))
        if (ret) { out = branchOut; replaced = true } // output replaced, stop
        else out = deepMergeOut(out, branchOut)
    }
    env = env.copy(out = out)
    Compiled(df, out, env, keepCol, warns.toSeq)
  }

  /** A compiled branch sub-rule: its output fields plus an optional
    * per-record keep predicate (record_when / per-record finalize drops). */
  private case class SubCompiled(
      out: scala.collection.immutable.ListMap[String, CE],
      keep: Option[Column])

  /** Compile a branch sub-rule: its @input is the CURRENT @out
    * (transform.rs:491-527). The sub-transform runs PER RECORD — its whole
    * "record set" is the one record being branched — so record_when and
    * finalize compile to per-record predicates and projections: filter/
    * record_when gate the record, offset≥1 or limit=0 drop it, sort is a
    * no-op, and wrap sees @out as the one-record array (tv40/tv41). */
  private def compileSubRule(sub: RuleFile,
      out: scala.collection.immutable.ListMap[String, CE], outer: Env,
      onWarn: Column => Unit = _ => ()): SubCompiled = {
    val subInput: Seq[String] => CE = {
      case Seq() =>
        CE.present(struct(out.map { case (n, ce) => ce.valueOrNull.as(n) }.toSeq: _*),
          StructType(out.map { case (n, ce) => StructField(n, ce.tpe) }.toSeq))
      case Seq(head, rest @ _*) =>
        out.get(head).map(descend(_, rest)).getOrElse(CE.missing)
    }
    val subEnv = Env(input = subInput, context = outer.context)
    var keep: Option[Column] = sub.recordWhen.map { cond =>
      val c = compileCond(cond, subEnv.copy(errPath = "record_when"))
      val raw = coalesce(c.value, lit(false)) && !c.missing
      if (CaughtCond.canRaise(raw)) {
        val cc = CaughtCond(raw, "record_when")
        onWarn(when(cc.getField("kind").isNotNull,
          struct(cc.getField("kind").as("kind"), cc.getField("path").as("path"),
            cc.getField("message").as("message"))))
        cc.getField("ok")
      } else raw
    }
    // a record the sub-rule's record_when dropped never evaluates the
    // sub-rule's mappings, so its when-warnings are gated on the keep
    val subAlive = keep.getOrElse(lit(true))
    val onSubWarn: Column => Unit = w => onWarn(when(subAlive, w))
    var subOut = scala.collection.immutable.ListMap.empty[String, CE]
    val ms = sub.mappings ++ sub.steps.collect { case StepMappings(m) => m }.flatten
    for ((m, mi) <- ms.zipWithIndex) {
      val mapped = compileMapping(m, subEnv.copy(out = subOut), s"mappings[$mi]", onSubWarn)
      val key = m.target.head
      val merged = if (m.target.size == 1) mapped
        else nest(subOut.get(key), m.target.tail, mapped)
      subOut = subOut + (key -> merged)
    }
    sub.finalizeSpec.foreach { fin =>
      val recType = StructType(subOut.map { case (n, ce) => StructField(n, ce.tpe) }.toSeq)
      val rec = struct(subOut.map { case (n, ce) => ce.valueOrNull.as(n) }.toSeq: _*)
      val itemCE = CE.present(rec, recType)
      val finEnv = Env(
        input = { path => path.headOption.flatMap(subOut.get)
          .map(ce => descend(ce, path.tail)).getOrElse(CE.missing) },
        context = outer.context, item = Some(itemCE), itemIndex = Some(lit(0L)))
      fin.filter.foreach { cond =>
        val c = compileCond(cond, finEnv)
        val p = coalesce(c.value, lit(false)) && !c.missing
        keep = Some(keep.map(_ && p).getOrElse(p))
      }
      fin.offset.foreach { n =>
        if (n >= 1) keep = Some(lit(false))
      }
      fin.limit.foreach { n =>
        if (n <= 0) keep = Some(lit(false))
      }
      if (fin.wrap.nonEmpty) {
        val wenv = Env(input = _ => CE.missing, context = outer.context,
          outWhole = Some(CE.present(array(rec), ArrayType(recType))))
        subOut = scala.collection.immutable.ListMap(
          fin.wrap.map { case (n, wv) => n -> compileWrap(wv, wenv) }: _*)
      }
    }
    SubCompiled(subOut, keep)
  }

  /** Route each record's branch outputs by the condition: a field produced
    * only by one side is missing on the other side's records. */
  private def mergeBranchOutputs(keep: Column,
      thenOut: scala.collection.immutable.ListMap[String, CE],
      elseOut: scala.collection.immutable.ListMap[String, CE])
      : scala.collection.immutable.ListMap[String, CE] = {
    val keys = (thenOut.keys ++ elseOut.keys.filterNot(thenOut.contains)).toSeq
    scala.collection.immutable.ListMap(keys.map { k =>
      val ce = (thenOut.get(k), elseOut.get(k)) match {
        case (Some(t), Some(e)) =>
          CE(when(keep, t.value).otherwise(e.value.cast(t.tpe)),
            when(keep, t.missing).otherwise(e.missing), t.tpe)
        case (Some(t), None) =>
          CE(when(keep, t.value), !keep || t.missing, t.tpe)
        case (None, Some(e)) =>
          CE(when(!keep, e.value), keep || e.missing, e.tpe)
        case (None, None) => CE.missing
      }
      k -> ce
    }: _*)
  }

  /** deep-merge branch output into @out (return:false): produced fields
    * overwrite per row; fields the branch didn't produce (missing on that
    * row) keep their existing value (merge semantics transform.rs:533-564). */
  private def deepMergeOut(
      out: scala.collection.immutable.ListMap[String, CE],
      branch: scala.collection.immutable.ListMap[String, CE])
      : scala.collection.immutable.ListMap[String, CE] = {
    var result = out
    for ((k, b) <- branch) {
      val merged = out.get(k) match {
        case Some(old) if old.tpe == b.tpe =>
          CE(when(!b.missing, b.value).otherwise(old.value),
            b.missing && old.missing, b.tpe)
        case Some(old) if old.tpe.isInstanceOf[StructType] && b.tpe.isInstanceOf[StructType] =>
          // differently-shaped objects DEEP-merge (tv42: branch adds
          // user.name next to the existing user.id); rows where the branch
          // produced nothing keep the old object padded to the merged shape
          val m = ExprCompiler.mergeStructs(old, b, deep = true)
          val mt = m.tpe.asInstanceOf[StructType]
          val oldNames = old.tpe.asInstanceOf[StructType].fieldNames.toSet
          val oldPadded = struct(mt.fields.toSeq.map { f =>
            (if (oldNames.contains(f.name)) old.value.getField(f.name)
             else lit(null).cast(f.dataType)).as(f.name)
          }: _*)
          CE(when(!b.missing, m.value).otherwise(oldPadded),
            b.missing && old.missing, m.tpe)
        case _ => b // new field, or scalar type change ⇒ overwrite
      }
      result = result + (k -> merged)
    }
    result
  }

  /** Typed-DataFrame sink: one column per top-level target; missing
    * collapses to null at this typed boundary. With finalize.wrap the
    * result is ONE row of the wrap fields (@out = the whole output array —
    * wrap is a driver-edge collect point, like the reference's full
    * materialization, transform.rs:707-749). */
  def transform(rule: RuleFile, input: DataFrame, context: JValue = JNull,
      nullAsMissing: Boolean = false, ruleLoader: RuleLoader = noLoader): DataFrame = {
    val c = compilePlan(rule, input, context, nullAsMissing, ruleLoader)
    val outCols = c.out.map { case (name, ce) => ce.valueOrNull.as(name) }.toSeq
    val projected = applyFinalize(rule, c.df.select(outCols :+ col("__order"): _*), context)
      .drop("__order")
    rule.finalizeSpec.filter(_.wrap.nonEmpty) match {
      case Some(fin) =>
        val (single, wenv) = wrapScope(projected, c.out, context)
        val wrapped = fin.wrap.map { case (n, wv) => n -> compileWrap(wv, wenv) }
        single.select(wrapped.map { case (n, ce) => ce.valueOrNull.as(n) }: _*)
      case None => projected
    }
  }

  /** Collect the (finalized, ordered) output into one row and build the
    * wrap evaluation scope where bare @out is the whole record array. */
  private def wrapScope(projected: DataFrame,
      out: scala.collection.immutable.ListMap[String, CE], context: JValue)
      : (DataFrame, Env) = {
    val recType = StructType(out.map { case (n, ce) => StructField(n, ce.tpe) }.toSeq)
    val rec = struct(out.keys.map(col).toSeq: _*)
    // coalesce(1) after the finalize sort keeps global order in the single
    // partition, so collect_list preserves the output array order
    val single = projected.coalesce(1).agg(collect_list(rec).as("__all"))
    val wenv = Env(input = _ => CE.missing, context = context,
      outWhole = Some(CE.present(col("__all"), ArrayType(recType))))
    (single, wenv)
  }

  private def compileWrap(w: WrapValue, env: Env): CE = w match {
    case WExpr(e) => ExprCompiler.compile(e, env)
    case WObject(fields) =>
      val cs = fields.map { case (n, v) => n -> compileWrap(v, env) }
      CE(struct(cs.map { case (n, ce) => ce.valueOrNull.as(n) }: _*), lit(false),
        StructType(cs.map { case (n, ce) => StructField(n, ce.tpe) }))
  }

  /** Reference-exact JSON sink: missing fields are ABSENT from the output
    * object, null fields are explicit nulls (the reference's load-bearing
    * distinction, docs/rules_spec_en.md:428-430). Target paths are static,
    * so the object is assembled at plan time from per-field JSON fragments —
    * one concat per record, fully codegen'd, no driver loop. */
  def toJsonRecords(rule: RuleFile, input: DataFrame, context: JValue = JNull,
      nullAsMissing: Boolean = false, ruleLoader: RuleLoader = noLoader): DataFrame =
    jsonSink(rule, compilePlan(rule, input, context, nullAsMissing, ruleLoader), context)

  /** The reference's transform_with_warnings (transform.rs:194-249): the
    * JSON output plus the warnings side channel as a second DataFrame
    * (kind, path, message — reference emission order: record order, and
    * within a record, record_when first then mappings in order). Dropped
    * records keep their warnings: the output plan filters on the keep
    * predicate while the warnings plan reads every record. */
  final case class JsonWithWarnings(output: DataFrame, warnings: DataFrame)

  def toJsonRecordsWithWarnings(rule: RuleFile, input: DataFrame,
      context: JValue = JNull, nullAsMissing: Boolean = false,
      ruleLoader: RuleLoader = noLoader): JsonWithWarnings = {
    val c = compilePlan(rule, input, context, nullAsMissing, ruleLoader,
      collectWarnings = true)
    val output = jsonSink(rule, c.copy(df = c.df.filter(c.keep)), context)
    val warnings =
      if (c.warns.isEmpty)
        c.df.select(lit("").as("kind"), lit("").as("path"), lit("").as("message"))
          .limit(0)
      else c.df
        .select(col("__order"), array(c.warns: _*).as("__w"))
        // posexplode: the within-record position is part of the sort key —
        // relying on sort stability for equal __order rows is not a Spark
        // contract (an external-sort spill may interleave equal keys)
        .select(col("__order"),
          posexplode(filter(col("__w"), w => w.isNotNull)).as(Seq("__pos", "w")))
        .orderBy("__order", "__pos")
        .select(col("w.kind").as("kind"), col("w.path").as("path"),
          col("w.message").as("message"))
    JsonWithWarnings(output, warnings)
  }

  /** Collect a warnings DataFrame into reference-shaped [[Warning]]s. */
  def collectWarnings(warnings: DataFrame): Seq[Warning] =
    warnings.collect().toSeq.map(r => Warning(r.getString(0), r.getString(1), r.getString(2)))

  /** Streaming-compatible warnings shape: ONE DataFrame carrying the
    * typed output columns plus `_kept` (record survived) and `_warnings`
    * (array<struct<kind,path,message>>, the record's own warnings in
    * order) — the per-item (output, warnings) pairs of the reference's
    * transform_stream (transform.rs:87-161), expressible under a
    * streaming sink where a second side-channel DataFrame cannot exist.
    * Rows are emitted when kept OR warned; no global sort or collect, so
    * it composes with readStream. Finalize (banned in stream mode
    * anyway) is not applied. */
  def transformWithWarningsColumn(rule: RuleFile, input: DataFrame,
      context: JValue = JNull, nullAsMissing: Boolean = false,
      ruleLoader: RuleLoader = noLoader): DataFrame = {
    require(rule.finalizeSpec.isEmpty,
      "transformWithWarningsColumn does not apply finalize (stream shape)")
    val c = compilePlan(rule, input, context, nullAsMissing, ruleLoader,
      collectWarnings = true)
    val warnsCol =
      if (c.warns.isEmpty) array().cast(ArrayType(CaughtCond.warningSchema))
      else filter(array(c.warns: _*), w => w.isNotNull)
    val outCols = c.out.map { case (name, ce) => ce.valueOrNull.as(name) }.toSeq
    c.df.select(outCols ++ Seq(c.keep.as("_kept"), warnsCol.as("_warnings")): _*)
      .filter(col("_kept") || size(col("_warnings")) > 0)
  }

  /** Per-item shape of the reference's transform_stream
    * (transform.rs:163-190) for the CLI's NDJSON mode: one row per input
    * record that survived OR warned, in record order, carrying `json`
    * (null when the record was dropped — the reference item's
    * `output: None`) and `warnings` (the record's own warnings in
    * emission order). The CLI interleaves: each item's warnings go to
    * stderr before that item's output line (main.rs:350-377). Finalize
    * is banned in stream mode; callers reject it before compiling. */
  def ndjsonWithWarnings(rule: RuleFile, input: DataFrame,
      context: JValue = JNull, nullAsMissing: Boolean = false,
      ruleLoader: RuleLoader = noLoader): DataFrame = {
    require(rule.finalizeSpec.isEmpty, "finalize is not supported in stream mode")
    val c = compilePlan(rule, input, context, nullAsMissing, ruleLoader,
      collectWarnings = true)
    val frags = c.out.toSeq.map { case (name, ce) =>
      when(ce.missing, lit(null).cast(StringType))
        .otherwise(concat(lit("\"" + name + "\":"), jsonEncode(ce.valueOrNull, ce.tpe)))
    }
    val recordJson = concat(lit("{"), concat_ws(",", frags: _*), lit("}"))
    val warnsCol =
      if (c.warns.isEmpty) array().cast(ArrayType(CaughtCond.warningSchema))
      else filter(array(c.warns: _*), w => w.isNotNull)
    // when() treats a null keep predicate as false — same drop semantics
    // as the filter() in toJsonRecordsWithWarnings
    c.df.select(col("__order"), when(c.keep, recordJson).as("json"),
        warnsCol.as("warnings"))
      .filter(col("json").isNotNull || size(col("warnings")) > 0)
      .orderBy("__order")
      .select("json", "warnings")
  }

  private def jsonSink(rule: RuleFile, c: Compiled, context: JValue): DataFrame = {
    val cols = c.out.map { case (name, ce) => ce.valueOrNull.as(name) }.toSeq ++
      c.out.map { case (name, ce) => ce.missing.as(s"__miss_$name") }.toSeq
    val projected = applyFinalize(rule, c.df.select(cols :+ col("__order"): _*), context)
    val frags = c.out.keys.toSeq.map { name =>
      val enc = jsonEncode(col(name), projected.schema(name).dataType)
      when(col(s"__miss_$name"), lit(null).cast(StringType))
        .otherwise(concat(lit("\"" + name + "\":"), enc))
    }
    val recordJson = concat(lit("{"), concat_ws(",", frags: _*), lit("}"))
    rule.finalizeSpec.filter(_.wrap.nonEmpty) match {
      case Some(fin) =>
        // wrap ⇒ output is ONE JSON object. A wrap value that is exactly
        // `@out` renders the pre-built per-record JSON (missing fields stay
        // absent inside records); other exprs evaluate over the value array.
        val recType = StructType(c.out.map { case (n, ce) => StructField(n, ce.tpe) }.toSeq)
        val rec = struct(c.out.keys.map(col).toSeq: _*)
        val single = projected.coalesce(1).agg(
          collect_list(rec).as("__all"), collect_list(recordJson).as("__alljson"))
        val wenv = Env(input = _ => CE.missing, context = context,
          outWhole = Some(CE.present(col("__all"), ArrayType(recType))))
        def wrapJson(w: WrapValue): Column = w match {
          case WExpr(ERef(ROut, Seq())) =>
            concat(lit("["), array_join(col("__alljson"), ","), lit("]"))
          case WExpr(e) =>
            val ce = ExprCompiler.compile(e, wenv)
            jsonEncode(ce.valueOrNull, ce.tpe)
          case WObject(fields) =>
            concat(lit("{"), concat_ws(",", fields.map { case (n, v) =>
              concat(lit("\"" + n + "\":"), wrapJson(v))
            }: _*), lit("}"))
        }
        val objFrags = fin.wrap.map { case (n, wv) =>
          concat(lit("\"" + n + "\":"), wrapJson(wv))
        }
        single.select(
          concat(lit("{"), concat_ws(",", objFrags: _*), lit("}")).as("json"))
      case None => projected.select(recordJson.as("json"))
    }
  }

  /** JSON-encode one value column (variant-aware; ExprCompiler owns the
    * encoding so op-level fragments and the sink agree byte-for-byte). */
  private def jsonEncode(c: Column, t: DataType): Column =
    ExprCompiler.jsonFragment(c, t)

  // finalize (transform.rs:603-714): filter → stable sort → offset → limit
  private def applyFinalize(rule: RuleFile, dfIn: DataFrame, context: JValue): DataFrame = {
    var result = dfIn
    rule.finalizeSpec.foreach { fin =>
      val outSchema = result.schema.fields
        .filterNot(f => f.name == "__order" || f.name.startsWith("__miss_"))
        .map(f => f.name -> f.dataType).toSeq
      // @item in finalize = the whole output record (docs/rules_spec: the
      // finalize filter runs over each output record)
      val fields = result.schema.fields
        .filterNot(f => f.name == "__order" || f.name.startsWith("__miss_"))
      val itemCE = CE.present(
        struct(fields.map(f => col(f.name)).toSeq: _*),
        StructType(fields.toSeq))
      fin.filter.foreach { cond =>
        // @item.index = 0-based output-record index (tv39): a window over
        // the stable __order — materialized as a column since window
        // expressions cannot live inside a WHERE clause
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("__order"))
        val withIdx = result.withColumn("__idx",
          row_number().over(w).cast(org.apache.spark.sql.types.LongType) - 1L)
        val finEnv = Env(input = resolveFromSchema(outSchema, col(_)), context = context,
          item = Some(itemCE), itemIndex = Some(col("__idx")))
        val c = compileCond(cond, finEnv)
        result = withIdx.filter(c.value && !c.missing).drop("__idx")
      }
      fin.sort.foreach { s =>
        val key = resolveFromSchema(outSchema, col(_))(s.by)
        // a sort key no mapping produces is a rule error, not an empty sort
        // (apply_finalize rejects unknown keys — transform.rs:636-650)
        if (key eq CE.missing)
          throw RmError("InvalidRef", "finalize.sort.by",
            s"unknown sort key: ${s.by.mkString(".")}")
        val k = if (s.descending) key.value.desc else key.value.asc
        result = result.orderBy(k, col("__order").asc) // stable: ties keep input order
      }
      fin.offset.foreach(n => result = result.offset(n))
      fin.limit.foreach(n => result = result.limit(n))
    }
    result
  }

  /** One mapping: when-gate → expr → default/required → cast
    * (eval_mapping, transform.rs:953-1039). `pathBase` is the reference
    * error path of this mapping (e.g. "mappings[0]"). A when-condition
    * that errors at eval time skips the mapping and reports through
    * `onWarn` (eval_when, transform.rs:1041-1063) instead of aborting. */
  private def compileMapping(m: Mapping, env: Env, pathBase: String,
      onWarn: Column => Unit = _ => ()): CE = {
    val base = ExprCompiler.compile(m.expr, env.copy(errPath = s"$pathBase.expr"))

    // when gate FIRST (eval_when, transform.rs:1041-1063): a skipped mapping
    // never evaluates default/required — the required-error below must be
    // guarded by `keep` or skipped records would raise it
    val keep: Column = m.when match {
      case Some(cond) =>
        val c = compileCond(cond, env.copy(errPath = s"$pathBase.when"))
        val raw = coalesce(c.value, lit(false)) && !c.missing
        if (CaughtCond.canRaise(raw)) {
          val cc = CaughtCond(raw, s"$pathBase.when")
          onWarn(when(cc.getField("kind").isNotNull,
            struct(cc.getField("kind").as("kind"), cc.getField("path").as("path"),
              cc.getField("message").as("message"))))
          cc.getField("ok")
        } else raw
      case None => lit(true)
    }

    // default: missing → default value; required+missing/null → error
    // (MissingRequired at the mapping path, transform.rs:1007-1030)
    val withDefault = m.default match {
      case Some(d) =>
        val dc = jvalueCE(d)
        val tpe = if (base.tpe == NullType) dc.tpe else base.tpe
        CE(when(base.missing, dc.value.cast(tpe)).otherwise(base.value.cast(tpe)),
          lit(false), tpe)
      case None if m.required =>
        // a statically-missing required ref has NullType, whose JSON
        // encoding is a constant — widen so the raising column is actually
        // read by the sink and the error fires per kept record (p02)
        val tpe = if (base.tpe == NullType) StringType else base.tpe
        CE(when(keep && (base.missing || base.value.isNull),
          RmError.raiseCol("MissingRequired", pathBase, "required value is missing")
            .cast(tpe)).otherwise(base.value.cast(tpe)), lit(false), tpe)
      case None => base
    }

    // type cast: string|int|float|bool, strict (cast_value
    // transform.rs:5925-6002): TypeCastFailed at "<mapping>.type"
    val casted = m.castTo match {
      case Some(t) => ExprCompiler.strictCast(withDefault, t, s"$pathBase.type")
      case None => withDefault
    }

    // when false ⇒ skipped ⇒ missing (field absent)
    if (m.when.isEmpty) casted
    else CE(when(keep, casted.value).otherwise(lit(null).cast(casted.tpe)),
      casted.missing || !keep, casted.tpe)
  }

  /** Merge a value into a nested struct target path (set_path semantics,
    * transform.rs:6075-6138 — objects only, conflicts are validation
    * errors). */
  private def nest(existing: Option[CE], path: Seq[String], value: CE): CE = {
    if (path.isEmpty) value
    else {
      val childExisting = existing.flatMap { e =>
        e.tpe match {
          case st: StructType if st.fieldNames.contains(path.head) =>
            Some(CE(e.value.getField(path.head), e.missing, st(path.head).dataType))
          case _ => None
        }
      }
      val child = nest(childExisting, path.tail, value)
      val siblings: Seq[(String, CE)] = existing match {
        case Some(e) => e.tpe match {
          case st: StructType =>
            st.fields.filterNot(_.name == path.head).map(f =>
              f.name -> CE(e.value.getField(f.name), e.missing, f.dataType)).toSeq
          case _ => Nil
        }
        case None => Nil
      }
      val all = siblings :+ (path.head -> child)
      CE(struct(all.map { case (n, ce) => ce.valueOrNull.as(n) }: _*),
        lit(false),
        StructType(all.map { case (n, ce) => StructField(n, ce.tpe) }))
    }
  }

  /** Single-record expression evaluation for the serving edge (endpoint
    * reply status/body, network url/body): the SAME compiled Column the
    * batch plans use, driven over a one-row DataFrame. Returns the JSON
    * encoding of the value, or None when the expression is missing. */
  /** `prefix` re-roots `@input` below a wrapper column — the serving edge
    * wraps non-object pipeline values (arrays) as {"__v": value} so the
    * same schema-driven resolver applies. */
  private def singleRecordEnv(input: DataFrame, context: JValue,
      prefix: Seq[String]): ExprCompiler.Env = {
    val base = resolveFromSchema(
      input.schema.fields.map(f => f.name -> f.dataType).toSeq, col(_))
    ExprCompiler.Env(
      input = if (prefix.isEmpty) base else (path => base(prefix ++ path)),
      context = context)
  }

  def evalExprJson(e: Expr, input: DataFrame, context: JValue,
      prefix: Seq[String] = Nil): Option[String] = {
    val ce = ExprCompiler.compile(e, singleRecordEnv(input, context, prefix))
    val row = input.limit(1)
      .select(ExprCompiler.jsonFragment(ce.valueOrNull, ce.tpe).as("v"),
        coalesce(ce.missing, lit(false)).as("m"))
      .collect()(0)
    if (row.getBoolean(1) || row.isNullAt(0)) None else Some(row.getString(0))
  }

  /** Single-record condition evaluation (endpoint step `when`). */
  def evalCondOnce(c: Cond, input: DataFrame, context: JValue,
      prefix: Seq[String] = Nil): Boolean = {
    val ce = compileCond(c, singleRecordEnv(input, context, prefix))
    val row = input.limit(1)
      .select((coalesce(ce.value, lit(false)) && !ce.missing).as("v")).collect()(0)
    row.getBoolean(0)
  }

  /** Env over a trace-builder row `{__rec: <record>, __out: <out-so-far>}`:
    * `@input` resolves below __rec, `@out` below __out — the environment a
    * mapping sees mid-rule, reconstructed for per-op trace capture. */
  private def traceRowEnv(input: DataFrame, context: JValue): ExprCompiler.Env = {
    val base = resolveFromSchema(
      input.schema.fields.map(f => f.name -> f.dataType).toSeq, col(_))
    val outFields: Seq[String] = input.schema.fields.find(_.name == "__out")
      .map(_.dataType) match {
        case Some(st: StructType) => st.fieldNames.toSeq
        case _ => Nil
      }
    ExprCompiler.Env(
      input = path => base(Seq("__rec") ++ path),
      context = context,
      out = outFields.map(n => n -> base(Seq("__out", n))).toMap)
  }

  /** Batch single-record evaluation of MANY expressions in ONE job over a
    * `{__rec, __out}` trace row — the endpoint trace builder evaluates
    * every pipe prefix of a mapping this way (k+1 prefixes = one collect,
    * not k+1). Per-expression: Some(json) when present, None when missing
    * or failing to compile (trace capture is best-effort — a probe must
    * never fail the request it describes). */
  def evalExprsJsonTrace(exprs: Seq[Expr], input: DataFrame,
      context: JValue): IndexedSeq[Option[String]] = {
    if (exprs.isEmpty) return Vector.empty
    val env = traceRowEnv(input, context)
    val cols = exprs.map { e =>
      try {
        val ce = ExprCompiler.compile(e, env)
        Seq(ExprCompiler.jsonFragment(ce.valueOrNull, ce.tpe),
          coalesce(ce.missing, lit(false)))
      } catch { case scala.util.control.NonFatal(_) =>
        Seq(lit(null).cast(StringType), lit(true)) }
    }
    val row =
      try input.limit(1).select(cols.flatten: _*).collect()(0)
      catch { case scala.util.control.NonFatal(_) =>
        return Vector.fill(exprs.size)(None) }
    exprs.indices.map { i =>
      val (v, m) = (i * 2, i * 2 + 1)
      if (row.getBoolean(m) || row.isNullAt(v)) None else Some(row.getString(v))
    }
  }

  /** Single-record condition over a `{__rec, __out}` trace row; None when
    * the condition fails to evaluate (best-effort, like the exprs). */
  def evalCondTrace(c: Cond, input: DataFrame, context: JValue): Option[Boolean] =
    try {
      val ce = compileCond(c, traceRowEnv(input, context))
      val row = input.limit(1)
        .select((coalesce(ce.value, lit(false)) && !ce.missing).as("v")).collect()(0)
      Some(row.getBoolean(0))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resolver over an ordered (name, type) schema; deeper path segments
    * descend through structs/arrays; unknown head ⇒ missing; the EMPTY path
    * is the whole record as a struct (`@input` bare ref). */
  def resolveFromSchema(fields: Seq[(String, DataType)], colFn: String => Column)
      : Seq[String] => CE = { path =>
    path match {
      case Seq() =>
        CE.present(
          struct(fields.map { case (n, _) => colFn(n).as(n) }: _*),
          StructType(fields.map { case (n, t) => StructField(n, t) }))
      case Seq(head, rest @ _*) =>
        fields.find(_._1 == head) match {
          case Some((_, t)) =>
            // a column whose NAME contains a dot (t08 escaped keys) must be
            // backtick-quoted or col() reads it as a nested field path
            val ref = if (head.exists(c => c == '.' || c == '`'))
              s"`${head.replace("`", "``")}`" else head
            descend(CE.present(colFn(ref), t), rest)
          case None => CE.missing
        }
    }
  }
}
