package graft.endpoint

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rules._
import graft.rules.Model._
import EndpointModel._

/** The serving engine for `endpoint` rules (reference
  * endpoint_engine.rs:321-592): an HTTP request becomes the virtual
  * `@input` record {method, path, query, headers, body}, the endpoint's
  * `input` mappings reshape it, each `steps[]` rule transforms the running
  * record (normal rules through the SAME compiled Catalyst plans the batch
  * engine runs; `network` rules through an outbound HTTP call with
  * timeout/retry/select), and `reply` evaluates status/body v2 exprs over
  * the final record. Errors route through step-then-endpoint `catch` specs
  * keyed by exact status > 4xx/5xx pattern > timeout > default
  * (endpoint_engine.rs:1479-1515). Every request appends a trace.
  *
  * Scale note: this surface exists for request/reply parity with the
  * reference; the 100 TB path is the SAME rule files compiled once over a
  * dataset (Engine.transform) — per-record serving here deliberately reuses
  * those plans rather than maintaining a second interpreter.
  */
class EndpointEngine(
    spark: SparkSession,
    endpointYamlPath: String,
    internalBase: String = "",
    val traces: TraceStore = new TraceStore(),
    // rich trace capture costs probe re-executions per request (see
    // [[EndpointEngine.defaultTraceDetail]]'s cost note); Server/UiServer
    // and the CLI plumb the flag explicitly (--no-trace-detail), with the
    // -Dgraft.trace.detail property as the default
    traceDetail: Boolean = EndpointEngine.defaultTraceDetail) {

  private val mapper = new ObjectMapper()
  private val baseDir: Path =
    Option(Paths.get(endpointYamlPath).getParent).getOrElse(Paths.get("."))
  private val endpointFile: EndpointFile =
    EndpointModel.parseRuleKind(Files.readString(Paths.get(endpointYamlPath))) match {
      case EndpointRule(spec) => spec
      case _ => throw EndpointParseError(s"$endpointYamlPath is not an endpoint rule")
    }
  private val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  // loaded rule files by resolved path (plans compile once per rule)
  private val ruleCache = scala.collection.concurrent.TrieMap.empty[String, RuleKind]

  /** Rich trace capture (records/nodes/op children, reference-shaped) —
    * best-effort probes beside the real execution; see [[TraceDetail]].
    * Branch rules parse once per resolved path (the same plans-compile-once
    * doctrine as ruleCache), not once per traced request. */
  private val branchRuleCache =
    scala.collection.concurrent.TrieMap.empty[Path, RuleFile]
  private lazy val detail = new TraceDetail(spark, { resolved =>
    // only SUCCESSFUL parses cache (the ruleCache doctrine — its body
    // throws and retries): a transient read failure must not disable
    // child traces for this path until restart
    branchRuleCache.get(resolved).orElse {
      val parsed =
        try EndpointModel.parseRuleKind(Files.readString(resolved)) match {
          case NormalRule(rule) => Some(rule)
          case _ => None
        } catch { case NonFatal(_) => None }
      parsed.foreach(r => branchRuleCache.put(resolved, r))
      parsed
    }
  })

  import EndpointEngine.{EndpointError, EndpointFailure, HttpResult}

  // -- request handling ---------------------------------------------------

  /** Handle one request; pure of any server framework so tests can drive
    * it directly. Query is the raw query string (null/empty ok). */
  def handle(method: String, path: String, query: String,
      headers: Seq[(String, String)], body: Option[String]): HttpResult = {
    val started = System.nanoTime()
    val matched = endpointFile.endpoints.iterator
      .flatMap(e => if (e.method == method.toUpperCase)
        e.path.matchPath(path).map(e -> _) else None)
      .nextOption()
    matched match {
      case None => HttpResult(404, Seq("content-type" -> "application/json"),
        """{"error":"no endpoint matched"}""")
      case Some((endpoint, pathParams)) =>
        val trace = new TraceBuilder(method, path, endpointYamlPath)
        val result = runEndpoint(endpoint, pathParams, query, headers, body, trace)
        traces.append(trace.finish(result.status, (System.nanoTime() - started) / 1000))
        result
    }
  }

  private def runEndpoint(endpoint: EndpointDef, pathParams: Map[String, String],
      query: String, headers: Seq[(String, String)], body: Option[String],
      trace: TraceBuilder): HttpResult = {
    // @input = {method, path, query, headers, body?} (build_input_from_parts)
    val inputEither: Either[EndpointError, ObjectNode] =
      try Right(buildInput(endpoint, pathParams, query, headers, body))
      catch {
        case EndpointFailure(e) => Left(e)
        case NonFatal(e) => Left(EndpointError.invalid(e.getMessage))
      }

    var current: JsonNode = inputEither.getOrElse(mapper.createObjectNode())
    var failed: Option[EndpointError] = inputEither.left.toOption
    trace.input(current)

    // reference-shaped record nodes (one per pipeline stage) captured
    // beside the flat steps[] — best-effort: a probe failure degrades to a
    // plain node, never fails the request
    val rnodes = mapper.createArrayNode()
    val origInput = current.deepCopy[JsonNode]()
    def addNode(id: String, label: String, rulePath: Option[String],
        stepIndex: Option[Int], status: String, before: JsonNode,
        durationUs: Long)(enrich: ObjectNode => Unit): Unit =
      if (traceDetail) try {
        val n = mapper.createObjectNode()
        n.put("id", id)
        n.put("kind", "endpoint")
        n.put("label", label)
        n.put("status", status)
        n.set[JsonNode]("input", before)
        n.set[JsonNode]("output",
          if (status == "ok") current.deepCopy[JsonNode]() else mapper.nullNode())
        n.put("duration_us", durationUs)
        val meta = mapper.createObjectNode()
        rulePath.foreach(p => meta.put("rule_ref", p))
        stepIndex.foreach(i => meta.put("step_index", i))
        if (meta.size() > 0) n.set[JsonNode]("meta", meta)
        // a probe failure degrades to a PLAIN node, never a missing one —
        // records[0].nodes must stay in sync with the executed stages
        try enrich(n) catch { case NonFatal(_) => () }
        rnodes.add(n)
      } catch { case NonFatal(_) => () }

    // input mappings reshape @input; their output REPLACES it
    if (failed.isEmpty && endpoint.input.nonEmpty) {
      val inputRule = RuleFile(version = 2, mappings = endpoint.input)
      val before = current.deepCopy[JsonNode]()
      val t0 = System.nanoTime()
      try current = transformValue(inputRule, current, configContext(None, None), baseDir)
      catch {
        case EndpointFailure(e) => failed = Some(e)
        case NonFatal(e) => failed = Some(EndpointError.transform(rootMessage(e)))
      }
      addNode("input", "input", None, None,
          if (failed.isEmpty) "ok" else "error", before,
          (System.nanoTime() - t0) / 1000) { n =>
        val ops = detail.mappingOps(endpoint.input, before,
          mapper.createObjectNode(), configContext(None, None), 0)
        if (ops.size() > 0) n.set[JsonNode]("children", ops)
      }
    }
    failed.foreach { err =>
      runCatch(endpoint.catchSpec, err, current, None) match {
        case Some(next) => current = next; failed = None
        case None => ()
      }
    }

    // steps: output of each becomes the next @input
    if (failed.isEmpty) {
      val it = endpoint.steps.iterator
      var break = false
      var stepIdx = -1
      while (it.hasNext && !break && failed.isEmpty) {
        val step = it.next()
        stepIdx += 1
        val idx = stepIdx
        val before = current.deepCopy[JsonNode]()
        val stepStarted = System.nanoTime()
        def stepDurUs = (System.nanoTime() - stepStarted) / 1000
        // a NormalRule step's child_trace: the rule re-run step-by-step
        // through the trace prefix protocol (TraceDetail.ruleTrace)
        def withChildTrace(n: ObjectNode): Unit = {
          val resolved = baseDir.resolve(step.rulePath).normalize()
          loadRule(step.rulePath) match {
            case NormalRule(rule) =>
              val childBase = Option(resolved.getParent).getOrElse(baseDir)
              n.set[JsonNode]("child_trace", detail.ruleTrace(
                resolved.getFileName.toString, step.rulePath, rule, before,
                configContext(step.withParams, None), childBase,
                Some(current)))
              ()
            case NetworkRule(spec) =>
              n.set[JsonNode]("child_trace", detail.networkTrace(
                resolved.getFileName.toString, step.rulePath, spec, before,
                Some(current), configContext(step.withParams, None),
                stepDurUs))
              ()
            case _ => ()
          }
        }
        val skip = step.when.exists { cond =>
          !evalCond(cond, current, configContext(step.withParams, None))
        }
        if (skip) {
          trace.step(step.rulePath, "skipped", stepDurUs)
          addNode(s"step-$idx", step.rulePath, Some(step.rulePath), Some(idx),
            "skipped", before, stepDurUs)(_ => ())
        } else {
          try {
            current = executeRule(step.rulePath, current, step.withParams)
            trace.step(step.rulePath, "ok", stepDurUs)
            addNode(s"step-$idx", step.rulePath, Some(step.rulePath), Some(idx),
              "ok", before, stepDurUs)(withChildTrace)
          } catch {
            case NonFatal(e) =>
              val err = e match {
                case EndpointFailure(inner) => inner
                case other => EndpointError.transform(rootMessage(other))
              }
              runCatch(step.catchSpec, err, current, step.withParams)
                .orElse {
                  val r = runCatch(endpoint.catchSpec, err, current, None)
                  if (r.isDefined) break = true // endpoint-level catch ends the pipeline
                  r
                } match {
                case Some(next) =>
                  current = next
                  trace.step(step.rulePath, "ok", stepDurUs)
                  addNode(s"step-$idx", step.rulePath, Some(step.rulePath),
                    Some(idx), "ok", before, stepDurUs)(_ => ())
                case None =>
                  failed = Some(err)
                  trace.step(step.rulePath, "error", stepDurUs)
                  addNode(s"step-$idx", step.rulePath, Some(step.rulePath),
                      Some(idx), "error", before, stepDurUs) { n =>
                    val eo = mapper.createObjectNode()
                    eo.put("message", err.message)
                    n.set[JsonNode]("error", eo)
                    ()
                  }
              }
          }
        }
      }
    }
    if (traceDetail) trace.detail(origInput, current, rnodes)

    failed match {
      case Some(err) =>
        trace.error(err.toJson)
        HttpResult(500, Seq("content-type" -> "application/json"),
          s"""{"error":${quote(err.message)}}""")
      case None =>
        try buildReply(endpoint, current)
        catch {
          case NonFatal(e) =>
            val err = EndpointError.invalid(rootMessage(e))
            runCatch(endpoint.catchSpec, err, current, None) match {
              case Some(next) =>
                try buildReply(endpoint, next)
                catch {
                  case NonFatal(e2) =>
                    trace.error(err.toJson)
                    HttpResult(500, Seq("content-type" -> "application/json"),
                      s"""{"error":${quote(rootMessage(e2))}}""")
                }
              case None =>
                trace.error(err.toJson)
                HttpResult(500, Seq("content-type" -> "application/json"),
                  s"""{"error":${quote(err.message)}}""")
            }
        }
    }
  }

  private def buildInput(endpoint: EndpointDef, pathParams: Map[String, String],
      query: String, headers: Seq[(String, String)], body: Option[String]): ObjectNode = {
    val input = mapper.createObjectNode()
    input.put("method", endpoint.method)
    val pathObj = mapper.createObjectNode()
    pathParams.foreach { case (k, v) => pathObj.put(k, v) }
    input.set[JsonNode]("path", pathObj)
    // query: single-valued only; duplicates are an error routed to catch
    val queryObj = mapper.createObjectNode()
    Option(query).filter(_.nonEmpty).foreach { q =>
      q.split("&").filter(_.nonEmpty).foreach { pair =>
        val Array(k, v) = (pair.split("=", 2) ++ Array("")).take(2)
        val key = java.net.URLDecoder.decode(k, "UTF-8")
        if (queryObj.has(key))
          throw EndpointFailure(EndpointError.invalid(s"duplicate query param: $key"))
        queryObj.put(key, java.net.URLDecoder.decode(v, "UTF-8"))
      }
    }
    input.set[JsonNode]("query", queryObj)
    // headers: lowercased keys, same-name values comma-joined
    val headerObj = mapper.createObjectNode()
    headers.groupBy(_._1.toLowerCase).toSeq.sortBy(_._1).foreach { case (k, vs) =>
      headerObj.put(k, vs.map(_._2).mkString(","))
    }
    input.set[JsonNode]("headers", headerObj)
    body.filter(_.nonEmpty).foreach { b =>
      val parsed =
        try mapper.readTree(b)
        catch { case NonFatal(e) =>
          throw EndpointFailure(EndpointError.invalid(s"invalid body JSON: ${e.getMessage}")) }
      input.set[JsonNode]("body", parsed)
    }
    input
  }

  /** @context for steps/catches: {config: {internal_base}} plus optional
    * `params` (step `with`) and `error` (inside catch rules). */
  private def configContext(params: Option[JValue], error: Option[EndpointError]): JValue = {
    var fields: Seq[(String, JValue)] =
      Seq("config" -> JObject(Seq("internal_base" -> JString(internalBase))))
    params.foreach(p => fields :+= ("params" -> p))
    error.foreach { e =>
      fields :+= ("error" -> JObject(Seq(
        "kind" -> JString(e.kind),
        "status" -> e.status.map(s => JLong(s.toLong): JValue).getOrElse(JNull),
        "message" -> JString(e.message))))
    }
    JObject(fields)
  }

  // -- rule execution -----------------------------------------------------

  private def loadRule(rulePath: String): RuleKind =
    ruleCache.getOrElseUpdate(rulePath, {
      val resolved = baseDir.resolve(rulePath).normalize()
      EndpointModel.parseRuleKind(Files.readString(resolved))
    })

  private def executeRule(rulePath: String, input: JsonNode,
      withParams: Option[JValue]): JsonNode =
    loadRule(rulePath) match {
      case NormalRule(rule) =>
        transformValue(rule, input, configContext(withParams, None),
          Option(baseDir.resolve(rulePath).normalize().getParent).getOrElse(baseDir))
      case NetworkRule(spec) =>
        executeNetwork(spec, input, configContext(withParams, None))
      case EndpointRule(_) =>
        throw EndpointFailure(EndpointError.invalid("step rule must be normal or network"))
    }

  /** Run a normal rule over the running record (object = one record,
    * array = the record set); finalize makes the output an array. */
  private def transformValue(rule: RuleFile, value: JsonNode, context: JValue,
      ruleBaseDir: Path): JsonNode = {
    val outputs =
      try Engine.toJsonRecords(rule, recordDf(value), context,
          nullAsMissing = true, Engine.fileLoader(ruleBaseDir.toString))
        .collect().map(r => mapper.readTree(r.getString(0)))
      catch {
        case e: ExprCompiler.RmError =>
          throw EndpointFailure(EndpointError.transform(e.getMessage))
        case NonFatal(e) =>
          val rm = ExprCompiler.RmError.fromThrowable(e)
          throw EndpointFailure(EndpointError.transform(
            rm.map(_.getMessage).getOrElse(rootMessage(e))))
      }
    if (rule.finalizeSpec.exists(_.wrap.nonEmpty))
      outputs.headOption.getOrElse(mapper.createObjectNode())
    else if (rule.finalizeSpec.isDefined || value.isArray) {
      val arr = mapper.createArrayNode()
      outputs.foreach(arr.add)
      arr
    } else outputs.headOption.getOrElse(mapper.createObjectNode())
  }

  /** One-record (or record-array) DataFrame through the standard JSON
    * source, so ingestion semantics match the batch engine exactly —
    * straight from the in-memory node, no per-request temp file. */
  private def recordDf(value: JsonNode): DataFrame =
    graft.sources.Sources.jsonNode(spark, value, Nil)

  /** Evaluate one v2 expr against the running pipeline value: objects are
    * the record; arrays (a finalized record set) are wrapped so bare
    * `@input` resolves to the whole array. */
  private def evalJson(e: Expr, value: JsonNode, ctx: JValue): Option[String] =
    if (value.isArray) {
      val obj = mapper.createObjectNode()
      obj.set[JsonNode]("__v", value)
      Engine.evalExprJson(e, recordDf(obj), ctx, prefix = Seq("__v"))
    } else Engine.evalExprJson(e, recordDf(value), ctx)

  private def evalCond(c: Cond, value: JsonNode, ctx: JValue): Boolean =
    if (value.isArray) {
      val obj = mapper.createObjectNode()
      obj.set[JsonNode]("__v", value)
      Engine.evalCondOnce(c, recordDf(obj), ctx, prefix = Seq("__v"))
    } else Engine.evalCondOnce(c, recordDf(value), ctx)

  // -- catch --------------------------------------------------------------

  /** Exact status > 4xx/5xx > timeout > default (CatchSpec::match_target). */
  private def matchCatch(spec: Map[String, String], err: EndpointError): Option[String] = {
    err.status.flatMap { s =>
      spec.get(s.toString).orElse {
        val pattern = if (s >= 400 && s < 500) "4xx" else if (s >= 500 && s < 600) "5xx" else ""
        if (pattern.nonEmpty) spec.get(pattern) else None
      }
    }.orElse(if (err.kind == "Timeout") spec.get("timeout") else None)
      .orElse(spec.get("default"))
  }

  /** Run the matched catch rule with @context.error carrying the failure;
    * None = no match (fall through). */
  private def runCatch(spec: Map[String, String], err: EndpointError,
      input: JsonNode, params: Option[JValue]): Option[JsonNode] =
    matchCatch(spec, err).map { target =>
      loadRule(target) match {
        case NormalRule(rule) =>
          transformValue(rule, input, configContext(params, Some(err)),
            Option(baseDir.resolve(target).normalize().getParent).getOrElse(baseDir))
        case _ => throw EndpointFailure(EndpointError.invalid("catch rule must be normal"))
      }
    }

  // -- network ------------------------------------------------------------

  private def executeNetwork(spec: NetworkSpec, input: JsonNode,
      context: JValue): JsonNode = {
    def catchOr(err: EndpointError): JsonNode =
      runCatch(spec.catchSpec, err, input, None)
        .getOrElse(throw EndpointFailure(err))

    val url =
      try evalJson(spec.url, input, context) match {
        case Some(s) =>
          val n = mapper.readTree(s)
          if (!n.isTextual)
            return catchOr(EndpointError.invalid("request.url must be a string"))
          n.asText
        case None => return catchOr(EndpointError.invalid("request.url is missing"))
      }
      catch { case NonFatal(e) => return catchOr(EndpointError.invalid(rootMessage(e))) }

    val body: Option[String] =
      try {
        if (spec.body.isDefined)
          evalJson(spec.body.get, input, context) // missing ⇒ no body
        else if (spec.bodyMap.nonEmpty)
          Some(mapper.writeValueAsString(
            transformValue(RuleFile(version = 2, mappings = spec.bodyMap), input, context, baseDir)))
        else spec.bodyRule.map { rp =>
          mapper.writeValueAsString(executeRule(rp, input, None))
        }
      } catch {
        case EndpointFailure(e) => return catchOr(e)
        case NonFatal(e) => return catchOr(EndpointError.invalid(rootMessage(e)))
      }

    var attempt = 0
    while (true) {
      sendRequest(spec, url, body) match {
        case Right(value) =>
          spec.select match {
            case Some(tokens) =>
              var cur: JsonNode = value
              for (tok <- tokens) tok match {
                case PathParser.PKey(k) =>
                  cur = if (cur != null && cur.isObject) cur.get(k) else null
                case PathParser.PIdx(i) =>
                  cur = if (cur != null && cur.isArray) cur.get(i) else null
              }
              if (cur == null)
                return catchOr(EndpointError.invalid("select path not found"))
              return cur
            case None => return value
          }
        case Left(err) =>
          val retryable = err.kind == "Timeout" || err.kind == "Network"
          spec.retry match {
            case Some(retry) if retryable && attempt < retry.max =>
              Thread.sleep(retry.delayMs(attempt))
              attempt += 1
            case _ => return catchOr(err)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def sendRequest(spec: NetworkSpec, url: String,
      body: Option[String]): Either[EndpointError, JsonNode] = {
    try {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(spec.timeoutMs))
      val publisher = body match {
        case Some(b) => HttpRequest.BodyPublishers.ofString(b)
        case None => HttpRequest.BodyPublishers.noBody()
      }
      builder.method(spec.method, publisher)
      spec.headers.foreach { case (k, v) => builder.header(k, v) }
      if (body.isDefined && !spec.headers.exists(_._1 == "content-type"))
        builder.header("content-type", "application/json")
      val response = http.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      val status = response.statusCode()
      if (status >= 400) Left(EndpointError.httpStatus(status))
      else {
        val text = response.body()
        if (text == null || text.isEmpty) Right(mapper.nullNode())
        else
          try Right(mapper.readTree(text))
          catch { case NonFatal(e) =>
            Left(EndpointError.network(s"invalid JSON response: ${e.getMessage}")) }
      }
    } catch {
      case _: HttpTimeoutException => Left(EndpointError.timeout)
      case NonFatal(e) => Left(EndpointError.network(rootMessage(e)))
    }
  }

  // -- reply --------------------------------------------------------------

  private def buildReply(endpoint: EndpointDef, current: JsonNode): HttpResult = {
    val ctx = configContext(None, None)
    val status = evalJson(endpoint.reply.status, current, ctx) match {
      case Some(s) =>
        val n = mapper.readTree(s)
        val v =
          if (n.isIntegralNumber) n.asInt
          else if (n.isTextual) n.asText.toIntOption.getOrElse(
            throw EndpointFailure(EndpointError.invalid("status must be integer")))
          else throw EndpointFailure(EndpointError.invalid("status must be integer"))
        if (v < 100 || v > 599)
          throw EndpointFailure(EndpointError.invalid("status out of range"))
        v
      case None => throw EndpointFailure(EndpointError.invalid("status must be integer"))
    }
    val bodyText = endpoint.reply.body.map { b =>
      evalJson(b, current, ctx).getOrElse("null") // missing ⇒ null
    }
    var headers = endpoint.reply.headers
    if (bodyText.isDefined && !headers.exists(_._1 == "content-type"))
      headers :+= ("content-type" -> "application/json")
    HttpResult(status, headers, bodyText.getOrElse(""))
  }

  private def rootMessage(e: Throwable): String = {
    var cur = e
    while (cur.getCause != null && cur.getCause != cur) cur = cur.getCause
    Option(cur.getMessage).getOrElse(cur.getClass.getSimpleName)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object EndpointEngine {
  /** Default for rich trace capture: ON (the reference is always rich)
    * unless -Dgraft.trace.detail=false. Server / UiServer / the CLI also
    * take the flag explicitly (`--no-trace-detail`), so a deployment can
    * disable capture without JVM flags. COST: each richly-traced request
    * runs one one-row Spark probe job per mapping/condition plus
    * O(steps²) rule-prefix re-executions for child traces — orders of
    * magnitude over the bare transform; latency-sensitive serving should
    * turn it off and keep the flat trace. Safe parse: only an explicit
    * "false" disables — a malformed value must never crash construction. */
  def defaultTraceDetail: Boolean =
    !sys.props.get("graft.trace.detail").exists(_.equalsIgnoreCase("false"))

  final case class HttpResult(status: Int, headers: Seq[(String, String)], body: String)

  private[endpoint] final case class EndpointError(
      kind: String, status: Option[Int], message: String) {
    def toJson: JsonNode = {
      val o = new ObjectMapper().createObjectNode()
      o.put("kind", kind)
      status match { case Some(s) => o.put("status", s); case None => o.putNull("status") }
      o.put("message", message)
      o
    }
  }
  private[endpoint] object EndpointError {
    def timeout: EndpointError = EndpointError("Timeout", None, "timeout")
    def httpStatus(s: Int): EndpointError = EndpointError("HttpStatus", Some(s), s"http status $s")
    def network(msg: String): EndpointError = EndpointError("Network", None, msg)
    def transform(msg: String): EndpointError = EndpointError("Transform", None, msg)
    def invalid(msg: String): EndpointError = EndpointError("Invalid", None, msg)
  }
  private[endpoint] final case class EndpointFailure(error: EndpointError)
    extends RuntimeException(error.message)
}

/** Bounded in-memory request trace store (reference trace_store.rs:45-180):
  * every handled request appends {id, method, path, status, duration_us,
  * steps[], error?}; the admin surface lists and fetches them. With a
  * `persistDir` (the UI server's data_dir/traces), each trace is also
  * written as a JSON file so the `/internal/traces` file store sees it —
  * the reference wires its engine to the same data-dir store. */
final class TraceStore(capacity: Int = 1000,
    persistDir: Option[java.nio.file.Path] = None) {
  private val mapper = new ObjectMapper()
  private val entries = new java.util.ArrayDeque[JsonNode]()
  private val counter = new java.util.concurrent.atomic.AtomicLong()
  // uniquify file ids across restarts AND across stores sharing one
  // persist dir (the ui server builds one engine per endpoint rule file;
  // same-millis startedAt values would collide and overwrite traces)
  private val storeNonce =
    java.lang.Long.toUnsignedString(new java.security.SecureRandom().nextLong(), 36)

  private[endpoint] def append(node: ObjectNode): String = synchronized {
    val id = s"trace-${counter.incrementAndGet()}"
    node.put("id", id)
    entries.addLast(node)
    if (entries.size > capacity) entries.removeFirst()
    persistDir.foreach { dir =>
      val fileId = s"trace-$storeNonce-${counter.get()}"
      val persisted = node.deepCopy[ObjectNode]()
      persisted.put("trace_id", fileId)
      persisted.put("timestamp", java.time.Instant.now().toString)
      // the engine marks "ok"/"error"; keep the file store's vocabulary
      persisted.put("status",
        if (node.path("status").asText == "ok") "success" else "error")
      try {
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve(s"$fileId.json"),
          mapper.writeValueAsString(persisted))
      } catch { case scala.util.control.NonFatal(_) => () } // tracing is best-effort
    }
    id
  }

  def list(): Seq[JsonNode] = synchronized { entries.asScala.toSeq }

  def get(id: String): Option[JsonNode] = synchronized {
    entries.asScala.find(e => e.path("id").asText == id)
  }

  def listJson: String = synchronized {
    mapper.writeValueAsString(entries.asScala.toArray)
  }
}

private final class TraceBuilder(method: String, path: String, rulePath: String) {
  private val mapper = new ObjectMapper()
  private val node = mapper.createObjectNode()
  private val steps = mapper.createArrayNode()
  node.put("method", method)
  node.put("path", path)
  node.put("status", "ok")

  // reference-shaped record detail (records[0].nodes), set by runEndpoint
  private var detailTriple: Option[(JsonNode, JsonNode, JsonNode)] = None

  def input(v: JsonNode): Unit = node.set[JsonNode]("input", v.deepCopy[JsonNode]())

  def step(rule: String, status: String, durationUs: Long): Unit = {
    val s = mapper.createObjectNode()
    s.put("rule", rule)
    s.put("status", status)
    s.put("duration_us", durationUs)
    steps.add(s)
  }

  def error(err: JsonNode): Unit = {
    node.put("status", "error")
    node.set[JsonNode]("error", err)
  }

  def detail(input: JsonNode, output: JsonNode, nodes: JsonNode): Unit =
    detailTriple = Some((input.deepCopy[JsonNode](),
      output.deepCopy[JsonNode](), nodes))

  def finish(httpStatus: Int, durationUs: Long): ObjectNode = {
    node.put("http_status", httpStatus)
    node.put("duration_us", durationUs)
    node.set[JsonNode]("steps", steps)
    // keep the flat steps[] (engine vocabulary) AND emit the reference's
    // records/rule/summary shape so the UI's record navigation, op chains,
    // and inspector views light up on real served traffic
    detailTriple.foreach { case (in, out, nodes) =>
      val status = node.path("status").asText("ok")
      val record = mapper.createObjectNode()
      record.put("index", 0)
      record.put("status", status)
      record.put("duration_us", durationUs)
      record.set[JsonNode]("input", in)
      record.set[JsonNode]("output", out)
      record.set[JsonNode]("nodes", nodes)
      if (node.has("error")) record.set[JsonNode]("error", node.get("error").deepCopy[JsonNode]())
      val records = mapper.createArrayNode(); records.add(record)
      node.set[JsonNode]("records", records)
      val rule = mapper.createObjectNode()
      rule.put("type", "endpoint")
      rule.put("name", s"$method $path")
      rule.put("path", rulePath)
      rule.put("version", 2)
      node.set[JsonNode]("rule", rule)
      val summary = mapper.createObjectNode()
      summary.put("record_total", 1)
      summary.put("record_success", if (status == "ok") 1 else 0)
      summary.put("record_failed", if (status == "ok") 0 else 1)
      summary.put("duration_us", durationUs)
      node.set[JsonNode]("summary", summary)
    }
    node
  }
}
