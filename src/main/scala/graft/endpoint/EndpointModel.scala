package graft.endpoint

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.rules.{Model, PathParser, YamlParser}
import Model._

/** YAML front-end for the two serving-rule kinds the reference adds on top
  * of normal transform rules (docs/rules_spec_endpoint_ja.md,
  * rules_spec_network_ja.md; endpoint_engine.rs:1365-1515):
  *
  *  - `type: endpoint` — HTTP endpoint declarations: method+path match,
  *    request-shaping `input` mappings, a `steps` pipeline of rule files,
  *    a `reply` (status/headers/body as v2 exprs), and `catch` routing.
  *  - `type: network` — an outbound HTTP call: url/body as v2 exprs,
  *    timeout, retry with backoff, `select` extraction, `catch` routing.
  */
object EndpointModel {

  final case class EndpointParseError(message: String) extends RuntimeException(message)

  /** A rule file is one of the three kinds; `type:` absent = normal. */
  sealed trait RuleKind
  case class NormalRule(rule: RuleFile) extends RuleKind
  case class NetworkRule(spec: NetworkSpec) extends RuleKind
  case class EndpointRule(spec: EndpointFile) extends RuleKind

  final case class EndpointFile(endpoints: Seq[EndpointDef])

  final case class EndpointDef(
      method: String,
      path: EndpointPath,
      input: Seq[Mapping],
      steps: Seq[EndpointStep],
      reply: ReplySpec,
      catchSpec: Map[String, String])

  final case class EndpointStep(
      rulePath: String,
      withParams: Option[JValue],
      when: Option[Cond],
      catchSpec: Map[String, String])

  final case class ReplySpec(
      status: Expr,
      headers: Seq[(String, String)],
      body: Option[Expr])

  /** `/users/{id}` — literal and `{param}` segments. */
  final case class EndpointPath(segments: Seq[PathSeg]) {
    /** Some(path params) when `path` matches. */
    def matchPath(path: String): Option[Map[String, String]] = {
      val parts = path.stripPrefix("/").split("/", -1).toSeq match {
        case Seq("") => Nil
        case s => s
      }
      if (parts.size != segments.size) return None
      val params = Map.newBuilder[String, String]
      for ((seg, part) <- segments.zip(parts)) seg match {
        case SegLit(v) => if (v != part) return None
        case SegParam(name) => params += name -> java.net.URLDecoder.decode(part, "UTF-8")
      }
      Some(params.result())
    }
  }
  sealed trait PathSeg
  final case class SegLit(value: String) extends PathSeg
  final case class SegParam(name: String) extends PathSeg

  final case class NetworkSpec(
      method: String,
      url: Expr,
      headers: Seq[(String, String)],
      timeoutMs: Long,
      body: Option[Expr],
      bodyMap: Seq[Mapping],
      bodyRule: Option[String],
      retry: Option[RetrySpec],
      select: Option[Seq[PathParser.PToken]],
      catchSpec: Map[String, String])

  final case class RetrySpec(max: Int, backoff: String, initialDelayMs: Long) {
    /** fixed | linear | exponential delay before re-attempt `attempt`
      * (endpoint_engine.rs RetryConfig::delay_for). */
    def delayMs(attempt: Int): Long = backoff match {
      case "linear" => initialDelayMs * (attempt + 1)
      case "exponential" => initialDelayMs * (1L << math.min(attempt, 30))
      case _ => initialDelayMs
    }
  }

  private val methods = Set("GET", "POST", "PUT", "PATCH", "DELETE")

  /** Parse a rule file of any kind. */
  def parseRuleKind(yamlText: String): RuleKind = {
    val root = new Yaml().load[Any](yamlText) match {
      case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
      case _ => throw EndpointParseError("rule file must be a map")
    }
    root.get("type").map(_.toString) match {
      case Some("endpoint") => EndpointRule(parseEndpointFile(root))
      case Some("network") => NetworkRule(parseNetworkSpec(root))
      case _ => NormalRule(YamlParser.parse(yamlText))
    }
  }

  private def str(m: Map[String, Any], key: String): Option[String] =
    m.get(key).map(_.toString)

  private def asMap(v: Any, what: String): Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, vv) => k.toString -> vv }.toMap
    case other => throw EndpointParseError(s"$what must be a map, got $other")
  }

  private def asList(v: Any, what: String): Seq[Any] = v match {
    case l: java.util.List[_] => l.asScala.toSeq
    case other => throw EndpointParseError(s"$what must be a list, got $other")
  }

  private def parseCatch(m: Map[String, Any]): Map[String, String] =
    m.get("catch").map(asMap(_, "catch").map { case (k, v) => k -> v.toString })
      .getOrElse(Map.empty)

  private def parseEndpointFile(root: Map[String, Any]): EndpointFile = {
    val eps = asList(root.getOrElse("endpoints",
      throw EndpointParseError("endpoint rule needs endpoints")), "endpoints")
    EndpointFile(eps.map { e =>
      val m = asMap(e, "endpoint")
      val method = str(m, "method").map(_.toUpperCase)
        .getOrElse(throw EndpointParseError("endpoint needs method"))
      if (!methods.contains(method))
        throw EndpointParseError(s"endpoint method must be one of $methods")
      val path = parsePath(str(m, "path")
        .getOrElse(throw EndpointParseError("endpoint needs path")))
      val input = m.get("input").map(YamlParser.parseMappings).getOrElse(Nil)
      val steps = m.get("steps").map(asList(_, "steps")).getOrElse(Nil).map { s =>
        val sm = asMap(s, "step")
        EndpointStep(
          rulePath = str(sm, "rule").getOrElse(throw EndpointParseError("step needs rule")),
          withParams = sm.get("with").map(YamlParser.toJValue),
          when = sm.get("when").map(YamlParser.parseCond),
          catchSpec = parseCatch(sm))
      }
      val reply = m.get("reply").map(asMap(_, "reply"))
        .getOrElse(throw EndpointParseError("endpoint needs reply"))
      EndpointDef(
        method = method,
        path = path,
        input = input,
        steps = steps,
        reply = ReplySpec(
          status = YamlParser.parseExpr(reply.getOrElse("status",
            throw EndpointParseError("reply needs status"))),
          headers = reply.get("headers").map(asMap(_, "reply.headers").toSeq
            .map { case (k, v) => k.toLowerCase -> v.toString }).getOrElse(Nil),
          body = reply.get("body").map(YamlParser.parseExpr)),
        catchSpec = parseCatch(m))
    })
  }

  private def parsePath(path: String): EndpointPath = {
    if (!path.startsWith("/")) throw EndpointParseError(s"path must start with /: $path")
    val segs = path.stripPrefix("/").split("/", -1).toSeq match {
      case Seq("") => Nil
      case s => s
    }
    EndpointPath(segs.map { s =>
      if (s.startsWith("{") && s.endsWith("}")) SegParam(s.substring(1, s.length - 1))
      else SegLit(s)
    })
  }

  private def parseNetworkSpec(root: Map[String, Any]): NetworkSpec = {
    val req = asMap(root.getOrElse("request",
      throw EndpointParseError("network rule needs request")), "request")
    val method = str(req, "method").map(_.toUpperCase)
      .getOrElse(throw EndpointParseError("network request needs method"))
    if (!methods.contains(method))
      throw EndpointParseError(s"network method must be one of $methods")
    val body = root.get("body").map(YamlParser.parseExpr)
    val bodyMap = root.get("body_map").map(YamlParser.parseMappings).getOrElse(Nil)
    val bodyRule = str(root, "body_rule")
    val bodySources = body.size + (if (bodyMap.nonEmpty) 1 else 0) + bodyRule.size
    if (bodySources > 1)
      throw EndpointParseError("body, body_map, and body_rule are mutually exclusive")
    if (method == "GET" && bodySources > 0)
      throw EndpointParseError("GET with body is not allowed")
    NetworkSpec(
      method = method,
      url = YamlParser.parseExpr(req.getOrElse("url",
        throw EndpointParseError("network request needs url"))),
      headers = req.get("headers").map(asMap(_, "request.headers").toSeq
        .map { case (k, v) => k.toLowerCase -> v.toString }).getOrElse(Nil),
      timeoutMs = parseDuration(str(root, "timeout")
        .getOrElse(throw EndpointParseError("network rule needs timeout"))),
      body = body,
      bodyMap = bodyMap,
      bodyRule = bodyRule,
      retry = root.get("retry").map { r =>
        val rm = asMap(r, "retry")
        RetrySpec(
          max = rm.get("max").map(_.toString.toInt).getOrElse(0),
          backoff = str(rm, "backoff").getOrElse("fixed") match {
            case b @ ("fixed" | "linear" | "exponential") => b
            case other => throw EndpointParseError(s"unknown backoff: $other")
          },
          initialDelayMs = str(rm, "initial_delay").map(parseDuration).getOrElse(100L))
      },
      select = str(root, "select").map(PathParser.parseTokens),
      catchSpec = parseCatch(root))
  }

  /** `5s` / `500ms` → millis; only ms and s units, must be positive
    * (rules_spec_network: timeout units MVP). */
  def parseDuration(s: String): Long = {
    val t = s.trim
    val ms =
      if (t.endsWith("ms")) t.dropRight(2).trim.toLong
      else if (t.endsWith("s")) t.dropRight(1).trim.toLong * 1000L
      else throw EndpointParseError(s"duration must use ms or s: $s")
    if (ms <= 0) throw EndpointParseError(s"duration must be positive: $s")
    ms
  }
}
