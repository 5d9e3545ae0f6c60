package graft

import java.io.PrintStream
import java.nio.file.{Files, Path, Paths}

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

import graft.rules._
import graft.rules.Model._

/** Command-line surface with the reference CLI's contract
  * (crates/rulemorph_cli/src/main.rs): subcommands
  * `validate | preflight | transform | generate`, the same flags, the same
  * stderr error grammar (`E <Kind> path=... msg="..."` / JSON arrays with
  * `-e json`), and the same exit codes —
  * 0 ok, 1 I/O or parse failure, 2 validation errors, 3 transform errors
  * (main.rs:152-165).
  *
  * `transform` runs the same single Catalyst plan as the library API —
  * the CLI is a thin shell over Engine/Preflight/DtoGenerator, exactly as
  * the reference CLI wraps its library crate.
  */
object Cli {

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toIndexedSeq, Console.out, Console.err))

  private val mapper = new ObjectMapper()

  /** Testable entry: returns the exit code instead of exiting. */
  def run(args: Seq[String], out: PrintStream, err: PrintStream): Int = {
    args.headOption match {
      case Some("validate") => runValidate(parseFlags(args.tail), err)
      case Some("preflight") => runPreflight(parseFlags(args.tail), err)
      case Some("transform") => runTransform(parseFlags(args.tail), out, err)
      case Some("generate") => runGenerate(parseFlags(args.tail), out, err)
      case Some("serve") => runServe(parseFlags(args.tail), out, err)
      case Some("ui") => runUi(parseFlags(args.tail), out, err)
      case Some("validate-rules-dir") => runValidateRulesDir(parseFlags(args.tail), err)
      case _ =>
        err.println("usage: rulemorph <validate|preflight|transform|generate|serve|ui|validate-rules-dir> [flags]")
        1
    }
  }

  /** `ui [--port N] [--data-dir D] [--ui-dir U] [--rules-dir R]
    * [--api-mode rules|ui-only] [--no-ui] [--no-trace-detail]` — the
    * reference's UI server (main.rs run_ui): the /api rules surface + the
    * /internal trace/graph API + static UI assets. `--no-trace-detail`
    * turns off rich per-request trace capture (probe re-executions —
    * see EndpointEngine.defaultTraceDetail's cost note) without JVM
    * flags. Exit 1 on config/server errors, 2 when the rules dir fails
    * validation. */
  private def runUi(f: Flags, out: PrintStream, err: PrintStream): Int = {
    val apiMode = f.opts.getOrElse("--api-mode", "rules")
    val uiEnabled = !f.bools.contains("--no-ui")
    if (!uiEnabled && apiMode == "ui-only") {
      err.println("ui-only mode cannot be used with --no-ui"); return 1
    }
    if (apiMode != "rules" && apiMode != "ui-only") {
      err.println(s"unknown api mode: $apiMode"); return 1
    }
    val dataDir = Paths.get(f.opts.getOrElse("--data-dir", ".rulemorph"))
    val rulesDir = f.opts.get("--rules-dir").map(Paths.get(_))
      .getOrElse(dataDir.resolve("api_rules"))
    if (apiMode == "rules" && Files.isDirectory(rulesDir)) {
      val errors = graft.endpoint.RulesDirValidator.validate(rulesDir)
      if (errors.nonEmpty) { errors.foreach(e => err.println(e.render)); return 2 }
    }
    val config = graft.endpoint.UiServer.Config(
      port = f.opts.get("--port").flatMap(_.toIntOption).getOrElse(8080),
      dataDir = dataDir,
      uiDir = f.opts.get("--ui-dir").map(Paths.get(_)).filter(Files.isDirectory(_)),
      rulesDir = Some(rulesDir),
      apiMode = apiMode,
      uiEnabled = uiEnabled,
      traceDetail = !f.bools.contains("--no-trace-detail") &&
        graft.endpoint.EndpointEngine.defaultTraceDetail)
    try {
      val server = graft.endpoint.UiServer.start(session, config)
      out.println(s"rulemorph server listening on http://127.0.0.1:${server.getAddress.getPort}")
      Thread.currentThread.join() // serve until killed
      0
    } catch {
      case NonFatal(e) => err.println(s"server error: ${e.getMessage}"); 1
    }
  }

  /** `validate-rules-dir -r <dir>` — validate endpoint.yaml and every rule
    * file it references (exit 0 clean, 2 with errors — main.rs:182-191). */
  private def runValidateRulesDir(f: Flags, err: PrintStream): Int = {
    val dir = f.opts.get("--rules-dir").orElse(f.opts.get("--rules")) match {
      case Some(p) => Paths.get(p)
      case None => err.println("failed to read rules dir: --rules-dir is required"); return 1
    }
    val errors = graft.endpoint.RulesDirValidator.validate(dir)
    if (errors.isEmpty) 0
    else {
      errors.foreach(e => err.println(e.render))
      2
    }
  }

  /** `serve -r endpoints.yaml [--port N] [--no-trace-detail]` — run the
    * endpoint engine over the JDK HttpServer until interrupted.
    * `--no-trace-detail` disables rich per-request trace capture (probe
    * re-executions — see EndpointEngine.defaultTraceDetail's cost note). */
  private def runServe(f: Flags, out: PrintStream, err: PrintStream): Int = {
    val rules = f.opts.get("--rules") match {
      case Some(p) => p
      case None => err.println("failed to read rules: --rules is required"); return 1
    }
    val port = f.opts.get("--port").flatMap(_.toIntOption).getOrElse(8080)
    try {
      val server = graft.endpoint.Server.start(session, rules, port,
        traceDetail = !f.bools.contains("--no-trace-detail") &&
          graft.endpoint.EndpointEngine.defaultTraceDetail)
      out.println(s"listening on http://127.0.0.1:${server.getAddress.getPort}")
      Thread.currentThread.join() // serve until killed
      0
    } catch {
      case NonFatal(e) => err.println(s"server error: ${e.getMessage}"); 1
    }
  }

  /** clap-style flags: every option takes a value except the booleans. */
  private case class Flags(opts: Map[String, String], bools: Set[String])

  private val boolFlags =
    Set("--ndjson", "-v", "--validate", "--no-ui", "--no-trace-detail")
  private val aliases = Map(
    "-r" -> "--rules", "-i" -> "--input", "-f" -> "--format",
    "-c" -> "--context", "-o" -> "--output", "-e" -> "--error-format",
    "-l" -> "--lang", "-n" -> "--name", "-v" -> "--validate")

  private def parseFlags(args: Seq[String]): Flags = {
    var opts = Map.empty[String, String]
    var bools = Set.empty[String]
    var rest = args
    while (rest.nonEmpty) {
      val flag = rest.head
      val name = aliases.getOrElse(flag, flag)
      if (boolFlags.contains(flag) || boolFlags.contains(name)) {
        bools += name
        rest = rest.tail
      } else {
        opts += name -> rest.drop(1).headOption.getOrElse("")
        rest = rest.drop(2)
      }
    }
    Flags(opts, bools)
  }

  private def errorFormat(f: Flags): String = f.opts.getOrElse("--error-format", "text")

  // -- loading ------------------------------------------------------------

  private def loadRule(f: Flags, err: PrintStream): Either[Int, (RuleFile, String, Path)] = {
    val path = f.opts.get("--rules") match {
      case Some(p) => Paths.get(p)
      case None => err.println("failed to read rules: --rules is required"); return Left(1)
    }
    val yaml =
      try Files.readString(path)
      catch { case NonFatal(e) => err.println(s"failed to read rules: $e"); return Left(1) }
    val rule =
      try YamlParser.parse(yaml)
      catch { case NonFatal(e) => err.println(s"failed to parse rules: ${e.getMessage}"); return Left(1) }
    Right((applyFormatOverride(rule, f), yaml, path))
  }

  private def applyFormatOverride(rule: RuleFile, f: Flags): RuleFile =
    f.opts.get("--format") match {
      case Some(fmt) => rule.copy(input = rule.input.copy(format = fmt))
      case None => rule
    }

  private def loadContext(f: Flags, err: PrintStream): Either[Int, JValue] =
    f.opts.get("--context") match {
      case None => Right(JNull)
      case Some(p) =>
        val text =
          try Files.readString(Paths.get(p))
          catch { case NonFatal(e) => err.println(s"failed to read context: $e"); return Left(1) }
        try Right(jsonToJValue(mapper.readTree(text)))
        catch { case NonFatal(e) => err.println(s"failed to parse context JSON: ${e.getMessage}"); return Left(1) }
    }

  def jsonToJValue(n: JsonNode): JValue = {
    import scala.jdk.CollectionConverters._
    if (n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean)
    else if (n.isIntegralNumber) JLong(n.asLong)
    else if (n.isNumber) JDouble(n.asDouble)
    else if (n.isTextual) JString(n.asText)
    else if (n.isArray) JArray(n.elements.asScala.toSeq.map(jsonToJValue))
    else JObject(n.properties.asScala.toSeq.map(e => e.getKey -> jsonToJValue(e.getValue)))
  }

  /** One lazily-built local session shared by all CLI invocations in this
    * JVM (tests); a real deployment would spark-submit against a cluster
    * with the same code path. */
  private lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def readInput(rule: RuleFile, inputPath: String) =
    if (rule.input.format == "csv") sources.Sources.csv(session, inputPath, rule.input)
    else sources.Sources.json(session, inputPath, rule.input.recordsPath)

  // -- subcommands --------------------------------------------------------

  private def runValidate(f: Flags, err: PrintStream): Int =
    loadRule(f, err) match {
      case Left(code) => code
      case Right((_, yaml, _)) =>
        val errors = Validator.validate(yaml)
        if (errors.isEmpty) 0
        else { emitValidationErrors(errors, errorFormat(f), err); 2 }
    }

  private def runPreflight(f: Flags, err: PrintStream): Int = {
    loadRule(f, err) match {
      case Left(code) => code
      case Right((rule, _, rulesPath)) =>
        val inputPath = f.opts.get("--input") match {
          case Some(p) => p
          case None => err.println("failed to read input: --input is required"); return 1
        }
        if (!Files.exists(Paths.get(inputPath))) {
          err.println(s"failed to read input: $inputPath not found"); return 1
        }
        val context = loadContext(f, err) match {
          case Left(code) => return code
          case Right(v) => v
        }
        try {
          val ws = Preflight.validate(rule, readInput(rule, inputPath), context,
            nullAsMissing = rule.input.format != "csv",
            ruleLoader = Engine.fileLoader(baseDir(rulesPath)))
          emitTransformWarnings(ws, errorFormat(f), err)
          0
        } catch {
          case e: ExprCompiler.RmError => emitTransformError(e, errorFormat(f), err); 3
          case NonFatal(e) => err.println(s"preflight failed: ${e.getMessage}"); 3
        }
    }
  }

  private def runTransform(f: Flags, out: PrintStream, err: PrintStream): Int = {
    loadRule(f, err) match {
      case Left(code) => code
      case Right((rule, yaml, rulesPath)) =>
        if (f.bools.contains("--validate")) {
          val errors = Validator.validate(yaml)
          if (errors.nonEmpty) { emitValidationErrors(errors, errorFormat(f), err); return 2 }
        }
        val inputPath = f.opts.get("--input") match {
          case Some(p) => p
          case None => err.println("failed to read input: --input is required"); return 1
        }
        if (!Files.exists(Paths.get(inputPath))) {
          err.println(s"failed to read input: $inputPath not found"); return 1
        }
        val context = loadContext(f, err) match {
          case Left(code) => return code
          case Right(v) => v
        }
        if (f.bools.contains("--ndjson"))
          return runTransformNdjson(rule, inputPath, context, rulesPath, f, out, err)
        val (records, warnings) =
          try {
            val jw = Engine.toJsonRecordsWithWarnings(rule,
              readInput(rule, inputPath), context,
              nullAsMissing = rule.input.format != "csv",
              ruleLoader = Engine.fileLoader(baseDir(rulesPath)))
            (jw.output.collect().map(_.getString(0)),
              Engine.collectWarnings(jw.warnings))
          } catch {
            case e: ExprCompiler.RmError => emitTransformError(e, errorFormat(f), err); return 3
            case NonFatal(e) =>
              ExprCompiler.RmError.fromThrowable(e) match {
                case Some(rm) => emitTransformError(rm, errorFormat(f), err); return 3
                case None => err.println(s"transform failed: ${e.getMessage}"); return 3
              }
          }
        val wrapped = rule.finalizeSpec.exists(_.wrap.nonEmpty)
        val text =
          if (wrapped) records.headOption.getOrElse("{}") // wrap ⇒ one object
          else records.mkString("[", ",", "]")
        // reference emission order (main.rs:288-305): warnings on stderr
        // BEFORE the output write
        emitTransformWarnings(warnings, errorFormat(f), err)
        writeOut(text, f, out, err)
    }
  }

  /** Reference run_transform_ndjson (main.rs:310-385): the per-item
    * stream shape — each item's warnings hit stderr before its output
    * line (dropped items emit warnings only), so json error format
    * produces one array PER warned item, not one combined array.
    * finalize is rejected up front (transform.rs:168-173). */
  private def runTransformNdjson(rule: RuleFile,
      inputPath: String, context: JValue, rulesPath: Path,
      f: Flags, out: PrintStream, err: PrintStream): Int = {
    if (rule.finalizeSpec.nonEmpty) {
      emitTransformError(ExprCompiler.RmError("InvalidInput", "",
        "finalize is not supported in stream mode"), errorFormat(f), err)
      return 3
    }
    // each line is written the moment it is produced — the point of the
    // toLocalIterator stream shape (one sorted partition resident at a
    // time, never the whole output), and the reference's mid-stream-error
    // semantics (BufWriter flush on drop, main.rs:350-377): lines already
    // written stay written when an error surfaces mid-iteration
    val fileWriter =
      try f.opts.get("--output").map { p =>
        val path = Paths.get(p)
        Option(path.getParent).foreach(Files.createDirectories(_))
        Files.newBufferedWriter(path)
      } catch { case NonFatal(e) => err.println(s"failed to write output: $e"); return 1 }
    def writeLine(line: String): Unit = fileWriter match {
      case Some(w) => w.write(line); w.newLine()
      case None => out.println(line)
    }
    try {
      val rows = Engine.ndjsonWithWarnings(rule, readInput(rule, inputPath),
        context, nullAsMissing = rule.input.format != "csv",
        ruleLoader = Engine.fileLoader(baseDir(rulesPath))).toLocalIterator()
      import scala.jdk.CollectionConverters._
      rows.asScala.foreach { r =>
        val ws = r.getSeq[org.apache.spark.sql.Row](1)
        emitTransformWarnings(
          ws.map(w => Engine.Warning(w.getString(0), w.getString(1), w.getString(2))),
          errorFormat(f), err)
        if (!r.isNullAt(0)) writeLine(r.getString(0))
      }
      0
    } catch {
      case e: ExprCompiler.RmError => emitTransformError(e, errorFormat(f), err); 3
      case NonFatal(e) =>
        ExprCompiler.RmError.fromThrowable(e) match {
          case Some(rm) => emitTransformError(rm, errorFormat(f), err); 3
          case None => err.println(s"transform failed: ${e.getMessage}"); 3
        }
    } finally fileWriter.foreach(w =>
      try w.close() catch { case NonFatal(e) => err.println(s"failed to write output: $e") })
  }

  private def runGenerate(f: Flags, out: PrintStream, err: PrintStream): Int =
    loadRule(f, err) match {
      case Left(code) => code
      case Right((rule, _, _)) =>
        val lang = f.opts.get("--lang").flatMap(DtoGenerator.language) match {
          case Some(l) => l
          case None => err.println(s"failed to generate dto: unknown language ${f.opts.getOrElse("--lang", "(none)")}"); return 1
        }
        try writeOut(DtoGenerator.generate(rule, lang, f.opts.get("--name")), f, out, err)
        catch { case NonFatal(e) => err.println(s"failed to generate dto: ${e.getMessage}"); 1 }
    }

  private def writeOut(text: String, f: Flags, out: PrintStream, err: PrintStream): Int =
    f.opts.get("--output") match {
      case Some(p) =>
        try {
          val path = Paths.get(p)
          Option(path.getParent).foreach(Files.createDirectories(_))
          Files.writeString(path, text)
          0
        } catch { case NonFatal(e) => err.println(s"failed to write output: $e"); 1 }
      case None => out.println(text); 0
    }

  private def baseDir(rulesPath: Path): String =
    Option(rulesPath.getParent).map(_.toString).getOrElse(".")

  // -- error emitters (main.rs:572-701) -----------------------------------

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def emitValidationErrors(errors: Seq[Validator.ValidationError],
      format: String, err: PrintStream): Unit = format match {
    case "json" =>
      val items = errors.map { e =>
        val path = if (e.path.nonEmpty) s""","path":${jsonStr(e.path)}""" else ""
        s"""{"type":"validation","code":${jsonStr(e.code)},"message":${jsonStr(e.text)}$path}"""
      }
      err.println(items.mkString("[", ",", "]"))
    case _ =>
      errors.foreach { e =>
        val path = if (e.path.nonEmpty) s" path=${e.path}" else ""
        err.println(s"E ${e.code}$path msg=\"${e.text}\"")
      }
  }

  /** Reference emit_transform_warnings (rulemorph_cli main.rs:652-678):
    * text `W <Kind> path=<p> msg="<m>"` per warning; json one array of
    * {"type":"warning","kind","message","path"} — both to stderr, nothing
    * when there are no warnings. */
  private def emitTransformWarnings(ws: Seq[Engine.Warning], format: String,
      err: PrintStream): Unit = if (ws.nonEmpty) format match {
    case "json" =>
      val items = ws.map { w =>
        val path = if (w.path.nonEmpty) s""","path":${jsonStr(w.path)}""" else ""
        s"""{"type":"warning","kind":${jsonStr(w.kind)},"message":${jsonStr(w.message)}$path}"""
      }
      err.println(items.mkString("[", ",", "]"))
    case _ =>
      ws.foreach { w =>
        val path = if (w.path.nonEmpty) s" path=${w.path}" else ""
        err.println(s"W ${w.kind}$path msg=\"${w.message}\"")
      }
  }

  private def emitTransformError(e: ExprCompiler.RmError, format: String,
      err: PrintStream): Unit = format match {
    case "json" =>
      val path = if (e.path.nonEmpty) s""","path":${jsonStr(e.path)}""" else ""
      err.println(s"""[{"type":"transform","kind":${jsonStr(e.kind)},"message":${jsonStr(e.message)}$path}]""")
    case _ =>
      val path = if (e.path.nonEmpty) s" path=${e.path}" else ""
      err.println(s"E ${e.kind}$path msg=\"${e.message}\"")
  }
}
