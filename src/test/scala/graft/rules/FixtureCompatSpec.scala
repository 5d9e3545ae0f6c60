package graft.rules

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** Compatibility oracle: run the REFERENCE's own golden fixtures
  * (read directly from /root/reference at test time — never copied) through
  * the engine and compare JSON output trees against each expected.json.
  *
  * Covered here: the fixtures whose inputs survive Spark's JSON/CSV ingest
  * (Spark's JSON reader conflates absent-vs-null at the SOURCE, so fixtures
  * that depend on per-record missing fields in JSON input are exercised via
  * the in-memory tests in EngineSpec instead).
  */
class FixtureCompatSpec extends AnyFunSuite {

  private val fixtureRoot = "/root/reference/crates/rulemorph/tests/fixtures"
  private val mapper = new ObjectMapper()

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def jsonNodeToJValue(n: JsonNode): JValue = {
    import scala.jdk.CollectionConverters._
    if (n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean)
    else if (n.isIntegralNumber) JLong(n.asLong)
    else if (n.isNumber) JDouble(n.asDouble)
    else if (n.isTextual) JString(n.asText)
    else if (n.isArray) JArray(n.elements.asScala.toSeq.map(jsonNodeToJValue))
    else JObject(n.properties.asScala.toSeq.map(e => e.getKey -> jsonNodeToJValue(e.getValue)))
  }

  /** Tree comparison: object key order ignored, array order significant,
    * numbers compared by value (100 == 100.0 — the reference integerizes
    * integral doubles on output, Spark keeps the declared type). */
  private def sameJson(a: JsonNode, b: JsonNode): Boolean = {
    if (a.isNumber && b.isNumber) a.asDouble == b.asDouble
    else if (a.isArray && b.isArray) {
      import scala.jdk.CollectionConverters._
      val as = a.elements.asScala.toSeq; val bs = b.elements.asScala.toSeq
      as.size == bs.size && as.zip(bs).forall { case (x, y) => sameJson(x, y) }
    } else if (a.isObject && b.isObject) {
      import scala.jdk.CollectionConverters._
      val ak = a.fieldNames.asScala.toSet; val bk = b.fieldNames.asScala.toSet
      ak == bk && ak.forall(k => sameJson(a.get(k), b.get(k)))
    } else a == b
  }

  private def loadFixture(name: String): (graft.rules.Model.RuleFile, DataFrame, JValue) = {
    val dir = s"$fixtureRoot/$name"
    val rule = YamlParser.parse(Files.readString(Paths.get(s"$dir/rules.yaml")))
    val context: JValue =
      if (Files.exists(Paths.get(s"$dir/context.json")))
        jsonNodeToJValue(mapper.readTree(Files.readString(Paths.get(s"$dir/context.json"))))
      else JNull
    val input: DataFrame =
      if (rule.input.format == "csv") graft.sources.Sources.csv(spark, s"$dir/input.csv", rule.input)
      else graft.sources.Sources.json(spark, s"$dir/input.json", rule.input.recordsPath)
    (rule, input, context)
  }

  private def runFixture(name: String): Unit = {
    val dir = s"$fixtureRoot/$name"
    val (rule, input, context) = loadFixture(name)
    // JSON-sourced fixtures: absent-vs-null is conflated by the reader for
    // typed fields, so null input refs are read as missing (variant-typed
    // fields keep the true distinction). Branch sub-rule paths resolve
    // against the reference crate root.
    val nullAsMissing = rule.input.format != "csv"
    val loader = Engine.fileLoader("/root/reference/crates/rulemorph")
    val got = Engine.toJsonRecords(rule, input, context, nullAsMissing, loader)
      .collect().map(r => mapper.readTree(r.getString(0)))
    // golden output: expected.json (array / wrapped object) or
    // expected.ndjson (one record per line, the streaming CSV fixtures)
    val expected =
      if (Files.exists(Paths.get(s"$dir/expected.json")))
        mapper.readTree(Files.readString(Paths.get(s"$dir/expected.json")))
      else {
        val arr = mapper.createArrayNode()
        Files.readString(Paths.get(s"$dir/expected.ndjson")).split("\n")
          .filter(_.nonEmpty).foreach(l => arr.add(mapper.readTree(l)))
        arr
      }
    if (expected.isArray) {
      assert(got.length == expected.size,
        s"$name: ${got.length} records, expected ${expected.size}\n got: ${got.mkString("\n")}")
      got.zipWithIndex.foreach { case (g, i) =>
        assert(sameJson(g, expected.get(i)),
          s"$name record $i:\n  got      $g\n  expected ${expected.get(i)}")
      }
    } else {
      // finalize.wrap ⇒ a single wrapped object
      assert(got.length == 1, s"$name: wrap output should be one object, got ${got.length}")
      assert(sameJson(got(0), expected),
        s"$name wrap:\n  got      ${got(0)}\n  expected $expected")
    }
  }

  /** Error fixtures: the transform must fail with the expected
    * TransformErrorKind and path — either a compile-time RmError (schema-
    * static errors) or a raised executor error recovered from the marker. */
  private def runErrorFixture(name: String): Unit = {
    val dir = s"$fixtureRoot/$name"
    val expected = mapper.readTree(Files.readString(Paths.get(s"$dir/expected_error.json")))
    val err =
      try {
        val (rule, input, context) = loadFixture(name)
        val nullAsMissing = rule.input.format != "csv"
        val got = Engine.toJsonRecords(rule, input, context, nullAsMissing,
          Engine.fileLoader("/root/reference/crates/rulemorph")).collect()
        fail(s"$name: expected an error, got ${got.length} records: ${got.mkString(" ")}")
      } catch {
        case e: ExprCompiler.RmError => e
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => ExprCompiler.RmError.fromThrowable(e).getOrElse(throw e)
      }
    assert(err.kind == expected.get("kind").asText,
      s"$name: kind ${err.kind} != ${expected.get("kind").asText} (${err.message})")
    if (expected.has("path") && !expected.get("path").isNull)
      assert(err.path == expected.get("path").asText,
        s"$name: path ${err.path} != ${expected.get("path").asText}")
  }

  val fixtures = Seq(
    "t01_csv_basic",
    "t02_csv_no_header",
    "t03_json_out_context",
    "t04_json_root_coalesce_default",
    "t05_expr_transforms",
    "t06_lookup_context",
    "t07_array_index_paths",
    "t08_escaped_keys",
    "t09_when_mapping",
    "t10_when_compare",
    "t11_when_logical_ops",
    "t12_ndjson_csv",
    "t13_expr_extended",
    "t14_expr_chain",
    "t15_record_when",
    "t16_array_ops",
    "t17_json_ops_merge",
    "t18_json_ops_deep_merge",
    "t19_json_ops_pick",
    "t20_json_ops_omit",
    "t21_json_ops_keys_values_entries",
    "t22_json_ops_object_flatten",
    "t23_json_ops_object_unflatten",
    "t24_json_ops_missing",
    "t25_json_ops_get_chain",
    "t26_chain_all_ops",
    "t27_json_ops_from_entries",
    "t28_expr_chain_nested",
    "t29_json_ops_len",
    "tv22_basic",
    "tv23_steps",
    "tv24_conditions",
    "tv25_lookup",
    "tv27_v1_compat",
    "tv28_map_let_binding",
    // tv29_v2_out_sibling_ok is a validation-only fixture (validation.rs:163)
    "tv30_literal_escape",
    "tv31_v2_json_ops_pick_omit_reduce_fold",
    "tv32_steps_finalize",
    "tv33_branch_return",
    "tv34_branch_return_true",
    "tv35_finalize_wrap",
    "tv36_branch_uses_out",
    "tv37_root_refs",
    "tv38_finalize_filter_offset",
    "tv39_finalize_filter_index",
    "tv40_branch_return_filter",
    "tv41_branch_finalize_wrap",
    "tv42_branch_deep_merge")

  val errorFixtures = Seq(
    "r01_float_non_finite",
    "r02_json_ops_invalid_path_pick",
    "r03_json_ops_non_object",
    "r04_json_ops_null_arg",
    "r05_json_ops_unflatten_array_index",
    "r06_json_ops_flatten_brackets",
    "r07_json_ops_flatten_empty_key",
    "r08_json_ops_from_entries_single_pair",
    "r09_asserts_failed")

  fixtures.foreach { f =>
    test(s"reference golden fixture: $f") { runFixture(f) }
  }
  errorFixtures.foreach { f =>
    test(s"reference error fixture: $f") { runErrorFixture(f) }
  }
}
