package graft.rules

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Validation fixtures v01–v11: run the reference's invalid rule files
  * through the validator and compare (code, path) pairs against each
  * expected_errors.json. */
class ValidatorSpec extends AnyFunSuite {

  private val fixtureRoot = "/root/reference/crates/rulemorph/tests/fixtures"
  private val mapper = new ObjectMapper()

  val fixtures = Seq(
    "v01_missing_mapping_value",
    "v02_duplicate_target",
    "v03_invalid_ref_namespace",
    "v04_forward_out_reference",
    "v05_unknown_op",
    "v06_invalid_delimiter_length",
    "v07_invalid_lookup_args",
    "v08_invalid_path",
    "v09_invalid_when_type",
    "v10_invalid_record_when_type",
    "v11_invalid_item_ref",
    "tv26_v01_unknown_op",
    "tv26_v02_forward_out_ref",
    "tv26_v03_literal_start_unknown_op",
    "tv26_v04_empty_pipe",
    "tv26_v05_branch_when_v1_non_bool",
    "tv43_finalize_wrap_invalid_expr")

  fixtures.foreach { name =>
    test(s"validation fixture: $name") {
      val dir = s"$fixtureRoot/$name"
      val got = Validator
        .validate(Files.readString(Paths.get(s"$dir/rules.yaml")))
        .map(e => (e.code, e.path)).toSet
      import scala.jdk.CollectionConverters._
      val expected = mapper
        .readTree(Files.readString(Paths.get(s"$dir/expected_errors.json")))
        .elements.asScala
        .map(n => (n.get("code").asText, n.get("path").asText)).toSet
      assert(got == expected, s"$name:\n  got      $got\n  expected $expected")
    }
  }

  test("valid rule files produce no errors") {
    for (f <- Seq("t01_csv_basic", "t03_json_out_context", "t14_expr_chain",
        "tv25_lookup", "tv29_v2_out_sibling_ok", "tv39_finalize_filter_index",
        "tv41_branch_return_out_update")) {
      val errs = Validator.validate(
        Files.readString(Paths.get(s"$fixtureRoot/$f/rules.yaml")))
      assert(errs.isEmpty, s"$f should validate clean, got $errs")
    }
  }
}
