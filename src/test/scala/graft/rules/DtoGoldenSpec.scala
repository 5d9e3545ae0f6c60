package graft.rules

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The reference's DTO golden suite (crates/rulemorph/tests/dto_golden.rs)
  * run verbatim: generated text must equal each expected_* file exactly
  * (both sides trim trailing whitespace, dto_golden.rs:19-32). */
class DtoGoldenSpec extends AnyFunSuite {

  private val fixtureRoot = "/root/reference/crates/rulemorph/tests/fixtures"

  private def check(fixture: String, lang: DtoGenerator.Language, expected: String): Unit = {
    val rule = YamlParser.parse(
      Files.readString(Paths.get(s"$fixtureRoot/$fixture/rules.yaml")))
    val got = DtoGenerator.generate(rule, lang)
    val want = Files.readString(Paths.get(s"$fixtureRoot/$fixture/$expected"))
      .replaceAll("\\s+$", "")
    assert(got == want, s"\n--- got ---\n$got\n--- want ---\n$want")
  }

  test("dto01 rust") { check("dto01_basic", DtoGenerator.Rust, "expected_rust.rs") }
  test("dto01 typescript") { check("dto01_basic", DtoGenerator.TypeScript, "expected_typescript.ts") }
  test("dto01 python") { check("dto01_basic", DtoGenerator.Python, "expected_python.py") }
  test("dto01 go") { check("dto01_basic", DtoGenerator.Go, "expected_go.go") }
  test("dto01 java") { check("dto01_basic", DtoGenerator.Java, "expected_java.java") }
  test("dto01 kotlin") { check("dto01_basic", DtoGenerator.Kotlin, "expected_kotlin.kt") }
  test("dto01 swift") { check("dto01_basic", DtoGenerator.Swift, "expected_swift.swift") }
  test("dto02 rust") { check("dto02_steps", DtoGenerator.Rust, "expected_rust.rs") }
}
