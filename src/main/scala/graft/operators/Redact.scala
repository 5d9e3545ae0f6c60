package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII redaction for training-data pipelines: an ordered chain of regex
  * rules (email, IPv4, phone, long digit runs) applied with
  * `regexp_replace`, plus per-rule match counts for audit metrics.
  *
  * Every pattern avoids lookaround and backreferences so the Java regex
  * engine (Spark) and RE2 (DuckDB oracle, and most data-quality tooling)
  * agree exactly. Scrubbing is a pure narrow projection — codegen'd
  * `regexp_replace` over the scan, no shuffle, so it composes into any
  * cleaning pipeline at full scan speed.
  *
  * Rule ORDER matters: a rule sees the previous rule's output (an IPv4
  * inside an already-redacted email is gone). Counts are computed
  * per-rule on the ORIGINAL text, so they report how often each pattern
  * occurs in the input, independent of chain position.
  */
object Redact {

  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  val ipv4: Rule = Rule("ip",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")

  /** International-ish phone: optional +, then ≥8 of digits/space/dash/
    * parens between two digits. */
  val phone: Rule = Rule("phone",
    "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>")

  /** Bare digit runs of 4+ (account numbers, SSN fragments, IDs). Runs
    * last in the default chain — shorter runs inside phones/IPs are
    * already consumed. */
  val digitRun: Rule = Rule("id", "[0-9]{4,}", "<ID>")

  /** Default chain, most-specific first. */
  val defaults: Seq[Rule] = Seq(email, ipv4, phone, digitRun)

  /** Apply the rule chain in order. */
  def scrub(text: Column, rules: Seq[Rule] = defaults): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Matches of one rule's pattern in the (original) text. */
  def matchCount(text: Column, rule: Rule): Column =
    regexp_count(text, lit(rule.pattern)).cast(LongType)
}
