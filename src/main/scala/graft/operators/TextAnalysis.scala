package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * statistics, quality scoring, language ID, and document fingerprinting.
  *
  * All operators are pure `Column` combinators over native Spark functions —
  * they compose into any plan, stay inside whole-stage codegen, and shuffle
  * nothing by themselves. On a 100 TB corpus these run as a single narrow
  * map stage over the document scan.
  */
object TextAnalysis {

  /** Whitespace tokenization. The reference engine's `split` (SURVEY §2.7)
    * with a single-space delimiter; split() takes a regex so the literal is
    * quoted. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish regex tokenization (GPT-2-style segment classes: letter runs,
    * digit runs, punctuation runs, each absorbing one leading space). The
    * pattern avoids lookaround so Java regex and RE2 (the oracle) agree. */
  val bpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast(LongType)

  /** Compression proxy: characters per BPE token (0 for empty text). */
  def charsPerToken(text: Column): Column = {
    val n = size(bpeTokens(text))
    when(n === 0, lit(0.0)).otherwise(length(text).cast(DoubleType) / n)
  }

  def charCount(text: Column): Column = length(text).cast(LongType)

  /** Mean token length in characters (0 for empty text). */
  def avgTokenLen(text: Column): Column = {
    val n = size(tokens(text))
    when(n === 0, lit(0.0)).otherwise(
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
        .cast(DoubleType) / n)
  }

  /** A small fixed English stopword list — enough to compute a stable
    * stopword ratio as a quality signal. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val n = size(tokens(text))
    val hits = size(filter(tokens(text), t => t.isInCollection(stopwords)))
    when(n === 0, lit(0.0)).otherwise(hits.cast(DoubleType) / n)
  }

  /** Fraction of distinct tokens over total tokens — low values indicate
    * repetitive, low-quality text. */
  def distinctTokenRatio(text: Column): Column = {
    val n = size(tokens(text))
    when(n === 0, lit(0.0)).otherwise(
      size(array_distinct(tokens(text))).cast(DoubleType) / n)
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * diverse vocabulary and a sane stopword rate. Deterministic arithmetic
    * only, so it can be oracled in plain SQL. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast(DoubleType) / 100.0, lit(1.0))
    (lenScore + distinctTokenRatio(text) + least(stopwordRatio(text) * 5.0, lit(1.0))) / 3.0
  }

  /** Language marker words per language, for the n-gram-heuristic language
    * ID. Scores = marker hits; argmax wins (ties broken by language code
    * order for determinism). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "das"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"))

  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers))).cast(LongType)

  /** Heuristic language ID: the language with the most marker hits, or
    * "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (l, m) => (l, markerHits(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best === 0, "und")) { case (acc, (l, s)) =>
      acc.when(s === best, l)
    }.otherwise("und")
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. Two bag-of-words-identical documents collide regardless of
    * word order — the cheap first pass before MinHash. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(text)))))
}
