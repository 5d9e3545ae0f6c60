package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Median of a non-empty sequence (mean of the middle pair for even n). */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // driver contract: local[32]
    // Repetitions per query: median-of-3 by default. One-shot timing cannot
    // distinguish a plan regression from machine noise (the r4->r5 bench drift
    // was +31% across queries whose plans did not change); the median of 3
    // steady-state runs is robust to a single GC pause / scheduler hiccup.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt max 1
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass, mirroring criterion's warm-up-then-measure protocol
    // (the reference's own benchmark harness): run the full query suite
    // once against the 100x-smaller sf0.001 sibling so the one-time
    // Catalyst/Janino/JIT compilation of every plan shape is paid BEFORE
    // measurement, then measure steady-state per-query times at the target
    // SF. Without this, whichever query of an operator family happens to
    // run first absorbs ~3s of one-time codegen that every later family
    // member skips — noise, not throughput. The warm-up reads DIFFERENT
    // data (sf0.001), so no query-result or page caching of the measured
    // inputs is possible; only code compilation is shared.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      val sibling = p.resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(sibling) &&
          sibling.toString != p.toString) Some(sibling.toString)
      else None
    }
    warmDir.foreach { wd =>
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, wd).count() catch { case _: Throwable => () }
      }
    }
    // Measure: `reps` timed runs per query, report the MEDIAN plus the
    // spread (max-min) so the JSON itself shows whether a number can be
    // trusted. A throwing query must read as -1, not as a plausible fast
    // timing — a broken run has to be distinguishable from a good one.
    val timed = SparkEntry.queries.map { case (name, fn) =>
      val runs = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"bench: $name failed: ${e.getMessage}"); None }
      }
      name -> runs
    }
    val medians = timed.map { case (name, runs) =>
      name -> (if (runs.nonEmpty) median(runs) else -1.0)
    }
    // Bounded precision on the medians line: the driver's fixed-size
    // tail capture clipped the FRONT of round 7's ~2.6 KB full-precision
    // line, leaving the artifact unparseable. 3 decimals (milliseconds)
    // cut ~¼ of the line and lose nothing a benchmark can legitimately
    // claim; the length self-guard below drops to 2 if the suite ever
    // outgrows the window anyway. Locale-safe BigDecimal formatting
    // (no printf %f comma separators).
    val spreads = timed.map { case (k, runs) =>
      // Double.toString, not printf: %f is locale-sensitive (a comma
      // decimal separator would corrupt the JSON line)
      val sp = if (runs.nonEmpty) runs.max - runs.min else -1.0
      "\"" + k + "\":" + sp
    }.mkString("{", ",", "}")
    val total = medians.values.filter(_ >= 0).sum
    // The driver captures a fixed-size TAIL of stdout; round 6 lost the
    // per-query medians because the spread map pushed them past the capture
    // window. Contract: the medians line is the SHORTEST possible JSON and
    // the LAST thing on stdout, with nothing after it. Spreads (diagnostic
    // only) go to stderr, where truncation cannot cost the headline numbers.
    System.err.println(s"""{"metric":"spread","n":$reps,"spread":$spreads}""")
    System.err.flush()
    // Self-guard the line length: the driver's tail window is ~2.3 KB
    // and each query adds ~25 bytes, so past ~90 queries millisecond
    // precision would push the line's HEAD out of the capture again.
    // Centisecond precision (2 decimals) buys ~80 more queries and
    // still resolves every per-query median the suite produces.
    def line(fmt: Double => String): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${
        medians.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
          .mkString("{", ",", "}")},"n":$reps,"sf":"$sfDir"}"""
    def fmtN(scale: Int)(v: Double): String =
      new java.math.BigDecimal(v)
        .setScale(scale, java.math.RoundingMode.HALF_UP).toPlainString
    val l3 = line(fmtN(3))
    println(if (l3.length <= 2100) l3 else line(fmtN(2)))
    spark.stop()
  }
}
