package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // driver contract: local[32]
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a throwing query must read as -1 in the JSON, not as a plausible
      // fast timing — a broken run has to be distinguishable from a good one
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"bench: $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
