package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round support tool: dump `.explain("formatted")` for the
  * named queries (or all of them) to one text file per query, so plan
  * claims in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> [name,name,...] [suffix]
  * Writes <outDir>/<name>_<suffix>.txt (suffix defaults to "plan").
  * Reads the data dir from SPARK_GRAFT_SF_DIR like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1 && args(1).nonEmpty && args(1) != "all")
        Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val suffix = if (args.length > 2) args(2) else "plan"
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          System.err.println(s"plandump: wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"plandump: $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
    sys.exit(0)
  }
}
