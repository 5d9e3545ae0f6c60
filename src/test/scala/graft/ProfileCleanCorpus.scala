package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the composed cleaning pipeline (not a test). */
object ProfileCleanCorpus {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"$label%-34s ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.documents(spark, dir).count()
    val docs = Tables.documents(spark, dir)
    import graft.operators.{Dedup, TextAnalysis => TA}

    val mode = if (args.length > 1) args(1) else "cold"
    mode match {
      case "cold" =>
        time("full cleanCorpus COLD") {
          queries.Pipeline.cleanCorpus(spark, dir).count()
        }
      case "nopersist" =>
        // the pre-round-4 shape: shingles recomputed per consumer
        time("cleanCorpus-nopersist COLD") {
          val scored = docs.select(col("doc_id"), col("lang"), col("text"),
              TA.qualityScore(col("text")).as("quality"))
            .filter(col("quality") >= 0.4)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
          val exactKept = scored.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn", "text")
          val clusters = Dedup.duplicateClusters(
            Dedup.minhashDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.8)
              .select("da", "db"))
          val nonCanonical = clusters.filter(col("doc_id") =!= col("canonical_id"))
            .select("doc_id")
          exactKept.join(nonCanonical, Seq("doc_id"), "left_anti")
            .orderBy("doc_id").count()
        }
      case "planonly" =>
        time("analyze+optimize+physical") {
          queries.Pipeline.cleanCorpus(spark, dir)
            .queryExecution.executedPlan.toString.length
        }
      case "pieces" =>
        time("pairs via persisted shingles COLD") {
          val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try Dedup.minhashDupPairsFrom(sh, 64, 16, 0.8).count()
          finally sh.unpersist(blocking = false)
        }
        time("pairs no persist") {
          Dedup.minhashDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.8).count()
        }
    }
    spark.stop()
  }
}
