package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write-side scale claims, checked against real physical plans:
  * partitioned layouts prune at the scan, bucketed tables join with zero
  * shuffle. */
class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("writePartitioned: partition filter prunes the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sinks_part").toString
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de", s"doc $i"))
      .toDF("doc_id", "lang", "text")
    Sinks.writePartitioned(df, dir, Seq("lang"))
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(back.count() == 50)
    val plan = back.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("lang"), s"expected lang partition filter in:\n$plan")
    // the pruned partition's directory is never listed in the scan
    assert(!plan.contains("lang=de"), "pruned partition should not appear in the scan")
  }

  test("writeBucketed: same-bucket join runs with zero Exchange") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val meta = (0L until 1000L).map(i => (i, i % 7)).toDF("doc_id", "cluster")
    Sinks.writeBucketed(docs, "sinks_docs", "doc_id", buckets = 8, sortCols = Seq("doc_id"))
    Sinks.writeBucketed(meta, "sinks_meta", "doc_id", buckets = 8, sortCols = Seq("doc_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would need a shuffle WITHOUT bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("sinks_docs").join(spark.table("sinks_meta"), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // sanity: the same join over non-bucketed frames DOES shuffle
      val unbucketed = docs.join(meta, "doc_id")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS sinks_docs")
      spark.sql("DROP TABLE IF EXISTS sinks_meta")
    }
  }

  test("writeBucketed: groupBy on the bucket key skips the shuffle too") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, i % 3)).toDF("doc_id", "v")
    Sinks.writeBucketed(docs, "sinks_agg", "doc_id", buckets = 4)
    try {
      val agg = spark.table("sinks_agg").groupBy("doc_id").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$plan")
      assert(agg.count() == 500)
    } finally spark.sql("DROP TABLE IF EXISTS sinks_agg")
  }

  test("writeCompacted: file count tracks targetRows; files cover disjoint sorted ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a "small files" mess: 64 partitions of 2000 rows, unsorted keys
    val rows = (0L until 2000L).map(i => ((i * 48271L) % 2000L, i)).toDF("k", "v")
      .repartition(64)
    val out = java.nio.file.Files.createTempDirectory("compacted").toString
    Sinks.writeCompacted(rows, out, Seq("k"), totalRows = 2000L, targetRows = 500L)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, s"2000/500 rows => 4 files, got ${files.length}")
    // nothing lost, and each file's key range is disjoint from the next:
    // range partitioning + in-file sort give footer min/max stats that
    // prune range predicates file-by-file
    val back = spark.read.parquet(out)
    assert(back.count() == 2000)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath).agg(min("k"), max("k")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
    // 48271 is coprime to 2000, so k is a permutation of 0..1999: a
    // k<100 range predicate matches exactly 100 rows, all in one file
    assert(back.filter(col("k") < 100).count() == 100)
  }
}
