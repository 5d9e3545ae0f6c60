package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.YamlParser

/** Structured Streaming drive: the same rule plan and windowed aggregation
  * run as a real streaming query against a file source (memory sink,
  * processAllAvailable = synchronous local smoke). */
class StreamOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rule transform runs on a stream; finalize is rejected (reference NDJSON-mode rule)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-src").toFile.getAbsolutePath
    Seq((1L, 5.0), (2L, 50.0), (3L, 500.0)).toDF("id", "amount")
      .write.mode("overwrite").parquet(dir)

    val rule = YamlParser.parse(
      """version: 2
        |record_when: { gte: ["@input.amount", 10] }
        |mappings:
        |  - target: id
        |    source: id
        |  - target: doubled
        |    expr: ["@input.amount", multiply: [2]]
        |""".stripMargin)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    assert(stream.isStreaming)

    val q = StreamOps.ruleStream(rule, stream)
      .writeStream.format("memory").queryName("rule_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("rule_out").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(100.0, 1000.0))

    // finalize must be rejected in stream mode, like the reference
    val withFinalize = YamlParser.parse(
      """version: 2
        |mappings:
        |  - target: id
        |    source: id
        |finalize: { limit: 1 }
        |""".stripMargin)
    assertThrows[IllegalArgumentException](StreamOps.ruleStream(withFinalize, stream))
  }

  test("watermarked windowed counts over a stream match the batch plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-ev").toFile.getAbsolutePath
    Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:20:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 3.0))
      .toDF("ts_s", "event_type", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.windowedCounts(stream, "ts", "event_type", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("win_out").orderBy("window_start", "event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2L) // two clicks in hour 0
    assert(rows(1).getAs[Long]("n") == 1L)
  }
}
