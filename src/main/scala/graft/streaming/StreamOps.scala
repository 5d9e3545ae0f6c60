package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rules.Model.RuleFile
import graft.rules.Engine

/** Structured Streaming surface (SURVEY §2.9). The reference's streaming is
  * record-at-a-time NDJSON with `finalize` forbidden (transform.rs:168-173);
  * here the SAME compiled rule plan runs on a streaming DataFrame —
  * readStream → rule transforms → writeStream — plus the event-time
  * extensions (watermarked tumbling windows, streaming dedup) a scale
  * pipeline needs. Batch and streaming share one plan definition.
  */
object StreamOps {

  /** Apply a rule to a streaming DataFrame. Enforces the reference's
    * restriction: finalize (a global sort/limit) is meaningless on an
    * unbounded stream and is rejected, exactly like the reference's NDJSON
    * mode. */
  def ruleStream(rule: RuleFile, stream: DataFrame): DataFrame = {
    require(rule.finalizeSpec.isEmpty,
      "finalize is not supported in stream mode (matches reference NDJSON mode)")
    Engine.transform(rule, stream)
  }

  /** Watermarked tumbling-window aggregation over an event-time column:
    * the scalable form of "group by time bucket". Late data beyond the
    * watermark is dropped; state is bounded. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total_value"))

  /** Streaming exact dedup on a key set within the watermark horizon —
    * dropDuplicates keyed state is Spark's built-in streaming dedup. */
  def streamingDedup(events: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keys :+ tsCol)
}
