package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for pretraining: documents are (logically)
  * concatenated in a deterministic order and the token stream is chopped
  * into fixed-size training blocks — the concat-and-chop packing GPT-style
  * pipelines use (documents MAY straddle a block boundary; the attention
  * mask handles the seam). This operator computes each document's
  * placement in that stream: its start offset, the first and last block
  * it touches, and how many blocks it spans — the manifest a downstream
  * tokenizer/writer needs to emit packed sequences without ever
  * materializing the concatenation.
  *
  * Scale shape: packing is embarrassingly parallel per SHARD — each shard
  * owns an independent token stream (block ids are per-shard), so the
  * only data movement is one shuffle on the shard column and the
  * per-shard running sum is a sorted-window scan. Pick a shard column
  * with enough cardinality for the cluster (a hash-salt column at 100 TB;
  * `lang` here for oracle readability) — a single global stream would
  * funnel the running sum through one partition, which is exactly what
  * this parameterization avoids.
  */
object Packing {

  /** One row per input row: shard/order/token columns plus
    * `start_tok` (offset of the doc's first token in its shard stream),
    * `first_block`/`last_block` (block ids touched, `blockSize` tokens
    * per block) and `n_blocks` (= last − first + 1). Zero-token documents
    * occupy their boundary block (GREATEST(len, 1) in the last-block
    * math) so every document lands somewhere. Deterministic for any
    * partitioning: the window orders by (`orderCol`) within shard. */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, blockSize: Long): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(col(tokensCol)).over(w) - col(tokensCol)).cast(LongType)
    // doubles are exact here (offsets ≪ 2^53), and FLOOR(x / B) is the
    // same arithmetic the DuckDB oracle runs
    def blk(c: org.apache.spark.sql.Column) =
      floor(c / lit(blockSize.toDouble)).cast(LongType)
    docs
      .withColumn("start_tok", start)
      .withColumn("first_block", blk(col("start_tok")))
      .withColumn("last_block",
        blk(col("start_tok") + greatest(col(tokensCol), lit(1L)) - lit(1L)))
      .withColumn("n_blocks", col("last_block") - col("first_block") + lit(1L))
  }
}
