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

  /** Greedy next-fit WHOLE-document packing — the no-straddle mode an
    * SFT/eval pipeline uses when a document must never span two training
    * blocks: walk each shard's documents in order, place the document in
    * the current block if it fits, else open a new block. Emits
    * `block_id` and `block_offset` (tokens already in the block when the
    * document lands). A document larger than `blockSize` gets a block of
    * its own and overflows it (the writer's truncate/split policy is
    * downstream); an empty document lands at the current offset.
    *
    * Execution shape: next-fit is a SEQUENTIAL fold per shard (each
    * placement depends on the previous fill), so no window expresses it.
    * The Spark-idiomatic form is the secondary-sort pattern: one shuffle
    * partitions by shard, an in-partition sort makes each shard's run
    * contiguous, and one mapPartitions pass folds each run with O(1)
    * state — shards are the parallelism unit, exactly how a production
    * packing writer scales (many bounded shards, one writer each).
    * Deterministic for any partitioning: state resets on the shard
    * boundary and never crosses partitions (hash-partitioned by shard).
    * The in-partition sort keys are (shard, orders..., tokens) — the
    * token count as final tie-break means rows tying on the order keys
    * with DIFFERENT token counts still fold in one fixed order; rows
    * tying on everything are interchangeable, so the output multiset is
    * deterministic even without a unique (shard, orders) key. Pass a
    * COMPOSITE order (e.g. (quality, doc_id)) when per-row block
    * assignment must be fully deterministic under order-key ties. */
  def packNextFit(docs: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, blockSize: Long): DataFrame =
    packNextFit(docs, shardCol, Seq(orderCol), tokensCol, blockSize)

  /** [[packNextFit]] with a composite in-shard order key. */
  def packNextFit(docs: DataFrame, shardCol: String, orderCols: Seq[String],
      tokensCol: String, blockSize: Long): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    require(orderCols.nonEmpty, "at least one order column")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val base = docs.select(col(shardCol) +: orderCols.map(col) :+
      col(tokensCol).cast(LongType): _*)
    val tokIdx = 1 + orderCols.length
    val outSchema = StructType(base.schema.fields ++ Seq(
      StructField("block_id", LongType, nullable = false),
      StructField("block_offset", LongType, nullable = false)))
    val encoder =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    base
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol) +: orderCols.map(col) :+
        col(tokensCol): _*)
      .mapPartitions { it =>
        var shard: Any = null
        var started = false
        var blockId = 0L
        var fill = 0L
        it.map { r =>
          val s = r.get(0)
          if (!started || s != shard) { // shard run boundary: reset
            shard = s; started = true; blockId = 0L; fill = 0L
          }
          // fail loudly at the operator boundary instead of an opaque NPE
          if (r.isNullAt(tokIdx)) throw new IllegalArgumentException(
            s"packNextFit: null $tokensCol in shard $s — token counts must be non-null")
          val t = r.getLong(tokIdx)
          // an empty current block always accepts (oversized docs overflow it)
          if (fill > 0 && fill + t > blockSize) { blockId += 1; fill = 0L }
          val offset = fill
          fill += t
          Row.fromSeq(r.toSeq :+ blockId :+ offset)
        }
      }(encoder)
  }
}
