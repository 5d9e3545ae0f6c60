package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-shard layout — the "publish the corpus" step a
  * pipeline runs after cleaning/dedup/mixing: every document gets a
  * content-stable shard in [0, nShards), the corpus lands as one
  * directory per shard, and a manifest states what each shard holds
  * (the numbers a dataset card and a training-loader config both need).
  *
  * The assignment is [[Sampling.hashBucket]] (md5 of the id), NOT
  * `spark_partition_id`/`rand`: re-running the job, changing the input
  * partitioning, or regenerating one shard cannot move a document — the
  * property that makes shard-level resume/retry of a training run safe.
  * At 100 TB, nShards is chosen for the loader (shard count ≫ data-
  * parallel workers, shard size ~1–10 GB), never for Spark — the write
  * repartitions ON the shard id so writer tasks and shard dirs coincide
  * (one file per shard, no small-files debris), while everything before
  * the write keeps the natural partitioning. */
object Sharding {

  /** `df` plus a deterministic `shard` column in [0, nShards). Narrow. */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", Sampling.hashBucket(col(idCol), nShards))
  }

  /** Per-shard manifest over a document corpus: document count,
    * whitespace-token count, and character count — one narrow projection
    * plus ONE map-side-combined aggregation to nShards rows. The token
    * sum is the number a token-budgeted trainer schedules against; the
    * doc/char sums are the sanity bounds a loader asserts at startup. */
  def shardManifest(docs: DataFrame, textCol: String, idCol: String,
      nShards: Int): DataFrame =
    assignShards(docs, idCol, nShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast(LongType)).as("n_tokens"),
        sum(length(col(textCol)).cast(LongType)).as("n_chars"))

  /** Materialize the sharded layout: `path/shard=<i>/` with ONE parquet
    * file per shard. `repartition(nShards, shard)` places each shard's
    * rows in exactly one task (same murmur3-mod placement as the
    * partitioned write's directory fan-out is irrelevant — what matters
    * is each task holds whole shards), so each `shard=` directory gets
    * exactly one file instead of one per upstream task. Readers prune by
    * shard via PartitionFilters ([[graft.sources.Sinks.writePartitioned]]
    * semantics); a training loader just lists the directories. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(path)
}
