package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Scale-oriented parquet sinks beyond the reference's CSV/JSON/NDJSON
  * surface: Hive-style partitioned layouts (partition pruning turns a
  * 100 TB scan into a per-partition read) and bucketed tables (two tables
  * bucketed on the same key with the same bucket count join with ZERO
  * shuffle — the physical layout replaces the exchange).
  *
  * At 100 TB the write-side choices dominate every later read: a corpus
  * partitioned by (lang, dt) and bucketed by doc_id makes the daily
  * incremental-dedup join ([[graft.operators.Dedup.dedupAgainstIndex]])
  * and any per-doc enrichment join co-located by construction.
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory level per partition
    * column. Readers filtering on partition columns scan only matching
    * directories (PartitionFilters in the scan — checked by SinksSpec).
    * Choose low-cardinality columns (lang, dt, source); high-cardinality
    * partitioning creates a small-files problem instead. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Compacting rewrite — the answer to the small-files problem a
    * streaming ingest or over-partitioned job leaves behind (at 100 TB,
    * millions of KB-sized files make listing and footer reads the
    * bottleneck, not the data): rewrite into ~`targetRows`-sized files,
    * RANGE-partitioned and sorted on `sortCols` so each output file
    * covers a tight key range — min/max footer stats then prune file
    * reads for range predicates (the poor man's Z-order for a single
    * sort dimension). The row count comes from the caller (a catalog
    * stat or `df.count()`) so the rewrite itself plans no extra job. */
  def writeCompacted(df: DataFrame, path: String, sortCols: Seq[String],
      totalRows: Long, targetRows: Long,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortCols.nonEmpty && targetRows > 0)
    val files = math.max(1L, (totalRows + targetRows - 1) / targetRows).toInt
    val order = sortCols.map(org.apache.spark.sql.functions.col(_).asc)
    df.repartitionByRange(files, order: _*)
      .sortWithinPartitions(order: _*)
      .write.mode(mode).parquet(path)
  }

  /** Bucketed (and optionally sorted) parquet table in the session
    * catalog. Joins/aggregations on the bucket key between tables with
    * the same bucketing skip the shuffle entirely; sortBy additionally
    * lets sort-merge join skip its sort. Bucketed tables must go through
    * the catalog (`saveAsTable`) — a plain path write loses the bucket
    * metadata. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    val base = df.write.mode(mode).format("parquet")
    val w = path.fold(base)(p => base.option("path", p))
      .bucketBy(buckets, bucketCol)
    val ws = sortCols match {
      case head +: tail => w.sortBy(head, tail: _*)
      case _ => w
    }
    ws.saveAsTable(table)
  }
}
