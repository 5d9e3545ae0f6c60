package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the fact side into `salts`
  * sub-keys and replicate the dimension side once per salt, so a key that
  * would land on one reducer spreads across `salts` of them. The result
  * set is identical to the plain equi-join — only the partitioning
  * changes.
  *
  * Spark's AQE skew-join handles MOST skew automatically at runtime
  * (splitting oversized partitions post-shuffle); explicit salting is the
  * tool for the cases AQE cannot fix — a single key too hot for any
  * split (all rows equal on the shuffle key), or a sort-merge join whose
  * skew shows up in the sort, not the partition sizes. Use it when one
  * key holds > a few percent of the fact table.
  *
  * The fact-side salt is derived from a deterministic hash of a
  * discriminator column (any high-cardinality column — an id, an offset),
  * so re-runs partition identically. Replication multiplies the dim side
  * by `salts`; keep it for genuinely small-to-medium dimensions (a
  * broadcast join needs no salting at all — salt only when the dim is too
  * big to broadcast AND a fact key is hot).
  */
object Skew {

  /** Equi-join `facts` with `dims` on `key`, salted `salts` ways.
    * `discriminator` must be a fact column with spread (used only to
    * derive the salt). Inner join; both inputs keep their columns (the
    * join key appears once). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      discriminator: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(salts.toLong)))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
