package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded (binned) range join: all (left, right) pairs with the same key
  * whose numeric attributes lie within `delta` of each other — "errors
  * within 30 minutes of a click", trades within a price band, reads
  * overlapping a genomic window. Spark plans a raw
  * `l.key = r.key && abs(l.t − r.t) <= δ` as an equi-join on the key with
  * the range as a post-filter, which degenerates to a per-key cartesian —
  * n²-per-key row explosion BEFORE the filter prunes (hot keys make it a
  * straggler, and a key-skewed corpus makes it a job-killer).
  *
  * The banded form bins the time axis at width `delta`: a matching pair's
  * bins differ by at most 1, so joining the left row's bin against the
  * right row's {bin−1, bin, bin+1} covers every candidate with an
  * EQUI-join on (key, bin) — per-pair work is bounded by band occupancy,
  * not key cardinality, and the shuffle key (key, bin) splits hot keys
  * across reducers by time. Each candidate pair arises exactly once (the
  * left row has ONE bin; the right row emits each neighboring bin once),
  * so no dedup pass is needed; the exact `abs(l.t − r.t) <= delta` filter
  * then keeps true matches only. */
object RangeJoin {

  /** Pairs within `delta`: left columns plus `prefix`-renamed right
    * columns. `delta` must be positive; times are integral (cast to
    * long — floor-second epochs are this engine's convention for event
    * time, see the sessionize/as-of queries). */
  def withinDelta(left: DataFrame, right: DataFrame, keyCol: String,
      lTimeCol: String, rTimeCol: String, delta: Long,
      prefix: String = "r_"): DataFrame = {
    require(delta > 0, "delta must be positive")
    def bin(c: Column): Column = floor(c.cast(LongType) / lit(delta.toDouble)).cast(LongType)
    val l = left.withColumn("__bin", bin(col(lTimeCol)))
    val r = right
      .withColumn("__rbin",
        explode(array(bin(col(rTimeCol)) - 1, bin(col(rTimeCol)),
          bin(col(rTimeCol)) + 1)))
      .select(col("__rbin") +: right.columns.map(c =>
        col(c).as(s"$prefix$c")): _*)
    l.join(r,
        col("__bin") === col("__rbin") &&
          col(keyCol) === col(s"$prefix$keyCol") &&
          abs(col(lTimeCol).cast(LongType) -
            col(s"$prefix$rTimeCol").cast(LongType)) <= delta)
      .drop("__bin", "__rbin")
  }
}
