package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.{TextAnalysis => TA}

/** The ensemble query's rank machinery: the histogram-based exact
  * percent_rank (cum-below / (N−1) broadcast back from the value
  * histogram — no global sort of the corpus) must equal Spark's own
  * percent_rank window everywhere, including under ties; and the fused
  * ensemble must agree with a direct window-function restatement. */
class QualityEnsembleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("qualityEnsemble equals the global-window percent_rank restatement") {
    val nTok = TA.tokenCount(col("text"))
    val sigs = Tables.documents(spark, dir).select(col("doc_id"),
      nTok.as("s_tokens"),
      floor(size(array_distinct(TA.tokens(col("text")))).cast(DoubleType) /
          nTok.cast(DoubleType) * lit(1e6)).cast(LongType).as("s_ttr"),
      floor((col("n_chars") - (nTok - lit(1))).cast(DoubleType) /
          nTok.cast(DoubleType) * lit(1e6)).cast(LongType).as("s_mwl"))
    // the naive form the histogram path must reproduce exactly: Spark's
    // percent_rank is (rank-1)/(N-1) — the same quantity as
    // cum_below/(N-1) since rank = 1 + count(strictly smaller)
    val naive = sigs
      .withColumn("r_tokens", percent_rank().over(Window.orderBy("s_tokens")))
      .withColumn("r_ttr", percent_rank().over(Window.orderBy("s_ttr")))
      .withColumn("r_mwl", percent_rank().over(Window.orderBy("s_mwl")))
      .withColumn("ens",
        (col("r_tokens") + col("r_ttr") + col("r_mwl")) / lit(3.0))
    val naiveTop = naive
      .withColumn("rk", row_number().over(
        Window.orderBy(col("ens").desc, col("doc_id").asc)))
      .filter(col("rk") <= 100)
      .select(col("doc_id"), col("s_tokens").as("n_tokens"),
        col("r_tokens"), col("r_ttr"), col("r_mwl"), col("ens"))
      .orderBy("doc_id").collect()
    val got = Pipeline.qualityEnsemble(spark, dir).collect()
    assert(got.length == naiveTop.length)
    got.zip(naiveTop).foreach { case (a, b) =>
      assert(a == b, s"histogram rank row $a != window rank row $b")
    }
  }

  test("RankTable replicates rankBySignal on profile values and interpolates unseen ones") {
    import spark.implicits._
    val sigs = Seq(10L, 10L, 20L, 30L, 30L, 30L, 40L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "s")
    val table = graft.functions.RankLookup.train(sigs, "s")
    // on-profile values: exactly the batch histogram rank
    val expected = Pipeline.rankBySignal(sigs, "s", "r")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.foreach { case (v, r) =>
      assert(table.rank(v) == r, s"value $v: table ${table.rank(v)} != batch $r")
    }
    // unseen values rank between their neighbors: strictly-below count
    // over N-1 — 25 is below 3 of 7 docs (two 10s, one 20)
    assert(table.rank(25L) == 3.0 / 6.0)
    assert(table.rank(5L) == 0.0) // below the profile floor
    assert(table.rank(99L) == 1.0) // above the ceiling: all 7 below, 6/6
  }

  test("property: RankTable matches the naive strictly-below rank on random multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(200)
      val vals = Seq.fill(n)(rnd.nextInt(40).toLong) // dense values force ties
      val sigs = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("doc_id", "s")
      val table = graft.functions.RankLookup.train(sigs, "s")
      // probes: every on-profile value plus off-profile ones (below,
      // between, above)
      val probes = (vals ++ Seq(-5L, 17L, 41L, 1000L)).distinct
      probes.foreach { p =>
        val below = math.min(vals.count(_ < p).toLong, (n - 1).toLong)
        val expected = if (n <= 1) 0.0 else below.toDouble / (n - 1).toDouble
        assert(table.rank(p) == expected,
          s"n=$n probe=$p: table ${table.rank(p)} != naive $expected")
      }
    }
  }

  test("single-row corpus degenerates to rank 0.0, not 0/0") {
    import spark.implicits._
    val one = Seq((7L, "only doc here", 13L)).toDF("doc_id", "text", "n_chars")
    // drive the private rank path through a 1-row signals frame: every
    // rank (and so the ensemble) must be 0.0 under N == 1
    val sigs = one.select(col("doc_id"),
      TA.tokenCount(col("text")).as("s_tokens"))
    val r = Pipeline.rankBySignal(sigs, "s_tokens", "r").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(0.0))
  }
}
