package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Schema-adaptive events reader ([[graft.Tables.events]]): the driver's
  * testdata has shipped `ts` both as parquet TIMESTAMP(NANOS) (pre-round-10)
  * and native TIMESTAMP(MICROS) (the regeneration that broke the hardwired
  * nanos reader). Both generations must load through the same entry point.
  * The legacy retry flips the session-global nanosAsLong conf and must
  * LEAVE it on — the parquet scan re-checks it at execution time, so
  * restoring it after schema inference breaks the returned frame (the
  * documented caveat this spec pins). */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  // the shared getOrCreate session outlives this suite: restore the conf
  // so the nanos test's session-global flip never leaks into later suites
  override def afterAll(): Unit = spark.conf.set(nanosKey, "false")

  /** The committed TIMESTAMP(NANOS) fixture (written by pyarrow v2.6 —
    * Spark itself cannot produce one), staged into a sfDir-shaped temp
    * dir so Tables.events resolves `<dir>/events.parquet`. */
  private def nanosDir: String = {
    val src = getClass.getResourceAsStream("/graft/events_nanos/events.parquet")
    assume(src != null, "nanos fixture missing")
    val dir = Files.createTempDirectory("events_nanos")
    Files.copy(src, dir.resolve("events.parquet")); src.close()
    dir.toString
  }

  test("TIMESTAMP(MICROS) generation: plain read passes through untouched") {
    // order-independent: pin the conf rather than assuming suite order
    spark.conf.set(nanosKey, "false")
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(3).collect().length == 3)
    assert(spark.conf.get(nanosKey) == "false") // micros path never flips it
  }

  test("TIMESTAMP(NANOS) generation: legacy retry converts ns to µs exactly") {
    // pin the conf OFF so the retry path genuinely runs
    spark.conf.set(nanosKey, "false")
    val df = graft.Tables.events(spark, nanosDir)
    assert(df.schema("ts").dataType == TimestampType)
    // µs-exact: integer ns div 1000 — 999999999ns truncates to 999999µs,
    // never rounds up (the 2^53 float-division corruption guard)
    val micros = df.orderBy("event_id")
      .selectExpr("unix_micros(ts)").collect().map(_.getLong(0))
    assert(micros.toSeq ==
      Seq(1700000000123456L, 1700000001000000L, 1700000002999999L))
    // the conf is now on for the session — the documented caveat: the
    // execution-time scan needs it, so the reader cannot restore it
    assert(spark.conf.get(nanosKey) == "true")
    // and the frame stays executable on later actions
    assert(df.count() == 3L)
  }
}
