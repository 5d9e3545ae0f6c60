package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Multimodal
import graft.streaming.StreamOps

/** Event-time windows and multimodal-column queries. The windowed
  * aggregation is the same plan StreamOps runs under Structured Streaming —
  * batch here so the driver can oracle it. */
object Extensions {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows over events: window().start aligns with
    * date_trunc('hour') so DuckDB can oracle it. Decimal-exact sum. */
  def windowEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Batch inactivity-gap sessionization — the oracle-checked sibling of
    * the streaming [[StreamOps.sessionize]]: a new session starts when a
    * user's gap exceeds 30 minutes; session id = running count of session
    * starts per user. Gaps compare FLOOR-second epochs on both engines so
    * the nanosecond parquet timestamps cannot straddle the threshold
    * differently (Spark sees µs, DuckDB ns). One shuffle on user_id
    * serves both windows and the final aggregation — sessions never cross
    * users, so the plan reuses the partitioning. */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("sec").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast(LongType).as("sec"))
      .withColumn("prev", lag("sec", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
      .orderBy("user_id", "session_id")
  }

  /** Binary payload + metadata projection — metadata-only access never
    * deserializes payload bytes at scan time (parquet column pruning). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.withPayload(Tables.documents(spark, dir), "text"),
        frameBytes = 64, everyK = 4)
      .select(col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.mime").as("mime"),
        md5(col("payload")).as("digest"),
        col("n_frames_sampled"))
      .orderBy("doc_id")

  /** Partition-level stubbed decode → deterministic feature vectors, one
    * row per (doc, dimension) so every cell is a scalar the driver's
    * comparator can hash. The oracle recomputes the byte histogram in SQL
    * (documents are ASCII, so code points are bytes). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.withPayload(Tables.documents(spark, dir), "text"), "doc_id")
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "feature")))
      .select(col("doc_id"), col("dim").cast(LongType).as("dim"), col("feature"))
      .orderBy("doc_id", "dim")

  /** Event-time AS-OF enrichment: every click picks up the user's most
    * recent purchase at or before it ([[graft.operators.AsofJoin]] —
    * union-window, ONE shuffle on user_id, no range-join explosion).
    * Times compare at floor-second granularity on both engines (the
    * proven q_sessionize recipe for the nanosecond parquet timestamps);
    * ties inside one second break to the highest purchase event_id.
    * Clicks before any purchase keep NULL payload — the left-outer
    * as-of. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast(LongType).as("sec"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "sec")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "sec", "value")
    graft.operators.AsofJoin.asofJoin(
        clicks, purchases, keyCol = "user_id", tsCol = "sec",
        tieCol = "event_id", rightPayload = Seq("event_id", "value"))
      .withColumnRenamed("asof_event_id", "p_event_id")
      .withColumnRenamed("asof_value", "p_value")
      .orderBy("event_id")
  }

  /** Banded range join ([[graft.operators.RangeJoin]]): every (click,
    * error) pair by the same user within 30 minutes — "did an error
    * happen near this click". The band trick turns the range predicate
    * into an equi-join on (user, time-bin): no per-user cartesian, and
    * the shuffle key spreads hot users across reducers by time. The
    * oracle states the same relation declaratively (ABS(l−r) ≤ δ). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast(LongType).as("sec"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "sec")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "sec", "user_id")
    graft.operators.RangeJoin.withinDelta(
        clicks, errors, keyCol = "user_id", lTimeCol = "sec",
        rTimeCol = "sec", delta = 1800L)
      .select(col("event_id"), col("user_id"), col("sec"),
        col("r_event_id"), col("r_sec"))
      .orderBy("event_id", "r_event_id")
  }

  val queries: Map[String, Q] = Map(
    "q_window_events"       -> (windowEvents _),
    "q_sessionize"          -> (sessionizeBatch _),
    "q_asof_join"           -> (asofJoin _),
    "q_range_join"          -> (rangeJoin _),
    "q_multimodal_meta"     -> (multimodalMeta _),
    "q_multimodal_features" -> (multimodalFeatures _))

  val oracles: Map[String, String] = Map(
    "q_window_events" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) sec FROM events),
        |g AS (SELECT user_id, event_id, sec,
        |        CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
        |             THEN 1 ELSE 0 END is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT user_id, sec,
        |        SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                          ROWS UNBOUNDED PRECEDING) session_id
        |      FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) session_id,
        |       COUNT(*) n_events, MIN(sec) start_sec, MAX(sec) end_sec
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    // as-of restated as a LEFT LATERAL "latest at-or-before" pick — the
    // declarative spelling of exactly the union-window carry semantics
    // (inclusive at equal second, max event_id inside one second)
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) sec,
        |                  event_type, value FROM events),
        |l AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, sec, value FROM e WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.sec, p.event_id AS p_event_id, p.value AS p_value
        |FROM l LEFT JOIN LATERAL (
        |  SELECT r.event_id, r.value FROM r
        |  WHERE r.user_id = l.user_id AND r.sec <= l.sec
        |  ORDER BY r.sec DESC, r.event_id DESC LIMIT 1) p ON TRUE
        |ORDER BY l.event_id""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) sec,
        |                  event_type FROM events),
        |l AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'error')
        |SELECT l.event_id, l.user_id, l.sec, r.event_id AS r_event_id, r.sec AS r_sec
        |FROM l JOIN r ON l.user_id = r.user_id AND ABS(l.sec - r.sec) <= 1800
        |ORDER BY l.event_id, r_event_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        |       'application/octet-stream' AS mime,
        |       MD5(text) AS digest,
        |       CAST(CEIL(CEIL(OCTET_LENGTH(ENCODE(text)) / 64.0) / 4.0) AS BIGINT) AS n_frames_sampled
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH dims AS (
         |  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n, UNNEST(RANGE(${Multimodal.featureDim})) AS dim
         |  FROM documents),
         |bytes AS (
         |  SELECT doc_id,
         |         UNNEST(LIST_TRANSFORM(RANGE(LENGTH(text)), i -> ORD(SUBSTR(text, CAST(i + 1 AS INT), 1)) % ${Multimodal.featureDim})) AS dim
         |  FROM documents),
         |hist AS (SELECT doc_id, dim, COUNT(*) AS k FROM bytes GROUP BY doc_id, dim)
         |SELECT d.doc_id, CAST(d.dim AS BIGINT) AS dim,
         |       CAST(COALESCE(h.k, 0) AS DOUBLE) / GREATEST(d.n, 1) AS feature
         |FROM dims d LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.dim = d.dim
         |ORDER BY d.doc_id, d.dim""".stripMargin)
}
