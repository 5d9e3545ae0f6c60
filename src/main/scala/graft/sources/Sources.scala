package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.rules.Model.InputSpec

/** Input sources with the reference's ingest semantics (SURVEY §2.1).
  *
  * CSV: every cell is ingested as a STRING (record_to_object,
  * transform.rs:943-951) — no inference; leading zeros survive; typing
  * happens per-mapping via casts. Headerless files take their column names
  * from the rule's declared `columns`. Spark's CSV reader is distributed
  * and vectorized, so this scales to any size; one file of any format
  * yields the same all-strings record shape the reference produces.
  *
  * JSON: whole-document parse honoring `records_path` — the path selects
  * the record array (array → records, object → one record,
  * transform.rs:902-941). Spark's multiLine JSON reader materializes the
  * document per file; for NDJSON record streams use `ndjson` (one record
  * per line, the reference's streaming shape, fully splittable).
  */
object Sources {

  def csv(spark: SparkSession, path: String, spec: InputSpec): DataFrame = {
    val reader = spark.read
      .option("header", spec.hasHeader)
      .option("delimiter", spec.delimiter)
      .option("inferSchema", false) // all strings — reference semantics
    if (spec.hasHeader) reader.csv(path)
    else {
      val df = reader.csv(path)
      if (spec.columns.nonEmpty) df.toDF(spec.columns: _*) else df
    }
  }

  def json(spark: SparkSession, path: String, recordsPath: Seq[String]): DataFrame = {
    val doc = spark.read.option("multiLine", true).json(path)
    if (recordsPath.isEmpty) doc
    else {
      val target = recordsPath.foldLeft[org.apache.spark.sql.Column](null) {
        (acc, seg) => if (acc == null) col(seg) else acc.getField(seg)
      }
      val tpe = recordsPath.foldLeft[DataType](doc.schema) {
        case (st: StructType, seg) => st(seg).dataType
        case (t, seg) => throw new IllegalArgumentException(s"records_path $seg into $t")
      }
      tpe match {
        case ArrayType(_: StructType, _) =>
          doc.select(explode(target).as("rec")).select("rec.*")
        case _: StructType =>
          doc.select(target.as("rec")).select("rec.*") // object → one record
        case t =>
          throw new IllegalArgumentException(s"records_path points at scalar $t")
      }
    }
  }

  /** NDJSON (one JSON record per line) — splittable, the scalable shape. */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** NDJSON sink from the engine's exact-JSON record column. */
  def writeNdjson(jsonRecords: DataFrame, path: String): Unit =
    jsonRecords.write.mode("overwrite").text(path)
}
