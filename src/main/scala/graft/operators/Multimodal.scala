package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The actual media decode is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything AROUND the decode is real and is what
  * matters at 100 TB — the binary column schema, the metadata struct, the
  * batch-shaped partition-level processing (mapPartitions, so a real
  * decoder amortizes model/codec init per partition, not per row), and the
  * pushdown-friendly metadata-only projections that never touch payload
  * bytes.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct. In production the payload
    * comes from the lake; here it is derived deterministically from the
    * documents table so tests are reproducible. */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("payload")).cast(LongType).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        xxhash64(col("payload")).as("content_hash")))

  val featureDim = 8

  /** Partition-level decode + feature extraction. The stub computes 8
    * byte-histogram buckets; a real decoder would init its codec once per
    * partition here and emit real features with the same batch shape. */
  def extractFeatures(withBinary: DataFrame, idCol: String): DataFrame = {
    val spark = withBinary.sparkSession
    val rows = withBinary.select(col(idCol), col("payload"))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("features", ArrayType(DoubleType))))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    rows.mapPartitions { it =>
      // per-partition init happens HERE (codec/model load in a real decoder)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val buckets = new Array[Double](featureDim)
        var i = 0
        while (i < bytes.length) {
          buckets((bytes(i) & 0xff) % featureDim) += 1.0
          i += 1
        }
        val n = math.max(bytes.length, 1).toDouble
        Row(id, buckets.map(_ / n).toSeq)
      }
    }(encoder)
  }

  /** Frame sampling: split the payload into fixed-size "frames" and keep
    * every k-th — pure byte-slicing HOFs, no UDF; the pattern for video
    * keyframe extraction where only offsets are computed Spark-side. */
  def sampleFrames(withBinary: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / frameBytes).cast(IntegerType)
    withBinary.withColumn("sampled_frames",
      transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))), i => i % everyK === 0),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
      .withColumn("n_frames_sampled", size(col("sampled_frames")).cast(LongType))
  }
}
