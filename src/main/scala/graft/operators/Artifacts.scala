package graft.operators

import org.apache.spark.sql.SparkSession

/** The parquet job-success-marker protocol shared by every persisted
  * artifact (IVF centroids, int8 vector indexes, BPE merge tables): the
  * `_SUCCESS` file a completed parquet job writes is the artifact's
  * completeness CERTIFICATE — probing it (never the bare directory)
  * makes a half-written artifact read as "missing", so overwrite-mode
  * retrains heal crashes instead of later readers choking on a husk.
  * Resolved through Hadoop's FileSystem so hdfs:///s3:// artifact
  * locations behave exactly like local disk. */
object Artifacts {

  /** True when `dir/_SUCCESS` exists. A probe must never fail its
    * caller: any filesystem error reads as "missing" (the caller's
    * overwrite write then runs and heals whatever was wrong). */
  def markerExists(spark: SparkSession, dir: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Delete `dir/_SUCCESS` if present — decertify an artifact up front
    * so a crash mid-overwrite reads as "missing", not as the OLD
    * marker certifying NEW half-written data. */
  def deleteMarker(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, false)
  }
}
