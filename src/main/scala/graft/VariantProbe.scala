package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
// temporary probe — deleted after use
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val p1 = "/tmp/probe3.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p1),
      """{"obj":{"empty":{},"z":1,"a":2},"mixed":[1,{"n":true}],"maybe":null}""" + "\n" +
      """{"obj":{"empty":{},"z":3,"a":4},"mixed":["x",2.5]}""")
    val schema = StructType(Seq(
      StructField("obj", StructType(Seq(
        StructField("empty", StructType(Nil)),
        StructField("z", LongType), StructField("a", LongType)))),
      StructField("mixed", VariantType),
      StructField("maybe", VariantType)))
    val d = spark.read.schema(schema).json(p1)
    d.show(false)
    println("row0 to_json: " + d.select(to_json(struct(col("obj"), col("mixed"), col("maybe")))).collect().mkString(" ; "))
    println("maybe isNull row0/row1: " + d.select(col("maybe").isNull).collect().mkString(","))
    println("maybe is_variant_null: " + d.select(is_variant_null(col("maybe"))).collect().mkString(","))
    spark.stop()
  }
}
