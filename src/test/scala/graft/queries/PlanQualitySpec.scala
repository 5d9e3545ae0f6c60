package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.{Engine, YamlParser}

/** Plan-quality assertions — the 100 TB design claims, checked against the
  * actual physical plans: record_when predicates reach the parquet scan as
  * pushed filters, unused columns prune out of ReadSchema, and the lookup
  * join is a broadcast hash join (no fact-side shuffle). */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("record_when filter pushes into the parquet scan") {
    val plan = planOf(Relational.recordWhen(spark, dir))
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected pushed quantity filter in:\n$plan")
  }

  test("column pruning: projection reads only referenced columns") {
    val plan = planOf(Relational.recordWhen(spark, dir))
    // query touches 4 of lineitem's 11 columns — the scan must not read
    // l_extendedprice (money column unused here)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"),
      s"unused column not pruned: $readSchema")
  }

  test("lookup compiles to a broadcast hash join") {
    val plan = planOf(Relational.lookup(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in:\n$plan")
  }

  test("rule-engine record_when also reaches the scan as a pushed filter") {
    val rule = YamlParser.parse(
      """version: 2
        |record_when: { gte: ["@input.l_quantity", 30] }
        |mappings:
        |  - target: orderkey
        |    source: l_orderkey
        |""".stripMargin)
    val plan = planOf(Engine.transform(rule, graft.Tables.lineitem(spark, dir)))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(l_quantity"),
      s"expected pushed rule filter in:\n$plan")
    // and the scan reads only the two referenced columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_returnflag"),
      s"rule plan did not prune unused columns: $readSchema")
  }
}
