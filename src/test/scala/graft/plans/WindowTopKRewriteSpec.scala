package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec
import graft.operators.RelationalOps

/** WindowTopKRewrite: the row_number-filter idiom must plan through
  * GroupTopK (k-bounded exchange) with bit-identical results; non-eligible
  * windows must be left alone. */
class WindowTopKRewriteSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private var savedRules: Seq[Rule[LogicalPlan]] = Nil
  private var savedStrategies: Seq[org.apache.spark.sql.execution.SparkStrategy] = Nil
  override def beforeAll(): Unit = {
    super.beforeAll()
    savedRules = spark.experimental.extraOptimizations
    savedStrategies = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations =
      savedRules.filterNot(_ == WindowTopKRewrite) :+ WindowTopKRewrite
    spark.experimental.extraStrategies =
      savedStrategies.filterNot(_ == GroupTopKStrategy) :+ GroupTopKStrategy
  }
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = savedRules
    spark.experimental.extraStrategies = savedStrategies
    super.afterAll()
  }

  private val data = Seq(
    ("a", 10, 1L), ("a", 20, 2L), ("a", 30, 3L), ("a", 30, 4L),
    ("b", 5, 5L), ("b", 7, 6L), ("c", 1, 7L))

  test("row_number <= k idiom plans through GroupTopK, results identical") {
    val df = data.toDF("g", "v", "id").repartition(3)
    val top = RelationalOps.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), 2)
    val plan = top.queryExecution.optimizedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    val got = top.select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 3L), ("a", 4L), ("b", 6L), ("b", 5L), ("c", 7L)))
    // rn survives for upstream use, re-derived over the k-bounded rows
    val withRn = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 2).filter(col("rn") === 2)
    assert(withRn.select("id").collect().map(_.getLong(0)).toSet == Set(4L, 5L))
  }

  test("SQL text hits the same fast path") {
    data.toDF("g", "v", "id").createOrReplaceTempView("wtk")
    val q = spark.sql("""SELECT g, id FROM (
        SELECT g, id, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) rn
        FROM wtk) WHERE rn <= 1""")
    assert(q.queryExecution.optimizedPlan.toString.contains("GroupTopK"))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L), ("b", 6L), ("c", 7L)))
  }

  test("rank(), multi-function windows and un-bounded filters are untouched") {
    val df = data.toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val ranked = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(!ranked.queryExecution.optimizedPlan.toString.contains("GroupTopK"))
    val multi = df.withColumn("rn", row_number().over(w))
      .withColumn("mx", max("v").over(Window.partitionBy("g")))
      .filter(col("rn") <= 2)
    assert(!multi.queryExecution.optimizedPlan.toString.contains("GroupTopK"))
    val lower = df.withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
    assert(!lower.queryExecution.optimizedPlan.toString.contains("GroupTopK"))
  }
}
