package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StrictPlanChecksSpec extends SparkSpec {
  import spark.implicits._

  private def globalWindowPlan = {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.select(col("id"), row_number().over(Window.orderBy("id")).as("rn"))
      .queryExecution.analyzed
  }

  private def partitionedWindowPlan = {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.select(col("id"),
        row_number().over(Window.partitionBy("v").orderBy("id")).as("rn"))
      .queryExecution.analyzed
  }

  test("strict mode rejects an unpartitioned window, allows partitioned") {
    spark.conf.set(StrictPlanChecks.Flag, "true")
    try {
      val e = intercept[IllegalStateException] {
        StrictPlanChecks(spark)(globalWindowPlan)
      }
      assert(e.getMessage.contains("single task"))
      StrictPlanChecks(spark)(partitionedWindowPlan) // must not throw
    } finally spark.conf.unset(StrictPlanChecks.Flag)
  }

  test("check is a no-op unless opted in") {
    StrictPlanChecks(spark)(globalWindowPlan) // default off -> no throw
  }

  test("strict mode rejects a condition-less join, allows keyed joins") {
    val l = Seq((1L, "a")).toDF("id", "v")
    val r = Seq((1L, "b")).toDF("id2", "w")
    spark.conf.set(StrictPlanChecks.Flag, "true")
    try {
      val e = intercept[IllegalStateException] {
        StrictPlanChecks(spark)(l.crossJoin(r).queryExecution.analyzed)
      }
      assert(e.getMessage.contains("cartesian"))
      // a keyed join must pass
      StrictPlanChecks(spark)(
        l.join(r, col("id") === col("id2")).queryExecution.analyzed)
    } finally spark.conf.unset(StrictPlanChecks.Flag)
  }
}
