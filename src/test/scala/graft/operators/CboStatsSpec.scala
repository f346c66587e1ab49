package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cost-based-optimizer inputs: ANALYZE TABLE writes row/size and
  * per-column statistics that Catalyst's CBO (join reordering, broadcast
  * decisions) consumes. At 100 TB, collected stats are what let the
  * optimizer order a 5-table join without relying on AQE runtime repair. */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE TABLE records row counts and column stats for the CBO") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_stats")
    val p = new java.io.File("spark-warehouse/orders_stats")
    if (p.exists()) { p.listFiles().foreach(_.delete()); p.delete() }
    graft.Tables.orders(spark, dir).write.mode("overwrite").saveAsTable("orders_stats")
    spark.sql("ANALYZE TABLE orders_stats COMPUTE STATISTICS FOR COLUMNS o_custkey, o_totalprice")

    val described = spark.sql("DESCRIBE EXTENDED orders_stats")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(described.contains("Statistics"))
    assert(described.contains("1500 rows"))

    // the relation's plan-level stats now carry the exact row count
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("orders_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1500)))
      // column-level stats present (distinct counts drive join cardinality)
      val colStats = spark.sql("DESCRIBE EXTENDED orders_stats o_custkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(colStats.get("distinct_count").exists(_.toLong > 0))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
