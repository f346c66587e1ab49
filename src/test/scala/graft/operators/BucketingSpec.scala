package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both join sides bucketed on the key
  * lets the sort-merge join read pre-shuffled buckets — the plan carries
  * NO Exchange. At 100 TB this is the difference between re-shuffling the
  * fact table on every join and never shuffling it at all. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without an Exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory survives — clear stale locations
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val p = new java.io.File(s"spark-warehouse/$t")
      if (p.exists()) {
        p.listFiles().foreach(_.delete())
        p.delete()
      }
    }
    graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // force the non-broadcast path so the shuffle-avoidance is observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() == graft.Tables.lineitem(spark, dir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
