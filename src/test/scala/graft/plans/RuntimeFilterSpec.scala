package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Runtime (bloom) filter injection: when one join side carries a
  * selective filter, Spark can build a bloom filter from it at runtime
  * and push it into the other side's scan — at 100 TB this prunes the
  * fact-table read down to the keys that can actually match. Pinned here
  * with lowered thresholds so a conf regression can't silently disable
  * the lever. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dimension filter injects a bloom filter into the fact scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      val li = graft.Tables.lineitem(spark, dir)
      val ord = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter") ||
        p.contains("might_contain"), s"no runtime filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
