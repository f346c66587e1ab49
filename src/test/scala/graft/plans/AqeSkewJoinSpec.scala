package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** AQE skew handling: the engine's first line of defense for hot keys is
  * adaptive runtime re-planning (RelationalOps.saltedJoin is the explicit
  * fallback). This pins that a pathologically skewed sort-merge join is
  * actually split by OptimizeSkewedJoin at execution time — if an AQE conf
  * regression ever disabled it, a 100 TB hot-key join would straggle on
  * one task instead of failing this spec. */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed side of a sort-merge join") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~200k rows with a fat payload vs a spread tail
      val left = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("x" * 64), col("id")).as("payload"))
        .union(spark.range(1000).select((col("id") + 1).as("k"),
          col("id").cast("string").as("payload")))
      val right = spark.range(1001).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan its own) so the
      // adaptive plan is final when inspected
      assert(joined.toLocalIterator().asScala.length == 201000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
