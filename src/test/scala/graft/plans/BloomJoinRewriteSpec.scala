package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec

/** BloomJoinRewrite: with the flag on, a fact-x-dim inner equi join must
  * (a) get the Bloom prefilter injected on its probe side and (b) return
  * exactly the un-rewritten join's rows — the Bloom pass may only shrink
  * the probe input, never change the result. */
class BloomJoinRewriteSpec extends SparkSpec with BeforeAndAfterAll {

  // runtime injection path (Verify/Bench register the same rule through
  // spark.sql.extensions = graft.GraftExtensions); installed per-suite,
  // restored afterwards — the session is shared across suites
  private var saved: Seq[Rule[LogicalPlan]] = Nil
  private lazy val rule = new BloomJoinRewrite(spark)
  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ rule
  }
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    super.afterAll()
  }

  private def factDimJoin = {
    val dir = "/root/testdata/sf0.01"
    val li = graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
    val ord = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sorted

  test("off by default: the join plan carries no bloom marker") {
    val p = factDimJoin.queryExecution.optimizedPlan.toString
    assert(!p.contains("__graft_bloom"), s"rule fired while disabled:\n$p")
  }

  test("flag on: prefilter fires on the fact side, result rows identical") {
    val baseline = rows(factDimJoin)
    spark.conf.set(BloomJoinRewrite.Flag, "true")
    // sf0.01 column-pruned size ESTIMATES are near-equal (the raw files
    // are 3.7x apart); ratio 1 keeps the gate honest while letting the
    // heuristic pick the bigger side at test scale
    spark.conf.set(BloomJoinRewrite.RatioKey, "1")
    try {
      val j = factDimJoin
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("__graft_bloom"), s"rewrite did not fire:\n$p")
      assert(rows(j) == baseline)
    } finally {
      spark.conf.unset(BloomJoinRewrite.Flag)
      spark.conf.unset(BloomJoinRewrite.RatioKey)
    }
  }
}
