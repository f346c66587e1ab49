package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries summary: exact regime, the n/(k+1) error bound under
  * adversarial inputs, heavy-hitter survival, and distributed-merge
  * equivalence across partitionings. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def topk(items: Seq[String], k: Int, parts: Int = 4): Map[String, Long] =
    items.toDF("w").repartition(parts)
      .agg(MisraGriesAgg.approx_topk(col("w"), k).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct cardinality <= k, under any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val exact = Map("a" -> 40L, "b" -> 25L, "c" -> 7L)
    for (parts <- Seq(1, 3, 8)) assert(topk(items, k = 3, parts) == exact)
  }

  test("reported counts are within n/(k+1) of truth; heavy hitters survive") {
    // adversarial: one heavy item among many singletons that force
    // decrements
    val heavy = Seq.fill(300)("hh")
    val chaff = (1 to 500).map(i => s"x$i")
    val items = scala.util.Random.shuffle(heavy ++ chaff)
    val n = items.size
    val k = 20
    for (parts <- Seq(1, 5)) {
      val got = topk(items, k, parts)
      val bound = n.toDouble / (k + 1)
      // frequency 300 > n/(k+1) ~ 38 -> must survive, undercounted at most
      // by the bound
      assert(got.contains("hh"))
      assert(got("hh") <= 300 && got("hh") >= 300 - bound - 1)
      // no item is ever overcounted
      got.foreach { case (i, c) =>
        val truth = if (i == "hh") 300L else 1L
        assert(c <= truth)
      }
      assert(got.size <= k)
    }
  }

  test("output array is sorted (cnt desc, item asc) for deterministic top-N") {
    val items = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(9)("z")
    val arr = items.toDF("w")
      .agg(MisraGriesAgg.approx_topk(col("w"), 8).as("tk"))
      .select(col("tk")).head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(arr == Seq(("z", 9L), ("a", 5L), ("b", 5L)))
  }
}
