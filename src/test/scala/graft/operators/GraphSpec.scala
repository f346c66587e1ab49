package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Graph.pageRankScaled's exact integer iteration on a hand-derived
  * fixture, plus the invariants that make it trustworthy at scale:
  * determinism across partitionings and near-conservation of rank mass. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pageRankScaled: hand-derived 1-round values on the path graph a-b-c") {
    // deg: a=1, b=2, c=1; n=3; scale=1e12
    // r0 = 333333333333 each; base = ((15e12)//100)//3 = 50000000000
    // contrib: a=333333333333, b=166666666666, c=333333333333
    // r1(a) = base + 85*166666666666//100 = 50000000000 + 141666666666 = 191666666666
    // r1(b) = base + 85*(2*333333333333)//100 = 50000000000 + 566666666666 = 616666666666
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r = Graph.pageRankScaled(edges, iters = 1).orderBy("id")
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(r === Array((1L, 191666666666L), (2L, 616666666666L), (3L, 191666666666L)))
  }

  test("pageRankScaled: deterministic across partition counts, mass nearly conserved") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L), (4L, 0L))
      .toDF("id_a", "id_b")
    val a = Graph.pageRankScaled(edges.repartition(1), iters = 3)
      .orderBy("id").collect().map(_.getLong(1))
    val b = Graph.pageRankScaled(edges.repartition(7), iters = 3)
      .orderBy("id").collect().map(_.getLong(1))
    assert(a.sameElements(b), "integer PageRank must not depend on partitioning")
    val mass = a.sum
    // truncating division drops < (n + 2) units per round (base + per-node
    // floor); far under 1e-9 relative at scale 1e12
    assert(mass <= 1000000000000L && mass > 1000000000000L - 1000L)
  }

  test("pageRankScaled: symmetric star center outranks leaves") {
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("id_a", "id_b")
    val r = Graph.pageRankScaled(edges, iters = 3)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    assert(r(9L) > r(1L) && r(1L) === r(2L) && r(2L) === r(3L) && r(3L) === r(4L))
  }
}
