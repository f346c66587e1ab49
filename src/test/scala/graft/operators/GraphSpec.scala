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

  test("triangleCounts: K4 counts 3 per vertex; pendant path counts none") {
    // K4 on {0,1,2,3} = 4 triangles, each vertex in exactly 3; the pendant
    // chain 3-7-8 adds degree without closing anything
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 7L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Graph.triangleCounts(edges)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r === Array((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("triangleCounts: each triangle generated exactly once under ties") {
    // single triangle with equal degrees everywhere: the (degree, id)
    // tie-break alone must orient acyclically
    val tri = Seq((5L, 6L), (6L, 7L), (5L, 7L)).toDF("id_a", "id_b")
    val r = Graph.triangleCounts(tri).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r === Array((5L, 1L), (6L, 1L), (7L, 1L)))
  }

  test("kCore: the cascade removes what a single degree filter keeps") {
    // K4 on {0,1,2,3} plus a pendant chain 3-10-11-12. At k=2 every chain
    // vertex peels ITERATIVELY: after 12 goes, 11 has degree 1; after 11,
    // 10 does — one degree filter would have kept 10 and 11 (degree 2).
    val edges = (for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)).toDF("src", "dst")
      .union(Seq((3L, 10L), (10L, 11L), (11L, 12L)).toDF("src", "dst"))
    val core2 = Graph.kCore(edges, k = 2).orderBy("id")
      .collect().map(_.getLong(0))
    assert(core2 === Array(0L, 1L, 2L, 3L))
    // K4's minimum degree is 3: the 4-core is empty
    assert(Graph.kCore(edges, k = 4).isEmpty)
    // and the bounded-fixpoint contract raises instead of under-peeling
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      Graph.kCore(chain, k = 2, maxRounds = 3))
  }

  test("shortestHops: two-level anti-join window is exact on a cyclic pseudo-random graph") {
    // the undirected loop anti-joins only the previous two levels (BFS
    // level locality); certify exactness against a driver-side reference
    // BFS over the full settled set, on a graph dense in back/cross
    // edges and cycles — the shapes that would expose a wrong window
    val n = 120
    val raw = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i * 7 + 3) % n).toLong),
          (i.toLong, ((i * 31 + 11) % n).toLong))
    }.filter { case (a, b) => a != b }
    val seeds = Seq(0L, 17L)
    // reference: textbook BFS on the undirected adjacency
    val adj = (raw ++ raw.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val expect = collection.mutable.Map(seeds.map(_ -> 0): _*)
    var front = seeds.toSet
    for (h <- 1 to 4; if front.nonEmpty) {
      front = front.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(expect.contains)
      front.foreach(v => expect(v) = h)
    }
    val got = Graph.shortestHops(raw.toDF("src", "dst"),
        seeds.toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect.toMap)
  }

  test("kCore edge pin: repartition(src) + distinct plans ONE exchange") {
    // pins the mechanism the kCore scaladoc claims (and the round-12 A/B
    // measured): HashPartitioning(src) co-locates equal (src, dst) rows,
    // so it satisfies the distinct aggregate's ClusteredDistribution —
    // the distinct reuses the repartition exchange instead of adding a
    // (src, dst) exchange of its own, and the pinned layout stays
    // src-partitioned for the peel rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
    // count actual ShuffleExchangeExec NODES in the tree, not "Exchange"
    // substrings of the rendered plan (which would flake on any Spark/AQE
    // rendering change rather than on a real regression); AQE wraps the
    // plan in AdaptiveSparkPlanExec, a LeafExecNode, so descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case s: ShuffleExchangeExec => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val plan = dir.queryExecution.executedPlan
    val ex = shuffles(plan)
    assert(ex.size == 1, s"expected exactly one ShuffleExchangeExec:\n$plan")
    assert(ex.head.outputPartitioning.toString.contains("src"),
      s"the single exchange must hash-partition on src: ${ex.head.outputPartitioning}")
  }
}
