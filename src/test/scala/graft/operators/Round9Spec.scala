package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins the round-9 operators' edge semantics on hand-derived fixtures:
  * BFS hop labeling and its bounds, Bellman–Ford min-over-paths,
  * nearest-neighbor resampling tie rules, and the PMI identity. */
class Round9Spec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------ shortestHops

  test("shortestHops: hop labels on a path, unreachable absent, cap honored") {
    // 0-1-2-3-4 path plus isolated edge 8-9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val r = Graph.shortestHops(edges, seeds, maxHops = 2)
      .collect().map(row => (row.getLong(0), row.getInt(1))).toMap
    assert(r === Map(0L -> 0, 1L -> 1, 2L -> 2),
      "hop cap 2 must settle exactly levels 0..2 and omit 3,4,8,9")
  }

  test("shortestHops: multi-source takes the minimum over seeds") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(0L, 4L).toDF("id")
    val r = Graph.shortestHops(edges, seeds, maxHops = 4)
      .collect().map(row => (row.getLong(0), row.getInt(1))).toMap
    assert(r === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("shortestHops: directed edges do not expand backwards") {
    val edges = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.shortestHops(edges, Seq(0L).toDF("id"), maxHops = 3,
        directed = true)
      .collect().map(row => (row.getLong(0), row.getInt(1))).toMap
    assert(r === Map(0L -> 0, 1L -> 1), "2 is upstream of 1, not reachable")
  }

  test("shortestHops: early exit — diameter smaller than the cap terminates") {
    // would loop 100 rounds without the empty-frontier check
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val r = Graph.shortestHops(edges, Seq(0L).toDF("id"), maxHops = 100)
      .collect()
    assert(r.length === 2)
  }

  // ------------------------------------------------- boundedShortestPaths

  test("boundedShortestPaths: two cheap hops beat one heavy direct edge") {
    val edges = Seq((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 25L))
      .toDF("src", "dst", "w")
    val r = Graph.boundedShortestPaths(edges, Seq(0L).toDF("id"), rounds = 2)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    assert(r === Map(0L -> 0L, 1L -> 10L, 2L -> 20L))
  }

  test("boundedShortestPaths: the hop bound caps path length") {
    // 1 round can only use the direct edge; the cheaper 2-hop route needs 2
    val edges = Seq((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 25L))
      .toDF("src", "dst", "w")
    val r = Graph.boundedShortestPaths(edges, Seq(0L).toDF("id"), rounds = 1)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    assert(r === Map(0L -> 0L, 1L -> 10L, 2L -> 25L))
  }

  // ---------------------------------------------------- resampleNearest

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resampleNearest: picks the closer bracket, ties to at-or-before") {
    // grid for key 1: t0 = 00:00 (trunc of 00:30), step 6h, until 13:30
    //   00:00 -> before first event: first future (00:30, 1.00)
    //   06:00 -> prev (00:30, d=5.5h) vs next (07:00, d=1h) -> next 3.00
    //   12:00 -> prev (07:00, d=5h) vs next (13:30, hmm d=1.5h) -> next
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 1.00, 10L),
      (1L, ts("2024-01-01 07:00:00"), 3.00, 11L),
      (1L, ts("2024-01-01 13:30:00"), 9.00, 12L)
    ).toDF("user_id", "ts", "value", "event_id")
    val r = RelationalOps.resampleNearest(ev, "user_id", "ts", "value",
        stepHours = 6, tieBreak = "event_id")
      .orderBy("grid_ts")
      .collect().map(row => row.getLong(2))
    assert(r === Array(100L, 300L, 900L))
  }

  test("resampleNearest: exact midpoint resolves to the earlier event") {
    // events at 00:00 and 12:00; grid 00:00, 06:00, 12:00 — 06:00 is
    // equidistant (6h both ways) and must take the 00:00 value
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2.00, 1L),
      (1L, ts("2024-01-01 12:00:00"), 8.00, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val r = RelationalOps.resampleNearest(ev, "user_id", "ts", "value",
        stepHours = 6, tieBreak = "event_id")
      .orderBy("grid_ts")
      .collect().map(row => row.getLong(2))
    assert(r === Array(200L, 200L, 800L))
  }

  test("resampleNearest: equal-timestamp events dedup by max tieBreak") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.00, 1L),
      (1L, ts("2024-01-01 00:00:00"), 5.00, 2L) // winner
    ).toDF("user_id", "ts", "value", "event_id")
    val r = RelationalOps.resampleNearest(ev, "user_id", "ts", "value",
        stepHours = 6, tieBreak = "event_id")
      .collect().map(row => row.getLong(2))
    assert(r === Array(500L))
  }

  // ---------------------------------------------------- pmiCollocations

  test("pmiCollocations: hand-derived scaled PMI and marginal identity") {
    // corpus: "a b" x3 and "a c" x2 -> bigrams: (a,b)=3, (a,c)=2, T=5
    // marginals: c1(a)=5; c2(b)=3, c2(c)=2
    // pmi(a,b) = ln(3*5/(5*3)) = ln(1) = 0 -> scaled 0
    // pmi(a,c) = ln(2*5/(5*2)) = 0 -> scaled 0
    val docs = Seq("a b", "a b", "a b", "a c", "a c").toDF("text")
    val r = TextAnalysis.pmiCollocations(docs, minCount = 1L, topK = 10)
      .orderBy("w1", "w2")
      .collect().map(row => (row.getString(0), row.getString(1),
        row.getLong(2), row.getLong(3)))
    assert(r === Array(("a", "b", 3L, 0L), ("a", "c", 2L, 0L)))
  }

  test("pmiCollocations: rare exclusive pair outranks frequent promiscuous one") {
    // (x,y) occurs only with each other; (a,*) spread across many partners
    val docs = Seq("x y", "x y", "a b", "a c", "a d", "a e").toDF("text")
    val top = TextAnalysis.pmiCollocations(docs, minCount = 1L, topK = 1)
      .collect().head
    assert((top.getString(0), top.getString(1)) === ("x", "y"))
  }

  test("pmiCollocations: minCount prunes below-threshold pairs") {
    val docs = Seq("a b", "a b", "c d").toDF("text")
    val r = TextAnalysis.pmiCollocations(docs, minCount = 2L, topK = 10)
      .collect().map(row => (row.getString(0), row.getString(1)))
    assert(r === Array(("a", "b")))
  }
}
