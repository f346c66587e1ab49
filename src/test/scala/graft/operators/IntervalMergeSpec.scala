package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mergeIntervals on variable-length intervals — the cases q66's
  * fixed-length fixture cannot produce: an interval fully swallowed by an
  * earlier longer one, and touching intervals merging. */
class IntervalMergeSpec extends SparkSpec {

  test("swallowed, touching and disjoint intervals") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 100L),   // long
      (1L, 10L, 20L),   // swallowed by [0,100) — a fixed gap rule misses this
      (1L, 90L, 150L),  // overlaps the long one's tail
      (1L, 150L, 160L), // touches [.,150) -> merges
      (1L, 200L, 210L), // disjoint
      (2L, 5L, 6L)      // other key untouched
    ).toDF("k", "s", "e")
    val out = RelationalOps.mergeIntervals(iv, "k", "s", "e")
      .orderBy("k", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 160L, 4L),
      (1L, 200L, 210L, 1L),
      (2L, 5L, 6L, 1L)))
  }
}
