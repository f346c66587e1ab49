package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** spanDedup semantics on a constructed corpus: the canonical (first)
  * occurrence of a duplicated window survives, later occurrences are
  * excised, overlapping coverage merges, and untouched docs pass through
  * verbatim. */
class SpanDedupSpec extends SparkSpec {

  test("canonical occurrence survives, later occurrences are excised") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $span omega"),      // canonical (smallest doc_id, pos)
      (2L, s"beta gamma $span delta"), // later occurrence -> span drops
      (3L, "entirely unrelated text with no repeats at all")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, n = 10)
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) === s"alpha $span omega")
    assert(out(0).getLong(2) === 0L)
    assert(out(1).getString(3) === "beta gamma delta")
    assert(out(1).getLong(2) === 10L)
    assert(out(2).getString(3) === "entirely unrelated text with no repeats at all")
  }

  test("overlapping duplicated windows merge their coverage") {
    import spark.implicits._
    // doc 2 repeats an 11-token run of doc 1: two overlapping duplicated
    // 10-windows in doc 2 must excise 11 tokens, not 20
    val run = (1 to 11).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run"),
      (2L, s"x $run y")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, n = 10)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(1).getLong(2) === 11L)
    assert(out(1).getString(3) === "x y")
  }
}
